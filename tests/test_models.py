"""Model-core tests on tiny configs (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plangen_tpu.config import PlanGenModelConfig
from plangen_tpu.models import llama, siglip, vlm, vq
from plangen_tpu.ops.attention import dot_product_attention, make_causal_bias

TINY = PlanGenModelConfig.tiny()
KEY = jax.random.PRNGKey(0)
F32 = jnp.float32


class TestAttention:
    def test_causal_bias_blocks_future(self):
        mask = jnp.ones((1, 4))
        bias = make_causal_bias(mask, jnp.arange(4), jnp.arange(4))
        b = np.asarray(bias[0, 0])
        assert b[0, 1] < -1e20 and b[1, 0] == 0 and b[3, 3] == 0

    def test_pad_mask_blocks(self):
        mask = jnp.array([[0, 1, 1, 1]])
        bias = make_causal_bias(mask, jnp.arange(4), jnp.arange(4))
        assert np.asarray(bias[0, 0])[3, 0] < -1e20  # pad col masked for all queries

    def test_attention_matches_manual(self):
        q = jax.random.normal(KEY, (2, 3, 4, 8), dtype=F32)
        k = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 4, 8), dtype=F32)
        v = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 4, 8), dtype=F32)
        out = dot_product_attention(q, k, v)
        logits = np.einsum("bqhd,bshd->bhqs", q, k) * (8 ** -0.5)
        probs = jax.nn.softmax(jnp.asarray(logits), axis=-1)
        ref = np.einsum("bhqs,bshd->bqhd", probs, v)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_gqa(self):
        q = jax.random.normal(KEY, (1, 2, 4, 8), dtype=F32)
        k = jax.random.normal(KEY, (1, 2, 2, 8), dtype=F32)
        v = jax.random.normal(KEY, (1, 2, 2, 8), dtype=F32)
        out = dot_product_attention(q, k, v)
        assert out.shape == (1, 2, 4, 8)


class TestLlama:
    def test_forward_shapes(self):
        cfg = TINY.llama
        params = llama.init(KEY, cfg, dtype=F32)
        ids = jnp.array([[1, 2, 3, 4]])
        x = llama.embed(params, ids)
        hidden, cache = llama.forward(params, cfg, x, jnp.ones((1, 4)))
        assert hidden.shape == (1, 4, cfg.hidden_size)
        assert cache is None
        logits = llama.lm_head(params, hidden)
        assert logits.shape == (1, 4, cfg.vocab_size)
        assert logits.dtype == jnp.float32

    def test_cached_decode_matches_full_forward(self):
        """Prefill+decode through the KV cache must equal the full-seq forward."""
        cfg = TINY.llama
        params = llama.init(KEY, cfg, dtype=F32)
        L, S_max = 5, 8
        ids = jax.random.randint(KEY, (2, L + 2), 0, cfg.vocab_size)
        mask_full = jnp.ones((2, L + 2))
        x_full = llama.embed(params, ids)
        hidden_full, _ = llama.forward(params, cfg, x_full, mask_full)

        # cached: prefill first L, then decode 2 steps
        from plangen_tpu.runtime.kvcache import init_kv_cache

        cache = init_kv_cache(cfg, 2, S_max, dtype=F32)
        mask = jnp.zeros((2, S_max)).at[:, : L + 2].set(1)
        h, cache = llama.forward(
            params,
            cfg,
            x_full[:, :L],
            mask,
            positions=jnp.arange(L),
            kv_cache=cache,
        )
        np.testing.assert_allclose(
            np.asarray(h), np.asarray(hidden_full[:, :L]), atol=2e-5
        )
        for step in range(2):
            pos = jnp.array([L + step])
            h, cache = llama.forward(
                params,
                cfg,
                x_full[:, L + step : L + step + 1],
                mask,
                positions=pos,
                kv_cache=cache,
            )
            np.testing.assert_allclose(
                np.asarray(h[:, 0]), np.asarray(hidden_full[:, L + step]), atol=2e-5
            )

    def test_flash_training_path_matches(self, monkeypatch):
        """use_flash on the no-cache (training) forward at a NON-128-aligned
        length (the recipe's lengths never are) must match the XLA path."""
        import functools
        from dataclasses import replace

        from plangen_tpu.ops import pallas_attention

        monkeypatch.setattr(
            pallas_attention, "flash_attention",
            functools.partial(pallas_attention.flash_attention, interpret=True),
        )
        cfg = replace(
            TINY.llama, num_heads=2, num_kv_heads=1, head_dim=128,
            hidden_size=256, intermediate_size=256,
        )
        params = llama.init(KEY, cfg, dtype=F32)
        ids = jax.random.randint(KEY, (2, 9), 0, cfg.vocab_size)
        mask = jnp.ones((2, 9)).at[0, :3].set(0)  # left-padded row
        x = llama.embed(params, ids)
        base, _ = llama.forward(params, cfg, x, mask, use_flash=False)
        flash, _ = llama.forward(params, cfg, x, mask, use_flash=True)
        np.testing.assert_allclose(
            np.asarray(base[0, 3:]), np.asarray(flash[0, 3:]), atol=3e-5
        )
        np.testing.assert_allclose(
            np.asarray(base[1]), np.asarray(flash[1]), atol=3e-5
        )

    def test_left_padding_matches_unpadded(self):
        """A left-padded row must produce the same last-token hidden state as
        the unpadded sequence (absolute positions differ, but RoPE is relative
        in attention: q.k depends on position deltas; HF behaves the same)."""
        cfg = TINY.llama
        params = llama.init(KEY, cfg, dtype=F32)
        ids = jnp.array([[5, 6, 7]])
        pad = jnp.array([[9, 9, 5, 6, 7]])  # 2 pads on the left
        h1, _ = llama.forward(params, cfg, llama.embed(params, ids), jnp.ones((1, 3)))
        h2, _ = llama.forward(
            params, cfg, llama.embed(params, pad), jnp.array([[0, 0, 1, 1, 1]])
        )
        np.testing.assert_allclose(
            np.asarray(h1[:, -1]), np.asarray(h2[:, -1]), atol=2e-5
        )


class TestSigLIP:
    def test_features_shape(self):
        cfg = TINY.vision
        params = siglip.init(KEY, cfg, dtype=F32)
        img = jax.random.normal(KEY, (2, cfg.image_size, cfg.image_size, 3), dtype=F32)
        out = siglip.forward(params, cfg, img)
        assert out.shape == (2, cfg.num_patches, cfg.width)
        assert np.isfinite(np.asarray(out)).all()

    def test_scan_matches_sequential_blocks(self):
        """The layer-stacked scan must equal applying _block per layer."""
        from plangen_tpu.config import SigLIPConfig

        cfg = SigLIPConfig(image_size=32, patch_size=16, width=32, layers=3, heads=2)
        params = siglip.init(KEY, cfg, dtype=F32)
        img = jax.random.normal(KEY, (2, 32, 32, 3), dtype=F32)
        scanned = np.asarray(siglip.forward(params, cfg, img))

        x = jax.lax.conv_general_dilated(
            img, params["patch_embed"]["w"], (16, 16), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        B, Hp, Wp, D = x.shape
        x = x.reshape(B, Hp * Wp, D) + params["patch_embed"]["b"]
        x = x + params["pos_embed"]
        for l in range(cfg.layers):
            blk = jax.tree_util.tree_map(lambda a: a[l], params["layers"])
            x = siglip._block(blk, cfg, x)
        ref = np.asarray(siglip.layer_norm(x, params["final_norm"], cfg.layer_norm_eps))
        np.testing.assert_allclose(scanned, ref, atol=1e-6)

    def test_flash_attention_path_matches(self, monkeypatch):
        """use_flash (Pallas kernel, interpret on CPU) must match XLA."""
        import functools

        from plangen_tpu import ops
        from plangen_tpu.config import SigLIPConfig
        from plangen_tpu.ops import pallas_attention

        monkeypatch.setattr(
            pallas_attention, "flash_attention",
            functools.partial(pallas_attention.flash_attention, interpret=True),
        )
        # 128px @ patch16 -> 64 patches: exercises the 64-wide flash tiles
        cfg = SigLIPConfig(image_size=128, patch_size=16, width=32, layers=2, heads=2)
        params = siglip.init(KEY, cfg, dtype=F32)
        img = jax.random.normal(KEY, (2, 128, 128, 3), dtype=F32)
        base = np.asarray(siglip.forward(params, cfg, img, use_flash=False))
        flash = np.asarray(siglip.forward(params, cfg, img, use_flash=True))
        np.testing.assert_allclose(base, flash, atol=2e-5)

    def test_remat_matches(self):
        cfg = TINY.vision
        params = siglip.init(KEY, cfg, dtype=F32)
        img = jax.random.normal(KEY, (2, cfg.image_size, cfg.image_size, 3), dtype=F32)
        a = np.asarray(siglip.forward(params, cfg, img, remat=False))
        b = np.asarray(siglip.forward(params, cfg, img, remat=True))
        np.testing.assert_allclose(a, b, atol=1e-6)


class TestVQ:
    def test_uint8_decode_matches_host_conversion(self):
        """decode_code_uint8 (device) must equal the host save formula
        (utils/visualize.py: clip((x+1)*127.5, 0, 255).astype(uint8))."""
        cfg = TINY.vq
        params = vq.init(KEY, cfg, dtype=F32)
        idx = jax.random.randint(KEY, (2, 4), 0, cfg.codebook_size)
        f = np.asarray(vq.decode_code(params, cfg, idx, (2, 2)), dtype=np.float32)
        host = np.clip((f + 1.0) * 127.5, 0, 255).astype(np.uint8)
        dev = np.asarray(vq.decode_code_uint8(params, cfg, idx, (2, 2)))
        assert dev.dtype == np.uint8
        np.testing.assert_array_equal(dev, host)

    def test_encode_decode_shapes(self):
        cfg = TINY.vq
        params = vq.init(KEY, cfg, dtype=F32)
        f = cfg.downsample_factor
        img = jax.random.uniform(KEY, (1, 16 * f, 16 * f, 3), minval=-1, maxval=1)
        idx = vq.encode_to_indices(params, cfg, img)
        assert idx.shape == (1, 256)
        assert (np.asarray(idx) >= 0).all() and (np.asarray(idx) < cfg.codebook_size).all()
        out = vq.decode_code(params, cfg, idx, (16, 16))
        assert out.shape == (1, 16 * f, 16 * f, 3)

    def test_quantize_picks_nearest(self):
        cfg = TINY.vq
        params = vq.init(KEY, cfg, dtype=F32)
        cb = np.asarray(params["codebook"])
        cbn = cb / np.linalg.norm(cb, axis=-1, keepdims=True)
        z = jnp.asarray(cbn[7][None, None, None, :])  # exactly code 7
        _, idx = vq.quantize(params, cfg, z)
        assert int(idx[0, 0]) == 7

    def test_upsample_nearest(self):
        x = jnp.arange(4.0).reshape(1, 2, 2, 1)
        up = vq.upsample_nearest2x(x)
        np.testing.assert_array_equal(
            np.asarray(up[0, :, :, 0]),
            [[0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 3, 3], [2, 2, 3, 3]],
        )

    def test_straight_through_gradient(self):
        cfg = TINY.vq
        params = vq.init(KEY, cfg, dtype=F32)

        def loss_fn(z):
            zq, aux, _ = vq.straight_through_quantize(params, cfg, z)
            return jnp.sum(zq ** 2) + aux

        g = jax.grad(loss_fn)(jax.random.normal(KEY, (1, 2, 2, cfg.codebook_dim)))
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0


class TestVLM:
    def test_init_and_gen_embeds(self):
        params = vlm.init(KEY, TINY, dtype=F32)
        ids = jnp.array([[0, 5, 9]])
        emb = vlm.gen_img_embeds(params, ids)
        assert emb.shape == (1, 3, TINY.llama.hidden_size)
        logits = vlm.image_gen_logits(params, emb)
        assert logits.shape == (1, 3, TINY.image_token_size)

    def test_splice(self):
        tok = jnp.zeros((1, 5, 4))
        img = jnp.ones((1, 2, 4)) * jnp.array([[[1.0], [2.0]]])
        mask = jnp.array([[False, True, True, False, False]])
        out = vlm.splice_image_embeddings(tok, img, mask)
        np.testing.assert_allclose(np.asarray(out[0, :, 0]), [0, 1, 2, 0, 0])

    def test_prepare_inputs_embeds(self):
        params = vlm.init(KEY, TINY, dtype=F32)
        cfg = TINY
        n = cfg.image_seq_len
        L = n + 4
        ids = jnp.zeros((1, L), dtype=jnp.int32)
        mask = jnp.zeros((1, L), dtype=bool).at[0, 2 : 2 + n].set(True)
        img = jax.random.normal(KEY, (1, cfg.vision.image_size, cfg.vision.image_size, 3))
        out = vlm.prepare_inputs_embeds(params, cfg, ids, img, mask)
        assert out.shape == (1, L, cfg.llama.hidden_size)
        # non-image positions equal plain embeddings
        plain = vlm.embed_text(params, ids)
        np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(plain[0, 0]))
        assert not np.allclose(np.asarray(out[0, 2]), np.asarray(plain[0, 2]))
