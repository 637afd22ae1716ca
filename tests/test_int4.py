"""int4 packed-weight matmul kernel: packing roundtrip, kernel-vs-reference
numerics (interpret mode on CPU), qmatmul dispatch, and a cached-decode
equivalence run through the llama stack.

Reference role: serving-side weight quantization (absent in the reference —
its decode reads full bf16 weights every step, plangen_base.py:567-607).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plangen_tpu.config import LlamaConfig
from plangen_tpu.models import llama
from plangen_tpu.ops.pallas_int4_matmul import (
    dequantize_weight_int4,
    int4_matmul,
    int4_matmul_reference,
    quantize_weight_int4,
)
from plangen_tpu.ops.quant import qmatmul, quantize_lm_params_int4

KEY = jax.random.PRNGKey(0)

# smallest dims the kernel's lane tiling supports: out/2 multiple of 128
I, O = 256, 512


def _rand_w(key, *shape):
    return jax.random.normal(key, shape, jnp.float32) / np.sqrt(shape[-2])


class TestPacking:
    def test_roundtrip_error_bound(self):
        w = _rand_w(KEY, I, O)
        q = quantize_weight_int4(w)
        deq = dequantize_weight_int4(q, dtype=jnp.float32)
        # |w - deq| <= scale/2 per column (round-to-nearest on a 15-level grid)
        scale = jnp.concatenate([q["s_lo"], q["s_hi16"] * 16.0], axis=-1)
        err = jnp.abs(deq - w)
        assert bool(jnp.all(err <= scale * 0.5 + 1e-6))

    def test_packed_shapes(self):
        q = quantize_weight_int4(_rand_w(KEY, 3, I, O))
        assert q["w_p4"].shape == (3, I, O // 2)
        assert q["w_p4"].dtype == jnp.int8
        assert q["s_lo"].shape == (3, 1, O // 2)
        assert q["s_hi16"].shape == (3, 1, O // 2)

    def test_extreme_values_survive(self):
        # columns hitting the +-absmax endpoints decode exactly
        w = jnp.array(np.linspace(-1, 1, I)[:, None] * np.ones((1, O)), jnp.float32)
        q = quantize_weight_int4(w)
        deq = dequantize_weight_int4(q, dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(deq[0]), np.asarray(w[0]), rtol=0, atol=1e-6
        )


class TestKernel:
    def test_matches_reference_unstacked(self):
        w = _rand_w(KEY, I, O)
        q = quantize_weight_int4(w)
        x = jax.random.normal(jax.random.PRNGKey(1), (4, I), jnp.bfloat16)
        out = int4_matmul(x, q, interpret=True)
        ref = int4_matmul_reference(x, q)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=2e-2, atol=2e-2,
        )

    def test_stacked_layer_index(self):
        q = quantize_weight_int4(_rand_w(KEY, 3, I, O))
        x = jax.random.normal(jax.random.PRNGKey(1), (2, I), jnp.bfloat16)
        for l in range(3):
            out = int4_matmul(x, q, layer=jnp.int32(l), interpret=True)
            ref = int4_matmul_reference(x, q, layer=l)
            np.testing.assert_allclose(
                np.asarray(out, np.float32), np.asarray(ref, np.float32),
                rtol=2e-2, atol=2e-2,
            )

    def test_kernel_row_boundary(self):
        # R=256 = the kernel/dense dispatch boundary (kernel side); leading
        # batch+seq dims collapse into rows
        q = quantize_weight_int4(_rand_w(KEY, I, O))
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 128, I), jnp.bfloat16)
        out = int4_matmul(x, q, interpret=True)
        assert out.shape == (2, 128, O)
        ref = int4_matmul_reference(x.reshape(-1, I), q).reshape(2, 128, O)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=2e-2, atol=2e-2,
        )

    def test_large_rows_dense_fallback(self):
        # R > 256 takes the dequant+dense prefill path (XLA stages the
        # kernel's [R, OH] outputs in scoped VMEM, which overflows at
        # prefill row counts)
        q = quantize_weight_int4(_rand_w(KEY, 2, I, O))
        x = jax.random.normal(jax.random.PRNGKey(4), (2048, I), jnp.bfloat16)
        out = int4_matmul(x, q, layer=jnp.int32(1), interpret=True)
        ref = int4_matmul_reference(x, q, layer=1)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=2e-2, atol=2e-2,
        )

    @pytest.mark.parametrize("n_fused", [2, 3])
    def test_fused_group_bit_identical_to_split(self, n_fused):
        """Quantizing the CONCAT of N same-input projections (the fused
        q|k|v / gate|up leaves, ops/quant.py INT4_FUSED_GROUPS) must
        produce bit-identical outputs to the N split matmuls: per-column
        absmax scales and codes are unchanged by concatenation — only the
        nibble pairing moves, and that is internal to the kernel."""
        ws = [_rand_w(jax.random.PRNGKey(10 + i), I, O)
              for i in range(n_fused)]
        x = jax.random.normal(jax.random.PRNGKey(20), (4, I), jnp.bfloat16)
        fused = int4_matmul(
            x, quantize_weight_int4(jnp.concatenate(ws, axis=-1)),
            interpret=True,
        )
        split = jnp.concatenate(
            [int4_matmul(x, quantize_weight_int4(w), interpret=True)
             for w in ws],
            axis=-1,
        )
        np.testing.assert_array_equal(np.asarray(fused), np.asarray(split))

    def test_fuse_plan_gqa_fallback(self):
        """GQA dims (kv narrower than q) skip the qkv triple and fuse only
        the same-shape k|v pair; gate|up still fuses."""
        from plangen_tpu.ops.quant import _fuse_plan

        layers = {
            "q_proj": jnp.zeros((2, 256, 512)),
            "k_proj": jnp.zeros((2, 256, 128)),
            "v_proj": jnp.zeros((2, 256, 128)),
            "o_proj": jnp.zeros((2, 512, 256)),
            "gate_proj": jnp.zeros((2, 256, 512)),
            "up_proj": jnp.zeros((2, 256, 512)),
            "down_proj": jnp.zeros((2, 512, 256)),
        }
        plan = _fuse_plan(layers)
        assert plan["k_v_proj"] == ("k_proj", "v_proj")
        assert plan["gate_up_proj"] == ("gate_proj", "up_proj")
        assert plan["q_proj"] == ("q_proj",)
        assert "qkv_proj" not in plan

    def test_qmatmul_dispatch(self):
        q = quantize_weight_int4(_rand_w(KEY, I, O))
        x = jax.random.normal(jax.random.PRNGKey(3), (2, I), jnp.bfloat16)
        out = qmatmul(x, q)
        ref = int4_matmul(x, q, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref))

    def test_qmatmul_dispatch_with_layer(self):
        q = quantize_weight_int4(_rand_w(KEY, 2, I, O))
        x = jax.random.normal(jax.random.PRNGKey(3), (2, I), jnp.bfloat16)
        out = qmatmul(x, {**q, "_layer": jnp.int32(1)})
        ref = int4_matmul(x, q, layer=jnp.int32(1), interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref))


def _int4_cfg():
    # smallest llama dims whose packed halves are 128-lane aligned
    return LlamaConfig(
        vocab_size=1024,
        hidden_size=256,
        intermediate_size=512,
        num_layers=2,
        num_heads=2,
        num_kv_heads=2,
        head_dim=128,
        max_position_embeddings=128,
    )


def _quantize_layers(params):
    from plangen_tpu.ops.quant import _LM_QUANT_KEYS

    out = dict(params)
    layers = dict(out["layers"])
    for k in _LM_QUANT_KEYS:
        layers[k] = quantize_weight_int4(layers[k])
    out["layers"] = layers
    out["lm_head"] = quantize_weight_int4(out["lm_head"])
    return out


def _dequantize_layers(qparams):
    out = dict(qparams)
    layers = dict(out["layers"])
    for k, v in layers.items():
        if isinstance(v, dict) and "w_p4" in v:
            layers[k] = dequantize_weight_int4(v)
    out["layers"] = layers
    out["lm_head"] = dequantize_weight_int4(out["lm_head"])
    return out


class TestDecodeEquivalence:
    def test_cached_decode_matches_dequantized_dense(self):
        """Prefill + 3 decode steps: int4 stacked-kernel path vs the same
        weights dequantized to a dense model. Hidden states must agree to
        matmul-accumulation tolerance at every step."""
        cfg = _int4_cfg()
        params = llama.init(KEY, cfg, dtype=jnp.bfloat16)
        qp = _quantize_layers(params)
        dp = _dequantize_layers(qp)

        from plangen_tpu.runtime.kvcache import init_kv_cache

        B, P, S = 2, 8, 12
        embeds = jax.random.normal(
            jax.random.PRNGKey(5), (B, P, cfg.hidden_size), jnp.bfloat16
        )
        mask = jnp.ones((B, S), dtype=jnp.int32)

        def run(p):
            cache = init_kv_cache(cfg, B, S)
            h, cache = llama.forward(
                p, cfg, embeds, mask, positions=jnp.arange(P), kv_cache=cache
            )
            outs = [h[:, -1]]
            x = h[:, -1:]
            for i in range(3):
                h, cache = llama.forward(
                    p, cfg, x, mask,
                    positions=jnp.arange(P + i, P + i + 1), kv_cache=cache,
                )
                outs.append(h[:, -1])
                x = h[:, -1:]
            return jnp.stack(outs)

        hq = np.asarray(run(qp), np.float32)
        hd = np.asarray(run(dp), np.float32)
        np.testing.assert_allclose(hq, hd, rtol=5e-2, atol=5e-2)

    @pytest.mark.parametrize("heads", [(2, 2), (4, 2)])
    def test_fused_forward_exactly_matches_split(self, heads):
        """Fused-group int4 trees (qkv or GQA k|v, gate|up) must produce
        EXACTLY the hidden states of the split-leaf trees through prefill
        + cached decode — the fusion is a packing change, not a numerics
        change. (4, 2) = GQA dims: q wider than kv, the triple must not
        fuse; smallest kv width the kernel's 128-lane tiling packs."""
        import dataclasses

        from plangen_tpu.ops.quant import _fuse_plan
        from plangen_tpu.runtime.kvcache import init_kv_cache

        n_heads, kv_heads = heads
        cfg = dataclasses.replace(
            _int4_cfg(), num_heads=n_heads, num_kv_heads=kv_heads
        )
        params = llama.init(KEY, cfg, dtype=jnp.bfloat16)
        split = _quantize_layers(params)

        fused = dict(split)
        layers = dict(params["layers"])
        flayers = dict(split["layers"])
        for fk, srcs in _fuse_plan(layers).items():
            if len(srcs) == 1:
                continue
            for s in srcs:
                flayers.pop(s)
            flayers[fk] = quantize_weight_int4(
                jnp.concatenate([layers[s] for s in srcs], axis=-1)
            )
        fused["layers"] = flayers
        if n_heads == kv_heads:
            assert "qkv_proj" in flayers  # MHA: the triple fuses
        else:
            assert "k_v_proj" in flayers  # GQA: only k|v pair

        B, P = 2, 8
        embeds = jax.random.normal(
            jax.random.PRNGKey(5), (B, P, cfg.hidden_size), jnp.bfloat16
        )
        mask = jnp.ones((B, P + 2), dtype=jnp.int32)

        def run(p):
            cache = init_kv_cache(cfg, B, P + 2)
            h, cache = llama.forward(
                p, cfg, embeds, mask, positions=jnp.arange(P),
                kv_cache=cache,
            )
            h2, _ = llama.forward(
                p, cfg, h[:, -1:], mask, positions=jnp.arange(P, P + 1),
                kv_cache=cache,
            )
            return np.asarray(h2, np.float32)

        np.testing.assert_array_equal(run(fused), run(split))

    def test_vlm_int4_generation_end_to_end(self):
        """quantize='int4' surface: full VLM (aligned small dims), int4
        weights + int8 KV cache through generate_image_tokens, compared to
        the same weights dequantized to dense (teacher-forcing-free CFG
        sampling must agree on this scale of model)."""
        from plangen_tpu.config import (
            PlanGenModelConfig, ProjectorConfig, SigLIPConfig, VQConfig,
        )
        from plangen_tpu.models import vlm
        from plangen_tpu.runtime.generate import generate_image_tokens

        cfg = PlanGenModelConfig(
            llama=_int4_cfg(),
            vision=SigLIPConfig(
                image_size=32, patch_size=16, width=32, layers=2, heads=2
            ),
            vq=VQConfig(
                codebook_size=256, codebook_dim=8, ch=8,
                ch_mult=(1, 1, 1, 1, 2), num_res_blocks=1, z_channels=16,
                group_norm_groups=4,
            ),
            aligner=ProjectorConfig(input_dim=32, n_embed=256, depth=2),
            gen_aligner=ProjectorConfig(input_dim=8, n_embed=256, depth=2),
            image_token_embed=256, image_token_size=256, gen_embed_dim=8,
        )
        params = vlm.init(KEY, cfg, dtype=jnp.bfloat16)
        qp = quantize_lm_params_int4(params)
        B, L, N = 2, 7, cfg.image_seq_len
        emb = jax.random.normal(
            jax.random.PRNGKey(1), (2 * B, L, 256), jnp.bfloat16
        )
        mask = jnp.ones((2 * B, L + N), jnp.int32)
        out = generate_image_tokens(
            qp, cfg, emb, mask, rng=jax.random.PRNGKey(7),
            cfg_weight=jnp.float32(5.0), temperature=jnp.float32(1.0),
            num_tokens=N, quantized_cache=True,
        )
        toks = np.asarray(out.tokens)
        assert toks.shape == (B, N)
        assert toks.min() >= 0 and toks.max() < cfg.image_token_size

    def test_quantize_lm_params_int4_structure(self):
        """vlm-level helper marks exactly the decode-dominant weights."""
        pytest.importorskip("jax")
        from plangen_tpu.config import PlanGenModelConfig
        from plangen_tpu.models import vlm

        cfg = PlanGenModelConfig()  # full 1B dims; eval_shape only (no memory)

        def build(key):
            return vlm.init(key, cfg, dtype=jnp.bfloat16)

        shapes = jax.eval_shape(build, KEY)
        # quantization is pure reshape/round math; run it abstractly too
        qshapes = jax.eval_shape(quantize_lm_params_int4, shapes)
        lay = qshapes["language_model"]["layers"]
        # same-input groups pack as ONE fused leaf (ops/quant.py
        # INT4_FUSED_GROUPS): concat multiplies the columns, packing halves
        # them back — gate|up's fused w_p4 is exactly intermediate_size
        # wide, q|k|v's is 3*hidden/2 (MHA dims at 1B)
        assert set(lay["qkv_proj"]) == {"w_p4", "s_lo", "s_hi16"}
        L, h = cfg.llama.num_layers, cfg.llama.hidden_size
        assert lay["qkv_proj"]["w_p4"].shape == (L, h, 3 * h // 2)
        assert lay["gate_up_proj"]["w_p4"].shape == (
            L, h, cfg.llama.intermediate_size
        )
        assert qshapes["language_model"]["lm_head"]["w_p4"].shape == (
            h, cfg.llama.vocab_size // 2
        )
        assert qshapes["gen_head"]["fc2"]["w"]["w_p4"].dtype == jnp.int8


class TestW4A8:
    def test_kernel_matches_integer_reference(self):
        from plangen_tpu.ops.pallas_int4_matmul import (
            int4_matmul_a8_reference,
        )

        q = quantize_weight_int4(_rand_w(KEY, 3, I, O), act_int8=True)
        x = jax.random.normal(jax.random.PRNGKey(6), (4, I), jnp.bfloat16)
        for l in (0, 2):
            out = int4_matmul(x, q, layer=jnp.int32(l), interpret=True)
            ref = int4_matmul_a8_reference(x, q, layer=l)
            # identical integer math; only the final fp32 scale-multiply
            # association can differ
            np.testing.assert_allclose(
                np.asarray(out, np.float32), np.asarray(ref, np.float32),
                rtol=1e-2, atol=1e-3,
            )

    def test_marker_dispatch(self):
        qa = quantize_weight_int4(_rand_w(KEY, I, O), act_int8=True)
        qw = {k: v for k, v in qa.items() if k != "a8"}
        x = jax.random.normal(jax.random.PRNGKey(7), (2, I), jnp.bfloat16)
        out_a8 = int4_matmul(x, qa, interpret=True)
        out_w16 = int4_matmul(x, qw, interpret=True)
        # both approximate the same dequantized matmul...
        ref = int4_matmul_reference(x, qw)
        np.testing.assert_allclose(
            np.asarray(out_a8, np.float32), np.asarray(ref, np.float32),
            rtol=5e-2, atol=5e-2,
        )
        # ...but through different arithmetic (activation quant changes bits)
        assert not np.array_equal(np.asarray(out_a8), np.asarray(out_w16))

    def test_decode_through_llama(self):
        from plangen_tpu.ops.quant import _LM_QUANT_KEYS
        from plangen_tpu.runtime.kvcache import init_kv_cache

        cfg = _int4_cfg()
        params = llama.init(KEY, cfg, dtype=jnp.bfloat16)
        out = dict(params)
        layers = dict(out["layers"])
        for k in _LM_QUANT_KEYS:
            layers[k] = quantize_weight_int4(layers[k], act_int8=True)
        out["layers"] = layers
        out["lm_head"] = quantize_weight_int4(out["lm_head"], act_int8=True)

        B, P, S = 2, 4, 6
        embeds = jax.random.normal(
            jax.random.PRNGKey(8), (B, P, cfg.hidden_size), jnp.bfloat16
        )
        mask = jnp.ones((B, S), dtype=jnp.int32)
        cache = init_kv_cache(cfg, B, S)
        h, cache = llama.forward(
            out, cfg, embeds, mask, positions=jnp.arange(P), kv_cache=cache
        )
        h2, _ = llama.forward(
            out, cfg, h[:, -1:], mask,
            positions=jnp.arange(P, P + 1), kv_cache=cache,
        )
        assert np.isfinite(np.asarray(h2, np.float32)).all()


class TestInt4UnderMesh:
    def test_dp_mesh_forward(self):
        """int4 kernel under a data-parallel mesh: replicated packed weights,
        batch sharded over 'data' — XLA partitions the pallas_call per shard
        (the DP serving deployment shape)."""
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from plangen_tpu.ops.quant import _LM_QUANT_KEYS
        from plangen_tpu.runtime.kvcache import init_kv_cache

        cfg = _int4_cfg()
        params = llama.init(KEY, cfg, dtype=jnp.bfloat16)
        layers = dict(params["layers"])
        for k in _LM_QUANT_KEYS:
            layers[k] = quantize_weight_int4(layers[k])
        params = {
            **params,
            "layers": layers,
            "lm_head": quantize_weight_int4(params["lm_head"]),
        }
        mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("data",))
        B, Pq, S = 8, 4, 8
        embeds = jax.device_put(
            jax.random.normal(jax.random.PRNGKey(1), (B, Pq, cfg.hidden_size),
                              jnp.bfloat16),
            NamedSharding(mesh, P("data")),
        )
        mask = jax.device_put(
            jnp.ones((B, S), jnp.int32), NamedSharding(mesh, P("data"))
        )
        params = jax.device_put(params, NamedSharding(mesh, P()))

        @jax.jit
        def step(p, e, m):
            cache = init_kv_cache(cfg, B, S)
            h, _ = llama.forward(
                p, cfg, e, m, positions=jnp.arange(Pq), kv_cache=cache
            )
            return h

        h = np.asarray(step(params, embeds, mask), np.float32)
        assert h.shape == (B, Pq, cfg.hidden_size) and np.isfinite(h).all()
        # matches the unsharded run
        h1 = np.asarray(
            step(
                jax.device_put(params, NamedSharding(mesh, P())),
                jax.device_put(embeds, NamedSharding(mesh, P())),
                jax.device_put(mask, NamedSharding(mesh, P())),
            ),
            np.float32,
        )
        np.testing.assert_allclose(h, h1, rtol=2e-2, atol=2e-2)


class TestInt4Compositions:
    def _vlm_int4(self):
        from plangen_tpu.config import (
            PlanGenModelConfig, ProjectorConfig, SigLIPConfig, VQConfig,
        )
        from plangen_tpu.models import vlm

        cfg = PlanGenModelConfig(
            llama=_int4_cfg(),
            vision=SigLIPConfig(
                image_size=32, patch_size=16, width=32, layers=2, heads=2
            ),
            vq=VQConfig(
                codebook_size=256, codebook_dim=8, ch=8,
                ch_mult=(1, 1, 1, 1, 2), num_res_blocks=1, z_channels=16,
                group_norm_groups=4,
            ),
            aligner=ProjectorConfig(input_dim=32, n_embed=256, depth=2),
            gen_aligner=ProjectorConfig(input_dim=8, n_embed=256, depth=2),
            image_token_embed=256, image_token_size=256, gen_embed_dim=8,
        )
        params = vlm.init(KEY, cfg, dtype=jnp.bfloat16)
        return cfg, quantize_lm_params_int4(params)

    def test_speculative_with_int4(self):
        """Self-speculative decoding over int4 params (B=1 CFG pair) runs
        and yields in-range tokens (exact output-distribution property is
        covered by test_speculative.py; this guards the composition)."""
        from plangen_tpu.runtime.speculative import generate_image_tokens_spec

        cfg, qp = self._vlm_int4()
        N = cfg.image_seq_len
        emb = jax.random.normal(jax.random.PRNGKey(9), (2, 5, 256), jnp.bfloat16)
        mask = jnp.ones((2, 5 + N), jnp.int32)
        out = generate_image_tokens_spec(
            qp, cfg, emb, mask, rng=jax.random.PRNGKey(0),
            cfg_weight=jnp.float32(5.0), temperature=jnp.float32(0.0),
            num_tokens=N, draft_layers=1, draft_len=2,
        )
        toks = np.asarray(out.tokens)
        assert toks.shape == (1, N)
        assert toks.min() >= 0 and toks.max() < cfg.image_token_size

    def test_fast_edit_with_int4(self):
        """fast_edit's mixed Q=16 prefill chunks + Q=1 steps both route
        through the int4 kernel (R <= 256 at this batch)."""
        from plangen_tpu.runtime.fast_edit import (
            frozen_chunk_schedule, generate_image_tokens_fast_edit,
        )
        from plangen_tpu.runtime.generate import generate_image_tokens

        cfg, qp = self._vlm_int4()
        N = cfg.image_seq_len
        B = 2
        emb = jax.random.normal(jax.random.PRNGKey(10), (2 * B, 5, 256), jnp.bfloat16)
        mask = jnp.ones((2 * B, 5 + N), jnp.int32)
        gt = jax.random.randint(jax.random.PRNGKey(11), (B, N), 0, 256)
        regen = np.zeros((B, N), np.int32)
        regen[:, 1] = 1  # one sampled token, rest frozen
        sched = frozen_chunk_schedule(regen)  # 4 tokens -> 1 mixed chunk
        out = generate_image_tokens_fast_edit(
            qp, cfg, emb, mask, rng=jax.random.PRNGKey(0),
            cfg_weight=jnp.float32(5.0), temperature=jnp.float32(1.0),
            gt_tokens=gt, regen_mask=jnp.asarray(regen), num_tokens=N,
            schedule=sched,
        )
        ref = generate_image_tokens(
            qp, cfg, emb, mask, rng=jax.random.PRNGKey(0),
            cfg_weight=jnp.float32(5.0), temperature=jnp.float32(1.0),
            gt_tokens=gt, regen_mask=jnp.asarray(regen), num_tokens=N,
        )
        np.testing.assert_array_equal(
            np.asarray(out.tokens), np.asarray(ref.tokens)
        )
