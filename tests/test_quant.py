"""Weight-only int8 quantization tests."""

import jax
import jax.numpy as jnp
import numpy as np

from plangen_tpu.config import PlanGenModelConfig
from plangen_tpu.models import llama, vlm
from plangen_tpu.ops.quant import (
    dequantize_weight,
    qmatmul,
    quantize_lm_params,
    quantize_weight,
)
from plangen_tpu.runtime.generate import greedy_decode_text

TINY = PlanGenModelConfig.tiny()
KEY = jax.random.PRNGKey(0)


class TestQuant:
    def test_roundtrip_error_small(self):
        w = jax.random.normal(KEY, (64, 128), dtype=jnp.float32) * 0.1
        q = quantize_weight(w)
        assert q["w_q8"].dtype == jnp.int8
        deq = dequantize_weight(q, jnp.float32)
        rel = np.abs(np.asarray(deq - w)).max() / np.abs(np.asarray(w)).max()
        assert rel < 0.01  # per-channel absmax: <= 1/254 of channel max

    def test_qmatmul_close_to_dense(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 64), dtype=jnp.float32)
        w = jax.random.normal(KEY, (64, 128), dtype=jnp.float32) * 0.1
        ref = x @ w
        out = qmatmul(x, quantize_weight(w))
        err = np.abs(np.asarray(out - ref)).max() / np.abs(np.asarray(ref)).max()
        assert err < 0.05

    def test_stacked_layer_weights(self):
        w = jax.random.normal(KEY, (2, 64, 128), dtype=jnp.float32)
        q = quantize_weight(w)
        assert q["w_q8"].shape == (2, 64, 128)
        assert q["scale"].shape == (2, 1, 128)
        # per-layer slice then matmul works (the fori_loop path)
        w0 = jax.tree_util.tree_map(lambda a: a[0], q)
        x = jax.random.normal(jax.random.PRNGKey(2), (4, 64))
        out = qmatmul(x, w0)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(x @ dequantize_weight(w0, jnp.float32)),
            rtol=1e-4, atol=1e-4,
        )

    def test_quantized_decode_runs_and_mostly_agrees(self):
        params = vlm.init(KEY, TINY, dtype=jnp.float32)
        ids = jnp.arange(8)[None].astype(jnp.int32)
        emb = vlm.embed_text(params, ids)
        mask = jnp.ones((1, 14), dtype=jnp.int32)
        ref = np.asarray(
            greedy_decode_text(params, TINY, emb, mask, jnp.int32(-1), max_new_tokens=6)
        )
        qparams = quantize_lm_params(params)
        out = np.asarray(
            greedy_decode_text(qparams, TINY, emb, mask, jnp.int32(-1), max_new_tokens=6)
        )
        assert out.shape == ref.shape
        # int8 weights shift near-tie argmaxes; demand >= half agreement on
        # this random tiny model (real models are far more robust)
        assert (out == ref).mean() >= 0.5


class TestQuantizedKVCache:
    def test_quantized_cache_decode_close_to_bf16(self):
        import jax
        import jax.numpy as jnp
        from plangen_tpu.runtime.generate import generate_image_tokens

        params = vlm.init(KEY, TINY, dtype=jnp.float32)
        B, L, N = 2, 6, 4
        ids = jax.random.randint(jax.random.PRNGKey(3), (2 * B, L), 0, 100)
        emb = vlm.embed_text(params, ids).astype(jnp.float32)
        mask = jnp.ones((2 * B, L + N), dtype=jnp.int32)
        kwargs = dict(
            rng=KEY, cfg_weight=jnp.float32(5.0),
            temperature=jnp.float32(0.0), num_tokens=N,
        )
        ref = generate_image_tokens(params, TINY, emb, mask, **kwargs)
        out = generate_image_tokens(
            params, TINY, emb, mask, quantized_cache=True, **kwargs
        )
        # int8 KV shifts near-tie argmaxes occasionally; most tokens agree
        agree = (np.asarray(ref.tokens) == np.asarray(out.tokens)).mean()
        assert agree >= 0.5, f"agreement {agree}"

    def test_quantized_teacher_forcing_exact(self):
        import jax
        import jax.numpy as jnp
        from plangen_tpu.runtime.generate import generate_image_tokens

        params = vlm.init(KEY, TINY, dtype=jnp.float32)
        B, L, N = 1, 6, 4
        ids = jax.random.randint(KEY, (2 * B, L), 0, 100)
        emb = vlm.embed_text(params, ids).astype(jnp.float32)
        mask = jnp.ones((2 * B, L + N), dtype=jnp.int32)
        gt = jax.random.randint(KEY, (B, N), 0, TINY.image_token_size)
        out = generate_image_tokens(
            params, TINY, emb, mask,
            rng=KEY, cfg_weight=jnp.float32(5.0), temperature=jnp.float32(1.0),
            gt_tokens=gt, regen_mask=jnp.zeros((B, N), dtype=jnp.int32),
            num_tokens=N, quantized_cache=True,
        )
        np.testing.assert_array_equal(np.asarray(out.tokens), np.asarray(gt))
