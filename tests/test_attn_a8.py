"""s8 x s8 decode-attention (kv_a8) tests.

The a8 path quantizes the query and the scale-folded probability rows to
int8 so both decode-attention matmuls run as s8 x s8 -> s32 on the MXU
(ops/attention.py). Semantics contract tested here:

  * the int32 einsums are EXACT integer arithmetic (no overflow at the
    framework's shapes) — verified against a float64 emulation of the same
    quantized operands;
  * the extra rounding error vs the plain int8-KV path is bounded (~0.4%
    row-relative from the 1/254 quantization grid on q and p);
  * end to end it composes with the growing (segmented) cache and is
    deterministic under a fixed seed.
"""

import jax
import jax.numpy as jnp
import numpy as np

from plangen_tpu.config import PlanGenModelConfig
from plangen_tpu.models import vlm
from plangen_tpu.ops.attention import (
    _quantize_rows_s8,
    dot_product_attention_q8,
    make_causal_bias,
    quantize_kv,
    segmented_decode_attention,
)
from plangen_tpu.runtime.generate import generate_image_tokens

TINY = PlanGenModelConfig.tiny()
KEY = jax.random.PRNGKey(0)


def _rand_qkv(B=2, S=32, H=2, D=16, key=KEY):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, 1, H, D), dtype=jnp.float32)
    k = jax.random.normal(kk, (B, S, H, D), dtype=jnp.float32)
    v = jax.random.normal(kv, (B, S, H, D), dtype=jnp.float32)
    return q, k, v


class TestA8Numerics:
    def test_int32_einsum_exact_at_framework_shapes(self):
        # worst case |q8|,|k8| = 127 over D=128: 127*127*128 = 2.06e6 and
        # 127*127*1280 = 2.07e7 for PV over S — both far below 2^31, so the
        # s32 einsum is exact; emulate in float64 and compare bit-for-bit
        key = jax.random.PRNGKey(7)
        a = jax.random.randint(key, (4, 128), -127, 128).astype(jnp.int8)
        b = jax.random.randint(key, (1280, 128), -127, 128).astype(jnp.int8)
        got = jnp.einsum("qd,sd->qs", a, b, preferred_element_type=jnp.int32)
        want = np.einsum(
            "qd,sd->qs",
            np.asarray(a, dtype=np.int64),
            np.asarray(b, dtype=np.int64),
        )
        np.testing.assert_array_equal(np.asarray(got, dtype=np.int64), want)

    def test_quantize_rows_bounds(self):
        x = jax.random.normal(KEY, (3, 5, 64), dtype=jnp.float32) * 4.0
        q8, s = _quantize_rows_s8(x)
        assert q8.dtype == jnp.int8
        deq = np.asarray(q8, dtype=np.float32) * np.asarray(s)
        rowmax = np.abs(np.asarray(x)).max(-1, keepdims=True)
        assert (np.abs(deq - np.asarray(x)) <= rowmax / 254.0 + 1e-7).all()

    def test_a8_close_to_q8(self):
        q, k, v = _rand_qkv()
        k8, ks, v8, vs = quantize_kv(k, v)
        bias = make_causal_bias(
            jnp.ones((2, 32), jnp.int32),
            jnp.array([31], jnp.int32),
            jnp.arange(32, dtype=jnp.int32),
        )
        base = dot_product_attention_q8(q, k8, ks, v8, vs, bias=bias)
        a8 = dot_product_attention_q8(q, k8, ks, v8, vs, bias=bias, a8=True)
        err = np.abs(np.asarray(a8 - base)).max()
        scale = np.abs(np.asarray(base)).max()
        assert err / scale < 0.03, err / scale

    def test_segmented_a8_close_to_full_a8(self):
        q, k, v = _rand_qkv(S=32)
        k8, ks, v8, vs = quantize_kv(k, v)
        pad = jnp.ones((2, 32), jnp.int32)
        qpos = jnp.array([31], jnp.int32)
        bias_full = make_causal_bias(pad, qpos, jnp.arange(32, dtype=jnp.int32))
        full = dot_product_attention_q8(q, k8, ks, v8, vs, bias=bias_full, a8=True)
        segs = [
            (k8[:, :16], ks[:, :16], v8[:, :16], vs[:, :16]),
            (k8[:, 16:], ks[:, 16:], v8[:, 16:], vs[:, 16:]),
        ]
        biases = [
            make_causal_bias(pad[:, :16], qpos, jnp.arange(16, dtype=jnp.int32)),
            make_causal_bias(
                pad[:, 16:], qpos, 16 + jnp.arange(16, dtype=jnp.int32)
            ),
        ]
        seg = segmented_decode_attention(q, segs, biases, a8=True)
        err = np.abs(np.asarray(seg - full)).max()
        scale = np.abs(np.asarray(full)).max()
        # p is quantized per segment vs per full row -> small extra noise
        assert err / scale < 0.03, err / scale

    def test_segmented_a8_bf16_segments_unaffected(self):
        # a8 applies only to quantized segments; bf16 segs take the fp path
        q, k, v = _rand_qkv(S=16)
        pad = jnp.ones((2, 16), jnp.int32)
        qpos = jnp.array([15], jnp.int32)
        biases = [make_causal_bias(pad, qpos, jnp.arange(16, dtype=jnp.int32))]
        base = segmented_decode_attention(q, [(k, v)], biases)
        a8 = segmented_decode_attention(q, [(k, v)], biases, a8=True)
        np.testing.assert_array_equal(np.asarray(base), np.asarray(a8))


class TestA8EndToEnd:
    def _inputs(self):
        params = vlm.init(KEY, TINY, dtype=jnp.float32)
        B, L, n = 2, 6, 8
        ids = jax.random.randint(jax.random.PRNGKey(3), (2 * B, L), 0, 100)
        embeds = vlm.embed_text(params, ids).astype(jnp.float32)
        mask = np.ones((2 * B, L + n), dtype=np.int32)
        mask[1, 0] = 0
        return params, embeds, jnp.asarray(mask), n

    def test_generate_kv_a8_deterministic_and_valid(self):
        params, embeds, mask, n = self._inputs()
        kwargs = dict(
            rng=KEY,
            cfg_weight=jnp.float32(5.0),
            temperature=jnp.float32(1.0),
            num_tokens=n,
            quantized_cache=True,
            kv_a8=True,
        )
        out1 = generate_image_tokens(params, TINY, embeds, mask, **kwargs)
        out2 = generate_image_tokens(params, TINY, embeds, mask, **kwargs)
        toks = np.asarray(out1.tokens)
        np.testing.assert_array_equal(toks, np.asarray(out2.tokens))
        assert toks.shape == (2, n)
        assert (toks >= 0).all() and (toks < TINY.image_token_size).all()

    def test_generate_kv_a8_growing_matches_fixed(self):
        # same decode math across cache strategies: the growing (segmented)
        # a8 run should produce the same greedy tokens as the fixed-buffer
        # a8 run on the tiny model (greedy = robust to last-ulp combine noise)
        params, embeds, mask, n = self._inputs()
        kwargs = dict(
            rng=KEY,
            cfg_weight=jnp.float32(5.0),
            temperature=jnp.float32(0.0),
            num_tokens=n,
            quantized_cache=True,
            kv_a8=True,
        )
        ref = generate_image_tokens(params, TINY, embeds, mask, **kwargs)
        out = generate_image_tokens(
            params, TINY, embeds, mask, growing_cache=True, **kwargs
        )
        np.testing.assert_array_equal(np.asarray(ref.tokens), np.asarray(out.tokens))
