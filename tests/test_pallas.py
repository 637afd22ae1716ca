"""Pallas kernel numerics vs the XLA reference implementation (interpret mode
on CPU; the same kernels compile natively on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plangen_tpu.ops.attention import dot_product_attention, make_causal_bias
from plangen_tpu.ops.pallas_attention import _reference, flash_attention

KEY = jax.random.PRNGKey(0)


def make_qkv(B=2, S=256, H=2, Hkv=2, D=128, dtype=jnp.float32):
    ks = jax.random.split(KEY, 3)
    q = jax.random.normal(ks[0], (B, S, H, D), dtype=dtype)
    k = jax.random.normal(ks[1], (B, S, Hkv, D), dtype=dtype)
    v = jax.random.normal(ks[2], (B, S, Hkv, D), dtype=dtype)
    return q, k, v


class TestFlashAttention:
    def test_causal_matches_reference(self):
        q, k, v = make_qkv()
        mask = jnp.ones((2, 256), dtype=jnp.int32)
        out = flash_attention(q, k, v, mask, interpret=True)
        ref = _reference(q, k, v, mask, True, 128 ** -0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_left_padding(self):
        q, k, v = make_qkv(B=2, S=256)
        mask = np.ones((2, 256), dtype=np.int32)
        mask[0, :130] = 0  # left-padded row crossing a block boundary
        mask = jnp.asarray(mask)
        out = flash_attention(q, k, v, mask, interpret=True)
        ref = _reference(q, k, v, mask, True, 128 ** -0.5)
        # compare valid positions only
        np.testing.assert_allclose(
            np.asarray(out[0, 130:]), np.asarray(ref[0, 130:]), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(out[1]), np.asarray(ref[1]), atol=2e-5
        )

    def test_non_causal(self):
        q, k, v = make_qkv(S=128)
        mask = jnp.ones((2, 128), dtype=jnp.int32)
        out = flash_attention(q, k, v, mask, causal=False, interpret=True)
        ref = _reference(q, k, v, mask, False, 128 ** -0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_non_block_multiple_seq(self):
        """Recipe lengths (700, 700+576=1276) are not 128-aligned: the
        kernel right-pads internally; real rows must be exact."""
        q, k, v = make_qkv(S=190)
        mask = np.ones((2, 190), dtype=np.int32)
        mask[0, :37] = 0  # left padding on top of the internal right pad
        mask = jnp.asarray(mask)
        out = flash_attention(q, k, v, mask, interpret=True)
        ref = _reference(q, k, v, mask, True, 128 ** -0.5)
        np.testing.assert_allclose(
            np.asarray(out[0, 37:]), np.asarray(ref[0, 37:]), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(out[1]), np.asarray(ref[1]), atol=2e-5
        )

    def test_gradient_non_block_multiple(self):
        q, k, v = make_qkv(B=1, S=190, H=1, Hkv=1)
        mask = jnp.ones((1, 190), dtype=jnp.int32)

        def loss(q, k, v):
            return jnp.sum(
                flash_attention(q, k, v, mask, True, None, 128, 128, True) ** 2
            )

        g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        ref_g = jax.grad(
            lambda q, k, v: jnp.sum(
                _reference(q, k, v, mask, True, 128 ** -0.5) ** 2
            ),
            argnums=(0, 1, 2),
        )(q, k, v)
        for a, b in zip(g, ref_g):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)

    def test_gqa(self):
        q, k, v = make_qkv(H=4, Hkv=2)
        mask = jnp.ones((2, 256), dtype=jnp.int32)
        out = flash_attention(q, k, v, mask, interpret=True)
        ref_k = jnp.repeat(k, 2, axis=2)
        ref_v = jnp.repeat(v, 2, axis=2)
        ref = _reference(q, ref_k, ref_v, mask, True, 128 ** -0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_bf16(self):
        q, k, v = make_qkv(dtype=jnp.bfloat16)
        mask = jnp.ones((2, 256), dtype=jnp.int32)
        out = flash_attention(q, k, v, mask, interpret=True)
        ref = _reference(q, k, v, mask, True, 128 ** -0.5)
        np.testing.assert_allclose(
            np.asarray(out, dtype=np.float32),
            np.asarray(ref, dtype=np.float32),
            atol=2e-2,
        )

    def test_gradient_flows(self):
        q, k, v = make_qkv(B=1, S=128, H=1, Hkv=1)
        mask = jnp.ones((1, 128), dtype=jnp.int32)

        def loss(q, k, v):
            return jnp.sum(
                flash_attention(q, k, v, mask, True, None, 128, 128, True) ** 2
            )

        g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        ref_g = jax.grad(
            lambda q, k, v: jnp.sum(_reference(q, k, v, mask, True, 128 ** -0.5) ** 2),
            argnums=(0, 1, 2),
        )(q, k, v)
        for a, b in zip(g, ref_g):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


class TestPrefixDecodeAttention:
    def test_matches_reference(self):
        from plangen_tpu.ops.pallas_decode_attention import prefix_decode_attention
        from plangen_tpu.ops.attention import make_causal_bias

        L, B, S, H, D = 2, 3, 256, 4, 128
        ks = jax.random.split(KEY, 3)
        kc = jax.random.normal(ks[0], (L, B, S, H, D), dtype=jnp.float32)
        vc = jax.random.normal(ks[1], (L, B, S, H, D), dtype=jnp.float32)
        q = jax.random.normal(ks[2], (B, 1, H, D), dtype=jnp.float32)
        mask = np.ones((B, S), dtype=np.int32)
        mask[0, :5] = 0
        mask = jnp.asarray(mask)
        for layer, pos in [(0, 6), (1, 127), (1, 128), (0, 255)]:
            # pos >= 6 so no row has its whole prefix masked (row 0 pads
            # slots 0-4; an all-masked softmax is undefined in both impls)
            out = prefix_decode_attention(
                q, kc, vc, mask, jnp.int32(layer), jnp.int32(pos), interpret=True
            )
            bias = make_causal_bias(mask, jnp.array([pos]), jnp.arange(S))
            ref = dot_product_attention(q, kc[layer], vc[layer], bias=bias)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), atol=3e-5,
                err_msg=f"layer={layer} pos={pos}",
            )

    def test_paged_generation_matches_full(self):
        import functools

        from plangen_tpu.config import PlanGenModelConfig
        from plangen_tpu.models import vlm
        from plangen_tpu.runtime.generate import generate_image_tokens
        import plangen_tpu.ops.pallas_decode_attention as pda

        TINY = PlanGenModelConfig.tiny()
        params = vlm.init(KEY, TINY, dtype=jnp.float32)
        ids = jax.random.randint(jax.random.PRNGKey(3), (4, 6), 0, 100)
        emb = vlm.embed_text(params, ids).astype(jnp.float32)
        mask = jnp.ones((4, 10), dtype=jnp.int32)
        kw = dict(
            rng=KEY, cfg_weight=jnp.float32(5.0),
            temperature=jnp.float32(0.0), num_tokens=4,
        )
        ref = generate_image_tokens(params, TINY, emb, mask, **kw)
        orig = pda.prefix_decode_attention
        pda.prefix_decode_attention = functools.partial(orig, interpret=True)
        try:
            out = generate_image_tokens(params, TINY, emb, mask, paged=True, **kw)
        finally:
            pda.prefix_decode_attention = orig
        np.testing.assert_array_equal(np.asarray(ref.tokens), np.asarray(out.tokens))


class TestFlashAttentionTPU:
    """flash_attention_tpu (official fwd+bwd kernels) vs the XLA reference,
    run under pltpu.force_tpu_interpret_mode on CPU."""

    def _interp(self):
        from jax.experimental.pallas import tpu as pltpu

        return pltpu.force_tpu_interpret_mode()

    def test_causal_left_pad_matches(self):
        from plangen_tpu.ops.pallas_attention import flash_attention_tpu

        q, k, v = make_qkv(S=256)
        mask = np.ones((2, 256), dtype=np.int32)
        mask[0, :130] = 0
        mask = jnp.asarray(mask)
        with self._interp():
            out = flash_attention_tpu(q, k, v, mask, block=128)
        ref = _reference(q, k, v, mask, True, 128 ** -0.5)
        np.testing.assert_allclose(
            np.asarray(out[0, 130:]), np.asarray(ref[0, 130:]), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(out[1]), np.asarray(ref[1]), atol=2e-5
        )

    def test_non_aligned_gqa(self):
        from plangen_tpu.ops.pallas_attention import flash_attention_tpu

        q, k, v = make_qkv(S=190, H=4, Hkv=2)
        mask = jnp.ones((2, 190), dtype=jnp.int32)
        with self._interp():
            out = flash_attention_tpu(q, k, v, mask, block=128)
        ref_k = jnp.repeat(k, 2, axis=2)
        ref_v = jnp.repeat(v, 2, axis=2)
        ref = _reference(q, ref_k, ref_v, mask, True, 128 ** -0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_gradients_match_reference(self):
        """Like the model's loss, pad-row outputs carry ZERO cotangent (CE
        ignores pad positions) — under that contract the two paddings agree
        (segment ids stop pad ROWS attending real cols; the XLA bias does
        not, but those rows' outputs never reach the loss)."""
        from plangen_tpu.ops.pallas_attention import flash_attention_tpu

        q, k, v = make_qkv(B=1, S=190, H=1, Hkv=1)
        mask = np.ones((1, 190), dtype=np.int32)
        mask[0, :9] = 0  # left pad
        mask = jnp.asarray(mask)
        w = mask.astype(jnp.float32)[:, :, None, None]

        with self._interp():
            g = jax.grad(
                lambda q, k, v: jnp.sum(
                    (flash_attention_tpu(q, k, v, mask, block=128) * w) ** 2
                ),
                argnums=(0, 1, 2),
            )(q, k, v)
        ref_g = jax.grad(
            lambda q, k, v: jnp.sum(
                (_reference(q, k, v, mask, True, 128 ** -0.5) * w) ** 2
            ),
            argnums=(0, 1, 2),
        )(q, k, v)
        for a, b in zip(g, ref_g):
            np.testing.assert_allclose(
                np.asarray(a[:, 9:]), np.asarray(b[:, 9:]), atol=5e-4
            )
