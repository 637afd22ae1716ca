"""Attention primitives.

`dot_product_attention` is the XLA-path reference implementation (einsum +
fp32 softmax). The Pallas flash-attention kernel in
`plangen_tpu.ops.pallas_attention` is numerically checked against this in
tests and used on TPU for prefill.

Replaces the reference's HF/flash-attn attention
(three_party/Janus uses HF LlamaAttention; SURVEY.md Table B).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # large-but-finite; avoids NaN from all-masked rows


def dot_product_attention(
    q: jax.Array,  # [B, Q, H, D]
    k: jax.Array,  # [B, S, Hkv, D]
    v: jax.Array,  # [B, S, Hkv, D]
    bias: Optional[jax.Array] = None,  # [B, 1|H, Q, S] additive, NEG_INF = masked
    scale: Optional[float] = None,
) -> jax.Array:
    """Multi-head attention with GQA support and fp32 softmax.

    Softmax runs in fp32 regardless of input dtype (the reference computes
    attention under bf16 autocast but SDPA upcasts softmax internally);
    output is cast back to q.dtype.
    """
    B, Q, H, D = q.shape
    _, S, Hkv, _ = k.shape
    if scale is None:
        scale = D ** -0.5
    if Hkv != H:
        assert H % Hkv == 0
        rep = H // Hkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    logits = jnp.einsum("bqhd,bshd->bhqs", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqs,bshd->bqhd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(q.dtype)


def make_causal_bias(
    pad_mask: jax.Array,  # [B, S] 1 = attend, 0 = pad
    q_positions: jax.Array,  # [Q] absolute positions of the query tokens
    kv_positions: jax.Array,  # [S] absolute positions of the kv slots
) -> jax.Array:
    """Additive bias combining causality (q_pos >= kv_pos) with a padding mask.

    Matches HF left-padded semantics: position ids are absolute indices into
    the padded sequence (cache_position), pads are excluded via the mask only.
    Returns [B, 1, Q, S] with 0 where allowed, NEG_INF where masked.
    """
    causal = q_positions[:, None] >= kv_positions[None, :]  # [Q, S]
    allowed = causal[None, :, :] & (pad_mask[:, None, :] > 0)  # [B, Q, S]
    return jnp.where(allowed, 0.0, NEG_INF)[:, None, :, :]
