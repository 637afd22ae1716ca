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


def chunked_decode_attention(
    q: jax.Array,  # [B, 1, H, D] single decode query
    k_cache: jax.Array,  # [B, S_max, Hkv, D]
    v_cache: jax.Array,  # [B, S_max, Hkv, D]
    pad_mask: jax.Array,  # [B, S_max]
    q_position: jax.Array,  # scalar absolute position of the query
    chunk: int = 128,
    scale: Optional[float] = None,
) -> jax.Array:
    """Decode attention that READS only the valid cache prefix.

    Full-cache attention reads all S_max slots every step even though slots
    beyond the current position are causally dead — on an HBM-bound decode
    that wastes ~45% of KV traffic mid-generation. This runs an online-softmax
    loop over ceil((pos+1)/chunk) chunks via `fori_loop` with a traced bound
    (lowers to while_loop), so XLA only DMA-reads the live chunks.

    Numerically identical to masked full attention (fp32 online softmax).
    """
    B, Q, H, D = q.shape
    assert Q == 1
    S = k_cache.shape[1]
    Hkv = k_cache.shape[2]
    # dynamic_slice CLAMPS an out-of-range start to S - chunk: with
    # S % chunk != 0 the last chunk would re-read rows already attended,
    # labelled with fresh positions — silently double-counted attention
    if S % chunk != 0:
        raise ValueError(
            f"chunked_decode_attention needs S_max ({S}) % chunk ({chunk})"
            " == 0 (dynamic_slice clamping would double-read the tail)"
        )
    if scale is None:
        scale = D ** -0.5
    rep = H // Hkv

    q_bh = q[:, 0]  # [B, H, D]; scale applied to the fp32 logits below

    def body(ci, carry):
        m, l, acc = carry  # [B, H, 1], [B, H, 1], [B, H, D]
        start = ci * chunk
        k = jax.lax.dynamic_slice_in_dim(k_cache, start, chunk, 1)  # [B,c,Hkv,D]
        v = jax.lax.dynamic_slice_in_dim(v_cache, start, chunk, 1)
        msk = jax.lax.dynamic_slice_in_dim(pad_mask, start, chunk, 1)  # [B,c]
        if rep != 1:
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
        # scale folds into the fp32 LOGITS (the main path's order): an
        # earlier draft pre-scaled q then rounded it back to bf16, putting
        # the dot's inputs off the base path's by bf16 epsilon — which
        # breaks the "numerically identical" contract near argmax ties
        s = scale * jnp.einsum(
            "bhd,bshd->bhs", q_bh, k, preferred_element_type=jnp.float32
        )  # [B, H, c]
        pos = start + jax.lax.broadcasted_iota(jnp.int32, (1, 1, chunk), 2)
        ok = (msk[:, None, :] > 0) & (pos <= q_position)
        s = jnp.where(ok, s, -1e30)
        m_c = jnp.max(s, axis=-1, keepdims=True)
        m_n = jnp.maximum(m, m_c)
        alpha = jnp.exp(m - m_n)
        p = jnp.exp(s - m_n)  # [B, H, c]
        l_n = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_n = acc * alpha + jnp.einsum(
            "bhs,bshd->bhd", p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        return m_n, l_n, acc_n

    n_chunks = (q_position.astype(jnp.int32) + chunk) // chunk  # ceil((pos+1)/chunk)
    m0 = jnp.full((B, H, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((B, H, 1), jnp.float32)
    a0 = jnp.zeros((B, H, D), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_chunks, body, (m0, l0, a0))
    out = acc / jnp.maximum(l, 1e-30)
    return out[:, None].astype(q.dtype)  # [B, 1, H, D]


def _quantize_rows_s8(x: jax.Array) -> tuple:
    """Symmetric per-row (last axis) int8 quantization, fp32 scales.

    Used by the a8 decode-attention paths to quantize the query and the
    (scale-folded) probability rows so both attention matmuls run as
    s8 x s8 -> s32 on the MXU. Returns (q8, scale[..., 1])."""
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    s = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q8 = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
    return q8, s.astype(jnp.float32)


def segmented_decode_attention(
    q: jax.Array,  # [B, Q, H, D]
    segs: list,  # [(k, v) or (k_q8, k_scale, v_q8, v_scale)] per segment
    biases: list,  # [B, 1|H, Q, s_i] additive bias per segment
    scale: Optional[float] = None,
    a8: bool = False,  # s8 x s8 MXU dots over int8 segments (see *_q8 a8 doc)
) -> jax.Array:
    """Attention over a KV cache split into static segments.

    Exact online-softmax combine: per segment compute (max, partial sum,
    unnormalized output) in fp32, then merge — mathematically identical to
    softmax over the concatenated segments. Used by the growing-cache decode
    (runtime/generate.py): each phase reads only the LIVE segments, so KV
    traffic is proportional to the written prefix instead of S_max, with no
    cache copies and no peak-memory overhead (the pad-based variant OOMed at
    batch 32: old+new buffers coexist during the copy).

    Segments are bf16 `(k, v)` pairs or int8 4-tuples with fp32 scales
    folded into the logits/probs (same trick as dot_product_attention_q8).
    """
    B, Q, H, D = q.shape
    if scale is None:
        scale = D ** -0.5
    if a8:
        # one query quantization shared by every segment's s8 logits matmul
        q_q8, q_s = _quantize_rows_s8(q.astype(jnp.float32))  # q_s [B,Q,H,1]
        q_s_bhq1 = q_s.transpose(0, 2, 1, 3)  # [B,H,Q,1]
    partials = []
    for seg, bias in zip(segs, biases):
        quantized = len(seg) == 4
        if quantized:
            k, k_scale, v, v_scale = seg
        else:
            k, v = seg
            k_scale = v_scale = None
        Hkv = k.shape[2]
        if Hkv != H:
            rep = H // Hkv
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
            if quantized:
                k_scale = jnp.repeat(k_scale, rep, axis=2)
                v_scale = jnp.repeat(v_scale, rep, axis=2)
        if quantized and a8:
            logits = jnp.einsum(
                "bqhd,bshd->bhqs", q_q8, k,
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * q_s_bhq1
        else:
            logits = jnp.einsum(
                "bqhd,bshd->bhqs", q, k.astype(q.dtype),
                preferred_element_type=jnp.float32,
            )
        if quantized:
            logits = logits * k_scale.transpose(0, 2, 1)[:, :, None, :]
        logits = logits * scale + bias.astype(jnp.float32)
        m = jnp.max(logits, axis=-1, keepdims=True)  # [B,H,Q,1]
        p = jnp.exp(logits - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        if quantized:
            p = p * v_scale.transpose(0, 2, 1)[:, :, None, :]
        if quantized and a8:
            p_q8, p_s = _quantize_rows_s8(p)  # over S; p_s [B,H,Q,1]
            o = jnp.einsum(
                "bhqs,bshd->bhqd", p_q8, v,
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * p_s
        else:
            o = jnp.einsum(
                "bhqs,bshd->bhqd", p.astype(q.dtype), v.astype(q.dtype),
                preferred_element_type=jnp.float32,
            ).astype(jnp.float32)
        partials.append((m, l, o))

    m_all = partials[0][0]
    for m, _, _ in partials[1:]:
        m_all = jnp.maximum(m_all, m)
    l_all = jnp.zeros_like(partials[0][1])
    o_all = jnp.zeros_like(partials[0][2])
    for m, l, o in partials:
        alpha = jnp.exp(m - m_all)
        l_all = l_all + l * alpha
        o_all = o_all + o * alpha
    out = o_all / jnp.maximum(l_all, 1e-30)
    return out.transpose(0, 2, 1, 3).astype(q.dtype)  # [B, Q, H, D]


def dot_product_attention_q8(
    q: jax.Array,  # [B, Q, H, D]
    k_q8: jax.Array,  # [B, S, Hkv, D] int8
    k_scale: jax.Array,  # [B, S, Hkv] fp32
    v_q8: jax.Array,  # [B, S, Hkv, D] int8
    v_scale: jax.Array,  # [B, S, Hkv] fp32
    bias: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    a8: bool = False,
) -> jax.Array:
    """Attention over an int8-quantized KV cache (per-position/head scales).

    Scales fold into the softmax inputs/outputs instead of dequantizing K/V
    tensors: logits = (q . k_q8) * k_scale, out = (probs * v_scale) . v_q8 —
    the int8->bf16 converts fuse into the matmuls, so HBM only ever reads the
    int8 cache (half the decode-loop KV traffic).

    `a8=True` additionally quantizes the QUERY rows (per head, over D) and the
    scale-folded PROBABILITY rows (per head, over S) to int8, so both matmuls
    run as s8 x s8 -> s32 on the MXU. Why: with an int8 cache the decode
    matvec stream (M=1) is MXU-rate-bound, not HBM-bound — the measured
    ~2.5 ms/step gap of DESIGN.md §8 — and the int8 MXU mode streams at twice
    the bf16 rate. Adds ~0.4% row-relative rounding error on top of the KV
    quantization (opt-in, like the W4A8 weight path).
    """
    B, Q, H, D = q.shape
    _, S, Hkv, _ = k_q8.shape
    if scale is None:
        scale = D ** -0.5
    if Hkv != H:
        rep = H // Hkv
        k_q8 = jnp.repeat(k_q8, rep, axis=2)
        v_q8 = jnp.repeat(v_q8, rep, axis=2)
        k_scale = jnp.repeat(k_scale, rep, axis=2)
        v_scale = jnp.repeat(v_scale, rep, axis=2)
    if a8:
        q_q8, q_s = _quantize_rows_s8(q.astype(jnp.float32))  # q_s [B,Q,H,1]
        logits = jnp.einsum(
            "bqhd,bshd->bhqs", q_q8, k_q8, preferred_element_type=jnp.int32
        ).astype(jnp.float32) * q_s.transpose(0, 2, 1, 3)
    else:
        logits = jnp.einsum(
            "bqhd,bshd->bhqs", q, k_q8.astype(q.dtype),
            preferred_element_type=jnp.float32,
        )
    logits = logits * k_scale.transpose(0, 2, 1)[:, :, None, :]  # [B,H,1,S]
    logits = logits * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    probs = probs * v_scale.transpose(0, 2, 1)[:, :, None, :]
    if a8:
        p_q8, p_s = _quantize_rows_s8(probs)  # over S; p_s [B,H,Q,1]
        out = jnp.einsum(
            "bhqs,bshd->bqhd", p_q8, v_q8, preferred_element_type=jnp.int32
        ).astype(jnp.float32) * p_s.transpose(0, 2, 1, 3)
    else:
        out = jnp.einsum(
            "bhqs,bshd->bqhd",
            probs.astype(q.dtype),
            v_q8.astype(q.dtype),
            preferred_element_type=jnp.float32,
        )
    return out.astype(q.dtype)


def quantize_kv(
    k: jax.Array, v: jax.Array
) -> tuple:
    """Per-(batch, position, head) symmetric int8 quantization of K/V rows.

    Returns (k_q8, k_scale, v_q8, v_scale); scales are fp32 [..., Hkv]."""
    def one(x):
        absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)  # [B,S,H]
        s = jnp.where(absmax > 0, absmax / 127.0, 1.0)
        q = jnp.clip(
            jnp.round(x.astype(jnp.float32) / s[..., None]), -127, 127
        ).astype(jnp.int8)
        return q, s.astype(jnp.float32)

    k_q8, k_s = one(k)
    v_q8, v_s = one(v)
    return k_q8, k_s, v_q8, v_s


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
