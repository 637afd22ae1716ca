"""Pallas TPU flash attention (forward) with causal + padding masking.

Online-softmax tiled attention: the [S, S] score matrix is never
materialized; per-Q-tile running max/sum/accumulator live in VMEM scratch
(fp32). Layout and tiling follow the production JAX Pallas flash kernels
(jax.experimental.pallas.ops.tpu.flash_attention): grid (batch, heads,
q_tiles, kv_tiles) with the KV axis as the sequential reduction dimension.

Replaces the reference's flash-attn CUDA dependency for the full-sequence
path (SURVEY.md Table B). Gradient support comes from a custom_vjp that
recomputes attention with the XLA reference implementation — adequate for
PlanGen's short sequences (<= ~1.3k tokens); dedicated backward kernels are
a later optimization.

Numerical contract: matches ops.attention.dot_product_attention (fp32
softmax) to bf16 tolerance; verified in tests/test_pallas.py.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from plangen_tpu.ops.attention import dot_product_attention, make_causal_bias

NUM_LANES = 128
DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _flash_fwd_kernel(
    mask_ref,  # [1, 1, block_k] int32 pad-mask slice for this (batch, kv tile)
    q_ref,  # [1, 1, block_q, D]
    k_ref,  # [1, 1, block_k, D]
    v_ref,  # [1, 1, block_k, D]
    o_ref,  # [1, 1, block_q, D]
    m_scratch,  # [block_q, NUM_LANES] fp32
    l_scratch,  # [block_q, NUM_LANES] fp32
    acc_scratch,  # [block_q, D] fp32
    *,
    causal: bool,
    scale: float,
    block_q: int,
    block_k: int,
    num_kv_tiles: int,
):
    q_idx = pl.program_id(2)
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    # causal: skip KV tiles entirely above the diagonal
    should_run = True
    if causal:
        should_run = ((q_idx + 1) * block_q - 1) >= (kv_idx * block_k)

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0]  # [block_q, D]
        k = k_ref[0, 0]  # [block_k, D]
        s = jax.lax.dot_general(
            q,
            k,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [block_q, block_k]
        s = s * scale

        # padding mask (kv side): 0 = pad
        pad_ok = mask_ref[0, 0, :] > 0  # [block_k]
        mask = jnp.broadcast_to(pad_ok[None, :], s.shape)
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + q_idx * block_q
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_idx * block_k
            mask = mask & (col <= row)
        s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

        m_prev = m_scratch[...]  # [block_q, LANES]
        l_prev = l_scratch[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)  # [block_q, 1]
        m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_curr, m_prev.shape))

        alpha = jnp.exp(m_prev - m_next)  # correction for old stats
        p = jnp.exp(s - m_next[:, :1])  # [block_q, block_k]
        l_corr = alpha * l_prev
        l_next = l_corr + jnp.broadcast_to(
            jnp.sum(p, axis=1, keepdims=True), l_prev.shape
        )

        m_scratch[...] = m_next
        l_scratch[...] = l_next

        acc_scratch[...] = acc_scratch[...] * alpha[:, :1] + jax.lax.dot(
            p.astype(v_ref.dtype),
            v_ref[0, 0],
            preferred_element_type=jnp.float32,
        )

    @pl.when(kv_idx == num_kv_tiles - 1)
    def _store():
        l = l_scratch[...][:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)


def _flash_fwd(
    q: jax.Array,  # [B, H, S, D]
    k: jax.Array,
    v: jax.Array,
    pad_mask: jax.Array,  # [B, S] int32
    causal: bool,
    scale: float,
    block_q: int,
    block_k: int,
    interpret: bool = False,
) -> jax.Array:
    B, H, S, D = q.shape
    if S % block_q or S % block_k:
        # a truncated grid would leave trailing q rows UNWRITTEN (garbage
        # output) and drop trailing keys — refuse instead of corrupting
        raise ValueError(
            f"flash attention needs S ({S}) divisible by block_q "
            f"({block_q}) and block_k ({block_k}) — pad the sequence"
        )
    num_q = S // block_q
    num_kv = S // block_k
    grid = (B, H, num_q, num_kv)

    kernel = functools.partial(
        _flash_fwd_kernel,
        causal=causal,
        scale=scale,
        block_q=block_q,
        block_k=block_k,
        num_kv_tiles=num_kv,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, block_k), lambda b, h, i, j: (b, 0, j)),
                pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j: (b, h, i, 0)),
                pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j: (b, h, j, 0)),
                pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j: (b, h, j, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, block_q, D), lambda b, h, i, j: (b, h, i, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
                pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
                pltpu.VMEM((block_q, D), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(pad_mask.astype(jnp.int32)[:, None, :], q, k, v)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8)
)
def flash_attention(
    q: jax.Array,  # [B, S, H, D]
    k: jax.Array,  # [B, S, Hkv, D]
    v: jax.Array,
    pad_mask: jax.Array,  # [B, S]
    causal: bool = True,
    scale: Optional[float] = None,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Flash attention in the model's [B, S, H, D] layout.

    Any S: non-block-multiple sequences are right-padded internally (masked
    keys, discarded query rows); GQA is handled by repeating KV heads.
    """
    return _flash_apply(q, k, v, pad_mask, causal, scale, block_q, block_k, interpret)


def _flash_apply(q, k, v, pad_mask, causal, scale, block_q, block_k, interpret=False):
    B, S, H, D = q.shape
    if scale is None:
        scale = D ** -0.5
    Hkv = k.shape[2]
    if Hkv != H:
        rep = H // Hkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    # pad S up to a block multiple (training lengths are recipe-driven, e.g.
    # 700 or 700+576=1276, not 128-aligned): appended key columns carry
    # pad_mask=0 so real rows never see them; appended query rows compute
    # garbage and are sliced off. Right-padding is safe under left-padded
    # inputs because causal masking is by absolute row/col index.
    pad = (-S) % math.lcm(block_q, block_k)
    if pad:
        widths = ((0, 0), (0, pad), (0, 0), (0, 0))
        q, k, v = jnp.pad(q, widths), jnp.pad(k, widths), jnp.pad(v, widths)
        pad_mask = jnp.pad(pad_mask, ((0, 0), (0, pad)))
    qt = q.transpose(0, 2, 1, 3)  # [B, H, S, D]
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    out = _flash_fwd(qt, kt, vt, pad_mask, causal, scale, block_q, block_k, interpret)
    return out.transpose(0, 2, 1, 3)[:, :S]


def _reference(q, k, v, pad_mask, causal, scale):
    S = q.shape[1]
    positions = jnp.arange(S, dtype=jnp.int32)
    if causal:
        bias = make_causal_bias(pad_mask, positions, positions)
    else:
        allowed = pad_mask[:, None, :] > 0
        bias = jnp.where(allowed, 0.0, -1e30)[:, None, :, :]
    return dot_product_attention(q, k, v, bias=bias, scale=scale)


def _fwd(q, k, v, pad_mask, causal, scale, block_q, block_k, interpret):
    out = _flash_apply(q, k, v, pad_mask, causal, scale, block_q, block_k, interpret)
    return out, (q, k, v, pad_mask)


def _bwd(causal, scale, block_q, block_k, interpret, res, g):
    # recompute-based backward via the XLA reference path (short sequences)
    q, k, v, pad_mask = res
    _, vjp = jax.vjp(lambda q, k, v: _reference(q, k, v, pad_mask, causal, scale), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


flash_attention.defvjp(_fwd, _bwd)


def flash_attention_tpu(
    q: jax.Array,  # [B, S, H, D] model layout
    k: jax.Array,  # [B, S, Hkv, D]
    v: jax.Array,
    pad_mask: jax.Array,  # [B, S] (1 = real token)
    causal: bool = True,
    scale: Optional[float] = None,
    block: int = 512,
) -> jax.Array:
    """Training-forward attention via the official TPU flash kernels
    (jax.experimental.pallas.ops.tpu.flash_attention), which ship REAL
    dq/dkv backward kernels — unlike this module's forward-only kernel,
    whose recompute-XLA VJP made it a net LOSS in training (BENCH_SWEEP
    train_budget "flash" row: +76 ms/step at T=700).

    Padding -> segment ids: real tokens get segment 1, pads segment 0, so
    real rows attend only real cols (same predicate as make_causal_bias's
    pad_mask term). Non-block-multiple S is right-padded and sliced back.
    GQA repeats KV heads. Differentiable end-to-end (the kernel carries its
    own custom VJP). CPU tests run it under pltpu.force_tpu_interpret_mode.
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention as _tpu_flash,
    )

    B, S, H, D = q.shape
    if scale is None:
        scale = D ** -0.5
    Hkv = k.shape[2]
    if Hkv != H:
        rep = H // Hkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    # pick the block size that minimizes padded length (ties -> larger
    # block): S=1276 -> 256 (pad to 1280); S=700 pads to 768 under both
    # 128 and 256, so the tie-break picks 256
    cands = [c for c in (512, 256, 128) if c <= max(block, 128)]
    b = min(cands, key=lambda c: (-(-S // c) * c, -c))
    pad = (-S) % b
    if pad:
        widths = ((0, 0), (0, pad), (0, 0), (0, 0))
        q, k, v = jnp.pad(q, widths), jnp.pad(k, widths), jnp.pad(v, widths)
        pad_mask = jnp.pad(pad_mask, ((0, 0), (0, pad)))
    seg = (pad_mask > 0).astype(jnp.int32)
    sizes = BlockSizes(
        block_q=b, block_k_major=b, block_k=b, block_b=1,
        block_q_major_dkv=b, block_k_major_dkv=b, block_k_dkv=b,
        block_q_dkv=b, block_k_major_dq=b, block_k_dq=b, block_q_dq=b,
    )
    out = _tpu_flash(
        q.transpose(0, 2, 1, 3),  # [B, H, S, D] kernel layout
        k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        segment_ids=SegmentIds(q=seg, kv=seg),
        causal=causal,
        sm_scale=scale,
        block_sizes=sizes,
    )
    return out.transpose(0, 2, 1, 3)[:, :S]
