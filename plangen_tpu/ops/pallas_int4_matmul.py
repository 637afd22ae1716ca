"""Packed-int4 weight matmul (Pallas) for the decode hot path.

Why a kernel: storing matmul weights as 4-bit halves decode weight traffic
vs int8, but XLA cannot fuse a nibble unpack into a matmul operand — every
XLA-level formulation measured (strided interleave, bitcast_convert_type to
int4, block-split double-read) materializes the unpacked weights and runs
3-8x SLOWER than the int8 path. Mosaic's native int4 vector loads are also
slow (~5x, measured). The winning formulation avoids unpacking entirely:

    byte b = (hi << 4) | (lo + 8)        hi in [-8,7] two's-complement,
                                         lo in [-8,7] offset-binary
    as a signed int8 value:  b = 16*hi + (lo + 8)

so TWO matmuls on the SAME packed tile recover both halves algebraically:

    y1 = x @ b            = 16*(x @ hi) + x @ (lo + 8)
    y2 = x @ (b & 0xF)    =                x @ (lo + 8)
    x @ hi = (y1 - y2) / 16
    x @ lo = y2 - 8 * rowsum(x)

The only elementwise op over the weight tile is one int8 AND; the /16 folds
into the stored hi-scale. Column pairing is GLOBAL HALVES — packed column j
holds original column j (lo) and column j + O/2 (hi) — so both outputs are
contiguous blocks and no permutation exists anywhere in the format.

Measured (v5e, decode-shaped fori_loop over 24 full layers, B=2 rows):
int8 XLA 91.5 us/layer -> this kernel 68.6 us/layer (1.33x); the residual
gap to the 31 us DMA floor is per-pallas_call overhead and MXU weight-feed
at tiny M. Role in the reference stack: serving-side weight quantization
(the reference has none; its decode reads full bf16 weights every step).

Scope: weight-only (W4A16) — activations stay bf16 and accumulation is fp32,
so the numerics match a dequantized bf16 matmul to a few ulps (tested).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Int4Weight = Dict[str, jax.Array]


# ---------------------------------------------------------------------------
# packing
# ---------------------------------------------------------------------------


def quantize_weight_int4(w: jax.Array, act_int8: bool = False) -> Int4Weight:
    """Symmetric per-output-channel int4 quantization of [..., in, out].

    Returns {"w_p4": int8 [..., in, out//2], "s_lo": fp32 [..., 1, out//2],
    "s_hi16": fp32 [..., 1, out//2]} — packed bytes plus the two half scales
    (hi scale pre-divided by 16, see module docstring). `out` must be even;
    out//2 must be a multiple of 128 (lane tiling). `act_int8` adds the "a8"
    marker selecting the W4A8 decode kernel (structural dispatch, like every
    other quantized form).
    """
    wf = w.astype(jnp.float32)
    O = wf.shape[-1]
    assert O % 2 == 0, f"int4 packing needs an even out dim, got {O}"
    absmax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)  # [..., 1, out]
    scale = jnp.where(absmax > 0, absmax / 7.0, 1.0)
    q4 = jnp.clip(jnp.round(wf / scale), -8, 7).astype(jnp.int8)
    lo, hi = q4[..., : O // 2], q4[..., O // 2 :]
    w_p4 = (((hi << 4) | (lo + 8)).astype(jnp.int8))
    out = {
        "w_p4": w_p4,
        "s_lo": scale[..., : O // 2].astype(jnp.float32),
        "s_hi16": (scale[..., O // 2 :] / 16.0).astype(jnp.float32),
    }
    if act_int8:
        out["a8"] = jnp.zeros((), jnp.int8)  # presence-only marker leaf
    return out


def dequantize_weight_int4(q: Int4Weight, dtype=jnp.bfloat16) -> jax.Array:
    """Inverse of quantize_weight_int4 (tests / slow fallback paths)."""
    b = q["w_p4"].astype(jnp.int32)
    lo = (b & 0xF) - 8
    hi = b >> 4  # arithmetic: signed high nibble
    w_lo = lo.astype(jnp.float32) * q["s_lo"]
    w_hi = hi.astype(jnp.float32) * (q["s_hi16"] * 16.0)
    return jnp.concatenate([w_lo, w_hi], axis=-1).astype(dtype)


def is_quantized_int4(w) -> bool:
    return isinstance(w, dict) and "w_p4" in w


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def _kernel(l_ref, x_ref, wp_ref, slo_ref, shi_ref, olo_ref, ohi_ref):
    b = wp_ref[0]  # [I, TOP] int8 packed
    ulo = b & 0xF  # offset-encoded low nibble, in [0, 15]
    x = x_ref[...]
    y1 = jnp.dot(x, b.astype(x.dtype), preferred_element_type=jnp.float32)
    y2 = jnp.dot(x, ulo.astype(x.dtype), preferred_element_type=jnp.float32)
    rs = jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)  # [TR, 1]
    olo_ref[...] = ((y2 - 8.0 * rs) * slo_ref[0]).astype(olo_ref.dtype)
    ohi_ref[...] = ((y1 - y2) * shi_ref[0]).astype(ohi_ref.dtype)


def _kernel_a8(l_ref, x_ref, xs_ref, wp_ref, slo_ref, shi_ref, olo_ref, ohi_ref):
    """W4A8 body: s8 x s8 MXU dots on the packed tile — no weight converts at
    all (the int8 MXU mode also runs at twice the bf16 rate). Integer math is
    exact; the fp32 scaling applies the per-channel weight scale and the
    per-row activation scale."""
    b = wp_ref[0]
    ulo = b & 0xF
    x8 = x_ref[...]
    y1 = jnp.dot(x8, b, preferred_element_type=jnp.int32)
    y2 = jnp.dot(x8, ulo, preferred_element_type=jnp.int32)
    rs = jnp.sum(x8.astype(jnp.int32), axis=1, keepdims=True)
    xs = xs_ref[...]  # [R, 1] fp32 per-row activation scales
    olo_ref[...] = (
        (y2 - 8 * rs).astype(jnp.float32) * slo_ref[0] * xs
    ).astype(olo_ref.dtype)
    ohi_ref[...] = (
        (y1 - y2).astype(jnp.float32) * shi_ref[0] * xs
    ).astype(ohi_ref.dtype)


def quantize_activations_int8(x: jax.Array):
    """Per-row symmetric int8 activation quantization (dynamic, W4A8 path)."""
    xs = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True) / 127.0
    xs = jnp.where(xs > 0, xs, 1.0)
    x8 = jnp.clip(jnp.round(x.astype(jnp.float32) / xs), -127, 127).astype(jnp.int8)
    return x8, xs.astype(jnp.float32)


def _col_tile(oh: int, i: int) -> int:
    # largest tile dividing OH whose double-buffered weight block fits VMEM
    # comfortably (I x top int8 <= 4 MB; 7B's down_proj has I=11008)
    for t in (1024, 512, 256, 128):
        if oh % t == 0 and i * t <= 4 * 1024 * 1024:
            return t
    if oh % 128 == 0:
        return 128
    raise ValueError(f"packed out dim {oh} not a multiple of 128")


@functools.partial(jax.jit, static_argnames=("interpret",))
def _int4_matmul_2d(x, wp, s_lo, s_hi16, layer, interpret=False):
    """x [R, I] @ packed int4 [Lw, I, OH*2-col weight] at layer index `layer`.

    R <= 256 (the int4_matmul dispatcher routes larger row counts to the
    dense path), so x and both output blocks stay resident. Weight blocks
    are indexed directly out of the STACKED array via scalar prefetch, so
    the per-layer weight slice never materializes in HBM (a sliced operand
    would copy).
    """
    R, I = x.shape
    assert R <= 256, f"decode kernel expects <=256 rows, got {R}"
    OH = s_lo.shape[-1]
    top = _col_tile(OH, I)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(OH // top,),
        in_specs=[
            pl.BlockSpec((R, I), lambda j, l: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, I, top), lambda j, l: (l[0], 0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, top), lambda j, l: (l[0], 0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, top), lambda j, l: (l[0], 0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((R, top), lambda j, l: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, top), lambda j, l: (0, j), memory_space=pltpu.VMEM),
        ],
    )
    o_lo, o_hi = pl.pallas_call(
        _kernel,
        out_shape=[
            jax.ShapeDtypeStruct((R, OH), x.dtype),
            jax.ShapeDtypeStruct((R, OH), x.dtype),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(jnp.reshape(layer, (1,)).astype(jnp.int32), x, wp, s_lo, s_hi16)
    return jnp.concatenate([o_lo, o_hi], axis=-1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _int4_matmul_2d_a8(x, wp, s_lo, s_hi16, layer, interpret=False):
    """W4A8 form of _int4_matmul_2d: per-row int8 activations + s8 MXU dots."""
    R, I = x.shape
    assert R <= 256, f"decode kernel expects <=256 rows, got {R}"
    OH = s_lo.shape[-1]
    top = _col_tile(OH, I)
    x8, xs = quantize_activations_int8(x)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(OH // top,),
        in_specs=[
            pl.BlockSpec((R, I), lambda j, l: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), lambda j, l: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, I, top), lambda j, l: (l[0], 0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, top), lambda j, l: (l[0], 0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, top), lambda j, l: (l[0], 0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((R, top), lambda j, l: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, top), lambda j, l: (0, j), memory_space=pltpu.VMEM),
        ],
    )
    o_lo, o_hi = pl.pallas_call(
        _kernel_a8,
        out_shape=[
            jax.ShapeDtypeStruct((R, OH), x.dtype),
            jax.ShapeDtypeStruct((R, OH), x.dtype),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(jnp.reshape(layer, (1,)).astype(jnp.int32), x8, xs, wp, s_lo, s_hi16)
    return jnp.concatenate([o_lo, o_hi], axis=-1)


def int4_matmul(
    x: jax.Array,
    q: Int4Weight,
    layer: Optional[jax.Array] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """x [..., I] @ int4-packed weight, dispatching on stacked/unstacked form.

    `q` leaves are either [I, OH(..)] (single weight, `layer` ignored) or
    [L, I, OH] stacked with `layer` the (traced) layer index. Output dtype
    follows x. On CPU backends the kernel runs in interpret mode so the same
    code path is exercised by the test suite.

    With an "a8" marker in `q` (quantize_weight_int4(act_int8=True)) the
    decode path also quantizes activations per row to int8 and runs s8 x s8
    MXU dots (W4A8 — measured ~10% over W4A16 at the layer level; prefill
    rows still take the bf16 dense path, so prefill numerics match W4A16).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    wp, s_lo, s_hi16 = q["w_p4"], q["s_lo"], q["s_hi16"]
    if wp.ndim == 2:
        wp, s_lo, s_hi16 = wp[None], s_lo[None], s_hi16[None]
    if layer is None:
        layer = jnp.int32(0)
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    if x2.shape[0] > 256:
        # prefill / full-seq rows: compute-bound, and XLA stages the kernel's
        # [R, OH] outputs in scoped VMEM (16 MB), which overflows at prefill
        # row counts. Dequantize the layer's weights once (one-time traffic
        # per prefill) and use a dense matmul. 256 rows covers every decode
        # shape (B<=128 CFG rows) and fast_edit's 16-token chunks.
        qq = jax.tree_util.tree_map(
            lambda a: jax.lax.dynamic_index_in_dim(a, layer, 0, keepdims=False),
            {"w_p4": wp, "s_lo": s_lo, "s_hi16": s_hi16},
        )
        w = dequantize_weight_int4(qq, dtype=x.dtype)
        out = x2 @ w
    elif "a8" in q:
        out = _int4_matmul_2d_a8(x2, wp, s_lo, s_hi16, layer, interpret=interpret)
    else:
        out = _int4_matmul_2d(x2, wp, s_lo, s_hi16, layer, interpret=interpret)
    return out.reshape(*lead, out.shape[-1])


def int4_matmul_reference(x: jax.Array, q: Int4Weight, layer: int = 0) -> jax.Array:
    """XLA reference with the same math (dequant -> bf16 matmul, fp32 acc)."""
    wp = q["w_p4"]
    sel = {k: q[k] for k in ("w_p4", "s_lo", "s_hi16")}
    qq = sel if wp.ndim == 2 else jax.tree_util.tree_map(lambda a: a[layer], sel)
    w = dequantize_weight_int4(qq, dtype=x.dtype)
    return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)


def int4_matmul_a8_reference(x: jax.Array, q: Int4Weight, layer: int = 0) -> jax.Array:
    """XLA reference for the W4A8 kernel: the SAME integer math (per-row int8
    activations, exact int32 dots, fp32 scaling) without Pallas."""
    wp, s_lo, s_hi16 = q["w_p4"], q["s_lo"], q["s_hi16"]
    if wp.ndim == 3:
        wp, s_lo, s_hi16 = wp[layer], s_lo[layer], s_hi16[layer]
    x8, xs = quantize_activations_int8(x)
    b = wp.astype(jnp.int32)
    y1 = x8.astype(jnp.int32) @ b
    y2 = x8.astype(jnp.int32) @ (b & 0xF)
    rs = jnp.sum(x8.astype(jnp.int32), axis=-1, keepdims=True)
    o_lo = (y2 - 8 * rs).astype(jnp.float32) * s_lo * xs
    o_hi = (y1 - y2).astype(jnp.float32) * s_hi16 * xs
    return jnp.concatenate([o_lo, o_hi], axis=-1).astype(x.dtype)
