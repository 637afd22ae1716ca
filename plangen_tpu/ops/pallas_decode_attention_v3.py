"""Prefix decode attention v3: row-batched double-buffered chunk DMA.

v2 (pallas_decode_attention.py) loses to XLA's fused full-buffer read because
its per-row grid issues many small DMAs (64 rows x 24 layers x ~5 chunks per
step). v3 amortizes: each grid cell covers ROW_BLOCK batch rows, so one DMA
moves [ROW_BLOCK, CHUNK, H, D] (~2 MB bf16) and the cell count drops 8x.
Same online softmax, same exactness contract.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 128
ROW_BLOCK = 4


def _kernel(
    sp_ref,  # [layer, q_pos] int32
    q_ref,  # [ROW_BLOCK, H, D] VMEM
    mask_ref,  # [ROW_BLOCK, 1, S] int32 VMEM
    k_hbm,  # [L, B, S, H, D] ANY
    v_hbm,  # ANY
    o_ref,  # [ROW_BLOCK, H, D] VMEM
    k_buf,  # VMEM (2, ROW_BLOCK, CHUNK, H, D)
    v_buf,
    sems,  # DMA (2, 2)
    *,
    num_heads: int,
    head_dim: int,
    scale: float,
):
    layer = sp_ref[0]
    q_pos = sp_ref[1]
    rb = pl.program_id(0)
    b0 = rb * ROW_BLOCK

    q = q_ref[...].astype(jnp.float32) * scale  # [R, H, D]
    n_chunks = (q_pos + CHUNK) // CHUNK

    def dma(slot, ci):
        start = ci * CHUNK
        return (
            pltpu.make_async_copy(
                k_hbm.at[layer, pl.ds(b0, ROW_BLOCK), pl.ds(start, CHUNK)],
                k_buf.at[slot],
                sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                v_hbm.at[layer, pl.ds(b0, ROW_BLOCK), pl.ds(start, CHUNK)],
                v_buf.at[slot],
                sems.at[slot, 1],
            ),
        )

    k0, v0 = dma(0, 0)
    k0.start()
    v0.start()

    R = ROW_BLOCK

    def body(ci, carry):
        m, l, acc = carry  # [R, H, 1], [R, H, 1], [R, H, D]
        start = ci * CHUNK
        slot = jax.lax.rem(ci, 2)

        @pl.when(ci + 1 < n_chunks)
        def _prefetch():
            kn, vn = dma(jax.lax.rem(ci + 1, 2), ci + 1)
            kn.start()
            vn.start()

        kc, vc = dma(slot, ci)
        kc.wait()
        vc.wait()

        k = k_buf[slot]  # [R, CHUNK, H, D]
        v = v_buf[slot]
        # flatten (R, H) into one batch dim — Mosaic lowers single-batch
        # matmuls only — and match operand dtypes
        kt = jnp.swapaxes(k, 1, 2).reshape(R * num_heads, CHUNK, head_dim)
        qf = q.reshape(R * num_heads, 1, head_dim).astype(k.dtype)
        s = jax.lax.dot_general(
            qf,
            kt,
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(R, num_heads, CHUNK)

        pos = start + jax.lax.broadcasted_iota(jnp.int32, (1, 1, CHUNK), 2)
        msk = mask_ref[:, :, pl.ds(start, CHUNK)]  # [R, 1, CHUNK]
        ok = (msk > 0) & (pos <= q_pos)
        s = jnp.where(ok, s, -1e30)

        m_c = jnp.max(s, axis=-1, keepdims=True)
        m_n = jnp.maximum(m, m_c)
        alpha = jnp.exp(m - m_n)
        p = jnp.exp(s - m_n)
        l_n = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        vt = jnp.swapaxes(v, 1, 2).reshape(R * num_heads, CHUNK, head_dim)
        pv = jax.lax.dot_general(
            p.reshape(R * num_heads, 1, CHUNK).astype(v.dtype),
            vt,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(R, num_heads, head_dim)
        return m_n, l_n, acc * alpha + pv

    m0 = jnp.full((R, num_heads, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((R, num_heads, 1), jnp.float32)
    a0 = jnp.zeros((R, num_heads, head_dim), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_chunks, body, (m0, l0, a0))
    o_ref[...] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def prefix_decode_attention_v3(
    q: jax.Array,  # [B, 1, H, D]
    k_cache: jax.Array,  # [L, B, S, H, D]
    v_cache: jax.Array,
    pad_mask: jax.Array,  # [B, S]
    layer_idx: jax.Array,
    q_position: jax.Array,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jax.Array:
    B, Q, H, D = q.shape
    assert Q == 1 and B % ROW_BLOCK == 0
    L, _, S, Hkv, _ = k_cache.shape
    assert Hkv == H
    if S % 128:
        # unclamped in-kernel chunk DMAs: a ragged tail reads out of bounds
        raise ValueError(f"v3 decode kernel needs S ({S}) % 128 == 0")
    if scale is None:
        scale = D ** -0.5
    sp = jnp.stack([layer_idx.astype(jnp.int32), q_position.astype(jnp.int32)])
    kernel = functools.partial(_kernel, num_heads=H, head_dim=D, scale=scale)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, D), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B // ROW_BLOCK,),
            in_specs=[
                pl.BlockSpec(
                    (ROW_BLOCK, H, D), lambda r, sp: (r, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (ROW_BLOCK, 1, S), lambda r, sp: (r, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(
                (ROW_BLOCK, H, D), lambda r, sp: (r, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, ROW_BLOCK, CHUNK, H, D), k_cache.dtype),
                pltpu.VMEM((2, ROW_BLOCK, CHUNK, H, D), v_cache.dtype),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(sp, q[:, 0], pad_mask.astype(jnp.int32)[:, None, :], k_cache, v_cache)
    return out[:, None]
