"""Pallas prefix decode attention: DMA only the live KV prefix.

The decode loop is HBM-bound and ~45% of its KV reads are causally dead
(slots beyond the current position). The XLA paths can't skip them — a
jnp-level chunk loop serializes DMA and measured 2.6x slower (docs/DESIGN.md
"Measured dead ends"). This kernel takes manual control: the cache stays in
HBM (`memory_space=ANY`), and an in-kernel `fori_loop` bounded by the traced
query position DMA-copies 128-slot chunks into VMEM and runs online softmax —
chunks past the prefix are never read. Follows the paged-attention pattern
from the production JAX Pallas kernels (minus the page indirection: our cache
is contiguous).

Layout notes: the cache is the runtime's stacked [L, B, S, H, D]; the layer
index and query position arrive via scalar prefetch so one compiled kernel
serves every (layer, step).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 128


def _kernel(
    sp_ref,  # scalar prefetch: [layer, q_pos] int32
    q_ref,  # [1, H, D] VMEM (this batch row's query)
    mask_ref,  # [1, 1, S] int32 VMEM (this batch row's pad mask)
    k_hbm,  # [L, B, S, Hkv, D] ANY
    v_hbm,  # [L, B, S, Hkv, D] ANY
    o_ref,  # [1, H, D] VMEM out
    k_buf,  # VMEM (2, CHUNK, Hkv, D) double buffer
    v_buf,  # VMEM (2, CHUNK, Hkv, D)
    sems,  # DMA sems (2, 2)
    *,
    num_heads: int,
    head_dim: int,
    scale: float,
):
    layer = sp_ref[0]
    q_pos = sp_ref[1]
    b = pl.program_id(0)

    q = q_ref[0].astype(jnp.float32) * scale  # [H, D]

    n_chunks = (q_pos + CHUNK) // CHUNK  # ceil((q_pos+1)/CHUNK)

    def dma(slot, ci):
        start = ci * CHUNK
        return (
            pltpu.make_async_copy(
                k_hbm.at[layer, b, pl.ds(start, CHUNK)], k_buf.at[slot],
                sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                v_hbm.at[layer, b, pl.ds(start, CHUNK)], v_buf.at[slot],
                sems.at[slot, 1],
            ),
        )

    # double buffering: chunk ci+1's DMA is in flight while ci computes
    k0, v0 = dma(0, 0)
    k0.start()
    v0.start()

    def body(ci, carry):
        m, l, acc = carry  # [H, 1], [H, 1], [H, D] fp32
        start = ci * CHUNK
        slot = jax.lax.rem(ci, 2)

        @pl.when(ci + 1 < n_chunks)
        def _prefetch():
            kn, vn = dma(jax.lax.rem(ci + 1, 2), ci + 1)
            kn.start()
            vn.start()

        kc_cp, vc_cp = dma(slot, ci)
        kc_cp.wait()
        vc_cp.wait()

        k = k_buf[slot]  # [CHUNK, H, D]
        v = v_buf[slot]
        pos = start + jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
        msk = mask_ref[0, :, pl.ds(start, CHUNK)]  # [1, CHUNK]
        ok = (msk > 0) & (pos <= q_pos)  # [1, CHUNK]

        # s[h, c] = q[h] . k[c, h]: contract D with H as batch
        kt = jnp.swapaxes(k, 0, 1)  # [H, CHUNK, D]
        s = jax.lax.dot_general(
            q[:, None, :],
            kt,
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )[:, 0, :]  # [H, CHUNK]
        s = jnp.where(ok, s, -1e30)

        m_c = jnp.max(s, axis=-1, keepdims=True)
        m_n = jnp.maximum(m, m_c)
        alpha = jnp.exp(m - m_n)
        p = jnp.exp(s - m_n)  # [H, CHUNK]
        l_n = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        vt = jnp.swapaxes(v, 0, 1)  # [H, CHUNK, D]
        pv = jax.lax.dot_general(
            p[:, None, :].astype(v.dtype),
            vt,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )[:, 0, :]  # [H, D]
        acc_n = acc * alpha + pv
        return m_n, l_n, acc_n

    m0 = jnp.full((num_heads, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((num_heads, 1), jnp.float32)
    a0 = jnp.zeros((num_heads, head_dim), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_chunks, body, (m0, l0, a0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def prefix_decode_attention(
    q: jax.Array,  # [B, 1, H, D]
    k_cache: jax.Array,  # [L, B, S, Hkv, D]
    v_cache: jax.Array,
    pad_mask: jax.Array,  # [B, S]
    layer_idx: jax.Array,  # scalar int32
    q_position: jax.Array,  # scalar int32
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jax.Array:
    """Single-step decode attention over this layer's valid cache prefix.

    Requires S % 128 == 0 and Hkv == H (Janus-Pro has no GQA). Returns
    [B, 1, H, D] in q.dtype.
    """
    B, Q, H, D = q.shape
    assert Q == 1
    L, _, S, Hkv, _ = k_cache.shape
    assert Hkv == H, "prefix kernel assumes MHA (no GQA)"
    if S % 128:
        # the in-kernel chunk DMA k_hbm.at[..., pl.ds(start, 128)] does NOT
        # clamp — a ragged tail would read past the sequence bound
        raise ValueError(f"prefix decode kernel needs S ({S}) % 128 == 0")
    if scale is None:
        scale = D ** -0.5

    sp = jnp.stack(
        [layer_idx.astype(jnp.int32), q_position.astype(jnp.int32)]
    )
    kernel = functools.partial(
        _kernel, num_heads=H, head_dim=D, scale=scale
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, D), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[
                pl.BlockSpec(
                    (1, H, D), lambda b, sp: (b, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, 1, S), lambda b, sp: (b, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(
                (1, H, D), lambda b, sp: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((2, CHUNK, H, D), k_cache.dtype),
                pltpu.VMEM((2, CHUNK, H, D), v_cache.dtype),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(sp, q[:, 0], pad_mask.astype(jnp.int32)[:, None, :], k_cache, v_cache)
    return out[:, None]
