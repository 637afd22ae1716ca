"""KV-cache pytree.

A preallocated static-shape cache dict. Slot s holds the key/value for
absolute position s of the (left-padded) sequence; the pad mask [B, S_max]
marks attendable slots. This replaces the reference's HF DynamicCache
(growing python list of tensors per step, plangen_base.py:571-576) with
buffers XLA keeps in HBM and updates in place through the decode loop's
fori_loop carry — no reallocation, no host sync, no per-token copies.

Layouts:
  bf16 (default):  {"k", "v"}: [L, B, S_max, Hkv, D] in `dtype`
  int8 (quantized=True): {"k", "v"}: int8 + {"k_scale", "v_scale"}:
      fp32 [L, B, S_max, Hkv] — halves decode KV read traffic; attention
      folds the scales into the softmax inputs/outputs
      (ops.attention.dot_product_attention_q8).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from plangen_tpu.config import LlamaConfig

KVCache = Dict[str, jax.Array]


def init_kv_cache(
    cfg: LlamaConfig,
    batch: int,
    max_len: int,
    dtype=jnp.bfloat16,
    quantized: bool = False,
) -> KVCache:
    shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim)
    if quantized:
        return {
            "k": jnp.zeros(shape, dtype=jnp.int8),
            "v": jnp.zeros(shape, dtype=jnp.int8),
            "k_scale": jnp.zeros(shape[:-1], dtype=jnp.float32),
            "v_scale": jnp.zeros(shape[:-1], dtype=jnp.float32),
        }
    return {"k": jnp.zeros(shape, dtype=dtype), "v": jnp.zeros(shape, dtype=dtype)}


def init_segmented_kv_cache(
    cfg: LlamaConfig,
    batch: int,
    sizes,  # static per-segment slot counts; segment i covers absolute
    # positions [sum(sizes[:i]), sum(sizes[:i+1]))
    dtype=jnp.bfloat16,
    quantized: bool = False,
) -> KVCache:
    """Cache split into static segments for the growing-cache decode.

    Total memory equals one `init_kv_cache(sum(sizes))` buffer, but each
    decode phase only READS the segments written so far (attention combines
    them with exact online softmax, ops.attention.segmented_decode_attention)
    — no pad copies, no peak-memory spike."""
    return {
        "segs": [
            init_kv_cache(cfg, batch, s, dtype=dtype, quantized=quantized)
            for s in sizes
        ]
    }
