"""KV-cache pytree.

A preallocated static-shape cache: (k, v), each [L, B, S_max, Hkv, D].
Slot s holds the key/value for absolute position s of the (left-padded)
sequence; the pad mask [B, S_max] marks attendable slots. This replaces the
reference's HF DynamicCache (growing python list of tensors per step,
plangen_base.py:571-576) with a single buffer XLA can keep in HBM and update
in place (donated argument) — no reallocation, no host sync, scan-compatible.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from plangen_tpu.config import LlamaConfig

KVCache = Tuple[jax.Array, jax.Array]


def init_kv_cache(
    cfg: LlamaConfig, batch: int, max_len: int, dtype=jnp.bfloat16
) -> KVCache:
    shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim)
    return jnp.zeros(shape, dtype=dtype), jnp.zeros(shape, dtype=dtype)
