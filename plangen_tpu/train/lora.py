"""LoRA adapters for the LM attention projections.

Reference 'lora' tuning mode (plangen_base.py:162-173): peft LoraConfig with
r=lora_rank (256), alpha=lora_alpha (128), gaussian init, targets
q/k/v/o_proj; token embeddings optionally unfrozen when special tokens were
added (tune_token_when_lora, plangen_base.py:171-173). Here adapters are
layer-stacked arrays living under params["language_model"]["lora"], consumed
directly by the llama layer scan (models/llama.py _lora_delta) — no module
wrapping, no graph surgery.

`merge_lora` folds adapters into the base weights for adapter-free serving.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from plangen_tpu.config import LlamaConfig

TARGETS = ("q_proj", "k_proj", "v_proj", "o_proj")


def init_lora(
    key: jax.Array,
    cfg: LlamaConfig,
    rank: int = 256,
    alpha: int = 128,
    dtype=jnp.float32,
) -> Dict[str, Any]:
    """Build the stacked LoRA tree: A gaussian (std 1/rank), B zeros."""
    L = cfg.num_layers
    dims = {
        "q_proj": (cfg.hidden_size, cfg.q_dim),
        "k_proj": (cfg.hidden_size, cfg.kv_dim),
        "v_proj": (cfg.hidden_size, cfg.kv_dim),
        "o_proj": (cfg.q_dim, cfg.hidden_size),
    }
    keys = jax.random.split(key, len(TARGETS))
    tree: Dict[str, Any] = {"scaling": jnp.asarray(alpha / rank, dtype=jnp.float32)}
    for k, name in zip(keys, TARGETS):
        din, dout = dims[name]
        tree[name] = {
            "a": (jax.random.normal(k, (L, din, rank)) * (1.0 / rank)).astype(dtype),
            "b": jnp.zeros((L, rank, dout), dtype=dtype),
        }
    return tree


def add_lora(params: Dict[str, Any], lora_tree: Dict[str, Any]) -> Dict[str, Any]:
    out = dict(params)
    lm = dict(out["language_model"])
    lm["lora"] = lora_tree
    out["language_model"] = lm
    return out


def merge_lora(params: Dict[str, Any]) -> Dict[str, Any]:
    """Fold `W + A @ B * scaling` into the base weights, dropping adapters."""
    lm = dict(params["language_model"])
    lora = lm.pop("lora", None)
    if lora is None:
        return params
    scale = lora["scaling"]
    layers = dict(lm["layers"])
    for name in TARGETS:
        if name in lora:
            delta = jnp.einsum(
                "lir,lro->lio", lora[name]["a"], lora[name]["b"]
            ) * scale
            layers[name] = (
                layers[name].astype(jnp.float32) + delta.astype(jnp.float32)
            ).astype(layers[name].dtype)
    lm["layers"] = layers
    out = dict(params)
    out["language_model"] = lm
    return out
