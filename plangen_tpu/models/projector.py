"""MLP projectors (aligner / gen_aligner) and the gen_head classifier.

Reference: janus/models/projector.py:27-86 (`mlp_gelu` type: Linear ->
(GELU -> Linear) x (depth-1), exact-erf GELU) and modeling_vlm.py:36-51
(vision_head: Linear -> GELU -> Linear to the image codebook size).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from plangen_tpu.config import ProjectorConfig
from plangen_tpu.ops.quant import qmatmul

Params = Dict[str, Any]


def _linear(key, in_dim, out_dim, dtype):
    scale = in_dim ** -0.5
    return {
        "w": (jax.random.normal(key, (in_dim, out_dim)) * scale).astype(dtype),
        "b": jnp.zeros((out_dim,), dtype=dtype),
    }


def init(key: jax.Array, cfg: ProjectorConfig, dtype=jnp.bfloat16) -> Params:
    if cfg.projector_type == "identity":
        return {"layers": []}
    if cfg.projector_type == "linear":
        return {"layers": [_linear(key, cfg.input_dim, cfg.n_embed, dtype)]}
    if cfg.projector_type == "mlp_gelu":
        keys = jax.random.split(key, cfg.depth)
        layers = [_linear(keys[0], cfg.input_dim, cfg.n_embed, dtype)]
        for i in range(1, cfg.depth):
            layers.append(_linear(keys[i], cfg.n_embed, cfg.n_embed, dtype))
        return {"layers": layers}
    raise ValueError(f"unknown projector type {cfg.projector_type}")


def forward(params: Params, x: jax.Array) -> jax.Array:
    layers = params["layers"]
    if not layers:
        return x
    x = x @ layers[0]["w"] + layers[0]["b"]
    for lyr in layers[1:]:
        x = jax.nn.gelu(x, approximate=False)
        x = x @ lyr["w"] + lyr["b"]
    return x


def init_gen_head(
    key: jax.Array, n_embed: int, image_token_embed: int, image_token_size: int, dtype
) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "fc1": _linear(k1, n_embed, image_token_embed, dtype),
        "fc2": _linear(k2, image_token_embed, image_token_size, dtype),
    }


def gen_head_forward(params: Params, hidden: jax.Array) -> jax.Array:
    """Image-token logits, returned in fp32 for the CFG/sampling math."""
    x = hidden @ params["fc1"]["w"] + params["fc1"]["b"]
    x = jax.nn.gelu(x, approximate=False)
    x = qmatmul(x, params["fc2"]["w"]) + params["fc2"]["b"]
    return x.astype(jnp.float32)
