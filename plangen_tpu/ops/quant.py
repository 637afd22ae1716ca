"""Weight-only int8 quantization for the decode hot path.

The 576-step decode is HBM-bound on weight reads (~3.4 GB bf16 per step for
the 1B model). Storing matmul weights as int8 with per-output-channel fp32
scales halves that traffic; XLA fuses the int8->bf16 convert into the matmul
on TPU. Symmetric per-channel absmax quantization (the standard weight-only
serving scheme). Opt-in: the fp32/bf16 path remains the default and the
training path is untouched.

Quantized leaves are dicts {"w_q8": int8 [..., in, out], "scale": fp32
[..., 1, out]} detected structurally by `qmatmul`.
"""

from __future__ import annotations

from typing import Any, Dict, Union

import jax
import jax.numpy as jnp

QuantWeight = Dict[str, jax.Array]


def quantize_weight(w: jax.Array) -> QuantWeight:
    """Symmetric per-output-channel int8 quantization of [..., in, out]."""
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)  # [..., 1, out]
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"w_q8": q, "scale": scale.astype(jnp.float32)}


def dequantize_weight(q: QuantWeight, dtype=jnp.bfloat16) -> jax.Array:
    return (q["w_q8"].astype(jnp.float32) * q["scale"]).astype(dtype)


def is_quantized(w: Any) -> bool:
    return isinstance(w, dict) and "w_q8" in w


def qmatmul(x: jax.Array, w: Union[jax.Array, QuantWeight]) -> jax.Array:
    """x @ w for plain or quantized weights (dequant fused into the matmul)."""
    if not is_quantized(w):
        return x @ w
    out = x @ w["w_q8"].astype(x.dtype)
    return out * w["scale"].astype(x.dtype)[..., 0, :]


_LM_QUANT_KEYS = (
    "q_proj",
    "k_proj",
    "v_proj",
    "o_proj",
    "gate_proj",
    "up_proj",
    "down_proj",
)


def quantize_lm_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize the decode-dominant weights: LM layer matmuls, lm_head, and
    the gen_head classifier. Norms/embeddings stay full precision."""
    out = dict(params)
    lm = dict(out["language_model"])
    layers = dict(lm["layers"])
    for k in _LM_QUANT_KEYS:
        layers[k] = quantize_weight(layers[k])
    lm["layers"] = layers
    lm["lm_head"] = quantize_weight(lm["lm_head"])
    out["language_model"] = lm
    gen_head = {k: dict(v) for k, v in out["gen_head"].items()}
    gen_head["fc2"]["w"] = quantize_weight(gen_head["fc2"]["w"])
    out["gen_head"] = gen_head
    return out
