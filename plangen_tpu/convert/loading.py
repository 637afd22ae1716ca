"""Model weight resolution for pipelines and the trainer.

The reference loads the Janus-Pro base + optional PlanGen fine-tune overlay
at startup (plangen_base.py / base_system.py resume). Here every entry point
(eval, serve, train, golden parity) resolves weights the same way:

  1. `cfg.params_path`   — an orbax artifact written by `cli convert`
                           (fastest: already in the JAX layout);
  2. `cfg.janus_path`    — a local HF checkout with model weights
                           (+ `cfg.finetune_path` partial-state overlay),
                           converted on the fly;
  3. neither             — random init (smoke tests / API demos), with a
                           visible warning so nobody mistakes noise for the
                           model.
"""

from __future__ import annotations

import os
import sys
from typing import Any, Optional

from plangen_tpu.config import PlanGenConfig


def _has_weight_files(path: Optional[str]) -> bool:
    if not path or not os.path.isdir(path):
        return False
    names = os.listdir(path)
    return any(
        n.endswith(".safetensors") or n.startswith("pytorch_model")
        for n in names
    )


def load_params(cfg: PlanGenConfig, dtype=None) -> Optional[Any]:
    """Resolve model weights per the precedence above; None = random init."""
    import jax
    import jax.numpy as jnp

    if dtype is None:
        dtype = getattr(jnp, getattr(cfg, "param_dtype", "bfloat16"))

    params_path = getattr(cfg, "params_path", None)
    if params_path:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        params = ckptr.restore(os.path.abspath(params_path))

        # quantization scales must STAY fp32: the compute folds them in at
        # full precision, and a bf16 downcast would silently degrade every
        # dequantized weight. Detection is STRUCTURAL (a dict holding
        # "w_q8"/"w_p4") — the bare name "scale" also names LayerNorm gains
        # in the SigLIP/VQ towers, which must keep getting the dtype cast.
        def cast_leaf(x):
            x = jnp.asarray(x)
            if jnp.issubdtype(x.dtype, jnp.floating):
                return x.astype(dtype)
            return x

        def walk(node):
            if isinstance(node, dict):
                if "w_q8" in node or "w_p4" in node:
                    return jax.tree_util.tree_map(jnp.asarray, node)
                return {k: walk(v) for k, v in node.items()}
            if isinstance(node, (list, tuple)):
                return type(node)(walk(v) for v in node)
            return cast_leaf(node)

        return walk(params)

    if _has_weight_files(cfg.janus_path):
        from plangen_tpu.convert.torch_to_jax import load_janus_checkpoint

        params = load_janus_checkpoint(
            cfg.janus_path, cfg.model,
            finetune_path=getattr(cfg, "finetune_path", None),
            dtype=dtype,
        )
        return jax.tree_util.tree_map(jnp.asarray, params)

    print(
        "plangen_tpu: no weights found (params_path/janus_path unset or "
        "weightless) — using RANDOM init", file=sys.stderr,
    )
    return None
