"""Rematerialization policies for the training forwards.

`jax.checkpoint` with no policy (the round-4 default) saves ONLY the layer
inputs and recomputes the whole layer in the backward — the blanket "+2NT"
extra forward in the train-step floor model. XLA's selective policies keep
chosen intermediates instead, trading HBM for recompute FLOPs:

  full          save layer inputs only (max memory saving, full recompute)
  dots          save every matmul output (`dots_saveable`): the backward
                reuses projections/MLP products and recomputes only the
                cheap elementwise chain — near-zero recompute at the cost
                of O(B*T*(q+kv+o+3*inter)) saved activations per layer
  dots_no_batch save only matmuls without batch dims (contraction-style
                dots; transformer layer matmuls all carry batch dims, so
                this is close to `full` for this model — kept for sweeps)

Whether `dots` FITS is a measured question per shape: tools/
bench_train_budget.py compiles each policy and records
`compiled.memory_analysis()` bytes next to ms/step.

Reference counterpart: torch `gradient_checkpointing_enable` (full-layer
only); the policy spectrum is TPU/XLA-native (jax.checkpoint_policies).
"""

from __future__ import annotations

from typing import Any, Callable, Union

import jax

Remat = Union[bool, str]  # False | True ("full") | policy name

_POLICIES = {
    "full": None,  # jax.checkpoint default: save inputs, recompute all
    "dots": "dots_saveable",
    "dots_no_batch": "dots_with_no_batch_dims_saveable",
}


def wrap_remat(body: Callable[..., Any], remat: Remat) -> Callable[..., Any]:
    """Apply jax.checkpoint to `body` per the remat flag/policy name."""
    if not remat:
        return body
    name = remat if isinstance(remat, str) else "full"
    if name not in _POLICIES:
        raise ValueError(
            f"unknown remat policy {name!r}; options: {sorted(_POLICIES)}"
        )
    attr = _POLICIES[name]
    if attr is None:
        return jax.checkpoint(body)
    return jax.checkpoint(body, policy=getattr(jax.checkpoint_policies, attr))
