"""Multi-task pjit train step.

Reference hot loop (train.py:163-217 + System.forward plangen_base.py:1054-1085):
one optimizer step = one forward per task flow, weighted loss sum, DDP
all-reduce, AdamW, clip. Here the whole thing is ONE jitted program over the
device mesh: XLA inserts psum over the data axis for gradient reduction (the
NCCL all-reduce equivalent, riding ICI), and all flows' forwards fuse into a
single compiled step — no per-flow Python dispatch.

Mixed precision: parameters live in fp32 (optimizer master copy) and are cast
to `compute_dtype` (bf16) inside the loss, matching Accelerate's bf16
autocast semantics (train.py:58-64); losses are fp32.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from plangen_tpu.config import PlanGenModelConfig, TrainConfig
from plangen_tpu.train.loss import mmu_loss, plan_loss, t2i_loss

Params = Any


class TrainState(NamedTuple):
    params: Params
    opt_state: Any
    step: jax.Array


def _cast(tree, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )


def make_loss_fn(
    model_cfg: PlanGenModelConfig,
    train_cfg: TrainConfig,
    pad_id: int,
    flows: Sequence[Tuple[int, str]],  # (flow_id, task_type)
    compute_dtype=jnp.bfloat16,
    trainable_mask: Optional[Any] = None,
    ablate: frozenset = frozenset(),
) -> Callable:
    """Build `loss_fn(params, batches) -> (total, loss_dict)`.

    Batch format per flow (all arrays, data-sharded on dim 0):
      uni/t2i: {input_ids [B,L], attn_mask [B,L+N], images [B,H,W,3]}
      mmu:     {input_ids, attn_mask, images, images_seq_mask}
      plan:    {input_ids, attn_mask}

    Loss weighting matches reference forward (plangen_base.py:1077-1084):
    per-key `loss_scales[f"{key}_{flow_id}"]` then `plan_lr_scale` on every
    '*lm*' key.

    `trainable_mask` (make_optimizer's bool pytree) enables freeze-aware
    backward: frozen leaves are wrapped in stop_gradient so XLA dead-codes
    their weight-gradient matmuls (and, for frozen towers with nothing
    trainable upstream — SigLIP in stage1 — the whole tower backward).
    Numerically identical to the unmasked step: those grads were zeroed by
    optim.py's set_to_zero anyway (tests/test_train.py pins equality).

    `ablate` is DIAGNOSTIC ONLY (tools/bench_train_budget.py): "vq",
    "siglip", "heads" per train/loss.py.
    """
    flows = tuple(flows)
    scales = dict(train_cfg.loss_scales)
    plan_lr_scale = train_cfg.plan_lr_scale
    remat = train_cfg.gradient_checkpointing
    if remat:
        # named policy ("full" = plain jax.checkpoint) — ops/remat.py
        remat = getattr(train_cfg, "remat_policy", "full")
    use_flash = getattr(train_cfg, "use_flash_attention", False)
    fused_ce = getattr(train_cfg, "fused_lm_ce", False)
    use_local_edit_loss = getattr(train_cfg, "use_local_edit_loss", False)

    def loss_fn(params, batches):
        if trainable_mask is not None:
            params = jax.tree_util.tree_map(
                lambda p, t: p if t else jax.lax.stop_gradient(p),
                params, trainable_mask,
            )
        cparams = _cast(params, compute_dtype)
        loss_dict: Dict[str, jax.Array] = {}
        for flow_id, task in flows:
            b = batches[flow_id]
            if task in ("uni", "t2i"):
                ld = t2i_loss(
                    cparams,
                    model_cfg,
                    b["input_ids"],
                    b["attn_mask"],
                    b["images"].astype(compute_dtype),
                    pad_id,
                    is_uni=(task == "uni"),
                    # use_local_edit_loss: image CE restricted to the edit
                    # region (plangen_base.py:947-951)
                    local_edit_region=(
                        b["edit_region"] if use_local_edit_loss and "edit_region" in b
                        else None
                    ),
                    remat=remat,
                    use_flash=use_flash,
                    fused_ce=fused_ce,
                    ablate=ablate,
                )
            elif task == "mmu":
                ld = mmu_loss(
                    cparams,
                    model_cfg,
                    b["input_ids"],
                    b["attn_mask"],
                    b["images"].astype(compute_dtype),
                    b["images_seq_mask"],
                    pad_id,
                    remat=remat,
                    use_flash=use_flash,
                    fused_ce=fused_ce,
                    ablate=ablate,
                )
            elif task == "plan":
                ld = plan_loss(
                    cparams,
                    model_cfg,
                    b["input_ids"],
                    b["attn_mask"],
                    pad_id,
                    remat=remat,
                    use_flash=use_flash,
                    fused_ce=fused_ce,
                    ablate=ablate,
                )
            else:
                raise ValueError(f"unknown task type {task!r}")
            loss_dict.update({f"{k}_{flow_id}": v for k, v in ld.items()})

        total = jnp.float32(0.0)
        for k, v in loss_dict.items():
            v = v * scales.get(k, 1.0)
            if plan_lr_scale is not None and "lm" in k:
                v = v * plan_lr_scale
            loss_dict[k] = v
            total = total + v
        return total, loss_dict

    return loss_fn


def make_train_step(
    model_cfg: PlanGenModelConfig,
    train_cfg: TrainConfig,
    tx: optax.GradientTransformation,
    pad_id: int,
    flows: Sequence[Tuple[int, str]],  # (flow_id, task_type)
    compute_dtype=jnp.bfloat16,
    donate: bool = True,
    state_shardings: Optional[TrainState] = None,
    # TrainState of NamedShardings (e.g. FSDP) to pin the output state layout;
    # without it jit may re-replicate sharded parameters after the update
    trainable_mask: Optional[Any] = None,  # freeze-aware backward (see
    # make_loss_fn): pass make_optimizer's mask to skip frozen-subtree
    # gradient work; numerically identical, strictly less compute
    ablate: frozenset = frozenset(),  # DIAGNOSTIC ONLY (make_loss_fn)
) -> Callable:
    """Build the jitted multi-task train step (see make_loss_fn for batch
    format and loss weighting)."""
    loss_fn = make_loss_fn(
        model_cfg, train_cfg, pad_id, flows, compute_dtype,
        trainable_mask=trainable_mask, ablate=ablate,
    )

    jit_kwargs = {}
    if state_shardings is not None:
        jit_kwargs["out_shardings"] = (state_shardings, None)

    @partial(jax.jit, donate_argnums=(0,) if donate else (), **jit_kwargs)
    def train_step(state: TrainState, batches):
        (loss, loss_dict), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batches
        )
        # grads in the master dtype: fp32 masters get fp32 grads as before;
        # bf16 masters (single-chip finetune) must NOT upcast — the fp32
        # grad + update copies alone exceed a v5e's HBM at 1B scale
        grads = jax.tree_util.tree_map(
            lambda g, p: g.astype(p.dtype)
            if jnp.issubdtype(p.dtype, jnp.floating) else g,
            grads, state.params,
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(new_params, new_opt_state, state.step + 1)
        metrics = {"loss": loss, **loss_dict}
        return new_state, metrics

    return train_step


def init_train_state(
    params: Params,
    tx: optax.GradientTransformation,
    master_dtype=jnp.float32,
) -> TrainState:
    """Build the train state. `master_dtype=jnp.bfloat16` halves parameter
    memory for single-chip finetuning (e.g. LoRA, where the frozen base never
    receives updates and optax.masked allocates moments only for trainable
    leaves); full-precision masters stay the default for from-scratch/stage
    training."""
    params = _cast(params, master_dtype)
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        step=jnp.zeros((), dtype=jnp.int32),
    )


def state_shardings_of(state: TrainState) -> TrainState:
    """Extract the current sharding of every leaf (for `state_shardings`)."""
    return jax.tree_util.tree_map(lambda x: x.sharding, state)
