"""Optimizer construction: AdamW + clip + trainable-subset masking.

Reference recipe (cfg/base.py:53-60, train.py:143-155): AdamW lr 5e-5
betas (0.9, 0.999) eps 1e-8 wd 0.01, grad-clip 1.0, constant schedule with
optional warmup, gradient accumulation. Tuning modes (plangen_base.py:149-208)
freeze parameter subtrees:

  all    — everything trainable
  lm     — language_model only
  stage1 — aligner + gen_aligner + gen_head
  stage2 — all but vision_model and gen_vision_model
  stage3 — all but gen_vision_model        (the released recipe)

Masking uses `optax.masked` over path predicates; frozen params get zero
updates and are excluded from weight decay. LoRA (reference 'lora' mode via
peft) is provided separately in plangen_tpu.train.lora.

`OptimConfig.optimizer="adafactor"` swaps AdamW for factored-second-moment
Adafactor (no first moment): optimizer state drops from 2x trainable params
to ~rows+cols per matrix, which makes full stage3 fit a single 16 GB chip
(the AdamW stage3 path needs >=2 chips with FSDP — DESIGN.md section 6).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import optax

from plangen_tpu.config import OptimConfig

TUNING_MODES: Dict[str, Callable[[str], bool]] = {
    "all": lambda p: True,
    "lm": lambda p: p.startswith("language_model"),
    "stage1": lambda p: p.startswith(("aligner", "gen_aligner", "gen_head")),
    "stage2": lambda p: not p.startswith(("vision_model", "gen_vision_model")),
    "stage3": lambda p: not p.startswith("gen_vision_model"),
    # LoRA adapters only / adapters + token embeddings (tune_token_when_lora);
    # the constant 'scaling' scalar stays frozen
    "lora": lambda p: (
        "/lora/" in p or p.startswith("language_model/lora")
    ) and not p.endswith("scaling"),
    "lora_tokens": lambda p: (
        (("/lora/" in p or p.startswith("language_model/lora"))
         and not p.endswith("scaling"))
        or p == "language_model/embed_tokens"
    ),
}


from plangen_tpu.utils.pytree import path_str as _path_str  # shared with
# parallel/mesh.py: both rule sets match the same "a/b/c" strings


def trainable_mask(params: Any, tuning_mode: str) -> Any:
    """Boolean pytree: True = trainable under the given tuning mode."""
    if tuning_mode not in TUNING_MODES:
        raise ValueError(
            f"unknown tuning_mode {tuning_mode!r}; options: {sorted(TUNING_MODES)}"
        )
    pred = TUNING_MODES[tuning_mode]
    return jax.tree_util.tree_map_with_path(
        lambda path, _: pred(_path_str(path)), params
    )


def count_params(params: Any, mask: Any = None) -> Dict[str, int]:
    """Trainable/frozen param counts (reference param report,
    base_system.py:203-226)."""
    sizes = jax.tree_util.tree_map(lambda x: int(x.size), params)
    total = sum(jax.tree_util.tree_leaves(sizes))
    if mask is None:
        return {"total": total, "trainable": total}
    trainable = sum(
        s for s, m in zip(
            jax.tree_util.tree_leaves(sizes), jax.tree_util.tree_leaves(mask)
        ) if m
    )
    return {"total": total, "trainable": trainable}


def make_lr_schedule(cfg: OptimConfig) -> optax.Schedule:
    if cfg.lr_scheduler == "constant":
        if cfg.lr_warmup_steps > 0:
            return optax.linear_schedule(
                0.0, cfg.learning_rate, cfg.lr_warmup_steps
            )
        return optax.constant_schedule(cfg.learning_rate)
    if cfg.lr_scheduler == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, cfg.learning_rate, cfg.lr_warmup_steps, 1_000_000
        )
    raise ValueError(f"unknown lr_scheduler {cfg.lr_scheduler}")


def make_optimizer(
    cfg: OptimConfig, params: Any, tuning_mode: str = "stage3"
) -> tuple[optax.GradientTransformation, Any]:
    """Returns (tx, trainable_mask_tree)."""
    mask = trainable_mask(params, tuning_mode)
    frozen = jax.tree_util.tree_map(lambda m: not m, mask)
    if cfg.optimizer == "adafactor":
        # Factored second moment (row+col vectors for matrices >=128 wide),
        # no first moment: state is ~0 bytes next to AdamW's 2x-params
        # moments, which is what lets full stage3 (1.45B trainable) fit one
        # 16 GB chip (DESIGN.md section 6). multiply_by_parameter_scale is
        # OFF so `learning_rate` keeps the reference recipe's Adam-style
        # magnitude (update = lr * g / sqrt(v^)), not T5's relative step
        # size; Adafactor's own RMS update clipping (threshold 1.0) stays.
        # optax.adafactor applies add_decayed_weights AFTER
        # scale_by_learning_rate, so weight_decay_rate is a PER-STEP decay
        # fraction, NOT AdamW's lr-scaled decoupled decay — passing the raw
        # recipe wd (0.01) would shrink every weight by 1%/step and collapse
        # training in ~2k steps. AdamW's effective decay is lr*wd per step;
        # reproduce that (exact for the constant-lr reference recipe; during
        # a warmup phase AdamW's decay ramps with lr while this stays
        # constant — a negligible, documented mismatch).
        wd = cfg.adam_weight_decay * cfg.learning_rate
        inner = optax.adafactor(
            learning_rate=make_lr_schedule(cfg),
            multiply_by_parameter_scale=False,
            momentum=None,
            weight_decay_rate=wd or None,
        )
    elif cfg.optimizer == "adamw":
        inner = optax.adamw(
            learning_rate=make_lr_schedule(cfg),
            b1=cfg.adam_beta1,
            b2=cfg.adam_beta2,
            eps=cfg.adam_epsilon,
            weight_decay=cfg.adam_weight_decay,
        )
    else:
        raise ValueError(
            f"unknown optimizer {cfg.optimizer!r}; options: adamw, adafactor"
        )
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        inner,
    )
    # optax.masked applies tx to trainable leaves but passes raw gradients
    # through for the rest — frozen leaves must be explicitly zeroed
    tx = optax.chain(
        optax.masked(tx, mask),
        optax.masked(optax.set_to_zero(), frozen),
    )
    if cfg.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, cfg.gradient_accumulation_steps)
    return tx, mask
