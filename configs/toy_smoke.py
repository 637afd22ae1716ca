"""Tiny-model smoke config (CPU-runnable): the `_tiny` analogue."""

from plangen_tpu.config import (
    FlowConfig,
    PlanGenConfig,
    PlanGenModelConfig,
    apply_overrides,
)

CONFIG = apply_overrides(
    PlanGenConfig(model=PlanGenModelConfig.tiny(), janus_hw=32),
    {
        "train.train_data": (
            FlowConfig("uni", "toy", 2),
            FlowConfig("mmu", "toy", 2),
            FlowConfig("plan", "toy", 2),
        ),
        "train.max_train_steps": 20,
        "train.checkpointing_steps": 10,
        "train.output_dir": "out/toy_smoke",
        "generation.max_new_text_tokens": 8,
    },
)
