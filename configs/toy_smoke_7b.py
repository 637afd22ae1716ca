"""Tiny smoke config with the 7B family member's SHAPE relationships.

Same toy flows as toy_smoke.py but the model is
`PlanGenModelConfig.tiny_7b()` (deeper stack, more heads, non-2x MLP ratio,
hidden != tiny's 64) — used by the cross-implementation parity suite to prove
no 1B dimension is hardcoded (tests/test_capture_reference.py).
"""

from plangen_tpu.config import (
    FlowConfig,
    PlanGenConfig,
    PlanGenModelConfig,
    apply_overrides,
)

CONFIG = apply_overrides(
    PlanGenConfig(model=PlanGenModelConfig.tiny_7b(), janus_hw=32),
    {
        "train.train_data": (
            FlowConfig("uni", "toy", 2),
            FlowConfig("mmu", "toy", 2),
            FlowConfig("plan", "toy", 2),
        ),
        "train.max_train_steps": 20,
        "train.checkpointing_steps": 10,
        "train.output_dir": "out/toy_smoke_7b",
        "generation.max_new_text_tokens": 8,
    },
)
