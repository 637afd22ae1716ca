"""The released PlanGen training recipe, TPU-native.

Mirrors reference cfg/uni/h_text_ump+oimsam.py: multi-task uni+mmu over
[hico_full, oim, sam] (bs 3 each) + plan over NSR-1K layouts (bs 2),
textual coords + special tokens, stage3 tuning, 200k steps.
Set the dataset paths for your environment.
"""

from plangen_tpu.config import FlowConfig, PlanGenConfig, apply_overrides

CONFIG = apply_overrides(
    PlanGenConfig(),
    {
        "use_textual": True,
        "use_special_tokens": True,
        "train.tuning_mode": "stage3",
        "train.max_train_steps": 200_000,
        "train.train_data": (
            FlowConfig("uni", ["hico_full", "oim", "sam"], 3),
            FlowConfig("mmu", ["hico_full", "oim", "sam"], 3),
            FlowConfig("plan", "layout", 2),
        ),
        # dataset roots — fill in:
        # "janus_path": "/data/Janus-Pro-1B",
        # "layoutsam_path": "/data/LayoutSAM",
        # "grit_json": "/data/grit/train.json",
        # "oim_root": "/data/OID",
        # "nsr1k_path": "/data/LayoutGPT/dataset/NSR-1K",
    },
)
