"""Measure the multi-task train step on the real chip at full 1B dims.

Reference per-GPU recipe (cfg/uni/h_text_ump+oimsam.py): flows uni bs3 +
mmu bs3 + plan bs2, stage3 tuning, bf16 compute. A 16 GB v5e cannot hold
fp32 masters + fp32 Adam moments for 1.45B trainable params, so this runs
the single-chip configuration: bf16 masters (TrainConfig.master_dtype) +
per-layer remat. Prints sec/step and an images+samples/s rate.

Env: TRAIN_UNI_BS/TRAIN_MMU_BS/TRAIN_PLAN_BS (default 3/3/2), TRAIN_TEXT_LEN
(default 128), TRAIN_REMAT (default 1), TRAIN_MASTER (default bfloat16),
TRAIN_MODE (default stage3).
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from plangen_tpu.config import OptimConfig, PlanGenModelConfig, TrainConfig
    from plangen_tpu.models import vlm
    from plangen_tpu.train.optim import make_optimizer
    from plangen_tpu.train.step import init_train_state, make_train_step

    cfg = PlanGenModelConfig()
    uni_bs = int(os.environ.get("TRAIN_UNI_BS", "3"))
    mmu_bs = int(os.environ.get("TRAIN_MMU_BS", "3"))
    plan_bs = int(os.environ.get("TRAIN_PLAN_BS", "2"))
    L = int(os.environ.get("TRAIN_TEXT_LEN", "128"))
    remat = os.environ.get("TRAIN_REMAT", "1") == "1"
    master = os.environ.get("TRAIN_MASTER", "bfloat16")
    mode = os.environ.get("TRAIN_MODE", "stage3")
    use_flash = os.environ.get("TRAIN_FLASH", "0") == "1"
    fused_ce = os.environ.get("TRAIN_FUSED_CE", "0") == "1"

    n_img = cfg.image_seq_len
    size = cfg.vision.image_size

    params = jax.jit(lambda k: vlm.init(k, cfg, dtype=jnp.float32))(
        jax.random.PRNGKey(0)
    )
    if mode.startswith("lora"):
        from plangen_tpu.train.lora import add_lora, init_lora

        params = add_lora(
            params,
            jax.jit(lambda k: init_lora(k, cfg.llama, rank=256, alpha=128))(
                jax.random.PRNGKey(2)
            ),
        )
    tcfg = TrainConfig(
        optim=OptimConfig(), gradient_checkpointing=remat, master_dtype=master,
        use_flash_attention=use_flash,
        fused_lm_ce=fused_ce,
    )
    tx, _ = make_optimizer(tcfg.optim, params, mode)
    flows = ((0, "uni"), (1, "mmu"), (2, "plan"))
    step = make_train_step(cfg, tcfg, tx, pad_id=2, flows=flows)
    state = init_train_state(params, tx, master_dtype=getattr(jnp, master))
    del params

    k = jax.random.PRNGKey(1)
    # mmu text length: prompt + 576 image-placeholder slots (reference caps
    # max_seq_len + 576, plangen_base.py:862-870)
    mmu_len = L + n_img
    seq_mask = np.zeros((mmu_bs, mmu_len), dtype=bool)
    seq_mask[:, 8 : 8 + n_img] = True
    batches = {
        0: {
            "input_ids": jax.random.randint(k, (uni_bs, L), 3, 1000),
            "attn_mask": jnp.ones((uni_bs, L + n_img), dtype=jnp.int32),
            "images": jax.random.uniform(
                k, (uni_bs, size, size, 3), minval=-1.0, maxval=1.0
            ),
        },
        1: {
            "input_ids": jax.random.randint(k, (mmu_bs, mmu_len), 3, 1000),
            "attn_mask": jnp.ones((mmu_bs, mmu_len), dtype=jnp.int32),
            "images": jax.random.uniform(
                k, (mmu_bs, size, size, 3), minval=-1.0, maxval=1.0
            ),
            "images_seq_mask": jnp.asarray(seq_mask),
        },
        2: {
            "input_ids": jax.random.randint(k, (plan_bs, L), 3, 1000),
            "attn_mask": jnp.ones((plan_bs, L), dtype=jnp.int32),
        },
    }

    t0 = time.perf_counter()
    state, metrics = step(state, batches)
    loss = float(metrics["loss"])
    print(f"compile+first step {time.perf_counter() - t0:.1f}s loss={loss:.3f}",
          flush=True)
    assert np.isfinite(loss)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        state, metrics = step(state, batches)
        _ = float(metrics["loss"])  # host sync
        times.append(time.perf_counter() - t0)
    sec = min(times)
    total_samples = uni_bs + mmu_bs + plan_bs
    print(
        f"train step: {sec*1e3:.0f} ms  (remat={remat} master={master} flash={use_flash} fused_ce={fused_ce} "
        f"mode={mode}; uni{uni_bs}+mmu{mmu_bs}+plan{plan_bs}, text_len={L})\n"
        f"throughput: {total_samples / sec:.2f} samples/s/chip, "
        f"{86400 / sec / 1000:.1f}k steps/day",
        flush=True,
    )


if __name__ == "__main__":
    main()
