"""Measure the multi-task train step on the real chip at full 1B dims.

Reference per-GPU recipe (cfg/uni/h_text_ump+oimsam.py): flows uni bs3 +
mmu bs3 + plan bs2, stage3 tuning, bf16 compute. A 16 GB v5e cannot hold
fp32 masters + fp32 Adam moments for 1.45B trainable params, so the
single-chip configurations are bf16 masters (TrainConfig.master_dtype) +
per-layer remat; full stage3 is the documented >=2-chip FSDP path and its
single-chip OOM is RECORDED as an error row, not skipped.

Writes one row per tuning mode to BENCH_SWEEP.json under "train"
(read-merge-write like the decode sweep) so every published training number
is a machine-readable artifact: step ms, samples/s, tokens/s, device memory,
and % of a stated compute-roofline estimate.

Env: BENCH_TRAIN_MODES (default "lora,stage1,stage3"), TRAIN_UNI_BS/
TRAIN_MMU_BS/TRAIN_PLAN_BS (default 3/3/2), TRAIN_TEXT_LEN (default 128),
TRAIN_REMAT (default 1), TRAIN_MASTER (default bfloat16), TRAIN_FLASH,
TRAIN_FUSED_CE.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

# v5e bf16 matmul peak (public spec: 197 TFLOP/s bf16). The roofline
# estimate below is COMPUTE-side: training at these batch/seq sizes is
# MXU-bound, not HBM-bound like decode.
V5E_BF16_FLOPS = float(os.environ.get("BENCH_MXU_TFLOPS", "197")) * 1e12


def _lm_param_count(cfg) -> int:
    lm = cfg.llama
    layer = (
        lm.hidden_size * lm.q_dim + 2 * lm.hidden_size * lm.kv_dim
        + lm.q_dim * lm.hidden_size + 3 * lm.hidden_size * lm.intermediate_size
    )
    return lm.num_layers * layer


def build_mode(mode: str, cfg, shapes, flows=None, ablate=frozenset(),
               remat_policy=None, freeze_stop_grad=True):
    """(step, state, batches) for one tuning mode at the given shapes —
    shared by the timing bench, tools/bench_memory.py's compile-only byte
    accounting, and tools/bench_train_budget.py's component ablations.

    `flows` restricts to a subset of ((id, task), ...) — batches are built
    for those only. `ablate`/`remat_policy`/`freeze_stop_grad` mirror
    make_train_step's diagnostics and levers."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from plangen_tpu.config import OptimConfig, TrainConfig
    from plangen_tpu.models import vlm
    from plangen_tpu.train.optim import make_optimizer
    from plangen_tpu.train.step import init_train_state, make_train_step

    uni_bs, mmu_bs, plan_bs, L, remat, master, use_flash, fused_ce = shapes
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
        optim=OptimConfig(optimizer=os.environ.get("TRAIN_OPT", "adamw")),
        gradient_checkpointing=remat, master_dtype=master,
        use_flash_attention=use_flash, fused_lm_ce=fused_ce,
        remat_policy=remat_policy or os.environ.get("TRAIN_REMAT_POLICY",
                                                    "full"),
    )
    tx, mask = make_optimizer(tcfg.optim, params, mode)
    if flows is None:
        flows = ((0, "uni"), (1, "mmu"), (2, "plan"))
    step = make_train_step(cfg, tcfg, tx, pad_id=2, flows=flows,
                           trainable_mask=mask if freeze_stop_grad else None,
                           ablate=ablate)
    state = init_train_state(params, tx, master_dtype=getattr(jnp, master))
    del params

    k = jax.random.PRNGKey(1)
    # cap synthetic ids to the actual vocab — OOB ids gather garbage
    # embeddings and the loss goes NaN (bites tiny test configs, vocab 512)
    hi = min(1000, cfg.llama.vocab_size)
    # mmu text length: prompt + 576 image-placeholder slots (reference caps
    # max_seq_len + 576, plangen_base.py:862-870)
    mmu_len = L + n_img
    seq_mask = np.zeros((mmu_bs, mmu_len), dtype=bool)
    seq_mask[:, 8 : 8 + n_img] = True
    batches = {
        0: {
            "input_ids": jax.random.randint(k, (uni_bs, L), 3, hi),
            "attn_mask": jnp.ones((uni_bs, L + n_img), dtype=jnp.int32),
            "images": jax.random.uniform(
                k, (uni_bs, size, size, 3), minval=-1.0, maxval=1.0
            ),
        },
        1: {
            "input_ids": jax.random.randint(k, (mmu_bs, mmu_len), 3, hi),
            "attn_mask": jnp.ones((mmu_bs, mmu_len), dtype=jnp.int32),
            "images": jax.random.uniform(
                k, (mmu_bs, size, size, 3), minval=-1.0, maxval=1.0
            ),
            "images_seq_mask": jnp.asarray(seq_mask),
        },
        2: {
            "input_ids": jax.random.randint(k, (plan_bs, L), 3, hi),
            "attn_mask": jnp.ones((plan_bs, L), dtype=jnp.int32),
        },
    }
    batches = {fid: batches[fid] for fid, _ in flows}
    return step, state, batches, tcfg


def bench_mode(mode: str, cfg, shapes) -> dict:
    import numpy as np

    uni_bs, mmu_bs, plan_bs, L, remat, master, use_flash, fused_ce = shapes
    n_img = cfg.image_seq_len
    mmu_len = L + n_img
    step, state, batches, tcfg = build_mode(mode, cfg, shapes)

    # AOT lower+compile: memory_analysis() gives the executable's real
    # byte footprint (memory_stats() is dead on axon — returns {}), and the
    # compiled object then executes directly, so this costs no extra compile
    from plangen_tpu.utils.memory import lower_and_analyze

    t0 = time.perf_counter()
    compiled, mem = lower_and_analyze(step, state, batches)
    compile_s = time.perf_counter() - t0
    state, metrics = compiled(state, batches)
    loss = float(metrics["loss"])
    first_s = time.perf_counter() - t0 - compile_s
    print(f"[{mode}] compile {compile_s:.1f}s + first step {first_s:.1f}s "
          f"loss={loss:.3f} mem={mem and mem.get('total_gb')}GB", flush=True)
    assert np.isfinite(loss)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        state, metrics = compiled(state, batches)
        _ = float(metrics["loss"])  # host sync
        times.append(time.perf_counter() - t0)
    sec = min(times)

    total_samples = uni_bs + mmu_bs + plan_bs
    # LM tokens per step (the compute-dominant tower; SigLIP/VQ excluded
    # from the roofline estimate, stated in the note)
    lm_tokens = uni_bs * (L + n_img) + mmu_bs * mmu_len + plan_bs * L
    n_lm = _lm_param_count(cfg)
    # fwd 2NT + bwd 4NT, +2NT fwd recompute under remat
    flops = (8 if remat else 6) * n_lm * lm_tokens
    floor_s = flops / V5E_BF16_FLOPS
    return {
        "mode": mode,
        "optimizer": tcfg.optim.optimizer,
        # per-row shape stamp: the section-level "shapes" reflects only
        # the LAST run, while merged rows may come from different ones
        "text_len": L,
        "master_dtype": master,
        "remat": remat,
        "ms_per_step": round(sec * 1e3, 1),
        "samples_per_sec": round(total_samples / sec, 2),
        "lm_tokens_per_sec": round(lm_tokens / sec, 1),
        "steps_per_day_k": round(86400 / sec / 1000, 1),
        # compiled.memory_analysis() breakdown (GB): total = args + outputs
        # + temps - aliased (donated state counted once)
        "memory": mem,
        "compute_floor_ms": round(floor_s * 1e3, 1),
        "pct_of_compute_floor": round(100.0 * floor_s / sec, 1),
        "compile_s": round(compile_s, 1),
        "loss_finite": True,
    }


def merge_train_rows(old_rows, new_rows, run_text_len):
    """Row merge key is (mode, optimizer, text_len): a T=700 refresh must
    sit NEXT TO the committed T=128 rows (VERDICT r5 #3 wants the
    {128, 512, 700} matrix), not replace them. Pre-r5 rows lack the
    per-row text_len stamp and were all measured at 128."""
    fresh = {(r["mode"], r.get("optimizer", "adamw"),
              r.get("text_len", run_text_len)) for r in new_rows}
    kept = [r for r in old_rows
            if (r.get("mode"), r.get("optimizer", "adamw"),
                r.get("text_len", 128)) not in fresh]
    return kept + new_rows


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass
    from plangen_tpu.config import PlanGenModelConfig

    cfg = PlanGenModelConfig()
    shapes = (
        int(os.environ.get("TRAIN_UNI_BS", "3")),
        int(os.environ.get("TRAIN_MMU_BS", "3")),
        int(os.environ.get("TRAIN_PLAN_BS", "2")),
        int(os.environ.get("TRAIN_TEXT_LEN", "128")),
        os.environ.get("TRAIN_REMAT", "1") == "1",
        os.environ.get("TRAIN_MASTER", "bfloat16"),
        os.environ.get("TRAIN_FLASH", "0") == "1",
        os.environ.get("TRAIN_FUSED_CE", "0") == "1",
    )
    modes = os.environ.get("BENCH_TRAIN_MODES", "lora,stage1,stage3").split(",")
    out_path = Path(__file__).parent.parent / "BENCH_SWEEP.json"
    rows = []
    for mode in [m.strip() for m in modes if m.strip()]:
        try:
            rows.append(bench_mode(mode, cfg, shapes))
        except Exception as e:  # records e.g. stage3's single-chip OOM
            import re
            note = re.sub(r"\x1b\[[0-9;]*m", "", str(e))  # strip ANSI codes
            rows.append({"mode": mode,
                         "optimizer": os.environ.get("TRAIN_OPT", "adamw"),
                         # stamp the shape even on failure: merge_train_rows
                         # keys by (mode, optimizer, text_len), and an
                         # unstamped error row would mis-key as the legacy
                         # 128 default, letting a T=128 refresh delete
                         # evidence of a failure measured at another length
                         "text_len": shapes[3],
                         "error": type(e).__name__,
                         "error_note": note[:300]})
        print(json.dumps(rows[-1]), flush=True)
        doc = json.loads(out_path.read_text()) if out_path.exists() else {}
        # merge by (mode, optimizer) over the committed rows, as the decode
        # sweep merges by (config, batch): a subset refresh (e.g.
        # TRAIN_OPT=adafactor BENCH_TRAIN_MODES=stage3) keeps other rows
        merged = merge_train_rows(
            doc.get("train", {}).get("rows", []), rows, shapes[3])
        doc["train"] = {
            "note": (
                "multi-task train step on one chip (tools/bench_train.py): "
                "reference per-GPU recipe uni3+mmu3+plan2, bf16 masters + "
                "remat; pct_of_compute_floor vs (8 if remat else 6)*N_lm*"
                "T_lm / 197 TFLOP/s bf16 — LM tower only, SigLIP/VQ and "
                "optimizer excluded (estimate, labeled). The de-jure floor "
                "is NOT reachable: see train_budget.composite "
                "(tools/train_ceiling.py) for the measured composite "
                "ceiling the step is judged against (DESIGN.md section 14)"
            ),
            "shapes": {
                "uni_bs": shapes[0], "mmu_bs": shapes[1], "plan_bs": shapes[2],
                "text_len": shapes[3], "remat": shapes[4],
                "master_dtype": shapes[5],
            },
            "rows": merged,
        }
        out_path.write_text(json.dumps(doc, indent=1))
    print(json.dumps({"train_rows": len(rows), "out": str(out_path)}))


if __name__ == "__main__":
    main()
