"""Attribute the train-step time budget per component (VERDICT r5 #1).

Decode got this treatment in round 4 (tools/bench_step_budget.py, DESIGN
§12); training ran at 42.8% of its LM compute floor with nothing between
"ms/step" and "floor". This tool measures the same REAL program with one
component removed at a time and derives each component's share:

  full          the production step (freeze-aware backward, remat, opt)
  fwd_only      loss value only -> forward cost
  grad_only     value_and_grad, no optimizer -> optimizer = full - this
  ablate_vq     VQ encoder off (constant labels)      -> VQ share
  ablate_siglip vision tower + aligner off (mmu)      -> SigLIP share
  ablate_heads  lm_head/gen_head + CE off             -> heads+CE share
  ablate_attn   QK^T/softmax/AV off (projections kept) -> attention share
  ablate_qkvo   q/k/v/o projections off               -> attn-matmul share
  ablate_mlp    MLP block off                         -> MLP-matmul share
  flow_uni/mmu/plan  single-flow steps (additivity check)
  remat_dots    selective save policy (ops/remat.py)  -> harvest lever
  remat_off     no recompute (memory permitting)      -> remat tax
  flash         Pallas flash attention in the training forwards
  fused_ce      chunked lm_head CE
  no_freeze_sg  freeze-aware stop_gradient DISABLED (the round-5 lever's
                value: full - this, negative = the lever wins)

Every row records `compiled.memory_analysis()` bytes next to ms/step, so
"doesn't fit" is a measured number, and each row times the SAME executable
it measures (utils/memory.py). Writes BENCH_SWEEP.json "train_budget"
(read-merge-write by row name x text_len).

Env: BENCH_BUDGET_ONLY="full,fwd_only,..." subset (each row is minutes of
remote compile on axon); TRAIN_TEXT_LEN (default 700 — the reference
recipe's max_seq_len, cfg/base.py), TRAIN_MODE (default stage3), TRAIN_OPT
(default adafactor here: the single-chip full-stage3 config), shapes env
as tools/bench_train.py.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent))

import bench_train  # shapes/builders shared with the timing bench

ALL_FLOWS = ((0, "uni"), (1, "mmu"), (2, "plan"))


def _time_compiled(compiled, args, sync, rebind=None, n=5):
    """min-of-n wall seconds for one execution (host-synced). `rebind`
    threads donated outputs back into the next call's arguments (the train
    step donates its state, so re-running with the ORIGINAL state would
    hit 'Buffer has been deleted or donated')."""
    out = compiled(*args)  # warm (first run after compile)
    sync(out)
    if rebind is not None:
        args = rebind(out, args)
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = compiled(*args)
        sync(out)
        times.append(time.perf_counter() - t0)
        if rebind is not None:
            args = rebind(out, args)
    return min(times)


def build_step_row(mode, cfg, shapes, **kw):
    """Full train-step program via bench_train.build_mode."""
    step, state, batches, _ = bench_train.build_mode(mode, cfg, shapes, **kw)
    return (step, (state, batches), lambda out: float(out[1]["loss"]),
            lambda out, args: (out[0], args[1]))


def build_loss_row(mode, cfg, shapes, grad: bool):
    """Forward-only or grad-only program over the SAME loss_fn the step
    uses (freeze-aware mask included, like production)."""
    import jax
    import jax.numpy as jnp

    from plangen_tpu.config import OptimConfig, TrainConfig
    from plangen_tpu.train.optim import make_optimizer
    from plangen_tpu.train.step import make_loss_fn

    uni_bs, mmu_bs, plan_bs, L, remat, master, use_flash, fused_ce = shapes
    step, state, batches, tcfg = bench_train.build_mode(mode, cfg, shapes)
    del step
    tx, mask = make_optimizer(
        OptimConfig(optimizer=os.environ.get("TRAIN_OPT", "adafactor")),
        state.params, mode)
    del tx
    loss_fn = make_loss_fn(cfg, tcfg, 2, ALL_FLOWS, trainable_mask=mask)

    if not grad:
        fn = jax.jit(lambda p, b: loss_fn(p, b)[0])

        def sync(out):
            return float(out)

        return fn, (state.params, batches), sync, None

    def grad_prog(p, b):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, b)
        # reduce grads on device: forces the full backward without
        # shipping ~3 GB to the host per step
        gsq = sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                  for g in jax.tree_util.tree_leaves(grads))
        return loss, gsq

    fn = jax.jit(grad_prog)
    return fn, (state.params, batches), lambda out: float(out[0]), None


def row_specs(mode, cfg, shapes):
    def step(**kw):
        return lambda: build_step_row(mode, cfg, shapes, **kw)

    uni_bs, mmu_bs, plan_bs, L, remat, master, use_flash, fused_ce = shapes
    return {
        "full": step(),
        "fwd_only": lambda: build_loss_row(mode, cfg, shapes, grad=False),
        "grad_only": lambda: build_loss_row(mode, cfg, shapes, grad=True),
        "ablate_vq": step(ablate=frozenset({"vq"})),
        "ablate_siglip": step(ablate=frozenset({"siglip"})),
        "ablate_heads": step(ablate=frozenset({"heads"})),
        "ablate_attn": step(ablate=frozenset({"attn"})),
        "ablate_qkvo": step(ablate=frozenset({"qkvo"})),
        "ablate_mlp": step(ablate=frozenset({"mlp"})),
        "flow_uni": step(flows=((0, "uni"),)),
        "flow_mmu": step(flows=((1, "mmu"),)),
        "flow_plan": step(flows=((2, "plan"),)),
        "remat_dots": step(remat_policy="dots"),
        "remat_off": lambda: build_step_row(
            mode, cfg,
            (uni_bs, mmu_bs, plan_bs, L, False, master, use_flash, fused_ce)),
        "flash": lambda: build_step_row(
            mode, cfg,
            (uni_bs, mmu_bs, plan_bs, L, remat, master, True, fused_ce)),
        "fused_ce": lambda: build_step_row(
            mode, cfg,
            (uni_bs, mmu_bs, plan_bs, L, remat, master, use_flash, True)),
        "no_freeze_sg": step(freeze_stop_grad=False),
    }


def derive(rows):
    """Component shares from the ablation deltas (ms)."""
    ms = {r["name"]: r["ms"] for r in rows if "ms" in r}
    d = {}

    def delta(key, a, b):
        if a in ms and b in ms:
            d[key] = round(ms[a] - ms[b], 1)

    delta("optimizer_ms", "full", "grad_only")
    delta("bwd_ms", "grad_only", "fwd_only")
    delta("vq_encode_ms", "full", "ablate_vq")
    delta("siglip_ms", "full", "ablate_siglip")
    delta("heads_ce_ms", "full", "ablate_heads")
    delta("attn_ms", "full", "ablate_attn")
    delta("qkvo_ms", "full", "ablate_qkvo")
    delta("mlp_ms", "full", "ablate_mlp")
    delta("remat_recompute_ms", "full", "remat_off")
    delta("remat_dots_saves_ms", "full", "remat_dots")
    delta("flash_saves_ms", "full", "flash")
    delta("fused_ce_saves_ms", "full", "fused_ce")
    delta("freeze_sg_saves_ms", "no_freeze_sg", "full")
    if all(k in ms for k in ("flow_uni", "flow_mmu", "flow_plan", "full")):
        d["flow_sum_minus_full_ms"] = round(
            ms["flow_uni"] + ms["flow_mmu"] + ms["flow_plan"] - ms["full"], 1)
    return d


def _derived_groups(merged, prior):
    """Per-(text_len, bs) delta groups; recipe batch (3,3,2) keeps the
    bare text_len key (back-compat), other batches append '@u/m/p'."""
    groups = {}
    for r in merged:
        bs = tuple(r.get("bs", (3, 3, 2)))
        k = str(r.get("text_len"))
        if bs != (3, 3, 2):
            k += "@" + "/".join(map(str, bs))
        groups.setdefault(k, []).append(r)
    out = {k: v for k, v in prior.items()}  # keep groups not re-derived
    for k, rows in groups.items():
        d = derive(rows)
        if d:
            out[k] = d
    return out


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass
    from plangen_tpu.config import PlanGenModelConfig
    from plangen_tpu.utils.memory import lower_and_analyze

    os.environ.setdefault("TRAIN_OPT", "adafactor")
    mode = os.environ.get("TRAIN_MODE", "stage3")
    tiny = os.environ.get("BENCH_TINY") == "1"  # CI smoke (tests/)
    L = int(os.environ.get("TRAIN_TEXT_LEN", "16" if tiny else "700"))
    cfg = PlanGenModelConfig.tiny() if tiny else PlanGenModelConfig()
    shapes = (
        int(os.environ.get("TRAIN_UNI_BS", "3")),
        int(os.environ.get("TRAIN_MMU_BS", "3")),
        int(os.environ.get("TRAIN_PLAN_BS", "2")),
        L,
        os.environ.get("TRAIN_REMAT", "1") == "1",
        os.environ.get("TRAIN_MASTER", "bfloat16"),
        False,
        False,
    )
    only = os.environ.get("BENCH_BUDGET_ONLY")
    only_set = [s.strip() for s in only.split(",")] if only else None
    specs = row_specs(mode, cfg, shapes)
    out_path = Path(os.environ.get(
        "BENCH_OUT", Path(__file__).parent.parent / "BENCH_SWEEP.json"))
    rows = []
    for name, build in specs.items():
        if only_set is not None and name not in only_set:
            continue
        row = {"name": name, "text_len": L, "mode": mode,
               "optimizer": os.environ["TRAIN_OPT"],
               "bs": [shapes[0], shapes[1], shapes[2]]}
        try:
            t0 = time.perf_counter()
            fn, args, sync, rebind = build()
            compiled, mem = lower_and_analyze(fn, *args)
            row["compile_s"] = round(time.perf_counter() - t0, 1)
            if mem:
                row["memory"] = mem
            sec = _time_compiled(compiled, args, sync, rebind)
            row["ms"] = round(sec * 1e3, 1)
        except Exception as e:
            note = str(e)
            import re

            note = re.sub(r"\x1b\[[0-9;]*m", "", note)
            row["error"] = type(e).__name__
            row["error_note"] = note[:300]
        rows.append(row)
        print(json.dumps(row), flush=True)

        doc = json.loads(out_path.read_text()) if out_path.exists() else {}
        sect = doc.get("train_budget", {})
        # merge key includes the batch stamp so reduced-batch lever rows
        # (remat variants only fit below recipe batch) sit NEXT TO the
        # recipe-shape rows; legacy stamp-less rows were all 3/3/2
        key = lambda r: (r["name"], r.get("text_len"),
                         tuple(r.get("bs", (3, 3, 2))))
        old = {key(r): r for r in sect.get("rows", [])}
        for r in rows:
            old[key(r)] = r
        merged = sorted(old.values(),
                        key=lambda r: (r.get("text_len") or 0, r["name"],
                                       tuple(r.get("bs", (3, 3, 2)))))
        # preserve keys other tools own (train_ceiling.py's "composite")
        extra = {k: v for k, v in sect.items()
                 if k not in ("note", "shapes", "rows", "derived")}
        doc["train_budget"] = {
            **extra,
            "note": (
                "train-step component budget by ablation of the real "
                "program (tools/bench_train_budget.py): ms = min of 5 on "
                "the same AOT executable memory_analysis() measured; "
                "derived deltas attribute full-step ms per component"
            ),
            "shapes": {"uni_bs": shapes[0], "mmu_bs": shapes[1],
                       "plan_bs": shapes[2], "remat": shapes[4],
                       "master_dtype": shapes[5]},
            "rows": merged,
            # deltas only make sense within one (text_len, bs) group;
            # recipe-batch groups keep the bare "700" key, reduced-batch
            # groups get "700@1/1/1"
            "derived": _derived_groups(merged, sect.get("derived", {})),
        }
        out_path.write_text(json.dumps(doc, indent=1))
    print(json.dumps({"budget_rows": len(rows), "derived": derive(rows)}))


if __name__ == "__main__":
    main()
