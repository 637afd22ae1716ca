"""Pin the remat-infeasibility evidence as measured bytes (DESIGN.md §14).

The remat_off / remat_dots train programs at recipe batch (stage3,
text_len=700, uni3+mmu3+plan2) fail axon remote compile. Reproducing the
compile attempt directly surfaces XLA's full OOM report:

    Ran out of memory in memory space hbm. Used 58.09G of 15.75G hbm.
    ... Largest allocations: f32[24,3,16,1276,1276] (7.03G) ...

i.e. without per-layer remat the layer-stacked scan keeps every layer's
fp32 attention scores live for the backward — 24 x [3,16,1276,1276] fp32
is ~7 GB per copy, and XLA's activation-compression rescue still needs
58 GB. The `dots` policy saves matmul OUTPUTS, and the score matrix IS a
matmul output (q@k), so it hits the same wall. (A control: a single
16 GB-output matmul COMPILES on this stack — the compile-time OOM check
triggers on temp pressure, so the bytes below are real program demand,
not a conservative guess.)

This tool re-attempts both compiles, parses the OOM report, and writes
`train_budget.composite.remat.oom_evidence` to BENCH_SWEEP.json:

    BENCH_BUDGET_ONLY-style one-shot:  python tools/probe_remat_oom.py
"""
from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

REPO = Path(__file__).parent.parent


def _parse_oom(note: str) -> dict:
    out = {}
    m = re.search(r"Used ([\d.]+)G of ([\d.]+)G hbm. Exceeded hbm capacity "
                  r"by ([\d.]+)G", note)
    if m:
        out["used_gb"] = float(m.group(1))
        out["hbm_gb"] = float(m.group(2))
        out["exceeded_by_gb"] = float(m.group(3))
    allocs = re.findall(
        r"Size: ([\d.]+[GM])\s+Shape: (\S+)\{", note)
    if allocs:
        out["largest_allocations"] = [
            {"size": s, "shape": shp} for s, shp in allocs[:4]]
    return out


def attempt(name: str) -> dict:
    sys.path.insert(0, str(REPO / "tools"))
    import bench_train_budget as btb

    from plangen_tpu.config import PlanGenModelConfig
    from plangen_tpu.utils.memory import lower_and_analyze

    cfg = PlanGenModelConfig()
    remat_on = name != "remat_off"
    specs = btb.row_specs(
        "stage3", cfg, (3, 3, 2, 700, remat_on, "bfloat16", False, False))
    fn, args, _sync, _rebind = specs[name if name != "remat_off" else "full"]()
    row = {"text_len": 700, "bs": [3, 3, 2]}
    t0 = time.perf_counter()
    try:
        _compiled, mem = lower_and_analyze(fn, *args)
        row["compiled"] = True
        row["memory"] = mem
    except Exception as e:
        note = str(e)
        row["compiled"] = False
        row["error"] = type(e).__name__
        row.update(_parse_oom(note))
        if "used_gb" not in row:
            row["error_note"] = note[:300]
    row["seconds"] = round(time.perf_counter() - t0, 1)
    return row


def main() -> None:
    os.environ.setdefault("TRAIN_OPT", "adafactor")
    res = {}
    for name in ("remat_off", "remat_dots"):
        res[name] = attempt(name)
        print(json.dumps({name: res[name]}), flush=True)
    path = Path(os.environ.get("BENCH_OUT", REPO / "BENCH_SWEEP.json"))
    doc = json.loads(path.read_text())
    comp = doc.get("train_budget", {}).get("composite")
    if comp is not None and "remat" in comp:
        comp["remat"]["oom_evidence"] = res
        path.write_text(json.dumps(doc, indent=1))
    print(json.dumps({"oom_evidence": res}))


if __name__ == "__main__":
    main()
