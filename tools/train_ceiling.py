"""Composite reachable ceiling for the train step, derived from committed
measurements (no TPU needed).

Mirrors what DESIGN.md §12 did for decode: instead of dividing the step by a
de-jure peak-FLOP floor (stage3 looked like "42.8% of floor" at T=128,
VERDICT r4 item 2), build the ceiling each component can actually reach —
measured in isolation on the same chip at the same shapes — and report the
step's distance from THAT.

Inputs (all already in BENCH_SWEEP.json, measured on the v5e):
  train_budget.rows      full-step ms + ablation deltas at recipe shapes
                         (tools/bench_train_budget.py)
  layer_train.rows       ONE production decoder layer fwd+bwd at the recipe
                         training shape, per remat regime
                         (tools/bench_layer_train.py)
  train_flops            exact dot/conv FLOPs of the traced programs
                         (tools/flops_audit.py) -> de-jure 197-TFLOP floors

Composite ceiling (ms) =
    isolated-layer fwd+bwd  x  num_layers  x  (step tokens / probe tokens)
  + measured non-LM components (siglip fwd, vq encode, heads+CE, optimizer)

The LM extrapolation is conservative in the step's favour: plan rows are
S=text_len (no image tokens) so their attention is cheaper than the probe's
S=1276 rows; linear token scaling therefore OVERestimates the reachable LM
cost slightly, i.e. the true ceiling is a touch lower and the reported
pct_of_composite a touch optimistic -- bounded by plan's token share (~15%).

Writes BENCH_SWEEP.json train_budget.composite and prints it.
"""
from __future__ import annotations

import json
import os
from pathlib import Path

NUM_LAYERS = 24  # Janus-Pro-1B LLaMA depth (config.py LlamaConfig)
IMG_TOKENS = 576  # 384px / patch16 (plangen_base.py:129-132)


def _recipe_tokens(text_len: int, bs) -> int:
    uni, mmu, plan = bs
    s_img = text_len + IMG_TOKENS
    return uni * s_img + mmu * s_img + plan * text_len


def compute_composite(sweep: dict, text_len: int = 700,
                      bs=(3, 3, 2)) -> dict:
    tb = sweep["train_budget"]
    rows = {(r["name"], r.get("text_len"), tuple(r.get("bs", (3, 3, 2)))): r
            for r in tb["rows"]}
    full = rows.get(("full", text_len, tuple(bs)), {})
    if "ms" not in full:
        raise SystemExit(f"no full-step ms at text_len={text_len} bs={bs}")
    full_ms = full["ms"]
    d = tb["derived"][str(text_len)]
    non_lm = {k: d[k] for k in
              ("siglip_ms", "vq_encode_ms", "heads_ce_ms", "optimizer_ms")}
    non_lm_ms = round(sum(non_lm.values()), 1)
    lm_in_program_ms = round(full_ms - non_lm_ms, 1)

    # isolated production layer at the probe shape, per remat regime.
    # layer_train.rows may hold probes at several (B, S) (LAYER_B/LAYER_S
    # env): regimes must come from ONE shape, or the recompute subtraction
    # below would cross shapes. Use the shape with the most regimes
    # (ties: the largest-token probe, closest to the recipe).
    by_shape = {}
    for r in sweep["layer_train"]["rows"]:
        if r["name"] == "fwd_bwd_full" and "ms_per_iter" in r:
            by_shape.setdefault((r["B"], r["S"]), {})[str(r["remat"])] = r
    shaped = [(len(v), b * s, v) for (b, s), v in by_shape.items()
              if "True" in v]
    layer = max(shaped)[2]
    probe = layer["True"]
    probe_tokens = probe["B"] * probe["S"]
    scale = _recipe_tokens(text_len, bs) / probe_tokens
    lm_ceiling_ms = round(probe["ms_per_iter"] * NUM_LAYERS * scale, 1)

    composite_ms = round(lm_ceiling_ms + non_lm_ms, 1)
    out = {
        "text_len": text_len, "bs": list(bs),
        "full_ms": full_ms,
        "non_lm_measured_ms": non_lm,
        "lm_in_program_ms": lm_in_program_ms,
        "lm_isolated_extrapolation_ms": lm_ceiling_ms,
        "lm_layer_probe": {
            "ms_per_layer": probe["ms_per_iter"],
            "B": probe["B"], "S": probe["S"],
            "num_layers": NUM_LAYERS,
            "token_scale": round(scale, 4),
        },
        "integration_residual_ms": round(
            lm_in_program_ms - lm_ceiling_ms, 1),
        "composite_ceiling_ms": composite_ms,
        "pct_of_composite": round(100.0 * composite_ms / full_ms, 1),
    }

    # remat ledger: recompute cost per the layer probe, and why it is
    # memory-mandatory at recipe batch (the alternative regimes' rows)
    if "False" in layer:
        recompute_layer = probe["ms_per_iter"] - layer["False"]["ms_per_iter"]
        rem = {
            "recompute_ms_per_layer": round(recompute_layer, 3),
            "recompute_step_ms": round(
                recompute_layer * NUM_LAYERS * scale, 1),
        }
        if "dots" in layer:
            rem["dots_recovers_pct"] = round(100.0 * (
                probe["ms_per_iter"] - layer["dots"]["ms_per_iter"])
                / recompute_layer, 1)
        infeasible = {}
        for name in ("remat_dots", "remat_off"):
            r = rows.get((name, text_len, tuple(bs)))
            if r is None:
                continue
            infeasible[name] = (
                r.get("error", "ok")
                if "ms" not in r else f"ok: {r['ms']} ms")
        rem["at_recipe_batch"] = infeasible
        out["remat"] = rem

    # de-jure floor: every dot/conv FLOP at the chip's 197-TFLOP bf16 peak
    tf = sweep.get("train_flops", {})
    if tf.get("text_len") == text_len and list(tf.get("bs", [])) == list(bs):
        grad_floor = round(sum(tf["rows"]["grad"]["ms_at_peak_197"]
                               .values()), 1)
        out["dejure_floor_ms_at_peak197"] = grad_floor
        out["pct_of_dejure"] = round(100.0 * grad_floor / full_ms, 1)
    return out


def main() -> None:
    path = Path(os.environ.get(
        "BENCH_OUT", Path(__file__).parent.parent / "BENCH_SWEEP.json"))
    doc = json.loads(path.read_text())
    comp = compute_composite(doc)
    # merge, don't replace: other tools hang evidence off this block
    # (probe_remat_oom.py adds composite.remat.oom_evidence) and a
    # derivation refresh must not delete it
    old = doc["train_budget"].get("composite", {})
    for k, v in old.items():
        if k == "remat":
            for rk, rv in v.items():
                comp.setdefault("remat", {}).setdefault(rk, rv)
        else:
            comp.setdefault(k, v)
    doc["train_budget"]["composite"] = comp
    path.write_text(json.dumps(doc, indent=1))
    print(json.dumps(comp, indent=1))


if __name__ == "__main__":
    main()
