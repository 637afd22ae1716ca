"""Weights-day runbook: the WHOLE parity protocol as one command.

Given a real Janus-Pro checkpoint (+ optional PlanGen finetune), this runs,
in order, each stage in its own interpreter (the capture stage imports the
torch reference; the parity/eval/bench stages are JAX — separate processes
keep the frameworks from fighting over one runtime):

  1. tools/capture_reference.py  — drive the ACTUAL torch reference on the
     pinned protocol inputs, dump goldens
  2. tools/golden_parity.py      — run this framework on the same inputs,
     token-level diff against the goldens (7 modes:
     plan,mmu,edit,rm,uni,losses,prompts)
  3. optional layout-metric eval — `cli eval` on a layout workload
     (--eval-task/--eval-data), writing the reference-compatible eval tree
  4. bench.py                    — the headline perf record on this machine

and writes ONE combined JSON report. Dry-run-tested end to end on the tiny
random checkpoint in CI (tests/test_run_parity.py), so on weights day the
real-checkpoint gap is literally:

    python tools/run_parity.py --janus-path /ckpts/Janus-Pro-1B \
        [--finetune .../trainable_model_parameters.pth] --workdir parity_run/

Matches SURVEY.md §7's parity protocol; stage selection via --skip-* flags.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).parent.parent


def _run(stage: str, cmd, log_dir: Path, env=None) -> dict:
    t0 = time.time()
    log = log_dir / f"{stage}.log"
    with open(log, "w") as f:
        proc = subprocess.run(
            [str(c) for c in cmd], cwd=REPO, stdout=f,
            stderr=subprocess.STDOUT, env=env,
        )
    rec = {
        "stage": stage,
        "cmd": " ".join(str(c) for c in cmd),
        "rc": proc.returncode,
        "seconds": round(time.time() - t0, 1),
        "log": str(log),
    }
    print(json.dumps(rec), flush=True)
    return rec


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--janus-path", required=True,
                    help="HF Janus-Pro checkpoint dir")
    ap.add_argument("--finetune", default=None,
                    help="PlanGen trainable_model_parameters.pth")
    ap.add_argument("--workdir", default="parity_run",
                    help="all artifacts land here")
    ap.add_argument("--modes", default="plan,mmu,edit,rm,uni,losses,prompts")
    ap.add_argument("--max-new-text-tokens", type=int, default=512)
    ap.add_argument("--cfg", default=None,
                    help="config module for the JAX side (tiny runs pass "
                         "configs/toy_smoke.py)")
    ap.add_argument("--tiny", action="store_true",
                    help="dry-run on a tiny checkpoint (CI); implies "
                         "--skip-bench (the eval stage runs only when "
                         "--eval-data is set)")
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                    help="force the JAX platform for the golden_parity and "
                         "eval stages (the torch capture side is always "
                         "CPU); tiny CI runs pin cpu so parity never "
                         "depends on, or competes for, the remote TPU")
    ap.add_argument("--eval-task", default="plan",
                    help="layout-metric eval task (stage 3)")
    ap.add_argument("--eval-data", default=None,
                    help="dataset name for stage 3 (e.g. nsr1k); stage is "
                         "skipped when unset")
    ap.add_argument("--eval-max-len", type=int, default=-1,
                    help="batches for stage 3 (-1 = full dataset — eval's "
                         "sentinel; 0 would run ZERO batches and green-"
                         "light an empty stage)")
    ap.add_argument("--quant", default=None,
                    help="comma list of quantized configs to quality-gate "
                         "vs own-bf16 (tools/quant_quality.py), e.g. "
                         "'int8,int8_kv,int4,int4_a8,auto'")
    ap.add_argument("--skip-capture", action="store_true",
                    help="reuse an existing goldens dir")
    ap.add_argument("--skip-bench", action="store_true")
    ap.add_argument("--out", default=None,
                    help="combined report path "
                         "(default <workdir>/parity_combined.json)")
    args = ap.parse_args(argv)
    if args.platform is None and args.tiny:
        args.platform = "cpu"  # hermetic CI: see --platform help

    workdir = Path(args.workdir)
    workdir.mkdir(parents=True, exist_ok=True)
    goldens = workdir / "goldens"
    report_path = workdir / "parity_report.json"
    out_path = Path(args.out) if args.out else workdir / "parity_combined.json"
    stages = []

    # ---- 1. reference-side golden capture (torch) --------------------------
    if not args.skip_capture:
        cmd = [sys.executable, "tools/capture_reference.py",
               "--janus-path", args.janus_path, "--out", goldens,
               "--modes", args.modes,
               "--max-new-text-tokens", args.max_new_text_tokens]
        if args.finetune:
            cmd += ["--finetune", args.finetune]
        if args.tiny:
            cmd += ["--tiny"]
        stages.append(_run("capture_reference", cmd, workdir))
        if stages[-1]["rc"] != 0:
            return _finish(out_path, stages, None)

    # ---- 2. token-level cross-implementation diff (jax) --------------------
    cmd = [sys.executable, "tools/golden_parity.py",
           "--janus-path", args.janus_path, "--golden", goldens,
           "--modes", args.modes,
           "--max-new-text-tokens", args.max_new_text_tokens,
           "--out", report_path]
    if args.finetune:
        cmd += ["--finetune", args.finetune]
    if args.cfg:
        cmd += ["--cfg", args.cfg]
    if args.platform:
        cmd += ["--platform", args.platform]
    stages.append(_run("golden_parity", cmd, workdir))

    # ---- 3. layout-metric eval (reference-compatible artifact tree) --------
    if args.eval_data:
        cmd = [sys.executable, "-m", "plangen_tpu.cli"]
        if args.platform:
            cmd += ["--platform", args.platform]
        cmd += ["eval",
               "--task", args.eval_task, "--data", args.eval_data,
               "--max-len", args.eval_max_len,
               "--output", workdir / "eval",
               "--opt", f"janus_path={args.janus_path}"]
        if args.finetune:
            cmd += [f"finetune_path={args.finetune}"]
        if args.cfg:
            cmd += ["--cfg", args.cfg]
        stages.append(_run("layout_eval", cmd, workdir))

    # ---- 4. quantization quality vs own-bf16 (VERDICT r5 #6) ---------------
    if args.quant:
        cmd = [sys.executable, "tools/quant_quality.py",
               "--janus-path", args.janus_path,
               "--quant", args.quant,
               "--out", workdir / "quant_quality.json"]
        if args.finetune:
            cmd += ["--finetune", args.finetune]
        if args.cfg:
            cmd += ["--cfg", args.cfg]
        if args.platform:
            cmd += ["--platform", args.platform]
        if args.tiny:
            cmd += ["--n-images", "2", "--max-new-text-tokens", "8"]
        stages.append(_run("quant_quality", cmd, workdir))

    # ---- 5. headline bench --------------------------------------------------
    if not args.skip_bench and not args.tiny:
        stages.append(_run("bench", [sys.executable, "bench.py"], workdir))

    parity = None
    if report_path.exists():
        try:
            parity = json.loads(report_path.read_text())
        except json.JSONDecodeError:
            pass
    quant = None
    qq_path = workdir / "quant_quality.json"
    if args.quant and qq_path.exists():
        try:
            quant = json.loads(qq_path.read_text())
        except json.JSONDecodeError:
            pass
    return _finish(out_path, stages, parity, quant)


def _finish(out_path: Path, stages, parity, quant=None) -> int:
    ok = all(s["rc"] == 0 for s in stages)
    bad_modes = []
    compared = 0
    if parity:
        # mirror golden_parity's own failure set (tools/golden_parity.py
        # exit-code logic): 'no_golden' (mode absent from the capture) and
        # 'logit_injection' (pre-token_probs golden) are non-failures there
        # and must not turn the combined report red
        fail = ("mismatch", "internal_mismatch", "prob_mismatch")
        bad_modes = [r["mode"] for r in parity if r.get("status") in fail]
        compared = sum(1 for r in parity if r.get("status") != "no_golden")
        if compared == 0:
            # --skip-capture against an empty/misplaced goldens dir:
            # "compared nothing" must not read as a weights-day pass
            ok = False
            bad_modes = ["(no goldens found — nothing was compared; "
                         "check <workdir>/goldens or drop --skip-capture)"]
    report = {
        "ok": ok and not bad_modes,
        "stages": stages,
        "compared_modes": compared,
        "mismatched_modes": bad_modes,
        "parity": parity,
        "quant_quality": quant,
    }
    out_path.write_text(json.dumps(report, indent=1))
    print(json.dumps({"ok": report["ok"], "out": str(out_path),
                      "compared_modes": compared,
                      "mismatched_modes": bad_modes}))
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
