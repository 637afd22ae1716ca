"""One-command weights-day runbook, dry-run on the tiny checkpoint.

tools/run_parity.py chains capture_reference -> golden_parity -> layout eval
-> bench into ONE command with a combined report. This CI run exercises every
stage the runbook will execute on weights day (bench is skipped under --tiny;
it is the driver-run artifact) so the real-checkpoint gap is literally one
command (VERDICT r3 item 5 / SURVEY §7 parity protocol).
"""

import json
import subprocess
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))

from plangen_tpu.config import PlanGenModelConfig

from test_capture_reference import make_random_fixture  # noqa: E402

REFERENCE = Path("/root/reference")
REPO = Path(__file__).parent.parent

pytestmark = pytest.mark.skipif(
    not (REFERENCE / "project/plangen/plangen_base.py").exists(),
    reason="torch reference checkout not available",
)


@pytest.mark.slow  # ~2 min: 4-stage subprocess runbook dry run
def test_runbook_tiny_end_to_end(tmp_path):
    ckpt = tmp_path / "janus_tiny"
    make_random_fixture(ckpt, PlanGenModelConfig.tiny(), seed=0)
    workdir = tmp_path / "parity_run"
    proc = subprocess.run(
        [sys.executable, "tools/run_parity.py",
         "--janus-path", str(ckpt), "--tiny",
         "--cfg", "configs/toy_smoke.py",
         "--max-new-text-tokens", "6",
         "--eval-data", "toy", "--eval-task", "plan", "--eval-max-len", "1",
         "--quant", "int8,int8_kv",
         "--workdir", str(workdir)],
        cwd=REPO, capture_output=True, text=True, timeout=1800,
    )
    assert proc.returncode == 0, (proc.stdout[-3000:], proc.stderr[-2000:])

    combined = json.loads((workdir / "parity_combined.json").read_text())
    assert combined["ok"] is True
    assert combined["mismatched_modes"] == []
    ran = {s["stage"] for s in combined["stages"]}
    assert ran == {"capture_reference", "golden_parity", "layout_eval",
                   "quant_quality"}
    # the quantization-quality section rode into the combined report
    assert set(combined["quant_quality"]) == {"bf16", "int8", "int8_kv"}
    # the full 7-mode parity report is embedded
    modes = {r["mode"] for r in combined["parity"]}
    assert modes == {"plan", "mmu", "edit", "rm", "uni", "losses", "prompts"}
    # stage logs exist for operator debugging
    for s in combined["stages"]:
        assert Path(s["log"]).exists()
    # the layout eval wrote its reference-compatible artifact tree
    assert (workdir / "eval").exists()


def test_finish_status_set_mirrors_golden_parity(tmp_path):
    """'no_golden' (mode absent from the capture) and 'logit_injection'
    (pre-token_probs golden) are NON-failures in golden_parity's own exit
    logic — the combined report must not flag them as mismatches, or a
    legitimate --skip-capture re-run goes red on weights day."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "run_parity", REPO / "tools" / "run_parity.py"
    )
    rp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rp)

    out = tmp_path / "combined.json"
    stages = [{"stage": "golden_parity", "rc": 0, "log": "x"}]
    parity = [
        {"mode": "plan", "status": "match"},
        {"mode": "uni", "status": "logit_injection"},
        {"mode": "rm", "status": "no_golden"},
        {"mode": "losses", "status": "prob_match"},
    ]
    assert rp._finish(out, stages, parity) == 0
    rep = json.loads(out.read_text())
    assert rep["ok"] is True and rep["mismatched_modes"] == []

    parity.append({"mode": "mmu", "status": "mismatch"})
    assert rp._finish(out, stages, parity) == 1
    rep = json.loads(out.read_text())
    assert rep["ok"] is False and rep["mismatched_modes"] == ["mmu"]


def test_finish_all_no_golden_is_not_a_pass(tmp_path):
    """--skip-capture against an empty goldens dir compares NOTHING —
    the combined report must be red, not a weights-day green."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "run_parity2", REPO / "tools" / "run_parity.py"
    )
    rp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rp)
    out = tmp_path / "c.json"
    stages = [{"stage": "golden_parity", "rc": 0, "log": "x"}]
    parity = [{"mode": m, "status": "no_golden"} for m in ("plan", "uni")]
    assert rp._finish(out, stages, parity) == 1
    rep = json.loads(out.read_text())
    assert rep["ok"] is False and rep["compared_modes"] == 0
