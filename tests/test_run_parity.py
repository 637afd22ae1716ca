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
         "--workdir", str(workdir)],
        cwd=REPO, capture_output=True, text=True, timeout=1500,
    )
    assert proc.returncode == 0, (proc.stdout[-3000:], proc.stderr[-2000:])

    combined = json.loads((workdir / "parity_combined.json").read_text())
    assert combined["ok"] is True
    assert combined["mismatched_modes"] == []
    ran = {s["stage"] for s in combined["stages"]}
    assert ran == {"capture_reference", "golden_parity", "layout_eval"}
    # the full 7-mode parity report is embedded
    modes = {r["mode"] for r in combined["parity"]}
    assert modes == {"plan", "mmu", "edit", "rm", "uni", "losses", "prompts"}
    # stage logs exist for operator debugging
    for s in combined["stages"]:
        assert Path(s["log"]).exists()
    # the layout eval wrote its reference-compatible artifact tree
    assert (workdir / "eval").exists()
