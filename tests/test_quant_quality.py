"""Quantization quality gate (tools/quant_quality.py) dry run.

VERDICT r5 #6: the quantized serving configs need a measured distance from
the bf16 north star. CI runs the tool end-to-end on the tiny random init:
int8/int8_kv (int4 packing needs the real model's 128-aligned dims, so the
tiny config records it as an expected error, exercised in the tool's own
error path). Real-checkpoint runs go through tools/run_parity.py --quant.
"""

import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).parent.parent


@pytest.mark.slow  # ~2 min: fresh interpreter, 3 modes x 3 configs
def test_quant_quality_dry_run(tmp_path):
    out = tmp_path / "qq.json"
    r = subprocess.run(
        [sys.executable, "tools/quant_quality.py",
         "--cfg", "configs/toy_smoke.py", "--platform", "cpu",
         "--quant", "int8,int8_kv", "--n-images", "2",
         "--max-new-text-tokens", "8", "--out", str(out)],
        cwd=REPO, capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    rep = json.loads(out.read_text())
    assert set(rep) == {"bf16", "int8", "int8_kv"}
    for q in ("int8", "int8_kv"):
        rows = {row["mode"]: row for row in rep[q]}
        assert set(rows) == {"plan", "mmu", "t2i"}
        for row in rows.values():
            assert "agreement_pct" in row, row
            assert 0.0 <= row["agreement_pct"] <= 100.0
        t2i = rows["t2i"]
        assert "prob_drift" in t2i and "mean_abs" in t2i["prob_drift"]
        assert "fid_siglip_vs_bf16" in t2i and "kid_siglip_vs_bf16" in t2i
