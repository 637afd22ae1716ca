"""The examples/ demo scripts must actually run.

Each is exercised as a REAL subprocess (fresh interpreter, no conftest
platform pinning) because that is how a user runs them — which is exactly
what regressed unnoticed before this test existed: without --janus-path
the demos picked the default device, so on a machine whose TPU plugin is
registered but unreachable they hung forever instead of demoing the API.
The scripts now default the tiny demo to CPU (in-process
`jax.config.update("jax_platforms", "cpu")`; the JAX_PLATFORMS env var
cannot override an already-registered plugin).
"""

import subprocess
import sys
from pathlib import Path

import pytest

EXAMPLES = Path(__file__).parent.parent / "examples"


def _run(script, *args, timeout=300):
    return subprocess.run(
        [sys.executable, str(EXAMPLES / script), *args],
        capture_output=True, text=True, timeout=timeout,
    )


@pytest.mark.slow  # ~2 min: each example is a fresh interpreter
class TestExamples:
    def test_generate(self, tmp_path):
        out = tmp_path / "gen.png"
        r = _run("generate.py", "--out", str(out))
        assert r.returncode == 0, r.stderr[-2000:]
        assert out.exists() and out.stat().st_size > 0
        assert "saved" in r.stdout

    def test_edit_remove(self, tmp_path):
        out = tmp_path / "edit.png"
        r = _run("edit.py", "--remove", "--out", str(out))
        assert r.returncode == 0, r.stderr[-2000:]
        assert out.exists() and out.stat().st_size > 0
        # the demo's 0.3,0.4,0.7,0.9 box on the tiny 2x2 grid freezes the
        # background rows and re-samples the box rows
        assert "background tokens frozen" in r.stdout

    def test_understand(self):
        r = _run("understand.py")
        assert r.returncode == 0, r.stderr[-2000:]
        assert "model output:" in r.stdout
