"""bench.py's device probe: the driver's round-end bench must FAIL FAST
with a machine-readable record during an accelerator tunnel outage instead
of hanging forever (the probe runs a trivial dispatch in a subprocess with
a hard timeout — an in-process hung dispatch cannot be interrupted)."""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import bench


class TestProbe:
    def test_skip_env(self, monkeypatch):
        monkeypatch.setenv("BENCH_PROBE", "0")
        assert bench._probe_device() is True

    def test_timeout_returns_false(self, monkeypatch):
        # 1 s is below bare interpreter+jax import time, so the probe
        # subprocess always times out — deterministic regardless of
        # device health
        monkeypatch.delenv("BENCH_PROBE", raising=False)
        monkeypatch.setenv("BENCH_PROBE_TIMEOUT", "1")
        assert bench._probe_device() is False

    def test_failed_record_carries_committed_best(self, capsys):
        bench._probe_failed_record()
        rec = json.loads(capsys.readouterr().out.strip())
        assert rec["value"] is None
        assert "probe failed" in rec["error"]
        # the committed sweep's best row rides along so the round artifact
        # still holds measured numbers
        assert rec["sweep_best"]["tokens_per_sec"] > 0


class TestSharedProbe:
    def test_platform_pin_probes_cpu(self, monkeypatch):
        """platform='cpu' must pin the SUBPROCESS to CPU (in-process config
        — a registered TPU plugin ignores JAX_PLATFORMS), so a CPU smoke
        run's probe succeeds regardless of tunnel health."""
        from plangen_tpu.utils.device_probe import probe_device

        monkeypatch.delenv("PLANGEN_PROBE", raising=False)
        monkeypatch.delenv("PLANGEN_PROBE_TIMEOUT", raising=False)
        assert probe_device(timeout_s=120, platform="cpu") is True

    def test_serve_cli_fails_fast_on_dead_device(self):
        """`cli serve` exits with a diagnostic when the probe times out,
        instead of hanging in warmup compiles (1 s bound < interpreter
        boot, so the probe subprocess always times out here)."""
        import subprocess

        r = subprocess.run(
            [sys.executable, "-m", "plangen_tpu.cli", "serve"],
            capture_output=True, text=True, timeout=120,
            env={**__import__("os").environ, "PLANGEN_PROBE_TIMEOUT": "1"},
            cwd=str(Path(__file__).parent.parent),
        )
        assert r.returncode != 0
        assert "device probe failed" in r.stderr


class TestProbeInfo:
    """probe_device_info: the `cli doctor` probe must report WHAT it saw
    (platform/count/timing) on success and a diagnosis on failure."""

    def test_healthy_cpu(self, monkeypatch):
        from plangen_tpu.utils.device_probe import probe_device_info

        monkeypatch.delenv("PLANGEN_PROBE_TIMEOUT", raising=False)
        info = probe_device_info(timeout_s=120, platform="cpu")
        assert info["ok"] is True
        assert info["platform"] == "cpu" and info["device_count"] >= 1
        assert info["dispatch_seconds"] >= 0

    def test_timeout_diagnosis(self, monkeypatch):
        from plangen_tpu.utils.device_probe import probe_device_info

        monkeypatch.setenv("PLANGEN_PROBE_TIMEOUT", "1")
        info = probe_device_info(platform="cpu")
        assert info["ok"] is False
        assert "timeout" in info["error"]

    def test_subprocess_error_diagnosis(self, monkeypatch):
        # an invalid platform makes the subprocess raise during backend
        # selection; the stderr tail must surface in the report
        from plangen_tpu.utils.device_probe import probe_device_info

        monkeypatch.delenv("PLANGEN_PROBE_TIMEOUT", raising=False)
        info = probe_device_info(timeout_s=120, platform="not_a_platform")
        assert info["ok"] is False
        assert info["error"]
