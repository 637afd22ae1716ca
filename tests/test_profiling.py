"""Profiling hooks (utils/profiling.py): trace capture writes a real
artifact, annotations compose with jit, StepTimer percentiles are correct.
The reference has no active tracing (commented block, train.py:228-234) —
this subsystem is part of the 'observability' aux row (SURVEY §5)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from plangen_tpu.utils.profiling import StepTimer, annotate, trace


class TestTrace:
    def test_trace_writes_artifact(self, tmp_path):
        log_dir = str(tmp_path / "trace")
        with trace(log_dir):
            with annotate("matmul-region"):
                x = jnp.ones((64, 64))
                np.asarray(jax.jit(lambda a: a @ a)(x))
        files = [
            os.path.join(r, f)
            for r, _, fs in os.walk(log_dir)
            for f in fs
        ]
        assert files, "trace produced no files"
        # jax writes .trace.json.gz / .xplane.pb under plugins/profile
        assert any("profile" in f or f.endswith(".pb") or "trace" in f
                   for f in files), files

    def test_trace_reentrant_after_exit(self, tmp_path):
        # a second capture after the first closed must work (stop_trace ran)
        for i in range(2):
            with trace(str(tmp_path / f"t{i}")):
                np.asarray(jnp.zeros(8) + i)


class TestStepTimer:
    def test_warmup_excluded_and_percentiles(self):
        t = StepTimer(warmup=2)
        for _ in range(12):
            with t:
                pass
        s = t.summary()
        assert s["steps"] == 10  # 12 - 2 warmup
        assert 0 <= s["p50_s"] <= s["p90_s"] <= s["max_s"]
        assert s["mean_s"] >= 0

    def test_empty_summary(self):
        assert StepTimer(warmup=5).summary() == {}
