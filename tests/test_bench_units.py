"""Unit tests for bench.py's roofline model — these numbers are published in
BENCH_SWEEP.json / every bench run, so the helpers get real tests."""

import importlib.util
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).parent.parent


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location("bench", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("bench", mod)
    spec.loader.exec_module(mod)
    return mod


class TestGrowingAvgLive:
    def test_matches_decode_loop_segmentation(self, bench):
        """The roofline's average-live computation must agree with the decode
        loop's own segment ends for every step (no duplicated math)."""
        from plangen_tpu.runtime.generate import growing_segment_ends

        L, n_img = 64, 576
        ends = growing_segment_ends(L, n_img)
        # step i (writing position L+i) attends over ends[phase(i)] slots
        total = 0
        prev = L
        for e in ends:
            hi = min(e, L + n_img)
            total += max(0, hi - prev) * e
            prev = max(prev, hi)
        expected = total / n_img
        assert bench._growing_avg_live(L, n_img) == expected

    def test_live_below_smax_above_prompt(self, bench):
        avg = bench._growing_avg_live(64, 576)
        assert 64 < avg < 640
        # growing saves ~1/3 of the fixed buffer's reads at these shapes
        assert avg / 640 < 0.75


class TestHbmFloor:
    def test_monotonic_in_batch(self, bench):
        from plangen_tpu.config import PlanGenModelConfig

        cfg = PlanGenModelConfig()
        floors = [
            bench._hbm_floor_s_per_step(cfg, B, "bf16", False, True, 64)
            for B in (1, 32, 64)
        ]
        assert floors[0] < floors[1] < floors[2]

    def test_quantization_lowers_floor(self, bench):
        from plangen_tpu.config import PlanGenModelConfig

        cfg = PlanGenModelConfig()
        bf16 = bench._hbm_floor_s_per_step(cfg, 32, "bf16", False, True, 64)
        q8 = bench._hbm_floor_s_per_step(cfg, 32, "int8", True, True, 64)
        q4 = bench._hbm_floor_s_per_step(cfg, 32, "int4", True, True, 64)
        assert q4 < q8 < bf16

    def test_bf16_b32_floor_magnitude(self, bench, monkeypatch):
        """Anchor: the 1B bf16 B=32 floor is ~9.7 ms/step (2.47 GB weights +
        ~5.4 GB live KV at 819 GB/s) — the measured 12.4 ms/step sits at
        ~78% of it (BENCH_SWEEP.json)."""
        from plangen_tpu.config import PlanGenModelConfig

        monkeypatch.delenv("BENCH_HBM_GBPS", raising=False)
        f = bench._hbm_floor_s_per_step(
            PlanGenModelConfig(), 32, "bf16", False, True, 64
        )
        assert 0.008 < f < 0.011, f


class TestHeadlineResolution:
    """VERDICT r4 #2: plain `python bench.py` must re-measure the committed
    sweep's best config so BENCH_r{N}.json trends are config-stable."""

    def test_default_adopts_committed_sweep_best(self, bench):
        import json

        rows = json.loads((REPO / "BENCH_SWEEP.json").read_text())["rows"]
        best = max((r for r in rows if r.get("tokens_per_sec")),
                   key=lambda r: r["tokens_per_sec"])
        w, kv, B, src = bench.resolve_headline({}, None, 32)
        assert B == best["batch"]
        assert (w, kv) == bench._SWEEP_MODES[best["config"]]
        assert src.startswith("committed sweep best")

    def test_env_pins_override(self, bench):
        assert bench.resolve_headline({"BENCH_BATCH": "8"}, None, 8) == (
            None, False, 8, "env")
        assert bench.resolve_headline({"BENCH_INT8_KV": "1"}, None, 32) == (
            None, True, 32, "env")
        assert bench.resolve_headline({}, "int4", 32) == (
            "int4", False, 32, "env")
        assert bench.resolve_headline({"BENCH_MODEL": "7b"}, None, 16) == (
            None, False, 16, "env")

    def test_explicit_zero_quant_env_pins(self, bench):
        # "=0" is an explicit bf16 request, not "adopt the sweep best":
        # presence of the env var pins, whatever its value
        for var in ("BENCH_INT8_KV", "BENCH_INT4", "BENCH_INT4_A8",
                    "BENCH_INT8"):
            assert bench.resolve_headline({var: "0"}, None, 32) == (
                None, False, 32, "env"), var

    def test_sweep_best_is_a_real_row(self, bench):
        row = bench._committed_sweep_best()
        assert row is not None
        assert row["config"] in bench._SWEEP_MODES
        assert row["tokens_per_sec"] > 4000  # the repo's own best number
