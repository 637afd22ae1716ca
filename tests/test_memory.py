"""Compile-time memory accounting (utils/memory.py) + the bench_train
build_mode it instruments.

VERDICT r4 #4: runtime `memory_stats()` returns {} on axon, so every
fits/OOM claim was prose. `compiled.memory_analysis()` is the compile-time
replacement — these tests pin its contract on the CPU backend (same JAX
API surface) and the NaN regression that tiny-config synthetic batches
used to hit (ids sampled past the tiny vocab).
"""

import importlib.util
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plangen_tpu.utils.memory import analyze_compiled, lower_and_analyze

REPO = Path(__file__).parent.parent


def test_lower_and_analyze_reports_bytes_and_executes():
    @jax.jit
    def f(x, y):
        return x @ y + 1.0

    x = jnp.ones((128, 256), jnp.float32)
    y = jnp.ones((256, 64), jnp.float32)
    compiled, mem = lower_and_analyze(f, x, y)
    # CPU backend exposes memory_analysis; the contract is the GB breakdown
    assert mem is not None
    for k in ("argument_size_gb", "output_size_gb", "temp_size_gb",
              "total_gb"):
        assert k in mem and mem[k] >= 0.0
    # arguments: 128*256*4 + 256*64*4 bytes — round-tripped through GB
    arg_gb = (128 * 256 * 4 + 256 * 64 * 4) / 2**30
    assert mem["argument_size_gb"] == round(arg_gb, 3)
    # the compiled object must execute like the jitted original
    np.testing.assert_array_equal(np.asarray(compiled(x, y)),
                                  np.asarray(f(x, y)))


def test_donated_args_counted_once_via_alias():
    """Donated inputs alias outputs; total_gb must subtract the alias so a
    donated train state isn't double-counted (the accounting the OOM claims
    rely on)."""

    @jax.jit
    def grow(x):
        return x * 2.0

    donating = jax.jit(lambda x: x * 2.0, donate_argnums=(0,))
    x = jnp.ones((1024, 1024), jnp.float32)  # 4 MB
    plain = lower_and_analyze(grow, x)[1]
    donated = lower_and_analyze(donating, x)[1]
    assert donated["alias_size_gb"] >= plain["alias_size_gb"]
    assert donated["total_gb"] <= plain["total_gb"]


def test_analyze_compiled_handles_missing_backend_support():
    class NoStats:
        def memory_analysis(self):
            raise NotImplementedError

    class NoneStats:
        def memory_analysis(self):
            return None

    assert analyze_compiled(NoStats()) is None
    assert analyze_compiled(NoneStats()) is None


@pytest.fixture(scope="module")
def bench_train():
    sys.path.insert(0, str(REPO / "tools"))
    spec = importlib.util.spec_from_file_location(
        "bench_train", REPO / "tools" / "bench_train.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("bench_train", mod)
    spec.loader.exec_module(mod)
    return mod


def test_merge_train_rows_keyed_by_text_len(bench_train):
    """A text_len=700 refresh must sit NEXT TO the committed text_len=128
    rows (the VERDICT r5 #3 {128, 512, 700} matrix), replace only its own
    (mode, optimizer, text_len) cell, and treat legacy stamp-less rows as
    text_len=128."""
    old = [
        {"mode": "stage3", "optimizer": "adafactor", "text_len": 128,
         "ms_per_step": 524.0},
        {"mode": "lora", "ms_per_step": 300.0},  # legacy: no stamp -> 128
    ]
    new = [{"mode": "stage3", "optimizer": "adafactor", "text_len": 700,
            "ms_per_step": 1110.0}]
    merged = bench_train.merge_train_rows(old, new, run_text_len=700)
    assert len(merged) == 3  # nothing displaced
    # same-cell refresh replaces (stamp-less new row inherits the run len)
    merged2 = bench_train.merge_train_rows(
        merged, [{"mode": "stage3", "optimizer": "adafactor",
                  "text_len": 700, "ms_per_step": 1000.0}], 700)
    assert len(merged2) == 3
    assert [r for r in merged2 if r.get("text_len") == 700][0][
        "ms_per_step"] == 1000.0
    # legacy stamp-less committed row is a 128 row: a 128 refresh hits it
    merged3 = bench_train.merge_train_rows(
        merged2, [{"mode": "lora", "text_len": 128, "ms_per_step": 1.0}], 128)
    assert len(merged3) == 3
    assert [r for r in merged3 if r["mode"] == "lora"][0]["ms_per_step"] == 1.0


def test_build_mode_tiny_finite_loss(bench_train):
    """Regression: synthetic ids were sampled in [3, 1000) regardless of
    vocab, so tiny configs (vocab 512) gathered OOB embeddings and every
    flow's loss went NaN. build_mode must produce finite losses on the
    tiny config, via the same AOT path bench_train times."""
    from plangen_tpu.config import PlanGenModelConfig

    cfg = PlanGenModelConfig.tiny()
    shapes = (2, 2, 1, 16, True, "bfloat16", False, False)
    step, state, batches, _ = bench_train.build_mode("stage3", cfg, shapes)
    compiled, mem = lower_and_analyze(step, state, batches)
    assert mem is not None and mem["total_gb"] >= 0.0
    _, metrics = compiled(state, batches)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"


@pytest.fixture(scope="module")
def train_ceiling():
    spec = importlib.util.spec_from_file_location(
        "train_ceiling", REPO / "tools" / "train_ceiling.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("train_ceiling", mod)
    spec.loader.exec_module(mod)
    return mod


def _synthetic_sweep():
    # recipe tokens at text_len=700 bs(3,3,2): 3*1276 + 3*1276 + 2*700 = 9056
    # probe tokens: 3*1276 = 3828 -> scale 2.3657...
    return {
        "train_budget": {
            "rows": [
                {"name": "full", "text_len": 700, "bs": [3, 3, 2],
                 "ms": 1000.0},
                {"name": "remat_dots", "text_len": 700, "bs": [3, 3, 2],
                 "error": "JaxRuntimeError"},
                {"name": "remat_off", "text_len": 700, "bs": [3, 3, 2],
                 "error": "JaxRuntimeError"},
            ],
            "derived": {"700": {
                "siglip_ms": 50.0, "vq_encode_ms": 30.0,
                "heads_ce_ms": 60.0, "optimizer_ms": 20.0,
            }},
        },
        "layer_train": {"rows": [
            {"name": "fwd_bwd_full", "B": 3, "S": 1276, "remat": True,
             "ms_per_iter": 10.0},
            {"name": "fwd_bwd_full", "B": 3, "S": 1276, "remat": False,
             "ms_per_iter": 8.0},
            {"name": "fwd_bwd_full", "B": 3, "S": 1276, "remat": "dots",
             "ms_per_iter": 8.5},
        ]},
        "train_flops": {"text_len": 700, "bs": [3, 3, 2], "rows": {
            "grad": {"ms_at_peak_197": {"mlp": 300.0, "qkvo": 100.0}}}},
    }


def test_compute_composite_arithmetic(train_ceiling):
    """The composite block is pure arithmetic over committed rows — pin it
    on a synthetic sweep where every number is checkable by hand."""
    c = train_ceiling.compute_composite(_synthetic_sweep())
    assert c["lm_in_program_ms"] == 1000.0 - 160.0
    scale = 9056 / 3828
    lm_ceiling = round(10.0 * 24 * scale, 1)  # 567.8
    assert c["lm_isolated_extrapolation_ms"] == lm_ceiling
    assert c["composite_ceiling_ms"] == round(lm_ceiling + 160.0, 1)
    assert c["pct_of_composite"] == round(
        100.0 * c["composite_ceiling_ms"] / 1000.0, 1)
    # remat ledger: recompute 2 ms/layer, dots recovers 75% of it, and the
    # recipe-batch rows carry the infeasibility evidence
    assert c["remat"]["recompute_ms_per_layer"] == 2.0
    assert c["remat"]["dots_recovers_pct"] == 75.0
    assert c["remat"]["at_recipe_batch"] == {
        "remat_dots": "JaxRuntimeError", "remat_off": "JaxRuntimeError"}
    assert c["dejure_floor_ms_at_peak197"] == 400.0
    assert c["pct_of_dejure"] == 40.0


def test_compute_composite_ignores_foreign_shape_probes(train_ceiling):
    """Layer probes at a different (B, S) (LAYER_B/LAYER_S ad-hoc runs)
    must not mix into the recompute ledger: all regimes come from ONE
    shape — the one with the most regimes."""
    sweep = _synthetic_sweep()
    # an odd-shape probe pair that would corrupt the subtraction if the
    # regime dict keyed rows across shapes (it sorts after (3, 1276))
    sweep["layer_train"]["rows"] += [
        {"name": "fwd_bwd_full", "B": 3, "S": 640, "remat": True,
         "ms_per_iter": 5.0},
        {"name": "fwd_bwd_full", "B": 3, "S": 640, "remat": False,
         "ms_per_iter": 4.0},
    ]
    c = train_ceiling.compute_composite(sweep)
    assert c["lm_layer_probe"]["S"] == 1276
    assert c["remat"]["recompute_ms_per_layer"] == 2.0
    assert c["remat"]["dots_recovers_pct"] == 75.0


def test_ceiling_refresh_preserves_foreign_composite_keys(
        train_ceiling, tmp_path, monkeypatch):
    """`python tools/train_ceiling.py` rewrites the composite block from
    the rows — it must MERGE over the committed block, not replace it:
    probe_remat_oom.py hangs composite.remat.oom_evidence there and a
    derivation refresh once silently deleted it."""
    import json

    sweep = _synthetic_sweep()
    sweep["train_budget"]["composite"] = {
        "remat": {"oom_evidence": {"remat_off": {"used_gb": 58.08}}},
        "external_note": "kept",
    }
    p = tmp_path / "sweep.json"
    p.write_text(json.dumps(sweep))
    monkeypatch.setenv("BENCH_OUT", str(p))
    train_ceiling.main()
    out = json.loads(p.read_text())["train_budget"]["composite"]
    assert out["remat"]["oom_evidence"]["remat_off"]["used_gb"] == 58.08
    assert out["external_note"] == "kept"
    # and the derivation itself still lands
    assert out["pct_of_composite"] > 0
    assert out["remat"]["recompute_ms_per_layer"] == 2.0


def test_compute_composite_on_committed_sweep(train_ceiling):
    """The committed BENCH_SWEEP.json must keep satisfying the derivation
    (the composite block the judge reads is reproducible from its rows)."""
    import json

    sweep = json.loads((REPO / "BENCH_SWEEP.json").read_text())
    c = train_ceiling.compute_composite(sweep)
    assert 50.0 < c["pct_of_composite"] <= 110.0
    # the committed block must exist (bench_train_budget.py once dropped it
    # on section rewrite) and match the derivation; oom_evidence is the one
    # key another tool (probe_remat_oom.py) adds on top
    committed = sweep["train_budget"]["composite"]
    committed["remat"].pop("oom_evidence", None)
    assert committed == c
