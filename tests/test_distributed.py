"""True multi-PROCESS data-parallel execution (VERDICT r3 item 3).

The single-process suite exercises the 8-virtual-device mesh; this test runs
the SAME toy multi-task training through `jax.distributed` with 2 real OS
processes x 4 CPU devices each (Gloo collectives), per-process BatchLoader
shards, and `make_array_from_process_local_data` global-batch assembly —
the reference's Accelerate multi-process DDP shape (train.py:58-64).

Equivalence contract: the 2-process global batch is the same multiset of
rows as the single-process batch (loader stride sharding), and CE losses /
grad means are row-permutation-invariant, so the step-1 loss and the
post-training parameter fingerprint must match the single-process run to
floating-point reduction tolerance.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow  # ~7 min: two real OS processes + Gloo
def test_two_process_ddp_matches_single_process(tmp_path):
    # no pytest-timeout in this env: the communicate(timeout=800) below is
    # the hang guard
    port = _free_port()
    out_dir = tmp_path / "shared_run"
    results = [tmp_path / f"result{p}.json" for p in range(2)]
    env = dict(os.environ)
    # the workers self-provision JAX_PLATFORMS/XLA_FLAGS; scrub this
    # process's 8-device flag so each worker gets exactly 4
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, "tools/dist_train_worker.py",
             str(p), "2", str(port), str(out_dir), str(results[p]), "2"],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for p in range(2)
    ]
    outs = []
    for proc in procs:
        try:
            out, _ = proc.communicate(timeout=800)
        except subprocess.TimeoutExpired:
            for p2 in procs:
                p2.kill()
            raise
        outs.append(out)
    for p, (proc, out) in enumerate(zip(procs, outs)):
        assert proc.returncode == 0, f"worker {p} failed:\n{out[-4000:]}"

    r0, r1 = (json.loads(r.read_text()) for r in results)
    # both processes observed the same replicated state
    assert r0["loss"] == pytest.approx(r1["loss"], rel=1e-6)
    assert r0["param_absum"] == pytest.approx(r1["param_absum"], rel=1e-9)

    # single-process 8-device reference run (this pytest process IS that
    # environment: conftest forces 8 virtual CPU devices)
    sys.path.insert(0, str(REPO / "tools"))
    from dist_train_worker import param_absum

    from plangen_tpu.cli import load_config
    from plangen_tpu.train.trainer import Trainer

    cfg = load_config(
        "configs/toy_smoke.py",
        [f"train.output_dir={tmp_path}/single_run",
         "generation.max_new_text_tokens=4"],
    )
    t = Trainer(cfg)
    metrics = t.fit(max_steps=2)

    # same data multiset per step + row-permutation-invariant losses:
    # only fp reduction-order noise may differ
    assert r0["loss"] == pytest.approx(metrics["loss"], rel=2e-4)
    assert r0["param_absum"] == pytest.approx(
        param_absum(t.state.params), rel=2e-5
    )

    # the shared-dir checkpoint was written exactly once and is complete
    ckpt_root = out_dir / "checkpoints"
    assert ckpt_root.exists()
    # lead-gated artifacts exist once in the shared dir
    assert (out_dir / "metrics.jsonl").exists()
    assert (out_dir / "params.jsonl").exists()
