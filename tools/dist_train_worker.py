"""Multi-process data-parallel train worker (driven by tests/test_distributed.py).

Runs the REAL Trainer under `jax.distributed` on virtual CPU devices: N
processes x (8/N) devices = the same 8-device data mesh the single-process
suite uses, with each process loading only its BatchLoader shard and the
global batch assembled via `jax.make_array_from_process_local_data`
(train/trainer.py:_device_batches). This is the true multi-PROCESS execution
of the distribution story — the counterpart of the reference's Accelerate
multi-process DDP launch (reference train.py:58-64; NCCL all-reduce -> here
XLA/Gloo collectives under one jitted step).

Writes {"loss": <step-1 loss>, "param_absum": <|params| after fit>} to the
given JSON path; the test asserts both match the single-process run.

Usage: python tools/dist_train_worker.py <process_id> <num_processes> <port>
       <shared_output_dir> <result_json> <max_steps>
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def param_absum(params) -> float:
    """Scalar fingerprint of a parameter tree: sum of |leaf| sums (fp64 on
    host). Data-parallel params are replicated, so every process computes the
    same value — and it must equal the single-process run's."""
    import jax
    import numpy as np

    total = 0.0
    for leaf in jax.tree_util.tree_leaves(params):
        total += float(np.sum(np.abs(np.asarray(leaf, dtype=np.float64))))
    return total


def main() -> None:
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, out_dir, result_path = sys.argv[3], sys.argv[4], sys.argv[5]
    max_steps = int(sys.argv[6])

    n_local = 8 // nproc
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local}"
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from plangen_tpu.parallel.mesh import init_distributed

    init_distributed(f"127.0.0.1:{port}", num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 8, jax.devices()

    from plangen_tpu.cli import load_config
    from plangen_tpu.train.trainer import Trainer

    # shared output_dir across processes: orbax coordinates the checkpoint
    # write; metrics.jsonl/params.jsonl are lead-gated in the Trainer
    cfg = load_config(
        "configs/toy_smoke.py",
        [f"train.output_dir={out_dir}", "generation.max_new_text_tokens=4"],
    )
    t = Trainer(cfg)
    metrics = t.fit(max_steps=max_steps)
    result = {
        "process_id": pid,
        "loss": metrics["loss"],
        "param_absum": param_absum(t.state.params),
    }
    Path(result_path).write_text(json.dumps(result))
    print(f"worker {pid}: {result}", flush=True)


if __name__ == "__main__":
    main()
