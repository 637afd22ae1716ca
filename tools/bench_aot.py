"""AOT executable serialization vs the axon warmup problem — the measurement.

Every serve/bench process pays 5-10 min of remote compiles at startup, and
round-3 measurements showed the persistent compile cache (/tmp/jax_cache)
does NOT reliably survive server restarts for TPU programs (CLAUDE.md).
The open question (VERDICT round 3 #6): does explicit AOT serialization —
`jit(f).lower(args).compile()` + `jax.experimental.serialize_executable` —
dodge the recompile when the blob is reloaded in a FRESH process?

Three-phase experiment, each phase its own process so nothing in-memory can
leak between them:

    save:  lower + compile the real image-decode program, time each stage,
           serialize the loaded executable to disk (pickle payload +
           in/out trees), run once for a correctness fingerprint.
    load:  deserialize_and_load the blob in a fresh process, time it, run,
           compare tokens to the fingerprint.
    jit:   (control) plain jit cold-start in a fresh process — what the
           load path is racing against, measured the same hour because
           axon remote-compile latency varies 4-30 min run to run.

Driver mode (no argument) runs save -> load [-> jit with AOT_COMPARE_JIT=1]
as subprocesses and writes the combined result to BENCH_SWEEP.json["aot"].

Shapes default tiny-but-real (B=2 CFG rows, 64 decode steps) so the
experiment turns around in minutes; AOT_FULL=1 uses the serve shape
(B=32, 576 steps). The verdict transfers: serialization support is a
property of the PJRT plugin, not the program size.

Env: AOT_FULL, AOT_COMPARE_JIT, AOT_DIR (default /tmp/plangen_aot).
"""

from __future__ import annotations

import json
import os
import pickle
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

AOT_DIR = Path(os.environ.get("AOT_DIR", "/tmp/plangen_aot"))
FULL = os.environ.get("AOT_FULL", "0") == "1"


def _build():
    """The real decode program + example args at the experiment shape."""
    import jax
    import jax.numpy as jnp

    from plangen_tpu.config import PlanGenModelConfig
    from plangen_tpu.runtime import generate as G

    import bench

    cfg = PlanGenModelConfig()
    B = 32 if FULL else 2
    L = 64 if FULL else 32
    n_tok = cfg.image_seq_len if FULL else 64
    key = jax.random.PRNGKey(0)
    params = bench._init_quantized_params(cfg, key, "bf16")
    embeds = jax.random.normal(
        jax.random.PRNGKey(1), (2 * B, L, cfg.llama.hidden_size),
        dtype=jnp.bfloat16,
    )
    mask = jnp.ones((2 * B, L + n_tok), dtype=jnp.int32)

    def fn(params, embeds, mask, rng):
        return G.generate_image_tokens(
            params, cfg, embeds, mask, rng=rng,
            cfg_weight=jnp.float32(5.0), temperature=jnp.float32(1.0),
            num_tokens=n_tok, quantized_cache=True, growing_cache=True,
        ).tokens

    args = (params, embeds, mask, jax.random.PRNGKey(7))
    return fn, args


def phase_save() -> None:
    import jax
    import numpy as np
    from jax.experimental import serialize_executable as se

    fn, args = _build()
    jitted = jax.jit(fn)
    r = {"phase": "save", "full": FULL}

    t0 = time.perf_counter()
    lowered = jitted.lower(*args)
    r["lower_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    compiled = lowered.compile()
    r["compile_s"] = round(time.perf_counter() - t0, 2)

    try:
        t0 = time.perf_counter()
        payload, in_tree, out_tree = se.serialize(compiled)
        r["serialize_s"] = round(time.perf_counter() - t0, 2)
        AOT_DIR.mkdir(parents=True, exist_ok=True)
        (AOT_DIR / "exe.pkl").write_bytes(
            pickle.dumps((payload, in_tree, out_tree))
        )
        r["blob_mb"] = round((AOT_DIR / "exe.pkl").stat().st_size / 2**20, 1)
    except Exception as e:  # the whole point of the experiment
        r["serialize_error"] = f"{type(e).__name__}: {e}"[:300]

    t0 = time.perf_counter()
    toks = np.asarray(compiled(*args))
    r["run_s"] = round(time.perf_counter() - t0, 2)
    # second call: steady-state (first may embed the deferred server compile)
    t0 = time.perf_counter()
    toks = np.asarray(compiled(*args))
    r["run2_s"] = round(time.perf_counter() - t0, 2)
    r["fingerprint"] = int(toks.sum()) % (2**31)
    r["head"] = [int(x) for x in toks.ravel()[:8]]
    (AOT_DIR / "save.json").write_text(json.dumps(r))
    print(json.dumps(r), flush=True)


def phase_load() -> None:
    import numpy as np
    from jax.experimental import serialize_executable as se

    r = {"phase": "load", "full": FULL}
    _, args = _build()  # args rebuilt fresh; trees come from the blob
    try:
        t0 = time.perf_counter()
        payload, in_tree, out_tree = pickle.loads(
            (AOT_DIR / "exe.pkl").read_bytes()
        )
        compiled = se.deserialize_and_load(payload, in_tree, out_tree)
        r["deserialize_s"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        toks = np.asarray(compiled(*args))
        r["run_s"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        toks = np.asarray(compiled(*args))
        r["run2_s"] = round(time.perf_counter() - t0, 2)
        saved = json.loads((AOT_DIR / "save.json").read_text())
        r["fingerprint_match"] = (
            int(toks.sum()) % (2**31) == saved["fingerprint"]
        )
        r["head"] = [int(x) for x in toks.ravel()[:8]]
        r["head_saved"] = saved.get("head")
    except Exception as e:
        r["load_error"] = f"{type(e).__name__}: {e}"[:300]
    (AOT_DIR / "load.json").write_text(json.dumps(r))
    print(json.dumps(r), flush=True)


def phase_jit() -> None:
    """Control: what a fresh process pays WITHOUT the blob (jit cold)."""
    import jax
    import numpy as np

    fn, args = _build()
    r = {"phase": "jit", "full": FULL}
    t0 = time.perf_counter()
    toks = np.asarray(jax.jit(fn)(*args))
    r["jit_cold_s"] = round(time.perf_counter() - t0, 2)
    r["fingerprint"] = int(toks.sum()) % (2**31)
    (AOT_DIR / "jit.json").write_text(json.dumps(r))
    print(json.dumps(r), flush=True)


def main() -> None:
    if len(sys.argv) > 1:
        {"save": phase_save, "load": phase_load, "jit": phase_jit}[
            sys.argv[1]
        ]()
        return

    phases = ["save", "load"]
    if os.environ.get("AOT_COMPARE_JIT", "0") == "1":
        phases.append("jit")
    for p in phases:
        rc = subprocess.run(
            [sys.executable, __file__, p], cwd=str(Path(__file__).parent)
        ).returncode
        if rc != 0:
            print(json.dumps({"phase": p, "rc": rc, "error": "subprocess"}))
    combined = {}
    for p in phases:
        f = AOT_DIR / f"{p}.json"
        if f.exists():
            combined[p] = json.loads(f.read_text())
    out_path = Path(__file__).parent.parent / "BENCH_SWEEP.json"
    doc = json.loads(out_path.read_text()) if out_path.exists() else {}
    doc["aot"] = {
        "note": (
            "AOT executable serialization vs per-process warmup "
            "(tools/bench_aot.py): save = lower+compile+serialize in proc 1, "
            "load = deserialize_and_load+run in a FRESH proc 2, jit = "
            "cold-start control in proc 3"
        ),
        **combined,
    }
    out_path.write_text(json.dumps(doc, indent=1))
    print(json.dumps({"aot": combined}, indent=1))


if __name__ == "__main__":
    main()
