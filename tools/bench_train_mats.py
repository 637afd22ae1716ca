"""Isolated d->d matmul chain at TRAINING shapes: the qkvo practical ceiling.

Round-5 budget attribution (BENCH_SWEEP train_budget, T=700 recipe batch):
the four d=2048 square projections run at ~60% of their blanket flops floor
(delta 247.2 ms vs 148.3 floor share) while the MLP matmuls run at ~85%.
This probe measures what XLA actually achieves on an isolated chain of four
[M, 2048] x [2048, 2048] matmuls, fwd and fwd+bwd (dX + dW), at the step's
M (uni/mmu rows: 3 x 1276 = 3828) — the practical ceiling for qkvo. If the
in-model rate matches the isolated rate, qkvo is AT its ceiling and the gap
to the blanket floor is an XLA-shape property, not harvestable; if the
isolated rate is higher, the difference bounds the harvest.

The fwd+bwd body writes the three matmul groups EXPLICITLY (fwd y=xW,
dX=g Wᵀ, dW=xᵀg) with a distinct per-matmul cotangent g_i = y_i, because
jax.grad of a LINEAR chain lets XLA hoist dX (constant in x) out of the
loop and dead-code the forward — the first version of this probe measured
exactly that and produced a sub-noise negative differential.

Differential timing (bench_mxu_stream.py pattern). Writes BENCH_SWEEP.json
"train_mats" rows. Env: MATS_M (default 3828), MATS_ITERS "N1,N2".
"""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass

D = 2048
N_MATS = 4  # q, k, v, o


def make_ws(key):
    ks = jax.random.split(key, N_MATS)
    return [jax.random.normal(k, (D, D), dtype=jnp.bfloat16) * 0.02 for k in ks]


def _renorm(y, like):
    # cheap chaining: keep magnitudes bounded across iterations without a
    # serializing full reduce dominating (31 MB fp32 read, ~0.04 ms)
    return (y / (jnp.max(jnp.abs(y)) + 1.0)).astype(like.dtype)


def fwd_loop(x0, ws, n):
    def body(i, x):
        outs = [jnp.dot(x, w, preferred_element_type=jnp.float32)
                for w in ws]
        return _renorm(sum(outs), x0)

    return jax.lax.fori_loop(0, n, body, x0)


def fwd_bwd_loop(x0, ws, n):
    """Explicit fwd + dX + dW: 12 [*,2048]x[2048,*] matmuls per iteration,
    each with a distinct operand pair so no CSE/hoist is possible. The
    carry threads x through dX (so fwd+dX stay live) and an accumulator
    through dW sums (so the weight-gradient matmuls stay live)."""

    def body(i, carry):
        x, acc = carry
        ys = [jnp.dot(x, w, preferred_element_type=jnp.float32)
              for w in ws]                                    # fwd (4)
        gs = [y.astype(jnp.bfloat16) for y in ys]             # cotangent=y_i
        dxs = [jnp.dot(g, w.T, preferred_element_type=jnp.float32)
               for g, w in zip(gs, ws)]                       # dX (4)
        dws = [jnp.dot(x.T, g, preferred_element_type=jnp.float32)
               for g in gs]                                   # dW (4)
        acc = acc + sum(jnp.sum(dw) for dw in dws)
        return _renorm(sum(dxs), x0), acc

    return jax.lax.fori_loop(0, n, body, (x0, jnp.float32(0.0)))


def main():
    M = int(os.environ.get("MATS_M", "3828"))
    n1, n2 = (int(x) for x in os.environ.get("MATS_ITERS", "10,110").split(","))
    out_path = Path(os.environ.get(
        "BENCH_OUT", Path(__file__).parent.parent / "BENCH_SWEEP.json"))
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (M, D), dtype=jnp.bfloat16)
    ws = make_ws(key)

    flops_fwd = 2 * M * D * D * N_MATS
    rows = []
    for name, fn, flops in (
        ("fwd", fwd_loop, flops_fwd),
        ("fwd_bwd", fwd_bwd_loop, 3 * flops_fwd),  # fwd + dX + dW
    ):
        f = jax.jit(fn)

        def run(n):
            out = f(x, ws, n)
            leaf = out[0] if isinstance(out, tuple) else out
            np.asarray(leaf)

        t0 = time.time()
        run(n1)
        compile_s = time.time() - t0

        def t(n):
            best = 1e9
            for _ in range(5):
                t0 = time.time()
                run(n)
                best = min(best, time.time() - t0)
            return best

        per_iter = (t(n2) - t(n1)) / (n2 - n1)
        row = {
            "name": name, "M": M,
            "ms_per_iter": round(per_iter * 1e3, 3),
            "tflops": round(flops / per_iter / 1e12, 1),
            "compile_s": round(compile_s, 1),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    doc = json.loads(out_path.read_text()) if out_path.exists() else {}
    key_of = lambda r: (r["name"], r["M"])
    old = {key_of(r): r for r in doc.get("train_mats", {}).get("rows", [])}
    for r in rows:
        old[key_of(r)] = r
    doc["train_mats"] = {
        "note": (
            "isolated 4x [M,2048]x[2048,2048] bf16 chain (qkvo-shaped), "
            "fwd and explicit fwd+dX+dW (tools/bench_train_mats.py, "
            "differential) — the practical XLA ceiling for the qkvo share"
        ),
        "rows": sorted(old.values(), key=key_of),
    }
    out_path.write_text(json.dumps(doc, indent=1))


if __name__ == "__main__":
    main()
