"""Isolated matmul chains at TRAINING shapes: measured ceilings for the
train-step's matmul components (qkvo and MLP), fwd and fwd+dX+dW.

Round-5 budget attribution (BENCH_SWEEP train_budget, T=700 recipe batch)
gives the four d=2048 square projections 247.2 ms vs a 148.1 ms blanket
peak-flops share, and the MLP 357.6 ms vs 305.4. Blanket peak is not a
reachable bound at these shapes; this probe measures what XLA actually
achieves on an ISOLATED dependent chain of the same matmuls at the step's
M (uni/mmu rows: 3 x 1276 = 3828), which is. If the in-model rate matches
the isolated rate, the component is AT its ceiling and the blanket gap is
an XLA-shape property, not harvestable; if the isolated rate is higher,
the difference bounds the harvest.

Groups (weights as (in, out) pairs, all chained back to [M, 2048]):
  split     q,k,v,o as four [2048, 2048] leaves (the model's layout)
  fused     one [2048, 6144] qkv dot + o — the decode-path fuse_dense_qkv
            transform at training M (XLA's DotMerger may make these equal)
  mlp       gate|up as one [2048, 11264] dot + down [5632, 2048]
            (flop-identical to the model's gate/up/down)

Anti-dead-code measures, each one EARNED by a measured impossibility:
  * every matmul output passes a leaky-relu before reuse — XLA reorders
    cast-only dot chains (x@w0@w1 -> x@(w0@w1), x^T@(x@w) -> (x^T x)@w,
    (x@w)@w^T -> x@(w w^T) hoisted) and a cast-only fwd_bwd chain clocked
    an impossible 618 "TFLOPs" (chip peak: 197)
  * fused-group narrowing is a max-reduce — a reshape-SUM folds into the
    weight (sum_k (x@W)[:,kD:(k+1)D] = x @ sum_k W[:,kD:(k+1)D], constant-
    folded; measured 244 "TFLOPs")
  * dX/dW stay live via sum-of-SQUARES accumulators — a plain sum(x^T@g)
    folds to rowsum(x)@rowsum(g), O(M*D), dead-coding the dW matmuls
    (measured 245 "TFLOPs")

Differential timing (bench_mxu_stream.py pattern). Writes BENCH_SWEEP.json
"train_mats" rows. Env: MATS_M (default 3828), MATS_ITERS "N1,N2",
MATS_ONLY row-name subset.
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
FFN = 5632

# weights as (in, out) pairs; chains run x[M,2048] through each in order,
# max-narrowing whenever the output width is a multiple of the next input
GROUPS = {
    "split": ((D, D), (D, D), (D, D), (D, D)),
    "fused": ((D, 3 * D), (D, D)),
    "mlp": ((D, 2 * FFN), (FFN, D)),
}


def make_ws(key, dims):
    # 0.02 scale => spectral norm ~0.9 at these widths: activations decay
    # slowly through the chain, so no per-iteration renorm reduce is needed
    # (an earlier version normalized by max|y| each iter — a serializing
    # full reduce inside the timed loop)
    ks = jax.random.split(key, len(dims))
    return [jax.random.normal(k, (i, o), dtype=jnp.bfloat16) * 0.02
            for k, (i, o) in zip(ks, dims)]


def _nl(y):
    # leaky-relu on every matmul output: blocks dot reassociation (see
    # module docstring). The real model has a nonlinearity/norm between
    # every sequential matmul pair, so this is also the honest analog.
    return jnp.maximum(y, 0.01 * y)


def _narrow(y, width):
    # reduce [M, k*width] to [M, width] for chaining; max keeps every
    # column live and cannot fold into the weight (a reshape-sum can)
    M, W = y.shape
    if W == width:
        return y
    assert W % width == 0, (W, width)
    return y.reshape(M, W // width, width).max(axis=1)


def fwd_loop(x0, ws, n):
    """Sequential dependent chain: per iteration one matmul per weight,
    nonlinearity + max-narrow + cast chaining."""
    widths = [w.shape[0] for w in ws[1:]] + [x0.shape[1]]

    def body(i, x):
        for w, nxt in zip(ws, widths):
            x = _narrow(_nl(jnp.dot(x, w, preferred_element_type=jnp.float32)),
                        nxt).astype(x0.dtype)
        return x

    return jax.lax.fori_loop(0, n, body, x0)


def fwd_bwd_loop(x0, ws, n):
    """Explicit fwd + dX + dW (3x the fwd matmul flops). jax.grad of the
    chain would let XLA hoist/dead-code pieces (the first version of this
    probe measured exactly that), so the three matmul groups are written
    explicitly with the cotangent g = nl(y): fwd chains to the next weight
    through y (like the real forward), dX and dW stay live through
    sum-of-squares accumulators."""
    widths = [w.shape[0] for w in ws[1:]] + [x0.shape[1]]

    def body(i, carry):
        x, acc = carry
        for w, nxt in zip(ws, widths):
            y = jnp.dot(x, w, preferred_element_type=jnp.float32)  # fwd
            g = _nl(y).astype(jnp.bfloat16)                   # cotangent
            dx = jnp.dot(g, w.T, preferred_element_type=jnp.float32)  # dX
            dw = jnp.dot(x.T, g, preferred_element_type=jnp.float32)  # dW
            acc = acc + jnp.sum(jnp.square(dx)) + jnp.sum(jnp.square(dw))
            x = _narrow(g.astype(jnp.float32), nxt).astype(x0.dtype)
        return x, acc

    return jax.lax.fori_loop(0, n, body, (x0, jnp.float32(0.0)))


def main():
    M = int(os.environ.get("MATS_M", "3828"))
    n1, n2 = (int(x) for x in os.environ.get("MATS_ITERS", "10,110").split(","))
    out_path = Path(os.environ.get(
        "BENCH_OUT", Path(__file__).parent.parent / "BENCH_SWEEP.json"))
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (M, D), dtype=jnp.bfloat16)
    only = os.environ.get("MATS_ONLY")

    rows = []
    for gname, dims in GROUPS.items():
        ws = make_ws(key, dims)
        flops_fwd = sum(2 * M * i * o for i, o in dims)
        for base, fn, flops in (
            ("fwd", fwd_loop, flops_fwd),
            ("fwd_bwd", fwd_bwd_loop, 3 * flops_fwd),  # fwd + dX + dW
        ):
            name = base if gname == "split" else f"{base}_{gname}"
            if only and name not in only.split(","):
                continue

            # the host sync must fetch SCALARS only: the chain's values
            # decay and underflow to exact zeros after ~100 iterations,
            # and the axon tunnel ships an all-zero [M, D] buffer faster
            # than a dense one — fetching x made t(n2) biased low vs
            # t(n1) and the differential collapsed (measured -0.1 and
            # 327 "ms/iter"/"TFLOPs" rows). One on-device reduce per CALL
            # (outside the loop), constant 4-byte transfers.
            def scalar_fn(x, ws, n, _fn=fn):
                out = _fn(x, ws, n)
                xf = out[0] if isinstance(out, tuple) else out
                s = jnp.sum(jnp.square(xf.astype(jnp.float32)))
                if isinstance(out, tuple):
                    s = s + out[1]
                return s

            f = jax.jit(scalar_fn)

            def run(n):
                np.asarray(f(x, ws, n))

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
            "isolated matmul chains at training M (qkvo split/fused and "
            "gate|up+down MLP shapes), fwd and explicit fwd+dX+dW "
            "(tools/bench_train_mats.py, differential, nonlinearity "
            "between mats so XLA cannot reassociate) — the practical XLA "
            "ceilings for the train-step matmul components"
        ),
        "rows": sorted(old.values(), key=key_of),
    }
    out_path.write_text(json.dumps(doc, indent=1))


if __name__ == "__main__":
    main()
