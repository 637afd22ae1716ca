"""Would fusing same-input DENSE bf16 projections (q|k|v, gate|up) win at
large decode batch?

DESIGN §12: int8_kv B=64 (the best image-decode config, M=128 matmul rows)
runs its mats at 77% of their byte floor (3.92 vs 3.01 ms/step) — ~0.9
ms/step potentially on the table. Unlike the int4 pallas path there is no
per-call overhead to cut (XLA dots have none), but one [M, I] x [I, 3H] dot
may tile the MXU better than three [M, I] x [I, H] dots at M=128.

Measures split vs concat dense dots with the differential discipline of
tools/bench_mxu_stream.py / bench_int4_fuse.py (medians first, then the
difference — see diff_time there). Writes BENCH_SWEEP.json["dense_fuse"].

Result (2026-08-18, v5e): q|k|v 1.13x at M=64 / 1.19x at M=128 in
ISOLATION (the three [2048 -> 2048] dots pay per-dot tiling overhead the
single [2048 -> 6144] dot amortizes); gate|up 1.0x. BUT the e2e same-hour
A/B through the real decode program (BENCH_SWEEP_ONLY=int8_kv with/without
BENCH_FUSE_DENSE=1) came out B=1 +26%, B=32 -6%, B=64 -20% — at M>=64 the
fused output's split/reshape and its layout interplay with attention cost
more than the dot saves. Kept OPT-IN only (generation.fuse_dense_qkv,
default False), exactness tests retained (tests/test_dense_fuse.py) — the
isolated-microbench-vs-e2e divergence is the finding.

Measurement notes that cost three broken drafts: (1) a tail slice
`y[:, :I]` lets XLA trim unused dot output columns (pallas calls are
opaque, dense dots are NOT); (2) `sum(x @ W, -1)` rewrites to
`x @ colsum(W)` and the colsum hoists out of the loop; (3) at n2=360 the
axon tunnel's tens-of-ms dispatch variance swamps a 16 ms program —
negative differentials. Fix: abs() between dot and reduction, n2=2400.
"""
from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

L, I, H, O = 24, 2048, 2048, 5632  # 1B dims


def _chain(x0, y):
    # consume EVERY column of y THROUGH A NONLINEARITY: dense dots are
    # transparent to XLA (unlike pallas calls), so a `y[:, :I]` slice lets
    # it trim unused output columns out of the dot, and a plain
    # `sum(y, -1)` is algebraically `x @ colsum(W)` with the colsum
    # HOISTED out of the loop (W is loop-invariant) — both first drafts of
    # this bench measured "below the byte floor" because of exactly that.
    # abs() blocks the linear rewrite; its VPU cost is equal across
    # variants and cancels in the split-vs-fused comparison.
    return x0 + jnp.sum(
        jnp.abs(y), axis=-1, keepdims=True
    ).astype(jnp.bfloat16) * jnp.bfloat16(1e-6)


@functools.partial(jax.jit, static_argnames="n")
def qkv_split(q, k, v, x0, n):
    def body(i, x):
        l = jax.lax.rem(i, L)
        sl = lambda w: jax.lax.dynamic_index_in_dim(w, l, 0, keepdims=False)
        a = x @ sl(q)
        b = x @ sl(k)
        c = x @ sl(v)
        return _chain(x0, a * b + c)

    return jax.lax.fori_loop(0, n, body, x0)


@functools.partial(jax.jit, static_argnames="n")
def qkv_fused(w, x0, n):
    def body(i, x):
        l = jax.lax.rem(i, L)
        y = x @ jax.lax.dynamic_index_in_dim(w, l, 0, keepdims=False)
        return _chain(x0, y[:, :H] * y[:, H:2 * H] + y[:, 2 * H:])

    return jax.lax.fori_loop(0, n, body, x0)


@functools.partial(jax.jit, static_argnames="n")
def gu_split(g, u, x0, n):
    def body(i, x):
        l = jax.lax.rem(i, L)
        sl = lambda w: jax.lax.dynamic_index_in_dim(w, l, 0, keepdims=False)
        return _chain(x0, (x @ sl(g)) * (x @ sl(u)))

    return jax.lax.fori_loop(0, n, body, x0)


@functools.partial(jax.jit, static_argnames="n")
def gu_fused(w, x0, n):
    def body(i, x):
        l = jax.lax.rem(i, L)
        y = x @ jax.lax.dynamic_index_in_dim(w, l, 0, keepdims=False)
        return _chain(x0, y[:, :O] * y[:, O:])

    return jax.lax.fori_loop(0, n, body, x0)


def diff_time(call, n1=240, n2=2400, repeats=7):
    np.asarray(call(n1))  # compile
    np.asarray(call(n2))
    ts = {n1: [], n2: []}
    for _ in range(repeats):
        for n in (n1, n2):
            t0 = time.perf_counter()
            np.asarray(call(n))
            ts[n].append(time.perf_counter() - t0)
    med = {n: sorted(v)[len(v) // 2] for n, v in ts.items()}
    return (med[n2] - med[n1]) / (n2 - n1) * 1e6


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    bf = jnp.bfloat16
    q = jax.random.normal(ks[0], (L, I, H), bf)
    k = jax.random.normal(ks[1], (L, I, H), bf)
    v = jax.random.normal(ks[2], (L, I, H), bf)
    qkv = jnp.concatenate([q, k, v], axis=-1)
    g = jax.random.normal(ks[3], (L, I, O), bf)
    u = jax.random.normal(ks[4], (L, I, O), bf)
    gu = jnp.concatenate([g, u], axis=-1)

    rows = []
    for m in (64, 128):
        x0 = jax.random.normal(ks[5], (m, I), bf)
        s3 = diff_time(lambda n: qkv_split(q, k, v, x0, n))
        f3 = diff_time(lambda n: qkv_fused(qkv, x0, n))
        s2 = diff_time(lambda n: gu_split(g, u, x0, n))
        f2 = diff_time(lambda n: gu_fused(gu, x0, n))
        row = {
            "rows_m": m,
            "qkv_us_split3": round(s3, 2), "qkv_us_fused3": round(f3, 2),
            "qkv_speedup": round(s3 / f3, 3),
            "gu_us_split2": round(s2, 2), "gu_us_fused2": round(f2, 2),
            "gu_speedup": round(s2 / f2, 3),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = Path(__file__).parent.parent / "BENCH_SWEEP.json"
    doc = json.loads(out.read_text()) if out.exists() else {}
    doc["dense_fuse"] = {
        "note": (
            "same-input DENSE bf16 projections as N XLA dots vs 1 concat "
            "dot, per-layer us (tools/bench_dense_fuse.py differential "
            "timing; 1B dims, stacked 24 layers). Sizing probe for the "
            "§12 int8_kv B=64 mats residual (3.92 vs 3.01 ms byte floor)."
        ),
        "rows": rows,
    }
    out.write_text(json.dumps(doc, indent=1))


if __name__ == "__main__":
    main()
