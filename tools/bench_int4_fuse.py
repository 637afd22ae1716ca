"""Does pairing two same-input int4 matmuls into ONE pallas_call win?

The packed-nibble format (ops/pallas_int4_matmul.py) recovers TWO output
column blocks from one packed byte tile, so quantizing the CONCATENATION of
two same-input weights (gate|up, q|k) computes both projections in a single
pallas_call with zero kernel changes: lo half-columns = first weight,
hi half-columns = second. Per decode layer that cuts 7 kernel calls to 5
and (at 1B MLP dims) halves the grid-step count — 1 call x 11 steps of
[2048, 512] blocks instead of 2 calls x 11 steps of [2048, 256].

DESIGN §12 sized the prize: int4 B=32 mats run at 49% of their byte floor
(1.54 vs 0.75 ms/step), attributed to per-call + per-grid-step overhead at
small M. This bench measures the candidate directly, with the differential
discipline of tools/bench_mxu_stream.py (t(n2)-t(n1) cancels the ~40 ms
axon dispatch constant): a fori_loop over the 24 stacked MLP layers doing
gate+up as two calls (split) vs one fused call, at decode row counts
M=2 (B=1 CFG) and M=64 (B=32 CFG).

Writes BENCH_SWEEP.json["int4_fuse"] rows: us/layer for split vs fused.
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

from plangen_tpu.ops.pallas_int4_matmul import int4_matmul  # noqa: E402

L, I, O = 24, 2048, 5632  # 1B MLP dims: gate/up are [I, O] each


def _packed(key, oh):
    """Random stacked packed-int4 leaves with production shapes/dtypes."""
    kw, kl, kh = jax.random.split(key, 3)
    return {
        "w_p4": jax.random.randint(kw, (L, I, oh), -128, 128, jnp.int32)
        .astype(jnp.int8),
        "s_lo": jax.random.uniform(kl, (L, 1, oh), jnp.float32, 0.001, 0.01),
        "s_hi16": jax.random.uniform(kh, (L, 1, oh), jnp.float32,
                                     0.0001, 0.001),
    }


def _chain(x0, y):
    # cheap data dependence folding [m, >=I] back to [m, I] so the loop
    # cannot be collapsed; mirrors bench_mxu_stream's feedback trick
    return (x0 + y[:, :I] * jnp.float32(1e-3).astype(y.dtype)).astype(
        jnp.bfloat16
    )


# weights are ARGUMENTS, never closures: a closure-captured operand is
# serialized into the axon remote-compile request body (HTTP 413 at these
# sizes — CLAUDE.md)
@functools.partial(jax.jit, static_argnames="n")
def run_split(gate, up, x0, n):
    def body(i, x):
        l = jax.lax.rem(i, L)
        g = int4_matmul(x, {**gate, "_layer": l})
        u = int4_matmul(x, {**up, "_layer": l})
        return _chain(x0, g * u)

    return jax.lax.fori_loop(0, n, body, x0)


@functools.partial(jax.jit, static_argnames="n")
def run_fused(fused, x0, n):
    def body(i, x):
        l = jax.lax.rem(i, L)
        gu = int4_matmul(x, {**fused, "_layer": l})
        return _chain(x0, gu[:, :O] * gu[:, O:])

    return jax.lax.fori_loop(0, n, body, x0)


def diff_time(call, n1, n2, repeats=5):
    """Differential us/iter: median(t(n2)) - median(t(n1)) over n2-n1.

    Medians FIRST, then the difference — a min (or mean) of per-repeat
    differences is biased low whenever the n1 run catches a scheduler/
    tunnel hiccup (observed: a 4.3x 'speedup' that a direct large-n
    timing showed was really 1.2x)."""
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


# attention dims (1B MHA): q/k/v each [I, H] — candidate 3-way fuse
H = 2048


@functools.partial(jax.jit, static_argnames="n")
def run_split3(q, k, v, x0, n):
    def body(i, x):
        l = jax.lax.rem(i, L)
        a = int4_matmul(x, {**q, "_layer": l})
        b = int4_matmul(x, {**k, "_layer": l})
        c = int4_matmul(x, {**v, "_layer": l})
        return _chain(x0, a * b + c)

    return jax.lax.fori_loop(0, n, body, x0)


@functools.partial(jax.jit, static_argnames="n")
def run_fused3(fused, x0, n):
    def body(i, x):
        l = jax.lax.rem(i, L)
        y = int4_matmul(x, {**fused, "_layer": l})
        return _chain(x0, y[:, :H] * y[:, H:2*H] + y[:, 2*H:])

    return jax.lax.fori_loop(0, n, body, x0)


def main():
    rows = []
    key = jax.random.PRNGKey(0)
    # split: gate and up each [L, I, O] -> packed OH = O//2 = 2816
    gate = _packed(jax.random.fold_in(key, 1), O // 2)
    up = _packed(jax.random.fold_in(key, 2), O // 2)
    # fused: concat([gate, up], -1) -> [L, I, 2O] -> packed OH = O = 5632
    fused = _packed(jax.random.fold_in(key, 3), O)
    # qkv: three [L, I, H] -> fused [L, I, 3H], packed OH = 3H/2 = 3072
    q3 = _packed(jax.random.fold_in(key, 4), H // 2)
    k3 = _packed(jax.random.fold_in(key, 5), H // 2)
    v3 = _packed(jax.random.fold_in(key, 6), H // 2)
    qkv = _packed(jax.random.fold_in(key, 7), 3 * H // 2)
    for m in (2, 64):
        x0 = jax.random.normal(key, (m, I), dtype=jnp.bfloat16)
        n1, n2 = 480, 1920  # multiples of L so both end on layer boundary
        us_split = diff_time(lambda n: run_split(gate, up, x0, n), n1, n2)
        us_fused = diff_time(lambda n: run_fused(fused, x0, n), n1, n2)
        us_s3 = diff_time(lambda n: run_split3(q3, k3, v3, x0, n), n1, n2)
        us_f3 = diff_time(lambda n: run_fused3(qkv, x0, n), n1, n2)
        row = {
            "rows_m": m,
            "us_per_layer_split": round(us_split, 2),
            "us_per_layer_fused": round(us_fused, 2),
            "speedup": round(us_split / us_fused, 3),
            "qkv_us_split3": round(us_s3, 2),
            "qkv_us_fused3": round(us_f3, 2),
            "qkv_speedup": round(us_s3 / us_f3, 3),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    out_path = Path(__file__).parent.parent / "BENCH_SWEEP.json"
    doc = json.loads(out_path.read_text()) if out_path.exists() else {}
    doc["int4_fuse"] = {
        "note": (
            "same-input projections as N pallas_calls vs 1 fused packed "
            "call: gate|up pair at 1B MLP dims, q|k|v triple at 1B attn "
            "dims (tools/bench_int4_fuse.py, differential us/layer, decode "
            "fori_loop over 24 stacked layers)"
        ),
        "rows": rows,
    }
    out_path.write_text(json.dumps(doc, indent=1))


if __name__ == "__main__":
    main()
