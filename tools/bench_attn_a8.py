"""Microbenchmark: decode-attention variants over the int8 KV cache.

Measures per-step single-layer decode attention at serving shapes
(B2=64 CFG rows, S=640, H=16, D=128) for:
  * bf16   — dot_product_attention over a bf16 cache (its own read floor)
  * q8     — dot_product_attention_q8 (current int8 path; DESIGN.md §8
             measured it at ~413 GB/s effective vs a 638 GB/s read floor)
  * q8a8   — s8 x s8 MXU variant (a8=True): quantized query/probability rows
  * floor  — xor-reduce of the same int8 bytes (pure-read floor)

Each variant runs as a jitted fori_loop with the output chained into the
next query; per-step time is DIFFERENTIAL — median t(5*steps) minus median
t(steps) over the step delta — so the ~40 ms axon dispatch constant cancels
(bench_mxu_stream discipline; an earlier draft divided a single call by
steps and carried ~0.6 ms/step of dispatch inside the numbers). Timing via
np.asarray (block_until_ready returns early under the axon plugin).

Usage: python tools/bench_attn_a8.py [--steps 64] [--b2 64] [--s 640]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--b2", type=int, default=64)
    ap.add_argument("--s", type=int, default=640)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--dim", type=int, default=128)
    args = ap.parse_args()

    from plangen_tpu.ops.attention import (
        dot_product_attention,
        dot_product_attention_q8,
        make_causal_bias,
        quantize_kv,
    )

    B2, S, H, D = args.b2, args.s, args.heads, args.dim
    steps = args.steps
    pad_mask = jnp.ones((B2, S), dtype=jnp.int32)
    bias = make_causal_bias(
        pad_mask, jnp.array([S - 1], jnp.int32), jnp.arange(S, dtype=jnp.int32)
    )

    # The caches are BUILT INSIDE each jitted program (from a tiny key arg):
    # passing them as jit arguments pins the host row-major [B,S,H,D] layout
    # and XLA then materializes a per-step transpose for the (b,h)-batched
    # matmuls (~3x traffic, measured); created in-program, XLA picks the
    # layout exactly as in the real decode loop, where the cache lives in
    # the fori_loop carry. One-time generation amortizes over `steps`.

    def make_run(mode, steps):
        def run(key):
            kk, kv, kq = jax.random.split(key, 3)
            k = jax.random.normal(kk, (B2, S, H, D), dtype=jnp.bfloat16)
            v = jax.random.normal(kv, (B2, S, H, D), dtype=jnp.bfloat16)
            q0 = jax.random.normal(kq, (B2, 1, H, D), dtype=jnp.bfloat16)
            if mode == "bf16":
                ops = (k, v)
                attn = lambda q: dot_product_attention(q, *ops, bias=bias)
            elif mode in ("q8", "q8a8"):
                ops = quantize_kv(k, v)
                attn = lambda q: dot_product_attention_q8(
                    q, *ops, bias=bias, a8=(mode == "q8a8")
                )
            elif mode == "floor_int8_read":
                k_q8, _, v_q8, _ = quantize_kv(k, v)

                def body(i, carry):
                    acc, q = carry
                    # two STATIC slices alternated by parity: loop-variant
                    # (no hoisting) without a dynamic-slice copy
                    def red(x):
                        return jax.lax.reduce(
                            x, jnp.int8(0), jax.lax.bitwise_xor, (0, 1, 2, 3)
                        )

                    acc = acc ^ jax.lax.cond(
                        i % 2 == 0,
                        lambda: red(k_q8[:, : S - 1]) ^ red(v_q8[:, : S - 1]),
                        lambda: red(k_q8[:, 1:]) ^ red(v_q8[:, 1:]),
                    )
                    return acc, q + acc.astype(jnp.bfloat16)

                acc, qf = jax.lax.fori_loop(0, steps, body, (jnp.int8(0), q0))
                return qf

            def body(i, q):
                out = attn(q)  # [B2, 1, H, D]
                n = jnp.sqrt(jnp.mean(out.astype(jnp.float32) ** 2) + 1e-6)
                return (out.astype(jnp.float32) / n).astype(jnp.bfloat16)

            return jax.lax.fori_loop(0, steps, body, q0)

        return jax.jit(run)

    key = jax.random.PRNGKey(0)
    kv_bytes_int8 = 2 * B2 * S * H * D  # K+V int8
    results = {}
    # DIFFERENTIAL timing (bench_mxu_stream discipline; CLAUDE.md): the
    # per-call axon dispatch constant (~40 ms) would otherwise sit inside
    # a 25-30 ms program and inflate per-step numbers ~2x. Medians first,
    # then the difference.
    n1, n2 = steps, steps * 5
    for name in ("bf16", "q8", "q8a8", "floor_int8_read"):
        f1, f2 = make_run(name, n1), make_run(name, n2)
        t0 = time.time()
        np.asarray(f1(key))
        compile_s = time.time() - t0
        np.asarray(f2(key))
        ts = {n1: [], n2: []}
        for _ in range(5):
            for n, f in ((n1, f1), (n2, f2)):
                t0 = time.time()
                np.asarray(f(key))
                ts[n].append(time.time() - t0)
        med = {n: sorted(v)[len(v) // 2] for n, v in ts.items()}
        per_step = (med[n2] - med[n1]) / (n2 - n1)
        per_step_us = per_step * 1e6
        bw = kv_bytes_int8 / per_step / 1e9
        results[name] = {
            "per_step_us": round(per_step_us, 2),
            "eff_GBps_vs_int8_bytes": round(bw, 1),
            "compile_s": round(compile_s, 1),
        }
        print(json.dumps({name: results[name]}), flush=True)

    print(json.dumps({"shapes": [B2, S, H, D], "steps": steps, **results}))


if __name__ == "__main__":
    main()
