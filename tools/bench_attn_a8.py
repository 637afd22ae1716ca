"""Microbenchmark: decode-attention variants over the int8 KV cache.

Measures per-step single-layer decode attention at serving shapes
(B2=64 CFG rows, S=640, H=16, D=128) for:
  * bf16   — dot_product_attention over a bf16 cache (its own read floor)
  * q8     — dot_product_attention_q8 (current int8 path; DESIGN.md §8
             measured it at ~413 GB/s effective vs a 638 GB/s read floor)
  * q8a8   — s8 x s8 MXU variant (a8=True): quantized query/probability rows
  * floor  — xor-reduce of the same int8 bytes (pure-read floor)

Each variant runs as ONE jitted fori_loop of STEPS iterations with the output
chained into the next query, so per-step time excludes dispatch. Timing via
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
    key = jax.random.PRNGKey(0)
    kk, kv, kq = jax.random.split(key, 3)
    k = jax.random.normal(kk, (B2, S, H, D), dtype=jnp.bfloat16)
    v = jax.random.normal(kv, (B2, S, H, D), dtype=jnp.bfloat16)
    q0 = jax.random.normal(kq, (B2, 1, H, D), dtype=jnp.bfloat16)
    pad_mask = jnp.ones((B2, S), dtype=jnp.int32)
    bias = make_causal_bias(
        pad_mask, jnp.array([S - 1], jnp.int32), jnp.arange(S, dtype=jnp.int32)
    )
    k_q8, k_s, v_q8, v_s = jax.jit(quantize_kv)(k, v)

    # NOTE: the caches are jit ARGUMENTS — closure-captured arrays get baked
    # into the remote-compile request body under axon (HTTP 413, CLAUDE.md)

    def chain(attn_fn, n_ops):
        # chain the output back into the query so steps serialize; renormalize
        # to keep magnitudes stable over the loop
        def run(q, *ops):
            def body(i, q):
                out = attn_fn(q, *ops)  # [B2, 1, H, D]
                n = jnp.sqrt(jnp.mean(out.astype(jnp.float32) ** 2) + 1e-6)
                return (out.astype(jnp.float32) / n).astype(jnp.bfloat16)

            return jax.lax.fori_loop(0, steps, body, q)

        return jax.jit(run)

    variants = {
        "bf16": (
            chain(lambda q, k, v: dot_product_attention(q, k, v, bias=bias), 2),
            (k, v),
        ),
        "q8": (
            chain(
                lambda q, *o: dot_product_attention_q8(q, *o, bias=bias), 4
            ),
            (k_q8, k_s, v_q8, v_s),
        ),
        "q8a8": (
            chain(
                lambda q, *o: dot_product_attention_q8(q, *o, bias=bias, a8=True),
                4,
            ),
            (k_q8, k_s, v_q8, v_s),
        ),
    }

    def floor_fn(q, k_q8, v_q8):
        # xor-reduce over a slice whose start depends on the loop index, so
        # XLA cannot hoist the (otherwise loop-invariant) reduction out of the
        # loop; reads (S-1)/S of the cache bytes each step
        def body(i, carry):
            acc, q = carry
            ks = jax.lax.dynamic_slice_in_dim(k_q8, i % 2, S - 1, axis=1)
            vs = jax.lax.dynamic_slice_in_dim(v_q8, i % 2, S - 1, axis=1)
            acc = (
                acc
                ^ jax.lax.reduce(ks, jnp.int8(0), jax.lax.bitwise_xor, (0, 1, 2, 3))
                ^ jax.lax.reduce(vs, jnp.int8(0), jax.lax.bitwise_xor, (0, 1, 2, 3))
            )
            return acc, q + acc.astype(jnp.bfloat16)

        acc, qf = jax.lax.fori_loop(0, steps, body, (jnp.int8(0), q))
        return qf

    variants["floor_int8_read"] = (jax.jit(floor_fn), (k_q8, v_q8))

    kv_bytes_int8 = 2 * B2 * S * H * D  # K+V int8
    results = {}
    for name, (fn, ops) in variants.items():
        t0 = time.time()
        out = fn(q0, *ops)
        np.asarray(out)
        compile_s = time.time() - t0
        # timed runs (program cached now)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            np.asarray(fn(q0, *ops))
            best = min(best, time.time() - t0)
        per_step_us = best / steps * 1e6
        bw = kv_bytes_int8 / (best / steps) / 1e9
        results[name] = {
            "per_step_us": round(per_step_us, 2),
            "eff_GBps_vs_int8_bytes": round(bw, 1),
            "compile_s": round(compile_s, 1),
        }
        print(json.dumps({name: results[name]}), flush=True)

    print(json.dumps({"shapes": [B2, S, H, D], "steps": steps, **results}))


if __name__ == "__main__":
    main()
