"""Attention at TRAINING shapes: XLA vs our Pallas fwd vs the official
fwd+bwd flash kernels (jax.experimental.pallas.ops.tpu.flash_attention).

Motivation (round 5): ablate_attn measured attention at 353.7 ms of the
1110.6 ms stage3 step at T=700 (BENCH_SWEEP train_budget) — 32% of the
step, by far the largest non-matmul share. The XLA path materializes the
fp32 [B, H, S, S] score matrix (S=1276 -> ~313 MB/layer/flow fwd, more in
the backward); our ops/pallas_attention.py kernel is forward-only with a
recompute-XLA VJP, so in training it ADDS work (flash row: 1186.5 ms).
The official TPU kernel has real dq/dkv backward kernels — if its fwd+bwd
beats XLA's at recipe shapes, it becomes the training-forward attention.

Differential timing (bench_mxu_stream.py pattern): per-iter =
(t(N2)-t(N1))/(N2-N1) cancels the ~40 ms axon per-call overhead. Each
variant's loop body includes the layout transposes its wrapper would pay
inside the model ([B, S, H, D] model layout).

Writes BENCH_SWEEP.json "attn_train" rows. Env: ATTN_SHAPES to override
"B,S;B,S" list (default the T=700 recipe: uni/mmu rows 3x1280, plan 2x768
— 700 ties under 128/256 blocks and the kernel picks 256), ATTN_ITERS
"N1,N2" (default 4,20).
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

H, D = 16, 128  # Janus-Pro-1B LM: 16 heads x 128


def make_inputs(key, B, S):
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (B, S, H, D), dtype=jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, S, H, D), dtype=jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, S, H, D), dtype=jnp.bfloat16)
    g = jax.random.normal(ks[3], (B, S, H, D), dtype=jnp.bfloat16)
    return q, k, v, g


def xla_attn(q, k, v):
    from plangen_tpu.ops.attention import dot_product_attention, make_causal_bias

    B, S = q.shape[0], q.shape[1]
    pos = jnp.arange(S, dtype=jnp.int32)
    bias = make_causal_bias(jnp.ones((B, S), jnp.int32), pos, pos)
    return dot_product_attention(q, k, v, bias=bias)


def ours_attn(q, k, v):
    from plangen_tpu.ops.pallas_attention import flash_attention

    mask = jnp.ones((q.shape[0], q.shape[1]), jnp.int32)
    return flash_attention(q, k, v, mask, True, None)


def make_tpu_attn(block: int):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention as tpu_flash,
    )

    def fn(q, k, v):
        S = q.shape[1]
        b = min(block, S)
        sizes = BlockSizes(
            block_q=b, block_k_major=b, block_k=b, block_b=1,
            block_q_major_dkv=b, block_k_major_dkv=b, block_k_dkv=b,
            block_q_dkv=b, block_k_major_dq=b, block_k_dq=b, block_q_dq=b,
        )
        qt = q.transpose(0, 2, 1, 3)  # [B, H, S, D] kernel layout
        kt = k.transpose(0, 2, 1, 3)
        vt = v.transpose(0, 2, 1, 3)
        out = tpu_flash(qt, kt, vt, causal=True, sm_scale=D ** -0.5,
                        block_sizes=sizes)
        return out.transpose(0, 2, 1, 3)

    return fn


def fwd_loop(attn, q0, k, v, n):
    def body(i, q):
        out = attn(q, k, v)
        # renormalize to keep values sane and defeat loop-invariant hoisting
        return (out / (jnp.max(jnp.abs(out).astype(jnp.float32)) + 1.0) + q * 0.5).astype(q.dtype)

    return jax.lax.fori_loop(0, n, body, q0)


def bwd_loop(attn, q0, k, v, g, n):
    def f(q):
        return jnp.vdot(attn(q, k, v).astype(jnp.float32), g.astype(jnp.float32))

    def body(i, q):
        dq = jax.grad(f)(q)
        return (dq / (jnp.max(jnp.abs(dq).astype(jnp.float32)) + 1.0) + q * 0.5).astype(q.dtype)

    return jax.lax.fori_loop(0, n, body, q0)


def time_variant(fn, args, n1, n2):
    f = jax.jit(fn, static_argnums=())
    t0 = time.time()
    np.asarray(f(*args, n1))
    compile_s = time.time() - t0

    def t(n):
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            np.asarray(f(*args, n))
            best = min(best, time.time() - t0)
        return best

    per_iter = (t(n2) - t(n1)) / (n2 - n1)
    return per_iter, compile_s


def main():
    n1, n2 = (int(x) for x in os.environ.get("ATTN_ITERS", "4,20").split(","))
    # uni/mmu rows pad 1276->1280; plan rows pad 700->768 (NOT 704 — the
    # kernels need block-divisible S; the model wrappers pad internally)
    shapes = os.environ.get("ATTN_SHAPES", "3,1280;2,768")
    out_path = Path(os.environ.get(
        "BENCH_OUT", Path(__file__).parent.parent / "BENCH_SWEEP.json"))
    variants = {
        "xla": xla_attn,
        "ours_pallas": ours_attn,
        "tpu_flash_b128": make_tpu_attn(128),
        "tpu_flash_b256": make_tpu_attn(256),
        "tpu_flash_b512": make_tpu_attn(512),
    }
    only = os.environ.get("ATTN_ONLY")  # e.g. "xla" — each variant is
    if only:                            # minutes of remote compile
        variants = {k: v for k, v in variants.items() if k in only.split(",")}
    rows = []
    for bs in shapes.split(";"):
        B, S = (int(x) for x in bs.split(","))
        q, k, v, g = make_inputs(jax.random.PRNGKey(0), B, S)
        for name, attn in variants.items():
            for direction, loop, args in (
                ("fwd", fwd_loop, (q, k, v)),
                ("fwd_bwd", bwd_loop, (q, k, v, g)),
            ):
                row = {"name": name, "dir": direction, "B": B, "S": S}
                try:
                    per_iter, compile_s = time_variant(
                        lambda *a: loop(attn, *a), args, n1, n2)
                    row["ms_per_iter"] = round(per_iter * 1e3, 3)
                    row["compile_s"] = round(compile_s, 1)
                except Exception as e:
                    row["error"] = type(e).__name__
                    row["error_note"] = str(e)[:200]
                rows.append(row)
                print(json.dumps(row), flush=True)

                doc = json.loads(out_path.read_text()) if out_path.exists() else {}
                key = lambda r: (r["name"], r["dir"], r["B"], r["S"])
                old = {key(r): r for r in doc.get("attn_train", {}).get("rows", [])}
                for r in rows:
                    old[key(r)] = r
                doc["attn_train"] = {
                    "note": (
                        "training-shape attention per-iteration ms "
                        "(tools/bench_attn_train.py, differential timing, "
                        "bf16, causal, 16 heads x 128; one LAYER x one "
                        "flow's rows — multiply by 24 layers)"
                    ),
                    "rows": sorted(old.values(), key=key),
                }
                out_path.write_text(json.dumps(doc, indent=1))


if __name__ == "__main__":
    main()
