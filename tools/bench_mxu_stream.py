"""MXU stream-rate probe: does int8 actually double decode-matmul speed?

Differential timing: per-iter = (t(N2)-t(N1))/(N2-N1) cancels the per-call
dispatch/fetch overhead (the axon tunnel costs ~40 ms per jitted call — any
small-program microbench that divides a single call's wall time by its step
count is dominated by that constant; bench_attn_a8.py's first runs were).

Measured (v5e, 2026-08-17) — the evidence that closed the flash-decode
kernel line (DESIGN.md §8):

  mm_bf16   M=128,K=2048,N=2048      6.81 us/iter  (~158 TFLOPs — near peak)
  mm_s8     same, s8xs8->s32         8.08 us/iter  (int8 NOT faster)
  bmm_bf16  decode-attention shape 471.67 us/iter  (712 GB/s = AT read floor)
            [BH=1024, M=1, D=128, S=640], QK+PV per iter
  bmm_s8    same, s8 operands      417.88 us/iter  (11% < bf16; int8 byte
            floor would be ~236 us — unreachable)

Decode attention at M=1 is ELEMENT-rate-bound through the MXU, so halving
operand bytes (int8 cache) cannot halve attention time — on this hardware
generation neither XLA nor Mosaic streams int8 at the 2x rate for these
shapes (the W4A8 weight kernel saw the same ~10%, DESIGN.md §4).
"""
import time, json
import jax, jax.numpy as jnp, numpy as np
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
except Exception:
    pass

M, K, N = 128, 2048, 2048

def run_bf16(key, n):
    a = jax.random.normal(key, (M, K), dtype=jnp.bfloat16)
    b = jax.random.normal(key, (K, N), dtype=jnp.bfloat16)
    def body(i, x):
        y = jnp.dot(x, b, preferred_element_type=jnp.float32)
        return (y[:, :K] / (jnp.max(jnp.abs(y)) + 1)).astype(jnp.bfloat16)
    return jax.lax.fori_loop(0, n, body, a)

def run_s8(key, n):
    a = jax.random.randint(key, (M, K), -127, 128, dtype=jnp.int32).astype(jnp.int8)
    b = jax.random.randint(key, (K, N), -127, 128, dtype=jnp.int32).astype(jnp.int8)
    def body(i, x):
        y = jnp.dot(x, b, preferred_element_type=jnp.int32)
        return jnp.clip(y[:, :K] >> 8, -127, 127).astype(jnp.int8)
    return jax.lax.fori_loop(0, n, body, a)

BH, D, S = 1024, 128, 640
def run_bmm_bf16(key, n):
    q = jax.random.normal(key, (BH, 1, D), dtype=jnp.bfloat16)
    k = jax.random.normal(key, (BH, S, D), dtype=jnp.bfloat16)
    def body(i, x):
        y = jax.lax.dot_general(x, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        y2 = jax.lax.dot_general(y.astype(jnp.bfloat16), k,
                                 (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        return (y2 / (jnp.max(jnp.abs(y2)) + 1)).astype(jnp.bfloat16)
    return jax.lax.fori_loop(0, n, body, q)

def run_bmm_s8(key, n):
    qf = jax.random.normal(key, (BH, 1, D), dtype=jnp.float32)
    k = jax.random.randint(key, (BH, S, D), -127, 128, dtype=jnp.int32).astype(jnp.int8)
    def body(i, x):
        x8 = jnp.clip(jnp.round(x * 127), -127, 127).astype(jnp.int8)
        y = jax.lax.dot_general(x8, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.int32)
        y8 = jnp.clip(y >> 12, -127, 127).astype(jnp.int8)
        y2 = jax.lax.dot_general(y8, k, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.int32)
        return (y2.astype(jnp.float32) / (jnp.max(jnp.abs(y2)).astype(jnp.float32) + 1))
    return jax.lax.fori_loop(0, n, body, qf)

N1, N2 = 100, 1100
for name, fn in [("mm_bf16", run_bf16), ("mm_s8", run_s8),
                 ("bmm_bf16", run_bmm_bf16), ("bmm_s8", run_bmm_s8)]:
    f = jax.jit(fn)
    key = jax.random.PRNGKey(0)
    t0 = time.time(); np.asarray(f(key, N1)); compile_s = time.time() - t0
    def t(n):
        best = 1e9
        for _ in range(3):
            t0 = time.time(); np.asarray(f(key, n)); best = min(best, time.time() - t0)
        return best
    t1, t2 = t(N1), t(N2)
    per_iter = (t2 - t1) / (N2 - N1)
    print(json.dumps({name: {"per_iter_us": round(per_iter * 1e6, 2),
                             "overhead_ms": round((t1 - per_iter * N1) * 1e3, 1),
                             "compile_s": round(compile_s, 1)}}), flush=True)
