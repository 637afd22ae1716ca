"""Profile the VQ detokenizer on the real chip: where do the 1.5 s/batch go?

Times, at full VQ-16 dims (384px, ch=128, ch_mult 1,1,2,2,4), bf16, B from
BENCH_BATCH (default 32):

  * full decode_code (tokens -> pixels)
  * decoder truncations: conv_in+mid only; + each level cumulatively
  * encoder (encode_to_indices) for reference

Prints one line per stage with ms and the delta vs the previous truncation,
so each level's cost is visible. Used to size the Pallas-fusion work
honestly (BASELINE north star) before writing kernels.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from plangen_tpu.config import PlanGenModelConfig
    from plangen_tpu.models import vq

    B = int(os.environ.get("BENCH_BATCH", "32"))
    cfg = PlanGenModelConfig().vq
    grid = 24

    params = jax.jit(lambda k: vq.init(k, cfg, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(0)
    )
    tokens = jax.random.randint(
        jax.random.PRNGKey(1), (B, grid * grid), 0, cfg.codebook_size
    )

    def timeit(name, fn, *args):
        jf = jax.jit(fn)
        t0 = time.perf_counter()
        np.asarray(jf(*args))
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(jf(*args))
            ts.append(time.perf_counter() - t0)
        ms = min(ts) * 1e3
        print(f"{name:26s} {ms:9.1f} ms   (compile {compile_s:.0f}s)", flush=True)
        return ms

    # params are ARGUMENTS, never closures: a closure-captured tree is
    # serialized into the axon remote-compile request (HTTP 413 — CLAUDE.md)
    full = timeit(
        "decode_code (full)",
        lambda p, t: vq.decode_code(p, cfg, t, (grid, grid)),
        params, tokens,
    )

    def truncated(n_levels_done):
        def fn(params, t):
            cb = vq._normalized_codebook(params, cfg)
            z_q = jnp.take(cb, t.reshape(-1), axis=0).reshape(
                B, grid, grid, cfg.codebook_dim
            )
            z = vq.conv2d(params["post_quant_conv"], z_q)
            p = params["decoder"]
            h = vq.conv2d(p["conv_in"], z)
            h = vq.resblock(p["mid"]["res1"], cfg, h)
            h = vq.attnblock(p["mid"]["attn"], cfg, h)
            h = vq.resblock(p["mid"]["res2"], cfg, h)
            n_levels = len(cfg.ch_mult)
            for idx, level in enumerate(p["levels"][:n_levels_done]):
                for b, res_p in enumerate(level["res"]):
                    h = vq.resblock(res_p, cfg, h)
                    if level["attn"]:
                        h = vq.attnblock(level["attn"][b], cfg, h)
                if idx != n_levels - 1:
                    h = vq.upsample_nearest2x(h)
                    h = vq.conv2d(level["up"]["conv"], h)
            return h.sum()  # force execution of the whole truncation

        return fn

    prev = timeit("conv_in + mid", truncated(0), params, tokens)
    for n in range(1, len(cfg.ch_mult) + 1):
        cur = timeit(f"+ level {n}", truncated(n), params, tokens)
        print(f"{'':26s} level {n} delta {cur - prev:9.1f} ms", flush=True)
        prev = cur

    images = jax.random.uniform(
        jax.random.PRNGKey(2), (B, 384, 384, 3), minval=-1.0, maxval=1.0,
        dtype=jnp.bfloat16,
    )
    timeit(
        "encode_to_indices",
        lambda p, x: vq.encode_to_indices(p, cfg, x),
        params, images,
    )
    print(f"full decode {full:.1f} ms = {B / (full / 1e3):.1f} images/s", flush=True)


if __name__ == "__main__":
    main()
