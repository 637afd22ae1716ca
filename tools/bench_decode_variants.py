"""Measure image-token decode variants on the real chip.

Usage: python tools/bench_decode_variants.py [variant ...]
Variants: base (full-buffer XLA), chunked, paged (v2), paged_v3, int8kv,
growing (phased cache). Default: base paged_v3.

Prints tok/s per variant at BENCH_BATCH (default 32).
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
    from plangen_tpu.models import vlm
    from plangen_tpu.runtime.generate import generate_image_tokens

    variants = sys.argv[1:] or ["base", "paged_v3"]
    B = int(os.environ.get("BENCH_BATCH", "32"))
    L = int(os.environ.get("BENCH_PROMPT_LEN", "64"))
    cfg = PlanGenModelConfig()
    n_img = cfg.image_seq_len

    params = jax.jit(lambda k: vlm.init(k, cfg, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(0)
    )
    embeds = jax.random.normal(
        jax.random.PRNGKey(1), (2 * B, L, cfg.llama.hidden_size), dtype=jnp.bfloat16
    )
    mask = jnp.ones((2 * B, L + n_img), dtype=jnp.int32)

    KW = dict(
        rng=jax.random.PRNGKey(7),
        cfg_weight=jnp.float32(5.0),
        temperature=jnp.float32(1.0),
        num_tokens=n_img,
    )
    FLAGS = {
        "base": {},
        "chunked": {"chunked": True},
        "paged": {"paged": True},
        "paged_v3": {"paged": "v3"},
        "int8kv": {"quantized_cache": True},
        "growing": {"growing_cache": True},
        "growing8": {"growing_cache": 8},
        "grow_int8": {"growing_cache": True, "quantized_cache": True},
    }

    results = {}
    for name in variants:
        flags = FLAGS[name]

        def run(seed):
            out = generate_image_tokens(
                params, cfg, embeds, mask,
                **{**KW, "rng": jax.random.PRNGKey(seed)}, **flags,
            )
            return np.asarray(out.tokens)

        try:
            t0 = time.perf_counter()
            tok_first = run(0)
            compile_s = time.perf_counter() - t0
        except Exception as e:
            print(f"{name:9s} FAILED: {type(e).__name__}: {e}", flush=True)
            continue
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            tok = run(1)
            times.append(time.perf_counter() - t0)
        best = min(times)
        results[name] = (B * n_img / best, tok)
        print(
            f"{name:9s} {B * n_img / best:8.1f} tok/s   "
            f"({best:.3f} s/batch, compile {compile_s:.0f}s)",
            flush=True,
        )

    # cross-variant token agreement (same seed): teacher of exactness on-chip
    names = [n for n in results if n in ("base", "paged_v3", "growing", "chunked", "paged")]
    if "base" in results:
        for n in names:
            if n == "base":
                continue
            same = bool((results[n][1] == results["base"][1]).all())
            frac = float((results[n][1] == results["base"][1]).mean())
            print(f"tokens {n} == base: {same} (agree {frac:.4f})", flush=True)


if __name__ == "__main__":
    main()
