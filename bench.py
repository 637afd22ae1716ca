"""Headline benchmark: image-tokens/sec/chip for 576-token 384px generation.

Runs the fused CFG image-token decode (prefill + 576-step lax.scan, dual
cond/uncond batch) on full Janus-Pro-1B dims in bf16 on the default device
(the real TPU chip under the driver), then prints ONE JSON line.

Baseline: the reference publishes no numbers (BASELINE.md). `vs_baseline`
is computed against REF_TOKENS_PER_SEC, an estimate of the reference's
single-GPU rate: the reference decode is a Python loop over HF module calls
(plangen_base.py:567-607) at roughly 25-30 ms/step on the documented RTX 3090
(README.md:26) -> ~576 tokens / 16 s ~= 34 image-tokens/s for batch 1.
Replace with a measured number when reference hardware is available.

Env knobs: BENCH_BATCH (default 4 images), BENCH_PROMPT_LEN (default 64),
BENCH_REPEATS (default 3).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

REF_TOKENS_PER_SEC = 34.0  # documented estimate, see module docstring


def main() -> None:
    import jax

    # persistent compile cache: the 576-step scan on the 1B model compiles in
    # ~5 min cold; cache makes repeat bench runs start in seconds
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass
    import jax.numpy as jnp

    from plangen_tpu.config import PlanGenModelConfig
    from plangen_tpu.models import vlm
    from plangen_tpu.runtime.generate import generate_image_tokens

    B = int(os.environ.get("BENCH_BATCH", "32"))
    L = int(os.environ.get("BENCH_PROMPT_LEN", "64"))
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))

    cfg = PlanGenModelConfig()
    n_img = cfg.image_seq_len  # 576

    key = jax.random.PRNGKey(0)
    # jit the init: one compiled program instead of per-op tunnel dispatches
    params = jax.jit(lambda k: vlm.init(k, cfg, dtype=jnp.bfloat16))(key)
    if os.environ.get("BENCH_INT8") == "1":
        from plangen_tpu.ops.quant import quantize_lm_params

        params = quantize_lm_params(params)

    cfg_embeds = jax.random.normal(
        jax.random.PRNGKey(1), (2 * B, L, cfg.llama.hidden_size), dtype=jnp.bfloat16
    )
    mask = jnp.ones((2 * B, L + n_img), dtype=jnp.int32)

    import numpy as np

    quantized_cache = os.environ.get("BENCH_INT8_KV") == "1"

    def run(seed):
        out = generate_image_tokens(
            params,
            cfg,
            cfg_embeds,
            mask,
            rng=jax.random.PRNGKey(seed),
            cfg_weight=jnp.float32(5.0),
            temperature=jnp.float32(1.0),
            num_tokens=n_img,
            quantized_cache=quantized_cache,
        )
        # np.asarray forces a device->host fetch: on the experimental axon
        # platform block_until_ready() returns before execution completes
        return np.asarray(out.tokens)

    try:
        run(0)  # compile
    except Exception as e:  # e.g. HBM exhaustion on other chip variants
        sys.stderr.write(f"bench: B={B} failed ({type(e).__name__}); retrying B=16\n")
        B = 16
        cfg_embeds = cfg_embeds[: 2 * B]
        mask = mask[: 2 * B]
        run(0)
    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        run(i + 1)
        times.append(time.perf_counter() - t0)
    best = min(times)
    tokens_per_sec = B * n_img / best

    print(
        json.dumps(
            {
                "metric": "image-tokens/sec/chip (576-tok 384px gen, CFG dual batch)",
                "value": round(tokens_per_sec, 2),
                "unit": "tokens/s",
                "vs_baseline": round(tokens_per_sec / REF_TOKENS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
