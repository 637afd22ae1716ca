"""Capture a device profile of the decode loop (Perfetto/TensorBoard trace).

Usage (on the TPU):
    python tools/profile_decode.py --batch 32 --out /tmp/plangen_trace

Then `tensorboard --logdir /tmp/plangen_trace` (or load the .trace into
Perfetto) to see per-op device timelines — the tool for attacking the
per-step HBM budget in future rounds (see docs/DESIGN.md §1).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--prompt-len", type=int, default=64)
    p.add_argument("--tokens", type=int, default=576)
    p.add_argument("--out", default="/tmp/plangen_trace")
    p.add_argument("--int8", action="store_true")
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from plangen_tpu.config import PlanGenModelConfig
    from plangen_tpu.models import vlm
    from plangen_tpu.runtime.generate import generate_image_tokens
    from plangen_tpu.utils.profiling import StepTimer, trace

    cfg = PlanGenModelConfig()
    B, L, N = args.batch, args.prompt_len, args.tokens
    params = jax.jit(lambda k: vlm.init(k, cfg, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(0)
    )
    if args.int8:
        from plangen_tpu.ops.quant import quantize_lm_params

        params = quantize_lm_params(params)
    emb = jax.random.normal(
        jax.random.PRNGKey(1), (2 * B, L, cfg.llama.hidden_size), dtype=jnp.bfloat16
    )
    mask = jnp.ones((2 * B, L + N), dtype=jnp.int32)

    def run(seed):
        out = generate_image_tokens(
            params,
            cfg,
            emb,
            mask,
            rng=jax.random.PRNGKey(seed),
            cfg_weight=jnp.float32(5.0),
            temperature=jnp.float32(1.0),
            num_tokens=N,
            quantized_cache=args.int8,
        )
        return np.asarray(out.tokens)

    print("compiling...", flush=True)
    run(0)
    timer = StepTimer(warmup=0)
    with trace(args.out):
        with timer:
            run(1)
    print(f"trace written to {args.out}")
    print(timer.summary())


if __name__ == "__main__":
    main()
