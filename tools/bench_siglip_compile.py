"""A/B: SigLIP layer-stacked scan vs unrolled blocks — compile + run time.

Measures, at full SigLIP-Large dims (24 layers, 577-token grid at 384px ->
576 patches here, width 1024), on the default device:

  * compile wall time of the jitted tower forward (the dominant cost on the
    axon remote compiler, which pays per unique HLO),
  * steady-state runtime (bf16, batch 8).

"unrolled" reproduces the round-1 structure (a Python loop over per-layer
params -> 24 block HLO copies); "scan" is the current layer-stacked path.
Run: python tools/bench_siglip_compile.py [batch]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from plangen_tpu.config import PlanGenModelConfig
    from plangen_tpu.models import siglip

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cfg = PlanGenModelConfig().vision
    params = jax.jit(lambda k: siglip.init(k, cfg, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(0)
    )
    img = jax.random.normal(
        jax.random.PRNGKey(1), (B, cfg.image_size, cfg.image_size, 3),
        dtype=jnp.bfloat16,
    )

    def unrolled(params, images):
        x = jax.lax.conv_general_dilated(
            images.astype(params["patch_embed"]["w"].dtype),
            params["patch_embed"]["w"],
            (cfg.patch_size, cfg.patch_size), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        b, hp, wp, d = x.shape
        x = x.reshape(b, hp * wp, d) + params["patch_embed"]["b"]
        x = x + params["pos_embed"].astype(x.dtype)
        for l in range(cfg.layers):
            blk = jax.tree_util.tree_map(lambda a: a[l], params["layers"])
            x = siglip._block(blk, cfg, x)
        return siglip.layer_norm(x, params["final_norm"], cfg.layer_norm_eps)

    results = {}
    for name, fn in [
        ("scan", lambda p, i: siglip.forward(p, cfg, i)),
        ("unrolled", unrolled),
    ]:
        jf = jax.jit(fn)
        t0 = time.perf_counter()
        out = np.asarray(jf(params, img))
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(jf(params, img))
            times.append(time.perf_counter() - t0)
        results[name] = (compile_s, min(times))
        print(f"{name:9s} compile {compile_s:7.2f} s   run {min(times)*1e3:7.2f} ms",
              flush=True)

    if "scan" in results and "unrolled" in results:
        cs, rs = results["scan"]
        cu, ru = results["unrolled"]
        print(f"compile speedup {cu/cs:.2f}x   run ratio {ru/rs:.2f}x")


if __name__ == "__main__":
    main()
