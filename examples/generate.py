"""Minimal layout-to-image generation example.

The plangen_tpu analogue of the reference's standalone
three_party/Janus/generation_inference.py: build a pipeline, condition on a
caption + layout, decode 576 image tokens with CFG, save the image.

With --janus-path pointing at a local deepseek-ai/Janus-Pro-1B checkout the
real model runs; without it a random-weight tiny model demonstrates the API.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--caption", default="a red sports car parked next to a tree")
    p.add_argument(
        "--layout",
        default="car:0.1,0.45,0.65,0.85;tree:0.6,0.05,0.95,0.8",
        help="semicolon-separated desc:x1,y1,x2,y2 entries (normalized)",
    )
    p.add_argument("--janus-path", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="generated.png")
    p.add_argument("--plan", action="store_true", help="predict the layout too (uni_2stage)")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    p.add_argument("--tpu", action="store_true",
                   help="run the tiny demo on the default (TPU) device; "
                   "without --janus-path the demo defaults to CPU")
    args = p.parse_args()

    import jax

    if args.cpu or (args.janus_path is None and not args.tpu):
        # the random-weight demo runs anywhere; a remote-TPU compile costs
        # minutes (or hangs outright if the accelerator is unreachable) for
        # an API demo. In-process selection, not JAX_PLATFORMS: an already-
        # registered TPU plugin ignores the env var.
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from plangen_tpu.config import PlanGenConfig, PlanGenModelConfig
    from plangen_tpu.convert.torch_to_jax import load_janus_checkpoint
    from plangen_tpu.models import vlm
    from plangen_tpu.tasks.eval import build_pipeline
    from plangen_tpu.text.grounding import serialize_grounding
    from plangen_tpu.utils.visualize import save_image

    if args.janus_path:
        cfg = PlanGenConfig(janus_path=args.janus_path)
        params = load_janus_checkpoint(args.janus_path, cfg.model)
        params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.bfloat16), params)
    else:
        print("no --janus-path: using a random tiny model (API demo only)")
        cfg = PlanGenConfig(model=PlanGenModelConfig.tiny(), janus_hw=32)
        params = None

    pipe = build_pipeline(cfg, params)

    if args.plan:
        out = pipe.joint_generate([args.caption], seed=args.seed)
        print("planned layout:", out.groundings[0])
    else:
        boxes, descs = [], []
        for entry in args.layout.split(";"):
            desc, coords = entry.split(":")
            boxes.append(tuple(float(c) for c in coords.split(",")))
            descs.append(desc)
        grounding = serialize_grounding("", boxes, descs)
        out = pipe.layout_to_image([args.caption], [grounding], seed=args.seed)

    save_image(out.images[0], args.out)
    print(f"saved {args.out} ({out.images.shape[1]}px), "
          f"{out.image_tokens.shape[1]} tokens")


if __name__ == "__main__":
    main()
