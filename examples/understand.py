"""Minimal image-to-layout understanding example (reference inference.py
analogue): load an image, ask for the caption + per-object boxes."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("image", nargs="?", default=None, help="image path (demo image if omitted)")
    p.add_argument("--janus-path", default=None)
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    p.add_argument("--tpu", action="store_true",
                   help="run the tiny demo on the default (TPU) device; "
                   "without --janus-path the demo defaults to CPU")
    args = p.parse_args()

    import numpy as np
    import jax

    if args.cpu or (args.janus_path is None and not args.tpu):
        # see examples/generate.py: demo defaults to CPU; JAX_PLATFORMS
        # cannot override an already-registered TPU plugin
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from plangen_tpu.config import PlanGenConfig, PlanGenModelConfig
    from plangen_tpu.convert.torch_to_jax import load_janus_checkpoint
    from plangen_tpu.data.preprocess import to_model_range
    from plangen_tpu.tasks.eval import build_pipeline
    from plangen_tpu.text.grounding import parse_grounding

    if args.janus_path:
        cfg = PlanGenConfig(janus_path=args.janus_path)
        params = load_janus_checkpoint(args.janus_path, cfg.model)
        params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.bfloat16), params)
    else:
        print("no --janus-path: using a random tiny model (API demo only)")
        cfg = PlanGenConfig(model=PlanGenModelConfig.tiny(), janus_hw=32)
        params = None

    pipe = build_pipeline(cfg, params)
    hw = cfg.model.vision.image_size

    if args.image:
        from PIL import Image

        img = Image.open(args.image).convert("RGB").resize((hw, hw))
        image = to_model_range(np.asarray(img))[None]
    else:
        from plangen_tpu.data.toy import ToyDataset

        image = ToyDataset(size=1, image_hw=hw)[0].image[None]

    out = pipe.understand(image)
    print("model output:", out.texts[0])
    boxes, descs = parse_grounding(out.texts[0])
    for d, b in zip(descs, boxes):
        print(f"  {d}: [{b[0]:.3f}, {b[1]:.3f}, {b[2]:.3f}, {b[3]:.3f}]")


if __name__ == "__main__":
    main()
