"""Minimal layout-guided editing / object-removal example.

The plangen_tpu analogue of the reference's teacher-forced editing flow
(README.md:77-80 / SURVEY.md §3.5): encode the source image with the VQ
tokenizer, freeze every token outside the edit region to that encoding, and
re-sample only the edit region under the CFG prompt — removal additionally
conditions the negative row on a clutter-word grounding at the removed box.

With --janus-path pointing at a local deepseek-ai/Janus-Pro-1B checkout the
real model runs; without it a random-weight tiny model demonstrates the API.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def box_to_edit_region(box, grid=24, pad=0.0):
    """Normalized (x1, y1, x2, y2) -> flat [grid*grid] 0/1 regenerate mask.

    Mirrors the reference's box->24x24 edit_region with fractional dilation
    (pad_edit_box, data_hico.py:326-356).
    """
    import numpy as np

    x1, y1, x2, y2 = box
    x1, y1 = max(0.0, x1 - pad), max(0.0, y1 - pad)
    x2, y2 = min(1.0, x2 + pad), min(1.0, y2 + pad)
    m = np.zeros((grid, grid), dtype=np.int32)
    m[int(y1 * grid): max(int(y1 * grid) + 1, round(y2 * grid)),
      int(x1 * grid): max(int(x1 * grid) + 1, round(x2 * grid))] = 1
    return m.reshape(-1)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image", default=None, help="source image (png/jpg); a "
                   "procedural test image is used when omitted")
    p.add_argument("--caption", default="a living room with a sofa")
    p.add_argument("--box", default="0.3,0.4,0.7,0.9",
                   help="normalized x1,y1,x2,y2 of the region to edit")
    p.add_argument("--desc", default="a wooden coffee table",
                   help="what to put in the box (edit); ignored with --remove")
    p.add_argument("--remove", action="store_true",
                   help="object removal: empty target + clutter negative "
                   "grounding at the box (reference rm_coco semantics)")
    p.add_argument("--pad-edit-box", type=float, default=0.0)
    p.add_argument("--janus-path", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="edited.png")
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
    hw = cfg.model.vision.image_size
    grid = hw // cfg.model.vq.downsample_factor

    box = tuple(float(c) for c in args.box.split(","))
    if args.image:
        from PIL import Image

        pil = Image.open(args.image).convert("RGB").resize((hw, hw), Image.BILINEAR)
        img = (np.asarray(pil, np.float32) / 127.5 - 1.0)[None]
    else:
        yy, xx = np.mgrid[0:hw, 0:hw].astype(np.float32) / hw
        img = np.stack([yy, xx, 0.5 * (xx + yy)], axis=-1)[None] * 2.0 - 1.0

    region = box_to_edit_region(box, grid, args.pad_edit_box)[None]
    if args.remove:
        # removal: empty target class/box; negative row grounds clutter words
        # at the removed box (dataset_edit_coco_rm.py:50-51 semantics)
        grounding = serialize_grounding("", [], [])
        neg_grounding = serialize_grounding(
            "", [box], ["messy clutter, objects, stuff"]
        )
        out = pipe.edit_image(
            [args.caption], [grounding], img.astype(np.float32), region,
            neg_groundings=[neg_grounding], seed=args.seed,
        )
    else:
        grounding = serialize_grounding("", [box], [args.desc])
        out = pipe.edit_image(
            [args.caption], [grounding], img.astype(np.float32), region,
            seed=args.seed,
        )

    save_image(out.images[0], args.out)
    frozen = int((region == 0).sum())
    print(f"saved {args.out}: {frozen}/{region.size} background tokens frozen, "
          f"{int(region.sum())} re-sampled")


if __name__ == "__main__":
    main()
