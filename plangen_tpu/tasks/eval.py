"""Evaluation harness: drive a task mode over a dataset, write artifacts.

Mirrors the reference's eval-as-test `validation()` output layout
(plangen_base.py:1087-1181) so external metric tooling (FID / spatial
accuracy over LayoutSAM-eval) stays compatible:

  <out>/<data>_<task>_<n>/<step>/
      gt_image/{i}.png   pr_image/{i}.png   image_ids/{id}.jpg
      gt_image_ids/{id}.jpg
  <out>/..._batch/{batch}_layout.json       (captions + gt/pred groundings)
      {batch}.png                           (grid with box overlays)
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from plangen_tpu.config import PlanGenConfig
from plangen_tpu.data.registry import get_dataset
from plangen_tpu.data.schema import Sample
from plangen_tpu.models import vlm
from plangen_tpu.tasks.pipeline import PlanGenPipeline
from plangen_tpu.tasks.processor import PlanGenProcessor
from plangen_tpu.text.grounding import parse_grounding
from plangen_tpu.text.tokenizer import load_tokenizer
from plangen_tpu.utils.visualize import draw_layout, save_image, save_image_grid


def build_pipeline(cfg: PlanGenConfig, params=None) -> PlanGenPipeline:
    from plangen_tpu.config import validate_config

    validate_config(cfg)
    tok = load_tokenizer(
        cfg.janus_path,
        vocab_size=cfg.model.llama.vocab_size,
        use_special_tokens=cfg.use_special_tokens,
        use_numhw=cfg.use_numhw_tokens,
    )
    proc = PlanGenProcessor(
        tok,
        image_tokens=cfg.model.image_seq_len,
        max_seq_len=cfg.train.max_seq_len,
        gen=cfg.generation,
    )
    if params is None:
        from plangen_tpu.convert.loading import load_params

        params = load_params(cfg)
    if params is None:
        params = vlm.init(
            jax.random.PRNGKey(cfg.generation.seed), cfg.model, dtype=jnp.bfloat16
        )
    gen_cfg = cfg.generation
    have = _artifact_quant_form(params)
    if have is not None and gen_cfg.quantize is None:
        # pre-quantized artifact (cli convert --quantize): engage the full
        # quantized serving config (incl. the int8 KV cache) rather than
        # silently running quantized weights with a bf16 cache
        import dataclasses

        gen_cfg = dataclasses.replace(gen_cfg, quantize=have)
    if gen_cfg.quantize == "auto":
        params_int4 = _build_auto_int4(params, cfg.model)
        params = _maybe_fuse_dense(params, gen_cfg)  # dense route only —
        # the int4 tree was built from the split layout above and is
        # already fused at quantize time (INT4_FUSED_GROUPS)
        return PlanGenPipeline(params, cfg.model, proc, gen_cfg=gen_cfg,
                               params_int4=params_int4)
    params = _apply_quantize(params, gen_cfg.quantize)
    params = _maybe_fuse_dense(params, gen_cfg)
    return PlanGenPipeline(params, cfg.model, proc, gen_cfg=gen_cfg)


def _maybe_fuse_dense(params, gen_cfg):
    """Dense-decode load transform: concat q|k|v into the fused leaf the
    layer consumes (ops/quant.py fuse_dense_qkv — bit-identical, measured
    1.13-1.19x on the triple). No-op for quantized trees (dict leaves) and
    when generation.fuse_dense_qkv=false."""
    if not getattr(gen_cfg, "fuse_dense_qkv", True):
        return params
    from plangen_tpu.ops.quant import fuse_dense_qkv

    return fuse_dense_qkv(params)


def _build_auto_int4(params, model_cfg):
    """Dual-resident routing form (generation.quantize='auto'): the int4
    tree next to the dense one, sharing every non-LM subtree by reference.
    Rejected when the DENSE LM weights alone exceed half a v5e's HBM —
    at 7B scale bf16 weights (~14.5 GB) + int4 copies cannot co-reside;
    pick one form explicitly there ('int8_kv' or 'int4')."""
    if _artifact_quant_form(params) is not None:
        raise ValueError(
            "generation.quantize='auto' needs the DENSE checkpoint (it "
            "builds the int4 tree next to it); this artifact is already "
            "quantized — serve it with its own form instead"
        )
    lm = model_cfg.llama
    lm_bytes = 2 * lm.num_layers * (
        lm.hidden_size * (lm.q_dim + 2 * lm.kv_dim)
        + lm.q_dim * lm.hidden_size
        + 3 * lm.hidden_size * lm.intermediate_size
    )
    if lm_bytes > 6e9:
        raise ValueError(
            f"generation.quantize='auto' keeps bf16 AND int4 LM weights "
            f"resident; this model's dense LM tower is "
            f"{lm_bytes / 2 ** 30:.1f} GiB — too large to dual-host on one "
            f"16 GB chip. Use 'int8_kv' (large-batch) or 'int4' (latency)."
        )
    from plangen_tpu.ops.quant import quantize_lm_params_int4_shared

    return quantize_lm_params_int4_shared(params)


def _artifact_quant_form(params) -> str | None:
    """'int8'/'int4'/'int4_a8' if the tree is already quantized, else None
    (pre-quantized artifacts from `cli convert --quantize`)."""
    layers = params["language_model"]["layers"]
    if "q_k_proj" in layers:
        # the short-lived transitional layout between the q|k pair fusion
        # and the q|k|v triple (INT4_FUSED_GROUPS) — the layer consumes
        # qkv_proj / k_v_proj / split leaves, never this key, so loading
        # it would KeyError mid-trace; fail with the remedy instead
        raise ValueError(
            "artifact uses the transitional q|k fused int4 layout; "
            "re-run `cli convert --quantize int4` on the dense checkpoint"
        )
    # int4 artifacts carry the fused q|k|v leaf (ops/quant.py
    # INT4_FUSED_GROUPS; GQA artifacts keep q_proj split) — older
    # split-form artifacts still load and run
    q = layers.get("qkv_proj", layers.get("q_proj"))
    if not isinstance(q, dict):
        return None
    if "w_q8" in q:
        return "int8"
    return "int4_a8" if "a8" in q else "int4"


def _apply_quantize(params, mode):
    have = _artifact_quant_form(params)
    if have is not None:
        if mode not in (None, have):
            raise ValueError(
                f"params are already {have}-quantized but generation.quantize="
                f"{mode!r} — reconvert the artifact or change the config"
            )
        return params
    if mode == "int8_kv":
        return params  # bf16 weights; the int8 KV cache is a decode flag
    if mode == "int8":
        from plangen_tpu.ops.quant import quantize_lm_params

        return quantize_lm_params(params)
    if mode in ("int4", "int4_a8"):
        import functools

        from plangen_tpu.ops.quant import quantize_lm_params_int4

        # donate: the dense bf16 tree frees as the int4 copies are built —
        # required for 7B, where dense weights (14.5 GB) + int4 copies would
        # otherwise exceed one v5e's HBM
        qfn = functools.partial(
            quantize_lm_params_int4, act_int8=(mode == "int4_a8")
        )
        return jax.jit(qfn, donate_argnums=0)(params)
    return params


def run_validation(
    cfg: PlanGenConfig,
    task_type: str = "uni",
    data_name: Any = "toy",
    max_len: int = 20,
    output_dir: str = "out/eval",
    batch_size: int = 2,
    params=None,
    global_step: int = 0,
    start: int = 0,  # skip the first N batches (reference test_start)
    metrics_cb=None,  # callable(agg_metrics) — trainer JSONL logging hook
) -> List[Dict]:
    pipe = build_pipeline(cfg, params)
    ds = get_dataset(cfg, data_name, is_test=True)

    base = os.path.join(output_dir, f"{data_name}_{task_type}_{max_len}")
    path = os.path.join(base, str(global_step))
    batch_path = os.path.join(base, f"{global_step}_batch")
    for sub in ["gt_image", "pr_image", "image_ids", "gt_image_ids"]:
        os.makedirs(os.path.join(path, sub), exist_ok=True)
    os.makedirs(batch_path, exist_ok=True)

    results = []
    per_sample_metrics = []
    # built-in FID/KID (train.val_image_metrics): SigLIP features of every
    # gt/pr image pair accumulate across batches, metrics computed once at
    # the end (tasks/image_metrics.py). The featurizer reuses the pipeline's
    # vision tower (quantization never touches the vision_model subtree).
    featurizer = None
    gt_feats: List[np.ndarray] = []
    pr_feats: List[np.ndarray] = []
    n_batches = min(max_len, -(-len(ds) // batch_size)) if max_len != -1 else -(
        -len(ds) // batch_size
    )
    # one-batch-ahead pipelining: batch b+1's host preprocessing + device
    # dispatch run on a worker thread while batch b's artifacts (host fetch,
    # PNG encode, disk writes) save on this thread — the device never idles
    # on host post-processing. Device programs stay serial (one queue).
    from concurrent.futures import ThreadPoolExecutor

    def fetch(b):
        samples = [ds[b * batch_size + i] for i in range(batch_size)
                   if b * batch_size + i < len(ds)]
        if not samples:
            return None
        return samples, _run_batch(pipe, cfg, task_type, samples)

    pool = ThreadPoolExecutor(max_workers=1)
    try:
        pending = pool.submit(fetch, start) if start < n_batches else None
        for b in range(start, n_batches):
            got = pending.result() if pending is not None else None
            pending = pool.submit(fetch, b + 1) if b + 1 < n_batches else None
            if got is None:
                break
            samples, out = got
            _save_batch_artifacts(
                out, samples, task_type, path, batch_path, b, batch_size,
                textual=cfg.use_textual,
            )
            if task_type in ("plan", "mmu"):
                # layout metrics: predicted grounding vs GT grounding
                from plangen_tpu.tasks.metrics import layout_metrics

                for s, pr in zip(samples, out["pr_grounding"]):
                    gt_b, _ = parse_grounding(s.gt_grounding,
                                              textual=cfg.use_textual)
                    pr_b, _ = parse_grounding(pr or "",
                                              textual=cfg.use_textual)
                    per_sample_metrics.append(layout_metrics(pr_b, gt_b))
            if cfg.train.val_image_metrics and out["pr_image"] is not None:
                # GT side: for edit/rm prefer the post-edit target when the
                # dataset carries one (Sample.edited_image) — pairing against
                # the PRE-edit original would score an identity model (one
                # that ignores the edit) as perfect. Without edit GT the
                # original is still a usable distribution reference, but the
                # caveat stands; plain generation modes pair against s.image.
                pairs = [
                    (s.edited_image if s.edited_image is not None else s.image,
                     np.asarray(out["pr_image"][i]))
                    for i, s in enumerate(samples)
                    if s.edited_image is not None or s.image is not None
                ]
                if pairs:
                    if featurizer is None:
                        from plangen_tpu.tasks.image_metrics import (
                            SigLIPFeaturizer,
                        )

                        featurizer = SigLIPFeaturizer(
                            pipe.params, cfg.model,
                            batch_size=max(2, batch_size),
                        )
                    gt_feats.append(featurizer(np.stack([p[0] for p in pairs])))
                    pr_feats.append(featurizer(np.stack([p[1] for p in pairs])))
            results.append(out)
    finally:
        # an artifact-save error must still observe/stop the in-flight fetch
        pool.shutdown(wait=True)

    agg: Dict[str, float] = {}
    if per_sample_metrics:
        from plangen_tpu.tasks.metrics import aggregate_layout_metrics

        agg.update(aggregate_layout_metrics(per_sample_metrics))
    if gt_feats:
        from plangen_tpu.tasks.image_metrics import fid_kid_from_features

        g = np.concatenate(gt_feats)
        p = np.concatenate(pr_feats)
        if len(g) >= 2 and len(p) >= 2:
            agg.update(fid_kid_from_features(g, p))
        else:
            print("image metrics skipped: need >=2 gt/pr image pairs")
    if agg:
        with open(os.path.join(base, f"{global_step}_metrics.json"), "w") as f:
            json.dump(agg, f, indent=1)
        print(f"eval metrics: {agg}")
        if metrics_cb is not None:
            metrics_cb(agg)
    return results


def _run_batch(pipe: PlanGenPipeline, cfg, task_type: str, samples: List[Sample]):
    captions = [s.base_caption for s in samples]
    groundings = [s.gt_grounding for s in samples]
    if task_type == "plan":
        pr = pipe.plan(captions)
        return {"pr_grounding": pr, "pr_image": None}
    if task_type == "mmu":
        images = np.stack([s.image for s in samples])
        out = pipe.understand(images)
        return {"pr_grounding": out.texts, "pr_image": None}
    if task_type == "uni_2stage":
        out = pipe.joint_generate(captions)
        return {"pr_grounding": out.groundings, "pr_image": out.images}
    if task_type in ("edit", "rm"):
        images = np.stack([s.image for s in samples])
        regions = np.stack([s.edit_region for s in samples])
        neg_caps = [s.neg_base_caption for s in samples]
        neg_grounds = [s.neg_gt_grounding for s in samples] if task_type == "rm" else None
        out = pipe.edit_image(
            captions, groundings, images, regions,
            neg_captions=neg_caps if task_type == "rm" else None,
            neg_groundings=neg_grounds,
        )
        return {"pr_grounding": groundings, "pr_image": out.images}
    # 'uni' / 't2i': GT layout conditions the image
    gt_images = (
        np.stack([s.image for s in samples])
        if all(s.image is not None for s in samples)
        else None
    )
    out = pipe.layout_to_image(
        captions,
        groundings if task_type == "uni" else [""] * len(captions),
        gt_images=gt_images,
    )
    return {"pr_grounding": groundings, "pr_image": out.images}


def _save_batch_artifacts(out, samples, task_type, path, batch_path, b,
                          batch_size, textual=True):
    data = {
        "base_caption": [s.base_caption for s in samples],
        "gt_grounding": [s.gt_grounding for s in samples],
        "pr_grounding": out["pr_grounding"],
    }
    with open(os.path.join(batch_path, f"{b}_layout.json"), "w") as f:
        json.dump(data, f, indent=1)

    if out["pr_image"] is None:
        return
    vis = []
    for i, s in enumerate(samples):
        pr = out["pr_image"][i]
        save_image(pr, os.path.join(path, "pr_image", f"{b * batch_size + i}.png"))
        if s.image is not None:
            save_image(
                s.image, os.path.join(path, "gt_image", f"{b * batch_size + i}.png")
            )
        if s.image_id:
            save_image(pr, os.path.join(path, "image_ids", f"{s.image_id}.jpg"))
            if s.image is not None:
                save_image(
                    s.image, os.path.join(path, "gt_image_ids", f"{s.image_id}.jpg")
                )
        boxes, labels = parse_grounding(out["pr_grounding"][i] or "",
                                        textual=textual)
        vis.append(draw_layout(pr, boxes, labels))
    save_image_grid(vis, os.path.join(batch_path, f"{b}.png"))
