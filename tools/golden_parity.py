"""Real-checkpoint golden parity harness (SURVEY.md §7 parity protocol).

Given a local Janus-Pro-1B checkout (and optionally a PlanGen fine-tune
overlay such as checkpoint-200000/trainable_model_parameters.pth,
reference base_system.py:166-189), this runs the five task modes on pinned
inputs and emits a token-level parity report:

  plan  — greedy layout planning: token-exact vs golden
          (reference x2t, plangen_base.py:513-523 — greedy is deterministic)
  mmu   — greedy layout understanding on a pinned image: token-exact
  edit  — teacher-forced decode with edit_region == 0 everywhere: the output
          must equal the VQ encoding of the gt image (tests VQ-encoder parity;
          reference overwrite semantics plangen_base.py:593-598)
  rm    — same protocol with the removal prompt (negative grounding)
  uni   — sampled tokens can't be torch-RNG-matched on TPU (SURVEY §7 "Hard
          parts"), so the protocol is LOGIT INJECTION: feed the reference's
          sampled stream as teacher-forced tokens and report our fp32 CFG
          probability of each injected token + top-1 agreement. Computed in
          ONE teacher-forced forward (mathematically identical to the
          sequential loop's per-step logits, no cache needed). When the
          golden carries `token_probs` (capture_reference records the
          reference's own probability of each sampled token), the mode
          becomes a checked prob_match/prob_mismatch criterion.
  losses  — per-flow training losses (forward_uni/plan/mmu) compared within
          fp32 cross-framework tolerance.
  prompts — exact token-id equality for every prompt wrapper + left-pad
          batching (wrap_t2i/wrap_uni/stage-1/pad_input_ids).

Usage (when checkpoints are available):

  python tools/golden_parity.py --janus-path /ckpts/Janus-Pro-1B \
      [--finetune /ckpts/checkpoint-200000/trainable_model_parameters.pth] \
      [--golden goldens/] [--capture goldens/] [--out parity_report.json]

`--capture DIR` writes this framework's outputs in the golden-dump format
(one JSON per mode); a reference-side GPU run of the same pinned inputs
captured into the same format becomes `--golden DIR` for the comparison run.

Golden dump format, one file per mode:
  plan.json  {"captions": [...], "tokens": [[ids...], ...]}
  mmu.json   {"question": str|null, "tokens": [[ids...]]}
  edit.json  {"caption": str, "grounding": str, "tokens": [[576 ids]]}
  rm.json    {"caption": str, "grounding": str, "neg_grounding": str,
              "tokens": [[576 ids]]}
  uni.json   {"caption": str, "grounding": str, "cfg_weight": float,
              "temperature": float, "tokens": [[576 ids]]}
Images are pinned procedurally (np.random.RandomState(0)) so both sides
generate bit-identical inputs without shipping image files.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path
from typing import Any, Dict, List, Optional

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

PINNED_CAPTIONS = [
    "A red apple on a wooden table next to a silver fork",
    "Two dogs playing with a frisbee in a sunny park",
]
PINNED_UNI_CAPTION = "A red apple on a wooden table"
PINNED_UNI_GROUNDING = (
    "<grounding><ref>a red apple</ref><box>[200, 300, 520, 640]</box>"
    "<ref>a wooden table</ref><box>[0, 500, 1000, 1000]</box></grounding>"
)
PINNED_RM_NEG = "<ref>a silver fork</ref><box>[600, 400, 900, 700]</box>"
PINNED_QUESTION = None  # mmu default question from the chat template


def to_numhw_grounding(s: str) -> str:
    """The SAME pinned layout serialized for numhw mode (use_textual=False):
    0-999 int lists become `<box><hN>,<wN>,<hN>,<wN></box>` with 0-99 coords
    (reference data_hico.py:165-180 / plangen_base.py:121-127). Both parity
    sides derive their numhw inputs through this one function so the pinned
    boxes stay locked together."""
    from plangen_tpu.text.grounding import parse_grounding, serialize_grounding

    boxes, descs = parse_grounding(s, textual=True)
    out = serialize_grounding("", boxes, descs, textual=False)
    if "<grounding>" not in s:  # bare ref/box fragment (PINNED_RM_NEG form)
        out = out.removeprefix("<grounding>").removesuffix("</grounding>")
    return out


def pinned_image(size: int, seed: int = 0) -> np.ndarray:
    """Deterministic pseudo-image in [-1, 1]; identical on every platform."""
    r = np.random.RandomState(seed)
    img = r.rand(1, size, size, 3).astype(np.float32) * 2.0 - 1.0
    return img


def _trim_eos(row: np.ndarray, eos_id: int) -> List[int]:
    out = []
    for t in row.tolist():
        out.append(int(t))
        if t == eos_id:
            break
    return out


def _diff(ours: List[List[int]], golden: List[List[int]]) -> Dict[str, Any]:
    mismatches = 0
    first = None
    total = 0
    if len(ours) != len(golden):
        # zip would silently drop the unmatched rows and report 'match' on
        # the compared prefix — a row-count skew (stale/hand-edited golden)
        # is itself a mismatch
        mismatches += abs(len(ours) - len(golden))
        first = {"row": min(len(ours), len(golden)), "pos": 0,
                 "ours": f"{len(ours)} rows", "golden": f"{len(golden)} rows"}
    for bi, (a, b) in enumerate(zip(ours, golden)):
        n = max(len(a), len(b))
        total += n
        for i in range(n):
            x = a[i] if i < len(a) else None
            y = b[i] if i < len(b) else None
            if x != y:
                mismatches += 1
                if first is None:
                    first = {"row": bi, "pos": i, "ours": x, "golden": y}
    return {
        "status": "match" if mismatches == 0 else "mismatch",
        "n_tokens": total,
        "mismatch_count": mismatches,
        "first_mismatch": first,
    }


def run_plan(pipe, golden: Optional[dict]) -> Dict[str, Any]:
    import jax.numpy as jnp
    import numpy as np

    from plangen_tpu.runtime.generate import greedy_decode_text
    from plangen_tpu.tasks.pipeline import _embed_ids

    captions = (golden or {}).get("captions", PINNED_CAPTIONS)
    budget = pipe.gen.max_new_text_tokens
    ids, mask = pipe.proc.stage1_batch(list(captions), budget)
    embeds = _embed_ids(pipe.params, pipe.cfg, jnp.asarray(ids)).astype(pipe.dtype)
    tokens = np.asarray(
        greedy_decode_text(
            pipe.params, pipe.cfg, embeds, jnp.asarray(mask),
            jnp.int32(pipe.proc.tok.special.eos_id), max_new_tokens=budget,
        )
    )
    eos = pipe.proc.tok.special.eos_id
    ours = [_trim_eos(r, eos) for r in tokens]
    rec: Dict[str, Any] = {"mode": "plan", "captions": captions, "tokens": ours}
    if golden is not None:
        rec.update(_diff(ours, golden["tokens"]))
    else:
        rec["status"] = "no_golden"
    rec["texts"] = pipe.proc.decode_until_eos(tokens)
    return rec


def run_mmu(pipe, golden: Optional[dict]) -> Dict[str, Any]:
    import jax.numpy as jnp
    import numpy as np

    from plangen_tpu.runtime.generate import greedy_decode_text
    from plangen_tpu.tasks.pipeline import _mmu_embeds

    question = (golden or {}).get("question", PINNED_QUESTION)
    size = pipe.cfg.vision.image_size
    images = pinned_image(size)
    budget = pipe.gen.max_new_text_tokens
    kwargs = {} if question is None else {"question": question}
    batch = pipe.proc.mmu_batch(1, decode_budget=budget, **kwargs)
    embeds = _mmu_embeds(
        pipe.params, pipe.cfg,
        jnp.asarray(batch.input_ids),
        jnp.asarray(images, dtype=pipe.dtype),
        jnp.asarray(batch.images_seq_mask),
    ).astype(pipe.dtype)
    tokens = np.asarray(
        greedy_decode_text(
            pipe.params, pipe.cfg, embeds, jnp.asarray(batch.attn_mask),
            jnp.int32(pipe.proc.tok.special.eos_id), max_new_tokens=budget,
        )
    )
    eos = pipe.proc.tok.special.eos_id
    ours = [_trim_eos(r, eos) for r in tokens]
    rec: Dict[str, Any] = {"mode": "mmu", "question": question, "tokens": ours}
    if golden is not None:
        rec.update(_diff(ours, golden["tokens"]))
    else:
        rec["status"] = "no_golden"
    rec["texts"] = pipe.proc.decode_until_eos(tokens)
    return rec


def run_teacher_forced(pipe, mode: str, golden: Optional[dict]) -> Dict[str, Any]:
    """edit/rm protocol: edit_region == 0 everywhere -> tokens must equal the
    VQ encoding of the gt image (fully deterministic; also token-exact vs the
    reference when its dump used the same pinned image)."""
    g = golden or {}
    caption = g.get("caption", PINNED_UNI_CAPTION)
    grounding = g.get("grounding", PINNED_UNI_GROUNDING)
    neg_grounding = g.get("neg_grounding", PINNED_RM_NEG) if mode == "rm" else None
    size = pipe.cfg.vision.image_size
    gt_images = pinned_image(size, seed=1)
    region = np.zeros((1, pipe.cfg.image_seq_len), dtype=np.int32)

    out = pipe.edit_image(
        [caption], [grounding], gt_images, region,
        neg_groundings=[neg_grounding] if neg_grounding else None,
        seed=pipe.gen.seed,
    )
    ours = [list(map(int, r)) for r in out.image_tokens]

    # internal consistency: the teacher-forced stream IS the VQ encoding
    from plangen_tpu.tasks.pipeline import _vq_encode
    import jax.numpy as jnp

    vq_tok = np.asarray(
        _vq_encode(pipe.params, pipe.cfg, jnp.asarray(gt_images, dtype=pipe.dtype))
    )
    internal_ok = bool((np.asarray(out.image_tokens) == vq_tok).all())

    rec: Dict[str, Any] = {
        "mode": mode,
        "caption": caption,
        "grounding": grounding,
        "tokens": ours,
        "teacher_forced_equals_vq_encode": internal_ok,
    }
    if mode == "rm":
        rec["neg_grounding"] = neg_grounding
    if golden is not None:
        rec.update(_diff(ours, golden["tokens"]))
    else:
        rec["status"] = "no_golden" if internal_ok else "internal_mismatch"
    return rec


def run_uni(pipe, golden: Optional[dict]) -> Dict[str, Any]:
    """Logit injection for the sampled mode (SURVEY §7): one teacher-forced
    forward reproduces every step's CFG logits of the sequential loop."""
    import jax
    import jax.numpy as jnp

    from plangen_tpu.models import llama, vlm
    from plangen_tpu.ops.sampling import cfg_combine

    g = golden or {}
    caption = g.get("caption", PINNED_UNI_CAPTION)
    grounding = g.get("grounding", PINNED_UNI_GROUNDING)
    cfg_weight = float(g.get("cfg_weight", pipe.gen.cfg_weight))
    temperature = float(g.get("temperature", pipe.gen.temperature))
    n_img = pipe.cfg.image_seq_len

    if golden is not None:
        inj = np.asarray(golden["tokens"], dtype=np.int32)  # [1, n_img]
    else:
        # no golden: sample our own stream (recorded for capture mode)
        out = pipe.layout_to_image([caption], [grounding], seed=pipe.gen.seed)
        inj = np.asarray(out.image_tokens, dtype=np.int32)

    ids, mask = pipe.proc.uni_batch([caption], [grounding])
    cfg_ids, cfg_mask = pipe.proc.cfg_batch(ids, mask, None, None, parallel_size=1)

    @jax.jit
    def injected_probs(params, cfg_ids, cfg_mask, tokens):
        embeds = vlm.embed_text(params, cfg_ids).astype(pipe.dtype)
        pair = jnp.repeat(tokens, 2, axis=0)  # [2, n_img]
        img_embeds = vlm.gen_img_embeds(params, pair).astype(pipe.dtype)
        x = jnp.concatenate([embeds, img_embeds], axis=1)
        hidden, _ = llama.forward(
            params["language_model"], pipe.cfg.llama, x, cfg_mask
        )
        L = cfg_ids.shape[1]
        # step i's logits come from the hidden at position L-1+i
        h = hidden[:, L - 1 : L - 1 + n_img]
        logits = vlm.image_gen_logits(params, h)  # [2, n_img, V] fp32
        comb = cfg_combine(logits, jnp.float32(cfg_weight))  # [1, n_img, V]
        probs = jax.nn.softmax(comb / jnp.float32(max(temperature, 1e-6)), axis=-1)
        inj_p = jnp.take_along_axis(probs, tokens[:, :, None], axis=-1)[..., 0]
        top1 = jnp.argmax(comb, axis=-1).astype(jnp.int32)
        return inj_p, top1

    inj_p, top1 = injected_probs(
        pipe.params, jnp.asarray(cfg_ids), jnp.asarray(cfg_mask), jnp.asarray(inj)
    )
    inj_p = np.asarray(inj_p)
    top1 = np.asarray(top1)
    rec = {
        "mode": "uni",
        "caption": caption,
        "grounding": grounding,
        "cfg_weight": cfg_weight,
        "temperature": temperature,
        "tokens": [list(map(int, r)) for r in inj],
        "mean_prob_of_injected": float(inj_p.mean()),
        "min_prob_of_injected": float(inj_p.min()),
        "top1_agreement": float((top1 == inj).mean()),
        "status": "logit_injection" if golden is not None else "no_golden",
    }
    if golden is not None and golden.get("token_probs"):
        # quantitative sampled-mode parity: the reference recorded ITS OWN
        # probability of each sampled token (capture_reference wraps
        # torch.multinomial); ours for the same stream must match within
        # cross-framework fp32 tolerance
        ref_p = np.asarray(golden["token_probs"], dtype=np.float64)
        diffs = np.abs(inj_p.astype(np.float64) - ref_p)
        rel = diffs / np.maximum(ref_p, 1e-9)
        rec["prob_parity"] = {
            "mean_abs_diff": float(diffs.mean()),
            "max_abs_diff": float(diffs.max()),
            "max_rel_diff": float(rel.max()),
        }
        rec["status"] = (
            "prob_match" if float(rel.max()) < 5e-2 and float(diffs.max()) < 1e-3
            else "prob_mismatch"
        )
    return rec


def run_prompts(pipe, golden: Optional[dict]) -> Dict[str, Any]:
    """Prompt-construction parity: our processor's token ids vs the
    reference's wrap_t2i/wrap_uni/stage-1/pad_input_ids captures — EXACT
    integer equality (no model involved)."""
    g = golden or {}
    caption = g.get("caption", PINNED_UNI_CAPTION)
    grounding = g.get("grounding", PINNED_UNI_GROUNDING)
    proc = pipe.proc
    ours: Dict[str, Any] = {
        "t2i_ids": [int(x) for x in proc.t2i_ids(caption)],
        "uni_ids": [int(x) for x in proc.uni_ids(caption, grounding)],
        "stage1_ids": [int(x) for x in proc.stage1_ids(caption)],
    }
    from plangen_tpu.text.batching import left_pad_batch

    padded, mask = left_pad_batch(
        [proc.uni_ids(caption, grounding), proc.uni_ids("a cat", grounding)],
        proc.tok.special.pad_id,
    )
    ours["padded_ids"] = [[int(x) for x in row] for row in padded]
    ours["padded_mask"] = [[int(x) for x in row] for row in mask]

    rec: Dict[str, Any] = {"mode": "prompts", "caption": caption,
                           "grounding": grounding, **ours}
    if golden is not None:
        mismatched = [
            k for k in ("t2i_ids", "uni_ids", "stage1_ids",
                        "padded_ids", "padded_mask")
            if k in golden and golden[k] != ours[k]
        ]
        rec["status"] = "match" if not mismatched else "mismatch"
        rec["mismatched_fields"] = mismatched
    else:
        rec["status"] = "no_golden"
    return rec


def run_losses(pipe, golden: Optional[dict]) -> Dict[str, Any]:
    """Training-loss parity (reference forward_uni/forward_plan/forward_mmu):
    our per-flow losses on the same pinned batch, compared within fp32
    cross-framework tolerance. `loss_mmu` is compared informationally on a
    tiny-vocab fixture (see capture_reference.capture_losses mmu_note)."""
    import jax.numpy as jnp
    import numpy as np

    from plangen_tpu.train.loss import mmu_loss, plan_loss, uni_loss

    g = golden or {}
    caption = g.get("caption", PINNED_UNI_CAPTION)
    grounding = g.get("grounding", PINNED_UNI_GROUNDING)
    prompt = g.get("prompt", f"{caption} {grounding}")
    size = pipe.cfg.vision.image_size
    images = jnp.asarray(pinned_image(size, seed=1), dtype=jnp.float32)
    pad_id = pipe.proc.tok.special.pad_id

    ids, mask = pipe.proc.uni_batch([caption], [grounding])
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)
    ours: Dict[str, float] = {}
    for k, v in uni_loss(pipe.params, pipe.cfg, ids, mask, images, pad_id).items():
        ours[k] = float(v)
    # plan: the reference reuses the uni ids + the image-extended mask
    # (forward_mmu(is_plan=True), plangen_base.py:847-851)
    L = ids.shape[1]
    for k, v in plan_loss(
        pipe.params, pipe.cfg, ids, mask[:, :L], pad_id
    ).items():
        ours[k] = float(v)
    mb = pipe.proc.mmu_batch(1, answers=[prompt])
    for k, v in mmu_loss(
        pipe.params, pipe.cfg,
        jnp.asarray(mb.input_ids), jnp.asarray(mb.attn_mask),
        images, jnp.asarray(mb.images_seq_mask), pad_id,
    ).items():
        ours[k] = float(v)

    rec: Dict[str, Any] = {
        "mode": "losses",
        "caption": caption,
        "grounding": grounding,
        "losses": ours,
    }
    if golden is not None:
        ref = golden["losses"]
        diffs = {
            k: abs(ours[k] - ref[k]) / max(abs(ref[k]), 1e-6)
            for k in ours if k in ref
        }
        rec["golden_losses"] = ref
        rec["rel_diffs"] = {k: round(v, 6) for k, v in diffs.items()}
        strict = {k: v for k, v in diffs.items() if k != "loss_mmu"}
        rec["status"] = (
            "match" if all(v < 2e-3 for v in strict.values()) else "mismatch"
        )
        rec["mmu_note"] = golden.get("mmu_note")
    else:
        rec["status"] = "no_golden"
    return rec


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--janus-path", required=True,
                    help="local Janus-Pro-1B checkout (weights + tokenizer)")
    ap.add_argument("--finetune", default=None,
                    help="PlanGen trainable_model_parameters.pth overlay")
    ap.add_argument("--golden", default=None,
                    help="dir of reference golden dumps (plan.json, ...)")
    ap.add_argument("--capture", default=None,
                    help="write OUR outputs as golden-format dumps to this dir")
    ap.add_argument("--out", default="parity_report.json")
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    ap.add_argument("--modes", default="plan,mmu,edit,rm,uni,losses,prompts")
    ap.add_argument("--max-new-text-tokens", type=int, default=512)
    ap.add_argument("--cfg", default=None,
                    help="config .py (default: full Janus-Pro-1B dims)")
    ap.add_argument("--opt", nargs="*", default=[], help="dotted overrides")
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                    help="force the JAX platform. Parity runs should pin "
                    "this: the torch reference side is CPU fp32, and which "
                    "backend OUR side lands on otherwise depends on the "
                    "environment — a cross-platform greedy argmax tie can "
                    "flip a token (observed: flaky mmu mismatch on a tiny "
                    "random checkpoint when this process competed for the "
                    "remote TPU)")
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        # before any device query — env vars cannot deselect the axon plugin
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from plangen_tpu.cli import load_config
    from plangen_tpu.convert.torch_to_jax import load_janus_checkpoint
    from plangen_tpu.tasks.eval import build_pipeline

    cfg = load_config(args.cfg, [
        f"janus_path={args.janus_path}",
        f"generation.max_new_text_tokens={args.max_new_text_tokens}",
        *args.opt,
    ])
    dtype = jnp.float32 if args.dtype == "float32" else jnp.bfloat16
    params = load_janus_checkpoint(
        args.janus_path, cfg.model, finetune_path=args.finetune, dtype=dtype,
    )
    params = jax.tree_util.tree_map(jnp.asarray, params)
    pipe = build_pipeline(cfg, params=params)
    pipe.dtype = dtype

    def load_golden(name):
        if not args.golden:
            return None
        p = Path(args.golden) / f"{name}.json"
        return json.loads(p.read_text()) if p.exists() else None

    runners = {
        "plan": lambda: run_plan(pipe, load_golden("plan")),
        "mmu": lambda: run_mmu(pipe, load_golden("mmu")),
        "edit": lambda: run_teacher_forced(pipe, "edit", load_golden("edit")),
        "rm": lambda: run_teacher_forced(pipe, "rm", load_golden("rm")),
        "uni": lambda: run_uni(pipe, load_golden("uni")),
        "losses": lambda: run_losses(pipe, load_golden("losses")),
        "prompts": lambda: run_prompts(pipe, load_golden("prompts")),
    }
    report = []
    for mode in args.modes.split(","):
        mode = mode.strip()
        rec = runners[mode]()
        report.append(rec)
        brief = {k: v for k, v in rec.items() if k not in ("tokens", "texts")}
        print(json.dumps(brief))
        if args.capture:
            os.makedirs(args.capture, exist_ok=True)
            with open(Path(args.capture) / f"{mode}.json", "w") as f:
                json.dump(rec, f)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    bad = [r for r in report
           if r.get("status") in ("mismatch", "internal_mismatch",
                                  "prob_mismatch")]
    print(json.dumps({"report": args.out, "modes": len(report),
                      "mismatched_modes": len(bad)}))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
