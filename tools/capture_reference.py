"""Reference-side golden capture: run the ACTUAL torch PlanGen reference on
the pinned parity inputs and emit golden dumps for tools/golden_parity.py.

This completes the parity protocol (SURVEY.md §7): golden_parity.py defines
the golden JSON format and compares OUR outputs against it; this driver
produces the reference side by importing `/root/reference`'s `System`
(project/plangen/plangen_base.py) and driving the same five pinned modes
through the reference's OWN prompt/collate/decode methods:

  plan  — wrap_uni_prompt(caption, "<grounding>", in_stage1=True) +
          pad_input_ids + x2t greedy (plangen_base.py:786-794, 513-523)
  mmu   — VLChatProcessor mmu conversation + prepare_inputs_embeds + x2t
          greedy (plangen_base.py:819-840, 364-372)
  edit  — teacher-forced sample_image with edit_region == 0 everywhere
          (plangen_base.py:593-598): tokens == VQ encode of the gt image
  rm    — same with use_neg_box negative grounding (plangen_base.py:653-670)
  uni   — sampled stream from seeded sample_image (plangen_base.py:567-607);
          compared via logit injection on our side, not RNG replication

Missing reference deps are stubbed (tools/reference_shims.py) and the
hardcoded CUDA calls are mapped to CPU when no GPU is present, so greedy /
teacher-forced captures run anywhere torch runs.

Usage — real capture (Janus-Pro-1B + optional PlanGen finetune):

  python tools/capture_reference.py --reference /root/reference \
      --janus-path /ckpts/Janus-Pro-1B \
      [--finetune /ckpts/checkpoint-200000/trainable_model_parameters.pth] \
      --out goldens/

then compare with:

  python tools/golden_parity.py --janus-path /ckpts/Janus-Pro-1B \
      [--finetune ...] --golden goldens/

Dry run on the synthetic tiny checkpoint (no real weights; CI-tested in
tests/test_capture_reference.py):

  python tools/capture_reference.py --reference /root/reference \
      --janus-path <tiny fixture dir> --tiny --out goldens/

`--tiny` additionally registers a tiny SigLIP entry and a tiny VQ builder so
the reference's fixed-size constructors (vq_model.py:519-524 VQ_16,
siglip_vit.py:628-637 model table) can instantiate the tiny checkpoint's
dims; real captures never take these patches.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path
from typing import Any, Dict, List, Optional

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent))

import numpy as np

from golden_parity import (  # noqa: E402
    PINNED_CAPTIONS,
    PINNED_RM_NEG,
    PINNED_UNI_CAPTION,
    PINNED_UNI_GROUNDING,
    pinned_image,
)

# the reference's hard-coded MMU question (plangen_base.py:823) — imported
# from the framework so the capture and comparison sides stay locked together
from plangen_tpu.text.chat_template import MMU_QUESTION  # noqa: E402


def write_reference_configs(path: Path, cfg) -> None:
    """Write the HF-side config files the REFERENCE loaders need on top of a
    tiny fixture dir (model.safetensors + tokenizer from
    tests/test_golden_parity.make_janus_fixture_dir):

      config.json              — MultiModalityConfig (modeling_vlm.py:148-180)
      preprocessor_config.json — VLMImageProcessorConfig (image_processing_vlm.py:55)
      processor_config.json    — VLChatProcessor kwargs (processing_vlm.py:84-97)

    Field values mirror the released Janus-Pro-1B layout with this config's
    dims substituted."""
    lm = cfg.llama
    v = cfg.vision
    n_img_tokens = (v.image_size // v.patch_size) ** 2
    config = {
        "model_type": "multi_modality",
        "torch_dtype": "float32",
        "vision_config": {
            "cls": "CLIPVisionTower",
            "model_type": "vision",
            "params": {
                "image_size": v.image_size,
                "model_name": "siglip_tiny",
                "select_feature": "same",
                "select_layer": -1,
            },
        },
        "aligner_config": {
            "cls": "MlpProjector",
            "model_type": "aligner",
            "params": {
                "depth": cfg.aligner.depth,
                "input_dim": cfg.aligner.input_dim,
                "n_embed": cfg.aligner.n_embed,
                "projector_type": "mlp_gelu",
            },
        },
        "gen_vision_config": {
            "cls": "VQ-16",
            "model_type": "gen_vision",
            "params": {
                "image_token_size": cfg.image_token_size,
                "n_embed": cfg.gen_embed_dim,
            },
        },
        "gen_aligner_config": {
            "cls": "MlpProjector",
            "model_type": "gen_aligner",
            "params": {
                "depth": cfg.gen_aligner.depth,
                "input_dim": cfg.gen_aligner.input_dim,
                "n_embed": cfg.gen_aligner.n_embed,
                "projector_type": "mlp_gelu",
            },
        },
        "gen_head_config": {
            "cls": "vision_head",
            "model_type": "gen_head",
            "params": {
                "image_token_embed": cfg.image_token_embed,
                "image_token_size": cfg.image_token_size,
                "n_embed": lm.hidden_size,
            },
        },
        "language_config": {
            "model_type": "llama",
            "hidden_size": lm.hidden_size,
            "intermediate_size": lm.intermediate_size,
            "num_hidden_layers": lm.num_layers,
            "num_attention_heads": lm.num_heads,
            "num_key_value_heads": lm.num_kv_heads,
            "vocab_size": lm.vocab_size,
            "max_position_embeddings": lm.max_position_embeddings,
            "rms_norm_eps": lm.rms_norm_eps,
            "rope_theta": lm.rope_theta,
            "hidden_act": "silu",
            "attention_bias": False,
            "tie_word_embeddings": False,
            "torch_dtype": "float32",
        },
    }
    (path / "config.json").write_text(json.dumps(config, indent=1))
    (path / "preprocessor_config.json").write_text(json.dumps({
        "image_processor_type": "VLMImageProcessor",
        "image_size": v.image_size,
        "min_size": 14,
        "image_mean": [0.48145466, 0.4578275, 0.40821073],
        "image_std": [0.26862954, 0.26130258, 0.27577711],
        "rescale_factor": 1.0 / 255.0,
        "do_normalize": True,
    }, indent=1))
    (path / "processor_config.json").write_text(json.dumps({
        "processor_class": "VLChatProcessor",
        "image_tag": "<image_placeholder>",
        "image_start_tag": "<begin_of_image>",
        "image_end_tag": "<end_of_image>",
        "pad_tag": "<｜▁pad▁｜>",
        "num_image_tokens": n_img_tokens,
        "add_special_token": False,
        "sft_format": "deepseek",
        "mask_prompt": True,
        "ignore_id": -100,
    }, indent=1))


def apply_tiny_patches(tiny_cfg) -> None:
    """Dry-run-only: let the reference construct the tiny checkpoint's dims.

    The reference hardcodes the full-size VQ (VQ_16, vq_model.py:519) and a
    fixed SigLIP size table (siglip_vit.py:595-639); a tiny checkpoint can't
    load into those. Register a 'siglip_tiny' table entry and swap the VQ-16
    builder for one built from our tiny VQConfig (same topology)."""
    import torch.nn as nn

    from janus.models import siglip_vit, vq_model
    from janus.models import modeling_vlm

    v = tiny_cfg.vision
    siglip_vit.SigLIP_MODEL_CONFIG["siglip_tiny"] = {
        "image_size": v.image_size,
        "patch_size": v.patch_size,
        "width": v.width,
        "layers": v.layers,
        "heads": v.heads,
        "mlp_ratio": getattr(v, "mlp_ratio", 4.0),
        "global_pool": "map",
        "use_checkpoint": False,
    }

    q = tiny_cfg.vq

    def tiny_normalize(in_channels, norm_type="group"):
        return nn.GroupNorm(
            num_groups=q.group_norm_groups, num_channels=in_channels,
            eps=1e-6, affine=True,
        )

    vq_model.Normalize = tiny_normalize

    def tiny_vq(**kwargs):
        model = vq_model.VQModel.__new__(vq_model.VQModel)
        nn.Module.__init__(model)
        model.config = vq_model.ModelArgs(
            codebook_size=q.codebook_size,
            codebook_embed_dim=q.codebook_dim,
            z_channels=q.z_channels,
            encoder_ch_mult=list(q.ch_mult),
            decoder_ch_mult=list(q.ch_mult),
        )
        model.encoder = vq_model.Encoder(
            ch=q.ch, ch_mult=list(q.ch_mult), num_res_blocks=q.num_res_blocks,
            z_channels=q.z_channels,
        )
        model.decoder = vq_model.Decoder(
            ch=q.ch, ch_mult=list(q.ch_mult), num_res_blocks=q.num_res_blocks,
            z_channels=q.z_channels,
        )
        model.quantize = vq_model.VectorQuantizer(
            q.codebook_size, q.codebook_dim, 0.25, 0.0, True, True
        )
        model.quant_conv = nn.Conv2d(q.z_channels, q.codebook_dim, 1)
        model.post_quant_conv = nn.Conv2d(q.codebook_dim, q.z_channels, 1)
        return model

    _orig = modeling_vlm.model_name_to_cls

    def patched(cls_name):
        if "VQ" in cls_name:
            return tiny_vq
        return _orig(cls_name)

    modeling_vlm.model_name_to_cls = patched


def build_system(args_ns):
    from project.plangen import plangen_base

    system = plangen_base.System(args=args_ns, accelerator=None)
    system.eval()
    system.vl_gpt.eval()
    return system


def _trim_eos(row, eos_id: int) -> List[int]:
    out = []
    for t in row.tolist():
        out.append(int(t))
        if t == eos_id:
            break
    return out


def capture_plan(system, max_new: int) -> Dict[str, Any]:
    import torch

    ids_list = []
    for caption in PINNED_CAPTIONS:
        _, ids = system.wrap_uni_prompt(caption, "<grounding>", in_stage1=True)
        ids_list.append(ids)
    padded, mask = system.pad_input_ids(ids_list)
    with torch.no_grad():
        embeds = system.vl_gpt.language_model.get_input_embeddings()(
            padded.long()
        )
        out = system.vl_gpt.language_model.generate(
            inputs_embeds=embeds,
            attention_mask=mask,
            pad_token_id=system.tokenizer.eos_token_id,
            bos_token_id=system.tokenizer.bos_token_id,
            eos_token_id=system.tokenizer.eos_token_id,
            max_new_tokens=max_new,
            do_sample=False,
            use_cache=True,
        )
    eos = system.tokenizer.eos_token_id
    tokens = [_trim_eos(r, eos) for r in out]
    texts = system.decode_plan_text_batch(out)
    return {
        "mode": "plan",
        "captions": list(PINNED_CAPTIONS),
        "tokens": tokens,
        "texts": texts,
    }


def capture_mmu(system, max_new: int, image_hw: int) -> Dict[str, Any]:
    import torch

    img = pinned_image(image_hw)  # [1, H, W, 3] in [-1, 1]
    image = torch.tensor(img).permute(0, 3, 1, 2).contiguous()  # NCHW
    conversation = [
        {
            "role": "<|User|>",
            "content": f"<image_placeholder>\n{MMU_QUESTION}",
            "images": [image],
        },
        {"role": "<|Assistant|>", "content": ""},
    ]
    prepare = system.vl_chat_processor.process_one(
        prompt=None, conversations=conversation, images=image
    )
    prepare_inputs = system.vl_chat_processor.batchify([prepare])
    with torch.no_grad():
        inputs_embeds = system.vl_gpt.prepare_inputs_embeds(
            input_ids=prepare_inputs.input_ids,
            pixel_values=prepare_inputs.pixel_values,
            images_seq_mask=prepare_inputs.images_seq_mask,
            images_emb_mask=prepare_inputs.images_emb_mask,
        )
        out = system.vl_gpt.language_model.generate(
            inputs_embeds=inputs_embeds,
            attention_mask=prepare_inputs.attention_mask,
            pad_token_id=system.tokenizer.eos_token_id,
            bos_token_id=system.tokenizer.bos_token_id,
            eos_token_id=system.tokenizer.eos_token_id,
            max_new_tokens=max_new,
            do_sample=False,
            use_cache=True,
        )
    eos = system.tokenizer.eos_token_id
    return {
        "mode": "mmu",
        "question": None,  # the reference's default question (MMU_QUESTION)
        "tokens": [_trim_eos(r, eos) for r in out],
        "texts": system.decode_mmu_text_batch(out),
    }


def _sample_tokens(system, batch, teacher_forced: bool, image_hw: int):
    """Mirror t2i's internals (plangen_base.py:525-565) but return the raw
    generated token stream instead of decoded pixels."""
    import torch

    n_img = (image_hw // 16) ** 2
    # cond/neg CFG rows via the reference's own collate
    batch = system.t2i_infer_collate_batch(batch, use_uni=True)
    cfg_ids = batch["cfg_inputs_ids"]
    cfg_mask = batch["cfg_attention_mask"]
    generator = torch.Generator(device="cpu").manual_seed(system.args.seed)
    with torch.no_grad():
        gt_labels = None
        if teacher_forced:
            gt = batch["image"]
            gt_labels = (
                system.vl_gpt.gen_vision_model.encode(gt.float())[-1][-1]
                .reshape(gt.shape[0], -1)
            )
        embeds = system.vl_gpt.language_model.get_input_embeddings()(
            cfg_ids.long()
        )
        tokens = system.sample_image(
            embeds,
            cfg_ids.shape[0] // 2,
            n_img,
            cfg_mask,
            system.args.cfg_weight,
            system.args.temperature,
            generator,
            batch,
            gt_labels,
        )
    return [list(map(int, r)) for r in tokens]


def _uni_batch(system, caption: str, grounding: str) -> Dict[str, Any]:
    """The uni-ids half of mmu_collate (plangen_base.py:768-776)."""
    import torch

    _, ids = system.wrap_uni_prompt(caption, grounding)
    uni_ids, uni_mask = system.pad_input_ids([ids])
    n_img = system.image_token_num_per_image
    uni_mask = torch.cat([uni_mask, torch.ones((1, n_img))], dim=-1).int()
    return {
        "prompt": [caption],
        "base_caption": [caption],
        "gt_grounding": [grounding],
        "uni_inputs_ids": uni_ids,
        "uni_attention_mask": uni_mask,
    }


def capture_teacher_forced(system, mode: str, image_hw: int) -> Dict[str, Any]:
    import torch

    system.args.use_teacher_forcing = True
    system.args.use_neg_box = mode == "rm"
    n_img = (image_hw // 16) ** 2
    gt = torch.tensor(pinned_image(image_hw, seed=1)).permute(0, 3, 1, 2)
    batch = _uni_batch(system, PINNED_UNI_CAPTION, PINNED_UNI_GROUNDING)
    batch["image"] = gt.contiguous()
    batch["edit_region"] = torch.zeros((1, n_img), dtype=torch.long)
    if mode == "rm":
        batch["neg_base_caption"] = [PINNED_UNI_CAPTION]
        batch["neg_gt_grounding"] = [PINNED_RM_NEG]
    tokens = _sample_tokens(system, batch, teacher_forced=True, image_hw=image_hw)
    rec = {
        "mode": mode,
        "caption": PINNED_UNI_CAPTION,
        "grounding": PINNED_UNI_GROUNDING,
        "tokens": tokens,
    }
    if mode == "rm":
        rec["neg_grounding"] = PINNED_RM_NEG
    return rec


def capture_prompts(system) -> Dict[str, Any]:
    """Prompt-construction parity: the reference's exact token ids for every
    prompt wrapper (wrap_t2i_prompt :210-230, wrap_uni_prompt :232-261 incl.
    the stage-1 drop-last-token form, pad_input_ids left-padding :699-725).
    Locks the whole prompt surface — a template/tokenizer drift shows up as
    an id diff even when greedy decode happens to agree."""
    caption = PINNED_UNI_CAPTION
    grounding = PINNED_UNI_GROUNDING
    _, t2i_ids = system.wrap_t2i_prompt(caption)
    _, uni_ids = system.wrap_uni_prompt(caption, grounding)
    _, s1_ids = system.wrap_uni_prompt(caption, "<grounding>", in_stage1=True)
    # left-pad two ragged rows the way the collates do
    _, short_ids = system.wrap_uni_prompt("a cat", grounding)
    padded, mask = system.pad_input_ids([uni_ids, short_ids])
    return {
        "mode": "prompts",
        "caption": caption,
        "grounding": grounding,
        "t2i_ids": [int(x) for x in t2i_ids],
        "uni_ids": [int(x) for x in uni_ids],
        "stage1_ids": [int(x) for x in s1_ids],
        "padded_ids": [[int(x) for x in row] for row in padded],
        "padded_mask": [[int(x) for x in row] for row in mask],
    }


def capture_losses(system, image_hw: int) -> Dict[str, Any]:
    """Training-loss parity: the reference's per-flow losses on a pinned
    batch (forward_uni / forward_plan / forward_mmu,
    plangen_base.py:843-978). Extends the parity protocol from inference
    tokens to training numerics."""
    import torch

    system.args.use_teacher_forcing = False
    system.args.use_neg_box = False
    system.args.use_local_edit_loss = False
    prompt = f"{PINNED_UNI_CAPTION} {PINNED_UNI_GROUNDING}"
    img = torch.tensor(pinned_image(image_hw, seed=1)).permute(0, 3, 1, 2)
    raw = [{
        "prompt": prompt,
        "base_caption": PINNED_UNI_CAPTION,
        "gt_grounding": PINNED_UNI_GROUNDING,
        "image": img[0].contiguous(),
    }]
    batch = system.mmu_collate(raw)
    losses: Dict[str, float] = {}
    with torch.no_grad():
        for fn in (system.forward_uni, system.forward_plan, system.forward_mmu):
            for k, v in fn(batch).items():
                losses[k] = float(v)
    return {
        "mode": "losses",
        "caption": PINNED_UNI_CAPTION,
        "grounding": PINNED_UNI_GROUNDING,
        "prompt": prompt,
        "losses": losses,
        "mmu_note": (
            "the reference masks image-placeholder LABELS by the hardcoded "
            "full-vocab id 100581 (plangen_base.py:859); on a tiny-vocab "
            "fixture that remap is a no-op, so loss_mmu legitimately "
            "diverges there — it matches on the real vocabulary"
        ),
    }


def capture_uni(system, image_hw: int) -> Dict[str, Any]:
    """Sampled stream + the reference's OWN per-step probability of each
    sampled token (recorded by wrapping torch.multinomial around
    sample_image, plangen_base.py:591). The comparison side injects the
    stream and checks OUR probability of each token against these —
    quantitative parity for the sampled mode, without RNG replication."""
    import torch

    system.args.use_teacher_forcing = False
    system.args.use_neg_box = False
    batch = _uni_batch(system, PINNED_UNI_CAPTION, PINNED_UNI_GROUNDING)

    probs_log: List[List[float]] = []
    _multinomial = torch.multinomial

    def recording_multinomial(probs, num_samples, *a, **k):
        out = _multinomial(probs, num_samples, *a, **k)
        picked = probs.gather(-1, out)  # [rows, 1]
        probs_log.append([float(x) for x in picked[:, 0]])
        return out

    torch.multinomial = recording_multinomial
    try:
        tokens = _sample_tokens(
            system, batch, teacher_forced=False, image_hw=image_hw
        )
    finally:
        torch.multinomial = _multinomial
    # probs_log is [step][row] -> transpose to [row][step]
    token_probs = [list(col) for col in zip(*probs_log)] if probs_log else []
    return {
        "mode": "uni",
        "caption": PINNED_UNI_CAPTION,
        "grounding": PINNED_UNI_GROUNDING,
        "cfg_weight": float(system.args.cfg_weight),
        "temperature": float(system.args.temperature),
        "tokens": tokens,
        "token_probs": token_probs,
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--reference", default="/root/reference",
                    help="PlanGen reference checkout")
    ap.add_argument("--janus-path", required=True,
                    help="Janus-Pro-1B dir (or tiny fixture with --tiny)")
    ap.add_argument("--finetune", default=None,
                    help="trainable_model_parameters.pth overlay")
    ap.add_argument("--out", required=True, help="golden dump dir")
    ap.add_argument("--modes", default="plan,mmu,edit,rm,uni,losses,prompts")
    ap.add_argument("--max-new-text-tokens", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cfg-weight", type=float, default=5.0)
    ap.add_argument("--temperature", type=float, default=1.0)
    ap.add_argument("--tiny", action="store_true",
                    help="dry run: patch constructors for the tiny fixture")
    ap.add_argument("--tiny-preset", default="tiny",
                    choices=["tiny", "tiny_7b"],
                    help="which tiny dims the fixture was built with "
                         "(tiny_7b = 7B family-member shape relationships)")
    ap.add_argument("--numhw", action="store_true",
                    help="numhw coordinate mode (use_textual=False + "
                         "use_numhw_tokens=True): 200 <hN>/<wN> tokenizer "
                         "tokens, pinned groundings re-serialized to 0-99 "
                         "coords (plangen_base.py:121-127)")
    ap.add_argument("--force-fp32", action="store_true",
                    help="neutralize the reference's hardcoded .bfloat16() "
                         "casts (modeling_vlm.py:250) so a float32 CPU dry "
                         "run stays float32; implied by --tiny")
    args = ap.parse_args(argv)

    from reference_shims import cpu_patches, install_stubs, load_reference_args

    install_stubs(args.reference)
    cpu_patches()
    if args.tiny or args.force_fp32:
        import torch

        torch.Tensor.bfloat16 = lambda self: self.float()  # type: ignore

    if args.numhw:
        # re-serialize the pinned layouts in numhw form; capture_* functions
        # read the module globals, so the whole protocol switches coordinate
        # mode in one place (shared transform: golden_parity.to_numhw_grounding)
        from golden_parity import to_numhw_grounding

        g = globals()
        g["PINNED_UNI_GROUNDING"] = to_numhw_grounding(PINNED_UNI_GROUNDING)
        g["PINNED_RM_NEG"] = to_numhw_grounding(PINNED_RM_NEG)

    tiny_cfg = None
    if args.tiny:
        from plangen_tpu.config import PlanGenModelConfig

        tiny_cfg = getattr(PlanGenModelConfig, args.tiny_preset)()
        apply_tiny_patches(tiny_cfg)

    image_hw = tiny_cfg.vision.image_size if tiny_cfg else 384
    ref_args = load_reference_args(args.reference, {
        "janus_path": args.janus_path,
        "janus_hw": image_hw,
        "seed": args.seed,
        "cfg_weight": args.cfg_weight,
        "temperature": args.temperature,
        "parallel_size": 1,
        "use_special_tokens": True,
        "use_numhw_tokens": args.numhw,
        "use_textual": not args.numhw,
        "use_teacher_forcing": False,
        "use_neg_box": False,
        "tuning_mode": "stage3",
        "gradient_checkpointing_enable": False,
        "test": True,  # pad_input_ids: no max_seq_len truncation in test mode
        "debug_max_seq_len": None,
    })
    # the reference's config.json may carry tiny vision dims; System reads
    # janus_hw for token counts, the model reads its own config
    system = build_system(ref_args)

    if args.finetune:
        import torch

        sd = torch.load(args.finetune, map_location="cpu")
        missing, unexpected = system.load_state_dict(sd, strict=False)
        print(json.dumps({
            "finetune": args.finetune,
            "loaded": len(sd),
            "unexpected": len(unexpected),
        }))

    runners = {
        "plan": lambda: capture_plan(system, args.max_new_text_tokens),
        "mmu": lambda: capture_mmu(system, args.max_new_text_tokens, image_hw),
        "edit": lambda: capture_teacher_forced(system, "edit", image_hw),
        "rm": lambda: capture_teacher_forced(system, "rm", image_hw),
        "uni": lambda: capture_uni(system, image_hw),
        "losses": lambda: capture_losses(system, image_hw),
        "prompts": lambda: capture_prompts(system),
    }
    os.makedirs(args.out, exist_ok=True)
    for mode in args.modes.split(","):
        mode = mode.strip()
        rec = runners[mode]()
        with open(Path(args.out) / f"{mode}.json", "w") as f:
            json.dump(rec, f)
        brief = {k: (v if k != "tokens" else f"{len(v)}x{len(v[0])} ids")
                 for k, v in rec.items() if k != "texts"}
        print(json.dumps(brief))
    print(json.dumps({"out": args.out, "modes": args.modes}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
