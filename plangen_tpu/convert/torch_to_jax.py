"""Torch -> JAX weight converter for Janus-Pro / PlanGen checkpoints.

Maps the HF `MultiModalityCausalLM` state_dict (janus/models/modeling_vlm.py
submodule layout) onto the plangen_tpu parameter pytree:

  * Linear weights transpose [out, in] -> [in, out] (we store x @ w layout).
  * Conv weights transpose OIHW -> HWIO (NHWC TPU layout).
  * The 24 LM decoder layers stack into single [L, ...] arrays (layer-scan).
  * PlanGen fine-tune artifacts (`trainable_model_parameters.pth`,
    base_system.py:166-189) are partial state dicts — apply them on top of
    the base Janus weights with `strict=False` semantics.

Works from a local checkpoint dir (model.safetensors / pytorch_model.bin).
Supports numpy-only input (dict of arrays) so tests don't need torch.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Mapping, Optional

import numpy as np

from plangen_tpu.config import PlanGenModelConfig


def _to_numpy(t: Any) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor (cpu); bf16 needs an upcast before numpy conversion
    try:
        import torch

        if isinstance(t, torch.Tensor):
            if t.dtype == torch.bfloat16:
                return t.detach().to(torch.float32).cpu().numpy()
            return t.detach().cpu().numpy()
    except ImportError:
        pass
    return np.asarray(t)


def _linear_w(sd, name):
    return _to_numpy(sd[name]).T  # [out, in] -> [in, out]


def _conv_w(sd, name):
    return _to_numpy(sd[name]).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def _vec(sd, name):
    return _to_numpy(sd[name])


def convert_state_dict(
    sd: Mapping[str, Any], cfg: PlanGenModelConfig, dtype=np.float32
) -> Dict[str, Any]:
    """Full-model conversion. `sd` is the HF state dict (torch or numpy)."""
    out: Dict[str, Any] = {}
    out["language_model"] = _convert_lm(sd, cfg, "language_model.")
    out["vision_model"] = _convert_siglip(sd, cfg, "vision_model.vision_tower.")
    out["aligner"] = _convert_projector(sd, "aligner.")
    out["gen_aligner"] = _convert_projector(sd, "gen_aligner.")
    out["gen_head"] = {
        "fc1": {
            "w": _linear_w(sd, "gen_head.output_mlp_projector.weight"),
            "b": _vec(sd, "gen_head.output_mlp_projector.bias"),
        },
        "fc2": {
            "w": _linear_w(sd, "gen_head.vision_head.weight"),
            "b": _vec(sd, "gen_head.vision_head.bias"),
        },
    }
    out["gen_embed"] = _vec(sd, "gen_embed.weight")
    out["gen_vision_model"] = _convert_vq(sd, cfg, "gen_vision_model.")
    return _cast_tree(out, dtype)


def _cast_tree(tree, dtype):
    if isinstance(tree, dict):
        return {k: _cast_tree(v, dtype) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_cast_tree(v, dtype) for v in tree]
    arr = np.asarray(tree)
    # np.issubdtype(ml_dtypes.bfloat16, np.floating) is FALSE — the Janus
    # safetensors shards load as ml_dtypes bf16 arrays (framework="np"),
    # and the plain-numpy check silently skipped casting them, so an fp32
    # parity load stayed bf16. jnp's lattice counts bf16 as floating.
    import jax.numpy as jnp

    if jnp.issubdtype(arr.dtype, jnp.floating):
        return arr.astype(dtype)
    return arr


def _convert_lm(sd, cfg: PlanGenModelConfig, p: str) -> Dict[str, Any]:
    L = cfg.llama.num_layers

    def stack_linear(fmt):
        return np.stack([_linear_w(sd, fmt.format(i=i)) for i in range(L)])

    def stack_vec(fmt):
        return np.stack([_vec(sd, fmt.format(i=i)) for i in range(L)])

    m = p + "model."
    return {
        "embed_tokens": _vec(sd, m + "embed_tokens.weight"),
        "final_norm": _vec(sd, m + "norm.weight"),
        "lm_head": _linear_w(sd, p + "lm_head.weight"),
        "layers": {
            "input_norm": stack_vec(m + "layers.{i}.input_layernorm.weight"),
            "post_attn_norm": stack_vec(
                m + "layers.{i}.post_attention_layernorm.weight"
            ),
            "q_proj": stack_linear(m + "layers.{i}.self_attn.q_proj.weight"),
            "k_proj": stack_linear(m + "layers.{i}.self_attn.k_proj.weight"),
            "v_proj": stack_linear(m + "layers.{i}.self_attn.v_proj.weight"),
            "o_proj": stack_linear(m + "layers.{i}.self_attn.o_proj.weight"),
            "gate_proj": stack_linear(m + "layers.{i}.mlp.gate_proj.weight"),
            "up_proj": stack_linear(m + "layers.{i}.mlp.up_proj.weight"),
            "down_proj": stack_linear(m + "layers.{i}.mlp.down_proj.weight"),
        },
    }


def _convert_siglip(sd, cfg: PlanGenModelConfig, p: str) -> Dict[str, Any]:
    blocks = []
    for i in range(cfg.vision.layers):
        b = f"{p}blocks.{i}."
        blocks.append(
            {
                "norm1": {
                    "scale": _vec(sd, b + "norm1.weight"),
                    "bias": _vec(sd, b + "norm1.bias"),
                },
                "qkv": {
                    "w": _linear_w(sd, b + "attn.qkv.weight"),
                    "b": _vec(sd, b + "attn.qkv.bias"),
                },
                "proj": {
                    "w": _linear_w(sd, b + "attn.proj.weight"),
                    "b": _vec(sd, b + "attn.proj.bias"),
                },
                "norm2": {
                    "scale": _vec(sd, b + "norm2.weight"),
                    "bias": _vec(sd, b + "norm2.bias"),
                },
                "fc1": {
                    "w": _linear_w(sd, b + "mlp.fc1.weight"),
                    "b": _vec(sd, b + "mlp.fc1.bias"),
                },
                "fc2": {
                    "w": _linear_w(sd, b + "mlp.fc2.weight"),
                    "b": _vec(sd, b + "mlp.fc2.bias"),
                },
            }
        )
    pos = _vec(sd, p + "pos_embed")
    if pos.ndim == 2:
        pos = pos[None]
    import jax

    return {
        "patch_embed": {
            "w": _conv_w(sd, p + "patch_embed.proj.weight"),
            "b": _vec(sd, p + "patch_embed.proj.bias"),
        },
        "pos_embed": pos,
        "final_norm": {
            "scale": _vec(sd, p + "norm.weight"),
            "bias": _vec(sd, p + "norm.bias"),
        },
        # layer-stacked like the LM decoder (siglip.py module docstring)
        "layers": jax.tree_util.tree_map(lambda *xs: np.stack(xs), *blocks),
    }


def _convert_projector(sd, p: str) -> Dict[str, Any]:
    """mlp_gelu Sequential: Linear at indices 0, 2, 4, ... (GELU between)."""
    layers = []
    idx = 0
    while f"{p}layers.{idx}.weight" in sd:
        layers.append(
            {
                "w": _linear_w(sd, f"{p}layers.{idx}.weight"),
                "b": _vec(sd, f"{p}layers.{idx}.bias"),
            }
        )
        idx += 2
    if not layers and f"{p}layers.weight" in sd:  # single Linear (type 'linear')
        layers.append(
            {"w": _linear_w(sd, f"{p}layers.weight"), "b": _vec(sd, f"{p}layers.bias")}
        )
    return {"layers": layers}


def _gn(sd, name):
    return {"scale": _vec(sd, name + ".weight"), "bias": _vec(sd, name + ".bias")}


def _conv(sd, name):
    return {"w": _conv_w(sd, name + ".weight"), "b": _vec(sd, name + ".bias")}


def _resblock(sd, p):
    out = {
        "norm1": _gn(sd, p + "norm1"),
        "conv1": _conv(sd, p + "conv1"),
        "norm2": _gn(sd, p + "norm2"),
        "conv2": _conv(sd, p + "conv2"),
    }
    if p + "nin_shortcut.weight" in sd:
        out["nin_shortcut"] = _conv(sd, p + "nin_shortcut")
    return out


def _attnblock(sd, p):
    return {
        "norm": _gn(sd, p + "norm"),
        "q": _conv(sd, p + "q"),
        "k": _conv(sd, p + "k"),
        "v": _conv(sd, p + "v"),
        "proj_out": _conv(sd, p + "proj_out"),
    }


def _convert_vq(sd, cfg: PlanGenModelConfig, p: str) -> Dict[str, Any]:
    vq = cfg.vq
    n_levels = len(vq.ch_mult)

    def levels(prefix, n_res):
        # conv_blocks.{li} indices in the reference state dict are ALREADY
        # in consumption order for both encoder and decoder (the decoder's
        # own Module list is built reversed — vq_model.py Decoder) and the
        # full-decoder torch parity test pins this; no reordering here
        out = []
        for li in range(n_levels):
            lp = f"{prefix}conv_blocks.{li}."
            level: Dict[str, Any] = {"res": [], "attn": []}
            for r in range(n_res):
                level["res"].append(_resblock(sd, f"{lp}res.{r}."))
                if f"{lp}attn.{r}.norm.weight" in sd:
                    level["attn"].append(_attnblock(sd, f"{lp}attn.{r}."))
            if f"{lp}downsample.conv.weight" in sd:
                level["down"] = {"conv": _conv(sd, lp + "downsample.conv")}
            if f"{lp}upsample.conv.weight" in sd:
                level["up"] = {"conv": _conv(sd, lp + "upsample.conv")}
            out.append(level)
        return out

    def mid(prefix):
        return {
            "res1": _resblock(sd, prefix + "mid.0."),
            "attn": _attnblock(sd, prefix + "mid.1."),
            "res2": _resblock(sd, prefix + "mid.2."),
        }

    encoder = {
        "conv_in": _conv(sd, p + "encoder.conv_in"),
        "levels": levels(p + "encoder.", vq.num_res_blocks),
        "mid": mid(p + "encoder."),
        "norm_out": _gn(sd, p + "encoder.norm_out"),
        "conv_out": _conv(sd, p + "encoder.conv_out"),
    }
    decoder = {
        "conv_in": _conv(sd, p + "decoder.conv_in"),
        "levels": levels(p + "decoder.", vq.num_res_blocks + 1),
        "mid": mid(p + "decoder."),
        "norm_out": _gn(sd, p + "decoder.norm_out"),
        "conv_out": _conv(sd, p + "decoder.conv_out"),
    }
    return {
        "encoder": encoder,
        "decoder": decoder,
        "codebook": _vec(sd, p + "quantize.embedding.weight"),
        "quant_conv": _conv(sd, p + "quant_conv"),
        "post_quant_conv": _conv(sd, p + "post_quant_conv"),
    }


# ---------------------------------------------------------------------------
# checkpoint loading
# ---------------------------------------------------------------------------


def _read_checkpoint_dir(path: str) -> Dict[str, Any]:
    """Read safetensors / torch .bin shards from an HF checkpoint dir."""
    files = sorted(os.listdir(path))
    sd: Dict[str, Any] = {}
    st_files = [f for f in files if f.endswith(".safetensors")]
    bin_files = [f for f in files if re.match(r"pytorch_model.*\.bin$", f)]
    if st_files:
        from safetensors import safe_open

        for f in st_files:
            with safe_open(os.path.join(path, f), framework="np") as fh:
                for k in fh.keys():
                    sd[k] = fh.get_tensor(k)
    elif bin_files:
        import torch

        for f in bin_files:
            sd.update(torch.load(os.path.join(path, f), map_location="cpu"))
    else:
        raise FileNotFoundError(f"no model weights found in {path}")
    return sd


def load_janus_checkpoint(
    janus_path: str,
    cfg: PlanGenModelConfig,
    finetune_path: Optional[str] = None,
    dtype=np.float32,
) -> Dict[str, Any]:
    """Load base Janus-Pro weights, optionally overlaying a PlanGen fine-tune.

    `finetune_path` points at a `trainable_model_parameters.pth` partial state
    dict (reference save format, base_system.py:166-189); its entries override
    the base weights (strict=False load semantics, base_system.py:158-162).
    The reference saves those payloads from the SYSTEM module's
    named_parameters() where the VLM is `self.vl_gpt` (plangen_base.py:104),
    so real checkpoints carry a `vl_gpt.` key prefix that the HF base state
    dict lacks — it is stripped here; unmatched leftovers (peft wrappers,
    renamed keys) are reported, not silently dropped.
    """
    sd = _read_checkpoint_dir(janus_path)
    if finetune_path:
        import torch

        overlay = torch.load(finetune_path, map_location="cpu")
        overlay = {
            (k[len("vl_gpt."):] if k.startswith("vl_gpt.") else k): v
            for k, v in overlay.items()
        }
        unmatched = sorted(k for k in overlay if k not in sd)
        if unmatched:
            import sys

            sys.stderr.write(
                f"load_janus_checkpoint: {len(unmatched)} overlay keys "
                f"match no base weight (first: {unmatched[0]}) — skipped, "
                "per strict=False semantics\n"
            )
        sd = {**sd, **{k: v for k, v in overlay.items() if k in sd}}
    return convert_state_dict(sd, cfg, dtype=dtype)
