"""SigLIP-Large ViT understanding tower, pure-functional JAX.

Re-implements the reference's timm-style VisionTransformer
(three_party/Janus/janus/models/siglip_vit.py:259-590, config
"siglip_large_patch16_384" at :628-637): patch-embed conv 16x16 (with bias),
learned position embeddings, no class token, pre-norm blocks
(LayerNorm eps 1e-6, qkv_bias=True, exact GELU), final LayerNorm.
The attention-pool head is dropped (`ignore_head=True`, also nulled at
plangen_base.py:105-106) so the output is the 576 patch features.

TPU notes: images are NHWC (the TPU-native conv layout); patch embedding is
a single conv lowered onto the MXU; attention uses the shared fp32-softmax
primitive or the Pallas flash kernel (`use_flash`). Like the LLaMA decoder
(llama.py:9-14), all 24 blocks live in layer-stacked [L, ...] arrays and run
as ONE `lax.scan` — one block's HLO compiles once instead of 24 unrolled
copies (the remote axon compiler pays minutes per program), and sharding
rules stay uniform (one PartitionSpec per weight name).
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from plangen_tpu.config import SigLIPConfig
from plangen_tpu.ops.attention import dot_product_attention

Params = Dict[str, Any]


def _linear(key, in_dim, out_dim, dtype):
    k1, _ = jax.random.split(key)
    scale = in_dim ** -0.5
    return {
        "w": (jax.random.normal(k1, (in_dim, out_dim)) * scale).astype(dtype),
        "b": jnp.zeros((out_dim,), dtype=dtype),
    }


def _ln(dim, dtype):
    return {"scale": jnp.ones((dim,), dtype=dtype), "bias": jnp.zeros((dim,), dtype=dtype)}


def stack_blocks(blocks: List[Params]):
    """Per-block param dicts -> one layer-stacked dict of [L, ...] arrays."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)


def init(key: jax.Array, cfg: SigLIPConfig, dtype=jnp.bfloat16) -> Params:
    keys = jax.random.split(key, cfg.layers + 3)
    d = cfg.width
    mlp_dim = int(d * cfg.mlp_ratio)
    blocks = []
    for l in range(cfg.layers):
        ks = jax.random.split(keys[2 + l], 4)
        blocks.append(
            {
                "norm1": _ln(d, dtype),
                "qkv": _linear(ks[0], d, 3 * d, dtype),
                "proj": _linear(ks[1], d, d, dtype),
                "norm2": _ln(d, dtype),
                "fc1": _linear(ks[2], d, mlp_dim, dtype),
                "fc2": _linear(ks[3], mlp_dim, d, dtype),
            }
        )
    return {
        "patch_embed": {
            # conv kernel stored HWIO for lax.conv_general_dilated NHWC
            "w": (
                jax.random.normal(keys[0], (cfg.patch_size, cfg.patch_size, 3, d))
                * 0.02
            ).astype(dtype),
            "b": jnp.zeros((d,), dtype=dtype),
        },
        "pos_embed": (
            jax.random.normal(keys[1], (1, cfg.num_patches, d)) * 0.02
        ).astype(dtype),
        "final_norm": _ln(d, dtype),
        "layers": stack_blocks(blocks),
    }


def layer_norm(x: jax.Array, p: Params, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (
        out * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    ).astype(x.dtype)


def _block(
    p: Params,
    cfg: SigLIPConfig,
    x: jax.Array,
    use_flash: bool = False,
) -> jax.Array:
    B, N, D = x.shape
    h = layer_norm(x, p["norm1"], cfg.layer_norm_eps)
    qkv = h @ p["qkv"]["w"] + p["qkv"]["b"]
    qkv = qkv.reshape(B, N, 3, cfg.heads, D // cfg.heads)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    if use_flash:
        from plangen_tpu.ops.pallas_attention import flash_attention

        # the kernel tiles S in 128-wide blocks (Mosaic lane constraint), so
        # the 576-patch grid pads to 640 with pad positions masked off — the
        # softmax over valid keys is exact, padded query rows are discarded
        pad = (-N) % 128
        if pad:
            padding = ((0, 0), (0, pad), (0, 0), (0, 0))
            q = jnp.pad(q, padding)
            k = jnp.pad(k, padding)
            v = jnp.pad(v, padding)
        mask = jnp.concatenate(
            [jnp.ones((B, N), jnp.int32), jnp.zeros((B, pad), jnp.int32)], axis=1
        )
        attn = flash_attention(q, k, v, mask, causal=False)[:, :N]
        attn = attn.reshape(B, N, D)
    else:
        attn = dot_product_attention(q, k, v).reshape(B, N, D)
    x = x + (attn @ p["proj"]["w"] + p["proj"]["b"])
    h = layer_norm(x, p["norm2"], cfg.layer_norm_eps)
    h = jax.nn.gelu(h @ p["fc1"]["w"] + p["fc1"]["b"], approximate=False)
    x = x + (h @ p["fc2"]["w"] + p["fc2"]["b"])
    return x


def forward(
    params: Params,
    cfg: SigLIPConfig,
    images: jax.Array,
    use_flash: bool = False,
    remat=False,  # bool | policy str (ops/remat.py)
) -> jax.Array:
    """images: [B, H, W, 3] (NHWC, CLIP-normalized) -> features [B, N, width]."""
    x = jax.lax.conv_general_dilated(
        images.astype(params["patch_embed"]["w"].dtype),
        params["patch_embed"]["w"],
        window_strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    B, Hp, Wp, D = x.shape
    x = x.reshape(B, Hp * Wp, D) + params["patch_embed"]["b"]
    x = x + params["pos_embed"].astype(x.dtype)
    layers = params.get("layers")
    if layers is None:
        # legacy round-1 trees stored per-block dicts under "blocks"; stack
        # on the fly so old converted artifacts keep loading (new trees and
        # the converter emit the stacked form directly)
        layers = stack_blocks(params["blocks"])

    def body(x, layer_p):
        return _block(layer_p, cfg, x, use_flash=use_flash), None

    from plangen_tpu.ops.remat import wrap_remat

    body = wrap_remat(body, remat)
    x, _ = jax.lax.scan(body, x, layers)
    return layer_norm(x, params["final_norm"], cfg.layer_norm_eps)
