"""PlanGen model composition root.

TPU-native equivalent of `MultiModalityCausalLM`
(three_party/Janus/janus/models/modeling_vlm.py:190-271): one parameter
pytree holding the LLaMA backbone, SigLIP tower, aligners, generation
embedding/head and the VQ tokenizer, plus the embedding-splice helpers.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from plangen_tpu.config import PlanGenModelConfig
from plangen_tpu.models import llama, projector, siglip, vq

Params = Dict[str, Any]


def init(key: jax.Array, cfg: PlanGenModelConfig, dtype=jnp.bfloat16) -> Params:
    ks = jax.random.split(key, 7)
    return {
        "language_model": llama.init(ks[0], cfg.llama, dtype),
        "vision_model": siglip.init(ks[1], cfg.vision, dtype),
        "aligner": projector.init(ks[2], cfg.aligner, dtype),
        "gen_vision_model": vq.init(ks[3], cfg.vq, dtype),
        "gen_aligner": projector.init(ks[4], cfg.gen_aligner, dtype),
        "gen_head": projector.init_gen_head(
            ks[5],
            cfg.llama.hidden_size,
            cfg.image_token_embed,
            cfg.image_token_size,
            dtype,
        ),
        # gen_embed: Embedding(image_token_size, 8) (modeling_vlm.py:214-216)
        "gen_embed": (
            jax.random.normal(ks[6], (cfg.image_token_size, cfg.gen_embed_dim)) * 0.02
        ).astype(dtype),
    }


def embed_text(params: Params, ids: jax.Array) -> jax.Array:
    """Token ids -> LLM embeddings [B, L, H]."""
    return llama.embed(params["language_model"], ids)


def gen_img_embeds(params: Params, image_ids: jax.Array) -> jax.Array:
    """VQ code ids -> LLM-dim embeddings via gen_embed + gen_aligner.

    Reference: prepare_gen_img_embeds (modeling_vlm.py:270-271).
    """
    codes = jnp.take(params["gen_embed"], image_ids, axis=0)
    return projector.forward(params["gen_aligner"], codes)


def image_gen_logits(params: Params, hidden: jax.Array) -> jax.Array:
    """gen_head image-token logits (fp32)."""
    return projector.gen_head_forward(params["gen_head"], hidden)


def encode_images_for_understanding(
    params: Params,
    cfg: PlanGenModelConfig,
    images: jax.Array,
    use_flash: bool = False,
    remat: bool = False,
) -> jax.Array:
    """SigLIP features -> aligner -> LLM-dim embeddings [B, 576, H].

    images: [B, H, W, 3] NHWC, CLIP-normalized.
    Reference: prepare_inputs_embeds vision path (modeling_vlm.py:246-249).
    """
    feats = siglip.forward(
        params["vision_model"], cfg.vision, images, use_flash=use_flash,
        remat=remat,
    )
    return projector.forward(params["aligner"], feats)


def splice_image_embeddings(
    token_embeds: jax.Array,  # [B, L, H]
    image_embeds: jax.Array,  # [B, N, H]
    images_seq_mask: jax.Array,  # [B, L] bool — True at image-placeholder slots
) -> jax.Array:
    """Scatter image embeddings into the token stream at masked positions.

    Functional equivalent of `inputs_embeds[images_seq_mask] = images_embeds`
    (modeling_vlm.py:263-266). Each row's masked positions are filled with
    that row's image embeddings in order; implemented as a gather via the
    cumulative count of mask positions (static shapes, no boolean indexing).
    """
    idx = jnp.cumsum(images_seq_mask.astype(jnp.int32), axis=1) - 1  # [B, L]
    idx = jnp.clip(idx, 0, image_embeds.shape[1] - 1)
    gathered = jnp.take_along_axis(
        image_embeds, idx[..., None].astype(jnp.int32), axis=1
    )
    return jnp.where(
        images_seq_mask[..., None], gathered.astype(token_embeds.dtype), token_embeds
    )


def prepare_inputs_embeds(
    params: Params,
    cfg: PlanGenModelConfig,
    input_ids: jax.Array,  # [B, L]
    pixel_values: jax.Array,  # [B, H, W, 3]
    images_seq_mask: jax.Array,  # [B, L] bool
    use_flash: bool = False,
    remat: bool = False,
) -> jax.Array:
    """Text embeddings with SigLIP image features spliced in (one image/row).

    Reference: MultiModalityCausalLM.prepare_inputs_embeds
    (modeling_vlm.py:221-268).
    """
    image_embeds = encode_images_for_understanding(
        params, cfg, pixel_values, use_flash=use_flash, remat=remat
    )
    token_embeds = embed_text(params, input_ids)
    return splice_image_embeddings(token_embeds, image_embeds, images_seq_mask)
