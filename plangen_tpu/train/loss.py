"""Task losses.

Reference semantics:
  * shift-by-one cross entropy in fp32 with pad-id ignore
    (src/utils/causal_loss.py:5-27 ForCausalLMLoss).
  * 'uni'/'t2i' — gen_head CE over the last 577 positions against
    [0, vq_ids] labels, plus (uni only) lm_head CE over the text positions
    against the input ids (plangen_base.py:909-972).
  * 'mmu' — lm_head CE over the full spliced sequence with image-placeholder
    positions remapped to pad (ignored) (plangen_base.py:843-892).
  * 'plan' — mmu loss on the text-only uni prompt (plangen_base.py:977).

All model forwards here are cache-free full-sequence (training path).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from plangen_tpu.config import PlanGenModelConfig
from plangen_tpu.models import llama, vlm, vq

Params = Dict[str, Any]


def shift_cross_entropy(
    logits: jax.Array,  # [B, L, V]
    labels: jax.Array,  # [B, L] int
    ignore_id: int | jax.Array,
) -> jax.Array:
    """Mean CE of logits[:, :-1] predicting labels[:, 1:], fp32, pad-ignored."""
    logits = logits[:, :-1].astype(jnp.float32)
    targets = labels[:, 1:]
    valid = (targets != ignore_id).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    tgt = jnp.clip(targets, 0, logits.shape[-1] - 1)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def shift_cross_entropy_fused(
    hidden: jax.Array,  # [B, S, H]
    w_head: jax.Array,  # [H, V] lm_head weight
    labels: jax.Array,  # [B, S] int
    ignore_id: int | jax.Array,
    chunk: int = 256,
) -> jax.Array:
    """shift_cross_entropy computed WITHOUT materializing [B, S, V] logits.

    The 102400-way lm_head CE dominates training activation memory: at the
    reference mmu batch (B=3, S~1280) the fp32 logits alone are ~1.6 GB, and
    XLA writes+reads them around the log_softmax. Here the sequence is
    processed in `chunk`-position blocks inside a rematerialized lax.scan —
    logits live only at [B, chunk, V] (~300 MB), recomputed in the backward.
    Identical math to lm_head + shift_cross_entropy (same per-position ops,
    logits computed in the matmul dtype then upcast like llama.lm_head);
    equality is tested in tests/test_train.py.
    """
    B, S, H = hidden.shape
    h = hidden[:, :-1]
    t = labels[:, 1:]
    valid = (t != ignore_id).astype(jnp.float32)
    n = S - 1
    pad = (-n) % chunk
    if pad:
        h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
        t = jnp.pad(t, ((0, 0), (0, pad)))
        valid = jnp.pad(valid, ((0, 0), (0, pad)))
    nc = (n + pad) // chunk
    h = h.reshape(B, nc, chunk, H).transpose(1, 0, 2, 3)  # [nc, B, C, H]
    t = t.reshape(B, nc, chunk).transpose(1, 0, 2)
    valid = valid.reshape(B, nc, chunk).transpose(1, 0, 2)

    def body(carry, xs):
        s, c = carry
        h_c, t_c, v_c = xs
        logits = (h_c @ w_head).astype(jnp.float32)  # matches llama.lm_head
        logp = jax.nn.log_softmax(logits, axis=-1)
        tt = jnp.clip(t_c, 0, logits.shape[-1] - 1)
        nll = -jnp.take_along_axis(logp, tt[..., None], axis=-1)[..., 0]
        return (s + jnp.sum(nll * v_c), c + jnp.sum(v_c)), None

    (s, c), _ = jax.lax.scan(
        jax.checkpoint(body), (jnp.float32(0), jnp.float32(0)), (h, t, valid)
    )
    return s / jnp.maximum(c, 1.0)


def _lm_shift_ce(params: Params, hidden, labels, pad_id, fused=False) -> jax.Array:
    """lm_head CE; `fused=True` takes the chunked low-memory form (requires a
    dense head — quantized serving params always use the materialized path)."""
    w = params["language_model"]["lm_head"]
    if not fused or isinstance(w, dict):
        logits = llama.lm_head(params["language_model"], hidden)
        return shift_cross_entropy(logits, labels, pad_id)
    return shift_cross_entropy_fused(hidden, w, labels, pad_id)


def _forward_full(
    params, cfg: PlanGenModelConfig, embeds, mask,
    remat: bool = False, use_flash: bool = False,
    ablate: frozenset = frozenset(),
):
    hidden, _ = llama.forward(
        params["language_model"], cfg.llama, embeds, mask,
        remat=remat, use_flash=use_flash, ablate=ablate,
    )
    return hidden


def t2i_loss(
    params: Params,
    cfg: PlanGenModelConfig,
    input_ids: jax.Array,  # [B, L]
    attn_mask: jax.Array,  # [B, L + N]
    images: jax.Array,  # [B, H, W, 3] in [-1, 1]
    pad_id: int,
    is_uni: bool = True,
    local_edit_region: jax.Array | None = None,  # [B, N] optional loss mask
    remat=False,
    use_flash: bool = False,
    fused_ce: bool = False,
    ablate: frozenset = frozenset(),  # DIAGNOSTIC ONLY (tools/
    # bench_train_budget.py): "vq" skips the VQ encoder (constant labels),
    # "heads" replaces head+CE with mean(hidden). Losses are numerically
    # meaningless under any ablation.
) -> Dict[str, jax.Array]:
    """Image-generation loss (reference forward_t2i, plangen_base.py:909-972)."""
    B, L = input_ids.shape
    n_img = cfg.image_seq_len

    if "vq" in ablate:
        vq_ids = jnp.zeros((B, n_img), dtype=jnp.int32)
    else:
        # VQ-encode GT image to token ids (no grad; VQ frozen in stage3)
        vq_ids = jax.lax.stop_gradient(
            vq.encode_to_indices(params["gen_vision_model"], cfg.vq, images)
        )  # [B, N]

    text_embeds = vlm.embed_text(params, input_ids)
    img_embeds = vlm.gen_img_embeds(params, vq_ids).astype(text_embeds.dtype)
    embeds = jnp.concatenate([text_embeds, img_embeds], axis=1)  # [B, L+N]

    hidden = _forward_full(params, cfg, embeds, attn_mask, remat, use_flash,
                           ablate=ablate)

    if "heads" in ablate:
        # surrogate keeps the LM fwd+bwd alive, kills gen_head/lm_head + CE
        surrogate = jnp.mean(hidden.astype(jnp.float32))
        if not is_uni:
            return {"loss_t2i": surrogate}
        return {"loss_uni_t2i": surrogate, "loss_uni_lm": surrogate}

    # image head over the last N+1 positions; labels [0, vq_ids]
    img_hidden = hidden[:, -(n_img + 1) :]
    img_logits = vlm.image_gen_logits(params, img_hidden)  # fp32
    img_labels = vq_ids
    if local_edit_region is not None:
        # only the edit region contributes (use_local_edit_loss,
        # plangen_base.py:947-951)
        img_labels = jnp.where(local_edit_region > 0, img_labels, pad_id)
    img_labels = jnp.concatenate(
        [jnp.zeros((B, 1), dtype=vq_ids.dtype), img_labels], axis=1
    )
    loss_img = shift_cross_entropy(img_logits, img_labels, pad_id)

    if not is_uni:
        return {"loss_t2i": loss_img}

    # text LM loss over the prompt positions
    loss_lm = _lm_shift_ce(params, hidden[:, :-n_img], input_ids, pad_id,
                           fused=fused_ce)
    return {"loss_uni_t2i": loss_img, "loss_uni_lm": loss_lm}


def uni_loss(params, cfg, input_ids, attn_mask, images, pad_id, remat=False,
             use_flash=False, fused_ce=False, ablate=frozenset()):
    return t2i_loss(
        params, cfg, input_ids, attn_mask, images, pad_id, is_uni=True,
        remat=remat, use_flash=use_flash, fused_ce=fused_ce, ablate=ablate,
    )


def mmu_loss(
    params: Params,
    cfg: PlanGenModelConfig,
    input_ids: jax.Array,  # [B, L] (image tags expanded)
    attn_mask: jax.Array,  # [B, L]
    images: jax.Array,  # [B, H, W, 3]
    images_seq_mask: jax.Array,  # [B, L] bool
    pad_id: int,
    remat=False,
    use_flash: bool = False,
    fused_ce: bool = False,
    ablate: frozenset = frozenset(),  # DIAGNOSTIC ONLY: "siglip" skips the
    # vision tower + aligner (text embeds everywhere), "heads" as in t2i_loss
) -> Dict[str, jax.Array]:
    """Understanding loss (reference forward_mmu, plangen_base.py:843-892):
    LM CE over the spliced sequence; image-placeholder ids -> pad (ignored)."""
    if "siglip" in ablate:
        embeds = vlm.embed_text(params, input_ids)  # same [B, L, H] shape
    else:
        embeds = vlm.prepare_inputs_embeds(
            params, cfg, input_ids, images, images_seq_mask,
            use_flash=use_flash, remat=remat,
        )
    hidden = _forward_full(params, cfg, embeds, attn_mask, remat, use_flash,
                           ablate=ablate)
    if "heads" in ablate:
        return {"loss_mmu": jnp.mean(hidden.astype(jnp.float32))}
    labels = jnp.where(images_seq_mask, pad_id, input_ids)
    return {"loss_mmu": _lm_shift_ce(params, hidden, labels, pad_id, fused=fused_ce)}


def plan_loss(
    params: Params,
    cfg: PlanGenModelConfig,
    input_ids: jax.Array,  # [B, L] text-only uni prompt
    attn_mask: jax.Array,  # [B, L]
    pad_id: int,
    remat=False,
    use_flash: bool = False,
    fused_ce: bool = False,
    ablate: frozenset = frozenset(),  # DIAGNOSTIC ONLY: "heads" as above
) -> Dict[str, jax.Array]:
    """Planning loss (reference forward_plan -> forward_mmu(is_plan=True))."""
    embeds = vlm.embed_text(params, input_ids)
    hidden = _forward_full(params, cfg, embeds, attn_mask, remat, use_flash,
                           ablate=ablate)
    if "heads" in ablate:
        return {"loss_plan_lm": jnp.mean(hidden.astype(jnp.float32))}
    return {"loss_plan_lm": _lm_shift_ce(params, hidden, input_ids, pad_id,
                                         fused=fused_ce)}
