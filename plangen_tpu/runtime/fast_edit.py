"""Fast teacher-forced editing: prefill the frozen runs, decode only the edit.

In editing/removal, most image tokens are FROZEN to the ground-truth encoding
(edit_region == 0 — reference overwrites the sampled token with gt,
plangen_base.py:593-598). The reference still runs all 576 sequential steps.
But a frozen token does not depend on the model's output, so a run of frozen
positions can be processed like a prefill (one forward over the whole run)
with outputs bit-identical to the sequential loop: the K/V written for gt
tokens and the hidden state entering the next sampled position are the same
either way.

The edit mask is known on the host before generation, so the chunk schedule
(which 16-token chunks are fully frozen across the batch) is STATIC: frozen
chunks compile to Q=16 forwards, mixed chunks to 16-step scans — no dynamic
branching, no cache copies. A typical removal mask freezes ~80% of the grid,
cutting sequential steps ~4x.

RNG: sampled steps draw `fold_in(rng, position)` keys, so token streams are
invariant to how the surrounding frozen runs are batched.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from plangen_tpu.config import PlanGenModelConfig
from plangen_tpu.models import llama, vlm
from plangen_tpu.ops.sampling import fold_step, apply_teacher_forcing, cfg_combine, sample_categorical
from plangen_tpu.runtime.generate import ImageGenResult, prefill
from plangen_tpu.runtime.kvcache import init_kv_cache

Params = Dict[str, Any]

CHUNK = 16


def frozen_chunk_schedule(regen_mask: np.ndarray, chunk: int = CHUNK) -> Tuple[bool, ...]:
    """Host-side static schedule: True where a chunk is fully frozen for
    EVERY batch row. regen_mask: [B, N] (1 = sample)."""
    m = np.asarray(regen_mask)
    B, N = m.shape
    pad = (-N) % chunk
    if pad:
        m = np.concatenate([m, np.ones((B, pad), dtype=m.dtype)], axis=1)
    chunks = m.reshape(B, -1, chunk)
    return tuple(bool(x) for x in (chunks.sum(axis=(0, 2)) == 0))


def canonicalize_schedule(
    schedule: Tuple[bool, ...], granularity: int = 8
) -> Tuple[bool, ...]:
    """Collapse a schedule to `frozen prefix + mixed middle + frozen suffix`
    with boundaries rounded to `granularity` chunks.

    The schedule is a jit static arg, and on the remote TPU compiler each
    distinct tuple costs minutes. Marking a frozen chunk as mixed is ALWAYS
    exactness-preserving (the sequential path teacher-forces the same gt
    tokens with the same positional fold_in keys), so we may freely coarsen:
    keep the frozen prefix (rounded down) and frozen suffix (rounded up
    from the last mixed chunk) and treat everything between as mixed. A
    576-token decode has 36 chunks -> at granularity 8 the signature space
    is at most ceil(36/8 + 1)^2 = 25 programs, and for box-shaped edit
    regions (rm_coco workload) typically <= 6. The interior frozen chunks we
    give up are few for box masks: a box spans contiguous grid rows, so
    almost all fully-frozen chunks lie before/after the row band anyway.
    """
    n = len(schedule)
    mixed = [i for i, frozen in enumerate(schedule) if not frozen]
    if not mixed:
        return (True,) * n  # fully frozen: single canonical program
    first = (mixed[0] // granularity) * granularity
    last = min(n, -(-(mixed[-1] + 1) // granularity) * granularity)
    return tuple(i < first or i >= last for i in range(n))


@partial(jax.jit, static_argnames=("cfg", "num_tokens", "schedule", "quantized_cache", "kv_a8"))
def generate_image_tokens_fast_edit(
    params: Params,
    cfg: PlanGenModelConfig,
    cfg_embeds: jax.Array,  # [2B, L, H]
    attn_mask: jax.Array,  # [2B, L + num_tokens]
    rng: jax.Array,
    cfg_weight: jax.Array,
    temperature: jax.Array,
    gt_tokens: jax.Array,  # [B, num_tokens]
    regen_mask: jax.Array,  # [B, num_tokens] (1 = sample)
    num_tokens: int = 576,
    schedule: Tuple[bool, ...] = (),  # from frozen_chunk_schedule
    quantized_cache: bool = False,
    kv_a8: bool = False,  # s8 decode-attention dots (see generate_image_tokens)
) -> ImageGenResult:
    """Teacher-forced generation with frozen chunks processed prefill-style.

    Token-identical to `generate_image_tokens` for the same inputs (tests
    assert this); only the step structure changes.
    """
    B2, L, H = cfg_embeds.shape
    B = B2 // 2
    S_max = L + num_tokens
    assert len(schedule) == -(-num_tokens // CHUNK)
    cache = init_kv_cache(
        cfg.llama, B2, S_max, dtype=cfg_embeds.dtype, quantized=quantized_cache
    )

    last_hidden, cache = prefill(params, cfg, cfg_embeds, attn_mask, cache)

    lm = params["language_model"]

    def sample_step(i, last_hidden, cache):
        logits = vlm.image_gen_logits(params, last_hidden)
        combined = cfg_combine(logits, cfg_weight)
        token = sample_categorical(fold_step(rng, i), combined, temperature)
        token = apply_teacher_forcing(token, gt_tokens[:, i], regen_mask[:, i])
        pair = jnp.repeat(token, 2, axis=0)
        emb = vlm.gen_img_embeds(params, pair[:, None]).astype(cfg_embeds.dtype)
        pos = jnp.array([L], dtype=jnp.int32) + i
        hidden, cache = llama.forward(
            lm, cfg.llama, emb, attn_mask, positions=pos, kv_cache=cache,
            kv_a8=kv_a8,
        )
        return token, hidden[:, -1], cache

    tokens_out = jnp.zeros((B, num_tokens), dtype=jnp.int32)

    for ci, frozen in enumerate(schedule):
        start = ci * CHUNK
        size = min(CHUNK, num_tokens - start)
        if frozen:
            # one forward over the whole gt run; tokens are the gt values
            chunk_tok = jax.lax.dynamic_slice_in_dim(gt_tokens, start, size, 1)
            pair = jnp.repeat(chunk_tok, 2, axis=0)  # [2B, size]
            emb = vlm.gen_img_embeds(params, pair).astype(cfg_embeds.dtype)
            positions = L + start + jnp.arange(size, dtype=jnp.int32)
            hidden, cache = llama.forward(
                lm, cfg.llama, emb, attn_mask, positions=positions, kv_cache=cache
            )
            last_hidden = hidden[:, -1]
            tokens_out = jax.lax.dynamic_update_slice(
                tokens_out, chunk_tok.astype(jnp.int32), (0, start)
            )
        else:
            def body(j, carry):
                last_hidden, cache, tokens_out = carry
                i = start + j
                token, last_hidden, cache = sample_step(i, last_hidden, cache)
                tokens_out = jax.lax.dynamic_update_slice(
                    tokens_out, token[:, None], (0, i)
                )
                return last_hidden, cache, tokens_out

            last_hidden, cache, tokens_out = jax.lax.fori_loop(
                0, size, body, (last_hidden, cache, tokens_out)
            )

    return ImageGenResult(tokens=tokens_out)
