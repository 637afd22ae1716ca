"""Sampling primitives for the image-token decode loop.

Reference semantics (plangen_base.py:579-591): logits from gen_head on the
last hidden state; CFG combine `uncond + w * (cond - uncond)` over interleaved
even(cond)/odd(uncond) rows; softmax(logits / temperature); multinomial draw.

Parity protocol (SURVEY.md §7 "Hard parts"): torch's CUDA RNG stream is not
reproducible on TPU, so sampled-token parity is defined as "identical logits
=> identical distribution"; greedy/teacher-forced paths are token-exact.
Sampling math is done in fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cfg_combine(logits: jax.Array, cfg_weight: float | jax.Array) -> jax.Array:
    """Classifier-free guidance over interleaved cond/uncond rows.

    logits: [2B, V] with cond at even rows, uncond at odd rows (reference
    interleave: plangen_base.py:551,580-587). Returns [B, V] fp32.
    """
    logits = logits.astype(jnp.float32)
    cond = logits[0::2]
    uncond = logits[1::2]
    return uncond + cfg_weight * (cond - uncond)


def fold_step(key: jax.Array, i) -> jax.Array:
    """fold_in for a single key [2] or per-row keys [B, 2] (serving path)."""
    if key.ndim == 2:
        return jax.vmap(lambda k: jax.random.fold_in(k, i))(key)
    return jax.random.fold_in(key, i)


def sample_categorical(
    key: jax.Array,
    logits: jax.Array,  # [B, V] (already CFG-combined)
    temperature: float | jax.Array = 1.0,
) -> jax.Array:
    """Temperature sampling in fp32. Returns [B] int32 token ids.

    temperature==0 is treated as greedy argmax. `key` is a single key [2]
    (batch shares one stream, rows split by position — the bench/eval path)
    or per-row keys [B, 2] (each row's stream is a pure function of ITS key,
    so a request's tokens don't depend on batch composition — the serving
    path, tasks/pipeline.py `seeds`).
    """
    logits = logits.astype(jnp.float32)

    def _greedy(_):
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def _sample(k):
        if k.ndim == 2:  # per-row keys
            return jax.vmap(
                lambda kk, lg: jax.random.categorical(kk, lg / temperature)
            )(k, logits).astype(jnp.int32)
        return jax.random.categorical(k, logits / temperature, axis=-1).astype(
            jnp.int32
        )

    if isinstance(temperature, (int, float)):
        return _greedy(None) if temperature == 0 else _sample(key)
    return jax.lax.cond(temperature == 0, _greedy, _sample, key)


def apply_teacher_forcing(
    sampled: jax.Array,  # [B] sampled token ids
    gt_tokens: jax.Array,  # [B] ground-truth VQ ids at this step
    regen_mask: jax.Array,  # [B] 1 = regenerate (sample), 0 = keep ground truth
) -> jax.Array:
    """Freeze background tokens during edit/removal.

    Reference: plangen_base.py:593-598 (token overwritten with gt where
    edit_region == 0).
    """
    return jnp.where(regen_mask > 0, sampled, gt_tokens).astype(sampled.dtype)
