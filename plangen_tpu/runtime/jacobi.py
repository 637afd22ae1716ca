"""Jacobi (parallel fixed-point) decoding for greedy text generation.

The greedy AR trajectory is the unique fixed point of

    y  <-  sticky_eos(argmax(lm_head(forward(prompt ++ embed(y)))))

so instead of 512 sequential KV-cached steps (runtime/generate.py
greedy_decode_text), iterate full-sequence forwards until the token buffer
stops changing — every iteration is one large compute-bound forward (MXU-
friendly) and fixes at least one more position per pass, typically many
once the model is trained. Exactness: at convergence the output is token-
identical to the sequential decoder, INCLUDING its EOS handling (the
sequential loop embeds forced-EOS tokens after a row finishes, so the
stickiness is applied inside the iteration, not as a postprocess) —
asserted in tests/test_jacobi.py.

Reference role: "Parallel Jacobi Decoding for Fast Autoregressive Image
Generation" (PAPERS.md) applied to the x2t greedy path
(plangen_base.py:513-523). Like self-speculative decoding
(runtime/speculative.py) this is opt-in: the wall-clock win depends on
trained-weight convergence (random weights converge ~1 position/iteration,
i.e. no speedup), so the default remains the sequential KV-cached loop.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from plangen_tpu.config import PlanGenModelConfig
from plangen_tpu.models import llama, vlm

Params = Dict[str, Any]


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_new_tokens", "max_iters", "return_iters"),
)
def jacobi_decode_text(
    params: Params,
    cfg: PlanGenModelConfig,
    inputs_embeds: jax.Array,  # [B, L, H]
    attn_mask: jax.Array,  # [B, L + max_new_tokens]
    eos_id: jax.Array,  # scalar int32
    max_new_tokens: int = 512,
    max_iters: int | None = None,  # default: max_new_tokens (exact bound)
    return_iters: bool = False,
) -> jax.Array | Tuple[jax.Array, jax.Array]:
    """Greedy text decode by Jacobi iteration; returns [B, max_new_tokens].

    With `max_iters >= max_new_tokens` (the default) the result is EXACTLY
    greedy_decode_text's: each pass fixes at least the first unconverged
    position, so T passes always reach the fixed point.
    """
    B, L, H = inputs_embeds.shape
    T = max_new_tokens
    if max_iters is None:
        max_iters = T

    def sticky_eos(toks: jax.Array) -> jax.Array:
        # rows keep emitting EOS after their first EOS — matching the
        # sequential loop, which also EMBEDS the forced EOS as context
        seen = jnp.cumsum((toks == eos_id).astype(jnp.int32), axis=1)
        prev_seen = jnp.pad(seen, ((0, 0), (1, 0)))[:, :T]
        return jnp.where(prev_seen > 0, eos_id, toks)

    def one_pass(y: jax.Array) -> jax.Array:
        y_embeds = vlm.embed_text(params, y).astype(inputs_embeds.dtype)
        full = jnp.concatenate([inputs_embeds, y_embeds], axis=1)  # [B, L+T]
        hidden, _ = llama.forward(
            params["language_model"], cfg.llama, full, attn_mask,
            positions=jnp.arange(L + T, dtype=jnp.int32),
        )
        logits = llama.lm_head(
            params["language_model"], hidden[:, L - 1 : L + T - 1]
        )
        return sticky_eos(jnp.argmax(logits, axis=-1).astype(jnp.int32))

    def cond(state):
        i, _, converged = state
        return jnp.logical_and(i < max_iters, jnp.logical_not(converged))

    def body(state):
        i, y, _ = state
        y_new = one_pass(y)
        return i + 1, y_new, jnp.all(y_new == y)

    y0 = jnp.zeros((B, T), dtype=jnp.int32)
    iters, y, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), y0, False))
    return (y, iters) if return_iters else y
