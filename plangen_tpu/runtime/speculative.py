"""Self-speculative image-token decoding (B=1 serving latency, opt-in).

Drafts `draft_len` tokens per round with the FIRST `draft_layers` decoder
layers (early exit through the shared final norm + gen_head — no extra
weights), then verifies all of them with ONE full-stack forward and accepts
a prefix via exact speculative sampling (Leviathan et al.): draft token x
is kept with probability min(1, p(x)/q(x)); the first rejection resamples
from normalize(max(p - q, 0)). The output distribution EQUALS plain
sampling from the full model — tested two ways without real weights:

  * draft == target (draft_layers = num_layers): every draft accepts and
    the token stream is IDENTICAL to `generate_image_tokens` (same
    positional fold_in keys);
  * greedy (temperature 0): acceptance = exact argmax agreement, so the
    stream is token-identical to base greedy for ANY draft quality.

Whether it is FASTER depends on draft/target agreement, which is a
property of trained weights (a K-layer prefix of a trained LM is a decent
drafter; of random weights it is not) — so this ships opt-in with the
mechanism verified and the speed claim deferred to real checkpoints
(docs/DESIGN.md). Scope: B=1 with the CFG dual batch (rows share every
token, so cond/uncond stay synchronized by construction). Batched
speculation needs per-row cache offsets — out of scope.

Cache discipline: draft steps write layers [0, K) at their positions; the
verify pass rewrites ALL layers at positions [t-1, t+d). Rejected-draft
slots hold stale K/V but sit at positions later queries either causally
mask or rewrite first (same argument as runtime/fast_edit.py).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp

from plangen_tpu.config import PlanGenModelConfig
from plangen_tpu.models import llama, vlm
from plangen_tpu.ops.sampling import cfg_combine, sample_categorical
from plangen_tpu.runtime.generate import prefill
from plangen_tpu.runtime.kvcache import init_kv_cache

Params = Dict[str, Any]


class SpecResult(NamedTuple):
    tokens: jax.Array  # [1, num_tokens] int32
    rounds: jax.Array  # scalar int32: verify rounds used (576/rounds ~ speedup)


def _probs(logits: jax.Array, temperature) -> jax.Array:
    """CFG-combined sampling distribution in fp32 ([V]); greedy handled by
    the callers via argmax comparisons."""
    t = jnp.maximum(temperature, 1e-6)
    return jax.nn.softmax(logits.astype(jnp.float32) / t, axis=-1)


@partial(
    jax.jit,
    static_argnames=("cfg", "num_tokens", "draft_layers", "draft_len"),
)
def generate_image_tokens_spec(
    params: Params,
    cfg: PlanGenModelConfig,
    cfg_embeds: jax.Array,  # [2, L, H] cond/uncond prompt embeds (B=1)
    attn_mask: jax.Array,  # [2, L + num_tokens]
    rng: jax.Array,
    cfg_weight: jax.Array,
    temperature: jax.Array,
    num_tokens: int = 576,
    draft_layers: int = 8,
    draft_len: int = 4,
) -> SpecResult:
    B2, L, H = cfg_embeds.shape
    assert B2 == 2, "speculative decode supports B=1 (the CFG pair)"
    d = draft_len
    # room for the final round's overshoot (junk tail is sliced off)
    S = L + num_tokens + d + 1
    attn_mask = jnp.concatenate(
        [attn_mask, jnp.zeros((B2, S - attn_mask.shape[1]), attn_mask.dtype)],
        axis=1,
    )
    cache = init_kv_cache(cfg.llama, B2, S, dtype=cfg_embeds.dtype)
    last_hidden, cache = prefill(params, cfg, cfg_embeds, attn_mask, cache)

    greedy = temperature == 0

    # token 0 comes from the prefill hidden exactly like the base loop
    logits0 = cfg_combine(vlm.image_gen_logits(params, last_hidden), cfg_weight)
    tok0 = sample_categorical(jax.random.fold_in(rng, 0), logits0, temperature)[0]

    tokens0 = jnp.zeros((num_tokens + d + 1,), jnp.int32)
    tokens0 = tokens0.at[0].set(tok0)
    acc_key = jax.random.fold_in(rng, 1 << 20)  # accept-draw stream
    # residual resamples get their OWN lineage: folding the residual index
    # into acc_key directly ((n<<1)+1, the original form) COLLIDES with a
    # later round's accept draw at position 2n+1 — the same key bits that
    # resampled a token would then decide acceptance, correlating
    # consecutive tokens and breaking the exact-speculative-sampling
    # independence argument. fold_in(res_key, n) shares no key with any
    # fold_in(acc_key, m): different lineage, disjoint by construction.
    res_key = jax.random.fold_in(rng, 2 << 20)  # residual-resample stream

    def embed_pair(tok):  # scalar token -> [2, 1, H] embeds for both CFG rows
        return vlm.gen_img_embeds(params, jnp.full((2, 1), tok)).astype(
            cfg_embeds.dtype
        )

    def draft_round(n, prev_tok, cache):
        """Draft d tokens with the K-layer prefix. Returns (draft_toks [d],
        q_combined [d, V] fp32 logits, cache)."""

        def body(j, carry):
            prev, cache, toks, qs = carry
            pos = jnp.array([L - 1], jnp.int32) + n + j
            hidden, cache = llama.forward(
                params["language_model"], cfg.llama, embed_pair(prev),
                attn_mask, positions=pos, kv_cache=cache,
                layers_limit=draft_layers,
            )
            q = cfg_combine(
                vlm.image_gen_logits(params, hidden[:, -1]), cfg_weight
            )[0]  # [V] fp32
            tok = sample_categorical(
                jax.random.fold_in(rng, n + j), q[None], temperature
            )[0]
            return tok, cache, toks.at[j].set(tok), qs.at[j].set(q)

        V = cfg.image_token_size
        _, cache, toks, qs = jax.lax.fori_loop(
            0, d, body,
            (prev_tok, cache, jnp.zeros((d,), jnp.int32),
             jnp.zeros((d, V), jnp.float32)),
        )
        return toks, qs, cache

    def verify_round(n, prev_tok, draft_toks, cache):
        """Full-stack forward over [prev, d_0..d_{d-1}] (Q = d+1): returns
        p_combined [d+1, V] for token indices n..n+d, and the cache with
        ALL layers written at positions L+n-1 .. L+n+d-1."""
        seq = jnp.concatenate([prev_tok[None], draft_toks])  # [d+1]
        embeds = vlm.gen_img_embeds(
            params, jnp.broadcast_to(seq[None], (2, d + 1))
        ).astype(cfg_embeds.dtype)
        positions = (L - 1 + n) + jnp.arange(d + 1, dtype=jnp.int32)
        hidden, cache = llama.forward(
            params["language_model"], cfg.llama, embeds, attn_mask,
            positions=positions, kv_cache=cache,
        )
        p = cfg_combine(vlm.image_gen_logits(params, hidden), cfg_weight)
        return p[0], cache  # [d+1, V] fp32

    def cond(state):
        n, _, _, _, rounds = state
        return n < num_tokens

    def body(state):
        n, prev_tok, cache, tokens, rounds = state
        draft_toks, q_logits, cache = draft_round(n, prev_tok, cache)
        p_logits, cache = verify_round(n, prev_tok, draft_toks, cache)

        p = jax.vmap(lambda l: _probs(l, temperature))(p_logits)  # [d+1, V]
        q = jax.vmap(lambda l: _probs(l, temperature))(q_logits)  # [d, V]
        p_at = jax.vmap(lambda pj, t: pj[t])(p[:d], draft_toks)
        q_at = jax.vmap(lambda qj, t: qj[t])(q, draft_toks)

        u = jax.random.uniform(jax.random.fold_in(acc_key, n), (d,))
        if_sampled = u * q_at < p_at  # u < min(1, p/q) without the divide
        if_greedy = jnp.argmax(p[:d], axis=-1).astype(jnp.int32) == draft_toks
        ok = jnp.where(greedy, if_greedy, if_sampled)
        # accepted prefix length: first False stops acceptance
        a = jnp.argmin(jnp.concatenate([ok, jnp.array([False])])).astype(jnp.int32)

        # the token after the accepted prefix:
        #   a == d: every draft accepted -> bonus token from p_d with the
        #           BASE positional key (q==p identity depends on this)
        #   a < d : resample from the residual max(p_a - q_a, 0)
        p_a = p[a]
        residual = jnp.maximum(p_a - q[jnp.minimum(a, d - 1)], 0.0)
        residual_sum = residual.sum()
        residual = jnp.where(residual_sum > 0, residual / residual_sum, p_a)
        extra_sampled = jnp.where(
            a == d,
            sample_categorical(
                jax.random.fold_in(rng, n + d), p_logits[d][None], temperature
            )[0],
            jax.random.categorical(
                jax.random.fold_in(res_key, n), jnp.log(residual + 1e-30)
            ).astype(jnp.int32),
        )
        extra_greedy = jnp.argmax(p_a).astype(jnp.int32)
        extra = jnp.where(greedy, extra_greedy, extra_sampled)

        # write the d+1 candidate slots; entries past a are overwritten later
        cand = jnp.where(
            jnp.arange(d + 1) < a,
            jnp.concatenate([draft_toks, jnp.zeros((1,), jnp.int32)]),
            extra,
        )
        # positions (a, d]: junk — keep the buffer int32-safe with draft vals
        cand = jnp.where(
            jnp.arange(d + 1) <= a,
            cand,
            jnp.concatenate([draft_toks, extra[None]]),
        )
        tokens = jax.lax.dynamic_update_slice(tokens, cand, (n,))
        n_new = n + a + 1
        prev_new = cand[a]
        return n_new, prev_new, cache, tokens, rounds + 1

    n, _, _, tokens, rounds = jax.lax.while_loop(
        cond, body, (jnp.int32(1), tok0, cache, tokens0, jnp.int32(0))
    )
    return SpecResult(tokens=tokens[None, :num_tokens], rounds=rounds)
