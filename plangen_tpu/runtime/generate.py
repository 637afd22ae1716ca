"""Fused autoregressive decode loops.

TPU-first re-design of the reference's two decode loops:

  * image generation — 576 KV-cached LM steps with classifier-free guidance
    over an interleaved cond/uncond dual batch and optional teacher forcing
    (reference: sample_image, plangen_base.py:567-607 — a Python loop paying
    HF module dispatch per token). Here: ONE jitted program = prefill +
    `lax.scan` over all 576 steps + sampling, no host round-trips.
  * greedy text decode for layout planning / MMU (reference: x2t via HF
    `generate`, plangen_base.py:513-523 — greedy, max 512 new tokens,
    EOS-terminated). Here: prefill + `lax.scan` with a done-flag; tokens
    after EOS are emitted as EOS, matching HF's pad_token_id=eos semantics.

Static shapes throughout: prompts are left-padded to a bucket length by the
caller; the KV cache is preallocated at prompt_len + budget.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from plangen_tpu.config import PlanGenModelConfig
from plangen_tpu.models import llama, vlm
from plangen_tpu.ops.sampling import (
    apply_teacher_forcing, cfg_combine, fold_step, sample_categorical,
)
from plangen_tpu.runtime.kvcache import init_kv_cache

Params = Dict[str, Any]


def prefill(
    params: Params,
    cfg: PlanGenModelConfig,
    inputs_embeds: jax.Array,  # [B, L, H]
    attn_mask: jax.Array,  # [B, S_max]
    cache,
    seg_write: Optional[int] = None,  # segmented cache: prompt goes in seg 0
) -> Tuple[jax.Array, Any]:
    """Run the prompt through the decoder, filling cache slots [0, L).

    Returns (last_hidden [B, H], cache). The full-length `attn_mask` covers
    the whole cache; positions >= L are causally invisible to prompt queries.
    """
    L = inputs_embeds.shape[1]
    positions = jnp.arange(L, dtype=jnp.int32)
    seg_kwargs = {}
    if seg_write is not None:
        seg_kwargs = dict(seg_write=seg_write, write_at=jnp.int32(0))
    hidden, cache = llama.forward(
        params["language_model"],
        cfg.llama,
        inputs_embeds,
        attn_mask,
        positions=positions,
        kv_cache=cache,
        **seg_kwargs,
    )
    return hidden[:, -1], cache


class ImageGenResult(NamedTuple):
    tokens: jax.Array  # [B, N] int32 VQ code ids


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "num_tokens", "quantized_cache", "chunked", "paged",
        "growing_cache", "kv_a8", "ablate",
    ),
    donate_argnames=(),
)
def generate_image_tokens(
    params: Params,
    cfg: PlanGenModelConfig,
    cfg_embeds: jax.Array,  # [2B, L, H] interleaved cond/uncond prompt embeds
    attn_mask: jax.Array,  # [2B, L + num_tokens] pad mask (image region = 1)
    rng: jax.Array,  # single key [2], or per-row keys [B, 2] (serving:
    # each row's stream is a pure function of its key — ops/sampling.py)
    cfg_weight: jax.Array,  # scalar
    temperature: jax.Array,  # scalar
    gt_tokens: Optional[jax.Array] = None,  # [B, num_tokens] for teacher forcing
    regen_mask: Optional[jax.Array] = None,  # [B, num_tokens] 1 = sample
    num_tokens: int = 576,
    quantized_cache: bool = False,  # int8 KV cache (halves decode KV traffic)
    chunked: bool = False,  # decode attention reads only the valid cache prefix
    paged: bool = False,  # Pallas prefix-DMA decode attention (True=v2, "v3")
    growing_cache: bool = False,  # phased cache growth (banks dead reads in XLA)
    kv_a8: bool = False,  # s8 x s8 MXU decode attention over the int8 cache
    ablate: tuple = (),  # DIAGNOSTIC ONLY: component ablation for the
    # per-step time budget (tools/bench_step_budget.py). Members: "head"
    # (skip gen_head + CFG + sampling; a counter token is fed back), plus
    # the llama._layer ablations "attn"/"mlp"/"qkvo". Outputs are
    # numerically meaningless under any ablation.
) -> ImageGenResult:
    """Fused CFG image-token generation: prefill + 576-step scan in one program.

    Matches reference t2i/sample_image semantics (plangen_base.py:525-607):
    step logits = gen_head(last hidden); cfg = uncond + w*(cond - uncond);
    softmax(logits/T) sampling; optional teacher forcing where regen_mask==0;
    the sampled token is fed back through gen_embed+gen_aligner to BOTH rows
    of its cond/uncond pair.

    `growing_cache` runs the decode as consecutive scans over a SEGMENTED
    cache: phase p writes segment p and attends over the live segments with
    an exact online-softmax combine, so KV reads stay proportional to the
    written prefix (~60% of the fixed-buffer bytes) with no copies. The
    combine is the same softmax math but splits the PV matmul's fp32
    accumulation per segment, so hidden states can differ from the fixed
    buffer in the last ulp; token streams matched exactly in all tests and
    the on-chip batch-32 run (sampling is robust to final-ulp noise, but
    bit-equality of every intermediate is not guaranteed in bf16).
    """
    B2, L, H = cfg_embeds.shape
    B = B2 // 2
    S_max = L + num_tokens
    if chunked or paged:
        # chunk-based attention slices the cache in 128-slot chunks: round the
        # allocation up and mask the tail off
        S_pad = -(-S_max // 128) * 128
        attn_mask = jnp.concatenate(
            [attn_mask, jnp.zeros((B2, S_pad - S_max), dtype=attn_mask.dtype)],
            axis=1,
        )
        S_max = S_pad

    if gt_tokens is None:
        gt_tokens = jnp.zeros((B, num_tokens), dtype=jnp.int32)
        regen_mask = jnp.ones((B, num_tokens), dtype=jnp.int32)
    assert regen_mask is not None

    ablate_set = frozenset(ablate)

    def make_step(phase_mask, seg=None):
        def step(carry, i):
            last_hidden, cache, key = carry
            if "head" in ablate_set:
                # diagnostic: constant-ish token feed; gen_head weights,
                # CFG combine and sampling are DCE'd out of the program.
                # The probe (always 0, not constant-foldable) keeps the
                # token data-dependent on last_hidden so XLA cannot DCE the
                # transformer stack itself along with the head.
                probe = (jnp.max(last_hidden[:, 0]) > jnp.bfloat16(1e9))
                token = jnp.broadcast_to(
                    (i % 1024).astype(jnp.int32) + probe.astype(jnp.int32),
                    (B,),
                )
            else:
                logits = vlm.image_gen_logits(params, last_hidden)  # [2B, V] fp32
                combined = cfg_combine(logits, cfg_weight)  # [B, V]
                # positional fold_in (not sequential splits): the sampled
                # stream is then invariant to how frozen runs are batched, so
                # the fast-edit path (runtime/fast_edit.py) is token-identical;
                # `key` may be per-row [B, 2] (serving reproducibility)
                sub = fold_step(key, i)
                token = sample_categorical(sub, combined, temperature)  # [B]
                token = apply_teacher_forcing(
                    token, gt_tokens[:, i], regen_mask[:, i]
                )
            # duplicate for cond/uncond rows (plangen_base.py:602-604)
            pair_token = jnp.repeat(token, 2, axis=0)  # [2B]
            next_embeds = vlm.gen_img_embeds(params, pair_token[:, None])
            next_embeds = next_embeds.astype(cfg_embeds.dtype)
            pos = jnp.array([L + i], dtype=jnp.int32)
            seg_kwargs = {}
            if seg is not None:
                seg_idx, seg_start = seg
                seg_kwargs = dict(seg_write=seg_idx, write_at=pos[0] - seg_start)
            hidden, new_cache = llama.forward(
                params["language_model"],
                cfg.llama,
                next_embeds,
                phase_mask,
                positions=pos,
                kv_cache=cache,
                chunked=chunked,
                paged=paged,
                kv_a8=kv_a8,
                ablate=ablate_set,
                **seg_kwargs,
            )
            return (hidden[:, -1], new_cache, key), token

        return step

    if quantized_cache and (chunked or paged):
        # llama._layer matches the int8-cache branch BEFORE the chunked/
        # paged branches, so these flags would be silently ignored (the
        # caller would measure the plain q8 program believing it measured
        # the prefix-read strategy) — refuse, like growing_cache below
        raise ValueError(
            "chunked/paged decode attention is not implemented for the "
            "int8 KV cache (quantized_cache=True) — unset chunked/paged"
        )
    if growing_cache:
        if chunked or paged:
            raise ValueError(
                "growing_cache is mutually exclusive with chunked/paged "
                "decode attention (each is a different cache read strategy)"
            )
        # growing_cache=True -> 4 phases; an int picks the phase count
        num_phases = 4 if growing_cache is True else int(growing_cache)
        if num_phases < 1:
            raise ValueError(f"growing_cache phase count must be >= 1, got "
                             f"{num_phases}")
        return _generate_growing(
            params, cfg, cfg_embeds, attn_mask, rng, make_step,
            num_tokens=num_tokens, quantized_cache=quantized_cache,
            num_phases=num_phases,
        )

    cache = init_kv_cache(
        cfg.llama, B2, S_max, dtype=cfg_embeds.dtype, quantized=quantized_cache
    )
    last_hidden, cache = prefill(params, cfg, cfg_embeds, attn_mask, cache)
    (_, _, _), tokens = jax.lax.scan(
        make_step(attn_mask),
        (last_hidden, cache, rng),
        jnp.arange(num_tokens, dtype=jnp.int32),
    )
    return ImageGenResult(tokens=tokens.T)  # [B, N]


def _generate_growing(
    params, cfg, cfg_embeds, attn_mask, rng, make_step,
    num_tokens: int, quantized_cache: bool, num_phases: int = 4,
):
    """Decode in phases over a SEGMENTED KV cache.

    The full-buffer XLA attention reads the WHOLE allocated cache every step
    (decode is HBM-bound, DESIGN.md §1), so a fixed S_max buffer wastes ~45%
    of its reads on not-yet-written slots. Here the cache is split into
    128-aligned segments; phase p writes segment p and attends over segments
    0..p with an exact online-softmax combine
    (ops.attention.segmented_decode_attention). KV reads stay proportional
    to the live prefix, total memory equals the fixed buffer, and there are
    NO copies (an earlier pad-the-buffer variant held old+new buffers during
    the copy and exhausted HBM at batch 32). Same positions, masking and RNG
    fold_in as the fixed-buffer loop; the per-segment fp32 accumulation can
    differ in the last ulp (see generate_image_tokens docstring) — token
    equality is asserted in tests/test_generate.py and held 100% on-chip.
    """
    from plangen_tpu.runtime.kvcache import init_segmented_kv_cache

    B2, L, H = cfg_embeds.shape
    S_max = L + num_tokens

    ends, seg_sizes, seg_starts, attn_mask = _growing_layout(
        L, num_tokens, num_phases, attn_mask
    )
    # per-phase decode step counts (step i writes position L + i)
    counts = []
    prev = L
    for e in ends:
        hi = min(e, L + num_tokens)
        counts.append(max(0, hi - prev))
        prev = max(prev, hi)

    cache = init_segmented_kv_cache(
        cfg.llama, B2, seg_sizes, dtype=cfg_embeds.dtype, quantized=quantized_cache
    )
    # prefill writes the prompt into segment 0 (L <= ends[0] by construction)
    last_hidden, cache = prefill(
        params, cfg, cfg_embeds, attn_mask[:, : ends[0]], cache, seg_write=0
    )

    key = rng
    tokens_parts = []
    start = 0
    for p, c in enumerate(counts):
        if c == 0:  # tiny decodes may not reach later segments
            continue
        step = make_step(attn_mask[:, : ends[p]], seg=(p, seg_starts[p]))
        (last_hidden, cache, key), toks = jax.lax.scan(
            step,
            (last_hidden, cache, key),
            start + jnp.arange(c, dtype=jnp.int32),
        )
        tokens_parts.append(toks)
        start += c
    tokens = jnp.concatenate(tokens_parts, axis=0)
    return ImageGenResult(tokens=tokens.T)


def _growing_layout(L, new_tokens, num_phases, attn_mask):
    """Shared segmented-cache geometry for the image AND text decode loops:
    (ends, seg_sizes, seg_starts, attn_mask zero-padded to ends[-1]) — one
    place for the segment math so the two loops cannot drift."""
    ends = growing_segment_ends(L, new_tokens, num_phases)
    total = ends[-1]
    assert total >= L + new_tokens
    if total > attn_mask.shape[1]:
        attn_mask = jnp.concatenate(
            [attn_mask,
             jnp.zeros((attn_mask.shape[0], total - attn_mask.shape[1]),
                       dtype=attn_mask.dtype)],
            axis=1,
        )
    seg_sizes = [ends[0]] + [b - a for a, b in zip(ends, ends[1:])]
    seg_starts = [0] + ends[:-1]
    return ends, seg_sizes, seg_starts, attn_mask


def growing_segment_ends(L: int, num_tokens: int, num_phases: int = 4):
    """Segment END offsets for the growing cache: 128-aligned, ~evenly
    spaced, strictly increasing (duplicates after rounding merge, so the
    effective phase count may be lower). Phase p writes EXACTLY absolute
    positions [ends[p-1], ends[p]) (phase 0 starts at L after prefill), so
    every write lands inside its own segment. The total may exceed
    L + num_tokens by <128 — the extra tail slots are masked off and never
    written. Shared by the image/text decode loops AND bench.py's roofline
    model (so the published %-of-floor columns can't drift from the real
    segmentation)."""
    cap = -(-(L + num_tokens) // 128) * 128
    return sorted(
        {
            min(cap, -(-(L + (p + 1) * num_tokens // num_phases) // 128) * 128)
            for p in range(num_phases)
        }
    )


@partial(
    jax.jit,
    static_argnames=("cfg", "max_new_tokens", "growing_cache", "quantized_cache"),
)
def greedy_decode_text(
    params: Params,
    cfg: PlanGenModelConfig,
    inputs_embeds: jax.Array,  # [B, L, H]
    attn_mask: jax.Array,  # [B, L + max_new_tokens]
    eos_id: jax.Array,  # scalar int32
    max_new_tokens: int = 512,
    growing_cache: bool = False,  # segmented cache (see generate_image_tokens)
    quantized_cache: bool = False,  # int8 KV (the 512-budget path reads the
    # same cache volume per step as the image loop; halving it helps the
    # plan/MMU serving modes the same way)
) -> jax.Array:
    """Greedy KV-cached text decode; rows that hit EOS keep emitting EOS.

    Matches x2t (plangen_base.py:513-523): greedy over lm_head, pad with EOS.
    A `while_loop` exits as soon as EVERY row has emitted EOS — layout plans
    typically finish in tens of tokens, so this skips most of the 512-step
    budget (HF generate stops the same way via its stopping criteria).
    The output buffer is pre-filled with EOS so skipped steps read as padding.

    `growing_cache` decodes over a segmented cache: with the 512-token budget
    the fixed buffer makes EVERY early step read L+512 slots, while typical
    plan outputs finish inside the first 128-aligned segment — which also
    keeps the math bit-identical there (a single segment is plain attention
    over fewer all-masked slots). Early-exit still applies per phase.
    Returns [B, max_new_tokens] int32.
    """
    B, L, H = inputs_embeds.shape

    def make_body(phase_mask, seg=None):
        def body(state):
            i, last_hidden, cache, done, tokens = state
            logits = llama.lm_head(params["language_model"], last_hidden)
            token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            token = jnp.where(done, eos_id, token)
            done = done | (token == eos_id)
            tokens = jax.lax.dynamic_update_slice(tokens, token[:, None], (0, i))
            next_embeds = vlm.embed_text(params, token[:, None]).astype(
                inputs_embeds.dtype
            )
            pos = jnp.array([L], dtype=jnp.int32) + i
            seg_kwargs = {}
            if seg is not None:
                seg_idx, seg_start = seg
                seg_kwargs = dict(seg_write=seg_idx, write_at=pos[0] - seg_start)
            hidden, cache = llama.forward(
                params["language_model"],
                cfg.llama,
                next_embeds,
                phase_mask,
                positions=pos,
                kv_cache=cache,
                **seg_kwargs,
            )
            return (i + 1, hidden[:, -1], cache, done, tokens)

        return body

    tokens0 = jnp.full((B, max_new_tokens), eos_id, dtype=jnp.int32)
    done0 = jnp.zeros((B,), dtype=bool)

    if growing_cache:
        from plangen_tpu.runtime.kvcache import init_segmented_kv_cache

        # growing_cache=True -> 4 phases; an int picks the phase count,
        # matching generate_image_tokens
        num_phases = 4 if growing_cache is True else int(growing_cache)
        ends, seg_sizes, seg_starts, attn_mask = _growing_layout(
            L, max_new_tokens, num_phases, attn_mask
        )
        cache = init_segmented_kv_cache(
            cfg.llama, B, seg_sizes, dtype=inputs_embeds.dtype,
            quantized=quantized_cache,
        )
        last_hidden, cache = prefill(
            params, cfg, inputs_embeds, attn_mask[:, : ends[0]], cache,
            seg_write=0,
        )
        state = (jnp.int32(0), last_hidden, cache, done0, tokens0)
        prev = L
        for p, e in enumerate(ends):
            hi = min(e, L + max_new_tokens)
            bound = hi - L  # step index bound for this phase
            if hi <= prev:
                continue
            prev = hi
            body = make_body(attn_mask[:, :e], seg=(p, seg_starts[p]))

            def cond(state, bound=bound):
                i, _, _, done, _ = state
                return (i < bound) & jnp.logical_not(jnp.all(done))

            state = jax.lax.while_loop(cond, body, state)
        return state[4]

    S_max = L + max_new_tokens
    cache = init_kv_cache(
        cfg.llama, B, S_max, dtype=inputs_embeds.dtype, quantized=quantized_cache
    )
    last_hidden, cache = prefill(params, cfg, inputs_embeds, attn_mask, cache)

    def cond(state):
        i, _, _, done, _ = state
        return (i < max_new_tokens) & jnp.logical_not(jnp.all(done))

    _, _, _, _, tokens = jax.lax.while_loop(
        cond, make_body(attn_mask), (jnp.int32(0), last_hidden, cache, done0, tokens0)
    )
    return tokens
