"""LLaMA decoder (Janus-Pro-1B language backbone) as pure-functional JAX.

TPU-first re-design of the reference's HF `LlamaForCausalLM`
(instantiated at three_party/Janus/janus/models/modeling_vlm.py:219;
DeepSeek-LLM-1.3B architecture). Parameters are a plain pytree of arrays so
pjit sharding rules can be attached by path; all ops are static-shape and
compile to a single XLA program.

TPU-native structure: the 24 decoder layers are STACKED — every weight is one
array with a leading layer dim [L, ...] and the stack runs as a single
`lax.scan` over layers. One layer's HLO compiles once instead of 24 times
(and once instead of 24*576 times inside the decode scan), keeping compile
times tractable and making sharding rules uniform. The KV cache layout
[L, B, S, Hkv, D] falls out of the layer scan naturally.

Numerics:
  * RMSNorm in fp32 (HF LlamaRMSNorm upcasts), output cast back.
  * RoPE cos/sin computed in fp32 (HF computes rotary in fp32).
  * Attention softmax fp32 (ops.attention).
  * Position ids are ABSOLUTE indices into the padded sequence — HF derives
    them from cache_position (arange over past_len..past_len+q_len), NOT from
    the attention mask, so left-padded rows count pad positions. We match
    that exactly (SURVEY.md §7 "Left-padding + KV cache + RoPE positions").
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from plangen_tpu.config import LlamaConfig
from plangen_tpu.ops.attention import dot_product_attention, make_causal_bias
from plangen_tpu.ops.quant import qmatmul

Params = Dict[str, Any]
KVCache = Dict[str, jax.Array]  # cache dict, see runtime.kvcache layouts


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _dense(key, in_dim, out_dim, dtype) -> jax.Array:
    # stored as [in, out] so apply is x @ w (no transpose in the hot path)
    scale = in_dim ** -0.5
    return (jax.random.normal(key, (in_dim, out_dim)) * scale).astype(dtype)


def _stacked_dense(key, n_layers, in_dim, out_dim, dtype) -> jax.Array:
    scale = in_dim ** -0.5
    return (jax.random.normal(key, (n_layers, in_dim, out_dim)) * scale).astype(dtype)


def init(key: jax.Array, cfg: LlamaConfig, dtype=jnp.bfloat16) -> Params:
    ks = jax.random.split(key, 9)
    L = cfg.num_layers
    h, qd, kvd, i = cfg.hidden_size, cfg.q_dim, cfg.kv_dim, cfg.intermediate_size
    return {
        "embed_tokens": (
            jax.random.normal(ks[0], (cfg.vocab_size, h)) * 0.02
        ).astype(dtype),
        "final_norm": jnp.ones((h,), dtype=dtype),
        "lm_head": _dense(ks[1], h, cfg.vocab_size, dtype),
        # layer-stacked weights: leading dim = layer index
        "layers": {
            "input_norm": jnp.ones((L, h), dtype=dtype),
            "post_attn_norm": jnp.ones((L, h), dtype=dtype),
            "q_proj": _stacked_dense(ks[2], L, h, qd, dtype),
            "k_proj": _stacked_dense(ks[3], L, h, kvd, dtype),
            "v_proj": _stacked_dense(ks[4], L, h, kvd, dtype),
            "o_proj": _stacked_dense(ks[5], L, qd, h, dtype),
            "gate_proj": _stacked_dense(ks[6], L, h, i, dtype),
            "up_proj": _stacked_dense(ks[7], L, h, i, dtype),
            "down_proj": _stacked_dense(ks[8], L, i, h, dtype),
        },
    }


# ---------------------------------------------------------------------------
# ops
# ---------------------------------------------------------------------------


def index_layer_params(layers: Params, l) -> Params:
    """Per-layer view of the stacked layer params for the cached fori_loop.

    Dense / int8 leaves are dynamic-indexed (XLA fuses the slice into the
    consuming matmul, no copy). int4 Pallas leaves are NOT sliced — a sliced
    pallas_call operand would materialize an HBM copy of the layer's weights
    every decode step — instead the stacked arrays pass through with the
    layer index attached for the kernel's scalar-prefetch block indexing.
    """
    out = {}
    for k, v in layers.items():
        if isinstance(v, dict) and "w_p4" in v:
            out[k] = {**v, "_layer": l}
        else:
            out[k] = jax.tree_util.tree_map(
                lambda a: jax.lax.dynamic_index_in_dim(a, l, 0, keepdims=False), v
            )
    return out


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32)).astype(x.dtype)


def rope_cos_sin(
    positions: jax.Array, head_dim: int, theta: float
) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables (fp32) for given absolute positions [Q] -> [Q, D]."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # [Q, D/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # HF half-split layout
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """HF-style rotate_half RoPE. x: [B, Q, H, D]; cos/sin: [Q, D]."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    return (x.astype(jnp.float32) * c + rotated.astype(jnp.float32) * s).astype(x.dtype)


def mlp_block(p: Params, x: jax.Array) -> jax.Array:
    if "gate_up_proj" in p:
        # fused int4 pair: one pallas_call computes both projections from
        # one packed tile (ops/quant.py INT4_FUSED_GROUPS); bit-identical
        # per-column outputs, measured 1.07-1.46x on the pair
        gu = qmatmul(x, p["gate_up_proj"])
        half = gu.shape[-1] // 2
        gate, up = jax.nn.silu(gu[..., :half]), gu[..., half:]
    else:
        gate = jax.nn.silu(qmatmul(x, p["gate_proj"]))
        up = qmatmul(x, p["up_proj"])
    return qmatmul(gate * up, p["down_proj"])


def _lora_delta(lora: Optional[Params], name: str, x: jax.Array) -> jax.Array | float:
    """LoRA low-rank delta `(x @ A @ B) * alpha/r` for projection `name`.

    Reference 'lora' tuning mode wraps q/k/v/o via peft with gaussian-A,
    zero-B init (plangen_base.py:162-173). Returns 0.0 when absent so XLA
    folds it away entirely in the non-LoRA path.
    """
    if lora is None or name not in lora:
        return 0.0
    a, b = lora[name]["a"], lora[name]["b"]
    scale = lora["scaling"]
    return ((x @ a) @ b) * scale


def _layer(
    p: Params,
    cfg: LlamaConfig,
    x: jax.Array,  # [B, Q, H]
    bias: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    cache: Optional[Tuple[Dict[str, jax.Array], jax.Array]],
    # (cache_dict, layer_idx): the FULL stacked cache (runtime.kvcache layout)
    write_at,  # scalar start index for cache writes
    lora: Optional[Params] = None,  # per-layer LoRA slices
    flash_mask: Optional[jax.Array] = None,  # [B, Q] pad mask -> Pallas flash path
    chunked: bool = False,  # decode attention reads only the valid cache prefix
    attn_mask: Optional[jax.Array] = None,  # [B, S_max] (chunked/paged paths)
    paged: bool = False,  # Pallas prefix kernel: DMA only the live cache chunks
    seg_write: Optional[int] = None,  # segmented cache: segment being written
    kv_a8: bool = False,  # s8 x s8 MXU decode attention over the int8 cache
    ablate: frozenset = frozenset(),  # DIAGNOSTIC ONLY (tools/bench_step_budget
    # .py): drop a component from the step so its cost is the measured delta
    # vs the full program. "qkvo" = skip q/k/v/o projections, "attn" = skip
    # the cache READ + softmax (writes kept), "mlp" = skip the MLP block.
    # Ablated programs are numerically meaningless; never set in product paths.
) -> Tuple[jax.Array, Optional[Tuple[jax.Array, jax.Array]]]:
    B, Q, _ = x.shape
    a8 = kv_a8 and Q == 1  # decode steps only: prefill is already MXU-efficient
    xin = rms_norm(x, p["input_norm"], cfg.rms_norm_eps)
    if "qkvo" in ablate:
        # identity projections: the attention read/write traffic survives,
        # the four projection matmuls (and their weight reads) are DCE'd
        assert cfg.q_dim == cfg.hidden_size and cfg.kv_dim == cfg.hidden_size
        q = xin.reshape(B, Q, cfg.num_heads, cfg.head_dim)
        k = xin.reshape(B, Q, cfg.num_kv_heads, cfg.head_dim)
        v = xin.reshape(B, Q, cfg.num_kv_heads, cfg.head_dim)
    else:
        if "qkv_proj" in p:
            # fused int4 triple (ops/quant.py INT4_FUSED_GROUPS, MHA): one
            # pallas_call for all three same-input projections; outputs are
            # bit-identical to the split form. LoRA deltas stay per-proj.
            qkv = qmatmul(xin, p["qkv_proj"])
            qd, kd = cfg.q_dim, cfg.kv_dim
            q_flat = qkv[..., :qd] + _lora_delta(lora, "q_proj", xin)
            k_flat = qkv[..., qd:qd + kd] + _lora_delta(lora, "k_proj", xin)
            v_flat = qkv[..., qd + kd:] + _lora_delta(lora, "v_proj", xin)
        elif "k_v_proj" in p:
            # GQA fallback: q is wider than kv, so only k|v pack together
            q_flat = qmatmul(xin, p["q_proj"]) + _lora_delta(lora, "q_proj", xin)
            kv = qmatmul(xin, p["k_v_proj"])
            kd = kv.shape[-1] // 2
            k_flat = kv[..., :kd] + _lora_delta(lora, "k_proj", xin)
            v_flat = kv[..., kd:] + _lora_delta(lora, "v_proj", xin)
        else:
            q_flat = qmatmul(xin, p["q_proj"]) + _lora_delta(lora, "q_proj", xin)
            k_flat = qmatmul(xin, p["k_proj"]) + _lora_delta(lora, "k_proj", xin)
            v_flat = qmatmul(xin, p["v_proj"]) + _lora_delta(lora, "v_proj", xin)
        q = q_flat.reshape(B, Q, cfg.num_heads, cfg.head_dim)
        k = k_flat.reshape(B, Q, cfg.num_kv_heads, cfg.head_dim)
        v = v_flat.reshape(B, Q, cfg.num_kv_heads, cfg.head_dim)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    if cache is not None:
        # Write ONLY this step's [1, B, Q, Hkv, D] rows into the full stacked
        # cache, then attend over this layer's slice. The caller carries the
        # cache through a fori_loop, so the update lowers to an in-place row
        # write — the cache is never copied (decode is HBM-bound; copying the
        # cache every token would multiply the step's memory traffic).
        cache_dict, layer_idx = cache

        def write(buf, rows, idx5):
            return jax.lax.dynamic_update_slice(
                buf, rows.astype(buf.dtype), idx5
            )

        if "segs" in cache_dict:
            # growing-cache decode: write this step's rows into the (static)
            # active segment, attend over the live segments only. `bias` is a
            # LIST of per-segment biases — its length = live segment count.
            from plangen_tpu.ops.attention import (
                quantize_kv, segmented_decode_attention,
            )

            segs = list(cache_dict["segs"])
            w = dict(segs[seg_write])
            quantized = "k_scale" in w
            if quantized:
                k_q8, k_s, v_q8, v_s = quantize_kv(k, v)
                w["k"] = write(w["k"], k_q8[None], (layer_idx, 0, write_at, 0, 0))
                w["v"] = write(w["v"], v_q8[None], (layer_idx, 0, write_at, 0, 0))
                w["k_scale"] = write(
                    w["k_scale"], k_s[None], (layer_idx, 0, write_at, 0)
                )
                w["v_scale"] = write(
                    w["v_scale"], v_s[None], (layer_idx, 0, write_at, 0)
                )
            else:
                w["k"] = write(w["k"], k[None], (layer_idx, 0, write_at, 0, 0))
                w["v"] = write(w["v"], v[None], (layer_idx, 0, write_at, 0, 0))
            segs[seg_write] = w

            sl = lambda a: jax.lax.dynamic_index_in_dim(
                a, layer_idx, 0, keepdims=False
            )
            live = len(bias)
            seg_kv = []
            for s in segs[:live]:
                if quantized:
                    seg_kv.append(
                        (sl(s["k"]), sl(s["k_scale"]), sl(s["v"]), sl(s["v_scale"]))
                    )
                else:
                    seg_kv.append((sl(s["k"]), sl(s["v"])))
            # fall through to the shared o_proj/MLP tail at the end
            if "attn" in ablate:
                attn = q  # cache reads + softmax DCE'd; writes above survive
            else:
                attn = segmented_decode_attention(
                    q, seg_kv, bias, a8=a8 and quantized
                )
            new_cache = {"segs": segs}
        elif "k_scale" in cache_dict:
            from plangen_tpu.ops.attention import (
                dot_product_attention_q8,
                quantize_kv,
            )

            k_q8, k_s, v_q8, v_s = quantize_kv(k, v)
            cache_dict = {
                "k": write(cache_dict["k"], k_q8[None], (layer_idx, 0, write_at, 0, 0)),
                "v": write(cache_dict["v"], v_q8[None], (layer_idx, 0, write_at, 0, 0)),
                "k_scale": write(
                    cache_dict["k_scale"], k_s[None], (layer_idx, 0, write_at, 0)
                ),
                "v_scale": write(
                    cache_dict["v_scale"], v_s[None], (layer_idx, 0, write_at, 0)
                ),
            }
            sl = lambda a: jax.lax.dynamic_index_in_dim(a, layer_idx, 0, keepdims=False)
            if "attn" in ablate:
                attn = q
            else:
                attn = dot_product_attention_q8(
                    q,
                    sl(cache_dict["k"]),
                    sl(cache_dict["k_scale"]),
                    sl(cache_dict["v"]),
                    sl(cache_dict["v_scale"]),
                    bias=bias,
                    a8=a8,
                )
            new_cache = cache_dict
        else:
            cache_dict = {
                "k": write(cache_dict["k"], k[None], (layer_idx, 0, write_at, 0, 0)),
                "v": write(cache_dict["v"], v[None], (layer_idx, 0, write_at, 0, 0)),
            }
            if not (paged and Q == 1):
                k_full = jax.lax.dynamic_index_in_dim(
                    cache_dict["k"], layer_idx, 0, keepdims=False
                )
                v_full = jax.lax.dynamic_index_in_dim(
                    cache_dict["v"], layer_idx, 0, keepdims=False
                )
            if paged and Q == 1:
                if paged == "v3":  # row-batched double-buffered DMA kernel
                    from plangen_tpu.ops.pallas_decode_attention_v3 import (
                        prefix_decode_attention_v3 as _prefix_attn,
                    )
                else:  # v2: per-row grid
                    from plangen_tpu.ops.pallas_decode_attention import (
                        prefix_decode_attention as _prefix_attn,
                    )

                attn = _prefix_attn(
                    q,
                    cache_dict["k"],
                    cache_dict["v"],
                    attn_mask,
                    layer_idx,
                    write_at,
                )
            elif chunked and Q == 1:
                from plangen_tpu.ops.attention import chunked_decode_attention

                attn = chunked_decode_attention(
                    q, k_full, v_full, attn_mask, write_at
                )
            elif "attn" in ablate:
                attn = q
            else:
                attn = dot_product_attention(q, k_full, v_full, bias=bias)
            new_cache = cache_dict
    elif "attn" in ablate:
        # no-cache (training) ablation: q keeps the qkv projections live
        # and the data dependence on k/v is kept by a cheap per-row sum so
        # XLA can't dead-code the kv projections either
        attn = q + (jnp.sum(k, axis=2, keepdims=True)
                    + jnp.sum(v, axis=2, keepdims=True)) * 1e-30
        new_cache = None
    elif flash_mask is not None:
        from plangen_tpu.ops.pallas_attention import flash_attention

        attn = flash_attention(q, k, v, flash_mask, True, None)
        new_cache = None
    else:
        attn = dot_product_attention(q, k, v, bias=bias)
        new_cache = None

    attn = attn.reshape(B, Q, cfg.q_dim)
    if "qkvo" in ablate:
        x = x + attn
    else:
        x = x + qmatmul(attn, p["o_proj"]) + _lora_delta(lora, "o_proj", attn)
    if "mlp" not in ablate:
        x = x + mlp_block(p, rms_norm(x, p["post_attn_norm"], cfg.rms_norm_eps))
    return x, new_cache


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def embed(params: Params, ids: jax.Array) -> jax.Array:
    return jnp.take(params["embed_tokens"], ids, axis=0)


def lm_head(params: Params, hidden: jax.Array) -> jax.Array:
    """LM logits in fp32 (reference loss upcasts: src/utils/causal_loss.py:16)."""
    return qmatmul(hidden, params["lm_head"]).astype(jnp.float32)


def forward(
    params: Params,
    cfg: LlamaConfig,
    inputs_embeds: jax.Array,  # [B, Q, H]
    attn_mask: jax.Array,  # [B, Q] pad mask (no-cache) or [B, S_max] (cache)
    positions: Optional[jax.Array] = None,  # [Q] absolute query positions
    kv_cache: Optional[KVCache] = None,  # cache dict (see runtime.kvcache)
    write_at=None,  # scalar cache write offset (== positions[0])
    remat=False,  # bool | policy str ("full"/"dots"/...): rematerialize each
    # layer in the backward (training memory saver; ops/remat.py)
    use_flash: bool = False,  # Pallas flash attention for the no-cache path
    chunked: bool = False,  # cached decode reads only the valid cache prefix
    paged: bool = False,  # Pallas prefix-DMA decode attention
    kv_a8: bool = False,  # s8 x s8 MXU dots in decode-step attention over the
    # int8 KV cache (quantized query/probability rows; opt-in, see
    # ops.attention.dot_product_attention_q8)
    seg_write: Optional[int] = None,  # segmented cache: active segment (static);
    # requires explicit `write_at` = offset WITHIN that segment
    layers_limit: Optional[int] = None,  # early exit after the first K layers
    # (self-speculative drafting, runtime/speculative.py); final norm still
    # applies, cache rows are written for layers [0, K) only
    ablate: frozenset = frozenset(),  # diagnostic component ablation
    # (see _layer; decode — tools/bench_step_budget.py — and the no-cache
    # training path's "attn" — tools/bench_train_budget.py)
) -> Tuple[jax.Array, Optional[KVCache]]:
    """Run the decoder stack (final RMSNorm applied, no head).

    Without a cache (training / full-seq forward): causal + pad bias over the
    Q x Q sequence, returns (hidden [B, Q, H], None).

    With a cache: the query block [write_at, write_at+Q) is written into the
    cache, attention runs over the full S_max cache with positions masked by
    `attn_mask` and causality, and the UPDATED cache is returned. This makes
    both prefill (Q = prompt length) and decode (Q = 1) the same code path —
    one jitted program each.

    The layer stack runs as a single `lax.scan` over the stacked layer params.
    """
    B, Q, _ = inputs_embeds.shape
    if layers_limit is not None and not 1 <= layers_limit <= cfg.num_layers:
        # a falsy-zero `or` fallback here once made layers_limit=0 silently
        # run the FULL stack (a "0-layer draft" doing a second full-model
        # pass per speculative round) — validate instead
        raise ValueError(
            f"layers_limit must be in [1, {cfg.num_layers}], got "
            f"{layers_limit}"
        )
    if positions is None:
        positions = jnp.arange(Q, dtype=jnp.int32)
    if kv_cache is not None and "segs" in kv_cache:
        # segmented (growing) cache: one bias per LIVE segment, with each
        # segment's absolute slot offset baked in statically
        assert seg_write is not None and write_at is not None
        sizes = [s["k"].shape[2] for s in kv_cache["segs"]]
        bias = []
        off = 0
        for s in sizes[: seg_write + 1]:
            bias.append(
                make_causal_bias(
                    attn_mask[:, off : off + s],
                    positions,
                    off + jnp.arange(s, dtype=jnp.int32),
                )
            )
            off += s
    else:
        if kv_cache is None:
            kv_positions = positions
        else:
            kv_positions = jnp.arange(kv_cache["k"].shape[2], dtype=jnp.int32)
            if write_at is None:
                write_at = positions[0]
        bias = make_causal_bias(attn_mask, positions, kv_positions)
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)

    layers = params["layers"]
    lora_all = params.get("lora")
    lora_xs = None
    lora_scale = None
    if lora_all is not None:
        lora_xs = {k: v for k, v in lora_all.items() if k != "scaling"}
        lora_scale = lora_all["scaling"]

    def with_scale(lora_slice):
        if lora_slice is None:
            return None
        return {**lora_slice, "scaling": lora_scale}

    if kv_cache is None:
        # flash path requires 128 head_dim + arange positions; the kernel
        # right-pads non-128-aligned seqs internally (recipe lengths like
        # 700 / 700+576=1276 are NOT aligned — ops/pallas_attention.py)
        flash_ok = (
            use_flash
            and cfg.head_dim == 128
            and attn_mask.shape[1] == Q
        )
        flash_mask = attn_mask if flash_ok else None

        def body(x, scanned):
            layer_p, lora_slice = scanned
            x, _ = _layer(
                layer_p, cfg, x, bias, cos, sin, None, write_at,
                lora=with_scale(lora_slice), flash_mask=flash_mask,
                ablate=ablate,
            )
            return x, None

        from plangen_tpu.ops.remat import wrap_remat

        body = wrap_remat(body, remat)
        x, _ = jax.lax.scan(body, inputs_embeds, (layers, lora_xs))
        out_cache = None
    else:
        # fori_loop with the FULL stacked cache in the carry: each layer's
        # update is an in-place row write on the carried buffer, instead of
        # the scan xs->ys pattern which materializes a fresh cache copy per
        # step (measured 3x decode slowdown at batch 16).
        def body(l, carry):
            x, cache = carry
            layer_p = index_layer_params(layers, l)
            lora_slice = (
                None
                if lora_xs is None
                else jax.tree_util.tree_map(
                    lambda a: jax.lax.dynamic_index_in_dim(a, l, 0, keepdims=False),
                    lora_xs,
                )
            )
            x, cache = _layer(
                layer_p, cfg, x, bias, cos, sin, (cache, l), write_at,
                lora=with_scale(lora_slice), chunked=chunked,
                attn_mask=attn_mask, paged=paged, seg_write=seg_write,
                kv_a8=kv_a8, ablate=ablate,
            )
            return x, cache

        n_layers = cfg.num_layers if layers_limit is None else layers_limit
        x, out_cache = jax.lax.fori_loop(
            0, n_layers, body, (inputs_embeds, kv_cache)
        )

    hidden = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    return hidden, out_cache
