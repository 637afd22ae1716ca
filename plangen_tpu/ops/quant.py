"""Weight-only int8 quantization for the decode hot path.

The 576-step decode is HBM-bound on weight reads (~3.4 GB bf16 per step for
the 1B model). Storing matmul weights as int8 with per-output-channel fp32
scales halves that traffic; XLA fuses the int8->bf16 convert into the matmul
on TPU. Symmetric per-channel absmax quantization (the standard weight-only
serving scheme). Opt-in: the fp32/bf16 path remains the default and the
training path is untouched.

Quantized leaves are dicts {"w_q8": int8 [..., in, out], "scale": fp32
[..., 1, out]} detected structurally by `qmatmul`.
"""

from __future__ import annotations

from typing import Any, Dict, Union

import jax
import jax.numpy as jnp

QuantWeight = Dict[str, jax.Array]


def quantize_weight(w: jax.Array) -> QuantWeight:
    """Symmetric per-output-channel int8 quantization of [..., in, out]."""
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)  # [..., 1, out]
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"w_q8": q, "scale": scale.astype(jnp.float32)}


def dequantize_weight(q: QuantWeight, dtype=jnp.bfloat16) -> jax.Array:
    return (q["w_q8"].astype(jnp.float32) * q["scale"]).astype(dtype)


def is_quantized(w: Any) -> bool:
    return isinstance(w, dict) and "w_q8" in w


def qmatmul(x: jax.Array, w: Union[jax.Array, QuantWeight]) -> jax.Array:
    """x @ w for plain or quantized weights (dequant fused into the matmul).

    int8 leaves ({"w_q8", "scale"}) use a plain XLA matmul — the int8->bf16
    convert fuses into the operand read. int4 leaves ({"w_p4", ...}) dispatch
    to the Pallas packed-nibble kernel (ops/pallas_int4_matmul.py); stacked
    [L, ...] int4 leaves carry the layer index under "_layer" (attached by
    llama.index_layer_params) so the kernel reads the layer's block straight
    out of the stacked HBM array instead of slicing it (a sliced pallas
    operand would materialize an HBM copy every step).
    """
    if isinstance(w, dict) and "w_p4" in w:
        from plangen_tpu.ops.pallas_int4_matmul import int4_matmul

        return int4_matmul(x, w, layer=w.get("_layer"))
    if not is_quantized(w):
        return x @ w
    out = x @ w["w_q8"].astype(x.dtype)
    # fold the per-channel scale in fp32 (the documented invariant —
    # convert/loading.py keeps scales fp32 through checkpoint loads for
    # exactly this): an earlier .astype(x.dtype) rounded every scale to
    # bf16's 8 mantissa bits, a systematic per-channel multiplicative bias
    # on every int8 projection output. XLA fuses the upcast-multiply-
    # downcast chain into the matmul epilogue.
    return (out.astype(jnp.float32) * w["scale"][..., 0, :]).astype(x.dtype)


_LM_QUANT_KEYS = (
    "q_proj",
    "k_proj",
    "v_proj",
    "o_proj",
    "gate_proj",
    "up_proj",
    "down_proj",
)


def quantize_lm_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize the decode-dominant weights: LM layer matmuls, lm_head, and
    the gen_head classifier. Norms/embeddings stay full precision."""
    return _quantize_lm(params, quantize_weight)


# same-input projection GROUPS packed as ONE int4 leaf: quantizing the
# CONCAT of N same-shape weights leaves per-column absmax scales and codes
# unchanged (columns are independent), and the packed format's
# global-halves nibble pairing is internal to the kernel — the fused
# pallas_call's output is just the N projections concatenated, so outputs
# are bit-identical to the split form while the kernel-call count drops
# from 7 to 4 per decode layer. Measured on the triple/pair
# (tools/bench_int4_fuse.py; BENCH_SWEEP.json "int4_fuse"): qkv 1.07x
# (M=2) / 1.44x (M=64), gate|up 1.07x / 1.46x. Groups are tried in order;
# a group applies only when every member has the same shape, so GQA
# (kv narrower than q) falls through to the k|v pair.
INT4_FUSED_GROUPS = (
    ("q_proj", "k_proj", "v_proj", "qkv_proj"),
    ("k_proj", "v_proj", "k_v_proj"),  # GQA fallback
    ("gate_proj", "up_proj", "gate_up_proj"),
)


def _fuse_plan(layers: Dict[str, Any]) -> Dict[str, Any]:
    """Plan of fused_key -> (source leaf keys,); unfused keys map to
    themselves. First applicable group (all members unconsumed, all shapes
    equal) wins."""
    plan = {}
    consumed = set()
    for grp in INT4_FUSED_GROUPS:
        members, fk = grp[:-1], grp[-1]
        if any(m in consumed or m not in layers for m in members):
            continue
        if len({layers[m].shape for m in members}) == 1:
            plan[fk] = members
            consumed.update(members)
    for k in _LM_QUANT_KEYS:
        if k not in consumed:
            plan[k] = (k,)
    return plan


def fuse_dense_qkv(params: Dict[str, Any]) -> Dict[str, Any]:
    """Concat the DENSE q|k|v (GQA: k|v) projection leaves into the fused
    key models/llama.py::_layer already consumes — one [I, 3H] dot per
    layer instead of three [I, H] dots. Bit-identical outputs (output
    columns are independent and the K-axis accumulation is unchanged);
    measured 1.13x (M=64) / 1.19x (M=128) per layer on the qkv triple,
    while gate|up measured 1.0x and stays split (tools/bench_dense_fuse.py,
    BENCH_SWEEP.json "dense_fuse").

    Load-time DECODE transform (tasks/eval.py build_pipeline): checkpoints,
    the trainer, and TP sharding keep the split layout. Quantized leaves
    (dicts) pass through untouched — the int4 path fuses at quantize time
    instead (INT4_FUSED_GROUPS)."""
    lm = params["language_model"]
    layers = dict(lm["layers"])
    for grp in INT4_FUSED_GROUPS[:2]:  # qkv triple, then the GQA k|v pair
        members, fk = grp[:-1], grp[-1]
        ws = [layers.get(m) for m in members]
        if any(w is None or isinstance(w, dict) for w in ws):
            continue
        if len({w.shape for w in ws}) != 1:
            continue
        for m in members:
            layers.pop(m)
        layers[fk] = jnp.concatenate(ws, axis=-1)
        break
    out = dict(params)
    lm_out = dict(lm)
    lm_out["layers"] = layers
    out["language_model"] = lm_out
    return out


def quantize_lm_params_int4(
    params: Dict[str, Any], act_int8: bool = False
) -> Dict[str, Any]:
    """int4 variant of quantize_lm_params (Pallas kernel serving path).

    Halves decode weight traffic again vs int8. Opt-in like int8; per-output-
    channel scales (the int8 scheme's granularity — coarser than group-wise
    int4, acceptable for the serving path and trivially upgradable).
    `act_int8=True` selects the W4A8 decode kernel (int8 activations +
    s8 x s8 MXU dots, ~10% faster at the layer level; prefill unchanged).
    Same-input projection groups are packed fused (INT4_FUSED_GROUPS)."""
    plan, leaves = _int4_leaves(params)
    q = _quantize_int4_leaves(leaves, act_int8)
    return _stitch_int4(params, plan, q)


def quantize_lm_params_int4_shared(
    params: Dict[str, Any], act_int8: bool = False
) -> Dict[str, Any]:
    """int4-quantize the LM matmul leaves in ONE jitted program and stitch
    them into a tree that SHARES every untouched leaf (vision/VQ/embeds/
    norms/gen_head.fc1) with `params` by reference — the dual-resident
    `generation.quantize="auto"` form (tasks/eval.py). One remote compile
    instead of per-op eager dispatch, no device copies of the shared
    subtrees, and the dense tree stays live for the large-batch route.
    (Numerics may differ from the eager `quantize_lm_params_int4` in scale
    LSBs — XLA reassociates the absmax reductions; both forms are valid
    int4 codes and each path pins its own golden stream.)"""
    plan, leaves = _int4_leaves(params)
    q = jax.jit(lambda t: _quantize_int4_leaves(t, act_int8))(leaves)
    return _stitch_int4(params, plan, q)


def _int4_leaves(params):
    """(fuse plan, {leaf_key: (source weights,)}) for the int4 quantizers —
    the single place that decides WHICH leaves quantize (fused groups per
    INT4_FUSED_GROUPS + lm_head + gen_head.fc2)."""
    lm = params["language_model"]
    plan = _fuse_plan(lm["layers"])
    leaves = {
        fk: tuple(lm["layers"][s] for s in srcs) for fk, srcs in plan.items()
    }
    leaves["lm_head"] = (lm["lm_head"],)
    leaves["gen_head_fc2"] = (params["gen_head"]["fc2"]["w"],)
    return plan, leaves


def _quantize_int4_leaves(leaves, act_int8):
    from plangen_tpu.ops.pallas_int4_matmul import quantize_weight_int4

    return {
        k: quantize_weight_int4(
            vs[0] if len(vs) == 1 else jnp.concatenate(vs, axis=-1),
            act_int8=act_int8,
        )
        for k, vs in leaves.items()
    }


def _stitch_int4(params, plan, q):
    """Rebuild the tree with the quantized leaves from `q` per `plan`;
    every untouched subtree is shared by reference (the counterpart of
    _stitch_lm for the fused-group int4 layout)."""
    out = dict(params)
    lm_out = dict(out["language_model"])
    layers = dict(lm_out["layers"])
    for fk, srcs in plan.items():
        for s in srcs:
            layers.pop(s, None)
        layers[fk] = q[fk]
    lm_out["layers"] = layers
    lm_out["lm_head"] = q["lm_head"]
    out["language_model"] = lm_out
    gen_head = dict(out["gen_head"])
    gen_head["fc2"] = dict(gen_head["fc2"])
    gen_head["fc2"]["w"] = q["gen_head_fc2"]
    out["gen_head"] = gen_head
    return out


def _quantize_lm(params: Dict[str, Any], qfn) -> Dict[str, Any]:
    return _stitch_lm(params, lambda _key, w: qfn(w))


def _stitch_lm(params: Dict[str, Any], pick) -> Dict[str, Any]:
    """Rebuild the tree with `pick(leaf_key, weight)` replacing each decode-
    dominant matmul leaf; every other subtree is shared by reference."""
    out = dict(params)
    lm = dict(out["language_model"])
    layers = dict(lm["layers"])
    for k in _LM_QUANT_KEYS:
        layers[k] = pick(k, layers[k])
    lm["layers"] = layers
    lm["lm_head"] = pick("lm_head", lm["lm_head"])
    out["language_model"] = lm
    gen_head = dict(out["gen_head"])
    gen_head["fc2"] = dict(gen_head["fc2"])
    gen_head["fc2"]["w"] = pick("gen_head_fc2", gen_head["fc2"]["w"])
    out["gen_head"] = gen_head
    return out
