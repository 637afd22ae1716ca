"""Exact matmul-FLOP audit of the REAL train program, from its jaxpr.

The train-budget floors (BENCH_SWEEP train_budget, DESIGN §14) divide each
component's measured ablation delta by a hand-computed peak-flops share.
Hand arithmetic has two failure modes this tool eliminates:

  * the remat factor — whether the backward actually recomputes the
    forward matmuls (4x fwd flops per dot) or not (3x) is a property of
    the traced program, not of the `remat=True` flag (jax.checkpoint
    policies, XLA CSE, and the freeze-aware stop_gradient all move it);
  * attribution boundaries — an ablation delta contains whatever XLA
    dead-codes alongside the component; the jaxpr says exactly which
    dot_general/conv ops exist and at what shapes.

This walks the traced jaxpr of the SAME programs bench_train_budget times
(fwd_only / grad_only / full step, remat on/off/dots), recursively through
scan (x trip count), remat, pjit, cond and custom-vjp bodies, and sums
2*M*N*K per dot_general (and the conv equivalent), bucketed by
(lhs_shape, rhs_shape, dtype). Tracing is host-side only — no TPU, no
remote compile — so this runs in seconds on the 1-core box and the counts
are exact for any backend (XLA fusion changes scheduling, not arithmetic;
only late HLO passes like DotMerger can merge dots, which preserves
totals).

Output: per-bucket flop table + component rollup (qkvo / mlp / heads+embed
/ attention scores / conv towers) + remat factor per component, as JSON.
Env: TRAIN_TEXT_LEN (700), TRAIN_MODE (stage3), shapes env as
tools/bench_train.py, FLOPS_ROWS subset of fwd,grad,grad_nomat,grad_dots.

Reference recipe being audited: cfg/uni/h_text_ump+oimsam.py (stage-3
multi-task, max_seq_len=700) — see SURVEY §6.
"""

from __future__ import annotations

import json
import math
import os
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent))

import jax

jax.config.update("jax_platforms", "cpu")  # trace-only: never touch axon

import jax.numpy as jnp  # noqa: E402

ALL_FLOWS = ((0, "uni"), (1, "mmu"), (2, "plan"))


def _avals(cfg, shapes):
    """params + batches as ShapeDtypeStructs (tracing needs no values —
    jitting vlm.init at 1B size is a minutes-long XLA-CPU compile on the
    1-core box; eval_shape is milliseconds). Batch shapes mirror
    tools/bench_train.build_mode exactly."""
    from plangen_tpu.models import vlm

    uni_bs, mmu_bs, plan_bs, L, *_ = shapes
    n_img, size = cfg.image_seq_len, cfg.vision.image_size
    params = jax.eval_shape(
        lambda k: vlm.init(k, cfg, dtype=jnp.float32), jax.random.PRNGKey(0))
    s = jax.ShapeDtypeStruct
    mmu_len = L + n_img
    batches = {
        0: {"input_ids": s((uni_bs, L), jnp.int32),
            "attn_mask": s((uni_bs, L + n_img), jnp.int32),
            "images": s((uni_bs, size, size, 3), jnp.float32)},
        1: {"input_ids": s((mmu_bs, mmu_len), jnp.int32),
            "attn_mask": s((mmu_bs, mmu_len), jnp.int32),
            "images": s((mmu_bs, size, size, 3), jnp.float32),
            "images_seq_mask": s((mmu_bs, mmu_len), jnp.bool_)},
        2: {"input_ids": s((plan_bs, L), jnp.int32),
            "attn_mask": s((plan_bs, L), jnp.int32)},
    }
    return params, batches


def _dot_flops(eqn):
    """2*M*N*K for a dot_general, from operand shapes + dnums."""
    lhs, rhs = (v.aval for v in eqn.invars[:2])
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    batch = math.prod(lhs.shape[d] for d in lb) if lb else 1
    k = math.prod(lhs.shape[d] for d in lc) if lc else 1
    m = math.prod(
        s for d, s in enumerate(lhs.shape) if d not in set(lc) | set(lb))
    n = math.prod(
        s for d, s in enumerate(rhs.shape) if d not in set(rc) | set(rb))
    return 2 * batch * m * n * k


def _conv_flops(eqn):
    """2 * out_elems * (kernel spatial * in_ch / groups) for a conv."""
    lhs, rhs = (v.aval for v in eqn.invars[:2])
    out = eqn.outvars[0].aval
    groups = eqn.params.get("feature_group_count", 1)
    dn = eqn.params["dimension_numbers"]
    kin = rhs.shape[dn.rhs_spec[1]]  # in-channels per group
    kspatial = math.prod(rhs.shape[d] for d in dn.rhs_spec[2:])
    return 2 * math.prod(out.shape) * kin * kspatial / max(groups, 1)


_SUBJAXPR_KEYS = ("jaxpr", "call_jaxpr", "fun_jaxpr", "cond_jaxpr",
                  "body_jaxpr")


def _walk(jaxpr, mult, buckets):
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            lhs, rhs = (v.aval for v in eqn.invars[:2])
            key = (name, str(lhs.shape), str(rhs.shape), str(lhs.dtype))
            buckets[key][0] += mult
            buckets[key][1] += mult * _dot_flops(eqn)
            continue
        if name == "conv_general_dilated":
            lhs, rhs = (v.aval for v in eqn.invars[:2])
            key = (name, str(lhs.shape), str(rhs.shape), str(lhs.dtype))
            buckets[key][0] += mult
            buckets[key][1] += mult * _conv_flops(eqn)
            continue
        inner_mult = mult
        if name == "scan":
            inner_mult = mult * eqn.params["length"]
        elif name == "while":
            # the train step has no unbounded device loops; a fori_loop
            # lowers to scan when the trip count is static. Flag if seen.
            buckets[("WHILE_LOOP_UNCOUNTED", "", "", "")][0] += 1
        for k, v in eqn.params.items():
            if k in _SUBJAXPR_KEYS and v is not None:
                _walk(getattr(v, "jaxpr", v), inner_mult, buckets)
            elif k == "branches":
                # count the most expensive branch (upper bound; the train
                # step's conds are flow gates that all execute per step
                # via separate calls, not data-dependent skips)
                best, bestf = None, -1
                for br in v:
                    b = defaultdict(lambda: [0, 0])
                    _walk(getattr(br, "jaxpr", br), inner_mult, b)
                    f = sum(x[1] for x in b.values())
                    if f > bestf:
                        best, bestf = b, f
                if best:
                    for kk, (c, f) in best.items():
                        buckets[kk][0] += c
                        buckets[kk][1] += f


def audit(fn, args):
    jaxpr = jax.make_jaxpr(fn)(*args)
    buckets = defaultdict(lambda: [0, 0])
    _walk(jaxpr.jaxpr, 1, buckets)
    return buckets


def classify(key, cfg):
    """Map a shape bucket to a train-step component (1B dims)."""
    prim, lhs, rhs, _ = key
    d, ffn = cfg.llama.hidden_size, cfg.llama.intermediate_size
    vocab = cfg.llama.vocab_size
    if prim == "conv_general_dilated":
        return "conv(vq+siglip)"
    dims = lhs.strip("()").split(",") + rhs.strip("()").split(",")
    dims = sorted(int(x) for x in dims if x.strip())
    big = set(dims)
    if vocab in big or cfg.vq.codebook_size in big:
        return "heads+embed"
    if ffn in big or 2 * ffn in big:
        return "mlp"
    if dims.count(d) >= 2:
        return "qkvo"
    # per-head dots: head_dim x seq (scores / AV / rope-adjacent)
    if cfg.llama.head_dim in big:
        return "attn_scores"
    return "other"


def main():
    from plangen_tpu.config import OptimConfig, PlanGenModelConfig
    from plangen_tpu.train.optim import make_optimizer
    from plangen_tpu.train.step import make_loss_fn

    mode = os.environ.get("TRAIN_MODE", "stage3")
    tiny = os.environ.get("BENCH_TINY") == "1"
    L = int(os.environ.get("TRAIN_TEXT_LEN", "16" if tiny else "700"))
    cfg = PlanGenModelConfig.tiny() if tiny else PlanGenModelConfig()
    shapes = (
        int(os.environ.get("TRAIN_UNI_BS", "3")),
        int(os.environ.get("TRAIN_MMU_BS", "3")),
        int(os.environ.get("TRAIN_PLAN_BS", "2")),
        L, True, os.environ.get("TRAIN_MASTER", "bfloat16"), False, False)

    from plangen_tpu.config import TrainConfig

    params, batches = _avals(cfg, shapes)
    tcfg = TrainConfig(
        optim=OptimConfig(
            optimizer=os.environ.get("TRAIN_OPT", "adafactor")),
        gradient_checkpointing=shapes[4], master_dtype=shapes[5],
        use_flash_attention=shapes[6], fused_lm_ce=shapes[7])
    _, mask = make_optimizer(tcfg.optim, params, mode)

    def loss_of(remat):
        from dataclasses import replace
        if remat == "off":
            t = replace(tcfg, gradient_checkpointing=False)
        elif remat is None:
            t = tcfg
        else:
            t = replace(tcfg, remat_policy=remat)
        return make_loss_fn(cfg, t, 2, ALL_FLOWS, trainable_mask=mask)

    def grad_prog(lf):
        def run(p, b):
            (loss, _), grads = jax.value_and_grad(lf, has_aux=True)(p, b)
            return loss, sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(grads))
        return run

    progs = {
        "fwd": lambda: (lambda p, b: loss_of(None)(p, b)[0]),
        "grad": lambda: grad_prog(loss_of(None)),
        "grad_nomat": lambda: grad_prog(loss_of("off")),  # remat off
        "grad_dots": lambda: grad_prog(loss_of("dots")),
    }
    only = os.environ.get("FLOPS_ROWS")
    if only:
        progs = {k: v for k, v in progs.items() if k in only.split(",")}

    report = {"text_len": L, "mode": mode,
              "bs": [shapes[0], shapes[1], shapes[2]], "rows": {}}
    for name, build in progs.items():
        buckets = audit(build(), (params, batches))
        comp = defaultdict(float)
        table = []
        for key, (count, flops) in sorted(
                buckets.items(), key=lambda kv: -kv[1][1]):
            c = classify(key, cfg)
            comp[c] += flops
            table.append({"prim": key[0], "lhs": key[1], "rhs": key[2],
                          "dtype": key[3], "count": count,
                          "gflops": round(flops / 1e9, 2), "component": c})
        total = sum(comp.values())
        report["rows"][name] = {
            "total_tflops": round(total / 1e12, 3),
            "by_component_tflops": {
                k: round(v / 1e12, 3)
                for k, v in sorted(comp.items(), key=lambda kv: -kv[1])},
            "ms_at_peak_197": {
                k: round(v / 197e9, 1)
                for k, v in sorted(comp.items(), key=lambda kv: -kv[1])},
            "top_buckets": table[:20],
        }
    if "fwd" in report["rows"] and "grad" in report["rows"]:
        f = report["rows"]["fwd"]["by_component_tflops"]
        g = report["rows"]["grad"]["by_component_tflops"]
        report["grad_over_fwd_factor"] = {
            k: round(g[k] / f[k], 2) for k in f if f.get(k) and k in g}
    print(json.dumps(report, indent=1))
    out = os.environ.get("FLOPS_OUT")
    if out:
        Path(out).write_text(json.dumps(report, indent=1))

    # standing artifact: BENCH_SWEEP "train_flops" (exact program flops the
    # train_budget floors divide by; trace-only, no device time)
    sweep = os.environ.get(
        "BENCH_OUT", str(Path(__file__).parent.parent / "BENCH_SWEEP.json"))
    p = Path(sweep)
    if p.exists() and not tiny:
        doc = json.loads(p.read_text())
        slim = {
            "note": ("exact dot_general/conv flops of the traced train "
                     "programs, per component (tools/flops_audit.py); "
                     "ms_at_peak_197 are the de-jure floors the "
                     "train_budget deltas divide by"),
            "text_len": L, "bs": report["bs"],
            "grad_over_fwd_factor": report.get("grad_over_fwd_factor"),
            "rows": {
                n: {k: r[k] for k in
                    ("total_tflops", "by_component_tflops", "ms_at_peak_197")}
                for n, r in report["rows"].items()},
        }
        doc["train_flops"] = slim
        p.write_text(json.dumps(doc, indent=1))


if __name__ == "__main__":
    main()
