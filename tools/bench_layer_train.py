"""One REAL decoder layer at recipe training shape, isolated: localizes the
qkvo budget residual (DESIGN §14) to inside-the-layer vs the step wrapper.

The T=700 train budget leaves one number unexplained: the qkvo ablation
delta (247.2 ms = 10.30 ms/layer) runs at 63% of the isolated matmul-chain
ceiling (tools/bench_train_mats.py: 186 TFLOPs -> 6.56 ms/layer at the
program's exact 4x-fwd remat flops). Candidates for the residual: (a) the
layer's own structure — fusion boundaries against rms_norm/rope/attention,
fp32<->bf16 casts, the bwd cotangent path — or (b) the step wrapper — the
24-layer lax.scan with stacked [L,...] dW stacking, the 3-flow step, the
optimizer donation. This probe runs llama.forward with num_layers=1 at the
exact uni-flow shape (B=3, S=1276), fwd and fwd+bwd (value_and_grad wrt
params AND x, per-layer jax.checkpoint like training), with the SAME
ablate hooks the in-model budget used — so `full - ablate_qkvo` here is
the layer-local qkvo cost with no wrapper.

Reading: isolated delta ~= in-model 10.30 ms/layer  -> residual lives in
the layer (XLA's fused fwd+bwd at these shapes IS the ceiling; document
and close). isolated delta ~= chain 6.56 ms/layer -> residual lives in
the scan/flow wrapper (investigate dW stacking / flow batching next).

The grad consumer is sum-of-squares over every grad leaf (a plain sum
folds dW=x^T g into rowsum(x)@rowsum(g) and dead-codes the dW matmuls —
measured in bench_train_mats; squares can't fold). That consumer reads
~206 MB/iter fp32 = ~0.25 ms — identical across variants, subtracted by
every delta. Differential timing (bench_mxu_stream pattern): the axon
tunnel's ~40 ms/call swamps absolute small-program times.

Writes BENCH_SWEEP.json "layer_train". Env: LAYER_B (3), LAYER_S (1276),
LAYER_ITERS "4,12", LAYER_ONLY row subset, LAYER_REMAT (1).
"""

from __future__ import annotations

import json
import os
import sys
import time
from dataclasses import replace
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass

from plangen_tpu.config import PlanGenModelConfig
from plangen_tpu.models import llama


def main():
    B = int(os.environ.get("LAYER_B", "3"))
    S = int(os.environ.get("LAYER_S", "1276"))
    n1, n2 = (int(x) for x in os.environ.get("LAYER_ITERS", "4,12").split(","))
    remat_env = os.environ.get("LAYER_REMAT", "1")
    # "0"/"1" -> bool; anything else is an ops/remat.py policy name
    remat = {"0": False, "1": True}.get(remat_env, remat_env)
    only = os.environ.get("LAYER_ONLY")
    out_path = Path(os.environ.get(
        "BENCH_OUT", Path(__file__).parent.parent / "BENCH_SWEEP.json"))

    cfg = replace(PlanGenModelConfig().llama, num_layers=1)
    params = jax.jit(lambda k: llama.init(k, cfg, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(0))
    x0 = jax.random.normal(
        jax.random.PRNGKey(1), (B, S, cfg.hidden_size), dtype=jnp.bfloat16)
    mask = jnp.ones((B, S), dtype=jnp.int32)

    def layer_loss(p, x, ablate):
        h, _ = llama.forward(p, cfg, x, mask, remat=remat,
                             ablate=frozenset(ablate))
        return jnp.sum(jnp.square(h.astype(jnp.float32))), h

    def fwd_loop(ablate):
        def run(p, x, n):
            def body(i, x):
                _, h = layer_loss(p, x, ablate)
                # chain through the output; *0.5 bounds growth of the
                # residual stream (the layer's rms_norm renormalizes its
                # own input, so only the raw residual accumulates)
                return (h * 0.5).astype(x.dtype)
            xn = jax.lax.fori_loop(0, n, body, x)
            return jnp.sum(jnp.square(xn.astype(jnp.float32)))
        return run

    def fwd_bwd_loop(ablate):
        def run(p, x, n):
            def body(i, carry):
                x, acc = carry
                (val, h), grads = jax.value_and_grad(
                    lambda pp, xx: layer_loss(pp, xx, ablate),
                    argnums=(0, 1), has_aux=True)(p, x)
                gp, gx = grads
                acc = acc + sum(
                    jnp.sum(jnp.square(g))
                    for g in jax.tree_util.tree_leaves(gp))
                acc = acc + jnp.sum(jnp.square(gx)) + val * 0.0
                return (h * 0.5).astype(x.dtype), acc
            xn, acc = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0.0)))
            return jnp.sum(jnp.square(xn.astype(jnp.float32))) + acc
        return run

    variants = {}
    for aname, ab in (("full", ()), ("no_qkvo", ("qkvo",)),
                      ("no_mlp", ("mlp",)), ("no_attn", ("attn",)),
                      # bracketing pairs: qkvo_only - norms_only = the
                      # qkvo matmuls with ONLY norms/rope/residual around
                      # them (no attention/mlp co-scheduling). If that
                      # matches the bare chain, the residual is
                      # co-scheduling; if it stays at the full-layer rate,
                      # it's the norm/rope/cast boundaries.
                      ("qkvo_only", ("attn", "mlp")),
                      ("norms_only", ("qkvo", "attn", "mlp"))):
        variants[f"fwd_{aname}"] = fwd_loop(ab)
        variants[f"fwd_bwd_{aname}"] = fwd_bwd_loop(ab)
    if only:
        variants = {k: v for k, v in variants.items()
                    if k in only.split(",")}

    rows = []
    for name, fn in variants.items():
        f = jax.jit(fn, static_argnums=())

        def run(n):
            np.asarray(f(params, x0, n))

        t0 = time.time()
        try:
            run(n1)
        except Exception as e:
            rows.append({"name": name, "B": B, "S": S, "remat": remat,
                         "error": type(e).__name__,
                         "error_note": str(e)[:200]})
            print(json.dumps(rows[-1]), flush=True)
            continue
        compile_s = time.time() - t0

        def t(n):
            best = 1e9
            for _ in range(5):
                t0 = time.time()
                run(n)
                best = min(best, time.time() - t0)
            return best

        per_iter = (t(n2) - t(n1)) / (n2 - n1)
        row = {"name": name, "B": B, "S": S, "remat": remat,
               "ms_per_iter": round(per_iter * 1e3, 3),
               "compile_s": round(compile_s, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    doc = json.loads(out_path.read_text()) if out_path.exists() else {}
    key_of = lambda r: (r["name"], r["B"], r["S"], r.get("remat", True))
    old = {key_of(r): r for r in doc.get("layer_train", {}).get("rows", [])}
    for r in rows:
        old[key_of(r)] = r
    merged = sorted(old.values(), key=lambda r: (r["name"], r["B"], r["S"]))
    derived = {}
    regimes = {r.get("remat", True) for r in merged}
    for rm in sorted(regimes, key=str):
        ms = {r["name"]: r["ms_per_iter"] for r in merged
              if "ms_per_iter" in r and r["B"] == B and r["S"] == S
              and r.get("remat", True) == rm}
        suf = ("" if rm is True
               else "_noremat" if rm is False else f"_{rm}")
        for comp in ("qkvo", "mlp", "attn"):
            for d in ("fwd", "fwd_bwd"):
                a, b = f"{d}_full", f"{d}_no_{comp}"
                if a in ms and b in ms:
                    derived[f"{d}_{comp}_ms{suf}"] = round(ms[a] - ms[b], 3)
        for d in ("fwd", "fwd_bwd"):
            a, b = f"{d}_qkvo_only", f"{d}_norms_only"
            if a in ms and b in ms:
                derived[f"{d}_qkvo_in_context_ms{suf}"] = round(
                    ms[a] - ms[b], 3)
        a, b = "fwd_bwd_full", "fwd_full"
        if a in ms and b in ms:
            derived[f"bwd_only_ms{suf}"] = round(ms[a] - ms[b], 3)
    doc["layer_train"] = {
        "note": ("ONE production decoder layer (llama.forward, num_layers=1)"
                 " at recipe training shape, isolated + component-ablated:"
                 " per-layer deltas with no scan/flow wrapper"
                 " (tools/bench_layer_train.py; differential, grad consumer"
                 " identical across variants)"),
        "rows": merged,
        "derived": derived,
    }
    out_path.write_text(json.dumps(doc, indent=1))
    print(json.dumps({"derived": derived}), flush=True)


if __name__ == "__main__":
    main()
