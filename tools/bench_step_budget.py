"""Per-component decode-step time budget (the roofline-residual attribution).

BENCH_SWEEP.json's pct_of_hbm_floor columns show the quantized decode configs
well above their byte floors (int8_kv B=64 at 66%, int4 at 43-52% in round 3)
with no decomposition of WHERE the residual goes. This tool measures it by
ABLATION of the real program: the full `generate_image_tokens` graph is
re-jitted with one component dropped (the `ablate` static arg threads through
runtime/generate.py -> models/llama.py), and the component's cost is the
delta vs the full program:

    head  = gen_head + CFG combine + categorical sampling  (t_full - t_nohead)
    attn  = KV cache read + fp32 softmax + PV              (t_full - t_noattn)
    mats  = q/k/v/o + MLP matmuls incl. (de)quant handling (t_full - t_nomats)
    base  = everything else: loop/embeds/norms/RoPE/cache writes (t_base)

Each measured cost is put against its own floor:

    * byte floor      component HBM bytes / 819 GB/s (DESIGN.md §1)
    * element bound   for attention: KV elements / 356e9 elem/s — the MEASURED
      MXU stream rate at the M=1 decode-attention shape (bench_mxu_stream.py:
      bf16 712 GB/s = at read floor; int8 streams elements at ~the same rate,
      so an int8 cache's reachable bound is elements, not bytes)

Ablation changes what XLA can fuse, so the deltas are attribution-grade, not
exact accounting; the `sum_check` column (full vs base + sum of deltas) shows
the interaction term. Single-call timing is fine here (per-call tunnel
overhead ~40 ms vs 3-10 s programs, <1.5%).

Writes the table to BENCH_SWEEP.json under "step_budget" (read-merge-write,
one row checkpointed at a time) and prints rows as they land.

Env: BUDGET_CONFIGS="int8_kv:64,int4:32,..." (config:batch pairs; default
covers the round-3 flagged configs), BENCH_PROMPT_LEN, BENCH_REPEATS.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import bench  # repo-root bench.py: param init + roofline helpers

# measured MXU element stream rate at the M=1 decode-attention shape
# (tools/bench_mxu_stream.py bmm_bf16: 712 GB/s bf16 = 356e9 elements/s;
# bmm_s8 streamed elements only 11% faster — the element-rate ceiling)
ATTN_ELEM_RATE = 356e9
HBM_GBPS = float(os.environ.get("BENCH_HBM_GBPS", "819")) * 1e9

VARIANTS = {
    "full": (),
    "nohead": ("head",),
    "noattn": ("attn",),
    "nomats": ("mlp", "qkvo"),
    "base": ("head", "attn", "mlp", "qkvo"),
}


def _component_floors(cfg, B, wmode, kv_int8, L):
    """Byte floors per ablatable component (s/step), DESIGN.md §1 model."""
    lm = cfg.llama
    h, qd, kvd, inter = lm.hidden_size, lm.q_dim, lm.kv_dim, lm.intermediate_size
    wbytes = {"bf16": 2.0, "int8": 1.0, "int4": 0.5, "int4_a8": 0.5}[wmode]
    qkvo = lm.num_layers * (h * qd + 2 * h * kvd + qd * h) * wbytes
    mlp = lm.num_layers * 3 * h * inter * wbytes
    # gen_head: fc1 stays bf16 in every quant mode; fc2 follows the weight mode
    head = (h * cfg.image_token_embed) * 2.0 + (
        cfg.image_token_embed * cfg.image_token_size
    ) * wbytes
    live = bench._growing_avg_live(L, cfg.image_seq_len)
    kv_elems = 2 * lm.num_layers * (2 * B) * live * lm.num_kv_heads * lm.head_dim
    kv_bytes = kv_elems * ((1.0 + 4.0 / lm.head_dim) if kv_int8 else 2.0)
    return {
        "mats_byte_floor": (qkvo + mlp) / HBM_GBPS,
        "head_byte_floor": head / HBM_GBPS,
        "attn_byte_floor": kv_bytes / HBM_GBPS,
        "attn_elem_bound": kv_elems / ATTN_ELEM_RATE,
    }


def main() -> None:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from plangen_tpu.config import PlanGenModelConfig
    from plangen_tpu.runtime.generate import generate_image_tokens

    L = int(os.environ.get("BENCH_PROMPT_LEN", "64"))
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    spec = os.environ.get(
        "BUDGET_CONFIGS",
        "bf16:32,int8_kv:32,int8_kv:64,int8_w_kv:32,int8_w_kv:64,int4:32,int4:64",
    )
    wanted = []
    for item in spec.split(","):
        name, b = item.strip().split(":")
        wanted.append((name, int(b)))

    cfg = PlanGenModelConfig()
    n_img = cfg.image_seq_len
    key = jax.random.PRNGKey(0)
    by_name = {name: (wm, kv) for name, wm, kv in bench.SWEEP_CONFIGS}
    out_path = Path(__file__).parent.parent / "BENCH_SWEEP.json"
    rows = []

    params = None
    params_mode = object()
    for name, B in wanted:
        wmode, kv_int8 = by_name[name]
        if wmode != params_mode:  # value compare — identity only worked
            # because by_name returns interned SWEEP_CONFIGS tuples
            params = bench._init_quantized_params(cfg, key, wmode)
            params_mode = wmode
        embeds = jax.random.normal(
            jax.random.PRNGKey(1), (2 * B, L, cfg.llama.hidden_size),
            dtype=jnp.bfloat16,
        )
        mask = jnp.ones((2 * B, L + n_img), dtype=jnp.int32)

        row = {"config": name, "batch": B}
        times = {}
        only = os.environ.get("BUDGET_VARIANTS")
        variants = {
            v: a for v, a in VARIANTS.items()
            if only is None or v in only.split(",")
        }
        if "full" not in variants:
            # every published field is a delta vs the full program — a
            # subset without it would burn minutes of remote compile per
            # variant and then write NOTHING
            variants = {"full": VARIANTS["full"], **variants}
        for vname, abl in variants.items():
            def run(seed):
                out = generate_image_tokens(
                    params, cfg, embeds, mask,
                    rng=jax.random.PRNGKey(seed),
                    cfg_weight=jnp.float32(5.0),
                    temperature=jnp.float32(1.0),
                    num_tokens=n_img,
                    quantized_cache=kv_int8,
                    growing_cache=True,
                    ablate=abl,
                )
                return np.asarray(out.tokens)

            try:
                t0 = time.perf_counter()
                run(0)
                compile_s = time.perf_counter() - t0
            except Exception as e:
                row[f"{vname}_error"] = type(e).__name__
                sys.stderr.write(f"{name} B={B} {vname}: {type(e).__name__}\n")
                continue
            best, _ = bench._best(run, repeats)
            times[vname] = best / n_img
            sys.stderr.write(
                f"{name} B={B} {vname}: {times[vname]*1e3:.3f} ms/step "
                f"(compile {compile_s:.0f}s)\n"
            )

        if "full" in times:
            row["full_ms"] = round(times["full"] * 1e3, 3)
            comp = {}
            for cname, vname in (
                ("head", "nohead"), ("attn", "noattn"), ("mats", "nomats"),
            ):
                if vname in times:
                    comp[cname] = times["full"] - times[vname]
                    row[f"{cname}_ms"] = round(comp[cname] * 1e3, 3)
            if "base" in times:
                row["base_ms"] = round(times["base"] * 1e3, 3)
            floors = _component_floors(cfg, B, wmode or "bf16", kv_int8, L)
            for k, v in floors.items():
                row[k.replace("floor", "floor_ms").replace("bound", "bound_ms")] \
                    = round(v * 1e3, 3)
            if "attn" in comp and comp["attn"] > 0:
                row["attn_pct_of_elem_bound"] = round(
                    100.0 * floors["attn_elem_bound"] / comp["attn"], 1
                )
            if "mats" in comp and comp["mats"] > 0:
                row["mats_pct_of_byte_floor"] = round(
                    100.0 * floors["mats_byte_floor"] / comp["mats"], 1
                )
        rows.append(row)
        print(json.dumps(row), flush=True)
        # read-MERGE-write per (config, batch): a BUDGET_VARIANTS subset run
        # (e.g. "full,nohead,base" after an ablation-graph fix) updates only
        # its measured fields, keeping same-day deltas for the rest
        doc = json.loads(out_path.read_text()) if out_path.exists() else {}
        old_rows = doc.get("step_budget", {}).get("rows", [])
        by_key = {(r["config"], r["batch"]): dict(r) for r in old_rows}
        for r in rows:
            merged = by_key.setdefault((r["config"], r["batch"]), {})
            # a successful re-measurement supersedes its variant's stale
            # error marker (and vice versa): drop the counterpart key so a
            # row never reports a component as both failed and measured
            for cname, vname in (("head", "nohead"), ("attn", "noattn"),
                                 ("mats", "nomats"), ("base", "base"),
                                 ("full", "full")):
                if f"{cname}_ms" in r:
                    merged.pop(f"{vname}_error", None)
                if f"{vname}_error" in r:
                    merged.pop(f"{cname}_ms", None)
            merged.update(r)
            parts = [merged.get(k) for k in
                     ("head_ms", "attn_ms", "mats_ms", "base_ms")]
            if all(isinstance(p, (int, float)) for p in parts):
                merged["sum_check_ms"] = round(sum(parts), 3)
        doc["step_budget"] = {
            "note": (
                "per-component decode-step budget by ablation of the real "
                "program (tools/bench_step_budget.py); *_ms costs are deltas "
                "vs the full program (head = gen_head+CFG+sampling, attn = "
                "cache read+softmax+PV, mats = q/k/v/o+MLP weights), base_ms "
                "is the all-ablated program (loop/embeds/norms/cache writes), "
                "sum_check vs full_ms shows the fusion interaction term; "
                "attn_elem_bound is the measured MXU M=1 stream rate (356e9 "
                "elem/s), byte floors are DESIGN.md section 1"
            ),
            "prompt_len": L,
            "rows": sorted(
                by_key.values(), key=lambda r: (r["config"], r["batch"])
            ),
        }
        out_path.write_text(json.dumps(doc, indent=1))

    print(json.dumps({"budget_rows": len(rows), "out": str(out_path)}))


if __name__ == "__main__":
    main()
