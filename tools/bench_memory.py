"""Measured device-memory bytes for every fits/OOM claim in the repo.

Round-4 verdict: `device_mem_gb: 0.0` everywhere (`memory_stats()` returns
`{}` on axon) left the repo's memory claims — AdamW-stage3 OOM, decode
B=96 OOM, 7B bf16 dual-residency rejection, int4 tree ~0.7 GB — as error
strings and prose. `compiled.memory_analysis()` works on the axon plugin
at COMPILE time (verified: returns real CompiledMemoryStats), so each
claim becomes a bytes number without executing anything.

Writes BENCH_SWEEP.json under "memory": one row per program with the
argument/output/temp/total GB breakdown and `fits_16gb` (v5e HBM), plus
analytic parameter-tree sizes per quantization config. Read-merge-write
by row name, like every other sweep section.

Env: BENCH_MEM_ONLY="name1,name2" compiles a subset (each row is minutes
of remote compile on axon); BENCH_PROMPT_LEN as elsewhere.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent))

import bench  # repo-root bench.py: param init helpers

V5E_HBM_GB = 16.0


def _decode_program(cfg, params, B, kv_int8, L):
    import jax
    import jax.numpy as jnp

    from plangen_tpu.runtime.generate import generate_image_tokens

    embeds = jax.random.normal(
        jax.random.PRNGKey(1), (2 * B, L, cfg.llama.hidden_size),
        dtype=jnp.bfloat16,
    )
    mask = jnp.ones((2 * B, L + cfg.image_seq_len), dtype=jnp.int32)
    return generate_image_tokens.lower(
        params, cfg, embeds, mask,
        rng=jax.random.PRNGKey(0),
        cfg_weight=jnp.float32(5.0),
        temperature=jnp.float32(1.0),
        num_tokens=cfg.image_seq_len,
        quantized_cache=kv_int8,
        growing_cache=True,
    )


def _tree_gb(params) -> float:
    import jax

    return round(
        sum(x.size * x.dtype.itemsize
            for x in jax.tree_util.tree_leaves(params)) / 2**30, 3)


def row_specs():
    """name -> builder returning (lowered, extra_fields). Lazily built so a
    BENCH_MEM_ONLY subset pays only its own param init."""
    import jax

    from plangen_tpu.config import PlanGenModelConfig

    key = jax.random.PRNGKey(0)

    def decode(model, wmode, kv_int8, B, claim):
        def build():
            cfg = (PlanGenModelConfig.janus_pro_7b() if model == "7b"
                   else PlanGenModelConfig())
            params = bench._init_quantized_params(cfg, key, wmode)
            extra = {"claim": claim, "params_tree_gb": _tree_gb(params)}
            L = int(os.environ.get("BENCH_PROMPT_LEN", "64"))
            return _decode_program(cfg, params, B, kv_int8, L), extra
        return build

    def train(mode, opt, master, claim):
        def build():
            os.environ["TRAIN_OPT"] = opt
            import bench_train

            cfg = PlanGenModelConfig()
            shapes = (3, 3, 2, 128, True, master, False, False)
            step, state, batches, _ = bench_train.build_mode(
                mode, cfg, shapes)
            extra = {"claim": claim, "state_gb": _tree_gb(state.params)}
            return step.lower(state, batches), extra
        return build

    return {
        # decode claims (README perf table / DESIGN §6)
        "decode_bf16_b32": decode(
            "1b", None, False, 32, "committed bf16 headline row"),
        "decode_int8kv_b64": decode(
            "1b", None, True, 64, "best config (4278 tok/s) fits"),
        "decode_int8kv_b96": decode(
            "1b", None, True, 96, "B=96 OOMs on 16 GB (measured peak here)"),
        "decode_7b_bf16_b1": decode(
            "7b", None, True, 1,
            "7B bf16 rejected: weights ~14 GiB leave no headroom"),
        "decode_7b_int4_b1": decode(
            "7b", "int4", True, 1, "7B serves on one chip with int4"),
        # train claims (DESIGN §6)
        "train_stage3_adamw_fp32": train(
            "stage3", "adamw", "float32",
            "AdamW stage3 fp32 masters OOM on one 16 GB chip"),
        "train_stage3_adafactor_bf16": train(
            "stage3", "adafactor", "bfloat16",
            "adafactor stage3 fits one chip (524 ms/step)"),
    }


def main() -> None:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    from plangen_tpu.utils.memory import analyze_compiled

    only = os.environ.get("BENCH_MEM_ONLY")
    only_set = set(only.split(",")) if only else None
    specs = row_specs()
    out_path = Path(__file__).parent.parent / "BENCH_SWEEP.json"
    rows = []

    for name, build in specs.items():
        if only_set is not None and name not in only_set:
            continue
        row = {"name": name}
        try:
            t0 = time.perf_counter()
            lowered, extra = build()
            compiled = lowered.compile()
            row["compile_s"] = round(time.perf_counter() - t0, 1)
            row.update(extra)
            mem = analyze_compiled(compiled)
            if mem is None:
                row["error"] = "memory_analysis unavailable on this backend"
            else:
                row.update(mem)
                row["fits_16gb"] = mem["total_gb"] <= V5E_HBM_GB
        except Exception as e:
            row["error"] = f"{type(e).__name__}: {str(e)[:200]}"
        rows.append(row)
        print(json.dumps(row), flush=True)

        doc = json.loads(out_path.read_text()) if out_path.exists() else {}
        old = {r["name"]: r for r in doc.get("memory", {}).get("rows", [])}
        for r in rows:
            old[r["name"]] = r
        doc["memory"] = {
            "note": (
                "compiled.memory_analysis() bytes per claim-bearing program "
                "(tools/bench_memory.py): total_gb = args + outputs + temps "
                "- aliased (donated buffers once); fits_16gb vs v5e HBM. "
                "Compile-time accounting — nothing is executed."
            ),
            "rows": sorted(old.values(), key=lambda r: r["name"]),
        }
        out_path.write_text(json.dumps(doc, indent=1))

    print(json.dumps({"memory_rows": len(rows), "out": str(out_path)}))


if __name__ == "__main__":
    main()
