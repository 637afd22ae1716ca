"""Compile-time device-memory accounting.

`jax.local_devices()[0].memory_stats()` returns `{}` on the axon TPU
plugin, so runtime byte telemetry is dead there (every BENCH_SWEEP train
row used to say `device_mem_gb: 0.0`). What DOES work is the compiler's
own accounting: `jitted.lower(*args).compile().memory_analysis()` reports
argument / output / temp / code sizes for the exact executable, without
executing anything — and the AOT `compiled` object can then be executed
directly, so the analysis costs zero extra compiles.

This turns every fits/OOM claim in the repo (AdamW-stage3 OOM, decode
B=96 OOM, 7B bf16 dual-residency rejection) into measured bytes in
BENCH_SWEEP.json — see tools/bench_memory.py.

The reference has no counterpart (torch.cuda.memory_allocated is its
closest tool, runtime-only); this is the TPU-native equivalent that works
at compile time.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

_FIELDS = (
    "argument_size_in_bytes",
    "output_size_in_bytes",
    "temp_size_in_bytes",
    "alias_size_in_bytes",
    "generated_code_size_in_bytes",
)


def analyze_compiled(compiled: Any) -> Optional[Dict[str, float]]:
    """GB breakdown of a `jax.stages.Compiled` executable, or None when the
    backend doesn't expose memory analysis.

    `total_gb` is the peak device footprint the executable needs:
    arguments + outputs + temps − aliased buffers (donated inputs reused
    as outputs don't count twice).
    """
    try:
        ma = compiled.memory_analysis()
    except Exception:
        return None
    if ma is None:
        return None
    vals = {}
    for f in _FIELDS:
        v = getattr(ma, f, None)
        if v is None:
            return None
        vals[f] = int(v)
    gb = {f.replace("_in_bytes", "_gb"): round(v / 2**30, 3)
          for f, v in vals.items()}
    total = (
        vals["argument_size_in_bytes"]
        + vals["output_size_in_bytes"]
        + vals["temp_size_in_bytes"]
        - vals["alias_size_in_bytes"]
    )
    gb["total_gb"] = round(total / 2**30, 3)
    # exact bytes too: 3-decimal GB floors sub-MB (tiny-config) programs to 0
    gb["total_bytes"] = total
    return gb


def lower_and_analyze(
    jitted: Any, *args: Any, **kwargs: Any
) -> Tuple[Any, Optional[Dict[str, float]]]:
    """AOT-compile a jitted function and return (compiled, memory GB dict).

    The returned `compiled` executes like the original (donation semantics
    preserved), so callers measure memory and then run the SAME executable
    — no duplicate remote compile on axon.
    """
    compiled = jitted.lower(*args, **kwargs).compile()
    return compiled, analyze_compiled(compiled)
