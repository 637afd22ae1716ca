"""Bounded accelerator reachability probe.

The axon TPU tunnel has outage windows where backend init returns
UNAVAILABLE or even a trivial dispatch hangs 10+ minutes (CLAUDE.md). A
hung in-process dispatch cannot be interrupted, so anything that is about
to pay a long compile (bench.py, `cli serve` warmup) first dispatches a
tiny matmul in a SUBPROCESS with a hard timeout and fails fast with a
clear message instead of hanging its caller forever.

The default bound (15 min) sits far above the slowest observed healthy
compile of a trivial program (~50 s), so a healthy-but-slow compile
window never trips it.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from typing import Any, Dict, Optional


def probe_device(
    timeout_s: int = 900,
    platform: Optional[str] = None,
    skip_env: str = "PLANGEN_PROBE",
    timeout_env: str = "PLANGEN_PROBE_TIMEOUT",
) -> bool:
    """True when a trivial jitted dispatch completes within the bound.

    `platform` pins the subprocess's JAX platform the same way the caller
    was pinned (in-process config — a registered TPU plugin ignores
    JAX_PLATFORMS), so a CPU smoke run probes CPU, not the tunnel.
    `<skip_env>=0` skips the probe (reports healthy); `<timeout_env>`
    overrides the bound in seconds.
    """
    if os.environ.get(skip_env) == "0":
        return True
    timeout_s = int(os.environ.get(timeout_env, timeout_s))
    pin = (
        f"jax.config.update('jax_platforms', {platform!r});"
        if platform else ""
    )
    code = (
        "import jax;" + pin + "import jax.numpy as jnp; import numpy as np;"
        "x = jnp.ones((8, 8), dtype=jnp.bfloat16);"
        "print(np.asarray(jax.jit(lambda a: a @ a)(x))[0, 0])"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True,
            timeout=timeout_s,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def probe_device_info(
    timeout_s: int = 900, platform: Optional[str] = None
) -> Dict[str, Any]:
    """Like `probe_device`, but returns what the subprocess SAW.

    The dict always has `ok`; on success it adds `platform`,
    `device_count`, `device_kind` and `dispatch_seconds` (backend init +
    compile + one trivial dispatch, wall). On failure it carries `error`
    ("timeout after Ns" or the subprocess's stderr tail) so `cli doctor`
    can print a diagnosis instead of a bare boolean. Everything that can
    hang runs in the subprocess — the caller never touches the backend.
    """
    timeout_s = int(os.environ.get("PLANGEN_PROBE_TIMEOUT", timeout_s))
    pin = (
        f"jax.config.update('jax_platforms', {platform!r});"
        if platform else ""
    )
    code = (
        "import json, time, jax;" + pin + "import jax.numpy as jnp;"
        "import numpy as np; t0 = time.time();"
        "ds = jax.devices();"
        "x = jnp.ones((8, 8), dtype=jnp.bfloat16);"
        "v = float(np.asarray(jax.jit(lambda a: a @ a)(x))[0, 0]);"
        "print(json.dumps({'platform': ds[0].platform,"
        " 'device_count': len(ds),"
        " 'device_kind': getattr(ds[0], 'device_kind', '?'),"
        " 'dispatch_seconds': round(time.time() - t0, 1),"
        " 'value': v}))"
    )
    t0 = time.time()
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return {
            "ok": False,
            "error": f"timeout after {timeout_s}s (tunnel outage? "
            f"PLANGEN_PROBE_TIMEOUT raises the bound)",
            "seconds": round(time.time() - t0, 1),
        }
    if r.returncode != 0:
        tail = (r.stderr or r.stdout or "").strip().splitlines()[-3:]
        return {
            "ok": False,
            "error": " | ".join(tail) or f"exit code {r.returncode}",
            "seconds": round(time.time() - t0, 1),
        }
    try:
        info = json.loads(r.stdout.strip().splitlines()[-1])
    except (IndexError, ValueError):
        # exit 0 but empty/non-JSON stdout (plugin chatter after the JSON
        # line, or a silently-swallowed dispatch) — diagnose, don't crash
        tail = (r.stdout or "").strip()[-120:]
        return {
            "ok": False,
            "error": f"unparseable probe output: {tail!r}",
            "seconds": round(time.time() - t0, 1),
        }
    ok = info.pop("value", None) == 8.0  # 8x8 ones @ ones -> every entry 8
    return {"ok": ok, **info}
