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

import os
import subprocess
import sys
from typing import Optional


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
