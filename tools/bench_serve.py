"""Serving load benchmark: Poisson arrivals -> p50/p95 latency + throughput.

Drives a plangen_tpu server (plangen_tpu/serve.py) with an open-loop Poisson
arrival process per mode and reports per-mode latency percentiles, achieved
request rate, and batcher stats. Open-loop (arrivals do not wait for
completions) is the honest serving measurement: a closed loop hides queueing
collapse.

Usage:
  # against a running server
  python tools/bench_serve.py --url http://127.0.0.1:8000 \
      --mode generate --rps 2 --duration 60

  # self-contained (spawns an in-process server on the tiny model, CPU):
  python tools/bench_serve.py --self-tiny --mode plan --rps 20 --duration 10

Output: one JSON line
  {"mode": ..., "offered_rps": ..., "achieved_rps": ..., "n": ...,
   "latency_s": {"p50": ..., "p90": ..., "p95": ..., "max": ...},
   "errors": ...}
"""

from __future__ import annotations

import argparse
import base64
import functools
import io
import json
import random
import sys
import threading
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

PINNED_GROUNDING = (
    "<grounding><ref>a red apple</ref><box>[200, 300, 520, 640]</box>"
    "</grounding>"
)


def _payload(mode: str, hw: int, rng: random.Random):
    if mode == "plan":
        return {"caption": f"a scene number {rng.randrange(1000)}"}
    if mode == "generate":
        return {
            "caption": f"a red apple {rng.randrange(1000)}",
            "grounding": PINNED_GROUNDING,
        }
    if mode == "joint":
        return {"caption": f"two dogs in a park {rng.randrange(1000)}"}
    if mode == "understand":
        return {"image_b64": _understand_png(hw)}
    raise ValueError(mode)


@functools.lru_cache(maxsize=4)
def _understand_png(hw: int) -> str:
    """Encoded ONCE: a ~10-30 ms PIL PNG encode of the same deterministic
    image inside the arrival loop would silently throttle the offered rate
    below --rps and break the open-loop Poisson premise at high rates."""
    from PIL import Image

    img = (np.random.RandomState(0).rand(hw, hw, 3) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def run_load(url: str, mode: str, rps: float, duration: float, hw: int,
             timeout: float = 300.0):
    rng = random.Random(0)
    results = []
    lock = threading.Lock()
    threads = []

    def fire(payload):
        t0 = time.perf_counter()
        err = None
        try:
            req = urllib.request.Request(
                f"{url}/{mode}", data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                resp.read()
                if resp.status != 200:
                    err = f"http {resp.status}"
        except Exception as e:  # noqa: BLE001 — record, don't crash the load
            err = f"{type(e).__name__}"
        done = time.perf_counter()
        with lock:
            results.append((done - t0, done, err))

    t_end = time.time() + duration
    n_sent = 0
    t0 = time.perf_counter()
    while time.time() < t_end:
        # open-loop Poisson: exponential inter-arrivals, fire-and-forget
        time.sleep(rng.expovariate(rps))
        th = threading.Thread(target=fire, args=(_payload(mode, hw, rng),),
                              daemon=True)
        th.start()
        threads.append(th)
        n_sent += 1
    for th in threads:
        th.join(timeout=timeout)

    lats = sorted(dt for dt, _, err in results if err is None)
    errors = [err for _, _, err in results if err]
    # throughput window ends at the LAST completion, not after the join —
    # otherwise short runs understate achieved rate by the drain time
    last_done = max((done for _, done, err in results if err is None),
                    default=t0)
    wall = max(last_done - t0, 1e-9)

    def pct(p):
        return round(lats[min(len(lats) - 1, int(p * len(lats)))], 3) if lats else None

    return {
        "mode": mode,
        "offered_rps": rps,
        "sent": n_sent,
        "completed": len(lats),
        "achieved_rps": round(len(lats) / wall, 3),
        "latency_s": {
            "p50": pct(0.50), "p90": pct(0.90), "p95": pct(0.95),
            "max": round(lats[-1], 3) if lats else None,
        },
        "errors": len(errors),
        "error_kinds": sorted(set(errors)),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--url", default="http://127.0.0.1:8000")
    ap.add_argument("--mode", default="plan",
                    choices=["plan", "generate", "joint", "understand"])
    ap.add_argument("--rps", type=float, default=2.0)
    ap.add_argument("--duration", type=float, default=30.0)
    ap.add_argument("--hw", type=int, default=384,
                    help="image size for understand payloads")
    ap.add_argument("--self-tiny", action="store_true",
                    help="spawn an in-process tiny-model server (CPU smoke)")
    ap.add_argument("--max-batch", type=int, default=32)
    ap.add_argument("--wait-ms", type=float, default=20.0)
    args = ap.parse_args(argv)

    httpd = None
    if args.self_tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")
        from http.server import ThreadingHTTPServer

        from plangen_tpu.cli import load_config
        from plangen_tpu.serve import Batcher, make_handler
        from plangen_tpu.tasks.eval import build_pipeline

        cfg = load_config(
            str(Path(__file__).parent.parent / "configs/toy_smoke.py"),
            ["generation.max_new_text_tokens=8"],
        )
        pipe = build_pipeline(cfg)
        batcher = Batcher(pipe, max_batch=args.max_batch, wait_ms=args.wait_ms)
        class _Server(ThreadingHTTPServer):
            request_queue_size = 128  # open-loop bursts exceed the default 5

        httpd = _Server(("127.0.0.1", 0), make_handler(batcher))
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        args.url = f"http://127.0.0.1:{httpd.server_address[1]}"
        args.hw = cfg.model.vision.image_size

    rec = run_load(args.url, args.mode, args.rps, args.duration, args.hw)
    if httpd is not None:
        httpd.shutdown()
    print(json.dumps(rec))
    return 0 if rec["completed"] and not rec["errors"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
