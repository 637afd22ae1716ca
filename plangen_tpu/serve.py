"""Inference server: HTTP front + TPU-aware microbatching back.

Production-serving layer the reference lacks (its inference is batch eval
scripts, run_infer.sh). Design is TPU-first:

  * ONE device-owner thread runs all generation — XLA programs are not
    re-entrant-friendly and a single stream keeps the chip busy without
    interleaving host dispatch.
  * Requests queue up and are drained into microbatches padded to a FIXED
    set of batch buckets (1, 2, 4, ..., max_batch): every (mode, bucket)
    pair compiles once, so a bursty workload never triggers a fresh
    multi-minute remote compile mid-flight. Padding rows reuse the first
    request's prompt and are dropped from responses.
  * Modes map 1:1 onto the pipeline: generate (uni), plan, joint
    (uni_2stage), understand (mmu), edit/removal.

Endpoints (JSON in/out):
  POST /generate   {"caption": str, "grounding": str, "seed"?: int,
                    "parallel_size"?: int}
                   -> {"image_b64": png, "images_b64": [png x ps],
                       "tokens": [...], "seed": int}
  POST /plan       {"caption": str} -> {"grounding": str}
  POST /joint      {"caption": str, "seed"?: int, "parallel_size"?: int}
                   -> {"grounding", "image_b64", "images_b64", "seed"}
  POST /understand {"image_b64": png, "question"?: str} -> {"grounding": str}
  POST /edit       {"caption"?, "grounding": str, "image_b64": png,
                    "edit_region": [576 ints, 1 = regenerate] OR
                    "edit_boxes": [[x1,y1,x2,y2] normalized, ...]
                    (+ optional "pad_edit_box" dilation fraction),
                    "neg_grounding"?: str (removal), "seed"?: int}
                   -> {"image_b64": png, "tokens": [...], "seed": int}
  GET  /healthz    -> {"ok": true, "stats": {...}}

Seed contract: a request WITH "seed" is deterministic — its tokens are a pure
function of (inputs, seed), independent of batch composition (per-row sampling
keys, tasks/pipeline.py). Seedless requests draw a fresh random 31-bit seed
per request (duplicate seedless requests must not be byte-identical); the
chosen seed is echoed in the response "seed" field so any result can be
reproduced by resubmitting with it. `parallel_size` (default 1, reference
signature default is 4 — plangen_base.py:336) samples that many images from
one prompt; `images_b64` lists them and `image_b64`/`tokens` keep the first.

Run: python -m plangen_tpu.cli serve --cfg ... --port 8000
"""

from __future__ import annotations

import base64
import io
import json
import queue
import random
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, List, Optional

import numpy as np


def _png_b64(image: np.ndarray) -> str:
    from PIL import Image

    from plangen_tpu.utils.visualize import to_uint8

    buf = io.BytesIO()
    Image.fromarray(to_uint8(image)).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def _png_decode(b64: str, hw: int) -> np.ndarray:
    from PIL import Image

    img = Image.open(io.BytesIO(base64.b64decode(b64))).convert("RGB")
    # bicubic to match the reference preprocessor's resample
    # (janus/models/image_processing_vlm.py:149-154 and data/preprocess.py)
    img = img.resize((hw, hw), Image.BICUBIC)
    return np.asarray(img).astype(np.float32) / 127.5 - 1.0


@dataclass
class _Request:
    mode: str
    payload: Dict[str, Any]
    done: threading.Event = field(default_factory=threading.Event)
    result: Optional[Dict[str, Any]] = None
    error: Optional[str] = None
    # decoded input image (understand/edit), produced at submit() on the
    # HTTP handler thread: a bad image_b64 fails only ITS request (400),
    # and the per-request decode parallelizes across handler threads
    # instead of serializing on the prep thread
    pixels: Optional[np.ndarray] = None


class Batcher:
    """Device-owner thread: drains the queue into per-mode microbatches.

    Batch sizes snap UP to the nearest bucket (1, 2, 4, ..., max_batch) so
    each (mode, bucket) shape compiles exactly once. `wait_ms` bounds the
    extra latency a request pays for batching."""

    BUCKETS = (1, 2, 4, 8, 16, 32, 64)

    # max_batch default matches the measured v5e throughput plateau (B=32-64,
    # README perf table) — B=8 leaves ~25% of chip throughput on the floor
    def __init__(self, pipeline, max_batch: int = 32, wait_ms: float = 20.0,
                 min_batch: int = 1):
        # min_batch floors the bucket choice: a throughput-provisioned
        # server (steady high load) only ever runs its top bucket(s), so
        # raising the floor skips compiling the small-bucket programs —
        # each is minutes on the axon remote compiler — at the cost of
        # padding rows under light load (counted in stats["padded_rows"])
        if not 1 <= min_batch <= max_batch:
            raise ValueError(
                f"min_batch must be in [1, max_batch={max_batch}], "
                f"got {min_batch}"
            )
        self.pipe = pipeline
        self.max_batch = max_batch
        self.min_batch = min_batch
        self.wait_s = wait_ms / 1000.0
        self.q: "queue.Queue[_Request]" = queue.Queue()
        # device_s = device-owner time inside _run (dispatch + device +
        # fetch); assembly_s = deferred host assembly (PNG/b64), overlapped
        # with the next batch. Their ratio quantifies the serving-capacity
        # gap to the device-only ceiling (DESIGN.md §11).
        self.stats = {"requests": 0, "batches": 0, "padded_rows": 0,
                      "prep_s": 0.0, "device_s": 0.0, "assembly_s": 0.0,
                      "idle_s": 0.0}
        # stats are read-modify-written from the device-owner thread AND the
        # assembler workers — guard every update
        self._stats_lock = threading.Lock()
        self._last_run_end: Optional[float] = None
        # pools are created EAGERLY: lazy check-then-create would race once
        # assembler workers call _encoder_pool concurrently
        from concurrent.futures import ThreadPoolExecutor

        self._png_pool = ThreadPoolExecutor(
            max_workers=8, thread_name_prefix="plangen-png"
        )
        self._asm_pool = ThreadPoolExecutor(
            max_workers=2, thread_name_prefix="plangen-assemble"
        )
        # backpressure: each deferred batch pins its full device-output
        # buffers (defer_fetch keeps pixels on device) until assembly fetches
        # them, so in-flight deferrals are bounded — the device-owner BLOCKS
        # here instead of queueing unboundedly when assembly falls behind
        self._defer_sem = threading.Semaphore(2)
        self._held: Optional[_Request] = None  # first request of the NEXT batch
        # device-occupancy signal + EMA durations for the drain deadline:
        # while the device is busy a fuller batch costs no extra latency, so
        # _drain keeps collecting until just-enough time remains to _prepare
        # before the device frees. Plain float writes (device-owner/prep
        # threads) — torn reads are impossible for GIL-protected floats and
        # a stale value only shifts the heuristic deadline.
        self._exec_busy = threading.Event()
        self._exec_start = 0.0
        self._ema_dev = 0.0
        self._ema_prep = 0.0
        self._stop = threading.Event()
        # two-stage pipeline: the PREP thread drains requests and does ALL
        # in-pipeline host work for the next batch (tokenization, CFG dual-
        # batch build, PNG decode, embed/VQ-encode dispatch — the measured
        # ~1.1 s/batch of DESIGN.md §11) WHILE the device-owner thread runs
        # the current batch's decode. maxsize=1 bounds the lookahead: at
        # most one prepared batch (with its pinned device embeds) waits.
        self._ready: "queue.Queue" = queue.Queue(maxsize=1)
        self._prep_thread = threading.Thread(
            target=self._prep_loop, daemon=True, name="plangen-prep"
        )
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="plangen-batcher")
        self._prep_thread.start()
        self._thread.start()

    def _edit_region(self, payload: Dict[str, Any]) -> "np.ndarray":
        """Edit region from either a raw token-grid mask ("edit_region":
        576 ints) or normalized boxes ("edit_boxes": [[x1,y1,x2,y2], ...],
        optional "pad_edit_box" dilation) — the reference's datasets build
        regions from boxes the same way (data_hico.py:330-344). Also runs at
        submit() time as validation: malformed shapes raise ValueError there
        (-> 400 for THIS request only), never inside the batch loop."""
        n_img = self.pipe.cfg.image_seq_len
        if "edit_boxes" in payload and "edit_region" not in payload:
            from plangen_tpu.data.preprocess import build_edit_region

            boxes = np.asarray(payload["edit_boxes"], dtype=np.float32)
            if boxes.size % 4 != 0:
                raise ValueError(
                    f"edit_boxes must be [N, 4] normalized coords, "
                    f"got {boxes.shape}"
                )
            return build_edit_region(
                boxes,
                grid=self.pipe.grid,
                pad_edit_box=float(payload.get("pad_edit_box", 0.0)),
            ).astype(np.int32)
        if "edit_region" not in payload:
            raise ValueError("edit needs 'edit_region' (or 'edit_boxes')")
        reg = np.asarray(payload["edit_region"], dtype=np.int32)
        if reg.shape != (n_img,):
            raise ValueError(
                f"edit_region must have {n_img} entries, got {reg.shape}"
            )
        return reg

    def _encoder_pool(self):
        return self._png_pool

    def _assembler_pool(self):
        # SEPARATE from the PNG pool: assemblers block on encoder_pool.map,
        # so sharing one pool could fill every worker with waiting
        # assemblers and deadlock
        return self._asm_pool

    def submit(self, mode: str, payload: Dict[str, Any]) -> _Request:
        if not isinstance(payload, dict):
            raise ValueError("request body must be a JSON object")
        req = _Request(mode, payload)
        # validate EVERYTHING request-specific HERE (raises to the caller
        # as a 400): a bad value must fail only this request, never the
        # batcher loop or an unrelated request sharing its microbatch
        self._req_seed(req)
        ps = self._req_ps(req)
        if ps > 1 and mode not in ("generate", "joint"):
            raise ValueError(
                f"parallel_size applies to generate/joint, not {mode}"
            )
        if ps > self.max_batch:
            # one request would exceed the compiled row budget — an
            # unwarmed multi-minute remote compile (or OOM) mid-flight
            raise ValueError(
                f"parallel_size {ps} exceeds this server's max_batch "
                f"{self.max_batch} image rows"
            )
        if mode in ("generate", "joint", "plan") and not isinstance(
            payload.get("caption"), str
        ):
            # required for the captioned modes (edit may legitimately send
            # an empty/absent caption — removal uses an empty target); the
            # shared _prepare uses .get(), so a missing key would otherwise
            # silently generate from "" instead of failing THIS request
            raise ValueError(f"{mode} request requires a string 'caption'")
        if mode in ("generate", "edit") and not isinstance(
            payload.get("grounding"), str
        ):
            raise ValueError(f"{mode} request requires a string 'grounding'")
        if mode in ("understand", "edit"):
            # decode NOW, on the handler thread: a corrupt image_b64 fails
            # only this request, and batch-wide PNG decode parallelizes
            # across handler threads instead of serializing in _prepare
            try:
                req.pixels = _png_decode(
                    payload["image_b64"], self.pipe.cfg.vision.image_size
                )
            except Exception as e:
                raise ValueError(f"invalid image_b64: {type(e).__name__}")
        if mode == "edit":
            # validate AND cache: the rasterized region replaces any
            # "edit_boxes" so _run doesn't re-run build_edit_region on the
            # device-owner thread (it re-validates the cheap array form)
            payload["edit_region"] = self._edit_region(payload).tolist()
        self.q.put(req)
        return req

    def close(self):
        self._stop.set()
        # a serving batch holds _run for ~8 s; join long enough that the
        # device-owner exits BEFORE the assembler pool shuts down (a submit
        # after shutdown would otherwise orphan the in-flight batch — the
        # _loop submit has an inline fallback for that case too)
        self._thread.join(timeout=60)
        self._prep_thread.join(timeout=10)
        # anything still in flight at shutdown would leave its HTTP waiters
        # blocked on done.wait() forever — error-finalize every request the
        # workers never took: the prepared-batch handoff slot, the raw
        # queue, and a batch head parked in _held
        leftovers: List[_Request] = []
        while True:
            try:
                batch, _prepared = self._ready.get_nowait()
            except queue.Empty:
                break
            leftovers.extend(batch)
        if self._held is not None:
            leftovers.append(self._held)
            self._held = None
        while True:
            try:
                leftovers.append(self.q.get_nowait())
            except queue.Empty:
                break
        if leftovers:
            for r in leftovers:
                r.error = "RuntimeError: server shutting down"
            self._finalize(leftovers)
        self._asm_pool.shutdown(wait=True)  # let in-flight results land
        self._png_pool.shutdown(wait=False)

    # ------------------------------------------------------------- internals

    def _bucket(self, n: int, ps: int = 1) -> int:
        # min_batch/max_batch are device-row budgets (each request occupies
        # ps image rows), so both the floor and the cap scale down by the
        # batch's parallel_size: a --min-batch 32 server receiving ps=4
        # generate requests must floor at 8 REQUESTS (32 rows), not pad to
        # 32 requests = 128 rows x 2 CFG — an unwarmed (minutes of remote
        # compile mid-flight), possibly OOM shape 4x past the ceiling
        cap = max(1, self.max_batch // ps)
        floor = min(max(1, self.min_batch // ps), cap)
        for b in self.BUCKETS:
            if b >= max(n, floor):
                return min(b, cap)
        return cap

    @staticmethod
    def _req_seed(req: _Request) -> int:
        """Explicit seed, or a fresh random one: with per-row keys a shared
        default seed would make duplicate seedless requests byte-identical.
        The chosen value is echoed in the response. Explicit seeds must fit
        the per-row key dtype (tasks/pipeline.py uses 32-bit keys); rejecting
        HERE fails only this request, not the whole microbatch."""
        s = req.payload.get("seed")
        if s is None:
            return random.getrandbits(31)
        s = int(s)
        if not (0 <= s < 2 ** 32):
            raise ValueError(f"seed must be in [0, 2**32), got {s}")
        return s

    @staticmethod
    def _req_ps(req: _Request) -> int:
        ps = int(req.payload.get("parallel_size", 1))
        if not (1 <= ps <= 16):
            raise ValueError(f"parallel_size must be in [1, 16], got {ps}")
        return ps

    @staticmethod
    def _batch_key(req: _Request):
        """Requests batch together when they run the SAME program: mode plus
        any payload field that changes the compiled shape or shared prompt
        (parallel_size widens the device batch; an MMU question is one prompt
        per batch). Per-request seeds ride as PER-ROW sampling keys (pipeline
        `seeds`), so a request's tokens are a pure function of (inputs, its
        seed) regardless of what shares the batch — distinct seeds do not
        fragment batches."""
        if req.mode in ("generate", "joint"):
            return (req.mode, Batcher._req_ps(req))
        if req.mode == "understand":
            return (req.mode, req.payload.get("question"))
        return (req.mode,)

    def _drain(self) -> List[_Request]:
        if self._held is not None:
            first, self._held = self._held, None
        else:
            try:
                first = self.q.get(timeout=0.1)
            except queue.Empty:
                return []
        batch = [first]
        # device batch = requests x parallel_size: cap request count so the
        # widened batch stays at the compiled-buckets ceiling
        cap = max(1, self.max_batch // self._req_ps(first))
        deadline = time.perf_counter() + self.wait_s
        while len(batch) < cap:
            now = time.perf_counter()
            if self._exec_busy.is_set() and self._ema_dev > 0.0:
                # device occupied: this batch cannot start until it frees,
                # so keep collecting (fuller batch, zero latency cost) until
                # just-enough time remains to _prepare before then. Without
                # this, prep snapshots the queue a full device-cycle early
                # and fires partial buckets under saturating load (measured
                # 21.75/32 mean rows, -25% capacity).
                est_free = (self._exec_start + self._ema_dev
                            - self._ema_prep - 0.05)
                timeout = est_free - now
                if timeout <= 0:
                    break
                timeout = min(timeout, 0.1)  # re-check device state
                final_wait = False
            else:
                timeout = deadline - now
                if timeout <= 0:
                    break
                final_wait = True
            try:
                nxt = self.q.get(timeout=timeout)
            except queue.Empty:
                if final_wait:
                    break
                continue
            if self._batch_key(nxt) != self._batch_key(first):
                # different program: HOLD it as the next batch's head (a
                # tail re-enqueue could starve it behind a sustained stream
                # of the other mode) and flush the current batch
                self._held = nxt
                break
            batch.append(nxt)
        return batch

    def _prep_loop(self):
        """Drain + host batch construction, one batch AHEAD of the device."""
        while not self._stop.is_set():
            # don't start collecting until the handoff slot is free (the
            # device took the previous prepared batch): draining earlier
            # would snapshot the queue a whole device-cycle ahead and fire
            # partial buckets — the collection window should be the CURRENT
            # decode's run, ended by _drain's est_free deadline
            if self._ready.full():
                time.sleep(0.02)
                continue
            batch = self._drain()
            if not batch:
                continue
            t0 = time.perf_counter()
            try:
                prepared = self._prepare(batch)
            except Exception as e:  # bad batch: fail its waiters, keep going
                for r in batch:
                    r.error = f"{type(e).__name__}: {e}"
                self._finalize(batch)
                continue
            dt = time.perf_counter() - t0
            self._ema_prep = dt if self._ema_prep == 0.0 else (
                0.7 * self._ema_prep + 0.3 * dt
            )
            with self._stats_lock:
                self.stats["prep_s"] = round(self.stats["prep_s"] + dt, 3)
            while not self._stop.is_set():  # blocks at lookahead=1
                try:
                    self._ready.put((batch, prepared), timeout=0.5)
                    break
                except queue.Full:
                    continue
            else:  # shutdown raced the handoff: release the waiters
                for r in batch:
                    r.error = "RuntimeError: server shutting down"
                self._finalize(batch)

    def _loop(self):
        while not self._stop.is_set():
            try:
                batch, prepared = self._ready.get(timeout=0.1)
            except queue.Empty:
                continue
            t0 = time.perf_counter()
            if self._last_run_end is not None:
                # time the device-owner spent OUTSIDE _execute. Under
                # SATURATING load this is the true inter-batch gap (prep now
                # overlaps); off-saturation it is dominated by waiting for
                # traffic and means nothing.
                with self._stats_lock:
                    self.stats["idle_s"] = round(
                        self.stats["idle_s"] + t0 - self._last_run_end, 3
                    )
            self._exec_start = t0
            self._exec_busy.set()
            try:
                deferred = self._execute(batch, prepared)
            except Exception as e:  # surface errors to every waiter
                for r in batch:
                    r.error = f"{type(e).__name__}: {e}"
                deferred = None
            finally:
                self._exec_busy.clear()
            self._last_run_end = time.perf_counter()
            dt = self._last_run_end - t0
            self._ema_dev = dt if self._ema_dev == 0.0 else (
                0.7 * self._ema_dev + 0.3 * dt
            )
            with self._stats_lock:
                self.stats["device_s"] = round(
                    self.stats["device_s"] + dt, 3
                )
            if deferred is not None:
                # host-side result assembly (PNG encode, b64, response dicts)
                # overlaps the NEXT batch's device work: the device-owner
                # thread goes straight back to draining while an assembler
                # thread finishes this batch (measured ~2-3 s/batch at B=32).
                # The semaphore bounds in-flight deferrals (see __init__).
                self._defer_sem.acquire()
                try:
                    self._assembler_pool().submit(self._finish, batch, deferred)
                except RuntimeError:
                    # pool already shut down (close() racing a final batch):
                    # finish inline so every waiter is still released
                    self._finish(batch, deferred)
            else:
                self._finalize(batch)

    def _finish(self, batch: List[_Request], deferred) -> None:
        t0 = time.perf_counter()
        try:
            deferred()
        except Exception as e:  # noqa: BLE001 — surface to every waiter
            for r in batch:
                r.error = f"{type(e).__name__}: {e}"
        finally:
            self._defer_sem.release()
        with self._stats_lock:
            self.stats["assembly_s"] = round(
                self.stats["assembly_s"] + time.perf_counter() - t0, 3
            )
        self._finalize(batch)

    def _finalize(self, batch: List[_Request]) -> None:
        for r in batch:
            r.done.set()
        with self._stats_lock:
            self.stats["requests"] += len(batch)
            self.stats["batches"] += 1

    @staticmethod
    def _pad(items: List[Any], bucket: int) -> List[Any]:
        return items + [items[0]] * (bucket - len(items))

    def _prepare(self, batch: List[_Request]):
        """Host half of a batch, run on the PREP thread: PNG decode, padding,
        tokenization, CFG dual-batch build, and the embed / VQ-encode
        dispatches (tasks/pipeline.py prepare_*). Overlaps the PREVIOUS
        batch's device decode — the ~1.1 s/batch of in-pipeline host work
        DESIGN.md §11 measured in the device-owner path."""
        mode = batch[0].mode
        n = len(batch)
        # image modes with parallel_size occupy ps device rows per request
        ps_rows = (self._req_ps(batch[0])
                   if mode in ("generate", "joint") else 1)
        bucket = self._bucket(n, ps=ps_rows)
        with self._stats_lock:
            # DEVICE rows (the padding-cost meter min_batch's docstring
            # sells): each padded request slot costs ps image rows
            self.stats["padded_rows"] += (bucket - n) * ps_rows

        if mode == "plan":
            caps = self._pad([r.payload["caption"] for r in batch], bucket)
            return {"plan": self.pipe.prepare_plan(caps)}

        if mode == "understand":
            # pixels decoded at submit() on the handler threads
            imgs = self._pad([r.pixels for r in batch], bucket)
            # one question per batch (the batch key includes it); None keeps
            # the reference's default MMU prompt
            return {"mmu": self.pipe.prepare_understand(
                np.stack(imgs), question=batch[0].payload.get("question")
            )}

        ps = self._req_ps(batch[0])  # uniform across the batch (batch key)
        seeds = self._pad([self._req_seed(r) for r in batch], bucket)
        caps = self._pad([r.payload.get("caption", "") for r in batch], bucket)

        if mode == "joint":
            # only stage 1 (plan) can be built ahead: stage 2's prompt
            # depends on the planned layout, so its host build runs between
            # the two decodes in _execute
            return {"plan": self.pipe.prepare_plan(caps), "caps": caps,
                    "seeds": seeds, "ps": ps, "bucket": bucket}

        if mode == "generate":
            groundings = self._pad(
                [r.payload["grounding"] for r in batch], bucket
            )
            prep = self.pipe.prepare_layout_to_image(
                caps, groundings, seeds=seeds, parallel_size=ps
            )
            return {"gen": prep, "groundings": groundings, "seeds": seeds,
                    "ps": ps, "bucket": bucket}

        if mode == "edit":
            groundings = self._pad(
                [r.payload["grounding"] for r in batch], bucket
            )
            imgs = self._pad([r.pixels for r in batch], bucket)
            regions = self._pad(
                [self._edit_region(r.payload) for r in batch], bucket
            )
            negs = [r.payload.get("neg_grounding") for r in batch]
            neg_groundings = (
                self._pad([g or "" for g in negs], bucket)
                if any(negs) else None
            )
            prep = self.pipe.prepare_layout_to_image(
                caps, groundings,
                neg_groundings=neg_groundings,
                gt_images=np.stack(imgs),
                edit_region=np.stack(regions),
                seeds=seeds,
                # explicit: edit serves ONE edited image per request —
                # inheriting cfg.generation.parallel_size here would
                # silently widen the batch ps-fold past the row budget
                # the bucket math enforces
                parallel_size=1,
                teacher_forcing=True,
            )
            return {"gen": prep, "seeds": seeds}

        raise ValueError(f"unknown mode {mode!r}")

    def _execute(self, batch: List[_Request], prepared):
        """Device half: decode program(s) on a prepared batch. Returns None
        (results written) or a deferred assembly callable."""
        mode = batch[0].mode

        if mode == "plan":
            outs = self.pipe.plan_from_prepared(prepared["plan"])
            for r, g in zip(batch, outs):
                r.result = {"grounding": g}
            return

        if mode == "understand":
            out = self.pipe.understand_from_prepared(prepared["mmu"])
            for r, g in zip(batch, out.groundings):
                r.result = {"grounding": g}
            return

        if mode in ("generate", "joint"):
            ps, seeds, bucket = (prepared["ps"], prepared["seeds"],
                                 prepared["bucket"])
            if mode == "joint":
                groundings = self.pipe.plan_from_prepared(prepared["plan"])
                out = self.pipe.layout_to_image(
                    prepared["caps"], groundings, seeds=seeds,
                    parallel_size=ps,
                )
            else:
                groundings = prepared["groundings"]
                out = self.pipe.execute_image_gen(prepared["gen"])
            def assemble_generate(batch=batch, out=out, groundings=groundings,
                                  seeds=seeds, ps=ps, bucket=bucket):
                # the device->host pixel fetch (pipe.defer_fetch) AND PNG
                # encoding both happen here, overlapped with the next batch's
                # device work; PIL releases the GIL in the encoder
                images = np.asarray(out.images)
                all_rows = sorted({c * bucket + i
                                   for i in range(len(batch))
                                   for c in range(ps)})
                encoded = dict(zip(all_rows, self._encoder_pool().map(
                    _png_b64, [images[j] for j in all_rows]
                )))
                for i, r in enumerate(batch):
                    # parallel_size rows are copy-major (pipeline._row_keys):
                    # request i's sample c sits at row c*bucket + i
                    rows = [c * bucket + i for c in range(ps)]
                    r.result = {
                        "image_b64": encoded[rows[0]],
                        "images_b64": [encoded[j] for j in rows],
                        "grounding": groundings[i],
                        "tokens": [int(t) for t in out.image_tokens[rows[0]]],
                        "seed": seeds[i],
                    }

            return assemble_generate

        if mode == "edit":
            # layout-guided editing / removal: gt image + edit region
            # (1 = regenerate); negative grounding optional (removal) —
            # all built in _prepare, only the decode runs here
            seeds = prepared["seeds"]
            out = self.pipe.execute_image_gen(prepared["gen"])
            def assemble_edit(batch=batch, out=out, seeds=seeds):
                images = np.asarray(out.images)
                pngs = list(self._encoder_pool().map(
                    _png_b64, [images[i] for i in range(len(batch))]
                ))
                for i, r in enumerate(batch):
                    r.result = {
                        "image_b64": pngs[i],
                        "tokens": [int(t) for t in out.image_tokens[i]],
                        "seed": seeds[i],
                    }

            return assemble_edit

        raise ValueError(f"unknown mode {mode!r}")


def make_handler(batcher: Batcher):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def _send(self, code: int, obj: Dict[str, Any]):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"ok": True, "stats": batcher.stats})
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            mode = self.path.strip("/")
            if mode not in ("generate", "plan", "joint", "understand", "edit"):
                self._send(404, {"error": f"unknown endpoint {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                payload = json.loads(self.rfile.read(n) or b"{}")
            except (ValueError, json.JSONDecodeError) as e:
                self._send(400, {"error": f"bad json: {e}"})
                return
            try:
                req = batcher.submit(mode, payload)
            except (ValueError, TypeError) as e:
                self._send(400, {"error": str(e)})
                return
            req.done.wait()
            if req.error:
                self._send(500, {"error": req.error})
            else:
                self._send(200, req.result)

    return Handler


def _warmup_payloads(mode: str, n: int, n_img: int) -> List[Dict[str, Any]]:
    """n synthetic payloads for one warmup batch of `mode`."""
    base: Dict[str, Any]
    g = ("<grounding><ref>warmup</ref><box>[100, 100, 500, 500]</box>"
         "</grounding>")
    if mode == "generate":
        base = {"caption": "warmup", "grounding": g}
    elif mode == "plan":
        base = {"caption": "warmup"}
    elif mode == "joint":
        base = {"caption": "warmup"}
    elif mode == "understand":
        img = np.zeros((32, 32, 3), dtype=np.uint8)
        base = {"image_b64": _png_b64(img)}
    elif mode == "edit":
        img = np.zeros((32, 32, 3), dtype=np.uint8)
        base = {"caption": "warmup", "grounding": g,
                "image_b64": _png_b64(img),
                "edit_region": [1] * (n_img // 2) + [0] * (n_img - n_img // 2)}
    else:
        raise ValueError(f"unknown warmup mode {mode!r}")
    return [{**base, "seed": i} for i in range(n)]


def warmup(batcher: "Batcher", spec: str, timeout: float = 3600.0) -> None:
    """Pre-compile (mode, bucket) programs by driving the REAL request path
    with synthetic batches BEFORE the server accepts traffic.

    `spec` is "mode:batch,mode:batch,..." (e.g. "generate:32,plan:8").
    Each group is submitted as one burst so it forms a single batch of its
    bucket; the embed/decode/VQ programs for that shape compile during the
    drain (minutes each on the axon remote compiler — that is the point:
    pay it at startup, not on the first client request)."""
    n_img = batcher.pipe.cfg.image_seq_len
    for item in spec.split(","):
        mode, _, b = item.strip().partition(":")
        n = int(b) if b else batcher.max_batch
        t0 = time.perf_counter()
        reqs = [batcher.submit(mode, p)
                for p in _warmup_payloads(mode, n, n_img)]
        for r in reqs:
            if not r.done.wait(timeout=timeout):
                raise TimeoutError(f"warmup {mode}:{n} exceeded {timeout}s")
            if r.error:
                raise RuntimeError(f"warmup {mode}:{n} failed: {r.error}")
        print(f"warmup {mode}:{n} done in {time.perf_counter() - t0:.1f}s",
              flush=True)


def serve(cfg, host: str = "127.0.0.1", port: int = 8000,
          max_batch: int = 32, wait_ms: float = 20.0, params=None,
          min_batch: int = 1, warmup_spec: Optional[str] = None):
    """Build the pipeline and serve until interrupted."""
    import dataclasses

    from plangen_tpu.tasks.eval import build_pipeline

    # serving always converts pixels to uint8 ON DEVICE: the host fetch is
    # the 4x-smaller payload PNG encoding needs anyway, and the conversion
    # is bit-identical to the host formula (vq.decode_code_uint8; measured
    # ~2 s/batch of tunnel fetch saved at batch 32)
    if not cfg.generation.output_uint8:
        cfg = dataclasses.replace(
            cfg, generation=dataclasses.replace(
                cfg.generation, output_uint8=True
            )
        )
    pipe = build_pipeline(cfg, params=params)
    # pixel fetch moves to the assembler thread (Batcher assemble closures
    # np.asarray the deferred device array), overlapping the tunnel transfer
    # with the next batch's device work
    pipe.defer_fetch = True
    batcher = Batcher(pipe, max_batch=max_batch, wait_ms=wait_ms,
                      min_batch=min_batch)
    if warmup_spec:
        warmup(batcher, warmup_spec)

    class _Server(ThreadingHTTPServer):
        # default listen backlog is 5: a burst of max_batch concurrent
        # connections (the NORMAL arrival pattern for a batching server)
        # overflows it and clients see connection resets
        request_queue_size = max(128, 4 * max_batch)

    httpd = _Server((host, port), make_handler(batcher))
    print(f"serving on http://{host}:{httpd.server_address[1]} "
          f"(max_batch={max_batch}, min_batch={min_batch}, "
          f"wait_ms={wait_ms})", flush=True)
    try:
        httpd.serve_forever()
    finally:
        batcher.close()
    return httpd
