"""Training driver: the reference `train.py` main loop, TPU-native.

Reference loop (train.py:51-235): build system + data, resume, AdamW +
scheduler, epoch loop with grad clip, checkpoint cadence (FIFO limit),
validation cadence, loss logging. Here:

  * one jitted multi-task step on a dp x tp mesh (XLA collectives, no DDP)
  * host-side numpy data pipeline feeding sharded device batches
  * orbax checkpointing (full TrainState) + latest-resume
  * JSONL metrics log (+ stdout), per-step timing (reference relies on
    tqdm + tensorboard; see train/metrics.py)
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from plangen_tpu.config import PlanGenConfig
from plangen_tpu.data.collate import collate_flows
from plangen_tpu.data.loader import BatchLoader, CombinedLoader, infinite
from plangen_tpu.data.registry import get_dataset
from plangen_tpu.models import vlm
from plangen_tpu.parallel.mesh import batch_sharding, create_mesh, shard_params
from plangen_tpu.tasks.processor import PlanGenProcessor
from plangen_tpu.text.tokenizer import load_tokenizer
from plangen_tpu.train.checkpoint import PlanGenCheckpointer
from plangen_tpu.train.metrics import MetricsLogger
from plangen_tpu.train.optim import count_params, make_optimizer
from plangen_tpu.train.step import init_train_state, make_train_step


class Trainer:
    def __init__(self, cfg: PlanGenConfig, params: Optional[Any] = None):
        from plangen_tpu.config import validate_config

        validate_config(cfg)
        self.cfg = cfg
        tcfg = cfg.train

        self.is_lead = jax.process_index() == 0
        self.mesh = create_mesh(tcfg.mesh_shape)
        self.tokenizer = load_tokenizer(
            cfg.janus_path,
            vocab_size=cfg.model.llama.vocab_size,
            use_special_tokens=cfg.use_special_tokens,
            use_numhw=cfg.use_numhw_tokens,
        )
        self.processor = PlanGenProcessor(
            self.tokenizer,
            image_tokens=cfg.model.image_seq_len,
            max_seq_len=tcfg.max_seq_len,
            gen=cfg.generation,
        )

        if params is None:
            from plangen_tpu.convert.loading import load_params

            # training wants fp32 masters for the converted base weights
            params = load_params(cfg, dtype=jnp.float32)
        if params is None:
            params = vlm.init(
                jax.random.PRNGKey(tcfg.seed), cfg.model, dtype=jnp.float32
            )
        tuning_mode = tcfg.tuning_mode
        if tuning_mode == "lora":
            from plangen_tpu.train.lora import add_lora, init_lora

            params = add_lora(
                params,
                init_lora(
                    jax.random.PRNGKey(tcfg.seed + 1),
                    cfg.model.llama,
                    rank=tcfg.lora_rank,
                    alpha=tcfg.lora_alpha,
                ),
            )
            if tcfg.tune_token_when_lora and (
                cfg.use_special_tokens or cfg.use_numhw_tokens
            ):
                tuning_mode = "lora_tokens"
        fsdp_axis = "data" if getattr(tcfg, "fsdp", False) else None
        self.params = shard_params(
            params, self.mesh, fsdp_axis=fsdp_axis,
            fsdp_min_size=getattr(tcfg, "fsdp_min_size", 2 ** 20),
        )

        tx, self.mask = make_optimizer(tcfg.optim, self.params, tuning_mode)
        self.tx = tx
        counts = count_params(self.params, self.mask)
        print(
            f"params: total={counts['total']/1e6:.1f}M "
            f"trainable={counts['trainable']/1e6:.1f}M "
            # the EFFECTIVE mode: 'lora' promotes to 'lora_tokens' above
            # when special tokens are tuned — the count reflects it, so
            # the printed mode must too
            f"(tuning_mode={tuning_mode})"
        )
        self._dump_trainable_names()

        self.flows = tuple(
            (i, f.task_type) for i, f in enumerate(tcfg.train_data)
        )
        self.flow_tasks = dict(self.flows)
        import jax.numpy as _jnp

        master_dtype = getattr(_jnp, getattr(tcfg, "master_dtype", "float32"))
        self.state = init_train_state(self.params, tx, master_dtype=master_dtype)
        state_shardings = None
        if fsdp_axis is not None:
            # pin the output layouts: without this, jit may re-replicate
            # FSDP-sharded masters/moments after the update
            from plangen_tpu.parallel.mesh import normalize_state_shardings

            self.state, state_shardings = normalize_state_shardings(
                self.state, self.mesh
            )
        self.step_fn = make_train_step(
            cfg.model,
            tcfg,
            tx,
            pad_id=self.tokenizer.special.pad_id,
            flows=self.flows,
            state_shardings=state_shardings,
            # freeze-aware backward: frozen subtrees contribute no gradient
            # work (numerically identical — their grads were zeroed anyway)
            trainable_mask=self.mask,
        )

        self.ckpt = PlanGenCheckpointer(
            os.path.join(tcfg.output_dir, "checkpoints"),
            total_limit=tcfg.checkpoints_total_limit,
        )
        # multi-process runs share ONE output_dir (orbax coordinates the
        # checkpoint writes across processes); host-side artifacts that are
        # NOT orbax-coordinated (metrics.jsonl, params.jsonl) are written by
        # the lead process only — matching Accelerate's is_main_process
        # gating in the reference (train.py:199-210)
        # tensorboard writer only on the lead process: a non-lead
        # SummaryWriter would create (empty) per-process event files and a
        # writer thread for a logger whose log() calls are lead-gated anyway
        self.logger = MetricsLogger(
            tcfg.output_dir, use_tensorboard=self.is_lead
        )
        self._batch_sharding = batch_sharding(self.mesh)

    def _dump_trainable_names(self):
        """Write trainable parameter names+shapes to params.jsonl
        (reference: base_system.py:215-216). Lead process only — every
        process holds the same (replicated/sharded) tree."""
        import json

        import jax

        if not self.is_lead:
            return
        os.makedirs(self.cfg.train.output_dir, exist_ok=True)
        path = os.path.join(self.cfg.train.output_dir, "params.jsonl")
        with open(path, "w") as f:
            for (kp, leaf), (_, m) in zip(
                jax.tree_util.tree_leaves_with_path(self.params),
                jax.tree_util.tree_leaves_with_path(self.mask),
            ):
                if m:
                    name = jax.tree_util.keystr(kp)
                    f.write(
                        json.dumps({"name": name, "shape": list(leaf.shape)}) + "\n"
                    )

    # ------------------------------------------------------------------ data

    def build_dataloader(self):
        tcfg = self.cfg.train
        # flow batch_size is PER data-parallel shard (the reference's per-GPU
        # batch, cfg train_data); the global batch scales with the dp size.
        # On multi-host pods each process loads only its 1/process_count of
        # the global batch (reference: torch DistributedSampler) and the
        # global arrays are assembled in _device_batches.
        dp = self.mesh.shape.get("data", 1)
        nproc = jax.process_count()
        loaders = {}
        for fid, flow in enumerate(tcfg.train_data):
            ds = get_dataset(self.cfg, flow.data_name, is_test=False)
            global_bs = flow.batch_size * dp
            assert global_bs % nproc == 0 and global_bs >= nproc, (
                f"flow {fid}: global batch {global_bs} must divide evenly "
                f"into {nproc} processes (got remainder {global_bs % nproc})"
            )
            local_bs = global_bs // nproc
            loaders[fid] = BatchLoader(
                ds, local_bs, shuffle=True, seed=tcfg.seed + fid,
                workers=getattr(tcfg, "num_workers", 0),
                num_shards=nproc, shard_id=jax.process_index(),
            )
            print(f"flow {fid}: task={flow.task_type} data={flow.data_name} "
                  f"len={len(ds)} bs={flow.batch_size}x{dp}"
                  + (f" ({local_bs}/process)" if nproc > 1 else ""))
        combined = CombinedLoader(loaders)
        depth = getattr(tcfg, "prefetch_depth", 0)
        if depth > 0:
            from plangen_tpu.data.loader import PrefetchLoader

            combined = PrefetchLoader(combined, depth=depth)
        return combined

    def _device_batches(self, flow_samples):
        batches = collate_flows(flow_samples, self.flow_tasks, self.processor)
        if jax.process_count() > 1:
            # multi-host: each process holds its local rows; assemble the
            # globally-sharded arrays (XLA addresses only local shards)
            return jax.tree_util.tree_map(
                lambda x: jax.make_array_from_process_local_data(
                    self._batch_sharding, np.asarray(x)
                ),
                batches,
            )
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, self._batch_sharding), batches
        )

    # ----------------------------------------------------------------- train

    def maybe_resume(self) -> int:
        tcfg = self.cfg.train
        if tcfg.resume is None:
            return 0
        restored = self.ckpt.restore(self.state)
        if restored is not None:
            self.state = restored
            step = int(restored.step)
            print(f"resumed from step {step}")
            return step
        return 0

    def fit(
        self,
        max_steps: Optional[int] = None,
        validate_fn=None,  # callable(step, params) for the validation cadence
    ) -> Dict[str, float]:
        tcfg = self.cfg.train
        max_steps = max_steps or tcfg.max_train_steps
        start = self.maybe_resume()
        loader = infinite(self.build_dataloader())
        last_metrics: Dict[str, float] = {}
        t_step = time.perf_counter()
        last_logged = start - 1  # sec_per_step divides by ACTUAL steps
        # elapsed since the previous log (a fixed /10 under-reported the
        # first window after start/resume, which doesn't land on a
        # multiple of 10 — metrics.jsonl feeds the perf ledger)
        for step in range(start, max_steps):
            flow_samples = next(loader)
            batches = self._device_batches(flow_samples)
            self.state, metrics = self.step_fn(self.state, batches)
            if (step + 1) % 10 == 0 or step == start:
                metrics = {k: float(v) for k, v in metrics.items()}
                dt = (time.perf_counter() - t_step) / max(1, step - last_logged)
                t_step = time.perf_counter()
                last_logged = step
                metrics["sec_per_step"] = dt
                if self.is_lead:
                    self.logger.log(step + 1, metrics)
                last_metrics = metrics
                # failure detection at the logging cadence (the only host
                # sync): a non-finite loss has already poisoned the Adam
                # state, so save a post-mortem checkpoint and stop instead
                # of burning accelerator time on NaNs
                if not np.isfinite(metrics["loss"]):
                    self.ckpt.save(step + 1, self.state, force=True)
                    raise FloatingPointError(
                        f"non-finite loss {metrics['loss']} at step {step + 1}"
                        f" (metrics: {metrics}); state checkpointed for"
                        " post-mortem"
                    )
            if (step + 1) % tcfg.checkpointing_steps == 0:
                self.ckpt.save(step + 1, self.state)
            if validate_fn is not None and (step + 1) % tcfg.validation_steps == 0:
                validate_fn(step + 1, self.state.params)
        if self.ckpt.latest_step() != max_steps:
            self.ckpt.save(max_steps, self.state, force=True)
        return last_metrics

    def validate(self, step: int, params=None,
                 max_len: Optional[int] = None) -> None:
        """Run the eval harness on the configured test workload (reference
        validation cadence + `test_data` cfg, train.py:208-210). Layout
        metrics (plan/mmu workloads) land in the training JSONL stream under
        `val/` keys; size defaults to `train.val_max_len` batches."""
        from plangen_tpu.tasks.eval import run_validation

        td = self.cfg.train.test_data
        if max_len is None:
            max_len = self.cfg.train.val_max_len
        run_validation(
            self.cfg,
            task_type=td.task_type,
            data_name=td.data_name,
            max_len=max_len,
            output_dir=os.path.join(self.cfg.train.output_dir, "val"),
            batch_size=td.batch_size,
            params=params if params is not None else self.state.params,
            global_step=step,
            # lead-gated like the step logging: in a multi-process run every
            # process validates the same (replicated) params over its shard,
            # but metrics.jsonl has one writer
            metrics_cb=(
                (lambda agg: self.logger.log(
                    step, {f"val/{k}": v for k, v in agg.items()}
                )) if self.is_lead else (lambda agg: None)
            ),
        )
