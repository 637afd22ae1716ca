"""Training tests: losses, masking, multi-task step, checkpointing, mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from plangen_tpu.config import OptimConfig, PlanGenModelConfig, TrainConfig
from plangen_tpu.models import vlm
from plangen_tpu.train.loss import shift_cross_entropy
from plangen_tpu.train.optim import count_params, make_optimizer, trainable_mask
from plangen_tpu.train.step import TrainState, init_train_state, make_train_step

TINY = PlanGenModelConfig.tiny()
KEY = jax.random.PRNGKey(0)
PAD = 2


def make_batches(B=2, L=8):
    n = TINY.image_seq_len
    size = TINY.vision.image_size
    k = jax.random.PRNGKey(5)
    ids = jax.random.randint(k, (B, L), 3, 100)
    img = jax.random.uniform(k, (B, size, size, 3), minval=-1.0, maxval=1.0)
    seq_mask = np.zeros((B, L), dtype=bool)
    seq_mask[:, 1 : 1 + n] = True
    return {
        0: {  # uni
            "input_ids": ids,
            "attn_mask": jnp.ones((B, L + n), dtype=jnp.int32),
            "images": img,
        },
        1: {  # mmu
            "input_ids": ids,
            "attn_mask": jnp.ones((B, L), dtype=jnp.int32),
            "images": img,
            "images_seq_mask": jnp.asarray(seq_mask),
        },
        2: {  # plan
            "input_ids": ids,
            "attn_mask": jnp.ones((B, L), dtype=jnp.int32),
        },
    }


class TestLoss:
    def test_shift_ce_ignores_pad(self):
        V = 10
        logits = jnp.zeros((1, 4, V))
        labels = jnp.array([[1, 2, PAD, 3]])
        loss = shift_cross_entropy(logits, labels, PAD)
        # uniform logits -> log(V) per valid target {2, 3}
        np.testing.assert_allclose(float(loss), np.log(V), rtol=1e-5)

    def test_shift_ce_perfect_prediction(self):
        V = 10
        labels = jnp.array([[1, 2, 3, 4]])
        logits = jax.nn.one_hot(jnp.array([[2, 3, 4, 0]]), V) * 100.0
        loss = shift_cross_entropy(logits, labels, PAD)
        assert float(loss) < 1e-3

    def test_fused_ce_matches_unfused(self):
        """Chunked lm_head CE == materialized-logits CE, values and grads
        (the fused form never builds [B, S, V]; tests/test_train.py is the
        equality witness cited in its docstring)."""
        from plangen_tpu.train.loss import shift_cross_entropy_fused

        B, S, H, V = 2, 13, 16, 32  # S-1 not a chunk multiple -> padding path
        key = jax.random.PRNGKey(0)
        hidden = jax.random.normal(key, (B, S, H), jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), (H, V), jnp.bfloat16) * 0.3
        labels = jax.random.randint(jax.random.PRNGKey(2), (B, S), 0, V)
        labels = labels.at[:, -3:].set(PAD)  # trailing pads ignored

        def unfused(hidden, w):
            logits = (hidden @ w).astype(jnp.float32)
            return shift_cross_entropy(logits, labels, PAD)

        def fused(hidden, w):
            return shift_cross_entropy_fused(hidden, w, labels, PAD, chunk=4)

        lu, lf = float(unfused(hidden, w)), float(fused(hidden, w))
        np.testing.assert_allclose(lf, lu, rtol=1e-5)
        gu = jax.grad(unfused, argnums=(0, 1))(hidden, w)
        gf = jax.grad(fused, argnums=(0, 1))(hidden, w)
        for a, b in zip(gu, gf):
            # grads emerge in bf16 (hidden/w dtype): one-ulp rounding noise
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=1e-2, atol=5e-4,
            )

    def test_fused_ce_all_pad(self):
        from plangen_tpu.train.loss import shift_cross_entropy_fused

        hidden = jnp.ones((1, 5, 8), jnp.bfloat16)
        w = jnp.ones((8, 16), jnp.bfloat16)
        labels = jnp.full((1, 5), PAD)
        assert float(shift_cross_entropy_fused(hidden, w, labels, PAD)) == 0.0


class TestMasking:
    def test_stage3_freezes_vq(self):
        params = vlm.init(KEY, TINY, dtype=jnp.float32)
        mask = trainable_mask(params, "stage3")
        assert not any(jax.tree_util.tree_leaves(mask["gen_vision_model"]))
        assert all(jax.tree_util.tree_leaves(mask["language_model"]))

    def test_stage1_only_aligners(self):
        params = vlm.init(KEY, TINY, dtype=jnp.float32)
        mask = trainable_mask(params, "stage1")
        assert all(jax.tree_util.tree_leaves(mask["aligner"]))
        assert all(jax.tree_util.tree_leaves(mask["gen_head"]))
        assert not any(jax.tree_util.tree_leaves(mask["language_model"]))

    def test_count_params(self):
        params = vlm.init(KEY, TINY, dtype=jnp.float32)
        mask = trainable_mask(params, "stage3")
        c = count_params(params, mask)
        assert 0 < c["trainable"] < c["total"]


class TestTrainStep:
    @pytest.fixture(scope="class")
    def setup(self):
        params = vlm.init(KEY, TINY, dtype=jnp.float32)
        cfg = TrainConfig(optim=OptimConfig(learning_rate=1e-3))
        tx, mask = make_optimizer(cfg.optim, params, "stage3")
        flows = ((0, "uni"), (1, "mmu"), (2, "plan"))
        # donate=False: tests reuse the same state object across steps
        step = make_train_step(
            TINY, cfg, tx, PAD, flows, compute_dtype=jnp.float32, donate=False
        )
        state = init_train_state(params, tx)
        return step, state, mask

    def test_loss_decreases(self, setup):
        step, state, _ = setup
        batches = make_batches()
        losses = []
        for _ in range(8):
            state, metrics = step(state, batches)
            losses.append(float(metrics["loss"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]
        assert {"loss_uni_t2i_0", "loss_uni_lm_0", "loss_mmu_1", "loss_plan_lm_2"} <= set(
            metrics
        )

    def test_frozen_params_unchanged(self, setup):
        step, state, mask = setup
        before = jax.tree_util.tree_leaves(state.params["gen_vision_model"])
        state2, _ = step(state, make_batches())
        after = jax.tree_util.tree_leaves(state2.params["gen_vision_model"])
        for b, a in zip(before, after):
            np.testing.assert_array_equal(np.asarray(b), np.asarray(a))

    def test_trainable_params_changed(self, setup):
        step, state, _ = setup
        state2, _ = step(state, make_batches())
        b = np.asarray(state.params["language_model"]["layers"]["q_proj"])
        a = np.asarray(state2.params["language_model"]["layers"]["q_proj"])
        assert not np.array_equal(b, a)

    def test_loss_scales(self):
        params = vlm.init(KEY, TINY, dtype=jnp.float32)
        cfg = TrainConfig(loss_scales={"loss_plan_lm_2": 0.0})
        tx, _ = make_optimizer(cfg.optim, params, "stage3")
        step = make_train_step(
            TINY, cfg, tx, PAD, ((2, "plan"),), compute_dtype=jnp.float32
        )
        state = init_train_state(params, tx)
        _, metrics = step(state, make_batches())
        assert float(metrics["loss_plan_lm_2"]) == 0.0


class TestAdafactor:
    """optimizer='adafactor': the single-chip stage3 path (DESIGN.md §6)."""

    def test_unknown_optimizer_rejected(self):
        params = vlm.init(KEY, TINY, dtype=jnp.float32)
        with pytest.raises(ValueError, match="unknown optimizer"):
            make_optimizer(OptimConfig(optimizer="sgd"), params, "stage3")

    def test_train_step_loss_decreases_frozen_unchanged(self):
        params = vlm.init(KEY, TINY, dtype=jnp.float32)
        cfg = TrainConfig(
            optim=OptimConfig(learning_rate=1e-3, optimizer="adafactor")
        )
        tx, _ = make_optimizer(cfg.optim, params, "stage3")
        step = make_train_step(
            TINY, cfg, tx, PAD, ((0, "uni"), (1, "mmu"), (2, "plan")),
            compute_dtype=jnp.float32, donate=False,
        )
        state = init_train_state(params, tx)
        batches = make_batches()
        losses = []
        for _ in range(8):
            state, metrics = step(state, batches)
            losses.append(float(metrics["loss"]))
        assert all(np.isfinite(losses)) and losses[-1] < losses[0]
        for b, a in zip(
            jax.tree_util.tree_leaves(params["gen_vision_model"]),
            jax.tree_util.tree_leaves(state.params["gen_vision_model"]),
        ):
            np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
        q0 = np.asarray(params["language_model"]["layers"]["q_proj"])
        q1 = np.asarray(state.params["language_model"]["layers"]["q_proj"])
        assert not np.array_equal(q0, q1)

    def test_weight_decay_is_lr_scaled_like_adamw(self):
        """optax.adafactor's weight_decay_rate is a raw per-step fraction
        (applied AFTER lr scaling) — passing the recipe wd=0.01 verbatim
        would decay weights 1%/step, 20000x AdamW's lr*wd. Pin the fix:
        with zero gradients the per-step relative decay must be ~lr*wd,
        nowhere near wd."""
        import optax

        lr, wd = 1e-3, 0.01
        w = {"m": jnp.ones((256, 256), dtype=jnp.float32)}
        tx, _ = make_optimizer(
            OptimConfig(optimizer="adafactor", learning_rate=lr,
                        adam_weight_decay=wd),
            w, "all",
        )
        state = tx.init(w)
        zero_g = jax.tree_util.tree_map(jnp.zeros_like, w)
        updates, state = tx.update(zero_g, state, w)
        w2 = optax.apply_updates(w, updates)
        rel = float(jnp.mean(jnp.abs((w2["m"] - w["m"]) / w["m"])))
        assert rel < 5 * lr * wd, f"per-step decay {rel} is not lr-scaled"
        assert rel > 0.1 * lr * wd, f"decay {rel} missing entirely"

    def test_second_moment_is_factored_at_real_dims(self):
        # The memory claim: a [2048, 5632] MLP weight's second moment is
        # stored as row+col vectors (7680 floats), not 11.5M — AdamW's mu+nu
        # for the same leaf would be 2x 11.5M
        w = {"mlp": jnp.zeros((2048, 5632), dtype=jnp.float32)}
        tx, _ = make_optimizer(
            OptimConfig(optimizer="adafactor"), w, "all"
        )
        state = tx.init(w)
        n_param = 2048 * 5632
        n_state = sum(
            int(x.size) for x in jax.tree_util.tree_leaves(state)
            if hasattr(x, "size")
        )
        assert n_state < 0.01 * n_param, (
            f"adafactor state {n_state} elements for {n_param} params"
        )


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        from plangen_tpu.train.checkpoint import PlanGenCheckpointer

        params = vlm.init(KEY, TINY, dtype=jnp.float32)
        cfg = TrainConfig()
        tx, _ = make_optimizer(cfg.optim, params, "stage3")
        state = init_train_state(params, tx)
        ckpt = PlanGenCheckpointer(str(tmp_path / "ckpt"), total_limit=2)
        ckpt.save(5, state)
        assert ckpt.latest_step() == 5
        restored = ckpt.restore(state)
        np.testing.assert_array_equal(
            np.asarray(restored.params["gen_embed"]), np.asarray(state.params["gen_embed"])
        )
        assert int(restored.step) == int(state.step)

    def test_rotation(self, tmp_path):
        from plangen_tpu.train.checkpoint import PlanGenCheckpointer

        params = {"w": jnp.ones((2, 2))}
        import optax

        tx = optax.sgd(1e-3)
        state = TrainState(params, tx.init(params), jnp.int32(0))
        ckpt = PlanGenCheckpointer(str(tmp_path / "ckpt"), total_limit=2)
        for s in [1, 2, 3]:
            ckpt.save(s, state)
        assert ckpt.latest_step() == 3
        assert 1 not in ckpt.manager.all_steps()


class TestMesh:
    def test_create_mesh_dp(self):
        from plangen_tpu.parallel.mesh import create_mesh

        mesh = create_mesh({"data": -1, "model": 1})
        assert mesh.shape["data"] == 8

    def test_tp_shardings(self):
        from plangen_tpu.parallel.mesh import create_mesh, param_shardings

        params = vlm.init(KEY, TINY, dtype=jnp.float32)
        mesh = create_mesh({"data": 2, "model": 4})
        sh = param_shardings(params, mesh)
        q = sh["language_model"]["layers"]["q_proj"]
        assert q.spec == jax.sharding.PartitionSpec(None, None, "model")
        vqp = sh["gen_vision_model"]["quant_conv"]["w"]
        assert vqp.spec == jax.sharding.PartitionSpec()

    def test_dp_train_step_on_mesh(self):
        """Full multi-task train step over a 4x2 dp x tp mesh (virtual CPU)."""
        from plangen_tpu.parallel.mesh import batch_sharding, create_mesh, shard_params

        mesh = create_mesh({"data": 4, "model": 2})
        params = vlm.init(KEY, TINY, dtype=jnp.float32)
        params = shard_params(params, mesh)
        cfg = TrainConfig()
        tx, _ = make_optimizer(cfg.optim, params, "stage3")
        flows = ((0, "uni"), (1, "mmu"), (2, "plan"))
        step = make_train_step(TINY, cfg, tx, PAD, flows, compute_dtype=jnp.float32)
        state = init_train_state(params, tx)
        batches = make_batches(B=4)
        bs = batch_sharding(mesh)
        batches = jax.tree_util.tree_map(lambda x: jax.device_put(x, bs), batches)
        state, metrics = step(state, batches)
        assert np.isfinite(float(metrics["loss"]))


class TestRemat:
    def test_gradient_checkpointing_matches(self):
        """remat (per-layer jax.checkpoint) must not change loss or grads."""
        params = vlm.init(KEY, TINY, dtype=jnp.float32)
        batches = make_batches()
        results = {}
        for remat in [False, True]:
            cfg = TrainConfig(gradient_checkpointing=remat)
            tx, _ = make_optimizer(cfg.optim, params, "stage3")
            step = make_train_step(
                TINY, cfg, tx, PAD, ((2, "plan"),), compute_dtype=jnp.float32,
                donate=False,
            )
            state = init_train_state(params, tx)
            _, metrics = step(state, batches)
            results[remat] = float(metrics["loss"])
        np.testing.assert_allclose(results[False], results[True], rtol=1e-6)


class TestGradAccumulation:
    """optax.MultiSteps composed with masking, set_to_zero, and shardings
    (reference: accelerator.accumulate, train.py:170)."""

    def _make(self, accum_steps, params):
        cfg = TrainConfig(
            optim=OptimConfig(
                learning_rate=1e-3, gradient_accumulation_steps=accum_steps
            )
        )
        tx, mask = make_optimizer(cfg.optim, params, "stage3")
        step = make_train_step(
            TINY, cfg, tx, PAD, ((2, "plan"),), compute_dtype=jnp.float32,
            donate=False,
        )
        return step, init_train_state(params, tx), mask

    def test_two_identical_microbatches_match_one_plain_step(self):
        """With microbatch A fed twice, the k=2 averaged gradient equals
        grad(A), so params after the accumulation boundary must match one
        un-accumulated step bit-for-bit (same clip, same masked AdamW)."""
        params = vlm.init(KEY, TINY, dtype=jnp.float32)
        batches = make_batches()

        step_acc, state_acc, _ = self._make(2, params)
        step_plain, state_plain, _ = self._make(1, params)

        # micro-step 1: mid-accumulation, updates must be zero
        state_mid, _ = step_acc(state_acc, batches)
        for b, a in zip(
            jax.tree_util.tree_leaves(state_acc.params),
            jax.tree_util.tree_leaves(state_mid.params),
        ):
            np.testing.assert_array_equal(np.asarray(b), np.asarray(a))

        # micro-step 2: boundary — the averaged grad is applied
        state_done, _ = step_acc(state_mid, batches)
        state_ref, _ = step_plain(state_plain, batches)
        for got, want in zip(
            jax.tree_util.tree_leaves(state_done.params),
            jax.tree_util.tree_leaves(state_ref.params),
        ):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-7
            )

    def test_frozen_leaves_stay_frozen_through_accumulation(self):
        params = vlm.init(KEY, TINY, dtype=jnp.float32)
        step, state, mask = self._make(2, params)
        assert not any(jax.tree_util.tree_leaves(mask["gen_vision_model"]))
        s = state
        for _ in range(4):  # two full accumulation windows
            s, metrics = step(s, make_batches())
        for b, a in zip(
            jax.tree_util.tree_leaves(state.params["gen_vision_model"]),
            jax.tree_util.tree_leaves(s.params["gen_vision_model"]),
        ):
            np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
        # trainable leaves did move at the boundaries
        assert not np.array_equal(
            np.asarray(state.params["language_model"]["layers"]["q_proj"]),
            np.asarray(s.params["language_model"]["layers"]["q_proj"]),
        )
        assert np.isfinite(float(metrics["loss"]))

    def test_accumulation_on_mesh_with_state_shardings(self):
        """MultiSteps' accumulator state must survive out_shardings pinning
        on a dp x tp mesh (its acc_grads mirror the param tree)."""
        from plangen_tpu.parallel.mesh import (
            batch_sharding, create_mesh, normalize_state_shardings, shard_params,
        )

        mesh = create_mesh({"data": 4, "model": 2})
        params = vlm.init(KEY, TINY, dtype=jnp.float32)
        params = shard_params(params, mesh)
        cfg = TrainConfig(optim=OptimConfig(gradient_accumulation_steps=2))
        tx, _ = make_optimizer(cfg.optim, params, "stage3")
        state = init_train_state(params, tx)
        state, shardings = normalize_state_shardings(state, mesh)
        step = make_train_step(
            TINY, cfg, tx, PAD, ((2, "plan"),), compute_dtype=jnp.float32,
            donate=False, state_shardings=shardings,
        )
        bs = batch_sharding(mesh)
        batches = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, bs), make_batches(B=4)
        )
        for _ in range(2):
            state, metrics = step(state, batches)
        assert np.isfinite(float(metrics["loss"]))


class TestTrainerFSDP:
    def test_trainer_fsdp_shards_and_trains(self, tmp_path):
        """train.fsdp=True: large params shard over the data axis end to end
        through the Trainer (masters + Adam moments follow)."""
        from jax.sharding import PartitionSpec as P

        from plangen_tpu.cli import load_config
        from plangen_tpu.train.trainer import Trainer

        cfg = load_config("configs/toy_smoke.py", [
            f"train.output_dir={tmp_path}/run",
            "train.fsdp=True",
            "train.fsdp_min_size=1000",
            "generation.max_new_text_tokens=4",
        ])
        t = Trainer(cfg)
        emb = t.state.params["language_model"]["embed_tokens"]
        assert emb.sharding.spec != P()  # actually sharded
        m = t.fit(max_steps=2)
        assert np.isfinite(m["loss"])
        # layouts survived the update (out_shardings pinned)
        emb2 = t.state.params["language_model"]["embed_tokens"]
        assert emb2.sharding.spec == emb.sharding.spec


class TestFailureDetection:
    def test_nonfinite_loss_checkpoints_and_raises(self, tmp_path):
        from plangen_tpu.cli import load_config
        from plangen_tpu.train.trainer import Trainer

        cfg = load_config("configs/toy_smoke.py", [
            f"train.output_dir={tmp_path}/run",
            "generation.max_new_text_tokens=4",
        ])
        t = Trainer(cfg)
        real_step = t.step_fn

        def poisoned(state, batches):
            state, metrics = real_step(state, batches)
            metrics["loss"] = jnp.float32(float("nan"))
            return state, metrics

        t.step_fn = poisoned
        with pytest.raises(FloatingPointError, match="non-finite loss"):
            t.fit(max_steps=1)
        # post-mortem checkpoint written
        assert t.ckpt.latest_step() == 1


class TestTrainerResume:
    def test_resume_from_latest(self, tmp_path):
        """fit 2 steps -> new Trainer -> maybe_resume picks up step 2
        (reference resume='latest', base_system.py:127-164)."""
        from plangen_tpu.cli import load_config
        from plangen_tpu.train.trainer import Trainer

        opts = [
            f"train.output_dir={tmp_path}/run",
            "train.checkpointing_steps=2",
            "generation.max_new_text_tokens=4",
        ]
        cfg = load_config("configs/toy_smoke.py", opts)
        t1 = Trainer(cfg)
        t1.fit(max_steps=2)
        assert t1.ckpt.latest_step() == 2

        t2 = Trainer(cfg)
        start = t2.maybe_resume()
        assert start == 2
        q1 = np.asarray(t1.state.params["language_model"]["layers"]["q_proj"])
        q2 = np.asarray(t2.state.params["language_model"]["layers"]["q_proj"])
        np.testing.assert_array_equal(q1, q2)


class TestValidationCadence:
    def test_validate_runs_at_cadence_and_logs_metrics(self, tmp_path):
        """fit() drives trainer.validate every validation_steps; a plan-task
        test workload produces layout metrics in the JSONL stream under val/
        keys, sized by train.val_max_len (the old max_len=1 default made the
        cadence a near-no-op — VERDICT r2)."""
        import json as _json

        from plangen_tpu.cli import load_config
        from plangen_tpu.train.trainer import Trainer

        cfg = load_config("configs/toy_smoke.py", [
            f"train.output_dir={tmp_path}/run",
            "train.validation_steps=2",
            "train.val_max_len=2",
            "train.test_data.task_type=plan",
            "train.test_data.data_name=toy",
            "train.test_data.batch_size=2",
            "generation.max_new_text_tokens=4",
        ])
        t = Trainer(cfg)
        calls = []
        orig = t.validate

        def spy(step, params=None, max_len=None):
            calls.append(step)
            return orig(step, params=params, max_len=max_len)

        t.fit(max_steps=2, validate_fn=spy)
        assert calls == [2]
        # val/ metrics landed in the trainer's JSONL stream
        log_path = None
        for root, _, files in __import__("os").walk(f"{tmp_path}/run"):
            if "metrics.jsonl" in files:
                log_path = f"{root}/metrics.jsonl"
        assert log_path is not None
        rows = [_json.loads(l) for l in open(log_path)]
        val_rows = [r for r in rows if any(k.startswith("val/") for k in r)]
        assert val_rows, f"no val/ metrics in {rows}"
        # validation artifacts sized by val_max_len (2 batches x 2 samples)
        import os as _os

        vdir = f"{tmp_path}/run/val/toy_plan_2"
        assert _os.path.isdir(vdir)


class TestRematPolicy:
    """VERDICT r5 lever: selective save policies (ops/remat.py) must be
    numerically identical to full remat — they change WHAT the backward
    saves, not what it computes."""

    def _loss_and_grads(self, policy, remat=True):
        from plangen_tpu.train.step import make_loss_fn

        params = vlm.init(KEY, TINY, dtype=jnp.float32)
        cfg = TrainConfig(gradient_checkpointing=remat, remat_policy=policy)
        loss_fn = make_loss_fn(TINY, cfg, PAD, ((0, "uni"), (2, "plan")),
                               compute_dtype=jnp.float32)
        (loss, _), grads = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True)
        )(params, make_batches())
        return float(loss), grads

    def test_dots_policy_matches_full(self):
        l_full, g_full = self._loss_and_grads("full")
        l_dots, g_dots = self._loss_and_grads("dots")
        l_none, g_none = self._loss_and_grads("full", remat=False)
        np.testing.assert_allclose(l_dots, l_full, rtol=1e-6)
        np.testing.assert_allclose(l_none, l_full, rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(g_full),
                        jax.tree_util.tree_leaves(g_dots)):
            # saved-vs-recomputed backward reassociates fp32 reductions —
            # ulp-level drift only (measured max 3e-6 abs / 2e-4 rel)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-5)

    def test_unknown_policy_rejected(self):
        from plangen_tpu.ops.remat import wrap_remat

        with pytest.raises(ValueError, match="unknown remat policy"):
            wrap_remat(lambda x: x, "everything")


class TestFreezeStopGrad:
    """Freeze-aware backward (make_train_step trainable_mask): stop_gradient
    on frozen leaves must leave the training trajectory EXACTLY unchanged —
    frozen grads were already zeroed by optim.py's set_to_zero."""

    @pytest.mark.parametrize("mode", ["stage1", "stage3", "lora"])
    def test_two_steps_identical(self, mode):
        params = vlm.init(KEY, TINY, dtype=jnp.float32)
        if mode == "lora":
            from plangen_tpu.train.lora import add_lora, init_lora

            params = add_lora(
                params, init_lora(jax.random.PRNGKey(2), TINY.llama,
                                  rank=4, alpha=8))
        cfg = TrainConfig(gradient_checkpointing=True)
        batches = make_batches()
        finals = {}
        for use_mask in (False, True):
            tx, mask = make_optimizer(cfg.optim, params, mode)
            step = make_train_step(
                TINY, cfg, tx, PAD, ((0, "uni"), (1, "mmu"), (2, "plan")),
                compute_dtype=jnp.float32, donate=False,
                trainable_mask=mask if use_mask else None,
            )
            state = init_train_state(params, tx)
            for _ in range(2):
                state, metrics = step(state, batches)
            finals[use_mask] = (state.params, float(metrics["loss"]))
        np.testing.assert_allclose(finals[True][1], finals[False][1],
                                   rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(finals[False][0]),
                        jax.tree_util.tree_leaves(finals[True][0])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)


class TestTrainAblate:
    """Diagnostic component ablations (tools/bench_train_budget.py) must
    compile and step with finite losses; production steps never set them."""

    def test_ablated_step_runs_finite(self):
        params = vlm.init(KEY, TINY, dtype=jnp.float32)
        cfg = TrainConfig(gradient_checkpointing=True)
        tx, mask = make_optimizer(cfg.optim, params, "stage3")
        step = make_train_step(
            TINY, cfg, tx, PAD, ((0, "uni"), (1, "mmu"), (2, "plan")),
            compute_dtype=jnp.float32, donate=False, trainable_mask=mask,
            ablate=frozenset({"vq", "siglip", "heads"}),
        )
        state = init_train_state(params, tx)
        state, metrics = step(state, make_batches())
        for k, v in metrics.items():
            assert np.isfinite(float(v)), k
