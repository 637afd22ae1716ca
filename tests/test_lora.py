"""LoRA adapter tests."""

import jax
import jax.numpy as jnp
import numpy as np

from plangen_tpu.config import PlanGenModelConfig, TrainConfig
from plangen_tpu.models import llama, vlm
from plangen_tpu.train.lora import add_lora, init_lora, merge_lora
from plangen_tpu.train.optim import make_optimizer, trainable_mask
from plangen_tpu.train.step import init_train_state, make_train_step

TINY = PlanGenModelConfig.tiny()
KEY = jax.random.PRNGKey(0)


def _params_with_lora(rank=4):
    params = vlm.init(KEY, TINY, dtype=jnp.float32)
    lora = init_lora(jax.random.PRNGKey(1), TINY.llama, rank=rank, alpha=8)
    return add_lora(params, lora)


class TestLoRA:
    def test_zero_b_is_identity(self):
        """Fresh LoRA (B=0) must not change the forward output."""
        params = vlm.init(KEY, TINY, dtype=jnp.float32)
        with_lora = _params_with_lora()
        ids = jnp.arange(6)[None]
        x = llama.embed(params["language_model"], ids)
        h0, _ = llama.forward(params["language_model"], TINY.llama, x, jnp.ones((1, 6)))
        h1, _ = llama.forward(
            with_lora["language_model"], TINY.llama, x, jnp.ones((1, 6))
        )
        np.testing.assert_allclose(np.asarray(h0), np.asarray(h1), atol=1e-6)

    def test_nonzero_b_changes_output(self):
        with_lora = _params_with_lora()
        lm = with_lora["language_model"]
        lm["lora"]["q_proj"]["b"] = (
            jnp.ones_like(lm["lora"]["q_proj"]["b"]) * 0.1
        )
        params0 = vlm.init(KEY, TINY, dtype=jnp.float32)
        ids = jnp.arange(6)[None]
        x = llama.embed(params0["language_model"], ids)
        h0, _ = llama.forward(
            params0["language_model"], TINY.llama, x, jnp.ones((1, 6))
        )
        h1, _ = llama.forward(lm, TINY.llama, x, jnp.ones((1, 6)))
        assert not np.allclose(np.asarray(h0), np.asarray(h1))

    def test_merge_matches_adapter_forward(self):
        with_lora = _params_with_lora()
        lm = with_lora["language_model"]
        # random B so the adapter actually does something
        for t in ["q_proj", "k_proj", "v_proj", "o_proj"]:
            lm["lora"][t]["b"] = jax.random.normal(
                jax.random.PRNGKey(2), lm["lora"][t]["b"].shape
            ) * 0.05
        ids = jnp.arange(6)[None]
        x = llama.embed(lm, ids)
        h_adapter, _ = llama.forward(lm, TINY.llama, x, jnp.ones((1, 6)))
        merged = merge_lora(with_lora)
        assert "lora" not in merged["language_model"]
        h_merged, _ = llama.forward(
            merged["language_model"], TINY.llama, x, jnp.ones((1, 6))
        )
        np.testing.assert_allclose(
            np.asarray(h_adapter), np.asarray(h_merged), atol=1e-4
        )

    def test_lora_mask_and_training(self):
        params = _params_with_lora()
        mask = trainable_mask(params, "lora")
        lora_mask = dict(mask["language_model"]["lora"])
        assert lora_mask.pop("scaling") is False  # constant alpha/r stays frozen
        assert all(jax.tree_util.tree_leaves(lora_mask))
        assert not any(
            jax.tree_util.tree_leaves(mask["language_model"]["layers"])
        )
        # one train step: only lora params move
        cfg = TrainConfig()
        tx, _ = make_optimizer(cfg.optim, params, "lora")
        step = make_train_step(
            TINY, cfg, tx, 2, ((2, "plan"),), compute_dtype=jnp.float32,
            donate=False,
        )
        state = init_train_state(params, tx)
        batch = {
            2: {
                "input_ids": jnp.arange(8)[None].astype(jnp.int32),
                "attn_mask": jnp.ones((1, 8), dtype=jnp.int32),
            }
        }
        state2, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))
        base_b = np.asarray(state.params["language_model"]["layers"]["q_proj"])
        base_a = np.asarray(state2.params["language_model"]["layers"]["q_proj"])
        np.testing.assert_array_equal(base_b, base_a)  # base frozen
        la = np.asarray(state.params["language_model"]["lora"]["q_proj"]["a"])
        lb = np.asarray(state2.params["language_model"]["lora"]["q_proj"]["a"])
        assert not np.array_equal(la, lb)  # adapters trained
