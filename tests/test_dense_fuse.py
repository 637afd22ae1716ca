"""Dense q|k|v projection fusion (ops/quant.py::fuse_dense_qkv).

One [I, 3H] dot replaces three [I, H] dots in the dense decode path.
MEASURED MIXED e2e and kept OPT-IN (generation.fuse_dense_qkv=False):
same-hour A/B on int8_kv showed B=1 +26% but B=32 -6% / B=64 -20% — the
isolated 1.13-1.19x layer microbench (tools/bench_dense_fuse.py) does not
survive the real program at M>=64. The transform must be BIT-identical
(output columns are independent, K accumulation unchanged), a no-op on
quantized trees, and honored by build_pipeline when opted in.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plangen_tpu.config import LlamaConfig, PlanGenConfig
from plangen_tpu.models import llama
from plangen_tpu.ops.quant import fuse_dense_qkv, quantize_lm_params

KEY = jax.random.PRNGKey(0)


def _cfg(n_heads=4, kv_heads=4):
    return LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=96,
        num_layers=2,
        num_heads=n_heads,
        num_kv_heads=kv_heads,
        head_dim=16,
    )


def _wrap(lm_params):
    return {"language_model": lm_params}


class TestTransform:
    @pytest.mark.parametrize("heads", [(4, 4), (4, 2)])
    def test_bit_identical_through_prefill_and_decode(self, heads):
        """Fused dense trees must produce EXACTLY the split trees' hidden
        states: the concat changes tiling, not math. (4, 2) = GQA — the
        triple must not fuse (q wider than kv), only the k|v pair."""
        from plangen_tpu.runtime.kvcache import init_kv_cache

        cfg = _cfg(*heads)
        params = llama.init(KEY, cfg, dtype=jnp.bfloat16)
        fused = fuse_dense_qkv(_wrap(params))["language_model"]
        if heads[0] == heads[1]:
            assert "qkv_proj" in fused["layers"]
            assert "q_proj" not in fused["layers"]
        else:
            assert "k_v_proj" in fused["layers"]
            assert "q_proj" in fused["layers"]  # stays split under GQA

        B, P = 2, 8
        embeds = jax.random.normal(
            jax.random.PRNGKey(5), (B, P, cfg.hidden_size), jnp.bfloat16
        )
        mask = jnp.ones((B, P + 2), dtype=jnp.int32)

        def run(p):
            cache = init_kv_cache(cfg, B, P + 2)
            h, cache = llama.forward(
                p, cfg, embeds, mask, positions=jnp.arange(P),
                kv_cache=cache,
            )
            h2, _ = llama.forward(
                p, cfg, h[:, -1:], mask, positions=jnp.arange(P, P + 1),
                kv_cache=cache,
            )
            return np.asarray(h2, np.float32)

        np.testing.assert_array_equal(run(fused), run(params))

    def test_idempotent(self):
        params = _wrap(llama.init(KEY, _cfg(), dtype=jnp.bfloat16))
        once = fuse_dense_qkv(params)
        twice = fuse_dense_qkv(once)
        assert set(twice["language_model"]["layers"]) == set(
            once["language_model"]["layers"]
        )
        # LEAF IDENTITY, not just key sets: a re-application that kept the
        # keys but re-concatenated/re-cast the fused leaf would ship
        # corrupted weights through a double-applied build path
        assert (twice["language_model"]["layers"]["qkv_proj"]
                is once["language_model"]["layers"]["qkv_proj"])

    def test_quantized_tree_passes_through(self):
        """int8 leaves are dicts — the dense fusion must not touch them
        (the int4/int8 paths handle their own layouts)."""
        params = _wrap(llama.init(KEY, _cfg(), dtype=jnp.bfloat16))
        # quantize_lm_params expects the full-tree layout with gen_head
        params["gen_head"] = {"fc2": {"w": jnp.zeros((8, 8), jnp.bfloat16)}}
        q = quantize_lm_params(params)
        fused = fuse_dense_qkv(q)
        assert "qkv_proj" not in fused["language_model"]["layers"]
        assert isinstance(fused["language_model"]["layers"]["q_proj"], dict)

    def test_untouched_subtrees_shared_by_reference(self):
        params = _wrap(llama.init(KEY, _cfg(), dtype=jnp.bfloat16))
        params["vision_model"] = {"w": jnp.ones((4, 4))}
        fused = fuse_dense_qkv(params)
        assert fused["vision_model"] is params["vision_model"]
        assert (fused["language_model"]["lm_head"]
                is params["language_model"]["lm_head"])


class TestPipelineWiring:
    def test_build_pipeline_default_keeps_split(self):
        """Default OFF: the e2e A/B showed the fusion loses at B>=32."""
        from plangen_tpu.tasks.eval import build_pipeline

        cfg = PlanGenConfig()
        cfg = dataclasses.replace(cfg, model=cfg.model.tiny())
        pipe = build_pipeline(cfg)
        layers = pipe.params["language_model"]["layers"]
        assert "q_proj" in layers and "qkv_proj" not in layers

    def test_build_pipeline_opt_in_fuses(self):
        from plangen_tpu.tasks.eval import build_pipeline

        cfg = PlanGenConfig()
        cfg = dataclasses.replace(
            cfg,
            model=cfg.model.tiny(),
            generation=dataclasses.replace(
                cfg.generation, fuse_dense_qkv=True
            ),
        )
        pipe = build_pipeline(cfg)
        layers = pipe.params["language_model"]["layers"]
        assert "qkv_proj" in layers  # tiny is MHA: the triple fuses

    def test_auto_opt_in_fuses_dense_route_int4_tree_intact(self):
        from plangen_tpu.tasks.eval import build_pipeline

        cfg = PlanGenConfig()
        cfg = dataclasses.replace(
            cfg,
            model=cfg.model.tiny(),
            generation=dataclasses.replace(
                cfg.generation, quantize="auto", fuse_dense_qkv=True
            ),
        )
        pipe = build_pipeline(cfg)
        assert "qkv_proj" in pipe.params["language_model"]["layers"]
        i4 = pipe.params_int4["language_model"]["layers"]
        assert isinstance(i4.get("qkv_proj"), dict)  # int4 fused form
