"""Batch-aware weight-format routing: generation.quantize='int8_kv'/'auto'.

Reference role: serving-side capability beyond the reference (its decode is
bf16-only, plangen_base.py:567-607). The routing encodes the MEASURED
crossover (BENCH_SWEEP.json): int4 weights win the weight-read-bound small
batches, bf16+int8KV wins at B>=48 images where M>=96 int-operand matmuls
run slower than bf16 through the MXU (DESIGN.md §8/§12).
"""

import dataclasses
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
from test_int4 import _int4_cfg

from plangen_tpu.config import (
    GenerationConfig,
    LlamaConfig,
    PlanGenConfig,
    PlanGenModelConfig,
    ProjectorConfig,
    SigLIPConfig,
    VQConfig,
    validate_config,
)
from plangen_tpu.models import vlm
from plangen_tpu.ops.quant import (
    _fuse_plan,
    quantize_lm_params_int4,
    quantize_lm_params_int4_shared,
)
from plangen_tpu.tasks.eval import _apply_quantize, _build_auto_int4
from plangen_tpu.tasks.pipeline import PlanGenPipeline
from plangen_tpu.tasks.processor import PlanGenProcessor
from plangen_tpu.text.tokenizer import ByteFallbackTokenizer

KEY = jax.random.PRNGKey(0)


def _int4_model_cfg() -> PlanGenModelConfig:
    # smallest full-model dims the int4 kernel's 128-lane tiling supports
    return PlanGenModelConfig(
        llama=_int4_cfg(),
        vision=SigLIPConfig(
            image_size=32, patch_size=16, width=32, layers=2, heads=2
        ),
        vq=VQConfig(
            codebook_size=256, codebook_dim=8, ch=8,
            ch_mult=(1, 1, 1, 1, 2), num_res_blocks=1, z_channels=16,
            group_norm_groups=4,
        ),
        aligner=ProjectorConfig(input_dim=32, n_embed=256, depth=2),
        gen_aligner=ProjectorConfig(input_dim=8, n_embed=256, depth=2),
        image_token_embed=256, image_token_size=256, gen_embed_dim=8,
    )


@pytest.fixture(scope="module")
def cfg():
    return _int4_model_cfg()


@pytest.fixture(scope="module")
def params(cfg):
    return vlm.init(KEY, cfg, dtype=jnp.bfloat16)


class TestSharedQuantizer:
    def test_untouched_subtrees_shared_by_reference(self, params):
        q = quantize_lm_params_int4_shared(params)
        # dual residency costs ONLY the packed LM leaves: everything the
        # quantizer doesn't touch must be the SAME array object
        assert q["vision_model"] is params["vision_model"]
        assert q["gen_vision_model"] is params["gen_vision_model"]
        assert (
            q["language_model"]["embed_tokens"]
            is params["language_model"]["embed_tokens"]
        )
        assert q["gen_head"]["fc1"] is params["gen_head"]["fc1"]
        # same-input groups pack fused (INT4_FUSED_GROUPS; MHA dims here)
        plan = _fuse_plan(params["language_model"]["layers"])
        assert set(plan) == {"qkv_proj", "o_proj", "gate_up_proj",
                             "down_proj"}
        for k in plan:
            assert "w_p4" in q["language_model"]["layers"][k]
        assert "w_p4" in q["gen_head"]["fc2"]["w"]

    def test_codes_match_eager_within_grid_step(self, params):
        """jit reassociates the absmax reduction, so codes may differ in
        the last grid step — never by more than one."""
        q_jit = quantize_lm_params_int4_shared(params)
        q_eager = quantize_lm_params_int4(params)
        a = np.asarray(q_jit["language_model"]["layers"]["qkv_proj"]["w_p4"])
        b = np.asarray(
            q_eager["language_model"]["layers"]["qkv_proj"]["w_p4"]
        )
        lo_d = np.abs((a.astype(np.int32) & 0xF) - (b.astype(np.int32) & 0xF))
        hi_d = np.abs((a.astype(np.int32) >> 4) - (b.astype(np.int32) >> 4))
        assert int(max(lo_d.max(), hi_d.max())) <= 1
        assert float(np.mean(lo_d != 0)) < 0.02


class TestConfigSurface:
    def test_unknown_mode_rejected(self):
        cfg = PlanGenConfig()
        cfg = dataclasses.replace(
            cfg, generation=dataclasses.replace(cfg.generation, quantize="int2")
        )
        with pytest.raises(ValueError, match="quantize"):
            validate_config(cfg)

    def test_int8_kv_leaves_weights_dense(self, params):
        out = _apply_quantize(params, "int8_kv")
        assert out is params  # bf16 weights untouched; cache flag elsewhere

    def test_int8_kv_engages_quantized_cache(self, cfg, params):
        tok = ByteFallbackTokenizer(vocab_size=cfg.llama.vocab_size)
        gen = GenerationConfig(quantize="int8_kv", max_new_text_tokens=4)
        proc = PlanGenProcessor(tok, gen=gen)
        pipe = PlanGenPipeline(params, cfg, proc)
        assert pipe._quantized_cache
        assert pipe._params_for(1) is params  # no dual tree: single form

    def test_auto_rejects_7b_scale(self, params):
        big = dataclasses.replace(
            _int4_model_cfg(),
            llama=LlamaConfig(
                vocab_size=1024, hidden_size=4096, intermediate_size=11008,
                num_layers=30, num_heads=32, num_kv_heads=32, head_dim=128,
            ),
        )
        with pytest.raises(ValueError, match="dual-host"):
            _build_auto_int4(params, big)

    def test_auto_rejects_prequantized_artifact(self, cfg, params):
        qp = quantize_lm_params_int4(params)
        with pytest.raises(ValueError, match="DENSE"):
            _build_auto_int4(qp, cfg)


class TestRouting:
    @pytest.fixture(scope="class")
    def pipe(self, cfg, params):
        tok = ByteFallbackTokenizer(vocab_size=cfg.llama.vocab_size)
        gen = GenerationConfig(quantize="auto", max_new_text_tokens=4)
        proc = PlanGenProcessor(tok, gen=gen)
        return PlanGenPipeline(
            params, cfg, proc,
            params_int4=quantize_lm_params_int4_shared(params),
        )

    def test_routes_at_measured_crossover(self, pipe):
        thr = pipe.gen.auto_int4_max_rows
        assert pipe._params_for(thr) is pipe.params_int4
        assert pipe._params_for(thr + 1) is pipe.params
        assert pipe._params_for(2) is pipe.params_int4

    def test_image_gen_runs_on_both_routes(self, pipe, cfg):
        """One caption (2 CFG rows -> int4 route) and a forced dense route
        (threshold 0) both produce valid token grids from the SAME pipeline;
        the int8 KV cache layout is identical on both routes."""
        g = "<grounding><ref>cat</ref><box>[100, 100, 500, 500]</box></grounding>"
        out_int4 = pipe.layout_to_image(["a cat"], [g], seed=3)
        assert out_int4.image_tokens.shape == (1, cfg.image_seq_len)
        assert np.isfinite(out_int4.images).all()

        dense = dataclasses.replace(pipe.gen, auto_int4_max_rows=0)
        pipe_dense = PlanGenPipeline(
            pipe.params, cfg, pipe.proc, gen_cfg=dense,
            params_int4=pipe.params_int4,
        )
        out_dense = pipe_dense.layout_to_image(["a cat"], [g], seed=3)
        assert out_dense.image_tokens.shape == (1, cfg.image_seq_len)
        # routes differ only by weight precision: token grids need not match,
        # outputs must be finite and in range on both
        assert np.isfinite(out_dense.images).all()

    def test_text_decode_routes(self, pipe):
        out = pipe.plan(["a cat"])  # 1 row -> int4 route
        assert len(out) == 1 and out[0].startswith("<grounding>")

    def test_callers_pass_true_matmul_row_counts(self, pipe):
        """Pin the CALLERS' row arithmetic, not just _params_for's
        threshold: image decode must route by 2 x images x parallel_size
        CFG rows and text decode by batch rows — a regression to passing
        B images would route int4 up to 128 matmul rows (the measured-
        worse config) while every output-shape assertion stays green."""
        calls = []
        orig = pipe._params_for

        def spy(n_rows):
            calls.append(n_rows)
            return orig(n_rows)

        pipe._params_for = spy
        try:
            g = ("<grounding><ref>cat</ref><box>[100, 100, 500, 500]</box>"
                 "</grounding>")
            pipe.layout_to_image(["a cat", "a dog"], [g, g], seed=1,
                                 parallel_size=2)
            assert calls[-1] == 2 * 2 * 2  # 2 images x ps 2 x CFG dual
            pipe.plan(["a", "b", "c"])
            assert calls[-1] == 3  # text rows = batch, no CFG dual
        finally:
            pipe._params_for = orig
