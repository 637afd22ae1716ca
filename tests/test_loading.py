"""Weight resolution: every entry point can actually load real weights.

Round-2 gap fix: eval/serve/train previously always random-initialized;
now they resolve cfg.params_path (orbax artifact) or cfg.janus_path (HF
checkout, converted on the fly) through convert/loading.load_params.
"""

import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from plangen_tpu.cli import load_config
from plangen_tpu.config import PlanGenModelConfig
from plangen_tpu.convert.loading import load_params

sys.path.insert(0, str(Path(__file__).parent))

from test_golden_parity import make_janus_fixture_dir  # noqa: E402


@pytest.fixture(scope="module")
def janus_dir(tmp_path_factory):
    tiny = PlanGenModelConfig.tiny()
    return make_janus_fixture_dir(tmp_path_factory.mktemp("janus"), tiny)


class TestLoadParams:
    def test_none_when_no_weights(self):
        cfg = load_config("configs/toy_smoke.py", [])
        assert load_params(cfg) is None

    def test_loads_from_janus_path(self, janus_dir):
        cfg = load_config("configs/toy_smoke.py", [f"janus_path={janus_dir}"])
        params = load_params(cfg, dtype=jnp.float32)
        assert params is not None
        assert params["language_model"]["layers"]["q_proj"].shape[0] == 2

    def test_orbax_artifact_round_trip(self, janus_dir, tmp_path):
        from plangen_tpu.cli import main

        out = tmp_path / "artifact"
        import plangen_tpu.config as config_mod

        tiny = PlanGenModelConfig.tiny()
        orig = config_mod.PlanGenModelConfig
        config_mod.PlanGenModelConfig = lambda: tiny
        try:
            main(["convert", "--janus-path", str(janus_dir), "--out", str(out)])
        finally:
            config_mod.PlanGenModelConfig = orig

        cfg = load_config("configs/toy_smoke.py", [f"params_path={out}"])
        via_artifact = load_params(cfg, dtype=jnp.float32)
        cfg2 = load_config("configs/toy_smoke.py", [f"janus_path={janus_dir}"])
        via_torch = load_params(cfg2, dtype=jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(via_artifact["gen_embed"]),
            np.asarray(via_torch["gen_embed"]),
        )

    def test_eval_pipeline_uses_loaded_weights(self, janus_dir):
        from plangen_tpu.tasks.eval import build_pipeline

        cfg = load_config("configs/toy_smoke.py", [
            f"janus_path={janus_dir}",
            "generation.max_new_text_tokens=4",
        ])
        pipe = build_pipeline(cfg)
        want = load_params(cfg)  # same source
        np.testing.assert_array_equal(
            np.asarray(pipe.params["gen_embed"]),
            np.asarray(want["gen_embed"]),
        )

    def test_trainer_starts_from_converted_base(self, janus_dir, tmp_path):
        from plangen_tpu.train.trainer import Trainer

        cfg = load_config("configs/toy_smoke.py", [
            f"janus_path={janus_dir}",
            f"train.output_dir={tmp_path}/run",
            "generation.max_new_text_tokens=4",
        ])
        t = Trainer(cfg)
        want = load_params(cfg, dtype=jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(t.params["gen_embed"]), np.asarray(want["gen_embed"])
        )


class TestQuantizedArtifacts:
    """`cli convert --quantize` writes a directly-servable quantized tree;
    loading must keep scales fp32 and build_pipeline must not re-quantize."""

    @pytest.fixture(scope="class")
    def q8_artifact(self, janus_dir, tmp_path_factory):
        from plangen_tpu.cli import main
        import plangen_tpu.config as config_mod

        out = tmp_path_factory.mktemp("q8") / "artifact"
        tiny = PlanGenModelConfig.tiny()
        orig = config_mod.PlanGenModelConfig
        config_mod.PlanGenModelConfig = lambda: tiny
        try:
            main(["convert", "--janus-path", str(janus_dir),
                  "--out", str(out), "--quantize", "int8"])
        finally:
            config_mod.PlanGenModelConfig = orig
        return out

    def test_scales_stay_fp32_through_load(self, q8_artifact):
        cfg = load_config("configs/toy_smoke.py", [f"params_path={q8_artifact}"])
        params = load_params(cfg)  # default bf16 cast for dense weights
        q = params["language_model"]["layers"]["q_proj"]
        assert q["w_q8"].dtype == jnp.int8
        assert q["scale"].dtype == jnp.float32  # NOT downcast to bf16
        assert params["gen_embed"].dtype == jnp.bfloat16  # dense leaves cast

    def test_pipeline_skips_requantize_and_runs(self, q8_artifact):
        from plangen_tpu.tasks.eval import build_pipeline

        cfg = load_config("configs/toy_smoke.py", [
            f"params_path={q8_artifact}",
            "generation.quantize=int8",
            "generation.max_new_text_tokens=4",
        ])
        pipe = build_pipeline(cfg)
        assert "w_q8" in pipe.params["language_model"]["layers"]["q_proj"]
        out = pipe.plan(["two cats"])
        assert len(out) == 1

    def test_artifact_without_config_engages_quantized_cache(self, q8_artifact):
        """A pre-quantized artifact with generation.quantize=None must infer
        the mode (incl. the int8 KV cache), not run a bf16 cache silently."""
        from plangen_tpu.tasks.eval import build_pipeline

        cfg = load_config("configs/toy_smoke.py", [
            f"params_path={q8_artifact}",
            "generation.max_new_text_tokens=4",
        ])
        assert cfg.generation.quantize is None
        pipe = build_pipeline(cfg)
        assert pipe.gen.quantize == "int8"

    def test_norm_scale_leaves_still_cast(self, janus_dir, tmp_path):
        """The fp32-preservation for QUANT scales must not exempt LayerNorm
        weights (also named 'scale' in the SigLIP/VQ towers)."""
        from plangen_tpu.cli import main
        import plangen_tpu.config as config_mod

        out = tmp_path / "plain"
        tiny = PlanGenModelConfig.tiny()
        orig = config_mod.PlanGenModelConfig
        config_mod.PlanGenModelConfig = lambda: tiny
        try:
            main(["convert", "--janus-path", str(janus_dir), "--out", str(out)])
        finally:
            config_mod.PlanGenModelConfig = orig
        cfg = load_config("configs/toy_smoke.py", [f"params_path={out}"])
        params = load_params(cfg)  # default bf16
        leaves = jax.tree_util.tree_leaves_with_path(params)
        norm_scales = [
            (jax.tree_util.keystr(p), a) for p, a in leaves
            if jax.tree_util.keystr(p).endswith("['scale']")
        ]
        assert norm_scales, "expected LayerNorm 'scale' leaves in the tree"
        for name, a in norm_scales:
            assert a.dtype == jnp.bfloat16, f"{name} not cast: {a.dtype}"

    def test_quantize_mismatch_raises(self, q8_artifact):
        from plangen_tpu.tasks.eval import build_pipeline

        cfg = load_config("configs/toy_smoke.py", [
            f"params_path={q8_artifact}",
            "generation.quantize=int4",
        ])
        with pytest.raises(ValueError, match="already int8-quantized"):
            build_pipeline(cfg)
