"""CLI config-loading tests (no device work)."""

import pytest

from plangen_tpu.cli import load_config
from plangen_tpu.config import FlowConfig


class TestLoadConfig:
    def test_default(self):
        cfg = load_config(None, [])
        assert cfg.generation.cfg_weight == 5.0

    def test_opt_overrides(self):
        cfg = load_config(None, ["generation.cfg_weight=7.5", "janus_hw=384"])
        assert cfg.generation.cfg_weight == 7.5

    def test_lowercase_booleans_parse_as_bool(self):
        # "false" must not survive as a truthy string (silent misconfig)
        cfg = load_config(
            None, ["use_textual=false", "generation.jacobi=true"]
        )
        assert cfg.use_textual is False
        assert cfg.generation.jacobi is True
        cfg = load_config(None, ["params_path=none"])
        assert cfg.params_path is None

    def test_quoted_reserved_literal_stays_string(self):
        # bare true/false/none/null are reserved (they coerce); quoting is
        # the documented escape for string-typed fields (config._parse_value)
        cfg = load_config(None, ['generation.neg_prompt="none"'])
        assert cfg.generation.neg_prompt == "none"

    def test_flow_dict_normalization(self):
        cfg = load_config(
            None,
            [
                'train.train_data=({"task_type":"uni","data_name":"toy","batch_size":4},)'
            ],
        )
        flow = cfg.train.train_data[0]
        assert isinstance(flow, FlowConfig)
        assert flow.batch_size == 4

    def test_config_module(self):
        cfg = load_config("configs/toy_smoke.py", [])
        assert cfg.model.llama.hidden_size == 64
        assert len(cfg.train.train_data) == 3

    def test_config_module_plus_opt(self):
        cfg = load_config("configs/toy_smoke.py", ["train.max_train_steps=5"])
        assert cfg.train.max_train_steps == 5

    def test_bad_override(self):
        with pytest.raises(KeyError):
            load_config(None, ["nonexistent.key=1"])


class TestValidateConfig:
    def test_numhw_required_for_nontextual(self):
        import pytest

        from plangen_tpu.tasks.eval import build_pipeline

        cfg = load_config(None, ["use_textual=false"])
        with pytest.raises(ValueError, match="use_numhw_tokens"):
            build_pipeline(cfg)

    def test_kv_a8_requires_quantize(self):
        import pytest

        from plangen_tpu.config import validate_config

        cfg = load_config(None, ["generation.kv_a8=true"])
        with pytest.raises(ValueError, match="quantize"):
            validate_config(cfg)

    def test_speculative_excludes_quantize(self):
        import pytest

        from plangen_tpu.config import validate_config

        cfg = load_config(
            None, ["generation.speculative=true", "generation.quantize=int8"]
        )
        with pytest.raises(ValueError, match="speculative"):
            validate_config(cfg)

    def test_valid_combinations_pass(self):
        from plangen_tpu.config import validate_config

        validate_config(load_config(None, []))
        validate_config(load_config(
            None, ["use_textual=false", "use_numhw_tokens=true"]
        ))
        validate_config(load_config(
            None, ["generation.quantize=int8", "generation.kv_a8=true"]
        ))


def test_version_flag_prints_package_version(capsys):
    import plangen_tpu
    from plangen_tpu.cli import main

    with pytest.raises(SystemExit) as e:
        main(["--version"])
    assert e.value.code == 0
    assert plangen_tpu.__version__ in capsys.readouterr().out
