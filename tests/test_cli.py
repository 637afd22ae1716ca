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


class TestDoctor:
    """`cli doctor` — operability diagnostic (device probe runs a real
    subprocess dispatch once; the other cases skip it with --no-probe)."""

    def _run(self, argv, capsys):
        import json

        from plangen_tpu.cli import main

        code = 0
        try:
            main(["--platform", "cpu", "doctor"] + argv)
        except SystemExit as e:
            code = e.code
        out = capsys.readouterr().out
        return code, json.loads(out.strip().splitlines()[-1])

    def test_healthy_no_probe(self, capsys):
        code, rep = self._run(["--no-probe"], capsys)
        assert code == 0 and rep["ok"] is True
        assert rep["checks"]["deps"]["ok"] is True
        assert rep["versions"]["jax"]
        # probe skipped -> recorded as unevaluated, not passed
        assert rep["checks"]["device"]["ok"] is None

    def test_probe_reports_device_info(self, capsys):
        code, rep = self._run(["--probe-timeout", "300"], capsys)
        assert code == 0 and rep["device"]["ok"] is True
        assert rep["device"]["platform"] == "cpu"
        assert rep["device"]["device_count"] >= 1

    def test_missing_checkpoint_path_fails(self, capsys, tmp_path):
        code, rep = self._run(
            ["--no-probe", "--opt", f"janus_path='{tmp_path}/nope'"], capsys
        )
        assert code == 1 and rep["ok"] is False
        assert rep["checks"]["janus_path"]["ok"] is False

    def test_config_load_error_fails(self, capsys):
        code, rep = self._run(
            ["--no-probe", "--opt", "generation.quantize=int7"], capsys
        )
        assert code == 1
        assert rep["checks"]["config"]["ok"] is False
