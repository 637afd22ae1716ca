"""Cross-implementation parity: OUR framework vs the ACTUAL torch reference.

tools/capture_reference.py imports /root/reference's `System` (with import
shims for its missing deps) and captures golden token dumps for the pinned
parity inputs; tools/golden_parity.py then compares our outputs against them.
On a shared tiny random checkpoint every deterministic mode must be
TOKEN-EXACT across the two implementations:

  plan — reference HF `generate` greedy vs our fused KV-cached greedy scan
  mmu  — torch SigLIP + embed splice + greedy vs our NHWC scan stack
  edit/rm — torch VQ encode + teacher-forced CFG loop vs our jitted loop

The capture runs in a SUBPROCESS because the reference shims patch
sys.modules and torch globals (reference_shims.py) — they must not leak into
this process. This test found a real parity bug on first run: the reference's
MMU prompts include VLChatProcessor's default system prompt (process_one,
processing_vlm.py:292-295) while the uni/t2i wrappers pass system_prompt=""
— our templates now mirror that split (text/chat_template.py).
"""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))

from plangen_tpu.config import PlanGenModelConfig

from test_convert import synth_state_dict  # noqa: E402
from test_golden_parity import make_tokenizer_fixture  # noqa: E402

REFERENCE = Path("/root/reference")
REPO = Path(__file__).parent.parent

pytestmark = pytest.mark.skipif(
    not (REFERENCE / "project/plangen/plangen_base.py").exists(),
    reason="torch reference checkout not available",
)


def make_random_fixture(path: Path, cfg: PlanGenModelConfig, seed=0) -> Path:
    """Tiny checkpoint loadable by BOTH implementations: HF-named random
    safetensors + tokenizer + the reference-side HF config files."""
    from safetensors.numpy import save_file

    from capture_reference import write_reference_configs

    path.mkdir(parents=True, exist_ok=True)
    sd = synth_state_dict(cfg)
    rs = np.random.RandomState(seed)
    sd = {k: rs.randn(*np.shape(v)).astype(np.float32) * 0.05 for k, v in sd.items()}
    for k in list(sd):
        if "norm" in k and k.endswith("weight") and sd[k].ndim == 1:
            sd[k] = np.ones_like(sd[k])
    save_file(sd, str(path / "model.safetensors"))
    make_tokenizer_fixture(path)
    write_reference_configs(path, cfg)
    return path


class TestCrossImplementationParity:
    # two independent random checkpoints: exact-match claims at a single
    # seed could hide an argmax-tie fluke
    @pytest.fixture(scope="class", params=[0, 3])
    def goldens(self, request, tmp_path_factory):
        seed = request.param
        d = tmp_path_factory.mktemp(f"janus_xtiny{seed}")
        make_random_fixture(d, PlanGenModelConfig.tiny(), seed=seed)
        out = tmp_path_factory.mktemp(f"goldens_ref{seed}")
        proc = subprocess.run(
            [
                sys.executable, str(REPO / "tools/capture_reference.py"),
                "--janus-path", str(d), "--tiny", "--out", str(out),
                "--modes", "plan,mmu,edit,rm,uni,losses,prompts",
                "--max-new-text-tokens", "6",
            ],
            capture_output=True, text=True, timeout=900,
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        return d, out

    def test_all_deterministic_modes_token_exact(self, goldens, tmp_path):
        import golden_parity

        ckpt, golden_dir = goldens
        report_path = tmp_path / "report.json"
        rc = golden_parity.main([
            "--janus-path", str(ckpt),
            "--cfg", str(REPO / "configs/toy_smoke.py"),
            "--max-new-text-tokens", "6",
            "--golden", str(golden_dir),
            "--modes", "plan,mmu,edit,rm,uni,losses,prompts",
            "--out", str(report_path),
        ])
        report = {r["mode"]: r for r in json.loads(report_path.read_text())}
        assert rc == 0
        for mode in ("plan", "mmu", "edit", "rm"):
            assert report[mode]["status"] == "match", (mode, report[mode])
        # sampled mode: RNG streams are not replicated; instead OUR
        # probability of each reference-sampled token must match the
        # probability the reference itself assigned when sampling it
        assert report["uni"]["status"] == "prob_match", report["uni"]
        assert report["uni"]["prob_parity"]["max_rel_diff"] < 5e-2
        # training numerics: per-flow losses within fp32 cross-framework
        # tolerance (loss_mmu informational on the tiny vocab — see mmu_note)
        losses = report["losses"]
        assert losses["status"] == "match", losses
        for k in ("loss_uni_t2i", "loss_uni_lm", "loss_plan_lm"):
            assert losses["rel_diffs"][k] < 2e-3, (k, losses)
        # prompt construction: exact id equality for every wrapper + padding
        assert report["prompts"]["status"] == "match", report["prompts"]

    def test_golden_files_complete(self, goldens):
        _, golden_dir = goldens
        for mode in ("plan", "mmu", "edit", "rm", "uni"):
            rec = json.loads((golden_dir / f"{mode}.json").read_text())
            assert rec["mode"] == mode
            assert rec["tokens"] and all(
                isinstance(t, int) for t in rec["tokens"][0]
            )


class TestNumhwParity:
    """numhw coordinate mode (use_textual=False + use_numhw_tokens=True)
    cross-implementation: 200 <hN>/<wN> tokenizer tokens added in the SAME
    order on both sides (plangen_base.py:121-127 / text/tokenizer.py), pinned
    layouts re-serialized to 0-99 coords by ONE shared transform
    (golden_parity.to_numhw_grounding)."""

    @pytest.fixture(scope="class")
    def goldens(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("janus_numhw")
        make_random_fixture(d, PlanGenModelConfig.tiny(), seed=1)
        out = tmp_path_factory.mktemp("goldens_numhw")
        proc = subprocess.run(
            [
                sys.executable, str(REPO / "tools/capture_reference.py"),
                "--janus-path", str(d), "--tiny", "--numhw", "--out", str(out),
                "--modes", "plan,edit,rm,losses,prompts",
                "--max-new-text-tokens", "6",
            ],
            capture_output=True, text=True, timeout=900,
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        return d, out

    def test_numhw_modes_token_exact(self, goldens, tmp_path):
        import golden_parity

        ckpt, golden_dir = goldens
        report_path = tmp_path / "report.json"
        rc = golden_parity.main([
            "--janus-path", str(ckpt),
            "--cfg", str(REPO / "configs/toy_smoke.py"),
            "--opt", "use_textual=false", "use_numhw_tokens=true",
            "--max-new-text-tokens", "6",
            "--golden", str(golden_dir),
            "--modes", "plan,edit,rm,losses,prompts",
            "--out", str(report_path),
        ])
        report = {r["mode"]: r for r in json.loads(report_path.read_text())}
        assert rc == 0
        for mode in ("plan", "edit", "rm", "prompts"):
            assert report[mode]["status"] == "match", (mode, report[mode])
        assert report["losses"]["status"] == "match", report["losses"]
        for k in ("loss_uni_t2i", "loss_uni_lm", "loss_plan_lm"):
            assert report["losses"]["rel_diffs"][k] < 2e-3

    def test_golden_prompts_contain_hw_tokens(self, goldens):
        _, golden_dir = goldens
        rec = json.loads((golden_dir / "prompts.json").read_text())
        assert "<h" in rec["grounding"] and "<w" in rec["grounding"]
        assert "[" not in rec["grounding"]  # no textual int lists


class TestTiny7BShapeParity:
    """7B family-member shape relationships (deeper stack, more heads, non-2x
    MLP, wider image_token_embed) at tiny dims: token-exact parity proves no
    1B dimension is hardcoded in either direction
    (three_party/Janus/README.md:115 lists the 7B member)."""

    @pytest.fixture(scope="class")
    def goldens(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("janus_tiny7b")
        make_random_fixture(d, PlanGenModelConfig.tiny_7b(), seed=2)
        out = tmp_path_factory.mktemp("goldens_tiny7b")
        proc = subprocess.run(
            [
                sys.executable, str(REPO / "tools/capture_reference.py"),
                "--janus-path", str(d), "--tiny", "--tiny-preset", "tiny_7b",
                "--out", str(out),
                "--modes", "plan,mmu,edit,losses,prompts",
                "--max-new-text-tokens", "6",
            ],
            capture_output=True, text=True, timeout=900,
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        return d, out

    def test_7b_shape_modes_token_exact(self, goldens, tmp_path):
        import golden_parity

        ckpt, golden_dir = goldens
        report_path = tmp_path / "report.json"
        rc = golden_parity.main([
            "--janus-path", str(ckpt),
            "--cfg", str(REPO / "configs/toy_smoke_7b.py"),
            "--max-new-text-tokens", "6",
            "--golden", str(golden_dir),
            "--modes", "plan,mmu,edit,losses,prompts",
            "--out", str(report_path),
        ])
        report = {r["mode"]: r for r in json.loads(report_path.read_text())}
        assert rc == 0
        for mode in ("plan", "mmu", "edit", "prompts"):
            assert report[mode]["status"] == "match", (mode, report[mode])
        assert report["losses"]["status"] == "match", report["losses"]
        for k in ("loss_uni_t2i", "loss_uni_lm", "loss_plan_lm"):
            assert report["losses"]["rel_diffs"][k] < 2e-3
