"""Golden parity harness + HFTokenizerAdapter added-token ordering.

The harness (tools/golden_parity.py) must be runnable the day real weights
arrive, so it is exercised here end-to-end on a synthetic tiny checkpoint:
a safetensors state dict in the reference's HF naming + a minimal byte-level
fast tokenizer with the Janus special-token surface. The capture->compare
round trip proves the report plumbing; the token ids prove the adapter
replicates the reference's add_tokens ordering (plangen_base.py:110-127).
"""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))

from plangen_tpu.config import PlanGenModelConfig
from plangen_tpu.text.tokenizer import (
    BOS_TEXT,
    EOS_TEXT,
    GROUNDING_TOKENS,
    HFTokenizerAdapter,
    IMAGE_END_TAG,
    IMAGE_START_TAG,
    IMAGE_TAG,
    PAD_TEXT,
)

from test_convert import synth_state_dict  # noqa: E402  (same test dir)


def make_tokenizer_fixture(path: Path) -> int:
    """Write a minimal byte-level HF fast tokenizer with the Janus-style
    special surface (bos/eos/pad + image tags). Returns base vocab size."""
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    alphabet = pre_tokenizers.ByteLevel.alphabet()
    vocab = {ch: i for i, ch in enumerate(sorted(alphabet))}
    tok = Tokenizer(models.BPE(vocab=vocab, merges=[]))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok,
        bos_token=BOS_TEXT,
        eos_token=EOS_TEXT,
        pad_token=PAD_TEXT,
        # the real Janus tokenizer defines <unk>; without it here,
        # LlamaTokenizerFast (the class VLChatProcessor forces) would inject
        # its default <unk> on load and shift every added-token id by one
        unk_token="<unk>",
    )
    fast.add_special_tokens(
        {
            "additional_special_tokens": [
                IMAGE_TAG,
                IMAGE_START_TAG,
                IMAGE_END_TAG,
            ]
        }
    )
    path.mkdir(parents=True, exist_ok=True)
    fast.save_pretrained(str(path))
    return len(fast)


def make_janus_fixture_dir(path: Path, cfg: PlanGenModelConfig) -> Path:
    """Synthetic Janus checkpoint dir: HF-named safetensors + tokenizer."""
    from safetensors.numpy import save_file

    path.mkdir(parents=True, exist_ok=True)
    rng_sd = synth_state_dict(cfg)
    save_file(
        {k: np.asarray(v, dtype=np.float32) for k, v in rng_sd.items()},
        str(path / "model.safetensors"),
    )
    make_tokenizer_fixture(path)
    return path


class TestHFTokenizerAdapter:
    @pytest.fixture(scope="class")
    def tok_dir(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("tok")
        make_tokenizer_fixture(d)
        return d

    def test_grounding_token_ids_appended_in_reference_order(self, tok_dir):
        """plangen_base.py:112-119 adds the 6 grounding tokens in a fixed
        order; their ids must be base_vocab..base_vocab+5 in that order."""
        from transformers import AutoTokenizer

        base = len(AutoTokenizer.from_pretrained(str(tok_dir)))
        tok = HFTokenizerAdapter(str(tok_dir), use_special_tokens=True)
        for i, t in enumerate(GROUNDING_TOKENS):
            assert tok.token_id(t) == base + i, (t, tok.token_id(t), base + i)

    def test_numhw_ids_interleaved_after_grounding(self, tok_dir):
        """plangen_base.py:121-127: <h0>,<w0>,<h1>,<w1>,... appended after
        the grounding tokens."""
        from transformers import AutoTokenizer

        base = len(AutoTokenizer.from_pretrained(str(tok_dir)))
        tok = HFTokenizerAdapter(str(tok_dir), use_special_tokens=True, use_numhw=True)
        start = base + len(GROUNDING_TOKENS)
        for i in range(100):
            assert tok.token_id(f"<h{i}>") == start + 2 * i
            assert tok.token_id(f"<w{i}>") == start + 2 * i + 1

    def test_ids_stable_across_reload(self, tok_dir):
        a = HFTokenizerAdapter(str(tok_dir))
        b = HFTokenizerAdapter(str(tok_dir))
        assert a.special == b.special
        assert [a.token_id(t) for t in GROUNDING_TOKENS] == [
            b.token_id(t) for t in GROUNDING_TOKENS
        ]

    def test_special_tokens_encode_atomically(self, tok_dir):
        tok = HFTokenizerAdapter(str(tok_dir))
        ids = tok.encode("<grounding><ref>cat</ref></grounding>", add_bos=False)
        g = tok.special.grounding_ids
        assert ids[0] == g["<grounding>"]
        assert ids[1] == g["<ref>"]
        assert ids[-2] == g["</ref>"]
        assert ids[-1] == g["</grounding>"]
        # round-trip
        assert "cat" in tok.decode(ids)

    def test_pad_and_image_ids_resolved(self, tok_dir):
        tok = HFTokenizerAdapter(str(tok_dir))
        s = tok.special
        assert len({s.bos_id, s.eos_id, s.pad_id, s.image_tag_id,
                    s.image_start_id, s.image_end_id}) == 6


class TestGoldenParityHarness:
    @pytest.fixture(scope="class")
    def ckpt(self, tmp_path_factory):
        tiny = PlanGenModelConfig.tiny()
        d = tmp_path_factory.mktemp("janus_tiny")
        return make_janus_fixture_dir(d, tiny)

    def _run(self, ckpt, tmp_path, extra):
        import golden_parity

        out = tmp_path / "report.json"
        rc = golden_parity.main([
            "--janus-path", str(ckpt),
            "--cfg", str(Path(__file__).parent.parent / "configs/toy_smoke.py"),
            "--max-new-text-tokens", "4",
            "--out", str(out),
            *extra,
        ])
        return rc, json.loads(out.read_text())

    def test_capture_then_compare_matches(self, ckpt, tmp_path):
        golden_dir = tmp_path / "goldens"
        rc, report = self._run(ckpt, tmp_path, ["--capture", str(golden_dir)])
        assert rc == 0
        modes = {r["mode"] for r in report}
        assert modes == {"plan", "mmu", "edit", "rm", "uni", "losses",
                         "prompts"}
        tf = {r["mode"]: r for r in report}
        assert tf["edit"]["teacher_forced_equals_vq_encode"]
        assert tf["rm"]["teacher_forced_equals_vq_encode"]
        assert 0.0 < tf["uni"]["mean_prob_of_injected"] <= 1.0

        # second run against the captured goldens: everything token-exact
        rc2, report2 = self._run(ckpt, tmp_path, ["--golden", str(golden_dir)])
        assert rc2 == 0
        for r in report2:
            if r["mode"] == "uni":
                assert r["status"] == "logit_injection"
                # injecting our own stream: probabilities must be healthy
                assert r["mean_prob_of_injected"] > 0.0
            else:
                assert r["status"] == "match", r

    def test_mismatch_detected(self, ckpt, tmp_path):
        golden_dir = tmp_path / "goldens"
        self._run(ckpt, tmp_path, ["--capture", str(golden_dir)])
        plan = json.loads((golden_dir / "plan.json").read_text())
        plan["tokens"][0][0] = (plan["tokens"][0][0] + 1) % 250
        (golden_dir / "plan.json").write_text(json.dumps(plan))
        rc, report = self._run(
            ckpt, tmp_path, ["--golden", str(golden_dir), "--modes", "plan"]
        )
        assert rc == 1
        assert report[0]["status"] == "mismatch"
        assert report[0]["first_mismatch"]["pos"] == 0
