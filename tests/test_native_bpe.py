"""Native C++ BPE engine vs HF fast tokenizers: encode/decode parity.

The fixture is a REAL trained byte-level BPE (tokenizers BpeTrainer over a
small corpus, so the merge table is non-trivial) saved as tokenizer.json —
the same format the Janus-Pro checkpoint ships. Reference role: the Rust
`tokenizers` dependency (SURVEY.md Table B).
"""

import json

import pytest

tokenizers = pytest.importorskip("tokenizers")

from plangen_tpu.text.bpe_native import (  # noqa: E402
    NativeBPE,
    bytes_to_unicode,
    native_bpe_available,
    pretokenize_gpt2,
)

pytestmark = pytest.mark.skipif(
    not native_bpe_available(), reason="libplangen_bpe.so not built"
)

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "a red sports car parked next to a tree near the river bank",
    "layout planning and layout-to-image generation with bounding boxes",
    "it's done, they're here, we've left, I'll stay, he'd go",
    "numbers 123 4567 89 and mixed a1b2c3",
    "punctuation!!! (parens) [brackets] {braces} <tags> semi;colon",
    "unicode: café naïve über straße 日本語",
    "whitespace   runs\nand\nnewlines\t tabs  end  ",
]

SAMPLES = CORPUS + [
    "",
    " ",
    "   ",
    "x",
    " leading space",
    "trailing space ",
    "double  space",
    "it's",
    "'s alone",
    "emoji \U0001f600 and ☃ snowman",
    "café 123 !?",
    "\n\nnl",
    "a\n b",
    " \nb",
    "mixed\t\n  \t ws",
    "<grounding>special<box>[1,2]</box></grounding>",
    "separators \x1c\x1d\x1e\x1f control",  # isspace() but NOT regex \s
]


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers

    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=400,
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
        special_tokens=["<pad>"],
        show_progress=False,
    )
    tok.train_from_iterator(CORPUS * 4, trainer)
    tok.add_special_tokens(["<grounding>", "</grounding>", "<box>", "</box>"])
    path = tmp_path_factory.mktemp("bpe") / "tokenizer.json"
    tok.save(str(path))
    spec = json.loads(path.read_text())
    assert spec["model"]["merges"], "fixture must exercise the merge loop"
    return tok, str(path)


class TestPretokenizer:
    def test_matches_hf_byte_level(self, trained):
        from tokenizers import pre_tokenizers

        pre = pre_tokenizers.ByteLevel(add_prefix_space=False)
        b2u = bytes_to_unicode()

        def to_alphabet(s):
            return "".join(b2u[b] for b in s.encode("utf-8"))

        for text in SAMPLES:
            hf = [p for p, _ in pre.pre_tokenize_str(text)]
            ours = [to_alphabet(p) for p in pretokenize_gpt2(text)]
            assert ours == hf, f"pretokenize mismatch on {text!r}"


class TestEncodeParity:
    def test_encode_matches_hf(self, trained):
        hf_tok, path = trained
        nat = NativeBPE(path)
        for text in SAMPLES:
            hf_ids = hf_tok.encode(text).ids
            ours = nat.encode(text)
            assert ours == hf_ids, (
                f"encode mismatch on {text!r}:\n hf  {hf_ids}\n ours {ours}"
            )

    def test_decode_roundtrip(self, trained):
        _, path = trained
        nat = NativeBPE(path)
        for text in SAMPLES:
            ids = nat.encode(text)
            assert nat.decode(ids) == text

    def test_total_size_counts_overlap_once(self, trained):
        """Tokens present in BOTH model.vocab and added_tokens (the trained
        fixture's '<pad>'; the real DeepSeek json's bos/eos/pad) must count
        once — a double-count shifts every subsequently added token id."""
        hf_tok, path = trained
        nat = NativeBPE(path)
        overlap = [t for t in nat.added if t in nat.vocab]
        assert overlap, "fixture must have vocab/added overlap to regress"
        assert nat.total_size == hf_tok.get_vocab_size(with_added_tokens=True)
        nat.add_tokens(["<new1>", "<new2>"])
        hf_tok.add_special_tokens(["<new1>", "<new2>"])
        assert nat.added["<new1>"] == hf_tok.token_to_id("<new1>")
        assert nat.added["<new2>"] == hf_tok.token_to_id("<new2>")

    def test_special_tokens_split(self, trained):
        hf_tok, path = trained
        nat = NativeBPE(path)
        text = "a <grounding>cat<box>[1,2]</box></grounding> b"
        assert nat.encode(text) == hf_tok.encode(text).ids
        dec = nat.decode(nat.encode(text), skip_special=True)
        assert "<grounding>" not in dec and "cat" in dec


class TestAdapterParity:
    """NativeBPEAdapter vs HFTokenizerAdapter on a Janus-style fixture dir:
    added-token id ORDERING is the critical contract
    (reference plangen_base.py:110-127 — ids must match)."""

    @pytest.fixture(scope="class")
    def fixture_dir(self, tmp_path_factory):
        from tests.test_golden_parity import make_tokenizer_fixture

        d = tmp_path_factory.mktemp("janus_tok")
        make_tokenizer_fixture(d)
        return str(d)

    def test_ids_match_hf_adapter(self, fixture_dir):
        pytest.importorskip("transformers")
        from plangen_tpu.text.tokenizer import (
            HFTokenizerAdapter,
            NativeBPEAdapter,
        )

        hf = HFTokenizerAdapter(fixture_dir, use_special_tokens=True)
        nat = NativeBPEAdapter(fixture_dir, use_special_tokens=True)
        assert nat.special == hf.special
        assert nat.vocab_size == hf.vocab_size
        prompts = [
            "a cat <grounding><ref>cat</ref><box>[100,200,800,900]</box></grounding>",
            "You are a helpful assistant.\n\n<image_placeholder> describe",
            "it's 42 degrees!",
        ]
        for p in prompts:
            assert nat.encode(p) == hf.encode(p), f"mismatch on {p!r}"
            assert nat.decode(nat.encode(p)) == hf.decode(hf.encode(p))

    def test_numhw_ordering(self, fixture_dir):
        pytest.importorskip("transformers")
        from plangen_tpu.text.tokenizer import (
            HFTokenizerAdapter,
            NativeBPEAdapter,
        )

        hf = HFTokenizerAdapter(fixture_dir, use_special_tokens=True, use_numhw=True)
        nat = NativeBPEAdapter(fixture_dir, use_special_tokens=True, use_numhw=True)
        for t in ("<h0>", "<w0>", "<h57>", "<w99>"):
            assert nat.token_id(t) == hf.token_id(t)


class TestSpecValidation:
    """NativeBPE must REFUSE tokenizer.json specs whose pre-tokenization it
    does not implement — silently encoding with the wrong splitter would
    corrupt generation with no error (the transformers-unavailable path has
    no parity check at runtime)."""

    def _respec(self, trained, tmp_path, mutate):
        _, path = trained
        spec = json.loads(open(path).read())
        mutate(spec)
        out = tmp_path / "tokenizer.json"
        out.write_text(json.dumps(spec))
        return str(out)

    def test_accepts_plain_bytelevel(self, trained):
        _, path = trained
        NativeBPE(path)  # the fixture's own spec

    def test_accepts_split_plus_bytelevel(self, trained, tmp_path):
        # the equivalent Sequence[Split(GPT-2), ByteLevel(use_regex=false)]
        # spelling some HF exports use
        from plangen_tpu.text.bpe_native import _GPT2_SPLIT_PATTERN

        def mutate(spec):
            spec["pre_tokenizer"] = {
                "type": "Sequence",
                "pretokenizers": [
                    {
                        "type": "Split",
                        "pattern": {"Regex": _GPT2_SPLIT_PATTERN},
                        "behavior": "Isolated",
                        "invert": False,
                    },
                    {
                        "type": "ByteLevel",
                        "add_prefix_space": False,
                        "trim_offsets": True,
                        "use_regex": False,
                    },
                ],
            }

        nat = NativeBPE(self._respec(trained, tmp_path, mutate))
        assert nat.encode("the quick fox") == NativeBPE(trained[1]).encode(
            "the quick fox"
        )

    def test_rejects_digit_split_rule(self, trained, tmp_path):
        # e.g. a Llama-3-style \p{N}{1,3} digit chunker — NOT GPT-2 splitting
        def mutate(spec):
            spec["pre_tokenizer"] = {
                "type": "Sequence",
                "pretokenizers": [
                    {
                        "type": "Split",
                        "pattern": {"Regex": "\\p{N}{1,3}"},
                        "behavior": "Isolated",
                        "invert": False,
                    },
                    {"type": "ByteLevel", "add_prefix_space": False,
                     "use_regex": False},
                ],
            }

        with pytest.raises(ValueError, match="pre-tokenization"):
            NativeBPE(self._respec(trained, tmp_path, mutate))

    def test_rejects_normalizer(self, trained, tmp_path):
        def mutate(spec):
            spec["normalizer"] = {"type": "NFKC"}

        with pytest.raises(ValueError, match="normalizer"):
            NativeBPE(self._respec(trained, tmp_path, mutate))

    def test_rejects_prefix_space(self, trained, tmp_path):
        def mutate(spec):
            spec["pre_tokenizer"]["add_prefix_space"] = True

        with pytest.raises(ValueError, match="add_prefix_space"):
            NativeBPE(self._respec(trained, tmp_path, mutate))


class TestThreadSafety:
    def test_concurrent_encode(self, trained):
        """encode() runs on worker threads (tasks/eval.py batch-ahead
        tokenization); interleaved calls must not share output buffers."""
        from concurrent.futures import ThreadPoolExecutor

        hf_tok, path = trained
        nat = NativeBPE(path)
        texts = [SAMPLES[i % len(SAMPLES)] for i in range(64)]
        expect = [hf_tok.encode(t).ids for t in texts]
        with ThreadPoolExecutor(max_workers=8) as ex:
            got = list(ex.map(nat.encode, texts))
        assert got == expect


class TestNativeBPEUnicode:
    def test_unicode_matches_hf(self, trained):
        """Multibyte UTF-8 (accents, CJK, emoji) must produce identical ids
        to the HF tokenizers library — byte-level BPE splits them into byte
        tokens regardless of script."""
        from tokenizers import Tokenizer

        from plangen_tpu.text.bpe_native import NativeBPE

        _, path = trained  # (Tokenizer, json path)
        hf = Tokenizer.from_file(str(path))
        nat = NativeBPE(str(path))
        for s in ["café ☕", "日本語のキャプション", "emoji 🐕🎾 done",
                  "Ångström χ² → résumé"]:
            assert list(nat.encode(s)) == hf.encode(s).ids, s
