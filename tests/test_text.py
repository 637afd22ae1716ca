"""Unit tests for the text/layout layer (pure host-side functions)."""

import numpy as np
import pytest

from plangen_tpu.text.chat_template import (
    ASSISTANT,
    USER,
    DeepSeekTemplate,
    Message,
    EOS_TEXT,
)
from plangen_tpu.text.grounding import (
    parse_grounding,
    serialize_grounding,
    truncate_grounding,
    extract_grounding_part,
)
from plangen_tpu.text.tokenizer import (
    ByteFallbackTokenizer,
    IMAGE_START_TAG,
    IMAGE_TAG,
)
from plangen_tpu.text.batching import (
    expand_image_tags,
    extend_mask_for_image,
    interleave_cfg,
    left_pad_batch,
    pad_to_common_length,
)


class TestDeepSeekTemplate:
    def test_basic_two_turn(self):
        t = DeepSeekTemplate()
        out = t.render([Message(USER, "hello"), Message(ASSISTANT, "world")])
        assert out == f"<|User|>: hello\n\n<|Assistant|>: world{EOS_TEXT}".strip()

    def test_empty_assistant_is_generation_prompt(self):
        t = DeepSeekTemplate()
        out = t.render([Message(USER, "cap"), Message(ASSISTANT, "")])
        # empty message renders role + ":" with no trailing space/sep
        assert out == "<|User|>: cap\n\n<|Assistant|>:"

    def test_t2i_prompt_appends_image_start(self):
        t = DeepSeekTemplate()
        out = t.t2i_prompt("a cat", IMAGE_START_TAG)
        assert out.endswith(f"<|Assistant|>:{IMAGE_START_TAG}")

    def test_uni_prompt_with_grounding(self):
        t = DeepSeekTemplate()
        g = "<grounding><ref>cat</ref><box>[1, 2, 3, 4]</box></grounding>"
        out = t.uni_prompt("a cat", g, IMAGE_START_TAG)
        assert f"<|Assistant|>: {g}" in out
        assert out.endswith(IMAGE_START_TAG)

    def test_uni_prompt_stage1(self):
        t = DeepSeekTemplate()
        out = t.uni_prompt("a cat", "<grounding>", None)
        assert out.endswith(f"<grounding>{EOS_TEXT}")

    def test_content_is_stripped(self):
        t = DeepSeekTemplate()
        out = t.render([Message(USER, "  hi  "), Message(ASSISTANT, "")])
        assert out == "<|User|>: hi\n\n<|Assistant|>:"


class TestGrounding:
    def test_roundtrip_textual(self):
        boxes = [(0.1, 0.2, 0.5, 0.9), (0.0, 0.0, 1.0, 1.0)]
        descs = ["a red cat", "whole image"]
        s = serialize_grounding("a scene", boxes, descs, textual=True)
        assert s.startswith("a scene <grounding>")
        assert s.endswith("</grounding>")
        # str(list) formatting: ", " separated
        assert "<box>[100, 200, 500, 900]</box>" in s
        pboxes, pdescs = parse_grounding(s)
        assert pdescs == descs
        np.testing.assert_allclose(np.array(pboxes), np.array(boxes), atol=5e-4)

    def test_empty_caption_no_leading_space(self):
        s = serialize_grounding("", [(0.1, 0.1, 0.2, 0.2)], ["x"])
        assert s.startswith("<grounding>")

    def test_no_boxes_returns_caption(self):
        assert serialize_grounding("cap", [], []) == "cap"
        assert serialize_grounding("cap", [(0, 0, 0, 0)], ["x"]) == "cap"

    def test_valid_mask_filters(self):
        s = serialize_grounding(
            "c",
            [(0.1, 0.1, 0.2, 0.2), (0.3, 0.3, 0.4, 0.4)],
            ["keep", "drop"],
            valid=[True, False],
        )
        assert "keep" in s and "drop" not in s

    def test_numhw_roundtrip(self):
        boxes = [(0.1, 0.2, 0.5, 0.9)]
        s = serialize_grounding("c", boxes, ["cat"], textual=False)
        assert "<h10>,<w20>,<h50>,<w89>" in s
        pboxes, pdescs = parse_grounding(s, textual=False)
        assert pdescs == ["cat"]
        np.testing.assert_allclose(np.array(pboxes), np.array(boxes), atol=6e-3)

    def test_truncate_grounding(self):
        dec = "<ref>a</ref><box>[1, 2, 3, 4]</box></grounding> extra garbage"
        out = truncate_grounding(dec)
        assert out == "<grounding><ref>a</ref><box>[1, 2, 3, 4]</box></grounding>"
        assert truncate_grounding("no close tag") == "<grounding></grounding>"

    def test_extract_grounding_part(self):
        s = "caption text <grounding><ref>a</ref></grounding>"
        assert extract_grounding_part(s).startswith("<grounding>")


class TestByteTokenizer:
    def test_roundtrip(self):
        tok = ByteFallbackTokenizer(vocab_size=512)
        text = "a cat <grounding><ref>cat</ref><box>[1, 2]</box></grounding>"
        ids = tok.encode(text)
        assert ids[0] == tok.special.bos_id
        assert tok.decode(ids[1:]) == text

    def test_special_tokens_single_id(self):
        tok = ByteFallbackTokenizer(vocab_size=512)
        ids = tok.encode("<grounding>", add_bos=False)
        assert len(ids) == 1
        assert ids[0] == tok.special.grounding_ids["<grounding>"]

    def test_skip_special(self):
        tok = ByteFallbackTokenizer(vocab_size=512)
        ids = tok.encode("hi<grounding>there", add_bos=False)
        assert tok.decode(ids, skip_special_tokens=True) == "hithere"

    def test_numhw(self):
        tok = ByteFallbackTokenizer(vocab_size=1024, use_numhw=True)
        ids = tok.encode("<h42>,<w7>", add_bos=False)
        assert len(ids) == 3  # <h42> ',' <w7>
        assert tok.decode(ids) == "<h42>,<w7>"


class TestBatching:
    def test_left_pad(self):
        ids, mask = left_pad_batch([[1, 2, 3], [4]], pad_id=0)
        np.testing.assert_array_equal(ids, [[1, 2, 3], [0, 0, 4]])
        np.testing.assert_array_equal(mask, [[1, 1, 1], [0, 0, 1]])

    def test_truncation_keeps_tail(self):
        ids, mask = left_pad_batch([[1, 2, 3, 4, 5]], pad_id=0, max_seq_len=3)
        np.testing.assert_array_equal(ids, [[3, 4, 5]])

    def test_extend_mask(self):
        mask = np.array([[0, 1, 1]])
        out = extend_mask_for_image(mask, 2)
        np.testing.assert_array_equal(out, [[0, 1, 1, 1, 1]])

    def test_interleave_cfg(self):
        c = np.array([[1, 2], [3, 4]])
        n = np.array([[9, 9], [8, 8]])
        m = np.ones_like(c)
        ids, _ = interleave_cfg(c, m, n, m)
        np.testing.assert_array_equal(ids, [[1, 2], [9, 9], [3, 4], [8, 8]])

    def test_pad_to_common_length(self):
        ids_a, mask_a = left_pad_batch([[1, 2]], pad_id=0)
        a2, am2, b2, bm2 = pad_to_common_length(ids_a, mask_a, [[7, 8, 9]], pad_id=0)
        assert a2.shape == (1, 3) and b2.shape == (1, 3)
        np.testing.assert_array_equal(a2, [[0, 1, 2]])
        np.testing.assert_array_equal(am2, [[0, 1, 1]])
        np.testing.assert_array_equal(b2, [[7, 8, 9]])

    def test_expand_image_tags(self):
        ids = [10, 99, 11]
        out, mask = expand_image_tags(
            ids,
            image_tag_id=99,
            image_start_id=5,
            image_end_id=6,
            image_placeholder_id=99,
            num_image_tokens=3,
        )
        assert out == [10, 5, 99, 99, 99, 6, 11]
        np.testing.assert_array_equal(
            mask, [False, False, True, True, True, False, False]
        )


class TestConfig:
    def test_overrides(self):
        from plangen_tpu.config import PlanGenConfig, apply_overrides

        cfg = PlanGenConfig()
        cfg2 = apply_overrides(
            cfg,
            {
                "generation.cfg_weight": "7.5",
                "train.optim.learning_rate": 1e-4,
                "janus_hw": 384,
            },
        )
        assert cfg2.generation.cfg_weight == 7.5
        assert cfg2.train.optim.learning_rate == 1e-4
        assert cfg.generation.cfg_weight == 5.0  # original untouched

    def test_unknown_key_raises(self):
        from plangen_tpu.config import PlanGenConfig, apply_overrides

        with pytest.raises(KeyError):
            apply_overrides(PlanGenConfig(), {"nope.bad": 1})

    def test_tiny_config(self):
        from plangen_tpu.config import PlanGenModelConfig

        tiny = PlanGenModelConfig.tiny()
        assert tiny.image_seq_len == 4
        assert tiny.llama.hidden_size == 64


class TestCfgNegGroundings:
    def test_neg_groundings_without_captions_ride_neg_prompt(self):
        """Removal-mode negatives: a per-sample neg grounding WITHOUT
        explicit neg captions must still reach the negative row (on the
        default neg prompt) — silently dropping it reverts removal to a
        plain empty-target edit (reference plangen_base.py:653-670)."""
        from plangen_tpu.config import GenerationConfig
        from plangen_tpu.tasks.processor import PlanGenProcessor
        from plangen_tpu.text.tokenizer import load_tokenizer

        tok = load_tokenizer(None, vocab_size=512)
        gen = GenerationConfig()
        proc = PlanGenProcessor(tok, image_tokens=4, max_seq_len=64, gen=gen)
        ids, mask = proc.uni_batch(["a room"], [""])
        neg_g = "<grounding><ref>clutter</ref><box>[100,100,500,500]</box></grounding>"
        with_g, _ = proc.cfg_batch(ids, mask, None, [neg_g])
        without_g, _ = proc.cfg_batch(ids, mask, None, None)
        # rows interleave cond/neg: the neg rows (odd) must differ
        assert with_g.shape[0] == 2 and without_g.shape[0] == 2
        assert not (with_g[1].tolist() == without_g[1].tolist())


class TestUnicode:
    """Byte-level tokenization must carry arbitrary unicode captions/labels —
    the reference's datasets contain non-ASCII descriptions and the byte-level
    BPE handles them by construction; pin that property."""

    CASES = ["café ☕", "日本語のキャプション", "emoji 🐕🎾", "Ångström χ²"]

    def test_byte_fallback_roundtrip(self):
        from plangen_tpu.text.tokenizer import ByteFallbackTokenizer

        tok = ByteFallbackTokenizer(vocab_size=512)
        for s in self.CASES:
            ids = tok.encode(s, add_bos=False)
            assert tok.decode(ids) == s

    def test_grounding_roundtrip_with_unicode_labels(self):
        from plangen_tpu.text.grounding import (
            parse_grounding, serialize_grounding,
        )
        from plangen_tpu.text.tokenizer import ByteFallbackTokenizer

        tok = ByteFallbackTokenizer(vocab_size=512)
        g = serialize_grounding(
            "café scène", [(0.1, 0.2, 0.3, 0.4)], ["un château 🏰"]
        )
        boxes, descs = parse_grounding(tok.decode(tok.encode(g, add_bos=False)))
        assert descs == ["un château 🏰"]
        assert boxes == [(0.1, 0.2, 0.3, 0.4)]
