"""End-to-end pipeline tests: all five task modes on the tiny model (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plangen_tpu.config import GenerationConfig, PlanGenModelConfig
from plangen_tpu.data.preprocess import build_edit_region
from plangen_tpu.models import vlm
from plangen_tpu.tasks.pipeline import PlanGenPipeline
from plangen_tpu.tasks.processor import PlanGenProcessor
from plangen_tpu.text.tokenizer import ByteFallbackTokenizer

TINY = PlanGenModelConfig.tiny()


@pytest.fixture(scope="module")
def pipeline():
    tok = ByteFallbackTokenizer(vocab_size=TINY.llama.vocab_size)
    proc = PlanGenProcessor(
        tok,
        image_tokens=TINY.image_seq_len,
        gen=GenerationConfig(max_new_text_tokens=8),
    )
    params = vlm.init(jax.random.PRNGKey(0), TINY, dtype=jnp.float32)
    return PlanGenPipeline(params, TINY, proc, compute_dtype=jnp.float32)


def _image_batch(b):
    k = jax.random.PRNGKey(1)
    size = TINY.vision.image_size
    return np.asarray(
        jax.random.uniform(k, (b, size, size, 3), minval=-1.0, maxval=1.0)
    )


class TestModes:
    def test_plan(self, pipeline):
        out = pipeline.plan(["a cat and a dog", "two cars"])
        assert len(out) == 2
        for g in out:
            assert g.startswith("<grounding>") and g.endswith("</grounding>")

    def test_mmu(self, pipeline):
        out = pipeline.understand(_image_batch(2))
        assert len(out.texts) == 2

    def test_layout_to_image(self, pipeline):
        g = "<grounding><ref>cat</ref><box>[100, 100, 500, 500]</box></grounding>"
        out = pipeline.layout_to_image(["a cat"], [g])
        size = TINY.vision.image_size
        assert out.images.shape == (1, size, size, 3)
        assert out.image_tokens.shape == (1, TINY.image_seq_len)
        assert np.isfinite(out.images).all()

    def test_joint_generate(self, pipeline):
        out = pipeline.joint_generate(["a bird on a tree"])
        assert out.images is not None and len(out.groundings) == 1

    def test_edit_teacher_forcing_freezes_background(self, pipeline):
        """All-zero edit_region => generated tokens == VQ(gt image) exactly."""
        from plangen_tpu.tasks.pipeline import _vq_encode

        gt = _image_batch(1)
        region = np.zeros((1, TINY.image_seq_len), dtype=np.int32)
        g = "<grounding><ref>x</ref><box>[0, 0, 500, 500]</box></grounding>"
        out = pipeline.edit_image(["scene"], [g], gt, region)
        gt_tok = np.asarray(_vq_encode(pipeline.params, TINY, jnp.asarray(gt)))
        np.testing.assert_array_equal(out.image_tokens, gt_tok)

    def test_removal_with_neg_grounding(self, pipeline):
        gt = _image_batch(1)
        region = build_edit_region(
            np.array([[0.25, 0.25, 0.75, 0.75]]), grid=2, pad_edit_box=0.1
        )[None]
        neg_g = "<grounding><ref>clutter</ref><box>[250, 250, 750, 750]</box></grounding>"
        out = pipeline.edit_image(
            ["empty scene"],
            ["scene"],
            gt,
            region,
            neg_captions=["low quality"],
            neg_groundings=[neg_g],
        )
        assert out.images.shape[0] == 1

    def test_parallel_size(self, pipeline):
        g = "<grounding><ref>cat</ref><box>[1, 2, 3, 4]</box></grounding>"
        out = pipeline.layout_to_image(["a cat"], [g], parallel_size=2)
        assert out.images.shape[0] == 2

    def test_seed_determinism(self, pipeline):
        g = "<grounding><ref>dog</ref><box>[1, 2, 3, 4]</box></grounding>"
        a = pipeline.layout_to_image(["a dog"], [g], seed=7)
        b = pipeline.layout_to_image(["a dog"], [g], seed=7)
        c = pipeline.layout_to_image(["a dog"], [g], seed=8)
        np.testing.assert_array_equal(a.image_tokens, b.image_tokens)
        assert not np.array_equal(a.image_tokens, c.image_tokens)


class TestEditRegion:
    def test_build_edit_region(self):
        r = build_edit_region(np.array([[0.0, 0.0, 0.5, 0.5]]), grid=24)
        r = r.reshape(24, 24)
        assert r[:12, :12].all() and not r[12:, 12:].any()

    def test_dilation(self):
        r0 = build_edit_region(np.array([[0.4, 0.4, 0.6, 0.6]]), grid=24)
        r1 = build_edit_region(
            np.array([[0.4, 0.4, 0.6, 0.6]]), grid=24, pad_edit_box=0.5
        )
        assert r1.sum() > r0.sum()


class TestCfgBatchEdge:
    def test_negative_longer_than_positive(self):
        """use_neg_box case where the per-sample negative grounding is longer
        than the positive prompt (reference plangen_base.py:654-670)."""
        from plangen_tpu.config import GenerationConfig
        from plangen_tpu.tasks.processor import PlanGenProcessor
        from plangen_tpu.text.tokenizer import ByteFallbackTokenizer

        tok = ByteFallbackTokenizer(vocab_size=512)
        proc = PlanGenProcessor(
            tok, image_tokens=4, gen=GenerationConfig(neg_prompt="bad")
        )
        ids, mask = proc.uni_batch(
            ["a"], ["<grounding><ref>x</ref><box>[1, 2, 3, 4]</box></grounding>"]
        )
        neg_g = (
            "<grounding><ref>clutter clutter clutter clutter clutter</ref>"
            "<box>[1, 2, 3, 4]</box></grounding>"
        )
        cfg_ids, cfg_mask = proc.cfg_batch(
            ids, mask, neg_captions=[""], neg_groundings=[neg_g]
        )
        assert cfg_ids.shape[0] == 2
        assert cfg_mask.shape[1] == cfg_ids.shape[1] + 4
        dec0 = tok.decode(cfg_ids[0], skip_special_tokens=True)
        dec1 = tok.decode(cfg_ids[1], skip_special_tokens=True)
        assert "x" in dec0 and "clutter" not in dec0
        assert "clutter" in dec1
        pad_id = tok.special.pad_id
        n_pad0 = int((np.asarray(cfg_ids[0]) == pad_id).sum())
        assert (np.asarray(cfg_mask[0][:n_pad0]) == 0).all()
        assert np.asarray(cfg_mask[:, -4:]).all()


class TestPerRequestSeeds:
    def test_parallel_size_with_seeds(self):
        """seeds + parallel_size: the ps copies of a request sample DIFFERENT
        streams (copy index folded in), and the whole call reproduces."""
        from plangen_tpu.config import GenerationConfig
        from plangen_tpu.tasks.pipeline import PlanGenPipeline
        from plangen_tpu.tasks.processor import PlanGenProcessor
        from plangen_tpu.text.tokenizer import ByteFallbackTokenizer

        import jax
        import jax.numpy as jnp
        import numpy as np

        from plangen_tpu.config import PlanGenModelConfig
        from plangen_tpu.models import vlm

        tiny = PlanGenModelConfig.tiny()
        tok = ByteFallbackTokenizer(vocab_size=tiny.llama.vocab_size)
        params = vlm.init(jax.random.PRNGKey(0), tiny, dtype=jnp.float32)
        gen = GenerationConfig(max_new_text_tokens=4)
        proc = PlanGenProcessor(tok, image_tokens=tiny.image_seq_len, gen=gen)
        pipe = PlanGenPipeline(params, tiny, proc, gen_cfg=gen)
        g = "<grounding><ref>cat</ref><box>[100,100,600,600]</box></grounding>"

        out1 = pipe.layout_to_image(["a"], [g], seeds=[5], parallel_size=2)
        out2 = pipe.layout_to_image(["a"], [g], seeds=[5], parallel_size=2)
        t1 = np.asarray(out1.image_tokens)
        assert t1.shape[0] == 2  # B * parallel_size rows
        np.testing.assert_array_equal(t1, np.asarray(out2.image_tokens))
        assert not np.array_equal(t1[0], t1[1])  # copies sample differently
