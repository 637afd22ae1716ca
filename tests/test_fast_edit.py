"""Fast teacher-forced editing: token-identical to the sequential loop."""

import numpy as np
import jax
import jax.numpy as jnp

from plangen_tpu.config import PlanGenModelConfig
from plangen_tpu.models import vlm
from plangen_tpu.runtime.fast_edit import (
    canonicalize_schedule,
    frozen_chunk_schedule,
    generate_image_tokens_fast_edit,
)
from plangen_tpu.runtime.generate import generate_image_tokens

TINY = PlanGenModelConfig.tiny()
KEY = jax.random.PRNGKey(0)


class TestSchedule:
    def test_all_frozen(self):
        s = frozen_chunk_schedule(np.zeros((2, 32), dtype=np.int32))
        assert s == (True, True)

    def test_mixed(self):
        m = np.zeros((2, 32), dtype=np.int32)
        m[0, 20] = 1
        assert frozen_chunk_schedule(m) == (True, False)

    def test_ragged_tail(self):
        s = frozen_chunk_schedule(np.zeros((1, 20), dtype=np.int32))
        assert len(s) == 2

    def test_canonicalize_never_marks_mixed_as_frozen(self):
        rng = np.random.RandomState(0)
        for _ in range(50):
            s = tuple(bool(b) for b in rng.rand(36) > 0.5)
            c = canonicalize_schedule(s)
            assert len(c) == len(s)
            for orig, canon in zip(s, c):
                if not orig:  # mixed must stay mixed (exactness)
                    assert not canon

    def test_canonicalize_bounds_signatures_rm_coco_workload(self):
        """200 random removal-box masks (24x24 grid, raster order) must
        compile to at most a handful of distinct jit signatures."""
        rng = np.random.RandomState(1)
        grid = 24
        signatures = set()
        for _ in range(200):
            # a random box covering ~10-50% of the canvas
            h = rng.randint(5, 17)
            w = rng.randint(5, 17)
            y = rng.randint(0, grid - h)
            x = rng.randint(0, grid - w)
            m2 = np.zeros((grid, grid), dtype=np.int32)
            m2[y : y + h, x : x + w] = 1
            sched = canonicalize_schedule(
                frozen_chunk_schedule(m2.reshape(1, -1))
            )
            signatures.add(sched)
        assert len(signatures) <= 12, f"{len(signatures)} distinct programs"

    def test_canonicalize_fully_frozen_and_fully_mixed(self):
        assert canonicalize_schedule((True,) * 36) == (True,) * 36
        assert canonicalize_schedule((False,) * 36) == (False,) * 36


class TestFastEdit:
    def _setup(self, N=64):
        params = vlm.init(jax.random.PRNGKey(42), TINY, dtype=jnp.float32)
        B, L = 2, 6
        ids = jax.random.randint(jax.random.PRNGKey(3), (2 * B, L), 0, 100)
        emb = vlm.embed_text(params, ids).astype(jnp.float32)
        mask = jnp.ones((2 * B, L + N), dtype=jnp.int32)
        gt = jax.random.randint(
            jax.random.PRNGKey(4), (B, N), 0, TINY.image_token_size
        )
        return params, emb, mask, gt, B, N

    def test_token_identical_mixed_mask(self):
        params, emb, mask, gt, B, N = self._setup()
        regen = np.zeros((B, N), dtype=np.int32)
        regen[:, 20:28] = 1
        regen[:, 40:44] = 1
        kw = dict(
            rng=jax.random.PRNGKey(7),
            cfg_weight=jnp.float32(5.0),
            temperature=jnp.float32(1.0),
        )
        ref = generate_image_tokens(
            params, TINY, emb, mask,
            gt_tokens=gt, regen_mask=jnp.asarray(regen), num_tokens=N, **kw
        )
        fast = generate_image_tokens_fast_edit(
            params, TINY, emb, mask,
            gt_tokens=gt, regen_mask=jnp.asarray(regen), num_tokens=N,
            schedule=frozen_chunk_schedule(regen), **kw
        )
        np.testing.assert_array_equal(
            np.asarray(ref.tokens), np.asarray(fast.tokens)
        )
        # the canonicalized (coarser) schedule stays token-identical too
        fast_c = generate_image_tokens_fast_edit(
            params, TINY, emb, mask,
            gt_tokens=gt, regen_mask=jnp.asarray(regen), num_tokens=N,
            schedule=canonicalize_schedule(frozen_chunk_schedule(regen), 2),
            **kw
        )
        np.testing.assert_array_equal(
            np.asarray(ref.tokens), np.asarray(fast_c.tokens)
        )

    def test_all_frozen_equals_gt(self):
        params, emb, mask, gt, B, N = self._setup()
        regen = np.zeros((B, N), dtype=np.int32)
        fast = generate_image_tokens_fast_edit(
            params, TINY, emb, mask,
            rng=KEY, cfg_weight=jnp.float32(5.0), temperature=jnp.float32(1.0),
            gt_tokens=gt, regen_mask=jnp.asarray(regen), num_tokens=N,
            schedule=frozen_chunk_schedule(regen),
        )
        np.testing.assert_array_equal(np.asarray(fast.tokens), np.asarray(gt))


class TestPipelineFastEdit:
    def test_pipeline_fast_edit_matches_standard(self):
        from plangen_tpu.config import GenerationConfig
        from plangen_tpu.tasks.pipeline import PlanGenPipeline
        from plangen_tpu.tasks.processor import PlanGenProcessor
        from plangen_tpu.text.tokenizer import ByteFallbackTokenizer

        tok = ByteFallbackTokenizer(vocab_size=TINY.llama.vocab_size)
        params = vlm.init(jax.random.PRNGKey(0), TINY, dtype=jnp.float32)
        size = TINY.vision.image_size
        gt = np.asarray(
            jax.random.uniform(KEY, (1, size, size, 3), minval=-1.0, maxval=1.0)
        )
        region = np.zeros((1, TINY.image_seq_len), dtype=np.int32)
        region[0, 1] = 1  # one sampled position
        g = "<grounding><ref>x</ref><box>[0, 0, 500, 500]</box></grounding>"

        outs = {}
        for fast in [False, True]:
            proc = PlanGenProcessor(
                tok,
                image_tokens=TINY.image_seq_len,
                gen=GenerationConfig(max_new_text_tokens=4, fast_edit=fast),
            )
            pipe = PlanGenPipeline(params, TINY, proc)
            outs[fast] = pipe.edit_image(["scene"], [g], gt, region, seed=5)
        np.testing.assert_array_equal(
            outs[False].image_tokens, outs[True].image_tokens
        )
