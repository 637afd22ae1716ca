"""Self-speculative decoding: distribution-exactness without real weights.

Two analytic identities pin the mechanism down (see runtime/speculative.py):
  * draft == target  => every draft accepted, stream identical to the base
    sampler (same positional fold_in keys);
  * greedy          => acceptance is argmax agreement, stream identical to
    base greedy for ANY draft quality (here: a 1-layer random draft that
    disagrees constantly, exercising the rejection/residual path).
"""

import numpy as np
import jax
import jax.numpy as jnp

from plangen_tpu.config import PlanGenModelConfig
from plangen_tpu.models import vlm
from plangen_tpu.runtime.generate import generate_image_tokens
from plangen_tpu.runtime.speculative import generate_image_tokens_spec

TINY = PlanGenModelConfig.tiny()
KEY = jax.random.PRNGKey(0)
N = 16


def _inputs():
    params = vlm.init(jax.random.PRNGKey(42), TINY, dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(3), (2, 6), 0, 100)
    emb = vlm.embed_text(params, ids).astype(jnp.float32)
    mask = jnp.ones((2, 6 + N), dtype=jnp.int32)
    return params, emb, mask


class TestSpeculative:
    def test_full_draft_matches_base_sampling(self):
        """draft_layers == num_layers: q == p, all drafts accept, tokens are
        bit-identical to the base sampled stream."""
        params, emb, mask = _inputs()
        kw = dict(rng=KEY, cfg_weight=jnp.float32(5.0),
                  temperature=jnp.float32(1.0), num_tokens=N)
        base = generate_image_tokens(params, TINY, emb, mask, **kw)
        spec = generate_image_tokens_spec(
            params, TINY, emb, mask,
            draft_layers=TINY.llama.num_layers, draft_len=4, **kw,
        )
        np.testing.assert_array_equal(
            np.asarray(base.tokens), np.asarray(spec.tokens)
        )
        # full acceptance: token 0 + ceil(15 / (d+1)) rounds of d+1
        assert int(spec.rounds) == -(-(N - 1) // 5)

    def test_greedy_identical_with_weak_draft(self):
        """1-layer draft vs 2-layer target, greedy: the output must still be
        token-identical to base greedy (rejections resample correctly)."""
        params, emb, mask = _inputs()
        kw = dict(rng=KEY, cfg_weight=jnp.float32(5.0),
                  temperature=jnp.float32(0.0), num_tokens=N)
        base = generate_image_tokens(params, TINY, emb, mask, **kw)
        spec = generate_image_tokens_spec(
            params, TINY, emb, mask, draft_layers=1, draft_len=3, **kw,
        )
        np.testing.assert_array_equal(
            np.asarray(base.tokens), np.asarray(spec.tokens)
        )
        assert 1 <= int(spec.rounds) <= N

    def test_sampled_weak_draft_valid_and_deterministic(self):
        """Sampled mode with a weak draft: tokens in range, same seed ->
        same stream, different seed -> (almost surely) different stream."""
        params, emb, mask = _inputs()

        def run(seed):
            return np.asarray(generate_image_tokens_spec(
                params, TINY, emb, mask,
                rng=jax.random.PRNGKey(seed), cfg_weight=jnp.float32(5.0),
                temperature=jnp.float32(1.0), num_tokens=N,
                draft_layers=1, draft_len=3,
            ).tokens)

        a, b, c = run(7), run(7), run(8)
        np.testing.assert_array_equal(a, b)
        assert (a >= 0).all() and (a < TINY.image_token_size).all()
        assert not np.array_equal(a, c)


class TestSpeculativeWithPerRowSeeds:
    def test_serving_seeds_route_to_single_key(self):
        """serve.py always passes per-request seeds; the B=1 speculative
        branch must collapse the [1, 2] key array to row 0's key instead of
        crashing in fold_in (regression: caught by review)."""
        import dataclasses

        from plangen_tpu.config import GenerationConfig, PlanGenModelConfig
        from plangen_tpu.models import vlm
        from plangen_tpu.tasks.pipeline import PlanGenPipeline
        from plangen_tpu.tasks.processor import PlanGenProcessor
        from plangen_tpu.text.tokenizer import ByteFallbackTokenizer

        tiny = PlanGenModelConfig.tiny()
        tok = ByteFallbackTokenizer(vocab_size=tiny.llama.vocab_size)
        params = vlm.init(jax.random.PRNGKey(0), tiny, dtype=jnp.float32)
        gen = GenerationConfig(
            speculative=True, spec_draft_layers=1, spec_draft_len=2,
            max_new_text_tokens=4,
        )
        proc = PlanGenProcessor(tok, image_tokens=tiny.image_seq_len, gen=gen)
        pipe = PlanGenPipeline(params, tiny, proc, gen_cfg=gen)
        g = "<grounding><ref>cat</ref><box>[100,100,600,600]</box></grounding>"
        out = pipe.layout_to_image(["a"], [g], seeds=[5])
        assert np.asarray(out.image_tokens).shape == (1, tiny.image_seq_len)
        # reproducible by the request's seed
        out2 = pipe.layout_to_image(["a"], [g], seeds=[5])
        np.testing.assert_array_equal(
            np.asarray(out.image_tokens), np.asarray(out2.image_tokens)
        )
