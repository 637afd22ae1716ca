"""Jacobi greedy decoding: exact fixed-point equivalence to the sequential
KV-cached decoder (runtime/generate.greedy_decode_text), including EOS
stickiness and left-padded rows."""

import jax
import jax.numpy as jnp
import numpy as np

from plangen_tpu.config import PlanGenModelConfig
from plangen_tpu.models import vlm
from plangen_tpu.runtime.generate import greedy_decode_text
from plangen_tpu.runtime.jacobi import jacobi_decode_text

KEY = jax.random.PRNGKey(0)
TINY = PlanGenModelConfig.tiny()


def _setup(B=3, L=6, T=10):
    params = vlm.init(KEY, TINY, dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, L), 20, 200)
    embeds = vlm.embed_text(params, ids).astype(jnp.float32)
    mask = np.ones((B, L + T), np.int32)
    mask[0, :2] = 0  # left-padded row
    return params, embeds, jnp.asarray(mask)


class TestJacobiExactness:
    def test_matches_sequential_no_eos(self):
        params, embeds, mask = _setup()
        seq = np.asarray(greedy_decode_text(
            params, TINY, embeds, mask, eos_id=jnp.int32(-1), max_new_tokens=10
        ))
        jac = np.asarray(jacobi_decode_text(
            params, TINY, embeds, mask, eos_id=jnp.int32(-1), max_new_tokens=10
        ))
        np.testing.assert_array_equal(jac, seq)

    def test_matches_sequential_with_eos(self):
        params, embeds, mask = _setup()
        # pick an eos that actually fires mid-stream: a token the sequential
        # decoder emits at step 2 of row 0
        probe = np.asarray(greedy_decode_text(
            params, TINY, embeds, mask, eos_id=jnp.int32(-1), max_new_tokens=10
        ))
        eos = jnp.int32(int(probe[0, 2]))
        seq = np.asarray(greedy_decode_text(
            params, TINY, embeds, mask, eos_id=eos, max_new_tokens=10
        ))
        jac = np.asarray(jacobi_decode_text(
            params, TINY, embeds, mask, eos_id=eos, max_new_tokens=10
        ))
        assert (seq[0] == int(eos)).any(), "eos must fire for this test"
        np.testing.assert_array_equal(jac, seq)

    def test_iteration_count_reported(self):
        params, embeds, mask = _setup()
        toks, iters = jacobi_decode_text(
            params, TINY, embeds, mask, eos_id=jnp.int32(-1),
            max_new_tokens=10, return_iters=True,
        )
        assert toks.shape == (3, 10)
        assert 1 <= int(iters) <= 11  # fixed point + the confirming pass

    def test_capped_iters_returns_shape(self):
        params, embeds, mask = _setup()
        toks = jacobi_decode_text(
            params, TINY, embeds, mask, eos_id=jnp.int32(-1),
            max_new_tokens=10, max_iters=1,
        )
        assert np.asarray(toks).shape == (3, 10)


class TestPipelineJacobi:
    def test_plan_with_jacobi_matches_sequential(self):
        import dataclasses

        from plangen_tpu.config import GenerationConfig
        from plangen_tpu.tasks.pipeline import PlanGenPipeline
        from plangen_tpu.tasks.processor import PlanGenProcessor
        from plangen_tpu.text.tokenizer import ByteFallbackTokenizer

        tok = ByteFallbackTokenizer(vocab_size=TINY.llama.vocab_size)
        params = vlm.init(KEY, TINY, dtype=jnp.float32)
        gen = GenerationConfig(max_new_text_tokens=6)
        proc = PlanGenProcessor(tok, image_tokens=TINY.image_seq_len, gen=gen)
        seq = PlanGenPipeline(params, TINY, proc, gen_cfg=gen).plan(["two cats"])
        gen_j = dataclasses.replace(gen, jacobi=True)
        proc_j = PlanGenProcessor(tok, image_tokens=TINY.image_seq_len, gen=gen_j)
        jac = PlanGenPipeline(params, TINY, proc_j, gen_cfg=gen_j).plan(["two cats"])
        assert jac == seq
