"""Golden-token regression tests (SURVEY §4 test strategy).

Frozen expected outputs for the seeded tiny model on CPU: any unintentional
change to init, RoPE, attention, sampling, or the decode loops shifts these
tokens. Regenerate the constants ONLY for deliberate numerics changes
(document why in the commit).
"""

import jax
import jax.numpy as jnp
import numpy as np

from plangen_tpu.config import PlanGenModelConfig
from plangen_tpu.models import vlm
from plangen_tpu.runtime.generate import generate_image_tokens, greedy_decode_text

# regenerated 2026-08-16: image-loop RNG moved from sequential splits to
# positional fold_in (enables the token-identical fast-edit path)
GOLDEN_IMAGE_TOKENS = [[34, 8, 3, 31]]
GOLDEN_TEXT_TOKENS = [[237, 358, 110, 389, 184, 115]]

# per-decode-config goldens (2026-08-17): each shipped cache/quantization
# strategy pins its OWN stream. The variant tests elsewhere assert equality
# to the base path — these catch a base+variant co-drift those cannot.
# At tiny scale every quantized variant happens to produce the base tokens
# (argmax margins dwarf the quantization noise); that they MATCH is part of
# the pinned expectation.
GOLDEN_IMAGE_TOKENS_GROWING = [[34, 8, 3, 31]]
GOLDEN_IMAGE_TOKENS_Q8 = [[34, 8, 3, 31]]
GOLDEN_IMAGE_TOKENS_Q8_GROWING = [[34, 8, 3, 31]]
GOLDEN_IMAGE_TOKENS_A8 = [[34, 8, 3, 31]]
GOLDEN_IMAGE_TOKENS_W8KV8 = [[34, 8, 3, 31]]
# fast-edit with regen mask [0,1,0,1] over gt [11,51,29,42]: frozen positions
# emit gt, sampled positions the fold_in stream
GOLDEN_FAST_EDIT_TOKENS = [[11, 21, 29, 44]]
GOLDEN_TEXT_TOKENS_GROWING = [[237, 358, 110, 389, 184, 115]]
# int4 Pallas-kernel weights + int8 KV (alignment-sized model, seed 0/1/7)
GOLDEN_INT4_TOKENS = [[246, 107, 165, 189], [159, 68, 243, 76]]


class TestGolden:
    def setup_method(self):
        self.cfg = PlanGenModelConfig.tiny()
        self.params = vlm.init(jax.random.PRNGKey(42), self.cfg, dtype=jnp.float32)
        self.ids = jnp.arange(8)[None].astype(jnp.int32)

    def test_image_decode_golden(self):
        emb = vlm.embed_text(self.params, jnp.tile(self.ids, (2, 1)))
        mask = jnp.ones((2, 12), dtype=jnp.int32)
        out = generate_image_tokens(
            self.params,
            self.cfg,
            emb,
            mask,
            rng=jax.random.PRNGKey(7),
            cfg_weight=jnp.float32(5.0),
            temperature=jnp.float32(1.0),
            num_tokens=4,
        )
        np.testing.assert_array_equal(np.asarray(out.tokens), GOLDEN_IMAGE_TOKENS)

    def test_text_decode_golden(self):
        emb = vlm.embed_text(self.params, self.ids)
        mask = jnp.ones((1, 14), dtype=jnp.int32)
        out = greedy_decode_text(
            self.params, self.cfg, emb, mask, jnp.int32(1), max_new_tokens=6
        )
        np.testing.assert_array_equal(np.asarray(out), GOLDEN_TEXT_TOKENS)

    # ------------------------------------------------- decode-config goldens

    def _image_tokens(self, params=None, **kw):
        emb = vlm.embed_text(self.params, jnp.tile(self.ids, (2, 1)))
        mask = jnp.ones((2, 12), dtype=jnp.int32)
        out = generate_image_tokens(
            params if params is not None else self.params,
            self.cfg, emb, mask,
            rng=jax.random.PRNGKey(7),
            cfg_weight=jnp.float32(5.0),
            temperature=jnp.float32(1.0),
            num_tokens=4,
            **kw,
        )
        return np.asarray(out.tokens)

    def test_growing_cache_golden(self):
        np.testing.assert_array_equal(
            self._image_tokens(growing_cache=True), GOLDEN_IMAGE_TOKENS_GROWING
        )

    def test_int8_kv_golden(self):
        np.testing.assert_array_equal(
            self._image_tokens(quantized_cache=True), GOLDEN_IMAGE_TOKENS_Q8
        )

    def test_int8_kv_growing_golden(self):
        np.testing.assert_array_equal(
            self._image_tokens(quantized_cache=True, growing_cache=True),
            GOLDEN_IMAGE_TOKENS_Q8_GROWING,
        )

    def test_kv_a8_golden(self):
        np.testing.assert_array_equal(
            self._image_tokens(quantized_cache=True, kv_a8=True),
            GOLDEN_IMAGE_TOKENS_A8,
        )

    def test_int8_weights_golden(self):
        from plangen_tpu.ops.quant import quantize_lm_params

        np.testing.assert_array_equal(
            self._image_tokens(
                params=quantize_lm_params(self.params), quantized_cache=True
            ),
            GOLDEN_IMAGE_TOKENS_W8KV8,
        )

    def test_fast_edit_golden(self):
        from plangen_tpu.runtime.fast_edit import (
            canonicalize_schedule,
            frozen_chunk_schedule,
            generate_image_tokens_fast_edit,
        )

        emb = vlm.embed_text(self.params, jnp.tile(self.ids, (2, 1)))
        mask = jnp.ones((2, 12), dtype=jnp.int32)
        gt = jax.random.randint(
            jax.random.PRNGKey(3), (1, 4), 0, self.cfg.image_token_size
        )
        regen = np.array([[0, 1, 0, 1]], dtype=np.int32)
        sched = canonicalize_schedule(frozen_chunk_schedule(regen))
        out = generate_image_tokens_fast_edit(
            self.params, self.cfg, emb, mask,
            rng=jax.random.PRNGKey(7),
            cfg_weight=jnp.float32(5.0),
            temperature=jnp.float32(1.0),
            gt_tokens=gt, regen_mask=jnp.asarray(regen),
            num_tokens=4, schedule=sched,
        )
        toks = np.asarray(out.tokens)
        np.testing.assert_array_equal(toks, GOLDEN_FAST_EDIT_TOKENS)
        # frozen positions carry the gt stream
        np.testing.assert_array_equal(toks[0][[0, 2]], np.asarray(gt)[0][[0, 2]])

    def test_text_growing_golden(self):
        emb = vlm.embed_text(self.params, self.ids)
        mask = jnp.ones((1, 14), dtype=jnp.int32)
        out = greedy_decode_text(
            self.params, self.cfg, emb, mask, jnp.int32(1),
            max_new_tokens=6, growing_cache=True,
        )
        np.testing.assert_array_equal(np.asarray(out), GOLDEN_TEXT_TOKENS_GROWING)

    def test_text_quantized_cache_golden(self):
        """int8 KV for the greedy text path (plan/MMU serving): pinned stream,
        fixed + growing (matches the bf16 stream at tiny margins — part of
        the expectation)."""
        emb = vlm.embed_text(self.params, self.ids)
        mask = jnp.ones((1, 14), dtype=jnp.int32)
        for kw in (dict(), dict(growing_cache=True)):
            out = greedy_decode_text(
                self.params, self.cfg, emb, mask, jnp.int32(1),
                max_new_tokens=6, quantized_cache=True, **kw,
            )
            np.testing.assert_array_equal(np.asarray(out), GOLDEN_TEXT_TOKENS)

    def test_int4_golden(self):
        """int4 Pallas weights + int8 KV on the alignment-sized model."""
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).parent))
        from test_int4 import _int4_cfg

        from plangen_tpu.config import (
            PlanGenModelConfig, ProjectorConfig, SigLIPConfig, VQConfig,
        )
        from plangen_tpu.ops.quant import quantize_lm_params_int4

        cfg = PlanGenModelConfig(
            llama=_int4_cfg(),
            vision=SigLIPConfig(
                image_size=32, patch_size=16, width=32, layers=2, heads=2
            ),
            vq=VQConfig(
                codebook_size=256, codebook_dim=8, ch=8,
                ch_mult=(1, 1, 1, 1, 2), num_res_blocks=1, z_channels=16,
                group_norm_groups=4,
            ),
            aligner=ProjectorConfig(input_dim=32, n_embed=256, depth=2),
            gen_aligner=ProjectorConfig(input_dim=8, n_embed=256, depth=2),
            image_token_embed=256, image_token_size=256, gen_embed_dim=8,
        )
        params = vlm.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
        qp = quantize_lm_params_int4(params)
        B, L, N = 2, 7, cfg.image_seq_len
        emb = jax.random.normal(
            jax.random.PRNGKey(1), (2 * B, L, 256), jnp.bfloat16
        )
        mask = jnp.ones((2 * B, L + N), jnp.int32)
        out = generate_image_tokens(
            qp, cfg, emb, mask, rng=jax.random.PRNGKey(7),
            cfg_weight=jnp.float32(5.0), temperature=jnp.float32(1.0),
            num_tokens=N, quantized_cache=True,
        )
        np.testing.assert_array_equal(np.asarray(out.tokens), GOLDEN_INT4_TOKENS)
