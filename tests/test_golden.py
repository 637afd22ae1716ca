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
