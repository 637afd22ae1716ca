"""Runtime decode-loop tests: the fused KV-cached scan must match a naive
full-forward-per-step implementation exactly (greedy / teacher-forced paths
are deterministic — the parity protocol of SURVEY.md §7)."""

import jax
import jax.numpy as jnp
import numpy as np

from plangen_tpu.config import PlanGenModelConfig
from plangen_tpu.models import llama, vlm
from plangen_tpu.ops.sampling import cfg_combine
from plangen_tpu.runtime.generate import generate_image_tokens, greedy_decode_text

TINY = PlanGenModelConfig.tiny()
KEY = jax.random.PRNGKey(0)
F32 = jnp.float32
N_IMG = 8  # small token budget for the loop tests


def naive_image_generate(params, cfg, cfg_embeds, pad_mask, cfg_weight, num_tokens):
    """Reference loop: full re-forward over the growing sequence each step,
    greedy (argmax of the CFG-combined logits)."""
    B2, L, H = cfg_embeds.shape
    B = B2 // 2
    embeds = cfg_embeds
    tokens = []
    for i in range(num_tokens):
        mask = pad_mask[:, : L + i]
        hidden, _ = llama.forward(params["language_model"], cfg.llama, embeds, mask)
        logits = vlm.image_gen_logits(params, hidden[:, -1])
        combined = cfg_combine(logits, cfg_weight)
        tok = jnp.argmax(combined, axis=-1).astype(jnp.int32)
        tokens.append(tok)
        pair = jnp.repeat(tok, 2, axis=0)
        nxt = vlm.gen_img_embeds(params, pair[:, None]).astype(embeds.dtype)
        embeds = jnp.concatenate([embeds, nxt], axis=1)
    return jnp.stack(tokens, axis=1)  # [B, N]


class TestImageGeneration:
    def setup_method(self):
        self.params = vlm.init(KEY, TINY, dtype=F32)
        B, L = 2, 6
        ids = jax.random.randint(jax.random.PRNGKey(3), (2 * B, L), 0, 100)
        self.embeds = vlm.embed_text(self.params, ids).astype(F32)
        mask = np.ones((2 * B, L + N_IMG), dtype=np.int32)
        mask[1, 0] = 0  # one left-padded uncond row
        self.mask = jnp.asarray(mask)
        self.B, self.L = B, L

    def test_teacher_forced_exact(self):
        gt = jax.random.randint(KEY, (self.B, N_IMG), 0, TINY.image_token_size)
        regen = jnp.zeros((self.B, N_IMG), dtype=jnp.int32)
        out = generate_image_tokens(
            self.params,
            TINY,
            self.embeds,
            self.mask,
            rng=KEY,
            cfg_weight=jnp.float32(5.0),
            temperature=jnp.float32(1.0),
            gt_tokens=gt,
            regen_mask=regen,
            num_tokens=N_IMG,
        )
        np.testing.assert_array_equal(np.asarray(out.tokens), np.asarray(gt))

    def test_greedy_matches_naive(self):
        out = generate_image_tokens(
            self.params,
            TINY,
            self.embeds,
            self.mask,
            rng=KEY,
            cfg_weight=jnp.float32(5.0),
            temperature=jnp.float32(0.0),  # greedy
            num_tokens=N_IMG,
        )
        ref = naive_image_generate(
            self.params, TINY, self.embeds, self.mask, 5.0, N_IMG
        )
        np.testing.assert_array_equal(np.asarray(out.tokens), np.asarray(ref))

    def test_sampled_tokens_in_range(self):
        out = generate_image_tokens(
            self.params,
            TINY,
            self.embeds,
            self.mask,
            rng=KEY,
            cfg_weight=jnp.float32(5.0),
            temperature=jnp.float32(1.0),
            num_tokens=N_IMG,
        )
        t = np.asarray(out.tokens)
        assert t.shape == (self.B, N_IMG)
        assert (t >= 0).all() and (t < TINY.image_token_size).all()

    def test_partial_teacher_forcing(self):
        """regen_mask=0 positions must carry gt; ==1 may differ."""
        gt = jax.random.randint(KEY, (self.B, N_IMG), 0, TINY.image_token_size)
        regen = jnp.asarray(
            np.tile(np.array([0, 1] * (N_IMG // 2), dtype=np.int32), (self.B, 1))
        )
        out = generate_image_tokens(
            self.params,
            TINY,
            self.embeds,
            self.mask,
            rng=KEY,
            cfg_weight=jnp.float32(5.0),
            temperature=jnp.float32(1.0),
            gt_tokens=gt,
            regen_mask=regen,
            num_tokens=N_IMG,
        )
        t = np.asarray(out.tokens)
        g = np.asarray(gt)
        frozen = np.asarray(regen) == 0
        np.testing.assert_array_equal(t[frozen], g[frozen])


class TestTextDecode:
    def test_greedy_matches_naive(self):
        params = vlm.init(KEY, TINY, dtype=F32)
        B, L, N = 2, 5, 6
        ids = jax.random.randint(jax.random.PRNGKey(7), (B, L), 0, 100)
        embeds = vlm.embed_text(params, ids).astype(F32)
        mask = jnp.ones((B, L + N), dtype=jnp.int32)
        eos = jnp.int32(1)

        out = greedy_decode_text(params, TINY, embeds, mask, eos, max_new_tokens=N)

        # naive
        cur = embeds
        toks = []
        done = np.zeros((B,), dtype=bool)
        for i in range(N):
            hidden, _ = llama.forward(
                params["language_model"], TINY.llama, cur, mask[:, : L + i]
            )
            logits = llama.lm_head(params["language_model"], hidden[:, -1])
            tok = np.asarray(jnp.argmax(logits, axis=-1), dtype=np.int32)
            tok = np.where(done, 1, tok)
            done = done | (tok == 1)
            toks.append(tok)
            nxt = vlm.embed_text(params, jnp.asarray(tok)[:, None]).astype(F32)
            cur = jnp.concatenate([cur, nxt], axis=1)
        ref = np.stack(toks, axis=1)
        np.testing.assert_array_equal(np.asarray(out), ref)

    def test_eos_padding(self):
        """After a row emits EOS, all later tokens are EOS. The eos id is
        taken FROM a first probe run (greedy is deterministic), so EOS is
        GUARANTEED to fire — an arbitrary id made this a dead test whose
        only assertion sat behind an `if len(hit):` that never ran."""
        params = vlm.init(KEY, TINY, dtype=F32)
        B, L, N = 1, 4, 10
        ids = jnp.zeros((B, L), dtype=jnp.int32)
        embeds = vlm.embed_text(params, ids).astype(F32)
        mask = jnp.ones((B, L + N), dtype=jnp.int32)
        probe = np.asarray(
            greedy_decode_text(params, TINY, embeds, mask, jnp.int32(-1),
                               max_new_tokens=N)
        )
        eos = int(probe[0, 2])  # a token the model provably emits mid-stream
        out = np.asarray(
            greedy_decode_text(params, TINY, embeds, mask, jnp.int32(eos),
                               max_new_tokens=N)
        )
        hit = np.where(out[0] == eos)[0]
        assert len(hit) > 0, "chosen eos id must fire (it came from a probe)"
        assert hit[0] <= 2
        assert (out[0, hit[0]:] == eos).all()


class TestGrowingCache:
    def _inputs(self, B=2, L=6):
        params = vlm.init(KEY, TINY, dtype=F32)
        ids = jax.random.randint(jax.random.PRNGKey(9), (2 * B, L), 0, 100)
        embeds = vlm.embed_text(params, ids).astype(F32)
        mask = np.ones((2 * B, L + N_IMG), dtype=np.int32)
        mask[1, :2] = 0  # left-padded row
        return params, embeds, jnp.asarray(mask)

    def test_growing_matches_fixed_buffer(self):
        """Phased cache growth must be token-identical to the fixed buffer,
        with sampling on (same fold_in keys) and left padding. 160 steps so
        the buffer actually grows (128 -> 166) across phase boundaries."""
        params, embeds, mask = self._inputs()
        n = 160
        mask = jnp.asarray(
            np.concatenate(
                [np.asarray(mask)[:, : mask.shape[1] - N_IMG],
                 np.ones((mask.shape[0], n), dtype=np.int32)], axis=1,
            )
        )
        kwargs = dict(
            rng=KEY,
            cfg_weight=jnp.float32(5.0),
            temperature=jnp.float32(1.0),
            num_tokens=n,
        )
        ref = generate_image_tokens(params, TINY, embeds, mask, **kwargs)
        out = generate_image_tokens(
            params, TINY, embeds, mask, growing_cache=True, **kwargs
        )
        np.testing.assert_array_equal(np.asarray(ref.tokens), np.asarray(out.tokens))

    def test_growing_with_quantized_cache(self):
        params, embeds, mask = self._inputs()
        kwargs = dict(
            rng=KEY,
            cfg_weight=jnp.float32(5.0),
            temperature=jnp.float32(0.0),
            num_tokens=N_IMG,
            quantized_cache=True,
        )
        ref = generate_image_tokens(params, TINY, embeds, mask, **kwargs)
        out = generate_image_tokens(
            params, TINY, embeds, mask, growing_cache=True, **kwargs
        )
        np.testing.assert_array_equal(np.asarray(ref.tokens), np.asarray(out.tokens))

    def test_growing_quantized_crosses_segment_boundary(self):
        """The SHIPPED best config (int8 KV + segmented growing cache) must
        be token-identical to the fixed int8 buffer ACROSS a segment
        boundary: at short budgets growing_segment_ends returns one segment
        and the segmented path degenerates to plain attention, so only a
        160-token decode exercises multi-segment quantized combine +
        per-segment scale writes through the scan carry."""
        from plangen_tpu.runtime.generate import growing_segment_ends

        params, embeds, mask = self._inputs()
        n = 160
        L = embeds.shape[1]
        assert len(growing_segment_ends(L, n)) >= 2  # boundary really crossed
        mask = jnp.asarray(
            np.concatenate(
                [np.asarray(mask)[:, : mask.shape[1] - N_IMG],
                 np.ones((mask.shape[0], n), dtype=np.int32)], axis=1,
            )
        )
        kwargs = dict(
            rng=KEY,
            cfg_weight=jnp.float32(5.0),
            temperature=jnp.float32(1.0),
            num_tokens=n,
            quantized_cache=True,
        )
        ref = generate_image_tokens(params, TINY, embeds, mask, **kwargs)
        out = generate_image_tokens(
            params, TINY, embeds, mask, growing_cache=True, **kwargs
        )
        np.testing.assert_array_equal(
            np.asarray(ref.tokens), np.asarray(out.tokens)
        )

    def test_growing_with_teacher_forcing(self):
        params, embeds, mask = self._inputs()
        gt = jax.random.randint(
            jax.random.PRNGKey(4), (2, N_IMG), 0, TINY.image_token_size
        )
        regen = np.zeros((2, N_IMG), dtype=np.int32)
        regen[:, 1] = 1
        kwargs = dict(
            rng=KEY,
            cfg_weight=jnp.float32(5.0),
            temperature=jnp.float32(1.0),
            num_tokens=N_IMG,
            gt_tokens=gt,
            regen_mask=jnp.asarray(regen),
        )
        ref = generate_image_tokens(params, TINY, embeds, mask, **kwargs)
        out = generate_image_tokens(
            params, TINY, embeds, mask, growing_cache=True, **kwargs
        )
        np.testing.assert_array_equal(np.asarray(ref.tokens), np.asarray(out.tokens))


class TestGrowingTextDecode:
    def test_growing_matches_fixed(self):
        """Segmented greedy text decode == fixed buffer, crossing a phase
        boundary (160 new tokens, no EOS so the full budget decodes)."""
        params = vlm.init(KEY, TINY, dtype=F32)
        B, L, T = 2, 6, 160
        ids = jax.random.randint(jax.random.PRNGKey(9), (B, L), 3, 100)
        embeds = vlm.embed_text(params, ids).astype(F32)
        mask = jnp.ones((B, L + T), dtype=jnp.int32)
        base = greedy_decode_text(
            params, TINY, embeds, mask, jnp.int32(-1), max_new_tokens=T
        )
        grown = greedy_decode_text(
            params, TINY, embeds, mask, jnp.int32(-1), max_new_tokens=T,
            growing_cache=True,
        )
        np.testing.assert_array_equal(np.asarray(base), np.asarray(grown))

    def test_growing_eos_early_exit(self):
        """EOS padding semantics survive the phased loops."""
        params = vlm.init(KEY, TINY, dtype=F32)
        B, L, T = 2, 6, 160
        ids = jax.random.randint(jax.random.PRNGKey(9), (B, L), 3, 100)
        embeds = vlm.embed_text(params, ids).astype(F32)
        mask = jnp.ones((B, L + T), dtype=jnp.int32)
        eos = jnp.int32(1)
        base = np.asarray(greedy_decode_text(
            params, TINY, embeds, mask, eos, max_new_tokens=T
        ))
        grown = np.asarray(greedy_decode_text(
            params, TINY, embeds, mask, eos, max_new_tokens=T,
            growing_cache=True,
        ))
        np.testing.assert_array_equal(base, grown)
        for row in grown:
            hit = np.where(row == 1)[0]
            if len(hit):
                assert (row[hit[0]:] == 1).all()


class TestChunkedDecode:
    def test_chunked_matches_full(self):
        """Chunked decode attention (valid-prefix reads) must be exact."""
        params = vlm.init(KEY, TINY, dtype=F32)
        B, L = 2, 6
        ids = jax.random.randint(jax.random.PRNGKey(9), (2 * B, L), 0, 100)
        embeds = vlm.embed_text(params, ids).astype(F32)
        mask = np.ones((2 * B, L + N_IMG), dtype=np.int32)
        mask[1, :2] = 0  # left-padded row
        mask = jnp.asarray(mask)
        kwargs = dict(
            rng=KEY,
            cfg_weight=jnp.float32(5.0),
            temperature=jnp.float32(0.0),
            num_tokens=N_IMG,
        )
        ref = generate_image_tokens(params, TINY, embeds, mask, **kwargs)
        out = generate_image_tokens(params, TINY, embeds, mask, chunked=True, **kwargs)
        np.testing.assert_array_equal(np.asarray(ref.tokens), np.asarray(out.tokens))


class TestPerRowSamplingKeys:
    """Serving reproducibility: with per-row keys ([B, 2] rng), a row's
    sampled stream is a pure function of its own key — independent of batch
    composition (plangen_tpu/serve.py batches mixed seeds because of this)."""

    def _gen(self, keys, n=4):
        params = vlm.init(KEY, TINY, dtype=jnp.float32)
        B = keys.shape[0]
        ids = jnp.tile(jnp.arange(6)[None], (2 * B, 1))
        emb = vlm.embed_text(params, ids).astype(jnp.float32)
        mask = jnp.ones((2 * B, 6 + n), jnp.int32)
        out = generate_image_tokens(
            params, TINY, emb, mask, rng=keys,
            cfg_weight=jnp.float32(5.0), temperature=jnp.float32(1.0),
            num_tokens=n,
        )
        return np.asarray(out.tokens)

    def test_same_key_rows_identical(self):
        k = jax.random.PRNGKey(7)
        toks = self._gen(jnp.stack([k, k, jax.random.PRNGKey(9)]))
        np.testing.assert_array_equal(toks[0], toks[1])
        assert not np.array_equal(toks[0], toks[2])

    def test_batch_composition_independent(self):
        k1, k2, k3 = (jax.random.PRNGKey(i) for i in (1, 2, 3))
        a = self._gen(jnp.stack([k1, k2]))
        b = self._gen(jnp.stack([k1, k3]))
        np.testing.assert_array_equal(a[0], b[0])


class TestFlagValidation:
    """Flag combinations the decode paths cannot honor must REFUSE, not
    silently run a different program (review round 4)."""

    def setup_method(self):
        self.params = vlm.init(KEY, TINY, dtype=F32)
        B, L = 1, 4
        ids = jax.random.randint(jax.random.PRNGKey(3), (2 * B, L), 0, 100)
        self.embeds = vlm.embed_text(self.params, ids).astype(F32)
        self.mask = jnp.ones((2 * B, L + N_IMG), dtype=jnp.int32)

    def _gen(self, **kw):
        import pytest

        with pytest.raises(ValueError, match=kw.pop("match")):
            generate_image_tokens(
                self.params, TINY, self.embeds, self.mask, rng=KEY,
                cfg_weight=jnp.float32(5.0), temperature=jnp.float32(1.0),
                num_tokens=N_IMG, **kw,
            )

    def test_chunked_with_int8_cache_rejected(self):
        # llama._layer's int8-cache branch precedes the chunked/paged
        # branches — the flags would be silently ignored otherwise
        self._gen(quantized_cache=True, chunked=True,
                  match="int8 KV cache")

    def test_paged_with_int8_cache_rejected(self):
        self._gen(quantized_cache=True, paged=True, match="int8 KV cache")

    def test_layers_limit_zero_rejected(self):
        import pytest

        with pytest.raises(ValueError, match="layers_limit"):
            llama.forward(
                self.params["language_model"], TINY.llama,
                self.embeds, self.mask[:, :4],
                positions=jnp.arange(4),
                kv_cache=None,
                layers_limit=0,
            )


def test_transitional_q_k_proj_artifact_rejected():
    """Artifacts from the short-lived q|k fused layout must fail with a
    remedy, not KeyError mid-trace (tasks/eval.py _artifact_quant_form)."""
    import pytest

    from plangen_tpu.tasks.eval import _artifact_quant_form

    params = {"language_model": {"layers": {
        "q_k_proj": {"w_p4": 0, "s_lo": 0, "s_hi16": 0}, "v_proj": 0,
    }}}
    with pytest.raises(ValueError, match="transitional"):
        _artifact_quant_form(params)
