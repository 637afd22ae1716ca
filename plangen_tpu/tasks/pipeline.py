"""The five PlanGen task modes as thin drivers over the fused runtime.

Reference orchestration: `System.uni_generate` / `validation`
(plangen_base.py:327-458, 1087-1181). Modes:

  * layout2image ('uni')      — GT grounding conditions the image decode.
  * joint ('uni_2stage')      — stage-1 greedy layout decode, then image.
  * understanding ('mmu')     — SigLIP-spliced prompt, greedy layout decode.
  * planning ('plan')         — text-only stage-1 layout decode.
  * edit / removal            — teacher-forced image decode with edit_region;
                                removal adds per-sample negative grounding
                                (use_neg_box) at the removed box.

Device work is three jitted programs (stage-1 text decode, CFG image decode,
VQ detokenize) + one jitted VQ encode for teacher forcing. Everything else is
host-side numpy batch construction.
"""

from __future__ import annotations

import functools

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from plangen_tpu.config import GenerationConfig, PlanGenModelConfig
from plangen_tpu.models import vlm, vq
from plangen_tpu.runtime.generate import generate_image_tokens, greedy_decode_text
from plangen_tpu.tasks.processor import PlanGenProcessor
from plangen_tpu.text.grounding import truncate_grounding

Params = Dict[str, Any]


@functools.partial(jax.jit, static_argnames=("ps",))
def _row_keys(seeds: jax.Array, ps: int) -> jax.Array:
    """Per-row sampling keys [B*ps, 2] from per-caption seeds [B], the
    parallel_size copy index folded in (row r = copy r//B of caption r%B)."""
    base = jax.vmap(jax.random.PRNGKey)(seeds)
    if ps == 1:
        return base
    return jnp.concatenate(
        [jax.vmap(lambda k: jax.random.fold_in(k, c))(base) for c in range(ps)],
        axis=0,
    )


@partial(jax.jit, static_argnames=("cfg", "grid"))
def _vq_decode(params: Params, cfg: PlanGenModelConfig, tokens, grid: int):
    return vq.decode_code(params["gen_vision_model"], cfg.vq, tokens, (grid, grid))


@partial(jax.jit, static_argnames=("cfg", "grid"))
def _vq_decode_u8(params: Params, cfg: PlanGenModelConfig, tokens, grid: int):
    return vq.decode_code_uint8(
        params["gen_vision_model"], cfg.vq, tokens, (grid, grid)
    )


@partial(jax.jit, static_argnames=("cfg",))
def _vq_encode(params: Params, cfg: PlanGenModelConfig, images):
    return vq.encode_to_indices(params["gen_vision_model"], cfg.vq, images)


@partial(jax.jit, static_argnames=("cfg",))
def _embed_ids(params: Params, cfg: PlanGenModelConfig, ids):
    return vlm.embed_text(params, ids)


@partial(jax.jit, static_argnames=("cfg",))
def _mmu_embeds(params: Params, cfg: PlanGenModelConfig, ids, images, seq_mask):
    return vlm.prepare_inputs_embeds(params, cfg, ids, images, seq_mask)


@dataclass
class GenerationOutput:
    images: Optional[np.ndarray] = None  # [B*, H, W, 3]: float [-1, 1], or
    # uint8 when GenerationConfig.output_uint8 (device-side conversion)
    image_tokens: Optional[np.ndarray] = None  # [B*, 576]
    groundings: Optional[List[str]] = None  # predicted layout strings
    texts: Optional[List[str]] = None  # raw decoded texts (mmu)
    edit_mask: Optional[np.ndarray] = None  # [B, 576] regen mask used


@dataclass
class PreparedImageGen:
    """Host-side batch construction for `layout_to_image`, split out so a
    serving prep thread can tokenize + build the CFG dual batch + dispatch
    the embed program for batch N+1 WHILE batch N's decode owns the device
    (serve.py two-stage batcher; the ~1.1 s/batch of in-pipeline host work
    measured in DESIGN.md §11). `execute_image_gen` consumes it."""

    embeds: Any  # device [2B, L, H] (embed program already dispatched)
    cfg_mask: Any  # [2B, S]
    rng: Any  # single key or per-row keys
    groundings: List[str]
    ps: int
    gt_tokens: Any = None  # device [B, 576] (VQ encode dispatched) or None
    regen: Any = None  # device [B, 576] or None
    regen_np: Optional[np.ndarray] = None  # host copy (fast-edit schedule)
    edit_mask_out: Optional[np.ndarray] = None
    n_rows: int = 0  # len(captions) * ps


class PlanGenPipeline:
    def __init__(
        self,
        params: Params,
        model_cfg: PlanGenModelConfig,
        processor: PlanGenProcessor,
        gen_cfg: Optional[GenerationConfig] = None,
        compute_dtype=None,
        params_int4: Optional[Params] = None,
    ):
        self.params = params
        # generation.quantize="auto": the int4 tree (shares every non-LM
        # subtree with `params` by reference — ops/quant.py
        # quantize_lm_params_int4_shared); decode programs route between
        # the two at the measured batch crossover (_params_for)
        self.params_int4 = params_int4
        self.cfg = model_cfg
        self.proc = processor
        self.gen = gen_cfg or processor.gen
        if compute_dtype is None:
            # follow the parameters' dtype (fp32 masters during training
            # validation, bf16 for serving) so loop carries stay type-stable
            compute_dtype = params["language_model"]["embed_tokens"].dtype
        self.dtype = compute_dtype
        # image-token grid is defined by the VQ downsampling (24 at 384px);
        # equals the SigLIP patch grid for the real config (both 16x)
        self.grid = model_cfg.vision.image_size // model_cfg.vq.downsample_factor

    @property
    def _quantized_cache(self) -> bool:
        # every quantized mode pairs with the int8 KV cache; one predicate
        # so a future mode cannot miss a decode path. "int8_kv" IS the
        # bf16-weights + int8-cache config (the measured-best B>=48 serving
        # form); "auto" uses the int8 cache on both weight routes so the
        # cache layout never depends on the batch size
        return self.gen.quantize in (
            "int8", "int4", "int4_a8", "int8_kv", "auto"
        )

    def _params_for(self, n_rows: int) -> Params:
        """Batch-aware weight-format routing (generation.quantize="auto"):
        at <= auto_int4_max_rows matmul rows the decode is weight-read
        bound and the int4 tree wins; above it the M>=96 matmuls run
        FASTER from bf16 (int operands stream through the MXU at ~the
        bf16 element rate — DESIGN.md §8/§12, BENCH_SWEEP.json). Without
        the dual-resident form this returns the single configured tree."""
        if self.params_int4 is None:
            return self.params
        if n_rows <= self.gen.auto_int4_max_rows:
            return self.params_int4
        return self.params

    # when True, _detokenize returns the DEVICE array without the host fetch;
    # the consumer np.asarray's it on its own thread. Serving sets this so
    # the ~0.5 s/batch tunnel fetch overlaps the next batch's device work
    # (the assembler thread performs the conversion).
    defer_fetch: bool = False

    def _detokenize(self, tokens) -> np.ndarray:
        """VQ ids -> pixels. With `gen.output_uint8` the uint8 conversion
        happens ON DEVICE (bit-identical to the host save formula), shrinking
        the device->host fetch 4x — that fetch, not the decoder compute,
        dominates detokenize wall time over the tunnel (docs/DESIGN.md)."""
        if self.gen.output_uint8:
            dev = _vq_decode_u8(self.params, self.cfg, tokens, self.grid)
            return dev if self.defer_fetch else np.asarray(dev)
        dev = _vq_decode(self.params, self.cfg, tokens, self.grid)
        if self.defer_fetch:
            # device-side cast so the consumer's bare np.asarray yields the
            # same float32 pixels as the non-deferred branch
            return dev.astype(jnp.float32)
        return np.asarray(dev, dtype=np.float32)

    # ------------------------------------------------------------------ plan

    def _text_decode(self, embeds, mask, budget):
        """Greedy text decode: sequential KV-cached loop, or Jacobi parallel
        iteration when generation.jacobi is set (token-exact either way)."""
        if getattr(self.gen, "jacobi", False):
            from plangen_tpu.runtime.jacobi import jacobi_decode_text

            return jacobi_decode_text(
                self.params, self.cfg, embeds, mask,
                jnp.int32(self.proc.tok.special.eos_id),
                max_new_tokens=budget,
            )
        return greedy_decode_text(
            self._params_for(int(embeds.shape[0])), self.cfg, embeds, mask,
            jnp.int32(self.proc.tok.special.eos_id),
            max_new_tokens=budget,
            growing_cache=self.gen.growing_cache,
            quantized_cache=self._quantized_cache,
        )

    def plan(self, captions: Sequence[str]) -> List[str]:
        """Text -> layout grounding strings (task 'plan'; reference
        uni_generate pred_layout branch, plangen_base.py:363-377)."""
        return self.plan_from_prepared(self.prepare_plan(captions))

    def prepare_plan(self, captions: Sequence[str]) -> Dict[str, Any]:
        """Host half of `plan` (tokenize + embed dispatch) — see
        PreparedImageGen for why the split exists."""
        budget = self.gen.max_new_text_tokens
        ids, mask = self.proc.stage1_batch(list(captions), budget)
        embeds = _embed_ids(self.params, self.cfg, jnp.asarray(ids)).astype(self.dtype)
        return {"embeds": embeds, "mask": jnp.asarray(mask), "budget": budget}

    def plan_from_prepared(self, prep: Dict[str, Any]) -> List[str]:
        tokens = self._text_decode(prep["embeds"], prep["mask"], prep["budget"])
        texts = self.proc.decode_until_eos(np.asarray(tokens))
        return [truncate_grounding(t) for t in texts]

    # ------------------------------------------------------------------- mmu

    def understand(
        self, images: np.ndarray, question: Optional[str] = None
    ) -> GenerationOutput:
        """Image -> caption + layout description (task 'mmu';
        reference uni_generate is_mmu branch, plangen_base.py:364-372)."""
        return self.understand_from_prepared(
            self.prepare_understand(images, question)
        )

    def prepare_understand(
        self, images: np.ndarray, question: Optional[str] = None
    ) -> Dict[str, Any]:
        """Host half of `understand`: MMU prompt build + the SigLIP-spliced
        embed dispatch (the vision tower runs inside that program)."""
        B = images.shape[0]
        budget = self.gen.max_new_text_tokens
        kwargs = {} if question is None else {"question": question}
        batch = self.proc.mmu_batch(B, decode_budget=budget, **kwargs)
        embeds = _mmu_embeds(
            self.params,
            self.cfg,
            jnp.asarray(batch.input_ids),
            jnp.asarray(images, dtype=self.dtype),
            jnp.asarray(batch.images_seq_mask),
        ).astype(self.dtype)
        return {"embeds": embeds, "mask": jnp.asarray(batch.attn_mask),
                "budget": budget}

    def understand_from_prepared(self, prep: Dict[str, Any]) -> GenerationOutput:
        tokens = self._text_decode(prep["embeds"], prep["mask"], prep["budget"])
        texts = self.proc.decode_until_eos(np.asarray(tokens))
        return GenerationOutput(texts=texts, groundings=texts)

    # ---------------------------------------------------------- layout2image

    def layout_to_image(
        self,
        captions: Sequence[str],
        groundings: Sequence[str],
        neg_captions: Optional[Sequence[str]] = None,
        neg_groundings: Optional[Sequence[str]] = None,
        gt_images: Optional[np.ndarray] = None,
        edit_region: Optional[np.ndarray] = None,
        seed: Optional[int] = None,
        seeds: Optional[Sequence[int]] = None,  # per-request (serving)
        parallel_size: Optional[int] = None,
        teacher_forcing: Optional[bool] = None,
    ) -> GenerationOutput:
        """Layout-conditioned image generation (task 'uni'), also the engine
        for edit/removal when `gt_images` + `edit_region` are given
        (teacher forcing, plangen_base.py:593-598).

        `seeds` gives each caption its OWN sampling stream (per-row keys):
        a request's tokens become a pure function of (inputs, its seed),
        independent of what else shares the batch — the serving contract
        (plangen_tpu/serve.py batches requests with different seeds
        together because of this). `seed` keeps the single-stream form."""
        prep = self.prepare_layout_to_image(
            captions, groundings,
            neg_captions=neg_captions, neg_groundings=neg_groundings,
            gt_images=gt_images, edit_region=edit_region,
            seed=seed, seeds=seeds, parallel_size=parallel_size,
            teacher_forcing=teacher_forcing,
        )
        return self.execute_image_gen(prep)

    def prepare_layout_to_image(
        self,
        captions: Sequence[str],
        groundings: Sequence[str],
        neg_captions: Optional[Sequence[str]] = None,
        neg_groundings: Optional[Sequence[str]] = None,
        gt_images: Optional[np.ndarray] = None,
        edit_region: Optional[np.ndarray] = None,
        seed: Optional[int] = None,
        seeds: Optional[Sequence[int]] = None,
        parallel_size: Optional[int] = None,
        teacher_forcing: Optional[bool] = None,
    ) -> PreparedImageGen:
        """Host half of `layout_to_image`: tokenization, CFG dual-batch
        construction, edit-region replication, and the embed / VQ-encode /
        key-derivation DISPATCHES (tiny programs that queue behind whatever
        owns the device). Thread-safe vs a running `execute_image_gen`."""
        ps = parallel_size or self.gen.parallel_size
        captions = list(captions)
        ids, mask = self.proc.uni_batch(captions, list(groundings))
        cfg_ids, cfg_mask = self.proc.cfg_batch(
            ids, mask, neg_captions, neg_groundings, parallel_size=ps
        )
        n_img = self.cfg.image_seq_len

        gt_tokens = None
        regen = None
        regen_np = None
        edit_mask_out = None
        if teacher_forcing is None:
            teacher_forcing = self.gen.use_teacher_forcing
        if gt_images is not None and teacher_forcing:
            gt_tok = _vq_encode(
                self.params, self.cfg, jnp.asarray(gt_images, dtype=self.dtype)
            )
            if edit_region is None:
                edit_region = np.zeros((len(captions), n_img), dtype=np.int32)
            # replicate on DEVICE: np.asarray(gt_tok) here would sync the
            # prep thread behind whatever decode currently owns the device
            gt_tokens = jnp.concatenate([gt_tok] * ps, axis=0) if ps > 1 else gt_tok
            regen_np = np.concatenate(
                [np.asarray(edit_region, dtype=np.int32)] * ps, axis=0
            )
            regen = jnp.asarray(regen_np)
            edit_mask_out = regen_np

        embeds = _embed_ids(self.params, self.cfg, jnp.asarray(cfg_ids)).astype(
            self.dtype
        )
        if seeds is not None:
            assert len(seeds) == len(captions)
            # one jitted dispatch (eager per-key PRNGKey/fold_in calls cost
            # ~1s each over the axon tunnel — CLAUDE.md). Seeds are taken
            # mod 2**32 (the per-row key dtype): wider ints fold rather than
            # raise, so one oversized seed can't fail a whole served batch.
            rng = _row_keys(
                jnp.asarray([int(s) & 0xFFFFFFFF for s in seeds], jnp.uint32),
                ps,
            )  # [B, 2] per-row keys
        else:
            rng = jax.random.PRNGKey(self.gen.seed if seed is None else seed)
        return PreparedImageGen(
            embeds=embeds, cfg_mask=jnp.asarray(cfg_mask), rng=rng,
            groundings=list(groundings), ps=ps, gt_tokens=gt_tokens,
            regen=regen, regen_np=regen_np, edit_mask_out=edit_mask_out,
            n_rows=len(captions) * ps,
        )

    def execute_image_gen(self, prep: PreparedImageGen) -> GenerationOutput:
        """Device half of `layout_to_image`: the fused decode program(s) on a
        prepared batch, then detokenize."""
        B = prep.n_rows
        n_img = self.cfg.image_seq_len
        embeds, rng = prep.embeds, prep.rng
        # CFG rows (2 x images x parallel_size) = the decode matmul M dim
        params = self._params_for(int(embeds.shape[0]))
        gt_tokens, regen = prep.gt_tokens, prep.regen
        cfg_mask = prep.cfg_mask
        groundings = prep.groundings
        edit_mask_out = prep.edit_mask_out
        if self.gen.fast_edit and gt_tokens is not None:
            # frozen runs prefilled in one pass (token-identical); the
            # schedule is canonicalized to a coarse prefix/suffix form so a
            # whole eval workload compiles at most a handful of programs
            # (remote TPU compiles are minutes each — see fast_edit.py)
            from plangen_tpu.runtime.fast_edit import (
                canonicalize_schedule,
                frozen_chunk_schedule,
                generate_image_tokens_fast_edit,
            )

            schedule = canonicalize_schedule(
                frozen_chunk_schedule(prep.regen_np)
            )
            result = generate_image_tokens_fast_edit(
                params,
                self.cfg,
                embeds,
                cfg_mask,
                rng=rng,
                cfg_weight=jnp.float32(self.gen.cfg_weight),
                temperature=jnp.float32(self.gen.temperature),
                gt_tokens=gt_tokens,
                regen_mask=regen,
                num_tokens=n_img,
                schedule=schedule,
                quantized_cache=self._quantized_cache,
                kv_a8=self.gen.kv_a8,
            )
            return GenerationOutput(
                images=self._detokenize(result.tokens),
                image_tokens=np.asarray(result.tokens),
                groundings=list(groundings),
                edit_mask=edit_mask_out,
            )
        if (
            getattr(self.gen, "speculative", False)
            and B == 1
            and gt_tokens is None
        ):
            # B=1 latency path: self-speculative decode (distribution-exact;
            # see runtime/speculative.py for why B=1-only and opt-in)
            from plangen_tpu.runtime.speculative import generate_image_tokens_spec

            result = generate_image_tokens_spec(
                params,
                self.cfg,
                embeds,
                cfg_mask,
                # speculative is B=1: the request's own key IS row 0's key
                rng=rng[0] if rng.ndim == 2 else rng,
                cfg_weight=jnp.float32(self.gen.cfg_weight),
                temperature=jnp.float32(self.gen.temperature),
                num_tokens=n_img,
                draft_layers=self.gen.spec_draft_layers,
                draft_len=self.gen.spec_draft_len,
            )
        else:
            result = generate_image_tokens(
                params,
                self.cfg,
                embeds,
                cfg_mask,
                rng=rng,
                cfg_weight=jnp.float32(self.gen.cfg_weight),
                temperature=jnp.float32(self.gen.temperature),
                quantized_cache=self._quantized_cache,
                growing_cache=self.gen.growing_cache,
                kv_a8=self.gen.kv_a8,
                gt_tokens=gt_tokens,
                regen_mask=regen,
                num_tokens=n_img,
            )
        return GenerationOutput(
            images=self._detokenize(result.tokens),
            image_tokens=np.asarray(result.tokens),
            groundings=list(groundings),
            edit_mask=edit_mask_out,
        )

    # ------------------------------------------------------------ uni_2stage

    def joint_generate(
        self, captions: Sequence[str], seed: Optional[int] = None,
        seeds: Optional[Sequence[int]] = None,
        parallel_size: Optional[int] = None,
    ) -> GenerationOutput:
        """Plan the layout, then generate the image conditioned on it
        (task 'uni_2stage'; reference plangen_base.py:363-390)."""
        groundings = self.plan(captions)
        out = self.layout_to_image(captions, groundings, seed=seed, seeds=seeds,
                                   parallel_size=parallel_size)
        out.groundings = groundings
        return out

    # ---------------------------------------------------------- edit/removal

    def edit_image(
        self,
        captions: Sequence[str],
        groundings: Sequence[str],
        gt_images: np.ndarray,
        edit_region: np.ndarray,  # [B, 576] 1 = regenerate
        neg_captions: Optional[Sequence[str]] = None,
        neg_groundings: Optional[Sequence[str]] = None,
        seed: Optional[int] = None,
        seeds: Optional[Sequence[int]] = None,
    ) -> GenerationOutput:
        """Layout-guided editing / object removal: background tokens frozen to
        the GT encoding, edit region re-sampled under the (possibly negative-
        grounded) CFG prompt. Reference flow §3.5 (SURVEY.md)."""
        return self.layout_to_image(
            captions,
            groundings,
            neg_captions=neg_captions,
            neg_groundings=neg_groundings,
            gt_images=gt_images,
            edit_region=edit_region,
            seed=seed,
            seeds=seeds,
            teacher_forcing=True,
        )
