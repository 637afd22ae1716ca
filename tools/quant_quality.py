"""Quantization quality gate (VERDICT r5 #6).

bf16 parity vs the torch reference is proven by tools/golden_parity.py;
the quantized serving configs — the repo's actual recommendation (int8-KV
B=64 headline, int4 low-batch, auto routing) — need to know their distance
from that north star. This tool runs the SAME pinned protocol inputs
(tools/golden_parity.py PINNED_*) through each quantized config and the
checkpoint's own bf16 pipeline and reports, per (config, mode):

  * token agreement %% + first divergence (greedy text: plan, mmu;
    sampled image tokens at a FIXED seed: t2i)
  * sampled-token probability drift: teacher-force the bf16 run's image
    tokens through the quantized model (full-seq CFG forward, the
    logit-injection protocol of golden_parity.run_uni) and compare each
    step's probability of the bf16-chosen token
  * FID/KID between the bf16 and quantized image sets (one SigLIP
    featurizer — the bf16 tower — scores both; relative numbers,
    tasks/image_metrics.py caveats apply)

Dry-runs in CI on a tiny random init (tests/test_quant_quality.py); on
weights day point --janus-path at the real checkpoint, or run the whole
protocol via tools/run_parity.py --quant.

Usage:
  python tools/quant_quality.py --janus-path <ckpt> \
      [--quant int8,int8_kv,int4,int4_a8,auto] [--modes plan,mmu,t2i] \
      [--n-images 8] --out quant_quality.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(Path(__file__).parent))


def _agreement(a, b) -> dict:
    """Elementwise token agreement between equal-shape int arrays."""
    import numpy as np

    a = np.asarray(a)
    b = np.asarray(b)
    assert a.shape == b.shape, (a.shape, b.shape)
    same = a == b
    first = None
    if not same.all():
        rows, pos = np.nonzero(~same)
        first = {"row": int(rows[0]), "pos": int(pos[0]),
                 "bf16": int(b[rows[0], pos[0]]), "quant": int(a[rows[0], pos[0]])}
    return {
        "n_tokens": int(same.size),
        "agreement_pct": round(100.0 * float(same.mean()), 2),
        "first_divergence": first,
    }


def _forced_probs(pipe, cfg_ids, cfg_mask, tokens):
    """P(token_i | bf16 prefix) under THIS pipe's params: full-seq CFG
    forward, logits -> cfg-combined softmax, take-along the forced tokens
    (the golden_parity.run_uni injection protocol, tools/golden_parity.py)."""
    import jax
    import jax.numpy as jnp

    from plangen_tpu.models import llama, vlm
    from plangen_tpu.ops.sampling import cfg_combine

    n_img = tokens.shape[1]
    w = jnp.float32(pipe.gen.cfg_weight)
    t = jnp.float32(max(pipe.gen.temperature, 1e-6))

    @jax.jit
    def prog(params, cfg_ids, cfg_mask, tokens):
        embeds = vlm.embed_text(params, cfg_ids).astype(pipe.dtype)
        pair = jnp.repeat(tokens, 2, axis=0)
        img = vlm.gen_img_embeds(params, pair).astype(pipe.dtype)
        x = jnp.concatenate([embeds, img], axis=1)
        hidden, _ = llama.forward(params["language_model"], pipe.cfg.llama,
                                  x, cfg_mask)
        L = cfg_ids.shape[1]
        h = hidden[:, L - 1 : L - 1 + n_img]
        logits = vlm.image_gen_logits(params, h)
        comb = cfg_combine(logits, w)
        probs = jax.nn.softmax(comb / t, axis=-1)
        p = jnp.take_along_axis(probs, tokens[:, :, None], axis=-1)[..., 0]
        top1 = jnp.argmax(comb, axis=-1).astype(jnp.int32)
        return p, top1

    # "auto" routes by matmul rows; the forced forward is 2 rows -> int4
    params = pipe._params_for(2)
    return prog(params, cfg_ids, cfg_mask, tokens)


def run_config(pipe, base, modes, n_images, seed):
    """All requested modes for one pipeline; `base` is None for the bf16
    baseline pass (outputs recorded), else the baseline's outputs dict."""
    import numpy as np

    import golden_parity as gp

    out = {}
    rec = []
    if "plan" in modes:
        t0 = time.time()
        prep = pipe.prepare_plan(list(gp.PINNED_CAPTIONS))
        toks = np.asarray(
            pipe._text_decode(prep["embeds"], prep["mask"], prep["budget"]))
        out["plan"] = toks
        r = {"mode": "plan", "seconds": round(time.time() - t0, 1)}
        if base is not None:
            r.update(_agreement(toks, base["plan"]))
        rec.append(r)
    if "mmu" in modes:
        t0 = time.time()
        size = pipe.cfg.vision.image_size
        images = gp.pinned_image(size)
        prep = pipe.prepare_understand(images, gp.PINNED_QUESTION)
        toks = np.asarray(
            pipe._text_decode(prep["embeds"], prep["mask"], prep["budget"]))
        out["mmu"] = toks
        r = {"mode": "mmu", "seconds": round(time.time() - t0, 1)}
        if base is not None:
            r.update(_agreement(toks, base["mmu"]))
        rec.append(r)
    if "t2i" in modes:
        t0 = time.time()
        caps = [gp.PINNED_UNI_CAPTION] * n_images
        grounds = [gp.PINNED_UNI_GROUNDING] * n_images
        gout = pipe.layout_to_image(caps, grounds,
                                    seeds=list(range(seed, seed + n_images)))
        toks = np.asarray(gout.image_tokens)
        imgs = np.asarray(gout.images)
        out["t2i_tokens"] = toks
        out["t2i_images"] = imgs
        r = {"mode": "t2i", "n_images": n_images,
             "seconds": round(time.time() - t0, 1)}
        if base is not None:
            r.update(_agreement(toks, base["t2i_tokens"]))
            # probability drift: P(bf16 token_i) under quant vs under bf16
            import jax.numpy as jnp

            ids, mask = pipe.proc.uni_batch([caps[0]], [grounds[0]])
            cfg_ids, cfg_mask = pipe.proc.cfg_batch(ids, mask, None, None,
                                                    parallel_size=1)
            forced = jnp.asarray(base["t2i_tokens"][:1])
            p_q, top1_q = _forced_probs(pipe, jnp.asarray(cfg_ids),
                                        jnp.asarray(cfg_mask), forced)
            p_b, top1_b = base["t2i_probs"]
            d = np.abs(np.asarray(p_q, dtype=np.float64)
                       - np.asarray(p_b, dtype=np.float64))
            r["prob_drift"] = {
                "mean_abs": float(d.mean()),
                "max_abs": float(d.max()),
                "top1_agreement_pct": round(
                    100.0 * float((np.asarray(top1_q)
                                   == np.asarray(top1_b)).mean()), 2),
            }
        rec.append(r)
    if base is None and "t2i" in modes:
        # baseline records its own forced probs for the drift comparison
        import jax.numpy as jnp

        ids, mask = pipe.proc.uni_batch([gp.PINNED_UNI_CAPTION],
                                        [gp.PINNED_UNI_GROUNDING])
        cfg_ids, cfg_mask = pipe.proc.cfg_batch(ids, mask, None, None,
                                                parallel_size=1)
        out["t2i_probs"] = _forced_probs(
            pipe, jnp.asarray(cfg_ids), jnp.asarray(cfg_mask),
            jnp.asarray(out["t2i_tokens"][:1]))
    return out, rec


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--janus-path", default=None)
    ap.add_argument("--finetune", default=None)
    ap.add_argument("--cfg", default=None)
    ap.add_argument("--opt", nargs="*", default=[])
    ap.add_argument("--quant", default="int8,int8_kv,int4,int4_a8,auto")
    ap.add_argument("--modes", default="plan,mmu,t2i")
    ap.add_argument("--n-images", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--max-new-text-tokens", type=int, default=64)
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    ap.add_argument("--out", default="quant_quality.json")
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from plangen_tpu.cli import load_config
    from plangen_tpu.config import apply_overrides
    from plangen_tpu.tasks.eval import build_pipeline

    opts = [f"generation.max_new_text_tokens={args.max_new_text_tokens}",
            *args.opt]
    if args.janus_path:
        opts.insert(0, f"janus_path={args.janus_path}")
    if args.finetune:
        opts.insert(0, f"finetune_path={args.finetune}")
    cfg = load_config(args.cfg, opts)

    from plangen_tpu.convert.loading import load_params
    from plangen_tpu.models import vlm

    params = load_params(cfg)
    if params is None:
        print("quant_quality: no weights configured — tiny RANDOM init "
              "(structural dry run; numbers are not model quality)",
              file=sys.stderr)
        params = jax.jit(
            lambda k: vlm.init(k, cfg.model, dtype=jnp.bfloat16)
        )(jax.random.PRNGKey(0))

    modes = [m.strip() for m in args.modes.split(",") if m.strip()]
    quants = [q.strip() for q in args.quant.split(",") if q.strip()]

    pipe_b = build_pipeline(cfg, params=params)
    base, base_rec = run_config(pipe_b, None, modes, args.n_images, args.seed)
    report = {"bf16": base_rec}
    print(json.dumps({"config": "bf16", "rows": base_rec}), flush=True)

    feat = None
    if "t2i" in modes:
        from plangen_tpu.tasks.image_metrics import (
            SigLIPFeaturizer, fid_kid_from_features)

        feat = SigLIPFeaturizer(params, cfg.model,
                                batch_size=min(8, args.n_images))
        base_feats = feat(base["t2i_images"])

    for q in quants:
        try:
            cq = apply_overrides(cfg, {"generation.quantize": q})
            # int4 modes DONATE the dense tree they quantize (tasks/eval.py
            # _apply_quantize, a 7B memory requirement) — hand them a copy
            # so the shared base params survive for the next config
            p_in = params
            if q in ("int4", "int4_a8"):
                p_in = jax.tree_util.tree_map(jnp.array, params)
            pipe_q = build_pipeline(cq, params=p_in)
            _out, rec = run_config(pipe_q, base, modes, args.n_images,
                                   args.seed)
            if feat is not None:
                from plangen_tpu.tasks.image_metrics import (
                    fid_kid_from_features)

                m = fid_kid_from_features(base_feats, feat(_out["t2i_images"]))
                for r in rec:
                    if r["mode"] == "t2i":
                        r["fid_siglip_vs_bf16"] = round(
                            float(m["fid_siglip"]), 4)
                        r["kid_siglip_vs_bf16"] = round(
                            float(m["kid_siglip"]), 6)
            report[q] = rec
            print(json.dumps({"config": q, "rows": rec}), flush=True)
        except Exception as e:
            report[q] = [{"error": f"{type(e).__name__}: {str(e)[:300]}"}]
            print(json.dumps({"config": q, "error": report[q][0]["error"]}),
                  flush=True)

    Path(args.out).write_text(json.dumps(report, indent=1))
    print(json.dumps({"out": args.out, "configs": list(report)}))
    # quality gate is informational (quantization is lossy by design);
    # hard-fail only on structural errors
    bad = [q for q, rows in report.items()
           if any("error" in r for r in rows)]
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
