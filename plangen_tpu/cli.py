"""CLI entrypoint: train / eval / bench with dotted-key config overrides.

Reference ergonomics: `python train.py --cfg <file> --opt k=v ...`
(train.py:23-49, mmengine DictAction). Here configs are Python modules
exporting `CONFIG: PlanGenConfig` (or a dict of overrides applied to the
default config), and `--opt` fragments deep-merge the same way:

    python -m plangen_tpu.cli train --opt train.max_train_steps=100 \
        train.train_data='[{"task_type":"uni","data_name":"toy","batch_size":2}]'
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
from typing import Optional

from plangen_tpu.config import (
    FlowConfig,
    PlanGenConfig,
    apply_overrides,
    parse_opt_list,
)


def load_config(cfg_path: Optional[str], opts: list) -> PlanGenConfig:
    cfg = PlanGenConfig()
    if cfg_path:
        spec = importlib.util.spec_from_file_location("user_cfg", cfg_path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        if hasattr(mod, "CONFIG"):
            cfg = mod.CONFIG
        elif hasattr(mod, "OVERRIDES"):
            cfg = apply_overrides(cfg, mod.OVERRIDES)
        else:
            raise ValueError(f"{cfg_path} must export CONFIG or OVERRIDES")
    if opts:
        cfg = apply_overrides(cfg, parse_opt_list(opts))
    # normalize train_data entries given as dicts
    flows = tuple(
        f if isinstance(f, FlowConfig) else FlowConfig(**f)
        for f in cfg.train.train_data
    )
    if flows != cfg.train.train_data:
        cfg = apply_overrides(cfg, {"train.train_data": flows})
    # ... and test_data (a SINGLE flow): a raw dict here would pass
    # validation and crash hours later at the first validation step
    # (trainer reads test_data.task_type)
    if isinstance(cfg.train.test_data, dict):
        cfg = apply_overrides(
            cfg, {"train.test_data": FlowConfig(**cfg.train.test_data)}
        )
    return cfg


def cmd_train(args) -> None:
    from plangen_tpu.train.trainer import Trainer

    cfg = load_config(args.cfg, args.opt)
    trainer = Trainer(cfg)
    # in-training validation cadence (reference train.py:208-210); sized by
    # train.val_max_len, disable with validation_steps=0
    validate_fn = trainer.validate if cfg.train.validation_steps > 0 else None
    metrics = trainer.fit(max_steps=args.max_steps, validate_fn=validate_fn)
    print(json.dumps({"final": metrics}))


def cmd_eval(args) -> None:
    from plangen_tpu.tasks.eval import run_validation

    cfg = load_config(args.cfg, args.opt)
    run_validation(
        cfg,
        task_type=args.task,
        data_name=args.data,
        max_len=args.max_len,
        output_dir=args.output,
    )


def cmd_serve(args) -> None:
    from plangen_tpu.serve import serve
    from plangen_tpu.utils.device_probe import probe_device

    # fail fast on an accelerator tunnel outage: serve startup pays minutes
    # of remote compiles (warmup) and would otherwise hang there with no
    # diagnostic. PLANGEN_PROBE=0 skips; PLANGEN_PROBE_TIMEOUT bounds.
    if not probe_device(platform=args.platform):
        sys.exit(
            "serve: device probe failed — a trivial dispatch did not "
            "complete within the bound (accelerator tunnel outage?). "
            "Retry later, or PLANGEN_PROBE=0 to skip the check."
        )
    cfg = load_config(args.cfg, args.opt)
    serve(cfg, host=args.host, port=args.port,
          max_batch=args.max_batch, wait_ms=args.wait_ms,
          min_batch=args.min_batch, warmup_spec=args.warmup)


def cmd_convert(args) -> None:
    """Convert a local Janus-Pro torch checkpoint (+ optional PlanGen
    finetune overlay) into an orbax params artifact; --quantize writes a
    directly-servable quantized tree (int4 is ~4.5x smaller on disk and
    skips quantization at load time)."""
    import jax
    import orbax.checkpoint as ocp

    from plangen_tpu.config import PlanGenModelConfig
    from plangen_tpu.convert.torch_to_jax import load_janus_checkpoint

    cfg = PlanGenModelConfig()
    params = load_janus_checkpoint(
        args.janus_path, cfg, finetune_path=args.finetune
    )
    params = jax.tree_util.tree_map(jax.numpy.asarray, params)
    if args.quantize:
        from plangen_tpu.ops.quant import (
            quantize_lm_params,
            quantize_lm_params_int4,
        )

        if args.quantize == "int8":
            params = quantize_lm_params(params)
        else:
            params = quantize_lm_params_int4(
                params, act_int8=(args.quantize == "int4_a8")
            )
    ckptr = ocp.StandardCheckpointer()
    import os

    out = os.path.abspath(args.out)
    ckptr.save(out, params)
    ckptr.wait_until_finished()
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(json.dumps({"saved": out, "params_m": round(n / 1e6, 1)}))


def cmd_export(args) -> None:
    """Export trained params BACK to the reference's torch world: the full
    HF state dict, or just the tuning-mode-trainable subtree — i.e. a
    reference-compatible `trainable_model_parameters.pth`
    (base_system.py:166-189). Inverse of `cli convert`; round-trip
    exactness pinned in tests/test_convert.py."""
    from plangen_tpu.convert.jax_to_torch import (
        export_state_dict,
        export_trainable_state_dict,
        save_torch_state_dict,
    )
    from plangen_tpu.convert.loading import load_params

    import jax
    import jax.numpy as jnp
    import numpy as np

    cfg = load_config(args.cfg, args.opt)
    # export wants the dense fp32 values, not the serving cast
    params = load_params(cfg, dtype=jnp.float32)
    if params is None:
        sys.exit(
            "export: no weights configured — set params_path (orbax "
            "artifact) or janus_path (torch checkpoint dir) via --opt/--cfg"
        )
    params = jax.tree_util.tree_map(np.asarray, params)
    try:
        if args.trainable:
            sd = export_trainable_state_dict(params, cfg.model,
                                             args.trainable)
        else:
            sd = export_state_dict(params, cfg.model)
        out = save_torch_state_dict(sd, args.out)
    except ValueError as e:  # quantized tree / unknown mode / bad extension
        sys.exit(f"export: {e}")
    total = sum(int(v.size) for v in sd.values())
    print(json.dumps({"saved": out, "keys": len(sd),
                      "params_m": round(total / 1e6, 1),
                      "trainable": args.trainable,
                      # bf16 sources upcast: fp32 values, 2x bf16 disk size.
                      # torch load_state_dict casts on copy_, so the
                      # reference consumes this as-is.
                      "dtype": "float32 (bf16 params upcast on export)"}))


def cmd_metrics(args) -> None:
    """FID/KID between two image directories (the gt_image/ and pr_image/
    trees an eval run writes). Default feature model is the framework's own
    SigLIP tower (zero-egress; relative comparison only); pass
    `--features torch:<path>` (a TorchScript feature module, e.g. scripted
    pytorch-fid InceptionV3) for literature-comparable numbers on weights
    day. Prints one JSON line keyed by the feature model."""
    from plangen_tpu.tasks.image_metrics import (
        fid_kid_from_features,
        load_image_dir,
        make_featurizer,
    )

    cfg = load_config(args.cfg, args.opt)
    params = None
    if args.features == "siglip":
        # The featurizer only reads params["vision_model"] — load weights
        # directly instead of build_pipeline, which would also pay the LM
        # quantize/fusion jits and tokenizer load (minutes of remote compile
        # on axon) for weights the metric never touches.
        from plangen_tpu.convert.loading import load_params

        params = load_params(cfg)
        if params is None:
            import jax
            import jax.numpy as jnp

            from plangen_tpu.models import vlm

            params = vlm.init(
                jax.random.PRNGKey(cfg.generation.seed), cfg.model,
                dtype=jnp.bfloat16,
            )
    try:
        feat, tag = make_featurizer(args.features, params, cfg.model,
                                    batch_size=args.batch,
                                    size=args.feature_size)
    except (ValueError, RuntimeError, OSError) as e:
        sys.exit(f"metrics: {e}")
    gt = feat(load_image_dir(args.gt_dir, limit=args.limit))
    pr = feat(load_image_dir(args.pr_dir, limit=args.limit))
    print(json.dumps(fid_kid_from_features(gt, pr, tag=tag)))


def cmd_doctor(args) -> None:
    """Operability diagnostic: is THIS machine ready to train/serve?

    Answers the questions that otherwise surface minutes-deep into a
    hung warmup (CLAUDE.md: axon tunnel outages, multi-minute remote
    compiles): device reachability (bounded subprocess probe — the
    caller never blocks on the backend), native-lib build state,
    compile-cache state, config/checkpoint path validity. Prints one
    human line per check plus a final JSON line; exits non-zero when a
    required check fails (native libs are optional — pure-Python
    fallbacks exist — so they only warn)."""
    import importlib.metadata as md
    import platform as _plat

    report: dict = {"checks": {}}
    ok = True

    def check(name, passed, detail, required=True):
        nonlocal ok
        status = "ok" if passed else ("FAIL" if required else "warn")
        if required and not passed:
            ok = False
        print(f"[{status:4}] {name}: {detail}")
        report["checks"][name] = {"ok": bool(passed), "detail": detail,
                                  "required": bool(required)}

    from plangen_tpu import __version__

    vers = {}
    for pkg in ("jax", "jaxlib", "flax", "optax", "orbax-checkpoint",
                "numpy"):
        try:
            vers[pkg] = md.version(pkg)
        except md.PackageNotFoundError:
            vers[pkg] = None
    report["versions"] = {"plangen_tpu": __version__,
                          "python": _plat.python_version(), **vers}
    missing = [k for k, v in vers.items() if v is None]
    check("deps", not missing,
          ", ".join(f"{k} {v}" for k, v in vers.items() if v)
          + (f" — MISSING: {missing}" if missing else ""))

    # -- device reachability (subprocess-bounded; never hangs the caller)
    if args.no_probe:
        print("[skip] device: probe skipped (--no-probe)")
        report["checks"]["device"] = {"ok": None, "detail": "skipped",
                                      "required": True}
    else:
        from plangen_tpu.utils.device_probe import probe_device_info

        info = probe_device_info(args.probe_timeout, platform=args.platform)
        report["device"] = info
        if info["ok"]:
            detail = (f"{info['device_count']}x {info['platform']} "
                      f"({info['device_kind']}), trivial dispatch "
                      f"{info['dispatch_seconds']}s")
        else:
            detail = info.get("error", "unreachable")
        check("device", info["ok"], detail)

    # -- native C++ libs (optional: python fallbacks exist)
    from plangen_tpu.data.native import native_available
    from plangen_tpu.text.bpe_native import native_bpe_available

    for name, avail in (("native-data", native_available()),
                        ("native-bpe", native_bpe_available())):
        check(name, avail,
              "loaded" if avail else "not built — `make -C native` "
              "(pure-Python fallback active)", required=False)

    # -- persistent compile cache
    cache = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
    n_entries = (len(os.listdir(cache))
                 if os.path.isdir(cache) else 0)
    check("compile-cache", True,
          f"{cache} ({n_entries} entries)"
          + ("" if os.path.isdir(cache) else " — will be created on first "
             "compile; note axon TPU executables may recompile anyway "
             "(CLAUDE.md)"),
          required=False)

    # -- config + checkpoint paths
    if args.cfg or args.opt:
        from plangen_tpu.config import validate_config

        try:
            cfg = validate_config(load_config(args.cfg, args.opt))
            check("config", True,
                  f"loaded ({args.cfg or 'defaults'}), "
                  f"tuning={cfg.train.tuning_mode} "
                  f"quantize={cfg.generation.quantize or 'bf16'}")
        except Exception as e:  # noqa: BLE001 — report, don't crash
            check("config", False, f"{type(e).__name__}: {e}")
            cfg = None
        if cfg is not None:
            for field_name in ("janus_path", "params_path", "finetune_path"):
                path = getattr(cfg, field_name)
                if path is not None:
                    check(field_name, os.path.exists(path),
                          path if os.path.exists(path)
                          else f"{path} does not exist")

    report["ok"] = ok
    print(json.dumps(report))
    if not ok:
        sys.exit(1)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="plangen_tpu")
    # plugin platforms (axon TPU) register at import and ignore
    # JAX_PLATFORMS=cpu, so CPU smoke runs need the config knob set BEFORE
    # the first device query — a CLI flag is the only reliable place
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="force a JAX platform (cpu = smoke-test off-device)")
    from plangen_tpu import __version__
    p.add_argument("--version", action="version",
                   version=f"%(prog)s {__version__}")
    sub = p.add_subparsers(dest="cmd", required=True)

    pt = sub.add_parser("train", help="multi-task training")
    pt.add_argument("--cfg", default=None)
    pt.add_argument("--opt", nargs="*", default=[])
    pt.add_argument("--max-steps", type=int, default=None)
    pt.set_defaults(fn=cmd_train)

    pe = sub.add_parser("eval", help="run a task-mode evaluation")
    pe.add_argument("--cfg", default=None)
    pe.add_argument("--opt", nargs="*", default=[])
    pe.add_argument("--task", default="uni",
                    choices=["uni", "uni_2stage", "mmu", "plan", "edit", "rm", "t2i"])
    pe.add_argument("--data", default="toy")
    pe.add_argument("--max-len", type=int, default=20)
    pe.add_argument("--output", default="out/eval")
    pe.set_defaults(fn=cmd_eval)

    ps = sub.add_parser("serve", help="microbatching HTTP inference server")
    ps.add_argument("--cfg", default=None)
    ps.add_argument("--opt", nargs="*", default=[])
    ps.add_argument("--host", default="127.0.0.1")
    ps.add_argument("--port", type=int, default=8000)
    ps.add_argument("--max-batch", type=int, default=32)
    ps.add_argument("--warmup", default=None,
                    help="pre-compile (mode, bucket) programs before "
                         "accepting traffic, e.g. 'generate:32,plan:8' — "
                         "the port binds only once the listed shapes are "
                         "compile-warm")
    ps.add_argument("--min-batch", type=int, default=1,
                    help="floor the batch bucket (skip compiling small-"
                         "bucket programs on a throughput-provisioned "
                         "server; light load pays padding instead)")
    ps.add_argument("--wait-ms", type=float, default=20.0)
    ps.set_defaults(fn=cmd_serve)

    pc = sub.add_parser("convert", help="torch Janus checkpoint -> orbax params")
    pc.add_argument("--janus-path", required=True)
    pc.add_argument("--finetune", default=None,
                    help="trainable_model_parameters.pth overlay")
    pc.add_argument("--out", default="converted_params")
    pc.add_argument("--quantize", default=None,
                    choices=["int8", "int4", "int4_a8"],
                    help="write a quantized serving artifact")
    pc.set_defaults(fn=cmd_convert)

    pm = sub.add_parser(
        "metrics", help="FID/KID (SigLIP features) between two image dirs"
    )
    pm.add_argument("gt_dir", help="reference images (eval gt_image/ tree)")
    pm.add_argument("pr_dir", help="generated images (eval pr_image/ tree)")
    pm.add_argument("--cfg", default=None)
    pm.add_argument("--opt", nargs="*", default=[])
    pm.add_argument("--batch", type=int, default=16)
    pm.add_argument("--limit", type=int, default=None,
                    help="cap images per side (sorted filename order)")
    pm.add_argument("--features", default="siglip",
                    help="'siglip' (default, relative-only) or "
                         "'torch:<path>' — external TorchScript feature "
                         "module (e.g. scripted pytorch-fid InceptionV3) "
                         "for literature-comparable FID")
    pm.add_argument("--feature-size", type=int, default=299,
                    help="input resolution the torch: feature module "
                         "expects (Inception pool3: 299)")
    pm.set_defaults(fn=cmd_metrics)

    px = sub.add_parser(
        "export",
        help="params -> torch state dict (reference finetune format)",
    )
    px.add_argument("--cfg", default=None)
    px.add_argument("--opt", nargs="*", default=[])
    px.add_argument("--out", default="trainable_model_parameters.pth",
                    help=".pth/.pt/.bin (torch), .safetensors, or .npz")
    px.add_argument("--trainable", default=None,
                    help="export only this tuning mode's trained subtree "
                         "(stage1/stage2/stage3/lm/lora/lora_tokens/all); "
                         "omit for the full state dict")
    px.set_defaults(fn=cmd_export)

    pd = sub.add_parser(
        "doctor", help="operability diagnostic (device, libs, config)"
    )
    pd.add_argument("--cfg", default=None)
    pd.add_argument("--opt", nargs="*", default=[])
    pd.add_argument("--no-probe", action="store_true",
                    help="skip the device dispatch probe")
    pd.add_argument("--probe-timeout", type=int, default=900,
                    help="device probe bound in seconds (healthy axon "
                         "trivial compiles reach ~50s; outages hang 10+ "
                         "min)")
    pd.set_defaults(fn=cmd_doctor)

    args = p.parse_args(argv)
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    # persistent compile cache for EVERY entry point: serve/eval restarts
    # otherwise pay the multi-minute remote compile for every (mode, bucket)
    # program again (bench.py already did this; the serve warmups measured
    # ~7 min of avoidable recompiles per restart)
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass
    args.fn(args)


if __name__ == "__main__":
    main()
