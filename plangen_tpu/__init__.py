"""plangen_tpu — a TPU-native (JAX/XLA/Pallas/pjit) layout-planning + layout-to-image framework.

Re-implements the capabilities of 360CVGroup/PlanGen (Janus-Pro-1B based unified
layout planning / layout-to-image / image-to-layout system) as an idiomatic
TPU-first stack:

  * `models/`   — pure-functional JAX model cores (LLaMA decoder, SigLIP ViT,
                  LlamaGen VQ tokenizer, MLP projectors) with explicit
                  parameter pytrees.
  * `ops/`      — attention + sampling primitives, Pallas TPU kernels.
  * `runtime/`  — KV-cache pytree, fused prefill/decode loops (lax.scan),
                  classifier-free-guidance dual-batch image sampling.
  * `text/`     — deepseek chat template, layout <grounding> (de)serialization,
                  tokenizer registry, left-pad batching.
  * `data/`     — canonical sample schema, eval/train dataset loaders.
  * `tasks/`    — the five PlanGen task modes (uni, uni_2stage, mmu, plan,
                  edit/removal) as thin drivers over the runtime.
  * `train/`    — multi-task pjit train step, optax AdamW, orbax checkpointing.
  * `parallel/` — mesh construction and sharding rules (dp/fsdp/tp).
  * `convert/`  — torch checkpoint -> JAX pytree weight converter.
"""

__version__ = "0.1.0"
