"""Device mesh + sharding rules.

TPU-native replacement for the reference's NCCL/Accelerate DDP (SURVEY.md §2
Table C: DP is the only model-scale parallelism in the reference; TP/FSDP are
added here as first-class options since they're free under pjit):

  * mesh axes: ("data", "model"). DP shards the batch over "data"; gradient
    reduction is inserted by XLA as psum over ICI — no explicit collectives.
  * "model" (TP) shards attention heads and MLP hidden dim Megatron-style:
    column-parallel q/k/v/gate/up, row-parallel o/down; vocab-parallel
    embedding + lm_head. At 1B params TP is optional but lowers per-chip
    latency for serving.
  * FSDP-style parameter sharding can reuse the "data" axis via
    `fsdp_axis="data"` (shards the same matrices over the data axis instead).

All rules are path-based over the parameter pytree, applied with
`jax.device_put(NamedSharding)` — XLA lays out collectives over ICI.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    shape: Optional[Dict[str, int]] = None, devices=None
) -> Mesh:
    """Create a Mesh from an axis-name -> size dict; -1 = remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    shape = dict(shape or {"data": -1, "model": 1})
    known = 1
    wild = None
    for k, v in shape.items():
        if v == -1:
            wild = k
        else:
            known *= v
    if wild is not None:
        shape[wild] = max(1, n // known)
    total = int(np.prod(list(shape.values())))
    assert total <= n, f"mesh {shape} needs {total} devices, have {n}"
    arr = np.asarray(devices[:total]).reshape(tuple(shape.values()))
    return Mesh(arr, tuple(shape.keys()))


# path-pattern -> PartitionSpec for tensor parallelism over `model`
# (embed/lm_head vocab-parallel; attention & MLP Megatron split).
# LM layer weights are layer-stacked [L, in, out] — dim 0 is the layer axis.
_TP_RULES: Tuple[Tuple[str, P], ...] = (
    (r"language_model/embed_tokens$", P("model", None)),
    (r"language_model/lm_head$", P(None, "model")),
    (r"layers/(q_proj|k_proj|v_proj)$", P(None, None, "model")),
    (r"layers/o_proj$", P(None, "model", None)),
    (r"layers/(gate_proj|up_proj)$", P(None, None, "model")),
    (r"layers/down_proj$", P(None, "model", None)),
    # SigLIP tower (layer-stacked [L, in, out]): column-parallel qkv/fc1,
    # row-parallel proj/fc2
    (r"vision_model/layers/(qkv|fc1)/w$", P(None, None, "model")),
    (r"vision_model/layers/(proj|fc2)/w$", P(None, "model", None)),
    # gen head: split the big classifier over model axis
    (r"gen_head/fc2/w$", P(None, "model")),
)


from plangen_tpu.utils.pytree import path_str as _path_str  # shared with
# train/optim.py: freeze predicates and sharding rules match the same
# "a/b/c" strings


def param_shardings(
    params: Any,
    mesh: Mesh,
    tp_axis: str = "model",
    fsdp_axis: Optional[str] = None,
    fsdp_min_size: int = 2 ** 20,
) -> Any:
    """PartitionSpec pytree for the parameter tree.

    Matrices matching the TP rules are sharded over `tp_axis` when that mesh
    axis has size > 1 (and the dim divides). With `fsdp_axis` set, every
    remaining array of >= fsdp_min_size elements additionally shards its
    largest divisible dim over that axis (ZeRO-3-style parameter sharding —
    XLA all-gathers weights per layer and reduce-scatters grads, riding ICI).
    Everything else replicates.
    """
    tp = mesh.shape.get(tp_axis, 1)
    fsdp = mesh.shape.get(fsdp_axis, 1) if fsdp_axis else 1

    def rule(path, leaf):
        if tp > 1:
            ps = _path_str(path)
            for pat, spec in _TP_RULES:
                if re.search(pat, ps):
                    ok = True
                    for dim, axis in enumerate(spec):
                        if axis is not None and leaf.shape[dim] % tp != 0:
                            ok = False
                    if ok:
                        return NamedSharding(mesh, spec)
        if fsdp > 1 and leaf.size >= fsdp_min_size:
            dims = sorted(
                range(leaf.ndim), key=lambda d: leaf.shape[d], reverse=True
            )
            for d in dims:
                if leaf.shape[d] % fsdp == 0:
                    spec = [None] * leaf.ndim
                    spec[d] = fsdp_axis
                    return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_params(
    params: Any,
    mesh: Mesh,
    tp_axis: str = "model",
    fsdp_axis: Optional[str] = None,
    fsdp_min_size: int = 2 ** 20,
) -> Any:
    """Place a parameter tree on the mesh per `param_shardings`."""
    shardings = param_shardings(params, mesh, tp_axis, fsdp_axis, fsdp_min_size)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Batch arrays: shard dim 0 over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(data_axis))


def normalize_state_shardings(state: Any, mesh: Mesh) -> Tuple[Any, Any]:
    """(resharded_state, sharding_tree) with every leaf on the mesh.

    Leaves already carrying a NamedSharding on this mesh keep it (e.g. FSDP
    params and the optimizer moments derived from them); anything created on
    a single device (scalars, counters) becomes mesh-replicated. Use the
    sharding tree as `make_train_step(state_shardings=...)` to pin layouts.
    """
    def sh(x):
        s = getattr(x, "sharding", None)
        if isinstance(s, NamedSharding) and s.mesh == mesh:
            return s
        return NamedSharding(mesh, P())

    shardings = jax.tree_util.tree_map(sh, state)
    state = jax.tree_util.tree_map(jax.device_put, state, shardings)
    return state, shardings


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host initialization (multi-slice DP over DCN).

    On Cloud TPU pods jax.distributed.initialize() autodetects everything;
    explicit args support other launchers. Call once before any jax op; after
    this, `create_mesh` sees every chip across hosts and the same pjit train
    step scales with NO other code changes (XLA routes intra-slice
    collectives over ICI and cross-slice ones over DCN).
    """
    import jax

    if coordinator_address is None:
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
