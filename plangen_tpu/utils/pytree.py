"""Shared pytree-path helpers.

`path_str` is the ONE "a/b/c" renderer both the tuning-mode freeze
predicates (train/optim.py) and the sharding rules (parallel/mesh.py)
match against — a single definition so the two rule sets cannot drift on
key formatting (e.g. if a new jax key type appears).
"""

from __future__ import annotations

import jax


def path_str(path) -> str:
    parts = []
    for p in path:
        if isinstance(p, jax.tree_util.DictKey):
            parts.append(str(p.key))
        elif isinstance(p, jax.tree_util.SequenceKey):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)
