"""Pytree checkpointing.

The reference persists pickles of flat numpy dicts (``jt.save``,
``slow_pace.py:1709-1713``); we keep that interchange format for module
checkpoints (heads, prompt learner) and add whole-pytree save/load with
structure preserved, enabling idempotent restart (SURVEY.md §5 —
checkpoint/resume is save-only in the reference).
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _to_numpy_tree(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_pytree(tree: Any, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(_to_numpy_tree(tree), f)


def load_pytree(path: str, as_jax: bool = True) -> Any:
    with open(path, "rb") as f:
        tree = pickle.load(f)
    if as_jax:
        return jax.tree_util.tree_map(
            lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, tree
        )
    return tree
