"""Checkpoint/resume for optimized scene parameters.

The reference has no checkpointing (its only artifact is the PPM,
SURVEY.md §5); the differentiable extension needs it: inverse-rendering
runs save/restore all float scene parameters (geometry + materials) plus
optimizer state between gradient steps, as compressed npz.
"""

from __future__ import annotations

import os
import tempfile
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from esctp1raytracer_tpu.scene.types import Scene

_FORMAT_VERSION = 1


def save_checkpoint(path: str, scene: Scene, step: int = 0,
                    extra: Optional[Dict[str, Any]] = None) -> None:
    """Save all scene arrays (+ optional optimizer arrays) atomically."""
    leaves, treedef = jax.tree.flatten(scene)
    payload = {
        "__version__": np.int64(_FORMAT_VERSION),
        "__num_leaves__": np.int64(len(leaves)),
        "__step__": np.int64(step),
    }
    for i, leaf in enumerate(leaves):
        payload[f"leaf_{i}"] = np.asarray(leaf)
    for key, value in (extra or {}).items():
        payload[f"extra_{key}"] = np.asarray(value)
    directory = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(directory, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=directory, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as fh:
            np.savez_compressed(fh, **payload)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_checkpoint(path: str, template: Scene) -> Tuple[Scene, int, Dict[str, np.ndarray]]:
    """Restore a scene (shapes validated against `template`), the step
    counter, and any extra arrays."""
    with np.load(path) as data:
        version = int(data["__version__"])
        if version != _FORMAT_VERSION:
            raise ValueError(f"checkpoint version {version} != {_FORMAT_VERSION}")
        leaves, treedef = jax.tree.flatten(template)
        num = int(data["__num_leaves__"])
        if num != len(leaves):
            raise ValueError(
                f"checkpoint has {num} leaves; template has {len(leaves)} "
                "(different scene structure)"
            )
        new_leaves = []
        for i, leaf in enumerate(leaves):
            arr = data[f"leaf_{i}"]
            if arr.shape != leaf.shape:
                raise ValueError(
                    f"leaf {i}: checkpoint shape {arr.shape} != scene {leaf.shape}"
                )
            new_leaves.append(jnp.asarray(arr, leaf.dtype))
        extra = {
            key[len("extra_"):]: data[key]
            for key in data.files if key.startswith("extra_")
        }
        return jax.tree.unflatten(treedef, new_leaves), int(data["__step__"]), extra
