"""Checkpoint / resume of progressive render state.

The reference's resumable state (SURVEY.md §5.4) is the accumulation buffer
(sum + sample count) plus the frame counter and jitter accumulator; jobs are
idempotent by start frame. This module persists exactly that, enabling long
1024-spp renders to survive restarts — a capability the reference only
approximates via job-level re-rendering.
"""

from __future__ import annotations

import json
import os

import numpy as np
import jax.numpy as jnp


def save_checkpoint(path: str, renderer) -> None:
    """Write the renderer's resumable state to `path` (.npz + .json)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(
        path + ".npz",
        accum=np.asarray(renderer.accum),
        history=np.asarray(renderer.history),
        jitter_acc=np.asarray(renderer._jitter_acc.acc),
    )
    meta = {
        "frame_count": renderer.frame_count,
        "width": renderer.width,
        "height": renderer.height,
        "max_depth": renderer.max_depth,
        "spp": renderer.spp,
        "scene_name": renderer.config.scene_name,
    }
    with open(path + ".json", "w") as f:
        json.dump(meta, f)


def load_checkpoint(path: str, renderer) -> bool:
    """Restore a renderer's state; returns False on shape/meta mismatch
    (mirrors the reference's reset-on-change semantics)."""
    try:
        with open(path + ".json") as f:
            meta = json.load(f)
        data = np.load(path + ".npz")
    except (OSError, ValueError):
        return False
    if (meta["width"] != renderer.width or meta["height"] != renderer.height
            or meta["max_depth"] != renderer.max_depth
            or meta["spp"] != renderer.spp):
        return False
    renderer.accum = jnp.asarray(data["accum"])
    renderer.history = jnp.asarray(data["history"])
    renderer._jitter_acc.acc = np.asarray(data["jitter_acc"], np.float64)
    renderer.frame_count = int(meta["frame_count"])
    return True
