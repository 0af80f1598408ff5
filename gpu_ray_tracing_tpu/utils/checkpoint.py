"""Checkpoint / resume for progressive renders.

The reference has no cross-run persistence; within a run its accumulation
texture IS the resumable state (rgb = running mean, alpha = sample count,
wgsl:339-341,362 — SURVEY §5).  Here that state is the AccumState pytree, so
checkpointing is a plain .npz round-trip: a 1024-spp progressive render
(BASELINE config 5) survives process restarts.  For orbax users,
AccumState is an ordinary pytree and works with orbax.checkpoint directly.

Sharded states: `progressive_step_sharded(..., row_partition='interleaved')`
keeps state.rgb in PARTITION (shard-major) row order for its whole lifetime
(parallel/sharding.py).  This module stores bytes, not partition metadata —
resume such a checkpoint with the SAME mesh shape and row_partition, or
save `accum_image(state, mesh, partition)` (image order) instead.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from gpu_ray_tracing_tpu.ops.accumulate import AccumState

_FORMAT_VERSION = 1


def checkpoint_path(path: str) -> str:
    """The on-disk filename for `path`: np.savez appends '.npz' to bare
    paths, so save/load/exists must all normalize the same way (an
    extension-less --checkpoint otherwise saves fine but never resumes)."""
    return path if path.endswith(".npz") else path + ".npz"


def save_accum(path: str, state: AccumState) -> None:
    """Serialize an accumulation state to .npz — atomically.

    Writes a sibling temp file and os.replace()s it over the target: a
    save interrupted mid-write (OOM kill, timeout) must not destroy the
    previous checkpoint, which is the only copy of the accumulated
    samples — the exact failure checkpointing exists to survive.
    """
    path = checkpoint_path(path)
    tmp = path + ".tmp.npz"  # .npz suffix so np.savez doesn't append one
    np.savez(
        tmp,
        version=np.int32(_FORMAT_VERSION),
        rgb=np.asarray(state.rgb, np.float32),
        count=np.asarray(state.count, np.int32),
    )
    os.replace(tmp, path)


def load_accum(path: str) -> AccumState:
    """Restore an accumulation state saved by save_accum."""
    with np.load(checkpoint_path(path)) as data:
        if "version" not in data or "rgb" not in data or "count" not in data:
            raise ValueError(
                f"{checkpoint_path(path)} is not a save_accum checkpoint "
                f"(keys: {sorted(data.files)})"
            )
        version = int(data["version"])
        if version != _FORMAT_VERSION:
            raise ValueError(f"unsupported checkpoint version {version}")
        rgb = np.asarray(data["rgb"], np.float32)
        if rgb.ndim != 3 or rgb.shape[-1] != 3:
            raise ValueError(
                f"checkpoint rgb has shape {rgb.shape}; expected (H, W, 3)"
            )
        return AccumState(
            rgb=jnp.asarray(rgb, jnp.float32),
            count=jnp.asarray(data["count"], jnp.int32),
        )
