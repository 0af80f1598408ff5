"""Checkpoint / resume for progressive renders.

The reference has no cross-run persistence; within a run its accumulation
texture IS the resumable state (rgb = running mean, alpha = sample count,
wgsl:339-341,362 — SURVEY §5).  Here that state is the AccumState pytree, so
checkpointing is a plain .npz round-trip: a 1024-spp progressive render
(BASELINE config 5) survives process restarts.  For orbax users,
AccumState is an ordinary pytree and works with orbax.checkpoint directly.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from gpu_ray_tracing_tpu.ops.accumulate import AccumState

_FORMAT_VERSION = 1


def save_accum(path: str, state: AccumState) -> None:
    """Serialize an accumulation state to .npz."""
    np.savez(
        path,
        version=np.int32(_FORMAT_VERSION),
        rgb=np.asarray(state.rgb, np.float32),
        count=np.asarray(state.count, np.int32),
    )


def load_accum(path: str) -> AccumState:
    """Restore an accumulation state saved by save_accum."""
    with np.load(path) as data:
        version = int(data["version"])
        if version != _FORMAT_VERSION:
            raise ValueError(f"unsupported checkpoint version {version}")
        return AccumState(
            rgb=jnp.asarray(data["rgb"], jnp.float32),
            count=jnp.asarray(data["count"], jnp.int32),
        )
