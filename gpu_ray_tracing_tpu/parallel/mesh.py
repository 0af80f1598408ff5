"""Device mesh helpers.

The reference has no multi-device story at all (single wgpu device, no
collectives — SURVEY §2c); pixel and sample parallelism across TPU chips is
this framework's scaling model:

  - axis 'x': framebuffer rows (data parallel over pixels; halo-free since
    rays never interact)
  - axis 's': samples-per-pixel batches (temporal axis of the reference's
    progressive accumulation, wgsl:352-358, spread over chips instead of
    frames), combined with a mean over the axis — the only collective in the
    whole framework, riding ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

ROW_AXIS = "x"
SPP_AXIS = "s"


def make_mesh(
    num_row_shards: int | None = None,
    num_spp_shards: int = 1,
    devices=None,
) -> Mesh:
    """Build a (row, spp) mesh over the available devices.

    Defaults to all devices on the row axis.  num_row_shards * num_spp_shards
    must equal the device count used.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    if num_row_shards is None:
        num_row_shards = len(devices) // num_spp_shards
    n = num_row_shards * num_spp_shards
    if n > len(devices):
        raise ValueError(
            f"mesh {num_row_shards}x{num_spp_shards} needs {n} devices, "
            f"have {len(devices)}"
        )
    grid = np.asarray(devices[:n]).reshape(num_row_shards, num_spp_shards)
    return Mesh(grid, (ROW_AXIS, SPP_AXIS))
