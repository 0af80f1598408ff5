"""Megakernel vs wavefront: the measured "when to use which engine" table.

Run on the chip:  python benchmarks/engine_choice.py [--quick] [--json f]

VERDICT r4 item 8: after live-lane-masked traversal (r3) the megakernel
won every BENCHMARK workload, leaving the wavefront engine justified by
history ("atypical workloads") rather than data.  This script measures
both engines on the benchmark workloads AND on the liveness shapes that
structurally favor row compaction, so the engine-choice table in
docs/PERFORMANCE.md is driven by measurements either way.

The structural argument for a wavefront win: the megakernel's liveness
granularity is the (32,128) tile — a tile keeps launching bounce
iterations until its LAST lane dies (dead lanes cost no traversal since
r3, but the tile's scalar cursor walk + shade issue still run) — while
the wavefront engine compacts live 128-lane ROWS across the whole frame
between bounces (32x finer, frame-global).  So its best case is SPARSE
liveness SCATTERED across many tiles: every tile holds a little life (no
tile can exit) but the live rows compact into a few tiles.  The
"bead field" scenes below construct exactly that: small glass/metal
beads sprinkled over black sky, one or two per tile, deep max_depth.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from gpu_ray_tracing_tpu import (
    RenderConfig,
    make_scene,
    one_weekend_scene,
    render,
)
from gpu_ray_tracing_tpu.models.camera import CameraSettings
from gpu_ray_tracing_tpu.models.spheres import (
    DIELECTRIC,
    LAMBERTIAN,
    METAL,
    make_spheres,
)
from gpu_ray_tracing_tpu.utils.profiling import time_device_loop

BEAD_CAM = CameraSettings(
    look_from=jnp.asarray([0.0, 0.0, 6.0]),
    look_at=jnp.asarray([0.0, 0.0, 0.0]),
    vup=jnp.asarray([0.0, 1.0, 0.0]),
    field_of_view=jnp.float32(60.0),
    defocus_angle=jnp.float32(0.0),
    focus_distance=jnp.float32(6.0),
)


def bead_field(n=220, seed=2, glass_frac=0.7):
    """Small beads scattered over the whole frustum against empty sky —
    every kernel tile holds a bead or two (no tile can early-exit while
    its bead's paths live), but the live ROWS are a small fraction of the
    frame.  Glass beads carry deep internal-reflection chains."""
    rng = np.random.default_rng(seed)
    rows = []
    for _ in range(n):
        # fill the fov-60 frustum at z in [-2, 2] (camera at z=6)
        z = rng.uniform(-2.0, 2.0)
        half = np.tan(np.radians(30.0)) * (6.0 - z)
        x = rng.uniform(-half * 1.3, half * 1.3)
        y = rng.uniform(-half, half)
        r = rng.uniform(0.06, 0.14)
        if rng.random() < glass_frac:
            rows.append(((x, y, z), r, DIELECTRIC, (1.0, 1.0, 1.0), 1.5))
        else:
            rows.append(((x, y, z), r, METAL,
                         tuple(0.7 + 0.3 * rng.random(3)), 0.0))
    return make_scene(make_spheres(rows))


def measure(scene, cam, cfg_kw, frames, label):
    out = {}
    for be in ("pallas", "wavefront"):
        cfg = RenderConfig(backend=be, **cfg_kw)
        fn = lambda s: render(scene, cam, cfg, frame_seed=s)
        stats = time_device_loop(fn, width=cfg.width, height=cfg.height,
                                 spp=cfg.spp, frames=frames, repeats=5)
        out[be] = stats.ms_per_frame
        print(f"{label:34s} {be:10s} {stats.ms_per_frame:8.2f} ms/frame",
              flush=True)
    out["winner"] = min(("pallas", "wavefront"), key=lambda k: out[k])
    out["ratio"] = max(out["pallas"], out["wavefront"]) / max(
        min(out["pallas"], out["wavefront"]), 1e-9)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)
    assert jax.devices()[0].platform == "tpu", "engine A/B needs the chip"

    frames = 2 if args.quick else 4
    results = {}

    # Benchmark workloads (the megakernel's measured home turf, re-pinned).
    ow487 = jax.device_put(make_scene(
        one_weekend_scene(jax.random.key(0), grid_min=-11, grid_max=11)))
    results["one_weekend_720p_d50"] = measure(
        ow487, CameraSettings.default(),
        dict(width=1280, height=720, spp=1, max_depth=50), frames,
        "one-weekend 720p d50")
    ow197 = jax.device_put(make_scene(one_weekend_scene(jax.random.key(0))))
    results["one_weekend_1080p_d20_rr5"] = measure(
        ow197, CameraSettings.default(),
        dict(width=1920, height=1080, spp=1, max_depth=20,
             russian_roulette_depth=5), frames,
        "one-weekend 1080p d20 RR5")

    # Sparse scattered liveness: the row-compaction-favoring shape.
    beads = jax.device_put(bead_field())
    results["bead_field_720p_d40"] = measure(
        beads, BEAD_CAM,
        dict(width=1280, height=720, spp=1, max_depth=40,
             sky_intensity=1.0), frames,
        "bead field 720p d40 (sparse-deep)")
    results["bead_field_720p_d40_black"] = measure(
        beads, BEAD_CAM,
        dict(width=1280, height=720, spp=1, max_depth=40,
             sky_intensity=0.0), frames,
        "bead field 720p d40 black sky")

    # Deep + RR-truncated tail on the bead field (rows die in bulk).
    results["bead_field_720p_d100_rr2"] = measure(
        beads, BEAD_CAM,
        dict(width=1280, height=720, spp=1, max_depth=100,
             russian_roulette_depth=2), frames,
        "bead field 720p d100 RR2")

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
