"""Headline benchmark: primary-ray throughput at 1080p on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "Mrays/sec", "vs_baseline": N}

The baseline target is BASELINE.json's north star: >= 500 Mrays/sec/chip at
1080p primary rays on TPU v5e (the reference publishes no numbers of its own
— BASELINE.md).  The workload is the full One-Weekend sphere scene (~197
spheres padded to 256 lanes), 1920x1080, 1 spp, primary rays (normal-shading
integrator) — every ray tests every sphere, no acceleration structure,
matching the reference's brute-force scan (wgsl:164-180).

Run `python benchmarks/run.py` for the full 5-config suite.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp


def main() -> None:
    from gpu_ray_tracing_tpu import CameraSettings, RenderConfig, one_weekend_scene, render

    width, height = 1920, 1080
    config = RenderConfig(
        width=width, height=height, spp=1, integrator="normal", backend="pallas"
    )
    scene = one_weekend_scene(jax.random.key(0)).pad_to_multiple(128)
    camera = CameraSettings.default()
    scene = jax.device_put(scene)

    def frame(seed):
        return render(scene, camera, config, frame_seed=seed)

    # Warmup / compile.
    frame(jnp.uint32(0)).block_until_ready()

    iters = 30
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = frame(jnp.uint32(i))
    out.block_until_ready()
    dt = time.perf_counter() - t0

    rays = width * height * iters
    mrays_per_sec = rays / dt / 1e6
    print(
        f"primary rays: {width}x{height}, {scene.count} sphere slots, "
        f"{iters} frames in {dt:.3f}s on {jax.devices()[0].platform}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "primary_ray_throughput_1080p",
                "value": round(mrays_per_sec, 2),
                "unit": "Mrays/sec",
                "vs_baseline": round(mrays_per_sec / 500.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
