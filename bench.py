"""Headline benchmark: primary-ray throughput at 1080p on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "Mrays/sec", "vs_baseline": N}

The baseline target is BASELINE.json's north star: >= 500 Mrays/sec/chip at
1080p primary rays on TPU v5e (the reference publishes no numbers of its own
— BASELINE.md).  The workload is BASELINE config 1's scene (two spheres +
ground — the primary-ray / bit-stability anchor) at 1920x1080, 1 spp,
normal-shading integrator, on the XLA backend whose MXU-factored
intersection is fastest at small sphere counts.

Run `python benchmarks/run.py` for the full 5-config suite, including the
~500-sphere path-traced scenes on the Pallas megakernel.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")


def main() -> None:
    from gpu_ray_tracing_tpu import CameraSettings, RenderConfig, base_scene, render

    width, height = 1920, 1080
    config = RenderConfig(
        width=width, height=height, spp=1, integrator="normal", backend="jax"
    )
    scene = base_scene()
    camera = CameraSettings(
        look_from=jnp.asarray([0.0, 0.5, 2.0]),
        look_at=jnp.asarray([0.0, 0.0, -1.0]),
        vup=jnp.asarray([0.0, 1.0, 0.0]),
        field_of_view=jnp.float32(50.0),
        defocus_angle=jnp.float32(0.0),
        focus_distance=jnp.float32(3.0),
    )
    scene = jax.device_put(scene)

    def frame(seed):
        return render(scene, camera, config, frame_seed=seed)

    # Warmup / compile.
    frame(jnp.uint32(0)).block_until_ready()

    # Median of repeated windows: single-window timings at the ~0.2 ms/frame
    # scale swing with dispatch pipelining and tunnel state.
    iters, repeats = 30, 5
    times = []
    for r in range(repeats):
        t0 = time.perf_counter()
        out = None
        for i in range(iters):
            out = frame(jnp.uint32(r * iters + i))
        out.block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]

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
