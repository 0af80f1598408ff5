"""Benchmark harness: the five BASELINE.json configs.

Run:  python benchmarks/run.py [--quick] [--out results.json]

Each config prints one JSON line and the aggregate is written to --out.
The reference publishes no numbers (BASELINE.md); the north star is
>= 500 Mrays/sec/chip at 1080p primary rays on v5e.

  1. base scene, 800x600, 1 spp, normal shading          (correctness anchor)
  2. animated fly-through, 16 spp jittered AA            (frame loop)
  3. One-Weekend final scene (~480 spheres), 50 bounces  (path tracer)
  4. triangle mesh (~5k tris) with BVH traversal         (mesh path)
  5. progressive 1080p 1024-spp accumulation, sharded    (spp/sec)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from gpu_ray_tracing_tpu import (  # noqa: E402
    CameraSettings,
    RenderConfig,
    base_scene,
    icosphere,
    init_accum,
    make_scene,
    one_weekend_scene,
    progressive_step,
    render,
    render_animation,
    stack_camera_track,
    transform_mesh,
)
from gpu_ray_tracing_tpu.models.camera import orbit_yaw  # noqa: E402
from gpu_ray_tracing_tpu.utils.profiling import time_frames  # noqa: E402

BASE_CAMERA = CameraSettings(
    look_from=jnp.asarray([0.0, 0.5, 2.0]),
    look_at=jnp.asarray([0.0, 0.0, -1.0]),
    vup=jnp.asarray([0.0, 1.0, 0.0]),
    field_of_view=jnp.float32(50.0),
    defocus_angle=jnp.float32(0.0),
    focus_distance=jnp.float32(3.0),
)


def _emit(name: str, stats, extra=None) -> dict:
    rec = {"config": name, **stats.to_dict(), **(extra or {})}
    print(json.dumps(rec), flush=True)
    return rec


def config1(quick: bool) -> dict:
    """Base scene, 800x600, 1 spp primary rays, normal shading."""
    scene = base_scene()
    cfg = RenderConfig(width=800, height=600, spp=1, integrator="normal", backend="jax")
    fn = lambda i: render(scene, BASE_CAMERA, cfg, frame_seed=jnp.uint32(i))
    stats = time_frames(fn, width=800, height=600, spp=1, frames=3 if quick else 10)
    return _emit("1_base_normal_800x600", stats, {"backend": "jax"})


def config2(quick: bool) -> dict:
    """Animated fly-through, 16 spp jittered AA."""
    scene = base_scene()
    n_frames = 2 if quick else 6
    track = stack_camera_track([orbit_yaw(BASE_CAMERA, 0.15 * f) for f in range(n_frames)])
    cfg = RenderConfig(width=640, height=480, spp=16, max_depth=16, backend="jax")
    fn = lambda i: render_animation(scene, track, cfg, frame_seeds=jnp.full((n_frames,), i, jnp.uint32))
    stats = time_frames(fn, width=640, height=480, spp=16 * n_frames, frames=1 if quick else 3)
    return _emit("2_flythrough_16spp", stats, {"track_frames": n_frames})


def config3(quick: bool) -> dict:
    """One-Weekend final scene (~480 spheres), 50-bounce path trace."""
    scene = make_scene(one_weekend_scene(jax.random.key(0), grid_min=-11, grid_max=11))
    backend = "pallas" if jax.default_backend() == "tpu" else "jax"
    res = (320, 180) if jax.default_backend() == "cpu" else (1280, 720)
    cfg = RenderConfig(width=res[0], height=res[1], spp=1, max_depth=50, backend=backend)
    fn = lambda i: render(scene, CameraSettings.default(), cfg, frame_seed=jnp.uint32(i))
    stats = time_frames(fn, width=res[0], height=res[1], spp=1, frames=2 if quick else 5)
    return _emit(
        "3_one_weekend_480sph_d50", stats,
        {"spheres": scene.spheres.count, "backend": backend,
         "resolution": f"{res[0]}x{res[1]}"},
    )


def config4(quick: bool) -> dict:
    """Triangle-mesh scene (~5k tris, bunny-scale) with BVH traversal."""
    from gpu_ray_tracing_tpu.models.spheres import LAMBERTIAN, make_spheres

    ground = make_spheres([((0, -1000.0, 0), 1000.0, LAMBERTIAN, (0.5, 0.5, 0.5), 0.0)])
    mesh = transform_mesh(
        icosphere(3 if quick else 4, albedo=(0.75, 0.6, 0.45)), scale=0.8,
        translate=(0.0, 0.8, 0.0),
    )
    scene = make_scene(ground, mesh)
    cam = BASE_CAMERA.replace(
        look_from=jnp.asarray([0.0, 1.2, 3.0]), look_at=jnp.asarray([0.0, 0.7, 0.0])
    )
    res = (320, 240) if quick else (640, 480)
    backend = "pallas" if jax.default_backend() == "tpu" else "jax"
    cfg = RenderConfig(width=res[0], height=res[1], spp=1, max_depth=8, backend=backend)
    fn = lambda i: render(scene, cam, cfg, frame_seed=jnp.uint32(i))
    stats = time_frames(fn, width=res[0], height=res[1], spp=1, frames=2 if quick else 5)
    return _emit(
        "4_mesh_bvh", stats,
        {"triangles": scene.mesh.num_triangles, "backend": backend},
    )


def config5(quick: bool) -> dict:
    """Progressive 1080p accumulation toward 1024 spp (spp/sec)."""
    scene = make_scene(one_weekend_scene(jax.random.key(0)))
    backend = "pallas" if jax.default_backend() == "tpu" else "jax"
    res = (480, 270) if jax.default_backend() == "cpu" else (1920, 1080)
    # Unbiased Russian roulette from bounce 5: the production setting for
    # long progressive accumulation (config option, off by default).
    cfg = RenderConfig(width=res[0], height=res[1], spp=1024, max_depth=20,
                       backend=backend, russian_roulette_depth=5)
    state = init_accum(cfg.height, cfg.width)

    def fn(i):
        nonlocal state
        state = progressive_step(
            state, scene, CameraSettings.default(), cfg, frame_seed=jnp.uint32(0)
        )
        return state.rgb

    stats = time_frames(fn, width=res[0], height=res[1], spp=1, frames=4 if quick else 16)
    return _emit(
        "5_progressive_1080p",
        stats,
        {"backend": backend, "resolution": f"{res[0]}x{res[1]}",
         "spp_reached": int(state.count)},
    )


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--quick", action="store_true", help="small/fast variants")
    ap.add_argument("--out", default=None, help="write aggregate JSON here")
    ap.add_argument("--configs", default="1,2,3,4,5", help="comma list of config ids")
    args = ap.parse_args(argv)

    runners = {"1": config1, "2": config2, "3": config3, "4": config4, "5": config5}
    results = []
    for cid in args.configs.split(","):
        cid = cid.strip()
        if cid not in runners:
            raise SystemExit(f"unknown config {cid}")
        results.append(runners[cid](args.quick))

    if args.out:
        with open(args.out, "w") as f:
            json.dump(
                {"device": str(jax.devices()[0]), "results": results}, f, indent=2
            )
        print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
