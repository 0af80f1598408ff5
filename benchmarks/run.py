"""Benchmark harness: the five BASELINE.json configs.

Run:  python benchmarks/run.py [--quick] [--out results.json] [--obj bunny.obj]

Each config prints one JSON line and the aggregate is written to --out.
The reference publishes no numbers (BASELINE.md); the north star is
>= 500 Mrays/sec/chip at 1080p primary rays on v5e.

  1. base scene, 800x600, 1 spp, normal shading          (pallas headline + XLA anchor)
  2. animated fly-through, 16 spp jittered AA            (frame loop)
  3. One-Weekend final scene (~480 spheres), 50 bounces  (path tracer)
  4. triangle mesh (bunny-scale, ~82k tris) with BVH     (mesh path)
  5. progressive 1080p 1024-spp accumulation             (spp/sec)
     + a sharded-correctness run over an 8-virtual-device CPU mesh

Methodology (round 2): every timed window float()s a device checksum that
depends on all frames, so the clock cannot stop before the work executes
(`block_until_ready` returns early on this platform — utils/profiling.py).
Frame loops run on device (one lax.scan per window) so axon-tunnel dispatch
latency is not misread as kernel time, and device-loop timings are
DIFFERENTIAL (windows of N and 2N frames; the slope is the marginal
per-frame cost) because each window invocation itself costs ~30 ms fixed
through the tunnel — that fixed cost is reported on each record
(`window_fixed_ms`), not folded into frame time.  Results report per-window
spread, and physically impossible throughput raises instead of printing.
CPU<->TPU image parity is gated separately by benchmarks/parity_check.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Virtual host devices for the config-5 sharded-correctness run (must be set
# before JAX initializes; never overrides a count the caller already set).
_xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _xla_flags:
    os.environ["XLA_FLAGS"] = (
        _xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

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
from gpu_ray_tracing_tpu.utils.profiling import (  # noqa: E402
    FrameStats,
    check_plausible,
    robust_spread,
    time_device_loop,
    time_frames,
)

BASE_CAMERA = CameraSettings(
    look_from=jnp.asarray([0.0, 0.5, 2.0]),
    look_at=jnp.asarray([0.0, 0.0, -1.0]),
    vup=jnp.asarray([0.0, 1.0, 0.0]),
    field_of_view=jnp.float32(50.0),
    defocus_angle=jnp.float32(0.0),
    focus_distance=jnp.float32(3.0),
)


def _vpu_model():
    """benchmarks/vpu_roofline.json, if the roofline has been measured."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "vpu_roofline.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        data = json.load(f)
    if "peak" not in data or not data.get("configs"):
        return None
    return data


def _emit(name: str, stats, extra=None) -> dict:
    rec = {"config": name, **stats.to_dict(), **(extra or {})}
    # Compute-roofline utilization (VERDICT r4 item 1): modeled useful
    # vector ops for this config (benchmarks/vpu_roofline.py --price)
    # against the measured slab-mix VPU peak and THIS record's measured
    # time.  The HBM proxy stays alongside; this is the figure that means
    # something on the compute-bound path configs.
    vpu = _vpu_model()
    if vpu and name in vpu["configs"]:
        m = vpu["configs"][name]
        peak = vpu["peak"]["slab"]["ops_per_sec"]
        ms = m.get("ms_override", rec.get("ms_per_frame"))
        if ms:
            rec["vpu_utilization"] = round(
                m["ops_per_frame"] / (ms * 1e-3) / peak, 4)
            rec["vpu_model"] = m["model"]
    print(json.dumps(rec), flush=True)
    return rec


def _tpu() -> bool:
    return jax.default_backend() == "tpu"


def _count_rays_for(scene, cam, cfg, frame_seed=1) -> float:
    """Measured rays/frame via the in-kernel counters (count_traced_rays) —
    one untimed counting render; stamped onto FrameStats so records carry
    rays_traced_per_frame / true_mrays_per_sec / hbm_utilization (VERDICT
    r4 item 1: primary-ray Mrays understates path workloads up to ~50x).
    The count varies by < ~1% across frame seeds; one representative seed
    is counted and the seed is recorded in the output."""
    from gpu_ray_tracing_tpu import count_traced_rays

    try:
        return count_traced_rays(
            scene, cam, cfg, frame_seed=jnp.uint32(frame_seed)
        )["rays_traced"]
    except Exception as e:  # pragma: no cover - diagnostic path
        print(f"ray count unavailable: {e}", file=sys.stderr)
        return 0.0


def config1(quick: bool, obj: str | None) -> dict:
    """Base scene, 800x600, 1 spp primary rays, normal shading.

    On TPU the headline engine is the Pallas megakernel's normal mode,
    device-looped (0.05 ms/frame marginal); the XLA engine — the
    correctness anchor BASELINE names ("CPU jit render") — is reported
    alongside, host-looped + vmap-batched, because scanning it on device
    SIGILLs the TPU compiler's fusion pass (jellyfish
    TpuPriorityFusionQueue) so it cannot be device-loop timed.
    """
    scene = jax.device_put(base_scene())
    cfg = RenderConfig(width=800, height=600, spp=1, integrator="normal", backend="jax")
    fn = lambda i: render(scene, BASE_CAMERA, cfg, frame_seed=jnp.uint32(i))
    # Host-loop timing for the XLA engine (pays per-dispatch tunnel
    # latency; checksum forcing keeps it honest).
    stats = time_frames(fn, width=800, height=600, spp=1,
                        frames=3 if quick else 10, repeats=3)

    # Supplementary: the engine's true marginal cost via vmap batching —
    # one dispatch renders N frames (vmap compiles fine where lax.scan
    # hangs the TPU compiler), and the N->2N slope removes the dispatch
    # cost the host-loop number above includes.
    batched = None
    if _tpu():
        @partial(jax.jit, static_argnames=("n",))
        def batch(n):
            seeds = jnp.arange(n, dtype=jnp.uint32)
            return jax.vmap(fn)(seeds).sum()

        n = 2 if quick else 4
        float(batch(n)); float(batch(2 * n))  # compile + warm
        t1s, t2s = [], []
        # 5 repeats: robust_spread's drop-one-outlier rule needs >=5
        # windows before it may discount a wedge; below that the full
        # spread stands and ordinary variance fails the adequacy bar.
        for _ in range(5):
            t0 = time.perf_counter(); float(batch(n)); t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); float(batch(2 * n)); t2s.append(time.perf_counter() - t0)
        t1 = sorted(t1s)[len(t1s) // 2]
        t2 = sorted(t2s)[len(t2s) // 2]
        # Same signal-adequacy rule as time_device_loop: the slope must
        # clear the window-to-window jitter (worst outlier dropped), not
        # merely be positive — a positive-but-noisy slope is the exact
        # artifact class the retracted config-1 number came from.
        jitter = max(robust_spread(t1s), robust_spread(t2s))
        if t2 > t1 and (t2 - t1) >= 3.0 * jitter:
            ms = (t2 - t1) / n * 1e3
            batched = {"frames_per_dispatch": 2 * n,
                       "marginal_ms_per_frame": round(ms, 3),
                       "mrays_per_sec": round(800 * 600 / ms / 1e3, 1)}
        else:
            # Record the drop instead of silently omitting the field: an
            # inadequate N->2N slope means the windows were noise
            # (wedging tunnel / too-small N), not a free 2N-frame render.
            print(f"config1: vmap marginal dropped (t({n})={t1:.4f}s vs "
                  f"t({2*n})={t2:.4f}s, jitter {jitter:.4f}s — slope below "
                  "the adequacy bar)", flush=True)
            batched = {"dropped": f"slope below 3x jitter: t({n})={round(t1, 4)}s, "
                                  f"t({2*n})={round(t2, 4)}s, jitter={round(jitter, 4)}s"}
    if not _tpu():
        # The vmap marginal is only measured on TPU (it exists to remove the
        # tunnel dispatch cost); non-TPU records carry the host-loop stats
        # alone.
        return _emit("1_base_normal_800x600", stats, {"backend": "jax"})

    # Headline engine on TPU: the Pallas megakernel's normal mode,
    # device-looped (differential), same workload and camera.
    cfg_pl = RenderConfig(width=800, height=600, spp=1,
                          integrator="normal", backend="pallas")
    fn_pl = lambda i: render(scene, BASE_CAMERA, cfg_pl, frame_seed=jnp.uint32(i))
    pl_stats = time_device_loop(fn_pl, width=800, height=600, spp=1,
                                frames=10 if quick else 40, repeats=5)
    # Normal mode traces exactly 1 primary ray/pixel — counted, not assumed.
    pl_stats.rays_traced_per_frame = _count_rays_for(scene, BASE_CAMERA, cfg_pl)
    return _emit("1_base_normal_800x600", pl_stats,
                 {"backend": "pallas",
                  "xla_engine": {**stats.to_dict(), "backend": "jax",
                                 "timing": "host_loop",
                                 "batched_vmap": batched}})


def config2(quick: bool, obj: str | None) -> dict:
    """Animated fly-through, 16 spp jittered AA (whole track in one jit)."""
    scene = jax.device_put(base_scene())
    n_frames = 2 if quick else 6
    track = stack_camera_track([orbit_yaw(BASE_CAMERA, 0.15 * f) for f in range(n_frames)])
    backend = "pallas" if _tpu() else "jax"
    cfg = RenderConfig(width=640, height=480, spp=16, max_depth=16, backend=backend)
    fn = lambda i: render_animation(
        scene, track, cfg, frame_seeds=jnp.full((n_frames,), i, jnp.uint32)
    )
    # render_animation is already one device-side lax.map; time_frames'
    # checksum forcing makes the host-loop timing honest.
    stats = time_frames(fn, width=640, height=480, spp=16 * n_frames,
                        frames=1 if quick else 3, repeats=3)
    # One timed unit = the whole track: sum measured rays over its cameras.
    stats.rays_traced_per_frame = sum(
        _count_rays_for(scene, jax.tree.map(lambda x: x[f], track), cfg)
        for f in range(n_frames)
    )
    return _emit("2_flythrough_16spp", stats,
                 {"track_frames": n_frames, "backend": backend,
                  "rays_counted_at_seed": 1})


def config3(quick: bool, obj: str | None) -> dict:
    """One-Weekend final scene (~480 spheres), 50-bounce path trace."""
    scene = jax.device_put(
        make_scene(one_weekend_scene(jax.random.key(0), grid_min=-11, grid_max=11))
    )
    # r3: live-lane-masked traversal made the megakernel the depth-50
    # winner too (128.0 vs 146.6 ms at 720p — docs/PERFORMANCE.md
    # "Round 3"); it had been the wavefront engine's home turf in r2.
    backend = "pallas" if _tpu() else "jax"
    res = (320, 180) if jax.default_backend() == "cpu" else (1280, 720)
    cfg = RenderConfig(width=res[0], height=res[1], spp=1, max_depth=50, backend=backend)
    fn = lambda s: render(scene, CameraSettings.default(), cfg, frame_seed=s)
    stats = time_device_loop(fn, width=res[0], height=res[1], spp=1,
                             frames=2 if quick else 5, repeats=5)
    stats.rays_traced_per_frame = _count_rays_for(
        scene, CameraSettings.default(), cfg
    )
    return _emit(
        "3_one_weekend_480sph_d50", stats,
        {"spheres": scene.spheres.count, "backend": backend,
         "resolution": f"{res[0]}x{res[1]}", "rays_counted_at_seed": 1},
    )


def config4(quick: bool, obj: str | None) -> dict:
    """Triangle-mesh scene with BVH traversal, at Stanford-bunny scale.

    BASELINE config 4 names the Stanford bunny (~69k tris); the environment
    has no network, so the default is a smooth icosphere of 81,920 triangles
    (CAP-scale stand-in, clearly labeled) — pass --obj path/to/bunny.obj to
    run the genuine asset.
    """
    from gpu_ray_tracing_tpu.models.mesh import load_obj
    from gpu_ray_tracing_tpu.models.spheres import LAMBERTIAN, make_spheres

    ground = make_spheres([((0, -1000.0, 0), 1000.0, LAMBERTIAN, (0.5, 0.5, 0.5), 0.0)])
    if obj:
        raw = load_obj(obj, albedo=(0.75, 0.6, 0.45))
        mesh_name = os.path.basename(obj)
    else:
        raw = icosphere(3 if quick else 6, albedo=(0.75, 0.6, 0.45), smooth=True)
        mesh_name = f"icosphere_stand_in_{raw.num_triangles}tris"
    mesh = transform_mesh(raw, scale=0.8, translate=(0.0, 0.8, 0.0))
    scene = jax.device_put(make_scene(ground, mesh))
    cam = BASE_CAMERA.replace(
        look_from=jnp.asarray([0.0, 1.2, 3.0]), look_at=jnp.asarray([0.0, 0.7, 0.0])
    )
    res = (320, 240) if quick else (640, 480)
    backend = "pallas" if _tpu() else "jax"
    cfg = RenderConfig(width=res[0], height=res[1], spp=1, max_depth=8, backend=backend)
    fn = lambda s: render(scene, cam, cfg, frame_seed=s)
    stats = time_device_loop(fn, width=res[0], height=res[1], spp=1,
                             frames=2 if quick else 5, repeats=5)
    stats.rays_traced_per_frame = _count_rays_for(scene, cam, cfg)
    return _emit(
        "4_mesh_bvh", stats,
        {"triangles": scene.mesh.num_triangles, "backend": backend,
         "mesh": mesh_name, "bvh_nodes": scene.bvh.num_nodes,
         "bvh_leaf_size": scene.bvh_leaf_size, "rays_counted_at_seed": 1},
    )


def config5(quick: bool, obj: str | None) -> dict:
    """Progressive 1080p accumulation toward 1024 spp (spp/sec).

    Perf is measured single-chip (the only hardware available) and labeled
    as such; the BASELINE-specified framebuffer sharding is validated for
    correctness on an 8-virtual-device CPU mesh below.
    """
    scene = jax.device_put(make_scene(one_weekend_scene(jax.random.key(0))))
    # r3: megakernel wins d20+RR as well (79.4 vs 99.9 ms at 1080p); the
    # batched step below still uses the wavefront engine for regeneration.
    backend = "pallas" if _tpu() else "jax"
    res = (480, 270) if jax.default_backend() == "cpu" else (1920, 1080)
    cfg = RenderConfig(width=res[0], height=res[1], spp=1024, max_depth=20,
                       backend=backend, russian_roulette_depth=5)
    cam = CameraSettings.default()

    def measure_steps(step_cfg, steps, spp_per_step):
        """Differential device-loop timing of progressive steps: windows of
        `steps` and `2*steps`; the slope is the marginal cost per step (each
        window call pays a ~30 ms fixed tunnel dispatch cost that is not
        accumulation work)."""

        @partial(jax.jit, static_argnames=("n",))
        def window(state, n):
            def body(_, st):
                return progressive_step(st, scene, cam, step_cfg,
                                        frame_seed=jnp.uint32(0),
                                        spp_per_step=spp_per_step)

            st = jax.lax.fori_loop(0, n, body, state)
            return st, st.rgb.sum()

        state = init_accum(step_cfg.height, step_cfg.width)
        state, cs = window(state, steps)
        float(cs)  # compile + warm (also the first `steps` samples)
        state, cs = window(state, 2 * steps)
        float(cs)
        t1s, t2s, checksum = [], [], 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            state, cs = window(state, steps)
            checksum += float(cs)  # proof-of-work covers EVERY repeat
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            state, cs = window(state, 2 * steps)
            checksum += float(cs)
            t2s.append(time.perf_counter() - t0)
        t1 = sorted(t1s)[len(t1s) // 2]
        t2 = sorted(t2s)[len(t2s) // 2]
        if t2 <= t1:
            # Same rejection as utils/profiling.time_device_loop: a slope
            # swamped by window jitter must not be published (a tiny
            # positive residue would inflate spp/sec; clamping would raise
            # check_plausible with the WRONG diagnosis).
            raise RuntimeError(
                "differential timing invalid: 2N-step windows not slower "
                f"than N-step windows ({t1:.4f}s vs {t2:.4f}s) — rerun or "
                "raise the step count"
            )
        seconds = t2 - t1
        stats = FrameStats(frames=steps, seconds=seconds, width=step_cfg.width,
                           height=step_cfg.height, spp=spp_per_step,
                           checksum=checksum,
                           window_seconds=tuple(t2s),
                           window_seconds_short=tuple(t1s),
                           window_fixed_seconds=max(t1 - seconds, 0.0))
        check_plausible(stats.mrays_per_sec)
        return stats, state

    # Interactive contract: 1 spp per step (the reference's frame-at-a-time
    # update) — the headline record.
    stats, state = measure_steps(cfg, 4 if quick else 16, 1)
    import dataclasses as _dc0

    # The timed unit is one 1-spp step; count one sample's measured rays.
    stats.rays_traced_per_frame = _count_rays_for(
        scene, cam, _dc0.replace(cfg, spp=1)
    )

    # Offline accumulation: 8 spp per batched step.  r3 late re-measure:
    # after live-lane-masked traversal the MEGAKERNEL's in-kernel spp loop
    # (383 ms/8spp) beats the wavefront regenerating pool (480 ms/8spp) on
    # this workload — masking gave the megakernel exact lane-level liveness
    # for free, eroding regeneration's row-refill edge.  The wavefront
    # number is kept nested as the regen engine's record.
    batched = None
    if jax.default_backend() == "tpu":
        import dataclasses as _dc

        b_stats, _ = measure_steps(cfg, 2 if quick else 4, 8)
        w_stats, _ = measure_steps(
            _dc.replace(cfg, backend="wavefront", regenerate="auto"),
            2 if quick else 4, 8,
        )
        batched = {
            "spp_per_step": 8,
            "backend": backend,
            "ms_per_step": round(b_stats.ms_per_frame, 2),
            "spp_per_sec": round(b_stats.spp_per_sec, 2),
            "wavefront_regen": {
                "ms_per_step": round(w_stats.ms_per_frame, 2),
                "spp_per_sec": round(w_stats.spp_per_sec, 2),
            },
        }

    # Sharded-correctness pass (BASELINE names a sharded framebuffer): one
    # progressive_step_sharded over an 8-virtual-device CPU mesh at reduced
    # resolution — validates the sharded code path, not a perf claim.
    sharded_ok = False
    cache_was = jax.config.jax_enable_compilation_cache
    try:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from gpu_ray_tracing_tpu.parallel.mesh import make_mesh
        from gpu_ray_tracing_tpu.parallel.sharding import (
            progressive_step_sharded,
            shard_accum_state,
        )

        # This step compiles CPU executables; the persistent cache this
        # process enabled for TPU compiles may hold CPU AOT entries from a
        # DIFFERENT host (machine-feature mismatch -> loader SIGILL risk,
        # same hazard dryrun_multichip guards against).  Compile fresh.
        jax.config.update("jax_enable_compilation_cache", False)
        devices = jax.devices("cpu")[:8]
        mesh = make_mesh(4, 2, devices=devices)
        rep = NamedSharding(mesh, P())
        s_cfg = RenderConfig(width=256, height=144, spp=4, max_depth=6,
                             backend="jax")
        s_scene = jax.device_put(make_scene(one_weekend_scene(jax.random.key(0))), rep)
        s_state = shard_accum_state(init_accum(s_cfg.height, s_cfg.width), mesh)
        s_state = progressive_step_sharded(
            s_state, s_scene, jax.device_put(cam, rep), s_cfg, mesh,
            frame_seed=jax.device_put(jnp.uint32(0), rep),
        )
        # One step folds one sample per spp-axis shard.
        sharded_ok = bool(jnp.isfinite(s_state.rgb).all()) and (
            int(s_state.count) == mesh.shape["s"]
        )
    except Exception as e:  # pragma: no cover - diagnostic path
        print(f"sharded correctness pass failed: {e}", file=sys.stderr)
    finally:
        jax.config.update("jax_enable_compilation_cache", cache_was)

    return _emit(
        "5_progressive_1080p",
        stats,
        {"backend": backend, "resolution": f"{res[0]}x{res[1]}",
         "spp_reached": int(state.count),
         "perf_scope": "single_chip",
         "batched_step": batched,
         "sharded_correctness_8dev_cpu": sharded_ok},
    )


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--quick", action="store_true", help="small/fast variants")
    ap.add_argument("--out", default=None, help="write aggregate JSON here")
    ap.add_argument("--configs", default="1,2,3,4,5", help="comma list of config ids")
    ap.add_argument("--obj", default=None, help="OBJ mesh for config 4 (e.g. the bunny)")
    ap.add_argument("--trace", default=None, metavar="DIR",
                    help="capture a jax.profiler device trace of the runs "
                         "into DIR (view with TensorBoard/XProf; works "
                         "through the axon tunnel — per-kernel device times)")
    args = ap.parse_args(argv)

    # Tiny op first: distinguishes an axon chip-claim hang from a compile hang.
    jnp.ones((8, 128)).block_until_ready()
    print(f"chip ok: {jax.devices()[0]}", file=sys.stderr)

    runners = {"1": config1, "2": config2, "3": config3, "4": config4, "5": config5}
    results = []
    import contextlib

    from gpu_ray_tracing_tpu.utils.profiling import device_trace

    ctx = device_trace(args.trace) if args.trace else contextlib.nullcontext()
    with ctx:
        for cid in args.configs.split(","):
            cid = cid.strip()
            if cid not in runners:
                raise SystemExit(f"unknown config {cid}")
            results.append(runners[cid](args.quick, args.obj))

    if args.out:
        with open(args.out, "w") as f:
            json.dump(
                {"device": str(jax.devices()[0]),
                 "methodology": "checksum-forced materialization; median of "
                                "windows; device-side frame loops",
                 "results": results}, f, indent=2
            )
        print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
