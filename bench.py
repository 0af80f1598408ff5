"""Headline benchmark: primary-ray throughput at 1080p on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "Mrays/sec", "vs_baseline": N}

The baseline target is BASELINE.json's north star: >= 500 Mrays/sec/chip at
1080p primary rays on TPU v5e (the reference publishes no numbers of its own
— BASELINE.md).  The workload is BASELINE config 1's scene (two spheres +
ground — the primary-ray / bit-stability anchor) at 1920x1080, 1 spp,
normal-shading integrator, on the Pallas megakernel backend.

Methodology (rebuilt in round 2 — round 1's numbers were artifacts):
  - On this platform `block_until_ready()` can return before the work
    executes, so every timed window forces materialization by float()-ing a
    checksum that depends on every frame in the window.
  - The frame loop runs on device (one `lax.scan` window per measurement, the
    production shape — render_animation/render_progressive are lax loops),
    so the ~5-10 ms/dispatch axon-tunnel round trip doesn't masquerade as
    kernel time.  Per-dispatch latency is reported separately on stderr.
  - DIFFERENTIAL timing: each window invocation itself carries a ~30 ms fixed
    cost (dispatch + launch + scalar readback through the tunnel), so the
    harness times windows of N and 2N frames and reports the slope — the
    marginal per-frame cost of the device loop (total(N) is affine in N,
    verified over N=10..400).  The fixed cost is printed alongside, not
    hidden.
  - Median of repeated windows; per-window spread is reported, and throughput
    beyond the chip's HBM-bandwidth bound (~68 Grays/s) raises instead of
    printing (utils/profiling.check_plausible).
  - The whole measurement runs in a child process with a timeout: the axon
    tunnel intermittently wedges (multi-minute stalls), in which case the
    child is killed and retried once in a fresh process.

Run `python benchmarks/run.py` for the full 5-config suite, including the
~500-sphere path-traced scenes.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

WIDTH, HEIGHT = 1920, 1080
# Covers a cold compile of BOTH workloads (primary + the d50 path metric);
# warm-cache runs finish in a fraction of this.
CHILD_TIMEOUT_S = 1500
# Escalating waits between attempts: the common wedge clears in ~90 s, but
# extended tunnel outages (one observed at >1 h) deserve one longer wait
# before giving up.
WEDGE_RETRY_WAITS_S = (90, 300)


def measure() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

    from gpu_ray_tracing_tpu import CameraSettings, RenderConfig, base_scene, render
    from gpu_ray_tracing_tpu.utils.profiling import time_device_loop, time_frames

    # Tiny op first: distinguishes a chip-claim hang from a compile hang.
    jnp.ones((8, 128)).block_until_ready()
    print(f"chip ok: {jax.devices()[0]}", file=sys.stderr)

    config = RenderConfig(
        width=WIDTH, height=HEIGHT, spp=1, integrator="normal", backend="pallas"
    )
    scene = jax.device_put(base_scene())
    camera = CameraSettings(
        look_from=jnp.asarray([0.0, 0.5, 2.0]),
        look_at=jnp.asarray([0.0, 0.0, -1.0]),
        vup=jnp.asarray([0.0, 1.0, 0.0]),
        field_of_view=jnp.float32(50.0),
        defocus_angle=jnp.float32(0.0),
        focus_distance=jnp.float32(3.0),
    )

    def frame(seed):
        return render(scene, camera, config, frame_seed=seed)

    stats = time_device_loop(
        frame, width=WIDTH, height=HEIGHT, spp=1, frames=200, repeats=5
    )
    print(
        f"device-loop: {stats.ms_per_frame:.3f} ms/frame marginal "
        f"(fixed window cost {stats.window_fixed_seconds * 1e3:.1f} ms), "
        f"2N-windows {[round(w, 3) for w in stats.window_seconds]} s "
        f"(spread {stats.window_spread:.2f}x), checksum {stats.checksum:.0f}",
        file=sys.stderr,
    )

    # Context: per-host-dispatch latency (tunnel round trip included).
    lat = time_frames(frame, width=WIDTH, height=HEIGHT, spp=1, frames=5, repeats=3)
    print(
        f"per-dispatch latency: {lat.ms_per_frame:.2f} ms/frame "
        f"(spread {lat.window_spread:.2f}x)",
        file=sys.stderr,
    )

    # Second metric (VERDICT r4 item 7): a config-3-shaped PATH workload —
    # One-Weekend final scene (~480 spheres, sphere BVH), 720p, depth 50 —
    # with MEASURED rays from the in-kernel counters (count_traced_rays),
    # so the driver artifact carries honest bounce-ray throughput for the
    # path engines, not just the primary-ray headline.  Same differential
    # device-loop methodology; nested in the SAME single JSON line (the
    # driver records the last stdout line).
    from gpu_ray_tracing_tpu import count_traced_rays, make_scene, one_weekend_scene

    path_cfg = RenderConfig(width=1280, height=720, spp=1, max_depth=50,
                            backend="pallas")
    path_scene = jax.device_put(
        make_scene(one_weekend_scene(jax.random.key(0), grid_min=-11, grid_max=11))
    )
    path_cam = CameraSettings.default()

    def path_frame(seed):
        return render(path_scene, path_cam, path_cfg, frame_seed=seed)

    path_stats = time_device_loop(
        path_frame, width=1280, height=720, spp=1, frames=5, repeats=5
    )
    path_stats.rays_traced_per_frame = count_traced_rays(
        path_scene, path_cam, path_cfg, frame_seed=jnp.uint32(1)
    )["rays_traced"]
    print(
        f"path device-loop: {path_stats.ms_per_frame:.3f} ms/frame, "
        f"{path_stats.rays_traced_per_frame:.0f} rays/frame measured, "
        f"{path_stats.true_mrays_per_sec:.1f} true Mrays/s "
        f"(spread {path_stats.window_spread:.2f}x), "
        f"checksum {path_stats.checksum:.0f}",
        file=sys.stderr,
    )

    mrays = stats.mrays_per_sec
    print(
        json.dumps(
            {
                "metric": "primary_ray_throughput_1080p",
                "value": round(mrays, 2),
                "unit": "Mrays/sec",
                "vs_baseline": round(mrays / 500.0, 4),
                "path_metric": {
                    "metric": "one_weekend_d50_720p_path",
                    "ms_per_frame": round(path_stats.ms_per_frame, 3),
                    "spp_per_sec": round(path_stats.spp_per_sec, 2),
                    "rays_traced_per_frame": round(
                        path_stats.rays_traced_per_frame
                    ),
                    "true_mrays_per_sec": round(
                        path_stats.true_mrays_per_sec, 2
                    ),
                    "hbm_utilization": round(path_stats.hbm_utilization, 4),
                    "unit": "Mrays/sec (measured rays, in-kernel counters)",
                },
            }
        )
    )


def main() -> None:
    if "--child" in sys.argv:
        measure()
        return
    # Parent: run the measurement in a child process with a wedge timeout.
    # Retry on timeout AND on child failure — a tunnel wedge can surface
    # either as a hang or as an RPC error inside the child.
    attempts = len(WEDGE_RETRY_WAITS_S) + 1
    for attempt in range(attempts):
        why = None
        t0 = time.monotonic()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child"],
                timeout=CHILD_TIMEOUT_S,
                stdout=subprocess.PIPE,
                text=True,
            )
        except subprocess.TimeoutExpired:
            why = f"timed out after {CHILD_TIMEOUT_S}s (axon tunnel wedge?)"
        else:
            if proc.returncode == 0 and proc.stdout.strip():
                print(proc.stdout.strip().splitlines()[-1])
                return
            why = f"failed rc={proc.returncode}"
            if time.monotonic() - t0 < 60:
                # A child that dies within seconds is a deterministic
                # failure (import error, validation raise), not a wedge —
                # fail fast instead of sleeping through the retry ladder.
                print(f"bench child {why} in <60s — deterministic, not "
                      "retrying", file=sys.stderr)
                break
        last = attempt == attempts - 1
        wait = None if last else WEDGE_RETRY_WAITS_S[attempt]
        print(
            f"bench child {why}"
            + ("" if last else f"; waiting {wait}s and retrying"),
            file=sys.stderr,
        )
        if wait:
            time.sleep(wait)
    sys.exit(1)


if __name__ == "__main__":
    main()
