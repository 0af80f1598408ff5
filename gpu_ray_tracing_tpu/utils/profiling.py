"""Profiling and per-frame metrics.

The reference has no timers, counters, or logging of any kind (SURVEY §5:
the only perf affordance is a commented-out vsync toggle, lib.rs:40-41).
This module supplies the observability layer: wall-clock frame timing with
derived ray-throughput counters, and a thin wrapper over jax.profiler for
device traces.
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import time
from typing import Callable

import jax
import jax.numpy as jnp

# Physical ceiling used to reject impossible measurements: every reported ray
# produces at least 12 bytes (3 x f32) of HBM image traffic, and TPU v5e HBM
# peaks at ~819 GB/s — so no honest number can exceed ~68 Grays/s/chip.
# (Round-1 published 82 Grays/s for a 16-spp path trace; this guard exists so
# that class of artifact can never be printed again.)
HBM_BYTES_PER_SEC = 819e9
MIN_BYTES_PER_RAY = 12.0
MAX_PLAUSIBLE_MRAYS = HBM_BYTES_PER_SEC / MIN_BYTES_PER_RAY / 1e6  # ~68,250


def check_plausible(mrays_per_sec: float, n_chips: int = 1) -> None:
    """Raise if a throughput number exceeds the HBM-bandwidth bound.

    `n_chips` scales the ceiling for legitimately aggregated multi-chip
    measurements (a sharded render's combined rate is bounded by the mesh's
    combined bandwidth, not one chip's)."""
    ceiling = MAX_PLAUSIBLE_MRAYS * max(n_chips, 1)
    if mrays_per_sec > ceiling:
        raise RuntimeError(
            f"measured {mrays_per_sec:.0f} Mrays/s exceeds the physical "
            f"HBM-bandwidth ceiling (~{ceiling:.0f} Mrays/s at "
            f"{MIN_BYTES_PER_RAY:.0f} B/ray, {HBM_BYTES_PER_SEC/1e9:.0f} GB/s"
            f" x {max(n_chips, 1)} chip(s))"
            " — the timing did not materialize the work; refusing to report it"
        )


@dataclasses.dataclass
class FrameStats:
    """Throughput record for a timed render workload."""

    frames: int
    seconds: float
    width: int
    height: int
    spp: int
    # Sum of the per-frame checksums whose float() forced materialization;
    # carries proof that the timed work actually executed.
    checksum: float = 0.0
    # Per-window wall-clock times when the workload was repeated; `seconds`
    # is then the median window (or the median slope, for differential
    # timing, where these are the 2N-frame windows).  Spread diagnoses
    # tunnel/queue wedges.
    window_seconds: tuple = ()
    # The N-frame windows of a differential measurement (window_seconds then
    # holds the 2N-frame windows).
    window_seconds_short: tuple = ()
    # Fixed per-window cost (dispatch/launch/readback through the tunnel)
    # removed by differential timing; 0.0 when the timing was not
    # differential.  `seconds` then excludes this cost: it is `frames` times
    # the marginal per-frame cost of the device loop.
    window_fixed_seconds: float = 0.0
    # MEASURED rays traced per frame (count_traced_rays: live closest-hit
    # walks per bounce + driven NEE shadow rays, in-kernel counters) — set
    # by callers that counted; 0.0 = not counted.  `mrays_per_sec` counts
    # PRIMARY rays only and understates path/mesh workloads up to ~50x
    # (VERDICT r3 weak item 1); `true_mrays_per_sec` is the honest figure.
    rays_traced_per_frame: float = 0.0

    @property
    def ms_per_frame(self) -> float:
        return self.seconds / self.frames * 1e3

    @property
    def rays_per_frame(self) -> int:
        # Primary rays; bounce rays depend on the scene (SURVEY §6 counts
        # <= depth x primary as the upper bound).
        return self.width * self.height * self.spp

    @property
    def mrays_per_sec(self) -> float:
        return self.rays_per_frame * self.frames / self.seconds / 1e6

    @property
    def true_mrays_per_sec(self) -> float:
        """Measured-rays throughput (0.0 when rays were not counted)."""
        return self.rays_traced_per_frame * self.frames / self.seconds / 1e6

    @property
    def hbm_utilization(self) -> float:
        """true_mrays_per_sec as a fraction of the ~68 Grays/s HBM-bandwidth
        ceiling (MIN_BYTES_PER_RAY of image traffic at HBM_BYTES_PER_SEC) —
        a conservative utilization proxy: rays also read scene/BVH bytes,
        so real utilization is at least this."""
        return self.true_mrays_per_sec / MAX_PLAUSIBLE_MRAYS

    @property
    def spp_per_sec(self) -> float:
        return self.spp * self.frames / self.seconds

    @property
    def window_spread(self) -> float:
        """max/min ratio across repeated windows (1.0 = perfectly stable).

        For differential measurements both window populations determine the
        slope equally, so the worst spread of the two is reported — jitter
        confined to the short windows must not read as a stable run."""

        def spread(ws):
            if len(ws) < 2:
                return 1.0
            return max(ws) / max(min(ws), 1e-12)

        return max(spread(self.window_seconds), spread(self.window_seconds_short))

    def to_dict(self) -> dict:
        d = {
            "frames": self.frames,
            "ms_per_frame": round(self.ms_per_frame, 3),
            "mrays_per_sec": round(self.mrays_per_sec, 2),
            "spp_per_sec": round(self.spp_per_sec, 2),
            "checksum": self.checksum,
            "window_spread": round(self.window_spread, 3),
        }
        if self.window_fixed_seconds:
            d["window_fixed_ms"] = round(self.window_fixed_seconds * 1e3, 2)
        if self.rays_traced_per_frame:
            d["rays_traced_per_frame"] = round(self.rays_traced_per_frame)
            d["true_mrays_per_sec"] = round(self.true_mrays_per_sec, 2)
            d["hbm_utilization"] = round(self.hbm_utilization, 4)
        return d

    def __str__(self) -> str:
        return json.dumps(self.to_dict())


def time_frames(
    frame_fn: Callable[[int], jax.Array],
    *,
    width: int,
    height: int,
    spp: int,
    frames: int = 10,
    warmup: int = 1,
    repeats: int = 3,
) -> FrameStats:
    """Time `frame_fn(i)` over `frames` iterations (after warmup/compile).

    Materialization is FORCED inside every timed window: each frame's scalar
    checksum is accumulated on device and `float()`-ed before the clock is
    read, so the window cannot close until every frame has actually executed.
    (On the axon platform `block_until_ready()` returns before the work runs —
    the round-1 methodology bug — so blocking is not sufficient.)

    Runs `repeats` windows and reports the median; per-window times are kept
    on the result for variance/wedge diagnosis.  Timing includes one host
    dispatch per frame — use `time_device_loop` for pure chip throughput.
    """
    acc = jnp.float32(0)
    for i in range(warmup):
        acc = acc + jnp.sum(frame_fn(i))
    float(acc)

    windows, checksum = [], 0.0
    for r in range(repeats):
        t0 = time.perf_counter()
        acc = jnp.float32(0)
        for i in range(frames):
            acc = acc + jnp.sum(frame_fn(warmup + r * frames + i))
        # float() forces execution of every frame in the window; SUM across
        # windows so the proof-of-work record covers every repeat.
        checksum += float(acc)
        windows.append(time.perf_counter() - t0)
    seconds = sorted(windows)[len(windows) // 2]
    stats = FrameStats(
        frames=frames, seconds=seconds, width=width, height=height, spp=spp,
        checksum=checksum, window_seconds=tuple(windows),
    )
    check_plausible(stats.mrays_per_sec)
    return stats


def robust_spread(ts) -> float:
    """Window-to-window jitter with the single worst window dropped — but
    only when enough windows remain for the rest to estimate the spread.

    The axon tunnel intermittently wedges ONE window for ~90 s; a max-min
    spread would let that outlier defeat the slope-adequacy gate (forcing
    useless window doubling and a spurious refusal) even when the medians
    carry a clean slope.  The medians already tolerate a minority of wedged
    windows, so the jitter estimate should too.  Below 5 windows the drop
    is NOT safe: with 3 windows it would return the gap between the two
    closest and wave through a noise-driven slope (ordinary 30 ms run-to-
    run variance, no wedge, would read as ~1 ms jitter) — there, the full
    spread stands and a wedged window correctly escalates to the
    refuse-to-publish path rather than under-reporting uncertainty.
    """
    s = sorted(ts)
    return (s[-2] - s[0]) if len(s) >= 5 else (s[-1] - s[0])


def time_device_loop(
    frame_fn: Callable[[jax.Array], jax.Array],
    *,
    width: int,
    height: int,
    spp: int,
    frames: int = 20,
    repeats: int = 5,
) -> FrameStats:
    """Chip-throughput timing: DIFFERENTIAL measurement of the device loop.

    Runs `frame_fn(seed)` inside one jitted `lax.scan` per window, forcing
    materialization with a float()-ed checksum that depends on every frame.
    Each window invocation carries a large FIXED cost on the tunneled axon
    platform (~30 ms measured: dispatch + launch + scalar readback) that has
    nothing to do with the frame kernel, so timing one window and dividing by
    `frames` overstates short frames badly (1080p primary: 1.7 "ms/frame" at
    20 frames/window vs a 0.28 ms/frame marginal cost, both measured).

    Instead this measures windows of `frames` and `2*frames` iterations
    (median of `repeats` each; total(N) is affine in N, verified over
    N=10..400) and reports the SLOPE — the marginal per-frame cost of one
    more frame in a device-resident loop, which is what production frame
    loops pay (render_animation / render_progressive are lax loops already).
    The fixed window cost is reported on the record (`window_fixed_seconds`),
    not hidden; per-host-dispatch latency is `time_frames`' job.

    `frames` is a STARTING point: if the measured slope is smaller than
    `min_signal` times the window-to-window jitter, the window length
    doubles and the measurement repeats (up to 64x) — a ~70 us kernel
    under a ~30 ms fixed cost with ~8% spread needs thousands of frames
    per window before the slope means anything, and an N chosen for a
    slow kernel silently published a 2.6x-wrong number for a fast one
    (0.027 "ms/frame" at N=40 vs 0.070 converged; caught late r3).
    """

    def make_window(n):
        @jax.jit
        def window(seed0):
            def body(acc, i):
                return acc + jnp.sum(frame_fn(seed0 + i)), ()

            acc, _ = jax.lax.scan(
                body, jnp.float32(0), jnp.arange(n, dtype=jnp.uint32)
            )
            return acc

        return window

    min_signal = 3.0  # slope must exceed this multiple of window jitter
    frames_cap = frames * 64
    checksum = 0.0
    windows = {}  # n -> compiled+warmed window; doubling reuses the old 2N as the new N

    def warm_window(n):
        if n not in windows:
            w = make_window(n)
            float(w(jnp.uint32(0)))  # compile + warm
            windows[n] = w
        return windows[n]

    while True:
        w1, w2 = warm_window(frames), warm_window(2 * frames)

        t1s, t2s = [], []
        for r in range(repeats):
            # Disjoint seed ranges per window: each repeat consumes 3*frames
            # seeds (N for w1, 2N for w2).
            base = 1 + 3 * r * frames
            t0 = time.perf_counter()
            c1 = float(w1(jnp.uint32(base)))
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            c2 = float(w2(jnp.uint32(base + frames)))
            t2s.append(time.perf_counter() - t0)
            checksum += c1 + c2  # float()s force execution of every frame
        t1 = sorted(t1s)[len(t1s) // 2]
        t2 = sorted(t2s)[len(t2s) // 2]
        jitter = max(robust_spread(t1s), robust_spread(t2s))
        if t2 > t1 and (t2 - t1) >= min_signal * jitter:
            break
        if frames >= frames_cap:
            # slope over `frames` extra iterations never rose above the
            # noise; refusing beats publishing (the r1 lesson).
            raise RuntimeError(
                "differential timing invalid: the 2N-frame windows were not "
                f"reliably slower than the N-frame windows at N={frames} "
                f"(medians {t1:.4f}s vs {t2:.4f}s, jitter {jitter:.4f}s; "
                f"N windows {['%.4f' % t for t in t1s]}, 2N windows "
                f"{['%.4f' % t for t in t2s]}) — tunnel/queue jitter swamped "
                "the marginal frame cost; rerun or raise `frames`"
            )
        frames *= 2  # too-short windows: the frame cost is below the noise
    seconds = t2 - t1
    fixed = max(t1 - seconds, 0.0)
    stats = FrameStats(
        frames=frames, seconds=seconds, width=width, height=height, spp=spp,
        checksum=checksum, window_seconds=tuple(t2s),
        window_seconds_short=tuple(t1s), window_fixed_seconds=fixed,
    )
    check_plausible(stats.mrays_per_sec)
    return stats


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace context: view with TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
