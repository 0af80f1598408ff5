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


@dataclasses.dataclass
class FrameStats:
    """Throughput record for a timed render workload."""

    frames: int
    seconds: float
    width: int
    height: int
    spp: int

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
    def spp_per_sec(self) -> float:
        return self.spp * self.frames / self.seconds

    def to_dict(self) -> dict:
        return {
            "frames": self.frames,
            "ms_per_frame": round(self.ms_per_frame, 3),
            "mrays_per_sec": round(self.mrays_per_sec, 2),
            "spp_per_sec": round(self.spp_per_sec, 2),
        }

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
) -> FrameStats:
    """Time `frame_fn(i)` over `frames` iterations (after warmup/compile).

    frame_fn must return a device array; the timer blocks once at the end so
    dispatch pipelining is measured realistically.
    """
    out = None
    for i in range(warmup):
        out = frame_fn(i)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(frames):
        out = frame_fn(warmup + i)
    jax.block_until_ready(out)
    seconds = time.perf_counter() - t0
    return FrameStats(frames=frames, seconds=seconds, width=width, height=height, spp=spp)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace context: view with TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
