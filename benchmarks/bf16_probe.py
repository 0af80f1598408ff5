"""bf16 coarse-test feasibility probe (real TPU) — VERDICT r4 item 8.

Run:  python benchmarks/bf16_probe.py

docs/PERFORMANCE.md's "Known ceilings" named a bf16 coarse slab/
discriminant pre-pass with f32 confirmation as a possible ~2x on the
intersection math.  This probe prices the idea before any correctness
engineering, with one Pallas kernel per dtype running ROUNDS iterations
of slab-test-shaped VPU math (sub, mul, min, max) on a (32,128) tile,
loop-carried so nothing folds.

Findings (v5e, committed run — see docs/PERFORMANCE.md "Null result:
bf16 coarse tests"):

1. Packed-bf16 vector COMPARISONS do not compile at all: Mosaic fails
   with "Target does not support this comparison" on any
   vector<8x128x2xbf16> cmpf (>=, >, sign, jnp.where masks alike).  A
   slab test IS mostly comparisons (window test, discriminant sign), so
   every compare would need an f32 unpack — erasing the packing win.
2. Even arithmetic-only packed bf16 is ~2x SLOWER than f32 on this
   shape: 43.6 us vs 21.9 us per frame (2048 rounds, differential
   timing).  v5e's VPU is an f32 machine; bf16 "2x packing" applies to
   MXU matmuls, not elementwise VPU lanes.

Null result on both counts; the f32 intersection math stays.
"""
import functools
import json
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from gpu_ray_tracing_tpu.utils.profiling import time_device_loop

ROUNDS = 2048


def kern(x_ref, o_ref, dtype):
    x = x_ref[:].astype(dtype)
    c1 = jnp.asarray(1.0009765625, dtype)  # keeps values near 1, no overflow

    def body(i, carry):
        x, acc = carry
        # slab-test shape: (b - o) * iv twice, min/max.  Arithmetic only:
        # packed-bf16 comparisons are rejected by Mosaic on v5e ("Target
        # does not support this comparison"), which is finding #1 — flip
        # the final line to `acc + (tf >= tn).astype(dtype) * tn` to
        # reproduce the compile error.
        t0 = (x - c1) * x
        t1 = (x + c1) * x
        tn = jnp.minimum(t0, t1)
        tf = jnp.maximum(t0, t1)
        return (x * c1, acc + tf * tn)

    _, acc = jax.lax.fori_loop(0, ROUNDS, body, (x, jnp.zeros_like(x)))
    o_ref[:] = acc.astype(jnp.float32)


def main():
    jnp.ones((8, 128)).block_until_ready()
    print("chip ok", file=sys.stderr)
    x = jnp.linspace(0.5, 1.5, 32 * 128, dtype=jnp.float32).reshape(32, 128)
    for name, dt in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
        call = pl.pallas_call(
            functools.partial(kern, dtype=dt),
            out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32),
        )
        f = jax.jit(lambda s, call=call: call(x + s.astype(jnp.float32) * 0))
        st = time_device_loop(f, width=32, height=128, spp=1, frames=50,
                              repeats=4)
        print(json.dumps({
            "dtype": name,
            "us_per_frame": round(st.ms_per_frame * 1e3, 2),
            "spread": round(st.window_spread, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
