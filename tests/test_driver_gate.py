"""Driver-shaped gate tests (VERDICT r2 items 1-3).

Round 2's multi-chip gate failed ONLY in the driver's environment: a
TPU-default process driving a CPU mesh.  The whole test suite runs with
JAX_PLATFORMS=cpu (conftest), so `jax.default_backend()`-keyed bugs were
invisible to all 209 green tests.  These tests close that hole:

  - a subprocess runs `dryrun_multichip(8)` WITHOUT the conftest platform
    forcing — the exact shape the driver invokes (default platform resolves
    to whatever the machine has, possibly a real TPU; the mesh is the
    virtual CPU pool; Pallas interpret must key off the MESH devices);
  - gradients through `backend='wavefront', regenerate='on'` (the custom
    VJP replays on the jax backend and must drop the wavefront-only flag).
"""

import os
import subprocess
import sys

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gpu_ray_tracing_tpu import RenderConfig, base_scene, render
from tests.test_api import BASE_CAMERA

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_in_driver_environment():
    """The driver gate must be green WITHOUT the suite's JAX_PLATFORMS=cpu.

    The subprocess env drops the conftest's platform pin, so JAX resolves
    its real default backend (a TPU on the bench machine) while the dryrun
    builds its CPU mesh — the configuration that was red in round 2.
    """
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # undo conftest forcing -> driver shape
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8); print('GATE_OK')"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=560,
    )
    assert proc.returncode == 0, (
        f"dryrun_multichip(8) failed in driver-shaped env:\n"
        f"stdout: {proc.stdout[-2000:]}\nstderr: {proc.stderr[-4000:]}"
    )
    assert "GATE_OK" in proc.stdout


def test_grad_through_wavefront_regenerate():
    """jax.grad through the regenerating wavefront engine (crashed in r2:
    the VJP backward's jax-backend replay config kept regenerate='on',
    which RenderConfig rejects for backend='jax')."""
    scene = base_scene()
    cfg = RenderConfig(
        width=16, height=12, spp=2, max_depth=3,
        backend="wavefront", regenerate="on",
    )

    def loss(albedo):
        s = dataclasses.replace(scene, albedo=albedo)
        img = render(s, BASE_CAMERA, cfg, frame_seed=jnp.uint32(3))
        return jnp.mean(img)

    g = jax.grad(loss)(scene.albedo)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.max(jnp.abs(g))) > 0.0
