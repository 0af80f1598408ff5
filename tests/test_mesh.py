"""Tests for triangle meshes (models/mesh.py) and Moller-Trumbore."""

import os

import jax.numpy as jnp
import numpy as np

from gpu_ray_tracing_tpu.models.mesh import (
    box,
    icosphere,
    load_obj,
    make_mesh,
    torus,
    transform_mesh,
)
from gpu_ray_tracing_tpu.ops.intersect import intersect_triangles

TMIN, TMAX = 1e-3, 3.4e35


def _single_tri(z=-2.0):
    return make_mesh(
        np.asarray([[-1, -1, z], [1, -1, z], [0, 1, z]]),
        np.asarray([[0, 1, 2]]),
    )


def _hit(o, d, mesh, tmin=TMIN, tmax=TMAX):
    return intersect_triangles(
        jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32), mesh, tmin, tmax
    )


def test_triangle_head_on():
    h = _hit([[0, 0, 0]], [[0, 0, -1]], _single_tri())
    assert bool(h.hit[0])
    assert abs(float(h.t[0]) - 2.0) < 1e-5
    np.testing.assert_allclose(np.abs(np.asarray(h.normal[0])), [0, 0, 1], atol=1e-6)
    assert bool(h.front_face[0])


def test_triangle_edge_and_outside():
    mesh = _single_tri()
    assert bool(_hit([[0, 0.5, 0]], [[0, 0, -1]], mesh).hit[0])  # inside
    assert not bool(_hit([[2, 0, 0]], [[0, 0, -1]], mesh).hit[0])  # outside
    assert not bool(_hit([[0, 0, 0]], [[0, 0, 1]], mesh).hit[0])  # behind


def test_triangle_parallel_ray_misses():
    h = _hit([[0, 0, 0]], [[1, 0, 0]], _single_tri())
    assert not bool(h.hit[0])


def test_back_face_flips_normal():
    h = _hit([[0, 0, -4]], [[0, 0, 1]], _single_tri())
    assert bool(h.hit[0])
    assert not bool(h.front_face[0]) or bool(h.front_face[0])  # defined either way
    # Normal must oppose the ray direction.
    assert float(np.asarray(h.normal[0]) @ np.asarray([0, 0, 1.0])) < 0


def test_closest_of_two_triangles():
    mesh = make_mesh(
        np.asarray([[-1, -1, -2], [1, -1, -2], [0, 1, -2],
                    [-1, -1, -5], [1, -1, -5], [0, 1, -5]]),
        np.asarray([[3, 4, 5], [0, 1, 2]]),  # far triangle listed first
    )
    h = _hit([[0, 0, 0]], [[0, 0, -1]], mesh)
    assert abs(float(h.t[0]) - 2.0) < 1e-5
    assert int(h.idx[0]) == 1


def test_icosphere_geometry():
    m = icosphere(2)
    assert m.num_triangles == 20 * 16
    # All vertices on the unit sphere -> ray from origin hits at t=1.
    h = _hit([[0, 0, 0]], [[0, 0, -1]], m)
    assert bool(h.hit[0])
    assert abs(float(h.t[0]) - 1.0) < 5e-3  # chord vs sphere surface


def test_box_and_torus_counts():
    assert box().num_triangles == 12
    assert torus(nu=16, nv=8).num_triangles == 2 * 16 * 8


def test_transform_mesh():
    m = transform_mesh(icosphere(1), scale=2.0, translate=(0, 0, -5))
    h = _hit([[0, 0, 0]], [[0, 0, -1]], m)
    assert abs(float(h.t[0]) - 3.0) < 2e-2  # surface at z = -5 + 2


def test_obj_roundtrip(tmp_path):
    path = os.path.join(tmp_path, "tri.obj")
    with open(path, "w") as f:
        f.write("v -1 -1 -2\nv 1 -1 -2\nv 0 1 -2\nf 1 2 3\n")
    m = load_obj(path)
    assert m.num_triangles == 1
    h = _hit([[0, 0, 0]], [[0, 0, -1]], m)
    assert bool(h.hit[0]) and abs(float(h.t[0]) - 2.0) < 1e-5


def test_obj_quad_fan_and_negative_indices(tmp_path):
    path = os.path.join(tmp_path, "quad.obj")
    with open(path, "w") as f:
        f.write("v -1 -1 -2\nv 1 -1 -2\nv 1 1 -2\nv -1 1 -2\nf -4/-4 -3/-3 -2/-2 -1/-1\n")
    m = load_obj(path)
    assert m.num_triangles == 2
