"""Config-4 first-diffuse-bounce wall: offline traversal-cost analysis (CPU).

Run:  python benchmarks/mesh_wall_analysis.py  [--tiles 20]

The mesh path workload's one unbeaten cliff is the FIRST diffuse bounce
(+122 ms of config 4's ~323 ms at 640x480 d8): every ray is alive AND
hemisphere-random, so each 4096-lane tile's rays union to ~the whole BVH.
This script replicates the megakernel's tile-coherent threaded-BVH walk
(ops/pallas/megakernel._closest_hit semantics: per-lane shrinking windows
seeded by the sphere stage, dead lanes at an empty window, one scalar
cursor per tile, enter = any live lane's slab overlaps, 4-triangle-row
leaf scans) in numpy on the TRUE bounce-1 ray set of the config-4 scene,
and prices every proposed coherence lever in two currencies:

  node entries/tile   scalar cursor steps (each is a vector slab test +
                      scalar control flow)
  lane-work           (entries + leaf rows scanned) x lanes — the vector
                      work the VPU actually executes

Variants measured (r4):
  baseline       the shipped (32x128)-image-strip tile walk, leaf 32
  two_phase      per-tile BVH entry point (VERDICT r4 item 4 lever b):
                 walk the deepest subtree containing the tile's live
                 origins first (seeding windows), then the root walk
  tileshape      64x64 / 128x32 image blocks (same 4096 lanes; a remap is
                 a cheap static transpose once per frame, so this lever
                 would be implementable if it paid)
  leaf sweep     mesh-BVH leaf 8/16/64 vs the shipped 32 (round 3 only
                 measured >32 on chip because the 8192-node SMEM budget
                 forces 32 at 82k tris; the sphere-BVH optimum moved
                 32->16 after live-lane masking, so <32 deserved a number)
  octant8        ORACLE lane-level direction sort (8 sub-walks of the
                 tile's lanes grouped by direction octant) — what lane
                 regrouping would buy IF per-lane gathers were free; on
                 TPU they cost 25-260 ms per ~1M elements (CLAUDE.md
                 platform rules), which is why this stays an oracle
  per_lane       sum over lanes of individually-entered nodes — the MIMD
                 floor no vector-coherent scheme can reach

Findings (committed run, 20 tiles, seed 11 — see docs/PERFORMANCE.md):
baseline 808 entries / 1.07e7 lane-work; two_phase 1343 entries (1.66x
WORSE — the pre-walk duplicates the union the root walk re-enters);
64x64 tiles 803 entries (origin spread is NOT the limiter — direction
divergence is); leaf 16 = 1.03e7 lane-work (-4%) for +46% cursor steps
and 2x SMEM; octant8 oracle 3.87e6 (2.8x less vector work, unreachable);
per-lane floor 2.71e4 (~400x, a MIMD-machine property).  Conclusion: the
wall is structural for coherent-tile vector traversal of incoherent rays;
every implementable lever is within noise of the shipped configuration.

Reference lineage being beaten regardless: the reference's O(N) per-thread
linear scan (compute_shader.wgsl:164-180) has no acceleration structure at
all; this analysis is about the last 2.8x an MIMD GPU gets from per-thread
traversal and a vector machine does not.
"""
from __future__ import annotations

import argparse
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

from gpu_ray_tracing_tpu import make_scene
from gpu_ray_tracing_tpu.models.camera import CameraSettings, derive_camera
from gpu_ray_tracing_tpu.models.mesh import icosphere, transform_mesh
from gpu_ray_tracing_tpu.models.scene import build_mesh_bvh, intersect_scene
from gpu_ray_tracing_tpu.models.spheres import LAMBERTIAN, make_spheres
from gpu_ray_tracing_tpu.ops import rays as rays_ops
from gpu_ray_tracing_tpu.ops.intersect import intersect_spheres

W, H = 640, 480
T_MIN, T_MAX = 1e-3, 3.4e35
TILE_R, TILE_C = 32, 128


def bounce1_rays():
    """True config-4 bounce-1 ray set: primary hits of the 82k-tri scene,
    cosine-scattered about the shading normal (aggregate traversal
    statistics don't need RNG-stream parity, only the right geometry)."""
    ground = make_spheres(
        [((0, -1000.0, 0), 1000.0, LAMBERTIAN, (0.5, 0.5, 0.5), 0.0)])
    mesh = transform_mesh(icosphere(6, albedo=(0.75, 0.6, 0.45), smooth=True),
                          scale=0.8, translate=(0.0, 0.8, 0.0))
    scene = make_scene(ground, mesh)
    # Exactly benchmarks/run.py config4's camera (fov-60 pinhole).
    cam = derive_camera(
        CameraSettings(
            look_from=jnp.asarray([0.0, 1.2, 3.0]),
            look_at=jnp.asarray([0.0, 0.7, 0.0]),
            vup=jnp.asarray([0.0, 1.0, 0.0]),
            field_of_view=jnp.float32(60.0),
            defocus_angle=jnp.float32(0.0),
            focus_distance=jnp.float32(2.0)), W, H)
    o, d, _ = rays_ops.generate_rays_hash(cam, W, H, jnp.uint32(0),
                                          jnp.uint32(1))
    hit, _, _, _ = intersect_scene(o, d, scene, T_MIN, T_MAX)
    p = np.asarray(hit.point)
    n = np.asarray(hit.normal)
    live = np.asarray(hit.hit)

    rng = np.random.default_rng(7)
    u1 = rng.random(p.shape[:2])
    u2 = rng.random(p.shape[:2])
    r_ = np.sqrt(u1)
    phi = 2 * np.pi * u2
    a_ = np.where(np.abs(n[..., 2:3]) < 0.9, np.array([0, 0, 1.0]),
                  np.array([1.0, 0, 0]))
    t1 = np.cross(n, a_)
    t1 /= np.linalg.norm(t1, axis=-1, keepdims=True) + 1e-20
    t2 = np.cross(n, t1)
    z_ = np.sqrt(np.maximum(1 - u1, 0))
    d1 = (t1 * (r_ * np.cos(phi))[..., None]
          + t2 * (r_ * np.sin(phi))[..., None] + n * z_[..., None])
    d1 /= np.linalg.norm(d1, axis=-1, keepdims=True) + 1e-20

    # Sphere-stage window seed (kernel order: spheres shrink the window
    # before the mesh walk); dead lanes get an EMPTY window — the r3
    # live-lane-masking rule.
    s_hit = intersect_spheres(jnp.asarray(p), jnp.asarray(d1), scene.spheres,
                              T_MIN, T_MAX)
    tb0 = np.where(np.asarray(s_hit.hit), np.asarray(s_hit.t), T_MAX)
    tb0 = np.where(live, tb0, T_MIN)
    return scene, mesh, p, d1, tb0, live


class Walker:
    """The megakernel's threaded walk over one (mesh, bvh) build."""

    def __init__(self, mesh, bvh):
        self.bmin = np.asarray(bvh.bbox_min)
        self.bmax = np.asarray(bvh.bbox_max)
        self.miss = np.asarray(bvh.miss_link)
        self.ls = np.asarray(bvh.leaf_start)
        self.lc = np.asarray(bvh.leaf_count)
        self.v0 = np.asarray(mesh.v0)
        self.e1 = np.asarray(mesh.e1)
        self.e2 = np.asarray(mesh.e2)
        self.num_nodes = len(self.miss)

    def _tri_window(self, ox, oy, oz, dx, dy, dz, tb, lo, cnt):
        a0 = (lo // 4) * 4
        a1 = -(-(lo + cnt) // 4) * 4
        for t in range(a0, min(a1, len(self.v0))):
            v0 = self.v0[t]
            e1 = self.e1[t]
            e2 = self.e2[t]
            px = dy * e2[2] - dz * e2[1]
            py = dz * e2[0] - dx * e2[2]
            pz = dx * e2[1] - dy * e2[0]
            det = e1[0] * px + e1[1] * py + e1[2] * pz
            inv = np.where(np.abs(det) < 1e-12, 0.0,
                           1.0 / np.where(det == 0, 1, det))
            sx = ox - v0[0]
            sy = oy - v0[1]
            sz = oz - v0[2]
            u = (sx * px + sy * py + sz * pz) * inv
            qx = sy * e1[2] - sz * e1[1]
            qy = sz * e1[0] - sx * e1[2]
            qz = sx * e1[1] - sy * e1[0]
            v = (dx * qx + dy * qy + dz * qz) * inv
            t_ = (e2[0] * qx + e2[1] * qy + e2[2] * qz) * inv
            ok = ((np.abs(det) >= 1e-12) & (u >= 0) & (v >= 0)
                  & (u + v <= 1) & (t_ > T_MIN) & (t_ < tb))
            tb = np.where(ok, t_, tb)
        return tb

    def walk(self, ox, oy, oz, dx, dy, dz, tb, start=0, stop=-1):
        """Threaded walk from `start` until cursor == `stop`; returns
        (node_entries, leaf_rows_scanned, final windows)."""
        safe = lambda v: np.where(np.abs(v) < 1e-20, 1e-20, v)
        ivx, ivy, ivz = 1.0 / safe(dx), 1.0 / safe(dy), 1.0 / safe(dz)
        cur, entries, leaf_rows = start, 0, 0
        while cur != stop and cur >= 0:
            t0x = (self.bmin[cur, 0] - ox) * ivx
            t1x = (self.bmax[cur, 0] - ox) * ivx
            t0y = (self.bmin[cur, 1] - oy) * ivy
            t1y = (self.bmax[cur, 1] - oy) * ivy
            t0z = (self.bmin[cur, 2] - oz) * ivz
            t1z = (self.bmax[cur, 2] - oz) * ivz
            tn = np.maximum(np.maximum(np.minimum(t0x, t1x),
                                       np.minimum(t0y, t1y)),
                            np.minimum(t0z, t1z))
            tf = np.minimum(np.minimum(np.maximum(t0x, t1x),
                                       np.maximum(t0y, t1y)),
                            np.maximum(t0z, t1z))
            tn_eff = np.maximum(tn, T_MIN)
            if bool(np.any((tf >= tn_eff) & (tn_eff < tb))):
                entries += 1
                if self.ls[cur] >= 0:
                    lo, cnt = int(self.ls[cur]), int(self.lc[cur])
                    leaf_rows += (-(-(lo + cnt) // 4)) - lo // 4
                    tb = self._tri_window(ox, oy, oz, dx, dy, dz, tb, lo, cnt)
                    cur = self.miss[cur]
                else:
                    cur += 1
            else:
                cur = self.miss[cur]
        return entries, leaf_rows, tb

    def subtree_end(self, root):
        return self.miss[root] if self.miss[root] != -1 else -1

    def deepest_container(self, lo_pt, hi_pt):
        """Deepest node whose AABB contains [lo_pt, hi_pt] (descend while
        exactly one child contains it) — lever (b)'s entry point."""
        cur = 0
        while self.ls[cur] < 0:
            left = cur + 1
            right = self.miss[left]
            cands = [ch for ch in (left, right)
                     if ch is not None and ch >= 0
                     and np.all(self.bmin[ch] <= lo_pt)
                     and np.all(self.bmax[ch] >= hi_pt)]
            if len(cands) != 1:
                break
            cur = cands[0]
        return cur


def tile_slices(tr, tc, k, seed=11):
    r = np.random.default_rng(seed)
    ids = list(range((H // tr) * (W // tc)))
    r.shuffle(ids)
    out = []
    for tid in ids[:k]:
        ty, tx = divmod(tid, W // tc)
        out.append((slice(ty * tr, (ty + 1) * tr),
                    slice(tx * tc, (tx + 1) * tc)))
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--tiles", type=int, default=20,
                    help="tiles sampled per variant")
    args = ap.parse_args(argv)

    scene, mesh0, o1, d1, tb0, live = bounce1_rays()
    print(f"live fraction at bounce 1: {live.mean():.4f}")

    base = Walker(scene.mesh, scene.bvh)
    print(f"shipped build: {base.num_nodes} nodes, leaf {scene.bvh_leaf_size}")

    def lanes(sl):
        ox, oy, oz = [o1[sl + (i,)].ravel() for i in range(3)]
        dx, dy, dz = [d1[sl + (i,)].ravel() for i in range(3)]
        return ox, oy, oz, dx, dy, dz, tb0[sl].ravel().copy(), live[sl].ravel()

    # ---- tile shapes (same 4096 lanes, different image footprint) ----
    for tr, tc in ((TILE_R, TILE_C), (64, 64), (128, 32)):
        ents, work = [], []
        for sl in tile_slices(tr, tc, args.tiles):
            ox, oy, oz, dx, dy, dz, tb, _ = lanes(sl)
            e, lr, _ = base.walk(ox, oy, oz, dx, dy, dz, tb)
            ents.append(e)
            work.append((e + lr) * ox.size)
        tag = "baseline " if (tr, tc) == (TILE_R, TILE_C) else "tileshape"
        print(f"{tag} {tr:3d}x{tc:<3d}  entries/tile {np.mean(ents):7.0f}  "
              f"lane-work {np.mean(work):.3g}")

    sample = tile_slices(TILE_R, TILE_C, args.tiles)

    # ---- lever (b): two-phase entry point ----
    ents, work = [], []
    for sl in sample:
        ox, oy, oz, dx, dy, dz, tb, lv = lanes(sl)
        if lv.any():
            pts = np.stack([ox[lv], oy[lv], oz[lv]], -1)
            entry = base.deepest_container(pts.min(0), pts.max(0))
        else:
            entry = 0
        e1_, lr1, tb1 = base.walk(ox, oy, oz, dx, dy, dz, tb,
                                  start=entry, stop=base.subtree_end(entry))
        e2_, lr2, _ = base.walk(ox, oy, oz, dx, dy, dz, tb1)
        ents.append(e1_ + e2_)
        work.append((e1_ + e2_ + lr1 + lr2) * ox.size)
    print(f"two_phase entry    entries/tile {np.mean(ents):7.0f}  "
          f"lane-work {np.mean(work):.3g}")

    # ---- oracle: lane-level octant sort (unimplementable: lane gathers) --
    ents, work = [], []
    for sl in sample:
        ox, oy, oz, dx, dy, dz, tb, lv = lanes(sl)
        oct_id = (dx > 0) * 4 + (dy > 0) * 2 + (dz > 0) * 1
        tot_e, tot_w = 0, 0
        for q in range(8):
            m = (oct_id == q) & lv
            if not m.any():
                continue
            e, lr, _ = base.walk(ox[m], oy[m], oz[m], dx[m], dy[m], dz[m],
                                 tb[m].copy())
            tot_e += e
            tot_w += (e + lr) * int(np.ceil(m.sum() / 128) * 128)
        ents.append(tot_e)
        work.append(tot_w)
    print(f"octant8 ORACLE     entries/tile {np.mean(ents):7.0f}  "
          f"lane-work {np.mean(work):.3g}")

    # ---- MIMD floor: per-lane traversal (64-lane subsample) ----
    rng = np.random.default_rng(3)
    work = []
    for sl in sample:
        ox, oy, oz, dx, dy, dz, tb, lv = lanes(sl)
        idxs = np.flatnonzero(lv)
        sub = idxs[rng.permutation(len(idxs))[:64]]
        fl = [sum(base.walk(ox[i:i + 1], oy[i:i + 1], oz[i:i + 1],
                            dx[i:i + 1], dy[i:i + 1], dz[i:i + 1],
                            tb[i:i + 1].copy())[:2]) for i in sub]
        work.append(np.mean(fl) * lv.sum() if fl else 0)
    print(f"per_lane FLOOR     lane-work {np.mean(work):.3g}")

    # ---- mesh-BVH leaf sweep ----
    for leaf in (64, 32, 16, 8):
        mesh, bvh = build_mesh_bvh(mesh0, leaf_size=leaf)
        wk = Walker(mesh, bvh)
        ents, rows, work = [], [], []
        for sl in sample:
            ox, oy, oz, dx, dy, dz, tb, _ = lanes(sl)
            e, lr, _ = wk.walk(ox, oy, oz, dx, dy, dz, tb)
            ents.append(e)
            rows.append(lr)
            work.append((e + lr) * ox.size)
        print(f"leaf {leaf:3d}: nodes {wk.num_nodes:6d} "
              f"({wk.num_nodes * 48 / 1024:5.0f} KB SMEM)  "
              f"entries/tile {np.mean(ents):7.0f}  "
              f"leafrows/tile {np.mean(rows):7.0f}  "
              f"lane-work {np.mean(work):.3g}")


if __name__ == "__main__":
    main()
