"""Config-3 (One-Weekend, sphere BVH) traversal ceiling analysis (CPU).

Run:  python benchmarks/sphere_wall_analysis.py [--bounces 16] [--json out]

VERDICT r4 item 2: config 3's ~121 ms/frame (1280x720, depth 50, 487
spheres, megakernel + sphere BVH leaf 16) was the flagship number with no
ceiling proof — config 4 got benchmarks/mesh_wall_analysis.py, config 3 got
a sentence.  This script is the same pricing instrument for the SPHERE
walk: benchmarks/walk_model.py replicates the megakernel's tile-coherent
threaded traversal on the TRUE per-bounce ray sets of the exact config-3
workload (benchmarks/run.py config3: one_weekend_scene(grid -11..11) = 487
spheres, CameraSettings.default(), 1280x720), walking EVERY active tile,
and prices each lever in the config-4 analysis's currencies:

  node entries   scalar cursor steps (one vector slab test + scalar
                 control flow each)
  lane-work      (entries*SLAB_OPS + tests*SPHERE_OPS) x 4096 lanes —
                 weighted elementwise f32 vector ops

Levers priced (see docs/PERFORMANCE.md "config-3 ceiling" for findings):
  leaf sweep       rebuild at leaf 8/32/64 vs the shipped 16
  brute hybrid     per-tile brute scan when few lanes live (implementable:
                   the kernel can branch per tile on a scalar live count)
  primary tiles    first-bounce-specialized tile shapes for the coherent
                   primary wave
  perfect-order    ORACLE upper bound on ANY node-ordering lever: re-walk
                   with windows pre-seeded at the final closest-hit t (as
                   if nodes were visited in perfect near-to-far order)
  octant8          ORACLE lane-level direction sort (unimplementable:
                   per-lane gathers cost 25-260 ms/M elems on TPU)
  per_lane         MIMD floor (per-thread traversal, the property a
                   4096-lane vector tile cannot have)

Cross-check against the chip: the model reproduces the r3 on-chip leaf
ordering (8 loses on scalar steps despite ~8% less vector work; 32/64 lose
outright), and benchmarks/vpu_roofline.py correlates its per-bounce
lane-work against an on-chip max_depth sweep.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")

from gpu_ray_tracing_tpu import make_scene, one_weekend_scene
from gpu_ray_tracing_tpu.models.camera import CameraSettings, derive_camera
from gpu_ray_tracing_tpu.ops.bvh import build_sphere_bvh

from benchmarks.walk_model import (  # noqa: E402
    SLAB_OPS,
    SPHERE_OPS,
    T_MIN,
    TILE_C,
    TILE_R,
    SceneModel,
    SphereWalker,
    frame_cost,
    lane_work,
    path_states,
    tiles,
)

W, H = 1280, 720


def config3_scene(leaf_size=None):
    """EXACTLY benchmarks/run.py config3's scene (487 spheres)."""
    sc = make_scene(one_weekend_scene(jax.random.key(0),
                                      grid_min=-11, grid_max=11))
    if leaf_size is None:
        return SceneModel(sc)
    sp, bvh = build_sphere_bvh(sc.spheres, leaf_size=leaf_size)
    return SceneModel(sc, bvh=bvh, spheres=sp)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--bounces", type=int, default=16,
                    help="path-simulation depth (config 3 runs d50; the "
                    "residual live fraction at the cap is printed)")
    ap.add_argument("--sample", type=int, default=0,
                    help="tiles sampled per bounce (0 = all active tiles)")
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)

    base_scene = config3_scene()
    print(f"config-3 scene: {base_scene.n} spheres, {base_scene.num_nodes} "
          f"nodes, leaf {base_scene.leaf_size}")
    print("simulating config-3 paths (numpy, full 720p frame)...")
    cam = derive_camera(CameraSettings.default(), W, H)
    states = path_states(base_scene, cam, W, H, args.bounces)
    for b, (_, _, live) in enumerate(states):
        at = sum(1 for sl in tiles(W, H) if live[sl].any())
        print(f"  bounce {b:2d}: live {live.mean():8.5f}  active tiles "
              f"{at}/{(H // TILE_R) * (W // TILE_C)}")
    results = {"scene": {"spheres": base_scene.n,
                         "nodes": base_scene.num_nodes,
                         "leaf": base_scene.leaf_size},
               "bounces_simulated": len(states)}

    base = SphereWalker(base_scene)
    shipped = frame_cost(states, base, W, H, sample=args.sample)
    results["shipped_leaf16"] = shipped
    print(f"shipped    entries {shipped['entries']:.3g}  tests "
          f"{shipped['tests']:.3g}  lane-work {shipped['lane_work']:.4g}")
    for row in shipped["per_bounce"]:
        print(f"    b{row['bounce']:<2d} tiles {row['active_tiles']:3d}  "
              f"entries {row['entries']:9.0f}  tests {row['tests']:9.0f}  "
              f"lane-work {row['lane_work']:.3g}")

    # ---- leaf sweep ----
    for leaf in (8, 32, 64):
        wk = SphereWalker(config3_scene(leaf_size=leaf))
        r = frame_cost(states, wk, W, H, sample=args.sample or 40)
        results[f"leaf{leaf}"] = r
        print(f"leaf {leaf:3d}   entries {r['entries']:.3g}  tests "
              f"{r['tests']:.3g}  lane-work {r['lane_work']:.4g}  "
              f"({r['lane_work'] / shipped['lane_work']:.2f}x)")

    # ---- brute scan everywhere (the reference's O(N), vectorized) ----
    nt = sum(r["active_tiles"] for r in shipped["per_bounce"])
    brute_w = nt * lane_work(0, base_scene.n)
    results["brute_all"] = {"lane_work": brute_w}
    print(f"brute all  lane-work {brute_w:.4g}  "
          f"({brute_w / shipped['lane_work']:.2f}x)")

    # ---- hybrid: brute when few lanes live + the per-tile oracle ----
    for k in (64, 256, 1024):
        r = frame_cost(states, base, W, H,
                       live_rule=lambda n, k=k: n <= k, sample=args.sample)
        results[f"hybrid_le{k}"] = r
        print(f"hybrid live<={k:<5d} lane-work {r['lane_work']:.4g}  "
              f"({r['lane_work'] / shipped['lane_work']:.2f}x, "
              f"{r['brute_tiles']} brute tiles)")

    # ---- primary-bounce tile shapes (coherent wave specialization) ----
    o, d, live = states[0]
    for tr, tc in ((32, 128), (64, 128), (16, 128), (64, 64)):
        e = t = w_ = 0
        for sl in tiles(W, H, tr, tc):
            ee, tt, _ = base.walk(sl, o, d, live)
            e += ee
            t += tt
            w_ += lane_work(ee, tt, tr * tc)
        results[f"primary_{tr}x{tc}"] = {"entries": e, "tests": t,
                                         "lane_work": w_}
        print(f"primary {tr:3d}x{tc:<3d} entries {e:7.0f}  tests {t:8.0f} "
              f" lane-work {w_:.4g}")

    # ---- perfect-ordering oracle: the upper bound on ANY node-ordering
    # lever.  Re-walk every tile with windows pre-seeded at the FINAL
    # closest-hit t — as if every node were visited in the perfect
    # near-to-far order so the window had already shrunk.  If these counts
    # match the shipped walk, ordering cannot buy anything. ----
    s = base_scene
    tot_w = tot_e = tot_t = 0.0
    for b, (o, d, live) in enumerate(states):
        active = [sl for sl in tiles(W, H) if live[sl].any()]
        if not active:
            break
        for sl in active:
            _, _, tb_final = base.walk(sl, o, d, live)
            lv = live[sl].ravel()
            ox, oy, oz = [o[sl + (i,)].ravel().astype(np.float64)
                          for i in range(3)]
            dx, dy, dz = [d[sl + (i,)].ravel().astype(np.float64)
                          for i in range(3)]
            tb = np.where(lv, tb_final * (1 + 1e-6) + 1e-6, T_MIN)
            a = dx * dx + dy * dy + dz * dz
            safe = lambda v: np.where(np.abs(v) < 1e-20, 1e-20, v)
            ivx, ivy, ivz = 1 / safe(dx), 1 / safe(dy), 1 / safe(dz)
            cur, e, t = 0, 0, 0
            while cur >= 0:
                t0x = (s.bmin[cur, 0] - ox) * ivx
                t1x = (s.bmax[cur, 0] - ox) * ivx
                t0y = (s.bmin[cur, 1] - oy) * ivy
                t1y = (s.bmax[cur, 1] - oy) * ivy
                t0z = (s.bmin[cur, 2] - oz) * ivz
                t1z = (s.bmax[cur, 2] - oz) * ivz
                tn = np.maximum(np.maximum(np.minimum(t0x, t1x),
                                           np.minimum(t0y, t1y)),
                                np.minimum(t0z, t1z))
                tf = np.minimum(np.minimum(np.maximum(t0x, t1x),
                                           np.maximum(t0y, t1y)),
                                np.maximum(t0z, t1z))
                tn_eff = np.maximum(tn, T_MIN)
                if bool(np.any((tf >= tn_eff) & (tn_eff < tb))):
                    e += 1
                    if s.ls[cur] >= 0:
                        t += int(s.lc[cur])
                        cur = s.miss[cur]
                    else:
                        cur += 1
                else:
                    cur = s.miss[cur]
            tot_e += e
            tot_t += t
            tot_w += lane_work(e, t)
    results["perfect_order_oracle"] = {"entries": tot_e, "tests": tot_t,
                                       "lane_work": tot_w}
    print(f"perfect-order ORACLE entries {tot_e:.3g}  tests {tot_t:.3g}  "
          f"lane-work {tot_w:.4g}  "
          f"({tot_w / shipped['lane_work']:.2f}x)")

    # ---- octant8 oracle (lane-level sort; unimplementable on TPU) ----
    rng = np.random.default_rng(3)
    tot = 0.0
    for b, (o, d, live) in enumerate(states):
        active = [sl for sl in tiles(W, H) if live[sl].any()]
        if not active:
            break
        sel = [active[i] for i in rng.permutation(len(active))[:40]]
        bw = 0.0
        for sl in sel:
            dx = d[sl + (0,)].ravel()
            dy = d[sl + (1,)].ravel()
            dz = d[sl + (2,)].ravel()
            lv = live[sl].ravel()
            oct_id = (dx > 0) * 4 + (dy > 0) * 2 + (dz > 0) * 1
            for q in range(8):
                m = (oct_id == q) & lv
                if not m.any():
                    continue
                om = np.stack([o[sl + (i,)].ravel()[m] for i in range(3)],
                              -1)
                dm = np.stack([d[sl + (i,)].ravel()[m] for i in range(3)],
                              -1)
                e, t, _ = base.walk(
                    (slice(None), slice(None)),
                    om[None], dm[None], np.ones((1, int(m.sum())), bool))
                bw += lane_work(e, t, int(np.ceil(m.sum() / 128) * 128))
        tot += bw * (len(active) / len(sel))
    results["octant8_oracle"] = {"lane_work": tot}
    print(f"octant8 ORACLE lane-work {tot:.4g}  "
          f"({tot / shipped['lane_work']:.2f}x)")

    # ---- per-lane MIMD floor ----
    rng = np.random.default_rng(5)
    tot = 0.0
    for b, (o, d, live) in enumerate(states):
        li = np.flatnonzero(live.ravel())
        if len(li) == 0:
            break
        sub = li[rng.permutation(len(li))[:256]]
        of = o.reshape(-1, 3)
        df = d.reshape(-1, 3)
        per = []
        for i in sub:
            e, t, _ = base.walk((slice(None), slice(None)),
                                of[i:i + 1][None], df[i:i + 1][None],
                                np.ones((1, 1), bool))
            per.append(e * SLAB_OPS + t * SPHERE_OPS)
        tot += np.mean(per) * len(li)
    results["per_lane_floor"] = {"lane_work": tot}
    print(f"per_lane FLOOR lane-work {tot:.4g}  "
          f"({tot / shipped['lane_work']:.3f}x)")

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1, default=float)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
