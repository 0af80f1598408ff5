"""Shared offline model of the megakernel's sphere work (CPU, numpy).

Used by benchmarks/sphere_wall_analysis.py (the config-3 ceiling proof) and
benchmarks/vpu_roofline.py (the per-config VPU-utilization pricing).  Two
pieces:

  path_states   numpy re-simulation of a path-traced workload's TRUE
                per-bounce ray sets (material-faithful scatter: cosine
                lambertian, fuzzed metal w/ absorption, Schlick dielectric,
                optional Russian roulette with the kernel's p = clip(max
                throughput, 0.05, 1) rule).  Aggregate traversal statistics
                need the right geometry/liveness distribution, not
                RNG-stream parity — same stance as
                mesh_wall_analysis.bounce1_rays.
  SphereWalker  exact replica of the megakernel's tile-coherent threaded
                sphere-BVH walk (ops/pallas/megakernel._traverse_bvh +
                _sphere_root semantics: per-lane shrinking windows, dead
                lanes at empty windows, one scalar cursor per tile, enter =
                any live lane's slab overlaps, fori leaf scans).

Vector-op weights (counted from the kernel source): one slab test
(megakernel.py _traverse_bvh body) ~= 26 elementwise f32 ops; one sphere
leaf test (_sphere_root + the ~10 closest-hit carry selects) ~= 30.
"""
from __future__ import annotations

import numpy as np

T_MIN, T_MAX = 1e-3, 3.4e35
TILE_R, TILE_C = 32, 128
SLAB_OPS = 26.0
SPHERE_OPS = 30.0


def _unit(v):
    return v / (np.linalg.norm(v, axis=-1, keepdims=True) + 1e-20)


class SceneModel:
    """Numpy view of a Scene pytree's spheres + sphere BVH."""

    def __init__(self, scene, bvh=None, spheres=None):
        sp = scene.spheres if spheres is None else spheres
        bvh = scene.sphere_bvh if bvh is None else bvh
        self.c = np.asarray(sp.centers, np.float64)
        self.r = np.asarray(sp.radii, np.float64)
        self.albedo = np.asarray(sp.albedo)
        self.kind = np.asarray(sp.mat_kind)
        self.param = np.asarray(sp.mat_param)
        self.n = len(self.r)
        if bvh is not None:
            self.bmin = np.asarray(bvh.bbox_min)
            self.bmax = np.asarray(bvh.bbox_max)
            self.miss = np.asarray(bvh.miss_link)
            self.ls = np.asarray(bvh.leaf_start)
            self.lc = np.asarray(bvh.leaf_count)
            self.num_nodes = len(self.miss)
            self.leaf_size = bvh.leaf_size
        else:
            self.num_nodes = 0


def closest_hit_np(scene: SceneModel, o, d):
    """Brute shrinking-window closest hit (flat (P,3) arrays)."""
    t = np.full(o.shape[0], T_MAX)
    idx = np.full(o.shape[0], -1, np.int64)
    a = np.einsum("ij,ij->i", d, d)
    for j in range(scene.n):
        oc = o - scene.c[j]
        h = -np.einsum("ij,ij->i", oc, d)
        cc = np.einsum("ij,ij->i", oc, oc) - scene.r[j] ** 2
        disc = h * h - a * cc
        sq = np.sqrt(np.maximum(disc, 0.0))
        rn = (h - sq) / a
        rf = (h + sq) / a
        nok = (rn > T_MIN) & (rn < t)
        fok = (rf > T_MIN) & (rf < t)
        root = np.where(nok, rn, rf)
        better = (disc >= 0) & (nok | fok)
        t = np.where(better, root, t)
        idx = np.where(better, j, idx)
    return t, idx


def path_states(scene: SceneModel, cam, W, H, max_bounce, rr_depth=0,
                seed=7, frame_seed=1):
    """Per-bounce (o, d, live) full-frame arrays for bounces 0..max_bounce-1
    of one 1-spp pass (bounce 0 = primary)."""
    import jax.numpy as jnp

    from gpu_ray_tracing_tpu.ops import rays as rays_ops

    o0, d0, _ = rays_ops.generate_rays_hash(cam, W, H, jnp.uint32(0),
                                            jnp.uint32(frame_seed))
    o = np.asarray(o0, np.float64).reshape(-1, 3)
    d = np.asarray(d0, np.float64).reshape(-1, 3)
    live = np.ones(o.shape[0], bool)
    thr = np.ones((o.shape[0], 3))
    rng = np.random.default_rng(seed)
    states = []
    for b in range(max_bounce):
        states.append((o.reshape(H, W, 3).astype(np.float32),
                       d.reshape(H, W, 3).astype(np.float32),
                       live.reshape(H, W).copy()))
        if not live.any():
            break
        li = np.flatnonzero(live)
        t, idx = closest_hit_np(scene, o[li], d[li])
        hit = idx >= 0
        live[li[~hit]] = False  # sky
        hi = li[hit]
        ti, ji = t[hit], idx[hit]
        p = o[hi] + ti[:, None] * d[hi]
        nrm = (p - scene.c[ji]) / scene.r[ji][:, None]
        din = _unit(d[hi])
        front = np.einsum("ij,ij->i", din, nrm) < 0
        nf = np.where(front[:, None], nrm, -nrm)
        kind = scene.kind[ji]
        u = rng.random((len(hi), 3))
        z = 2 * u[:, 0] - 1
        phi = 2 * np.pi * u[:, 1]
        rr_ = np.sqrt(np.maximum(1 - z * z, 0))
        runit = np.stack([rr_ * np.cos(phi), rr_ * np.sin(phi), z], -1)
        nd = np.zeros_like(d[hi])
        alive = np.ones(len(hi), bool)
        lam = kind == 0
        nd[lam] = nf[lam] + runit[lam]
        degen = lam & (np.einsum("ij,ij->i", nd, nd) < 1e-12)
        nd[degen] = nf[degen]
        thr[hi[lam]] *= scene.albedo[ji[lam]]
        met = kind == 1
        refl = din - 2 * np.einsum("ij,ij->i", din, nrm)[:, None] * nrm
        nd[met] = refl[met] + scene.param[ji][met, None] * runit[met]
        absorbed = met & (np.einsum("ij,ij->i", nd, nf) <= 0)
        alive[absorbed] = False
        thr[hi[met]] *= scene.albedo[ji[met]]
        die = kind == 2
        if die.any():
            ratio = np.where(front[die], 1.0 / scene.param[ji][die],
                             scene.param[ji][die])
            ct = np.minimum(-np.einsum("ij,ij->i", din[die], nf[die]), 1.0)
            st = np.sqrt(np.maximum(1 - ct * ct, 0))
            tir = ratio * st > 1.0
            r0 = ((1 - ratio) / (1 + ratio)) ** 2
            schl = r0 + (1 - r0) * (1 - ct) ** 5
            do_refl = tir | (rng.random(int(die.sum())) < schl)
            perp = ratio[:, None] * (din[die] + ct[:, None] * nf[die])
            par = -np.sqrt(np.abs(1 - np.einsum("ij,ij->i", perp, perp)
                                  ))[:, None] * nf[die]
            refr = perp + par
            rfl = din[die] - 2 * np.einsum(
                "ij,ij->i", din[die], nf[die])[:, None] * nf[die]
            nd[die] = np.where(do_refl[:, None], rfl, refr)
        emis = kind == 3
        alive[emis] = False
        if rr_depth and b + 1 >= rr_depth:
            # kernel rule: survive with p = clip(max throughput, 0.05, 1)
            pth = np.clip(thr[hi].max(axis=-1), 0.05, 1.0)
            surv = rng.random(len(hi)) < pth
            alive &= surv
            thr[hi[surv]] /= pth[surv][:, None]
        live[hi] = alive
        o[hi] = p
        d[hi] = nd
    return states


class SphereWalker:
    """The megakernel's threaded sphere-BVH walk over one SceneModel."""

    def __init__(self, scene: SceneModel):
        self.s = scene

    def walk(self, sl, o, d, live):
        """Walk one tile slice; returns (entries, sphere_tests, tb)."""
        s = self.s
        ox, oy, oz = [o[sl + (i,)].ravel().astype(np.float64)
                      for i in range(3)]
        dx, dy, dz = [d[sl + (i,)].ravel().astype(np.float64)
                      for i in range(3)]
        lv = live[sl].ravel()
        tb = np.where(lv, T_MAX, T_MIN)
        a = dx * dx + dy * dy + dz * dz
        safe = lambda v: np.where(np.abs(v) < 1e-20, 1e-20, v)
        ivx, ivy, ivz = 1 / safe(dx), 1 / safe(dy), 1 / safe(dz)
        cur, entries, tests = 0, 0, 0
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
                entries += 1
                if s.ls[cur] >= 0:
                    lo, cnt = int(s.ls[cur]), int(s.lc[cur])
                    for j in range(lo, lo + cnt):
                        oc0 = ox - s.c[j, 0]
                        oc1 = oy - s.c[j, 1]
                        oc2 = oz - s.c[j, 2]
                        h = -(oc0 * dx + oc1 * dy + oc2 * dz)
                        cc = oc0 * oc0 + oc1 * oc1 + oc2 * oc2 - s.r[j] ** 2
                        disc = h * h - a * cc
                        sq = np.sqrt(np.maximum(disc, 0))
                        rn = (h - sq) / a
                        rf = (h + sq) / a
                        nok = (rn > T_MIN) & (rn < tb)
                        fok = (rf > T_MIN) & (rf < tb)
                        better = (disc >= 0) & (nok | fok)
                        tb = np.where(better, np.where(nok, rn, rf), tb)
                        tests += 1
                    cur = s.miss[cur]
                else:
                    cur += 1
            else:
                cur = s.miss[cur]
        return entries, tests, tb


def tiles(W, H, tr=TILE_R, tc=TILE_C):
    for ty in range(H // tr):
        for tx in range(W // tc):
            yield (slice(ty * tr, (ty + 1) * tr),
                   slice(tx * tc, (tx + 1) * tc))


def lane_work(entries, tests, lanes=TILE_R * TILE_C):
    return (entries * SLAB_OPS + tests * SPHERE_OPS) * lanes


def frame_cost(states, walker, W, H, live_rule=None, sample=0, seed=3):
    """Price a frame: per bounce, walk every ACTIVE tile (or a sample);
    live_rule(live_count) True = replace the walk by the brute scan."""
    rng = np.random.default_rng(seed)
    tot_e = tot_t = tot_w = 0.0
    brute_tiles = 0
    per_bounce = []
    for b, (o, d, live) in enumerate(states):
        active = [sl for sl in tiles(W, H) if live[sl].any()]
        if not active:
            break
        chosen = active
        scale = 1.0
        if sample and len(active) > sample:
            sel = rng.permutation(len(active))[:sample]
            chosen = [active[i] for i in sel]
            scale = len(active) / len(chosen)
        be = bt = bw = 0.0
        for sl in chosen:
            nlive = int(live[sl].sum())
            if live_rule is not None and live_rule(nlive):
                e, t = 0, walker.s.n
                brute_tiles += 1
            else:
                e, t, _ = walker.walk(sl, o, d, live)
            be += e
            bt += t
            bw += lane_work(e, t)
        per_bounce.append({
            "bounce": b, "active_tiles": len(active),
            "entries": be * scale, "tests": bt * scale,
            "lane_work": bw * scale,
        })
        tot_e += be * scale
        tot_t += bt * scale
        tot_w += bw * scale
    return {"entries": tot_e, "tests": tot_t, "lane_work": tot_w,
            "per_bounce": per_bounce, "brute_tiles": brute_tiles}
