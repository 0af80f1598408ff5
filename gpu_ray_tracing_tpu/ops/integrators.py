"""Integrators: iterative path tracer and normal-shading debug integrator.

Reference mapping (compute_shader.wgsl):
  - `sky_color`     <- the miss shader's vertical gradient (wgsl:293-296)
  - `trace_path`    <- ray_color (wgsl:261-297): iterative stackless bounce
                       loop to max_depth with multiplicative throughput;
                       absorbed scatter returns black (wgsl:274,278,282);
                       miss breaks to the sky gradient.
  - `shade_normals` <- not in the reference; the BASELINE config-1 debug
                       integrator from the same "One Weekend" lineage
                       (0.5 * (normal + 1) on hit, sky on miss).

The reference quirk at wgsl:293-296 — a ray that exhausts all bounces without
missing still receives sky * throughput instead of black — is reproduced only
when parity=True.

Control-flow note: on TPU every lane runs the full max_depth trip count; dead
rays (missed / absorbed) are carried with live=False masks instead of breaking,
which is exactly how a vector machine wants the reference's per-thread `break`
expressed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gpu_ray_tracing_tpu.models.spheres import EMISSIVE, Spheres
from gpu_ray_tracing_tpu.ops import rng as rng_ops
from gpu_ray_tracing_tpu.ops.materials import scatter

Array = jax.Array


def sky_color(dirs: Array) -> Array:
    """Vertical white->blue gradient on the unit direction (wgsl:293-296)."""
    unit = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-20)
    a = 0.5 * (unit[..., 1:2] + 1.0)
    white = jnp.asarray([1.0, 1.0, 1.0], jnp.float32)
    blue = jnp.asarray([0.5, 0.7, 1.0], jnp.float32)
    return (1.0 - a) * white + a * blue


def shade_normals(
    origins: Array,
    dirs: Array,
    scene,
    t_min: float,
    t_max: float,
) -> Array:
    """Normal-shading integrator (BASELINE config 1): 0.5*(n+1) or sky."""
    from gpu_ray_tracing_tpu.models.scene import as_scene, intersect_scene

    hit, _, _, _ = intersect_scene(origins, dirs, as_scene(scene), t_min, t_max)
    lit = 0.5 * (hit.normal + 1.0)
    return jnp.where(hit.hit[..., None], lit, sky_color(dirs))


def trace_path(
    origins: Array,
    dirs: Array,
    scene,
    max_depth: int,
    t_min: float,
    t_max: float,
    *,
    key: Array | None = None,
    bounce_seeds: Array | None = None,
    pixel_seeds: Array | None = None,
    parity: bool = False,
    russian_roulette_depth: int = 0,
    sky_intensity: float = 1.0,
) -> Array:
    """Path-trace a batch of rays; returns linear RGB of shape dirs.shape.

    RNG: pass exactly one of
      - pixel_seeds:  (batch,) uint32 per-pixel counter seeds (from
                      generate_rays_hash); draws are pure functions of
                      (pixel seed, bounce, salt) — position-equivariant, so
                      results are independent of sharding/tiling.  The
                      TPU-native default.
      - key:          threefry; independent per-pixel draws per bounce.
      - bounce_seeds: (max_depth,) uint32 scalar seeds, the WGSL stream.
                      NOTE the reference derives ONE scalar scatter seed per
                      bounce for the whole frame (ray_color receives the
                      frame-uniform `seed+1`, wgsl:355, then hashes
                      seed + i*1000 per bounce, wgsl:268) — so scatter
                      randomness is perfectly correlated across pixels.  We
                      reproduce that faithfully here since it IS the WGSL
                      stream; the threefry path decorrelates pixels.
    """
    n_rng = sum(x is not None for x in (key, bounce_seeds, pixel_seeds))
    if n_rng != 1:
        raise ValueError("pass exactly one of key=, bounce_seeds=, or pixel_seeds=")

    from gpu_ray_tracing_tpu.models.scene import as_scene, intersect_scene

    scene = as_scene(scene)

    batch_shape = dirs.shape[:-1]
    throughput = jnp.ones((*batch_shape, 3), jnp.float32)
    result = jnp.zeros((*batch_shape, 3), jnp.float32)
    live = jnp.ones(batch_shape, dtype=bool)

    def body(i, carry):
        o, d, throughput, result, live = carry
        hit, albedo, kind, param = intersect_scene(o, d, scene, t_min, t_max)

        if pixel_seeds is not None:
            # Salts 16+3i..18+3i: three independent draws per bounce.
            base = jnp.uint32(16) + jnp.uint32(3) * jnp.asarray(i, jnp.uint32)
            unit_vec = rng_ops.unit_vector_from_uniforms(
                rng_ops.uniform_hash(pixel_seeds, base),
                rng_ops.uniform_hash(pixel_seeds, base + jnp.uint32(1)),
            )
            u_reflect = rng_ops.uniform_hash(pixel_seeds, base + jnp.uint32(2))
        elif key is not None:
            k = jax.random.fold_in(key, i)
            k_uv, k_refl = jax.random.split(k)
            u = jax.random.uniform(k_uv, (2, *batch_shape), jnp.float32)
            unit_vec = rng_ops.unit_vector_from_uniforms(u[0], u[1])
            u_reflect = jax.random.uniform(k_refl, batch_shape, jnp.float32)
        else:
            # Frame-uniform scalar seed per bounce: hash(seed + i*1000)
            # (wgsl:268), shared by every pixel.
            s = bounce_seeds[i]
            unit_vec = jnp.broadcast_to(
                rng_ops.random_unit_vector(s), (*batch_shape, 3)
            )
            u_reflect = jnp.broadcast_to(rng_ops.wgsl_random_float(s), batch_shape)

        new_dir, attenuation, ok = scatter(
            d, hit.normal, hit.front_face, albedo, kind, param, unit_vec, u_reflect
        )

        missed = live & ~hit.hit
        result = jnp.where(
            missed[..., None],
            result + throughput * sky_color(d) * jnp.float32(sky_intensity),
            result,
        )
        # Emissive surfaces radiate albedo * param and end the path
        # (extension beyond the reference's three BSDFs).
        emissive = live & hit.hit & (kind == EMISSIVE)
        result = jnp.where(
            emissive[..., None],
            result + throughput * albedo * param[..., None],
            result,
        )
        # Absorbed rays (metal below surface) contribute black (wgsl:278).
        scattered = live & hit.hit & ok & (kind != EMISSIVE)
        throughput = jnp.where(scattered[..., None], throughput * attenuation, throughput)
        o = jnp.where(scattered[..., None], hit.point, o)
        d = jnp.where(scattered[..., None], new_dir, d)
        live = scattered

        if russian_roulette_depth > 0:
            # Unbiased stochastic termination: survive with p = max channel
            # throughput (clamped), divide by p on survival.  Salt space
            # 1000+i is disjoint from the scatter salts, so enabling RR does
            # not perturb the base sample stream.
            if pixel_seeds is not None:
                u_rr = rng_ops.uniform_hash(pixel_seeds, jnp.uint32(1000) + jnp.asarray(i, jnp.uint32))
            elif key is not None:
                u_rr = jax.random.uniform(
                    jax.random.fold_in(jax.random.fold_in(key, 1000), i), batch_shape
                )
            else:
                u_rr = jnp.broadcast_to(
                    rng_ops.wgsl_random_float(bounce_seeds[i] + jnp.uint32(977)), batch_shape
                )
            p = jnp.clip(jnp.max(throughput, axis=-1), 0.05, 1.0)
            apply_rr = i >= russian_roulette_depth
            survive = (~apply_rr) | (u_rr < p)
            scale = jnp.where(apply_rr, 1.0 / p, 1.0)
            throughput = jnp.where(
                (live & survive)[..., None], throughput * scale[..., None], throughput
            )
            live = live & survive
        return o, d, throughput, result, live

    o, d, throughput, result, live = jax.lax.fori_loop(
        0, max_depth, body, (origins, dirs, throughput, result, live)
    )

    if parity:
        # Reference quirk: depth-exhausted rays still get sky * throughput
        # (no exhaustion test after the loop, wgsl:293-296).
        result = jnp.where(
            live[..., None],
            result + throughput * sky_color(d) * jnp.float32(sky_intensity),
            result,
        )
    return result


def make_bounce_seeds(color_seed_u32: Array, max_depth: int) -> Array:
    """The per-bounce scalar seeds of ray_color: hash(seed + i*1000)
    (wgsl:268), where `color_seed_u32` is the frame-uniform value the
    reference passes as ray_color's seed (update's seed+1, wgsl:355)."""
    i = jnp.arange(max_depth, dtype=jnp.uint32)
    return rng_ops.wgsl_hash(jnp.asarray(color_seed_u32, jnp.uint32) + i * jnp.uint32(1000))
