"""The progressive path-tracing integrator.

This is the TPU formulation of the reference's canonical per-pixel bounce
loop (Source/Shaders/PathTracing/RayGen.rgen:325-414, identically implemented
by the ray-query backend PathTracing.comp).  Instead of one divergent GPU
thread per pixel, the whole wavefront of R rays advances bounce-by-bounce as
SOA arrays with aliveness masks — dead lanes are masked, never branched, so
every step is dense VPU/gather work.

Estimator parity notes (each preserved deliberately; SURVEY.md section 7):

- seeds: s0 = wang((x<<16)|y), s1 = wang(accumIndex), one warm-up draw
  (RayGen.rgen:57-66);
- the sub-pixel jitter draws from a *copy* of the seed (GetPrimaryRayDireciton
  takes ``uvec2 seed`` by value, :73) so it does not advance the main stream;
- irradiance contributions are scaled by accumulated throughput / accumulated
  pdf (:345-348, :370-378) rather than per-bounce normalized throughput;
- Russian roulette starts at bounce >= 2 with threshold
  max(0.05, 1 - maxComponent(throughput)) on the *unnormalized* throughput
  (:393-401);
- material rays cull back faces (:335), visibility rays do not (:137);
- a point-light sphere hit on the primary ray short-circuits to the light
  color (:354-359);
- the path terminates when pdf < EPSILON or the bsdf is black (:383-386).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax.lax
import jax.numpy as jnp
from jax import Array

from vulkanraytracing_tpu.config import Config, TraversalMode
from vulkanraytracing_tpu.core import math3d, rng
from vulkanraytracing_tpu.ops import reorder as reorder_mod
from vulkanraytracing_tpu.core.math3d import BIAS, EPSILON, RAY_MAX_T, RAY_MIN_T
from vulkanraytracing_tpu.env.panorama import sample_environment
from vulkanraytracing_tpu.ops import trace
from vulkanraytracing_tpu.ops.intersect import fetch_surface_attributes
from vulkanraytracing_tpu.pt import bsdf as bsdf_mod
from vulkanraytracing_tpu.pt.surface import unpack_material
from vulkanraytracing_tpu.scene.camera import CameraPT
from vulkanraytracing_tpu.scene.types import PointLights, Scene


class TraceStats(NamedTuple):
    """Ray-count accounting for the Mrays/s metric (the reference's only perf
    surface is an FPS overlay; we count actual rays cast)."""

    rays: Array  # () f32 — total rays traced (material + visibility)


# --- debug tap (tools/ab/nee_tap_probe.py) ------------------------------
# When VRT_DEBUG_NEE_TAP is set, pathtrace returns a THIRD value: the
# bounce-0 NEE wavefront (inputs AND occlusion verdicts, as computed
# INSIDE the full jitted program).  This exists to bisect in-context
# divergence that standalone kernel probes cannot see (e.g. fusion/FMA
# differences between the oracle and production graphs).


def primary_rays(
    camera: CameraPT,
    px: Array,
    py: Array,
    width: int,
    height: int,
    s0: Array,
    s1: Array,
) -> tuple[Array, Array]:
    """Camera rays with sub-pixel jitter (RayGen.rgen:68-82).

    The jitter consumes a copy of the RNG state — the caller's (s0, s1) must
    NOT be replaced by the advanced state (pass-by-value quirk at :73)."""
    jitter, _, _ = rng.next_vec2(s0, s1)

    size = jnp.array([width, height], jnp.float32)
    pix = jnp.stack([px, py], axis=-1).astype(jnp.float32)
    uv = (pix + jitter) / size
    xy = uv * 2.0 - 1.0

    target = jnp.einsum(
        "ij,...j->...i",
        camera.inverse_proj,
        jnp.concatenate([xy, jnp.ones_like(xy)], axis=-1),
    )
    t3 = math3d.normalize(target[..., :3])
    direction = jnp.einsum(
        "ij,...j->...i",
        camera.inverse_view,
        jnp.concatenate([t3, jnp.zeros_like(t3[..., :1])], axis=-1),
    )
    d = math3d.normalize(direction[..., :3])
    o = jnp.broadcast_to(camera.inverse_view[:3, 3], d.shape)
    return o, d


def intersect_point_light_spheres(
    lights: PointLights, radius: float, o: Array, d: Array, t_min: Array, t_max: Array
) -> tuple[Array, Array]:
    """Closest light-gizmo sphere hit — replaces the point-light TLAS of
    procedural unit spheres (Sphere.rint, SceneModel.cpp:1267-1295; radius =
    Config::kPointLightRadius).  Returns (t, color); t<0 = miss, matching the
    payload convention (RayTracing.glsl:45-53)."""
    c = lights.position[None, :, :3]            # (1, L, 3)
    oc = o[:, None, :] - c                      # (R, L, 3)
    b = math3d.dot(oc, d[:, None, :])           # (R, L)
    cc = math3d.dot(oc, oc) - radius * radius
    disc = b * b - cc
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = -b - sq
    t1 = -b + sq
    t = jnp.where(t0 > t_min[:, None], t0, t1)
    valid = (disc > 0.0) & (t > t_min[:, None]) & (t < t_max[:, None])
    t = jnp.where(valid, t, jnp.float32(3.0e38))
    # no argmin+gather (a (R,)-indexed gather costs ~45 ms at 2M rays): the
    # winner is selected with a first-minimum one-hot and an (R,L)@(L,3)
    # matmul over the tiny light axis
    t_best = jnp.min(t, axis=1)
    is_best = t == t_best[:, None]
    first = is_best & (jnp.cumsum(is_best.astype(jnp.int32), axis=1) == 1)
    color = jnp.einsum(
        "rl,lc->rc",
        first.astype(jnp.float32),
        lights.color[:, :3],
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.where(t_best < 3.0e38, t_best, -1.0), color


def _estimate_point_lights(lights: PointLights, n: Array, p: Array) -> Array:
    """Per-light unshadowed irradiance estimate lum*NoL/d^2
    (RayGen.rgen:200-213). Returns (R, L)."""
    delta = lights.position[None, :, :3] - p[:, None, :]   # (R, L, 3)
    dist_sq = math3d.dot(delta, delta)
    l_dir = delta * jax.lax.rsqrt(jnp.maximum(dist_sq, 1e-20))[..., None]
    nol = jnp.maximum(math3d.dot(n[:, None, :], l_dir), 0.0)
    lum = math3d.luminance(lights.color[None, :, :3])
    return lum * nol / jnp.maximum(dist_sq, 1e-20)


def sample_point_light(
    lights: PointLights, n: Array, p: Array, s0: Array, s1: Array
) -> tuple[Array, Array, Array, Array, Array]:
    """Irradiance-proportional CDF selection (RayGen.rgen:216-256).

    Returns (onehot (R, L) f32, light_index, pdf, s0', s1').  One uniform
    float is consumed per call — exactly one per bounce in the reference
    stream.  The one-hot carries the selection so callers fetch light
    attributes with an (R,L)@(L,C) matmul instead of 2M-element gathers."""
    est = _estimate_point_lights(lights, n, p)        # (R, L)
    cdf = jnp.cumsum(est, axis=1)
    total = cdf[:, -1:]
    # Guard the reference's 0/0 (all lights below horizon): pdf of the forced
    # last light becomes 1, and its NoL=0 zeroes the contribution anyway.
    safe_total = jnp.where(total > 0.0, total, 1.0)
    cdf = jnp.where(total > 0.0, cdf / safe_total, jnp.ones_like(cdf))
    cdf = cdf.at[:, -1].set(1.0)  # :235

    x, s0, s1 = rng.next_float(s0, s1)
    # first index with x < cdf[i] (:239-246)
    idx = jnp.sum((x[:, None] >= cdf[:, :-1]).astype(jnp.int32), axis=1)
    el = jnp.arange(cdf.shape[1], dtype=jnp.int32)
    onehot = (el[None, :] == idx[:, None]).astype(jnp.float32)
    cdf_lo = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf[:, :-1]], axis=1)
    pdf = jnp.sum(onehot * (cdf - cdf_lo), axis=1)
    return onehot, idx, pdf, s0, s1


def pathtrace(
    scene: Scene,
    cfg: Config,
    camera: CameraPT,
    px: Array,
    py: Array,
    width: int,
    height: int,
    accum_index: Array,
    valid: Array | None = None,
) -> tuple[Array, TraceStats]:
    """Trace one sample for each pixel in (px, py); returns tone-mapped color
    (R, 3) — the RayGen.rgen main() body, vectorized.

    ``valid`` masks out padding lanes (pixels outside the image from tile
    rounding): they neither trace nor count toward ray stats."""
    R = px.shape[0]
    f32 = jnp.float32
    if valid is None:
        valid = jnp.ones((R,), bool)

    s0, s1 = rng.pixel_seed(px, py, accum_index)
    o, d = primary_rays(camera, px, py, width, height, s0, s1)
    t_min = jnp.full((R,), camera.z_near, f32)
    t_max = jnp.where(valid, camera.z_far, 0.0)

    rays_cast = jnp.sum(valid.astype(f32))
    hit = trace.trace_closest(scene, cfg, o, d, t_min, t_max, cull_backface=True)

    irradiance = jnp.zeros((R, 3), f32)
    throughput = jnp.ones((R, 3), f32)
    ray_pdf = jnp.ones((R,), f32)
    alive = valid
    # each ray's original slot rides the per-bounce permutations as one
    # extra (free) gather column; the final pixel-order restore is then
    # ONE scatter instead of an inverse-permutation chain
    ray_slot = jnp.arange(R, dtype=jnp.int32)
    sorted_any = False
    nee_tap: dict | None = None

    if scene.has_point_lights:
        pl_t, pl_color = intersect_point_light_spheres(
            scene.point_lights, cfg.point_light_radius, o, d, t_min, t_max
        )
        rays_cast += jnp.sum(valid.astype(f32))

    geom = scene.geometry
    mats = scene.materials
    sun_dir = math3d.normalize(-scene.direct_light.direction[:3])
    sun_color = scene.direct_light.color[:3]

    for bounce in range(cfg.max_bounce_count):
        # --- primary point-light sphere short-circuit (:354-359) ---
        if bounce == 0 and scene.has_point_lights:
            pl_hit = (pl_t >= 0.0) & (hit.is_miss | (pl_t < hit.t)) & alive
            irradiance = jnp.where(pl_hit[:, None], pl_color, irradiance)
            alive &= ~pl_hit

        # --- miss -> environment (:362-366) ---
        env_col = sample_environment(scene.environment, d)
        miss = hit.is_miss & alive
        irradiance += jnp.where(
            miss[:, None], env_col * throughput / ray_pdf[:, None], 0.0
        )
        alive &= ~miss

        # --- surface unpack (UnpackMaterial, :84-119) ---
        attrs = fetch_surface_attributes(geom, hit)
        unpacked = unpack_material(scene, attrs)
        surface = unpacked.surface
        tbn = unpacked.tbn
        n_shading = tbn[..., 2]

        # --- emission (:370) ---
        irradiance += jnp.where(
            alive[:, None], surface.emission * throughput / ray_pdf[:, None], 0.0
        )

        p = o + d * hit.t[:, None]
        wo = math3d.normalize(math3d.world_to_tangent(-d, tbn))
        shadow_origin = p + n_shading * BIAS

        # --- point-light + sun NEE setup (:258-312, :376-378) ---
        # The visibility RAYS are built here but traced AFTER the
        # per-bounce wavefront sort below: shadow origins are THIS
        # bounce's hit points, which the pre-sort wavefront scatters
        # across the scene (the previous structure traced them in the
        # stale order at ~3 Mrays/s vs ~25 for sorted origins — the
        # single largest frame cost, tools/ab (perf_shadow, pruned round 3)).  Unshadowed
        # contributions are computed NOW (pre-BSDF-update throughput/pdf,
        # reference RNG stream order :216-256) and ride the same one-hot
        # permutation; occlusion only gates them after the trace.
        sun_d = jnp.broadcast_to(sun_dir, (R, 3))
        # pre-RR aliveness gates the visibility rays and contributions
        # (the reference traces/accumulates NEE before the RR draw)
        sh_tmax_sun = jnp.where(alive, f32(RAY_MAX_T), f32(0.0))
        if scene.has_point_lights:
            lights = scene.point_lights
            onehot, _idx, light_pdf, s0, s1 = sample_point_light(
                lights, n_shading, p, s0, s1
            )
            sel = lambda table: jnp.einsum(  # noqa: E731 — (R,L)@(L,3) MXU
                "rl,lc->rc", onehot, table[:, :3],
                precision=jax.lax.Precision.HIGHEST,
            )
            lpos = sel(lights.position)
            lcol = sel(lights.color)
            delta = lpos - p
            dist_sq = math3d.dot(delta, delta)
            attenuation = math3d.rcp(dist_sq)
            ldir = math3d.normalize(delta)
            wi_l = math3d.world_to_tangent(ldir, tbn)
            wh_l = math3d.normalize(wo + wi_l)
            pl_bsdf = bsdf_mod.evaluate_bsdf(surface, wo, wi_l, wh_l)
            pl_contrib = (
                pl_bsdf
                * math3d.cos_theta_tangent(wi_l)[:, None]
                * lcol
                * (attenuation / jnp.maximum(light_pdf, 1e-20))[:, None]
            )
            pl_contrib = jnp.where(
                alive[:, None], pl_contrib * throughput / ray_pdf[:, None], 0.0
            )
            sh_tmax_pl = jnp.where(alive, jnp.sqrt(dist_sq), 0.0)
        else:
            ldir = sh_tmax_pl = pl_contrib = None
        wi_s = math3d.world_to_tangent(sun_d, tbn)
        wh_s = math3d.normalize(wo + wi_s)
        sun_bsdf = bsdf_mod.evaluate_bsdf(surface, wo, wi_s, wh_s)
        sun_contrib = sun_bsdf * math3d.cos_theta_tangent(wi_s)[:, None] * sun_color
        sun_contrib = jnp.where(
            alive[:, None], sun_contrib * throughput / ray_pdf[:, None], 0.0
        )

        # --- BSDF sample (:380-391) ---
        b, wi, pdf, s0, s1 = bsdf_mod.sample_bsdf(surface, wo, s0, s1)
        dead = (pdf < EPSILON) | (math3d.dot(b, b) < EPSILON)
        alive &= ~dead
        step_throughput = b * math3d.cos_theta_tangent(wi)[:, None]
        throughput = jnp.where(alive[:, None], throughput * step_throughput, throughput)
        ray_pdf = jnp.where(alive, ray_pdf * pdf, ray_pdf)

        # --- Russian roulette (:393-401) ---
        if bounce >= cfg.min_bounce_count:
            threshold = jnp.maximum(
                cfg.rr_min_threshold, 1.0 - math3d.max_component(throughput)
            )
            rr, s0, s1 = rng.next_float(s0, s1)
            killed = rr < threshold
            alive &= ~killed
            throughput = jnp.where(
                alive[:, None], throughput / (1.0 - threshold)[:, None], throughput
            )

        # --- next segment (:403-409) ---
        o = p
        d = math3d.tangent_to_world(wi, tbn)
        t_min = jnp.full((R,), RAY_MIN_T, f32)
        # dead rays get a zero-length window so traversal exits immediately
        t_max = jnp.where(alive, f32(RAY_MAX_T), f32(0.0))

        # --- NEE visibility traces + accumulate ---
        # Both sets ride ONE traversal call (concatenated; each set stays
        # contiguous so its wave packets keep their own coherence).  The
        # closure runs either BEFORE the reorder (bounce 0: shadow
        # origins are primary hit points, already superbly coherent in
        # pixel-tile order — sorting them measured ~1.7x SLOWER) or
        # AFTER it (bounce >= 1: origins are scattered bounce hit points
        # that need the global sort, ~2.5x faster sorted).
        def nee_trace(irradiance, rays_cast, shadow_origin, sh_tmax_sun,
                      sun_contrib, ldir, sh_tmax_pl, pl_contrib,
                      flip_pl=False, tap=None):
            nee_alive = sh_tmax_sun > 0.0  # pre-RR aliveness
            if scene.has_point_lights:
                if flip_pl:
                    # Bounce point-light visibility is traced FROM the
                    # light TOWARD the surface: the segment is identical —
                    # the light point is not BVH geometry, so the flipped
                    # ray starts at t_min = 0 and ends at dist - RAY_MIN_T,
                    # which maps 1:1 onto the reference's forward window
                    # [RAY_MIN_T, dist] (RayGen.rgen PointLighting,
                    # TMax = sqrt(distanceSquared)).  All rays to one light
                    # share an origin, so the position-sorted wavefront
                    # rows see camera-like direction coherence — measured
                    # 1.16x on the real bounce-1 point shadow set
                    # (tools/ab/ab_anyhit.py).  Bounce 0 stays forward:
                    # primary-hit origins in pixel-tile order are already
                    # the coherent end.
                    pl_o = shadow_origin + ldir * sh_tmax_pl[:, None]
                    pl_d = -ldir
                    # dead lanes (sh_tmax_pl == 0) get an inverted window
                    # (t_min 0 > t_max -1) so traversal skips them
                    pl_tmax = jnp.where(
                        sh_tmax_pl > 0.0,
                        jnp.maximum(sh_tmax_pl - f32(RAY_MIN_T), 0.0),
                        f32(-1.0),
                    )
                    pl_tmin = jnp.zeros((R,), f32)
                else:
                    pl_o, pl_d, pl_tmax = shadow_origin, ldir, sh_tmax_pl
                    pl_tmin = jnp.full((R,), RAY_MIN_T, f32)
                occ = trace.trace_any(
                    scene, cfg,
                    jnp.concatenate([pl_o, shadow_origin]),
                    jnp.concatenate([pl_d, sun_d]),
                    jnp.concatenate([pl_tmin, jnp.full((R,), RAY_MIN_T, f32)]),
                    jnp.concatenate([pl_tmax, sh_tmax_sun]),
                )
                occluded, sun_occluded = occ[:R], occ[R:]
                if tap is not None:
                    tap.update(
                        pl_o=pl_o, pl_d=pl_d, pl_tmin=pl_tmin,
                        pl_tmax=pl_tmax, sun_o=shadow_origin,
                        sun_tmax=sh_tmax_sun, occluded=occluded,
                        sun_occluded=sun_occluded,
                        pl_contrib=pl_contrib, sun_contrib=sun_contrib,
                    )
                rays_cast += 2.0 * jnp.sum(nee_alive.astype(f32))
                irradiance += jnp.where(occluded[:, None], 0.0, pl_contrib)
            else:
                sun_occluded = trace.trace_any(
                    scene, cfg, shadow_origin, sun_d,
                    jnp.full((R,), RAY_MIN_T, f32),
                    sh_tmax_sun,
                )
                rays_cast += jnp.sum(nee_alive.astype(f32))
            irradiance += jnp.where(sun_occluded[:, None], 0.0, sun_contrib)
            return irradiance, rays_cast

        if bounce == 0:
            if os.environ.get("VRT_DEBUG_NEE_TAP") and scene.has_point_lights:
                nee_tap = dict(px=px, py=py, hit_t=hit.t, hit_tri=hit.tri,
                               hit_u=hit.u, hit_v=hit.v, p=p,
                               n_shading=n_shading)
            irradiance, rays_cast = nee_trace(
                irradiance, rays_cast, shadow_origin, sh_tmax_sun,
                sun_contrib, ldir, sh_tmax_pl, pl_contrib, tap=nee_tap,
            )

        # Wavefront reorder: permute the ENTIRE live state (from bounce 1
        # on including this bounce's shadow rays + unshadowed
        # contributions) into TRUE global (coarse-position, direction-bin)
        # order with one argsort + one packed row-gather, plus a
        # probe-predicted row regroup so traversal waves fill with
        # similar-cost rows (ops.reorder).  Counter-measured on bounce-2
        # rays: global order traverses 2.8M node visits / 328 ms vs the
        # earlier segment-local order's 4.7M / 488 ms (tools/ab/ab_sortqual.py).
        # The LAST bounce sorts too (no next closest trace, but its shadow
        # set still gains); one final scatter restores pixel order.
        do_sort = (
            scene.bvh is not None
            and cfg.traversal != TraversalMode.BRUTE_FORCE
            # debug escape hatch for parity bisection (tools/ab): the sort
            # is a pure permutation+restore, so disabling it must not
            # change the image — only wave composition and speed
            and not os.environ.get("VRT_DEBUG_NO_SORT")
        )
        if do_sort:
            lo, hi = trace._root_bounds(scene.bvh)
            core = (o, d, t_min, t_max, irradiance, throughput, ray_pdf,
                    s0, s1, alive, valid, ray_slot)
            if bounce == 0:
                shadow_cols = ()
            elif scene.has_point_lights:
                shadow_cols = (shadow_origin, sh_tmax_sun, sun_contrib,
                               ldir, sh_tmax_pl, pl_contrib)
            else:
                shadow_cols = (shadow_origin, sh_tmax_sun, sun_contrib)
            # the whole live state RIDES one multi-operand sort (~2x
            # cheaper than argsort + packed row-gather, tools/ab job 041)
            out = reorder_mod.sort_wavefront(
                o, d, t_min, t_max, lo, hi, (*core, *shadow_cols),
                probe=scene.bvh.probe,
            )
            (o, d, t_min, t_max, irradiance, throughput, ray_pdf,
             s0, s1, alive, valid, ray_slot) = out[:12]
            if bounce > 0:
                if scene.has_point_lights:
                    (shadow_origin, sh_tmax_sun, sun_contrib,
                     ldir, sh_tmax_pl, pl_contrib) = out[12:]
                else:
                    shadow_origin, sh_tmax_sun, sun_contrib = out[12:]
            sorted_any = True

        if bounce > 0:
            irradiance, rays_cast = nee_trace(
                irradiance, rays_cast, shadow_origin, sh_tmax_sun,
                sun_contrib, ldir, sh_tmax_pl, pl_contrib,
                flip_pl=True,
            )

        if bounce + 1 < cfg.max_bounce_count:
            hit = trace.trace_closest(
                scene, cfg, o, d, t_min, t_max, cull_backface=True,
            )
            rays_cast += jnp.sum(alive.astype(f32))

    if cfg.tone_map_before_accumulation:
        color = math3d.tone_mapping(irradiance)  # :412 — tone-map THEN accumulate
    else:
        color = irradiance  # linear-HDR mode: display applies the curve
    if sorted_any:
        # restore pixel order: ray_slot carried each ray's original index
        # through every permutation, so sorting by it IS the inverse
        # permutation.  A riding lax.sort measured 28.8 ms vs 149 ms for
        # the equivalent scatter at R=2M, bit-identical (r05 job_restore)
        out = jax.lax.sort(
            (ray_slot, color[:, 0], color[:, 1], color[:, 2]), num_keys=1
        )
        color = jnp.stack(out[1:], axis=1)
    if nee_tap is not None:
        return color, TraceStats(rays=rays_cast), nee_tap
    return color, TraceStats(rays=rays_cast)
