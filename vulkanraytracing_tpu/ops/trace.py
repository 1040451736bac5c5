"""Trace dispatch — selects the intersection backend.

The analog of the reference's compile-time PathTracingMode backend switch
(Config.hpp:10-14: RT pipeline vs ray-query compute — two implementations of
the same trace): brute force / XLA packet traversal / per-ray traversal
(oracle) / Pallas kernel (production default; falls back to the XLA packet
path when the BVH exceeds its VMEM budget).

Cross-cutting concerns applied around every BVH backend:

- wavefront reordering (ops.reorder) for bounce rays;
- the bounded alpha-test re-trace loop for textured cutouts
  (TraceVisibilityRay / AnyHit.rahit semantics, RayGen.rgen:133-184).
"""

from __future__ import annotations

from jax import Array

from vulkanraytracing_tpu.config import Config, TraversalMode
from vulkanraytracing_tpu.ops import intersect
from vulkanraytracing_tpu.ops.intersect import Hit
from vulkanraytracing_tpu.scene.types import Scene


def _root_bounds(bvh):
    import jax.numpy as jnp

    lo = jnp.minimum(bvh.nodes[0, 0:3], bvh.nodes[0, 6:9])
    hi = jnp.maximum(bvh.nodes[0, 3:6], bvh.nodes[0, 9:12])
    return lo, hi


# Transparency layers resolved per ray before giving up (the reference's
# any-hit loop is unbounded, RayGen.rgen:142-176; 4 layers covers typical
# foliage/cutout stacks).
MAX_ALPHA_ITERS = 4


def _closest_backend(mode: TraversalMode):
    if mode == TraversalMode.BVH_PALLAS:
        # 8-wide kernel when the scene BVH carries the host-built collapse
        # (accel.bvh8); the 2-wide wide kernel otherwise (e.g. BVH built
        # inside a trace, where the collapse can't run)
        def closest(geom, bvh, *args, **kwargs):
            if bvh.nodes8 is not None or bvh.chunks is not None:
                from vulkanraytracing_tpu.ops import traverse_wide8

                return traverse_wide8.intersect_closest(
                    geom, bvh, *args, **kwargs
                )
            from vulkanraytracing_tpu.ops import traverse_wide

            return traverse_wide.intersect_closest(geom, bvh, *args, **kwargs)

        return closest
    if mode == TraversalMode.BVH_PALLAS_SUBPACKET:
        from vulkanraytracing_tpu.ops import traverse_subpacket

        return traverse_subpacket.intersect_closest
    if mode == TraversalMode.BVH_PALLAS_SHARED:
        from vulkanraytracing_tpu.ops import traverse_pallas

        return traverse_pallas.intersect_closest
    if mode == TraversalMode.BVH_PER_RAY:
        from vulkanraytracing_tpu.ops import traverse

        return traverse.intersect_closest_bvh
    from vulkanraytracing_tpu.ops import traverse_packet

    return traverse_packet.intersect_closest_packet


def _any_backend(mode: TraversalMode):
    if mode == TraversalMode.BVH_PALLAS:
        def anyhit(geom, bvh, *args, **kwargs):
            if bvh.nodes8 is not None or bvh.chunks is not None:
                from vulkanraytracing_tpu.ops import traverse_wide8

                return traverse_wide8.intersect_any(geom, bvh, *args, **kwargs)
            from vulkanraytracing_tpu.ops import traverse_wide

            return traverse_wide.intersect_any(geom, bvh, *args, **kwargs)

        return anyhit
    if mode == TraversalMode.BVH_PALLAS_SUBPACKET:
        from vulkanraytracing_tpu.ops import traverse_subpacket

        return traverse_subpacket.intersect_any
    if mode == TraversalMode.BVH_PALLAS_SHARED:
        from vulkanraytracing_tpu.ops import traverse_pallas

        return traverse_pallas.intersect_any
    if mode == TraversalMode.BVH_PER_RAY:
        from vulkanraytracing_tpu.ops import traverse

        return traverse.intersect_any_bvh
    from vulkanraytracing_tpu.ops import traverse_packet

    return traverse_packet.intersect_any_packet


def _hit_alpha(scene: Scene, hit: Hit):
    """Alpha at a hit point: baseColorFactor.a * baseColorTexture.a
    (AnyHit.rahit / TraceVisibilityRay semantics, RayGen.rgen:163-174)."""
    import jax.numpy as jnp

    from vulkanraytracing_tpu.core import math3d
    from vulkanraytracing_tpu.ops.texture import TexturePool, sample_pool

    from vulkanraytracing_tpu.ops.select import onehot_select

    geom = scene.geometry
    mats = scene.materials
    tri = hit.tri
    bary = jnp.stack([1.0 - hit.u - hit.v, hit.u, hit.v], axis=-1)
    # one row-gather for uvs + material id (see fetch_surface_attributes)
    uv_table = jnp.concatenate(
        [geom.uv0, geom.uv1, geom.uv2,
         geom.material_id[:, None].astype(jnp.float32)],
        axis=1,
    )
    uvrec = uv_table[tri]
    uv = math3d.bary_lerp(uvrec[:, 0:2], uvrec[:, 2:4], uvrec[:, 4:6], bary)
    mid = uvrec[:, 6].astype(jnp.int32)
    # one fused gather-free select: [alpha factor, cutoff, bc_tex]
    rec = onehot_select(
        mid,
        jnp.stack(
            [
                mats.base_color_factor[:, 3],
                mats.alpha_cutoff,
                mats.base_color_texture.astype(jnp.float32),
            ],
            axis=1,
        ),
    )
    alpha, cutoff = rec[:, 0], rec[:, 1]
    tex = rec[:, 2].astype(jnp.int32)
    if scene.textures is not None:
        pool = TexturePool(*scene.textures)
        sampled = sample_pool(pool, tex, uv)
        alpha = alpha * jnp.where(tex >= 0, sampled[..., 3], 1.0)
    return alpha, cutoff


def _resolve_alpha(scene: Scene, trace_fn, hit: Hit, t_max) -> Hit:
    """Re-trace past alpha-test hits whose sampled alpha < cutoff.

    Bounded unrolled loop: each round re-traces only the failed lanes from
    just beyond the rejected surface (ignoreIntersectionEXT semantics)."""
    import jax.numpy as jnp

    geom = scene.geometry
    for _ in range(MAX_ALPHA_ITERS):
        needs = hit.is_hit & geom.alpha_test[hit.tri]
        alpha, cutoff = _hit_alpha(scene, hit)
        fail = needs & (alpha < cutoff)
        # continue failed lanes just past the rejected hit
        new_tmin = hit.t * 1.0001 + 1e-4
        new_tmax = jnp.where(fail, t_max, 0.0)
        nxt = trace_fn(new_tmin, new_tmax)
        hit = Hit(*[jnp.where(fail, n, h) for n, h in zip(nxt, hit)])
    # any still-failing hit after the bounded loop is dropped (treated as
    # transparent) rather than committed
    needs = hit.is_hit & geom.alpha_test[hit.tri]
    alpha, cutoff = _hit_alpha(scene, hit)
    fail = needs & (alpha < cutoff)
    big = jnp.float32(3.0e38)
    return hit._replace(t=jnp.where(fail, big, hit.t))


def trace_closest(
    scene: Scene,
    cfg: Config,
    o: Array,
    d: Array,
    t_min: Array,
    t_max: Array,
    cull_backface: bool = True,
    reorder: bool = False,
) -> Hit:
    """traceRayEXT against the scene TLAS (RayGen.rgen:337-343).

    ``reorder=True`` sorts the wavefront by coherence key first (see
    ops.reorder) — used for bounce rays, whose pixel-tile packets would
    otherwise be direction-incoherent."""
    mode = cfg.traversal
    if mode == TraversalMode.BRUTE_FORCE or scene.bvh is None:
        hit = intersect.intersect_closest_brute(
            scene.geometry, o, d, t_min, t_max, cull_backface=cull_backface
        )
        if scene.textures is not None and cfg.alpha_visibility:
            def retrace(lo_t, hi_t):
                return intersect.intersect_closest_brute(
                    scene.geometry, o, d, lo_t, hi_t,
                    cull_backface=cull_backface,
                )

            hit = _resolve_alpha(scene, retrace, hit, t_max)
        return hit

    from vulkanraytracing_tpu.ops import reorder as reorder_mod

    backend = _closest_backend(mode)
    if reorder:
        lo, hi = _root_bounds(scene.bvh)
        order = reorder_mod.make_order(
            o, d, t_min, t_max, lo, hi, probe=scene.bvh.probe
        )
        o, d, t_min, t_max = reorder_mod.apply_order(order, o, d, t_min, t_max)
    hit = backend(
        scene.geometry, scene.bvh, o, d, t_min, t_max,
        cull_backface=cull_backface,
    )
    if reorder:
        hit = Hit(*reorder_mod.unapply_order(order, *hit))
        o, d, t_min, t_max = reorder_mod.unapply_order(
            order, o, d, t_min, t_max
        )
    if scene.textures is not None and cfg.alpha_visibility:
        def retrace(lo_t, hi_t):
            return backend(
                scene.geometry, scene.bvh, o, d, lo_t, hi_t,
                cull_backface=cull_backface,
            )

        hit = _resolve_alpha(scene, retrace, hit, t_max)
    return hit


def trace_any(
    scene: Scene,
    cfg: Config,
    o: Array,
    d: Array,
    t_min: Array,
    t_max: Array,
    reorder: bool = False,
) -> Array:
    """Alpha-aware visibility query (TraceVisibilityRay, RayGen.rgen:133-184)."""
    if scene.textures is not None and cfg.alpha_visibility:
        # textured cutouts need per-hit alpha tests: reuse the closest-hit
        # alpha loop (an occluder exists iff a committed hit survives it)
        hit = trace_closest(
            scene, cfg, o, d, t_min, t_max, cull_backface=False,
            reorder=reorder,
        )
        return hit.is_hit
    mode = cfg.traversal
    if mode == TraversalMode.BRUTE_FORCE or scene.bvh is None:
        return intersect.intersect_any_brute(scene.geometry, o, d, t_min, t_max)

    from vulkanraytracing_tpu.ops import reorder as reorder_mod

    backend = _any_backend(mode)
    if reorder:
        lo, hi = _root_bounds(scene.bvh)
        order = reorder_mod.make_order(
            o, d, t_min, t_max, lo, hi, probe=scene.bvh.probe
        )
        o, d, t_min, t_max = reorder_mod.apply_order(order, o, d, t_min, t_max)
    blocked = backend(scene.geometry, scene.bvh, o, d, t_min, t_max)
    if reorder:
        (blocked,) = reorder_mod.unapply_order(order, blocked)
    return blocked
