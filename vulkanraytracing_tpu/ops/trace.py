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
    just beyond the rejected surface (ignoreIntersectionEXT semantics).
    Each round is guarded by a runtime ``lax.cond`` on "any lane failed":
    when a round resolves every cutout (the common case — foliage stacks
    are shallow), the remaining re-traversals are skipped on device
    instead of tracing dead work."""
    import jax
    import jax.numpy as jnp

    geom = scene.geometry
    for _ in range(MAX_ALPHA_ITERS):
        needs = hit.is_hit & geom.alpha_test[hit.tri]
        alpha, cutoff = _hit_alpha(scene, hit)
        fail = needs & (alpha < cutoff)
        # continue failed lanes just past the rejected hit
        new_tmin = hit.t * 1.0001 + 1e-4
        new_tmax = jnp.where(fail, t_max, 0.0)

        def _round(args):
            lo_t, hi_t, fail, hit = args
            nxt = trace_fn(lo_t, hi_t)
            return Hit(*[jnp.where(fail, n, h) for n, h in zip(nxt, hit)])

        hit = jax.lax.cond(
            jnp.any(fail), _round, lambda args: args[3],
            (new_tmin, new_tmax, fail, hit),
        )
    # any still-failing hit after the bounded loop is dropped (treated as
    # transparent) rather than committed
    needs = hit.is_hit & geom.alpha_test[hit.tri]
    alpha, cutoff = _hit_alpha(scene, hit)
    fail = needs & (alpha < cutoff)
    big = jnp.float32(3.0e38)
    return hit._replace(t=jnp.where(fail, big, hit.t))


def _opaque_view(scene: Scene) -> Scene:
    """Scene view whose alpha-test triangles are non-candidates: bit2 of
    ``bvh.tri_flags`` cleared and ``geometry.alpha_test`` zeroed, so every
    backend's candidate test ``(flags & 6) != 0`` (resp. ``opaque |
    alpha_test`` for brute force) treats cutouts as statically transparent.
    Phase A of the alpha split; the cutouts are traced by phase B over
    ``scene.alpha``.  Does NOT cover chunked streaming tables (flags are
    baked at build) — chunked scenes keep ``scene.alpha`` unset."""
    import jax.numpy as jnp

    geom = scene.geometry._replace(
        alpha_test=jnp.zeros_like(scene.geometry.alpha_test)
    )
    bvh = scene.bvh
    if bvh is not None:
        bvh = bvh._replace(tri_flags=bvh.tri_flags & ~4)
    return scene._replace(geometry=geom, bvh=bvh, alpha=None)


def _closest_alpha_subset(
    scene: Scene, cfg: Config, o, d, t_min, t_max, cull_backface: bool
) -> Hit:
    """Closest PASSING cutout hit over the foliage-only tree
    (scene.alpha), with the bounded alpha re-trace loop confined to the
    subset.  Returned ``tri`` ids are remapped to MAIN-scene triangle ids.
    The subset tree is small (foliage is a fraction of the scene), so the
    re-trace rounds cost a fraction of a full-scene traversal — the
    wavefront answer to the driver's inline any-hit shader."""
    import jax.numpy as jnp

    alpha = scene.alpha
    sub = scene._replace(geometry=alpha.geometry, bvh=alpha.bvh, alpha=None)
    mode = cfg.traversal
    if mode == TraversalMode.BRUTE_FORCE:
        def trace_fn(lo_t, hi_t):
            return intersect.intersect_closest_brute(
                sub.geometry, o, d, lo_t, hi_t, cull_backface=cull_backface
            )
    else:
        backend = _closest_backend(mode)

        def trace_fn(lo_t, hi_t):
            return backend(
                sub.geometry, sub.bvh, o, d, lo_t, hi_t,
                cull_backface=cull_backface,
            )

    hit = trace_fn(t_min, t_max)
    hit = _resolve_alpha(sub, trace_fn, hit, t_max)
    tri_global = alpha.tri_map[jnp.clip(hit.tri, 0, alpha.tri_map.shape[0] - 1)]
    return hit._replace(tri=jnp.where(hit.is_hit, tri_global, hit.tri))


def _merge_closest(hit_a: Hit, hit_b: Hit) -> Hit:
    """Merge two closest-hit records by the order-independent (t, tri id)
    lexicographic rule the traversal kernels use (KERNEL_NOTES round-4:
    exact-t ties must resolve identically everywhere)."""
    import jax.numpy as jnp

    better = (hit_a.t < hit_b.t) | (
        (hit_a.t == hit_b.t) & (hit_a.tri < hit_b.tri)
    )
    better &= hit_a.is_hit
    return Hit(*[jnp.where(better, a, b) for a, b in zip(hit_a, hit_b)])


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
    otherwise be direction-incoherent.

    Alpha-tested (cutout) geometry: when the scene carries the foliage
    split (scene.alpha, attached by accel.build_scene_bvh), the trace runs
    as phase A (opaque candidates only, main BVH) + phase B (closest
    passing cutout over the small subset tree, window tightened to the
    opaque winner) merged by (t, id) — semantically the reference's
    unbounded any-hit loop (RayGen.rgen:142-176) without paying re-traces
    of the full scene.  Without the split (chunked tables, hand-assembled
    scenes) the bounded full-scene re-trace loop applies."""
    import jax.numpy as jnp

    use_alpha = scene.textures is not None and cfg.alpha_visibility
    if use_alpha and scene.alpha is not None:
        hit_o = trace_closest(
            _opaque_view(scene), cfg, o, d, t_min, t_max,
            cull_backface=cull_backface, reorder=reorder,
        )
        hit_a = _closest_alpha_subset(
            scene, cfg, o, d, t_min, jnp.minimum(t_max, hit_o.t),
            cull_backface=cull_backface,
        )
        return _merge_closest(hit_a, hit_o)

    mode = cfg.traversal
    if mode == TraversalMode.BRUTE_FORCE or scene.bvh is None:
        hit = intersect.intersect_closest_brute(
            scene.geometry, o, d, t_min, t_max, cull_backface=cull_backface
        )
        if use_alpha:
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
    if use_alpha:
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
        if scene.alpha is not None:
            # opaque occluders keep the SPECIALIZED any-hit kernel (1.89x
            # cheaper than closest, KERNEL_NOTES); only the cutout subset
            # pays the alpha loop, on its own small tree
            blocked = trace_any(
                _opaque_view(scene), cfg, o, d, t_min, t_max, reorder=reorder
            )
            hit_a = _closest_alpha_subset(
                scene, cfg, o, d, t_min, t_max, cull_backface=False
            )
            return blocked | hit_a.is_hit
        # no foliage split (chunked tables / hand-assembled scenes): the
        # closest-hit alpha loop over the full scene resolves cutouts (an
        # occluder exists iff a committed hit survives it)
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
