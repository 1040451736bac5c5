"""Trace dispatch — selects the intersection backend.

The analog of the reference's compile-time PathTracingMode backend switch
(Config.hpp:10-14: RT pipeline vs ray-query compute — two implementations of
the same trace): brute force / packet LBVH traversal (production) / per-ray
LBVH traversal (oracle) / Pallas kernel.
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
        return intersect.intersect_closest_brute(
            scene.geometry, o, d, t_min, t_max, cull_backface=cull_backface
        )
    if mode == TraversalMode.BVH:
        from vulkanraytracing_tpu.ops import reorder as reorder_mod
        from vulkanraytracing_tpu.ops import traverse_packet

        if reorder:
            lo, hi = _root_bounds(scene.bvh)
            order = reorder_mod.make_order(o, d, t_min, t_max, lo, hi)
            o, d, t_min, t_max = reorder_mod.apply_order(
                order, o, d, t_min, t_max
            )
        hit = traverse_packet.intersect_closest_packet(
            scene.geometry, scene.bvh, o, d, t_min, t_max,
            cull_backface=cull_backface,
        )
        if reorder:
            hit = Hit(*reorder_mod.unapply_order(order, *hit))
        return hit
    from vulkanraytracing_tpu.ops import traverse

    return traverse.intersect_closest_bvh(
        scene.geometry, scene.bvh, o, d, t_min, t_max,
        cull_backface=cull_backface,
        use_pallas=mode == TraversalMode.BVH_PALLAS,
    )


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
    mode = cfg.traversal
    if mode == TraversalMode.BRUTE_FORCE or scene.bvh is None:
        return intersect.intersect_any_brute(scene.geometry, o, d, t_min, t_max)
    if mode == TraversalMode.BVH:
        from vulkanraytracing_tpu.ops import reorder as reorder_mod
        from vulkanraytracing_tpu.ops import traverse_packet

        if reorder:
            lo, hi = _root_bounds(scene.bvh)
            order = reorder_mod.make_order(o, d, t_min, t_max, lo, hi)
            o, d, t_min, t_max = reorder_mod.apply_order(
                order, o, d, t_min, t_max
            )
        blocked = traverse_packet.intersect_any_packet(
            scene.geometry, scene.bvh, o, d, t_min, t_max
        )
        if reorder:
            (blocked,) = reorder_mod.unapply_order(order, blocked)
        return blocked
    from vulkanraytracing_tpu.ops import traverse

    return traverse.intersect_any_bvh(
        scene.geometry, scene.bvh, o, d, t_min, t_max,
        use_pallas=mode == TraversalMode.BVH_PALLAS,
    )
