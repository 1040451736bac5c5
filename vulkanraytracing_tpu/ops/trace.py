"""Trace dispatch — selects the intersection backend.

The analog of the reference's compile-time PathTracingMode backend switch
(Config.hpp:10-14: RT pipeline vs ray-query compute — two implementations of
the same trace), here: brute force vs LBVH traversal (XLA) vs LBVH traversal
(Pallas kernel).
"""

from __future__ import annotations

from jax import Array

from vulkanraytracing_tpu.config import Config, TraversalMode
from vulkanraytracing_tpu.ops import intersect
from vulkanraytracing_tpu.ops.intersect import Hit
from vulkanraytracing_tpu.scene.types import Scene


def trace_closest(
    scene: Scene,
    cfg: Config,
    o: Array,
    d: Array,
    t_min: Array,
    t_max: Array,
    cull_backface: bool = True,
) -> Hit:
    """traceRayEXT against the scene TLAS (RayGen.rgen:337-343)."""
    if cfg.traversal == TraversalMode.BRUTE_FORCE or scene.bvh is None:
        return intersect.intersect_closest_brute(
            scene.geometry, o, d, t_min, t_max, cull_backface=cull_backface
        )
    from vulkanraytracing_tpu.ops import traverse

    return traverse.intersect_closest_bvh(
        scene.geometry, scene.bvh, o, d, t_min, t_max,
        cull_backface=cull_backface,
        use_pallas=cfg.traversal == TraversalMode.BVH_PALLAS,
    )


def trace_any(
    scene: Scene,
    cfg: Config,
    o: Array,
    d: Array,
    t_min: Array,
    t_max: Array,
) -> Array:
    """Alpha-aware visibility query (TraceVisibilityRay, RayGen.rgen:133-184)."""
    if cfg.traversal == TraversalMode.BRUTE_FORCE or scene.bvh is None:
        return intersect.intersect_any_brute(scene.geometry, o, d, t_min, t_max)
    from vulkanraytracing_tpu.ops import traverse

    return traverse.intersect_any_bvh(
        scene.geometry, scene.bvh, o, d, t_min, t_max,
        use_pallas=cfg.traversal == TraversalMode.BVH_PALLAS,
    )
