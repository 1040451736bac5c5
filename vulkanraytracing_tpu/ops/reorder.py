"""Ray reordering — wavefront coherence + dead-lane compaction.

Secondary (bounce) rays from a pixel tile scatter over the hemisphere, so a
pixel-coherent packet would traverse the union of 256 unrelated paths.
Sorting the wavefront by (alive, direction octant, origin Morton code)
before tracing re-forms packets of rays that walk the same part of the BVH
— the classic wavefront ray-reordering transform (see PAPERS.md: "On Ray
Reordering Techniques for Faster GPU Ray Tracing"), which on TPU doubles as
*compaction*: dead rays (empty t-window) sort to the tail, so their packets
exit the traversal loop immediately and later bounces cost proportional to
the rays still alive — the XLA-native answer to the reference's per-thread
early exit (RayGen.rgen:383-401 breaks).

Cost: one 32-bit sort + two gathers per trace — microseconds against the
traversal it saves.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import Array

from vulkanraytracing_tpu.accel.lbvh import morton_codes

_U32 = jnp.uint32


class RayOrder(NamedTuple):
    perm: Array      # (R,) i32 — sorted position -> original index
    inv_perm: Array  # (R,) i32 — original index -> sorted position


def ray_sort_keys(
    o: Array, d: Array, t_min: Array, t_max: Array, root_lo: Array, root_hi: Array
) -> Array:
    """32-bit sort key: dead(1) | octant(3) | origin morton(28 of 30)."""
    dead = (t_min > t_max).astype(_U32)
    octant = (
        ((d[:, 0] < 0).astype(_U32) << _U32(2))
        | ((d[:, 1] < 0).astype(_U32) << _U32(1))
        | (d[:, 2] < 0).astype(_U32)
    )
    morton = morton_codes(o, root_lo, root_hi) >> _U32(2)  # 28 bits
    return (dead << _U32(31)) | (octant << _U32(28)) | morton


def make_order(
    o: Array, d: Array, t_min: Array, t_max: Array, root_lo: Array, root_hi: Array
) -> RayOrder:
    keys = ray_sort_keys(o, d, t_min, t_max, root_lo, root_hi)
    perm = jnp.argsort(keys).astype(jnp.int32)
    # invert with an O(n) scatter, not a second O(n log^2 n) sort
    n = perm.shape[0]
    inv_perm = (
        jnp.zeros((n,), jnp.int32)
        .at[perm]
        .set(jnp.arange(n, dtype=jnp.int32))
    )
    return RayOrder(perm=perm, inv_perm=inv_perm)


def apply_order(order: RayOrder, *arrays: Array) -> tuple[Array, ...]:
    """Gather arrays into sorted order."""
    return tuple(a[order.perm] for a in arrays)


def unapply_order(order: RayOrder, *arrays: Array) -> tuple[Array, ...]:
    """Gather results back to the original ray order."""
    return tuple(a[order.inv_perm] for a in arrays)
