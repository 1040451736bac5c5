"""Two-level acceleration: instanced geometry + per-frame BVH refit.

Ref: the reference's BLAS/TLAS split — per-primitive BLASes
(SceneModel.cpp:848-868) instanced into a TLAS with per-instance transforms
and customIndex packing (:870-909, AccelerationStructureManager.cpp:167-192).

TPU redesign: object-space BLAS triangle soups are concatenated once with a
per-triangle instance id ("the customIndex"); every frame the world-space
geometry is recomputed by one dense batched transform (a gather of 3x4
matrices + FMAs — microseconds for Sponza-scale counts), and the BVH is
*refit*: topology (Morton order + Karras tree + leaf ranges) is kept from
the build frame, only AABBs and packed triangle records are recomputed
on-device.  This is the eAllowUpdate/refit path of VK acceleration
structures; quality degrades gracefully under motion and a full rebuild
(accel.lbvh.build_bvh) restores it.

Mirrored instances (negative-determinant transforms) swap their winding
in-flight so backface culling stays consistent — the driver does the same
under VK_KHR_ray_tracing.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from vulkanraytracing_tpu.accel.lbvh import LEAF_SIZE, _pack_tris, build_bvh
from vulkanraytracing_tpu.scene.types import BVH, TraceGeometry


class InstanceSoup(NamedTuple):
    """Concatenated object-space geometry with per-triangle instance ids."""

    object_geometry: TraceGeometry  # (T, ...) object space
    instance_id: Array              # (T,) i32 — the customIndex low bits


def make_instances(
    blases: list[TraceGeometry],
    blas_ids: list[int],
    material_offsets: list[int] | None = None,
) -> InstanceSoup:
    """Duplicate each referenced BLAS per instance (object space).

    ``blas_ids[i]`` selects the BLAS for instance i;
    ``material_offsets[i]`` (optional) is added to the BLAS's material ids
    — the customIndex materialIndex<<16 analog (SceneModel.cpp:786-789)."""
    parts = []
    inst_ids = []
    for i, bid in enumerate(blas_ids):
        g = blases[bid]
        if material_offsets is not None and material_offsets[i]:
            g = g._replace(material_id=g.material_id + material_offsets[i])
        parts.append(g)
        inst_ids.append(np.full((g.num_triangles,), i, np.int32))
    geometry = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *parts)
    return InstanceSoup(
        object_geometry=geometry,
        instance_id=jnp.asarray(np.concatenate(inst_ids)),
    )


def world_geometry(soup: InstanceSoup, transforms: Array) -> TraceGeometry:
    """Transform the soup to world space; transforms is (I, 4, 4).

    Positions by M; shading normals/tangents by M (not inverse transpose —
    ClosestHit.rchit:77-78 parity) renormalized; winding flipped for
    mirrored instances so front-face culling matches."""
    g = soup.object_geometry
    m = transforms[soup.instance_id]        # (T, 4, 4)
    rot = m[:, :3, :3]
    trans = m[:, :3, 3]

    def xform_p(p):
        return jnp.einsum("tij,tj->ti", rot, p) + trans

    def xform_v(v, normalize=True):
        out = jnp.einsum("tij,tj->ti", rot, v)
        if normalize:
            n = jnp.linalg.norm(out, axis=-1, keepdims=True)
            out = out / jnp.maximum(n, 1e-20)
        return out

    v0 = xform_p(g.v0)
    p1 = xform_p(g.v0 + g.e1)
    p2 = xform_p(g.v0 + g.e2)
    e1 = p1 - v0
    e2 = p2 - v0

    det = jnp.linalg.det(rot)
    mirrored = det < 0.0

    # winding flip for mirrored instances: swap corners 1 and 2
    def pick(a, b):
        return jnp.where(mirrored[:, None], b, a)

    return TraceGeometry(
        v0=v0,
        e1=pick(e1, e2),
        e2=pick(e2, e1),
        n0=xform_v(g.n0),
        n1=pick(xform_v(g.n1), xform_v(g.n2)),
        n2=pick(xform_v(g.n2), xform_v(g.n1)),
        t0=xform_v(g.t0),
        t1=pick(xform_v(g.t1), xform_v(g.t2)),
        t2=pick(xform_v(g.t2), xform_v(g.t1)),
        uv0=g.uv0,
        uv1=pick(g.uv1, g.uv2),
        uv2=pick(g.uv2, g.uv1),
        material_id=g.material_id,
        cull_disable=g.cull_disable,
        opaque=g.opaque,
        alpha_test=g.alpha_test,
    )


def build_tlas(
    soup: InstanceSoup, transforms: Array
) -> tuple[TraceGeometry, BVH, Array]:
    """Initial build: world transform + full LBVH.  Returns
    (morton-ordered world geometry, bvh, order) — keep ``order`` to refit:
    the soup must be permuted once so refits skip re-sorting."""
    geom = world_geometry(soup, transforms)
    geom_sorted, bvh = build_bvh(geom)
    return geom_sorted, bvh, bvh.tri_order


def permute_soup(soup: InstanceSoup, order: Array) -> InstanceSoup:
    """Apply the build-time Morton order to the soup so refit keeps ids
    aligned with the tree's leaf ranges."""
    return InstanceSoup(
        object_geometry=jax.tree.map(lambda a: a[order], soup.object_geometry),
        instance_id=soup.instance_id[order],
    )


@jax.jit
def refit_tlas(
    bvh: BVH, soup_sorted: InstanceSoup, transforms: Array
) -> tuple[TraceGeometry, BVH]:
    """Per-frame refit: recompute world geometry (already Morton-ordered)
    and propagate AABBs bottom-up through the FIXED tree topology."""
    geom = world_geometry(soup_sorted, transforms)

    p1 = geom.v0 + geom.e1
    p2 = geom.v0 + geom.e2
    tri_lo = jnp.minimum(jnp.minimum(geom.v0, p1), p2)
    tri_hi = jnp.maximum(jnp.maximum(geom.v0, p1), p2)
    t = tri_lo.shape[0]

    child = bvh.child_index                   # (N, 2)
    n_int = child.shape[0]

    def leaf_box(idx):
        packed = ~idx
        start = packed >> 4
        count = packed & 15
        lo = jnp.full((idx.shape[0], 3), jnp.inf, jnp.float32)
        hi = jnp.full((idx.shape[0], 3), -jnp.inf, jnp.float32)
        for k in range(LEAF_SIZE):
            tid = jnp.minimum(start + k, t - 1)
            ok = (k < count)[:, None]
            lo = jnp.where(ok, jnp.minimum(lo, tri_lo[tid]), lo)
            hi = jnp.where(ok, jnp.maximum(hi, tri_hi[tid]), hi)
        return lo, hi

    def child_box(c, node_lo, node_hi, ready):
        idx = child[:, c]
        is_leaf = idx < 0
        node = jnp.where(is_leaf, 0, idx)
        l_lo, l_hi = leaf_box(jnp.where(is_leaf, idx, -1))
        lo = jnp.where(is_leaf[:, None], l_lo, node_lo[node])
        hi = jnp.where(is_leaf[:, None], l_hi, node_hi[node])
        return lo, hi, is_leaf | ready[node]

    def body(state):
        node_lo, node_hi, ready = state
        l_lo, l_hi, l_rdy = child_box(0, node_lo, node_hi, ready)
        r_lo, r_hi, r_rdy = child_box(1, node_lo, node_hi, ready)
        now = l_rdy & r_rdy
        return (
            jnp.where(now[:, None], jnp.minimum(l_lo, r_lo), node_lo),
            jnp.where(now[:, None], jnp.maximum(l_hi, r_hi), node_hi),
            ready | now,
        )

    init = (
        jnp.full((n_int, 3), jnp.inf, jnp.float32),
        jnp.full((n_int, 3), -jnp.inf, jnp.float32),
        jnp.zeros((n_int,), bool),
    )
    node_lo, node_hi, _ = jax.lax.while_loop(
        lambda s: ~jnp.all(s[2]), body, init
    )

    ones = jnp.ones((n_int,), bool)
    l_lo, l_hi, _ = child_box(0, node_lo, node_hi, ones)
    r_lo, r_hi, _ = child_box(1, node_lo, node_hi, ones)

    nodes = jnp.concatenate([l_lo, l_hi, r_lo, r_hi], axis=1)
    tris, tri_flags = _pack_tris(geom)
    new_bvh = bvh._replace(nodes=nodes, tris=tris, tri_flags=tri_flags)
    return geom, new_bvh
