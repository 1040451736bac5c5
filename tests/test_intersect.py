"""Moller-Trumbore unit tests: analytic hits, culling semantics, windows."""

import jax.numpy as jnp
import numpy as np

from vulkanraytracing_tpu.ops import intersect
from vulkanraytracing_tpu.scene.types import make_trace_geometry


def _geom(cull_disable=False, opaque=True):
    positions = np.array(
        [[-1.0, -1.0, 0.0], [1.0, -1.0, 0.0], [0.0, 1.0, 0.0]], np.float32
    )
    indices = np.array([[0, 1, 2]], np.int32)
    return make_trace_geometry(
        positions, indices, cull_disable=cull_disable, opaque=opaque
    )


def _rays(o, d):
    o = jnp.asarray(np.asarray(o, np.float32).reshape(-1, 3))
    d = jnp.asarray(np.asarray(d, np.float32).reshape(-1, 3))
    r = o.shape[0]
    return o, d, jnp.zeros((r,)), jnp.full((r,), 1e3)


def test_frontal_hit_distance():
    # triangle winding: (-1,-1,0) -> (1,-1,0) -> (0,1,0) is CCW seen from +Z
    o, d, tmin, tmax = _rays([0, 0, 5], [0, 0, -1])
    hit = intersect.intersect_closest_brute(_geom(), o, d, tmin, tmax)
    assert bool(hit.is_hit[0])
    np.testing.assert_allclose(float(hit.t[0]), 5.0, rtol=1e-5)
    assert not bool(hit.backface[0])


def test_backface_cull_and_disable():
    # from -Z the same triangle is a back face
    o, d, tmin, tmax = _rays([0, 0, -5], [0, 0, 1])
    hit = intersect.intersect_closest_brute(
        _geom(), o, d, tmin, tmax, cull_backface=True
    )
    assert bool(hit.is_miss[0])

    hit2 = intersect.intersect_closest_brute(
        _geom(cull_disable=True), o, d, tmin, tmax, cull_backface=True
    )
    assert bool(hit2.is_hit[0])
    assert bool(hit2.backface[0])

    # visibility rays never cull
    blocked = intersect.intersect_any_brute(_geom(), o, d, tmin, tmax)
    assert bool(blocked[0])


def test_miss_outside_triangle():
    o, d, tmin, tmax = _rays([5, 5, 5], [0, 0, -1])
    hit = intersect.intersect_closest_brute(_geom(), o, d, tmin, tmax)
    assert bool(hit.is_miss[0])


def test_t_window():
    o, d, _, _ = _rays([0, 0, 5], [0, 0, -1])
    hit = intersect.intersect_closest_brute(
        _geom(), o, d, jnp.array([6.0]), jnp.array([10.0])
    )
    assert bool(hit.is_miss[0])
    hit = intersect.intersect_closest_brute(
        _geom(), o, d, jnp.array([0.0]), jnp.array([4.0])
    )
    assert bool(hit.is_miss[0])


def test_transparent_triangle_never_hits():
    o, d, tmin, tmax = _rays([0, 0, 5], [0, 0, -1])
    hit = intersect.intersect_closest_brute(_geom(opaque=False), o, d, tmin, tmax)
    assert bool(hit.is_miss[0])
    assert not bool(intersect.intersect_any_brute(_geom(opaque=False), o, d, tmin, tmax)[0])


def test_closest_of_two():
    positions = np.array(
        [
            [-1, -1, 0], [1, -1, 0], [0, 1, 0],       # z = 0
            [-1, -1, 2], [1, -1, 2], [0, 1, 2],       # z = 2 (closer from z=5)
        ],
        np.float32,
    )
    indices = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    geom = make_trace_geometry(positions, indices)
    o, d, tmin, tmax = _rays([0, 0, 5], [0, 0, -1])
    hit = intersect.intersect_closest_brute(geom, o, d, tmin, tmax)
    np.testing.assert_allclose(float(hit.t[0]), 3.0, rtol=1e-5)
    assert int(hit.tri[0]) == 1


def test_barycentrics_interpolate_attributes():
    geom = _geom()
    # aim at vertex 2 (0, 1, 0): u -> corner1 weight, v -> corner2 weight
    o, d, tmin, tmax = _rays([0, 0.999, 5], [0, 0, -1])
    hit = intersect.intersect_closest_brute(geom, o, d, tmin, tmax)
    assert bool(hit.is_hit[0])
    attrs = intersect.fetch_surface_attributes(geom, hit)
    np.testing.assert_allclose(
        np.asarray(attrs.normal[0]), [0, 0, 1], atol=1e-5
    )
    assert float(hit.v[0]) > 0.99


def test_many_triangles_tiled_scan():
    rng = np.random.default_rng(3)
    n = 1000
    centers = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    offs = rng.normal(0, 0.3, (n, 3, 3)).astype(np.float32)
    pos = (centers[:, None] + offs).reshape(-1, 3)
    idx = np.arange(3 * n).reshape(-1, 3)
    geom = make_trace_geometry(pos, idx, cull_disable=True)

    o = jnp.asarray(rng.uniform(-6, 6, (64, 3)).astype(np.float32))
    d_ = rng.normal(0, 1, (64, 3)).astype(np.float32)
    d_ /= np.linalg.norm(d_, axis=-1, keepdims=True)
    d = jnp.asarray(d_)
    tmin = jnp.zeros((64,))
    tmax = jnp.full((64,), 1e3)

    # tiled result must equal single-tile result
    h1 = intersect.intersect_closest_brute(geom, o, d, tmin, tmax, tile=64)
    h2 = intersect.intersect_closest_brute(geom, o, d, tmin, tmax, tile=1000)
    np.testing.assert_allclose(np.asarray(h1.t), np.asarray(h2.t), rtol=1e-6)
    hits = np.asarray(h1.is_hit)
    np.testing.assert_array_equal(
        np.asarray(h1.tri)[hits], np.asarray(h2.tri)[hits]
    )


def test_packed_attribute_fetch_is_exact():
    # the packed-table row-gather must transport attributes bit-exactly
    rng = np.random.default_rng(7)
    geom = _geom()
    o, d, tmin, tmax = _rays([0, 0.2, 5], [0, 0, -1])
    hit = intersect.intersect_closest_brute(geom, o, d, tmin, tmax)
    attrs = intersect.fetch_surface_attributes(geom, hit)
    bary = np.array([1.0 - float(hit.u[0]) - float(hit.v[0]),
                     float(hit.u[0]), float(hit.v[0])])
    n_ref = (np.asarray(geom.n0[0]) * bary[0] + np.asarray(geom.n1[0]) * bary[1]
             + np.asarray(geom.n2[0]) * bary[2])
    n_ref /= np.linalg.norm(n_ref)
    np.testing.assert_allclose(np.asarray(attrs.normal[0]), n_ref, atol=1e-6)
    assert int(attrs.material_id[0]) == int(geom.material_id[0])
