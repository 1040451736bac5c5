"""Two-level instancing + refit: instanced scenes trace identically to
flattened ones, and refits track moving instances exactly."""

import numpy as np
import jax.numpy as jnp

from vulkanraytracing_tpu.accel import lbvh, tlas
from vulkanraytracing_tpu.ops import intersect, traverse_packet
from vulkanraytracing_tpu.scene.procedural import generate_sphere
from vulkanraytracing_tpu.scene.types import make_trace_geometry


def _sphere_blas(radius=0.5):
    v, i = generate_sphere(radius, lat=6, lon=10)
    return make_trace_geometry(v, i)


def _transforms(positions, scale=1.0):
    out = []
    for p in positions:
        m = np.eye(4, dtype=np.float32) * scale
        m[3, 3] = 1.0
        m[:3, 3] = p
        out.append(m)
    return jnp.asarray(np.stack(out))


def _rays(n=256, seed=0, extent=6.0):
    rng = np.random.default_rng(seed)
    o = jnp.asarray(rng.uniform(-extent, extent, (n, 3)).astype(np.float32))
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, jnp.asarray(d), jnp.zeros((n,)), jnp.full((n,), 100.0)


def test_instances_match_brute_force():
    blas = _sphere_blas()
    soup = tlas.make_instances([blas], [0, 0, 0], material_offsets=[0, 1, 2])
    transforms = _transforms([(-2, 0, 0), (0, 0, 0), (2, 1, 0)])
    geom, bvh, order = tlas.build_tlas(soup, transforms)

    o, d, tmin, tmax = _rays()
    fast = traverse_packet.intersect_closest_packet(geom, bvh, o, d, tmin, tmax)
    brute = intersect.intersect_closest_brute(geom, o, d, tmin, tmax)
    np.testing.assert_array_equal(np.asarray(fast.is_hit), np.asarray(brute.is_hit))
    hits = np.asarray(brute.is_hit)
    np.testing.assert_allclose(
        np.asarray(fast.t)[hits], np.asarray(brute.t)[hits], rtol=1e-5
    )
    # material offsets carried per instance
    mids = np.asarray(geom.material_id[np.asarray(fast.tri)[hits]])
    assert set(mids.tolist()) <= {0, 1, 2}


def test_refit_tracks_moving_instance():
    blas = _sphere_blas()
    soup = tlas.make_instances([blas], [0, 0])
    t0 = _transforms([(-2, 0, 0), (2, 0, 0)])
    geom, bvh, order = tlas.build_tlas(soup, t0)
    soup_sorted = tlas.permute_soup(soup, order)

    # move instance 1 and refit
    t1 = _transforms([(-2, 0, 0), (2, 3, 0)])
    geom1, bvh1 = tlas.refit_tlas(bvh, soup_sorted, t1)

    o, d, tmin, tmax = _rays(seed=2)
    fast = traverse_packet.intersect_closest_packet(geom1, bvh1, o, d, tmin, tmax)
    brute = intersect.intersect_closest_brute(geom1, o, d, tmin, tmax)
    np.testing.assert_array_equal(np.asarray(fast.is_hit), np.asarray(brute.is_hit))
    hits = np.asarray(brute.is_hit)
    np.testing.assert_allclose(
        np.asarray(fast.t)[hits], np.asarray(brute.t)[hits], rtol=1e-5
    )

    # a ray aimed at the OLD position of instance 1 must now miss
    o2 = jnp.asarray(np.array([[2.0, 0.0, 5.0]], np.float32))
    d2 = jnp.asarray(np.array([[0.0, 0.0, -1.0]], np.float32))
    h = traverse_packet.intersect_closest_packet(
        geom1, bvh1, o2, d2, jnp.zeros(1), jnp.full((1,), 100.0)
    )
    assert not bool(h.is_hit[0])
    # and at the NEW position must hit
    o3 = jnp.asarray(np.array([[2.0, 3.0, 5.0]], np.float32))
    h = traverse_packet.intersect_closest_packet(
        geom1, bvh1, o3, d2, jnp.zeros(1), jnp.full((1,), 100.0)
    )
    assert bool(h.is_hit[0])


def test_mirrored_instance_winding():
    """Negative-determinant instances flip winding so backface culling
    still shows the outside of the sphere."""
    blas = _sphere_blas()
    soup = tlas.make_instances([blas], [0])
    mirror = np.eye(4, dtype=np.float32)
    mirror[0, 0] = -1.0  # mirror in X
    geom, bvh, _ = tlas.build_tlas(soup, jnp.asarray(mirror[None]))

    o = jnp.asarray(np.array([[0.0, 0.0, 5.0]], np.float32))
    d = jnp.asarray(np.array([[0.0, 0.0, -1.0]], np.float32))
    hit = traverse_packet.intersect_closest_packet(
        geom, bvh, o, d, jnp.zeros(1), jnp.full((1,), 100.0), cull_backface=True
    )
    # outside surface visible with culling ON
    assert bool(hit.is_hit[0])
    np.testing.assert_allclose(float(hit.t[0]), 4.5, atol=0.05)


def test_refit_equals_rebuild_geometry():
    """Refit geometry arrays equal a fresh world transform (same order)."""
    blas = _sphere_blas()
    soup = tlas.make_instances([blas], [0, 0])
    t0 = _transforms([(0, 0, 0), (3, 0, 0)])
    geom0, bvh0, order = tlas.build_tlas(soup, t0)
    soup_sorted = tlas.permute_soup(soup, order)
    geom_refit, _ = tlas.refit_tlas(bvh0, soup_sorted, t0)
    np.testing.assert_allclose(
        np.asarray(geom_refit.v0), np.asarray(geom0.v0), atol=1e-6
    )
