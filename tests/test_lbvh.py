"""LBVH invariants + traversal equivalence against brute force
(SURVEY.md section 4 unit-test list).

Wall-time note: this box has ONE cpu core, so XLA compile time dominates
the suite.  All soups share one triangle count and all ray sets one count
so the builder/traversal jits compile once and are reused across tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from vulkanraytracing_tpu.accel import lbvh
from vulkanraytracing_tpu.ops import intersect, traverse, traverse_packet
from vulkanraytracing_tpu.scene.procedural import (
    cornell_box_scene,
    triangle_soup_scene,
)
from vulkanraytracing_tpu.scene.types import make_trace_geometry


def _random_rays(n, extent, seed=0):
    rng = np.random.default_rng(seed)
    o = jnp.asarray(rng.uniform(-extent, extent, (n, 3)).astype(np.float32))
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, jnp.asarray(d), jnp.zeros((n,)), jnp.full((n,), 1e3)


def test_morton_codes_are_sorted_spatially():
    pts = jnp.asarray(
        np.array([[0, 0, 0], [1, 1, 1], [0.1, 0.1, 0.1]], np.float32)
    )
    lo = jnp.zeros(3)
    hi = jnp.ones(3)
    codes = np.asarray(lbvh.morton_codes(pts, lo, hi))
    assert codes[0] < codes[2] < codes[1]


def _walk_leaves(child, root=0):
    """Collect leaf (start, count) ranges reachable from the root."""
    out = []
    stack = [root]
    seen = set()
    while stack:
        node = stack.pop()
        assert node not in seen, "cycle in BVH"
        seen.add(node)
        for c in child[node]:
            if c < 0:
                packed = ~c
                out.append((packed >> 4, packed & 15))
            else:
                stack.append(int(c))
    return out


def test_leaves_partition_triangles():
    """Leaf ranges reachable from the root exactly tile [0, T) — every
    triangle in exactly one leaf (the collapse-correctness invariant)."""
    scene = triangle_soup_scene(960, seed=1)
    geom, bvh = lbvh.build_bvh(scene.geometry)
    n = geom.num_triangles
    leaves = _walk_leaves(np.asarray(bvh.child_index))
    covered = np.zeros(n, bool)
    for start, count in leaves:
        assert count >= 1
        assert not covered[start : start + count].any(), "overlap"
        covered[start : start + count] = True
    assert covered.all()


def test_parent_aabb_contains_children():
    scene = triangle_soup_scene(960, seed=2)
    geom, bvh = lbvh.build_bvh(scene.geometry)
    nodes = np.asarray(bvh.nodes)
    child = np.asarray(bvh.child_index)
    box_lo = {c: nodes[:, 6 * c : 6 * c + 3] for c in (0, 1)}
    box_hi = {c: nodes[:, 6 * c + 3 : 6 * c + 6] for c in (0, 1)}
    for i in range(child.shape[0]):
        for c in range(2):
            ci = child[i, c]
            if ci >= 0:
                inner_lo = np.minimum(box_lo[0][ci], box_lo[1][ci])
                inner_hi = np.maximum(box_hi[0][ci], box_hi[1][ci])
                assert np.all(box_lo[c][i] <= inner_lo + 1e-6)
                assert np.all(box_hi[c][i] >= inner_hi - 1e-6)


@pytest.mark.parametrize("cull", [True, False])
@pytest.mark.parametrize("backend", ["per_ray", "packet"])
def test_traversal_matches_brute_force(cull, backend):
    scene = triangle_soup_scene(960, seed=3)
    geom, bvh = lbvh.build_bvh(scene.geometry)
    o, d, tmin, tmax = _random_rays(256, extent=11.0, seed=4)

    brute = intersect.intersect_closest_brute(
        geom, o, d, tmin, tmax, cull_backface=cull
    )
    if backend == "per_ray":
        fast = traverse.intersect_closest_bvh(
            geom, bvh, o, d, tmin, tmax, cull_backface=cull
        )
    else:
        fast = traverse_packet.intersect_closest_packet(
            geom, bvh, o, d, tmin, tmax, cull_backface=cull
        )
    np.testing.assert_array_equal(np.asarray(brute.is_hit), np.asarray(fast.is_hit))
    hits = np.asarray(brute.is_hit)
    np.testing.assert_allclose(
        np.asarray(fast.t)[hits], np.asarray(brute.t)[hits], rtol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(fast.tri)[hits], np.asarray(brute.tri)[hits]
    )


@pytest.mark.parametrize("backend", ["per_ray", "packet"])
def test_any_hit_matches_brute_force(backend):
    scene = triangle_soup_scene(960, seed=5)
    geom, bvh = lbvh.build_bvh(scene.geometry)
    o, d, tmin, tmax = _random_rays(256, extent=11.0, seed=6)
    brute = intersect.intersect_any_brute(geom, o, d, tmin, tmax)
    if backend == "per_ray":
        fast = traverse.intersect_any_bvh(geom, bvh, o, d, tmin, tmax)
    else:
        fast = traverse_packet.intersect_any_packet(geom, bvh, o, d, tmin, tmax)
    np.testing.assert_array_equal(np.asarray(brute), np.asarray(fast))


def test_traversal_on_cornell_box():
    scene = cornell_box_scene()
    geom, bvh = lbvh.build_bvh(scene.geometry)
    o, d, tmin, tmax = _random_rays(256, extent=0.9, seed=7)
    brute = intersect.intersect_closest_brute(geom, o, d, tmin, tmax, cull_backface=True)
    for fast in (
        traverse.intersect_closest_bvh(geom, bvh, o, d, tmin, tmax, cull_backface=True),
        traverse_packet.intersect_closest_packet(geom, bvh, o, d, tmin, tmax, cull_backface=True),
    ):
        np.testing.assert_array_equal(
            np.asarray(brute.is_hit), np.asarray(fast.is_hit)
        )
        hits = np.asarray(brute.is_hit)
        np.testing.assert_allclose(
            np.asarray(fast.t)[hits], np.asarray(brute.t)[hits], rtol=1e-5
        )


def test_single_triangle_bvh():
    positions = np.array([[-1, -1, 0], [1, -1, 0], [0, 1, 0]], np.float32)
    geom = make_trace_geometry(positions, np.array([[0, 1, 2]]))
    geom, bvh = lbvh.build_bvh(geom)
    o = jnp.asarray(np.array([[0, 0, 5]], np.float32))
    d = jnp.asarray(np.array([[0, 0, -1]], np.float32))
    for fn in (traverse.intersect_closest_bvh, traverse_packet.intersect_closest_packet):
        hit = fn(geom, bvh, o, d, jnp.zeros((1,)), jnp.full((1,), 100.0))
        assert bool(hit.is_hit[0])
        np.testing.assert_allclose(float(hit.t[0]), 5.0, rtol=1e-5)


def test_empty_window_rays_never_hit():
    scene = triangle_soup_scene(960, seed=8)
    geom, bvh = lbvh.build_bvh(scene.geometry)
    o, d, tmin, _ = _random_rays(256, extent=5.0, seed=9)
    tmax = jnp.zeros((256,))  # dead lanes
    for fn in (traverse.intersect_closest_bvh, traverse_packet.intersect_closest_packet):
        hit = fn(geom, bvh, o, d, tmin, tmax)
        assert not bool(np.asarray(hit.is_hit).any())


def test_nonuniform_leaf_sizes():
    # traversal unrolls lbvh.LEAF_SIZE triangle tests, so builds may use any
    # leaf size up to that bound
    for leaf_size in (1, 4):
        scene = triangle_soup_scene(960, seed=10)
        geom, bvh = lbvh.build_bvh(scene.geometry, leaf_size=leaf_size)
        o, d, tmin, tmax = _random_rays(256, extent=11.0, seed=11)
        brute = intersect.intersect_closest_brute(geom, o, d, tmin, tmax)
        fast = traverse.intersect_closest_bvh(geom, bvh, o, d, tmin, tmax)
        np.testing.assert_array_equal(
            np.asarray(brute.is_hit), np.asarray(fast.is_hit)
        )


def test_bvh8_native_collapse_matches_python():
    """The C++ collapse (native/bvh8_collapse.cpp) must be byte-identical
    to the Python oracle, including area-sort tie-breaking."""
    import numpy as np
    import pytest

    from vulkanraytracing_tpu.accel import bvh8 as bvh8_mod
    from vulkanraytracing_tpu.accel.sah import build_bvh_sah
    from vulkanraytracing_tpu.scene.procedural import triangle_soup_scene

    if bvh8_mod._load_library() is None:
        pytest.skip("no native toolchain")
    geom, bvh = build_bvh_sah(triangle_soup_scene(5000, seed=9).geometry)
    native = bvh8_mod.collapse_bvh8(bvh)
    oracle = bvh8_mod.collapse_bvh8(bvh, force_python=True)
    np.testing.assert_array_equal(
        np.asarray(native.nodes8), np.asarray(oracle.nodes8)
    )
    np.testing.assert_array_equal(
        np.asarray(native.child8), np.asarray(oracle.child8)
    )
