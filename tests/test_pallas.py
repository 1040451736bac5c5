"""Pallas traversal kernel vs brute force — runs in interpret mode on CPU
(SURVEY.md section 4 item 4: every Pallas kernel must pass interpret=True
equality against a pure-jnp reference so CI needs no TPU)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from vulkanraytracing_tpu.accel import lbvh
from vulkanraytracing_tpu.accel.sah import build_bvh_sah
from vulkanraytracing_tpu.ops import (
    intersect,
    traverse_pallas,
    traverse_subpacket,
    traverse_wide,
    traverse_wide8,
)
from vulkanraytracing_tpu.scene.procedural import (
    cornell_box_scene,
    triangle_soup_scene,
)

KERNELS = {
    "shared": traverse_pallas,
    "subpacket": traverse_subpacket,
    "wide": traverse_wide,
    "wide8": traverse_wide8,
}


def _rays(n, extent, seed=0):
    rng = np.random.default_rng(seed)
    o = jnp.asarray(rng.uniform(-extent, extent, (n, 3)).astype(np.float32))
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, jnp.asarray(d), jnp.zeros((n,)), jnp.full((n,), 1e3)


@pytest.mark.parametrize("kernel", sorted(KERNELS))
@pytest.mark.parametrize("builder", ["lbvh", "sah"])
@pytest.mark.parametrize("cull", [True, False])
def test_pallas_matches_brute(kernel, builder, cull):
    # interpret-mode runs cost 5-27 s EACH on this 1-core box (jax TRACE
    # time dominates — the persistent compile cache can't help tracing);
    # the default (pre-commit) suite keeps one combo per axis value —
    # (True, lbvh) and (False, sah) — for EVERY kernel generation and
    # defers the two redundant cross-combos to VRT_SLOW=1 (CI) runs.
    if (
        not os.environ.get("VRT_SLOW")
        and (cull, builder) in {(False, "lbvh"), (True, "sah")}
    ):
        pytest.skip("redundant cull/builder combo; VRT_SLOW=1 runs it")
    scene = triangle_soup_scene(960, seed=3)
    if builder == "sah":
        geom, bvh = build_bvh_sah(scene.geometry)
    else:
        geom, bvh = lbvh.build_bvh(scene.geometry)
    o, d, tmin, tmax = _rays(300, extent=11.0, seed=4)  # non-multiple of 128/1024

    brute = intersect.intersect_closest_brute(
        geom, o, d, tmin, tmax, cull_backface=cull
    )
    fast = KERNELS[kernel].intersect_closest(
        geom, bvh, o, d, tmin, tmax, cull_backface=cull
    )
    np.testing.assert_array_equal(np.asarray(brute.is_hit), np.asarray(fast.is_hit))
    hits = np.asarray(brute.is_hit)
    np.testing.assert_allclose(
        np.asarray(fast.t)[hits], np.asarray(brute.t)[hits], rtol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(fast.tri)[hits], np.asarray(brute.tri)[hits]
    )


@pytest.mark.parametrize("kernel", sorted(KERNELS))
def test_pallas_any_hit_matches_brute(kernel):
    scene = triangle_soup_scene(960, seed=5)
    geom, bvh = lbvh.build_bvh(scene.geometry)
    o, d, tmin, tmax = _rays(300, extent=11.0, seed=6)
    brute = intersect.intersect_any_brute(geom, o, d, tmin, tmax)
    fast = KERNELS[kernel].intersect_any(geom, bvh, o, d, tmin, tmax)
    np.testing.assert_array_equal(np.asarray(brute), np.asarray(fast))


@pytest.mark.parametrize("kernel", sorted(KERNELS))
def test_pallas_cornell_and_dead_lanes(kernel):
    scene = cornell_box_scene()
    geom, bvh = build_bvh_sah(scene.geometry)
    o, d, tmin, tmax = _rays(300, extent=0.9, seed=7)
    tmax = tmax.at[::3].set(0.0)  # dead lanes interleaved
    brute = intersect.intersect_closest_brute(geom, o, d, tmin, tmax)
    fast = KERNELS[kernel].intersect_closest(geom, bvh, o, d, tmin, tmax)
    np.testing.assert_array_equal(np.asarray(brute.is_hit), np.asarray(fast.is_hit))


@pytest.mark.parametrize(
    "any_hit,leaf_den",
    [
        (True, 1),  # production any-hit config — always runs
        pytest.param(False, 2, marks=pytest.mark.slow),  # non-default
        # closest/den2 corner; 15 s of interpret time, CI-only
    ],
)
def test_phase_split_matches_combined(any_hit, leaf_den):
    """The phase-split body (interior-only trips skip the leaf block and
    vice versa; production default for any-hit) is bitwise identical to
    the combined body on every output."""
    scene = triangle_soup_scene(960, seed=3)
    geom, bvh = lbvh.build_bvh(scene.geometry)
    bvh = traverse_wide8._with_bvh8(bvh)
    o, d, tmin, tmax = _rays(300, extent=11.0, seed=4)
    table, nr = traverse_wide8._unified_table8(bvh)

    def run(ps):
        return traverse_wide8._traverse_wide8_packed(
            table, nr, bvh.tris, o, d, tmin, tmax,
            cull_backface=not any_hit, any_hit=any_hit,
            interpret=True, any_order=any_hit,
            phase_split=ps, leaf_den=leaf_den if ps else 1,
        )

    a, b = run(False), run(True)
    for fa, fb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))


@pytest.mark.parametrize("any_hit", [False, True])
def test_pair_mode_matches_single(any_hit):
    """Two-wave software-pipelined blocks (pair=True: both waves share a
    (2W, 128) block via _RV row views so their fetches hide under each
    other's math) are bitwise identical to the single-wave kernel on
    every output, closest and production-shaped any-hit alike."""
    scene = triangle_soup_scene(960, seed=3)
    geom, bvh = lbvh.build_bvh(scene.geometry)
    bvh = traverse_wide8._with_bvh8(bvh)
    o, d, tmin, tmax = _rays(300, extent=11.0, seed=4)
    table, nr = traverse_wide8._unified_table8(bvh)

    def run(pair):
        return traverse_wide8._traverse_wide8_packed(
            table, nr, bvh.tris, o, d, tmin, tmax,
            cull_backface=not any_hit, any_hit=any_hit,
            interpret=True, any_order=any_hit, phase_split=any_hit,
            pair=pair,
        )

    a, b = run(False), run(True)
    for fa, fb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))


@pytest.mark.parametrize(
    "any_hit",
    [
        pytest.param(False, marks=pytest.mark.slow),  # closest drain:
        # 24 s of interpret time, CI-only (the production-shaped any-hit
        # combo below keeps drain+resume covered in the default suite)
        True,
    ],
)
def test_drain_compact_matches_single_run(any_hit):
    """Drain+compact rounds (trip cap + survivors-first row packing +
    resume, the production occupancy fix) are bitwise identical to the
    uncapped single run on every output."""
    scene = triangle_soup_scene(960, seed=3)
    geom, bvh = lbvh.build_bvh(scene.geometry)
    bvh = traverse_wide8._with_bvh8(bvh)
    o, d, tmin, tmax = _rays(300, extent=11.0, seed=4)
    table, nr = traverse_wide8._unified_table8(bvh)

    def run(caps):
        return traverse_wide8._traverse_wide8_packed(
            table, nr, bvh.tris, o, d, tmin, tmax,
            cull_backface=not any_hit, any_hit=any_hit,
            any_order=any_hit, phase_split=any_hit,
            interpret=True, drain_caps=caps,
        )

    # caps chosen so round 1 leaves survivors on this scene (union trips
    # per row measured ~60-200 here), exercising the resume rounds
    a, b = run(()), run((24, 96))
    for fa, fb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))


@pytest.mark.parametrize(
    "cull",
    # woop leaf tests are OPT-IN (VRT_WOOP=1, default off): both params
    # live in the VRT_SLOW suite; the default suite covers the default
    # MT leaf path everywhere
    [pytest.param(True, marks=pytest.mark.slow),
     pytest.param(False, marks=pytest.mark.slow)],
)
def test_woop_leaf_variant_matches_brute(cull):
    """The plane-based leaf test (traverse_wide8 woop=True) agrees with the
    MT brute-force oracle up to f32 arithmetic: same hit set, t within
    tolerance (plane and MT formulations differ in ULPs, so exact equality
    is not expected — unlike the default MT leaf path)."""
    scene = triangle_soup_scene(960, seed=3)
    geom, bvh = lbvh.build_bvh(scene.geometry)
    bvh = traverse_wide8._with_bvh8(bvh)
    o, d, tmin, tmax = _rays(300, extent=11.0, seed=4)

    table, nr = traverse_wide8._unified_table8(bvh, woop=True)
    fast = traverse_wide8._traverse_wide8_packed(
        table, nr, bvh.tris, o, d, tmin, tmax,
        cull_backface=cull, any_hit=False, interpret=True, woop=True,
    )
    brute = intersect.intersect_closest_brute(
        geom, o, d, tmin, tmax, cull_backface=cull
    )
    np.testing.assert_array_equal(
        np.asarray(brute.is_hit), np.asarray(fast.is_hit)
    )
    hits = np.asarray(brute.is_hit)
    np.testing.assert_allclose(
        np.asarray(brute.t)[hits], np.asarray(fast.t)[hits],
        rtol=1e-4, atol=1e-5,
    )
    u, v = np.asarray(fast.u)[hits], np.asarray(fast.v)[hits]
    assert (u >= -1e-3).all() and (v >= -1e-3).all()
    assert (u + v <= 1.0 + 1e-3).all()
    np.testing.assert_array_equal(
        np.asarray(brute.backface)[hits], np.asarray(fast.backface)[hits]
    )


def _tie_scene():
    """Geometry with EXACT closest-hit ties: the unit quad at z=0 appears
    three times with identical vertex ordering (identical v0/e1/e2 rows =>
    bitwise-identical t/u/v for every ray), plus offset quads so the tree
    has real structure.  Equal-t ties must resolve to the LOWEST triangle
    id on every backend — the cornell 512^2 parity FAIL was wall-corner
    ties resolving by traversal order instead (tools/ab/nee_tap_probe.py)."""
    from vulkanraytracing_tpu.scene.types import make_trace_geometry

    quad_v = np.array(
        [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32
    )
    quad_i = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    vs, idx = [], []
    # three coincident copies interleaved with displaced decoys
    for k, dz in enumerate([0.0, 3.0, 0.0, -3.0, 0.0, 6.0]):
        v = quad_v + np.array([0, 0, dz], np.float32)
        vs.append(v)
        idx.append(quad_i + 4 * k)
    positions = np.concatenate(vs)
    indices = np.concatenate(idx)
    return make_trace_geometry(positions, indices, cull_disable=True)


@pytest.mark.parametrize("kernel", [
    pytest.param("wide", marks=pytest.mark.slow),  # gen-3 kernel:
    # tie-break/window logic is shared with wide8; production
    # coverage stays default, the non-default generation moves to
    # the VRT_SLOW suite (trace time is the suite bottleneck)
    "wide8", "packet",
])
def test_closest_tie_breaks_to_lowest_id(kernel):
    from vulkanraytracing_tpu.ops import traverse_packet

    geom = _tie_scene()
    geom, bvh = build_bvh_sah(geom)
    n = 128
    rng = np.random.default_rng(11)
    # rays from +z toward the triple-coincident quad (plus jittered dirs)
    o = np.zeros((n, 3), np.float32)
    o[:, 0] = rng.uniform(-0.8, 0.8, n)
    o[:, 1] = rng.uniform(-0.8, 0.8, n)
    o[:, 2] = 2.0
    d = np.zeros((n, 3), np.float32)
    d[:, 2] = -1.0
    d[:, 0] = rng.uniform(-0.05, 0.05, n)
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    tmin, tmax = jnp.zeros((n,)), jnp.full((n,), 1e3)

    brute = intersect.intersect_closest_brute(
        geom, o, d, tmin, tmax, cull_backface=False
    )
    if kernel == "packet":
        fast = traverse_packet.intersect_closest_packet(
            geom, bvh, o, d, tmin, tmax, cull_backface=False
        )
    else:
        if kernel == "wide8":
            bvh = traverse_wide8._with_bvh8(bvh)
        fast = KERNELS[kernel].intersect_closest(
            geom, bvh, o, d, tmin, tmax, cull_backface=False
        )
    hits = np.asarray(brute.is_hit)
    assert hits.all()  # every ray hits the quad stack
    # the WINNING TRIANGLE ID must match bitwise, not just t: equal-t
    # ties resolve to the lowest id (brute argmin semantics)
    np.testing.assert_array_equal(
        np.asarray(fast.tri)[hits], np.asarray(brute.tri)[hits]
    )
    np.testing.assert_array_equal(
        np.asarray(fast.t)[hits], np.asarray(brute.t)[hits]
    )


@pytest.mark.parametrize("kernel", [
    pytest.param("wide", marks=pytest.mark.slow),  # gen-3 kernel:
    # tie-break/window logic is shared with wide8; production
    # coverage stays default, the non-default generation moves to
    # the VRT_SLOW suite (trace time is the suite bottleneck)
    "wide8", "packet",
])
def test_closest_tmax_boundary_inclusive(kernel):
    """A hit EXACTLY at t_max commits (brute tests t <= t_max; the kernels
    formerly pruned with strict < against the best-t ceiling)."""
    from vulkanraytracing_tpu.ops import traverse_packet

    geom = _tie_scene()
    geom, bvh = build_bvh_sah(geom)
    n = 128
    o = np.zeros((n, 3), np.float32)
    o[:, 2] = 2.0
    o[:, 0] = np.linspace(-0.8, 0.8, n, dtype=np.float32)
    d = np.zeros((n, 3), np.float32)
    d[:, 2] = -1.0
    o, d = jnp.asarray(o), jnp.asarray(d)
    tmin = jnp.zeros((n,))
    probe = intersect.intersect_closest_brute(
        geom, o, d, tmin, jnp.full((n,), 1e3), cull_backface=False
    )
    tmax = probe.t  # exact hit distance becomes the window edge
    brute = intersect.intersect_closest_brute(
        geom, o, d, tmin, tmax, cull_backface=False
    )
    assert np.asarray(brute.is_hit).all()
    if kernel == "packet":
        fast = traverse_packet.intersect_closest_packet(
            geom, bvh, o, d, tmin, tmax, cull_backface=False
        )
    else:
        if kernel == "wide8":
            bvh = traverse_wide8._with_bvh8(bvh)
        fast = KERNELS[kernel].intersect_closest(
            geom, bvh, o, d, tmin, tmax, cull_backface=False
        )
    np.testing.assert_array_equal(
        np.asarray(brute.is_hit), np.asarray(fast.is_hit)
    )
