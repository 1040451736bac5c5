"""HBM-streaming chunked traversal (accel.chunks + traverse_wide8
chunked=True) against the brute-force oracle.

The chunk size is forced far below the real VMEM limit so a small soup
exercises the full multi-chunk path (K=4) in interpret mode on CPU —
same oracle pattern as test_pallas (SURVEY.md section 4 item 4).  The
soup/ray sizes match the suite-wide shared shapes (960/256) so builder
and oracle jits compile once per process."""

import jax.numpy as jnp
import numpy as np
import pytest

from vulkanraytracing_tpu.accel.chunks import build_scene_bvh_chunked
from vulkanraytracing_tpu.config import CameraConfig, Config, TraversalMode
from vulkanraytracing_tpu.ops import intersect, traverse, traverse_wide8
from vulkanraytracing_tpu.scene.procedural import triangle_soup_scene

CHUNK = 256  # 960 tris -> 4 chunks


def _rays(n, extent, seed=0):
    rng = np.random.default_rng(seed)
    o = jnp.asarray(rng.uniform(-extent, extent, (n, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    t_min = jnp.zeros((n,), jnp.float32)
    t_max = jnp.full((n,), 1e9, jnp.float32)
    return o, d, t_min, t_max


@pytest.fixture(scope="module")
def chunked_scene():
    scene = triangle_soup_scene(960, seed=3)
    out = build_scene_bvh_chunked(scene, CHUNK, builder="lbvh")
    assert out is not None, "chunked build unexpectedly fell back"
    assert out.bvh.chunks is not None
    assert out.bvh.chunks.tables.shape[0] == 4
    return out


@pytest.mark.parametrize("cull", [True])  # cull=False is covered by
# test_pallas_matches_brute; the chunked path treats the flag identically
def test_streaming_matches_brute(chunked_scene, cull):
    o, d, tmin, tmax = _rays(300, extent=11.0, seed=4)
    brute = intersect.intersect_closest_brute(
        chunked_scene.geometry, o, d, tmin, tmax, cull_backface=cull
    )
    fast = traverse_wide8.intersect_closest(
        chunked_scene.geometry, chunked_scene.bvh, o, d, tmin, tmax,
        cull_backface=cull,
    )
    np.testing.assert_array_equal(
        np.asarray(brute.is_hit), np.asarray(fast.is_hit)
    )
    hits = np.asarray(brute.is_hit)
    np.testing.assert_array_equal(
        np.asarray(brute.tri)[hits], np.asarray(fast.tri)[hits]
    )
    np.testing.assert_allclose(
        np.asarray(brute.t)[hits], np.asarray(fast.t)[hits], rtol=1e-5
    )


def test_streaming_any_hit_matches_brute(chunked_scene):
    o, d, tmin, tmax = _rays(300, extent=11.0, seed=6)
    brute = intersect.intersect_any_brute(
        chunked_scene.geometry, o, d, tmin, tmax
    )
    fast = traverse_wide8.intersect_any(
        chunked_scene.geometry, chunked_scene.bvh, o, d, tmin, tmax
    )
    np.testing.assert_array_equal(np.asarray(brute), np.asarray(fast))


def test_streaming_any_hit_phase_split_identity(chunked_scene):
    """intersect_any enables phase_split for the CHUNKED path too; the
    bitwise phase-split identity (test_pallas covers the single-table
    kernel) must also hold with n_chunks > 1, where the trip loop
    interleaves chunk-table DMAs with the split interior/leaf bodies."""
    bvh = chunked_scene.bvh
    table, nr, k = traverse_wide8._chunked_args(bvh)
    assert k == 4
    o, d, tmin, tmax = _rays(300, extent=11.0, seed=7)

    def run(ps):
        return traverse_wide8._traverse_wide8_packed(
            table, nr, bvh.tris, o, d, tmin, tmax,
            cull_backface=False, any_hit=True,
            interpret=True, n_chunks=k, any_order=True,
            phase_split=ps,
        )

    a, b = run(False), run(True)
    for fa, fb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))


def test_merged_global_bvh2_matches_brute(chunked_scene):
    """The merged BVH2 (top tree over chunk roots + offset chunk trees)
    must serve the non-streaming backends on the same scene object."""
    o, d, tmin, tmax = _rays(256, extent=11.0, seed=5)
    brute = intersect.intersect_closest_brute(
        chunked_scene.geometry, o, d, tmin, tmax
    )
    fast = traverse.intersect_closest_bvh(
        chunked_scene.geometry, chunked_scene.bvh, o, d, tmin, tmax
    )
    np.testing.assert_array_equal(
        np.asarray(brute.is_hit), np.asarray(fast.is_hit)
    )
    hits = np.asarray(brute.is_hit)
    np.testing.assert_array_equal(
        np.asarray(brute.tri)[hits], np.asarray(fast.tri)[hits]
    )


@pytest.mark.slow  # 70 s end-to-end interpret render; the kernel-level
# chunked oracles above keep streaming covered in the default suite
def test_chunked_render_matches_unchunked():
    """End-to-end: a full render through trace dispatch is identical with
    and without chunking (same geometry order is NOT guaranteed, so
    compare images, which are order-independent)."""
    from vulkanraytracing_tpu.accel import build_scene_bvh
    from vulkanraytracing_tpu.pt.render import create_render_state, render_frame
    from vulkanraytracing_tpu.scene.camera import Camera

    cam_cfg = CameraConfig(
        position=(0.0, 0.0, 28.0), aspect_ratio=1.0,
        x_fov=float(np.radians(60.0)),
    )
    # 1 bounce + K=2: the identity property is bounce- and K-invariant
    # (a 1-bounce render still routes BOTH chunked closest and chunked
    # any-hit through the full frame), and interpret-mode runtime scales
    # with traversal count; sorted-bounce coverage lives in
    # test_integrator.test_backends_render_identically
    cfg = Config(
        width=16, height=16, traversal=TraversalMode.BVH_PALLAS,
        camera=cam_cfg, max_bounce_count=1,
    )
    cam = Camera(cam_cfg).to_device()
    scene = triangle_soup_scene(512, seed=3)

    plain = build_scene_bvh(scene, builder="lbvh")
    st_a, _ = render_frame(plain, cfg, cam, create_render_state(cfg))

    chunked = build_scene_bvh(scene, builder="lbvh", chunk_tris=256)
    assert chunked.bvh.chunks is not None
    st_b, _ = render_frame(chunked, cfg, cam, create_render_state(cfg))

    a = np.asarray(st_a.accumulation)
    b = np.asarray(st_b.accumulation)
    assert np.mean(np.abs(a - b)) < 1e-3
    assert np.max(np.abs(a - b)) <= 2.5 / 255
