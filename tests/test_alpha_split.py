"""Two-phase alpha split (scene.alpha foliage tree) vs the full-scene
alpha loop and the brute-force oracle.

The reference resolves textured cutouts with an inline any-hit shader
during traversal (AnyHit.rahit:33-60); the TPU design splits every trace
into an opaque phase (main BVH, cutouts non-candidates via tri_flags
bit2) plus a closest-passing-cutout phase over a small foliage-only tree
(ops.trace trace_closest/trace_any docstrings).  These tests pin the
split to the oracle semantics."""

import numpy as np
import jax.numpy as jnp

from vulkanraytracing_tpu.accel import build_scene_bvh
from vulkanraytracing_tpu.config import CameraConfig, Config, TraversalMode
from vulkanraytracing_tpu.ops import trace
from vulkanraytracing_tpu.ops.texture import build_texture_pool
from vulkanraytracing_tpu.scene.types import (
    Scene,
    constant_environment,
    make_materials,
    make_trace_geometry,
    no_direct_light,
)


def _foliage_scene(n_layers=2, with_wall=True):
    """Stacked cutout quads (left half transparent, right half opaque)
    in front of an opaque wall: rays through the left halves must reach
    the wall; rays at the right halves stop at the first cutout."""
    parts = []
    img = np.zeros((16, 16, 4), np.uint8)
    img[:, :8] = [40, 160, 40, 0]     # left: transparent
    img[:, 8:] = [40, 160, 40, 255]   # right: opaque leaf
    for k in range(n_layers):
        z = 1.0 - 0.3 * k
        positions = np.array(
            [[-2, -2, z], [2, -2, z], [2, 2, z], [-2, 2, z]], np.float32
        )
        uvs = np.array([[0, 1], [1, 1], [1, 0], [0, 0]], np.float32)
        indices = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        parts.append(make_trace_geometry(
            positions, indices, uvs=uvs, material_id=0,
            cull_disable=True, opaque=False, alpha_test=True,
        ))
    if with_wall:
        positions = np.array(
            [[-3, -3, -1], [3, -3, -1], [3, 3, -1], [-3, 3, -1]], np.float32
        )
        indices = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        parts.append(make_trace_geometry(
            positions, indices, material_id=1, cull_disable=True,
        ))
    from vulkanraytracing_tpu.scene.types import concat_geometry

    geom = concat_geometry(parts)
    mats = make_materials(
        base_color_factors=[(1, 1, 1, 1), (0.8, 0.2, 0.2, 1)],
        roughness_factors=[0.9, 0.9],
        metallic_factors=[0.0, 0.0],
        base_color_textures=[0, -1],
        alpha_cutoffs=[0.5, 0.5],
    )
    return Scene(
        geometry=geom,
        materials=mats,
        environment=constant_environment((1.0, 1.0, 1.0)),
        direct_light=no_direct_light(),
        point_lights=None,
        bvh=None,
        textures=build_texture_pool([img], size=16),
    )


def _rays():
    # columns x in {-1 (transparent), +1 (opaque)}, rows sweep y
    xs, ys = np.meshgrid(
        np.array([-1.0, 1.0], np.float32),
        np.linspace(-1.5, 1.5, 8).astype(np.float32),
    )
    o = np.stack(
        [xs.ravel(), ys.ravel(), np.full(xs.size, 3.0, np.float32)], axis=1
    )
    d = np.tile(np.array([[0.0, 0.0, -1.0]], np.float32), (o.shape[0], 1))
    return (jnp.asarray(o), jnp.asarray(d),
            jnp.zeros(o.shape[0]), jnp.full((o.shape[0],), 100.0))


def _cfg(mode):
    return Config(width=8, height=8, traversal=mode,
                  camera=CameraConfig(position=(0, 0, 3), aspect_ratio=1.0))


def test_split_attached_only_with_cutouts():
    scene = build_scene_bvh(_foliage_scene())
    assert scene.alpha is not None
    assert scene.alpha.geometry.num_triangles == 4  # 2 layers x 2 tris
    # tri_map points back at alpha-test rows of the main scene
    amap = np.asarray(scene.alpha.tri_map)
    assert np.asarray(scene.geometry.alpha_test)[amap].all()

    from vulkanraytracing_tpu.scene.procedural import cornell_box_scene

    assert build_scene_bvh(cornell_box_scene()).alpha is None


def test_split_matches_brute_oracle():
    scene = build_scene_bvh(_foliage_scene(), builder="sah")
    o, d, tmin, tmax = _rays()
    cfg_o = _cfg(TraversalMode.BRUTE_FORCE)
    ref = trace.trace_closest(scene, cfg_o, o, d, tmin, tmax,
                              cull_backface=False)
    for mode in (TraversalMode.BVH, TraversalMode.BVH_PALLAS):
        got = trace.trace_closest(scene, _cfg(mode), o, d, tmin, tmax,
                                  cull_backface=False)
        np.testing.assert_array_equal(np.asarray(got.t), np.asarray(ref.t))
        hit = np.asarray(ref.is_hit)
        np.testing.assert_array_equal(
            np.asarray(got.tri)[hit], np.asarray(ref.tri)[hit]
        )
        blocked_ref = np.asarray(
            trace.trace_any(scene, cfg_o, o, d, tmin, tmax))
        blocked = np.asarray(
            trace.trace_any(scene, _cfg(mode), o, d, tmin, tmax))
        np.testing.assert_array_equal(blocked, blocked_ref)


def test_split_sees_through_many_layers():
    """>MAX_ALPHA_ITERS stacked transparent layers: the split still finds
    the wall behind (the subset loop only counts CUTOUT layers, and a
    fully transparent column commits none) — the reference's unbounded
    any-hit loop semantics (RayGen.rgen:142-176)."""
    scene = build_scene_bvh(_foliage_scene(n_layers=6))
    o, d, tmin, tmax = _rays()
    got = trace.trace_closest(scene, _cfg(TraversalMode.BVH_PALLAS),
                              o, d, tmin, tmax, cull_backface=False)
    t = np.asarray(got.t)
    xs = np.asarray(o)[:, 0]
    # transparent column reaches the wall at z=-1 (t=4); opaque column
    # stops at the first leaf quad z=1 (t=2)
    np.testing.assert_allclose(t[xs < 0], 4.0, atol=1e-4)
    np.testing.assert_allclose(t[xs > 0], 2.0, atol=1e-4)


def test_closest_merge_tie_breaks_to_lowest_global_id():
    """An opaque tri and a passing cutout at the SAME t must resolve by
    the global (t, id) rule on every backend (KERNEL_NOTES round-4)."""
    img = np.full((4, 4, 4), 255, np.uint8)  # fully opaque alpha=1 cutout
    positions = np.array(
        [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32
    )
    uvs = np.array([[0, 1], [1, 1], [1, 0], [0, 0]], np.float32)
    indices = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    cut = make_trace_geometry(positions, indices, uvs=uvs, material_id=0,
                              cull_disable=True, opaque=False,
                              alpha_test=True)
    wall = make_trace_geometry(positions, indices, material_id=1,
                               cull_disable=True)
    from vulkanraytracing_tpu.scene.types import concat_geometry

    mats = make_materials(
        base_color_factors=[(1, 1, 1, 1), (1, 1, 1, 1)],
        roughness_factors=[0.9, 0.9], metallic_factors=[0.0, 0.0],
        base_color_textures=[0, -1], alpha_cutoffs=[0.5, 0.5],
    )
    scene = Scene(
        geometry=concat_geometry([cut, wall]), materials=mats,
        environment=constant_environment((1, 1, 1)),
        direct_light=no_direct_light(), point_lights=None, bvh=None,
        textures=build_texture_pool([img], size=4),
    )
    scene = build_scene_bvh(scene, builder="sah")
    o = jnp.asarray(np.array([[0.2, 0.1, 3.0]], np.float32))
    d = jnp.asarray(np.array([[0.0, 0.0, -1.0]], np.float32))
    ref = trace.trace_closest(scene, _cfg(TraversalMode.BRUTE_FORCE), o, d,
                              jnp.zeros(1), jnp.full((1,), 9.0),
                              cull_backface=False)
    got = trace.trace_closest(scene, _cfg(TraversalMode.BVH_PALLAS), o, d,
                              jnp.zeros(1), jnp.full((1,), 9.0),
                              cull_backface=False)
    assert int(got.tri[0]) == int(ref.tri[0])
    assert float(got.t[0]) == float(ref.t[0])
