"""Texture pool sampling + textured materials + alpha-tested visibility."""

import numpy as np
import jax.numpy as jnp

from vulkanraytracing_tpu.config import CameraConfig, Config, TraversalMode
from vulkanraytracing_tpu.core import math3d
from vulkanraytracing_tpu.ops import trace
from vulkanraytracing_tpu.ops.texture import (
    WRAP_CLAMP,
    WRAP_REPEAT,
    build_texture_pool,
    sample_pool,
)
from vulkanraytracing_tpu.pt.render import create_render_state, render_frame
from vulkanraytracing_tpu.scene.camera import Camera
from vulkanraytracing_tpu.scene.types import (
    Scene,
    constant_environment,
    make_materials,
    make_trace_geometry,
    no_direct_light,
)


def _pool(images, wraps=None, size=8):
    return build_texture_pool(images, wraps, size=size)


def test_sample_pool_solid_colors():
    red = np.zeros((8, 8, 4), np.uint8)
    red[..., 0] = 255
    red[..., 3] = 255
    blue = np.zeros((8, 8, 4), np.uint8)
    blue[..., 2] = 255
    blue[..., 3] = 255
    pool = _pool([red, blue])
    uv = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (16, 2)).astype(np.float32))
    r = np.asarray(sample_pool(pool, jnp.zeros(16, jnp.int32), uv))
    b = np.asarray(sample_pool(pool, jnp.ones(16, jnp.int32), uv))
    np.testing.assert_allclose(r[:, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(b[:, 2], 1.0, atol=1e-6)


def test_wrap_modes():
    # gradient texture: left half dark, right half bright
    img = np.zeros((8, 8, 4), np.uint8)
    img[:, 4:, :3] = 200
    img[..., 3] = 255
    pool_rep = _pool([img], wraps=[(WRAP_REPEAT, WRAP_REPEAT)])
    pool_clamp = _pool([img], wraps=[(WRAP_CLAMP, WRAP_CLAMP)])
    # u = 1.2 wraps to 0.2 (dark) under repeat, clamps to 1 (bright) under clamp
    uv = jnp.asarray(np.array([[1.2, 0.5]], np.float32))
    tid = jnp.zeros(1, jnp.int32)
    rep = float(np.asarray(sample_pool(pool_rep, tid, uv))[0, 0])
    cl = float(np.asarray(sample_pool(pool_clamp, tid, uv))[0, 0])
    assert rep < 0.3 and cl > 0.5, (rep, cl)


def _textured_quad_scene(alpha_checker=False):
    """A z=0 quad with uv in [0,1], one base color texture."""
    positions = np.array(
        [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32
    )
    uvs = np.array([[0, 1], [1, 1], [1, 0], [0, 0]], np.float32)
    indices = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    geom = make_trace_geometry(
        positions, indices, uvs=uvs,
        cull_disable=True,
        opaque=not alpha_checker,
        alpha_test=alpha_checker,
    )
    # left half green opaque; right half red, transparent when alpha_checker
    img = np.zeros((16, 16, 4), np.uint8)
    img[:, :8] = [0, 255, 0, 255]
    img[:, 8:] = [255, 0, 0, 0 if alpha_checker else 255]
    pool = _pool([img], size=16)
    mats = make_materials(
        base_color_factors=[(1.0, 1.0, 1.0, 1.0)],
        roughness_factors=[1.0],
        metallic_factors=[0.0],
        base_color_textures=[0],
        alpha_cutoffs=[0.5],
    )
    return Scene(
        geometry=geom,
        materials=mats,
        environment=constant_environment((1.0, 1.0, 1.0)),
        direct_light=no_direct_light(),
        point_lights=None,
        bvh=None,
        textures=pool,
    )


def _cfg():
    return Config(
        width=32, height=32, traversal=TraversalMode.BRUTE_FORCE,
        parity_quantization=False,
        camera=CameraConfig(position=(0.0, 0.0, 3.0), aspect_ratio=1.0),
    )


def test_textured_base_color_renders():
    from vulkanraytracing_tpu.pt.render import render_progressive

    scene = _textured_quad_scene()
    cfg = _cfg()
    cam = Camera(cfg.camera).to_device()
    st, _ = render_progressive(scene, cfg, cam, spp=8)
    img = np.asarray(st.accumulation)
    # quad spans roughly columns 11..21 at this fov; left half green, right red
    left = img[16, 13]
    right = img[16, 18]
    assert left[1] > left[0], left
    assert right[0] > right[1], right


def test_alpha_cutout_visibility():
    scene = _textured_quad_scene(alpha_checker=True)
    cfg = _cfg()
    # rays straight at the quad: right half (alpha 0) must pass through
    o = jnp.asarray(np.array([[0.5, 0.0, 3.0], [-0.5, 0.0, 3.0]], np.float32))
    d = jnp.asarray(np.tile([[0.0, 0.0, -1.0]], (2, 1)).astype(np.float32))
    tmin = jnp.zeros(2)
    tmax = jnp.full((2,), 100.0)
    hit = trace.trace_closest(scene, cfg, o, d, tmin, tmax, cull_backface=False)
    is_hit = np.asarray(hit.is_hit)
    assert not is_hit[0], "transparent texel should not hit"
    assert is_hit[1], "opaque texel should hit"

    blocked = np.asarray(trace.trace_any(scene, cfg, o, d, tmin, tmax))
    assert not blocked[0] and blocked[1]


def test_alpha_cutout_through_bvh():
    from vulkanraytracing_tpu.accel import build_scene_bvh

    scene = build_scene_bvh(_textured_quad_scene(alpha_checker=True))
    cfg = _cfg().replace(traversal=TraversalMode.BVH)
    o = jnp.asarray(np.array([[0.5, 0.0, 3.0], [-0.5, 0.0, 3.0]], np.float32))
    d = jnp.asarray(np.tile([[0.0, 0.0, -1.0]], (2, 1)).astype(np.float32))
    hit = trace.trace_closest(
        scene, cfg, o, d, jnp.zeros(2), jnp.full((2,), 100.0), cull_backface=False
    )
    is_hit = np.asarray(hit.is_hit)
    assert not is_hit[0] and is_hit[1]


def test_mip_chain_native_resolutions():
    # non-square, non-power-of-two native sizes are preserved at level 0
    img_a = np.zeros((24, 48, 4), np.uint8)
    img_b = np.zeros((8, 8, 4), np.uint8)
    pool = build_texture_pool([img_a, img_b])
    assert int(pool.width[0, 0]) == 48 and int(pool.height[0, 0]) == 24
    assert int(pool.width[1, 0]) == 8 and int(pool.height[1, 0]) == 8
    # chains shrink to 1x1 and clamp past their end
    w = np.asarray(pool.width)
    assert (w[:, -1] >= 1).all()
    assert int(pool.width[0, 1]) == 24 and int(pool.height[0, 1]) == 12


def test_trilinear_footprint_selects_coarse_mip():
    # checkerboard: base level alternates 0/255, the 1x1 tail mip is ~127
    img = np.zeros((64, 64, 4), np.uint8)
    img[::2, :] = 255
    img[..., 3] = 255
    pool = build_texture_pool([img])
    tid = jnp.zeros(4, jnp.int32)
    # texel centers of even rows (value 255) — bilinear == raw texel
    uv = jnp.asarray(np.full((4, 2), (22 + 0.5) / 64.0, np.float32))
    sharp = np.asarray(sample_pool(pool, tid, uv, jnp.full((4,), 1e-6)))
    blurred = np.asarray(sample_pool(pool, tid, uv, jnp.full((4,), 1.0)))
    # huge footprint -> bottom mip -> the global mean; tiny -> raw texels
    assert abs(float(blurred[0, 0]) - 0.5) < 0.1, blurred[0, 0]
    assert (sharp[:, 0] > 0.9).all(), sharp[:, 0]


def test_base_level_matches_unfiltered():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, size=(16, 16, 4), dtype=np.uint8)
    pool = build_texture_pool([img])
    # sample exactly at texel centers: bilinear == the texel value
    xs = (np.arange(16) + 0.5) / 16.0
    uv = jnp.asarray(np.stack([xs, np.full(16, (4 + 0.5) / 16.0)], axis=1).astype(np.float32))
    out = np.asarray(sample_pool(pool, jnp.zeros(16, jnp.int32), uv))
    np.testing.assert_allclose(out, img[4, :, :] / 255.0, atol=1e-6)


def test_aniso_footprint_preserves_minor_axis_detail():
    """AnisoFootprint (ref maxAnisotropy 16, VulkanConfig.hpp:44): with a
    footprint wide in u and narrow in v, N-tap sampling keeps the lod at
    the minor axis, preserving v-axis stripes that isotropic trilinear
    (lod from the MAX axis) blurs to the global mean."""
    from vulkanraytracing_tpu.ops.texture import AnisoFootprint

    img = np.zeros((64, 64, 4), np.uint8)
    img[::2, :] = 255  # horizontal stripes: detail along v only
    img[..., 3] = 255
    pool = build_texture_pool([img])
    n = 4
    tid = jnp.zeros(n, jnp.int32)
    # texel centers of even rows (value 255)
    uv = jnp.asarray(np.full((n, 2), (22 + 0.5) / 64.0, np.float32))
    duvdx = jnp.asarray(np.tile([0.25, 0.0], (n, 1)), jnp.float32)  # wide u
    duvdy = jnp.asarray(np.tile([0.0, 1e-6], (n, 1)), jnp.float32)  # sharp v
    tri = np.asarray(sample_pool(pool, tid, uv, jnp.full((n,), 0.25)))
    aniso = np.asarray(
        sample_pool(pool, tid, uv, AnisoFootprint(duvdx, duvdy, 16))
    )
    assert abs(float(tri[0, 0]) - 0.5) < 0.1, tri[0, 0]     # blurred
    assert (aniso[:, 0] > 0.9).all(), aniso[:, 0]           # preserved

    # isotropic footprint: the aniso path reduces to trilinear
    iso_fp = jnp.full((n,), 0.1)
    d_iso = jnp.asarray(np.tile([0.1, 0.0], (n, 1)), jnp.float32)
    d_iso2 = jnp.asarray(np.tile([0.0, 0.1], (n, 1)), jnp.float32)
    a = np.asarray(sample_pool(pool, tid, uv, AnisoFootprint(d_iso, d_iso2, 4)))
    b = np.asarray(sample_pool(pool, tid, uv, iso_fp * 0.64))
    np.testing.assert_allclose(a, b, atol=0.08)
