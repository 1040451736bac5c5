"""Environment subsystem tests: panorama mapping, cube round trips, sun
extraction, IBL integrals, HDR codec."""

import numpy as np
import jax.numpy as jnp

from vulkanraytracing_tpu.app import hdr
from vulkanraytracing_tpu.core import math3d
from vulkanraytracing_tpu.env import ibl, sun
from vulkanraytracing_tpu.env.panorama import (
    cube_direction,
    cube_face_uv,
    panorama_to_cube,
    panorama_uv,
    sample_cube,
    sample_environment,
)
from vulkanraytracing_tpu.scene.types import Environment, constant_environment


def _sky_panorama(h=64, sun_y=10, sun_x=96, sun_value=100.0):
    """Dim sky with one bright block."""
    pano = np.full((h, 2 * h, 3), 0.1, np.float32)
    pano[sun_y : sun_y + 8, sun_x : sun_x + 8] = sun_value
    return Environment(panorama=jnp.asarray(pano))


def test_panorama_uv_poles_and_equator():
    up = jnp.array([[0.0, 1.0, 0.0]])
    down = jnp.array([[0.0, -1.0, 0.0]])
    fwd = jnp.array([[1.0, 0.0, 0.0]])
    assert abs(float(panorama_uv(up)[0, 1]) - 0.0) < 1e-3   # up = top row
    assert abs(float(panorama_uv(down)[0, 1]) - 1.0) < 1e-3
    assert abs(float(panorama_uv(fwd)[0, 1]) - 0.5) < 1e-3


def test_constant_environment_samples_constant():
    env = constant_environment((0.2, 0.4, 0.8))
    d = math3d.normalize(jnp.asarray(np.random.default_rng(0).normal(size=(32, 3)).astype(np.float32)))
    out = np.asarray(sample_environment(env, d))
    np.testing.assert_allclose(out, np.tile([[0.2, 0.4, 0.8]], (32, 1)), rtol=1e-5)


def test_cube_face_uv_inverts_cube_direction():
    rng = np.random.default_rng(1)
    for face in range(6):
        uv = jnp.asarray(rng.uniform(0.05, 0.95, (16, 2)).astype(np.float32))
        d = cube_direction(face, uv)
        f2, uv2 = cube_face_uv(d)
        assert np.all(np.asarray(f2) == face)
        np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=1e-5)


def test_panorama_to_cube_and_sample_cube_roundtrip():
    env = constant_environment((1.0, 2.0, 3.0), size=16)
    cube = panorama_to_cube(env, 16)
    d = math3d.normalize(jnp.asarray(
        np.random.default_rng(2).normal(size=(64, 3)).astype(np.float32)))
    out = np.asarray(sample_cube(cube, d))
    np.testing.assert_allclose(out, np.tile([[1.0, 2.0, 3.0]], (64, 1)), rtol=1e-4)


def test_sun_extraction_finds_bright_block():
    env = _sky_panorama()
    light = sun.extract_direct_light(env.panorama)
    d = np.asarray(light.direction[:3])
    # light direction points FROM the sun toward the scene (negated),
    # so -direction should sample back into the bright block
    uv = np.asarray(panorama_uv(jnp.asarray(-d)[None]))[0]
    px = uv[0] * 128
    py = uv[1] * 64
    assert 96 - 8 <= px <= 96 + 16, px
    assert 10 - 8 <= py <= 10 + 16, py
    # clamped to max luminance 25
    lum = float(np.asarray(math3d.luminance(light.color[:3])))
    assert lum <= 25.0 + 1e-3


def test_irradiance_of_constant_env_is_constant():
    env = constant_environment((1.0, 1.0, 1.0), size=32)
    irr = np.asarray(ibl.compute_irradiance_cube(env.panorama, size=8, env_height=32))
    # irradiance of constant unit radiance = integral(cos)/pi = 1
    np.testing.assert_allclose(irr, 1.0, rtol=0.03)


def test_reflection_mip0_is_mirror():
    env = _sky_panorama()
    mips = ibl.compute_reflection_cube(env.panorama, size=16, mip_count=3, env_height=32)
    assert len(mips) == 3
    assert mips[0].shape == (6, 16, 16, 3)
    assert mips[2].shape == (6, 4, 4, 3)
    # higher mips are smoother: variance decreases
    v0 = float(np.var(np.asarray(mips[0])))
    v2 = float(np.var(np.asarray(mips[2])))
    assert v2 < v0


def test_brdf_lut_matches_known_values():
    lut = np.asarray(ibl.compute_brdf_lut(size=16, sample_count=512))
    assert lut.shape == (16, 16, 2)
    assert np.all(lut >= 0.0) and np.all(lut[..., 0] <= 1.5)
    # scale dominates offset at low roughness / high NoV
    assert lut[2, 14, 0] > lut[2, 14, 1]


def test_hdr_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    img = (rng.uniform(0, 4, (16, 32, 3)) ** 2).astype(np.float32)
    p = tmp_path / "test.hdr"
    hdr.write_hdr(p, img)
    back = hdr.read_hdr(p)
    assert back.shape == (16, 32, 3)
    # RGBE precision is relative to the per-pixel max component (shared
    # exponent): error <= max/256 plus encode truncation
    tol = img.max(axis=-1, keepdims=True) / 128.0 + 1e-3
    assert np.all(np.abs(back - img) <= tol)


def test_equirect_and_cube_sampling_agree():
    """VERDICT weak item: the PT path samples the equirect panorama
    directly while IBL consumes the converted cube — the two pipelines
    must agree on the same directions (a smooth panorama bounds the cube
    resample error; tolerance covers bilinear-vs-facet differences)."""
    h = 64
    y = np.linspace(0, np.pi, h, endpoint=False)[:, None]
    x = np.linspace(0, 2 * np.pi, 2 * h, endpoint=False)[None, :]
    pano = np.stack(
        [
            0.5 + 0.4 * np.sin(y) * np.cos(x),
            0.5 + 0.3 * np.cos(y) + 0 * x,
            0.5 + 0.2 * np.sin(x) * np.sin(y),
        ],
        axis=-1,
    ).astype(np.float32)
    env = Environment(panorama=jnp.asarray(pano))
    cube = panorama_to_cube(env, 64)

    rng = np.random.default_rng(0)
    d = rng.normal(size=(512, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)

    a = np.asarray(sample_environment(env, d))
    b = np.asarray(sample_cube(cube, d))
    np.testing.assert_allclose(a, b, atol=0.02)
