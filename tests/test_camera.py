"""Camera matrix parity: glm::lookAtRH + perspectiveRH_ZO with the
reference's quirks (yFov = xFov/aspect, reverse-Z swap, Y-flip) and
primary-ray geometry."""

import numpy as np
import jax.numpy as jnp

from vulkanraytracing_tpu.config import CameraConfig
from vulkanraytracing_tpu.core import rng
from vulkanraytracing_tpu.pt.integrator import primary_rays
from vulkanraytracing_tpu.scene.camera import Camera, look_at, perspective


def test_look_at_basis():
    v = look_at((0, 0, 5), (0, 0, 0), (0, 1, 0))
    # camera at +5z looking at origin: forward = -Z, right = +X, up = +Y
    p = v @ np.array([0, 0, 0, 1.0])
    np.testing.assert_allclose(p[:3], [0, 0, -5], atol=1e-12)  # origin 5 ahead
    p = v @ np.array([1, 0, 0, 1.0])
    assert p[0] > 0  # +X is camera-right


def test_perspective_rh_zo():
    p = perspective(np.radians(60.0), 1.0, 0.1, 100.0)
    # near plane maps to z' = 0, far to z' = 1 (after perspective divide)
    near = p @ np.array([0, 0, -0.1, 1.0])
    far = p @ np.array([0, 0, -100.0, 1.0])
    np.testing.assert_allclose(near[2] / near[3], 0.0, atol=1e-9)
    np.testing.assert_allclose(far[2] / far[3], 1.0, atol=1e-9)


def test_reverse_depth_swaps_planes():
    cam = Camera(CameraConfig(z_near=0.5, z_far=50.0))
    p_fwd = cam.projection_matrix(reverse_depth=False)
    p_rev = cam.projection_matrix(reverse_depth=True)
    # reverse-Z: the near plane now maps to depth 1
    near = p_rev @ np.array([0, 0, -0.5, 1.0])
    np.testing.assert_allclose(near[2] / near[3], 1.0, atol=1e-9)
    # and the Y flip is applied in both
    assert p_fwd[1, 1] < 0 and p_rev[1, 1] < 0


def test_primary_ray_through_center_hits_target():
    desc = CameraConfig(
        position=(1.0, 2.0, 8.0), target=(1.0, 2.0, 0.0), aspect_ratio=1.0
    )
    cam = Camera(desc).to_device()
    w = h = 64
    px = jnp.array([w // 2], jnp.uint32)
    py = jnp.array([h // 2], jnp.uint32)
    s0, s1 = rng.pixel_seed(px, py, 0)
    o, d = primary_rays(cam, px, py, w, h, s0, s1)
    np.testing.assert_allclose(np.asarray(o[0]), [1, 2, 8], atol=1e-5)
    # direction ~ -Z (within the half-pixel jitter cone)
    dd = np.asarray(d[0])
    assert dd[2] < -0.99


def test_primary_ray_orientation():
    """Pixel left of center looks toward -X; pixel above center toward +Y
    (Vulkan v=0 is the top row)."""
    cam = Camera(CameraConfig(position=(0, 0, 5), target=(0, 0, 0),
                              aspect_ratio=1.0)).to_device()
    w = h = 128
    px = jnp.array([8, 120, 64, 64], jnp.uint32)
    py = jnp.array([64, 64, 8, 120], jnp.uint32)
    s0, s1 = rng.pixel_seed(px, py, 0)
    _, d = primary_rays(cam, px, py, w, h, s0, s1)
    d = np.asarray(d)
    assert d[0, 0] < -0.1 and d[1, 0] > 0.1   # left/right
    assert d[2, 1] > 0.1 and d[3, 1] < -0.1   # top row looks up


def test_jitter_does_not_advance_main_stream():
    """GetPrimaryRayDireciton takes the seed BY VALUE (RayGen.rgen:73) — the
    jitter draws must not change the caller's stream."""
    px = jnp.array([3], jnp.uint32)
    py = jnp.array([7], jnp.uint32)
    s0, s1 = rng.pixel_seed(px, py, 5)
    _ = primary_rays(
        Camera(CameraConfig()).to_device(), px, py, 64, 64, s0, s1
    )
    # drawing from (s0, s1) now must give the same value as before the call
    f1, _, _ = rng.next_float(s0, s1)
    f2, _, _ = rng.next_float(s0, s1)
    assert float(f1[0]) == float(f2[0])
