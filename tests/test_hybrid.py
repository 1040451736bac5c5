"""Hybrid (deferred) mode tests: structure of the composited image and
consistency with the path tracer's direct lighting."""

import numpy as np

from vulkanraytracing_tpu.accel import build_scene_bvh
from vulkanraytracing_tpu.config import CameraConfig, Config, TraversalMode
from vulkanraytracing_tpu.env.ibl import bake_ibl
from vulkanraytracing_tpu.hybrid import render_hybrid
from vulkanraytracing_tpu.scene.camera import Camera
from vulkanraytracing_tpu.scene.procedural import cornell_box_scene, single_triangle_scene


def _setup(size=64):
    cfg = Config(
        width=size, height=size, traversal=TraversalMode.BVH,
        camera=CameraConfig(
            position=(0.0, 0.0, 3.2), aspect_ratio=1.0,
            x_fov=float(np.radians(60.0)),
        ),
    )
    scene = build_scene_bvh(cornell_box_scene())
    scene = scene._replace(
        environment=bake_ibl(
            scene.environment, irradiance_size=8, reflection_size=16,
            brdf_size=16,
        )
    )
    camera = Camera(cfg.camera).to_device()
    return cfg, scene, camera


def test_hybrid_renders_structure():
    cfg, scene, camera = _setup()
    img = np.asarray(render_hybrid(scene, cfg, camera))
    assert img.shape == (64, 64, 3)
    assert not np.isnan(img).any()
    # red wall left, green wall right (same structure as the PT mode)
    left = img[28:36, 6:12].mean(axis=(0, 1))
    right = img[28:36, 52:58].mean(axis=(0, 1))
    assert left[0] > left[1], left
    assert right[1] > right[0], right
    # emissive panel bright at top center
    assert img[6:10, 28:36].mean() > img[20:24, 28:36].mean()
    # open front shows black env
    assert img[2, 2].max() < 0.05


def test_hybrid_skybox_on_miss():
    from vulkanraytracing_tpu.core import math3d
    import jax.numpy as jnp

    cfg = Config(
        width=32, height=32, traversal=TraversalMode.BRUTE_FORCE,
        camera=CameraConfig(aspect_ratio=1.0),
    )
    scene = single_triangle_scene(env_color=(0.2, 0.3, 0.4))
    camera = Camera(cfg.camera).to_device()
    img = np.asarray(render_hybrid(scene, cfg, camera))
    want = np.asarray(math3d.tone_mapping(jnp.array([0.2, 0.3, 0.4])))
    np.testing.assert_allclose(img[0, 0], want, atol=1e-3)


def test_hybrid_gizmos_visible():
    cfg, scene, camera = _setup()
    img = np.asarray(render_hybrid(scene, cfg, camera))
    # the first point light sits at (0, 0.6, 0.6) — near top-center of view;
    # a white-ish bright blob should exist somewhere brighter than walls
    assert img.max() > 0.9
