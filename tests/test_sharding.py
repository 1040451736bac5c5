"""Distributed-correctness oracle (SURVEY.md section 4 item 3): the sharded
renderer over an 8-device CPU mesh must produce exactly the single-device
image — per-pixel deterministic RNG makes this bit-for-bit."""

import jax
import numpy as np

from vulkanraytracing_tpu.accel import build_scene_bvh
from vulkanraytracing_tpu.config import CameraConfig, Config, TraversalMode
from vulkanraytracing_tpu.parallel import (
    make_render_mesh,
    replicate_scene,
    shard_render_frame,
)
from vulkanraytracing_tpu.pt.render import create_render_state, render_frame
from vulkanraytracing_tpu.scene.camera import Camera
from vulkanraytracing_tpu.scene.procedural import cornell_box_scene


def _setup(width=32, height=32):
    cfg = Config(
        width=width,
        height=height,
        ray_chunk_size=width * height,
        traversal=TraversalMode.BVH,
        camera=CameraConfig(
            position=(0.0, 0.0, 3.2), aspect_ratio=width / height,
            x_fov=float(np.radians(60.0)),
        ),
    )
    scene = build_scene_bvh(cornell_box_scene())
    # commit single-device operands to device 0 explicitly; uncommitted
    # inputs can resolve against a stale cached executable with a different
    # device assignment ("supplied N buffers but expected M")
    scene = jax.device_put(scene, jax.devices()[0])
    camera = jax.device_put(Camera(cfg.camera).to_device(), jax.devices()[0])
    return cfg, scene, camera


def test_sharded_equals_single_device():
    cfg, scene, camera = _setup()
    mesh = make_render_mesh(jax.devices()[:8])

    single = create_render_state(cfg)
    single, s_stats = render_frame(scene, cfg, camera, single)

    sharded_scene = replicate_scene(scene, mesh)
    sharded = create_render_state(cfg)
    sharded, m_stats = shard_render_frame(sharded_scene, cfg, camera, sharded, mesh)

    np.testing.assert_array_equal(
        np.asarray(single.accumulation), np.asarray(sharded.accumulation)
    )
    assert float(s_stats.rays) == float(m_stats.rays)


def test_sharded_accumulation_across_frames():
    cfg, scene, camera = _setup()
    mesh = make_render_mesh(jax.devices()[:8])
    sharded_scene = replicate_scene(scene, mesh)

    single = create_render_state(cfg)
    sharded = create_render_state(cfg)
    for _ in range(3):
        single, _ = render_frame(scene, cfg, camera, single)
        sharded, _ = shard_render_frame(sharded_scene, cfg, camera, sharded, mesh)

    np.testing.assert_array_equal(
        np.asarray(single.accumulation), np.asarray(sharded.accumulation)
    )
    assert int(sharded.accum_index) == 3
