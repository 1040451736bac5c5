"""Distributed-correctness oracle (SURVEY.md section 4 item 3): the sharded
renderer over an 8-device CPU mesh must produce exactly the single-device
image — per-pixel deterministic RNG makes this bit-for-bit.

Each test re-executes itself in a SUBPROCESS: jax 0.9 has an
executable-resolution bug where compiling a fresh single-device jit after
shard_map executables exist in the process mis-resolves ("Execution
supplied N buffers but compiled program expected M"), and jax.clear_caches
does not fully reset that state.  Process isolation makes the oracles
immune to compile history from other test modules."""

import os
import subprocess
import sys

import jax
import numpy as np
import pytest

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


# Tests grouped per isolation subprocess: a group shares one process (and
# so one set of jit compiles — halving the dominant compile cost on this
# 1-core box) ONLY when its members don't trip the jax 0.9 bug together.
# test_sample_parallel_mode compiles a fresh single-device render_frame
# signature AFTER shard executables exist, which mis-resolves in a shared
# process ("supplied 45 buffers but expected 97"), so it stays solo.
_GROUPS = {
    "shard": [
        "test_sharded_equals_single_device",
        "test_sharded_accumulation_across_frames",
    ],
    "solo": ["test_sample_parallel_mode"],
    "pallas": ["test_sharded_pallas_production"],
}
_RAN: set[str] = set()


def _isolated(name) -> bool:
    """True when running inside the isolation subprocess; else spawn the
    group's subprocess once and no-op the parent's remaining members."""
    if os.environ.get("VRT_SHARD_ISOLATED"):
        return True
    gname, members = next(
        (g, m) for g, m in _GROUPS.items() if name in m
    )
    if gname not in _RAN:
        ids = [f"{__file__}::{m}" for m in members]
        r = subprocess.run(
            [sys.executable, "-m", "pytest", *ids, "-x", "-q"],
            env={**os.environ, "VRT_SHARD_ISOLATED": "1"},
            capture_output=True, text=True, timeout=1800,
        )
        assert r.returncode == 0, (
            f"isolated {gname} failed:\n{r.stdout}\n{r.stderr}"
        )
        _RAN.add(gname)
    return False


def test_sharded_equals_single_device():
    if not _isolated("test_sharded_equals_single_device"):
        return
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


@pytest.mark.slow  # multi-frame variant of the bit-exact oracle above
def test_sharded_accumulation_across_frames():
    if not _isolated("test_sharded_accumulation_across_frames"):
        return
    cfg, scene, camera = _setup()
    mesh = make_render_mesh(jax.devices()[:8])
    sharded_scene = replicate_scene(scene, mesh)

    # all single-device frames BEFORE the first shard_map compile: compiling
    # a single-device render_frame after shard executables exist trips the
    # jax 0.9 executable-resolution bug ("supplied N buffers, expected M")
    single = create_render_state(cfg)
    for _ in range(3):
        single, _ = render_frame(scene, cfg, camera, single)
    sharded = create_render_state(cfg)
    for _ in range(3):
        sharded, _ = shard_render_frame(sharded_scene, cfg, camera, sharded, mesh)

    np.testing.assert_array_equal(
        np.asarray(single.accumulation), np.asarray(sharded.accumulation)
    )
    assert int(sharded.accum_index) == 3


@pytest.mark.slow
def test_sharded_pallas_production():
    """The PRODUCTION wide8 Pallas kernel (interpret mode off-TPU) under
    shard_map: sharded output must be bit-identical to single-device.
    Round-2 gap (VERDICT): the dryrun + tests covered only the XLA packet
    backend; this puts the real hot path under the mesh."""
    if not _isolated("test_sharded_pallas_production"):
        return
    from vulkanraytracing_tpu.config import CameraConfig

    w = h = 16
    cfg = Config(
        width=w,
        height=h,
        ray_chunk_size=w * h,
        traversal=TraversalMode.BVH_PALLAS,
        max_bounce_count=1,  # interpret mode is slow; 1 bounce still runs
        #                      primary + bounce + NEE traces through wide8
        camera=CameraConfig(
            position=(0.0, 0.0, 3.2), aspect_ratio=1.0,
            x_fov=float(np.radians(60.0)),
        ),
    )
    scene = build_scene_bvh(cornell_box_scene())
    assert scene.bvh.nodes8 is not None  # wide8, not the 2-wide fallback
    scene0 = jax.device_put(scene, jax.devices()[0])
    camera = jax.device_put(Camera(cfg.camera).to_device(), jax.devices()[0])

    single = create_render_state(cfg)
    single, _ = render_frame(scene0, cfg, camera, single)

    mesh = make_render_mesh(jax.devices()[:8])
    sharded = create_render_state(cfg)
    sharded, stats = shard_render_frame(
        replicate_scene(scene, mesh), cfg, camera, sharded, mesh
    )
    np.testing.assert_array_equal(
        np.asarray(single.accumulation), np.asarray(sharded.accumulation)
    )


@pytest.mark.slow  # 34 s solo-subprocess oracle; pixel-parallel (the
# production sharding mode) stays in the default suite above
def test_sample_parallel_mode():
    if not _isolated("test_sample_parallel_mode"):
        return
    """Sample-parallel sharding: n devices contribute n spp per call; the
    result equals n sequential single-device frames rendered with the same
    (reordered) sample indices and averaged."""
    import jax.numpy as jnp

    from vulkanraytracing_tpu.parallel import shard_render_frame_samples
    from vulkanraytracing_tpu.pt.render import RenderState

    # compiling a new render_frame signature (parity_quantization=False)
    # after the earlier tests' shard_map compiles trips the jax 0.9
    # executable-resolution bug — start from a clean compile cache
    jax.clear_caches()

    cfg, scene, camera = _setup()
    cfg = cfg.replace(parity_quantization=False)
    n = 4
    mesh = make_render_mesh(jax.devices()[:n])
    sharded_scene = replicate_scene(scene, mesh)

    # reference: average of n single-device frames at accum indices 0..n-1.
    # Computed FIRST — compiling a fresh single-device render_frame signature
    # after a shard_map compile trips the jax 0.9 executable-resolution bug
    # ("supplied N buffers but compiled program expected M").
    acc = None
    total = 0.0
    for k in range(n):
        st0 = jax.device_put(
            RenderState(
                accumulation=jnp.zeros((cfg.height, cfg.width, 3)),
                accum_index=jnp.uint32(k),
            ),
            jax.devices()[0],
        )
        st_k, s_k = render_frame(scene, cfg, camera, st0)
        img_k = np.asarray(st_k.accumulation) * (k + 1)  # undo running mean
        acc = img_k if acc is None else acc + img_k
        total += float(s_k.rays)
    want = acc / n

    state = create_render_state(cfg)
    state, stats = shard_render_frame_samples(
        sharded_scene, cfg, camera, state, mesh
    )
    assert int(state.accum_index) == 1
    np.testing.assert_allclose(
        np.asarray(state.accumulation), want, rtol=2e-4, atol=2e-5
    )
    assert float(stats.rays) == total
