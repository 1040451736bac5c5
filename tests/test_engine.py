"""Engine lifecycle tests: event bus, camera system semantics, mode toggle,
accumulation reset, checkpoint/resume."""

import numpy as np

from vulkanraytracing_tpu.app.engine import Engine
from vulkanraytracing_tpu.app.events import EventBus, EventType, Key, KeyAction, KeyInput
from vulkanraytracing_tpu.app.systems import CameraSystem
from vulkanraytracing_tpu.config import CameraConfig, Config, RenderMode, TraversalMode
from vulkanraytracing_tpu.scene.camera import Camera
from vulkanraytracing_tpu.scene.procedural import single_triangle_scene


def _engine(**cfg_kw):
    cfg = Config(
        width=16, height=16, traversal=TraversalMode.BRUTE_FORCE,
        camera=CameraConfig(aspect_ratio=1.0), **cfg_kw,
    )
    return Engine(cfg, single_triangle_scene())


def test_event_bus_dispatch():
    bus = EventBus()
    seen = []
    bus.add_handler(EventType.RESIZE, seen.append)
    bus.trigger(EventType.RESIZE, (10, 20))
    assert seen == [(10, 20)]


def test_camera_system_wasd_moves_forward():
    bus = EventBus()
    cam = Camera(CameraConfig(position=(0, 0, 5), target=(0, 0, 0)))
    cs = CameraSystem(cam, bus)
    moved = []
    bus.add_handler(EventType.CAMERA_UPDATE, lambda _: moved.append(1))
    bus.trigger(EventType.KEY_INPUT, KeyInput(Key.W, KeyAction.PRESS))
    cs.process(0.5)  # speed 2.0 * 0.5s = 1 unit forward (-Z toward target)
    assert moved
    np.testing.assert_allclose(cam.description.position, (0, 0, 4), atol=1e-6)
    bus.trigger(EventType.KEY_INPUT, KeyInput(Key.W, KeyAction.RELEASE))
    cs.process(0.5)
    np.testing.assert_allclose(cam.description.position, (0, 0, 4), atol=1e-6)


def test_camera_speed_keys():
    bus = EventBus()
    cam = Camera(CameraConfig(position=(0, 0, 5), target=(0, 0, 0)))
    cs = CameraSystem(cam, bus)
    bus.trigger(EventType.KEY_INPUT, KeyInput(Key.DIGIT_3, KeyAction.PRESS))
    assert cs.speed_index == 2  # speed = 2 * 4^2 = 32
    bus.trigger(EventType.KEY_INPUT, KeyInput(Key.S, KeyAction.PRESS))
    cs.process(0.25)  # 32 * 0.25 = 8 backward
    np.testing.assert_allclose(cam.description.position, (0, 0, 13), atol=1e-5)


def test_mouse_look_clamps_pitch():
    bus = EventBus()
    cam = Camera(CameraConfig(position=(0, 0, 5), target=(0, 0, 0)))
    cs = CameraSystem(cam, bus, sensitivity=1000.0)
    bus.trigger(EventType.MOUSE_MOVE, (0.0, 0.0))
    bus.trigger(EventType.MOUSE_MOVE, (0.0, -10.0))  # look up hard
    assert abs(cs.pitch) <= np.radians(89.0) + 1e-6


def test_camera_move_resets_accumulation():
    eng = _engine()
    eng.run(2)
    assert int(eng.state.accum_index) == 2
    eng.inject_mouse_move(0, 0)
    eng.inject_mouse_move(5, 5)  # camera update fires
    assert int(eng.state.accum_index) == 0
    eng.run(1)
    assert int(eng.state.accum_index) == 1


def test_mode_toggle():
    eng = _engine()
    assert eng.render_mode == RenderMode.PATH_TRACING
    eng.inject_key(Key.T)
    assert eng.render_mode == RenderMode.HYBRID
    eng.run(1)  # hybrid draw works
    img = eng.display_image()
    assert img.shape == (16, 16, 3)
    eng.inject_key(Key.T)
    assert eng.render_mode == RenderMode.PATH_TRACING


def test_resize_recreates_framebuffer():
    eng = _engine()
    eng.run(1)
    eng.inject_resize(24, 12)
    assert eng.state.accumulation.shape == (12, 24, 3)
    assert int(eng.state.accum_index) == 0
    eng.run(1)


def test_checkpoint_roundtrip(tmp_path):
    eng = _engine()
    eng.run(3)
    p = tmp_path / "ckpt.npz"
    eng.save_checkpoint(p)

    eng2 = _engine()
    eng2.load_checkpoint(p)
    assert int(eng2.state.accum_index) == 3
    np.testing.assert_array_equal(
        np.asarray(eng2.state.accumulation), np.asarray(eng.state.accumulation)
    )
    # resumed render continues identically to an uninterrupted one
    eng.run(1)
    eng2.run(1)
    np.testing.assert_array_equal(
        np.asarray(eng2.state.accumulation), np.asarray(eng.state.accumulation)
    )


def test_cli_render_and_compare(tmp_path):
    from vulkanraytracing_tpu.app.cli import main

    out = tmp_path / "tri.png"
    rc = main([
        "render", "--scene", "triangle", "--out", str(out),
        "--spp", "2", "--width", "16", "--height", "16", "--brute",
    ])
    assert rc == 0 and out.exists()
    rc = main(["compare", str(out), str(out)])
    assert rc == 0


def test_terminal_viewer_headless():
    """TerminalViewer.frame drives the engine without a tty: keys inject,
    the camera moves (accumulation resets), mode toggles, ANSI out renders."""
    from vulkanraytracing_tpu.app.viewer import TerminalViewer
    from vulkanraytracing_tpu.config import RenderMode

    eng = _engine()
    v = TerminalViewer(eng, cols=24, rows=10)
    out = v.frame([])
    assert "\x1b[38;2;" in out and "spp" in out
    spp0 = int(eng.state.accum_index)
    out = v.frame([])
    assert int(eng.state.accum_index) == spp0 + 1

    v.frame(["w"])  # camera move -> accumulation reset
    assert int(eng.state.accum_index) == 1

    mode0 = eng.render_mode
    v.frame(["t"])
    assert eng.render_mode != mode0


def test_viewer_sgr_mouse_decode():
    """xterm SGR mouse reports (ESC[?1003h any-motion mode) decode into
    MOUSE tokens; split escape sequences survive via the remainder."""
    from vulkanraytracing_tpu.app.viewer import _decode_input

    toks, rem = _decode_input("\x1b[<35;10;5M")
    assert toks == [("MOUSE", 10, 5, True)] and rem == ""
    toks, rem = _decode_input("w\x1b[<0;3;4M\x1b[A")
    assert toks == ["w", ("MOUSE", 3, 4, True), "UP"] and rem == ""
    toks, rem = _decode_input("\x1b[<0;3;4m")  # release -> False
    assert toks == [("MOUSE", 3, 4, False)]
    # incomplete report: held back as remainder, completed by next read
    toks, rem = _decode_input("a\x1b[<35;1")
    assert toks == ["a"] and rem == "\x1b[<35;1"
    toks, rem = _decode_input(rem + "2;7M")
    assert toks == [("MOUSE", 12, 7, True)] and rem == ""
    # malformed report dropped, stream continues
    toks, rem = _decode_input("\x1b[<1;xM q")
    assert toks == [" ", "q"] and rem == ""


def test_viewer_mouse_look_rotates_camera():
    """Mouse motion tokens rotate the camera like the reference's
    raw-mouse look (CameraSystem.cpp:144-168): first report anchors,
    later reports inject deltas and reset accumulation."""
    from vulkanraytracing_tpu.app.viewer import TerminalViewer

    eng = _engine()
    v = TerminalViewer(eng, cols=24, rows=10)
    v.frame([("MOUSE", 10, 5, True)])  # anchor only: no look yet
    view0 = eng.camera.view_matrix().copy()
    v.frame([])
    spp0 = int(eng.state.accum_index)
    v.frame([("MOUSE", 14, 5, True)])  # drag right 4 cells
    assert int(eng.state.accum_index) == 1 < spp0 + 1
    assert not np.allclose(eng.camera.view_matrix(), view0)


def test_animated_instances_refit_and_reset():
    """BASELINE config 5: animated instances -> TLAS refit per move +
    accumulation reset; refit renders match a from-scratch BVH build."""
    import jax.numpy as jnp

    from vulkanraytracing_tpu.accel.lbvh import build_bvh
    from vulkanraytracing_tpu.accel.tlas import world_geometry
    from vulkanraytracing_tpu.app.engine import Engine
    from vulkanraytracing_tpu.config import CameraConfig, Config, TraversalMode
    from vulkanraytracing_tpu.pt.render import create_render_state, render_frame
    from vulkanraytracing_tpu.scene.camera import Camera
    from vulkanraytracing_tpu.scene.procedural import animated_instances_demo

    scene, soup, anim = animated_instances_demo(orbiters=2)
    cfg = Config(
        width=32, height=32, max_bounce_count=2,
        traversal=TraversalMode.BVH,
        camera=CameraConfig(position=(0.0, 4.0, 10.0), target=(0.0, 1.0, 0.0),
                            aspect_ratio=1.0),
    )
    eng = Engine(cfg, scene, instances=soup, animation=anim)

    eng.run(2)  # frame 0 (build) + frame 1 (refit)
    assert int(eng.state.accum_index) == 1  # reset on every move
    img_refit = np.asarray(eng.state.accumulation)
    assert not np.isnan(img_refit).any()

    # oracle: a from-scratch world build at the same transforms renders
    # the identical image (refit changes tree quality, never hits)
    geom = world_geometry(soup, jnp.asarray(anim(1)))
    geom_sorted, bvh = build_bvh(geom)
    ref_scene = scene._replace(geometry=geom_sorted, bvh=bvh)
    cam = Camera(cfg.camera).to_device()
    st, _ = render_frame(ref_scene, cfg, cam, create_render_state(cfg))
    np.testing.assert_array_equal(np.asarray(st.accumulation), img_refit)

    # a static frame (same transforms) accumulates instead of resetting
    eng._animation = lambda i: anim(1)
    eng._frame_index = 1
    eng.run(1)
    assert int(eng.state.accum_index) == 2
