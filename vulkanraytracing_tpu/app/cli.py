"""Command-line interface: render / bench / compare.

The reference's app surface is `main()` + compile-time Config + optional
file dialogs (Engine.cpp:19-54); the TPU framework exposes the same knobs
as flags.  ``compare`` implements the RMSE parity metric from BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _attach_environment(scene, args):
    if args.env:
        import jax.numpy as jnp

        from vulkanraytracing_tpu.app.hdr import read_hdr
        from vulkanraytracing_tpu.env.sun import extract_direct_light
        from vulkanraytracing_tpu.scene.types import make_environment

        pano = jnp.asarray(read_hdr(args.env))
        env = make_environment(pano)
        scene = scene._replace(
            environment=env, direct_light=extract_direct_light(pano)
        )
    if args.mode == "hybrid":
        from vulkanraytracing_tpu.env.ibl import bake_ibl

        scene = scene._replace(environment=bake_ibl(scene.environment))
    return scene


def _build_scene(args):
    """Returns (scene, camera_cfg_or_None, animation_or_None).

    ``animation`` is a (soup, transforms_fn) pair for the two-level
    animated-instances path (Engine builds + refits the TLAS itself)."""
    from vulkanraytracing_tpu.accel import build_scene_bvh
    from vulkanraytracing_tpu.config import CameraConfig
    from vulkanraytracing_tpu.scene import procedural

    camera_cfg = None
    if args.scene == "animated":
        # two-level animated-instances demo (BASELINE config 5): built
        # through Engine(instances=..., animation=...) -> TLAS refit/frame
        scene, soup, anim = procedural.animated_instances_demo()
        camera_cfg = CameraConfig(
            position=(0.0, 4.0, 10.0), target=(0.0, 1.0, 0.0),
            aspect_ratio=args.width / args.height,
        )
        return _attach_environment(scene, args), camera_cfg, (soup, anim)
    if args.scene in ("cornell", "triangle", "sponza_like"):
        scene = {
            "cornell": procedural.cornell_box_scene,
            "triangle": procedural.single_triangle_scene,
            "sponza_like": procedural.sponza_like_scene,
        }[args.scene]()
        if args.scene == "cornell":
            camera_cfg = CameraConfig(
                position=(0.0, 0.0, 3.2), aspect_ratio=args.width / args.height,
                x_fov=float(np.radians(60.0)),
            )
        elif args.scene == "sponza_like":
            camera_cfg = CameraConfig(
                position=(-16.0, 3.0, 0.0), target=(0.0, 3.0, 0.0),
                aspect_ratio=args.width / args.height,
            )
    else:
        from pathlib import Path

        if not Path(args.scene).exists():
            raise SystemExit(
                f"error: scene '{args.scene}' not found (expected a "
                "glTF/GLB path or one of: cornell, triangle, sponza_like, animated)"
            )
        from vulkanraytracing_tpu.scene.gltf import load_scene

        scene, camera_cfg, _pool = load_scene(args.scene)

    scene = _attach_environment(scene, args)
    if not args.brute:
        scene = build_scene_bvh(scene, builder="sah")
    return scene, camera_cfg, None


def _make_mesh(args):
    """--devices N -> a 1-D pixel-DP mesh over the first N devices (None
    for the default single-device path).  Height must divide over N
    (shard_render_frame shards whole row blocks)."""
    n = getattr(args, "devices", 1)
    if n <= 1:
        return None
    import jax

    from vulkanraytracing_tpu.parallel import make_render_mesh

    have = len(jax.devices())
    if have < n:
        raise SystemExit(f"error: --devices {n} but only {have} available")
    if args.height % n:
        raise SystemExit(
            f"error: --height {args.height} must be divisible by --devices {n}"
        )
    return make_render_mesh(jax.devices()[:n])


def _scene_needs_alpha(scene) -> bool:
    """Static: does any triangle carry the alpha-test (cutout) flag?"""
    return scene.textures is not None and bool(
        np.asarray(scene.geometry.alpha_test).any()
    )


def cmd_render(args) -> int:
    from vulkanraytracing_tpu.app.engine import Engine
    from vulkanraytracing_tpu.app.image_io import write_png, write_radiance_npy
    from vulkanraytracing_tpu.config import Config, RenderMode, TraversalMode
    from vulkanraytracing_tpu.scene.camera import Camera
    from vulkanraytracing_tpu.utils import ScopeTime, log_i

    scene, camera_cfg, animation = _build_scene(args)
    cfg = Config(
        width=args.width,
        height=args.height,
        render_mode=RenderMode.HYBRID if args.mode == "hybrid" else RenderMode.PATH_TRACING,
        traversal=TraversalMode.BRUTE_FORCE if args.brute else TraversalMode.BVH_PALLAS,
        parity_quantization=not args.hdr_accumulation,
        tone_map_before_accumulation=not args.hdr_accumulation,
        alpha_visibility=_scene_needs_alpha(scene),
    )
    if camera_cfg is not None:
        cfg = cfg.replace(camera=camera_cfg)

    engine = Engine(
        cfg, scene, Camera(cfg.camera),
        instances=animation[0] if animation else None,
        animation=animation[1] if animation else None,
        mesh=_make_mesh(args),
    )
    if args.resume:
        engine.load_checkpoint(args.resume)
        log_i(f"resumed at spp {int(engine.state.accum_index)}")

    frames = 1 if args.mode == "hybrid" else args.spp
    with ScopeTime(f"render {frames} frame(s)"):
        engine.run(frames)

    for line in engine.hud_lines():
        log_i(line)
    if args.checkpoint:
        engine.save_checkpoint(args.checkpoint)
    if args.out.endswith(".npy"):
        write_radiance_npy(args.out, np.asarray(engine.state.accumulation))
    else:
        write_png(args.out, engine.display_image())
    log_i(f"wrote {args.out} ({args.width}x{args.height}, "
          f"{engine.total_rays / 1e6:.1f} Mrays)")
    return 0


def cmd_view(args) -> int:
    from vulkanraytracing_tpu.app.engine import Engine
    from vulkanraytracing_tpu.app.viewer import TerminalViewer
    from vulkanraytracing_tpu.config import Config, RenderMode, TraversalMode
    from vulkanraytracing_tpu.scene.camera import Camera

    scene, camera_cfg, animation = _build_scene(args)
    cfg = Config(
        width=args.width,
        height=args.height,
        render_mode=RenderMode.HYBRID if args.mode == "hybrid" else RenderMode.PATH_TRACING,
        traversal=TraversalMode.BRUTE_FORCE if args.brute else TraversalMode.BVH_PALLAS,
        alpha_visibility=_scene_needs_alpha(scene),
    )
    if camera_cfg is not None:
        cfg = cfg.replace(camera=camera_cfg)
    engine = Engine(
        cfg, scene, Camera(cfg.camera),
        instances=animation[0] if animation else None,
        animation=animation[1] if animation else None,
        mesh=_make_mesh(args),
    )
    if not sys.stdin.isatty():
        print("view requires a tty (WASD fly camera, t toggles mode, q quits)",
              file=sys.stderr)
        return 1
    TerminalViewer(engine).run()
    return 0


def cmd_bench(args) -> int:
    import os

    import bench

    if getattr(args, "devices", 1) > 1:
        os.environ["VRT_BENCH_DEVICES"] = str(args.devices)
    bench.main()
    return 0


def cmd_compare(args) -> int:
    from vulkanraytracing_tpu.app.image_io import rmse

    a = np.load(args.a) if args.a.endswith(".npy") else _read_image(args.a)
    b = np.load(args.b) if args.b.endswith(".npy") else _read_image(args.b)
    if a.shape != b.shape:
        print(f"shape mismatch: {a.shape} vs {b.shape}", file=sys.stderr)
        return 1
    value = rmse(a, b)
    print(json.dumps({"rmse": value, "passes_1e-3": value <= 1e-3}))
    return 0


def _read_image(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB")).astype(np.float32) / 255.0


def main(argv=None) -> int:
    import os

    if os.environ.get("VRT_NUM_CPU_DEVICES"):
        # test multi-chip sharding on a virtual CPU mesh (no TPU pod needed):
        # must win over any site hook that forces another platform, so update
        # the jax CONFIG before the first backend use (cli imports jax lazily,
        # so nothing has initialized it yet)
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update(
            "jax_num_cpu_devices", int(os.environ["VRT_NUM_CPU_DEVICES"])
        )

    parser = argparse.ArgumentParser(
        prog="vulkanraytracing_tpu",
        description="TPU-native path tracer / hybrid renderer",
    )
    sub = parser.add_subparsers(dest="command", required=True)

    render = sub.add_parser("render", help="render a scene to an image")
    render.add_argument(
        "--scene", default="cornell",
        help="glTF/GLB path or procedural name (cornell, triangle, sponza_like)",
    )
    render.add_argument("--env", default=None, help="HDR panorama path")
    render.add_argument("--out", default="out.png")
    render.add_argument("--spp", type=int, default=16)
    render.add_argument("--width", type=int, default=1280)
    render.add_argument("--height", type=int, default=720)
    render.add_argument("--mode", choices=["pt", "hybrid"], default="pt")
    render.add_argument("--brute", action="store_true", help="skip the BVH")
    render.add_argument(
        "--hdr-accumulation", action="store_true",
        help="accumulate linear HDR instead of the reference's tone-mapped RGBA8",
    )
    render.add_argument("--checkpoint", default=None, help="save render state")
    render.add_argument("--resume", default=None, help="resume render state")
    render.add_argument(
        "--devices", type=int, default=1,
        help="shard pixel rows over the first N devices (multi-chip DP)",
    )
    render.set_defaults(fn=cmd_render)

    view = sub.add_parser(
        "view", help="interactive terminal viewer (WASD fly camera)"
    )
    view.add_argument("--scene", default="cornell")
    view.add_argument("--env", default=None, help="HDR panorama path")
    view.add_argument("--width", type=int, default=256)
    view.add_argument("--height", type=int, default=144)
    view.add_argument("--mode", choices=["pt", "hybrid"], default="pt")
    view.add_argument("--brute", action="store_true")
    view.add_argument("--devices", type=int, default=1)
    view.set_defaults(fn=cmd_view)

    b = sub.add_parser("bench", help="run the Mrays/s benchmark")
    b.add_argument(
        "--devices", type=int, default=1,
        help="shard the bench frame over the first N devices",
    )
    b.set_defaults(fn=cmd_bench)

    cmp_ = sub.add_parser("compare", help="image RMSE (parity metric)")
    cmp_.add_argument("a")
    cmp_.add_argument("b")
    cmp_.set_defaults(fn=cmd_compare)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
