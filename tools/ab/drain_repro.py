"""Bisect the drain+compact full-frame TPU abort (repl jobs 052-056).

Standalone (fresh process per invocation — the trip caps are read at
TRACE time, so flipping them inside a long-lived process silently reuses
the cached executable; see KERNEL_NOTES "drain abort" entry).

  VRT_DRAIN_CLOSEST=256,1024 VRT_DRAIN_ANYHIT=off \
      python tools/ab/drain_repro.py [WIDTHxHEIGHT] [tris] [bounces]

Renders ONE bench-scene frame at the given size on the TPU and prints
PASS/ABORT, so the failing kernel (closest vs any-hit) and the failing
scale can be isolated in ~2-3 min per attempt instead of a full bench.

Bisect axes beyond the caps:
- [bounces] (default 4) shrinks the number of traversal call sites in
  the frame program (each capped site compiles fresh + N resume
  kernels, so kernel count is a prime suspect for the abort);
- VRT_DEBUG_NO_SORT=1 removes the riding wavefront sort between
  bounces (the other large non-kernel block in the frame program);
- VRT_DRAIN_COMPILE_ONLY=1 lowers + compiles the frame WITHOUT running
  it: an abort here pins the failure to the XLA:TPU compiler (program
  x shape cliff), a pass followed by a run abort pins it to runtime.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))


def main() -> int:
    size = sys.argv[1] if len(sys.argv) > 1 else "1920x1080"
    tris = int(sys.argv[2]) if len(sys.argv) > 2 else 262144
    bounces = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    width, height = (int(x) for x in size.split("x"))

    import vulkanraytracing_tpu.ops.traverse_wide8 as tw8

    print(
        f"caps: closest={tw8.CLOSEST_DRAIN_CAPS} "
        f"anyhit={tw8.ANYHIT_DRAIN_CAPS}  {width}x{height} tris={tris} "
        f"bounces={bounces}",
        flush=True,
    )

    from vulkanraytracing_tpu.accel import build_scene_bvh
    from vulkanraytracing_tpu.config import CameraConfig, Config, TraversalMode
    from vulkanraytracing_tpu.pt.render import create_render_state, render_frame
    from vulkanraytracing_tpu.scene.camera import Camera
    from vulkanraytracing_tpu.scene.procedural import sponza_like_scene

    cfg = Config(
        width=width,
        height=height,
        ray_chunk_size=1 << 22,
        traversal=TraversalMode.BVH_PALLAS,
        max_bounce_count=bounces,
        camera=CameraConfig(
            position=(-16.0, 3.0, 0.0),
            target=(0.0, 3.0, 0.0),
            aspect_ratio=width / height,
        ),
    )
    scene = build_scene_bvh(
        sponza_like_scene(target_triangles=tris), builder="sah"
    )
    camera = Camera(cfg.camera).to_device()
    state = create_render_state(cfg)

    t0 = time.perf_counter()
    try:
        if os.environ.get("VRT_DRAIN_COMPILE_ONLY"):
            import jax

            from vulkanraytracing_tpu.pt.render import render_frame_impl

            lowered = jax.jit(
                render_frame_impl, static_argnames=("cfg",)
            ).lower(scene, cfg, camera, state)
            print(f"lowered in {time.perf_counter() - t0:.1f}s", flush=True)
            lowered.compile()
            print(f"COMPILE PASS in {time.perf_counter() - t0:.1f}s",
                  flush=True)
            return 0
        state, stats = render_frame(scene, cfg, camera, state)
        rays = float(stats.rays)  # forces completion through the relay
    except Exception as e:  # noqa: BLE001 - report ANY backend failure
        print(f"ABORT after {time.perf_counter() - t0:.1f}s: {e!r:.300}")
        return 1
    print(
        f"PASS: {rays / 1e6:.2f} Mrays in {time.perf_counter() - t0:.1f}s",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
