"""Directly MEASURED time-to-1024-spp (BASELINE.json metric).

bench.py extrapolates time_to_1024spp from the best frame; VERDICT r3
item 8 asks for a direct measurement to make the metric honest.  This
renders 1024 progressive spp at 512^2 on the bench scene through
``render_span`` (16-frame scan spans — one relay dispatch per span, the
same path long CLI renders use) and records wall time.

Writes artifacts/bench/t1024.json:
  {"size": 512, "spp": 1024, "measured_s": ..., "extrapolated_s": ...,
   "ratio": ..., "mrays_per_s": ...}

where extrapolated_s is 1024 * (median frame time from a 10-frame
probe), i.e. the same rule bench.py applies, evaluated at this size —
the committed artifact shows how far extrapolation sits from truth.

Usage: python tools/measure_t1024.py [SIZE] [SPP]
       VRT_T1024_CPU=1 ... (smoke)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

    import jax

    if os.environ.get("VRT_T1024_CPU"):
        jax.config.update("jax_platforms", "cpu")

    from vulkanraytracing_tpu.accel import build_scene_bvh
    from vulkanraytracing_tpu.config import CameraConfig, Config, TraversalMode
    from vulkanraytracing_tpu.pt.render import (
        create_render_state,
        render_frame,
        render_progressive,
    )
    from vulkanraytracing_tpu.scene.camera import Camera
    from vulkanraytracing_tpu.scene.procedural import sponza_like_scene

    tris = int(os.environ.get("VRT_T1024_TRIS", 262144))
    cfg = Config(
        width=size, height=size,
        ray_chunk_size=1 << 22,
        traversal=TraversalMode.BVH_PALLAS,
        camera=CameraConfig(
            position=(-16.0, 3.0, 0.0), target=(0.0, 3.0, 0.0),
            aspect_ratio=1.0,
        ),
    )
    scene = build_scene_bvh(sponza_like_scene(target_triangles=tris),
                            builder="sah")
    camera = Camera(cfg.camera).to_device()
    print(f"backend: {jax.default_backend()}, {size}^2, {spp} spp, "
          f"{tris} tris", flush=True)

    # frame-time probe -> the extrapolation bench.py would make
    state = create_render_state(cfg)
    state, stats = render_frame(scene, cfg, camera, state)  # compile
    float(stats.rays)
    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        state, stats = render_frame(scene, cfg, camera, state)
        float(stats.rays)  # force completion through the relay
        times.append(time.perf_counter() - t0)
    extrapolated = float(np.median(times)) * spp
    print(f"median frame {np.median(times) * 1e3:.0f} ms "
          f"-> extrapolated {extrapolated:.1f}s", flush=True)

    # the real thing: spp progressive frames in 16-frame spans.
    # Warm the span compile first (16 frames, discarded) so the measured
    # number is render time, not one XLA compile.
    if spp >= 16:
        from vulkanraytracing_tpu.pt.render import render_span

        wstate, wstats = render_span(
            scene, cfg, camera, create_render_state(cfg), 16
        )
        float(wstats.rays)
    state = create_render_state(cfg)
    t0 = time.perf_counter()
    state, rays = render_progressive(scene, cfg, camera, spp=spp,
                                     state=state)
    measured = time.perf_counter() - t0
    assert int(state.accum_index) == spp
    out = {
        "size": size, "spp": spp, "tris": tris,
        "measured_s": round(measured, 1),
        "extrapolated_s": round(extrapolated, 1),
        "ratio": round(measured / extrapolated, 3),
        "mrays_per_s": round(rays / measured / 1e6, 3),
        "backend": jax.default_backend(),
    }
    path = Path(__file__).resolve().parent.parent / "artifacts" / "bench"
    path.mkdir(parents=True, exist_ok=True)
    (path / "t1024.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
