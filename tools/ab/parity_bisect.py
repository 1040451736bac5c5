"""Bisect the cornell full-size parity FAIL (round 4).

The 512^2/1024-spp TPU run shows production (wide8 Pallas) vs brute-force
oracle RMSE 7.1e-3 (parity) / 7.7e-3 (hdr), while the 64^2/8-spp CPU smoke
is bit-exact.  Three variables changed at once: platform, size, spp.
This probe renders cornell at a given (size, spp, mode) with both backends
on whatever platform JAX picks and prints the RMSE, so the divergence can
be pinned to one axis.

Usage: python tools/ab/parity_bisect.py SIZE SPP [parity|hdr]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))


def main() -> None:
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    mode = sys.argv[3] if len(sys.argv) > 3 else "parity"
    bounces = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    prod = sys.argv[5] if len(sys.argv) > 5 else "BVH_PALLAS"

    import jax

    from vulkanraytracing_tpu.accel import build_scene_bvh
    from vulkanraytracing_tpu.app.image_io import rmse
    from vulkanraytracing_tpu.config import CameraConfig, Config, TraversalMode
    from vulkanraytracing_tpu.pt.render import render_progressive, to_display
    from vulkanraytracing_tpu.scene.camera import Camera
    from vulkanraytracing_tpu.scene.procedural import cornell_box_scene

    print(f"backend: {jax.default_backend()}", flush=True)

    cam = CameraConfig(
        position=(0.0, 0.0, 3.2), aspect_ratio=1.0,
        x_fov=float(np.radians(60.0)),
    )
    base = Config(
        width=size, height=size, camera=cam,
        parity_quantization=(mode == "parity"),
        tone_map_before_accumulation=(mode == "parity"),
        alpha_visibility=False,
        max_bounce_count=bounces,
    )
    scene = cornell_box_scene()

    # ONE built scene for both: the oracle brute-forces the permuted
    # geometry, so equal-t ties resolve to the same lowest-id winner as
    # the kernels' lexicographic (t, id) tie-break
    built = build_scene_bvh(scene, builder="sah")
    imgs = {}
    raws = {}
    for backend, trav in (
        ("oracle", TraversalMode.BRUTE_FORCE),
        ("production", TraversalMode[prod]),
    ):
        s = built
        cfg = base.replace(traversal=trav)
        camera = Camera(cfg.camera).to_device()
        t0 = time.perf_counter()
        state, rays = render_progressive(s, cfg, camera, spp=spp)
        img = to_display(state, cfg)
        dt = time.perf_counter() - t0
        imgs[backend] = img.astype(np.float32) / 255.0
        raws[backend] = np.asarray(state.accumulation)
        print(f"{backend}: {float(rays)/1e6:.2f} Mrays in {dt:.1f}s", flush=True)

    value = rmse(imgs["oracle"], imgs["production"])
    diff = np.abs(imgs["oracle"] - imgs["production"])
    npx = int((diff.max(axis=-1) > 0).sum())
    rdiff = np.abs(raws["oracle"] - raws["production"])
    print(f"size={size} spp={spp} mode={mode} bounces={bounces} prod={prod}: RMSE {value:.3e} "
          f"({'PASS' if value <= 1e-3 else 'FAIL'} @1e-3), "
          f"{npx}/{size*size} pixels differ, max |d| {diff.max():.3e}, "
          f"accum max |d| {rdiff.max():.3e}", flush=True)


if __name__ == "__main__":
    main()
