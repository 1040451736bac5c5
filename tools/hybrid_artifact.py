"""Hybrid-mode at-scale artifact (VERDICT r04 weak #5).

The reference's hybrid mode is the full interactive renderer
(RenderSystem.cpp:53-60: G-buffer raster + Lighting.comp deferred shading
+ forward composite); our analog is hybrid/renderer.py (ray-cast G-buffer
+ Lighting.comp:71-190 math + IBL).  Until now its evidence was unit
tests plus a 256x144 CPU aniso probe — this tool renders ONE 1080p hybrid
frame of the bench scene on the TPU and records:

- wall time (jit-warm, best of N),
- the PNG,
- RMSE vs the same frame computed by the CPU oracle (interpret path) at a
  reduced size (the CPU cannot afford 1080p; the RMSE certifies the TPU
  lowering, the 1080p wall time certifies the scale).

Artifacts land in artifacts/hybrid/.

Run:  python tools/hybrid_artifact.py          (TPU; CPU fallback works)
      VRT_HYBRID_SMALL=1 python tools/...      (CPU smoke: 256x144 only)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def _render(scene, cfg):
    import jax

    from vulkanraytracing_tpu.hybrid.renderer import render_hybrid
    from vulkanraytracing_tpu.scene.camera import Camera

    cam = Camera(cfg.camera).to_device()
    t0 = time.perf_counter()
    img = render_hybrid(scene, cfg, cam)
    img = np.asarray(img)  # force completion through the relay
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    img = np.asarray(render_hybrid(scene, cfg, cam))
    hot = time.perf_counter() - t0
    del jax
    return img, warm, hot


def main() -> int:
    small = bool(os.environ.get("VRT_HYBRID_SMALL"))
    if small:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from vulkanraytracing_tpu.accel import build_scene_bvh
    from vulkanraytracing_tpu.app.image_io import rmse, write_png
    from vulkanraytracing_tpu.config import CameraConfig, Config, TraversalMode
    from vulkanraytracing_tpu.scene.procedural import sponza_like_scene

    out_dir = Path(__file__).resolve().parent.parent / "artifacts" / "hybrid"
    out_dir.mkdir(parents=True, exist_ok=True)

    tris = int(os.environ.get("VRT_HYBRID_TRIS", 20000 if small else 262144))
    scene = build_scene_bvh(
        sponza_like_scene(target_triangles=tris,
                          workload=os.environ.get("VRT_HYBRID_WORKLOAD",
                                                  "real")),
        builder="sah",
    )

    def cfg_for(width, height):
        return Config(
            width=width, height=height,
            traversal=TraversalMode.BVH_PALLAS,
            camera=CameraConfig(
                position=(-16.0, 3.0, 0.0), target=(0.0, 3.0, 0.0),
                aspect_ratio=width / height,
            ),
        )

    report: dict = {"tris": tris}

    # oracle cross-check at CPU-affordable size: TPU lowering vs the same
    # program on CPU (the hybrid pipeline is deterministic — no RNG — so
    # the images agree up to platform float differences)
    ow, oh = 256, 144
    img_small, _, dt_small = _render(scene, cfg_for(ow, oh))
    write_png(out_dir / "hybrid_256x144_device.png", img_small)
    report["small"] = {"size": [ow, oh], "seconds": round(dt_small, 3)}

    if small:
        (out_dir / "report_smoke.json").write_text(json.dumps(report, indent=2))
        print(json.dumps(report))
        return 0

    # the CPU oracle of the small frame, in a subprocess so the forced
    # axon platform of this process doesn't leak in
    import subprocess

    oracle_png = out_dir / "hybrid_256x144_oracle.png"
    if not oracle_png.exists():
        code = (
            "import jax; jax.config.update('jax_platforms','cpu');"
            "import sys; sys.path.insert(0, %r);"
            "from tools.hybrid_artifact import _oracle_small; _oracle_small(%d)"
            % (str(Path(__file__).resolve().parent.parent), tris)
        )
        subprocess.run([sys.executable, "-c", code], check=True,
                       timeout=3600)
    oracle = np.asarray(__import__("PIL.Image", fromlist=["Image"])
                        .open(oracle_png).convert("RGB"))
    # compare in the committed (u8 PNG) domain on both sides
    small_u8 = (np.clip(img_small, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    value = rmse(oracle.astype(np.float32) / 255.0,
                 small_u8.astype(np.float32) / 255.0)
    report["rmse_vs_cpu_oracle"] = value
    report["rmse_pass_1e-3"] = bool(value <= 1e-3)
    print(f"small-frame RMSE vs CPU oracle: {value:.2e}", flush=True)

    # the at-scale number: 1080p on the device
    img, warm, hot = _render(scene, cfg_for(1920, 1080))
    write_png(out_dir / "hybrid_1080p.png", img)
    report["full"] = {
        "size": [1920, 1080],
        "warmup_seconds": round(warm, 2),
        "frame_seconds": round(hot, 3),
        "fps": round(1.0 / hot, 2) if hot > 0 else None,
    }
    (out_dir / "report.json").write_text(json.dumps(report, indent=2))
    print(json.dumps(report))
    return 0


def _oracle_small(tris: int) -> None:
    """CPU-side oracle render (invoked in a subprocess)."""
    from vulkanraytracing_tpu.accel import build_scene_bvh
    from vulkanraytracing_tpu.app.image_io import write_png
    from vulkanraytracing_tpu.config import CameraConfig, Config, TraversalMode
    from vulkanraytracing_tpu.hybrid.renderer import render_hybrid
    from vulkanraytracing_tpu.scene.camera import Camera
    from vulkanraytracing_tpu.scene.procedural import sponza_like_scene

    scene = build_scene_bvh(
        sponza_like_scene(target_triangles=tris,
                          workload=os.environ.get("VRT_HYBRID_WORKLOAD",
                                                  "real")),
        builder="sah",
    )
    cfg = Config(
        width=256, height=144, traversal=TraversalMode.BVH_PALLAS,
        camera=CameraConfig(
            position=(-16.0, 3.0, 0.0), target=(0.0, 3.0, 0.0),
            aspect_ratio=256 / 144,
        ),
    )
    cam = Camera(cfg.camera).to_device()
    img = render_hybrid(scene, cfg, cam)
    out_dir = Path(__file__).resolve().parent.parent / "artifacts" / "hybrid"
    write_png(out_dir / "hybrid_256x144_oracle.png", np.asarray(img))


if __name__ == "__main__":
    raise SystemExit(main())
