"""Anisotropy divergence measurement (VERDICT r2 item 9).

The reference samples hybrid-mode textures with hardware anisotropy 16
(VulkanConfig.hpp:44, Renderer.cpp:20-28); the pool's trilinear path
(the round-2 divergence) selects its mip from the MAX footprint axis,
which over-blurs along the minor axis exactly where anisotropy matters:
textured surfaces at grazing angles.

This tool renders a checkerboard ground plane at a grazing angle in
hybrid mode three ways — trilinear (taps=1), the production N-tap
anisotropic approximation (taps=4), and a 16-tap reference proxy for
the hardware's maxAnisotropy=16 — and records the pairwise RMSEs.
The (trilinear vs 16-tap) number is the divergence the round-2 docs
left unmeasured; (4-tap vs 16-tap) is the residual divergence of the
production path.  Images land in artifacts/aniso/.

Run: JAX_PLATFORMS=cpu python tools/measure_aniso.py   (~2 min)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

# Force CPU on non-TPU hosts WITHOUT initializing the backend first:
# jax.default_backend() would initialize whatever platform wins (e.g. GPU),
# after which the config update is a no-op.  The platforms config is
# readable uninitialized; hosts that explicitly select a TPU-class
# platform (JAX_PLATFORMS/jax_platforms naming tpu or axon, as the site
# hook on this box does) keep it; everything else — including an unset
# default that could resolve to GPU — runs the measurement on CPU.
_plat = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
if not any(p in _plat for p in ("tpu", "axon")):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from vulkanraytracing_tpu.accel import build_scene_bvh
from vulkanraytracing_tpu.app.image_io import write_png
from vulkanraytracing_tpu.env.ibl import bake_ibl
from vulkanraytracing_tpu.config import CameraConfig, Config, TraversalMode
from vulkanraytracing_tpu.hybrid.renderer import render_hybrid
from vulkanraytracing_tpu.ops.texture import WRAP_REPEAT, build_texture_pool
from vulkanraytracing_tpu.scene.camera import Camera
from vulkanraytracing_tpu.scene.types import (
    Scene,
    constant_environment,
    make_materials,
    make_trace_geometry,
    no_direct_light,
)


def grazing_plane_scene() -> Scene:
    """A large textured ground plane, uv tiled 24x so the checker pattern
    has high frequency along the view direction at a grazing angle."""
    s = 40.0
    positions = np.array(
        [[-s, 0, -s], [s, 0, -s], [s, 0, s], [-s, 0, s]], np.float32
    )
    uvs = np.array([[0, 0], [24, 0], [24, 24], [0, 24]], np.float32)
    indices = np.array([[0, 2, 1], [0, 3, 2]], np.int32)
    geom = make_trace_geometry(
        positions, indices, uvs=uvs, cull_disable=True, opaque=True
    )
    # 64x64 checker, 8-texel squares, full mip chain
    c = np.indices((64, 64)).sum(axis=0) // 8 % 2
    img = np.zeros((64, 64, 4), np.uint8)
    img[..., :3] = np.where(c[..., None] > 0, 230, 25)
    img[..., 3] = 255
    pool = build_texture_pool([img], [(WRAP_REPEAT, WRAP_REPEAT)])
    mats = make_materials(
        base_color_factors=[(1.0, 1.0, 1.0, 1.0)],
        roughness_factors=[1.0],
        metallic_factors=[0.0],
        base_color_textures=[0],
    )
    return Scene(
        geometry=geom,
        materials=mats,
        environment=constant_environment((1.0, 1.0, 1.0)),
        direct_light=no_direct_light(),
        point_lights=None,
        bvh=None,
        textures=pool,
    )


def main() -> None:
    w, h = 256, 144
    cam_cfg = CameraConfig(
        position=(0.0, 0.35, 16.0),    # 0.35 up, looking far forward:
        target=(0.0, 0.0, -20.0),      # ~1 degree grazing at the horizon
        aspect_ratio=w / h,
        x_fov=float(np.radians(75.0)),
    )
    scene = build_scene_bvh(grazing_plane_scene())
    # constant white env -> uniform IBL ambient lights the plane
    scene = scene._replace(
        environment=bake_ibl(
            scene.environment, irradiance_size=8, reflection_size=16,
            brdf_size=16,
        )
    )
    camera = Camera(cam_cfg).to_device()

    renders = {}
    for taps in (1, 4, 16):
        cfg = Config(
            width=w, height=h, traversal=TraversalMode.BVH,
            camera=cam_cfg, hybrid_aniso_taps=taps,
            parity_quantization=False,
        )
        img = np.asarray(render_hybrid(scene, cfg, camera))
        renders[taps] = img.astype(np.float64)

    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", "aniso",
    )
    os.makedirs(outdir, exist_ok=True)
    for taps, img in renders.items():
        write_png(os.path.join(outdir, f"grazing_taps{taps}.png"),
                  img.astype(np.float32))

    def rmse(a, b):
        return float(np.sqrt(np.mean((a - b) ** 2)))

    report = {
        "scene": "checker plane, grazing view, 256x144 hybrid",
        "rmse_trilinear_vs_aniso16": rmse(renders[1], renders[16]),
        "rmse_aniso4_vs_aniso16": rmse(renders[4], renders[16]),
        "rmse_trilinear_vs_aniso4": rmse(renders[1], renders[4]),
        "gate": 1e-3,
    }
    report["trilinear_breaks_gate"] = (
        report["rmse_trilinear_vs_aniso16"] > report["gate"]
    )
    report["aniso4_breaks_gate"] = (
        report["rmse_aniso4_vs_aniso16"] > report["gate"]
    )
    with open(os.path.join(outdir, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
