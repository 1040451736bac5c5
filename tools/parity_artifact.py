"""Parity artifact: the RMSE quality gate, exercised end-to-end.

BASELINE.json names "image RMSE parity" with a 1e-3 gate at 1024 spp.  The
reference renderer is Vulkan/C++ and cannot run on this box, so the gate
is exercised the way the framework will be judged in practice: the
PRODUCTION traversal backend (Pallas wide8) must converge to the same
image as the BRUTE-FORCE oracle — same RNG stream, same estimator, same
accumulation semantics — in BOTH accumulation modes:

- parity mode: tone-map-then-accumulate + RGBA8 quantization per frame
  (the reference's RayGen.rgen:438-447 behavior), and
- linear-HDR mode (the unbiased estimator the framework adds).

It renders Cornell (BASELINE config 1) and a textured quad (config 2's
texture path), writes PNGs + a JSON report under ``artifacts/parity/``.

Run:  python tools/parity_artifact.py            (full: 512x512, 1024 spp)
      VRT_PARITY_SMALL=1 python tools/...        (CPU smoke: 64x64, 8 spp)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np
from PIL import Image

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _textured_quad_scene():
    """A checkered textured quad under constant light (the texture slice of
    BASELINE config 2) — procedural because the box ships no glTF assets."""
    import jax.numpy as jnp

    from vulkanraytracing_tpu.ops.texture import build_texture_pool
    from vulkanraytracing_tpu.scene.types import (
        Scene,
        constant_environment,
        make_materials,
        make_trace_geometry,
        no_direct_light,
    )

    checker = np.zeros((64, 64, 4), np.uint8)
    yy, xx = np.mgrid[0:64, 0:64]
    cells = ((xx // 8 + yy // 8) % 2).astype(bool)
    checker[..., 0] = np.where(cells, 230, 40)
    checker[..., 1] = np.where(cells, 120, 160)
    checker[..., 2] = np.where(cells, 40, 230)
    checker[..., 3] = 255

    positions = np.array(
        [[-1.5, -1.5, 0], [1.5, -1.5, 0], [1.5, 1.5, 0], [-1.5, 1.5, 0]],
        np.float32,
    )
    indices = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    uvs_corner = np.array([[0, 1], [1, 1], [1, 0], [0, 0]], np.float32)
    uvs = uvs_corner[indices].reshape(-1, 2)
    geom = make_trace_geometry(
        positions, indices, uvs=uvs, cull_disable=True
    )
    mats = make_materials(
        base_color_factors=[(1.0, 1.0, 1.0, 1.0)],
        roughness_factors=[0.8],
        metallic_factors=[0.0],
        base_color_textures=[0],
    )
    return Scene(
        geometry=geom,
        materials=mats,
        environment=constant_environment((0.9, 0.9, 0.9)),
        direct_light=no_direct_light(),
        point_lights=None,
        bvh=None,
        textures=build_texture_pool([checker]),
    )


def _render(scene, cfg, spp):
    from vulkanraytracing_tpu.pt.render import render_progressive, to_display
    from vulkanraytracing_tpu.scene.camera import Camera

    cam = Camera(cfg.camera).to_device()
    t0 = time.perf_counter()
    state, rays = render_progressive(scene, cfg, cam, spp=spp)
    dt = time.perf_counter() - t0
    return to_display(state, cfg), rays, dt


def main() -> int:
    small = bool(os.environ.get("VRT_PARITY_SMALL"))
    size, spp = (64, 8) if small else (512, 1024)
    if small or os.environ.get("VRT_PARITY_CPU"):
        # the site hook forces jax_platforms="axon,cpu" via config, which
        # beats the env var — the smoke run must not touch the TPU relay
        import jax

        jax.config.update("jax_platforms", "cpu")

    from vulkanraytracing_tpu.accel import build_scene_bvh
    from vulkanraytracing_tpu.app.image_io import rmse, write_png
    from vulkanraytracing_tpu.config import CameraConfig, Config, TraversalMode
    from vulkanraytracing_tpu.scene.procedural import cornell_box_scene

    out_dir = Path(__file__).resolve().parent.parent / "artifacts" / "parity"
    out_dir.mkdir(parents=True, exist_ok=True)
    out_name = "report_smoke.json" if small else "report.json"
    report_path = out_dir / out_name

    # Incremental checkpoint + resume: a 512^2/1024-spp run spans hours on
    # the shared relay, and round 3 lost the whole artifact to a mid-run
    # outage.  Each completed (case, mode) is flushed to the report file
    # immediately; a rerun skips entries already recorded at the SAME
    # size/spp (VRT_PARITY_FRESH=1 forces a clean slate).
    # Oracle scope (VERDICT r04 weak #4): the oracle is this repo's own
    # brute-force intersector sharing the RNG/tonemap/accumulate code, so
    # the RMSE numbers certify traversal-and-pipeline consistency
    # (production kernels vs exhaustive intersection), NOT cross-binary
    # parity with the Vulkan renderer (which cannot run on this box).
    # Estimator parity with the reference is carried separately by the
    # unit layer: bit-exact RNG vectors vs RayGen.rgen's PCG
    # (tests/test_rng.py), BSDF formula goldens (tests/test_bsdf.py), and
    # the file:line citations threaded through pt/integrator.py.
    report: dict = {
        "size": size, "spp": spp, "cases": {},
        "oracle_scope": (
            "oracle = in-repo brute-force intersector over the same "
            "RNG/tonemap/accumulation pipeline; RMSE certifies "
            "traversal+pipeline consistency. Estimator parity with the "
            "Vulkan reference is carried by the unit layer (bit-exact "
            "RNG vectors, BSDF goldens, RayGen.rgen parity citations) "
            "because the reference binary cannot run in this environment."
        ),
    }
    if report_path.exists() and not os.environ.get("VRT_PARITY_FRESH"):
        try:
            prev = json.loads(report_path.read_text())
        except (json.JSONDecodeError, OSError):
            prev = {}
        if prev.get("size") == size and prev.get("spp") == spp:
            # only entries carrying per-case spp/oracle fields are from
            # this tool version; older-format entries are re-run
            report["cases"] = {
                k: v for k, v in prev.get("cases", {}).items() if "spp" in v
            }
            if report["cases"]:
                print(f"resuming: {sorted(report['cases'])} already done",
                      flush=True)

    def _flush():
        partial = dict(report)
        partial["all_pass"] = all(
            c["passes_1e-3"] for c in report["cases"].values()
        ) if report["cases"] else False
        report_path.write_text(json.dumps(partial, indent=2))

    cam = CameraConfig(
        position=(0.0, 0.0, 3.2), aspect_ratio=1.0,
        x_fov=float(np.radians(60.0)),
    )

    def case(name, scene_fn, needs_alpha=False, oracle=None, case_spp=None,
             case_cam=None):
        """oracle=None -> brute force (ground truth).  For at-scale scenes
        where O(R*T) brute force is unaffordable, pass an oracle
        TraversalMode (e.g. the XLA packet BVH backend, itself
        brute-force-validated on the small cases).

        The BVH is built ONCE and BOTH backends render the same built
        scene (the oracle ignores the tree and brute-forces the permuted
        geometry): equal-t closest-hit ties then resolve to the same
        lowest-id winner on both sides — the kernels' lexicographic
        (t, id) tie-break matches brute argmin only in a shared id space
        (wall-corner ties flipped shading normals when the oracle ran on
        the unpermuted scene: 7.1e-3 RMSE at 512^2, tools/ab/nee_tap_probe.py)."""
        oracle = TraversalMode.BRUTE_FORCE if oracle is None else oracle
        cspp = case_spp or spp
        for mode in ("parity", "hdr"):
            if f"{name}_{mode}" in report["cases"]:
                print(f"{name}/{mode}: skipped (resumed from checkpoint)",
                      flush=True)
                continue
            base = Config(
                width=size, height=size, camera=case_cam or cam,
                parity_quantization=(mode == "parity"),
                tone_map_before_accumulation=(mode == "parity"),
                alpha_visibility=needs_alpha,
            )
            built = build_scene_bvh(scene_fn(), builder="sah")
            imgs = {}
            for backend in ("oracle", "production"):
                scene = built
                if backend == "production":
                    cfg = base.replace(traversal=TraversalMode.BVH_PALLAS)
                else:
                    cfg = base.replace(traversal=oracle)
                pre = "smoke_" if small else ""
                png_path = out_dir / f"{pre}{name}_{mode}_{backend}.png"
                # Crash resilience: a kill between a case's oracle and
                # production renders loses the (hours-long) oracle.  The
                # resume orchestrator may opt in to reusing a backend PNG
                # written AFTER a trusted epoch (the start of the run whose
                # code it trusts); write_png only lands after a complete
                # render, and RMSE is computed on the u8 PNG values, so the
                # reload is lossless.  Stale PNGs from older-code runs sit
                # before the epoch and are re-rendered.
                reuse_after = float(os.environ.get("VRT_PARITY_REUSE_AFTER",
                                                   "inf") or "inf")
                if (png_path.exists()
                        and png_path.stat().st_mtime > reuse_after):
                    img = np.asarray(Image.open(png_path).convert("RGB"))
                    if img.shape[:2] == (size, size):
                        imgs[backend] = img
                        print(f"{name}/{mode}/{backend}: reused "
                              f"{png_path.name} (post-epoch)", flush=True)
                        continue
                img, rays, dt = _render(scene, cfg, cspp)
                imgs[backend] = img
                write_png(png_path, img)
                print(f"{name}/{mode}/{backend}: {rays / 1e6:.1f} Mrays "
                      f"in {dt:.1f}s", flush=True)
            value = rmse(
                imgs["oracle"].astype(np.float32) / 255.0,
                imgs["production"].astype(np.float32) / 255.0,
            )
            report["cases"][f"{name}_{mode}"] = {
                "rmse": value, "passes_1e-3": value <= 1e-3,
                "spp": cspp, "oracle": oracle.name,
            }
            _flush()
            print(f"{name}/{mode}: RMSE {value:.2e} "
                  f"({'PASS' if value <= 1e-3 else 'FAIL'} @1e-3)", flush=True)

    # At-scale case: the 262k-tri bench scene, production wide8 Pallas
    # kernel (with drain+compact) vs the XLA packet BVH backend over the
    # IDENTICAL tree.  Brute force is O(R*T) and unaffordable at 262k
    # tris; the packet backend is itself brute-force-validated above and
    # in tests/test_pallas.py, so the oracle chain is closed.  spp is
    # reduced (the small cases carry the 1024-spp gate; at equal hits
    # the images here are bitwise equal at any spp).
    from vulkanraytracing_tpu.scene.procedural import sponza_like_scene

    sponza_cam = CameraConfig(
        position=(-16.0, 3.0, 0.0), target=(0.0, 3.0, 0.0),
        aspect_ratio=1.0, x_fov=float(np.radians(80.0)),
    )
    case_list = [
        ("cornell", lambda: case("cornell", cornell_box_scene)),
        ("textured", lambda: case("textured", _textured_quad_scene,
                                  needs_alpha=False)),
    ]
    if not small:  # TPU-scale case; interpret-mode Pallas can't afford it
        case_list.append(("sponza262k", lambda: case(
            "sponza262k", lambda: sponza_like_scene(target_triangles=262144),
            oracle=TraversalMode.BVH, case_spp=128,
            case_cam=sponza_cam,
        )))
    # VRT_PARITY_FIRST="sponza262k,..." promotes named cases to the front
    # (e.g. a resume window short on TPU time runs the cheapest missing
    # case first); unnamed cases keep their relative order.
    first = [s for s in os.environ.get("VRT_PARITY_FIRST", "").split(",") if s]
    case_list.sort(key=lambda kv: first.index(kv[0]) if kv[0] in first
                   else len(first))
    for _, run in case_list:
        run()

    report["all_pass"] = all(c["passes_1e-3"] for c in report["cases"].values())
    # the committed artifact is the full-size TPU run; smoke runs write
    # report_smoke.json and must not clobber it
    report_path.write_text(json.dumps(report, indent=2))
    print(json.dumps(report))
    return 0 if report["all_pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
