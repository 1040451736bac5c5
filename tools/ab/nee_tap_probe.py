"""In-context bisect of the cornell TPU parity FAIL (round 4).

Standalone kernel probes bit-match (primary closest AND bounce-0 NEE
any-hit), yet the full render diverges at 2-3 pixels (max |d| 0.435) on
TPU with EVERY production backend (wide8 Pallas, packet XLA) and with the
wavefront sort on or off.  The remaining hypothesis space is *in-context*
divergence: the oracle and production programs are different XLA graphs,
so fusion/FMA contraction can round the shading-produced shadow-ray
inputs differently, or round the brute-force oracle's own intersection
math differently than the standalone brute run.

This probe jits the whole pathtrace with VRT_DEBUG_NEE_TAP=1 (pathtrace
then returns the bounce-0 NEE wavefront: primary hit t/tri/u/v, hit
point p, shading normal, shadow-ray inputs and both occlusion verdicts,
as computed INSIDE each full program) under both configs and diffs
everything bitwise.  The first array that differs names the culprit
stage; lanes where verdicts differ but inputs bit-match indict the
traversal backends in context.

Usage: python tools/ab/nee_tap_probe.py [SIZE] [BOUNCES]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

os.environ["VRT_DEBUG_NEE_TAP"] = "1"


def main() -> None:
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    bounces = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    import jax

    if os.environ.get("VRT_PROBE_CPU"):
        # the site hook forces jax_platforms="axon,cpu" via config, which
        # beats the JAX_PLATFORMS env var
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from vulkanraytracing_tpu.accel import build_scene_bvh
    from vulkanraytracing_tpu.config import CameraConfig, Config, TraversalMode
    from vulkanraytracing_tpu.pt.integrator import pathtrace
    from vulkanraytracing_tpu.pt.render import tile_pixel_coords
    from vulkanraytracing_tpu.scene.camera import Camera
    from vulkanraytracing_tpu.scene.procedural import cornell_box_scene

    print(f"backend: {jax.default_backend()}", flush=True)

    cam = CameraConfig(
        position=(0.0, 0.0, 3.2), aspect_ratio=1.0,
        x_fov=float(np.radians(60.0)),
    )
    base = Config(
        width=size, height=size, camera=cam,
        parity_quantization=False, tone_map_before_accumulation=False,
        alpha_visibility=False, max_bounce_count=bounces,
    )
    scene = cornell_box_scene()
    px, py, valid, ty, tx = tile_pixel_coords(size, size)

    # ONE built scene for both: the oracle brute-forces the permuted
    # geometry, so equal-t ties resolve to the same lowest-id winner as
    # the kernels' lexicographic (t, id) tie-break
    built = build_scene_bvh(scene, builder="sah")
    taps = {}
    colors = {}
    for backend, trav in (
        ("oracle", TraversalMode.BRUTE_FORCE),
        ("production", TraversalMode.BVH_PALLAS),
    ):
        s = built
        cfg = base.replace(traversal=trav)
        camera = Camera(cfg.camera).to_device()

        @jax.jit
        def run(px, py, valid, camera=camera, s=s, cfg=cfg):
            return pathtrace(
                s, cfg, camera, px, py, size, size,
                jnp.uint32(0), valid=valid,
            )

        color, stats, tap = run(px, py, valid)
        colors[backend] = np.asarray(color)
        taps[backend] = {k: np.asarray(v) for k, v in tap.items()}
        print(f"{backend}: done ({float(stats.rays):.0f} rays)", flush=True)

    cd = np.abs(colors["oracle"] - colors["production"])
    bad_px = int((cd.max(axis=-1) > 0).sum())
    print(f"\nfinal color: {bad_px}/{size * size} lanes differ, "
          f"max |d| {cd.max():.3e}")

    a, b = taps["oracle"], taps["production"]
    order = ["px", "py", "hit_t", "hit_tri", "hit_u", "hit_v", "p",
             "n_shading", "pl_o", "pl_d", "pl_tmin", "pl_tmax", "sun_o",
             "sun_tmax", "pl_contrib", "sun_contrib", "occluded",
             "sun_occluded"]
    print("\n=== bitwise diff, in program order ===")
    first_bad = None
    for k in order:
        x, y = a[k], b[k]
        if np.issubdtype(x.dtype, np.floating):
            neq = x.astype(np.float32).view(np.uint32) != \
                y.astype(np.float32).view(np.uint32)
        else:
            neq = x != y
        lanes = np.unique(np.nonzero(neq)[0])
        maxd = 0.0
        if np.issubdtype(x.dtype, np.floating) and lanes.size:
            maxd = float(np.abs(x - y).max())
        print(f"{k:14s}: {lanes.size:6d} lanes differ"
              + (f", max |d| {maxd:.3e}" if maxd else ""), flush=True)
        if lanes.size and first_bad is None:
            first_bad = (k, lanes)

    if first_bad is None:
        print("\nall tapped arrays bit-identical — divergence is AFTER "
              "bounce-0 NEE")
        # still dump the worst final-color lanes for the next bisect step
        worst = np.argsort(-cd.max(axis=-1))[:4]
        for lane in worst:
            print(f"lane {lane}: px={a['px'][lane]} py={a['py'][lane]} "
                  f"oracle={colors['oracle'][lane]} "
                  f"prod={colors['production'][lane]}")
        return

    k, lanes = first_bad
    print(f"\n=== first divergence: {k}; dumping up to 8 lanes ===")
    for lane in lanes[:8]:
        print(f"\nlane {lane}: px={a['px'][lane]} py={a['py'][lane]}")
        for kk in order:
            xa, xb = a[kk][lane], b[kk][lane]
            same = np.array_equal(xa, xb)
            mark = " " if same else "*"
            print(f" {mark} {kk:14s} oracle={xa!r}  prod={xb!r}")


if __name__ == "__main__":
    main()
