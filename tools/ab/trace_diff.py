"""Single-trace backend diff on TPU (round-4 cornell parity FAIL).

Builds cornell + SAH BVH, generates the 64x64 primary-ray wavefront (no
jitter: pixel centers), and traces it with every closest-hit backend,
comparing (tri, t) per ray against the brute-force oracle.  Also runs the
production wide8 kernel TWICE to separate nondeterminism (race/memory bug)
from deterministic numeric divergence.

Usage: python tools/ab/trace_diff.py [SIZE] [--bounce]
  --bounce: additionally diff a synthetic incoherent bounce-like wavefront
  (hit points jittered into the box interior, random directions).
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))


def main() -> None:
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 64

    import jax
    import jax.numpy as jnp

    from vulkanraytracing_tpu.accel.sah import build_scene_bvh_sah
    from vulkanraytracing_tpu.config import CameraConfig, Config, TraversalMode
    from vulkanraytracing_tpu.core import rng
    from vulkanraytracing_tpu.ops import trace
    from vulkanraytracing_tpu.pt.integrator import primary_rays
    from vulkanraytracing_tpu.scene.camera import Camera
    from vulkanraytracing_tpu.scene.procedural import cornell_box_scene

    print(f"backend: {jax.default_backend()}", flush=True)

    scene = build_scene_bvh_sah(cornell_box_scene())
    cam = Camera(CameraConfig(
        position=(0.0, 0.0, 3.2), aspect_ratio=1.0,
        x_fov=float(np.radians(60.0)),
    )).to_device()

    yy, xx = np.mgrid[0:size, 0:size]
    px = jnp.asarray(xx.reshape(-1), jnp.int32)
    py = jnp.asarray(yy.reshape(-1), jnp.int32)
    n = size * size
    s0, s1 = rng.pixel_seed(px, py, jnp.uint32(0))
    o, d = primary_rays(cam, px, py, size, size, s0, s1)
    t_min = jnp.full((n,), 1e-3, jnp.float32)
    t_max = jnp.full((n,), 1e3, jnp.float32)

    def run(mode, tag):
        cfg = Config(width=size, height=size, traversal=mode)
        hit = trace.trace_closest(scene, cfg, o, d, t_min, t_max)
        return {
            "tag": tag,
            "tri": np.asarray(hit.tri),
            "t": np.asarray(hit.t),
            "u": np.asarray(hit.u),
            "v": np.asarray(hit.v),
            "is_hit": np.asarray(hit.is_hit),
        }

    ref = run(TraversalMode.BRUTE_FORCE, "brute")
    results = [
        run(TraversalMode.BVH, "packet"),
        run(TraversalMode.BVH_PER_RAY, "per_ray"),
        run(TraversalMode.BVH_PALLAS, "wide8_a"),
        run(TraversalMode.BVH_PALLAS, "wide8_b"),
    ]

    def compare(a, b):
        tri_d = (a["tri"] != b["tri"]) & (a["is_hit"] | b["is_hit"])
        t_d = np.abs(a["t"] - b["t"])
        t_d = np.where(a["is_hit"] & b["is_hit"], t_d, 0.0)
        hit_d = a["is_hit"] != b["is_hit"]
        idx = np.where(tri_d | hit_d | (t_d > 1e-5))[0]
        print(f"{a['tag']} vs {b['tag']}: {tri_d.sum()} tri diffs, "
              f"{hit_d.sum()} hit-flag diffs, max |t| diff {t_d.max():.3e}, "
              f"{len(idx)} rays differ", flush=True)
        for i in idx[:8]:
            print(f"  ray {i}: {a['tag']} tri={a['tri'][i]} t={a['t'][i]:.7f} "
                  f"u={a['u'][i]:.5f} v={a['v'][i]:.5f} hit={a['is_hit'][i]} | "
                  f"{b['tag']} tri={b['tri'][i]} t={b['t'][i]:.7f} "
                  f"u={b['u'][i]:.5f} v={b['v'][i]:.5f} hit={b['is_hit'][i]}",
                  flush=True)
        return idx

    for r in results:
        compare(ref, r)
    compare(results[2], results[3])  # wide8 determinism

    # --- any-hit on the bounce-0 shadow wavefront shape ---------------
    # cornell NEE: rays from primary hit points toward each point light,
    # window [RAY_MIN_T, dist - eps] (no RNG involved -> deterministic).
    from vulkanraytracing_tpu.ops import intersect as isect
    from vulkanraytracing_tpu.ops import traverse_wide8

    hitp = o + ref["t"][..., None] * np.asarray(d)
    hitp = jnp.asarray(hitp, jnp.float32)
    lights = np.array([[0.0, 0.6, 0.6], [-0.6, -0.2, 0.6]], np.float32)
    for li, lp in enumerate(lights):
        seg = jnp.asarray(lp)[None, :] - hitp
        dist = jnp.linalg.norm(seg, axis=1)
        ldir = seg / jnp.maximum(dist[:, None], 1e-12)
        alive = jnp.asarray(ref["is_hit"])
        tmin = jnp.full((n,), 1e-3, jnp.float32)
        tmax = jnp.where(alive, jnp.maximum(dist - 1e-3, 0.0), 0.0)
        brute_occ = np.asarray(
            isect.intersect_any_brute(scene.geometry, hitp, ldir, tmin, tmax)
        )
        wide_occ = np.asarray(
            traverse_wide8.intersect_any(
                scene.geometry, scene.bvh, hitp, ldir, tmin, tmax
            )
        )
        bad = np.where(brute_occ != wide_occ)[0]
        print(f"anyhit light{li}: {len(bad)} rays differ", flush=True)
        for i in bad[:6]:
            print(f"  ray {i}: brute occ={brute_occ[i]} wide8 occ={wide_occ[i]} "
                  f"o={np.asarray(hitp)[i]} d={np.asarray(ldir)[i]} "
                  f"tmax={float(tmax[i]):.6f}", flush=True)


if __name__ == "__main__":
    main()
