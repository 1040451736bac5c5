"""A/B: two-wave software-pipelined blocks (pair=True) vs production.

Backlog #7 made concrete: KERNEL_NOTES puts the per-row visit at ~72 ns
of which ~33 ns is the scalar-indexed row fetch whose ADDRESS depends on
the previous trip's decisions.  Pair mode runs two independent W-row
waves per block so each wave's fetches can hide under the other wave's
decision math (see traverse_wide8._kernel's pair tail).  Both modes are
bitwise identical (tests/test_pallas.py::test_pair_mode_matches_single).

Run on TPU:  python tools/ab/ab_pair.py
Sets: coherent primaries + shuffled (bounce-like), closest + any-hit.
"""
import os as _os
import sys as _sys

import jax
import jax.numpy as jnp
import numpy as np

_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
_sys.path.insert(
    0,
    _os.path.dirname(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    ),
)
from tutil import timed

import vulkanraytracing_tpu.ops.traverse_wide8 as tw8
from vulkanraytracing_tpu.accel import build_scene_bvh
from vulkanraytracing_tpu.config import CameraConfig, Config, TraversalMode
from vulkanraytracing_tpu.core import rng as rngm
from vulkanraytracing_tpu.pt.integrator import primary_rays
from vulkanraytracing_tpu.pt.render import tile_pixel_coords
from vulkanraytracing_tpu.scene.camera import Camera
from vulkanraytracing_tpu.scene.procedural import sponza_like_scene

W, H, TRIS = 1920, 1080, 262144
cfg = Config(width=W, height=H, ray_chunk_size=1 << 22,
             traversal=TraversalMode.BVH_PALLAS,
             camera=CameraConfig(position=(-16.0, 3.0, 0.0),
                                 target=(0.0, 3.0, 0.0), aspect_ratio=W / H))
scene = build_scene_bvh(sponza_like_scene(target_triangles=TRIS),
                        builder="sah")
camera = Camera(cfg.camera).to_device()
px, py, valid, ty, tx = tile_pixel_coords(W, H)
s0, s1 = rngm.pixel_seed(px, py, jnp.uint32(0))
o, d = primary_rays(camera, px, py, W, H, s0, s1)
R = o.shape[0]
tmin = jnp.full((R,), 0.01, jnp.float32)
tmax = jnp.where(valid, 1000.0, 0.0)
perm = jnp.asarray(np.random.default_rng(0).permutation(R))
rays = {
    "primary": (o, d, tmin, tmax),
    "shuffled": (o[perm], d[perm], tmin[perm], tmax[perm]),
}

bvh = tw8._with_bvh8(scene.bvh)
table, nr = tw8._unified_table8(bvh)
table = jax.device_put(table)
print(f"R={R} tris={TRIS}", flush=True)


def make(pair, any_hit):
    def f(oo, dd, a, b):
        return tw8._traverse_wide8_packed(
            table, nr, bvh.tris, oo, dd, a, b,
            cull_backface=not any_hit, any_hit=any_hit,
            any_order=any_hit, phase_split=any_hit, pair=pair,
        )
    return f


for name, rs in rays.items():
    for any_hit in (False, True):
        tag = "any" if any_hit else "closest"
        t1 = timed(f"{name}/{tag}/single", make(False, any_hit), *rs)
        t2 = timed(f"{name}/{tag}/pair", make(True, any_hit), *rs)
        print(f"{name}/{tag}: pair {t1 / t2:.3f}x", flush=True)
