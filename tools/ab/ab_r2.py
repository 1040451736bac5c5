"""Round-2 A/Bs for the first fast-TPU window:

1. wide8 leaf test: Moller-Trumbore vs plane-based (VRT_WOOP path)
2. chunked streaming (K=2) vs single in-VMEM table on the same scene
3. any-hit variants of both

Coherent primaries + shuffled (bounce-like) ray sets.  Interleaved
best-of-n via tutil.timed (scalar readback; the tunnel does not block).
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np


import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))
from tutil import timed

from vulkanraytracing_tpu.accel import build_scene_bvh
from vulkanraytracing_tpu.config import CameraConfig, Config, TraversalMode
from vulkanraytracing_tpu.core import rng as rngm
from vulkanraytracing_tpu.pt.integrator import primary_rays
from vulkanraytracing_tpu.pt.render import tile_pixel_coords
from vulkanraytracing_tpu.scene.camera import Camera
from vulkanraytracing_tpu.scene.procedural import sponza_like_scene
import vulkanraytracing_tpu.ops.traverse_wide8 as tw8

W, H, TRIS = 1920, 1080, 262144
cfg = Config(width=W, height=H, ray_chunk_size=1 << 22,
             traversal=TraversalMode.BVH_PALLAS,
             camera=CameraConfig(position=(-16.0, 3.0, 0.0),
                                 target=(0.0, 3.0, 0.0), aspect_ratio=W / H))
base = sponza_like_scene(target_triangles=TRIS)
scene = build_scene_bvh(base, builder="sah")
camera = Camera(cfg.camera).to_device()
px, py, valid, ty, tx = tile_pixel_coords(W, H)
s0, s1 = rngm.pixel_seed(px, py, jnp.uint32(0))
o, d = primary_rays(camera, px, py, W, H, s0, s1)
R = o.shape[0]
tmin = jnp.full((R,), 0.01, jnp.float32)
tmax = jnp.where(valid, 1000.0, 0.0)
perm = jnp.asarray(np.random.default_rng(0).permutation(R))
o_s, d_s, tmin_s, tmax_s = o[perm], d[perm], tmin[perm], tmax[perm]

bvh = tw8._with_bvh8(scene.bvh)
tab_mt, nr = tw8._unified_table8(bvh)
tab_wp, _ = tw8._unified_table8(bvh, woop=True)
tab_mt, tab_wp = jax.device_put(tab_mt), jax.device_put(tab_wp)

chunked = build_scene_bvh(base, builder="sah", chunk_tris=TRIS // 2)
assert chunked.bvh.chunks is not None
tab_ch, nr_ch, K = tw8._chunked_args(chunked.bvh)
tab_ch = jax.device_put(tab_ch)

mrays = R / 1e6


def make(tab, nrr, k, woop, any_hit):
    """Close over the static config (n_chunks/woop/any_hit must be python
    values inside the jitted wrapper, not traced args)."""
    def f(oo, dd, a, b):
        return tw8._traverse_wide8_packed(
            tab, nrr, bvh.tris, oo, dd, a, b,
            cull_backface=not any_hit, any_hit=any_hit,
            n_chunks=k, woop=woop,
        )
    return f


for name, rays in (("primary", (o, d, tmin, tmax)),
                   ("shuffled", (o_s, d_s, tmin_s, tmax_s))):
    for any_hit in (False, True):
        tag = "any" if any_hit else "closest"
        t_mt = timed(f"{name}/{tag}/MT",
                     make(tab_mt, nr, 1, False, any_hit), *rays)
        t_wp = timed(f"{name}/{tag}/woop",
                     make(tab_wp, nr, 1, True, any_hit), *rays)
        t_ch = timed(f"{name}/{tag}/chunkK2",
                     make(tab_ch, nr_ch, K, False, any_hit), *rays)
        print(f"  -> {name}/{tag}: MT {mrays/t_mt:6.1f}  woop {mrays/t_wp:6.1f} "
              f"({t_mt/t_wp:4.2f}x)  chunked {mrays/t_ch:6.1f} Mrays/s "
              f"({t_mt/t_ch:4.2f}x)", flush=True)
