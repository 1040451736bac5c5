"""A/B: leaf-fetch lane roll (HEAD, tmp/tw8_old.py) vs no-roll working tree.

Primaries + shuffled, closest + any-hit, on the 262k bench scene."""
import importlib.util
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo/tmp")
from tutil import timed

from vulkanraytracing_tpu.accel import build_scene_bvh
from vulkanraytracing_tpu.config import CameraConfig, Config, TraversalMode
from vulkanraytracing_tpu.core import rng as rngm
from vulkanraytracing_tpu.pt.integrator import primary_rays
from vulkanraytracing_tpu.pt.render import tile_pixel_coords
from vulkanraytracing_tpu.scene.camera import Camera
from vulkanraytracing_tpu.scene.procedural import sponza_like_scene
import vulkanraytracing_tpu.ops.traverse_wide8 as tw8_new

spec = importlib.util.spec_from_file_location("tw8_old", "/root/repo/tmp/tw8_old.py")
tw8_old = importlib.util.module_from_spec(spec)
spec.loader.exec_module(tw8_old)

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

bvh = tw8_new._with_bvh8(scene.bvh)
tab, nr = tw8_new._unified_table8(bvh)
tab = jax.device_put(tab)
mrays = R / 1e6


def make(mod, any_hit):
    def f(oo, dd, a, b):
        return mod._traverse_wide8_packed(
            tab, nr, bvh.tris, oo, dd, a, b,
            cull_backface=not any_hit, any_hit=any_hit,
        )
    return f


# correctness cross-check first (device-side compare, scalar readback)
for any_hit in (False, True):
    h_old = jax.jit(make(tw8_old, any_hit))(o, d, tmin, tmax)
    h_new = jax.jit(make(tw8_new, any_hit))(o, d, tmin, tmax)
    same_t = float(jnp.max(jnp.abs(h_old.t - h_new.t)))
    same_tri = int(jnp.sum(h_old.tri != h_new.tri))
    print(f"any_hit={any_hit}: max|dt|={same_t}  tri mismatches={same_tri}",
          flush=True)

for name, rays in (("primary", (o, d, tmin, tmax)),
                   ("shuffled", (o_s, d_s, tmin_s, tmax_s))):
    for any_hit in (False, True):
        tag = "any" if any_hit else "closest"
        t_o = timed(f"{name}/{tag}/roll(old)", make(tw8_old, any_hit), *rays)
        t_n = timed(f"{name}/{tag}/noroll(new)", make(tw8_new, any_hit), *rays)
        print(f"  -> {name}/{tag}: old {mrays/t_o:6.1f}  new {mrays/t_n:6.1f} "
              f"Mrays/s ({t_o/t_n:4.2f}x)", flush=True)
