"""Traversal speed vs ray ordering, part 2: global orderings.

Cases (all prepared OUTSIDE the timed region; traversal time only):
  none          — raw bounce wavefront
  seg2048       — current production segment-local order
  row_global    — seg2048 within rows, then whole 128-ray rows argsorted by
                  their min key (cheap: 16k argsort + row gather)
  global        — full element argsort by (alive, octant, morton)
"""
import sys, time, numpy as np, jax, jax.numpy as jnp
from functools import partial
sys.path.insert(0, "/root/repo/tmp")
from tutil import timed
from vulkanraytracing_tpu.accel import build_scene_bvh
from vulkanraytracing_tpu.config import CameraConfig, Config, TraversalMode
from vulkanraytracing_tpu.pt.render import tile_pixel_coords
from vulkanraytracing_tpu.pt.integrator import primary_rays
from vulkanraytracing_tpu.scene.camera import Camera
from vulkanraytracing_tpu.scene.procedural import sponza_like_scene
from vulkanraytracing_tpu.core import rng as rngm
from vulkanraytracing_tpu.core.jit_utils import hot_jit
from vulkanraytracing_tpu.ops import reorder, trace

W, H, TRIS = 1920, 1080, 262144
cfg = Config(width=W, height=H, ray_chunk_size=1 << 22,
             traversal=TraversalMode.BVH_PALLAS,
             camera=CameraConfig(position=(-16.0, 3.0, 0.0), target=(0.0, 3.0, 0.0),
                                 aspect_ratio=W / H))
scene = build_scene_bvh(sponza_like_scene(target_triangles=TRIS), builder="sah")
camera = Camera(cfg.camera).to_device()
px, py, valid, ty, tx = tile_pixel_coords(W, H)
s0, s1 = rngm.pixel_seed(px, py, jnp.uint32(0))
o, d = primary_rays(camera, px, py, W, H, s0, s1)
R = o.shape[0]
tmin = jnp.full((R,), 0.01, jnp.float32)
tmax = jnp.where(valid, 1000.0, 0.0)

closest = lambda o, d, a, b: trace.trace_closest(scene, cfg, o, d, a, b)
hit = hot_jit(closest)(o, d, tmin, tmax)
jax.block_until_ready(hit)
alive = hit.t < 1e30
p = o + d * jnp.where(alive, hit.t, 1.0)[:, None]
at = jnp.where(alive, 1000.0, 0.0)
e3 = jnp.full((R,), 1e-3, jnp.float32)
rd = jax.random.normal(jax.random.PRNGKey(0), (R, 3))
rd = rd / jnp.linalg.norm(rd, axis=1, keepdims=True)
ob = p + 1e-3 * rd
lo, hi = trace._root_bounds(scene.bvh)
keys = np.asarray(hot_jit(reorder.ray_sort_keys)(ob, rd, e3, at, lo, hi))

obn, rdn, e3n, atn = (np.asarray(x) for x in (ob, rd, e3, at))

def case(name, perm):
    arrs = [jnp.asarray(a[perm]) for a in (obn, rdn, e3n, atn)]
    t = timed(f"bounce traversal, {name:10s}", closest, *arrs)
    print(f"    -> {R/t/1e6:6.2f} Mrays/s", flush=True)

case("none", np.arange(R))
# seg-local 2048
seg = 2048
within = np.argsort(keys.reshape(-1, seg), axis=1, kind="stable")
perm_seg = (within + (np.arange(R // seg) * seg)[:, None]).reshape(-1)
case("seg2048", perm_seg)
# row-global: seg order, then rows sorted by per-row min key
ks = keys[perm_seg].reshape(-1, 128)
row_key = ks.min(axis=1)
row_perm = np.argsort(row_key, kind="stable")
perm_rg = perm_seg.reshape(-1, 128)[row_perm].reshape(-1)
case("row_global", perm_rg)
# full global
perm_g = np.argsort(keys, kind="stable")
case("global", perm_g)

# costs of the cheap building blocks
rows = R // 128
timed("row argsort (16k) on device", lambda k: jnp.argsort(k), jnp.asarray(row_key))
state25 = jnp.asarray(np.random.randn(rows, 128 * 25).astype(np.float32))
rp = jnp.asarray(row_perm.astype(np.int32))
timed("row gather 25col (rows,128*25)", lambda s, q: s[q], state25, rp)
timed("row scatter 25col", lambda s, q: jnp.zeros_like(s).at[q].set(s), state25, rp)
col = jnp.asarray(np.random.randn(R).astype(np.float32))
permd = jnp.asarray(perm_g.astype(np.int32))
timed("elem gather 1col", lambda c, q: c[q], col, permd)
timed("elem scatter 1col", lambda c, q: jnp.zeros_like(c).at[q].set(c), col, permd)
