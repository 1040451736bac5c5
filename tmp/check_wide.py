"""Correctness + perf check of traverse_wide vs oracle and subpacket."""
import time, numpy as np, jax, jax.numpy as jnp
from vulkanraytracing_tpu.accel import build_scene_bvh
from vulkanraytracing_tpu.accel.sah import build_bvh_sah
from vulkanraytracing_tpu.config import CameraConfig, Config
from vulkanraytracing_tpu.ops import intersect
import vulkanraytracing_tpu.ops.traverse_wide as tw
import vulkanraytracing_tpu.ops.traverse_subpacket as sp
from vulkanraytracing_tpu.scene.procedural import triangle_soup_scene, sponza_like_scene
from vulkanraytracing_tpu.pt.render import tile_pixel_coords
from vulkanraytracing_tpu.pt.integrator import primary_rays
from vulkanraytracing_tpu.scene.camera import Camera
from vulkanraytracing_tpu.core import rng as rngm

# --- correctness vs brute force on a soup scene ---
scene = triangle_soup_scene(1500, seed=3)
geom, bvh = build_bvh_sah(scene.geometry)
rng = np.random.default_rng(4)
n = 1100
o = jnp.asarray(rng.uniform(-11, 11, (n, 3)).astype(np.float32))
d = rng.normal(0, 1, (n, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
d = jnp.asarray(d)
tmin = jnp.zeros((n,)); tmax = jnp.full((n,), 1e3)

for cull in (True, False):
    brute = intersect.intersect_closest_brute(geom, o, d, tmin, tmax, cull_backface=cull)
    fast = tw.intersect_closest(geom, bvh, o, d, tmin, tmax, cull_backface=cull)
    ok_hit = np.array_equal(np.asarray(brute.is_hit), np.asarray(fast.is_hit))
    hits = np.asarray(brute.is_hit)
    ok_tri = np.array_equal(np.asarray(fast.tri)[hits], np.asarray(brute.tri)[hits])
    print(f"closest cull={cull}: hits_match={ok_hit} tri_match={ok_tri}")
    if not (ok_hit and ok_tri):
        bad = np.nonzero(np.asarray(brute.is_hit) != np.asarray(fast.is_hit))[0][:10]
        print("  mismatched rays:", bad)

brute_any = intersect.intersect_any_brute(geom, o, d, tmin, tmax)
fast_any = tw.intersect_any(geom, bvh, o, d, tmin, tmax)
print("anyhit:", np.array_equal(np.asarray(brute_any), np.asarray(fast_any)))

# --- perf on the bench scene ---
W, H, TRIS = 1920, 1080, 262144
cfg = Config(width=W, height=H,
             camera=CameraConfig(position=(-16.0, 3.0, 0.0), target=(0.0, 3.0, 0.0),
                                 aspect_ratio=W / H))
s2 = build_scene_bvh(sponza_like_scene(target_triangles=TRIS), builder="sah")
bvh2 = s2.bvh
camera = Camera(cfg.camera).to_device()
px, py, valid, ty, tx = tile_pixel_coords(W, H)
s0, s1 = rngm.pixel_seed(px, py, jnp.uint32(0))
o2, d2 = primary_rays(camera, px, py, W, H, s0, s1)
R = o2.shape[0]
t_min = jnp.full((R,), 0.01, jnp.float32)
t_max = jnp.where(valid, 1000.0, 0.0)
table, nr = tw._unified_table(bvh2)

def timed(label, fn):
    h = fn(); jax.tree.map(np.asarray, h)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); h = fn(); jax.tree.map(np.asarray, h)
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best*1e3:.0f} ms -> {R/(best-0.035)/1e6:.1f} Mrays/s")
    return h

hit, iters = tw._traverse_wide_jitted(table, nr, bvh2.tris, o2, d2, t_min, t_max,
                                      cull_backface=True, any_hit=False, return_counters=True)
c = np.asarray(iters).astype(np.int64)
print(f"chunks={len(c)} trips={c[:,0].sum()} int={c[:,1].sum()} leaf={c[:,2].sum()}")

hw = timed("wide primary closest", lambda: tw._traverse_wide_jitted(
    table, nr, bvh2.tris, o2, d2, t_min, t_max,
    cull_backface=True, any_hit=False))
c2 = np.asarray(iters).astype(np.int64)
tt = c[:,0].sum()
print(f"per-trip: see timing / {tt}")

# sanity: wide matches subpacket on bench scene primaries
node_tab, tri_tab = sp._packed_tables(bvh2)
hs = sp._traverse_subpacket_jitted(node_tab, tri_tab, bvh2.tris, o2, d2, t_min, t_max,
                                   cull_backface=True, any_hit=False, interpret=False)
m = np.asarray(hs.t < 1e30)
mw = np.asarray(hw.t < 1e30)
print("bench primaries: hit mask equal:", np.array_equal(m, mw),
      " tri equal:", np.array_equal(np.asarray(hs.tri)[m], np.asarray(hw.tri)[m]))

_ = timed("wide sun shadow anyhit", lambda: tw._traverse_wide_jitted(
    table, nr, bvh2.tris,
    o2 + 1e-3*jnp.array([0.3,0.8,0.5])/jnp.linalg.norm(jnp.array([0.3,0.8,0.5])),
    jnp.broadcast_to(jnp.array([0.3,0.8,0.5])/jnp.linalg.norm(jnp.array([0.3,0.8,0.5])), (R,3)),
    jnp.full((R,),1e-3,jnp.float32), jnp.where(mw, 1000.0, 0.0),
    cull_backface=False, any_hit=True))

key = jax.random.PRNGKey(0)
rd = jax.random.normal(key, (R,3)); rd = rd/jnp.linalg.norm(rd,axis=1,keepdims=True)
p = o2 + d2 * jnp.where(hw.t < 1e30, hw.t, 1.0)[:,None]
_ = timed("wide random bounce closest", lambda: tw._traverse_wide_jitted(
    table, nr, bvh2.tris, p + 1e-3*rd, rd,
    jnp.full((R,),1e-3,jnp.float32), jnp.where(mw, 1000.0, 0.0),
    cull_backface=True, any_hit=False))
