"""Perf probe: sub-packet traversal on the bench scene (primaries/shadow/bounce)."""
import time, numpy as np, jax, jax.numpy as jnp
import vulkanraytracing_tpu.ops.traverse_subpacket as sp
from vulkanraytracing_tpu.accel import build_scene_bvh
from vulkanraytracing_tpu.config import CameraConfig, Config
from vulkanraytracing_tpu.scene.camera import Camera
from vulkanraytracing_tpu.scene.procedural import sponza_like_scene
from vulkanraytracing_tpu.pt.render import tile_pixel_coords
from vulkanraytracing_tpu.pt.integrator import primary_rays
from vulkanraytracing_tpu.core import rng as rngm

def main(W=512, H=288, TRIS=65536, builder="sah"):
    cfg = Config(width=W, height=H, camera=CameraConfig(position=(-16.0,3.0,0.0), target=(0.0,3.0,0.0), aspect_ratio=W/H))
    scene = sponza_like_scene(target_triangles=TRIS)
    scene = build_scene_bvh(scene, builder=builder)
    bvh = scene.bvh
    px, py, valid, ty, tx = tile_pixel_coords(W, H)
    s0,s1 = rngm.pixel_seed(px, py, jnp.uint32(0))
    cam = Camera(cfg.camera).to_device()
    o, d = primary_rays(cam, px, py, W, H, s0, s1)
    R = o.shape[0]
    t_min = jnp.full((R,), 0.01, jnp.float32)
    t_max = jnp.where(valid, 1000.0, 0.0)
    node_tab, tri_tab = sp._packed_tables(bvh)


    def timed(label, o,d,tmin,tmax, any_hit=False):
        cull = not any_hit
        h = sp._traverse_subpacket_jitted(node_tab, tri_tab, bvh.tris, o,d,tmin,tmax, cull_backface=cull, any_hit=any_hit, interpret=False)
        np.asarray(h.t)
        best=1e9
        for _ in range(3):
            t0=time.perf_counter()
            h = sp._traverse_subpacket_jitted(node_tab, tri_tab, bvh.tris, o,d,tmin,tmax, cull_backface=cull, any_hit=any_hit, interpret=False)
            np.asarray(h.t); best=min(best,time.perf_counter()-t0)
        comp = best - 0.035
        print(f"{label}: {best*1e3:.1f} ms (comp ~{comp*1e3:.0f}) -> {R/comp/1e6:.1f} Mrays/s")
        return h

    hit = timed("primary closest", o,d,t_min,t_max)
    p = o + d * jnp.where(hit.t < 1e30, hit.t, 1.0)[:,None]
    alive = hit.t < 1e30
    sun = jnp.array([0.3, 0.8, 0.5]); sun = sun/jnp.linalg.norm(sun)
    sd = jnp.broadcast_to(sun, (R,3))
    timed("sun shadow anyhit", p + 1e-3*sd, sd, jnp.full((R,),1e-3,jnp.float32), jnp.where(alive, 1000.0, 0.0), any_hit=True)
    key = jax.random.PRNGKey(0)
    rd = jax.random.normal(key, (R,3)); rd = rd/jnp.linalg.norm(rd,axis=1,keepdims=True)
    timed("random bounce closest", p + 1e-3*rd, rd, jnp.full((R,),1e-3,jnp.float32), jnp.where(alive, 1000.0, 0.0))

if __name__ == "__main__":
    main()
