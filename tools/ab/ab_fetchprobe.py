"""Fetch-latency probe (backlog #7: is software pipelining worth it?).

Per KERNEL_NOTES the per-row visit costs ~72 ns: ~33 ns of scalar-indexed
VMEM row fetch + ~40 ns of VPU decision math.  The fetch ADDRESS depends
on the previous trip's compute, so the load latency may be a dependency
stall that two interleaved independent waves could hide.  This probe
measures that stall without building the pipelined kernel:

  VRT_PROBE_FETCH=       (unset)  production fetch        (baseline)
  VRT_PROBE_FETCH=const  per-trip-varying rows, address independent of
                         the trip's own compute (stall exposed -> gone)
  VRT_PROBE_FETCH=skip   no fetch at all (raw load issue cost)

const/skip CORRUPT traversal results, so times are normalized per trip
and per visit via the kernel's counters.  Run each config in a FRESH
process (the env is read at import):

  for p in "" const skip; do
    VRT_PROBE_FETCH=$p VRT_PROBE_TRIPS=300 python tools/ab/ab_fetchprobe.py
  done

If const's ns/trip is well below baseline's, the dependency stall is
real and the two-wave pipelined kernel is worth building; if const is a
wash, the fetch is already overlapped/cheap and backlog #7 is dead.
"""
import os as _os
import sys as _sys
import time

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

import vulkanraytracing_tpu.ops.traverse_wide8 as tw8
from vulkanraytracing_tpu.accel import build_scene_bvh
from vulkanraytracing_tpu.config import CameraConfig, Config, TraversalMode
from vulkanraytracing_tpu.core import rng as rngm
from vulkanraytracing_tpu.core.jit_utils import hot_jit
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

mode = _os.environ.get("VRT_PROBE_FETCH", "") or "base"
cap = tw8.PROBE_TRIPS
print(f"probe={mode} trips_cap={cap} R={R}", flush=True)


def run(oo, dd, a, b):
    hit, iters = tw8._traverse_wide8_packed(
        table, nr, bvh.tris, oo, dd, a, b,
        cull_backface=True, any_hit=False, return_counters=True,
    )
    # one-scalar readback (tutil rationale); counters ride separately
    acc = jnp.sum(jnp.where(jnp.isfinite(hit.t), hit.t, 0.0) * 1e-9)
    return acc, iters


g = hot_jit(run)
for name, rs in rays.items():
    acc, iters = g(*rs)  # compile + warm
    jax.block_until_ready(acc)
    best = 1e9
    for _ in range(6):
        t0 = time.perf_counter()
        acc, it2 = g(*rs)
        float(acc)
        best = min(best, time.perf_counter() - t0)
    n = np.asarray(it2)[0]
    trips, n_int, n_leaf = int(n[0]), int(n[1]), int(n[2])
    visits = n_int + n_leaf
    print(
        f"{mode}/{name}: {best * 1e3:8.2f} ms  trips={trips} int={n_int} "
        f"leaf={n_leaf} -> {best / max(trips, 1) * 1e6:7.2f} us/trip "
        f"{best / max(visits, 1) * 1e9:7.1f} ns/visit",
        flush=True,
    )
