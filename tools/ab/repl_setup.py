"""Preload for the interactive TPU experiment REPL (tmux session)."""
import os, sys, time
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools/ab")
import jax, jax.numpy as jnp, numpy as np
from tutil import timed
from perf_inframe_state import build_state
from vulkanraytracing_tpu.accel.lbvh import probe_cut
from vulkanraytracing_tpu.core.jit_utils import hot_jit
from vulkanraytracing_tpu.ops import trace, reorder
import vulkanraytracing_tpu.ops.traverse_wide8 as tw8

t0 = time.time()
(scene, cfg, sh_o, sh_ts, ldir, sh_tp, lpos, R,
 mo, md, mtmin, mtmax) = build_state(bounces=2, with_material=True)
bvh = scene.bvh
f32 = jnp.float32
sun_d = jnp.broadcast_to(
    -scene.direct_light.direction[:3]
    / jnp.linalg.norm(scene.direct_light.direction[:3]), (R, 3))
tmin0 = jnp.full((R,), 1e-3, f32)
pl_o = sh_o + ldir * sh_tp[:, None]
pl_d = -ldir
pl_tmax = jnp.where(sh_tp > 0, jnp.maximum(sh_tp - 1e-3, 0.0), -1.0)
pl_tmin = jnp.zeros((R,), f32)
print(f"state ready in {time.time()-t0:.0f}s  R={R}", flush=True)
