"""Treelet-binning viability stats (round 3).

Question: if bounce rays were binned to upper-tree subtrees (one subtree
per 128-lane row), what is the (ray, subtree) pair expansion factor?
A row would then traverse the union of 128 same-subtree rays instead of
the union of 128 merely-sorted rays (166 visits/row vs 22 for primaries,
KERNEL_NOTES).  Binning is viable only if

    expansion x per-pair visit cost  <  union visits saved.

Reports, per cut cap (128/256/512), on the REAL sorted bounce-2 material
ray set:
  - mean/p50/p90 entered-subtree count per alive ray (= expansion);
  - the same with t_max clamped to the ray's TRUE hit t (what perfect
    near-ordered pruning could reach — a lower bound);
  - current row-union breadth (what the shared cursor pays today).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

from perf_inframe_state import build_state
from vulkanraytracing_tpu.accel.lbvh import probe_cut
from vulkanraytracing_tpu.core.jit_utils import hot_jit
from vulkanraytracing_tpu.ops import trace

(scene, cfg, sh_o, sh_ts, ldir, sh_tp, lpos, R,
 mo, md, mtmin, mtmax) = build_state(bounces=2, with_material=True)

bvh = scene.bvh


def entered_counts(boxes, o, d, t_min, t_max):
    tiny = 1e-30
    inv = 1.0 / jnp.where(jnp.abs(d) < tiny, tiny, d)
    tn = t_min[:, None]
    tf = t_max[:, None]
    for a in range(3):
        lo = (boxes[None, :, a] - o[:, a, None]) * inv[:, a, None]
        hi = (boxes[None, :, a + 3] - o[:, a, None]) * inv[:, a, None]
        tn = jnp.maximum(tn, jnp.minimum(lo, hi))
        tf = jnp.minimum(tf, jnp.maximum(lo, hi))
    ent = tn <= tf
    per_ray = jnp.sum(ent.astype(jnp.int32), axis=1)
    rows = ent.reshape(-1, 128, ent.shape[1]).any(axis=1)
    row_union = jnp.sum(rows.astype(jnp.int32), axis=1)
    return per_ray, row_union


stats = hot_jit(entered_counts)


def report(name, o, d, t_min, t_max, t_true=None):
    alive = np.asarray(t_min <= t_max) & np.asarray(t_max > 0)
    for cap in (128, 256, 512):
        boxes = probe_cut(bvh.nodes, bvh.child_index, cap=cap)
        per_ray, row_union = jax.block_until_ready(
            stats(boxes, o, d, t_min, t_max))
        pr = np.asarray(per_ray)[alive]
        ru = np.asarray(row_union)
        line = (f"{name} cap={boxes.shape[0]:4d}: pair-expansion "
                f"mean {pr.mean():.2f} p50 {np.percentile(pr,50):.0f} "
                f"p90 {np.percentile(pr,90):.0f} max {pr.max()}; "
                f"row-union mean {ru.mean():.1f}")
        if t_true is not None:
            tt = jnp.minimum(t_max, t_true * 1.0001)
            per_ray2, _ = jax.block_until_ready(
                stats(boxes, o, d, t_min, tt))
            pr2 = np.asarray(per_ray2)[alive]
            line += (f" | pruned mean {pr2.mean():.2f} "
                     f"p90 {np.percentile(pr2,90):.0f}")
        print(line, flush=True)


# the sorted bounce-2 SHADOW sets (sun + flipped point) are real traffic:
print(f"R={R}, alive_sun={int((np.asarray(sh_ts)>0).sum())}", flush=True)
sun_d = jnp.broadcast_to(
    -scene.direct_light.direction[:3]
    / jnp.linalg.norm(scene.direct_light.direction[:3]), (R, 3))
f32 = jnp.float32
tmin0 = jnp.full((R,), 1e-3, f32)

t_sun = trace.trace_closest(scene, cfg, sh_o, sun_d, tmin0, sh_ts).t
report("sun-shadow", sh_o, sun_d, tmin0, sh_ts, t_true=t_sun)

# flipped point set
pl_o = sh_o + ldir * sh_tp[:, None]
pl_d = -ldir
pl_tmax = jnp.where(sh_tp > 0, jnp.maximum(sh_tp - 1e-3, 0.0), -1.0)
pl_tmin = jnp.zeros((R,), f32)
t_pl = trace.trace_closest(scene, cfg, pl_o, pl_d, pl_tmin, pl_tmax).t
report("pt-shadow ", pl_o, pl_d, pl_tmin, pl_tmax, t_true=t_pl)

# the sorted bounce-2 MATERIAL ray set (next closest trace)
t_mat = trace.trace_closest(scene, cfg, mo, md, mtmin, mtmax).t
report("material  ", mo, md, mtmin, mtmax, t_true=t_mat)
