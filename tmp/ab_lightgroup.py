"""A/B: flipped point-light shadow rays, production order (lights
interleaved per row) vs STABLE light-id partition (each wave row sees
one shared origin).  Measures the traversal gain + the permute cost."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo/tmp")
from tutil import timed

from perf_inframe_state import build_state  # noqa: E402

(scene, cfg, sh_o, sh_ts, ldir, sh_tp, lpos_sel, R) = build_state()
import vulkanraytracing_tpu.ops.traverse_wide8 as tw8  # noqa: E402
from vulkanraytracing_tpu.core.jit_utils import hot_jit  # noqa: E402

f32 = jnp.float32
bvh = tw8._with_bvh8(scene.bvh)
table8, nr8 = tw8._unified_table8(bvh)
table8 = jax.device_put(table8)


def anyh(o, d, a, b):
    hit = tw8._traverse_wide8_packed(
        table8, nr8, bvh.tris, o, d, a, b,
        cull_backface=False, any_hit=True, any_order=True)
    return hit.t < 3.0e38


tmin = jnp.full((R,), 1e-3, f32)

# flipped point rays (production formulation)
fo = sh_o + ldir * sh_tp[:, None]
fd = -ldir
ft = jnp.maximum(sh_tp - f32(1e-3), 0.0)

t_base = timed("flip prod order    ", anyh, fo, fd, tmin, ft)

# stable partition by light id (derive id from selected light position)
lights = np.asarray(scene.point_lights.position[:, :3])
lsel = np.asarray(lpos_sel)
lid = np.argmin(
    ((lsel[:, None, :] - lights[None, :, :]) ** 2).sum(-1), axis=1
).astype(np.int32)


@hot_jit
def partition(lid_, fo_, fd_, ft_):
    perm = jnp.argsort(lid_, stable=True).astype(jnp.int32)
    table = jnp.concatenate([fo_, fd_, ft_[:, None]], axis=1)
    out = table[perm]
    return out[:, 0:3], out[:, 3:6], out[:, 6], perm


fo2, fd2, ft2, perm = partition(jnp.asarray(lid), fo, fd, ft)
jax.block_until_ready(perm)
t_part = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    o2, d2, t2, pm = partition(jnp.asarray(lid), fo, fd, ft)
    jax.block_until_ready(pm)
    t_part = min(t_part, time.perf_counter() - t0)
print(f"partition cost {t_part*1e3:6.1f} ms", flush=True)

t_grp = timed("flip light-grouped ", anyh, fo2, fd2, tmin, ft2)
# identity: same occlusion set after unpermute
occ_b = np.asarray(anyh(fo, fd, tmin, ft))
occ_g = np.zeros_like(occ_b)
occ_g[np.asarray(perm)] = np.asarray(anyh(fo2, fd2, tmin, ft2))
print(f"identical={bool((occ_b == occ_g).all())} "
      f"gain {t_base/t_grp:.2f}x, net {(t_base - t_grp - t_part)*1e3:+.0f} ms",
      flush=True)
