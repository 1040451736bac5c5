"""XLA:TPU gather cost model: columns vs indices vs table layout.

Questions:
  1. is gather cost per-index or per-column?  (1 vs 4 vs 13 vs 25 cols)
  2. does one (T, C) row-gather beat C separate (T,) gathers?
  3. do sorted indices help?
  4. does index reuse (small table) matter?
"""
import sys, numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo/tmp")
from tutil import timed

R, T = 2088960, 262144
rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, T, size=R).astype(np.int32))
idx_sorted = jnp.asarray(np.sort(np.asarray(idx)))
tab1 = jnp.asarray(rng.random((T,)).astype(np.float32))
for C in (4, 13, 25):
    tabC = jnp.asarray(rng.random((T, C)).astype(np.float32))
    timed(f"rowgather (T,{C})[idx]", lambda i, t=tabC: t[i], idx)
    cols = [tabC[:, i] for i in range(C)]
    timed(f"{C} separate 1-col gathers", lambda i, cs=cols: [c[i] for c in cs], idx)
timed("1-col gather", lambda i: tab1[i], idx)
timed("1-col gather sorted idx", lambda i: tab1[i], idx_sorted)
# u32-packed: 13 f32 -> 7 u32 (pairs as bf16ish halves emulated by u32 packing)
tab7 = jnp.asarray(rng.integers(0, 1 << 32, size=(T, 7), dtype=np.uint32))
timed("rowgather u32 (T,7)[idx]", lambda i: tab7[i], idx)
# small table (materials): 128 rows
small = jnp.asarray(rng.random((128, 16)).astype(np.float32))
midx = jnp.asarray(rng.integers(0, 128, size=R).astype(np.int32))
timed("small-table rowgather (128,16)[idx]", lambda i: small[i], midx)
from vulkanraytracing_tpu.ops.select import onehot_select
timed("onehot_select (128,16)", lambda i: onehot_select(i, small), midx)
