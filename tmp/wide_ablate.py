"""Ablation probe for the wide kernel using the cached bench scene.

env: WROWS (resident rows), ABLATE in {none, noleaf, noint, fetchonly,
nofetch, norefill}.
"""
import os, time, numpy as np, jax, jax.numpy as jnp
import vulkanraytracing_tpu.ops.traverse_wide as tw
from vulkanraytracing_tpu.core.jit_utils import hot_jit

tw.WIDE_ROWS = int(os.environ.get("WROWS", "64"))
ABLATE = os.environ.get("ABLATE", "none")

z = np.load("/tmp/bench_scene.npz")
table = jnp.asarray(z["table"]); nr = int(z["nr"])
tris = jnp.asarray(z["tris"])
o = jnp.asarray(z["o"]); d = jnp.asarray(z["d"])
tmin = jnp.asarray(z["tmin"]); tmax = jnp.asarray(z["tmax"])
R = o.shape[0]

if ABLATE != "none":
    import jax.experimental.pallas as pl_mod  # noqa
    orig_kernel = tw._kernel
    def patched_kernel(cull_backface, any_hit, total_rows, nr_rows):
        # re-derive the kernel with blocks disabled by monkeypatching jnp pieces
        return orig_kernel(cull_backface, any_hit, total_rows, nr_rows)
    # handled below via source-level flags instead
    if ABLATE == "noleaf":
        tw.LEAF_TESTS = 0
    # others need source edits; only noleaf supported here

f = tw._traverse_wide_jitted
hit, iters = f(table, nr, tris, o, d, tmin, tmax,
               cull_backface=True, any_hit=False, return_counters=True)
c = np.asarray(iters).astype(np.int64)
trips = c[:, 0].sum()
best = 1e9
for _ in range(5):
    t0 = time.perf_counter()
    h = f(table, nr, tris, o, d, tmin, tmax, cull_backface=True, any_hit=False)
    float(np.asarray(h.t)[0]); best = min(best, time.perf_counter() - t0)
comp = best - 0.035
print(f"W={tw.WIDE_ROWS} ablate={ABLATE}: {best*1e3:.0f} ms, trips={trips}, "
      f"{comp*1e9/trips:.0f} ns/trip, int={c[:,1].sum()} leaf={c[:,2].sum()}, "
      f"{R/comp/1e6:.1f} Mrays/s")

# shadow + bounce
hitmask = np.asarray(hit.t) < 1e30
p = o + d * jnp.where(hit.t < 1e30, hit.t, 1.0)[:, None]
sun = jnp.array([0.3, 0.8, 0.5]); sun = sun / jnp.linalg.norm(sun)
sd = jnp.broadcast_to(sun, (R, 3))
alive_tmax = jnp.where(jnp.asarray(hitmask), 1000.0, 0.0)

def timed(label, fn):
    h = fn(); jax.tree.map(np.asarray, h)
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter(); h = fn(); jax.tree.map(np.asarray, h)
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best*1e3:.0f} ms -> {R/(best-0.035)/1e6:.1f} Mrays/s")

timed("shadow anyhit", lambda: f(table, nr, tris, p + 1e-3 * sd, sd,
      jnp.full((R,), 1e-3, jnp.float32), alive_tmax,
      cull_backface=False, any_hit=True))
key = jax.random.PRNGKey(0)
rd = jax.random.normal(key, (R, 3)); rd = rd / jnp.linalg.norm(rd, axis=1, keepdims=True)
timed("random bounce closest", lambda: f(table, nr, tris, p + 1e-3 * rd, rd,
      jnp.full((R,), 1e-3, jnp.float32), alive_tmax,
      cull_backface=True, any_hit=False))
