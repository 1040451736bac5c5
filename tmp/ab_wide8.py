"""A/B: wide (BVH2) vs wide8 (BVH8) on the cached bench scene."""
import time, numpy as np, jax, jax.numpy as jnp
import vulkanraytracing_tpu.ops.traverse_wide as tw
import vulkanraytracing_tpu.ops.traverse_wide8 as tw8
from vulkanraytracing_tpu.accel.bvh8 import collapse_bvh8
from vulkanraytracing_tpu.scene.types import BVH

z = np.load("/tmp/bench_scene.npz")
table = jnp.asarray(z["table"]); nr = int(z["nr"])
tris = jnp.asarray(z["tris"])
o = jnp.asarray(z["o"]); d = jnp.asarray(z["d"])
tmin = jnp.asarray(z["tmin"]); tmax = jnp.asarray(z["tmax"])
R = o.shape[0]

# reconstruct BVH2 arrays from the unified table, then collapse to BVH8
node_part = np.asarray(table[:nr]).reshape(-1, 16)
nodes2 = node_part[:, :12].view(np.float32)
child2 = node_part[:, 12:14]
t0 = time.time()
bvh = BVH(nodes=jnp.asarray(nodes2), child_index=jnp.asarray(child2),
          tris=tris, tri_flags=jnp.zeros((tris.shape[0],), jnp.int32),
          tri_order=jnp.arange(tris.shape[0], dtype=jnp.int32))
# recover real tri flags from the tri rows of the table (cols 9,10 bitcast)
tri_rows = np.asarray(table[nr + 1:]).reshape(-1, 16)[: tris.shape[0]]
fl = tri_rows[:, 9:11].view(np.float32)
flags = (fl[:, 0] > 0.5).astype(np.int32) | (((fl[:, 1] > 0.5).astype(np.int32)) << 1)
bvh = bvh._replace(tri_flags=jnp.asarray(flags))
bvh = collapse_bvh8(bvh)
print(f"collapse: {time.time()-t0:.1f}s, bvh8 nodes={bvh.nodes8.shape[0]}")
table8, nr8 = tw8._unified_table8(bvh)
print(f"table8 rows={table8.shape[0]} (bvh2 table rows={table.shape[0]})")

p = None
cases = {}
hit, it2 = tw._traverse_wide_jitted(table, nr, tris, o, d, tmin, tmax,
                                    cull_backface=True, any_hit=False, return_counters=True)
np.asarray(hit.t)
hit8, it8 = tw8._traverse_wide8_jitted(table8, nr8, tris, o, d, tmin, tmax,
                                       cull_backface=True, any_hit=False, return_counters=True)
np.asarray(hit8.t)
m = np.asarray(hit.t < 1e30)
print("primary hit masks equal:", np.array_equal(m, np.asarray(hit8.t < 1e30)),
      "tris equal:", np.array_equal(np.asarray(hit.tri)[m], np.asarray(hit8.tri)[m]))
c2 = np.asarray(it2)[0]; c8 = np.asarray(it8)[0]
print(f"bvh2 counters: trips={c2[0]} int={c2[1]} leaf={c2[2]}")
print(f"bvh8 counters: trips={c8[0]} int={c8[1]} leaf={c8[2]}")

pp = o + d * jnp.where(hit.t < 1e30, hit.t, 1.0)[:, None]
sun = jnp.array([0.3, 0.8, 0.5]); sun = sun / jnp.linalg.norm(sun)
sd = jnp.broadcast_to(sun, (R, 3))
at = jnp.where(jnp.asarray(m), 1000.0, 0.0)
key = jax.random.PRNGKey(0)
rd = jax.random.normal(key, (R, 3)); rd = rd / jnp.linalg.norm(rd, axis=1, keepdims=True)
e3 = jnp.full((R,), 1e-3, jnp.float32)

cases = {
  "primary": (o, d, tmin, tmax, True, False),
  "shadow":  (pp + 1e-3 * sd, sd, e3, at, False, True),
  "bounce":  (pp + 1e-3 * rd, rd, e3, at, True, False),
}
runners = {
  "bvh2": lambda a: tw._traverse_wide_jitted(table, nr, tris, *a[:4],
            cull_backface=a[4], any_hit=a[5]),
  "bvh8": lambda a: tw8._traverse_wide8_jitted(table8, nr8, tris, *a[:4],
            cull_backface=a[4], any_hit=a[5]),
}
for cn, a in cases.items():
    for rn, f in runners.items():
        r = f(a); jax.tree.map(np.asarray, r)
best = {(cn, rn): 1e9 for cn in cases for rn in runners}
for rep in range(6):
    for cn, a in cases.items():
        for rn, f in runners.items():
            t0 = time.perf_counter(); r = f(a); jax.tree.map(np.asarray, r)
            best[(cn, rn)] = min(best[(cn, rn)], time.perf_counter() - t0)
for cn in cases:
    b2, b8 = best[(cn, "bvh2")], best[(cn, "bvh8")]
    print(f"{cn:8s} bvh2 {b2*1e3:6.0f} ms ({R/(b2-0.035)/1e6:5.1f} Mrays/s)   "
          f"bvh8 {b8*1e3:6.0f} ms ({R/(b8-0.035)/1e6:5.1f} Mrays/s)   bvh8 is {b2/b8:.2f}x")
