"""Interleaved A/B: subpacket vs wide kernel on cached bench scene."""
import time, numpy as np, jax, jax.numpy as jnp
import vulkanraytracing_tpu.ops.traverse_wide as tw
import vulkanraytracing_tpu.ops.traverse_subpacket as sp

z = np.load("/tmp/bench_scene.npz")
table = jnp.asarray(z["table"]); nr = int(z["nr"])
tris = jnp.asarray(z["tris"])
o = jnp.asarray(z["o"]); d = jnp.asarray(z["d"])
tmin = jnp.asarray(z["tmin"]); tmax = jnp.asarray(z["tmax"])
R = o.shape[0]

# rebuild subpacket tables from the unified one
node_part = table[:nr]
import vulkanraytracing_tpu.scene.types as st
nodes12 = jax.lax.bitcast_convert_type(node_part.reshape(-1, 16)[:, :12], jnp.float32)
child2 = node_part.reshape(-1, 16)[:, 12:14]
tri_part = jax.lax.bitcast_convert_type(table[nr+1:], jnp.float32)

node_tab = node_part
tri_tab = jnp.concatenate([jnp.zeros((1, 128), jnp.float32), tri_part], axis=0)

hitw = tw._traverse_wide_jitted(table, nr, tris, o, d, tmin, tmax,
                                cull_backface=True, any_hit=False)
np.asarray(hitw.t)
hits = sp._traverse_subpacket_jitted(node_tab, tri_tab, tris, o, d, tmin, tmax,
                                     cull_backface=True, any_hit=False, interpret=False)
np.asarray(hits.t)
m = np.asarray(hitw.t < 1e30)
assert np.array_equal(m, np.asarray(hits.t < 1e30)), "hit mismatch"

p = o + d * jnp.where(hitw.t < 1e30, hitw.t, 1.0)[:, None]
sun = jnp.array([0.3, 0.8, 0.5]); sun = sun / jnp.linalg.norm(sun)
sd = jnp.broadcast_to(sun, (R, 3))
at = jnp.where(jnp.asarray(m), 1000.0, 0.0)
key = jax.random.PRNGKey(0)
rd = jax.random.normal(key, (R, 3)); rd = rd / jnp.linalg.norm(rd, axis=1, keepdims=True)
e3 = jnp.full((R,), 1e-3, jnp.float32)

cases = {
  "primary": (o, d, tmin, tmax, True, False),
  "shadow":  (p + 1e-3 * sd, sd, e3, at, False, True),
  "bounce":  (p + 1e-3 * rd, rd, e3, at, True, False),
}
runners = {
  "wide": lambda a: tw._traverse_wide_jitted(table, nr, tris, *a[:4],
            cull_backface=a[4], any_hit=a[5]),
  "subp": lambda a: sp._traverse_subpacket_jitted(node_tab, tri_tab, tris, *a[:4],
            cull_backface=a[4], any_hit=a[5], interpret=False),
}
# warm all
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
    w, s = best[(cn, "wide")], best[(cn, "subp")]
    print(f"{cn:8s} wide {w*1e3:6.0f} ms ({R/(w-0.035)/1e6:5.1f} Mrays/s)   "
          f"subp {s*1e3:6.0f} ms ({R/(s-0.035)/1e6:5.1f} Mrays/s)   wide is {s/w:.2f}x")
