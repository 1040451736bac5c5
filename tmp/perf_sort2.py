"""Sort-replacement candidates at wavefront scale (R=2.07M) on the TPU.

Times: current argsort make_order, full 11-array apply, 16-bucket stable
counting-sort positions via cumsum, row-granular reordering, segment sorts,
and variadic lax.sort carrying payloads.
"""
import time, numpy as np, jax, jax.numpy as jnp
from vulkanraytracing_tpu.core.jit_utils import hot_jit

R = 1920 * 1080
key = jax.random.PRNGKey(0)
keys = jax.random.bits(key, (R,), dtype=jnp.uint32)
o = jax.random.normal(key, (R, 3))
d = jax.random.normal(jax.random.PRNGKey(1), (R, 3))
f1 = [jax.random.normal(jax.random.PRNGKey(i), (R,)) for i in range(2, 9)]
perm0 = jnp.arange(R, dtype=jnp.int32)

def timed(label, fn, n=5):
    r = fn(); jax.tree.map(np.asarray, r)
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter(); r = fn(); jax.tree.map(np.asarray, r)
        best = min(best, time.perf_counter() - t0)
    print(f"{label:<46s} {best*1e3:7.1f} ms", flush=True)
    return r

# 1. current: argsort + invert scatter
def make_order(k):
    perm = jnp.argsort(k).astype(jnp.int32)
    inv = jnp.zeros((R,), jnp.int32).at[perm].set(perm0)
    return perm, inv
mo = hot_jit(make_order)
timed("argsort u32 + invert scatter", lambda: mo(keys))

# 1b. argsort alone
aso = hot_jit(lambda k: jnp.argsort(k).astype(jnp.int32))
perm = timed("argsort u32 alone", lambda: aso(keys))

# 2. apply: gather 11 arrays (2x (R,3) + 9x (R,))
def apply_all(perm, o, d, f1):
    return (o[perm], d[perm]) + tuple(f[perm] for f in f1) + (perm0[perm], perm0[perm])
ap = hot_jit(apply_all)
timed("gather 2x(R,3) + 9x(R,)", lambda: ap(perm, o, d, f1))

# 2b. variadic lax.sort carrying 11 payloads directly
def sort_carry(k, o, d, f1):
    ops = (k, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2]) + tuple(f1)
    out = jax.lax.sort(ops, num_keys=1)
    return out[1:]
sc2 = hot_jit(sort_carry)
timed("lax.sort key + 13 payload f32", lambda: sc2(keys, o, d, f1))

# 3. 16-bucket stable counting sort positions via cumsum of one-hot
def bucket16(k):
    b = (k >> 28).astype(jnp.int32)        # 4 top bits = dead|octant
    onehot = (b[:, None] == jnp.arange(16, dtype=jnp.int32)[None, :])
    ranks = jnp.cumsum(onehot.astype(jnp.int32), axis=0)  # (R,16)
    counts = ranks[-1]
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]])
    pos = jnp.sum(jnp.where(onehot, ranks - 1 + starts[None, :], 0), axis=1)
    inv = pos.astype(jnp.int32)
    perm = jnp.zeros((R,), jnp.int32).at[inv].set(perm0)
    return perm, inv
b16 = hot_jit(bucket16)
timed("16-bucket cumsum positions + invert", lambda: b16(keys))

# 4. row-granular: sort R/128 row keys + row-gather payload
RK = R // 128
rk = keys[:RK]
def rowsort(k, o):
    rp = jnp.argsort(k).astype(jnp.int32)
    o2 = o.reshape(RK, 128, 3)[rp].reshape(R, 3)
    return o2
rs = hot_jit(rowsort)
timed("row-key argsort (16.2k) + (R,3) row gather", lambda: rs(rk, o))

# 4b. row-granular with 256-ray rows
RK2 = R // 256
rk2 = keys[:RK2]
rs2 = hot_jit(lambda k, o: o.reshape(RK2, 256, 3)[jnp.argsort(k)].reshape(R, 3))
timed("row-key argsort (8.1k) + (R,3) 256-row gather", lambda: rs2(rk2, o))

# 5. within-row sort: (16.2k, 128) argsort along lanes + take_along
def lanesort(k, o):
    k2 = k.reshape(RK, 128)
    rp = jnp.argsort(k2, axis=1)
    o2 = jnp.take_along_axis(o.reshape(RK, 128, 3), rp[..., None], axis=1)
    return o2.reshape(R, 3)
ls = hot_jit(lanesort)
timed("within-row argsort (16.2k,128) + 1 apply", lambda: ls(keys, o))

# 5b. within-row sort of 1024-wide rows
RKW = R // 1024
lsw = hot_jit(lambda k, o: jnp.take_along_axis(
    o.reshape(RKW, 1024, 3),
    jnp.argsort(k.reshape(RKW, 1024), axis=1)[..., None], axis=1).reshape(R, 3))
timed("within-row argsort (2k,1024) + 1 apply", lambda: lsw(keys, o))

# 5c. within-row sort of 8192-wide rows
RKX = R // 8192
lsx = hot_jit(lambda k, o: jnp.take_along_axis(
    o.reshape(RKX, 8192, 3),
    jnp.argsort(k.reshape(RKX, 8192), axis=1)[..., None], axis=1).reshape(R, 3))
timed("within-row argsort (253,8192) + 1 apply", lambda: lsx(keys, o))

# 6. argsort 8 independent segments of R/8 (axis-1 minor sort)
seg = hot_jit(lambda k: jnp.argsort(k.reshape(8, R // 8), axis=1))
timed("argsort 8 segments of R/8", lambda: seg(keys))

# 7. scatter-apply vs gather-apply
def scat(inv, o):
    return jnp.zeros_like(o).at[inv].set(o)
scj = hot_jit(scat)
inv = jnp.flip(perm0)
timed("scatter one (R,3)", lambda: scj(inv, o))
g1 = hot_jit(lambda p, o: o[p])
timed("gather one (R,3)", lambda: g1(perm, o))
timed("gather one (R,)", lambda: g1(perm, f1[0]))
