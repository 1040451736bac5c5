"""Segment-local bitonic sort as pure VPU ops (no gathers) — candidate
replacement for the wavefront argsort+gather reorder.

Validates correctness vs np.sort, then times on TPU:
  - key-only bitonic (packed key|idx u32) on (S, 1024)
  - full-carry bitonic: key + 13 payload arrays through the network
  - take_along_axis minor gather for comparison
"""
import time, numpy as np, jax, jax.numpy as jnp
from vulkanraytracing_tpu.core.jit_utils import hot_jit

R = 1920 * 1080
SEG = 1024
S = R // SEG
assert S * SEG == R

key = jax.random.PRNGKey(0)
keys = jax.random.bits(key, (R,), dtype=jnp.uint32)
payloads = [jax.random.normal(jax.random.PRNGKey(i), (R,)) for i in range(13)]


def bitonic_stage(arrs, k, j, n):
    """One compare-exchange stage at distance j, direction bit k, along the
    minor axis of (S, n) arrays.  arrs[0] is the u32 key; all arrays move
    together.  Pure reshape + min/max/where — no gathers."""
    ng = n // (2 * j)
    # ascending iff (element_index & k) == 0; constant within each aligned
    # 2j-block because k >= 2j in the standard network
    gidx = jnp.arange(ng, dtype=jnp.uint32) * jnp.uint32(2 * j)
    asc = (gidx & jnp.uint32(k)) == 0          # (ng,)
    asc = asc[None, :, None]                    # (1, ng, 1)

    keys4 = arrs[0].reshape(-1, ng, 2, j)
    lo_k, hi_k = keys4[:, :, 0, :], keys4[:, :, 1, :]
    swap = jnp.where(asc, lo_k > hi_k, lo_k < hi_k)  # (S, ng, j)

    out = []
    for a in arrs:
        a4 = a.reshape(-1, ng, 2, j)
        lo, hi = a4[:, :, 0, :], a4[:, :, 1, :]
        nlo = jnp.where(swap, hi, lo)
        nhi = jnp.where(swap, lo, hi)
        out.append(jnp.stack([nlo, nhi], axis=2).reshape(-1, n))
    return out


def bitonic_sort(arrs, n):
    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            arrs = bitonic_stage(arrs, k, j, n)
            j //= 2
        k *= 2
    return arrs


# --- correctness (small, CPU via jit on default backend is fine) ---
kn = np.random.default_rng(0).integers(0, 2**32, size=(4, 256), dtype=np.uint32)
out = bitonic_sort([jnp.asarray(kn)], 256)[0]
np.testing.assert_array_equal(np.asarray(out), np.sort(kn, axis=1))
print("bitonic correctness OK", flush=True)

# payload-carry correctness: key + payload move together
pv = np.random.default_rng(1).random((4, 256)).astype(np.float32)
ok, op = bitonic_sort([jnp.asarray(kn), jnp.asarray(pv)], 256)
order = np.argsort(kn, axis=1, kind="stable")
np.testing.assert_array_equal(np.asarray(ok), np.sort(kn, axis=1))
# payloads follow their keys (keys unique w.h.p.)
np.testing.assert_allclose(np.asarray(op), np.take_along_axis(pv, order, axis=1))
print("carry correctness OK", flush=True)


def timed(label, fn, n=5):
    r = fn(); jax.tree.map(np.asarray, r)
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter(); r = fn(); jax.tree.map(np.asarray, r)
        best = min(best, time.perf_counter() - t0)
    print(f"{label:<46s} {best*1e3:7.1f} ms", flush=True)
    return r


# 1. key-only (packed key22|idx10)
def sort_key_idx(k):
    k2 = k.reshape(S, SEG)
    idx = jnp.broadcast_to(jnp.arange(SEG, dtype=jnp.uint32)[None, :], (S, SEG))
    packed = (k2 & jnp.uint32(0xFFFFFC00)) | idx
    (out,) = bitonic_sort([packed], SEG)
    return out
skj = hot_jit(sort_key_idx)
timed("bitonic key+idx packed u32 (2025,1024)", lambda: skj(keys), n=5)

# 2. full carry: key + 13 payloads
def sort_carry(k, ps):
    arrs = [k.reshape(S, SEG)] + [p.reshape(S, SEG) for p in ps]
    return bitonic_sort(arrs, SEG)
scj = hot_jit(sort_carry)
timed("bitonic full carry key+13 (2025,1024)", lambda: scj(keys, payloads))

# 3. SEG=2048 full carry
S2, SEG2 = R // 2048, 2048
def sort_carry2(k, ps):
    arrs = [k.reshape(S2, SEG2)] + [p.reshape(S2, SEG2) for p in ps]
    return bitonic_sort(arrs, SEG2)
scj2 = hot_jit(sort_carry2)
timed("bitonic full carry key+13 (1012,2048)", lambda: scj2(keys, payloads))

# 4. within-segment take_along_axis gather (minor-axis) for one payload
perm = jnp.argsort(keys.reshape(S, SEG), axis=1)
ta = hot_jit(lambda p, x: jnp.take_along_axis(x.reshape(S, SEG), p, axis=1))
timed("take_along_axis minor (2025,1024) x1", lambda: ta(perm, payloads[0]))
