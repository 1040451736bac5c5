"""Gather-free wavefront reorder: all-pairs segment ranks + one-hot MXU apply.

rank[i] = #{j in segment : key_j < key_i (ties: j < i)}  — dense VPU compare
apply   = onehot(rank) @ payload                          — MXU matmul

No sort primitive, no gather/scatter anywhere.  Correctness vs argsort,
then timing at SEG=1024/2048 with 20 payload columns.
"""
import time, numpy as np, jax, jax.numpy as jnp
from functools import partial
from vulkanraytracing_tpu.core.jit_utils import hot_jit

R = 1920 * 1080


def seg_ranks(keys, SEG):
    """(R,) u32 -> (R,) i32: destination position of each element within its
    SEG-sized segment under a stable ascending key sort."""
    S = keys.shape[0] // SEG
    k = keys.reshape(S, SEG)
    idx = jnp.arange(SEG, dtype=jnp.int32)
    tie = idx[None, :] < idx[:, None]              # (SEG, SEG) j-before-i

    def body(krow):                                 # (SEG,) one segment
        a, b = krow[:, None], krow[None, :]
        less = (b < a) | ((b == a) & tie)
        return jnp.sum(less.astype(jnp.int32), axis=1)

    return jax.vmap(body)(k).reshape(-1)


def apply_ranks(ranks, payload, SEG, chunk=32):
    """payload (R, C) f32 -> reordered (R, C): out[seg, p] = payload[seg, i]
    where ranks[seg, i] == p.  One-hot matmul on the MXU, chunked."""
    S = ranks.shape[0] // SEG
    C = payload.shape[1]
    r3 = ranks.reshape(S, SEG)
    p3 = payload.reshape(S, SEG, C)
    idx = jnp.arange(SEG, dtype=jnp.int32)

    def chunk_fn(args):
        rc, pc = args                               # (B, SEG), (B, SEG, C)
        onehot = (rc[:, None, :] == idx[None, :, None]).astype(jnp.float32)
        return jax.lax.dot_general(
            onehot, pc, (((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
        )

    nb = S // chunk
    out = jax.lax.map(chunk_fn, (r3.reshape(nb, chunk, SEG),
                                 p3.reshape(nb, chunk, SEG, C)))
    return out.reshape(R, C)


# --- correctness ---
rng = np.random.default_rng(0)
kk = rng.integers(0, 1 << 22, size=4096, dtype=np.uint32)  # ties likely
pp = rng.random((4096, 3)).astype(np.float32)
rr = np.asarray(seg_ranks(jnp.asarray(kk), 1024))
oo = np.asarray(apply_ranks(jnp.asarray(rr), jnp.asarray(pp), 1024, chunk=2))
for s in range(4):
    seg = slice(s * 1024, (s + 1) * 1024)
    order = np.argsort(kk[seg], kind="stable")
    np.testing.assert_array_equal(rr[seg][order], np.arange(1024))
    np.testing.assert_array_equal(oo[seg], pp[seg][order])
print("rank+apply correctness OK", flush=True)

# u32 transport via 16-bit halves
ss = rng.integers(0, 1 << 32, size=4096, dtype=np.uint32)
hi = (ss >> 16).astype(np.float32)
lo = (ss & 0xFFFF).astype(np.float32)
both = np.stack([hi, lo], 1)
ob = np.asarray(apply_ranks(jnp.asarray(rr), jnp.asarray(both), 1024, chunk=2))
rec = (ob[:, 0].astype(np.uint32) << 16) | ob[:, 1].astype(np.uint32)
order_all = np.concatenate([np.argsort(kk[s * 1024:(s + 1) * 1024],
                                       kind="stable") + s * 1024
                            for s in range(4)])
np.testing.assert_array_equal(rec, ss[order_all])
print("u32 16-bit-half transport OK", flush=True)


def timed(label, fn, n=5):
    r = fn(); jax.tree.map(np.asarray, r)
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter(); r = fn(); jax.tree.map(np.asarray, r)
        best = min(best, time.perf_counter() - t0)
    print(f"{label:<46s} {best*1e3:7.1f} ms", flush=True)
    return r


key = jax.random.PRNGKey(0)
keys = jax.random.bits(key, (R,), dtype=jnp.uint32)
C = 20
payload = jax.random.normal(jax.random.PRNGKey(1), (R, C), dtype=jnp.float32)

for SEG in (1024, 2048):
    rj = hot_jit(partial(seg_ranks, SEG=SEG))
    ranks = timed(f"seg_ranks SEG={SEG}", lambda: rj(keys))
    for chunk in (16, 64):
        aj = hot_jit(partial(apply_ranks, SEG=SEG, chunk=chunk))
        timed(f"apply 20 cols SEG={SEG} chunk={chunk}",
              lambda: aj(ranks, payload))
    fused = hot_jit(lambda k, p, SEG=SEG: apply_ranks(
        seg_ranks(k, SEG), p, SEG, chunk=32))
    timed(f"rank+apply fused SEG={SEG}", lambda: fused(keys, payload))
