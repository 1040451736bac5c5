"""TRUE device-side costs (scalar readback) of reorder candidates.

Measures argsort-based make_order + gather apply vs all-pairs segment rank +
one-hot MXU apply, at R=2.07M with 20 payload columns.
"""
import sys, time, numpy as np, jax, jax.numpy as jnp
from functools import partial
sys.path.insert(0, "/root/repo/tmp")
from tutil import timed
from vulkanraytracing_tpu.core.jit_utils import hot_jit

R = 2088960  # the real padded tile wavefront
key = jax.random.PRNGKey(0)
keys = jax.random.bits(key, (R,), dtype=jnp.uint32)
C = 20
payload = jax.random.normal(jax.random.PRNGKey(1), (R, C), dtype=jnp.float32)
cols = [payload[:, i] for i in range(C)]
perm0 = jnp.arange(R, dtype=jnp.int32)

# --- current production path ---
def make_order(k):
    perm = jnp.argsort(k).astype(jnp.int32)
    inv = jnp.zeros((R,), jnp.int32).at[perm].set(perm0)
    return perm, inv
timed("argsort+invert (make_order)", make_order, keys)

perm = hot_jit(lambda k: jnp.argsort(k).astype(jnp.int32))(keys)
jax.block_until_ready(perm)
timed("gather 20 x (R,) cols", lambda p, cs: [c[p] for c in cs], perm, cols)
timed("gather 1 x (R,) col", lambda p, c: c[p], perm, cols[0])
timed("scatter 1 x (R,) col", lambda p, c: jnp.zeros_like(c).at[p].set(c),
      perm, cols[0])
timed("full current: sort+invert+gather20",
      lambda k, cs: [c[make_order(k)[0]] for c in cs], keys, cols)

# --- rank + one-hot MXU apply ---
def seg_ranks(k, SEG):
    S = k.shape[0] // SEG
    k2 = k.reshape(S, SEG)
    idx = jnp.arange(SEG, dtype=jnp.int32)
    tie = idx[None, :] < idx[:, None]
    def body(krow):
        a, b = krow[:, None], krow[None, :]
        less = (b < a) | ((b == a) & tie)
        return jnp.sum(less.astype(jnp.int32), axis=1)
    return jax.vmap(body)(k2).reshape(-1)

def apply_ranks(ranks, pay, SEG, chunk):
    S = ranks.shape[0] // SEG
    r3 = ranks.reshape(S, SEG)
    p3 = pay.reshape(S, SEG, C)
    idx = jnp.arange(SEG, dtype=jnp.int32)
    def chunk_fn(args):
        rc, pc = args
        onehot = (rc[:, None, :] == idx[None, :, None]).astype(jnp.float32)
        return jax.lax.dot_general(
            onehot, pc, (((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST)
    nb = S // chunk
    out = jax.lax.map(chunk_fn, (r3.reshape(nb, chunk, SEG),
                                 p3.reshape(nb, chunk, SEG, C)))
    return out.reshape(R, C)

for SEG in (512, 1024, 2048):
    if R % SEG:
        continue
    timed(f"seg_ranks SEG={SEG}", partial(seg_ranks, SEG=SEG), keys)
    ranks = hot_jit(partial(seg_ranks, SEG=SEG))(keys)
    jax.block_until_ready(ranks)
    S = R // SEG
    chunks = [c for c in (16, 24, 32, 48, 64, 85, 51, 15, 17) if S % c == 0]
    for chunk in chunks[:2]:
        timed(f"apply20 SEG={SEG} chunk={chunk}",
              partial(apply_ranks, SEG=SEG, chunk=chunk), ranks, payload)
    ck = chunks[0] if chunks else 1
    timed(f"FUSED rank+apply20 SEG={SEG} chunk={ck}",
          lambda k, p, SEG=SEG, ck=ck: apply_ranks(seg_ranks(k, SEG), p, SEG, ck),
          keys, payload)

# SOA variant: payload as 20 separate (R,) -> stack inside
def fused_soa(k, cs, SEG):
    ranks = seg_ranks(k, SEG)
    pay = jnp.stack(cs, axis=-1)
    out = apply_ranks(ranks, pay, SEG, 24)
    return [out[:, i] for i in range(C)]
timed("FUSED SOA stack+rank+apply20 SEG=1024",
      partial(fused_soa, SEG=1024), keys, cols)
