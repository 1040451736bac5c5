"""Timing utility that excludes host-readback cost: every measured jit
reduces its outputs to ONE f32 scalar on device, so the host transfer is 4
bytes.  (The axon tunnel moves bulk arrays at ~34 MB/s and block_until_ready
does not block — naive `np.asarray(out)` timings measure the tunnel, not the
TPU.  Round-1 numbers in KERNEL_NOTES.md carry that contamination.)
"""
import time
import jax
import jax.numpy as jnp
import numpy as np
from vulkanraytracing_tpu.core.jit_utils import hot_jit


def _scalarize(out):
    leaves = jax.tree.leaves(out)
    acc = jnp.float32(0.0)
    for leaf in leaves:
        x = jnp.asarray(leaf)
        if x.dtype == jnp.bool_:
            x = x.astype(jnp.float32)
        elif x.dtype in (jnp.uint32, jnp.int32):
            x = (x & jnp.array(1023, x.dtype)).astype(jnp.float32)
        else:
            x = x.astype(jnp.float32)
            x = jnp.where(jnp.isfinite(x), x, 0.0)
        acc = acc + jnp.sum(x * 1e-9)
    return acc


def timed(label, fn, *args, n=6, inner=1):
    """Compile fn(*args) -> scalar; print best-of-n wall ms (scalar readback).

    inner>1 chains fn inner times (output of reduce feeding a dummy) to
    amortize dispatch latency for very fast ops."""
    def wrapped(*a):
        return _scalarize(fn(*a))

    g = hot_jit(wrapped)
    v = float(g(*args))  # compile + warm
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        for _ in range(inner):
            v = float(g(*args))
        dt = (time.perf_counter() - t0) / inner
        best = min(best, dt)
    print(f"{label:<48s} {best*1e3:8.2f} ms", flush=True)
    return best


def timed_value(label, fn, *args, n=6):
    """Like timed but also returns fn(*args) computed once (un-scalarized)."""
    best = timed(label, fn, *args, n=n)
    out = hot_jit(fn)(*args)
    jax.block_until_ready(out)
    return best, out
