# repl job: pixel-order restore A/B (decomp r05: the frame's final
# zeros.at[slot].set(color) scatter measured 151 ms — the largest
# non-traversal, non-shading frame term).  Candidates, all bit-identical:
#   A scatter (baseline, as the integrator does it)
#   B argsort(slot) + gather
#   C 1-col i32 scatter of iota + 3-col gather
#   D lax.sort by slot with color riding (job 041: riding sorts ~29 ms)
import jax
import jax.numpy as jnp

R5 = R
f32 = jnp.float32
slot = jnp.asarray(np.random.default_rng(3).permutation(R5).astype(np.int32))
color = jnp.asarray(np.random.default_rng(4).random((R5, 3), np.float32))


def A(color, slot):
    return jnp.zeros_like(color).at[slot].set(color, unique_indices=True)


def B(color, slot):
    return color[jnp.argsort(slot)]


def C(color, slot):
    inv = jnp.zeros((R5,), jnp.int32).at[slot].set(
        jnp.arange(R5, dtype=jnp.int32), unique_indices=True)
    return color[inv]


def D(color, slot):
    out = jax.lax.sort(
        (slot, color[:, 0], color[:, 1], color[:, 2]), num_keys=1)
    return jnp.stack(out[1:], axis=1)


ra = hot_jit(A)(color, slot)
for name, fn in (("A scatter", A), ("B argsort+gather", B),
                 ("C iota-scatter+gather", C), ("D riding sort", D)):
    rx = hot_jit(fn)(color, slot)
    same = bool(jnp.all(rx == ra))
    timed(f"restore {name} (identical={same})", fn, color, slot)
