"""Is XLA's TPU variadic stable sort permutation-consistent across calls?

sort_wavefront splits its riding payload into <=16-operand groups and
re-sorts the SAME keys per group, relying on is_stable=True to make every
group ride the identical permutation.  This probe checks that assumption
on the actual backend: iota columns ride in DIFFERENT groups (and with
different co-operand dtype mixes); if any two disagree, grouped riding
sorts are unsound on this backend and the parity FAIL is explained.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

import jax
import jax.numpy as jnp


def main() -> None:
    print(f"backend: {jax.default_backend()}", flush=True)
    n = 512 * 128
    rng = np.random.default_rng(0)
    # heavy ties, like dead-ray/morton buckets in ray_sort_keys
    keys = jnp.asarray(rng.integers(0, 64, n, dtype=np.uint32))
    iota = jnp.arange(n, dtype=jnp.int32)

    f32 = lambda seed: jnp.asarray(  # noqa: E731
        rng.normal(size=n).astype(np.float32))
    u32 = lambda: jnp.asarray(rng.integers(0, 1 << 30, n, dtype=np.uint32))  # noqa: E731
    boolean = jnp.asarray(rng.integers(0, 2, n, dtype=np.uint8).astype(bool))

    # group A: iota + 15 f32 | group B: iota + mixed dtypes | group C: iota alone
    ga = jax.lax.sort((keys, iota, *[f32(i) for i in range(15)]),
                      num_keys=1, is_stable=True)
    gb = jax.lax.sort((keys, iota, u32(), boolean, *[f32(i) for i in range(8)],
                       u32(), u32()),
                      num_keys=1, is_stable=True)
    gc = jax.lax.sort((keys, iota), num_keys=1, is_stable=True)

    pa, pb, pc = (np.asarray(g[1]) for g in (ga, gb, gc))
    print(f"A vs B: {np.sum(pa != pb)} mismatched slots", flush=True)
    print(f"A vs C: {np.sum(pa != pc)} mismatched slots", flush=True)
    # stable reference permutation computed on host
    ref = np.argsort(np.asarray(keys), kind="stable")
    print(f"A vs host-stable: {np.sum(pa != ref)} mismatched slots", flush=True)
    print(f"B vs host-stable: {np.sum(pb != ref)} mismatched slots", flush=True)


if __name__ == "__main__":
    main()
