"""RNG bit-parity tests against a straightforward numpy reimplementation of
Random.glsl (xoroshiro64** + Wang hash) evaluated step by step."""

import jax.numpy as jnp
import numpy as np

from vulkanraytracing_tpu.core import rng


def np_rotl(x, k):
    x = np.uint32(x)
    return np.uint32((int(x) << k | int(x) >> (32 - k)) & 0xFFFFFFFF)


def np_rand(s0, s1):
    result = np.uint32((int(np_rotl(np.uint32(int(s0) * 0x9E3779BB & 0xFFFFFFFF), 5)) * 5) & 0xFFFFFFFF)
    s1 = np.uint32(int(s1) ^ int(s0))
    s0 = np.uint32(int(np_rotl(s0, 26)) ^ int(s1) ^ ((int(s1) << 9) & 0xFFFFFFFF))
    s1 = np_rotl(s1, 13)
    return result, s0, s1


def np_wang(x):
    x = int(x) & 0xFFFFFFFF
    x = (x ^ 61) ^ (x >> 16)
    x = (x + (x << 3)) & 0xFFFFFFFF
    x = x ^ (x >> 4)
    x = (x * 0x27D4EB2D) & 0xFFFFFFFF
    x = x ^ (x >> 15)
    return np.uint32(x)


def test_wang_hash_matches():
    xs = np.array([0, 1, 2, 61, 12345, 0xDEADBEEF, 0xFFFFFFFF], np.uint32)
    got = np.asarray(rng.wang_hash(jnp.asarray(xs)))
    want = np.array([np_wang(x) for x in xs], np.uint32)
    np.testing.assert_array_equal(got, want)


def test_xoroshiro_sequence_matches():
    s0, s1 = np.uint32(0x9E3779BB), np.uint32(0x12345678)
    j0 = jnp.asarray(np.array([s0]))
    j1 = jnp.asarray(np.array([s1]))
    for _ in range(16):
        want, s0, s1 = np_rand(s0, s1)
        got, j0, j1 = rng.rand_uint(j0, j1)
        assert np.asarray(got)[0] == want
        assert np.asarray(j0)[0] == s0
        assert np.asarray(j1)[0] == s1


def test_next_float_range_and_value():
    # bit-trick: float = bitcast(0x3F800000 | (bits >> 9)) - 1 in [0, 1)
    s0 = jnp.asarray(np.array([1, 2, 3, 4, 999], np.uint32))
    s1 = jnp.asarray(np.array([5, 6, 7, 8, 111], np.uint32))
    for _ in range(8):
        f, s0, s1 = rng.next_float(s0, s1)
        f = np.asarray(f)
        assert np.all(f >= 0.0) and np.all(f < 1.0)


def test_pixel_seed_matches_glsl_recipe():
    # RayGen.rgen:57-66
    x, y, frame = 100, 200, 7
    s0 = np_wang((x << 16) | y)
    s1 = np_wang(frame)
    _, s0, s1 = np_rand(s0, s1)
    j0, j1 = rng.pixel_seed(jnp.asarray(np.array([x], np.uint32)),
                            jnp.asarray(np.array([y], np.uint32)), frame)
    assert np.asarray(j0)[0] == s0
    assert np.asarray(j1)[0] == s1


def test_streams_are_independent_across_pixels():
    xs = jnp.asarray(np.arange(64, dtype=np.uint32))
    ys = jnp.asarray(np.arange(64, dtype=np.uint32))
    s0a, s1a = rng.pixel_seed(xs, ys, 0)
    f_all, _, _ = rng.next_float(s0a, s1a)
    # lane 5 alone gives the same value as lane 5 of the batch
    s0b, s1b = rng.pixel_seed(xs[5:6], ys[5:6], 0)
    f_one, _, _ = rng.next_float(s0b, s1b)
    assert np.asarray(f_all)[5] == np.asarray(f_one)[0]
