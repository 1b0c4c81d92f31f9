"""RNG unit tests (SURVEY §4: C6c checklist).

The oracle for `hash_u32` / `uniform01` is an independent pure-Python
uint32 model of shader.frag:94-118, evaluated scalar-by-scalar.
"""
import numpy as np
import jax.numpy as jnp

from fourd_ray_tracing_tpu.ops import rng

M32 = 0xFFFFFFFF


def py_hash(x: int) -> int:
    x &= M32
    x = (x + ((x << 10) & M32)) & M32
    x ^= x >> 6
    x = (x + ((x << 3) & M32)) & M32
    x ^= x >> 11
    x = (x + ((x << 15) & M32)) & M32
    x ^= x >> 9
    return x


def py_uniform(pixel_bits: int, seed: int, counter: int):
    counter = (counter + 0x79A010A9) & M32
    bits = py_hash((pixel_bits ^ counter ^ seed) & M32)
    bits = (bits & 0x007FFFFF) | 0x3F800000
    value = np.frombuffer(np.uint32(bits).tobytes(), np.float32)[0] - 1.0
    return value, counter


def test_hash_matches_python_model(rng_np):
    xs = rng_np.integers(0, 2**32, size=256, dtype=np.uint32)
    got = np.asarray(rng.hash_u32(jnp.asarray(xs)))
    want = np.array([py_hash(int(x)) for x in xs], np.uint32)
    np.testing.assert_array_equal(got, want)


def test_uniform01_matches_python_model(rng_np):
    pix = rng_np.integers(0, 2**32, size=64, dtype=np.uint32)
    seed = np.uint32(0xDEADBEEF)
    counter = rng.init_counter(seed, (64,))
    got, counter2 = rng.uniform01(jnp.asarray(pix), seed, counter)
    want = np.array(
        [py_uniform(int(p), int(seed), int(seed))[0] for p in pix], np.float32
    )
    np.testing.assert_array_equal(np.asarray(got), want)
    # counters advanced by exactly one delta (mod 2^32 in python ints,
    # avoiding numpy's scalar-overflow warning)
    expected = np.uint32((int(seed) + 0x79A010A9) & M32)
    np.testing.assert_array_equal(
        np.asarray(counter2), expected * np.ones(64, np.uint32)
    )


def test_uniform_range_and_spread(rng_np):
    pix = rng.pixel_stream_bits(
        jnp.linspace(0.01, 0.99, 128, dtype=jnp.float32),
        jnp.linspace(0.99, 0.01, 128, dtype=jnp.float32),
    )
    seed = np.uint32(7)
    counter = rng.init_counter(seed, (128,))
    draws = []
    for _ in range(64):
        u, counter = rng.uniform01(pix, seed, counter)
        draws.append(np.asarray(u))
    u = np.stack(draws)
    assert u.min() >= 0.0 and u.max() < 1.0
    assert abs(u.mean() - 0.5) < 0.01
    assert abs(u.var() - 1 / 12) < 0.005


def test_masked_draw_freezes_counter():
    pix = jnp.asarray(np.arange(8, dtype=np.uint32))
    seed = np.uint32(3)
    counter = rng.init_counter(seed, (8,))
    active = jnp.asarray([True, False] * 4)
    _, c2 = rng.masked_uniform01(pix, seed, counter, active)
    c2 = np.asarray(c2)
    assert (c2[0::2] != np.asarray(counter)[0::2]).all()
    assert (c2[1::2] == np.asarray(counter)[1::2]).all()


def test_pixel_decorrelation():
    # Neighboring pixels must get unrelated streams.
    scr_x = jnp.asarray([0.5, 0.5 + 1 / 512], jnp.float32)
    scr_y = jnp.asarray([0.5, 0.5], jnp.float32)
    pix = rng.pixel_stream_bits(scr_x, scr_y)
    seed = np.uint32(11)
    counter = rng.init_counter(seed, (2,))
    us = []
    for _ in range(100):
        u, counter = rng.uniform01(pix, seed, counter)
        us.append(np.asarray(u))
    us = np.stack(us)
    corr = np.corrcoef(us[:, 0], us[:, 1])[0, 1]
    assert abs(corr) < 0.3
