"""Counter-based RNG tests: determinism, uniformity, stream independence."""

import numpy as np

import jax.numpy as jnp

from esctp1raytracer_tpu.utils.rng import hash_u32, randint, uniform01


def test_deterministic():
    ids = jnp.arange(1000, dtype=jnp.uint32)
    a = np.asarray(uniform01(0, ids, 3))
    b = np.asarray(uniform01(0, ids, 3))
    np.testing.assert_array_equal(a, b)


def test_range_and_uniformity():
    ids = jnp.arange(200_000, dtype=jnp.uint32)
    u = np.asarray(uniform01(7, ids, 1))
    assert (u >= 0).all() and (u < 1).all()
    # mean/variance of U[0,1): 0.5 / 1/12
    assert abs(u.mean() - 0.5) < 0.005
    assert abs(u.var() - 1 / 12) < 0.002
    # no gross bucket skew
    hist, _ = np.histogram(u, bins=16, range=(0, 1))
    assert hist.min() > 0.9 * len(u) / 16


def test_streams_independent():
    ids = jnp.arange(100_000, dtype=jnp.uint32)
    a = np.asarray(uniform01(0, ids, 0))
    b = np.asarray(uniform01(0, ids, 1))
    corr = np.corrcoef(a, b)[0, 1]
    assert abs(corr) < 0.01


def test_seed_changes_everything():
    ids = jnp.arange(10_000, dtype=jnp.uint32)
    a = np.asarray(hash_u32(0, ids, 0))
    b = np.asarray(hash_u32(1, ids, 0))
    assert (a != b).mean() > 0.999


def test_randint_bounds_and_coverage():
    ids = jnp.arange(50_000, dtype=jnp.uint32)
    r = np.asarray(randint(3, ids, 2, jnp.asarray(7)))
    assert r.min() == 0 and r.max() == 6
    counts = np.bincount(r, minlength=7)
    assert counts.min() > 0.8 * len(r) / 7


def test_adjacent_ids_decorrelated():
    # Per-pixel draws must not show spatial structure.
    ids = jnp.arange(100_000, dtype=jnp.uint32)
    u = np.asarray(uniform01(0, ids, 5))
    corr = np.corrcoef(u[:-1], u[1:])[0, 1]
    assert abs(corr) < 0.01
