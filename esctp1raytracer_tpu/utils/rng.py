"""Counter-based deterministic RNG for light sampling.

The reference draws from one shared mt19937 (seeded by random_device,
unsynchronized across row threads — SURVEY.md quirk 8, reference
src/main.cpp:587-588): nondeterministic by design. Here every random draw
is a pure hash of (seed, ray_id, stream), so renders are bit-identical
regardless of ray chunking, device sharding, or execution order — the
property that makes golden tests and multi-host runs reproducible.

The mixer is the murmur3 32-bit finalizer over the draw coordinates —
pure uint32 VPU ops, no threefry key scheduling on the hot path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# numpy scalars, NOT jnp: module-level jnp constants materialize on the
# default device at import time, which both pins them before any mesh
# exists and initializes the XLA backend — breaking
# jax.distributed.initialize(), which must run before first backend use
# (tests/distributed_worker.py). Inside traced code they weak-type
# promote identically.
_C1 = np.uint32(0x85EBCA6B)
_C2 = np.uint32(0xC2B2AE35)
_GOLDEN = np.uint32(0x9E3779B9)


def _fmix32(h: jax.Array) -> jax.Array:
    h = h ^ (h >> 16)
    h = h * _C1
    h = h ^ (h >> 13)
    h = h * _C2
    h = h ^ (h >> 16)
    return h


def hash_u32(seed, ray_id: jax.Array, stream) -> jax.Array:
    """Mix (seed, ray_id, stream) into uniform uint32 bits.

    `stream` may be a scalar or an array broadcastable against `ray_id`
    (e.g. ray_id [R, 1] x stream [L] -> draws [R, L]); identical
    (seed, ray_id, stream) coordinates give identical bits either way.
    """
    h = jnp.asarray(ray_id).astype(jnp.uint32)
    h = _fmix32(h ^ (jnp.uint32(seed) + _GOLDEN))
    h = _fmix32(h ^ (jnp.asarray(stream).astype(jnp.uint32) * _C1 + _GOLDEN))
    return h


def uniform01(seed, ray_id: jax.Array, stream) -> jax.Array:
    """Uniform float32 in [0, 1) per draw — 24 mantissa-quality bits."""
    bits = hash_u32(seed, ray_id, stream)
    return (bits >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def randint(seed, ray_id: jax.Array, stream, maxval: jax.Array) -> jax.Array:
    """Uniform int in [0, maxval) per draw (maxval broadcastable, >= 1)."""
    u = uniform01(seed, ray_id, stream)
    maxval = jnp.asarray(maxval)
    return jnp.minimum(
        (u * maxval.astype(jnp.float32)).astype(jnp.int32), maxval - 1
    )
