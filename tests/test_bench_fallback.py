"""Forced-failure test of bench.py's headline fallback chain.

Round-3 postmortem: one Mosaic lowering failure in the auto-route
occlusion kernel zeroed the round's only metric (BENCH_r03 = 0.0) because
the headline fwd+bwd leg had no fallback. The chain must (a) skip
backends whose compile/warmup raises, (b) report the first backend that
works, and (c) raise only when everything fails.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402  (import is side-effect free: __main__ guard)


def test_chain_skips_failing_backends():
    attempts = []

    def make_fns(backend):
        attempts.append(backend)
        if backend in ("auto", "tile"):
            raise RuntimeError(f"Mosaic lowering failed for {backend}")
        return ("fns", backend)

    got_backend, result = bench.compile_with_fallback(
        ["auto", "tile", "lane", "jnp"], make_fns)
    assert got_backend == "lane"
    assert result == ("fns", "lane")
    assert attempts == ["auto", "tile", "lane"]  # jnp never tried


def test_chain_first_backend_wins():
    got_backend, result = bench.compile_with_fallback(
        ["auto", "tile"], lambda b: ("ok", b))
    assert got_backend == "auto" and result == ("ok", "auto")


def test_chain_raises_when_all_fail():
    def make_fns(backend):
        raise ValueError(f"broken {backend}")

    with pytest.raises(RuntimeError, match="every backend"):
        bench.compile_with_fallback(["auto", "jnp"], make_fns)
