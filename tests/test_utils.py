"""Utility subsystem tests: debug levels, timing report, profiling hooks."""

import logging

import esctp1raytracer_tpu.utils.debug as dbg
from esctp1raytracer_tpu.utils.profiling import annotate, phase, trace
from esctp1raytracer_tpu.utils.timing import Timer


def test_debug_levels_roundtrip():
    try:
        for level in (dbg.QUIET, dbg.INFO, dbg.DEBUG, dbg.TRACE):
            dbg.set_level(level)
            assert dbg.current_level() == level
        dbg.set_level(99)  # clamped
        assert dbg.current_level() == dbg.TRACE
        dbg.set_level(-1)
        assert dbg.current_level() == dbg.QUIET
    finally:
        dbg.set_level(dbg.INFO)


def test_timer_report_fields(capsys):
    import sys

    with Timer("x") as t:
        pass
    t.fields = {"Threaded": "false", "Mode": "jnp"}
    t.report(file=sys.stderr)
    err = capsys.readouterr().err
    assert "Threaded" in err
    assert "Duration" in err
    assert t.elapsed_ms >= 0.0


def test_phase_logs():
    # The package logger doesn't propagate to root (it has its own stderr
    # handler), so capture with a handler attached directly to it.
    records = []

    class Capture(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    logger = logging.getLogger("esctp1raytracer_tpu")
    handler = Capture(level=logging.INFO)
    logger.addHandler(handler)
    try:
        with phase("unit-test-phase"):
            pass
    finally:
        logger.removeHandler(handler)
    assert any("unit-test-phase" in m for m in records)


def test_trace_noop_without_dir(monkeypatch):
    monkeypatch.delenv("ESCTP_PROFILE_DIR", raising=False)
    with trace():  # must be a zero-overhead no-op
        pass


def test_trace_writes_profile(tmp_path):
    import jax.numpy as jnp

    with trace(str(tmp_path)):
        jnp.sum(jnp.ones((8, 8))).block_until_ready()
    # jax.profiler writes a plugins/profile dir inside the log dir
    produced = list(tmp_path.rglob("*"))
    assert produced, "no profiler output written"


def test_annotate_context():
    with annotate("region"):
        pass
