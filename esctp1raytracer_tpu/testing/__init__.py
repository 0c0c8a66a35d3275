"""Test oracles and verification utilities (committed per VERDICT r1 #6)."""

from esctp1raytracer_tpu.testing.oracle import oracle_render  # noqa: F401
