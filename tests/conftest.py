"""Test harness config: force a CPU backend with 8 virtual devices.

The test suite runs everywhere (including TPU-attached hosts) on CPU with
XLA's virtual-device trick, so multi-device sharding logic is exercised
without a pod — the strategy SURVEY.md §4 prescribes.

On hosts where the axon TPU tunnel auto-registers via sitecustomize
(PALLAS_AXON_POOL_IPS set), selecting JAX_PLATFORMS=cpu *after* that
registration hangs the first XLA op; registration must be prevented before
interpreter boot. We therefore re-exec pytest once with a scrubbed
environment before anything imports jax.
"""

import os
import sys

_SENTINEL = "_ESCTP_CPU_REEXEC"

if "jax" not in sys.modules and os.environ.get(_SENTINEL) != "1":
    needs_reexec = bool(os.environ.get("PALLAS_AXON_POOL_IPS"))
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env[_SENTINEL] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    if needs_reexec:
        os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)
    else:
        os.environ.update(env)

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices (XLA_FLAGS=--xla_force_host_platform_device_count=8)")
    return jax.devices()[:8]
