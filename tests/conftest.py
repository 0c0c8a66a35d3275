"""Test harness config: force a CPU backend with 8 virtual devices.

The test suite runs everywhere (including TPU-attached hosts) on CPU with
XLA's virtual-device trick, so multi-device sharding logic is exercised
without a pod — the strategy SURVEY.md §4 prescribes.

History: this used to re-exec pytest with a scrubbed environment, because
selecting JAX_PLATFORMS=cpu after the axon TPU plugin auto-registered
(sitecustomize, PALLAS_AXON_POOL_IPS) hung the first XLA op on older jax.
Two things changed: pytest entry-point plugins now import jax before any
conftest runs (so an import-guard re-exec silently never fired and every
8-device mesh test skipped), and on current jax the in-process
`jax_platforms=cpu` + `jax_num_cpu_devices=8` config works even with the
axon plugin registered. So configure in-process — it cannot be skipped
and keeps pytest's capture machinery intact.
"""

import os

os.environ.pop("PALLAS_AXON_POOL_IPS", None)  # scrub for any child procs
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except RuntimeError:
    # Backend already initialized (a plugin touched a device before us);
    # the XLA_FLAGS fallback above then decides the device count.
    pass

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices (set jax_num_cpu_devices=8)")
    return jax.devices()[:8]
