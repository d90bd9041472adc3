"""Test configuration.

Tests run on an 8-device virtual CPU mesh (the JAX-native 'fake backend'
the reference lacks, SURVEY.md §4).

The session environment may carry the `axon` remote-TPU PJRT plugin
(PALLAS_AXON_POOL_IPS): its sitecustomize hook re-points ``jax_platforms``
at the remote chip, which (a) stalls interpreter start on a relay dial and
(b) runs matmuls at TPU-native (bf16-rounded) precision, breaking the
float32 oracle tolerances.  Plugin registration happens before pytest
imports this file, so we re-exec the whole pytest run once in a cleaned
environment (suspending capture so the child's output reaches the
terminal).
"""

import os
import sys

_NEEDS_REEXEC = bool(os.environ.get("PALLAS_AXON_POOL_IPS")) and not os.environ.get(
    "_QINCO_TPU_REEXEC"
)

if not _NEEDS_REEXEC:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_enable_x64", False)


def pytest_configure(config):
    if not _NEEDS_REEXEC:
        return
    import subprocess

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["_QINCO_TPU_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()

    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.suspend_global_capture(in_=True)
    ret = subprocess.call([sys.executable, "-m", "pytest", *sys.argv[1:]], env=env)
    os._exit(ret)
