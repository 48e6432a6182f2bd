"""Test configuration: force CPU with 8 virtual devices.

The reference has no tests at all (SURVEY §4); the strategy here follows the
JAX idiom of running the full SPMD code on a virtual CPU mesh
(``--xla_force_host_platform_device_count``) so sharding logic is testable
without TPU hardware.

This environment registers a remote-TPU PJRT plugin ("axon") from
sitecustomize in every interpreter; initializing it costs minutes of tunnel
handshake.  Tests must run purely on CPU, so the plugin is deregistered
before the first jax operation.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

try:  # drop the remote-TPU plugin registered by sitecustomize, if any
    import jax
    from jax._src import xla_bridge

    # sitecustomize imports jax before this conftest runs, so the config
    # already latched JAX_PLATFORMS=axon from the environment
    jax.config.update("jax_platforms", "cpu")
    xla_bridge._backend_factories.pop("axon", None)
except Exception:  # pragma: no cover - plugin internals moved; env vars still apply
    pass
