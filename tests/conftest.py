"""Test config: force a local 8-device virtual CPU mesh.

The container preregisters a remote 'axon' TPU backend at interpreter
start (remote compile round-trips make it unusable for unit tests);
jax.config.update overrides it. Sharding tests use the 8 virtual CPU
devices (SURVEY.md §4 test strategy).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()
