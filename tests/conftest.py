"""Test harness: run everything on a virtual 8-device CPU mesh.

Pure-function numerics are unit-testable on XLA:CPU; multi-chip sharding is
exercised without a pod via --xla_force_host_platform_device_count (the JAX
analogue of a fake distributed backend — see SURVEY.md §4).

The container boots with an `axon` TPU-tunnel backend pre-registered from
sitecustomize and JAX_PLATFORMS=axon exported, so plain env-var overrides in
a conftest are too late; jax.config.update after import is the reliable
switch.  CPU backend creation is lazy, so XLA_FLAGS set here still applies.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
