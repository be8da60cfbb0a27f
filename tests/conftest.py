"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via
``--xla_force_host_platform_device_count`` (the JAX equivalent of a fake
process group, which the reference never had — SURVEY.md §4).

Note: the axon TPU plugin in this image prepends itself to ``jax_platforms``
even when JAX_PLATFORMS=cpu is exported, so we must force the config after
importing jax, before any backend initialisation.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# f32 matmuls on CPU for deterministic parity tests
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
