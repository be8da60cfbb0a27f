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

import pytest  # noqa: E402

# Modules whose tests are heavyweight (full decode loops, training runs,
# HTTP servers, torch-reference parity): auto-marked ``slow`` so
# ``pytest -m "not slow"`` is a <5-min smoke lane (measured module totals,
# r04).  Individual tests elsewhere can still opt in with
# ``@pytest.mark.slow``.
SLOW_TEST_MODULES = {
    "test_audio_and_convert.py", "test_autospec.py", "test_batch_tts.py",
    "test_bf16_smoke.py", "test_distributed.py", "test_encodec_e2e.py",
    "test_end_to_end_learning.py", "test_engine.py", "test_engine_spec.py",
    "test_flash_attention.py", "test_fused_decode.py", "test_grad_accum.py",
    "test_parallel_inference.py", "test_parity_reference.py",
    "test_quantize.py", "test_realedit_cli.py", "test_remat_policy.py",
    "test_scaling.py", "test_serve_http.py", "test_serving.py",
    "test_serving_edit.py", "test_serving_edit_spec.py",
    "test_serving_spec.py", "test_spec_decode.py", "test_spec_edit.py",
    "test_spec_stochastic.py", "test_steps_per_iter.py",
    "test_streaming.py", "test_trainer.py", "test_tts_batch_cli.py",
    "test_zero1.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.nodeid.split("::", 1)[0].rsplit("/", 1)[-1]
        if mod in SLOW_TEST_MODULES:
            item.add_marker(pytest.mark.slow)
