"""Test configuration: run on a virtual 8-device CPU mesh.

Must set env vars before jax initializes a backend — this file is imported
by pytest before any test module imports jax.
"""

import os

# NOTE: assignment must be unconditional — a sitecustomize module may have
# already set JAX_PLATFORMS (e.g. to a TPU plugin) before pytest starts.
# PD_TEST_PLATFORM=tpu opts tests onto real hardware.
os.environ["JAX_PLATFORMS"] = os.environ.get("PD_TEST_PLATFORM", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache: CPU compiles at ~1s/program; caching makes
# repeated test runs fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.3")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# fp32 golden tests need true-fp32 convs/matmuls: XLA's default matmul
# precision on fp32 inputs is bf16-pass based (≈1e-4..1e-2 error vs torch).
# The env var has no config mapping — must be set programmatically.
import jax

jax.config.update("jax_default_matmul_precision", "highest")
# The axon TPU shim calls jax.config.update("jax_platforms", "axon,cpu") at
# jax import, overriding the env var — force the test platform back, last.
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import pytest

# Smoke tier (`pytest -m smoke`): seconds-per-test modules that together touch
# every subsystem — schedules/samplers, tokenizers, config+import rules, data,
# quant math, fused kernels, CLI surface. Keeps the edit-test loop <~3 min even
# on a 1-core host (the default tier is tens of minutes there). Slow-marked
# tests never join, whatever module they sit in.
SMOKE_MODULES = {
    "test_annotators",
    "test_bench_cli",
    "test_config",
    "test_data",
    "test_flow_match",
    "test_fused_act",
    "test_fused_adaln",
    "test_import_rules",
    "test_native_loader",
    "test_ops",
    "test_samplers_extra",
    "test_schedules",
    "test_tokenizers",
    "test_unipc",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if (
            item.module.__name__ in SMOKE_MODULES
            and "slow" not in item.keywords
        ):
            item.add_marker(pytest.mark.smoke)
