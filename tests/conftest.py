"""Pytest configuration: force an 8-device virtual CPU mesh before any test runs.

All unit tests run on CPU with 8 virtual devices so sharding/pjit tests exercise
real multi-device code paths without TPU hardware (SURVEY.md §4).

NOTE: this environment's sitecustomize registers the `axon` TPU backend and calls
`jax.config.update("jax_platforms", "axon,cpu")` at interpreter start, which overrides
the JAX_PLATFORMS env var — so the override must happen through jax.config here.
"""
import os

# Silence XLA's cpu_aot_loader machine-feature LOG(ERROR) spam when loading
# persistent-cache entries (cosmetic: the compile-side pseudo-features
# +prefer-no-scatter/+prefer-no-gather never appear in the host feature list).
# Must be set before jax initializes the backend.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# Persistent XLA compile cache for the CPU test lane: /root/repo persists
# across driver sessions (while /tmp is wiped), so every lane run after the
# first gets warm compiles — the lane is compile-dominated otherwise (the
# train-step smoke alone is 52 s cold vs ~8 s warm).
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# Module-level marker assignment so the suite has a <2-min fast lane:
#   pytest -m "not slow and not e2e and not torch"
_MODULE_MARKS = {
    "test_e2e": ("e2e", "slow"),
    "test_torch_parity": ("torch", "slow"),
    "test_map_parity": ("torch", "slow"),
    "test_loss_parity": ("torch",),
    "test_train": ("slow",),
    "test_device_aug": ("slow",),
    "test_video": ("slow",),
    # bucketed-API + int8 suites each cost 45-80 s of compiles: full-lane only
    "test_api_buckets": ("slow",),
    "test_int8_stage": ("slow",),
    "test_int8_stem": ("slow",),
    "test_int8_neck": ("slow",),
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = getattr(item.module, "__name__", "")
        for mark in _MODULE_MARKS.get(mod, ()):
            item.add_marker(getattr(pytest.mark, mark))
