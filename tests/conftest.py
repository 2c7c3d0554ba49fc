"""Pytest configuration: force an 8-device virtual CPU mesh before JAX initializes.

All unit tests run on CPU with 8 virtual devices so sharding/pjit tests exercise
real multi-device code paths without TPU hardware (SURVEY.md §4).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
