"""Pytest configuration: force an 8-device virtual CPU mesh before any test runs.

All unit tests run on CPU with 8 virtual devices so sharding/pjit tests exercise
real multi-device code paths without TPU hardware (SURVEY.md §4).

NOTE: this environment's sitecustomize registers the `axon` TPU backend and calls
`jax.config.update("jax_platforms", "axon,cpu")` at interpreter start, which overrides
the JAX_PLATFORMS env var — so the override must happen through jax.config here.
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
