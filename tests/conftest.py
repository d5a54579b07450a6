"""Test configuration: force the CPU backend with 8 virtual devices.

The axon TPU plugin in this image force-registers itself via sitecustomize and
ignores JAX_PLATFORMS=cpu from the environment, so the platform must be pinned
programmatically before any other jax call. Tests run on CPU for speed and
determinism; the 8 virtual devices back the multi-chip sharding tests
(SURVEY.md §4.3).
"""

import os

# No persistent compilation cache under tests: the cache is the TPU/PGO
# deployment artifact (interpn_tpu/config.py); XLA:CPU AOT entries warn
# spuriously on every load (tuning pseudo-features like +prefer-no-gather
# are recorded at compile time but never reported by the host probe), and
# test compiles are small anyway. Must be set before interpn_tpu imports.
os.environ.setdefault("INTERPN_TPU_CACHE_DIR", "0")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
