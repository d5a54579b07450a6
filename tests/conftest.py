"""Test configuration: force the CPU backend with 8 virtual devices.

The axon TPU plugin in this image force-registers itself via sitecustomize and
ignores JAX_PLATFORMS=cpu from the environment, so the platform must be pinned
programmatically before any other jax call. Tests run on CPU for speed and
determinism; the 8 virtual devices back the multi-chip sharding tests
(SURVEY.md §4.3).
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
