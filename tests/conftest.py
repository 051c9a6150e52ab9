"""Test configuration: force an 8-device virtual CPU platform.

The container's sitecustomize imports jax and registers the 'axon' TPU
plugin before any test code runs, so env vars are too late — the platform
must be overridden through jax.config.
"""

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 8)
