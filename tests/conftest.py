"""Test config: run the suite on a virtual 8-device CPU mesh.

Unlike the reference suite (hard-pinned to cuda:0, tests/test_grid.py:4-7),
the jnp implementations run anywhere, so tests are CPU-runnable and also
exercise multi-device sharding.  jax may already be imported by the
environment (with a TPU platform pre-selected), so we override via
jax.config — which takes effect at backend initialization — rather than env
vars.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
