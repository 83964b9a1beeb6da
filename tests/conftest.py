"""Test configuration: run everything on a virtual 8-device CPU mesh.

Note: this host pins JAX_PLATFORMS=axon in the environment and the plugin
wins over env-var overrides, so we must force the platform through
jax.config *before* any backend is initialized.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
