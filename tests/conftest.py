import os

import jax

# Tests run on a virtual 8-device CPU mesh (the TPU analog of a fake backend).
# NOTE: this environment pins JAX_PLATFORMS=axon via sitecustomize, so the
# env-var route (JAX_PLATFORMS=cpu / xla_force_host_platform_device_count)
# is ignored — the config API is authoritative.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

jax.config.update("jax_enable_x64", False)
# The default matmul precision on this stack is bf16-level even on CPU;
# parity/golden tests need true fp32 accumulation.
jax.config.update("jax_default_matmul_precision", "float32")

# Cache compiles on disk so repeat test runs don't recompile.
_CACHE = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
