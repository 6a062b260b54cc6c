import os

# Tests run on a virtual 8-device CPU mesh (the TPU analog of a fake backend).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# The default matmul precision on this stack is bf16-level even on CPU;
# parity/golden tests need true fp32 accumulation.
jax.config.update("jax_default_matmul_precision", "float32")

# XLA-CPU compiles are slow in this environment (~0.5s/op); cache them on disk
# so repeat test runs don't recompile.
_CACHE = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
