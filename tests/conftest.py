import os
import sys

# Multi-chip sharding is tested on a virtual 8-device CPU mesh. The
# environment's sitecustomize imports jax and pins JAX_PLATFORMS=axon (a
# remote TPU tunnel with remote compile) before conftest runs, so env vars
# alone don't stick — override through jax.config before any backend
# initializes. Tests must never depend on the tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# Persistent compile cache: the decode kernel's vmapped while_loop takes
# seconds per shape to compile; cache across test runs.
_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
