"""Multi-chip / multi-host scale-out (jax.sharding over a device Mesh)."""
from .sharding import (make_mesh, decode_plan_sharded, decode_plan_dp_sp,  # noqa: F401
                       compress_sharded, encode_blocks_sharded,
                       dp_sp_kernel)
