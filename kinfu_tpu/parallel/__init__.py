from kinfu_tpu.parallel.mesh import make_mesh, volume_sharding  # noqa: F401
from kinfu_tpu.parallel.sharded import (  # noqa: F401
    halo_exchange_z,
    sharded_raycast,
    make_sharded_step_fn,
    shard_state,
)
