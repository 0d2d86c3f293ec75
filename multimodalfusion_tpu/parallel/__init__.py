from multimodalfusion_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    replicate_sharding,
    shard_batch,
)
