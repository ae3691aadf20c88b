from prompt_diffusion_tpu.parallel.mesh import (
    MeshAxes,
    make_mesh,
    batch_sharding,
    shard_params,
    replicate,
)
