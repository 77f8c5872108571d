from xmcgan_image_generation_tpu.parallel.mesh import (  # noqa: F401
    MeshRules,
    batch_sharding,
    create_mesh,
    replicated_sharding,
    shard_batch,
    to_host,
)
