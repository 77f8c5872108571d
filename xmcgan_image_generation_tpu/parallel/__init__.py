from xmcgan_image_generation_tpu.parallel.mesh import (  # noqa: F401
    MeshRules,
    batch_sharding,
    create_mesh,
    replicated_sharding,
    shard_batch,
    to_host,
)
from xmcgan_image_generation_tpu.parallel.context import (  # noqa: F401
    ambient_mesh,
    get_ambient_mesh,
    set_ambient_mesh,
)
