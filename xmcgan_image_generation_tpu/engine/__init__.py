from xmcgan_image_generation_tpu.engine.state import (  # noqa: F401
    TrainState,
    create_optimizers,
    create_train_state,
)
from xmcgan_image_generation_tpu.engine.registry import (  # noqa: F401
    get_gan_algorithm,
)
