from xmcgan_image_generation_tpu.ops import attention  # noqa: F401
from xmcgan_image_generation_tpu.ops import contrastive  # noqa: F401
from xmcgan_image_generation_tpu.ops import losses  # noqa: F401
