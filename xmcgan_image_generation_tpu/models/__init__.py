from xmcgan_image_generation_tpu.models.registry import get_architecture  # noqa: F401
