from xmcgan_image_generation_tpu.data.pipeline import create_datasets  # noqa: F401
