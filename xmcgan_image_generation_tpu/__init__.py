"""XMC-GAN, rebuilt TPU-native.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
google-research/xmcgan_image_generation ("Cross-Modal Contrastive Learning
for Text-to-Image Generation", CVPR 2021, arXiv 2101.04702):

* text-conditional GAN training with cross-modal contrastive losses,
* SPMD execution over a `jax.sharding.Mesh` (GSPMD, not pmap),
* deterministic, checkpointable input pipeline over precomputed BERT
  caption embeddings,
* EMA weights, Orbax checkpoint/resume,
* a continuous FID / Inception-Score evaluation service.

Unlike the reference (pure-Python pmap trainer), the compute path here is a
single jitted SPMD program over a named device mesh, contrastive negatives
are gathered globally over ICI, and the hot fused ops have Pallas TPU
kernels (see `xmcgan_image_generation_tpu.ops.pallas`).
"""

__version__ = "0.1.0"
