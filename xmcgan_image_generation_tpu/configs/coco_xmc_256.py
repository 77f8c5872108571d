"""256px paper configuration (COCO-2014).

The reference's full-paper setting needs a TPU v3-32-class mesh
(reference README.md:76); here the same config runs under GSPMD on any
mesh — set ``mesh_data`` or let it consume all devices.
"""

import ml_collections

from xmcgan_image_generation_tpu.configs import coco_xmc


def get_config(config_string: str = "") -> ml_collections.ConfigDict:
  config = coco_xmc.get_config(config_string)
  if config_string == "test":
    return config
  config.image_size = 256
  # Paper-scale schedule: larger global batch over the pod slice.
  config.batch_size = 256
  config.eval_batch_size = 64
  # 256px activations are 4x the 128px config: trade recompute for HBM.
  # Selective: only the largest (256px) scale is rematerialized — it alone
  # holds ~half the activation bytes, and the round-3 sweep (BENCH_NOTES:
  # remat_min_resolution x {0,64,128,256} x batch {16,32} on a 16 GB chip)
  # showed 256 is fastest at both batches and still fits batch 32.  Drop
  # to 128 for smaller-HBM parts or larger per-chip batches.
  config.remat = True
  config.remat_min_resolution = 256
  # The round-4 interaction sweep (scale_fused x remat_policy x batch,
  # BENCH_NOTES) re-confirmed these defaults with everything else ON:
  # full-policy remat of the 256px scale beats the conv policy at both
  # batches (16: 159.8 vs 155.2 img/s; 32: 169.3 vs 164.9) — at the
  # bandwidth-heavy largest scale, saving its conv outputs costs more
  # HBM traffic than recomputing them.
  return config


def get_test_config() -> ml_collections.ConfigDict:
  config = coco_xmc.get_test_config()
  config.image_size = 64
  return config


def get_hyper(h):
  return h.product([], name="config")
