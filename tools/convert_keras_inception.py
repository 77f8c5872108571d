"""Offline Keras-InceptionV3 -> Flax ``.npz`` weight conversion.

The reference converts Keras variables to Flax at *runtime* on every eval
job startup (reference xmcgan/utils/inception_utils.py:28-94, 128-149).
Here conversion is a one-time offline step; the serving path never imports
Keras/TF.

Usage (requires tensorflow + the Keras weight file, which Keras downloads
on first use — run somewhere with network access or a local weight cache):

  python tools/convert_keras_inception.py --output=inception_v3.npz

Then point ``config.inception_ckpt_path`` at the ``.npz``.
"""

import argparse

import numpy as np


# Keras InceptionV3 conv layer index -> our module path.  Keras names convs
# conv2d, conv2d_1, ... in build order; the build order below follows
# keras.applications.inception_v3 exactly.
def _keras_conv_order():
  order = [
      "stem_conv0", "stem_conv1", "stem_conv2", "stem_conv3", "stem_conv4",
  ]
  # mixed0-2 (InceptionA): keras builds branch1x1, branch5x5(2),
  # branch3x3dbl(3), branch_pool.
  for m in ("mixed0", "mixed1", "mixed2"):
    order += [f"{m}/b0_1x1", f"{m}/b1_1x1", f"{m}/b1_5x5",
              f"{m}/b2_1x1", f"{m}/b2_3x3a", f"{m}/b2_3x3b",
              f"{m}/b3_1x1"]
  # mixed3 (InceptionB): branch3x3, branch3x3dbl(3).
  order += ["mixed3/b0_3x3", "mixed3/b1_1x1", "mixed3/b1_3x3a",
            "mixed3/b1_3x3b"]
  # mixed4-7 (InceptionC): branch1x1, branch7x7(3), branch7x7dbl(5),
  # branch_pool.
  for m in ("mixed4", "mixed5", "mixed6", "mixed7"):
    order += [f"{m}/b0_1x1", f"{m}/b1_1x1", f"{m}/b1_1x7", f"{m}/b1_7x1",
              f"{m}/b2_1x1", f"{m}/b2_7x1a", f"{m}/b2_1x7a",
              f"{m}/b2_7x1b", f"{m}/b2_1x7b", f"{m}/b3_1x1"]
  # mixed8 (InceptionD): branch3x3(2), branch7x7x3(4).
  order += ["mixed8/b0_1x1", "mixed8/b0_3x3", "mixed8/b1_1x1",
            "mixed8/b1_1x7", "mixed8/b1_7x1", "mixed8/b1_3x3"]
  # mixed9-10 (InceptionE): branch1x1, branch3x3(1)+splits(2),
  # branch3x3dbl(2)+splits(2), branch_pool.
  for m in ("mixed9", "mixed10"):
    order += [f"{m}/b0_1x1", f"{m}/b1_1x1", f"{m}/b1_1x3", f"{m}/b1_3x1",
              f"{m}/b2_1x1", f"{m}/b2_3x3", f"{m}/b2_1x3", f"{m}/b2_3x1",
              f"{m}/b3_1x1"]
  return order


def _name_index(name: str) -> int:
  """'conv2d_5' -> 5, 'conv2d' -> 0 (Keras name-counter order)."""
  tail = name.rsplit("_", 1)[-1]
  return int(tail) if tail.isdigit() else 0


def extract(keras_model) -> dict:
  """Keras model -> flat {flax_path: np.ndarray}.

  ``keras_model.layers`` is topologically sorted, but the Nth-constructed
  Conv2D pairs with the Nth-constructed BatchNormalization (keras'
  conv2d_bn helper creates them together), so we sort each class by its
  name counter and zip against the construction-order path list.
  """
  flat = {}
  order = _keras_conv_order()
  convs = sorted((l for l in keras_model.layers
                  if type(l).__name__ == "Conv2D"),
                 key=lambda l: _name_index(l.name))
  bns = sorted((l for l in keras_model.layers
                if type(l).__name__ == "BatchNormalization"),
               key=lambda l: _name_index(l.name))
  assert len(convs) == len(bns) == len(order), (
      len(convs), len(bns), len(order))
  for layer, path in zip(convs, order):
    flat[f"params/{path}/conv/kernel"] = layer.kernel.numpy()
  for layer, path in zip(bns, order):
    flat[f"params/{path}/bn/bias"] = layer.beta.numpy()
    flat[f"batch_stats/{path}/bn/mean"] = layer.moving_mean.numpy()
    flat[f"batch_stats/{path}/bn/var"] = layer.moving_variance.numpy()
  dense = [l for l in keras_model.layers if type(l).__name__ == "Dense"]
  flat["params/predictions/kernel"] = dense[0].kernel.numpy()
  flat["params/predictions/bias"] = dense[0].bias.numpy()
  return flat


def convert(output_path: str) -> None:
  import tensorflow as tf  # Offline-only dependency.

  keras_model = tf.keras.applications.InceptionV3(
      include_top=True, weights="imagenet")
  flat = extract(keras_model)

  # Validate against the Flax model before writing.
  from xmcgan_image_generation_tpu.models.inception_v3 import InceptionV3
  from xmcgan_image_generation_tpu.utils import inception_weights
  np.savez(output_path, **flat)
  inception_weights.load_or_init(InceptionV3(), output_path)
  print(f"Wrote {len(flat)} arrays to {output_path}")


if __name__ == "__main__":
  parser = argparse.ArgumentParser()
  parser.add_argument("--output", required=True)
  args = parser.parse_args()
  convert(args.output)
