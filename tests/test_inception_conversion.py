"""Numeric validation of the Keras-InceptionV3 -> Flax weight conversion.

Round-1 gap: `tools/convert_keras_inception.py` was shape-validated only —
a transposed kernel or swapped branch would have passed every test and
silently wrecked FID.  Here we build the real Keras InceptionV3 with random
(distinctive) weights, run the actual converter, and assert the Flax tower
reproduces Keras' pool features and class probabilities.

Parity surface: reference xmcgan/utils/inception_utils.py:97-149 (runtime
Keras->Flax bridge; ours is the offline equivalent).
"""

import sys

import numpy as np
import pytest

# ~80s, dominated by building/running Keras' InceptionV3 on CPU — not
# XLA-compile time, so the quick tier's opt-level lever can't touch it.
# The quick tier keeps test_eval.py::TestInceptionV3::test_weight_roundtrip
# as its Inception gate; this numeric Keras-parity test runs in the heavy
# tier (and whenever the converter or the Flax tower changes).
pytestmark = pytest.mark.heavy

sys.path.insert(0, "tools")


@pytest.fixture(scope="module")
def keras_model():
  # Import inside the fixture: a module-level importorskip would pull the
  # whole TF runtime in at COLLECTION time, which the quick tier (where
  # this module is deselected) would still pay for.
  tf = pytest.importorskip("tensorflow")
  model = tf.keras.applications.InceptionV3(include_top=True, weights=None)
  rng = np.random.default_rng(0)
  for w in model.weights:
    shape = tuple(w.shape)
    name = w.path if hasattr(w, "path") else w.name
    if "moving_variance" in name:
      w.assign(rng.uniform(0.5, 1.5, shape).astype(np.float32))
    elif "moving_mean" in name:
      w.assign(rng.normal(0.0, 0.1, shape).astype(np.float32))
    else:
      # Small kernels keep 48 layers of random convs from saturating.
      w.assign(rng.normal(0.0, 0.05, shape).astype(np.float32))
  return model


def test_converted_weights_reproduce_keras_forward(keras_model, tmp_path):
  import jax
  import tensorflow as tf  # the keras_model fixture already gated on it
  from convert_keras_inception import extract
  from xmcgan_image_generation_tpu.models.inception_v3 import InceptionV3
  from xmcgan_image_generation_tpu.utils import inception_weights

  flat = extract(keras_model)
  path = str(tmp_path / "inception_random.npz")
  np.savez(path, **flat)

  model = InceptionV3()
  variables = inception_weights.load_or_init(model, path)

  rng = np.random.default_rng(1)
  images = rng.uniform(-1, 1, (2, 299, 299, 3)).astype(np.float32)

  pool, logits = jax.jit(
      lambda x: model.apply(variables, x, train=False, mutable=False))(
          images)
  probs = jax.nn.softmax(logits)

  # Keras ground truth: tap avg_pool, recompute logits pre-softmax.
  tap = tf.keras.Model(
      keras_model.input, keras_model.get_layer("avg_pool").output)
  want_pool = tap(images, training=False).numpy()
  dense = keras_model.get_layer("predictions")
  want_logits = want_pool @ dense.kernel.numpy() + dense.bias.numpy()
  want_probs = keras_model(images, training=False).numpy()

  np.testing.assert_allclose(np.asarray(pool), want_pool,
                             rtol=1e-4, atol=1e-4)
  np.testing.assert_allclose(np.asarray(logits), want_logits,
                             rtol=1e-4, atol=1e-4)
  np.testing.assert_allclose(np.asarray(probs), want_probs,
                             rtol=1e-4, atol=1e-5)
