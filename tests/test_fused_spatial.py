"""Exact functional equivalence of the fused spatial-modulation generator.

The fused path claims *mathematical identity* with the reference-layout
pipeline (conv1x1 commutes with nearest upsample; conv-of-concat splits
into conv + dense).  This test maps the naive variant's parameters into
the fused layout and asserts the generators produce the same images.
"""

import jax
import jax.numpy as jnp
import numpy as np

from xmcgan_image_generation_tpu.configs import coco_xmc
from xmcgan_image_generation_tpu.models import get_architecture

BERT_DIM = 768


def flatten(tree, prefix=""):
  out = {}
  for k, v in tree.items():
    path = f"{prefix}/{k}" if prefix else k
    if isinstance(v, dict):
      out.update(flatten(v, path))
    else:
      out[path] = v
  return out


def unflatten(flat):
  out = {}
  for path, v in flat.items():
    node = out
    parts = path.split("/")
    for p in parts[:-1]:
      node = node.setdefault(p, {})
    node[parts[-1]] = v
  return out


def map_naive_to_fused(naive_flat, fused_flat, region_dim=BERT_DIM):
  """Builds fused-layout params from naive-layout params."""
  mapped = {}
  for path, value in naive_flat.items():
    p = path.replace("GenSpatialBlock_", "GenSpatialBlockFused_")
    if "LocalConditionalBatchNorm" in p:
      base, tail = p.split("LocalConditionalBatchNorm")
      idx, rest = tail.split("/", 1)
      mod = f"{base}FusedSpatialModulation{idx}"
      which = {"Conv_0": ("gamma_ctx", "gamma_global"),
               "Conv_1": ("beta_ctx", "beta_global")}
      matched = False
      for conv_name, (ctx_name, glob_name) in which.items():
        if rest.startswith(conv_name + "/"):
          leaf = rest.split("/")[-1]
          if leaf == "kernel":
            mapped[f"{mod}/{ctx_name}/kernel"] = value[:, :, :region_dim, :]
            mapped[f"{mod}/{glob_name}/kernel"] = value[0, 0, region_dim:, :]
          elif leaf == "bias":
            mapped[f"{mod}/{glob_name}/bias"] = value
          matched = True
      if not matched:  # BatchNorm stats/params inside the modulation.
        mapped[f"{mod}/{rest}"] = value
    else:
      mapped[p] = value
  assert set(mapped) == set(fused_flat), (
      sorted(set(fused_flat) - set(mapped))[:5],
      sorted(set(mapped) - set(fused_flat))[:5])
  for k in mapped:
    assert mapped[k].shape == fused_flat[k].shape, (
        k, mapped[k].shape, fused_flat[k].shape)
  return unflatten(mapped)


class TestFusedSpatialEquivalence:

  def test_outputs_identical_under_mapped_params(self):
    config = coco_xmc.get_test_config()
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32),
        "embedding": rng.standard_normal((2, 17, BERT_DIM)).astype(
            np.float32),
        "sentence_embedding": rng.standard_normal((2, BERT_DIM)).astype(
            np.float32),
        "max_len": np.full((2, 1), 9.0, np.float32),
    }
    z = rng.standard_normal((2, config.z_dim)).astype(np.float32)

    config.fused_spatial_cond = False
    gen_naive, _ = get_architecture(config, jnp.float32)
    naive_vars = gen_naive(train=False).init(
        jax.random.PRNGKey(1), (batch, z))

    config2 = coco_xmc.get_test_config()
    config2.fused_spatial_cond = True
    gen_fused, _ = get_architecture(config2, jnp.float32)
    fused_vars = gen_fused(train=False).init(
        jax.random.PRNGKey(2), (batch, z))

    mapped_params = map_naive_to_fused(
        flatten(dict(naive_vars["params"])),
        flatten(dict(fused_vars["params"])))
    mapped_stats = unflatten({
        k.replace("GenSpatialBlock_", "GenSpatialBlockFused_").replace(
            "LocalConditionalBatchNorm", "FusedSpatialModulation"): v
        for k, v in flatten(dict(naive_vars["batch_stats"])).items()})

    img_naive = gen_naive(train=False).apply(naive_vars, (batch, z),
                                             mutable=False)
    img_fused = gen_fused(train=False).apply(
        {"params": mapped_params, "batch_stats": mapped_stats},
        (batch, z), mutable=False)
    np.testing.assert_allclose(np.asarray(img_naive),
                               np.asarray(img_fused),
                               rtol=1e-4, atol=1e-5)

  def test_spectral_norm_forces_reference_layout(self):
    """With g_spectral_norm the fused identity does not hold (split kernels
    would be normalized independently) — the generator must fall back to
    the exact reference-layout pipeline regardless of fused_spatial_cond."""
    config = coco_xmc.get_test_config()
    config.g_spectral_norm = True
    config.fused_spatial_cond = True
    rng = np.random.default_rng(0)
    batch = {
        "embedding": rng.standard_normal((2, 17, BERT_DIM)).astype(
            np.float32),
        "sentence_embedding": rng.standard_normal((2, BERT_DIM)).astype(
            np.float32),
        "max_len": np.full((2, 1), 9.0, np.float32),
    }
    z = rng.standard_normal((2, config.z_dim)).astype(np.float32)
    gen, _ = get_architecture(config, jnp.float32)
    gen_vars = jax.jit(gen(train=False).init)(jax.random.PRNGKey(1),
                                              (batch, z))
    names = " ".join(flatten(dict(gen_vars["params"])))
    assert "FusedSpatialModulation" not in names
    assert "LocalConditionalBatchNorm" in names
