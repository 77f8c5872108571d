"""Serving export: the trained generator as a portable StableHLO artifact.

The reference has no serving story — inference means restoring the full
training checkpoint inside the training codebase (reference
xmcgan/train_utils.py:245-309).  For production deployment the TPU-native
path is ``jax.export``: ahead-of-time lower the inference-mode generator
(normal or EMA weights baked in as constants) to a serialized StableHLO
module that any PJRT runtime can load and run **without this framework,
Flax, or the checkpoint** — only ``jax.export.deserialize`` (or a raw
StableHLO consumer) is needed at serving time.

The exported function has the pure signature::

    (sentence_embedding [B, 768], embedding [B, L, 768],
     max_len [B, 1], z [B, z_dim]) -> float32 images [B, S, S, 3] in [0, 1]

``B`` is either a static batch size or a symbolic dimension
(``batch_size=None``) so one artifact serves any batch size.  BatchNorm
uses the checkpoint's
running averages and spectral-norm layers their stored ``u0`` (train=False:
no mutable state remains, which is what makes the function pure/exportable).
"""

from __future__ import annotations

import functools
import importlib
import json
from typing import Any, Dict, Optional, Tuple

import jax
from jax import export as jax_export
import jax.numpy as jnp
import ml_collections

Array = jnp.ndarray

#: Text conditioning constants (reference libml/dataset_constants.py:15-20).
BERT_DIM = 768
COCO_MAX_TEXT_LENGTH = 17


def load_config_module(spec: str) -> ml_collections.ConfigDict:
  """``configs/<module>[:variant]`` -> config (tools' --config_module)."""
  module, _, variant = spec.partition(":")
  mod = importlib.import_module(
      f"xmcgan_image_generation_tpu.configs.{module}")
  return mod.get_config(variant) if variant else mod.get_config()


def make_init_batch(config: ml_collections.ConfigDict,
                    batch: int = 2) -> Dict[str, Array]:
  """A template batch for model init — shapes only, no data needed."""
  s = config.image_size
  return {
      "image": jnp.zeros((batch, s, s, 3), jnp.float32),
      "sentence_embedding": jnp.zeros((batch, BERT_DIM), jnp.float32),
      "embedding": jnp.zeros((batch, COCO_MAX_TEXT_LENGTH, BERT_DIM),
                             jnp.float32),
      "max_len": jnp.full((batch, 1), float(COCO_MAX_TEXT_LENGTH),
                          jnp.float32),
      "z": jnp.zeros((batch, config.z_dim), jnp.float32),
  }


def quantize_params_int8(params):
  """Weight-only per-channel symmetric int8 quantization of a param tree.

  Every floating tensor with ndim >= 2 (dense/conv kernels, CBN projection
  kernels) is stored as ``int8`` values plus one float32 scale per
  trailing-axis channel (the output-channel axis in both Flax Dense
  ``[in, out]`` and Conv ``[h, w, ci, co]`` layouts).  Vectors/scalars
  (biases, BN scale/bias) pass through unquantized — they are a rounding
  error of the total size.  Returns ``(leaves, treedef)`` where each leaf
  is ``(int8_values, f32_scales)`` or ``(original, None)``.
  """
  flat, treedef = jax.tree_util.tree_flatten(params)
  leaves = []
  for x in flat:
    if (hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        and x.ndim >= 2):
      xf = jnp.asarray(x, jnp.float32)
      amax = jnp.max(jnp.abs(xf), axis=tuple(range(x.ndim - 1)),
                     keepdims=True)
      scale = jnp.maximum(amax, 1e-12) / 127.0
      q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
      leaves.append((q, scale))
    else:
      leaves.append((x, None))
  return leaves, treedef


def _dequantize_params(quantized, dtype):
  leaves, treedef = quantized
  out = []
  for q, scale in leaves:
    if scale is None:
      out.append(q)
    else:
      out.append((q.astype(jnp.float32) * scale).astype(dtype))
  return jax.tree_util.tree_unflatten(treedef, out)


def generator_serving_fn(
    generator: functools.partial,
    variables: Dict[str, Any],
    config: ml_collections.ConfigDict,
    *,
    quantize: Optional[str] = None,
):
  """Returns the pure inference function with weights closed over.

  ``variables`` is ``{"params": ..., "batch_stats": ...}`` (plus any other
  inference collections); pass ``ema_params`` as ``params`` for the EMA
  artifact.  ``jax.jit`` treats the closed-over pytree as constants, so the
  exported module embeds the weights.

  For bfloat16 configs the ``params`` collection is pre-cast to bf16:
  every generator layer casts its params to the compute dtype at use
  anyway (``.astype(self.dtype)``), so this halves the embedded-constant
  (artifact) size at identical numerics.  (With ``g_spectral_norm=True``
  — off in every shipped config — the f32 power iteration would see the
  bf16-rounded kernel: bf16-ULP drift.)  Stats collections (BatchNorm
  running averages, spectral-norm ``u0``) keep their float32 storage —
  their compute paths are f32.

  ``quantize="int8"`` (opt-in, lossy) embeds weight-only per-channel int8
  kernels instead — ~4x smaller artifacts than f32, ~2x than bf16;
  dequantization to the compute dtype happens in-graph at call time.
  """
  dtype = jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32
  variables = dict(variables)
  quantized = None
  if quantize == "int8":
    quantized = quantize_params_int8(variables.pop("params"))
  elif quantize is not None:
    raise ValueError(f"unknown quantize mode {quantize!r}")
  elif dtype == jnp.bfloat16:
    variables["params"] = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        variables["params"])

  def serve(sentence_embedding: Array, embedding: Array, max_len: Array,
            z: Array) -> Array:
    if quantized is not None:
      run_vars = dict(variables,
                      params=_dequantize_params(quantized, dtype))
    else:
      run_vars = variables
    cond = {
        "sentence_embedding": sentence_embedding.astype(dtype),
        "embedding": embedding.astype(dtype),
        "max_len": max_len.astype(dtype),
    }
    images = generator(train=False).apply(
        run_vars, (cond, z.astype(dtype)), mutable=False)
    return images.astype(jnp.float32)

  return serve


def export_generator(
    generator: functools.partial,
    variables: Dict[str, Any],
    config: ml_collections.ConfigDict,
    *,
    batch_size: Optional[int] = None,
    text_len: int = COCO_MAX_TEXT_LENGTH,
    platforms: Optional[Tuple[str, ...]] = None,
    mesh: Optional[jax.sharding.Mesh] = None,
    mesh_axis: str = "data",
    quantize: Optional[str] = None,
) -> jax_export.Exported:
  """AOT-exports the generator; ``batch_size=None`` -> symbolic batch dim.

  ``platforms`` pins the lowering targets (e.g. ``("tpu", "cpu")``); the
  default exports for the current backend only.

  ``mesh`` exports a MULTI-DEVICE artifact: inputs/outputs are sharded
  ``P(mesh_axis)`` on the batch dimension, so one ``call`` batch-parallels
  inference across the consumer's devices (weights replicated — the
  serving analogue of the training data axis).  The consumer rebuilds the
  placement with ``Exported.in_shardings_jax(consumer_mesh)`` on any mesh
  with the same device count.  Requires a static ``batch_size`` divisible
  by the axis size.
  """
  serve = generator_serving_fn(generator, variables, config,
                               quantize=quantize)
  if batch_size is None:
    if mesh is not None:
      raise ValueError("sharded export requires a static batch_size")
    (b,) = jax_export.symbolic_shape("b")
  else:
    b = batch_size
  f32 = jnp.float32
  args = (
      jax.ShapeDtypeStruct((b, BERT_DIM), f32),
      jax.ShapeDtypeStruct((b, text_len, BERT_DIM), f32),
      jax.ShapeDtypeStruct((b, 1), f32),
      jax.ShapeDtypeStruct((b, config.z_dim), f32),
  )
  if mesh is not None:
    axis = mesh.shape[mesh_axis]
    if batch_size % axis:
      raise ValueError(
          f"batch_size {batch_size} not divisible by mesh axis "
          f"{mesh_axis!r} ({axis} devices)")
    sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(mesh_axis))
    jitted = jax.jit(serve, in_shardings=(sharding,) * 4,
                     out_shardings=sharding)
  else:
    jitted = jax.jit(serve)
  kwargs = {}
  if platforms is not None:
    kwargs["platforms"] = list(platforms)
  return jax_export.export(jitted, **kwargs)(*args)


def artifact_metadata(config: ml_collections.ConfigDict, *, weights: str,
                      step: Optional[int], batch_size: Optional[int],
                      text_len: int = COCO_MAX_TEXT_LENGTH,
                      platforms: Optional[Tuple[str, ...]] = None,
                      quantize: Optional[str] = None) -> str:
  """JSON sidecar describing the artifact's interface for consumers."""
  b: Any = batch_size if batch_size is not None else "b"
  return json.dumps(
      {
          "weights": weights,
          "step": step,
          "platforms": list(platforms) if platforms else "default",
          "quantization": quantize or "none",
          "image_size": config.image_size,
          "inputs": {
              "sentence_embedding": [b, BERT_DIM],
              "embedding": [b, text_len, BERT_DIM],
              "max_len": [b, 1],
              "z": [b, config.z_dim],
          },
          "input_dtype": "float32",
          "output": {
              "image": [b, config.image_size, config.image_size, 3],
              "dtype": "float32",
              "range": [0.0, 1.0],
          },
      },
      indent=2, sort_keys=True)


def load_exported(data: bytes) -> jax_export.Exported:
  """Deserializes a serving artifact; call it via ``.call(*inputs)``."""
  return jax_export.deserialize(bytearray(data))


def export_from_workdir(
    config: ml_collections.ConfigDict,
    workdir: str,
    *,
    step: Optional[int] = None,
    batch_size: Optional[int] = None,
    weights: str = "ema",
    platforms: Optional[Tuple[str, ...]] = ("tpu", "cpu"),
    out_dir: Optional[str] = None,
    quantize: Optional[str] = None,
) -> list:
  """Restores a checkpoint and writes serving artifacts; returns paths.

  The shared implementation behind ``--mode=export`` and
  ``tools/export_serving.py``.  ``weights`` is ``"ema"``, ``"normal"`` or
  ``"both"``; ``batch_size=None`` exports a symbolic batch dimension.
  Artifacts are platform-polymorphic (TPU + CPU) by default, so an export
  produced on a CPU host deploys to TPU serving unchanged.
  """
  from xmcgan_image_generation_tpu.engine import create_train_state
  from xmcgan_image_generation_tpu.parallel import MeshRules
  from xmcgan_image_generation_tpu.utils.checkpoint import (
      CheckpointManager, checkpoints_dir)

  if weights not in ("ema", "normal", "both"):
    raise ValueError(f"weights must be ema|normal|both, got {weights!r}")
  rules = MeshRules.create(config.get("mesh_data", -1),
                           config.get("mesh_model", 1))
  generator, _, template = create_train_state(
      config, jax.random.PRNGKey(config.seed), make_init_batch(config))

  ckpt = CheckpointManager(checkpoints_dir(workdir), with_data_iter=False)
  step = step if step is not None else ckpt.latest_step()
  if step is None:
    raise FileNotFoundError(f"No checkpoints in {checkpoints_dir(workdir)}")
  state = ckpt.restore(step, template, sharding=rules.replicated)
  ckpt.close()

  from xmcgan_image_generation_tpu.utils import fileio

  out_dir = out_dir or fileio.join(workdir, "serving")
  fileio.makedirs(out_dir, exist_ok=True)
  names = {"ema": ["ema"], "normal": ["normal"],
           "both": ["ema", "normal"]}[weights]
  written = []
  for name in names:
    params = state.ema_params if name == "ema" else state.g_params
    variables = {"params": params, **state.generator_state}
    exported = export_generator(
        generator, variables, config, batch_size=batch_size,
        platforms=platforms, quantize=quantize)
    suffix = f"_{quantize}" if quantize else ""
    base = fileio.join(out_dir,
                       f"generator_{name}{suffix}_step{step:08d}")
    with fileio.open(base + ".stablehlo", "wb") as f:
      f.write(bytes(exported.serialize()))
    with fileio.open(base + ".json", "w") as f:
      f.write(artifact_metadata(config, weights=name, step=step,
                                batch_size=batch_size, platforms=platforms,
                                quantize=quantize))
    written.append(base + ".stablehlo")
  return written
