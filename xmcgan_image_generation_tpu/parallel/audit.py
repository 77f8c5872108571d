"""Flagship-shape AOT partitioning audit, shared by the pytest suite
(tests/test_multichip_aot.py) and the driver dry run
(__graft_entry__.dryrun_multichip).

The audit lowers and COMPILES the full train step at real flagship shapes
(128px bf16 gf/df 96 by default) over an n-device mesh, then asserts on
the partitioned HLO:

* the gradient all-reduce over the ``data`` axis exists,
* the contrastive word/sentence-loss all-gathers exist,
* no intermediate was silently replicated to a full-batch blow-up — the
  per-replica ``[B, B, R, L]`` pipeline the reference materializes under
  pmap (reference libml/attention_lib.py:130-191).

Running this every round in the driver-visible dry run means the recorded
MULTICHIP census always reflects the shapes a real training job runs, not
just the tiny executed config.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

from xmcgan_image_generation_tpu.parallel.introspect import (
    collective_counts,
    max_tensor_bytes,
    tensor_shapes,
)


def word_loss_blowup(hlo_text: str, config) -> List[Tuple[str, Tuple[int, ...], int]]:
  """Returns the [B_global, B_global, ...] word-loss intermediates that a
  de-sharded contrastive path would materialize per device.

  Every tensor of that pipeline (sim/alpha [B,B,R,17], context
  [B,B,17,768], num/den [B,B,17]) has the region count or the word
  length as its third dim, so a tensor is only flagged when dim 2 is one
  of those.  This keeps out (a) conv activations whose H=W happen to
  equal B_global ([B_dev, 64, 64, C] transposed at 128px batch 64) and
  (b) small [B,B,k,768] fusion scratch with k < 17.
  """
  b_global = config.batch_size
  regions = config.cond_size ** 2  # the x_cond snapshot resolution
  return [
      (dtype, dims, nbytes)
      for dtype, dims, nbytes in tensor_shapes(hlo_text)
      if len(dims) >= 3 and dims[0] == b_global and dims[1] == b_global
      and dims[2] in (regions, 17)
  ]


def flagship_config(which: str = "128", n_devices: int = 8):
  """The flagship config shaped for an ``n_devices`` AOT audit.

  ``use_pallas`` is forced off: the Pallas kernels don't lower on the CPU
  AOT backend, and the XLA formulation is the GSPMD path whose sharding
  the audit checks (the sharded Pallas dispatch is covered functionally
  in tests/test_engine.py).  The frozen pretrained tower is dropped — its
  random init is irrelevant to partitioning and would embed ~100 MB of
  constants into the lowering.
  """
  from xmcgan_image_generation_tpu.configs import coco_xmc, coco_xmc_256

  if which == "128":
    config = coco_xmc.get_config()
    config.batch_size = 8 * n_devices  # 8 per chip, the flagship density.
  elif which == "256":
    config = coco_xmc_256.get_config()
    config.batch_size = 2 * n_devices  # the measured single-chip batch 16.
  else:
    raise ValueError(f"unknown flagship variant {which!r}")
  config.use_pallas = False
  config.pretrained_image_contrastive = False
  return config


def lowered_step(config, n_devices: int = 8):
  """Lowers the jitted train step for ``config`` over an n-device mesh."""
  import jax
  import jax.numpy as jnp

  from xmcgan_image_generation_tpu.data.pipeline import template_batch
  from xmcgan_image_generation_tpu.engine.state import abstract_train_state
  from xmcgan_image_generation_tpu.engine.step import train_step
  from xmcgan_image_generation_tpu.models import get_architecture
  from xmcgan_image_generation_tpu.parallel import MeshRules

  rules = MeshRules.create(data=n_devices, model=1,
                           devices=jax.devices()[:n_devices])
  super_n = config.batch_size * config.d_step_per_g_step
  host_batch = template_batch(config, super_n)
  batch = {
      k: jax.ShapeDtypeStruct(v.shape, v.dtype, sharding=rules.batch)
      for k, v in host_batch.items()
  }
  init_batch = {
      k: jax.ShapeDtypeStruct((config.batch_size,) + v.shape[1:], v.dtype)
      for k, v in host_batch.items()
  }
  _, _, state = abstract_train_state(config, init_batch)
  state = jax.tree_util.tree_map(
      lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype,
                                     sharding=rules.replicated),
      state)
  dtype = jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32
  generator, discriminator = get_architecture(config, dtype)
  step_fn = jax.jit(
      functools.partial(train_step, generator=generator,
                        discriminator=discriminator, config=config,
                        additional_data={}),
      donate_argnums=(1,))
  rng = jax.ShapeDtypeStruct((2,), jnp.uint32)
  return step_fn.lower(rng, state, batch)


def audit_flagship(which: str = "128", n_devices: int = 8,
                   strict: bool = True) -> Dict:
  """Compile-only partitioning audit at flagship shapes.

  Returns a JSON-able summary: the collective census, the largest
  single tensor, and the word-loss blow-up list (must be empty).  With
  ``strict`` the three invariants are asserted.
  """
  config = flagship_config(which, n_devices)
  text = lowered_step(config, n_devices).compile().as_text()
  counts = collective_counts(text)
  nbytes, desc = max_tensor_bytes(text)
  blowups = [
      f"{dtype}[{','.join(map(str, dims))}] ({n / 1e6:.0f} MB)"
      for dtype, dims, n in word_loss_blowup(text, config)
  ]
  summary = {
      "variant": which,
      "n_devices": n_devices,
      "batch_size": int(config.batch_size),
      "image_size": int(config.image_size),
      "dtype": str(config.dtype),
      "scale_fused_convs": bool(config.get("scale_fused_convs", False)),
      "collectives": counts,
      "max_tensor": {"bytes": int(nbytes), "shape": desc},
      "word_loss_blowups": blowups,
  }
  if strict:
    assert counts.get("all-reduce", 0) >= 1, summary
    assert counts.get("all-gather", 0) >= 1, summary
    assert not blowups, summary
    assert nbytes < 1024 * 1024 * 1024, summary
  return summary
