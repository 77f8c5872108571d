"""End-to-end input-pipeline throughput bench (real chip).

Every headline bench number so far fed one pre-placed synthetic batch;
this tool times the FULL production loop instead — the exact data path
`train.py` runs:

  PNG-encoded TFRecord shards -> grain loader (configured worker count,
  per-record RNG decode/augment) -> DevicePrefetchIterator -> jitted
  GSPMD train step with donated state

and reports end-to-end images/sec next to the compute-only number, plus
the input-stall metric: wall time blocked in ``next(train_iter)``.  This
is the role tf.data prefetch plays in the reference (reference
libml/input_pipeline.py:71-103; base_dataset.py:21-23 notes a TPU
input-bound fix), which no previous number here exercised.

The dataset is fabricated once and cached: ``--num_examples`` (default
2048) examples in the reference TFRecord schema (reference
libml/coco_dataset.py:85-97) with ``--source_size`` (default 480x640)
PNG images — smooth low-frequency content so PNG decode cost is
realistic rather than noise-degenerate — and real [5, 17, 768] float32
caption embeddings.

Usage (serially, nothing else running — 1-core host):
  python tools/pipeline_bench.py [--steps 50] [--batch_size 56]
                                 [--num_examples 2048] [--workers -1]
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CACHE_ROOT = "/tmp/xmcgan_pipebench"


def fabricate_dataset(root, num_examples, height, width, shards=8,
                      sentence_num=5, text_len=17, bert_dim=768,
                      store_size=0):
  """Writes PNG-encoded reference-schema TFRecord shards (cached)."""
  import io

  from PIL import Image

  from xmcgan_image_generation_tpu.data import records

  done = os.path.join(root, "DONE")
  if os.path.exists(done):
    return
  os.makedirs(root, exist_ok=True)
  rng = np.random.default_rng(0)
  t0 = time.perf_counter()
  # A small validation split so create_datasets' eval loader builds too.
  _write_split(root, "validation", 64, 1, height, width, rng,
               sentence_num, text_len, bert_dim, t0, store_size)
  _write_split(root, "train", num_examples, shards, height, width, rng,
               sentence_num, text_len, bert_dim, t0, store_size)
  with open(done, "w") as f:
    f.write("ok")
  sizes = sum(
      os.path.getsize(os.path.join(root, p)) for p in os.listdir(root))
  print(f"dataset ready: {num_examples} examples, "
        f"{sizes / 1e9:.2f} GB in {time.perf_counter() - t0:.0f}s",
        flush=True)


def _write_split(root, split, num_examples, shards, height, width, rng,
                 sentence_num, text_len, bert_dim, t0, store_size=0):
  import io

  from PIL import Image

  from xmcgan_image_generation_tpu.data import records

  writers = [
      records.TFRecordWriter(os.path.join(
          root,
          f"pipebench-2014-{split}.tfrecord-{i:05d}-of-{shards:05d}"))
      for i in range(shards)
  ]
  for n in range(num_examples):
    # Smooth content: small noise field upscaled bilinearly, like natural
    # image statistics for the PNG codec (raw noise is incompressible and
    # decodes unrealistically fast per byte).
    small = rng.integers(0, 256, (height // 16, width // 16, 3), np.uint8)
    img = Image.fromarray(small).resize((width, height), Image.BILINEAR)
    if store_size:
      # Pre-resized storage (tools/preprocess_coco.py --store_size): the
      # deterministic training-time resize hoisted offline.
      img = img.resize((store_size, store_size), Image.BILINEAR)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    example = records.build_example({
        "image": buf.getvalue(),
        "image/filename": [f"pipebench_{n:06d}.png".encode()],
        "caption/embedding": rng.standard_normal(
            (sentence_num * text_len * bert_dim,)).astype(np.float32),
        "caption/max_len": rng.integers(
            3, text_len + 1, (sentence_num,)).astype(np.int64),
        "caption/text": [b"pipebench caption"] * sentence_num,
    })
    writers[n % shards].write(example)
    if n and n % 512 == 0:
      print(f"fabricating {split}: {n}/{num_examples} "
            f"({time.perf_counter() - t0:.0f}s)", flush=True)
  for w in writers:
    w.close()


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument("--steps", type=int, default=50)
  parser.add_argument("--batch_size", type=int, default=56)
  parser.add_argument("--image_size", type=int, default=128)
  parser.add_argument("--num_examples", type=int, default=2048)
  parser.add_argument("--source_size", default="480x640")
  parser.add_argument("--workers", type=int, default=-1,
                      help="grain worker count; -1 = config default")
  parser.add_argument("--prefetch", type=int, default=-1,
                      help="device-prefetch batches; -1 = config default")
  parser.add_argument("--store_size", type=int, default=0,
                      help="Fabricate pre-resized storage (see "
                           "preprocess_coco.py --store_size); 0 = "
                           "full-resolution source PNGs")
  parser.add_argument("--json_out", default="")
  args = parser.parse_args()

  import jax
  import jax.numpy as jnp

  jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

  from xmcgan_image_generation_tpu.configs.coco_xmc import get_config
  from xmcgan_image_generation_tpu.data import create_datasets
  from xmcgan_image_generation_tpu.data.pipeline import (
      DevicePrefetchIterator,
  )
  from xmcgan_image_generation_tpu.engine import create_train_state, xmc_gan
  from xmcgan_image_generation_tpu.engine.step import split_batch, train_step
  from xmcgan_image_generation_tpu.parallel import MeshRules

  height, width = (int(x) for x in args.source_size.split("x"))
  root = os.path.join(
      CACHE_ROOT,
      f"n{args.num_examples}-{height}x{width}"
      + (f"-s{args.store_size}" if args.store_size else ""))
  fabricate_dataset(root, args.num_examples, height, width,
                    store_size=args.store_size)

  config = get_config()
  config.image_size = args.image_size
  config.batch_size = args.batch_size
  config.data_source = "tfrecord"
  config.data_dir = root
  if args.workers >= 0:
    config.grain_worker_count = args.workers
  if args.prefetch >= 0:
    config.prefetch_batches = args.prefetch

  print(f"devices: {jax.devices()}", flush=True)
  rules = MeshRules.create()
  train_loader, _, num_train = create_datasets(config, seed=config.seed)
  print(f"loader: {num_train} examples, "
        f"workers={config.grain_worker_count}, "
        f"prefetch={config.prefetch_batches}", flush=True)
  train_iter = DevicePrefetchIterator(
      iter(train_loader), rules.mesh, size=config.prefetch_batches)

  init_batch = split_batch(next(train_iter), config.d_step_per_g_step)[0]
  generator, discriminator, state = create_train_state(
      config, jax.random.PRNGKey(0), init_batch)
  state = jax.device_put(state, rules.replicated)
  additional_data = xmc_gan.create_additional_data(config)
  step_fn = jax.jit(
      functools.partial(
          train_step, generator=generator, discriminator=discriminator,
          config=config, additional_data=additional_data),
      donate_argnums=(1,))

  super_images = args.batch_size * config.d_step_per_g_step

  # Warmup: compile + a few steps to fill the prefetch pipeline.
  metrics = None
  for i in range(3):
    batch = next(train_iter)
    state, metrics = step_fn(
        jax.random.fold_in(jax.random.PRNGKey(1), i), state, batch)
  jax.block_until_ready(metrics["d_loss"])

  # End-to-end: the exact train.py loop shape, stall time measured around
  # next(train_iter).
  stall = 0.0
  t0 = time.perf_counter()
  for i in range(args.steps):
    ts = time.perf_counter()
    batch = next(train_iter)
    stall += time.perf_counter() - ts
    state, metrics = step_fn(
        jax.random.fold_in(jax.random.PRNGKey(2), i), state, batch)
  jax.block_until_ready(metrics["d_loss"])
  e2e = (time.perf_counter() - t0) / args.steps
  stall_ms = stall / args.steps * 1e3

  # Compute-only on the same process: re-feed the last batch.
  state, metrics = step_fn(jax.random.PRNGKey(3), state, batch)
  jax.block_until_ready(metrics["d_loss"])
  t0 = time.perf_counter()
  for i in range(args.steps):
    state, metrics = step_fn(
        jax.random.fold_in(jax.random.PRNGKey(4), i), state, batch)
  jax.block_until_ready(metrics["d_loss"])
  compute = (time.perf_counter() - t0) / args.steps

  out = dict(
      steps=args.steps,
      store_size=args.store_size,
      batch_size=args.batch_size,
      workers=config.grain_worker_count,
      prefetch=config.prefetch_batches,
      e2e_ms_per_step=round(e2e * 1e3, 1),
      e2e_images_per_sec=round(super_images / e2e, 1),
      compute_ms_per_step=round(compute * 1e3, 1),
      compute_images_per_sec=round(super_images / compute, 1),
      input_stall_ms_per_step=round(stall_ms, 2),
      stall_fraction=round(stall_ms / (e2e * 1e3), 4),
  )
  print(json.dumps(out), flush=True)
  if args.json_out:
    with open(args.json_out, "w") as f:
      json.dump(out, f, indent=1)


if __name__ == "__main__":
  main()
