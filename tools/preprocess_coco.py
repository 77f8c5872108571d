"""Offline COCO preprocessing: images + captions -> training TFRecords.

The TPU-native replacement for the reference's `preprocess_data.py`
(reference preprocess_data.py:76-122): BERT caption embedding runs as a
batched jitted job on the accelerator instead of a per-example Keras crawl,
and records are written with the in-repo TF-free codec in the exact
reference schema (png image, ``caption/embedding [5, 17, 768]``,
``caption/max_len``, ``caption/text``, ``image/filename``).

Input: a COCO-2014 captions annotation file + image directory
(the standard ``captions_train2014.json`` layout).

  python tools/preprocess_coco.py \\
      --annotations=annotations/captions_train2014.json \\
      --images_dir=train2014/ \\
      --output_dir=data/ --split=train \\
      --bert_path=/path/to/hf-bert-base-uncased \\
      --vocab=/path/to/vocab.txt
"""

import argparse
import collections
import io
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xmcgan_image_generation_tpu.data import records
from xmcgan_image_generation_tpu.data.bert_embed import (
    BERT_DIM,
    CaptionEmbedder,
    build_bert,
)
from xmcgan_image_generation_tpu.data.tokenizer import BertTokenizer

SENTENCE_NUM = 5
MAX_TEXT_LENGTH = 17


def load_annotations(path):
  """Returns [(filename, [captions...])] from a COCO captions json."""
  with open(path) as f:
    data = json.load(f)
  files = {img["id"]: img["file_name"] for img in data["images"]}
  captions = collections.defaultdict(list)
  for ann in data["annotations"]:
    captions[ann["image_id"]].append(ann["caption"])
  return [(files[i], caps) for i, caps in sorted(captions.items())
          if i in files]


def encode_image_png(path, store_size=0):
  """Reads an image and re-encodes it PNG, optionally pre-resized.

  ``store_size`` hoists the training-time resize offline: the online
  pipeline bilinearly resizes every image to ``config.image_size``
  square BEFORE any random augmentation (data/preprocessing.py), so
  storing ``resize(img, (S, S))`` with the identical PIL bilinear kernel
  yields bit-identical training examples while shrinking the stored PNGs
  ~10x and cutting host decode from ~10 ms to ~0.7 ms per example —
  the difference between an input-bound and a compute-bound TPU step
  (tools/pipeline_bench.py).  0 keeps the reference's full-resolution
  layout (reference preprocess_data.py:80).  Store at the largest
  resolution you plan to train (e.g. 256); smaller runs resize down
  online at ~2.7 ms/example.
  """
  from PIL import Image
  img = Image.open(path)
  if img.mode != "RGB":
    img = img.convert("RGB")
  if store_size and img.size != (store_size, store_size):
    img = img.resize((store_size, store_size), Image.BILINEAR)
  buf = io.BytesIO()
  img.save(buf, format="PNG")
  return buf.getvalue()


def write_split(examples, embedder, images_dir, output_dir, split,
                coco_version="2014", num_shards=100, log_every=500,
                store_size=0):
  os.makedirs(output_dir, exist_ok=True)
  split_name = "validation" if split == "val" else split
  writers = [
      records.TFRecordWriter(os.path.join(
          output_dir,
          f"coco{coco_version}_{split_name}.tfrecord-{i:05d}-of-"
          f"{num_shards:05d}"))
      for i in range(num_shards)
  ]
  # Embed captions for a block of images per device batch: 5 captions per
  # image, so a block of batch//5 images fills the jitted BERT batch (the
  # reference embedded 5 captions at a time — preprocess_data.py:80-81).
  block = max(1, embedder.batch_size // SENTENCE_NUM)
  n = 0
  for start in range(0, len(examples), block):
    chunk = examples[start:start + block]
    padded = [(f, (c + c[:SENTENCE_NUM])[:SENTENCE_NUM]) for f, c in chunk]
    flat_caps = [c for _, caps in padded for c in caps]
    embedding, max_len = embedder(flat_caps)
    embedding = embedding.reshape(len(padded), SENTENCE_NUM,
                                  MAX_TEXT_LENGTH, BERT_DIM)
    max_len = max_len.reshape(len(padded), SENTENCE_NUM)
    for i, (filename, caps) in enumerate(padded):
      image_png = encode_image_png(
          os.path.join(images_dir, filename), store_size=store_size)
      example = records.build_example({
          "image": image_png,
          "image/filename": [filename.encode()],
          "caption/embedding": embedding[i].astype(np.float32).ravel(),
          "caption/max_len": np.asarray(max_len[i], np.int64),
          "caption/text": [c.encode() for c in caps],
      })
      writers[n % num_shards].write(example)
      if log_every and n % log_every == 0:
        print(f"{split}: {n}/{len(examples)}", flush=True)
      n += 1
  for w in writers:
    w.close()


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument("--annotations", required=True)
  parser.add_argument("--images_dir", required=True)
  parser.add_argument("--output_dir", required=True)
  parser.add_argument("--split", choices=("train", "val"), required=True)
  parser.add_argument("--bert_path", default="",
                      help="Local HF bert-base-uncased dir (random init "
                           "if empty)")
  parser.add_argument("--vocab", required=True,
                      help="BERT vocab.txt path")
  parser.add_argument("--num_shards", type=int, default=100)
  parser.add_argument("--batch_size", type=int, default=256)
  parser.add_argument("--limit", type=int, default=0)
  parser.add_argument("--store_size", type=int, default=0,
                      help="Pre-resize stored images to this square size "
                           "(0 = full resolution, reference parity). See "
                           "encode_image_png.")
  args = parser.parse_args()

  tokenizer = BertTokenizer(args.vocab)
  embed_fn = build_bert(args.bert_path or None)
  embedder = CaptionEmbedder(
      tokenizer, embed_fn, MAX_TEXT_LENGTH, args.batch_size)
  examples = load_annotations(args.annotations)
  if args.limit:
    examples = examples[:args.limit]
  print(f"{len(examples)} images in {args.split}")
  write_split(examples, embedder, args.images_dir, args.output_dir,
              args.split, num_shards=args.num_shards,
              store_size=args.store_size)


if __name__ == "__main__":
  main()
