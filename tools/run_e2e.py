"""Real-data readiness runbook: raw COCO -> TFRecords -> train -> eval.

One documented path from (BERT weights, COCO-2014 images+annotations,
InceptionV3 weights, pretrained ResNet .npy) to a scored training run, so
the first environment that has the real data can chase the FID target
(BASELINE.md) with zero plumbing work:

  python tools/run_e2e.py \\
      --images_train=train2014/ --annotations_train=captions_train2014.json \\
      --images_val=val2014/    --annotations_val=captions_val2014.json \\
      --bert_path=/weights/bert-base-uncased --vocab=/weights/vocab.txt \\
      --inception_ckpt=/weights/inception_v3.npz \\
      --resnet_npy=/weights/resnet_pretrained.npy \\
      --data_dir=data/ --workdir=/tmp/exp

Phases (``--phase=preprocess,train,eval`` selects a subset; production
runs train and eval as two concurrent jobs, the reference's
train.sh/test.sh split):

  1. preprocess: BERT-embed captions, write reference-schema TFRecords.
  2. train:      the GSPMD training loop on the records.
  3. eval:       the checkpoint-polling FID/IS service -> scores.csv.

``--smoke`` fabricates a tiny COCO-shaped dataset (random images, toy
vocab, random-init BERT/towers) and runs every phase end-to-end — the
plumbing test this script exists for (driven by
tests/test_e2e_runbook.py).
"""

import argparse
import json
import logging
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fabricate_smoke_dataset(root):
  """Writes a tiny COCO-layout dataset: images + annotation jsons + vocab."""
  from PIL import Image

  rng = np.random.default_rng(0)
  vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a", "red", "blue", "cat",
           "dog", "on", "the", "mat", "grass", "sits", "runs", "."]
  vocab_path = os.path.join(root, "vocab.txt")
  with open(vocab_path, "w") as f:
    f.write("\n".join(vocab) + "\n")

  words = vocab[4:]
  splits = {}
  for split, n_images in (("train", 8), ("val", 6)):
    images_dir = os.path.join(root, f"{split}_images")
    os.makedirs(images_dir, exist_ok=True)
    images, annotations = [], []
    for i in range(n_images):
      name = f"{split}_{i:04d}.png"
      arr = rng.integers(0, 256, (48, 64, 3), np.uint8)
      Image.fromarray(arr).save(os.path.join(images_dir, name))
      images.append({"id": i, "file_name": name})
      for j in range(5):
        caption = " ".join(rng.choice(words, size=int(rng.integers(3, 8))))
        annotations.append({"image_id": i, "caption": caption,
                            "id": i * 5 + j})
    ann_path = os.path.join(root, f"captions_{split}.json")
    with open(ann_path, "w") as f:
      json.dump({"images": images, "annotations": annotations}, f)
    splits[split] = (images_dir, ann_path)
  return splits, vocab_path


def build_config(args):
  from xmcgan_image_generation_tpu.configs import coco_xmc

  if args.smoke:
    config = coco_xmc.get_test_config()
    config.num_train_steps = 2
    # Divisible over any small device mesh (1 chip or 8 virtual devices).
    config.batch_size = 8
    config.eval_batch_size = 8
    config.eval_num = 8
    config.checkpoint_every_steps = 2
    config.grain_worker_count = 0
  else:
    config = coco_xmc.get_config()
  config.data_source = "tfrecord"
  config.data_dir = args.data_dir
  config.resnet_ckpt_path = args.resnet_npy
  config.inception_ckpt_path = args.inception_ckpt
  return config


def run_preprocess(args):
  from tools.preprocess_coco import load_annotations, write_split
  from xmcgan_image_generation_tpu.data.bert_embed import (
      CaptionEmbedder,
      build_bert,
  )
  from xmcgan_image_generation_tpu.data.tokenizer import BertTokenizer

  tokenizer = BertTokenizer(args.vocab)
  embed_fn = build_bert(args.bert_path or None)
  embedder = CaptionEmbedder(tokenizer, embed_fn,
                             batch_size=args.bert_batch_size)
  for split, images_dir, annotations in (
      ("train", args.images_train, args.annotations_train),
      ("val", args.images_val, args.annotations_val)):
    examples = load_annotations(annotations)
    if args.limit:
      examples = examples[:args.limit]
    print(f"preprocess {split}: {len(examples)} images")
    write_split(examples, embedder, images_dir, args.data_dir, split,
                num_shards=args.num_shards)


def run_train(args, config):
  from xmcgan_image_generation_tpu import train as train_lib

  train_lib.train(config, args.workdir)


def run_eval(args, config):
  from xmcgan_image_generation_tpu import evaluate as eval_lib

  eval_lib.evaluate_continuously(config, args.workdir,
                                 timeout=args.eval_timeout)
  scores = os.path.join(args.workdir, "checkpoints", "scores.csv")
  if os.path.exists(scores):
    with open(scores) as f:
      print(f.read())


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument("--smoke", action="store_true",
                      help="fabricate a tiny dataset and run all phases")
  parser.add_argument("--phase", default="preprocess,train,eval")
  parser.add_argument("--images_train", default="")
  parser.add_argument("--annotations_train", default="")
  parser.add_argument("--images_val", default="")
  parser.add_argument("--annotations_val", default="")
  parser.add_argument("--bert_path", default="")
  parser.add_argument("--vocab", default="")
  parser.add_argument("--inception_ckpt", default="")
  parser.add_argument("--resnet_npy", default="")
  parser.add_argument("--data_dir", default="data/")
  parser.add_argument("--workdir", required=True)
  parser.add_argument("--num_shards", type=int, default=100)
  parser.add_argument("--bert_batch_size", type=int, default=256)
  parser.add_argument("--limit", type=int, default=0)
  parser.add_argument("--eval_timeout", type=int, default=24 * 3600)
  args = parser.parse_args()
  logging.basicConfig(level=logging.INFO)

  if args.smoke:
    # The smoke path is a plumbing test: pin it to host CPU so it runs
    # identically everywhere (and off the tunneled TPU, whose remote
    # compile path rejects the random-BERT payload).
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    os.makedirs(args.workdir, exist_ok=True)
    args.data_dir = os.path.join(args.workdir, "records")
    splits, vocab_path = fabricate_smoke_dataset(args.workdir)
    args.images_train, args.annotations_train = splits["train"]
    args.images_val, args.annotations_val = splits["val"]
    args.vocab = vocab_path
    args.num_shards = 2
    args.bert_batch_size = 16
    args.eval_timeout = 600

  phases = args.phase.split(",")
  config = build_config(args)
  if "preprocess" in phases:
    run_preprocess(args)
  if "train" in phases:
    run_train(args, config)
  if "eval" in phases:
    run_eval(args, config)
  print("e2e runbook done")


if __name__ == "__main__":
  main()
