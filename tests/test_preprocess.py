"""Preprocessing subsystem tests: tokenizer, caption embedder, and the
records round trip from the offline tool into the training pipeline."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from xmcgan_image_generation_tpu.data import tokenizer as tok_lib
from xmcgan_image_generation_tpu.data.bert_embed import CaptionEmbedder

VOCAB = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "a", "cat", "sits", "on", "the",
    "mat", "un", "##aff", "##able", "runn", "##ing", ".",
]


@pytest.fixture
def vocab_path(tmp_path):
  path = tmp_path / "vocab.txt"
  path.write_text("\n".join(VOCAB) + "\n")
  return str(path)


class TestTokenizer:

  def test_basic_tokenize(self):
    assert tok_lib.basic_tokenize("A cat, sits!") == [
        "a", "cat", ",", "sits", "!"]

  def test_accent_stripping(self):
    assert tok_lib.basic_tokenize("café") == ["cafe"]

  def test_wordpiece_greedy_longest_match(self, vocab_path):
    vocab = tok_lib.load_vocab(vocab_path)
    assert tok_lib.wordpiece("unaffable", vocab) == ["un", "##aff",
                                                     "##able"]
    assert tok_lib.wordpiece("running", vocab) == ["runn", "##ing"]
    assert tok_lib.wordpiece("zebra", vocab) == ["[UNK]"]

  def test_encode_framing_and_padding(self, vocab_path):
    tok = tok_lib.BertTokenizer(vocab_path)
    ids, true_len = tok.encode("a cat sits on the mat .", max_len=12)
    assert len(ids) == 12
    assert true_len == 9  # CLS + 7 tokens + SEP
    assert ids[0] == VOCAB.index("[CLS]")
    assert ids[true_len - 1] == VOCAB.index("[SEP]")
    assert all(i == 0 for i in ids[true_len:])

  def test_encode_truncation(self, vocab_path):
    tok = tok_lib.BertTokenizer(vocab_path)
    text = " ".join(["cat"] * 40)
    ids, true_len = tok.encode(text, max_len=17)
    assert true_len == 17


class TestCaptionEmbedder:

  def test_shapes_and_mask(self, vocab_path):
    tok = tok_lib.BertTokenizer(vocab_path)
    calls = []

    def fake_embed(ids, mask):
      calls.append((np.asarray(ids), np.asarray(mask)))
      return jnp.broadcast_to(
          jnp.asarray(mask, jnp.float32)[..., None],
          ids.shape + (768,))

    embedder = CaptionEmbedder(tok, fake_embed, max_text_length=17,
                               batch_size=8)
    captions = ["a cat", "a cat sits on the mat", "the mat"]
    emb, lengths = embedder(captions)
    assert emb.shape == (3, 17, 768)
    assert lengths.tolist() == [4, 8, 4]
    # The attention mask covered only true tokens.
    _, mask = calls[0]
    np.testing.assert_array_equal(mask[0][:5], [1, 1, 1, 1, 0])
    # Embedded vectors at padded positions come from the fake as 0.
    assert emb[0, 10].sum() == 0.0


class TestOfflineToolRoundTrip:

  def test_preprocess_to_training_pipeline(self, tmp_path, vocab_path):
    """Offline tool output feeds the real training pipeline unchanged."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools import preprocess_coco
    from xmcgan_image_generation_tpu.configs import coco_xmc
    from xmcgan_image_generation_tpu.data import pipeline

    # Tiny fake COCO layout.
    images_dir = tmp_path / "imgs"
    images_dir.mkdir()
    from PIL import Image
    rng = np.random.default_rng(0)
    anns = {"images": [], "annotations": []}
    for i in range(4):
      name = f"img{i}.jpg"
      Image.fromarray(
          rng.integers(0, 255, (40, 52, 3), np.uint8)).save(
              images_dir / name)
      anns["images"].append({"id": i, "file_name": name})
      for j in range(5):
        anns["annotations"].append(
            {"image_id": i, "caption": f"a cat sits on the mat {j}"})
    ann_path = tmp_path / "captions.json"
    ann_path.write_text(json.dumps(anns))

    tok = tok_lib.BertTokenizer(vocab_path)

    def fake_embed(ids, mask):
      return jnp.asarray(
          np.random.default_rng(1).standard_normal(
              ids.shape + (768,)), jnp.float32)

    embedder = CaptionEmbedder(tok, fake_embed, 17, batch_size=10)
    examples = preprocess_coco.load_annotations(str(ann_path))
    assert len(examples) == 4
    out_dir = tmp_path / "data"
    preprocess_coco.write_split(
        examples, embedder, str(images_dir), str(out_dir), "train",
        num_shards=2, log_every=0)
    preprocess_coco.write_split(
        examples, embedder, str(images_dir), str(out_dir), "val",
        num_shards=1, log_every=0)

    config = coco_xmc.get_test_config()
    config.data_source = "tfrecord"
    config.data_dir = str(out_dir) + "/"
    config.batch_size = 2
    config.d_step_per_g_step = 1
    config.eval_batch_size = 2
    train_loader, _, n = pipeline.create_datasets(config, seed=0)
    assert n == 4
    batch = next(iter(train_loader))
    assert batch["image"].shape == (2, config.image_size,
                                    config.image_size, 3)
    assert batch["embedding"].shape == (2, 17, 768)
    assert batch["max_len"].min() >= 2
