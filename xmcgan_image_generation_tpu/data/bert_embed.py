"""Batched on-TPU BERT caption embedding.

The TPU-native replacement for the reference's offline preprocessing pass,
which crawled captions through a TF-Hub Keras BERT one mini-batch at a
time for ~2.5 GPU-hours (reference preprocess_data.py:29-75, README.md:40).
Here the encoder is a jitted Flax BERT running large fixed-shape batches
on the accelerator; the tokenizer is in-repo (`data.tokenizer`).

Weights come from a local HuggingFace directory
(``FlaxBertModel.from_pretrained(path)``); without one, a deterministic
random-initialized BERT of the same geometry stands in (for tests and
offline smoke runs — embeddings are then not semantically meaningful).
"""

from __future__ import annotations

import logging
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from xmcgan_image_generation_tpu.data.tokenizer import BertTokenizer

log = logging.getLogger("xmcgan_tpu")

BERT_DIM = 768


def build_bert(model_path: Optional[str] = None):
  """Returns a jitted ``(ids [B, L], mask [B, L]) -> [B, L, 768]`` fn."""
  from transformers import BertConfig, FlaxBertModel

  if model_path:
    model = FlaxBertModel.from_pretrained(model_path)
    log.info("Loaded BERT from %s", model_path)
  else:
    log.warning(
        "No BERT path given: using a RANDOM-initialized bert-base. "
        "Embeddings are placeholders, not semantic.")
    config = BertConfig()  # bert-base-uncased geometry.
    model = FlaxBertModel(config, seed=0)

  @jax.jit
  def embed(ids: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    out = model(input_ids=ids, attention_mask=mask)
    return out.last_hidden_state

  return embed


class CaptionEmbedder:
  """Tokenizes and embeds caption batches with fixed shapes.

  One call handles ``[n_captions]`` strings; internally pads to a fixed
  batch so the jitted BERT compiles once.
  """

  def __init__(self, tokenizer: BertTokenizer,
               embed_fn: Callable,
               max_text_length: int = 17,
               batch_size: int = 256):
    self.tokenizer = tokenizer
    self.embed_fn = embed_fn
    self.max_text_length = max_text_length
    self.batch_size = batch_size

  def __call__(self, captions: Sequence[str]
               ) -> Tuple[np.ndarray, np.ndarray]:
    """Returns ``(embeddings [n, L, 768], max_len [n])``."""
    n = len(captions)
    ids = np.zeros((n, self.max_text_length), np.int32)
    lengths = np.zeros((n,), np.int64)
    for i, text in enumerate(captions):
      row, true_len = self.tokenizer.encode(text, self.max_text_length)
      ids[i] = row
      lengths[i] = true_len
    # Attention mask covers the true tokens only, as the reference does
    # (preprocess_data.py:44-48); BERT still emits vectors at padded
    # positions, which downstream masks away via max_len.
    attn = (np.arange(self.max_text_length)[None, :]
            < lengths[:, None]).astype(np.int32)
    embeddings = np.zeros((n, self.max_text_length, BERT_DIM), np.float32)
    for start in range(0, n, self.batch_size):
      chunk = ids[start:start + self.batch_size]
      mask = attn[start:start + self.batch_size]
      pad = self.batch_size - chunk.shape[0]
      if pad:
        zeros = np.zeros((pad, self.max_text_length), np.int32)
        chunk = np.concatenate([chunk, zeros])
        mask = np.concatenate([mask, zeros])
      out = np.asarray(self.embed_fn(jnp.asarray(chunk),
                                     jnp.asarray(mask)))
      embeddings[start:start + self.batch_size] = out[:self.batch_size
                                                      - pad]
    return embeddings, lengths
