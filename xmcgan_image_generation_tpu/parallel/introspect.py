"""Compiled-HLO introspection: collective census and tensor-size audit.

Used by the multi-chip AOT tests (tests/test_multichip_aot.py) and the
driver dry run (__graft_entry__.dryrun_multichip) to assert that the
GSPMD partitioning of the train step has the intended structure — the
gradient all-reduce over the ``data`` axis exists, the contrastive
word-loss all-gather exists, and no intermediate was silently
replicated to full-batch size (the reference's per-device
``[B, B, R, L]`` blow-up this design exists to avoid — reference
libml/attention_lib.py:130-191 materializes the whole pipeline on every
replica under pmap).
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

_COLLECTIVES = (
    "all-reduce",
    "all-gather",
    "reduce-scatter",
    "collective-permute",
    "all-to-all",
)

# HLO op form: `%name = bf16[16,128,128,96]{3,2,1,0} all-reduce(...)`.
_OP_RE = re.compile(
    r"=\s+(\([^)]*\)|[a-z0-9]+\[[0-9,]*\](?:\{[^}]*\})?)\s+"
    r"(" + "|".join(_COLLECTIVES) + r")(-start|-done)?\(")

_SHAPE_RE = re.compile(r"\b(pred|bf16|f16|f32|f64|s8|u8|s16|u16|s32|u32|"
                       r"s64|u64|c64|c128)\[([0-9,]*)\]")

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1,
    "bf16": 2, "f16": 2, "s16": 2, "u16": 2,
    "f32": 4, "s32": 4, "u32": 4,
    "f64": 8, "s64": 8, "u64": 8, "c64": 8,
    "c128": 16,
}


def collective_counts(hlo_text: str) -> Dict[str, int]:
  """Counts collective ops in compiled (post-partitioning) HLO text.

  ``-start``/``-done`` pairs of an async collective count once.
  """
  counts: Dict[str, int] = {}
  for m in _OP_RE.finditer(hlo_text):
    if m.group(3) == "-done":  # the start of the async pair was counted
      continue
    counts[m.group(2)] = counts.get(m.group(2), 0) + 1
  return counts


def collective_bytes(hlo_text: str) -> Dict[str, int]:
  """Per-device OUTPUT bytes moved by each collective kind, summed.

  For each collective op the per-device result shape(s) right after
  ``=`` are summed (tuple outputs — e.g. fused all-reduces — count every
  element).  ``-done`` halves of async pairs are skipped.  This is the
  program's per-step collective traffic as seen by one device, the
  quantity to compare against the step's HBM budget when deciding
  whether a collective matters (tools/grad_accum_census.py).
  """
  out: Dict[str, int] = {}
  for m in _OP_RE.finditer(hlo_text):
    if m.group(3) == "-done":
      continue
    n = 0
    for sm in _SHAPE_RE.finditer(m.group(1)):
      e = _DTYPE_BYTES[sm.group(1)]
      for d in sm.group(2).split(","):
        if d:
          e *= int(d)
      n += e
    out[m.group(2)] = out.get(m.group(2), 0) + n
  return out


def tensor_shapes(hlo_text: str) -> List[Tuple[str, Tuple[int, ...], int]]:
  """All (dtype, dims, nbytes) tensor shapes mentioned in the HLO text."""
  seen = set()
  out = []
  for m in _SHAPE_RE.finditer(hlo_text):
    key = m.group(0)
    if key in seen:
      continue
    seen.add(key)
    dtype = m.group(1)
    dims = tuple(int(d) for d in m.group(2).split(",") if d)
    n = _DTYPE_BYTES[dtype]
    for d in dims:
      n *= d
    out.append((dtype, dims, n))
  return out


def max_tensor_bytes(hlo_text: str) -> Tuple[int, str]:
  """Largest single tensor in the program: ``(nbytes, 'dtype[dims]')``."""
  best, desc = 0, ""
  for dtype, dims, n in tensor_shapes(hlo_text):
    if n > best:
      best, desc = n, f"{dtype}[{','.join(map(str, dims))}]"
  return best, desc
