#!/bin/bash
# Round-4 post-sweep chip measurements, serial (one-core host — never
# overlap TPU timing jobs):
#   1. dual-cotangent-vjp A/B at the flagship shape (HBM-traffic question:
#      equal FLOPs, possibly fewer saved-activation reads)
#   2. compiler-flag probe (scoped VMEM etc. via per-compile options)
#   3. serving record: jit-vs-artifact + symbolic batch + size table
set -u
OUT=${1:-/tmp/r04_chip}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

if [ ! -s "$OUT/dual_cotangent_b56.json" ]; then
  echo "== dual_cotangent_b56"
  timeout 2400 python bench.py --skip_baseline --scale_fused_convs=1 \
      --dual_cotangent_vjp=1 \
      > "$OUT/dual_cotangent_b56.json" 2> "$OUT/dual_cotangent_b56.log" \
    || { echo FAILED; rm -f "$OUT/dual_cotangent_b56.json"; }
  tail -c 400 "$OUT/dual_cotangent_b56.json" 2>/dev/null; echo
fi

if [ ! -s "$OUT/flagprobe.jsonl" ] || ! grep -q PROBE_DONE "$OUT/flagprobe.done" 2>/dev/null; then
  echo "== flag probe"
  bash tools/flag_probe.sh "$OUT/flagprobe.jsonl" && echo PROBE_DONE > "$OUT/flagprobe.done"
  cat "$OUT/flagprobe.jsonl"
fi

if [ ! -s "$OUT/serving.json" ]; then
  echo "== serving bench"
  timeout 3600 python tools/serving_bench.py --batch_size 64 --steps 20 \
      --symbolic --sizes \
      > "$OUT/serving.json" 2> "$OUT/serving.log" \
    || { echo FAILED; rm -f "$OUT/serving.json"; }
  tail -c 1200 "$OUT/serving.json" 2>/dev/null; echo
fi

echo "chip jobs done"
