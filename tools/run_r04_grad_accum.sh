#!/bin/bash
# Round-4 capacity measurements for gradient accumulation
# (config.grad_accum_steps): the knob's claim is that live activation
# memory drops to one microbatch's, so batches that OOM plain should
# train accumulated.  Points:
#
#   * the capacity boundary at 128px — the largest plain batch that
#     fits (112 measured 593.7 img/s in the remat sweep), then 224
#     plain (expect OOM) vs 224 accumulated (k=2, 4);
#   * same-global-batch overhead — 112 plain vs 112 @ k=2 (the scan's
#     cost: sequentialized microbatches + re-run batch stats);
#   * 256px at the shipped defaults (remat full @ minres 256) — 64
#     plain (expect OOM) vs 64 @ k=2, 4.
#
# Runs serially (one CPU core).  Results land in $OUT as one JSON file
# per point; OOM points keep their .log for the capacity record.
set -u
OUT=${1:-/tmp/r04_grad_accum}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  if [ -s "$OUT/$name.json" ] || [ -s "$OUT/$name.OOM" ]; then
    echo "== $name (cached)"; return
  fi
  echo "== $name: bench.py $*"
  timeout 2400 python bench.py --skip_baseline --scale_fused_convs 1 "$@" \
    > "$OUT/$name.json" 2> "$OUT/$name.log"
  rc=$?
  if [ $rc -ne 0 ]; then
    if grep -qi "RESOURCE_EXHAUSTED\|out of memory\|OOM" "$OUT/$name.log"; then
      echo "   OOM (the capacity boundary)"
      mv "$OUT/$name.log" "$OUT/$name.OOM"
    else
      echo "   FAILED rc=$rc (see $OUT/$name.log)"
    fi
    rm -f "$OUT/$name.json"
  else
    tail -c 400 "$OUT/$name.json"; echo
  fi
}

# 128px flagship shapes.
run 128_b112_k2 --image_size 128 --batch_size 112 --grad_accum_steps 2
run 128_b224_k1 --image_size 128 --batch_size 224
run 128_b224_k2 --image_size 128 --batch_size 224 --grad_accum_steps 2
run 128_b224_k4 --image_size 128 --batch_size 224 --grad_accum_steps 4

# 256px at the shipped defaults (remat full @ minres 256).
run 256_b64_k1 --image_size 256 --batch_size 64 \
  --remat_min_resolution 256 --remat_policy full
run 256_b64_k2 --image_size 256 --batch_size 64 --grad_accum_steps 2 \
  --remat_min_resolution 256 --remat_policy full
run 256_b64_k4 --image_size 256 --batch_size 64 --grad_accum_steps 4 \
  --remat_min_resolution 256 --remat_policy full

echo "done: $OUT"
