#!/bin/bash
# Serial on-chip measurement plan for the scale-fused convolutions
# (ops/scale_fuse.py).  Run with NOTHING else on the box (one CPU core;
# concurrent work inflates timings up to 2x).  Outputs land in
# ${OUT:-/tmp/scalefuse_r03}/.
#
# Order matters: the cheap per-shape microbench first (sanity per
# formulation), then the full-step A/B that decides the default.
set -e
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/scalefuse_r03}
mkdir -p "$OUT"

echo "== 1. per-shape microbench (fused vs naive, fwd and fwd+bwd) =="
python tools/scalefuse_bench.py --json_out "$OUT/shapes.json" \
  2>&1 | tee "$OUT/shapes.log"

echo "== 2. full-step A/B at 128px batch 56 (decides the default) =="
python bench.py --skip_baseline --scale_fused_convs 0 \
  2>&1 | tee "$OUT/step128_naive.log"
python bench.py --skip_baseline --scale_fused_convs 1 \
  2>&1 | tee "$OUT/step128_fused.log"

echo "== 3. fused at larger batches (memory headroom from no full-res intermediates) =="
python bench.py --skip_baseline --scale_fused_convs 1 --batch_size 84 \
  2>&1 | tee "$OUT/step128_fused_b84.log" || true
python bench.py --skip_baseline --scale_fused_convs 1 --batch_size 112 \
  2>&1 | tee "$OUT/step128_fused_b112.log" || true

echo "== 4. same-batch-28 fused datapoint (decomposition table) =="
python bench.py --skip_baseline --scale_fused_convs 1 --batch_size 28 \
  2>&1 | tee "$OUT/step128_fused_b28.log" || true

echo "== 5. 256px paper config =="
python bench.py --image_size 256 --skip_baseline --scale_fused_convs 1 \
  --batch_size 16 2>&1 | tee "$OUT/step256_fused_b16.log" || true
python bench.py --image_size 256 --skip_baseline --scale_fused_convs 1 \
  --batch_size 32 2>&1 | tee "$OUT/step256_fused_b32.log" || true

echo "== 6. phase attribution of the fused step =="
python tools/profile_step.py --scale_fused_convs 1 --use_pallas \
  --json_out "$OUT/profile_fused.json" 2>&1 | tee "$OUT/profile_fused.log"

echo "== 7. the round-record bench (A/B both pipelines + cached baseline) =="
python bench.py 2>&1 | tee "$OUT/bench_record.log"

echo "== 8. serving throughput (exported artifact vs in-framework jit) =="
python tools/serving_bench.py --batch_size 64 --steps 20 \
  2>&1 | tee "$OUT/serving_bench.log" || true

echo "all outputs in $OUT"
