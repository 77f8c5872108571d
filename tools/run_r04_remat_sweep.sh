#!/bin/bash
# Round-4 measurement sweep: remat_policy=conv (the HBM-bandwidth lever
# shipped in round 3 without an on-chip measurement — VERDICT r3 weak #1)
# at the flagship 128px shapes, plus the 256px interaction sweep
# (scale_fused x remat_policy x batch — VERDICT r3 ask #7).
#
# Runs serially (this host has one CPU core; concurrent processes inflate
# timings).  Results land in $OUT as one JSON file per point.
set -u
OUT=${1:-/tmp/r04_remat}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  if [ -s "$OUT/$name.json" ]; then
    echo "== $name (cached)"; return
  fi
  echo "== $name: bench.py $*"
  timeout 2400 python bench.py --skip_baseline "$@" \
    > "$OUT/$name.json" 2> "$OUT/$name.log"
  rc=$?
  if [ $rc -ne 0 ]; then
    echo "   FAILED rc=$rc (see $OUT/$name.log)"
    rm -f "$OUT/$name.json"
  else
    tail -c 400 "$OUT/$name.json"; echo
  fi
}

# --- 128px flagship: remat_policy=conv vs the round-3 default (no remat).
for B in 56 84 112; do
  run "128_b${B}_noremat"  --image_size=128 --batch_size=$B --scale_fused_convs=1
  run "128_b${B}_conv_all" --image_size=128 --batch_size=$B --scale_fused_convs=1 \
      --remat_policy=conv --remat_min_resolution=0
done
# Selective variant: only the big scales (where the residuals live).
run "128_b56_conv_64" --image_size=128 --batch_size=56 --scale_fused_convs=1 \
    --remat_policy=conv --remat_min_resolution=64
# Classic full remat for reference (capacity lever, expected slower).
run "128_b56_full_all" --image_size=128 --batch_size=56 --scale_fused_convs=1 \
    --remat_policy=full --remat_min_resolution=0

# --- 256px interaction sweep: scale_fused x remat_policy x batch.
# (256 config has remat=True, remat_min_resolution=256 by default.)
for B in 16 32; do
  for P in full conv; do
    run "256_b${B}_${P}_fused" --image_size=256 --batch_size=$B \
        --scale_fused_convs=1 --remat_policy=$P
  done
  run "256_b${B}_conv_minres0_fused" --image_size=256 --batch_size=$B \
      --scale_fused_convs=1 --remat_policy=conv --remat_min_resolution=0
done

echo "sweep done"
