#!/bin/bash
# Round-4 phase-2 chip measurements (after tools/run_r04_remat_sweep.sh):
#   1. use_pallas OFF at flagship shapes with repeat-run spread — the
#      variance-aware A/B that VERDICT r3 weak #3 asked for (the ON arm
#      is the sweep's 128_b56_noremat / 128_b84_noremat points).
#   2. HBM-byte census of the compiled fused step (which bytes, reducible?).
# Serial on purpose: one-core host, never overlap TPU timing jobs.
set -u
OUT=${1:-/tmp/r04_phase2}
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

run "128_b56_pallas0" --image_size=128 --batch_size=56 \
    --scale_fused_convs=1 --use_pallas=0
run "128_b84_pallas0" --image_size=128 --batch_size=84 \
    --scale_fused_convs=1 --use_pallas=0

if [ ! -s "$OUT/bytes_census_fused.json" ]; then
  echo "== bytes census (fused)"
  timeout 2400 python tools/bytes_census.py --image_size 128 --batch_size 56 \
      --scale_fused_convs 1 --out "$OUT/bytes_census_fused.json" \
      > /dev/null 2> "$OUT/bytes_census_fused.log" \
    || { echo FAILED; rm -f "$OUT/bytes_census_fused.json"; }
  tail -c 600 "$OUT/bytes_census_fused.json" 2>/dev/null; echo
fi

echo "phase2 done"
