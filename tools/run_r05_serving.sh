#!/bin/bash
# Round-5 serving-record campaign (VERDICT r04 item 2): the round-4
# record had ONE committed raw point that contradicted its jit-parity
# headline (export_overhead 2.02 vs the narrative's 1.00), explained as
# "bimodal call_exported dispatch over the axon tunnel" from n=2
# observations.  This runs tools/serving_bench.py across N independent
# process launches — each launch now records 5 raw timing windows per
# path with the 4x validity rule — so the overhead is reported as a
# distribution and the bimodality (if real) shows up as per-launch
# modes in committed data.
#
# Launch 0 additionally refreshes the artifact-size/symbolic-batch
# record.  Serial on purpose: one-core host, never overlap TPU timing.
set -u
OUT=${1:-measurements/r05/serving}
N=${2:-5}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

for i in $(seq 0 $((N - 1))); do
  f="$OUT/launch_$i.json"
  if [ -s "$f" ]; then echo "== launch $i (cached)"; continue; fi
  extra=""
  [ "$i" -eq 0 ] && extra="--symbolic --sizes"
  echo "== launch $i: serving_bench.py $extra"
  timeout 2400 python tools/serving_bench.py $extra \
    > "$f" 2> "$OUT/launch_$i.log" || {
      echo "   FAILED (see $OUT/launch_$i.log)"; rm -f "$f"; }
  tail -c 400 "$f" 2>/dev/null; echo
done
echo "done: $OUT"
