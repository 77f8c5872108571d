#!/bin/bash
# 256px rigor sweep (VERDICT r2 item 5): remat_min_resolution x batch on
# the real chip, plus a cost-analysis MFU attribution of the 256px step.
# Serial on purpose: one-core host, never overlap TPU timing jobs.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/sweep256.jsonl}
: > "$OUT"
for bs in 16 32; do
  for remat in 0 64 128 256; do
    echo "=== batch $bs remat_min_resolution $remat" >&2
    python bench.py --image_size 256 --skip_baseline --batch_size "$bs" \
      --remat_min_resolution "$remat" --steps 6 2>/dev/null \
      | tail -1 \
      | python -c "import json,sys;d=json.load(sys.stdin);d['batch']=$bs;d['remat_min_resolution']=$remat;print(json.dumps(d))" \
      >> "$OUT" || echo "{\"batch\": $bs, \"remat_min_resolution\": $remat, \"error\": \"failed/oom\"}" >> "$OUT"
  done
done
echo "=== profile_step 256px MFU" >&2
python tools/profile_step.py --image_size 256 --batch_size 16 --steps 6 \
  --skip_micro --json_out /tmp/profile_256.json 2>&1 | tail -30
echo SWEEP_DONE
