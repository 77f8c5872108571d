#!/bin/bash
# XLA flag probe at the flagship 128px shape: measures throughput under
# candidate TPU compiler flags vs the default.  Scoped-vmem is the main
# real lever for conv fusion scratch; the rest are documented toggles.
# Serial on purpose: one-core host, never overlap TPU timing jobs.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/flagprobe.jsonl}
: > "$OUT"

run_one() {
  local tag="$1"; shift
  local flags="$*"
  echo "=== $tag [$flags]" >&2
  XLA_FLAGS="$flags" python bench.py --skip_baseline --steps 6 2>/dev/null \
    | tail -1 \
    | TAG="$tag" python -c "import json,os,sys;d=json.load(sys.stdin);d['probe']=os.environ['TAG'];print(json.dumps(d))" \
    >> "$OUT" || echo "{\"probe\": \"$tag\", \"error\": \"failed\"}" >> "$OUT"
}

run_one default ""
run_one vmem64m  "--xla_tpu_scoped_vmem_limit_kib=65536"
run_one vmem96m  "--xla_tpu_scoped_vmem_limit_kib=98304"
run_one no_lhs   "--xla_tpu_enable_latency_hiding_scheduler=false"
echo PROBE_DONE
