#!/bin/bash
# XLA/TPU compiler-flag probe at the flagship 128px shape: measures
# throughput under candidate TPU compiler flags vs the default.
#
# IMPORTANT: flags ride bench.py's --compiler_option (per-compile
# options on the lowered program).  XLA_FLAGS does NOT work here: the
# client process links a CPU-only XLA and the TPU compiler lives behind
# the axon tunnel, so env-var flags never reach it (the round-3 version
# of this script had that bug and probed nothing).
#
# Scoped-vmem is the main real lever for conv fusion scratch (bigger
# scoped VMEM -> wider fusion tiles -> fewer HBM round trips); the rest
# are documented scheduler/fusion toggles.
# Serial on purpose: one-core host, never overlap TPU timing jobs.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/flagprobe.jsonl}
: > "$OUT"

run_one() {
  local tag="$1"; shift
  echo "=== $tag [$*]" >&2
  timeout 2400 python bench.py --skip_baseline --scale_fused_convs=1 \
      --steps 6 --repeats 3 "$@" 2>/dev/null \
    | tail -1 \
    | TAG="$tag" python -c "import json,os,sys;d=json.load(sys.stdin);d['probe']=os.environ['TAG'];print(json.dumps(d))" \
    >> "$OUT" || echo "{\"probe\": \"$tag\", \"error\": \"failed\"}" >> "$OUT"
  tail -1 "$OUT" >&2
}

run_one default
run_one vmem32m --compiler_option xla_tpu_scoped_vmem_limit_kib=32768
run_one vmem64m --compiler_option xla_tpu_scoped_vmem_limit_kib=65536
run_one vmem96m --compiler_option xla_tpu_scoped_vmem_limit_kib=98304
run_one no_lhs --compiler_option xla_tpu_enable_latency_hiding_scheduler=false
run_one flash_vmem --compiler_option xla_tpu_scoped_vmem_limit_kib=65536 \
  --compiler_option xla_tpu_enable_dot_strength_reduction=false
echo PROBE_DONE
