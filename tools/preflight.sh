#!/usr/bin/env bash
# Snapshot-commit preflight: NOTHING enters an end-of-round commit without
# passing this. Round 9 was lost to an environment shift and round 11 to a
# single stray paren — both would have been caught here in ~2 minutes.
#
# Usage:
#   tools/preflight.sh                      # compile + full verify + check
#   tools/preflight.sh gate1 gate2 ...      # compile + verify ONLY the named
#                                           # gates (substring match) + check
#
# Exit 0 = safe to commit. Any other exit = DO NOT COMMIT.
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.01}"
OUT_DIR="$(mktemp -d /tmp/preflight.XXXXXX)"
trap 'rm -rf "$OUT_DIR"' EXIT

echo "== preflight 1/3: sbt compile (incl. Test) =="
sbt -batch "Test / compile" < /dev/null

SUBSET=""
if [ "$#" -gt 0 ]; then SUBSET="$(IFS=,; echo "$*")"; fi
echo "== preflight 2/3: graft.Verify @ $SF_DIR (${SUBSET:-ALL gates}) =="
# Capture sbt's exit status explicitly: a `sbt | grep || true` pipeline
# would neutralize pipefail and let a nonzero Verify exit slip through.
VLOG="$OUT_DIR/verify.log"
if ! SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
    sbt -batch "runMain graft.Verify $SF_DIR $OUT_DIR $SUBSET" \
    < /dev/null > "$VLOG" 2>&1; then
  echo "== preflight FAIL: graft.Verify exited nonzero; log tail: =="
  tail -n 40 "$VLOG"
  exit 1
fi
grep -E '\[verify\]' "$VLOG" || true

echo "== preflight 3/3: tools/check.py vs DuckDB oracle =="
python3 tools/check.py "$OUT_DIR" "$SF_DIR"

# Optional perf canary (GRAFT_PERF_CANARY=1): one quick entry per query
# family benched at sf0.1 against the BASELINE.md pins with a generous 3x
# tripwire — catches accidental plan regressions (un-partitioned window,
# lost broadcast, unpushed filter) before commit at ~60-90 s cost. Not the
# 2x certification rule; see tools/perfcheck.py.
if [ "${GRAFT_PERF_CANARY:-0}" = "1" ]; then
  echo "== preflight 4/4 (opt-in): perf canary vs BASELINE.md pins =="
  CANARY_SET="${GRAFT_PERF_CANARY_SET:-logql_rate_sum_by promql_rate traceql_agg_count llm_shard_assign ingest_loki_roundtrip}"
  BLOG="$OUT_DIR/bench.log"
  if ! SPARK_GRAFT_SF_DIR="${GRAFT_PERF_SF_DIR:-/root/testdata/sf0.1}" \
      SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SHUFFLE=32 \
      sbt -batch "runMain graft.Bench $CANARY_SET" \
      < /dev/null > "$BLOG" 2>&1; then
    echo "== preflight FAIL: perf canary bench exited nonzero; log tail: =="
    tail -n 40 "$BLOG"
    exit 1
  fi
  python3 tools/perfcheck.py target/bench_partial.json BASELINE.md 3.0
fi

echo "== preflight PASS — safe to commit =="
