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

echo "== preflight PASS — safe to commit =="
