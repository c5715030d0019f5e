#!/usr/bin/env bash
# Tri-SF round-close gate: verify + oracle compare + output-type audit
# at every harness scale factor. The r9 round caught a t2 rounding
# boundary ONLY at sf0.001 — scale-dependent value boundaries (rounding
# ties, decimal widths, quantile bin edges) don't show at one SF, so
# this runs all three and fails loudly on the first red.
#
# Usage: tools/sweep.sh            (all queries, all SFs — ~10 min)
#        SPARK_GRAFT_ONLY=q1,q2 tools/sweep.sh   (changed queries only)
set -uo pipefail
cd "$(dirname "$0")/.."

fail=0
for sf in sf0.001 sf0.01 sf0.1; do
  out="/tmp/sweep_${sf}"
  # a stale dir from a previous sweep must never satisfy the checks
  # below when THIS run's verify crashed
  rm -rf "$out"
  echo "=== $sf: verify -> $out ==="
  vlog="/tmp/sweep_verify_${sf}.log"
  if ! sbt -batch "runMain graft.Verify /root/testdata/$sf $out" > "$vlog" 2>&1; then
    echo "SWEEP FAIL [$sf]: verify JVM exited nonzero (see $vlog)"; fail=1
  fi
  if grep -E "\[verify\].*failed" "$vlog"; then
    echo "SWEEP FAIL [$sf]: queries errored during verify (lines above)"; fail=1
  fi
  if [ ! -f "$out/oracle_sql.json" ]; then
    echo "SWEEP FAIL [$sf]: verify produced no oracle_sql.json"; fail=1; continue
  fi
  echo "--- $sf: DuckDB oracle compare ---"
  if ! python3 tools/check.py "$out" "/root/testdata/$sf"; then
    echo "SWEEP FAIL [$sf]: oracle mismatch"; fail=1
  fi
  echo "--- $sf: output-type audit ---"
  if ! python3 tools/oracle_types.py "$out/oracle_sql.json" "/root/testdata/$sf"; then
    echo "SWEEP FAIL [$sf]: hash-hostile output type"; fail=1
  fi
done

if [ "$fail" -ne 0 ]; then
  echo "SWEEP: RED — fix before round close"; exit 1
fi
echo "SWEEP: all SFs green"
