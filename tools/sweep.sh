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

# Perf stage (round-close rule, automated): full Spark bench + DuckDB
# twin suite at sf0.1, then the per-query gate — any query >2x its
# DuckDB twin ABOVE the 2.5 s fixed-constant band fails loudly, as does
# a suite ratio >2x. Skipped when SPARK_GRAFT_ONLY scopes the sweep to
# changed queries (the perf rule is a whole-suite property) or when
# SPARK_GRAFT_SWEEP_NOPERF=1.
if [ -n "${SPARK_GRAFT_ONLY:-}" ] || [ "${SPARK_GRAFT_SWEEP_NOPERF:-}" = "1" ]; then
  echo "SWEEP: perf stage skipped (scoped run)"; exit 0
fi
echo "=== perf: Spark bench (sf0.1) ==="
blog="/tmp/sweep_bench.log"
if ! SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" > "$blog" 2>/dev/null; then
  echo "SWEEP FAIL [perf]: bench exited nonzero (see $blog)"; exit 1
fi
echo "=== perf: DuckDB twin suite (sf0.1) ==="
dlog="/tmp/sweep_duck.log"
if ! python3 tools/duck_bench.py /tmp/sweep_sf0.1/oracle_sql.json /root/testdata/sf0.1 > "$dlog"; then
  echo "SWEEP FAIL [perf]: duck_bench exited nonzero (see $dlog)"; exit 1
fi
if ! python3 tools/perf_gate.py "$blog" "$dlog"; then
  echo "SWEEP: RED — per-query perf gap above the band (see flags above)"; exit 1
fi
echo "SWEEP: perf gate green"
