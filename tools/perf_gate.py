#!/usr/bin/env python3
"""Per-query Spark-vs-DuckDB perf gate (the round-close rule, automated).

The suite-level bar is "Spark total <= 2x single-threaded DuckDB on the
same oracle suite"; the per-query rule this enforces is: any query where
Spark exceeds 2x its DuckDB twin AND the absolute cost is outside the
documented fixed-constant band (> ABS_BAND seconds) must be flagged
loudly — those are real per-query gaps, not the ~0.3-2.3 s Spark
job-scheduling constant over tiny data that the round-6 variance study
characterized (sub-band members are reported as an informational count
only).

Usage:
  python3 tools/perf_gate.py <spark_bench_output> <duck_bench_output>

Both arguments are raw stdout captures: the Spark side's
`{"metric":"detail",...}` line and the DuckDB side's
`{"metric":"duckdb_oracle_suite",...}` line are located in the noise
(sbt "[info] " prefixes tolerated). Exit 1 if any query is flagged.
"""
import json, re, sys

ABS_BAND = 2.5   # seconds: the fixed-constant band's upper edge
RATIO = 2.0
# Contention sentinel constants — MUST match Bench.scala's calibrate()
# documentation (quiet-box 0.84 s measured on this CPU, warn at 1.3 s)
CALIB_QUIET = 0.84
CALIB_WARN = 1.3

# Documented per-query exceptions: queries whose >2x-and-above-band
# showing is analyzed and accepted (PLANS.md carries the analysis).
# An excepted query prints a loud WARN instead of failing the gate —
# every entry must name WHY the absolute number is a constant, not a
# scaling defect.
# r15: d14_sparse_cosine retired — three consecutive quiet
# measurements (2.75 s r14 official, 2.75 s r14 local, 2.71 s r15)
# sit at 1.49x its 1.82 s DuckDB twin, inside the 2x line with margin,
# so the gate's ordinary test covers it.
EXCEPTIONS = {
    "x2_fact_fact_join":
        "deliberately-plain control; analysis lives in PLANS.md "
        "('Round 15' / 'Join strategy' sections): its registered "
        "escapes x2_fact_fact_bucketed and x10 are both green and "
        "faster.",
}

def find_json(path, marker):
    found = None
    for line in open(path, errors="replace"):
        line = re.sub(r"^\[info\] ", "", line.strip())
        if line.startswith("{") and marker in line:
            try:
                found = json.loads(line)
            except json.JSONDecodeError:
                pass
    if found is None:
        raise SystemExit(f"perf_gate: no line with {marker} in {path}")
    return found

def main():
    spark = find_json(sys.argv[1], '"metric":"detail"')
    duck = find_json(sys.argv[2], '"duckdb_oracle_suite"')
    sq, dq = spark["queries"], duck["queries"]
    common = sorted(set(sq) & set(dq))
    flagged, in_band, spark_wins = [], [], 0
    for name in common:
        s, d = sq[name], dq[name]
        if d > 0 and s > RATIO * d:
            if s > ABS_BAND:
                flagged.append((name, s, d))
            else:
                in_band.append((name, s, d))
        if s > 0 and d > RATIO * s:
            spark_wins += 1
    st, dt = sum(sq[n] for n in common), sum(dq[n] for n in common)
    print(f"perf_gate: {len(common)} common queries; Spark {st:.1f} s vs "
          f"DuckDB {dt:.1f} s (ratio {st / dt:.2f}x, bar 2.0x); "
          f"{len(in_band)} queries >2x DuckDB inside the <= {ABS_BAND} s "
          f"fixed-constant band (informational); Spark >2x faster on "
          f"{spark_wins}")
    calib = spark.get("calib")
    if calib:
        print(f"perf_gate: contention sentinel start={calib['start']} "
              f"end={calib['end']} (quiet box ~{CALIB_QUIET} s, "
              f"warn > {CALIB_WARN} s — Bench.scala's measured constants)")
        if calib.get("schedMin", 0) and calib["schedMin"] > 1.0:
            print(f"perf_gate: WARN schedMin={calib['schedMin']} s "
                  "(quiet ~0.26-0.43 s at local[32]) — dispatch was slow for "
                  "the WHOLE run; totals are upper bounds")
        if calib.get("schedStalled", 0) > 0:
            print(f"perf_gate: WARN {calib['schedStalled']} scheduler probe(s) "
                  f"stalled mid-suite (schedMin={calib.get('schedMin')} "
                  f"schedMax={calib.get('schedMax')}, {calib.get('rescued', 0)} "
                  "queries re-measured post-suite) — dispatch-path contention "
                  "the ALU sentinel cannot see; affected queries already "
                  "carry their post-stall minimum")
        if max(calib['start'], calib['end']) > CALIB_WARN:
            print("perf_gate: WARN contention sentinel above threshold — "
                  "treat the Spark totals as contended, re-measure on a "
                  "quiet box before acting on ratios")
    if st > RATIO * dt:
        print(f"perf_gate: FAIL suite ratio {st / dt:.2f}x exceeds the 2x bar")
    hard = []
    for name, s, d in flagged:
        if name in EXCEPTIONS:
            print(f"perf_gate: WARN {name}: spark {s:.2f} s > 2x duckdb "
                  f"{d:.2f} s — documented exception: {EXCEPTIONS[name]}")
        else:
            hard.append(name)
            print(f"perf_gate: FAIL {name}: spark {s:.2f} s > 2x duckdb "
                  f"{d:.2f} s and above the {ABS_BAND} s band — a real "
                  f"per-query gap, profile or document it")
    if hard or st > RATIO * dt:
        sys.exit(1)
    print("perf_gate: PASS" + (" (with documented-exception warns)" if flagged else ""))

if __name__ == "__main__":
    main()
