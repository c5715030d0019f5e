#!/usr/bin/env python3
"""DuckDB-relative benchmark — measures the binding perf constraint.

The driver's rule is "Spark suite <= 2x single-threaded DuckDB on the
same oracle suite". This tool measures the DuckDB side the same way
every round so the ratio is a tracked number, not a re-estimate:

  * the EXACT oracle suite the correctness gate runs (oracle_sql.json
    as dumped by `graft.Verify`),
  * single-threaded (SET threads TO 1),
  * warm views over the sf parquet tables,
  * min of N runs per query (default 2),
  * d2_ngram_jaccard_pairs excluded (the labeled quadratic baseline is
    bench-excluded on the Spark side too — see PLANS.md).

Usage:
  python3 tools/duck_bench.py [oracle_sql.json] [sf_dir] [spark_total_sec]

  oracle_sql.json  default /tmp/vout/oracle_sql.json (a Verify dump)
  sf_dir           default /root/testdata/sf0.1
  spark_total_sec  optional: the Spark bench total to ratio against
                   (e.g. the "value" field of BENCH_r{N}.json)

Prints per-query seconds, the suite total, and a final JSON line; if
spark_total_sec is given, also the spark/duckdb ratio for PLANS.md.
"""
import json, sys, time
import duckdb

EXCLUDE = {"d2_ngram_jaccard_pairs"}
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    oracle_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vout/oracle_sql.json"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark_total = float(sys.argv[3]) if len(sys.argv) > 3 else None
    runs = 2

    con = duckdb.connect()
    con.execute("SET threads TO 1")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    oracle = json.load(open(oracle_path))
    per, total = {}, 0.0
    for name in sorted(oracle):
        if name in EXCLUDE:
            print(f"SKIP  {name} (excluded)")
            continue
        best = None
        for _ in range(runs):
            t0 = time.monotonic()
            con.sql(oracle[name]).fetchall()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        per[name] = round(best, 3)
        total += best
        print(f"{best:7.3f}  {name}")

    total = round(total, 1)
    print(f"\nDuckDB total (1 thread, min of {runs}, {len(per)} queries): {total} s")
    out = {"metric": "duckdb_oracle_suite", "value": total, "unit": "sec",
           "sf": sf, "n_queries": len(per), "queries": per}
    if spark_total is not None:
        out["spark_total"] = spark_total
        out["ratio"] = round(spark_total / total, 2)
        print(f"Spark {spark_total} s / DuckDB {total} s = {out['ratio']}x "
              f"(bar: <= 2.0x)")
    print(json.dumps(out))

if __name__ == "__main__":
    main()
