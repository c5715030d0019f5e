#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check.py [verify_out_dir] [sf_dir]

Reads each <name>.parquet produced by `graft.Verify`, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the sf parquet tables,
sorts columns by name, and compares values (exact for ints/strings,
tiny-epsilon report for floats). Prints PASS/FAIL per query.
"""
import json, math, re, sys
import duckdb

# Driver-hash-hostile oracle output types (the r8/r14 failure class):
# the driver's hasher is physical-type-tagged, so a DuckDB HUGEINT or
# DECIMAL column hash-mismatches a value-identical Spark BIGINT/DOUBLE.
# Mirrors tools/oracle_types.py so a plain check.py run catches it too.
HOSTILE = re.compile(r"^(U?HUGEINT|UTINYINT|USMALLINT|UINTEGER|UBIGINT|DECIMAL\()")

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        got = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").fetchall()
        gcols = [c for c in con.sql(f"SELECT * FROM '{out}/{name}/*.parquet' LIMIT 0").columns]
        exp_rel = con.sql(sql)
        ecols = list(exp_rel.columns)
        hostile = [(c, str(t)) for c, t in zip(ecols, exp_rel.types)
                   if HOSTILE.match(str(t))]
        exp = exp_rel.fetchall()
    except Exception as e:
        print(f"FAIL {name}: exec error: {str(e)[:200]}")
        fails += 1
        continue
    # Hostile types are reported on EVERY fail path (not only after
    # values match) so a query with both a value diff and a hostile
    # oracle type surfaces both problems in one round-trip.
    hostile_note = (f"\n  also: oracle column(s) {hostile} have driver-hash-"
                    f"hostile types (CAST them in the oracle SQL)"
                    if hostile else "")
    if sorted(gcols) != sorted(ecols):
        print(f"FAIL {name}: columns spark={sorted(gcols)} oracle={sorted(ecols)}{hostile_note}")
        fails += 1
        continue
    gi = [gcols.index(c) for c in sorted(gcols)]
    ei = [ecols.index(c) for c in sorted(ecols)]
    grows = [tuple(r[i] for i in gi) for r in got]
    erows = [tuple(r[i] for i in ei) for r in exp]
    if len(grows) != len(erows):
        print(f"FAIL {name}: rows spark={len(grows)} oracle={len(erows)}{hostile_note}")
        fails += 1
        continue
    bad = None
    for i, (g, e) in enumerate(zip(grows, erows)):
        for a, b in zip(g, e):
            ok = (a == b)
            if not ok and isinstance(a, float) and isinstance(b, float):
                ok = (math.isnan(a) and math.isnan(b)) or a == b
            # The driver hashes float BITS, not values: -0.0 vs +0.0
            # compares equal in Python but hash-mismatches (the g11/r16
            # failure class — round() of a tiny negative). Flag any
            # signed-zero disagreement as a hard FAIL.
            if ok and isinstance(a, float) and isinstance(b, float) \
                    and a == 0.0 and math.copysign(1.0, a) != math.copysign(1.0, b):
                ok = False
            if not ok:
                bad = (i, g, e)
                break
        if bad:
            break
    if bad:
        print(f"FAIL {name}: first diff at row {bad[0]}:\n  spark : {bad[1]}\n  oracle: {bad[2]}{hostile_note}")
        fails += 1
    elif hostile:
        print(f"FAIL {name}: values match but oracle column(s) {hostile} have "
              f"driver-hash-hostile types (CAST them in the oracle SQL)")
        fails += 1
    else:
        print(f"PASS {name} ({len(grows)} rows)")
print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
