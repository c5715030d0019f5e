#!/usr/bin/env python3
"""Oracle output-type audit — the r8 hash-mismatch regression gate.

The driver's correctness hash is physical-type-sensitive, and DuckDB
silently widens some arithmetic (sum(BIGINT) -> HUGEINT, // on HUGEINT
stays HUGEINT, sum(DECIMAL(18,2)) -> DECIMAL(38,2)) to types Spark
never emits. Round 8 lost 4 otherwise-value-exact queries to exactly
this. This script runs every oracle's LIMIT-0 plan in DuckDB and fails
if any output column carries a type with no Spark physical twin:

  * HUGEINT / UHUGEINT          (Spark max integer type is BIGINT)
  * DECIMAL with precision > 38 (cannot happen in Spark)
  * DECIMAL(38,s)               (DuckDB's sum-widening fingerprint;
                                 Spark sum(DECIMAL(p,s)) gives p+10
                                 capped at 38 only for p >= 28 inputs —
                                 we never ingest those, so 38 here means
                                 an unchecked widening slipped in)
  * UTINYINT/USMALLINT/UINTEGER/UBIGINT (Spark has no unsigned ints)

Usage: python3 tools/oracle_types.py [oracle_sql.json] [sf_dir]
(run tools/check.py or graft.Verify first to dump oracle_sql.json).
Exit 0 = clean; 1 = some oracle can hash-mismatch a value-exact result.
"""
import json, re, sys
import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out/oracle_sql.json"
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

BAD = re.compile(r"^(U?HUGEINT|UTINYINT|USMALLINT|UINTEGER|UBIGINT)$")

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(src))
bad = 0
for name, sql in sorted(oracle.items()):
    try:
        rel = con.sql(f"SELECT * FROM ({sql}) q LIMIT 0")
        pairs = list(zip(rel.columns, [str(t) for t in rel.types]))
    except Exception as e:
        print(f"FAIL {name}: oracle does not parse/run: {str(e)[:200]}")
        bad += 1
        continue
    for col, typ in pairs:
        dec = re.match(r"DECIMAL\((\d+),(\d+)\)", typ)
        # r10 verdict: ANY DecimalType in a declared output schema is
        # hash-hostile — s13 failed three rounds running at three
        # different widths (28,2 / widened / narrowed 18,2) with values
        # AND DuckDB-visible types identical. Decimals may live INSIDE
        # an operator (storage, exact aggregation); the output boundary
        # must emit integers (cents) or doubles.
        if BAD.match(typ) or dec:
            print(f"FAIL {name}: column '{col}' has driver-hash-hostile "
                  f"type {typ} (cast it in the oracle SQL)")
            bad += 1
print(f"{'FAIL' if bad else 'OK'}: {len(oracle)} oracles audited, "
      f"{bad} hash-hostile column(s)")
sys.exit(1 if bad else 0)
