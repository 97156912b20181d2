"""Local harness mimicking the driver's correctness gate: run each
queries() entry on Spark and its oracle_sql() twin on DuckDB, compare
row-count, column names, and an order-insensitive value multiset.

Usage: python tools/check_oracle.py [--json OUT.json] [--exact]
       [sf_dir] [query_name ...]

--exact compares floats at FULL precision (bit-for-bit after float()
normalization) instead of the default 6-dp rounding — the driver's
value hash is full-precision, so --exact is the faithful local
reproduction of its gate.  Integer/string/bool outputs are unaffected.

With --json, also writes a machine-readable result file in the driver's
CORRECTNESS_r{N}.json per-query format (rows_match/schema_match/
hash_match/spark_rows/oracle_rows/err) covering EVERY checked query —
the driver's own file only covers the first 50 registry entries.
"""

import json
import os
import sys
from collections import Counter

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


EXACT = False


def norm_val(v):
    if isinstance(v, float):
        return v if EXACT else round(v, 6)
    import decimal

    if isinstance(v, decimal.Decimal):
        return float(v) if EXACT else round(float(v), 6)
    return v


def rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(norm_val(r[i]) for i in order) for r in rows)


def main():
    global EXACT
    argv = sys.argv[1:]
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    if argv and argv[0] == "--exact":
        EXACT = True
        argv = argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])
    results = {}

    import __spark_entry__ as entry_mod
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", "6g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "spark_rows": None,
                             "oracle_rows": None, "err": f"SPARK ERROR: {e}"}
            print(f"[FAIL-spark] {name}: {e}")
            continue
        if name not in oracles:
            results[name] = {"rows_match": None, "schema_match": None,
                             "hash_match": None, "spark_rows": len(srows),
                             "oracle_rows": None, "err": None,
                             "rows_only": True}
            print(f"[rows-only] {name}: {len(srows)} rows, cols={scols}")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "spark_rows": len(srows),
                             "oracle_rows": None, "err": f"DUCKDB ERROR: {e}"}
            print(f"[FAIL-duckdb] {name}: {e}")
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if not problems:
            ms, mo = rows_to_multiset(scols, srows), rows_to_multiset(ocols, orows)
            if ms != mo:
                diff = list((ms - mo).items())[:3] + list((mo - ms).items())[:3]
                problems.append(f"values differ, sample diff: {diff}")
        results[name] = {
            "rows_match": len(srows) == len(orows),
            "schema_match": sorted(scols) == sorted(ocols),
            "hash_match": not problems,
            "spark_rows": len(srows),
            "oracle_rows": len(orows),
            "err": "; ".join(problems) or None,
        }
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"[FAIL] {name}: {'; '.join(problems)}")
        else:
            print(f"[ok] {name}: {len(srows)} rows")

    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "results": results}, f, indent=1)
        print(f"wrote {json_out} ({len(results)} entries)")
    print(f"\n{len(failures)} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
