"""Local harness mimicking the driver's correctness gate: run each
queries() entry on Spark and its oracle_sql() twin on DuckDB, compare
row-count, column names, an order-insensitive FULL-PRECISION value
multiset, AND per-column dtypes.

The round-4 driver gate failed 32 queries whose oracle emitted DuckDB
HUGEINT (Arrow decimal128(38,0)) for integer sum() while Spark emitted
BIGINT (int64) -- the values were equal as Python scalars, so the old
value-normalizing comparison here could never see it.  This version
compares the DuckDB result via .arrow() dtype-for-dtype against the
Spark schema (both mapped to a canonical type string) and fails on any
divergence, making the local harness a faithful reproduction of the
driver's dtype-sensitive value hash.

Usage: python tools/check_oracle.py [--json OUT.json] [--round6]
       [sf_dir] [query_name ...]

--round6 relaxes float comparison to 6-dp rounding (the default is
full-precision / bit-exact, matching the driver).

With --json, writes a machine-readable result file in the driver's
CORRECTNESS_r{N}.json per-query format plus a `dtype_diff` field
(col -> [duckdb_canonical, spark_canonical]) for every divergent
column -- tools/gen_oracle_casts.py consumes this to generate the
cast map applied by __spark_entry__.oracle_sql().
"""

import json
import os
import sys
from collections import Counter

import duckdb
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


EXACT = True


def canon_arrow(t: pa.DataType) -> str:
    """Canonical type string for a pyarrow DataType (DuckDB side)."""
    if pa.types.is_int64(t):
        return "bigint"
    if pa.types.is_int32(t):
        return "int"
    if pa.types.is_int16(t):
        return "smallint"
    if pa.types.is_int8(t):
        return "tinyint"
    if pa.types.is_unsigned_integer(t):
        return f"u{t}"
    if pa.types.is_float64(t):
        return "double"
    if pa.types.is_float32(t):
        return "float"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"array<{canon_arrow(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(
            f"{t.field(i).name}:{canon_arrow(t.field(i).type)}"
            for i in range(t.num_fields)
        )
        return f"struct<{inner}>"
    if pa.types.is_map(t):
        return f"map<{canon_arrow(t.key_type)},{canon_arrow(t.item_type)}>"
    if pa.types.is_null(t):
        return "null"
    return str(t)


def canon_spark(dt) -> str:
    """Canonical type string for a Spark DataType."""
    s = dt.simpleString()
    # simpleString already yields bigint/int/double/string/boolean/date/
    # timestamp/decimal(p,s)/array<...>/struct<...>; normalize spacing.
    # timestamp_ntz and timestamp both materialize as naive datetimes
    # through pandas/DuckDB, so they are hash-equivalent.
    return s.replace(" ", "").replace("timestamp_ntz", "timestamp")


def norm_val(v):
    if isinstance(v, float):
        return v if EXACT else round(v, 6)
    import decimal

    if isinstance(v, decimal.Decimal):
        return float(v) if EXACT else round(float(v), 6)
    if isinstance(v, list):
        return tuple(norm_val(x) for x in v)
    return v


def rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(norm_val(r[i]) for i in order) for r in rows)


def arrow_to_rows(tbl: pa.Table):
    cols = tbl.schema.names
    pydict = tbl.to_pydict()
    n = tbl.num_rows
    return cols, [tuple(pydict[c][i] for c in cols) for i in range(n)]


def main():
    global EXACT
    argv = sys.argv[1:]
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    if argv and argv[0] == "--round6":
        EXACT = False
        argv = argv[1:]
    if argv and argv[0] == "--exact":  # legacy flag, now the default
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
            stypes = {f.name: canon_spark(f.dataType) for f in sdf.schema.fields}
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "spark_rows": None,
                             "oracle_rows": None, "err": f"SPARK ERROR: {e}"}
            print(f"[FAIL-spark] {name}: {e}", flush=True)
            continue
        if name not in oracles:
            results[name] = {"rows_match": None, "schema_match": None,
                             "hash_match": None, "spark_rows": len(srows),
                             "oracle_rows": None, "err": None,
                             "rows_only": True}
            print(f"[rows-only] {name}: {len(srows)} rows, cols={scols}",
                  flush=True)
            continue
        try:
            tbl = con.execute(oracles[name]).arrow()
            ocols, orows = arrow_to_rows(tbl)
            otypes = {f.name: canon_arrow(f.type) for f in tbl.schema}
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "spark_rows": len(srows),
                             "oracle_rows": None, "err": f"DUCKDB ERROR: {e}"}
            print(f"[FAIL-duckdb] {name}: {e}", flush=True)
            continue
        problems = []
        dtype_diff = {}
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        else:
            for c in scols:
                st, ot = stypes.get(c), otypes.get(c)
                # DuckDB has no spark 'float'; treat void/null specially
                if st != ot and not (ot == "null" and len(orows) == 0):
                    dtype_diff[c] = [ot, st]
            if dtype_diff:
                problems.append(
                    "dtype diff (oracle vs spark): "
                    + "; ".join(f"{c}: {v[0]} vs {v[1]}"
                                for c, v in dtype_diff.items()))
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
        if dtype_diff:
            results[name]["dtype_diff"] = dtype_diff
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"[FAIL] {name}: {'; '.join(problems)}", flush=True)
        else:
            print(f"[ok] {name}: {len(srows)} rows", flush=True)

    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "results": results}, f, indent=1)
        print(f"wrote {json_out} ({len(results)} entries)")
    print(f"\n{len(failures)} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
