"""Driver-scale float stress (VERDICT r03 item 7): synthesize tables
with ~10^6-row denominators, then run every float-emitting registry
query through the FULL-precision oracle compare (check_oracle --exact).

At local scale factors, ratio denominators are 10^2-10^3 and a
Spark-vs-DuckDB rounding ulp on the 6th decimal is astronomically
unlikely to surface; at driver-scale denominators the true ratio lands
on rounding boundaries far more often. This harness makes that regime
locally testable: deterministic 10^6-row documents/events (+ the small
embeddings table copied through) written once to parquet, then the
standard harness in --exact mode.

Usage:
  python tools/float_stress.py [--rows 1000000] [--out DIR] [query ...]
With no query names it auto-selects every registry entry that (a) only
reads documents/events/embeddings and (b) emits a double column at
sf0.001 — the float-surface sweep the verdict asked for.
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMALL_SF = "/root/testdata/sf0.001"


def synth(out_dir: str, rows: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    # documents: deterministic pseudo-text with realistic lang/source
    # mixes; n_chars consistent with text
    con.execute(f"""
      COPY (
        SELECT i AS doc_id,
          'the quick w' || CAST(i % 977 AS VARCHAR) || ' scan sort '
            || repeat('tok' || CAST(i % 53 AS VARCHAR) || ' ',
                      1 + (i % 7)) AS text,
          ['en','en','en','de','fr','es','zh','ru'][1 + i % 8] AS lang,
          'src' || CAST(i % 20 AS VARCHAR) AS source,
          length('the quick w' || CAST(i % 977 AS VARCHAR)
                 || ' scan sort '
                 || repeat('tok' || CAST(i % 53 AS VARCHAR) || ' ',
                           1 + (i % 7))) AS n_chars
        FROM range({rows}) t(i)
      ) TO '{out_dir}/documents.parquet' (FORMAT PARQUET)
    """)
    # events: ~10^6 rows, skewed types, deterministic values incl.
    # non-positives (benford exclusion path) and json props drift
    con.execute(f"""
      COPY (
        SELECT i AS event_id,
          TIMESTAMP '2024-01-01 00:00:00'
            + INTERVAL (i % 5184000) SECOND AS ts,
          i % 9973 AS user_id,
          ['view','view','view','click','purchase','error',
           'signup','search'][1 + i % 8] AS event_type,
          CASE WHEN i % 97 = 0 THEN 0.0
               ELSE CAST((i * 37) % 4999 AS DOUBLE) / 10.0 + 1.0
               END AS value,
          '{{"k": ' || CAST(i % 100 AS VARCHAR) || '}}' AS props
        FROM range({rows}) t(i)
      ) TO '{out_dir}/events.parquet' (FORMAT PARQUET)
    """)
    shutil.copy(f"{SMALL_SF}/embeddings.parquet",
                f"{out_dir}/embeddings.parquet")


def select_float_queries() -> list[str]:
    """Registry entries that read only documents/events/embeddings and
    emit a double/float column at sf0.001."""
    import __spark_entry__ as em
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    qs, oracles = em.queries(), em.oracle_sql()
    picked = []
    for name, fn in qs.items():
        if name not in oracles:
            continue
        o = oracles[name].lower()
        others = ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem")
        if any(f"from {t}" in o or f"join {t}" in o for t in others):
            continue
        try:
            df = fn(spark, SMALL_SF)
            if any(f.dataType.typeName() in ("double", "float")
                   for f in df.schema.fields):
                picked.append(name)
        except Exception:
            continue
    return picked


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--out", default="/tmp/tokenkit_stress_sf")
    ap.add_argument("--limit", type=int, default=0,
                    help="cap the auto-selected query list")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()
    if not os.path.exists(f"{args.out}/documents.parquet"):
        print(f"synthesizing {args.rows}-row tables -> {args.out}")
        synth(args.out, args.rows)
    names = args.queries or select_float_queries()
    if args.limit:
        names = names[: args.limit]
    print(f"stress-checking {len(names)} float-emitting queries "
          f"at {args.rows} rows, FULL float precision")
    r = subprocess.run(
        [sys.executable, "tools/check_oracle.py", "--json",
         f"{args.out}/stress_results.json", "--exact", args.out] + names,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    sys.exit(r.returncode)


if __name__ == "__main__":
    main()
