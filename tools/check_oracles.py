"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` in DuckDB at sf0.01,
compare row count, column names, and an order-insensitive value hash.

Usage: PYTHONPATH=/root/repo python tools/check_oracles.py [sf_dir] [names...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb

sys.path.insert(0, "/root/repo")

from __spark_entry__ import oracle_sql, queries  # noqa: E402

from shacl_validator_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        return f"{v:.6g}"
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def table_hash(rows: list[tuple], cols: list[str]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = queries()
    oracles = oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR {type(e).__name__}: {e}"))
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"okro {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = [c.lower() for c in rel.columns]
            drows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        scols_l = [c.lower() for c in scols]
        if sorted(scols_l) != sorted(dcols):
            failures.append((name, f"schema {scols_l} vs {dcols}"))
            print(f"FAIL {name}: schema {scols_l} vs {dcols}")
            continue
        if len(srows) != len(drows):
            failures.append((name, f"rows {len(srows)} vs {len(drows)}"))
            print(f"FAIL {name}: rows {len(srows)} vs {len(drows)}")
            continue
        sh = table_hash(srows, scols_l)
        dh = table_hash(drows, dcols)
        if sh != dh:
            failures.append((name, "value hash mismatch"))
            print(f"FAIL {name}: value hash mismatch ({len(srows)} rows)")
            # show a small diff
            order_s = sorted(range(len(scols_l)), key=lambda i: scols_l[i])
            order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
            s_set = {"|".join(norm_cell(r[i]) for i in order_s) for r in srows}
            d_set = {"|".join(norm_cell(r[i]) for i in order_d) for r in drows}
            print("  cols:", [scols_l[i] for i in order_s])
            print("  only-spark:", sorted(s_set - d_set)[:3])
            print("  only-duck :", sorted(d_set - s_set)[:3])
        else:
            print(f"OK   {name}: {len(srows)} rows hash={sh}")
    print(f"\n{len(failures)} failures")
    for n, msg in failures:
        print(" -", n, msg)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
