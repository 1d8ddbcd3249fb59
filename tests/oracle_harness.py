"""Dev replica of the driver's correctness gate: run each __spark_entry__
query against its DuckDB oracle at a given sf dir and diff values.

Usage: python tests/oracle_harness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        return round(v, 6)
    return v


def compare(spark_df, duck_rows, duck_cols):
    s_cols = sorted(spark_df.columns)
    d_cols = sorted(duck_cols)
    if s_cols != d_cols:
        return f"SCHEMA MISMATCH spark={s_cols} duck={d_cols}"
    s_rows = [tuple(norm_cell(r[c]) for c in s_cols) for r in spark_df.collect()]
    d_idx = [duck_cols.index(c) for c in s_cols]
    d_rows = [tuple(norm_cell(r[i]) for i in d_idx) for r in duck_rows]
    if len(s_rows) != len(d_rows):
        return f"ROWCOUNT MISMATCH spark={len(s_rows)} duck={len(d_rows)}"
    if sorted(map(repr, s_rows)) != sorted(map(repr, d_rows)):
        sa, da = sorted(map(repr, s_rows)), sorted(map(repr, d_rows))
        diffs = [(a, b) for a, b in zip(sa, da) if a != b][:3]
        return f"VALUE MISMATCH first_diffs={diffs}"
    return None


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from bodhium_webscrapper_spark.session import build_session

    spark = build_session("local[4]", "oracle_harness", shuffle_partitions=4)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            n = df.count()
        except Exception as e:
            print(f"FAIL  {name}: spark error {str(e)[:200]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {n} rows (no oracle by design)")
            continue
        try:
            rel = con.sql(oracles[name])
            duck_rows = rel.fetchall()
            duck_cols = list(rel.columns)
        except Exception as e:
            print(f"FAIL  {name}: duckdb error {str(e)[:200]}")
            failures += 1
            continue
        err = compare(df, duck_rows, duck_cols)
        if err:
            print(f"FAIL  {name}: {err}")
            failures += 1
        else:
            print(f"OK    {name}: {n} rows match")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
