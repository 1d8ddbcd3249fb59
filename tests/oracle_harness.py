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


def _pd_rows(pdf, cols):
    """Serialize a pandas frame dtype-faithfully: ints stay ints, floats stay
    floats. This mirrors the driver's hash gate, where a DuckDB HUGEINT
    aggregate lands as float64 and hashes differently from Spark's int64
    even when values are numerically equal."""
    out = []
    for rec in pdf[cols].itertuples(index=False, name=None):
        row = []
        for v in rec:
            if hasattr(v, "item"):  # numpy scalar -> python, preserving kind
                v = v.item()
            row.append(norm_cell(v))
        out.append(tuple(row))
    return out


def compare(spark_df, duck_pdf):
    s_cols = sorted(spark_df.columns)
    d_cols = sorted(duck_pdf.columns)
    if s_cols != d_cols:
        return f"SCHEMA MISMATCH spark={s_cols} duck={d_cols}"
    s_pdf = spark_df.toPandas()
    s_rows = _pd_rows(s_pdf, s_cols)
    d_rows = _pd_rows(duck_pdf, s_cols)
    if len(s_rows) != len(d_rows):
        return f"ROWCOUNT MISMATCH spark={len(s_rows)} duck={len(d_rows)}"
    if sorted(map(repr, s_rows)) != sorted(map(repr, d_rows)):
        sa, da = sorted(map(repr, s_rows)), sorted(map(repr, d_rows))
        diffs = [(a, b) for a, b in zip(sa, da) if a != b][:3]
        return f"VALUE MISMATCH first_diffs={diffs}"
    return None


def duck_connection(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def iter_results(spark, sf_dir: str, only: set[str] | None = None):
    """Yield (name, status, detail): status in {'ok','rows','fail'}."""
    import __spark_entry__ as entrymod

    con = duck_connection(sf_dir)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            n = df.count()
        except Exception as e:  # noqa: BLE001
            yield name, "fail", f"spark error {str(e)[:300]}"
            continue
        if name not in oracles:
            yield name, "rows", f"{n} rows (no oracle by design)"
            continue
        try:
            duck_pdf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            yield name, "fail", f"duckdb error {str(e)[:300]}"
            continue
        err = compare(df, duck_pdf)
        if err:
            yield name, "fail", err
        else:
            yield name, "ok", f"{n} rows match"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from bodhium_webscrapper_spark.session import build_session

    spark = build_session("local[4]", "oracle_harness", shuffle_partitions=4)
    failures = 0
    for name, status, detail in iter_results(spark, sf_dir, only):
        tag = {"ok": "OK   ", "rows": "ROWS ", "fail": "FAIL "}[status]
        print(f"{tag} {name}: {detail}")
        failures += status == "fail"
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
