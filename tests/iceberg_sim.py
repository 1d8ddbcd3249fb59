"""Executable simulation of the Iceberg SQL/catalog surface
``IcebergSnapshotStore`` uses — so the store's REAL code (every
create/DELETE+append/MERGE/metadata-query line) runs end-to-end in a
sandbox with no ``iceberg-spark-runtime`` jar.

What is simulated is exactly the engine boundary a real Iceberg catalog
provides, with REAL effects on a parquet warehouse:

  - ``spark.catalog.tableExists``        → sim table registry
  - ``df.writeTo(tbl).create()/append()``→ parquet write partitioned by
    ``_wave_part`` into ``<warehouse>/<tbl>`` (patched at the DataFrame
    method, the only store call the session proxy cannot see)
  - ``DELETE FROM t WHERE _wave_part=N`` → partition directory drop
  - ``SELECT ... FROM t.partitions/.files`` → parquet footer / os.stat
    walks of the partition dir (what Iceberg answers from manifests)
  - ``MERGE INTO job_manifest``          → row-level upsert by job_id
  - ``CALL ...rewrite_data_files``       → recorded no-op (maintenance)

Everything else (``spark.read.parquet``, ``createDataFrame``, DataFrame
ops) passes through to the real session, so CrawlJob's dataflow is the
real engine. Every intercepted call is recorded in ``ops`` so tests can
diff the store's call-sequence against the shim's filesystem effects.
"""

from __future__ import annotations

import os
import re
import shutil
from contextlib import contextmanager


class _Result:
    """Minimal stand-in for the DataFrame a metadata query returns."""

    def __init__(self, rows):
        self._rows = rows

    def first(self):
        return self._rows[0] if self._rows else None

    def collect(self):
        return list(self._rows)

    def count(self):
        return len(self._rows)


class _FakeCatalog:
    def __init__(self, sim):
        self._sim = sim

    def tableExists(self, name: str) -> bool:
        if name in self._sim.tables:
            return True
        if name.startswith(self._sim.prefix):
            return False
        return self._sim.real.catalog.tableExists(name)


class _FakeReader:
    def __init__(self, sim):
        self._sim = sim

    def table(self, name: str):
        sim = self._sim
        if name in sim.tables:
            d = sim.table_dir(name)
            os.makedirs(d, exist_ok=True)
            return sim.real.read.schema(sim.tables[name]).parquet(d)
        return sim.real.read.table(name)

    def __getattr__(self, attr):
        return getattr(self._sim.real.read, attr)


class _FakeWriterV2:
    def __init__(self, sim, df, table):
        self._sim, self._df, self._table = sim, df, table

    def using(self, _fmt):
        return self

    def partitionedBy(self, *_cols):
        return self

    def create(self):
        sim, tbl = self._sim, self._table
        sim.tables[tbl] = self._df.schema
        sim.ops.append(("create", tbl))
        self._write("overwrite")

    def append(self):
        self._sim.ops.append(("append", self._table))
        self._write("append")

    def _write(self, mode):
        w = self._df.write.mode(mode)
        if "_wave_part" in self._df.columns:
            w = w.partitionBy("_wave_part")
        w.parquet(self._sim.table_dir(self._table))
        self._sim.tables.setdefault(self._table, self._df.schema)


_DELETE_RE = re.compile(r"DELETE FROM (\S+) WHERE _wave_part = (\d+)")
_PART_RE = re.compile(
    r"SELECT (.+) FROM (\S+)\.(partitions|files)\s+"
    r"WHERE partition\._wave_part = (\d+)"
)
_CALL_RE = re.compile(r"CALL (\S+)\.system\.rewrite_data_files\(table => '([^']+)'\)")
_MERGE_RE = re.compile(r"MERGE INTO (\S+) t USING (\S+) s")
_CREATE_TBL_RE = re.compile(r"CREATE TABLE IF NOT EXISTS (\S+)\s*\((.+)\) USING iceberg")


class FakeIcebergSpark:
    """Session proxy: intercepts the Iceberg surface, delegates the rest."""

    def __init__(self, real, warehouse: str, prefix: str = "ice."):
        self.real = real
        self.warehouse = warehouse
        self.prefix = prefix
        self.tables: dict = {}  # name -> StructType
        self.ops: list[tuple] = []
        self.catalog = _FakeCatalog(self)

    @property
    def read(self):
        return _FakeReader(self)

    def table_dir(self, name: str) -> str:
        return os.path.join(self.warehouse, name.replace(".", "__"))

    def _part_dir(self, tbl: str, wave: int) -> str:
        return os.path.join(self.table_dir(tbl), f"_wave_part={wave}")

    def _part_files(self, tbl: str, wave: int) -> list[str]:
        d = self._part_dir(tbl, wave)
        if not os.path.isdir(d):
            return []
        return sorted(
            os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
        )

    # ---- the SQL surface the store issues --------------------------------
    def sql(self, q: str):
        import pyarrow.parquet as pq

        q = " ".join(q.split())
        if q.startswith("CREATE NAMESPACE"):
            return _Result([])
        m = _CREATE_TBL_RE.match(q)
        if m:
            tbl, cols = m.group(1), m.group(2)
            if tbl not in self.tables:
                from pyspark.sql.types import StructType

                ddl = ", ".join(
                    " ".join(c.strip().split()) for c in cols.split(",")
                )
                self.tables[tbl] = StructType.fromDDL(ddl)
                os.makedirs(self.table_dir(tbl), exist_ok=True)
                self.ops.append(("create_table_sql", tbl))
            return _Result([])
        m = _DELETE_RE.match(q)
        if m:
            tbl, wave = m.group(1), int(m.group(2))
            self.ops.append(("delete_partition", tbl, wave))
            shutil.rmtree(self._part_dir(tbl, wave), ignore_errors=True)
            return _Result([])
        m = _PART_RE.match(q)
        if m:
            sel, tbl, meta, wave = m.group(1), m.group(2), m.group(3), int(m.group(4))
            files = self._part_files(tbl, wave)
            if meta == "partitions":
                if sel.strip() == "1":  # has_artifact probe
                    return _Result([(1,)] if files else [])
                total = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
                return _Result([(total if files else None,)])
            # .files metadata
            rows = [
                (pq.ParquetFile(f).metadata.num_rows, os.path.getsize(f))
                for f in files
            ]
            if "sum(file_size_in_bytes)" in sel:
                return _Result([(sum(r[1] for r in rows) if rows else None,)])
            return _Result(rows)
        m = _CALL_RE.match(q)
        if m:
            self.ops.append(("rewrite_data_files", m.group(2)))
            return _Result([])
        m = _MERGE_RE.match(q)
        if m:
            tbl, src = m.group(1), m.group(2)
            self.ops.append(("merge", tbl))
            updates = {
                r["job_id"]: r["payload"] for r in self.real.table(src).collect()
            }
            current = {
                r["job_id"]: r["payload"]
                for r in _FakeReader(self).table(tbl).collect()
            }
            current.update(updates)
            df = self.real.createDataFrame(
                list(current.items()), "job_id string, payload string"
            )
            d = self.table_dir(tbl)
            tmp = d + ".tmp"
            df.write.mode("overwrite").parquet(tmp)
            shutil.rmtree(d, ignore_errors=True)
            os.rename(tmp, d)
            return _Result([])
        return self.real.sql(q)

    def __getattr__(self, attr):  # createDataFrame, conf, sparkContext, ...
        return getattr(self.real, attr)


@contextmanager
def patched_write_to(sim: FakeIcebergSpark):
    """Route ``DataFrame.writeTo`` (the one store call that bypasses the
    session object) into the simulated warehouse for the duration. The
    patch targets the CLASSIC DataFrame class — ``pyspark.sql.DataFrame``
    is a dispatch shim in Spark 4 and instances resolve methods on the
    classic class."""
    try:
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # pre-4.0 layout
        from pyspark.sql import DataFrame

    orig = DataFrame.writeTo

    def fake(df, table):
        return _FakeWriterV2(sim, df, table)

    DataFrame.writeTo = fake
    try:
        yield
    finally:
        DataFrame.writeTo = orig
