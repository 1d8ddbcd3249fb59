"""Iceberg-backed SnapshotStore: the production twin of the parquet shim.

The wave-loop state contract (SURVEY §2.8 / plans/checkpoint.py) maps onto
Iceberg as follows — this module IS that mapping, runnable as soon as an
``iceberg-spark-runtime`` jar is on the classpath (none ships in this
sandbox; the e2e test in tests/test_iceberg_store.py self-skips without it):

| shim concept                         | Iceberg concept                     |
|--------------------------------------|-------------------------------------|
| per-wave artifact directory          | wave-partitioned table, one table   |
|                                      | per artifact name                   |
| idempotent wave re-write after crash | ``overwritePartitions()`` of the    |
|                                      | wave's partition (atomic snapshot)  |
| manifest.json committed_wave marker  | single-row ``job_manifest`` table,  |
|                                      | replaced atomically per commit      |
| parquet-footer row_count             | ``<table>.partitions`` metadata     |
|                                      | table record_count (metadata-only)  |
| read_deltas union of wave dirs       | one table scan with a pruned        |
|                                      | ``_wave_part <= k`` predicate       |
| LSM delta compaction                 | unnecessary for reads (single       |
|                                      | table); file-level compaction is    |
|                                      | ``rewrite_data_files`` maintenance  |
| fetch-join bucket layout             | ``bucket(N, url_hash)`` partition   |
|                                      | transform on the pages table →      |
|                                      | storage-partitioned join            |

``column_sum`` runs as a column-pruned Spark aggregate (Iceberg keeps
min/max per file but not sums); on a cluster this scans one int column of
one partition — the same order of cost as the shim's local pyarrow read,
without the local-filesystem assumption. ``partition_metrics`` and
``artifact_bytes`` come from the ``.files`` metadata table (record_count /
file_size_in_bytes per data file) — metadata-only, like the shim's footer
reads.

Usage:
    spark = build_session(extra_conf=iceberg_conf("local", "build/iceberg_wh"))
    store = IcebergSnapshotStore(spark, "local", "crawl_ckpt")
    job = CrawlJob(spark, pages, seeds, robots, cfg, checkpoint_dir="unused",
                   store=store)
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WAVE_COL = "_wave_part"


def iceberg_conf(catalog: str = "local", warehouse: str = "build/iceberg_wh") -> dict:
    """Session conf wiring a Hadoop-type Iceberg catalog (the spark-submit
    entry point: pass to ``build_session(extra_conf=...)``). Requires the
    matching ``iceberg-spark-runtime`` jar on the classpath (e.g.
    ``spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>``).
    """
    return {
        f"spark.sql.catalog.{catalog}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        ),
    }


def has_iceberg_runtime(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime classes are loadable in this JVM."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


class IcebergSnapshotStore:
    """SnapshotStore-compatible backend over an Iceberg namespace.

    Same interface as plans.checkpoint.SnapshotStore (write/read/row_count/
    column_sum/read_deltas/has_artifact/manifest/committed_wave/commit_wave/
    compact_deltas/write_rows/partition_metrics/artifact_bytes); CrawlJob
    takes it via the ``store=`` seam.
    """

    def __init__(self, spark: SparkSession, catalog: str, namespace: str,
                 job_id: str = "crawl"):
        self.spark = spark
        self.ns = f"{catalog}.{namespace}"
        self.job_id = job_id
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {self.ns}")
        self._manifest_tbl = f"{self.ns}.job_manifest"
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {self._manifest_tbl} "
            "(job_id STRING, payload STRING) USING iceberg"
        )

    # ---- naming -----------------------------------------------------------
    def _tbl(self, name: str) -> str:
        return f"{self.ns}.{name}"

    def wave_dir(self, wave: int, name: str) -> str:
        """Identifier of the wave's artifact (table + partition literal);
        informational only — no filesystem semantics here."""
        return f"{self._tbl(name)}/{WAVE_COL}={wave}"

    # ---- write/read -------------------------------------------------------
    def write(self, wave: int, name: str, df: DataFrame) -> str:
        out = df.withColumn(WAVE_COL, F.lit(wave))
        tbl = self._tbl(name)
        if not self.spark.catalog.tableExists(tbl):
            out.writeTo(tbl).using("iceberg").partitionedBy(WAVE_COL).create()
        else:
            # idempotent wave re-commit after a crash. NOT overwritePartitions:
            # that replaces only partitions PRESENT in the new data, so a
            # re-run that now produces zero rows for this artifact would
            # leave the crashed attempt's rows visible (diverging from the
            # shim's rmtree+rewrite). The explicit partition DELETE is a
            # metadata-only drop of the wave's data files; delete and append
            # are two atomic snapshots, and the window between them is
            # invisible to readers because wave visibility is gated on the
            # manifest commit, not on table contents.
            self.spark.sql(f"DELETE FROM {tbl} WHERE {WAVE_COL} = {wave}")
            out.writeTo(tbl).append()
        return tbl

    def write_rows(self, wave: int, name: str, table) -> str:
        """Small driver-side pyarrow table (metrics/lineage/pending rows),
        ingested as Arrow directly (Spark 4 ``createDataFrame(pa.Table)``)
        — a pandas round-trip would mangle the lineage ``map`` column
        (pandas renders maps as tuple lists, which MapType ingestion
        rejects; caught by the executable-sim e2e in
        tests/test_iceberg_store.py)."""
        df = self.spark.createDataFrame(table)
        return self.write(wave, name, df)

    def read(self, spark: SparkSession, wave: int, name: str) -> DataFrame:
        return (
            spark.read.table(self._tbl(name))
            .filter(F.col(WAVE_COL) == wave)
            .drop(WAVE_COL)
        )

    def read_deltas(self, spark: SparkSession, name: str, upto_wave: int) -> DataFrame | None:
        if not spark.catalog.tableExists(self._tbl(name)):
            return None
        # ONE partition-pruned scan replaces the shim's union of wave dirs —
        # the reason compact_deltas is a read-path no-op here
        return (
            spark.read.table(self._tbl(name))
            .filter(F.col(WAVE_COL) <= upto_wave)
            .drop(WAVE_COL)
        )

    def has_artifact(self, wave: int, name: str) -> bool:
        if not self.spark.catalog.tableExists(self._tbl(name)):
            return False
        return (
            self.spark.sql(
                f"SELECT 1 FROM {self._tbl(name)}.partitions "
                f"WHERE partition.{WAVE_COL} = {wave} LIMIT 1"
            ).count()
            > 0
        )

    # ---- zero-scan / cheap statistics --------------------------------------
    def row_count(self, wave: int, name: str) -> int:
        """Metadata-only: the Iceberg ``partitions`` metadata table carries
        record_count per partition — the exact analogue of the shim's
        parquet-footer read."""
        r = self.spark.sql(
            f"SELECT sum(record_count) FROM {self._tbl(name)}.partitions "
            f"WHERE partition.{WAVE_COL} = {wave}"
        ).first()[0]
        return int(r or 0)

    def column_sum(self, wave: int, name: str, col: str) -> int:
        r = (
            self.read(self.spark, wave, name)
            .agg(F.sum(F.col(col)))
            .first()[0]
        )
        return int(r or 0)

    def artifact_bytes(self, wave: int, name: str) -> int:
        """Total on-disk size of the wave partition's data files, from the
        ``.files`` metadata table — metadata-only, no data scan."""
        r = self.spark.sql(
            f"SELECT sum(file_size_in_bytes) FROM {self._tbl(name)}.files "
            f"WHERE partition.{WAVE_COL} = {wave}"
        ).first()[0]
        return int(r or 0)

    def partition_metrics(
        self, wave: int, name: str, bytes_col: str | None = None
    ) -> list[tuple[int, int, int]]:
        """Per-data-file ``(partition_id, rows, bytes)`` from the ``.files``
        metadata table (record_count / file_size_in_bytes) — the Iceberg
        twin of the shim's parquet-footer read. ``bytes`` is the file's
        on-disk size (the ``.files`` column_sizes map is keyed by Iceberg
        field id, which Spark's schema does not expose, so the per-column
        uncompressed proxy the shim reports is approximated file-level here;
        metrics are advisory — see plans.metrics module doc)."""
        rows = self.spark.sql(
            f"SELECT record_count, file_size_in_bytes FROM {self._tbl(name)}.files "
            f"WHERE partition.{WAVE_COL} = {wave} ORDER BY file_path"
        ).collect()
        return [
            (i, int(r[0]), int(r[1]) if bytes_col is not None else 0)
            for i, r in enumerate(rows)
        ]

    # ---- manifest / commit --------------------------------------------------
    def manifest(self) -> dict[str, Any]:
        rows = (
            self.spark.read.table(self._manifest_tbl)
            .filter(F.col("job_id") == self.job_id)
            .collect()
        )
        if not rows:
            return {"committed_wave": -1, "waves": {}}
        return json.loads(rows[0]["payload"])

    def committed_wave(self) -> int:
        return self.manifest()["committed_wave"]

    def commit_wave(self, wave: int, stats: dict[str, Any]) -> None:
        m = self.manifest()
        if wave != m["committed_wave"] + 1:
            raise ValueError(
                f"non-sequential commit: wave={wave}, committed={m['committed_wave']}"
            )
        m["committed_wave"] = wave
        m["waves"][str(wave)] = stats
        from bodhium_webscrapper_spark.plans.checkpoint import CHECKPOINT_FORMAT

        m["format"] = CHECKPOINT_FORMAT
        df = self.spark.createDataFrame(
            [(self.job_id, json.dumps(m))], "job_id string, payload string"
        )
        if self.spark.read.table(self._manifest_tbl).filter(
            F.col("job_id") == self.job_id
        ).isEmpty():
            df.writeTo(self._manifest_tbl).append()
        else:
            # MERGE keeps other jobs' rows; replaces this job's payload
            df.createOrReplaceTempView("_manifest_update")
            self.spark.sql(
                f"MERGE INTO {self._manifest_tbl} t USING _manifest_update s "
                "ON t.job_id = s.job_id "
                "WHEN MATCHED THEN UPDATE SET t.payload = s.payload "
                "WHEN NOT MATCHED THEN INSERT *"
            )

    # ---- maintenance --------------------------------------------------------
    def compact_deltas(self, spark: SparkSession, name: str, upto_wave: int) -> None:
        """Read-path no-op (read_deltas is one pruned table scan, never a
        union of per-wave directories); small-file compaction is Iceberg's
        own maintenance procedure."""
        catalog = self.ns.split(".")[0]
        try:
            spark.sql(
                f"CALL {catalog}.system.rewrite_data_files(table => '{self._tbl(name)[len(catalog) + 1:]}')"
            )
        except Exception:
            pass  # maintenance is best-effort; correctness never depends on it
