"""Structured Streaming variants of the frontier's stateful pieces.

The batch wave loop (plans/frontier.py) is the authoritative engine — the
north rule demands deterministic global crawl ordering, which a streaming
topology cannot guarantee across micro-batches. But three reference
behaviors are stateful-streaming shaped (SURVEY.md §2.8), and a production
deployment would run the *ingest* side (new WARC drops landing in the pages
table) as a stream. This module provides those pieces:

- ``stream_pages``       — file-source stream over the pages layout
- ``stream_dedup_urls``  — URL-seen as ``dropDuplicatesWithinWatermark``
                           (the streaming analogue of the reference's
                           in-memory seen set, app.py:376-390)
- ``stream_per_host_budget`` — politeness budget as a custom stateful
                           operator via ``applyInPandasWithState`` (at most
                           k URLs per host per micro-batch epoch)
- ``host_rate_metrics``  — event-time windowed per-host fetch-rate rollup
                           (streaming analogue of CrawlMetrics, app.py:74-82)

All testable with ``trigger(availableNow=True)`` + memory sink — no network.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("url_hash", T.LongType()),
    ]
)


def stream_pages(spark: SparkSession, path: str, max_files_per_trigger: int = 8) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def stream_dedup_urls(pages: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming URL dedup: state is bounded by the watermark — the
    streaming twin of the seen-set anti-join (exactly-once per url_hash
    within the watermark horizon)."""
    return (
        pages.withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["url_hash"])
    )


_BUDGET_STATE_SCHEMA = T.StructType([T.StructField("taken", T.IntegerType())])
_BUDGET_OUT_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("url_hash", T.LongType()),
    ]
)


def stream_per_host_budget(
    urls: DataFrame, budget: int, host_col: str = "host"
) -> DataFrame:
    """Politeness budget as a custom stateful streaming operator.

    State per host = how many URLs were admitted so far; each micro-batch
    admits rows until the running count reaches ``budget``. Admission order
    inside a batch is made deterministic by sorting on (priority-free)
    url_hash — streaming cannot promise cross-batch global order, which is
    why the batch wave loop remains authoritative for the crawl-order
    contract.
    """

    def admit(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        taken = state.get[0] if state.exists else 0
        room = max(0, budget - taken)
        if room == 0:
            # budget exhausted: don't materialize/sort the group at all
            # (a mega-host would otherwise pay O(group log group) per epoch
            # to admit nothing)
            state.update((taken,))
            return
        # a host's micro-batch rows may span several Arrow chunks; sorting
        # each chunk independently would make admission depend on chunk
        # boundaries. Keep a RUNNING top-`room` selection across chunks
        # (stable mergesort keeps ties deterministic): memory stays bounded
        # at room + one chunk, so a mega-host group of millions of rows in
        # one epoch cannot OOM the python worker, while the result is
        # identical to sorting the whole concatenated group.
        chunks = [pdfs] if isinstance(pdfs, pd.DataFrame) else pdfs
        best = None
        for chunk in chunks:
            pool = chunk if best is None else pd.concat([best, chunk])
            best = pool.sort_values("url_hash", kind="mergesort").head(room)
        admitted = best if best is not None else pd.DataFrame()
        taken += len(admitted)
        state.update((taken,))
        if len(admitted):
            yield admitted[["host", "url", "url_hash"]]

    return urls.groupBy(host_col).applyInPandasWithState(
        admit,
        outputStructType=_BUDGET_OUT_SCHEMA,
        stateStructType=_BUDGET_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def host_rate_metrics(
    pages: DataFrame, window: str = "1 minute", watermark: str = "5 minutes"
) -> DataFrame:
    """Event-time windowed per-host rollup: fetches + bytes per host/window
    (the streaming CrawlMetrics table; late rows handled by the watermark)."""
    host = F.parse_url(F.col("url"), F.lit("HOST"))
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), host.alias("host"))
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum(F.length("html")).alias("bytes"),
        )
        .select("w.start", "w.end", "host", "n_pages", "bytes")
    )
