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
    urls: DataFrame,
    budget: int,
    host_col: str = "host",
    budget_col: str | None = None,
) -> DataFrame:
    """Politeness budget as a custom stateful streaming operator.

    State per host = how many URLs were admitted so far; each micro-batch
    admits rows until the running count reaches the host's cap. Admission
    order inside a batch is made deterministic by sorting on
    (priority-free) url_hash — streaming cannot promise cross-batch global
    order, which is why the batch wave loop remains authoritative for the
    crawl-order contract.

    ``budget_col``: optional per-row column carrying a host-specific budget
    — e.g. the crawl-delay-derived ``_host_budget`` that
    ``operators.politeness.with_crawl_delay_budget`` attaches (it is a
    stream-static broadcast join + coalesce, so it works unchanged on a
    streaming DataFrame). The effective cap is min(budget, per-host value),
    matching the batch loop's W3 semantics per epoch (parity asserted in
    tests/test_streaming.py).
    """

    def admit(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        taken = state.get[0] if state.exists else 0
        # a host's micro-batch rows may span several Arrow chunks; sorting
        # each chunk independently would make admission depend on chunk
        # boundaries. Keep a RUNNING top-`room` selection across chunks
        # (stable mergesort keeps ties deterministic): memory stays bounded
        # at room + one chunk, so a mega-host group of millions of rows in
        # one epoch cannot OOM the python worker, while the result is
        # identical to sorting the whole concatenated group. The per-host
        # cap (budget_col, constant within the group) is read off the first
        # non-empty chunk; an exhausted budget admits nothing without
        # materializing/sorting the group at all.
        chunks = [pdfs] if isinstance(pdfs, pd.DataFrame) else pdfs
        best = None
        room = None
        for chunk in chunks:
            if room is None:
                if len(chunk) == 0:
                    continue
                cap = budget
                if budget_col is not None:
                    cap = min(budget, int(chunk[budget_col].iloc[0]))
                room = max(0, cap - taken)
                if room == 0:
                    break
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
