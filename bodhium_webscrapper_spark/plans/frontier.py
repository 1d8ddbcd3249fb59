"""Deterministic breadth-first-with-priority crawl wave scheduler.

Re-expresses the reference's strictly sequential per-URL loop
(``/root/reference/app.py:899-1075``: discover → fetch one URL → extract →
sleep(1) → repeat) as an iterative batch dataflow: each *wave* is one pure
DataFrame plan, the only driver-side control flow is the wave loop and
empty-checks (mirroring the reference's source-fallback control flow).

Wave t (every stage a DataFrame; schema of frontier rows:
url_hash, canonical_url, host, depth, priority, retry_count):

  candidates = dedup(frontier_t)   first-wins per url_hash         [A1]
  new        = candidates ANTI-JOIN seen (bloom pre-pass + exact)  [J2]
  gated      = robots_gate(new)                                    [U5]
  scheduled  = per-host top-budget window, host-hash salted        [W1/W3]
               → global wave cap, ordered (priority desc, url_hash)[W2]
  fetched    = pages BROADCAST-JOIN scheduled on url_hash          [J1/S4]
  extracted  = extract_text(html) pandas UDF                       [U1]
  outlinks   = explode(extract_links) → canonicalize → same-host   [U2/P4/P7]
  frontier_{t+1} = outlinks ∪ fetch-misses(retry_count+1)
  commit: order, extracted, seen-delta, frontier, metrics → snapshot

Determinism: scheduling order is a pure function of the data — sort key
(priority DESC, url_hash ASC); no monotonically_increasing_id, no clocks,
no partition-dependent values — so a resume from snapshot replays the exact
remaining order (tested in tests/test_resume.py).

Scale notes (100 TB / 10^10 URLs):
- pages is the huge side and is never shuffled: the fetch join broadcasts
  the (politeness-capped, hence small) wave of scheduled URLs into a
  broadcast-hash-join probe of pages. On Iceberg, pages would be bucketed by
  ``bucket(N, url_hash)`` making this storage-partitioned even for giant
  waves.
- the seen anti-join sees only bloom positives (vectorized pre-filter).
- the politeness window is salted two-phase top-k → no mega-host straggler.
- state (seen/frontier) is read back from the snapshot each wave, keeping
  every wave's plan O(1) and lineage flat (no iterative plan blow-up).
- seen is append-only deltas; wave commits are idempotent (crash-safe).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bodhium_webscrapper_spark.functions.canonicalize import with_canonical_url
from bodhium_webscrapper_spark.functions.extract import extract_page_udf
from bodhium_webscrapper_spark.operators.politeness import (
    per_host_budget,
    with_crawl_delay_budget,
)
from bodhium_webscrapper_spark.operators.robots import robots_gate
from bodhium_webscrapper_spark.operators.seen import seen_anti_join
from bodhium_webscrapper_spark.plans.checkpoint import SnapshotStore
from bodhium_webscrapper_spark.plans.metrics import footer_metrics, lineage_rows_table

FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("url_hash", T.LongType()),
        T.StructField("canonical_url", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("priority", T.DoubleType()),
        T.StructField("retry_count", T.IntegerType()),
    ]
)
SEEN_SCHEMA = T.StructType(
    [
        T.StructField("url_hash", T.LongType()),
        T.StructField("url", T.StringType()),
    ]
)


@dataclass
class CrawlConfig:
    """Politeness budget fixture (FIXTURES.md §4; analogue of MAX_URLS=100
    at app.py:303 and the 1 s pacing at app.py:973-974)."""

    max_urls_per_host_per_wave: int = 10
    max_waves: int = 6
    global_wave_limit: int | None = 5000  # None/0 = politeness-only capping
    max_retries: int = 2
    # W3: nominal wave duration used to convert a host's robots
    # crawl_delay_ms into a reduced per-wave budget
    # (budget_host = min(budget, max(1, wave_period_ms // crawl_delay_ms)))
    wave_period_ms: int = 10_000
    # NOTE on capping semantics: URLs cut by the per-host budget or the
    # global wave limit are DROPPED, not deferred — they re-enter only if
    # rediscovered via a later page's outlinks. This mirrors the reference's
    # MAX_URLS=100 hard cap (app.py:303), which likewise discards the
    # overflow rather than queueing it.
    salt_buckets: int = 16
    # compact the scheduled/seen deltas every K committed waves (0 = off):
    # bounds read_deltas at (1 base + K tail dirs) for long crawls — at
    # hundreds of waves the per-wave anti-join otherwise unions hundreds of
    # small-file directories. Amortized O(seen)/K rewrite per wave.
    compact_seen_every: int = 0
    use_bloom: bool = True
    bloom_buckets: int = 64
    bloom_capacity: int = 4_000_000  # fixed-width blobs -> OR-mergeable deltas
    # attr-join broadcast cutover: above this the narrow wave attributes
    # join the extraction output via shuffle instead of broadcast — the
    # broadcast build is driver-serial (~100 B/row: 250k rows ≈ 25 MB) and
    # measured slower than the scalable shuffle from ~500k rows up
    broadcast_wave_threshold: int = 250_000
    seen_broadcast_threshold: int = 4_000_000  # below: broadcast anti-join, no bloom
    salt_activation_threshold: int = 2_000_000  # salt only when frontier is huge
    same_host_only: bool = True  # app.py:497 exclude_external_links
    priority_decay: float = 0.5
    verify_extraction: bool = False  # assert byte-identical text vs golden


@dataclass
class WaveStats:
    wave: int
    candidates: int
    deduped: int
    scheduled: int
    fetched: int
    misses: int
    outlinks: int
    seconds: float = field(default=0.0)


class CrawlJob:
    def __init__(
        self,
        spark: SparkSession,
        pages_path: str,
        seeds: DataFrame,
        robots: DataFrame | None,
        config: CrawlConfig,
        checkpoint_dir: str,
        job_id: str = "crawl",
    ):
        self.spark = spark
        self.config = config
        self.store = SnapshotStore(checkpoint_dir)
        self.job_id = job_id
        self.seeds = seeds
        self.robots = robots
        self._resumed_at = -1  # set by run(resume=True); lineage marker
        # wave-invariant politeness artifacts, computed once and persisted:
        # re-aggregating rules/delays from the raw robots table every wave
        # was a repeated serial broadcast-build cost in the schedule stage
        self._rules = None
        self._budgets = None
        if robots is not None:
            from bodhium_webscrapper_spark.operators.politeness import host_budget_map
            from bodhium_webscrapper_spark.operators.robots import flatten_rules

            self._rules = flatten_rules(robots).persist()
            if "crawl_delay_ms" in robots.columns:
                self._budgets = host_budget_map(
                    robots, config.max_urls_per_host_per_wave, config.wave_period_ms
                ).persist()
        # column pruning: the fetch join needs only key + payload (+ golden
        # text when verifying) — never lang/warc_ts
        cols = ["url_hash", "url", "html"] + (["text"] if config.verify_extraction else [])
        self.pages = spark.read.parquet(pages_path).select(*cols)

    # ---- wave-0 frontier from seeds (reference discovery, app.py:297-396)
    def _seed_frontier(self) -> DataFrame:
        return (
            with_canonical_url(self.seeds, "url")
            .select(
                "url_hash",
                "canonical_url",
                "host",
                F.lit(0).alias("depth"),
                F.col("priority").cast("double").alias("priority"),
                F.lit(0).alias("retry_count"),
            )
        )

    def _empty(self, schema: T.StructType) -> DataFrame:
        return self.spark.createDataFrame([], schema)

    def _dedup_first_wins(self, frontier: DataFrame) -> DataFrame:
        """A1: one row per url_hash — keep highest priority, then lowest
        depth (deterministic; discovery order is encoded in (depth, priority))."""
        w = Window.partitionBy("url_hash").orderBy(
            F.col("priority").desc(), F.col("depth").asc(), F.col("retry_count").asc()
        )
        return (
            frontier.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    def _assign_order(self, scheduled: DataFrame, wave: int) -> DataFrame:
        """Tag the wave id. The wave sequence number is NOT materialized in
        the hot loop: the order contract is the sort key (priority DESC,
        url_hash ASC) — a pure function of the data — so seq is computed
        lazily by ``crawl_order()`` at read/verify time. Removing the global
        sort + count pass saves one shuffle and two jobs per wave.
        """
        return scheduled.withColumn("wave", F.lit(wave))

    def _expand_outlinks(self, fetched: DataFrame) -> DataFrame:
        from bodhium_webscrapper_spark.functions.canonicalize import (
            host_of,
            resolve_and_canonicalize_udf,
            url_key,
        )

        links = (
            fetched.select(
                F.col("canonical_url").alias("base_url"),
                F.col("host").alias("base_host"),
                F.col("priority").alias("parent_priority"),
                F.col("depth").alias("parent_depth"),
                F.explode(F.col("links")).alias("raw_link"),
            )
            .withColumn(
                "canonical_url",
                resolve_and_canonicalize_udf(F.col("raw_link"), F.col("base_url")),
            )
            .filter(F.col("canonical_url").isNotNull())
            .withColumn("host", host_of(F.col("canonical_url")))
        )
        if self.config.same_host_only:
            links = links.filter(F.col("host") == F.col("base_host"))
        return links.select(
            url_key(F.col("canonical_url")).alias("url_hash"),
            "canonical_url",
            "host",
            (F.col("parent_depth") + 1).alias("depth"),
            (F.col("parent_priority") * F.lit(self.config.priority_decay)).alias("priority"),
            F.lit(0).alias("retry_count"),
        )

    # ---- one wave = one pure dataflow, materialized once into the snapshot
    def _run_wave(
        self,
        wave: int,
        frontier: DataFrame,
        seen: DataFrame,
        bloom: "object | None",
        n_candidates: int | None = None,
    ) -> WaveStats:
        """Each heavy plan is written straight to the wave snapshot and read
        back — the snapshot IS the cache (one materialization per stage, no
        localCheckpoint double-compute), plans stay O(1), commits idempotent.

        Counting discipline: NO .count() actions in the loop. Every count
        the stats need is either passed in (``n_candidates`` — the previous
        wave's frontier_next footer count) or read from the parquet footers
        of an artifact the wave writes anyway (``store.row_count``). Each
        removed count was a full Spark job of fixed driver latency — the
        dominant per-wave cost at small wave sizes and the reason round-1
        scaling efficiency collapsed to 0.39.
        """
        cfg = self.config
        t0 = time.time()
        timings: dict[str, float] = {}

        def mark(step: str, t_start: float) -> float:
            now = time.time()
            timings[step] = round(now - t_start, 2)
            return now

        if n_candidates is None:
            # seeds wave only (once per run): must count the CANONICALIZED
            # frontier — with_canonical_url drops null/hostless/non-http
            # seeds, so a raw seeds.count() would overstate candidates and
            # could mis-trigger the salting threshold
            n_candidates = frontier.count()
        t = mark("count_frontier", t0)

        # schedule: dedup -> seen anti-join -> robots -> per-host budget ->
        # global cap. Adaptive physical choices (all semantics-preserving):
        # - seen small enough to broadcast -> broadcast-hash anti-join and
        #   skip the bloom pre-pass (the broadcast probe IS the filter);
        #   at 10^10 seen keys: bloom pre-pass + shuffle anti-join.
        # - host-hash salting only kicks in above an activation threshold —
        #   below it, per-host partitions are small enough that the second
        #   window pass would be pure overhead.
        deduped = self._dedup_first_wins(frontier)
        if self._total_seen <= cfg.seen_broadcast_threshold:
            new = deduped.join(
                F.broadcast(seen.select("url_hash")), "url_hash", "left_anti"
            )
        else:
            new = seen_anti_join(deduped, seen, "url_hash", bloom)
        gated = robots_gate(new, self._rules, flat=True) if self._rules is not None else new
        salt = cfg.salt_buckets if n_candidates > cfg.salt_activation_threshold else 1
        budget_col = None
        if self._budgets is not None:
            gated = with_crawl_delay_budget(
                gated,
                None,
                cfg.max_urls_per_host_per_wave,
                cfg.wave_period_ms,
                budgets=self._budgets,
            )
            budget_col = "_host_budget"
        capped = per_host_budget(
            gated,
            cfg.max_urls_per_host_per_wave,
            host_col="host",
            salt_buckets=salt,
            budget_col=budget_col,
        )
        if cfg.global_wave_limit:
            # TakeOrdered merges the whole wave through the driver — only
            # pay for it when a global cap is actually configured
            capped = capped.orderBy(
                F.col("priority").desc(), F.col("url_hash").asc()
            ).limit(cfg.global_wave_limit)
        self.store.write(wave, "scheduled", self._assign_order(capped, wave))
        flagged = getattr(new, "_bloom_flagged", None)
        if flagged is not None:  # bloom probe cache served its one action
            flagged.unpersist()
        scheduled = self.store.read(self.spark, wave, "scheduled")
        n_scheduled = self.store.row_count(wave, "scheduled")  # footer, no job
        t = mark("schedule", t)

        # fetch: pages are NEVER shuffled, whatever the wave size.
        #   1. semi-join prune with BROADCAST KEYS (8 bytes/url — a 5M-URL
        #      wave broadcasts 40 MB of longs, never the row payloads): the
        #      100 TB side is scanned once and hash-probed in place. This is
        #      the plain-parquet analogue of Iceberg storage-partitioned
        #      bucket(N, url_hash) + runtime filtering.
        #   2. extract text+outlinks in ONE pandas-UDF pass over the pruned
        #      pages (html never travels past this projection).
        #   3. join the narrow wave attributes (url/host/depth/priority)
        #      onto the narrow extraction output — broadcast for normal
        #      waves, shuffle of narrow rows only for giant ones.
        fetched_cols = ["url_hash", "canonical_url", "host", "depth",
                        "priority", "wave"]
        keys = F.broadcast(scheduled.select("url_hash"))
        pruned = self.pages.join(keys, "url_hash", "left_semi")
        raw_cols = [
            F.col("url_hash"),
            F.col("_page.text").alias("text"),
            F.col("_page.links").alias("links"),
        ]
        if cfg.verify_extraction:
            raw_cols.append(
                F.col("_page.text").eqNullSafe(F.col("text")).alias("golden_ok")
            )
        raw = pruned.withColumn("_page", extract_page_udf(F.col("html"))).select(*raw_cols)
        attrs = scheduled.select(*fetched_cols)
        if n_scheduled <= cfg.broadcast_wave_threshold:
            attrs = F.broadcast(attrs)
        fetch_plan = raw.join(attrs, "url_hash")
        self.store.write(wave, "page_results", fetch_plan)
        results = self.store.read(self.spark, wave, "page_results")
        n_fetched = self.store.row_count(wave, "page_results")  # footer, no job
        if cfg.verify_extraction:
            mismatches = results.filter(~F.col("golden_ok")).count()
            if mismatches:
                raise AssertionError(
                    f"wave {wave}: {mismatches} rows differ from golden extractor output"
                )
        t = mark("fetch_extract", t)

        # next frontier = outlinks(page_results) ∪ fetch-miss retries
        misses = (
            scheduled.join(results.select("url_hash"), "url_hash", "left_anti")
            .filter(F.col("retry_count") < cfg.max_retries)
            .select(
                "url_hash", "canonical_url", "host", "depth", "priority",
                (F.col("retry_count") + 1).alias("retry_count"),
            )
        )
        next_frontier = self._expand_outlinks(results).unionByName(misses)
        self.store.write(wave, "frontier_next", next_frontier)
        t = mark("expand_outlinks", t)

        # per-partition metrics straight from the footers of the artifacts
        # this wave already wrote — zero extra Spark jobs (the seen delta is
        # likewise NOT written separately: it is a projection of scheduled)
        import pyarrow as pa

        rows = footer_metrics(
            self.store.wave_dir(wave, "scheduled"), wave, "scheduled"
        ) + footer_metrics(
            self.store.wave_dir(wave, "page_results"), wave, "fetched", bytes_col="text"
        )
        self.store.write_rows(
            wave,
            "metrics",
            pa.table(
                {
                    "wave": pa.array([r[0] for r in rows], pa.int32()),
                    "stage": pa.array([r[1] for r in rows], pa.string()),
                    "partition_id": pa.array([r[2] for r in rows], pa.int32()),
                    "rows": pa.array([r[3] for r in rows], pa.int64()),
                    "bytes": pa.array([r[4] for r in rows], pa.int64()),
                }
            ),
        )
        t = mark("commit_writes", t)

        n_misses = n_scheduled - n_fetched
        stats = WaveStats(
            wave=wave,
            candidates=n_candidates,
            deduped=n_candidates,
            scheduled=n_scheduled,
            fetched=n_fetched,
            misses=n_misses,
            outlinks=0,
            seconds=round(time.time() - t0, 3),
        )
        # S9: orchestration event trail (reference: DynamoDB events,
        # app.py:817-860) — driver-side rows, rewritten idempotently with
        # the wave, so a crash+resume replays no duplicate events
        events: list[tuple[str, dict]] = []
        if self._resumed_at == wave:
            events.append(("resume", {"from_wave": wave - 1}))
        events.append(("wave_start", {"candidates": n_candidates}))
        events.append(
            (
                "wave_commit",
                {
                    "scheduled": n_scheduled,
                    "fetched": n_fetched,
                    "misses": n_misses,
                    "seconds": stats.seconds,
                },
            )
        )
        self.store.write_rows(
            wave, "lineage", lineage_rows_table(self.job_id, wave, events)
        )
        self.store.commit_wave(wave, {**stats.__dict__, "timings": timings})
        return stats

    def _materialize_bloom(self, bloom, wave: int) -> None:
        """Write the merged blob table and re-read it: executor-side state,
        flat lineage, resumable. Blob bytes never transit the driver."""
        self.store.write(wave, "bloom", bloom.blobs)
        bloom.blobs = self.store.read(self.spark, wave, "bloom")

    def run(self, resume: bool = False) -> dict:
        """Run (or resume) the wave loop; returns a summary dict."""
        from bodhium_webscrapper_spark.operators.seen import DistributedBloom

        cfg = self.config
        committed = self.store.committed_wave()
        bloom = (
            DistributedBloom(self.spark, cfg.bloom_buckets, cfg.bloom_capacity)
            if cfg.use_bloom
            else None
        )
        n_frontier: int | None = None  # footer count; None = seeds wave
        self._resumed_at = committed + 1 if (resume and committed >= 0) else -1
        if resume and committed >= 0:
            start = committed + 1
            frontier = self.store.read(self.spark, committed, "frontier_next")
            n_frontier = self.store.row_count(committed, "frontier_next")
            seen = self._seen_upto(committed)
        else:
            start = 0
            frontier = self._seed_frontier()
            seen = self._empty(SEEN_SCHEMA)

        total_scheduled = sum(
            s.get("scheduled", 0) for s in self.store.manifest()["waves"].values()
        ) if resume else 0
        self._total_seen = total_scheduled
        total_candidates = 0
        waves_run = []
        loop_overhead: list[float] = []
        bloom_hydrated_upto = -1
        t_tail = time.time()
        for wave in range(start, cfg.max_waves):
            loop_overhead.append(round(time.time() - t_tail, 3))
            # footer count makes the empty-check free; isEmpty() on the
            # seeds plan (first wave only) still needs a job
            if n_frontier == 0 or (n_frontier is None and frontier.isEmpty()):
                break
            state = None
            if bloom is not None and self._total_seen > cfg.seen_broadcast_threshold:
                # bloom only earns its keep once seen outgrows the broadcast
                # anti-join; hydrate lazily — from the last committed bloom
                # artifact when one exists (resume), else one O(seen) build —
                # then incremental O(delta) afterwards
                if bloom_hydrated_upto < wave - 1 and wave > 0:
                    if os.path.exists(self.store.wave_dir(wave - 1, "bloom")):
                        bloom.blobs = self.store.read(self.spark, wave - 1, "bloom")
                    else:
                        bloom.add_delta(self._seen_upto(wave - 1))
                        self._materialize_bloom(bloom, wave - 1)
                bloom_hydrated_upto = wave - 1
                state = bloom.state()
            stats = self._run_wave(wave, frontier, seen, state, n_candidates=n_frontier)
            t_tail = time.time()
            waves_run.append(stats)
            total_scheduled += stats.scheduled
            total_candidates += stats.candidates
            self._total_seen = total_scheduled
            # re-read state from the snapshot: flat lineage, O(1) plans;
            # bloom absorbs only the new delta (O(wave), not O(seen))
            if cfg.compact_seen_every and (wave + 1) % cfg.compact_seen_every == 0:
                self.store.compact_deltas(self.spark, "scheduled", wave)
            frontier = self.store.read(self.spark, wave, "frontier_next")
            n_frontier = self.store.row_count(wave, "frontier_next")
            seen = self._seen_upto(wave)
            # incremental bloom maintenance ONLY while the bloom regime is
            # active (seen too big to broadcast) — in the broadcast regime
            # the bloom is never probed, and building/merging/writing blobs
            # there would re-add fixed per-wave jobs for nothing; if the
            # regime activates later, the lazy-hydration branch above
            # catches up from the last artifact or one O(seen) build
            if (
                bloom is not None
                and self._total_seen > cfg.seen_broadcast_threshold
                and bloom_hydrated_upto == wave - 1
            ):
                bloom.add_delta(
                    self.store.read(self.spark, wave, "scheduled").select("url_hash")
                )
                # materialize the merged blob table (small: n_buckets rows)
                # so lineage stays flat and resume rehydrates in O(1)
                self._materialize_bloom(bloom, wave)
                bloom_hydrated_upto = wave

        return {
            "job_id": self.job_id,
            "waves": [s.__dict__ for s in waves_run],
            "committed_wave": self.store.committed_wave(),
            "total_scheduled": total_scheduled,
            "total_candidates": total_candidates,
            # driver-side time between waves (read-backs, seen rebuild,
            # manifest) — the loop's fixed-cost observability
            "loop_overhead": loop_overhead,
        }

    # ---- readers over the committed snapshot
    def crawl_order(self) -> DataFrame:
        """(wave, seq, canonical_url) in exact crawl order — seq materialized
        here (read/verify time), not in the hot loop."""
        df = self.store.read_deltas(self.spark, "scheduled", self.store.committed_wave())
        w = Window.partitionBy("wave").orderBy(
            F.col("priority").desc(), F.col("url_hash").asc()
        )
        return (
            df.withColumn("seq", F.row_number().over(w))
            .select("wave", "seq", "canonical_url")
            .orderBy("wave", "seq")
        )

    def _seen_upto(self, wave: int) -> DataFrame:
        """Seen = everything scheduled so far MINUS pending retries.

        A fetch-miss is re-queued into frontier_{wave+1} with retry_count+1;
        since it was scheduled, a plain projection of the scheduled table
        would anti-join it away next wave and the retry would be dead code.
        Pending retries live only in the LATEST committed frontier_next
        (a miss either got rescheduled later, or exhausted max_retries and
        stays seen → permanently dropped), so one small anti-join restores
        the wave equation frontier_{t+1} = outlinks ∪ fetch-misses."""
        df = self.store.read_deltas(self.spark, "scheduled", wave)
        seen = df.select("url_hash", F.col("canonical_url").alias("url"))
        if os.path.exists(self.store.wave_dir(wave, "frontier_next")):
            pending = (
                self.store.read(self.spark, wave, "frontier_next")
                .filter(F.col("retry_count") > 0)
                .select("url_hash")
            )
            seen = seen.join(F.broadcast(pending), "url_hash", "left_anti")
        return seen

    def seen_set(self) -> DataFrame:
        """Distinct permanently-seen URLs. A retried URL appears in several
        waves' scheduled deltas; the anti-join in the hot loop tolerates the
        duplicates, the reporting contract here does not."""
        return self._seen_upto(self.store.committed_wave()).dropDuplicates(["url_hash"])

    def extracted(self) -> DataFrame:
        df = self.store.read_deltas(self.spark, "page_results", self.store.committed_wave())
        return df.select("url_hash", "canonical_url", "wave", "text")

    def metrics(self) -> DataFrame:
        return self.store.read_deltas(self.spark, "metrics", self.store.committed_wave())

    def lineage(self) -> DataFrame:
        """Orchestration event trail: one wave_start + wave_commit row per
        committed wave (plus a resume row on the first wave of a resumed
        run) — the engine's DynamoDB-events analogue (app.py:817-860)."""
        return self.store.read_deltas(self.spark, "lineage", self.store.committed_wave())
