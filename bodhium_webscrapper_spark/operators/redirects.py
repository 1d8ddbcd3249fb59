"""Redirect-chain resolution by pointer doubling.

The reference follows HTTP redirects implicitly inside each per-URL fetch
(crawl4ai's fetcher resolves 3xx chains one hop at a time before the page
reaches extraction — /root/reference/app.py:497-538 configures the browser
fetch that performs it). A batch engine sees the redirect *map* instead: an
edge table (src → dst) harvested from fetch results, and must resolve every
source to its final landing URL before keying/dedup — otherwise the frontier
counts each hop of a chain as a distinct page.

Scale shape: a linear walk is O(longest chain) self-joins over the FULL
edge set; pointer doubling (the classic parallel list-ranking contraction)
reaches hop budget H in ceil(log2 H) rounds, each ONE equi-join of the
current jump table with itself on narrow (id, id, int, bool) rows. At a
10^10-edge redirect map with the default 32-hop budget that is 5 shuffles
instead of 32, and every shuffle moves 24 B/row. Cycles (a→b→a loops are
common crawl pathologies) never terminate a walk; they are exactly the rows
still unresolved when the hop budget is exhausted, so detection is free.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F


def resolve_redirects(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 32,
) -> DataFrame:
    """Resolve every redirect source to its terminal destination.

    ``edges``: one row per redirect (src → dst); src is assumed unique
    (a URL redirects to at most one target — last-write-wins upstream if
    a recrawl changed the target).

    Returns one row per distinct src:
      ``src_id, final_id, hops, is_cycle`` — ``final_id``/``hops`` are
      NULL and ``is_cycle`` true when the walk exceeds ``max_hops``
      without reaching a node that has no outgoing edge (a loop, or a
      chain longer than the budget: both are discard-the-URL conditions
      for a crawler, so they share the flag).

    Pointer doubling: the jump table J maps u → (node 2^k hops away, or
    its terminal if nearer, with the exact hop count). One self-join per
    round composes J with itself; ``done`` rows (landed on a terminal)
    pass through untouched, so the join input shrinks as chains resolve.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    # J_0: one hop. done = the landing node has no outgoing edge
    # (left_anti would lose v; a left join keyed on the edge table's src
    # marks terminals in one pass).
    out_keys = e.select(F.col("u").alias("k")).distinct()
    jump = (
        e.join(out_keys, e.v == out_keys.k, "left")
        .select(
            "u",
            F.col("v").alias("cur"),
            F.lit(1).alias("hops"),
            F.col("k").isNull().alias("done"),
        )
    )
    rounds = max(1, math.ceil(math.log2(max(2, max_hops))))
    # truncate lineage EVERY round: the self-join references `jump` twice,
    # so without materialization the plan tree doubles per round (2^rounds
    # copies of J_0 — Catalyst re-optimizes and Spark re-EXECUTES the whole
    # exponential tree). Same discipline as connected_components
    # (operators/graph.py): eager localCheckpoint keeps plan size and work
    # O(1) per round; on a real cluster prefer .checkpoint() for
    # executor-loss resilience. Plan-shape asserted in
    # tests/test_explain_plans.py.
    jump = jump.localCheckpoint(eager=True)
    for _ in range(rounds):
        nxt = jump.select(
            F.col("u").alias("j_u"),
            F.col("cur").alias("j_cur"),
            F.col("hops").alias("j_hops"),
            F.col("done").alias("j_done"),
        )
        jump = (
            jump.join(nxt, jump.cur == nxt.j_u, "left")
            .select(
                "u",
                F.when(F.col("done") | F.col("j_u").isNull(), F.col("cur"))
                .otherwise(F.col("j_cur"))
                .alias("cur"),
                F.when(F.col("done"), F.col("hops"))
                .when(F.col("j_u").isNull(), F.col("hops"))
                .otherwise(F.col("hops") + F.col("j_hops"))
                .alias("hops"),
                # landed on a node with no out-edge (j_u missing) -> done;
                # composed with a done jump -> done
                (F.col("done") | F.col("j_u").isNull() | F.col("j_done"))
                .alias("done"),
            )
        ).localCheckpoint(eager=True)
    return jump.select(
        F.col("u").alias("src_id"),
        F.when(F.col("done") & (F.col("hops") <= max_hops), F.col("cur"))
        .alias("final_id"),
        F.when(F.col("done") & (F.col("hops") <= max_hops), F.col("hops"))
        .alias("hops"),
        (~F.col("done") | (F.col("hops") > max_hops)).alias("is_cycle"),
    )


def canonical_alias_edges(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html_text",
) -> DataFrame:
    """rel=canonical alias edges harvested from fetched pages: one
    (src, dst) row per page that declares a canonical DIFFERENT from its
    own URL (self-canonical — the overwhelmingly common case — emits no
    edge, so the edge table is duplicate-pages-sized, not corpus-sized).

    ``html_col`` is the decoded html STRING (decode binary payloads at the
    call site). Feed the result to ``resolve_redirects`` to collapse
    canonical-of-canonical chains and flag declaration cycles — the same
    pointer-doubling contraction, because an alias map IS a redirect map
    (the reference's browser fetch obeys 3xx before extraction; a batch
    engine obeys the in-document equivalent after). At 10^10 pages, key
    both endpoints with ``canonicalize.url_key`` first so the resolution
    joins move int64 pairs, exactly as the crawl loop does."""
    from bodhium_webscrapper_spark.functions.extract import canonical_link_of

    href = canonical_link_of(F.col(html_col))
    return (
        pages.select(F.col(url_col).alias("src"), href.alias("dst"))
        .filter(F.col("dst").isNotNull() & (F.col("dst") != F.col("src")))
    )
