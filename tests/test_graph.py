"""connected_components vs a pure-Python union-find reference."""

from __future__ import annotations

import random

from bodhium_webscrapper_spark.operators.graph import connected_components


def _uf_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # label = min member id
    members: dict[int, list[int]] = {}
    for x in parent:
        members.setdefault(find(x), []).append(x)
    return {x: min(ms) for root, ms in members.items() for x in ms + [root]}


def _run(spark, edges: list[tuple[int, int]]) -> dict[int, int]:
    df = spark.createDataFrame(edges, "src: long, dst: long")
    out = connected_components(df).collect()
    got = {}
    for r in out:
        assert r["id"] not in got, f"node {r['id']} assigned twice"
        got[r["id"]] = r["component"]
    return got


def test_two_components_and_singleton(spark):
    edges = [(1, 2), (2, 3), (10, 11), (7, 7)]
    assert _run(spark, edges) == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 7: 7}


def test_long_chain(spark):
    # worst case for naive label propagation; large-star halves it per round
    edges = [(i, i + 1) for i in range(60)]
    got = _run(spark, edges)
    assert got == {i: 0 for i in range(61)}


def test_star_and_ring(spark):
    edges = [(100, v) for v in range(101, 110)] + [(200 + i, 200 + (i + 1) % 8) for i in range(8)]
    got = _run(spark, edges)
    assert all(got[v] == 100 for v in range(100, 110))
    assert all(got[200 + i] == 200 for i in range(8))


def test_random_graphs_match_union_find(spark):
    rng = random.Random(1234)
    for trial in range(3):
        n = 80
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randrange(40, 120))
        ]
        edges = [e for e in edges if e[0] != e[1]]
        want = _uf_components(edges)
        got = _run(spark, edges)
        assert got == want, f"trial {trial} mismatch"
