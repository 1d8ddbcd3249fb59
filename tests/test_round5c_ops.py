"""Round-5c ops: compaction planner, CDX composition, dataset-card stats."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bodhium_webscrapper_spark.operators.packing import compaction_plan


def _files(spark, sizes):
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(sizes)], "file_id long, bytes long"
    )


def test_compaction_plan_hand_sizes(spark):
    # cumulative starts: 0,100,250,250+200=450,470 ; target 250 ->
    # grp = start // 250 = 0,0,1,1,1 — group 0 overflows by at most one file
    got = {
        r.file_id: r.grp
        for r in compaction_plan(
            _files(spark, [100, 150, 200, 20, 30]),
            "file_id", "bytes", target_bytes=250,
        ).collect()
    }
    assert got == {0: 0, 1: 0, 2: 1, 3: 1, 4: 1}


def test_compaction_plan_groups_bounded_and_partition_invariant(spark):
    sizes = [(i * 37) % 90 + 5 for i in range(300)]
    base = _files(spark, sizes)
    a = sorted(map(tuple, compaction_plan(
        base, "file_id", "bytes", target_bytes=500).collect()))
    b = sorted(map(tuple, compaction_plan(
        base.repartition(11), "file_id", "bytes",
        target_bytes=500, num_partitions=5).collect()))
    assert a == b
    # every group's total is < target + its largest member (first-fit bound)
    import collections
    tot = collections.defaultdict(int)
    mx = collections.defaultdict(int)
    for fid, by, grp in a:
        tot[grp] += by
        mx[grp] = max(mx[grp], by)
    for g in tot:
        assert tot[g] < 500 + mx[g]
    # groups cover all files exactly once and are contiguous in file order
    grps = [grp for _, _, grp in sorted(a)]
    assert grps == sorted(grps)


def test_compaction_plan_rejects_bad_target(spark):
    with pytest.raises(ValueError):
        compaction_plan(_files(spark, [1]), "file_id", "bytes", target_bytes=0)
