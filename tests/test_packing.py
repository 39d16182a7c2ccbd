"""Best-fit-decreasing sequence packing (operators/packing.py)."""

from __future__ import annotations

import random
from bisect import bisect_left, insort

import pytest
from pyspark.sql import functions as F

from my_feast_spark.operators.packing import pack_bfd, packing_stats

CAP = 100


def _py_bfd(pairs, cap=CAP):
    """Independent driver-side reference of the same total order."""
    rems, assign, nxt = [], {}, 0
    for length, sid in sorted(((l, i) for i, l in pairs),
                              key=lambda t: (-t[0], t[1])):
        j = bisect_left(rems, (length, -1))
        if j < len(rems):
            rem, pid = rems.pop(j)
            insort(rems, (rem - length, pid))
        else:
            pid = nxt
            nxt += 1
            insort(rems, (cap - length, pid))
        assign[sid] = pid
    return assign


@pytest.fixture()
def seqs(spark):
    rng = random.Random(7)
    rows = [(i, rng.randrange(1, CAP + 1)) for i in range(500)]
    return rows, spark.createDataFrame(rows, "sid long, n long")


def test_matches_reference_and_respects_capacity(spark, seqs):
    rows, df = seqs
    out = pack_bfd(df, "sid", "n", CAP, num_shards=4).collect()
    assert len(out) == len(rows)
    # per-pack capacity invariant
    used = {}
    for r in out:
        used[(r.shard, r.pack_id)] = used.get((r.shard, r.pack_id), 0) + r.len
    assert all(v <= CAP for v in used.values())
    # per shard, the assignment IS the reference BFD over that shard
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append((r.id, r.len))
    for shard, pairs in by_shard.items():
        want = _py_bfd(pairs)
        got = {r.id: r.pack_id for r in out if r.shard == shard}
        assert got == want, shard


def test_deterministic_across_partitionings(spark, seqs):
    _rows, df = seqs
    a = sorted(map(tuple, pack_bfd(df, "sid", "n", CAP).collect()))
    b = sorted(map(tuple, pack_bfd(
        df.repartition(17, "n"), "sid", "n", CAP).collect()))
    assert a == b


def test_beats_arrival_order_next_fit(spark, seqs):
    """The point of BFD: fewer packs (= less padding) than the naive
    next-fit over arrival order on the same data."""
    rows, df = seqs
    stats = packing_stats(
        pack_bfd(df, "sid", "n", CAP, num_shards=1), CAP
    ).collect()[0]
    # next-fit in id order, single shard
    packs, rem = 0, 0
    for _i, length in sorted(rows):
        if length > rem:
            packs += 1
            rem = CAP
        rem -= length
    assert stats.n_packs <= packs
    assert 0.0 < stats.fill_frac <= 1.0
    assert stats.pad_tokens == stats.n_packs * CAP - stats.total_len


def test_rejects_oversized_and_bad_lengths(spark):
    df = spark.createDataFrame([(1, CAP + 1)], "sid long, n long")
    with pytest.raises(Exception, match="capacity"):
        pack_bfd(df, "sid", "n", CAP).collect()
    df0 = spark.createDataFrame([(1, 0)], "sid long, n long")
    with pytest.raises(Exception, match="non-positive"):
        pack_bfd(df0, "sid", "n", CAP).collect()
    with pytest.raises(ValueError):
        pack_bfd(df, "sid", "n", 0)


def test_single_shuffle_plan(spark, seqs):
    _rows, df = seqs
    import re

    plan = pack_bfd(df, "sid", "n", CAP)._jdf.queryExecution(
    ).executedPlan().toString()
    assert len(re.findall(r"Exchange", plan)) == 1
    assert "rangepartitioning" not in plan.lower()


def test_respects_existing_shard_column(spark):
    df = spark.createDataFrame(
        [(i, 40, i % 3) for i in range(30)], "sid long, n long, sh long"
    )
    out = pack_bfd(df, "sid", "n", CAP, shard_col="sh").collect()
    assert {r.shard for r in out} == {0, 1, 2}
    # capacity 100 / len 40 -> 2 per pack within each shard
    sizes = {}
    for r in out:
        sizes[(r.shard, r.pack_id)] = sizes.get((r.shard, r.pack_id), 0) + 1
    assert set(sizes.values()) == {2}
