"""Bucketed-table co-located join: the write-once/join-many shuffle lever.

Asserts the thing that matters at scale: joining two tables bucketed the
same way on the join key produces a plan with NO shuffle (Exchange) on
either side.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from my_feast_spark.sources.writers import write_bucketed_table


@pytest.fixture()
def bucketed_pair(spark, tmp_path_factory):
    spark.sql("DROP TABLE IF EXISTS mfs_feat_b")
    spark.sql("DROP TABLE IF EXISTS mfs_probe_b")
    feats = spark.range(0, 1000).select(
        (F.col("id") % 50).alias("user_id"), F.col("id").alias("fval")
    )
    probes = spark.range(0, 200).select(
        (F.col("id") % 50).alias("user_id"), F.col("id").alias("pval")
    )
    write_bucketed_table(feats, "mfs_feat_b", ["user_id"], 4, sort_cols=["user_id"])
    write_bucketed_table(probes, "mfs_probe_b", ["user_id"], 4, sort_cols=["user_id"])
    yield spark.table("mfs_feat_b"), spark.table("mfs_probe_b")
    spark.sql("DROP TABLE IF EXISTS mfs_feat_b")
    spark.sql("DROP TABLE IF EXISTS mfs_probe_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_pair):
    feats, probes = bucketed_pair
    # disable auto-broadcast so the join strategy decision is bucketing's
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = feats.join(probes, "user_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert joined.count() == 1000 * 200 // 50  # 20 feats x 4 probes x 50 keys
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_agg_has_no_shuffle(spark, bucketed_pair):
    feats, _ = bucketed_pair
    agg = feats.groupBy("user_id").agg(F.sum("fval").alias("s"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"bucketed agg still shuffles:\n{plan}"
    assert agg.count() == 50
