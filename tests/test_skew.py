"""Salted/two-stage aggregation rewrites must be result-identical to the
direct single-stage forms."""

from __future__ import annotations

from pyspark.sql import functions as F

from my_feast_spark.operators.skew import exact_count_distinct, salted_collect_set
from my_feast_spark.sources.readers import load_table
from tests.conftest import SF_DIR_ORACLE


def test_salted_collect_set_equals_direct(spark):
    ev = load_table(spark, SF_DIR_ORACLE, "events")
    direct = {
        r.user_id: r.s
        for r in ev.groupBy("user_id")
        .agg(F.array_sort(F.collect_set("event_type")).alias("s"))
        .collect()
    }
    salted = {
        r.user_id: r.event_type_set
        for r in salted_collect_set(ev, ["user_id"], "event_type", num_salts=8).collect()
    }
    assert salted == direct


def test_exact_count_distinct_equals_direct(spark):
    ev = load_table(spark, SF_DIR_ORACLE, "events")
    direct = {
        r.user_id: r.n
        for r in ev.groupBy("user_id")
        .agg(F.countDistinct("event_type").alias("n"))
        .collect()
    }
    two_stage = {
        r.user_id: r.n_distinct_event_type
        for r in exact_count_distinct(ev, ["user_id"], "event_type").collect()
    }
    assert two_stage == direct
