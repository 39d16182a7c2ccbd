"""ORC round-trip (workload.q_orc_scan + Spark native ORC source):
content equality with the parquet source, predicate/column pushdown
into the ORC scan, and fixture-cache immutability."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from my_feast_spark import workload
from tests.conftest import SF_DIR_ORACLE


def test_orc_roundtrip_matches_parquet_source(spark):
    path = workload._orc_capture_dir(spark, SF_DIR_ORACLE)
    orc = spark.read.orc(path)
    src = (
        spark.read.parquet(os.path.join(SF_DIR_ORACLE, "documents.parquet"))
        .where(F.col("doc_id") % 5 == 0)
        .select("doc_id", "text", "lang", "source", "n_chars")
    )
    assert orc.count() == src.count()
    assert sorted(orc.columns) == sorted(src.columns)
    assert orc.exceptAll(src).count() == 0
    assert src.exceptAll(orc).count() == 0


def test_orc_scan_pushdown(spark):
    """Filter and projection must reach the ORC scan node — the same
    pushdown contract the parquet readers are pinned to."""
    path = workload._orc_capture_dir(spark, SF_DIR_ORACLE)
    df = (
        spark.read.orc(path)
        .where(F.col("doc_id") > 100)
        .select("doc_id", "lang")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,100)]" in plan
    assert "ReadSchema: struct<doc_id:bigint,lang:string>" in plan


def test_fixture_is_cached_and_marked(spark):
    path = workload._orc_capture_dir(spark, SF_DIR_ORACLE)
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    mtime = os.path.getmtime(path)
    again = workload._orc_capture_dir(spark, SF_DIR_ORACLE)
    assert again == path
    assert os.path.getmtime(path) == mtime  # no rewrite on reuse
