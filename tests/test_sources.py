"""Source reader tests: CSV-with-header (S7, all-string scan), pandas
interchange (S14, Arrow path), Avro availability gate (S5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from my_feast_spark.sources.readers import read_csv_header

CSV = """VendorID,tpep_dropoff_datetime,passenger_count,trip_distance,tip_amount
1,2021-01-01 10:15:00,2,3.5,1.25
1,2021-01-01 10:45:00,1,1.1,0
2,2021-01-01 11:05:00,3,8.2,4.00
"""


@pytest.fixture()
def csv_path(tmp_path):
    p = tmp_path / "trips.csv"
    p.write_text(CSV)
    return str(p)


def test_csv_scan_is_all_string_then_silver_casts(spark, csv_path):
    raw = read_csv_header(spark, csv_path)
    # the reference's CSV scan arrives untyped (trip_stats_fv.ipynb:186-203)
    assert all(t == "string" for _n, t in raw.dtypes)
    silver = raw.select(
        F.col("VendorID").cast("long").alias("vendor"),
        F.to_timestamp("tpep_dropoff_datetime").alias("dropoff"),
        F.col("tip_amount").cast("double").alias("tip"),
    ).where(F.col("tip_amount") != "0")  # P5 inequality filter
    rows = silver.orderBy("vendor").collect()
    assert [r.vendor for r in rows] == [1, 2]
    assert rows[0].tip == 1.25


def test_pandas_interchange_arrow(spark):
    df = spark.range(5).withColumn("x", F.col("id") * 2.0)
    assert spark.conf.get("spark.sql.execution.arrow.pyspark.enabled") == "true"
    pdf = df.toPandas()  # S14: executor Arrow batches -> pandas
    assert list(pdf.columns) == ["id", "x"]
    assert pdf["x"].tolist() == [0.0, 2.0, 4.0, 6.0, 8.0]
    back = spark.createDataFrame(pdf)
    assert back.count() == 5


def test_avro_scan_gated(spark, tmp_path):
    """S5: the reference scans Event-Hub-captured Avro. spark-avro is an
    external package; skip cleanly when it is not on the classpath."""
    df = spark.range(3)
    try:
        df.write.format("avro").save(str(tmp_path / "a"))
    except Exception as exc:  # AnalysisException: Failed to find data source
        pytest.skip(f"spark-avro not available: {type(exc).__name__}")
    assert spark.read.format("avro").load(str(tmp_path / "a")).count() == 3
