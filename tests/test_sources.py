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


AVRO_SCHEMA = {
    "type": "record",
    "name": "Trip",
    "fields": [
        {"name": "trip_id", "type": "long"},
        {"name": "vendor", "type": "string"},
        {"name": "fare", "type": "double"},
        {"name": "tip", "type": "float"},
        {"name": "shared", "type": "boolean"},
        {"name": "note", "type": ["null", "string"]},
    ],
}

AVRO_ROWS = [
    {"trip_id": i, "vendor": f"v{i % 3}", "fare": 2.5 * i, "tip": float(i % 2),
     "shared": i % 2 == 0, "note": None if i % 4 == 0 else f"n{i}"}
    for i in range(40)
]


def test_avro_codec_roundtrip_bytes():
    """Pure-codec check, both codecs: write -> decode, exact rows."""
    import tempfile, os
    from my_feast_spark.sources.avro_io import make_container_decoder, write_avro_file

    for codec in ("null", "deflate"):
        p = os.path.join(tempfile.mkdtemp(), "t.avro")
        write_avro_file(p, AVRO_SCHEMA, AVRO_ROWS, codec=codec, records_per_block=7)
        with open(p, "rb") as fh:
            schema, recs = make_container_decoder()(fh.read())
        assert schema == AVRO_SCHEMA
        assert recs == AVRO_ROWS


def test_avro_scan_distributed(spark, tmp_path):
    """S5 un-gated: avro_scan works with OR without spark-avro on the
    classpath (native scan vs binaryFile + self-contained mapInPandas
    decode); schema is inferred from the file header, values round-trip
    through executors, nullable unions decode to NULLs."""
    from my_feast_spark.sources.avro_io import avro_scan, write_avro_file

    d = tmp_path / "capture"
    d.mkdir()
    for i in range(3):  # several files: parallelism comes from file count
        write_avro_file(str(d / f"part-{i}.avro"), AVRO_SCHEMA, AVRO_ROWS[i::3])
    df = avro_scan(spark, str(d))
    assert dict(df.dtypes) == {
        "trip_id": "bigint", "vendor": "string", "fare": "double",
        "tip": "float", "shared": "boolean", "note": "string",
    }
    rows = {r.trip_id: r for r in df.collect()}
    assert len(rows) == 40
    assert rows[1].note == "n1" and rows[4].note is None
    assert rows[3].fare == 7.5 and rows[3].shared is False
    got_tips = {r.trip_id: r.tip for r in rows.values()}
    assert got_tips[5] == 1.0


def test_avro_scan_matches_native_when_available(spark, tmp_path):
    """When spark-avro IS present, the native reader must see the same
    rows our writer produced (format conformance, not just self-
    consistency). Skipped when the jar is absent."""
    from my_feast_spark.sources.avro_io import write_avro_file

    p = tmp_path / "conf"
    p.mkdir()
    write_avro_file(str(p / "part-0.avro"), AVRO_SCHEMA, AVRO_ROWS)
    try:
        df = spark.read.format("avro").load(str(p))
        df.schema
    except Exception as exc:
        pytest.skip(f"spark-avro not available: {type(exc).__name__}")
    assert df.count() == 40


def test_delta_round_trip_gated(spark, tmp_path):
    """The reference's cloud side standardizes on Delta (CASE.MD:107).
    delta-spark is an external jar (needs spark.sql.extensions +
    catalog conf at JVM start); neither it nor the delta-rs python lib
    ships in this container, so this round-trips through
    FileSource(file_format="delta") only when the format resolves —
    and skips LOUDLY, not silently, otherwise."""
    from my_feast_spark.core import FileSource

    path = str(tmp_path / "dlt")
    df = spark.range(5).withColumnRenamed("id", "k")
    try:
        df.write.format("delta").save(path)
    except Exception as exc:
        pytest.skip(f"delta-spark not on the classpath: {type(exc).__name__}")
    src = FileSource(path=path, timestamp_field="k", file_format="delta")
    assert src.load(spark).count() == 5


def test_paginated_reader_stages_and_scans(spark, tmp_path):
    """S1: offset/limit API walk -> bounded driver buffering -> staged
    parquet chunks -> ordinary distributed scan (the Socrata ingest
    shape, driver-paged by necessity, Spark-scanned after)."""
    from my_feast_spark.sources.paginated import read_paginated

    records = [
        {"trip_id": i, "vendor": f"v{i % 3}", "fare": 1.5 * i} for i in range(2500)
    ]

    calls = []

    def fetch_page(offset):
        calls.append(offset)
        return records[offset:offset + 1000]

    df = read_paginated(
        spark, fetch_page, str(tmp_path / "stage"),
        schema="trip_id long, vendor string, fare double",
        stage_every=1000,
    )
    assert calls == [0, 1000, 2000, 2500]  # serial cursor, ends on empty page
    assert df.count() == 2500
    assert dict(df.dtypes) == {"trip_id": "bigint", "vendor": "string", "fare": "double"}
    # staged as multiple chunks -> the scan parallelizes like any bronze table
    assert len(list((tmp_path / "stage").glob("chunk=*"))) == 3
    assert df.where(F.col("trip_id") == 1234).collect()[0].fare == 1851.0

    # max_records cap (the reference's bounded backfill)
    df2 = read_paginated(
        spark, lambda off: records[off:off + 1000], str(tmp_path / "stage2"),
        schema="trip_id long, vendor string, fare double",
        stage_every=1000, max_records=1500,
    )
    assert df2.count() == 1500


def test_avro_codec_property_roundtrip():
    """Property check over the supported type lattice: any row set of
    int64/double/text/bytes/bool/nullable-string round-trips exactly
    through both codecs (zigzag varints, IEEE packing, utf-8 lengths)."""
    from hypothesis import given, settings, strategies as st

    from my_feast_spark.sources.avro_io import make_container_decoder, write_avro_file

    schema = {
        "type": "record", "name": "P",
        "fields": [
            {"name": "i", "type": "long"},
            {"name": "d", "type": "double"},
            {"name": "s", "type": "string"},
            {"name": "b", "type": "bytes"},
            {"name": "f", "type": "boolean"},
            {"name": "n", "type": ["null", "string"]},
        ],
    }
    row = st.fixed_dictionaries({
        "i": st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "d": st.floats(allow_nan=False),
        "s": st.text(max_size=40),
        "b": st.binary(max_size=40),
        "f": st.booleans(),
        "n": st.none() | st.text(max_size=10),
    })

    @settings(max_examples=30, deadline=None)
    @given(st.lists(row, max_size=12), st.sampled_from(["null", "deflate"]))
    def check(rows, codec):
        import os, tempfile
        p = os.path.join(tempfile.mkdtemp(), "p.avro")
        write_avro_file(p, schema, rows, codec=codec, records_per_block=5)
        with open(p, "rb") as fh:
            _s, recs = make_container_decoder()(fh.read())
        assert recs == rows

    check()


def test_avro_codec_inf_nan_doubles():
    import math
    import os, tempfile
    from my_feast_spark.sources.avro_io import make_container_decoder, write_avro_file

    schema = {"type": "record", "name": "N",
              "fields": [{"name": "d", "type": "double"}]}
    p = os.path.join(tempfile.mkdtemp(), "n.avro")
    write_avro_file(p, schema, [{"d": float("inf")}, {"d": float("-inf")},
                                {"d": float("nan")}, {"d": -0.0}])
    with open(p, "rb") as fh:
        _s, recs = make_container_decoder()(fh.read())
    assert recs[0]["d"] == float("inf") and recs[1]["d"] == float("-inf")
    assert math.isnan(recs[2]["d"])
    assert recs[3]["d"] == 0.0 and math.copysign(1, recs[3]["d"]) == -1.0


def test_jsonl_round_trip_with_compression_and_shard_cap(spark, tmp_path):
    """JSONL corpus interchange: gzip shards, row-capped files, schema'd
    re-read equals the written frame (unicode + nested struct intact)."""
    from pyspark.sql import Row

    from my_feast_spark.sources.readers import read_jsonl
    from my_feast_spark.sources.writers import write_jsonl

    rows = [
        Row(doc_id=i, text=f"döc ☃ {i}", meta=Row(lang="en", stars=i % 3))
        for i in range(100)
    ]
    df = spark.createDataFrame(rows).coalesce(1)
    out = str(tmp_path / "corpus")
    write_jsonl(df, out, target_rows_per_file=30)
    import glob

    shards = glob.glob(out + "/*.json.gz")
    assert len(shards) >= 4, "maxRecordsPerFile must split the one task"
    back = read_jsonl(
        spark, out,
        "doc_id long, text string, meta struct<lang:string,stars:bigint>",
    )
    got = sorted((r.doc_id, r.text, r.meta.lang, r.meta.stars)
                 for r in back.collect())
    want = sorted((r.doc_id, r.text, r.meta.lang, r.meta.stars)
                  for r in rows)
    assert got == want


def test_jsonl_permissive_vs_strict_on_corrupt_lines(spark, tmp_path):
    import gzip
    import os

    from my_feast_spark.sources.readers import read_jsonl

    p = str(tmp_path / "raw")
    os.makedirs(p)
    with open(os.path.join(p, "part-0.json"), "w") as f:
        f.write('{"doc_id": 1, "text": "ok"}\n')
        f.write("THIS IS NOT JSON\n")
        f.write('{"doc_id": 2, "text": "also ok"}\n')
    # permissive with a schema: the bad line becomes a NULL row a
    # cleaning job can filter/route
    df = read_jsonl(spark, p, "doc_id long, text string")
    rows = df.collect()
    assert len(rows) == 3
    assert {r.doc_id for r in rows if r.doc_id is not None} == {1, 2}
    # no schema: inference keeps a _corrupt_record column
    inferred = read_jsonl(spark, p)
    assert "_corrupt_record" in inferred.columns
    # strict: the scan fails loudly
    import pytest

    with pytest.raises(Exception):
        read_jsonl(spark, p, "doc_id long, text string", strict=True).collect()
