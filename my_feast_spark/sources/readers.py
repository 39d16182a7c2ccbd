"""Source readers — file scans + the reference's schema-on-read idioms.

Covers SURVEY §2.1 S5-S7 (format scans) and §2.2 P2/P3 + §2.8 F6/F8/F9
(struct flatten, map→columns pivot, JSON payload parsing). The live-API
ingestion paths (S1-S4) are replaced by file sources per the build plan —
ingestion is "rows → DataFrame", and tests feed Parquet.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Known driver test tables (TESTDATA.md).
TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_csv_header(spark: SparkSession, path: str) -> DataFrame:
    """All-string CSV scan with header, the reference's S7
    (trip_stats_fv.ipynb:165 — columns arrive untyped, silver casts)."""
    return spark.read.option("header", True).csv(path)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver test table, normalizing quirks.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS) which Spark 4
    rejects; we read it via the nanosAsLong legacy conf (runtime-settable)
    and truncate to microseconds as TIMESTAMP_NTZ — bit-identical to what
    DuckDB's reader produces for the same file.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn(
                "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
            )
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, names: Sequence[str] = TESTDATA_TABLES):
    return {n: load_table(spark, sf_dir, n) for n in names}


def spread_partitions(df: DataFrame, min_parallelism: int | None = None) -> DataFrame:
    """Ensure a DataFrame has at least cluster-parallelism partitions.

    Small parquet inputs arrive as 1-2 partitions (one file <
    ``maxPartitionBytes``), which serializes CPU-bound operators (shingling,
    pairwise similarity) onto one core. At real scale the scan itself is
    wide and this is a no-op — the repartition only fires when the input
    is narrower than ``defaultParallelism``, so large scans keep their
    pushdown-friendly layout and never pay the extra shuffle."""
    sc = df.sparkSession.sparkContext
    target = min_parallelism or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def flatten_struct(df: DataFrame, struct_col: str, keep: Sequence[str] = ()) -> DataFrame:
    """P2: ``selectExpr("value.*", "created")``-style struct flatten
    (chicago_weather_silver.py:17-18)."""
    return df.select(f"{struct_col}.*", *keep)


def discover_map_keys(df: DataFrame, map_col: str) -> list[str]:
    """Dynamic schema discovery: distinct keys of a map column.

    The reference does explode → distinct → collect
    (chicago_taxi_trips_silver.ipynb:39-43). This is inherently a
    driver round-trip (a separate job) — documented two-job operator.
    """
    rows = (
        df.select(F.explode(F.map_keys(F.col(map_col))).alias("k"))
        .distinct()
        .collect()
    )
    return sorted(r["k"] for r in rows)


def map_pivot(df: DataFrame, map_col: str, keys: Sequence[str] | None = None,
              keep: Sequence[str] = ()) -> DataFrame:
    """P3: pivot a ``map<string,string>`` column's keys into columns
    (chicago_taxi_trips_silver.ipynb:45-48). ``keys=None`` triggers
    dynamic discovery (extra job)."""
    if keys is None:
        keys = discover_map_keys(df, map_col)
    exprs = [F.col(map_col).getItem(k).alias(k) for k in keys]
    return df.select(*keep, *exprs)


def parse_json_column(df: DataFrame, json_col: str, schema, keep: Sequence[str] = (),
                      out_col: str = "value") -> DataFrame:
    """F6: parse a JSON-string payload into a typed struct
    (chicago_weather_bronze.py:43). ``schema`` is a StructType or DDL string."""
    return df.withColumn(out_col, F.from_json(F.col(json_col), schema)).select(
        *keep, out_col
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    *,
    strict: bool = False,
) -> DataFrame:
    """JSON-Lines scan — the interchange format text corpora actually
    ship in (one JSON object per line; Spark's json source default).

    Always pass ``schema`` in production: schema inference is a full
    extra pass over the data, and at corpus scale the inferred union of
    every record's fields is rarely the schema you meant. ``strict=True``
    switches the parser from PERMISSIVE (malformed lines become NULL
    rows) to FAILFAST; the default keeps a ``_corrupt_record`` column
    when no schema is given so a crawl-cleaning job can route bad lines
    instead of dying mid-scan.
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.option(
        "mode", "FAILFAST" if strict else "PERMISSIVE"
    ).json(path)
