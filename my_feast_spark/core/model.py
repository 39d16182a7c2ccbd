"""Feature-store data model — Entity / Feature / FeatureView / FileSource.

Mirrors the reference's registry objects (SURVEY §1.1):
  * Entity: named join key with a value type, logical name separate from
    physical join_keys (`Entity(name="driver", join_keys=["taxi_id"])`,
    fs-hadoop/Untitled.ipynb:260; chicago_taxi_trips_hourly_gold.ipynb:148);
  * Feature: (name, dtype) declaration
    (chicago_taxi_trips_hourly_gold.ipynb:132-146);
  * FeatureView: features over one source, bound to entities, optional TTL
    (trip_stats_fv.ipynb:457-466);
  * FileSource: format+path+timestamp_field+created_timestamp_column
    (SparkSource, chicago_taxi_trips_hourly_gold.ipynb:123-130,
    chicago_weather_hourly_fs.py:78-84).

These are plain dataclasses serialized to JSON by the registry; declared
feature dtypes drive the retrieval-time cast (the reference's
ValueType.FLOAT vs Spark-double mismatch, SURVEY §1.3).
"""

from __future__ import annotations

import datetime as dt
from dataclasses import asdict, dataclass, field

#: Declared feature/entity value types -> Spark cast targets.
#: (The reference's ValueType enum names; Float32 per the registry dump
#: `schema = [avg_trip_time-Float32, ...]`.)
VALUE_TYPE_TO_SPARK = {
    "STRING": "string",
    "INT32": "int",
    "INT64": "bigint",
    "FLOAT": "float",
    "DOUBLE": "double",
    "BOOL": "boolean",
    "BYTES": "binary",
    "TIMESTAMP": "timestamp",
    "DATE": "date",
    "FLOAT_LIST": "array<float>",
    "STRING_LIST": "array<string>",
}


@dataclass
class Entity:
    name: str
    value_type: str = "STRING"
    join_keys: list[str] = field(default_factory=list)
    description: str = ""

    def __post_init__(self):
        if not self.join_keys:
            # logical name doubles as the physical key (the common case:
            # Entity(name="taxi_id", value_type=STRING))
            self.join_keys = [self.name]
        if self.value_type not in VALUE_TYPE_TO_SPARK:
            raise ValueError(f"unknown value_type {self.value_type!r}")


@dataclass
class Feature:
    name: str
    dtype: str = "DOUBLE"

    def __post_init__(self):
        if self.dtype not in VALUE_TYPE_TO_SPARK:
            raise ValueError(f"unknown dtype {self.dtype!r}")

    @property
    def spark_type(self) -> str:
        return VALUE_TYPE_TO_SPARK[self.dtype]


@dataclass
class FileSource:
    """Pointer to physical data (the reference's SparkSource).

    ``file_format="versioned"`` addresses a versioned parquet table
    (``sources/versioned.py`` — the transaction-log layout standing in
    for the reference cloud tier's Delta, CASE.MD:107): ``path`` is the
    table root and reads resolve through the manifest log. ``version``
    optionally PINS the source to one committed version — the
    reproducible-training-set contract (every retrieval/materialize
    over this source reads the same bytes forever, appends after the
    pin invisible); ``None`` follows the latest commit. Per-call
    ``as_of_version`` on :meth:`FeatureStore.get_historical_features` /
    :meth:`FeatureStore.materialize` overrides the pin."""

    path: str
    file_format: str = "parquet"
    timestamp_field: str = "event_timestamp"
    created_timestamp_column: str | None = None
    name: str = ""
    version: int | None = None

    def load(self, spark, *, version: int | None = None,
             as_of_timestamp=None):
        """``as_of_timestamp`` (TIMESTAMP AS OF) > ``version``
        (call-site override) > ``self.version`` (pinned) > latest. Only
        meaningful for ``file_format="versioned"`` — passing either for
        a plain file format raises rather than silently reading the
        un-versioned path."""
        if self.file_format == "versioned":
            from my_feast_spark.sources.versioned import read_version

            if as_of_timestamp is not None:
                return read_version(
                    spark, self.path, as_of_timestamp=as_of_timestamp
                )
            v = version if version is not None else self.version
            return read_version(spark, self.path, v)
        if (
            version is not None
            or as_of_timestamp is not None
            or self.version is not None
        ):
            raise ValueError(
                f"source {self.name or self.path!r} has file_format="
                f"{self.file_format!r}; version pinning requires "
                "file_format='versioned'"
            )
        reader = spark.read.format(self.file_format)
        if self.file_format == "csv":
            reader = reader.option("header", True)
        return reader.load(self.path)


@dataclass
class FeatureView:
    name: str
    entities: list[str]
    features: list[Feature]
    source: FileSource
    ttl: dt.timedelta | None = None
    description: str = ""

    def feature_names(self) -> list[str]:
        return [f.name for f in self.features]


def resolve_as_of(as_of_version, view_name: str):
    """Per-view pinned version from an ``as_of_version`` argument (int
    applies to every view; dict maps view name -> version; None follows
    each source's own pin/latest) — the one resolution both
    ``get_historical_features`` and ``materialize`` use."""
    if isinstance(as_of_version, dict):
        return as_of_version.get(view_name)
    return as_of_version


def check_as_of_views(as_of_version, known_views) -> None:
    """A dict ``as_of_version`` naming a view that is not part of this
    call is almost certainly a typo — and a typo here silently reads
    the MUTABLE latest state, violating the reproducible-training-set
    contract (review-caught). Fail loudly instead."""
    if not isinstance(as_of_version, dict):
        return
    unknown = set(as_of_version) - set(known_views)
    if unknown:
        raise KeyError(
            f"as_of_version names views {sorted(unknown)} not in this "
            f"call's views {sorted(known_views)}"
        )


# --- JSON (de)serialization -------------------------------------------------

def to_json_dict(obj) -> dict:
    d = asdict(obj)
    if isinstance(obj, FeatureView):
        d["ttl_seconds"] = obj.ttl.total_seconds() if obj.ttl else None
        d.pop("ttl")
    return d


def entity_from_dict(d: dict) -> Entity:
    return Entity(**{k: d[k] for k in ("name", "value_type", "join_keys", "description")})


def feature_view_from_dict(d: dict) -> FeatureView:
    ttl_s = d.get("ttl_seconds")
    return FeatureView(
        name=d["name"],
        entities=list(d["entities"]),
        features=[Feature(**f) for f in d["features"]],
        source=FileSource(**d["source"]),
        ttl=dt.timedelta(seconds=ttl_s) if ttl_s else None,
        description=d.get("description", ""),
    )
