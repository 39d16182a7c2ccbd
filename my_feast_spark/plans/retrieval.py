"""Historical-retrieval plan builder.

Where the reference renders a Jinja SQL template per feature view
(the 4-stage CTE pipeline, CASE.MD:339-502) and feeds it to spark.sql(),
we compose the equivalent logical plan directly with the DataFrame API —
entity dedup is unnecessary (the union_window PIT join is linear in probes,
not quadratic), column pruning happens before the join, and declared
feature dtypes are cast on the way out (Float32 contract, SURVEY §1.3).

Multi-view shape (the reference's own J5 merge, CASE.MD:486-501): one
surrogate row id on the entity dataframe, each view's PIT join runs
against the NARROW ``(row_id, join keys, ts)`` projection of it, and the
feature payloads are left-joined back on the row id at the end. A naive
alternative — chaining PIT joins so view k+1's window re-shuffles the
probe relation with all previously attached payloads — shuffles
increasingly wide rows V times; the narrow shape keeps every per-view
window shuffle at probe-key width and makes the V view jobs independent
(Spark schedules their stages concurrently). The entity relation is
localCheckpoint-pinned (lazily) so the row id — partition-based and
therefore only stable within one materialization — is assigned exactly
once and every branch reads the same blocks; the checkpoint is handed to
the caller via ``_owned_checkpoints`` per the repo ownership rule.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from my_feast_spark.core.model import (
    FeatureView,
    check_as_of_views,
    resolve_as_of,
)
from my_feast_spark.operators.asof_join import point_in_time_join

#: surrogate probe row id for the multi-view narrow-probe merge
ROW_ID = "__mfs_probe_row_id"


def parse_feature_refs(features: Sequence[str]) -> dict[str, list[str]]:
    """``"view:feature"`` refs (M8, explore_features.ipynb:428-431) →
    {view: [features...]}, preserving order."""
    out: dict[str, list[str]] = {}
    for ref in features:
        if ":" not in ref:
            raise ValueError(f"feature ref {ref!r} is not 'view:feature'")
        view, feat = ref.split(":", 1)
        out.setdefault(view, []).append(feat)
    return out


class RetrievalJob:
    """Lazy retrieval handle (the reference's RetrievalJob: ``.to_spark_df()``,
    ``.to_df()``, ``.query`` — explore_features.ipynb:443, Untitled.ipynb:675-698).

    ``.plan`` exposes the physical plan the way ``.query`` exposed the SQL.

    Lifecycle: a MULTI-view retrieval pins the entity dataframe with a
    localCheckpoint (module docstring) whose blocks outlive any one
    action — call :meth:`release` (or use the job as a context manager)
    once the results are consumed, or a long-lived session accumulates
    one pinned entity copy per job. Single-view jobs pin nothing;
    release is always a safe no-op.
    """

    def __init__(self, df: DataFrame):
        self._df = df

    def release(self) -> None:
        """Release the checkpoint blocks this job's plan pins
        (idempotent; no-op for single-view retrievals)."""
        from my_feast_spark.operators.graph import release_checkpoint

        for c in getattr(self._df, "_owned_checkpoints", ()):
            release_checkpoint(c)
        self._df._owned_checkpoints = []

    def __enter__(self) -> "RetrievalJob":
        return self

    def __exit__(self, *exc) -> None:
        self.release()

    def to_spark_df(self) -> DataFrame:
        return self._df

    def to_df(self):
        return self._df.toPandas()

    @property
    def plan(self) -> str:
        return self._df._jdf.queryExecution().explainString(
            self._df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )

    @property
    def query(self) -> str:
        """Textual-plan accessor named for parity with the reference's
        ``job.query`` (the generated SQL, Untitled.ipynb:675-698). Spark
        declares plans rather than SQL strings, so this exposes the same
        information in plan form."""
        return self.plan

    def to_pandas_on_spark(self):
        """Distributed pandas API over the retrieval result (S14 —
        get_hist_feat.ipynb:418 ``to_pandas_on_spark``): unlike
        ``to_df()`` nothing is collected to the driver."""
        return self._df.pandas_api()

    def explain(self, mode: str = "formatted") -> None:
        self._df.explain(mode)


def build_historical_retrieval(
    spark: SparkSession,
    entity_df: DataFrame,
    feature_views: dict[str, FeatureView],
    entity_join_keys: dict[str, list[str]],
    features: Sequence[str],
    *,
    entity_ts_col: str = "event_timestamp",
    full_feature_names: bool = False,
    strategy: str = "union_window",
    as_of_version: int | dict | None = None,
    as_of_timestamp=None,
) -> DataFrame:
    """Compose the multi-view PIT retrieval plan.

    ``feature_views``: resolved views by name; ``entity_join_keys``:
    entity-name -> physical join keys (Entity.join_keys indirection,
    Untitled.ipynb:260). ``strategy`` passes through to every view's
    :func:`point_in_time_join` — "auto" probes each view's key
    distribution (see asof_join) when the skew profile is unknown.

    ``as_of_timestamp`` (datetime or epoch seconds — one wall-clock
    instant is meaningful across every view, unlike version numbers, so
    it takes no per-view dict) reads each versioned source TIMESTAMP AS
    OF; ``as_of_version`` time-travels versioned sources (the
    reproducible-training-set contract the reference's cloud tier gets
    from Delta):
    an int applies to every requested view — each must then be backed
    by a versioned source, a plain file source raises loudly rather
    than silently reading its mutable latest state — a dict maps view
    name -> version for mixed repos (unnamed views follow their
    source's own pin/latest).
    """
    refs = parse_feature_refs(features)
    check_as_of_views(as_of_version, refs)
    if as_of_timestamp is not None and as_of_version is not None:
        raise ValueError("pass as_of_version OR as_of_timestamp, not both")

    def _view_pit(probe, view_name, feat_names):
        fv = feature_views[view_name]
        join_keys: list[str] = []
        for ent in fv.entities:
            join_keys.extend(entity_join_keys[ent])
        declared = {f.name: f for f in fv.features}
        unknown = [f for f in feat_names if f not in declared]
        if unknown:
            raise KeyError(f"view {view_name!r} has no features {unknown}")

        src = fv.source
        feature_df = src.load(
            spark,
            version=resolve_as_of(as_of_version, view_name),
            as_of_timestamp=as_of_timestamp,
        )
        # column pruning before the join: keys + timestamps + requested only
        keep = (
            join_keys
            + [src.timestamp_field]
            + ([src.created_timestamp_column] if src.created_timestamp_column else [])
            + feat_names
        )
        feature_df = feature_df.select(*keep)
        # cast to declared dtypes (Float32 contract) before attaching
        for f in feat_names:
            feature_df = feature_df.withColumn(
                f, F.col(f).cast(declared[f].spark_type)
            )
        return join_keys, point_in_time_join(
            probe,
            feature_df,
            join_keys,
            event_ts_col=src.timestamp_field,
            entity_ts_col=entity_ts_col,
            created_ts_col=src.created_timestamp_column,
            ttl=fv.ttl,
            features=feat_names,
            feature_view_name=view_name,
            full_feature_names=full_feature_names,
            strategy=strategy,
        )

    if len(refs) <= 1:
        # single view: the PIT window carries the entity payload through
        # directly — a row id + join-back would only add a shuffle
        out = entity_df
        for view_name, feat_names in refs.items():
            _keys, out = _view_pit(out, view_name, feat_names)
        return out

    # multi-view: narrow-probe + payload join-back (module docstring).
    # The lazy localCheckpoint materializes the id assignment exactly
    # once, on the job's first action; every per-view probe and the
    # final join-back then read the same pinned blocks, so the
    # partition-based id is consistent across plan branches.
    base = entity_df.withColumn(
        ROW_ID, F.monotonically_increasing_id()
    ).localCheckpoint(eager=False)
    out = base
    for view_name, feat_names in refs.items():
        fv = feature_views[view_name]
        view_keys: list[str] = []
        for ent in fv.entities:
            view_keys.extend(entity_join_keys[ent])
        probe = base.select(
            ROW_ID, *dict.fromkeys(view_keys), entity_ts_col
        )
        _keys, attached = _view_pit(probe, view_name, feat_names)
        payload = attached.drop(*dict.fromkeys(view_keys), entity_ts_col)
        out = out.join(payload, on=ROW_ID, how="left")
    out = out.drop(ROW_ID)
    out._owned_checkpoints = [base]
    return out
