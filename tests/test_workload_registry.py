"""Guard the driver-adjudication window (workload.QUERIES ordering).

The driver writes CORRECTNESS rows for the FIRST ADJUDICATION_WINDOW
entries of queries() only; anything past that silently loses its
round-over-round correctness row. These tests make window membership an
explicit, reviewed decision: growing the registry or reordering it must
update the expected rotation here, never silently drop coverage.
"""

from __future__ import annotations

from my_feast_spark import workload

# Round-3 rotation: set-op extras (last adjudicated round 1) are IN the
# window; the scalar-shape queries (adjudicated rounds 1 AND 2) sit in
# the tail this round. Next round swaps them back.
ROTATION_TAIL = {
    "json_props_extract",
    "case_decode_coalesce",
    "map_pivot_props",
    "struct_flatten",
    "datetime_functions",
    "regional_revenue",
    "order_priority_count",
    "top_spenders",
    "promo_revenue",
    "user_value_deltas",
    # demoted mid-round-3 to make window room for the six queries that
    # had NO adjudication row yet (dedup_clusters, multimodal_frames,
    # stream_capture_files, contamination_report, repetition_filter,
    # pii_redaction); all six demotions were green in rounds 1 AND 2
    "filtered_agg",
    "token_stats",
    "hash_sampled_docs",
    "revenue_rollup",
    "dedup_entity_rows",
    "latest_event_per_user",
    "priority_collapse_types",
    "part_brand_stats",
    "idle_customers_anti",
}

#: queries that have never had a CORRECTNESS row — must be in-window
NEVER_ADJUDICATED = {
    "dedup_clusters",
    "multimodal_frames",
    "stream_capture_files",
    "contamination_report",
    "repetition_filter",
    "pii_redaction",
    "stratified_sample_docs",
    "corpus_mixture",
    "curation_pipeline",
    "avro_scan",
}

SETOP_EXTRAS = {
    "user_cohort_sets",
    "moving_avg_revenue",
    "returnflag_cube",
    "small_quantity_revenue",
    "event_type_pivot",
    "post_signup_activity",
    "batch_sessions",
    "lineitem_unpivot",
    "customer_balance_deciles",
}


def test_window_contains_rotated_in_queries():
    window = list(workload.QUERIES)[: workload.ADJUDICATION_WINDOW]
    assert SETOP_EXTRAS <= set(window)


def test_window_contains_every_never_adjudicated_query():
    window = list(workload.QUERIES)[: workload.ADJUDICATION_WINDOW]
    assert NEVER_ADJUDICATED <= set(window)


def test_tail_is_exactly_the_declared_rotation():
    tail = list(workload.QUERIES)[workload.ADJUDICATION_WINDOW:]
    assert set(tail) == ROTATION_TAIL, (
        "adjudication-window overflow changed: update the rotation plan "
        "in workload.py and here explicitly"
    )


def test_every_query_is_oracle_backed():
    missing = [name for name, (_fn, sql) in workload.QUERIES.items() if sql is None]
    assert not missing, f"queries without a DuckDB oracle: {missing}"
