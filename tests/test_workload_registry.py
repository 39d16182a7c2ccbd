"""Guard the driver-adjudication window (workload.QUERIES ordering).

The driver writes CORRECTNESS rows for the FIRST ADJUDICATION_WINDOW
entries of queries() only; anything past that silently loses its
round-over-round correctness row. These tests make window membership an
explicit, reviewed decision: growing the registry or reordering it must
update the expected rotation here, never silently drop coverage.
"""

from __future__ import annotations

from my_feast_spark import workload

# Round-8 rotation: the 43 r7-tail queries (last adjudicated round 6)
# are back IN the window (plus tier 1 and the round-8 NEW entries); the
# queries adjudicated green in round 7 sit in the tail this round and
# return in round 9.
ROTATION_TAIL = {
    # curation_pipeline_full's round-8 change is documentation only (the
    # NB evidence-cut rule worded to match the implementation, per the
    # r7 ADVICE) — output identical
    "curation_pipeline_full",
    "ivfpq_topk",
    "normalize_text",
    "image_dedup",
    # stream_capture_files / streaming_neardup_ingest round-8 changes
    # are scratch-dir lifecycle only (atexit cleanup of the tempdirs) —
    # same staged inputs, identical outputs, pinned by
    # tests/test_oracle_parity.py
    "streaming_neardup_ingest",
    "curation_pipeline",
    "minhash_dup_pairs",
    "dedup_clusters",
    "packed_sequences",
    "mixture_temperature",
    "length_bucket_batches",
    "token_rarity",
    "bpe_pair_counts",
    "boilerplate_ngrams",
    "global_shuffle",
    "incremental_dedup",
    "column_profile",
    "cluster_keep_longest",
    "stratum_ksample",
    "profile_drift",
    "token_pmi",
    "inverted_index",
    "doc_fingerprints",
    "exact_dedup_docs",
    "jaccard_dup_pairs",
    "online_snapshot",
    "contamination_report",
    "avro_scan",
    "multimodal_frames",
    "stream_capture_files",
    "cosine_topk",
    "ann_lsh_topk",
    "label_centroids",
    "multimodal_decode",
    "regex_mentions",
    "top_terms_tfidf",
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

#: last adjudicated in round 6 — round 8 MUST give them fresh rows
#: (the rotation invariant: nothing sits out two consecutive rounds)
ROTATED_IN = {
    "scd2_user_state",
    "bpe_merge_replay",
    "vocab_encode_join",
    "span_removal",
    "lm_perplexity",
    "nb_quality_score",
    "semdedup",
    "pq_topk",
    "pricing_summary",
    "feature_store_retrieval",
    "streaming_sessionize",
    "streaming_hourly_agg",
    "repetition_filter",
    "corpus_vocab",
    "online_lookup",
    "streaming_dedup",
    "lang_id",
    "pii_redaction",
    "train_val_split",
    "ivf_topk",
    "embedding_near_dupes_lsh",
    "simhash_dup_pairs",
    "revenue_rollup",
    "dedup_entity_rows",
    "latest_event_per_user",
    "priority_collapse_types",
    "part_brand_stats",
    "idle_customers_anti",
    "case_decode_coalesce",
    "map_pivot_props",
    "datetime_functions",
    "regional_revenue",
    "order_priority_count",
    "top_spenders",
    "user_value_deltas",
}

#: new in round 8, or BEHAVIOR changed in round 8 — must be in-window
#: so the change gets an adjudication row
CHANGED_OR_NEW_THIS_ROUND = {
    # new: the GPT-3 Pareto quality-weighted sampler, promoted
    "score_weighted_sample",
    # new: the perceptual audio dedup tier, promoted
    "audio_dedup",
    # new: the video (frame-set MinHash) dedup tier, promoted
    "video_dedup",
    # new: the Gopher rule-based quality gate
    "gopher_quality_filter",
    # new: CCNet-style sub-document (chunk) exact dedup
    "chunk_dedup",
    # new: CCNet head/middle/tail perplexity terciles
    "ccnet_buckets",
    # new: streaming semantic (embedding-LSH) near-dup ingest, promoted
    "streaming_embedding_ingest",
    # new: the LSH recall audit, promoted
    "lsh_recall",
    # new: interpolated Kneser-Ney perplexity scoring
    "lm_perplexity_kn",
    # new: content-defined (rolling-hash boundary) chunk dedup
    "cdc_chunk_dedup",
    # changed (also in ROTATED_IN): avg_value moved to the
    # order-independent decimal-sum + floor-round form after the
    # tri-scale parity sweep caught a 4dp boundary flip at sf0.1
    "streaming_hourly_agg",
    # changed: every remaining IN-WINDOW round(avg(double), dp) site
    # moved to the same stable form (_stable_round_avg) — quotients of
    # 2dp-grained sources can sit exactly on a .5 round boundary where
    # the engines' native round() diverge by representation; fixed now
    # while the queries are in-window so the migration costs no
    # rotation slot. pricing_summary additionally moves its
    # disc_price/charge sums to exact decimal arithmetic (4dp/6dp
    # grains CAN hit .005 boundaries; plain 2dp sums of 2dp sources
    # cannot and stay native). Tail queries with the same latent shape
    # (moving_avg_revenue, token_rarity, label_centroids,
    # lineitem_unpivot...) are deliberately NOT churned — a behavior
    # change would force them in-window — and migrate when they rotate
    # in anyway (round 9).
    "pit_user_features",
    "hourly_user_agg",
    "hourly_global_agg",
    "pricing_summary",
    "part_brand_stats",
    "feature_store_retrieval",
}

#: retired from the driver registry — near-duplicates of in-registry
#: coverage, still oracle-checked by test_oracle_parity.py
RETIRED_THIS_ROUND = {
    # round 6
    "filtered_agg",
    "json_props_extract",
    "struct_flatten",
    # round 7
    "vocab_encode",
    "embedding_near_dupes",
    "sequence_packing",
    "hash_sampled_docs",
    # round 8
    "corpus_mixture",
    "token_stats",
    "doc_chunks",
    "value_percentiles",
    "stratified_sample_docs",
    "quality_score",
    "length_outlier_filter",
    "promo_revenue",
}


def test_window_contains_rotated_in_queries():
    window = list(workload.QUERIES)[: workload.ADJUDICATION_WINDOW]
    assert ROTATED_IN <= set(window)


def test_window_contains_every_changed_or_new_query():
    window = list(workload.QUERIES)[: workload.ADJUDICATION_WINDOW]
    assert CHANGED_OR_NEW_THIS_ROUND <= set(window)


def test_tail_is_exactly_the_declared_rotation():
    tail = list(workload.QUERIES)[workload.ADJUDICATION_WINDOW:]
    assert set(tail) == ROTATION_TAIL, (
        "adjudication-window overflow changed: update the rotation plan "
        "in workload.py and here explicitly"
    )


def test_retired_set_is_exactly_the_declared_one():
    assert set(workload.RETIRED_QUERIES) == RETIRED_THIS_ROUND
    assert not (set(workload.RETIRED_QUERIES) & set(workload.QUERIES)), (
        "a query cannot be both retired and registered"
    )


def test_registry_stays_inside_the_driver_budget():
    # driver budget: ~100 adjudicated queries; the window itself is 50
    assert len(workload.QUERIES) <= 100
    assert len(workload.QUERIES) >= workload.ADJUDICATION_WINDOW


def test_every_query_is_oracle_backed():
    missing = [
        name
        for name, (_fn, sql) in {**workload.QUERIES,
                                 **workload.RETIRED_QUERIES}.items()
        if workload.resolve_sql(sql) is None
    ]
    assert not missing, f"queries without a DuckDB oracle: {missing}"


def test_generated_oracles_are_lazy_at_import():
    """Importing workload must not run the generated-oracle builders
    (k-means, PQ, BPE training over the oracle parquet) — they resolve
    memoized on first use (workload._LazySQL / resolve_sql)."""
    import subprocess
    import sys

    out = subprocess.check_output([
        sys.executable,
        "-c",
        "from my_feast_spark import workload; "
        "print(workload.SQL_PQ_TOPK._done, workload.SQL_SEMDEDUP._done, "
        "workload.SQL_BPE_MERGE_REPLAY._done, workload.SQL_IVFPQ_TOPK._done)",
    ])
    assert out.split() == [b"False"] * 4
    assert workload.resolve_sql(workload.SQL_PQ_TOPK) == (
        workload.SQL_PQ_TOPK.resolve()
    )
