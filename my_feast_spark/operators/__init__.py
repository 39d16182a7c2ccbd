from my_feast_spark.operators.aggregations import (
    latest_per_key,
    scd2_intervals,
    scd2_lookup,
    time_bucket_agg,
)
from my_feast_spark.operators.asof_join import point_in_time_join
from my_feast_spark.operators.bpe import train_bpe_merges
from my_feast_spark.operators.wordpiece import (
    train_wordpiece,
    wordpiece_encode,
)
from my_feast_spark.operators.bloom import (
    bloom_auto_geometry,
    bloom_bitmap,
    bloom_maybe_contains,
    bloom_maybe_from_bitmap,
    bloom_position_set,
)
from my_feast_spark.operators.classifier import score_nb, train_nb
from my_feast_spark.operators.curation import CurationConfig, curate
from my_feast_spark.operators.dedup_eval import lsh_recall_report
from my_feast_spark.operators.dsir import (
    dsir_logweights,
    dsir_resample,
    fit_dsir,
    read_dsir_model,
    write_dsir_model,
)
from my_feast_spark.operators.lm import (
    score_docs,
    score_docs_kn,
    train_bigram_kn,
    train_bigram_lm,
)
from my_feast_spark.operators.graph import (
    connected_components,
    pagerank_fixedpoint,
)
from my_feast_spark.operators.sketches import (
    cms_build,
    cms_estimate,
    hll_time_rollup,
    skew_report,
    hll_estimate,
    hll_group_distinct,
    hll_registers,
    kmv_sketch,
    kmv_union,
)
from my_feast_spark.operators.unigram import (
    train_unigram,
    unigram_encode,
)
from my_feast_spark.operators.packing import pack_bfd, packing_stats
from my_feast_spark.operators.pq import (
    ivfpq_append,
    ivfpq_build,
    ivfpq_search,
    ivfpq_topk,
    pq_encode,
    pq_topk,
    read_ivfpq_index,
    train_pq_codebooks,
    write_ivfpq_index,
)
from my_feast_spark.operators.profile import column_profile
from my_feast_spark.operators.span_dedup import remove_repeated_spans
from my_feast_spark.operators.sampling import (
    sample_bucket,
    shuffle_layout,
    stratified_sample,
)
from my_feast_spark.operators.similarity import semdedup
from my_feast_spark.operators.urls import blocklist_filter, domain_quota

__all__ = [
    "point_in_time_join",
    "time_bucket_agg",
    "latest_per_key",
    "scd2_intervals",
    "scd2_lookup",
    "curate",
    "CurationConfig",
    "connected_components",
    "lsh_recall_report",
    "train_bpe_merges",
    "train_wordpiece",
    "wordpiece_encode",
    "train_bigram_lm",
    "train_bigram_kn",
    "score_docs",
    "score_docs_kn",
    "train_nb",
    "score_nb",
    "fit_dsir",
    "dsir_logweights",
    "dsir_resample",
    "write_dsir_model",
    "read_dsir_model",
    "semdedup",
    "train_pq_codebooks",
    "pq_encode",
    "pq_topk",
    "ivfpq_topk",
    "ivfpq_build",
    "ivfpq_append",
    "ivfpq_search",
    "write_ivfpq_index",
    "read_ivfpq_index",
    "remove_repeated_spans",
    "pack_bfd",
    "train_unigram",
    "unigram_encode",
    "packing_stats",
    "pagerank_fixedpoint",
    "domain_quota",
    "blocklist_filter",
    "stratified_sample",
    "sample_bucket",
    "shuffle_layout",
    "column_profile",
    "kmv_sketch",
    "kmv_union",
    "cms_build",
    "cms_estimate",
    "skew_report",
    "hll_time_rollup",
    "hll_registers",
    "hll_estimate",
    "hll_group_distinct",
    "bloom_auto_geometry",
    "bloom_position_set",
    "bloom_maybe_contains",
    "bloom_bitmap",
    "bloom_maybe_from_bitmap",
]
