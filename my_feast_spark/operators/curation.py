"""The end-to-end training-data curation pipeline as ONE library
operator.

``curate`` assembles the tier's building blocks in the order a real
100 TB curation run wants them:

  1. exact dedup   — keep the min-id doc per content fingerprint
                     (window over the fingerprint: ONE corpus shuffle;
                     a keeper-set join-back would be a second one);
  2. decontaminate — optional: drop docs sharing word n-grams with a
                     benchmark set (benchmark shingles broadcast —
                     ``operators/decontamination.py``);
  3. near-dup prune— optional: MinHash-LSH pairs -> connected
                     components -> keep each cluster's min-id doc
                     (``operators/dedup.py`` + ``operators/graph.py``);
  4. repetition    — Gopher-style top-token / duplicate-2-gram filter
                     (map-only, O(n log n) per row);
  5. sample        — deterministic stratified hash-bucket sampling
                     (map-only, replayable — ``operators/sampling.py``);
  6. accounting    — per-doc token and chunk counts for the mixture
                     report (pure arithmetic, no chunk text rendered).

Scale notes. The token array is projected ONCE, before the dedup
window, and carried through the single corpus shuffle in place of
re-tokenizing per stage — stages 4-6 consume the projected column, and
because the repetition predicate references a non-partition column it
can never be pushed below the window and re-expanded into duplicate
token computations. The optional stages (2, 3) anti-join on the doc id
only: the contaminated-id and non-representative-id relations are
orders of magnitude smaller than the corpus (AQE broadcasts them when
they fit), and the corpus side keeps its dedup partitioning. Raw text
is carried past the window only when an optional stage needs to
re-shingle it.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window, functions as F

from my_feast_spark.functions.text import (
    chunk_count,
    doc_fingerprint,
    repetition_features_arr,
    tokens,
)
from my_feast_spark.operators.sampling import stratified_sample


@dataclass
class CurationConfig:
    """Knobs for ``curate``; defaults match the workload's oracle query."""

    id_col: str = "doc_id"
    text_col: str = "text"
    stratum_col: str = "lang"
    #: stratum -> keep rate; None disables the sampling stage
    sample_rates: dict[str, float] | None = None
    default_rate: float = 0.0
    salt: str = "mix"
    max_top_token_frac: float = 0.12
    max_dup_2gram_frac: float = 0.05
    chunk_size: int = 50
    chunk_stride: int = 25
    # --- optional: benchmark decontamination (needs benchmark_df) -----
    decontaminate_ngram: int = 4
    decontaminate_min_hits: int = 1
    # --- optional: near-dup cluster pruning ---------------------------
    #: None disables; "minhash" = MinHash-LSH pairs -> CC -> keep min id
    near_dup: str | None = None
    near_dup_threshold: float = 0.5
    near_dup_shingle_n: int = 3
    near_dup_hash_fn: str = "xxhash64"
    near_dup_kwargs: dict = field(default_factory=dict)


def curate(
    df: DataFrame,
    config: CurationConfig | None = None,
    *,
    benchmark_df: DataFrame | None = None,
) -> DataFrame:
    """Run the curation pipeline; returns the accounting relation
    ``(id, stratum, n_tokens, n_chunks)`` of the surviving documents."""
    cfg = config or CurationConfig()
    did, text, stratum = cfg.id_col, cfg.text_col, cfg.stratum_col
    needs_text = benchmark_df is not None or cfg.near_dup is not None

    # Tokenize ONCE, before the dedup shuffle: every later stage reads
    # the projected array (roughly the bytes of the text it replaces).
    staged_cols = [
        F.col(did),
        F.col(stratum),
        doc_fingerprint(F.col(text)).alias("__fp"),
        tokens(F.col(text)).alias("__toks"),
    ]
    if needs_text:
        staged_cols.insert(2, F.col(text))
    staged = df.select(*staged_cols)

    # 1. exact dedup: min-id doc per fingerprint, one corpus shuffle
    w = Window.partitionBy("__fp").orderBy(did)
    deduped = (
        staged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__fp")
    )
    if needs_text:
        # The optional stages fan the deduped corpus out to multiple
        # consumers (contamination train side, the near-dup pair
        # generator, and the main chain) whose differing column pruning
        # defeats Spark's ReuseExchange — without a cache each consumer
        # would re-scan and re-shuffle the corpus. MEMORY_AND_DISK
        # persist (the default) spills at scale; the near-dup stage's
        # eager candidate materialization populates it first, so later
        # consumers read the cache.
        deduped = deduped.persist()

    # 2. benchmark decontamination (optional)
    if benchmark_df is not None:
        from my_feast_spark.operators.decontamination import contamination_report

        contaminated = contamination_report(
            deduped,
            benchmark_df,
            did,
            text,
            n=cfg.decontaminate_ngram,
            min_hits=cfg.decontaminate_min_hits,
        ).select(F.col("doc_id").alias(did))
        deduped = deduped.join(contaminated, did, "left_anti")

    # 3. near-dup cluster pruning (optional): pairs -> components ->
    #    drop everything but each cluster's min-id representative
    if cfg.near_dup is not None:
        if cfg.near_dup != "minhash":
            raise ValueError(f"unknown near_dup method: {cfg.near_dup!r}")
        from my_feast_spark.operators.dedup import minhash_lsh_dup_pairs
        from my_feast_spark.operators.graph import connected_components

        pairs = minhash_lsh_dup_pairs(
            deduped,
            did,
            text,
            n=cfg.near_dup_shingle_n,
            threshold=cfg.near_dup_threshold,
            hash_fn=cfg.near_dup_hash_fn,
            **cfg.near_dup_kwargs,
        )
        clusters = connected_components(pairs, "doc_a", "doc_b")
        dropped = clusters.filter(F.col("id") != F.col("cluster_id")).select(
            F.col("id").alias(did)
        )
        deduped = deduped.join(dropped, did, "left_anti")

    # 4. repetition filter — map-only; predicate on __toks cannot cross
    #    the dedup window, so the projected array is never re-expanded
    feats = repetition_features_arr(F.transform(F.col("__toks"), F.lower))
    clean = deduped.filter(
        (feats["top_token_frac"] <= cfg.max_top_token_frac)
        & (feats["dup_2gram_frac"] <= cfg.max_dup_2gram_frac)
    )

    # 5. deterministic stratified sampling — map-only
    if cfg.sample_rates is not None:
        clean = stratified_sample(
            clean,
            stratum,
            cfg.sample_rates,
            did,
            default_rate=cfg.default_rate,
            salt=cfg.salt,
        )

    # 6. accounting projection — counts only, no chunk text rendered
    return clean.select(
        did,
        stratum,
        F.size(F.col("__toks")).alias("n_tokens"),
        chunk_count(
            F.col("__toks"), size=cfg.chunk_size, stride=cfg.chunk_stride
        ).alias("n_chunks"),
    )
