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

Scale notes. The LOWERCASED token array is projected ONCE, before the
dedup window, and carried through the single corpus shuffle in place of
the text: the repetition filter (4) and accounting (6) consume it
directly, and the optional shingle consumers (2, 3) shingle from it via
``tokens_col`` — raw text never crosses the shuffle at all, and no
stage re-tokenizes. Because the repetition predicate references a
non-partition column it can never be pushed below the window and
re-expanded into duplicate token computations.

When optional stages are on, the narrow deduped relation
``(id, stratum, __ltoks)`` is persisted only for the duration of this
call: the optional stages are resolved EAGERLY into a (small)
dropped-id relation pinned with ``localCheckpoint``, then every cache —
including the ones the near-dup pair generator owns — is released
before returning. The exact-dedup window's LOSERS (an id-only,
column-pruned anti-join computed while the survivor cache is live) are
folded into that dropped-id set, so the final plan is ONE map-only
tokenize pass plus ONE anti-join against the materialized ids (AQE
broadcasts them when small) — the fingerprint md5 and the corpus-wide
window Exchange never run a second time. No corpus-sized cache outlives
the call, the cached bytes during it are the token arrays alone (no
text, no fingerprint), and what downstream consumption re-derives from
the source scan is a map-only projection — the shape you want at
100 TB, where holding a corpus-sized cache through the consuming job is
worse than one extra scan, and where the id relation the anti-join
ships is orders of magnitude narrower than the token arrays a
re-derived window would re-shuffle.
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
    # --- optional: NB quality-classifier filter (GPT-3/CCNet recipe) --
    #: True trains reference-vs-crawl Naive Bayes (positives =
    #: ``quality_reference_df``, negatives = the deduped corpus itself)
    #: and drops every doc the classifier scores non-positive
    nb_quality: bool = False
    nb_k: float = 0.5
    #: drop a doc when its token EVIDENCE (log-odds minus the class
    #: prior) falls at or below this cut — the prior is a constant
    #: offset set by the reference/crawl size ratio, so thresholding
    #: raw posterior sign would degenerate whenever the reference is
    #: small; tune per corpus like the GPT-3 recipe tunes its filter
    nb_evidence_cut: float = -4.0
    # --- optional: Gopher rule-based quality gate ----------------------
    #: True additionally drops docs failing the Gopher rules (Rae et
    #: al. 2021 A1.1 — word-count/mean-word-length bounds, symbol
    #: ratio, alpha-word fraction, stopword hits), computed from the
    #: once-projected token array alongside the repetition filter —
    #: another map-only conjunct on the same stage, zero extra passes
    gopher_rules: bool = False
    # --- optional: DSIR importance resampling (Xie et al. 2023) -------
    #: >0 enables the final selection stage: fit hashed-n-gram ratio
    #: models on (``dsir_target_df``, the cleaned corpus), weigh every
    #: surviving doc, and keep ``dsir_n`` docs via the deterministic
    #: Gumbel top-k draw (P ∝ exp2(logw)) — the resampled corpus
    #: matches the target's n-gram statistics instead of cliff-cutting
    #: on a score. Runs AFTER the filters/sampling (resampling a
    #: pre-cleaned pool is the paper's setup); needs ``dsir_target_df``
    dsir_n: int | None = None
    dsir_num_buckets: int = 10_000
    dsir_k: float = 0.5
    dsir_salt: str = "dsir"


def curate(
    df: DataFrame,
    config: CurationConfig | None = None,
    *,
    benchmark_df: DataFrame | None = None,
    quality_reference_df: DataFrame | None = None,
    dsir_target_df: DataFrame | None = None,
) -> DataFrame:
    """Run the curation pipeline; returns the accounting relation
    ``(id, stratum, n_tokens, n_chunks)`` of the surviving documents.

    ``quality_reference_df`` (with ``cfg.nb_quality=True``) supplies the
    trusted reference corpus for the NB quality filter: the GPT-3 recipe
    trains reference-vs-crawl and filters ON the classifier score.
    ``dsir_target_df`` (with ``cfg.dsir_n``) supplies the target corpus
    the DSIR resampling stage matches n-gram statistics against.

    PRECONDITION: ``cfg.id_col`` must be UNIQUE and NON-NULL per input
    row (the standard doc-id contract every stage here keys on). The
    dropped-id bookkeeping — and the final anti-join itself — resolve
    documents BY id: a NULL id never matches an anti-join key (the row
    would survive every drop), and two rows sharing an id are dropped
    or kept together regardless of which one a window ranked first.
    This is the same contract the reference's entity keys carry; it is
    documented rather than asserted because verifying uniqueness would
    cost a corpus-wide aggregation per call (advice-caught, r16).

    The small pinned id relations the returned plan anti-joins against
    (the dropped-id set; the DSIR keep set when ``cfg.dsir_n``) are
    handed out via ``_owned_checkpoints`` per the repo ownership rule:
    release them (``operators.graph.release_checkpoint``) once the
    returned frame has been consumed — on high-duplication corpora the
    dropped-id set is corpus-duplicate-fraction-sized, and repeated
    ``curate()`` calls would otherwise accumulate pinned blocks for
    the session lifetime (advice-caught, r16)."""
    cfg = config or CurationConfig()
    did, text, stratum = cfg.id_col, cfg.text_col, cfg.stratum_col
    if cfg.nb_quality and quality_reference_df is None:
        raise ValueError("nb_quality=True needs quality_reference_df")
    if cfg.dsir_n and dsir_target_df is None:
        raise ValueError("dsir_n needs dsir_target_df")
    optional_stages = (
        benchmark_df is not None
        or cfg.near_dup is not None
        or cfg.nb_quality
    )

    # Tokenize ONCE (lowercased — every consumer wants the lowered
    # form; token COUNTS are lowering-invariant), before the dedup
    # shuffle: later stages read the projected array in place of the
    # text, which never crosses the shuffle.
    staged = df.select(
        F.col(did),
        F.col(stratum),
        doc_fingerprint(F.col(text)).alias("__fp"),
        tokens(F.lower(F.col(text))).alias("__ltoks"),
    )

    #: pinned id relations the returned plan depends on — handed to the
    #: caller via ``_owned_checkpoints`` (see docstring)
    owned_checkpoints: list[DataFrame] = []

    # 1. exact dedup: min-id doc per fingerprint, one corpus shuffle
    w = Window.partitionBy("__fp").orderBy(did)
    deduped = (
        staged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__fp")
    )

    if optional_stages:
        # The optional stages fan the deduped corpus out to extra
        # shingle consumers (contamination train side, the near-dup
        # pair generator) — cache the NARROW relation so each consumer
        # reads token arrays instead of re-running the window, resolve
        # them eagerly into a small dropped-id set, then release every
        # cache before returning (see module docstring).
        deduped = deduped.persist()
        # Materialize the cache up front: both optional stages read it,
        # and the contamination job below runs CONCURRENTLY with the
        # near-dup stages — racing two jobs into an unpopulated cache
        # would compute the window once per job.
        deduped.count()
        drops: list[DataFrame] = []
        pair_caches: list[DataFrame] = []
        contaminated_fut = None

        # 2. benchmark decontamination (optional) — launched on a
        #    worker thread: its broadcast semi-join and the near-dup
        #    LSH stages are independent jobs over the same cached
        #    input, and neither saturates the cluster alone (Spark's
        #    scheduler interleaves concurrent jobs' stages).
        if benchmark_df is not None:
            from concurrent.futures import ThreadPoolExecutor

            from my_feast_spark.operators.decontamination import (
                contamination_report,
            )

            contaminated = contamination_report(
                deduped,
                benchmark_df,
                did,
                text,
                n=cfg.decontaminate_ngram,
                min_hits=cfg.decontaminate_min_hits,
                train_tokens_col="__ltoks",
            ).select(F.col("doc_id").alias(did))
            pool = ThreadPoolExecutor(max_workers=1)
            contaminated_fut = pool.submit(contaminated.localCheckpoint)
            pool.shutdown(wait=False)

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
                tokens_col="__ltoks",
                **cfg.near_dup_kwargs,
            )
            pair_caches = list(getattr(pairs, "_owned_caches", ()))
            # connected_components materializes the pairs internally
            # (checkpointed edges / driver union-find)
            clusters = connected_components(pairs, "doc_a", "doc_b")
            drops.append(
                clusters.filter(F.col("id") != F.col("cluster_id")).select(
                    F.col("id").alias(did)
                )
            )

        # 3b. NB quality filter (optional): reference-vs-crawl Naive
        #     Bayes (GPT-3/CCNet recipe) — positives = the trusted
        #     reference corpus, negatives = the deduped corpus itself,
        #     both read from the once-projected token arrays. Training
        #     is one aggregation pass; scoring is a broadcast llr join;
        #     docs scoring non-positive join the dropped-id set.
        nb_caches: list[DataFrame] = []
        if cfg.nb_quality:
            from my_feast_spark.operators.classifier import (
                score_nb,
                train_nb,
            )

            ref = quality_reference_df.select(
                F.lit(True).alias("__pos"),
                tokens(F.lower(F.col(text))).alias("__ltoks"),
            )
            neg = deduped.select(F.lit(False).alias("__pos"), "__ltoks")
            model = train_nb(
                ref.unionByName(neg), None, "__pos",
                k=cfg.nb_k, tokens_col="__ltoks",
            )
            nb_caches = list(model.token_llr._owned_caches)
            scored = score_nb(
                deduped, did, None, model, tokens_col="__ltoks"
            )
            evidence = F.round(
                F.col("log_odds") - F.lit(model.prior_logodds), 4
            )
            drops.append(
                scored.filter(
                    evidence <= F.lit(cfg.nb_evidence_cut)
                ).select(F.col(did))
            )

        # Pin the (small) dropped-id union eagerly, then drop every
        # cache AND every upstream checkpoint: once drop_ids holds the
        # materialized id set, the contamination checkpoint and the
        # cluster-label checkpoint connected_components handed back are
        # dead weight (localCheckpoint pins blocks for the session
        # lifetime — repeated curate() calls would otherwise accumulate
        # them). Only drop_ids itself stays pinned: the returned plan
        # anti-joins against it, so it must outlive this call.
        from my_feast_spark.operators.graph import release_checkpoint

        spent_checkpoints: list[DataFrame] = []
        if contaminated_fut is not None:
            contaminated_ck = contaminated_fut.result()
            drops.insert(0, contaminated_ck)
            spent_checkpoints.append(contaminated_ck)
        if cfg.near_dup is not None:
            spent_checkpoints.extend(
                getattr(clusters, "_owned_checkpoints", ())
            )
        from functools import reduce

        # Fold the exact-dedup LOSERS (the duplicate fraction — an
        # id-only, column-pruned source scan anti-joined against the
        # cached survivor ids) into the dropped-id set: with every
        # window loser named explicitly, the returned plan no longer
        # needs to RE-DERIVE the fingerprint window at all — the final
        # materialization collapses from scan -> md5 fingerprint ->
        # corpus Exchange -> window sort -> anti-join to a map-only
        # tokenize + ONE anti-join (guide §2.4, r16). Same rows by
        # construction: staged minus dups minus drops == deduped minus
        # drops. The extra job here reads ONLY the id column and the
        # checkpoint grows by the dup-id rows — both increment-sized
        # next to the corpus pass they remove.
        dup_ids = df.select(F.col(did)).join(
            deduped.select(did), did, "left_anti"
        )
        drop_ids = reduce(lambda a, b: a.union(b), drops)
        anti_ids = drop_ids.select(F.col(did)).union(dup_ids)
        anti_ids = anti_ids.localCheckpoint()
        owned_checkpoints.append(anti_ids)
        for c in pair_caches + nb_caches:
            c.unpersist()
        for c in spent_checkpoints:
            release_checkpoint(c)
        deduped.unpersist()
        # Rebuild the narrow relation for the returned plan with the
        # token array behind an explode(array(...)) Generate node: with
        # the window Exchange gone, nothing else stops CollapseProject
        # from re-inlining tokens(lower(text)) into every downstream
        # reference (the O(k x tokenize) re-expansion the module
        # docstring warns about — measured 1.02s vs 0.54s per final
        # count at sf0.1). A Generate materializes its input expression
        # ONCE per row, predicates on generator output are never pushed
        # below it, and explode(array(x)) is row-preserving even for
        # NULL x (array(x) is a 1-element array, never NULL). __fp is
        # unreferenced downstream, so Catalyst prunes the md5 entirely.
        deduped = df.select(
            F.col(did),
            F.col(stratum),
            F.explode(
                F.array(tokens(F.lower(F.col(text))))
            ).alias("__ltoks"),
        ).join(anti_ids, did, "left_anti")

    # 4. repetition filter — map-only over the projected (lowered)
    #    token array; the predicate cannot cross the dedup window, so
    #    the array is never re-expanded into repeated tokenizations
    feats = repetition_features_arr(F.col("__ltoks"))
    predicate = (
        (feats["top_token_frac"] <= cfg.max_top_token_frac)
        & (feats["dup_2gram_frac"] <= cfg.max_dup_2gram_frac)
    )
    if cfg.gopher_rules:
        # 4b. Gopher rule gate — same stage, same token array: one more
        #     map-only conjunct, no extra tokenization or pass
        from my_feast_spark.functions.text import gopher_features_arr

        predicate = predicate & (
            gopher_features_arr(F.col("__ltoks"))["gopher_pass"] == 1
        )
    clean = deduped.filter(predicate)

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

    # 5b. DSIR importance resampling (optional) — the final selection:
    #     fit on (target, cleaned corpus) reusing the projected token
    #     array (zero re-tokenization on the corpus side), weigh, draw
    #     dsir_n docs via the deterministic Gumbel top-k. The kept-id
    #     set is pinned eagerly (it is dsir_n rows) and the trainer's
    #     count-table cache released immediately — same lifetime rule
    #     as drop_ids above.
    if cfg.dsir_n:
        from my_feast_spark.operators.dsir import (
            dsir_logweights,
            dsir_resample,
            fit_dsir,
        )

        model = fit_dsir(
            dsir_target_df, clean, text,
            num_buckets=cfg.dsir_num_buckets, k=cfg.dsir_k,
            raw_tokens_col="__ltoks",
        )
        weighted = dsir_logweights(
            clean, did, None, model, tokens_col="__ltoks"
        )
        keep_ids = dsir_resample(
            weighted, did, cfg.dsir_n, salt=cfg.dsir_salt
        ).select(did).localCheckpoint()
        owned_checkpoints.append(keep_ids)
        for c in model.ratio._owned_caches:
            c.unpersist()
        clean = clean.join(keep_ids, did, "left_semi")

    # 6. accounting projection — counts only, no chunk text rendered
    out = clean.select(
        did,
        stratum,
        F.size(F.col("__ltoks")).alias("n_tokens"),
        chunk_count(
            F.col("__ltoks"), size=cfg.chunk_size, stride=cfg.chunk_stride
        ).alias("n_chunks"),
    )
    if owned_checkpoints:
        out._owned_checkpoints = owned_checkpoints
    return out
