"""Training-data pipeline walkthrough — the extension operators chained
the way a real corpus-preparation job runs them.

Stage order matters at scale: cheap linear passes first, pair-generating
passes only on what survives:

  1. text analysis  — token stats, language ID, quality score (linear)
  2. quality gate   — drop short/low-quality docs + corpus-quantile
                      length outliers (linear; thresholds broadcast)
  3. exact dedup    — fingerprint groupBy, keep one per content (linear)
  4. near-dup       — MinHash-LSH over the keepers only (sub-quadratic)
  5. embedding pass — near-dup pairs by cosine over the keepers' vectors
  6. emit           — deterministic hash-bucket sample of the survivors,
                      split into token-window training chunks (map-only)
  8. model passes   — bigram-LM perplexity scores over the keepers,
                      LSH-recall audit of the dedup config on a sample,
                      BPE merges trained on the surviving text

Run:  python examples/training_data_pipeline_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from my_feast_spark import get_session
from my_feast_spark.functions.text import (
    chunk_tokens,
    hash_sample,
    lang_id,
    quality_features,
)
from my_feast_spark.operators.dedup import exact_dedup, minhash_lsh_dup_pairs
from my_feast_spark.operators.similarity import embedding_dup_pairs
from my_feast_spark.sources.readers import load_table


def main(sf_dir: str = "/root/testdata/sf0.01") -> dict:
    spark = get_session(app_name="training-data-pipeline-demo")
    docs = load_table(spark, sf_dir, "documents")
    n_input = docs.count()

    # 0: URL front door — the stages a crawl pipeline runs BEFORE
    # reading any text: canonicalize, drop blocklisted domains, cap each
    # domain's contribution, rank domains as a quality prior. The demo
    # table has no URL column, so derive a deterministic one per doc.
    from my_feast_spark.functions.urls import (
        registered_domain,
        url_canonicalize,
        url_host,
    )
    from my_feast_spark.operators.graph import (
        pagerank_fixedpoint,
        release_checkpoint,
    )
    from my_feast_spark.operators.urls import blocklist_filter, domain_quota

    raw_url = F.concat(
        F.lit("https://WWW."), F.col("source"), F.lit("-Example.com/d/"),
        F.col("doc_id").cast("string"), F.lit("?utm_source=crawl&id=1"),
    )
    with_domain = docs.withColumn(
        "url", url_canonicalize(raw_url)
    ).withColumn("domain", registered_domain(url_host(raw_url)))
    allowed = blocklist_filter(
        with_domain, "domain", ["src0-example.com"]
    )
    capped = domain_quota(allowed, "domain", ["doc_id"], 1_000_000)
    n_url_front_door = capped.count()
    host_edges = capped.select(
        (F.col("doc_id") % 16).alias("src"),
        ((F.col("doc_id") * 5 + 1) % 16).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    ranks = pagerank_fixedpoint(host_edges, iterations=5)
    n_ranked_domains = ranks.count()
    for c in ranks._owned_checkpoints:
        release_checkpoint(c)
    docs = capped.drop("url", "domain")

    # 1-2: per-doc signals + quality gate (pure projections, no shuffle)
    q = quality_features(F.col("text"))
    scored = docs.select(
        "doc_id", "text",
        lang_id(F.col("text")).alias("pred_lang"),
        q["n_tokens"].alias("n_tokens"),
        q["lexical_diversity"].alias("lexical_diversity"),
    )
    kept = scored.where(
        (F.col("n_tokens") >= 5) & (F.col("lexical_diversity") > 0.2)
    )
    # corpus-quantile outlier gate: P1/P99 token-length thresholds as a
    # broadcast 1-row aggregate (no second shuffle of the corpus)
    bounds = kept.agg(
        F.expr("percentile(n_tokens, 0.01)").alias("lo"),
        F.expr("percentile(n_tokens, 0.99)").alias("hi"),
    )
    kept = kept.crossJoin(F.broadcast(bounds)).where(
        (F.col("n_tokens") >= F.col("lo")) & (F.col("n_tokens") <= F.col("hi"))
    ).drop("lo", "hi")
    n_kept = kept.count()

    # 3: exact dedup — one keeper per distinct content
    groups = exact_dedup(kept, "doc_id", "text")
    keepers = kept.join(
        groups.select(F.col("keeper_id").alias("doc_id")), "doc_id", "left_semi"
    )
    n_unique = keepers.count()

    # 4: near-dup over the deduplicated survivors only
    near = minhash_lsh_dup_pairs(keepers, "doc_id", "text", n=3, threshold=0.5)
    n_near_pairs = near.count()

    # 5: embedding-level near-dups (semantic tier) — the pair view (LSH)
    # and the decision view (SemDeDup cells + keep policy)
    from my_feast_spark.operators.similarity import semdedup

    emb = load_table(spark, sf_dir, "embeddings")
    sem_pairs = embedding_dup_pairs(
        emb, "vec_id", "embedding", threshold=0.4, num_planes=4
    )
    n_sem_pairs = sem_pairs.count()
    for c in sem_pairs._owned_caches:
        c.unpersist()
    sem = semdedup(emb, "vec_id", "embedding", num_cells=16, threshold=0.4)
    n_sem_keepers = sem.filter(F.col("keep")).count()
    for c in sem._owned_caches:
        c.unpersist()

    # 5b: ANN serving — build the residual-IVFADC index ONCE, persist it
    # cell-partitioned, then serve a probe batch that reads only the
    # probed cells' directories (the billion-vector serving shape)
    import tempfile

    from my_feast_spark.operators import (
        ivfpq_build,
        ivfpq_search,
        read_ivfpq_index,
        write_ivfpq_index,
    )

    enc, model = ivfpq_build(
        emb.select(F.col("vec_id").alias("corpus_id"), "embedding"),
        num_centroids=16, residual=True,
    )
    idx_path = tempfile.mkdtemp(prefix="mfs_demo_ivfpq_")
    write_ivfpq_index(enc, model, idx_path)
    enc2, model2 = read_ivfpq_index(spark, idx_path)
    ann = ivfpq_search(
        enc2, model2,
        emb.where(F.col("vec_id") < 20).select(
            F.col("vec_id").alias("query_id"), "embedding"
        ),
        nprobe=4, k=5,
    )
    n_ann_results = ann.count()

    # 6: emit a reproducible ~10% sample of the survivors as training
    # chunks — both steps are map-only, so this scales with the scan
    chunks = (
        keepers.where(hash_sample(F.col("doc_id")))
        .select("doc_id", F.explode(chunk_tokens(F.col("text"))).alias("c"))
        .select("doc_id", "c.start", "c.chunk_text", "c.n_tokens")
    )
    n_chunks = chunks.count()

    # 7: or as ONE call — the packaged composition (exact dedup ->
    # optional decontamination / near-dup cluster pruning -> repetition
    # filter -> stratified sample -> accounting), single corpus shuffle,
    # one tokenization per doc
    from my_feast_spark.operators.curation import CurationConfig, curate

    curated = curate(
        docs,
        CurationConfig(
            sample_rates={"en": 0.3, "de": 0.5, "es": 0.5, "fr": 0.5, "zh": 0.5},
            # the Gopher rule gate rides the same map-only filter stage
            gopher_rules=True,
        ),
    )
    n_curated = curated.count()

    # 8: model-driven passes over the curated survivors — perplexity
    # quality scores (CCNet-style), a Naive-Bayes reference-vs-crawl
    # classifier, a recall audit of the LSH config, and tokenizer
    # merges learned from the cleaned text
    from my_feast_spark.operators import (
        lsh_recall_report,
        score_docs,
        score_docs_kn,
        score_nb,
        train_bigram_kn,
        train_bigram_lm,
        train_bpe_merges,
        train_nb,
    )

    lm = train_bigram_lm(keepers, "text")
    ppl = score_docs(keepers, "doc_id", "text", lm)
    n_scored = ppl.count()
    lm.bigrams.unpersist()
    # ... and the production smoothing: interpolated Kneser-Ney (the
    # KenLM family CCNet runs) — same plan shape, continuation-count
    # interpolation instead of add-k
    kn = train_bigram_kn(keepers, "text")
    n_scored_kn = score_docs_kn(keepers, "doc_id", "text", kn).count()
    kn.bigrams.unpersist()
    # NB quality classifier: the quality-gate survivors stand in as the
    # positive (reference) class, the gated-out docs as negative
    labeled = docs.join(
        kept.select("doc_id").withColumn("__pos", F.lit(True)),
        "doc_id", "left",
    ).fillna(False, ["__pos"])
    nb = train_nb(labeled, "text", "__pos")
    nb_scored = score_nb(docs, "doc_id", "text", nb)
    n_pred_quality = nb_scored.filter(F.col("pred") == 1).count()
    # GPT-3's quality-weighted keep rule over the classifier scores:
    # log2-odds -> probability, then the deterministic Pareto rule
    # (score_weighted_sample) — low scorers survive with heavy-tailed
    # small probability instead of being cliff-cut
    from my_feast_spark.operators.sampling import score_weighted_sample

    probs = nb_scored.withColumn(
        "quality_prob",
        F.lit(1.0) / (F.lit(1.0) + F.pow(F.lit(2.0), -F.col("log_odds"))),
    )
    n_pareto_kept = score_weighted_sample(
        probs, "quality_prob", "doc_id", alpha=9.0
    ).count()
    for c in nb.token_llr._owned_caches:
        c.unpersist()
    # DSIR (Xie et al. 2023): instead of keeping what a classifier
    # scores high, RESAMPLE the crawl toward the reference's hashed
    # n-gram distribution — the quality-gate survivors play the target
    # corpus, the gated-out docs the raw pool, and the Gumbel top-k
    # draw picks the raw docs whose gram stats best match the target
    from my_feast_spark.operators.dsir import (
        dsir_logweights,
        dsir_resample,
        fit_dsir,
    )

    raw_pool = docs.join(kept.select("doc_id"), "doc_id", "left_anti")
    dsir = fit_dsir(kept, raw_pool, "text", num_buckets=4096)
    dsir_w = dsir_logweights(raw_pool, "doc_id", "text", dsir)
    n_dsir_selected = dsir_resample(
        dsir_w, "doc_id", max(1, n_input // 20)
    ).count()
    for c in dsir.ratio._owned_caches:
        c.unpersist()
    recall_report = lsh_recall_report(
        keepers, "doc_id", "text", sample_rate=0.5, hash_fn="portable"
    )
    recall = recall_report.collect()[0]
    for c in recall_report._owned_caches:
        c.unpersist()
    merges = train_bpe_merges(keepers, "text", rounds=8)
    # ... and the OTHER tokenizer family: unigram-LM (SentencePiece
    # default) — EM-shrunk vocab, Viterbi encode, exact-integer
    # determinism (operators/unigram.py)
    from my_feast_spark.operators.unigram import (
        train_unigram,
        unigram_encode,
    )

    uni_vocab = train_unigram(
        keepers, "text", vocab_size=300, seed_size=1200,
        max_piece_len=6, iterations=2,
    )
    n_uni_pieces = uni_vocab.count()
    uni_tokens = unigram_encode(
        keepers, "doc_id", "text", uni_vocab, max_piece_len=6
    ).agg(F.sum("n_pieces")).collect()[0][0]

    # 9: layout maintenance for the emitted table — z-order the curated
    # survivors on the two columns downstream jobs filter by, sweep the
    # footer stats into the skipping sidecar, and demonstrate a
    # planning-time file-prune (sources/zorder.py + skipping.py)
    from my_feast_spark.sources.skipping import (
        scan_with_skipping,
        write_file_stats,
    )
    from my_feast_spark.sources.zorder import zorder_table

    emit_dir = tempfile.mkdtemp(prefix="mfs_demo_emit_")
    curated.write.mode("overwrite").parquet(f"{emit_dir}/natural")
    z_path = zorder_table(
        spark, f"{emit_dir}/natural", ["doc_id", "n_tokens"],
        out_path=f"{emit_dir}/z", num_files=8,
    )
    write_file_stats(z_path, ["doc_id", "n_tokens"], spark=spark)
    pruned, skip_report = scan_with_skipping(
        spark, z_path, {"doc_id": (0, 100)}
    )
    n_pruned_scan = pruned.count()

    # 10: sketch-driven planning + cross-corpus decontamination — the
    # cardinality question (HLL / KMV, operators/sketches.py) answers
    # itself without re-keying the corpus, then SIZES a Bloom filter
    # (bloom_auto_geometry) that prefilters the next incoming batch
    # against everything already curated: only the maybe-present
    # fraction pays the exact verify join (operators/bloom.py)
    from my_feast_spark.operators.bloom import (
        bloom_auto_geometry,
        bloom_maybe_contains,
        bloom_position_set,
    )
    from my_feast_spark.operators.dedup import doc_fingerprint
    from my_feast_spark.operators.sketches import hll_group_distinct

    # curate() returns the accounting view; join back for the text
    curated_docs = docs.join(
        curated.select("doc_id"), "doc_id", "left_semi"
    )
    curated_fp = curated_docs.select(
        doc_fingerprint(F.col("text")).alias("fp")
    )
    vocab_est = hll_group_distinct(
        curated_docs.select(
            F.lit("all").alias("g"),
            F.explode(F.split(F.lower("text"), "\\s+")).alias("w"),
        ),
        "w", ["g"], p=10,
    ).collect()[0]["est_distinct"]
    m_bits, k_hashes = bloom_auto_geometry(curated_fp, "fp")
    seen = bloom_position_set(
        curated_fp, "fp", m_bits=m_bits, k_hashes=k_hashes
    )
    incoming = docs.limit(200).select(
        doc_fingerprint(F.col("text")).alias("fp")
    )
    flagged = bloom_maybe_contains(
        incoming, seen, "fp", m_bits=m_bits, k_hashes=k_hashes
    )
    n_definitely_new = flagged.where(~F.col("bloom_maybe")).count()

    # 11: publish the curated table through the versioned log — commit,
    # append the next batch, time-travel, checkpoint, vacuum (the
    # transaction-log lever next to stage 9's z-order + skipping)
    from my_feast_spark.sources.versioned import (
        checkpoint_version,
        read_version,
        vacuum,
        write_version,
    )

    vt = f"{emit_dir}/versioned"
    write_version(curated_docs.select("doc_id", "text"), vt)
    write_version(
        docs.where(F.col("doc_id") % 97 == 0).select("doc_id", "text"),
        vt, mode="append",
    )
    n_v0 = read_version(spark, vt, 0).count()
    n_latest = read_version(spark, vt).count()
    checkpoint_version(spark, vt)
    vac = vacuum(spark, vt, keep_last=1, grace_seconds=0)

    out = {
        "input_docs": n_input,
        "after_quality_gate": n_kept,
        "after_exact_dedup": n_unique,
        "near_dup_pairs": n_near_pairs,
        "semantic_dup_pairs": n_sem_pairs,
        "semdedup_keepers": n_sem_keepers,
        "ivfpq_served_results": n_ann_results,
        "sampled_training_chunks": n_chunks,
        "url_front_door_survivors": n_url_front_door,
        "ranked_domains": n_ranked_domains,
        "curate_operator_survivors": n_curated,
        "lm_scored_docs": n_scored,
        "lm_scored_docs_kn": n_scored_kn,
        "nb_predicted_quality_docs": n_pred_quality,
        "pareto_quality_sampled_docs": n_pareto_kept,
        "dsir_resampled_docs": n_dsir_selected,
        "lsh_recall_on_sample": recall.recall,
        "bpe_merges_learned": len(merges),
        "unigram_vocab_pieces": n_uni_pieces,
        "unigram_encoded_tokens": uni_tokens,
        "zorder_files_read": skip_report["files_read"],
        "zorder_files_total": skip_report["files_total"],
        "zorder_pruned_scan_docs": n_pruned_scan,
        "hll_vocab_estimate": vocab_est,
        "bloom_auto_m_bits": m_bits,
        "bloom_auto_k": k_hashes,
        "bloom_definitely_new_of_200": n_definitely_new,
        "versioned_v0_docs": n_v0,
        "versioned_latest_docs": n_latest,
        "versioned_dirs_vacuumed": vac["removed_dirs"],
    }
    print(out)
    return out


if __name__ == "__main__":
    main(*sys.argv[1:])
