"""Benchmark runner — headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE compact JSON line (headline per-query mins + official total):
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
and writes the COMPLETE per-query timings + min-of-2 spreads for every
registered query and variant to BENCH_FULL.json next to this file (the
stdout capture that records the one-line form keeps only a 2000-char
tail, which the all-queries dict outgrew in round 3).

Each query is executed to completion (collect or count of the result —
results are small aggregates/top-k by construction) after a warm-up of
the input scans. Wall time per query; "value" is the total.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as _pd  # module-level: pandas_udf type hints resolve here

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from my_feast_spark import workload
from my_feast_spark.session import get_session

#: headline set: flagship PIT + the shapes that dominate at scale
BENCH_QUERIES = [
    "pit_user_features",
    "pit_late_arrival",
    "hourly_user_agg",
    "pricing_summary",
    "regional_revenue",
    "order_priority_count",
    "top_spenders",
    "latest_event_per_user",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_session(app_name="my_feast_spark-bench")

    extra = [q for q in workload.QUERIES if q not in BENCH_QUERIES]

    # warm-up: input scans + first-job scheduling/codegen overhead, so the
    # per-query numbers measure the queries, not JVM cold start
    from my_feast_spark.sources.readers import TESTDATA_TABLES, load_table

    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).count()

    # ... and the Python/Arrow worker pool: the first pandas-UDF stage of
    # the session otherwise pays ~100ms/core of worker fork+import inside
    # whichever query happens to run it first
    from pyspark.sql.functions import col as _col, pandas_udf as _pandas_udf

    @_pandas_udf("long")
    def _warm(s: _pd.Series) -> _pd.Series:
        return s

    spark.range(512).repartition(32).select(_warm(_col("id"))).count()

    # Pinned execution order (headline first, then alphabetical — stable
    # across registry reorderings) and min-of-2 per query, so
    # round-over-round drift is attributable to code, not run order or a
    # one-off GC/JIT pause. The per-run pair is reported as "spread".
    names = BENCH_QUERIES + sorted(extra)
    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}

    from my_feast_spark.operators.graph import release_checkpoint

    def _release(df):
        # Release the query's owned caches/checkpoints AFTER the clock
        # stops: pair-generator queries hand their persisted relations
        # to the caller (the repo cache-ownership rule); without this,
        # every timed LSH/PMI/TF-IDF call pins another corpus-derived
        # block set and later queries in the run compete with the
        # accumulated memory pressure (r5's wild spreads).
        for c in getattr(df, "_owned_caches", ()):
            c.unpersist()
        for c in getattr(df, "_owned_checkpoints", ()):
            release_checkpoint(c)

    def counted(df):
        df.count()
        return df

    def timed(name, thunk):
        # min-of-2, but only where a second run can change the story:
        # sub-0.75s queries are overhead-dominated and a re-run would
        # just double the bench wall time for noise, and 5s+ queries
        # are long enough that scheduler jitter is relatively small —
        # re-running them is what pushed the full bench past a 10-min
        # capture window once the round-9 queries landed. The thunk
        # returns the result DataFrame so owned caches release between
        # runs.
        runs = []
        for _ in range(2):
            t0 = time.monotonic()
            df = thunk()
            runs.append(round(time.monotonic() - t0, 3))
            if df is not None:
                _release(df)
            if runs[0] < 0.75 or runs[0] >= 5.0:
                break
        timings[name] = min(runs)
        spread[name] = runs

    for name in names:
        fn = workload.QUERIES[name][0]
        timed(name, lambda: counted(fn(spark, sf_dir)))

    def _pack_bfd_docs():
        from pyspark.sql import functions as _F

        from my_feast_spark.operators.packing import pack_bfd

        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", _F.least(_F.col("n_chars"), _F.lit(2000)).alias("n")
        )
        return pack_bfd(docs, "doc_id", "n", 2048)

    # Scale-default variants of the adjudicated queries: the registry
    # runs minhash/simhash with the portable md5 hash family and the ANN
    # queries with the bit-deterministic (oracle-replayable) numpy
    # reductions; a 100 TB run would use xxhash64 and BLAS gemm — time
    # those too, so the recorded numbers include what production pays.
    for name, thunk in (
        ("minhash_dup_pairs_xxhash64",
         lambda: counted(workload.q_minhash_dup_pairs(spark, sf_dir, hash_fn="xxhash64"))),
        # (the former minhash_dup_pairs_numpy slot: "numpy" became an
        # alias of "xxhash64" when the xxhash64 family was routed
        # through the Arrow fan-out in round 15 — one timing covers both)
        ("simhash_dup_pairs_xxhash64",
         lambda: counted(workload.q_simhash_dup_pairs(spark, sf_dir, hash_fn="xxhash64"))),
        # (the former simhash_dup_pairs_numpy slot: "xxhash64" routes
        # through the bit-identical Arrow fingerprint path since round
        # 15 — one timing covers both)
        # the chunkers' per-word/per-chunk hash at scale cost: the
        # registry rows pay the md5-derived portable hash for oracle
        # replay; production pays one xxhash64 intrinsic instead — the
        # gap matters most for CDC, which hashes EVERY word (round-8
        # measurement at sf0.1: portable ~2.6-3.7s vs xxhash64 ~1.4s,
        # after the boundary rule moved to a polynomial over one
        # 32-bit md5 slice per word; the naive per-window-string md5
        # was ~11s)
        # sketch/bloom tier scale path: same xxhash64-vs-portable gap
        ("hll_group_distinct_xxhash64",
         lambda: counted(workload.q_hll_group_distinct(spark, sf_dir, hash_fn="xxhash64"))),
        ("kmv_corpus_overlap_xxhash64",
         lambda: counted(workload.q_kmv_corpus_overlap(spark, sf_dir, hash_fn="xxhash64"))),
        ("bloom_prefilter_dedup_xxhash64",
         lambda: counted(workload.q_bloom_prefilter_dedup(spark, sf_dir, hash_fn="xxhash64"))),
        ("cms_heavy_hitters_xxhash64",
         lambda: counted(workload.q_cms_heavy_hitters(spark, sf_dir, hash_fn="xxhash64"))),
        # chunk_dedup retired from the driver registry in round 16
        # (successor cdc_chunk_dedup; pinned-anchor budget) — keep the
        # portable-family base timing here so the family-inversion pair
        # below still has data. corpus_vocab (retired same round) has
        # no scale variant and simply leaves the timing set; its count
        # shape stays timed inside vocab_encode_join / top_terms_tfidf.
        ("chunk_dedup",
         lambda: counted(workload.q_chunk_dedup(spark, sf_dir))),
        ("chunk_dedup_xxhash64",
         lambda: counted(workload.q_chunk_dedup(spark, sf_dir, hash_fn="xxhash64"))),
        ("cdc_chunk_dedup_xxhash64",
         lambda: counted(workload.q_cdc_chunk_dedup(spark, sf_dir, hash_fn="xxhash64"))),
        ("ivf_topk_blas",
         lambda: counted(workload.q_ivf_topk(spark, sf_dir, deterministic=False))),
        ("embedding_near_dupes_lsh_blas",
         lambda: counted(workload.q_embedding_near_dupes_lsh(spark, sf_dir, deterministic=False))),
        ("curation_pipeline_full_numpy",
         lambda: counted(workload.q_curation_pipeline_full(spark, sf_dir, hash_fn="numpy"))),
        # exhaustive-ADC vs IVFADC at a 10x query batch: the probe path's
        # candidate volume is nprobe/num_cells (= 1/4 here) of the
        # exhaustive scan's — the gap that grows with corpus x queries
        ("cosine_topk_numpy",
         lambda: counted(workload.q_cosine_topk(spark, sf_dir, impl="numpy"))),
        ("pq_topk_q200",
         lambda: counted(workload.q_pq_topk(spark, sf_dir, n_queries=200))),
        ("ivfpq_topk_q200",
         lambda: counted(workload.q_ivfpq_topk(spark, sf_dir, n_queries=200))),
        # DSIR's oracle path pays md5 expression nodes per gram for
        # replayability; this is what the 100 TB run flips to
        ("dsir_resample_xxhash64",
         lambda: counted(workload.q_dsir_resample(
             spark, sf_dir, hash_fn="xxhash64"))),
        # best-fit-decreasing whole-sequence packing at the production
        # shape (capacity-2048 bins over n_chars; the adjudicated
        # pack_bfd row replays a smaller token-count config through the
        # recursive-CTE oracle)
        ("pack_bfd_docs", lambda: counted(_pack_bfd_docs())),
    ):
        timed(name, thunk)

    # ...and at a corpus where the probe pruning is VISIBLE: the sf
    # embeddings replicated 8x (deterministic id-shifted copies,
    # checkpointed once and shared by both variants) x 200 queries.
    # Exhaustive ADC scans every corpus code per query; IVFADC folds
    # only nprobe/num_cells (1/4) of them — round-8 measurement at 16k
    # vectors: exhaustive 2.68s vs IVFADC 2.14s (COVERAGE.md cites the
    # same run; fixed costs — codebook train + encode pass — dominate
    # at this sf, the fold-volume gap is what scales).
    from pyspark.sql import functions as _F

    from my_feast_spark.operators.pq import (
        ivfpq_topk as _ivfpq_topk,
        pq_encode as _pq_encode,
        pq_topk as _pq_topk,
        train_pq_codebooks as _train_pq,
    )

    _emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    _n_emb = _emb.count()
    _big = _emb
    for _i in range(1, 8):
        _big = _big.union(_emb.select(
            (_F.col("vec_id") + _F.lit(_i * _n_emb)).alias("vec_id"),
            "embedding",
        ))
    _big = _big.localCheckpoint()
    _q8 = _emb.where(_F.col("vec_id") < 200).select(
        _F.col("vec_id").alias("query_id"), "embedding"
    )

    def _pq_x8():
        cb = _train_pq(_big, "embedding", "vec_id", m=8, k=16)
        codes = _pq_encode(_big, "vec_id", "embedding", cb).select(
            _F.col("vec_id").alias("corpus_id"), "codes"
        )
        return counted(_pq_topk(_q8, codes, cb, k=5))

    def _ivfpq_x8():
        return counted(_ivfpq_topk(
            _q8, _big.select(_F.col("vec_id").alias("corpus_id"), "embedding"),
            m=8, k_codes=16, num_centroids=16, nprobe=4, k=5,
        ))

    timed("pq_topk_x8_q200", _pq_x8)
    timed("ivfpq_topk_x8_q200", _ivfpq_x8)
    release_checkpoint(_big)

    # Map-only projection queries: `.count()` lets Catalyst prune every
    # computed column, so the loop above times only their scan. Force
    # full evaluation (crc32-sum over all columns) for the text tier so
    # the bench records what computing the features actually costs.
    from pyspark.sql import functions as F

    # quality_score retired from the driver registry in round 8 but
    # keeps its bench slot for round-over-round comparability (the
    # retired dict still carries the query); gopher joins the tier
    registry = {**workload.QUERIES, **workload.RETIRED_QUERIES}
    for name in ("repetition_filter", "quality_score", "lang_id",
                 "pii_redaction", "doc_fingerprints",
                 "gopher_quality_filter"):
        fn = registry[name][0]

        def full_eval(fn=fn):
            df = fn(spark, sf_dir)
            df.agg(F.sum(F.crc32(F.concat_ws(
                ",", *[F.col(c).cast("string") for c in df.columns]
            )))).collect()
            return df

        timed(name + "_evaluated", full_eval)

    # PIT hot-key skew probe: remap ~20% of events onto ONE synthetic
    # key on both sides of an as-of self-join. union_window puts that
    # key's entire combined probe+history stream into a single window
    # task (the straggler shape at corpus scale); sliced_window splits
    # it by (key, day slice) with boundary carry. Recording both makes
    # the skew-variant claim a measured number, not a design note.
    from my_feast_spark.operators.asof_join import point_in_time_join

    ev = load_table(spark, sf_dir, "events")
    hot = ev.withColumn(
        "user_id",
        F.when(F.pmod(F.xxhash64("event_id"), F.lit(5)) == 0, F.lit(-1))
        .otherwise(F.col("user_id")),
    )
    feat = hot.select("user_id", "ts", "value")
    probes = hot.select("user_id", F.col("ts").alias("probe_ts"), "event_id")

    def _pit_evaluated(strat):
        # crc32-sum the ATTACHED feature: a bare count() lets Catalyst
        # prune the as-of window (output row count never depends on the
        # feature column) and the probe would time everything EXCEPT
        # the window sort it exists to measure
        out = point_in_time_join(
            probes, feat, ["user_id"],
            event_ts_col="ts", entity_ts_col="probe_ts", strategy=strat,
        )
        out.agg(F.sum(F.crc32(F.col("value").cast("string")))).collect()
        return out

    for name, strat in (("pit_skew_union_window", "union_window"),
                        ("pit_skew_sliced_window", "sliced_window")):
        timed(name, lambda strat=strat: _pit_evaluated(strat))

    # Materialized-PIT probe: the same state lookup answered (a) at
    # query time by the as-of join over the raw event stream vs (b) by
    # a range join against the pre-built SCD2 interval table. (b) is
    # WHY a feature store materializes state history — per key it joins
    # one row per state CHANGE instead of windowing every event; the
    # build cost itself is the already-timed scd2_user_state query.
    from my_feast_spark.operators.aggregations import scd2_intervals, scd2_lookup

    # tie-free stream (one event per (user, ts)) so the two lookup
    # paths are comparable without an event_id tie-break, which the
    # as-of join doesn't model
    from my_feast_spark.operators.aggregations import latest_per_key

    st_ev = latest_per_key(
        ev.select("user_id", "ts", "event_id", "event_type"),
        ["user_id", "ts"], ["event_id"],
    )
    st_probes = st_ev.select(
        "user_id", F.col("ts").alias("probe_ts"),
        F.col("event_id").alias("probe_id"),
    )
    def _force(df, col):
        # evaluate the looked-up state column (see _pit_evaluated)
        df.agg(F.sum(F.crc32(F.col(col).cast("string")))).collect()
        return df

    timed("state_lookup_asof", lambda: _force(point_in_time_join(
        st_probes, st_ev.drop("event_id"), ["user_id"],
        event_ts_col="ts", entity_ts_col="probe_ts",
        features=["event_type"],
    ), "event_type"))
    ivals = scd2_intervals(
        st_ev, ["user_id"], "ts", "event_type", tie_breakers=["event_id"]
    ).localCheckpoint()  # materialized table stands in for the stored one
    timed("state_lookup_scd2", lambda: _force(scd2_lookup(
        ivals, st_probes, ["user_id"], "probe_ts"
    ), "state"))
    release_checkpoint(ivals)

    # Hash-family order assertion (judge ask, round 15): each *_xxhash64
    # / *_numpy variant is the SCALE path of its portable (oracle-
    # replayable) base query and exists because it is supposed to be
    # cheaper — an inversion (scale path materially slower than the
    # base, as minhash's 64-HOF expression form was for two committed
    # rounds) must fail loudly in the artifact, not wait for a judge to
    # diff rounds. Flag when the scale variant is both >1.25x and
    # >0.5s absolute over its base (sub-second pairs are noise-bound).
    FAMILY_PAIRS = [
        ("minhash_dup_pairs_xxhash64", "minhash_dup_pairs"),
        ("simhash_dup_pairs_xxhash64", "simhash_dup_pairs"),
        ("hll_group_distinct_xxhash64", "hll_group_distinct"),
        ("kmv_corpus_overlap_xxhash64", "kmv_corpus_overlap"),
        ("bloom_prefilter_dedup_xxhash64", "bloom_prefilter_dedup"),
        ("cms_heavy_hitters_xxhash64", "cms_heavy_hitters"),
        ("chunk_dedup_xxhash64", "chunk_dedup"),
        ("cdc_chunk_dedup_xxhash64", "cdc_chunk_dedup"),
        ("dsir_resample_xxhash64", "dsir_resample"),
        ("curation_pipeline_full_numpy", "curation_pipeline_full"),
    ]
    family_inversions = {}
    for scale_q, base_q in FAMILY_PAIRS:
        ts, tb = timings.get(scale_q), timings.get(base_q)
        if ts is None or tb is None:
            continue
        if ts > tb * 1.25 and ts - tb > 0.5:
            family_inversions[scale_q] = {"scale": ts, "base": tb}
            print(
                f"FAMILY INVERSION: {scale_q} {ts}s > {base_q} {tb}s "
                "(the scale path is supposed to be the cheap one)",
                file=sys.stderr,
            )

    total = round(sum(timings[q] for q in BENCH_QUERIES), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # The driver's capture keeps only the LAST 2000 chars of stdout and
    # parses what fits: since round 3 the all-queries line outgrew that
    # window and the recorded BENCH_r{N} artifact lost its parsed form
    # (only a tail fragment survived). Split the output: the COMPLETE
    # per-query timings + spreads go to BENCH_FULL.json next to this
    # file (a repo artifact, readable regardless of capture limits),
    # and stdout carries ONE compact JSON line — headline per-query
    # mins + the official total + the non-headline aggregate — small
    # enough (<1 KB) that the tail window holds the whole line again.
    full = {
        "queries": timings,
        "spread": spread,
        "family_inversions": family_inversions,
        "unit": "sec",
        "metric": "headline_total_sec",
        "value": total,
        "sf": sf_val,
    }
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"
    )
    with open(full_path, "w") as f:
        json.dump(full, f)
        f.write("\n")
    extra_named = [q for q in timings if q not in BENCH_QUERIES]
    print(json.dumps({
        "queries": {q: timings[q] for q in BENCH_QUERIES},
        "extra_total_sec": round(sum(timings[q] for q in extra_named), 3),
        "n_extra": len(extra_named),
        "family_inversions": len(family_inversions),
        "full": "BENCH_FULL.json",
        "unit": "sec",
        "metric": "headline_total_sec",
        "value": total,
        "sf": sf_val,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
