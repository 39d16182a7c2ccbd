"""Deduplication operators for large-scale document corpora.

Four tiers, cheapest first — the standard LLM-training-data pipeline:

  * exact_dedup        — hash-groupBy on a normalized fingerprint; one
                         shuffle on the md5 key, linear.
  * jaccard_dup_pairs  — exact n-gram-shingle Jaccard via the shingle
                         join (blocking on shared shingles): only pairs
                         sharing >= 1 shingle are ever materialized.
                         Frequency-capped shingles bound the blow-up from
                         hot shingles (stop-shingle removal), the standard
                         skew defense at corpus scale.
  * minhash_lsh_dup_pairs — MinHash signatures + banded LSH: candidates
                         only from shared bands, then exact-Jaccard
                         verification of candidates. Sub-quadratic; the
                         scale path when the shingle join is too hot.
  * simhash_dup_pairs  — 64-bit SimHash + pigeonhole banding on 16-bit
                         chunks for hamming-distance <= k candidates,
                         exact hamming verify.

Everything is built from native expressions (xxhash64, higher-order array
functions, groupBy) — no Python in the hot path; determinism comes from
fixed hash seeds, so results are reproducible across runs and cluster
layouts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from my_feast_spark.functions.text import doc_fingerprint, tokens
from my_feast_spark.sources.readers import spread_partitions


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact duplicate groups by normalized-text fingerprint: one row per
    distinct content with the keeper (min id) and duplicate count."""
    return (
        df.select(F.col(id_col), doc_fingerprint(F.col(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _with_shingles(df, id_col, text_col, n):
    """doc -> distinct word n-gram shingle array (docs with < n tokens drop).

    Input is spread to cluster parallelism first: shingling is CPU-bound
    and a small single-file corpus would otherwise run on one core."""
    return (
        spread_partitions(df)
        .select(F.col(id_col).alias("doc"), F.col(text_col).alias("__text"))
        .withColumn("__toks", tokens(F.lower(F.col("__text"))))
        .filter(F.size("__toks") >= n)
        .withColumn("sh", shingles_from_tokens(n))
        .select("doc", "sh")
    )


def shingles_from_tokens(n: int):
    parts = ", ".join(f"__toks[i + {j}]" for j in range(n))
    return F.array_distinct(
        F.expr(
            f"transform(sequence(0, size(__toks) - {n}), "
            f"i -> concat_ws(' ', {parts}))"
        )
    )


def jaccard_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-duplicate pairs via the shingle join.

    Output: (doc_a, doc_b, jaccard) with doc_a < doc_b and jaccard >=
    threshold. ``max_shingle_freq`` drops shingles present in more than
    that many docs before pairing (stop-shingle skew cap for huge
    corpora); exactness is preserved because set sizes use the FULL
    shingle sets — capping only prunes candidate generation, so pairs
    whose every shared shingle is hot can be missed (documented recall
    trade; None = fully exact).
    """
    # persist: the shingle relation feeds both self-join branches and the
    # size lookup — without it Spark re-tokenizes the corpus per branch
    sh = _with_shingles(df, id_col, text_col, n).persist()
    sizes = sh.select("doc", F.size("sh").alias("n_sh"))
    # join/shuffle on the 64-bit shingle hash, not the string: ~an order
    # of magnitude less shuffle volume and cheaper key compares; exact up
    # to xxhash64 collisions (~N_shingles^2 / 2^64 — negligible)
    exploded = sh.select(
        "doc", F.explode("sh").alias("__s")
    ).select("doc", F.xxhash64("__s").alias("shingle"))
    if max_shingle_freq is not None:
        hot = (
            exploded.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") > max_shingle_freq)
            .select("shingle")
        )
        exploded = exploded.join(hot, "shingle", "left_anti")
    a = exploded.alias("a")
    b = exploded.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 4),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, *, n: int = 3, num_hashes: int = 64
) -> DataFrame:
    """MinHash signature per doc: num_hashes columns ``mh_i`` =
    min(xxhash64(i, shingle)) over the doc's shingles.

    Computed per-ROW over the shingle array (array_min ∘ transform) —
    zero shuffle and fully codegen'd, vs. the textbook explode+groupBy
    which shuffles |doc|×|shingles| rows to re-group what was already
    grouped."""
    return _signatures_from_shingles(
        _with_shingles(df, id_col, text_col, n), num_hashes
    )


def _signatures_from_shingles(sh: DataFrame, num_hashes: int) -> DataFrame:
    def hasher(i):
        # NB: must be a 1-arg lambda — transform() treats a second lambda
        # parameter as the array index and would shadow a default arg
        return lambda s: F.xxhash64(F.lit(i), s)

    cols = [
        F.array_min(F.transform(F.col("sh"), hasher(i))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return sh.select("doc", *cols)


def minhash_lsh_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    max_bucket: int = 50,
) -> DataFrame:
    """Near-dup pairs via MinHash + banded LSH + exact-Jaccard verify.

    bands=16 over 64 hashes -> rows-per-band r=4; candidate-capture
    probability 1-(1-j^4)^16 (≈0.98 at j=0.5). Buckets larger than
    ``max_bucket`` docs are dropped (hot-bucket cap — at corpus scale a
    degenerate bucket would otherwise go quadratic). Candidates are then
    verified with exact Jaccard on full shingle sets, so precision is 1;
    recall is the LSH capture probability.
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    r = num_hashes // bands
    # ONE persisted shingle relation feeds signatures AND the exact verify
    sh = _with_shingles(df, id_col, text_col, n).persist()
    sig = _signatures_from_shingles(sh, num_hashes)
    band_rows = sig.select(
        "doc",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(*[F.col(f"mh_{b * r + j}") for j in range(r)]).alias("sig"),
                )
                for b in range(bands)
            ])
        ).alias("bs"),
    ).select("doc", "bs.band", "bs.sig")

    bucket_sizes = band_rows.groupBy("band", "sig").agg(F.count(F.lit(1)).alias("bc"))
    small = bucket_sizes.filter(F.col("bc") <= max_bucket).select("band", "sig")
    band_rows_ok = band_rows.join(small, ["band", "sig"])
    x = band_rows_ok.alias("x")
    y = band_rows_ok.alias("y")
    candidates = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.sig") == F.col("y.sig"))
            & (F.col("x.doc") < F.col("y.doc")),
        )
        .select(F.col("x.doc").alias("doc_a"), F.col("y.doc").alias("doc_b"))
        .distinct()
        # persist + eager materialize: candidates feeds the verify join
        # AND the cand_docs prune below; lazily both consumers would race
        # and re-run the whole band-join lineage twice
        .persist()
    )
    candidates.count()
    # exact verify: jaccard over full shingle sets, restricted to candidates.
    # Semi-join-prune the exploded shingle relation to docs that appear in
    # ANY candidate pair first: verify cost then scales with |candidate
    # docs| x shingles, not |corpus| x shingles — at corpus scale the
    # candidate set is orders of magnitude smaller than the corpus.
    cand_docs = (
        candidates.select(F.col("doc_a").alias("doc"))
        .union(candidates.select(F.col("doc_b").alias("doc")))
        .distinct()
    )
    sizes = sh.select("doc", F.size("sh").alias("n_sh"))
    exploded = (
        sh.join(cand_docs, "doc", "left_semi")
        .select("doc", F.explode("sh").alias("__s"))
        .select("doc", F.xxhash64("__s").alias("shingle"))
    )
    ea = exploded.select(F.col("doc").alias("doc_a"), "shingle")
    eb = exploded.select(F.col("doc").alias("doc_b"), "shingle")
    inter = (
        candidates.join(ea, "doc_a").join(eb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 4),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash(df: DataFrame, id_col: str, text_col: str, *, bits: int = 64) -> DataFrame:
    """64-bit SimHash per doc: bit b of the fingerprint = majority vote of
    bit b over xxhash64(token) of all tokens. Explode + single groupBy
    with ``bits`` small sums (partial agg keeps it cheap)."""
    tok = (
        spread_partitions(df)
        .select(F.col(id_col).alias("doc"), tokens(F.lower(F.col(text_col))).alias("t"))
        .select("doc", F.explode("t").alias("token"))
        .withColumn("h", F.xxhash64("token"))
    )
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v_{b}")
        for b in range(bits)
    ]
    agg = tok.groupBy("doc").agg(*votes)
    fp = F.lit(0).cast("long")
    for b in range(bits):
        bit = F.when(F.col(f"v_{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(
            F.lit(0).cast("long")
        )
        fp = fp.bitwiseOR(bit)
    return agg.select("doc", fp.alias("simhash"))


def simhash_dup_pairs(
    df: DataFrame, id_col: str, text_col: str, *, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Pigeonhole blocking: 4 x 16-bit chunks — any pair within hamming 3
    shares at least one exact chunk, so candidates come from equi-joins
    on (chunk_idx, chunk_value), never a cross join."""
    fp = simhash(df, id_col, text_col)
    chunks = fp.select(
        "doc", "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("ci"),
                    F.shiftrightunsigned(F.col("simhash"), i * 16)
                    .bitwiseAND(F.lit(0xFFFF)).alias("cv"),
                )
                for i in range(4)
            ])
        ).alias("c"),
    ).select("doc", "simhash", "c.ci", "c.cv")
    a = chunks.alias("a")
    b = chunks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.ci") == F.col("b.ci"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
    return pairs
