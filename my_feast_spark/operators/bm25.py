"""BM25 ranked retrieval over a distributed term index.

Retrieval-based quality filtering and query-time corpus exploration
both need "top documents for a bag of terms" at corpus scale. This is
the Okapi BM25 function (Robertson & Zaragoza 2009, the Lucene
variant: ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))``, always
positive), expressed as joins the optimizer can reorder:

* the term-frequency relation keys the only corpus-sized shuffle
  (groupBy doc,term — partial-aggregated map-side);
* the query-term relation is tiny and BROADCAST, so the tf relation is
  semi-pruned to matching terms before anything wide happens;
* document length and the (N, sum_dl) scalars ride a broadcast
  crossJoin — corpus statistics never shuffle;
* the final top-k is a per-query row_number window over only the
  scored (query, doc) pairs.

Engine-exactness (the workload query ``bm25_topk`` is driver
hash-adjudicated against DuckDB): per-term contributions are computed
as doubles with an IDENTICAL parenthesization in both engines, then
quantized to micro-units (``round(contrib * 1e6)`` -> BIGINT) BEFORE
the per-document sum — so the only order-sensitive float reduction in
BM25 (summing term scores) becomes an exact integer sum, immune to
partial-aggregation order. The 1e-6 quantization error is ~1e4x below
any realistic score gap; ranking ties break on doc_id in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: score quantization: micro-units
SCALE = 1_000_000


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: DataFrame,
    *,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents per query by BM25.

    ``query_terms`` is a (query_id, term) relation — expected tiny
    (it is broadcast). Returns (query_id, doc_id, n_terms_matched,
    score_scaled, score, rank).
    """
    from my_feast_spark.functions.text import tokens

    tok = docs.select(
        F.col(id_col).alias("doc"),
        F.explode_outer(tokens(F.lower(F.col(text_col)))).alias("term"),
    ).filter(F.col("term").isNotNull())
    tf = tok.groupBy("doc", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = tok.groupBy("doc").agg(F.count(F.lit(1)).alias("dl"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = dl.agg(
        F.sum("dl").alias("sum_dl"), F.count(F.lit(1)).alias("n_docs")
    )

    matched = (
        tf.join(F.broadcast(query_terms), "term")
        .join(F.broadcast(dfreq.join(
            query_terms.select("term").distinct(), "term", "left_semi"
        )), "term")
        .join(dl, "doc")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    norm = F.lit(1.0 - b) + F.lit(b) * (
        (F.col("dl") * F.col("n_docs")).cast("double") / F.col("sum_dl")
    )
    contrib = idf * (
        (F.col("tf") * F.lit(k1 + 1.0)) / (F.col("tf") + F.lit(k1) * norm)
    )
    per_term = matched.select(
        "query_id",
        "doc",
        F.round(contrib * SCALE).cast("long").alias("c_scaled"),
    )
    scored = per_term.groupBy("query_id", "doc").agg(
        F.count(F.lit(1)).alias("n_terms_matched"),
        F.sum("c_scaled").alias("score_scaled"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_scaled").desc(), F.col("doc").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("doc").alias("doc_id"),
            "n_terms_matched",
            "score_scaled",
            (F.col("score_scaled") / F.lit(float(SCALE))).alias("score"),
            "rank",
        )
    )


def bm25_sql(
    *,
    source: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    query_cte: str,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB replay with the IDENTICAL contribution parenthesization.
    ``query_cte`` must define a relation ``qt(query_id, term)``."""
    return f"""
WITH tok AS (
  SELECT {id_col} AS doc,
         unnest(string_split_regex(trim(lower({text_col})), '\\s+')) AS term
  FROM {source}
), tf AS (
  SELECT doc, term, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2
), dl AS (
  SELECT doc, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY 1
), dfreq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
), stats AS (
  SELECT CAST(sum(dl) AS BIGINT) AS sum_dl,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM dl
), qt AS ({query_cte}
), per_term AS (
  SELECT qt.query_id, tf.doc,
         CAST(round(
           ln(1.0e0 + (stats.n_docs - dfreq.df + 0.5e0)
                      / (dfreq.df + 0.5e0))
           * ((tf.tf * {k1 + 1.0!r}e0)
              / (tf.tf + {k1!r}e0 *
                 ({1.0 - b!r}e0 + {b!r}e0 *
                  (CAST(dl.dl * stats.n_docs AS DOUBLE) / stats.sum_dl))))
           * {SCALE}) AS BIGINT) AS c_scaled
  FROM tf
  JOIN qt USING (term)
  JOIN dfreq USING (term)
  JOIN dl USING (doc)
  CROSS JOIN stats
), scored AS (
  SELECT query_id, doc,
         CAST(count(*) AS BIGINT) AS n_terms_matched,
         CAST(sum(c_scaled) AS BIGINT) AS score_scaled
  FROM per_term GROUP BY 1, 2
), ranked AS (
  SELECT *, CAST(row_number() OVER (
           PARTITION BY query_id
           ORDER BY score_scaled DESC, doc ASC) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, doc AS doc_id, n_terms_matched, score_scaled,
       score_scaled / {float(SCALE)!r}e0 AS score, rank
FROM ranked WHERE rank <= {k}
"""
