"""Domain-level curation operators: per-domain quotas and blocklists.

Crawl pipelines cap how much any single site contributes (RefinedWeb's
per-domain limits; C4's source balancing) and drop blocklisted domains
before any text-level work. Both stages run on the 8-byte-ish domain
key, never the document text.

``domain_quota`` keeps the ``n`` smallest rows per domain by a total
order — implemented as a SALTED TWO-PHASE top-n instead of a
``row_number`` window: a window sorts each domain inside one partition,
so one hot domain (at 100 TB a single host can be 1e8 rows) serializes
into one task. Phase 1 takes a per-(domain, salt) top-n with a
map-side-combinable aggregate (``slice(array_sort(collect_list(..)))``
— each group holds at most ``rows/salt_buckets`` rows, and its output
is capped at n); phase 2 re-reduces the ≤ ``salt_buckets * n``
candidates per domain to the final n. The result is identical to the
window form (top-n of a total order is associative), which is exactly
how an SQL oracle replays it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def domain_quota(
    df: DataFrame,
    domain_col: str,
    order_cols: list[str],
    n: int,
    *,
    salt_buckets: int = 32,
) -> DataFrame:
    """Keep at most ``n`` rows per ``domain_col`` — the n smallest by
    ``order_cols``, which MUST end in a unique key (ties would make the
    kept set partition-order-dependent, and the keep-set join-back
    would silently keep EVERY row sharing a kept key). The contract is
    ENFORCED: duplicate order keys raise at execution time (checked on
    the phase-1 aggregate's already-collected array — no extra shuffle;
    identical keys always share a salt bucket, so the per-group check
    is complete). Returns the surviving rows with the original columns.

    The two aggregate phases both combine map-side; no row_number
    window, no per-domain global sort, hot domains bounded by
    ``salt_buckets``. ``salt_buckets=1`` degenerates to a plain
    per-domain aggregate (useful to A/B the salting overhead)."""
    if n < 1:
        raise ValueError("quota n must be positive")
    if salt_buckets < 1:
        raise ValueError("salt_buckets must be positive")
    ocols = [F.col(c) for c in order_cols]
    o = F.struct(*ocols)
    # salt only distributes rows of one domain across groups; the salt
    # function never reaches the output (any engine-local hash is fine)
    salt = F.pmod(F.xxhash64(*ocols), F.lit(salt_buckets))
    arr = F.array_sort(F.collect_list("__dq_o"))
    unique_ok = F.assert_true(
        F.size(arr) == F.size(F.array_distinct(arr)),
        F.concat(
            F.lit("domain_quota: order_cols are not a unique key "
                  "(duplicate order keys in domain "),
            F.col(domain_col).cast("string"),
            F.lit(")"),
        ),
    )
    partial = (
        df.withColumn("__dq_o", o)
        .withColumn("__dq_s", salt)
        .groupBy(domain_col, "__dq_s")
        .agg(
            F.when(unique_ok.isNull(), F.slice(arr, 1, n)).alias("__t")
        )
    )
    final = (
        partial.select(domain_col, F.explode("__t").alias("__dq_o"))
        .groupBy(domain_col)
        .agg(F.slice(F.array_sort(F.collect_list("__dq_o")), 1, n).alias("__t"))
        .select(domain_col, F.explode("__t").alias("__dq_o"))
    )
    # join the kept keys back to the full rows (the struct carries only
    # the order columns — text/payload never enters the aggregates)
    kept = final.select(
        domain_col, *[F.col(f"__dq_o.{c}").alias(c) for c in order_cols]
    )
    return df.join(kept, [domain_col, *order_cols], "left_semi")


def blocklist_filter(
    df: DataFrame,
    domain_col: str,
    blocked: DataFrame | list[str],
) -> DataFrame:
    """Drop rows whose domain appears in the blocklist. A list becomes
    a one-column DataFrame; either way the filter is a broadcast
    LEFT ANTI join — the blocklist (even the multi-million-entry
    production ones) is tiny next to the corpus and never shuffles it."""
    if isinstance(blocked, list):
        spark = df.sparkSession
        blocked = spark.createDataFrame(
            [(d,) for d in blocked], f"{domain_col} string"
        )
    return df.join(
        F.broadcast(blocked.select(domain_col).distinct()),
        domain_col,
        "left_anti",
    )
