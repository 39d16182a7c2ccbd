"""Cardinality / overlap sketches: KMV (bottom-k) and HyperLogLog.

Why this tier exists: at 100 TB the questions "how many distinct
shingles does this corpus have", "how much does crawl snapshot A
overlap snapshot B", and "how many distinct users per event type per
day" are planning inputs for every other operator in this engine —
MinHash band count, Bloom filter sizing (``operators/bloom.py``),
dedup-index bucket count — and computing them EXACTLY means a full
shuffle of the distinct keys (count(DISTINCT x) re-keys the whole
relation). A sketch answers them from state that is *constant-size and
mergeable*:

* **KMV (k minimum values)** keeps the k smallest hash values of the
  distinct set.  Distinct-count estimate ``(k-1) * 2^63 / h_k`` (Bar-
  Yossef et al. 2002); two sketches merge by re-taking the bottom-k of
  their union, and the overlap of the union sketch's members estimates
  Jaccard directly (Beyer et al., "On Synopses for Distinct-Value
  Estimation Under Multiset Operations", SIGMOD'07).  Spark shape: the
  bottom-k is ``ORDER BY h LIMIT k`` — Catalyst plans a
  TakeOrderedAndProject, which computes a per-partition partial top-k
  map-side and ships ONLY k rows per partition to the driver-side
  merge; the only full shuffle is the distinct() on the hash, which is
  itself map-side partially aggregated.

* **HyperLogLog** (Flajolet et al. 2007) keeps ``m = 2^p`` registers of
  max leading-zero counts.  Spark shape: ``groupBy(group, bucket).max``
  then ``groupBy(group)`` — both stages partially aggregate map-side,
  so the shuffle carries at most ``m`` rows per group regardless of
  input volume, and register tables for different days/shards merge
  with an elementwise MAX (the basis for incremental daily profiles).

Engine-exactness: everything is built on the portable md5 hash family
(``operators/dedup.portable_hash64``), all estimator arithmetic is
integer until ONE final division, and ``rho`` (the leading-zero rank)
is computed from ``length(bin(x))`` — minimal-width binary rendering,
which Spark's ``bin()`` and DuckDB's ``bin()`` agree on bit-for-bit.
So a DuckDB oracle replays the FULL sketch, register table and
estimate included, and the driver hash-adjudicates it (workload
queries ``kmv_corpus_overlap`` / ``hll_group_distinct``).

Spark has ``approx_count_distinct`` (a HLL++ built-in); it is the
right call when only the scalar estimate is needed.  This module
exists for what the built-in does not expose: the *sketch itself* as a
first-class relation — persistable, mergeable across ingests, and
usable for overlap/Jaccard between corpora, none of which the opaque
built-in aggregate supports.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from my_feast_spark.operators.dedup import _MASK63, portable_hash64

#: 2^63 as an exactly-representable double; numerator of the KMV
#: estimator. Written as a literal so the Spark plan and the SQL oracle
#: parse the IDENTICAL double.
TWO63_F = 9.223372036854775808e18

#: HLL integer-sum scale: Z is accumulated as sum(2^(HLL_SCALE_BITS -
#: rho)) in BIGINT, which quantizes register contributions below
#: 2^-HLL_SCALE_BITS to zero (relative error < 2^-40 — far below the
#: sketch's own ~1.04/sqrt(m) error) and keeps the sum exact-integer so
#: no float accumulation order can diverge between engines.
HLL_SCALE_BITS = 40


def sketch_hash(col: Column, hash_fn: str = "portable") -> Column:
    """63-bit positive hash — the input of every sketch. ``"portable"``
    (md5-derived, bit-replayable by a SQL oracle — the adjudicated
    queries' family) or ``"xxhash64"`` (ONE native node, ~6.5x cheaper
    per value — the pure-Spark scale path, same convention as the dedup
    family's hash switch; estimator quality is identical, digests are
    not comparable across families)."""
    if hash_fn == "xxhash64":
        return F.xxhash64(col).bitwiseAND(F.lit(_MASK63))
    if hash_fn != "portable":
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    return portable_hash64(col).bitwiseAND(F.lit(_MASK63))


def kmv_sketch(
    df: DataFrame, value: Column | str, k: int,
    *, hash_fn: str = "portable",
) -> DataFrame:
    """Bottom-k sketch of the distinct values of ``value``: a DataFrame
    with one column ``h`` (ascending hash), at most ``k`` rows.

    Plan: distinct-by-hash (map-side partial agg) then a
    TakeOrderedAndProject — the driver merge sees k rows per partition,
    never the distinct set itself."""
    col = F.col(value) if isinstance(value, str) else value
    return (
        df.select(sketch_hash(col, hash_fn).alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("__n"))
        .select("h")
        .orderBy("h")
        .limit(k)
    )


def kmv_union(sketches: list[DataFrame], k: int) -> DataFrame:
    """Merge KMV sketches: bottom-k of the union of their members.
    Valid because each input sketch's members are the k smallest of its
    set — the union's k smallest are all present in some input."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.select("h").distinct().orderBy("h").limit(k)


def kmv_distinct_estimate(kth: Column, k: int) -> Column:
    """KMV distinct-count estimator ``(k-1) * 2^63 / h_k``, rounded to
    4 dp so the one float division stays hash-stable across engines."""
    return F.round(F.lit(float(k - 1) * TWO63_F / 1.0) / kth, 4)


def hll_alpha(m: int) -> float:
    """The standard HLL bias-correction constant for ``m`` registers."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_rho(rest: Column, width: int) -> Column:
    """Rank of the leading 1-bit of ``rest`` (a ``width``-bit positive
    value), counted from the most significant end, 1-based; ``width+1``
    when rest == 0.  ``length(bin(x))`` is the minimal binary width —
    identical in Spark and DuckDB — so ``rho = width - msb_len + 1``."""
    return (
        F.when(rest > 0, F.lit(width + 1) - F.length(F.bin(rest)))
        .otherwise(F.lit(width + 1))
        .cast("int")
    )


def hll_registers(
    df: DataFrame, value: Column | str, *, p: int = 8,
    group_by: list[str] | None = None, hash_fn: str = "portable",
) -> DataFrame:
    """HLL register table: one row per (group, bucket) with the max
    leading-zero rank ``rho``.  ``bucket`` is the low ``p`` hash bits,
    ``rho`` ranks the remaining ``63-p`` bits.  Shuffle is bounded by
    ``m = 2^p`` rows per group (map-side max before the exchange);
    register tables from different shards merge by elementwise MAX."""
    col = F.col(value) if isinstance(value, str) else value
    m = 1 << p
    width = 63 - p
    h = sketch_hash(col, hash_fn)
    keys = list(group_by or [])
    base = df.select(
        *keys,
        (h.bitwiseAND(F.lit(m - 1))).alias("bucket"),
        F.shiftright(h, p).alias("__rest"),
    ).withColumn("rho", hll_rho(F.col("__rest"), width))
    return base.groupBy(*keys, "bucket").agg(F.max("rho").alias("rho"))


def hll_estimate(
    registers: DataFrame, *, p: int = 8, group_by: list[str] | None = None,
) -> DataFrame:
    """Collapse a register table to one row per group:

    ``n_zero``       registers never touched (m - present buckets)
    ``sum_scaled``   sum(2^(HLL_SCALE_BITS - rho)) — exact integer
    ``registers_md5`` digest of the zero-padded (bucket, rho) list,
                      order-free because it is sorted before hashing
    ``est_distinct`` the HLL estimate with the standard small-range
                      linear-counting correction (est <= 2.5m and
                      zero registers present -> m * ln(m / n_zero))

    The raw-estimate denominator ``Z = n_zero * 2^S + sum_scaled`` is
    integer; the single division and the one ``ln`` are rounded to 4 dp
    — the same engine-parity treatment the TF-IDF query uses."""
    m = 1 << p
    alpha = hll_alpha(m)
    keys = list(group_by or [])
    scale = 1 << HLL_SCALE_BITS
    # rho in [1, width+1]; contributions with rho > HLL_SCALE_BITS (i.e.
    # < 2^-40) are quantized to 0 by the WHEN below — documented at the
    # module constant. Worst-case integer sums: present-bucket sum
    # <= m * 2^(S-1), zero-bucket term <= m * 2^S — both far inside long.
    reg_str = F.concat_ws(
        ":",
        F.lpad(F.col("bucket").cast("string"), 4, "0"),
        F.lpad(F.col("rho").cast("string"), 2, "0"),
    )
    agg = registers.groupBy(*keys).agg(
        (F.lit(m) - F.count(F.lit(1))).cast("long").alias("n_zero"),
        F.sum(
            F.when(
                F.col("rho") <= HLL_SCALE_BITS,
                # shiftleft's python wrapper wants a literal shift; the
                # SQL form accepts the per-row column
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), {HLL_SCALE_BITS} - rho)"
                ),
            ).otherwise(F.lit(0).cast("long"))
        ).alias("sum_scaled"),
        F.md5(
            F.concat_ws(",", F.array_sort(F.collect_list(reg_str)))
        ).alias("registers_md5"),
    )
    raw = F.round(
        F.lit(alpha * m * m * float(scale))
        / (F.col("n_zero") * F.lit(scale) + F.col("sum_scaled")),
        4,
    )
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (F.col("n_zero") > 0),
        F.round(F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("n_zero")), 4),
    ).otherwise(raw)
    return agg.select(
        *keys, "n_zero", "sum_scaled", "registers_md5", est.alias("est_distinct")
    )


def hll_group_distinct(
    df: DataFrame, value: Column | str, group_by: list[str], *, p: int = 8,
    hash_fn: str = "portable",
) -> DataFrame:
    """Registers + estimate in one call — the per-group distinct-count
    profile (``hll_group_distinct`` workload query)."""
    regs = hll_registers(df, value, p=p, group_by=group_by, hash_fn=hash_fn)
    return hll_estimate(regs, p=p, group_by=group_by)


# --- count-min sketch ------------------------------------------------------


def _cms_width_bits(d: int, w: int) -> int:
    """log2(w) when the (d, w) geometry supports one-hash bit-slicing:
    w a power of two and d*log2(w) <= 63 (each depth row draws a
    disjoint bit field from ONE hash — d hash evaluations per element
    collapse to one, the dominant per-row cost). Raises otherwise; the
    salted-hash generality was measured 4x the expression work at d=4
    and nothing in the repo needs w beyond 2^15 at d=4."""
    if w < 2 or w & (w - 1):
        raise ValueError(f"w={w} must be a power of two")
    p = w.bit_length() - 1
    if d * p > 63:
        raise ValueError(f"d={d} rows of {p}-bit columns exceed 63 bits")
    return p


def _cms_cols_from_hash(h: Column, d: int, w: int):
    """All d counter columns sliced from a precomputed hash COLUMN.
    Callers must project the hash first (``.withColumn``) — reusing the
    hash Column object inline duplicates the md5 chain into every array
    element (codegen subexpression elimination does not reach inside
    CreateArray, A/B-measured), while a projection guarantees one
    evaluation per row."""
    p = _cms_width_bits(d, w)
    return [
        F.shiftright(h, i * p).bitwiseAND(F.lit(w - 1)) for i in range(d)
    ]


def cms_build(
    df: DataFrame, value: Column | str, *, d: int = 4, w: int = 16384,
    hash_fn: str = "portable", weight: Column | str | None = None,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) of the value
    stream's frequencies: a (r, c, cnt) relation with at most ``d*w``
    rows — constant-size state no matter the input volume, mergeable by
    summing counters. ONE scan: the d (row, col) pairs explode from an
    array literal and the groupBy collapses map-side to <= d*w rows per
    partition before the exchange. Point estimates never underestimate
    (each counter is a superset sum); overestimation shrinks as 1/w.

    ``weight``: optional long column — each row then contributes
    ``weight`` to its counters instead of 1. Building from a
    PRE-AGGREGATED (value, count) relation with ``weight=count`` yields
    the IDENTICAL sketch as the raw stream (counters are order-free
    integer sums) while paying the hash and the d-way explode once per
    DISTINCT value instead of once per occurrence — the
    aggregate-first shape the heavy-hitter query uses (r16)."""
    col = F.col(value) if isinstance(value, str) else value
    _cms_width_bits(d, w)
    if weight is None:
        base = df.select(sketch_hash(col, hash_fn).alias("__h"))
        extra, cnt = [], F.count(F.lit(1))
    else:
        wcol = F.col(weight) if isinstance(weight, str) else weight
        base = df.select(
            sketch_hash(col, hash_fn).alias("__h"), wcol.alias("__w")
        )
        extra, cnt = ["__w"], F.sum("__w")
    pos = F.array(*[
        F.struct(F.lit(i).alias("r"), c.alias("c"))
        for i, c in enumerate(_cms_cols_from_hash(F.col("__h"), d, w))
    ])
    return (
        base.select(F.explode(pos).alias("p"), *extra)
        .groupBy(F.col("p.r").alias("r"), F.col("p.c").alias("c"))
        .agg(cnt.cast("long").alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame,
    keys: DataFrame,
    key: Column | str,
    *,
    d: int = 4,
    w: int = 16384,
    hash_fn: str = "portable",
    out_col: str = "est_count",
) -> DataFrame:
    """Point-query the sketch for every row of ``keys``: the minimum of
    the key's d counters (0 when a counter row is absent). The sketch
    relation is broadcast (<= d*w rows); the keys relation is expected
    small (heavy-hitter candidates)."""
    col = F.col(key) if isinstance(key, str) else key
    _cms_width_bits(d, w)
    keys_h = keys.withColumn("__h", sketch_hash(col, hash_fn))
    pos = F.array(*[
        F.struct(F.lit(i).alias("r"), c.alias("c"))
        for i, c in enumerate(_cms_cols_from_hash(F.col("__h"), d, w))
    ])
    probes = keys_h.withColumn("__p", F.explode(pos)).select(
        *keys.columns, F.col("__p.r").alias("r"), F.col("__p.c").alias("c")
    )
    joined = probes.join(F.broadcast(cms), ["r", "c"], "left").withColumn(
        "__cnt", F.coalesce(F.col("cnt"), F.lit(0).cast("long"))
    )
    return joined.groupBy(*keys.columns).agg(
        F.min("__cnt").alias(out_col)
    )


def cms_col_sql(expr: str, i_expr: str, w: int) -> str:
    """DuckDB replay of the ``_cms_cols`` bit slice with a per-row
    depth index (``i_expr`` multiplies the slice offset)."""
    p = w.bit_length() - 1
    return (
        f"(((md5_number_lower({expr}) & 9223372036854775807)"
        f" >> ({i_expr} * {p})) & {w - 1})"
    )


def skew_report(
    df: DataFrame,
    key: Column | str,
    row_id: Column | str,
    *,
    d: int = 4,
    w: int = 16384,
    top: int = 10,
    sample_mod: int = 64,
    rows_per_task: int = 2_000_000,
    hash_fn: str = "portable",
) -> DataFrame:
    """Shuffle-skew diagnosis from sketches — the 100 TB-cheap sibling
    of the PIT auto-strategy's exact key-count probe: before keying a
    join/groupBy on ``key``, estimate the hottest keys WITHOUT a full
    re-key of the relation.

    Mechanics: one count, one CMS build (d*w bounded counters), and a
    deterministic 1/``sample_mod`` hash sample of the ROWS — keyed on
    ``row_id``, a unique row identifier, NOT on the key (hashing the
    key keeps or drops each key wholesale, so a hot key would survive
    only with probability 1/mod — the bug the first cut of this
    function shipped) — to surface CANDIDATE keys (any key with
    frequency >= sample_mod rows appears in the sample w.h.p.; rarer
    keys cannot be skew). Candidates are
    point-queried against the CMS (never-underestimate, so no hot key
    is missed by the estimate side) and the top-``top`` reported with:

    ``est_count``      CMS estimate (upper bound on the true count)
    ``est_share``      est_count / total rows, rounded 6 dp
    ``suggested_salt`` ceil(est_count / rows_per_task) — the salt
                       factor that caps the key's partition at one
                       task-sized slice (1 = no salting needed)

    Scale shape: the only corpus-wide work is two map-side-combined
    aggregations (CMS counters, total count) and the sample filter; the
    candidate relation is sample-sized and the CMS is broadcast by
    ``cms_estimate``."""
    col = F.col(key) if isinstance(key, str) else key
    rid = F.col(row_id) if isinstance(row_id, str) else row_id
    total = df.count()
    cms = cms_build(df, col, d=d, w=w, hash_fn=hash_fn)
    cand = (
        df.where(
            F.pmod(
                sketch_hash(rid.cast("string"), hash_fn),
                F.lit(sample_mod),
            )
            == 0
        )
        .select(col.alias("key"))
        .distinct()
    )
    est = cms_estimate(cms, cand, "key", d=d, w=w, hash_fn=hash_fn)
    return (
        est.orderBy(F.col("est_count").desc(), F.col("key").asc())
        .limit(top)
        .select(
            "key",
            "est_count",
            # stable 6dp round (floor(x*1e6 + .5)/1e6): both engines
            # compute the identical IEEE quotient, so the explicit form
            # can never diverge on a .5 boundary the way native round's
            # shortest-decimal repr can (the repo-wide parity rule)
            (
                F.floor(
                    F.col("est_count") * F.lit(1_000_000.0)
                    / F.lit(float(total))
                    + F.lit(0.5)
                )
                / F.lit(1_000_000.0)
            ).alias("est_share"),
            F.greatest(
                F.lit(1),
                F.ceil(F.col("est_count") / F.lit(float(rows_per_task))),
            ).cast("int").alias("suggested_salt"),
        )
    )


#: date_trunc units that nest transitively (each unit's period is a
#: whole number of the next finer unit's periods); 'week' nests over
#: these but nothing coarser nests over 'week'
_NESTING_RANK = {
    "microsecond": 0, "millisecond": 1, "second": 2, "minute": 3,
    "hour": 4, "day": 5, "month": 6, "quarter": 7, "year": 8,
}


def _validate_rollup_levels(levels: tuple[str, ...]) -> None:
    if not levels:
        raise ValueError("levels must be non-empty")
    fine = levels[0].lower()
    for lvl in levels[1:]:
        coarse = lvl.lower()
        if coarse == fine:
            continue
        if coarse == "week":
            # week(coarse) nests over day-or-finer fines only
            if fine in _NESTING_RANK and _NESTING_RANK[fine] <= 5:
                continue
            raise ValueError(
                f"'week' does not nest over finest level {fine!r}"
            )
        if fine == "week":
            raise ValueError(
                "finest level 'week' cannot fold into "
                f"{coarse!r}: weeks straddle its boundaries — use "
                "'day' (or finer) as the finest level"
            )
        if (
            fine not in _NESTING_RANK
            or coarse not in _NESTING_RANK
            or _NESTING_RANK[coarse] < _NESTING_RANK[fine]
        ):
            raise ValueError(
                f"level {coarse!r} does not nest over finest level "
                f"{fine!r} (order levels fine -> coarse; supported: "
                f"{sorted(_NESTING_RANK)} + 'week' over day-or-finer)"
            )


def hll_time_rollup(
    df: DataFrame,
    ts: Column | str,
    value: Column | str,
    *,
    p: int = 10,
    levels: tuple[str, ...] = ("day", "week", "month"),
    group_by: list[str] | None = None,
    hash_fn: str = "portable",
) -> DataFrame:
    """Distinct-count time rollup — the hypertable continuous-aggregate
    pattern over HLL state: the RAW data is scanned once to build the
    finest level's register table (``levels[0]``), and every coarser
    level folds the finer REGISTERS (date_trunc the period, elementwise
    MAX) — a week's estimate never rescans the week's rows, and a late
    partition only dirties its own fine bucket (the same
    maintain-fine/fold-coarse shape ``streaming/sketches.py`` keeps
    incrementally). Exact count(DISTINCT) cannot do this: distinct
    counts do not add across periods, registers max-merge.

    Returns one row per (granularity, period, *group_by) with the usual
    estimate columns; ``granularity`` values follow ``levels``.
    ``levels`` must be ordered fine -> coarse, and every coarser level
    must NEST the finest one — date_trunc(coarse, fine_period) must
    equal date_trunc(coarse, ts) for every ts in the fine period.
    Weeks break this against months/quarters/years (a week straddles
    the month boundary, so folding week registers into months
    misattributes whole weeks — review-caught), so 'week' is only
    accepted as a COARSE level over day-or-finer grains, never as the
    finest level under a non-week coarser one."""
    _validate_rollup_levels(levels)
    tcol = F.col(ts) if isinstance(ts, str) else ts
    keys = list(group_by or [])
    fine = levels[0]
    fine_regs = hll_registers(
        df.withColumn("__period", F.date_trunc(fine, tcol)),
        value, p=p, group_by=[*keys, "__period"], hash_fn=hash_fn,
    ).persist()
    out = None
    for lvl in levels:
        regs = (
            fine_regs
            if lvl == fine
            else fine_regs.groupBy(
                *keys,
                F.date_trunc(lvl, F.col("__period")).alias("__period"),
                "bucket",
            ).agg(F.max("rho").alias("rho"))
        )
        est = hll_estimate(
            regs, p=p, group_by=[*keys, "__period"]
        ).select(
            F.lit(lvl).alias("granularity"),
            F.col("__period").alias("period"),
            *keys,
            "n_zero", "sum_scaled", "registers_md5", "est_distinct",
        )
        out = est if out is None else out.unionByName(est)
    out._owned_caches = [fine_regs]
    return out


# --- SQL oracle fragments -------------------------------------------------


def sketch_hash_sql(expr: str) -> str:
    """DuckDB replay of ``sketch_hash``."""
    return f"(md5_number_lower({expr}) & 9223372036854775807)"


def hll_rho_sql(rest: str, width: int) -> str:
    """DuckDB replay of ``hll_rho``."""
    return (
        f"CAST(CASE WHEN {rest} > 0 THEN {width + 1} - length(bin({rest})) "
        f"ELSE {width + 1} END AS INTEGER)"
    )
