"""Broadcast Bloom-filter membership prefilter for cross-corpus dedup.

The 100 TB problem this solves: "drop every new document whose
fingerprint already exists in the reference corpus" is an anti/semi
join between two huge relations — a full shuffle of BOTH sides on the
fingerprint. A Bloom filter over the reference keys is a few hundred
MB of *constant-size, broadcastable* state no matter how large the
reference is, and it answers "definitely not present" for the vast
majority of candidates map-side — only the (tiny) maybe-present
fraction pays the exact verification join. Same pattern Spark itself
uses internally for runtime-filter join pruning; here it is exposed as
a first-class operator because dedup pipelines need the filter as a
*persistable artifact* (build once per reference snapshot, reuse
across many incoming batches), not a per-query optimization.

Two physical strategies, same semantics:

* ``bloom_maybe_contains`` — the positions relation (distinct set-bit
  indexes, at most ``m_bits`` rows of one long) is broadcast and each
  of the ``k`` candidate positions is checked with one broadcast LEFT
  join: **zero shuffle of the candidate relation**, plan-pinned in
  tests/test_bloom.py. This is the default: it keeps every byte of
  state inside the Spark plan (no driver collect), so it scales to any
  m the broadcast threshold allows.
* ``bloom_bitmap`` + ``bloom_maybe_from_bitmap`` — the classic packed
  form: m/64 longs collected to the driver (bounded by ``m_bits``,
  guarded) and embedded as an array literal; membership is two native
  expressions (element_at + shift). Cheapest per row, right when m is
  small enough to live in the plan (≲ 2^22 bits).

Hashing is the double-hashing scheme g_i(x) = h1(x) + i*h2(x) mod m
(Kirsch & Mitzenmacher 2006, "Less Hashing, Same Performance") over
the portable md5 family — so a DuckDB oracle replays every bit
position and the driver hash-adjudicates the filter's exact behavior,
false positives included (workload query ``bloom_prefilter_dedup``).

No false negatives by construction: a key inserted in the build sets
exactly the positions the probe checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from my_feast_spark.operators.dedup import _MASK63  # noqa: F401
from my_feast_spark.operators.sketches import sketch_hash



def _check_m(m_bits: int) -> int:
    """m must be a power of two (the h1/h2 bit-slices depend on it);
    returns log2(m)."""
    if m_bits < 64 or m_bits & (m_bits - 1):
        raise ValueError(f"m_bits={m_bits} must be a power of two >= 64")
    return m_bits.bit_length() - 1


def positions_from_hash(
    h: Column, *, m_bits: int, k_hashes: int,
) -> list[Column]:
    """The k bit positions from a precomputed 63-bit hash: h1 = the low
    log2(m) bits, h2 = the NEXT bits mod (m-1) plus 1 (never 0), then
    g_i = (h1 + i*h2) mod m — double hashing (Kirsch & Mitzenmacher
    2006) with both base hashes sliced from ONE hash value. One hash
    node per row instead of two: the md5 chain is the per-row cost that
    dominates probe evaluation (profiled at sf0.1), and with m <= 2^22
    the h2 slice still draws from >= 41 independent bits.
    ``i*h2 < k*m`` keeps the sum far inside signed-64 range."""
    p = _check_m(m_bits)
    h1 = h.bitwiseAND(F.lit(m_bits - 1))
    h2 = F.pmod(F.shiftright(h, p), F.lit(m_bits - 1)) + F.lit(1)
    return [
        F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)) for i in range(k_hashes)
    ]


def bloom_positions(
    key: Column, *, m_bits: int, k_hashes: int, hash_fn: str = "portable",
) -> list[Column]:
    """The k bit positions of ``key`` (see :func:`positions_from_hash`).
    ``hash_fn`` follows the sketch / dedup families' convention:
    "portable" (SQL-oracle-replayable md5, the adjudicated default) or
    "xxhash64" (one native node, the pure-Spark scale path — build and
    probe must use the SAME family)."""
    return positions_from_hash(
        sketch_hash(key, hash_fn), m_bits=m_bits, k_hashes=k_hashes
    )


def bloom_position_set_from_hashes(
    hashes: DataFrame, hash_col: str = "__h", *, m_bits: int, k_hashes: int,
) -> DataFrame:
    """:func:`bloom_position_set` from a PRECOMPUTED 63-bit hash
    relation — the aggregate-first build path (guide §2.3, r17): a
    caller that already holds the reference's distinct key hashes (for
    an exact-verify join, say) builds the filter from them directly,
    so the keys are hashed once per DISTINCT value instead of once per
    occurrence per consumer."""
    pos = positions_from_hash(
        F.col(hash_col), m_bits=m_bits, k_hashes=k_hashes
    )
    return (
        hashes.select(F.explode(F.array(*pos)).alias("pos")).distinct()
    )


def bloom_position_set(
    df: DataFrame, key: Column | str, *, m_bits: int, k_hashes: int,
    hash_fn: str = "portable",
) -> DataFrame:
    """The filter as a relation: the distinct set-bit positions of every
    reference key — at most ``m_bits`` rows, one ``pos`` long each.
    Build cost: one projection + one distinct on a bounded domain
    (map-side partial agg collapses it before the exchange)."""
    col = F.col(key) if isinstance(key, str) else key
    # hash PROJECTED first: inlining the hash Column into the k position
    # expressions duplicates the md5 chain k times per row (optimizer
    # projection-collapse; measured on the workload query's plan)
    hashed = df.select(sketch_hash(col, hash_fn).alias("__h"))
    return bloom_position_set_from_hashes(
        hashed, "__h", m_bits=m_bits, k_hashes=k_hashes
    )


def bloom_maybe_contains(
    candidates: DataFrame,
    positions: DataFrame,
    key: Column | str,
    *,
    m_bits: int,
    k_hashes: int,
    hash_fn: str = "portable",
    out_col: str = "bloom_maybe",
) -> DataFrame:
    """Annotate ``candidates`` with the Bloom membership verdict using
    ``k_hashes`` broadcast left joins against the positions relation —
    the candidate side is never shuffled (the exchange-free side of a
    BroadcastHashJoin), and Catalyst reuses the single broadcast across
    all k probes."""
    col = F.col(key) if isinstance(key, str) else key
    # hash PROJECTED below the joins: the k join conditions then
    # reference the attribute (one md5 per row) instead of inlining the
    # full hash chain into every condition (plan-pinned in
    # tests/test_bloom.py)
    hcol = "__bloom_h"
    out = candidates.withColumn(hcol, sketch_hash(col, hash_fn))
    pos = positions_from_hash(
        F.col(hcol), m_bits=m_bits, k_hashes=k_hashes
    )
    hit_cols = []
    for i, p in enumerate(pos):
        bp = f"__bloom_pos_{i}"
        hit = f"__bloom_hit_{i}"
        out = (
            out.join(
                F.broadcast(positions.select(F.col("pos").alias(bp))),
                p == F.col(bp),
                "left",
            )
            .withColumn(hit, F.col(bp).isNotNull())
            .drop(bp)
        )
        hit_cols.append(hit)
    verdict = F.lit(True)
    for h in hit_cols:
        verdict = verdict & F.col(h)
    return out.withColumn(out_col, verdict).drop(*hit_cols, hcol)


def bloom_auto_geometry(
    df: DataFrame,
    key: Column | str,
    *,
    bits_per_key: int = 10,
    max_bits: int = 1 << 30,
    hash_fn: str = "portable",
) -> tuple[int, int]:
    """Size the filter from the data instead of a guess: a KMV bottom-k
    sketch (operators/sketches.py — ONE distinct-by-hash pass, k rows to
    the driver) estimates the reference's distinct-key count n̂, then

        m = next power of two >= bits_per_key * n̂   (capped at max_bits)
        k = round(ln 2 * m / n̂)                     (the optimal-FP k)

    10 bits/key with the optimal k gives ~0.8% FP — the usual dedup
    operating point. This is the sketch tier acting as the planning
    input it exists to be: the cardinality question is answered without
    re-keying the reference. Returns ``(m_bits, k_hashes)``."""
    import math

    from my_feast_spark.operators.sketches import TWO63_F, kmv_sketch

    sk = kmv_sketch(df, key, 256, hash_fn=hash_fn).collect()
    if not sk:
        raise ValueError("empty reference: nothing to size a filter for")
    n_est = (
        float(len(sk))
        if len(sk) < 256
        else (256 - 1) * TWO63_F / float(sk[-1]["h"])
    )
    m = 1 << max(int(bits_per_key * n_est - 1).bit_length(), 6)
    m = min(m, max_bits)
    k = max(1, round(math.log(2) * m / n_est))
    return m, k


#: bitmap-literal guard: beyond this the array literal bloats the plan;
#: use the positions-relation strategy instead
MAX_BITMAP_BITS = 1 << 22


def bloom_bitmap_from_hashes(
    hashes: DataFrame, hash_col: str = "__h", *, m_bits: int, k_hashes: int,
) -> list[int]:
    """:func:`bloom_bitmap` from a PRECOMPUTED 63-bit hash relation
    (see :func:`bloom_position_set_from_hashes`). Bit-identical to the
    keyed build over the same key set: the packed words are a set OR
    over positions, so distinct-first and per-occurrence builds land
    the same bits."""
    if m_bits > MAX_BITMAP_BITS:
        raise ValueError(
            f"m_bits={m_bits} exceeds the bitmap-literal bound "
            f"{MAX_BITMAP_BITS}; use bloom_position_set/"
            f"bloom_maybe_contains for large filters"
        )
    pos_df = bloom_position_set_from_hashes(
        hashes, hash_col, m_bits=m_bits, k_hashes=k_hashes
    )
    return _pack_positions(pos_df, m_bits)


def _pack_positions(pos_df: DataFrame, m_bits: int) -> list[int]:
    words = (
        pos_df.groupBy((F.col("pos") / 64).cast("long").alias("w"))
        .agg(
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))")
            ).alias("bits")
        )
        .collect()
    )
    n_words = (m_bits + 63) // 64
    out = [0] * n_words
    for r in words:
        out[int(r["w"])] = int(r["bits"])
    return out


def bloom_bitmap(
    df: DataFrame, key: Column | str, *, m_bits: int, k_hashes: int,
    hash_fn: str = "portable",
) -> list[int]:
    """The packed form: ``m_bits / 64`` longs. The per-word OR runs
    distributed (groupBy word index, bit_or partial-aggregated
    map-side); only the packed words — bounded by ``m_bits``, guarded —
    are collected."""
    if m_bits > MAX_BITMAP_BITS:
        raise ValueError(
            f"m_bits={m_bits} exceeds the bitmap-literal bound "
            f"{MAX_BITMAP_BITS}; use bloom_position_set/"
            f"bloom_maybe_contains for large filters"
        )
    pos_df = bloom_position_set(
        df, key, m_bits=m_bits, k_hashes=k_hashes, hash_fn=hash_fn
    )
    return _pack_positions(pos_df, m_bits)


def bloom_maybe_from_bitmap_hash(
    h: Column, bitmap: list[int], *, m_bits: int, k_hashes: int,
) -> Column:
    """Membership from a PRECOMPUTED 63-bit hash column — the path for
    callers that also need the hash for an exact-verify join (compute
    it once, feed both)."""
    # ONE py4j round trip: F.lit(list) converts elements one java call
    # at a time (~7s of driver time at 16k words, measured); parsing the
    # array as SQL text is a single string transfer + parse (<50ms) and
    # yields the same constant-folded Literal node.
    arr = F.expr(
        "array(" + ",".join(f"{w}L" for w in bitmap) + ")"
    )
    verdict = F.lit(True)
    for p in positions_from_hash(h, m_bits=m_bits, k_hashes=k_hashes):
        word = F.element_at(arr, (p / 64).cast("int") + F.lit(1))
        verdict = verdict & (F.getbit(word, p % 64) == 1)
    return verdict


def bloom_maybe_from_bitmap(
    key: Column | str, bitmap: list[int], *, m_bits: int, k_hashes: int,
    hash_fn: str = "portable",
) -> Column:
    """Membership as a pure expression over the literal bitmap — no
    join at all: element_at picks the word, getbit tests the bit
    (both whole-stage-codegen native).

    CONVENIENCE path: the hash expression is inlined into every one of
    the k probe positions (and each position is used twice), so the
    hash chain evaluates ~2k times per row — hot paths should project
    the hash once and use :func:`bloom_maybe_from_bitmap_hash` (the
    projection-collapse trap documented at bloom_position_set)."""
    col = F.col(key) if isinstance(key, str) else key
    return bloom_maybe_from_bitmap_hash(
        sketch_hash(col, hash_fn), bitmap, m_bits=m_bits, k_hashes=k_hashes
    )
