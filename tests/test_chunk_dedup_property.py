"""chunk_dedup (CCNet-style sub-document dedup) and gopher_features —
pinned against pure-Python references on randomized corpora.

The references mirror the engine's exact arithmetic: the portable md5
fingerprint (lower 8 little-endian bytes), first-(doc, chunk_idx)
winner per fingerprint, HALF_UP rounding for the Gopher measures (Spark
``F.round`` semantics — Python's built-in ``round`` is banker's and
would diverge on exact .5 ties).
"""

from __future__ import annotations

import hashlib
import math
import random
import re

from pyspark.sql import Row, functions as F

from my_feast_spark.functions.text import (
    GOPHER_RULES,
    gopher_features_arr,
    tokens,
)
from my_feast_spark.operators.dedup import cdc_chunk_dedup, chunk_dedup

VOCAB = ["spark", "row", "scan", "agg", "join", "the", "a", "of"]


def _md5_lower64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[8:], "little")


def _ref_chunk_dedup(docs: dict[int, str], k: int):
    chunks: list[tuple[int, int, str]] = []
    for d in sorted(docs):
        toks = re.split(r"\s+", docs[d].strip().lower())
        n = math.ceil(len(toks) / k)
        for i in range(n):
            chunks.append((d, i, " ".join(toks[i * k:(i + 1) * k])))
    first: dict[int, tuple[int, int]] = {}
    for d, i, c in sorted(chunks):
        first.setdefault(_md5_lower64(c), (d, i))
    out = {}
    for d in docs:
        mine = [(i, c) for dd, i, c in chunks if dd == d]
        kept = [
            (i, c) for i, c in mine if first[_md5_lower64(c)] == (d, i)
        ]
        out[d] = (
            len(mine),
            len(kept),
            hashlib.md5(
                " ".join(c for _i, c in sorted(kept)).encode()
            ).hexdigest(),
        )
    return out


def test_chunk_dedup_matches_reference_on_random_corpus(spark):
    rng = random.Random(8)
    docs = {
        d: " ".join(rng.choice(VOCAB) for _ in range(rng.randrange(1, 90)))
        for d in range(120)
    }
    # plant exact copies and a doc sharing a leading chunk
    docs[200] = docs[0]
    docs[201] = docs[1] + " unique tail words here"
    df = spark.createDataFrame(
        [Row(doc_id=d, text=t) for d, t in docs.items()]
    )
    got = {
        r.doc_id: (r.n_chunks, r.n_kept, r.kept_md5)
        for r in chunk_dedup(
            df, "doc_id", "text", chunk_words=5, hash_fn="portable"
        ).collect()
    }
    assert got == _ref_chunk_dedup(docs, 5)
    # the planted copy kept nothing: every chunk's winner is doc 0
    assert got[200][1] == 0


def test_chunk_dedup_first_occurrence_is_corpus_wide(spark):
    # the SAME chunk text in two docs keeps only the (min doc, min idx)
    df = spark.createDataFrame([
        Row(doc_id=1, text="a b c d e f g h i j"),
        Row(doc_id=2, text="a b c d e z z z z z"),
    ])
    got = {
        r.doc_id: (r.n_chunks, r.n_kept)
        for r in chunk_dedup(df, "doc_id", "text", chunk_words=5).collect()
    }
    assert got == {1: (2, 2), 2: (2, 1)}


_CDC_P = 2147483647
_CDC_B = 1_000_003


def _ref_cdc_chunk_dedup(docs: dict[int, str], w: int = 4, div: int = 16):
    bpow = [pow(_CDC_B, j, _CDC_P) for j in range(w)]
    chunks: list[tuple[int, int, str]] = []
    for d in sorted(docs):
        toks = re.split(r"\s+", docs[d].strip().lower())
        n = len(toks)
        wh = [
            int(hashlib.md5(t.encode()).hexdigest()[24:32], 16) % _CDC_P
            for t in toks
        ]
        bpos = [
            i for i in range(1, n)
            if sum(
                wh[i - 1 - j] * bpow[j] % _CDC_P
                for j in range(min(w, i))
            ) % _CDC_P % div == 0
        ]
        bounds = [0] + bpos + [n]
        for j in range(len(bounds) - 1):
            chunks.append((d, j, " ".join(toks[bounds[j]:bounds[j + 1]])))
    first: dict[int, tuple[int, int]] = {}
    for d, i, c in sorted(chunks):
        first.setdefault(_md5_lower64(c), (d, i))
    out = {}
    for d in docs:
        mine = [(i, c) for dd, i, c in chunks if dd == d]
        kept = [
            (i, c) for i, c in mine if first[_md5_lower64(c)] == (d, i)
        ]
        out[d] = (
            len(mine),
            len(kept),
            hashlib.md5(
                " ".join(c for _i, c in sorted(kept)).encode()
            ).hexdigest(),
        )
    return out


def test_cdc_chunk_dedup_matches_reference_on_random_corpus(spark):
    rng = random.Random(88)
    docs = {
        d: " ".join(rng.choice(VOCAB) for _ in range(rng.randrange(1, 90)))
        for d in range(120)
    }
    docs[200] = docs[0]                 # exact copy: keeps nothing
    docs[201] = "inserted " + docs[1]   # prefix edit: suffix re-syncs
    df = spark.createDataFrame(
        [Row(doc_id=d, text=t) for d, t in docs.items()]
    )
    got = {
        r.doc_id: (r.n_chunks, r.n_kept, r.kept_md5)
        for r in cdc_chunk_dedup(
            df, "doc_id", "text", hash_fn="portable"
        ).collect()
    }
    assert got == _ref_cdc_chunk_dedup(docs)
    assert got[200][1] == 0


def test_cdc_boundaries_resynchronize_after_a_prefix_edit(spark):
    """The reason CDC exists: one word inserted at the top of a
    near-copy. Fixed windows shift every later chunk (the copy keeps
    ~all its chunks as 'novel'); CDC boundaries depend only on a local
    word window, so the shared suffix dedups against the original."""
    rng = random.Random(7)
    base = " ".join(rng.choice(VOCAB) for _ in range(400))
    df = spark.createDataFrame(
        [Row(doc_id=1, text=base), Row(doc_id=2, text="shifted " + base)]
    )
    fixed = {
        r.doc_id: (r.n_chunks, r.n_kept)
        for r in chunk_dedup(df, "doc_id", "text", chunk_words=20).collect()
    }
    cdc = {
        r.doc_id: (r.n_chunks, r.n_kept)
        for r in cdc_chunk_dedup(df, "doc_id", "text").collect()
    }
    # fixed chunking: every window of doc 2 differs -> nothing dedups
    assert fixed[2][1] == fixed[2][0]
    # CDC: only the chunks touching the edit survive as novel
    assert cdc[2][1] <= 2
    assert cdc[2][0] > 10  # and that is out of many chunks


def _hround(x: float, nd: int = 4) -> float:
    # the stable floor form both engines evaluate now
    # (functions.scalar.floor_round), not Spark's repr-based HALF_UP
    return math.floor(x * 10**nd + 0.5) / 10**nd


def _ref_gopher(text: str):
    toks = re.split(r"\s+", text.strip().lower())
    n = max(len(toks), 1)
    mean_wl = _hround(sum(len(w) for w in toks) / n)
    n_hash = sum(w.count("#") for w in toks)
    n_ell = sum(
        (len(w) - len(w.replace("...", ""))) // 3 for w in toks
    )
    symbol_ratio = _hround((n_hash + n_ell) / n)
    alpha = _hround(
        sum(1 for w in toks if re.search("[a-z]", w)) / n
    )
    # DISTINCT stopword presence (Rae et al. A1.1's "at least 2 of
    # the required words"), matching the round-9 array_intersect form
    stops = len(
        {w for w in toks}
        & {"the", "a", "and", "of", "to", "in", "is"}
    )
    r = GOPHER_RULES
    passes = int(
        r["min_words"] <= len(toks) <= r["max_words"]
        and r["min_mean_word_len"] <= mean_wl <= r["max_mean_word_len"]
        and symbol_ratio <= r["max_symbol_ratio"]
        and alpha >= r["min_alpha_frac"]
        and stops >= r["min_stop_hits"]
    )
    return (len(toks), mean_wl, symbol_ratio, alpha, stops, passes)


def test_gopher_measures_match_reference(spark):
    rng = random.Random(17)
    texts = [
        " ".join(
            rng.choice(VOCAB + ["###", "wait...", "123", "x#y"])
            for _ in range(rng.randrange(1, 120))
        )
        for _ in range(80)
    ]
    texts += [
        "the " * 30,                       # 30 words: fails min_words
        "# # # " * 30,                     # symbol ratio blows the cap
        " ".join(str(i) for i in range(60)),  # zero alpha words
    ]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    feats = gopher_features_arr(tokens(F.lower(F.col("text"))))
    got = {
        r.doc_id: tuple(r)[1:]
        for r in df.select(
            "doc_id", *[c.alias(k) for k, c in feats.items()]
        ).collect()
    }
    want = {i: _ref_gopher(t) for i, t in enumerate(texts)}
    assert got == want
    # the planted rows exercise each rule at least once
    assert got[len(texts) - 3][5] == 0
    assert got[len(texts) - 2][5] == 0
    assert got[len(texts) - 1][5] == 0
