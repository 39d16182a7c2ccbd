"""Unigram-LM (SentencePiece-style) tokenizer: distributed train + encode.

The second of the two tokenizer-training algorithms real pipelines use
(Kudo 2018; SentencePiece's default — Llama/T5 class models), next to
this repo's BPE trainer (`operators/bpe.py`). Where BPE grows a vocab
bottom-up by merging the most frequent pair, unigram starts from a large
seed of candidate pieces and SHRINKS it with EM: each iteration computes
every piece's expected count under the current unigram probabilities
(forward-backward over each word's segmentation lattice) and prunes the
lowest-value pieces toward the target vocabulary size.

Spark-first scale shape — the same contract as the BPE trainer:

* the corpus is scanned ONCE, into a word-count relation (one shuffle,
  vocabulary-sized — never corpus-sized);
* every EM iteration is one Arrow-batched ``mapInPandas`` pass over the
  WORD relation with the current piece table captured in the closure
  (bounded by ``seed_size``, a few thousand entries) plus one exact
  integer aggregation; the driver loop runs a FIXED number of
  iterations;
* the only driver collects are piece tables (``seed_size``-bounded by
  construction) — never data-sized.

Determinism (what makes the DuckDB oracle possible): EM over floats is
order-dependent under distributed aggregation, so each word's expected
piece counts — a pure per-word float64 forward-backward, identical on
any host — are QUANTIZED to 1e-6 units as BIGINTs before aggregation.
Long sums are exact and order-independent, every M-step probability is
derived from exact integers via the single form ``log(cnt) -
log(total)``, and pruning ties break on (quantized count desc, piece
asc) — so the whole vocabulary evolution is a deterministic function of
the corpus, replayable bit-for-bit by a driver-side mirror
(``train_unigram_local``) that runs the SAME kernel closures. This is
`operators/graph.py::pagerank_fixedpoint`'s exact-integer trick applied
to EM.

Worker-pickling contract: every kernel the ``mapInPandas`` closures use
is built by ``_make_kernels()`` as NESTED functions (pickled by value —
the repo's ``_make_parser`` pattern), so executors need only the stdlib;
the driver-side mirror calls the very same closure objects, which is
what makes "same arithmetic by construction" literal.

Simplifications vs full SentencePiece, documented not hidden: the seed
is substring-count top-K (not ESA-based), pruning drops the lowest
expected-count pieces on a linear schedule (not the loss-delta
criterion), and there is no byte-fallback — single characters are
always kept, so any word whose characters appeared in training always
segments; encode() skips characters never seen in training (the honest
local equivalent of UNK).
"""

from __future__ import annotations

import math
from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixed-point scale for expected counts (1e-6 units as BIGINT)
QUANT = 10**6


def _make_kernels():
    """Pure per-word kernels as closures (stdlib only, pickled by value).

    Returns ``(split_ws, seed_counts, word_ec, viterbi)``:

    * ``split_ws(text)`` — whitespace tokens (the engine's
      ``split(trim(x), '\\s+')`` contract);
    * ``seed_counts(word, n, max_piece_len)`` — exact substring counts;
    * ``word_ec(word, n, lp, max_piece_len)`` — quantized expected piece
      counts (float64 forward-backward with FIXED iteration order and a
      stable two-term logaddexp, then ``floor(ec * 1e6 + 0.5) * n``);
    * ``viterbi(word, lp, max_piece_len)`` — best segmentation, ties to
      the longer (then lexicographically smaller) piece.
    """
    import math as _m
    import re as _re

    NEG = float("-inf")

    def split_ws(text):
        t = text.strip()
        return _re.split(r"\s+", t) if t else []

    def seed_counts(word, n, max_piece_len):
        out = {}
        L = len(word)
        for i in range(L):
            for j in range(i + 1, min(i + max_piece_len, L) + 1):
                s = word[i:j]
                out[s] = out.get(s, 0) + n
        return out

    def _arcs(word, lp, max_piece_len):
        L = len(word)
        arcs = []
        for i in range(L):
            row = []
            for j in range(i + 1, min(i + max_piece_len, L) + 1):
                p = lp.get(word[i:j])
                if p is not None:
                    row.append((j, word[i:j], p))
            arcs.append(row)
        return arcs

    def _ladd(a, v):
        if a == NEG:
            return v
        if v > a:
            return v + _m.log1p(_m.exp(a - v))
        return a + _m.log1p(_m.exp(v - a))

    def word_ec(word, n, lp, max_piece_len):
        L = len(word)
        arcs = _arcs(word, lp, max_piece_len)
        alpha = [NEG] * (L + 1)
        alpha[0] = 0.0
        for i in range(L):
            if alpha[i] == NEG:
                continue
            for j, _s, p in arcs[i]:
                alpha[j] = _ladd(alpha[j], alpha[i] + p)
        total = alpha[L]
        if total == NEG:
            return {}
        beta = [NEG] * (L + 1)
        beta[L] = 0.0
        for i in range(L - 1, -1, -1):
            acc = NEG
            for j, _s, p in arcs[i]:
                if beta[j] != NEG:
                    acc = _ladd(acc, p + beta[j])
            beta[i] = acc
        out = {}
        for i in range(L):
            if alpha[i] == NEG:
                continue
            for j, s, p in arcs[i]:
                if beta[j] == NEG:
                    continue
                ec = _m.exp(alpha[i] + p + beta[j] - total)
                q = _m.floor(ec * 1_000_000 + 0.5) * n
                if q:
                    out[s] = out.get(s, 0) + q
        return out

    def viterbi(word, lp, max_piece_len):
        # drop characters the vocab never saw, so the lattice connects
        w = "".join(c for c in word if c in lp)
        L = len(w)
        if not L:
            return []
        best = [NEG] * (L + 1)
        back = [None] * (L + 1)
        best[0] = 0.0
        for j in range(1, L + 1):
            for i in range(max(0, j - max_piece_len), j):
                if best[i] == NEG:
                    continue
                s = w[i:j]
                p = lp.get(s)
                if p is None:
                    continue
                v = best[i] + p
                cur = back[j]
                if (
                    v > best[j]
                    or (v == best[j] and cur is not None
                        and (len(s), cur[1]) > (len(cur[1]), s))
                ):
                    best[j] = v
                    back[j] = (i, s)
        pieces = []
        j = L
        while j > 0:
            i, s = back[j]  # always connected: single chars are in lp
            pieces.append(s)
            j = i
        pieces.reverse()
        return pieces

    return split_ws, seed_counts, word_ec, viterbi


#: canonical kernel instances for driver-side use (mirror + tests);
#: worker closures capture their own copies via default args
_SPLIT_WS, _SEED_COUNTS, _WORD_EC, _VITERBI = _make_kernels()


def _prune(counts: dict[str, int], keep_multi: int) -> dict[str, int]:
    """Single characters always survive; multi-char pieces keep the top
    ``keep_multi`` by (count desc, piece asc) — exact-integer total
    order, no float in the decision."""
    chars = {s: c for s, c in counts.items() if len(s) == 1}
    multi = sorted(
        ((s, c) for s, c in counts.items() if len(s) > 1),
        key=lambda sc: (-sc[1], sc[0]),
    )[:keep_multi]
    return {**chars, **dict(multi)}


def _logprobs(counts: dict[str, int]) -> dict[str, float]:
    total = sum(counts.values())
    lt = math.log(total)
    return {s: math.log(c) - lt for s, c in counts.items() if c > 0}


def _shrink_schedule(seed_size: int, keep_target: int, iterations: int):
    return [
        max(
            keep_target,
            int(seed_size - (seed_size - keep_target) * (it + 1) / iterations),
        )
        for it in range(iterations)
    ]


def _word_counts(docs: DataFrame, text_col: str) -> DataFrame:
    """Corpus → (word, n): one Arrow-batched pass + the one corpus-sized
    shuffle (map-side combined by the per-batch dict).

    Tokenization runs the SAME kernel closure every other stage uses
    (Python ``str.lower`` + ``re.split(r"\\s+")``) rather than a Spark
    ``lower``/``split`` expression: Java's ``\\s`` is ASCII-only and
    JVM lowercasing can differ from Python's on exotic case folds, so
    an expression-side tokenizer would diverge from the driver mirror
    (and from encode, which necessarily runs the Python kernel) on any
    corpus with Unicode whitespace — the review-caught bug this fixes.
    A train job runs once per corpus; the Python-side pass is the price
    of bit-identical Spark↔mirror tokenization by construction."""

    def count_words(batches):
        import pandas as pd

        for pdf in batches:
            # vectorized twin of the split_ws kernel: pandas .str ops
            # run the same Python re engine (strip -> split on r"\s+"
            # with Unicode semantics), ~5-10x the per-row loop; NULL
            # text drops before the ops so it holds no words
            txt = pdf["__text"].dropna()
            words = (
                txt.str.lower().str.strip()
                .str.split(r"\s+", regex=True).explode()
            )
            counts = words[words.notna() & (words != "")].value_counts()
            yield pd.DataFrame(
                {"word": counts.index, "n": counts.to_numpy()}
            )

    return (
        docs.select(F.col(text_col).alias("__text"))
        .mapInPandas(count_words, schema="word string, n long")
        .groupBy("word")
        .agg(F.sum("n").alias("n"))
    )


def train_unigram(
    docs: DataFrame,
    text_col: str,
    *,
    vocab_size: int = 1000,
    seed_size: int = 4000,
    max_piece_len: int = 8,
    iterations: int = 3,
) -> DataFrame:
    """Train and return the vocabulary as a DataFrame
    ``(piece_id, piece, logprob)`` — piece_id assigned by (piece asc),
    deterministic. See module docstring for the scale/determinism
    contract."""
    spark = docs.sparkSession
    # The word-count relation feeds the seed pass AND every EM
    # iteration (4+ actions): persist it so the corpus is tokenized and
    # shuffled ONCE — the module contract ("scanned ONCE") that an
    # unpersisted lazy plan silently broke by re-running the corpus
    # pass per action (measured 6.0s -> 2.4s for the adjudicated query
    # at sf0.1, r16 optimization round).
    words = _word_counts(docs, text_col).persist()
    mpl = max_piece_len

    def seed_pass(batches, _kernels=_make_kernels(), _mpl=mpl):
        import pandas as pd

        _sw, _sc, _ec, _vit = _kernels
        for pdf in batches:
            acc = {}
            for w, n in zip(pdf["word"], pdf["n"]):
                for s, c in _sc(w, int(n), _mpl).items():
                    acc[s] = acc.get(s, 0) + c
            yield pd.DataFrame(
                {"piece": list(acc), "cnt": list(acc.values())}
            )

    seed_df = (
        words.mapInPandas(seed_pass, schema="piece string, cnt long")
        .groupBy("piece")
        .agg(F.sum("cnt").alias("cnt"))
        # persisted because TWO bounded collects (chars, top-K multis)
        # consume it — without the pin the substring-universe pass over
        # the word relation runs once per collect
        .persist()
    )
    try:
        # bounded collect even on a huge substring universe: single
        # chars exactly (alphabet-sized — they always survive the
        # prune), multis as a top-K (TakeOrderedAndProject,
        # exact-integer total order). ONE action for both slices (r17):
        # the disjoint filters union over the same persisted relation,
        # so the seed costs one job instead of two.
        seed_rows = (
            seed_df.filter(F.length("piece") == 1)
            .unionAll(
                seed_df.filter(F.length("piece") > 1)
                .orderBy(F.col("cnt").desc(), F.col("piece").asc())
                .limit(seed_size)
            )
        ).collect()
    finally:
        seed_df.unpersist()
    try:
        counts = _prune(
            {r["piece"]: r["cnt"] for r in seed_rows},
            seed_size,
        )
        if not counts:
            raise ValueError(
                "train_unigram: corpus has no words — nothing to train on"
            )
        n_chars = sum(1 for s in counts if len(s) == 1)
        schedule = _shrink_schedule(
            seed_size, max(vocab_size - n_chars, 1), iterations
        )

        lp = _logprobs(counts)
        for keep in schedule:

            def em_pass(batches, _kernels=_make_kernels(), _lp=lp,
                        _mpl=mpl):
                import pandas as pd

                _sw, _sc, _ec, _vit = _kernels
                for pdf in batches:
                    acc = {}
                    for w, n in zip(pdf["word"], pdf["n"]):
                        for s, q in _ec(w, int(n), _lp, _mpl).items():
                            acc[s] = acc.get(s, 0) + q
                    yield pd.DataFrame(
                        {"piece": list(acc), "q": list(acc.values())}
                    )

            ec_rows = (
                words.mapInPandas(em_pass, schema="piece string, q long")
                .groupBy("piece")
                .agg(F.sum("q").alias("q"))
            ).collect()  # bounded: only current-vocab pieces get mass
            counts = {r["piece"]: r["q"] for r in ec_rows}
            # characters with zero expected mass still survive (they
            # anchor the lattice); give them the minimum quantum
            for s in list(lp):
                if len(s) == 1 and counts.get(s, 0) <= 0:
                    counts[s] = 1
            counts = _prune(counts, keep)
            lp = _logprobs(counts)
    finally:
        words.unpersist()

    pieces = sorted(lp)
    return spark.createDataFrame(
        [(i, s, lp[s]) for i, s in enumerate(pieces)],
        schema="piece_id long, piece string, logprob double",
    )


def unigram_encode(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    vocab: DataFrame,
    *,
    max_piece_len: int = 8,
) -> DataFrame:
    """Viterbi-encode each document against a trained vocabulary →
    ``(id, piece_ids array<long>, n_pieces)``. Map-only: the vocab is
    collected (vocab_size-bounded) into the worker closure; one Arrow
    pass over the corpus, no shuffle."""
    rows = vocab.select("piece_id", "piece", "logprob").collect()
    lp = {r["piece"]: r["logprob"] for r in rows}
    ids = {r["piece"]: r["piece_id"] for r in rows}
    mpl = max_piece_len

    def encode(batches, _kernels=_make_kernels(), _lp=lp, _ids=ids,
               _mpl=mpl):
        import pandas as pd

        _sw, _sc, _ec, _vit = _kernels
        # Per-task Viterbi memo (r17, guide §4.2): the segmentation is a
        # pure function of the WORD, but the loop below runs per word
        # OCCURRENCE — at sf0.1 that is 270k lattice runs for 31
        # distinct words (measured 2.1s -> 0.11s single-threaded with
        # the memo). Values are bit-identical by construction (same
        # kernel, same inputs); the memo is bounded by the task's
        # distinct-word count, the same bound the trainer's word
        # relation already carries.
        memo: dict[str, list[int]] = {}
        for pdf in batches:
            out_id, out_ids, out_n = [], [], []
            for doc_id, text in zip(pdf["__id"], pdf["__text"]):
                enc = []
                # NULL text encodes to an empty sequence — str(None)
                # would smuggle the literal token 'none' into the ids.
                # Lowercasing happens HERE with Python str.lower, the
                # same case fold training (_word_counts) and the driver
                # mirror (encode_local) use — a JVM-side F.lower in the
                # projection could diverge on exotic case folds when the
                # JDK and Python track different Unicode versions.
                toks = _sw(text.lower()) if isinstance(text, str) else []
                for t in toks:
                    if t:
                        r = memo.get(t)
                        if r is None:
                            r = memo[t] = [
                                _ids[s] for s in _vit(t, _lp, _mpl)
                            ]
                        enc.extend(r)
                out_id.append(doc_id)
                out_ids.append(enc)
                out_n.append(len(enc))
            yield pd.DataFrame(
                {"__id": out_id, "piece_ids": out_ids, "n_pieces": out_n}
            )

    id_type = dict(docs.select(id_col).dtypes)[id_col]
    slim = docs.select(
        F.col(id_col).alias("__id"),
        F.col(text_col).alias("__text"),
    )
    out = slim.mapInPandas(
        encode,
        schema=f"__id {id_type}, piece_ids array<long>, n_pieces long",
    )
    return out.withColumnRenamed("__id", id_col)


# --- driver-side mirror for the oracle -----------------------------------

def train_unigram_local(
    texts: Iterable[str],
    *,
    vocab_size: int = 1000,
    seed_size: int = 4000,
    max_piece_len: int = 8,
    iterations: int = 3,
) -> dict[str, float]:
    """Pure-Python replay of `train_unigram` over an in-memory corpus —
    the oracle generator's mirror. Identical arithmetic by construction:
    the SAME kernel closures, exact-integer aggregation (a Python dict
    sum equals Spark's long sum), the same prune order and the same
    ``log(cnt) - log(total)`` probability form."""
    words: dict[str, int] = {}
    for t in texts:
        if not isinstance(t, str):
            continue  # NULL text holds no words (matches _word_counts)
        for w in _SPLIT_WS(t.lower()):
            if w:
                words[w] = words.get(w, 0) + 1
    counts: dict[str, int] = {}
    for w, n in words.items():
        for s, c in _SEED_COUNTS(w, n, max_piece_len).items():
            counts[s] = counts.get(s, 0) + c
    counts = _prune(counts, seed_size)
    if not counts:
        raise ValueError(
            "train_unigram_local: corpus has no words — nothing to train on"
        )
    n_chars = sum(1 for s in counts if len(s) == 1)
    schedule = _shrink_schedule(
        seed_size, max(vocab_size - n_chars, 1), iterations
    )
    lp = _logprobs(counts)
    for keep in schedule:
        acc: dict[str, int] = {}
        for w, n in words.items():
            for s, q in _WORD_EC(w, n, lp, max_piece_len).items():
                acc[s] = acc.get(s, 0) + q
        for s in list(lp):
            if len(s) == 1 and acc.get(s, 0) <= 0:
                acc[s] = 1
        counts = _prune(acc, keep)
        lp = _logprobs(counts)
    return lp


def encode_local(
    text: str, lp: dict[str, float], *, max_piece_len: int = 8
) -> list[int]:
    """Mirror of `unigram_encode` for one document: piece ids by
    (piece asc) over the final vocabulary. NULL text → []."""
    ids = {s: i for i, s in enumerate(sorted(lp))}
    out: list[int] = []
    if text is None:
        return out
    for t in _SPLIT_WS(text.lower()):
        if t:
            out.extend(ids[s] for s in _VITERBI(t, lp, max_piece_len))
    return out
