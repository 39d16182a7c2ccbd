"""BPE tokenizer training — the full iterative merge loop.

`workload.q_bpe_pair_counts` is ONE round's count table; this module
runs the actual training loop (Sennrich et al., "Neural Machine
Translation of Rare Words with Subword Units"): start from characters,
repeatedly promote the most frequent adjacent symbol pair to a new
merged symbol, emit the ordered merge list a tokenizer replays at
encode time.

The scale design hinges on one observation: after the FIRST pass the
corpus never participates again. The training state is the WORD
FREQUENCY table — (distinct word, count, symbol array) — which is
vocabulary-sized, orders of magnitude smaller than the corpus. Each
round is two small jobs over that table (pair count + argmax, then the
merge rewrite), localCheckpoint-ed to keep lineage flat and released
per round via the repo's checkpoint-ownership rule, so a 50k-merge run
holds exactly one vocabulary-sized block set at any moment. The merge
rewrite itself is a pure higher-order `aggregate` fold (greedy
left-to-right, matching the reference algorithm) — no Python in the
loop; the only driver traffic is one argmax row per round.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type hints resolve here

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from my_feast_spark.functions.text import adjacent_pairs, tokens
from my_feast_spark.operators.graph import release_checkpoint

#: end-of-word marker symbol (Sennrich): distinguishes "est"-as-suffix
#: from "est"-mid-word, and makes word reconstruction unambiguous
EOW = "</w>"


def _merge_pair(sym: Column, a: str, b: str) -> Column:
    """Greedy left-to-right replacement of adjacent (a, b) with a+b —
    the reference BPE merge semantics (a merge consumes both symbols,
    so overlapping occurrences like 'aaa' under (a,a) yield [aa, a]).
    F.get returns NULL (never raises) on the empty accumulator."""
    return F.aggregate(
        sym,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.get(acc, F.size(acc) - 1) == F.lit(a)) & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe_merges(
    df: DataFrame,
    text_col: str,
    *,
    rounds: int = 32,
    min_pair_count: int = 2,
    lowercase: bool = True,
) -> list[dict]:
    """Learn up to ``rounds`` BPE merges from a corpus.

    Returns the ordered merge list, one dict per round:
    ``{"left", "right", "merged", "count"}`` — the artifact a tokenizer
    replays at encode time. Stops early when the best remaining pair
    occurs fewer than ``min_pair_count`` times (weighted by word
    frequency). Ties on count break lexicographically on (left, right)
    so training is deterministic across engines and partitionings.
    """
    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    words = (
        df.select(F.explode_outer(tokens(t)).alias("word"))
        .filter(F.col("word").isNotNull() & (F.col("word") != ""))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # training state: (count, symbol array) — vocabulary-sized; chars +
    # end-of-word marker (split on every inter-char boundary)
    vocab = words.select(
        "n",
        F.concat(
            # split on inter-char boundaries; Spark's split appends a
            # trailing "" when the pattern matches at end-of-string
            F.filter(
                F.split(F.col("word"), "(?!^)"), lambda x: x != ""
            ),
            F.array(F.lit(EOW)),
        ).alias("sym"),
    ).localCheckpoint()

    merges: list[dict] = []
    try:
        for _ in range(rounds):
            top = (
                vocab.select("n", F.explode(adjacent_pairs(F.col("sym"))).alias("p"))
                .groupBy("p.a", "p.b")
                .agg(F.sum("n").alias("cnt"))
                .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
                .limit(1)
                .collect()
            )
            if not top or top[0]["cnt"] < min_pair_count:
                break
            a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
            new_vocab = vocab.select(
                "n", _merge_pair(F.col("sym"), a, b).alias("sym")
            ).localCheckpoint()
            release_checkpoint(vocab)
            vocab = new_vocab
            merges.append(
                {"left": a, "right": b, "merged": a + b, "count": cnt}
            )
    finally:
        release_checkpoint(vocab)
    return merges


def apply_bpe_merges(sym: Column, merges: list[dict]) -> Column:
    """Replay a learned merge list over a symbol array column.

    Pure-expression form: one greedy fold per merge, chained in merge
    order — right for demo/small merge lists (the expression tree grows
    linearly with the list). Production tokenizers carry 10k-100k
    merges; use ``bpe_encode_udf`` there (one Arrow batch pass with a
    rank dict instead of a 100k-deep expression tree).
    """
    out = sym
    for m in merges:
        out = _merge_pair(out, m["left"], m["right"])
    return out


def bpe_encode_udf(merges: list[dict]):
    """Arrow-batched encoder for production-sized merge lists.

    Returns a pandas UDF mapping a WORD column to its space-joined BPE
    symbols. Implements the standard rank-replay: repeatedly merge the
    adjacent pair with the lowest merge rank until none applies —
    equivalent to replaying the merge list in order, but O(word_len *
    applied_merges) per word instead of O(word_len * total_merges).
    The rank dict ships once per executor via the closure.
    """
    from pyspark.sql.functions import pandas_udf

    ranks = {(m["left"], m["right"]): i for i, m in enumerate(merges)}

    def encode_word(word: str) -> str:
        sym = list(word) + [EOW]
        while len(sym) >= 2:
            best_i, best_r = -1, None
            for i in range(len(sym) - 1):
                r = ranks.get((sym[i], sym[i + 1]))
                if r is not None and (best_r is None or r < best_r):
                    best_i, best_r = i, r
            if best_r is None:
                break
            sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
        return " ".join(sym)

    @pandas_udf("string")
    def encode(col: pd.Series) -> pd.Series:
        cache: dict = {}

        def enc(w):
            if w not in cache:
                cache[w] = encode_word(w)
            return cache[w]

        return col.map(enc)

    return encode


def bpe_vocab(df: DataFrame, text_col: str, merges: list[dict],
              *, lowercase: bool = True) -> list[dict]:
    """The tokenizer's id table: corpus alphabet first (sorted chars +
    the end-of-word marker), then merged symbols in merge order — the
    standard layout, so ids are stable under vocabulary EXTENSION (new
    merges append, existing ids never shift). Every symbol the encoder
    can emit for this corpus is covered: encode only outputs base chars,
    ``EOW``, and merge products. The alphabet scan is one distinct
    aggregate over exploded chars (alphabet-sized result)."""
    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    chars = sorted(
        r["c"]
        for r in df.select(
            F.explode(F.array_distinct(
                F.filter(F.split(F.concat_ws(" ", tokens(t)), "(?!^)"),
                         lambda x: (x != "") & (x != " "))
            )).alias("c")
        ).distinct().collect()
    )
    symbols = chars + [EOW] + [m["merged"] for m in merges]
    return [{"token_id": i, "symbol": s} for i, s in enumerate(symbols)]
