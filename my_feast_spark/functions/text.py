"""Text-analysis expressions for training-data pipelines.

All pure Column expressions (JVM-side, whole-stage-codegen friendly) —
no Python UDFs in the hot path. Designed for the 100 TB document-corpus
case: every function is a per-row projection, embarrassingly parallel,
no shuffle.

  * tokens / token_count — whitespace tokenization (the BPE-ish regex
    variant splits punctuation too);
  * doc_fingerprint — md5 of whitespace-normalized lowercase text
    (exact-dup key);
  * quality_features — length / lexical-diversity / stopword-ratio
    signals;
  * lang_scores — tiny-stopword-list language-ID heuristic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from my_feast_spark.functions.scalar import floor_round

#: minimal per-language stopword lists for the heuristic scorer
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "in", "is"],
    "es": ["el", "la", "de", "que", "y", "los"],
    "fr": ["le", "la", "les", "et", "un", "des"],
    "de": ["der", "die", "das", "und", "ein", "zu"],
}


def tokens(text: Column, bpe_ish: bool = False) -> Column:
    """Whitespace tokens; ``bpe_ish=True`` also splits off punctuation
    runs (a cheap stand-in for subword tokenization's word-boundary
    behavior)."""
    if bpe_ish:
        # split letters/digits/punctuation-run boundaries
        normalized = F.regexp_replace(text, r"([^\w\s]+)", r" $1 ")
    else:
        normalized = text
    return F.split(F.trim(normalized), r"\s+")


def let(value: Column, body) -> Column:
    """Bind ``value`` once per row and use it via ``body(var)``.

    Higher-order-function lambdas are interpreted (CodegenFallback), and
    any OUTER expression tree embedded in a lambda body is re-evaluated
    on every element — e.g. ``element_at(split(text), i)`` inside a
    ``transform`` re-runs the full regex tokenization per element,
    turning an O(n) pass into O(n * cost(split)). Binding through a
    1-element ``transform`` evaluates ``value`` exactly once per row and
    hands the lambda a NamedLambdaVariable (a plain slot read) instead.
    Measured on the repetition filter at sf0.1: 16s -> 0.4s.
    """
    return F.element_at(F.transform(F.array(value), body), 1)


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def adjacent_pairs(arr: Column) -> Column:
    """``array<struct<a,b>>`` of adjacent element pairs (empty below 2
    elements) — the shared building block of the BPE pair count, token
    PMI, and bigram queries. ``arr`` is referenced four times (size +
    two slices); pass a cheap column reference, or ``let``-bind an
    expensive expression first (see ``let``)."""
    return F.when(
        F.size(arr) >= 2,
        F.zip_with(
            F.slice(arr, 1, F.size(arr) - 1),
            F.slice(arr, 2, F.size(arr) - 1),
            lambda a, b: F.struct(a.alias("a"), b.alias("b")),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))


def doc_fingerprint(text: Column) -> Column:
    """md5 of lower + whitespace-collapsed text — the exact-dup key."""
    normalized = F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))
    return F.md5(F.encode(normalized, "UTF-8"))


#: typographic -> ASCII single-char folds (applied via ONE translate
#: pass): curly single/double quotes, en/em/horizontal-bar dashes, NBSP
_FOLD_SRC = "‘’‚‛“”„‟–—― "
_FOLD_DST = "''''\"\"\"\"--- "


def normalize_text(
    text: Column,
    *,
    lower: bool = False,
    fold_punct: bool = True,
    strip_controls: bool = True,
    collapse_ws: bool = True,
) -> Column:
    """Canonicalize raw crawl text before tokenization/fingerprinting:
    fold typographic punctuation to ASCII (curly quotes, dashes, NBSP,
    ellipsis), strip C0/DEL control characters, collapse whitespace
    runs, optionally lowercase. Idempotent (property-tested) and pure
    ``translate``/``regexp_replace`` expressions — map-only,
    whole-stage codegen, no Python. The 100 TB shape: normalize as the
    first projection after the scan so every downstream consumer
    (fingerprint, shingles, quality signals) reads ONE canonical form
    instead of re-folding per expression.
    """
    out = text
    if fold_punct:
        out = F.translate(out, _FOLD_SRC, _FOLD_DST)
        out = F.regexp_replace(out, "…", "...")
    if strip_controls:
        out = F.regexp_replace(out, r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "")
    if collapse_ws:
        out = F.trim(F.regexp_replace(out, r"\s+", " "))
    if lower:
        out = F.lower(out)
    return out


def quality_features(text: Column) -> dict[str, Column]:
    """Quality signals as named expressions (caller selects/aliases).
    Each entry ``let``-binds the token array, so an output column costs
    one tokenization regardless of how many passes it makes."""
    stop = F.array([F.lit(s) for s in LANG_STOPWORDS["en"]])

    def entry(build):
        return let(tokens(text), build)

    return {
        "n_chars": F.length(text),
        "n_tokens": entry(lambda t: F.size(t)),
        "n_distinct_tokens": entry(lambda t: F.size(F.array_distinct(t))),
        "lexical_diversity": entry(
            lambda t: F.round(
                F.size(F.array_distinct(t)) / F.greatest(F.size(t), F.lit(1)), 4
            )
        ),
        "stopword_ratio": entry(
            lambda t: F.round(
                F.size(F.filter(t, lambda x: F.array_contains(stop, x)))
                / F.greatest(F.size(t), F.lit(1)),
                4,
            )
        ),
        "mean_token_len": entry(
            lambda t: F.round(
                (F.length(F.trim(text)) - (F.size(t) - F.lit(1)))
                / F.greatest(F.size(t), F.lit(1)).cast("double"),
                4,
            )
        ),
    }


#: Gopher rule thresholds (Rae et al. 2021, Appendix A1.1), the subset
#: that is meaningful for single-line text: word-count bounds, mean
#: word length bounds, symbol-to-word ratio cap, minimum fraction of
#: words containing an alphabetic character, minimum DISTINCT stopword
#: hits (A1.1 requires "at least 2 of the required words" — distinct
#: presence, not total occurrences).
#: (The line-based bullet/ellipsis rules need multi-line documents and
#: are omitted — the symbol ratio still counts '#' and '...'; the
#: stopword list is the engine's LANG_STOPWORDS["en"], not the paper's
#: exact 8-word list.)
GOPHER_RULES = {
    "min_words": 50,
    "max_words": 100_000,
    "min_mean_word_len": 3.0,
    "max_mean_word_len": 10.0,
    "max_symbol_ratio": 0.1,
    "min_alpha_frac": 0.8,
    "min_stop_hits": 2,
}


def gopher_features_arr(toks: Column) -> dict[str, Column]:
    """The Gopher measures over an ALREADY-LOWERCASED token array (pass
    a cheap column reference — each measure reads it several times; the
    pipeline path that projects ``__ltoks`` once feeds it here). Symbol
    counts ('#', '...') come from the tokens rather than raw text —
    identical by construction: neither symbol spans whitespace, and
    lowercasing does not touch them."""
    stop = F.array([F.lit(s) for s in LANG_STOPWORDS["en"]])
    r = GOPHER_RULES
    n = F.greatest(F.size(toks), F.lit(1)).cast("double")
    n_words = F.size(toks).cast("long")
    # floor_round, not F.round: these ratio measures are adjudicated
    # row-for-row against a DuckDB replay, and the engines' native
    # rounds disagree on .5-repr boundaries (the 0.43725 class) —
    # numerator/denominator are exact integers, so the single division
    # is bit-identical and the explicit floor form closes the gap
    mean_wl = floor_round(
        F.aggregate(
            F.transform(toks, lambda w: F.length(w).cast("long")),
            F.lit(0).cast("long"), lambda acc, x: acc + x,
        ) / n, 4,
    )
    n_hash = F.aggregate(
        F.transform(
            toks,
            lambda w: (
                F.length(w) - F.length(F.replace(w, F.lit("#"), F.lit("")))
            ).cast("long"),
        ),
        F.lit(0).cast("long"), lambda acc, x: acc + x,
    )
    n_ell = F.aggregate(
        F.transform(
            toks,
            lambda w: (
                F.length(w) - F.length(F.replace(w, F.lit("..."), F.lit("")))
            ).cast("long"),
        ),
        F.lit(0).cast("long"), lambda acc, x: acc + x,
    ) / F.lit(3)
    symbol_ratio = floor_round((n_hash + n_ell) / n, 4)
    alpha_frac = floor_round(
        F.size(F.filter(toks, lambda w: w.rlike("[a-z]"))) / n, 4
    )
    # DISTINCT stopwords present (array_intersect dedups), per Rae et
    # al. A1.1's "at least 2 of the required words" — a doc repeating
    # one stopword does not pass
    stop_hits = F.size(F.array_intersect(toks, stop)).cast("long")
    passes = (
        n_words.between(r["min_words"], r["max_words"])
        & mean_wl.between(r["min_mean_word_len"], r["max_mean_word_len"])
        & (symbol_ratio <= r["max_symbol_ratio"])
        & (alpha_frac >= r["min_alpha_frac"])
        & (stop_hits >= r["min_stop_hits"])
    )
    return {
        "n_words": n_words,
        "mean_word_len": mean_wl,
        "symbol_ratio": symbol_ratio,
        "alpha_frac": alpha_frac,
        "stop_hits": stop_hits,
        "gopher_pass": passes.cast("int"),
    }


def gopher_features(text: Column) -> dict[str, Column]:
    """The Gopher quality-filter measures (Rae et al. 2021) as named
    expressions plus a ``gopher_pass`` 0/1 verdict — the rule-based
    gate production pipelines run before any learned filter. Each entry
    ``let``-binds one tokenization and delegates to
    ``gopher_features_arr``; map-only pure expressions, and the verdict
    compares the ROUNDED measures so an oracle replaying the arithmetic
    in another engine reaches the identical decision."""
    def _measure(key):
        # closure factory, NOT a `key=key` default: a 2-parameter lambda
        # makes transform() bind the second param to the ARRAY INDEX
        # (the dedup.py::_cw_hasher pitfall) and shadow the key
        return lambda t: gopher_features_arr(t)[key]

    return {
        k: let(tokens(F.lower(text)), _measure(k))
        for k in (
            "n_words", "mean_word_len", "symbol_ratio", "alpha_frac",
            "stop_hits", "gopher_pass",
        )
    }


def _lang_scores_arr(toks: Column) -> dict[str, Column]:
    """Per-language stopword-hit counts over a pre-bound token array."""
    out: dict[str, Column] = {}
    for lang, words in LANG_STOPWORDS.items():
        arr = F.array([F.lit(w) for w in words])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    return out


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language stopword-hit counts; argmax = predicted language.
    Each entry ``let``-binds the token array (one tokenization per
    output column)."""

    def entry(lang):
        return let(tokens(F.lower(text)), lambda t: _lang_scores_arr(t)[lang])

    return {lang: entry(lang) for lang in LANG_STOPWORDS}


#: tie-break priority for lang_id (first wins on equal scores)
LANG_PRIORITY = ["en", "es", "fr", "de"]


def lang_id_arr(toks: Column, default: str = "und") -> Column:
    """``lang_id`` over a pre-bound (lowercased) token array — the CASE
    chain references each language's score several times, so ``toks``
    must be a cheap reference (projected column or ``let`` binding)."""
    scores = _lang_scores_arr(toks)
    expr = F.lit(default)
    for i in range(len(LANG_PRIORITY) - 1, -1, -1):
        lang = LANG_PRIORITY[i]
        cond = scores[lang] > 0
        for other in LANG_PRIORITY[i + 1:]:
            cond = cond & (scores[lang] >= scores[other])
        for earlier in LANG_PRIORITY[:i]:
            cond = cond & (scores[lang] > scores[earlier])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def lang_id(text: Column, default: str = "und") -> Column:
    """Predicted language = highest stopword-hit count; ties broken by
    LANG_PRIORITY order; 'und' when no list scores a hit. Expressed as an
    explicit CASE chain so a SQL oracle can mirror it verbatim; built
    over one ``let``-bound token array — one tokenization per row
    instead of one per score reference (~16)."""
    return let(tokens(F.lower(text)), lambda t: lang_id_arr(t, default))


def chunk_token_array(toks: Column, *, size: int = 50, stride: int = 25) -> Column:
    """``chunk_tokens`` over a PRE-TOKENIZED array column.

    ``toks`` must be a cheap reference (a projected column or a ``let``
    binding) — the lambda body slices it per chunk, so handing it a raw
    ``split(...)`` tree would re-tokenize per chunk (see ``let``).
    """
    n = F.size(toks)
    last_start = F.when(
        n <= size, F.lit(0)
    ).otherwise(
        (F.floor((n - size + stride - 1) / stride) * stride).cast("int")
    )
    starts = F.sequence(F.lit(0), last_start, F.lit(stride))
    return F.transform(
        starts,
        lambda s: F.struct(
            s.cast("int").alias("start"),
            F.concat_ws(" ", F.slice(toks, s + 1, size)).alias("chunk_text"),
            F.least(F.lit(size), n - s).cast("int").alias("n_tokens"),
        ),
    )


def chunk_array(arr: Column, *, size: int = 50, stride: int = 25) -> Column:
    """Raw-slice variant of ``chunk_token_array`` for NON-string element
    types (token-id sequences): array<struct<start:int, chunk:array<T>>>
    with the same window-start semantics, no text rendering. ``arr``
    must be a cheap reference (projected column or ``let`` binding) —
    the lambda slices it per chunk (see ``let``)."""
    n = F.size(arr)
    last_start = F.when(
        n <= size, F.lit(0)
    ).otherwise(
        (F.floor((n - size + stride - 1) / stride) * stride).cast("int")
    )
    starts = F.sequence(F.lit(0), last_start, F.lit(stride))
    return F.transform(
        starts,
        lambda s: F.struct(
            s.cast("int").alias("start"),
            F.slice(arr, s + 1, size).alias("chunk"),
        ),
    )


def chunk_tokens(text: Column, *, size: int = 50, stride: int = 25) -> Column:
    """Overlapping token-window chunks — the context-length splitter of a
    training-data pipeline. Returns array<struct<start,chunk_text,n_tokens>>
    with window starts 0, stride, 2*stride, ... up to the FIRST window that
    reaches the last token (ceil((n-size)/stride)*stride) — trailing
    windows whose content is fully contained in the previous one are never
    emitted (they would be duplicate training text). The last chunk may be
    shorter. Pure per-row expression (sequence + slice + concat_ws): no
    shuffle, no Python — chunking 100 TB is a map-only stage. Tokenizes
    once per row (``let``-bound) regardless of chunk count."""
    return let(
        tokens(text), lambda t: chunk_token_array(t, size=size, stride=stride)
    )


def chunk_count(toks: Column, *, size: int = 50, stride: int = 25) -> Column:
    """Number of chunks ``chunk_token_array`` would emit — pure arithmetic
    on the token count, for accounting queries that don't need the chunk
    text (building the chunk structs just to ``size()`` them re-renders
    the whole document ~size/stride times)."""
    n = F.size(toks)
    return (
        F.when(n <= size, F.lit(1))
        .otherwise(F.floor((n - size + stride - 1) / stride) + 1)
        .cast("int")
    )


def _max_run_length(sorted_arr: Column) -> Column:
    """Longest run of equal adjacent elements in a SORTED array — i.e.
    the count of the most frequent element — in one O(n) ``aggregate``
    pass (single-level lambda, constant work per element). The naive
    ``transform(array_distinct(a), t -> size(filter(a, x = t)))`` is
    O(distinct * n) interpreted lambda evaluations per row."""
    def step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + F.lit(1)).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(
        sorted_arr,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        step,
        lambda acc: acc["best"],
    )


def repetition_features_arr(toks: Column) -> dict[str, Column]:
    """``repetition_features`` over a PRE-TOKENIZED (lowercased) array
    column. ``toks`` should be a cheap reference (projected column or
    ``let`` binding); every pass here uses it only as a HOF collection
    argument or slice input — never inside a lambda body — so it is
    evaluated once per expression, not once per element (see ``let``)."""
    n = F.size(toks)
    # adjacent pairs via zip_with over two slices: the lambda sees only
    # its bound arguments, so no outer tree is re-evaluated per element
    # (element_at(toks, i) in a body would re-tokenize per 2-gram)
    two_grams = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return {
        "n_tokens": n,
        "top_token_frac": F.round(
            _max_run_length(F.array_sort(toks)) / F.greatest(n, F.lit(1)), 4
        ),
        "dup_2gram_frac": F.when(n < 2, F.lit(0.0)).otherwise(
            F.round(
                (F.size(two_grams) - F.size(F.array_distinct(two_grams)))
                / F.size(two_grams),
                4,
            )
        ),
    }


def repetition_features(text: Column) -> dict[str, Column]:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1): the
    fraction of tokens accounted for by the single most frequent token,
    and the fraction of duplicate word 2-grams. Highly repetitive
    documents (boilerplate, keyword stuffing, generation loops) score
    high on both and get filtered before training.

    Pure per-row array expressions — a 100 TB repetition sweep is a
    map-only stage with no shuffle, O(n log n) per row (sort + linear
    passes), tokenizing once per output column (``let``-bound). When
    several signals are consumed together, project the token array once
    and use ``repetition_features_arr``.
    """
    def entry(key):
        # NB: `let`'s body must be a 1-arg lambda — transform() would
        # bind a second parameter to the array index (see dedup.py)
        return let(
            tokens(F.lower(text)), lambda t: repetition_features_arr(t)[key]
        )

    return {
        key: entry(key)
        for key in ("n_tokens", "top_token_frac", "dup_2gram_frac")
    }


#: PII patterns shared by redact_pii / pii_counts and the SQL oracles.
#: RE2-compatible on purpose (character classes + \b only, no
#: lookarounds) so Java regex (Spark) and RE2 (DuckDB) match the same
#: spans. Redaction applies them in THIS dict order.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
}


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind PII match counts (named expressions; caller aliases)."""
    return {
        kind: F.size(F.regexp_extract_all(text, F.lit(pat), 0))
        for kind, pat in PII_PATTERNS.items()
    }


def redact_pii(text: Column) -> Column:
    """Replace every PII span with ``[KIND]``, applying PII_PATTERNS in
    dict order so overlapping matches resolve deterministically (the
    email pattern requires an alphabetic TLD, so a numeric-host address
    like user@10.0.0.1 keeps its local part and redacts the host as
    [IPV4]). Chained regexp_replace — per-row, map-only at any scale."""
    out = text
    for kind, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"[{kind.upper()}]")
    return out


def hash_sample(key: Column, *, hex_threshold: str = "1a") -> Column:
    """Deterministic hash-bucket sampling predicate for reproducible data
    mixing: keep rows whose md5(key) first-two-hex-chars sort below
    ``hex_threshold`` (granularity 1/256; '1a' ~ 10.2%). Unlike
    ``df.sample``, the decision is a pure function of the key — stable
    across runs, executors, and engines, so a 100 TB re-run (or a DuckDB
    oracle) selects the exact same rows."""
    return F.substring(F.md5(F.encode(key.cast("string"), "UTF-8")), 1, 2) < hex_threshold
