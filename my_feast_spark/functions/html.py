"""HTML → text extraction as pure Column expressions — the step between
a WARC response body (`sources/warc_io.py`) and the text-curation tier
(lang-id, quality, dedup all consume plain text).

Everything is a regexp_replace chain (no Python UDF — rides whole-stage
codegen on the scan, pushes below wide transforms), built RE2-safe so a
DuckDB/Trino oracle replays it with its own regexp engine:

  * no backreferences (``</(script)>.*?</\\1>`` would need one — the
    script/style blocks get one pattern EACH instead);
  * non-greedy ``.*?`` with ``(?is)`` inline flags (both engines);
  * whitespace classes written as the explicit ASCII set
    ``[ \\t\\r\\n]`` — Java's ``\\s`` and RE2's ``\\s`` agree on ASCII
    but this keeps the contract visible.

This is deliberately a LIGHTWEIGHT extractor (tags stripped, block
boundaries become spaces, the handful of entities real crawl text
carries decoded). It is NOT a DOM parser: malformed nesting degrades to
extra whitespace, never to dropped text. Boilerplate REMOVAL (nav/menu
repetition) is a separate, corpus-level concern — `q_boilerplate_ngrams`
does it on frequency, after extraction.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (pattern, replacement) chain applied in order by `strip_html` — and
#: replayed verbatim by `strip_html_sql` for the DuckDB oracle. Order
#: matters: comments/script/style go first (their CONTENT must not
#: survive tag stripping), entities decode after tags so a literal
#: ``&lt;p&gt;`` in text never becomes a strippable tag, ``&amp;``
#: decodes last so ``&amp;lt;`` becomes the literal ``&lt;``.
STRIP_HTML_RULES: tuple[tuple[str, str], ...] = (
    (r"(?is)<!--.*?-->", " "),
    (r"(?is)<script[^>]*>.*?</script[ \t\r\n]*>", " "),
    (r"(?is)<style[^>]*>.*?</style[ \t\r\n]*>", " "),
    (r"(?s)<[^>]+>", " "),
    (r"&nbsp;", " "),
    (r"&quot;", "\""),
    (r"&#39;", "'"),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&amp;", "&"),
    (r"[ \t\r\n]+", " "),
)


def strip_html(html: Column) -> Column:
    """Extract readable text from an HTML column (module docstring for
    scope and ordering). Returns trimmed text with runs of whitespace
    collapsed to single spaces."""
    out = html
    for pat, rep in STRIP_HTML_RULES:
        out = F.regexp_replace(out, pat, rep)
    return F.trim(out)


def strip_html_sql(expr: str) -> str:
    """The identical chain as a DuckDB SQL expression string over
    ``expr`` — the oracle generator's replay (same patterns, same
    order; DuckDB's regexp_replace takes the 'g' option where Spark's
    is global by default)."""
    out = expr
    for pat, rep in STRIP_HTML_RULES:
        p = pat.replace("'", "''")
        r = rep.replace("'", "''").replace("\\", "\\\\")
        out = f"regexp_replace({out}, '{p}', '{r}', 'g')"
    return f"trim({out})"
