"""URL canonicalization + domain extraction — the pre-tokenization
front door of a web-crawl curation pipeline (C4, RefinedWeb, Gopher all
open with URL-level filtering before any text-level stage).

Everything here is a pure Column expression (regexp + array ops — no
Python UDFs, no shuffle): canonicalization is a per-row projection that
pushes below wide transforms like any predicate, and at 100 TB it rides
whole-stage codegen on the scan. The regex patterns are RE2-safe (no
lookaround, no backreferences in the MATCH) so a DuckDB/Trino oracle
replays them with its own regexp engine.

Canonical form (documented choices, one per rule):

  * scheme lowercased;
  * host lowercased, one leading ``www.`` stripped (crawl dedup wants
    ``www.x.com`` == ``x.com``; keep it by passing ``strip_www=False``);
  * default ports dropped (``https:443``, ``http:80``), others kept;
  * empty path becomes ``/``; a trailing slash on a non-root path is
    dropped;
  * query params split on ``&``, tracking params dropped (``utm_*``,
    ``fbclid``, ``gclid``, ``ref``), the rest SORTED (param order never
    distinguishes resources in practice and sorting maximizes dedup
    recall), ``?`` dropped when nothing survives;
  * fragment dropped (never sent to the server).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: query-parameter prefixes that never identify the resource (client
#: attribution noise) — dropped during canonicalization
TRACKING_PARAM_PREFIXES = ("utm_", "fbclid=", "gclid=", "ref=")

#: minimal multi-label public-suffix subset for registered-domain
#: extraction. A production run swaps in the full Mozilla Public Suffix
#: List (publicsuffix.org) — same expression shape, longer literal set.
MULTI_LABEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "co.jp", "com.au", "com.br", "co.in",
    "com.cn", "co.kr", "com.mx",
)

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = "^[^#]*\\?([^#]*)"


def url_scheme(url: Column) -> Column:
    """Lowercased scheme (``''`` when the value is not a URL)."""
    return F.lower(F.regexp_extract(url, _SCHEME_RE, 1))


def url_host(url: Column, *, strip_www: bool = True) -> Column:
    """Lowercased host with the port removed (and one leading ``www.``
    stripped unless ``strip_www=False``).

    Known limits (crawl URLs in practice carry neither): a userinfo
    authority (``user@host``) keeps the userinfo, and a bracketed IPv6
    authority (``[::1]:8080``) truncates at the first colon — both
    parse as written, they are not special-cased."""
    auth = F.regexp_extract(url, _AUTH_RE, 1)
    host = F.lower(F.regexp_extract(auth, "^([^:]*)", 1))
    if strip_www:
        host = F.regexp_replace(host, "^www\\.", "")
    return host


def registered_domain(host: Column) -> Column:
    """eTLD+1 from an already-canonical host: the last two labels,
    or the last three when the final two match a multi-label public
    suffix (``a.b.co.uk`` -> ``b.co.uk``). Hosts with fewer labels pass
    through unchanged."""
    labels = F.split(host, "\\.")
    n = F.size(labels)
    last2 = F.concat_ws(
        ".", F.element_at(labels, -2), F.element_at(labels, -1)
    )
    last3 = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    is_multi = last2.isin(*MULTI_LABEL_SUFFIXES)
    return (
        F.when(n <= 2, host)
        .when(is_multi & (n >= 3), last3)
        .otherwise(last2)
    )


def _clean_query(url: Column) -> Column:
    q = F.regexp_extract(url, _QUERY_RE, 1)

    def _keep(p):
        cond = p != F.lit("")
        for pref in TRACKING_PARAM_PREFIXES:
            cond = cond & ~F.startswith(p, F.lit(pref))
        return cond

    kept = F.array_sort(F.filter(F.split(q, "&"), _keep))
    joined = F.array_join(kept, "&")
    return F.when(joined == "", F.lit("")).otherwise(F.concat(F.lit("?"), joined))


def url_canonicalize(url: Column, *, strip_www: bool = True) -> Column:
    """Rebuild the URL in canonical form (module docstring lists the
    rules). Non-URL values (no ``scheme://``) canonicalize to ``''`` —
    filter on that to drop malformed records."""
    scheme = url_scheme(url)
    host = url_host(url, strip_www=strip_www)
    auth = F.regexp_extract(url, _AUTH_RE, 1)
    port = F.regexp_extract(auth, ":([0-9]+)$", 1)
    port_part = F.when(
        (port == "")
        | ((scheme == "https") & (port == "443"))
        | ((scheme == "http") & (port == "80")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    raw_path = F.regexp_extract(url, _PATH_RE, 1)
    path = F.when(raw_path == "", F.lit("/")).otherwise(
        F.regexp_replace(raw_path, "(.)/$", "$1")
    )
    return F.when(scheme == "", F.lit("")).otherwise(
        F.concat(scheme, F.lit("://"), host, port_part, path, _clean_query(url))
    )
