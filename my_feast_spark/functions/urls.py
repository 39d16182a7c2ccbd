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

import os

from pyspark.sql import Column
from pyspark.sql import functions as F

#: query-parameter prefixes that never identify the resource (client
#: attribution noise) — dropped during canonicalization
TRACKING_PARAM_PREFIXES = ("utm_", "fbclid=", "gclid=", "ref=")

#: minimal multi-label public-suffix subset — kept for callers that
#: want the historical small set (pre-round-12 oracles pinned it); the
#: DEFAULT is now :data:`PUBLIC_SUFFIXES`, the full vendored ruleset.
MULTI_LABEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "co.jp", "com.au", "com.br", "co.in",
    "com.cn", "co.kr", "com.mx",
)

#: expanded well-known subset (the high-traffic ccTLD second-level
#: registrations from the ICANN section of the PSL). Still not the
#: full list — exact-match entries only (the PSL's wildcard ``*.`` and
#: exception ``!`` rules need per-rule logic, not an isin set; see
#: load_public_suffix_list) — but covers the registrations that
#: dominate real crawl traffic. Opt in via
#: ``registered_domain(host, suffixes=MULTI_LABEL_SUFFIXES_EXPANDED)``.
MULTI_LABEL_SUFFIXES_EXPANDED = MULTI_LABEL_SUFFIXES + (
    # United Kingdom
    "gov.uk", "net.uk", "me.uk", "ltd.uk", "plc.uk", "sch.uk", "nhs.uk",
    # Japan
    "ac.jp", "ad.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp", "ne.jp", "or.jp",
    # Australia
    "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    # Brazil
    "net.br", "org.br", "gov.br", "edu.br", "mil.br", "art.br", "blog.br",
    # India
    "firm.in", "net.in", "org.in", "gen.in", "ind.in", "ac.in", "edu.in",
    "res.in", "gov.in", "mil.in", "nic.in",
    # China
    "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn", "mil.cn",
    # South Korea
    "ne.kr", "or.kr", "re.kr", "go.kr", "ac.kr", "pe.kr", "mil.kr",
    # Mexico
    "net.mx", "org.mx", "gob.mx", "edu.mx",
    # New Zealand
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    "geek.nz", "gen.nz", "kiwi.nz", "maori.nz", "iwi.nz", "mil.nz",
    # South Africa
    "co.za", "net.za", "org.za", "gov.za", "ac.za", "edu.za", "web.za",
    # Argentina
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar", "mil.ar", "int.ar",
    # Turkey
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr", "mil.tr", "bel.tr",
    "web.tr",
    # Taiwan
    "com.tw", "net.tw", "org.tw", "gov.tw", "edu.tw", "idv.tw", "mil.tw",
    # Hong Kong
    "com.hk", "net.hk", "org.hk", "gov.hk", "edu.hk", "idv.hk",
    # Singapore
    "com.sg", "net.sg", "org.sg", "gov.sg", "edu.sg", "per.sg",
    # Israel
    "co.il", "net.il", "org.il", "gov.il", "ac.il", "muni.il", "idf.il",
    # Indonesia
    "co.id", "net.id", "or.id", "go.id", "ac.id", "sch.id", "web.id",
    "my.id", "biz.id",
    # Thailand
    "co.th", "net.th", "or.th", "go.th", "ac.th", "in.th", "mi.th",
    # Malaysia
    "com.my", "net.my", "org.my", "gov.my", "edu.my", "mil.my", "name.my",
    # Philippines
    "com.ph", "net.ph", "org.ph", "gov.ph", "edu.ph", "mil.ph", "ngo.ph",
    "i.ph",
    # Vietnam
    "com.vn", "net.vn", "org.vn", "gov.vn", "edu.vn", "ac.vn", "biz.vn",
    "info.vn", "name.vn", "pro.vn", "health.vn", "int.vn",
    # Ukraine
    "com.ua", "net.ua", "org.ua", "gov.ua", "edu.ua", "in.ua", "kiev.ua",
    "kyiv.ua",
    # Poland
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "mil.pl", "waw.pl",
    "biz.pl", "info.pl",
    # Greece
    "com.gr", "net.gr", "org.gr", "gov.gr", "edu.gr",
    # Egypt
    "com.eg", "net.eg", "org.eg", "gov.eg", "edu.eg", "sci.eg", "eun.eg",
    "mil.eg", "name.eg", "info.eg",
    # Saudi Arabia
    "com.sa", "net.sa", "org.sa", "gov.sa", "edu.sa", "med.sa", "sch.sa",
    "pub.sa",
    # Pakistan
    "com.pk", "net.pk", "org.pk", "gov.pk", "edu.pk", "fam.pk", "biz.pk",
    "web.pk", "gok.pk", "gop.pk", "gos.pk",
    # Bangladesh
    "com.bd", "net.bd", "org.bd", "gov.bd", "edu.bd", "ac.bd", "mil.bd",
    # Sri Lanka
    "com.lk", "net.lk", "org.lk", "gov.lk", "edu.lk", "ac.lk", "sch.lk",
    "web.lk", "int.lk", "ltd.lk", "grp.lk",
    # Kenya / Nigeria / Ghana / Tanzania / Uganda
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke", "me.ke",
    "mobi.ke", "info.ke",
    "com.ng", "net.ng", "org.ng", "gov.ng", "edu.ng", "sch.ng", "name.ng",
    "mobi.ng", "i.ng",
    "com.gh", "org.gh", "gov.gh", "edu.gh", "mil.gh",
    "co.tz", "or.tz", "go.tz", "ac.tz", "ne.tz", "sc.tz", "hotel.tz",
    "info.tz", "me.tz", "mil.tz", "mobi.tz", "tv.tz",
    "co.ug", "or.ug", "go.ug", "ac.ug", "ne.ug", "sc.ug", "org.ug",
    "com.ug",
    # Russia (legacy second-levels still in the PSL)
    "com.ru", "net.ru", "org.ru", "pp.ru", "msk.ru", "spb.ru",
    # Colombia / Peru / Venezuela / Ecuador / Uruguay / Chile (com.XX tier)
    "com.co", "net.co", "org.co", "edu.co", "gov.co", "mil.co", "nom.co",
    "com.pe", "net.pe", "org.pe", "gob.pe", "edu.pe", "mil.pe", "nom.pe",
    "com.ve", "net.ve", "org.ve", "gob.ve", "edu.ve", "mil.ve", "co.ve",
    "info.ve", "web.ve",
    "com.ec", "net.ec", "org.ec", "gob.ec", "edu.ec", "mil.ec", "fin.ec",
    "med.ec", "pro.ec", "info.ec",
    "com.uy", "net.uy", "org.uy", "gub.uy", "edu.uy", "mil.uy",
    # Spain-adjacent legacy + misc high-traffic
    "com.es", "nom.es", "org.es", "gob.es", "edu.es",
    "com.pt", "edu.pt", "gov.pt", "int.pt", "net.pt", "nome.pt", "org.pt",
    "publ.pt",
)

#: path of the vendored Public Suffix List snapshot shipped with the
#: package (publicsuffix.org format; provenance + scope documented in
#: the file's header — ICANN multi-label exact rules for the major
#: registries plus the high-traffic PRIVATE hosting suffixes like
#: ``github.io``). Regenerate against upstream with
#: ``tools/update_public_suffixes.py``.
PUBLIC_SUFFIXES_PATH = os.path.join(
    os.path.dirname(__file__), "data", "public_suffixes.dat"
)

#: the DEFAULT ruleset for :func:`registered_domain` — every multi-
#: label rule from the vendored snapshot (~1k entries), INCLUDING the
#: wildcard ``*.`` and exception ``!`` rule classes (new in round 13 —
#: the PSL carries ~20 of them: ``*.ck``/``!www.ck``-style small
#: ccTLDs and the Japanese prefecture-city geodomains). Exact rules
#: fold into the expression as isin literal sets (Catalyst converts
#: large IN lists to InSet — hash lookup, O(1) per row at any ruleset
#: size); the wildcard/exception classes each add ONE more isin branch
#: over the label-suffix concat, so the whole resolver stays a pure
#: whole-stage-codegen expression. Assigned below, after
#: load_public_suffix_list is defined.


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


def partition_suffix_rules(
    suffixes: tuple[str, ...],
) -> dict[str, list[str]]:
    """Split a PSL rule tuple into the classes
    :func:`registered_domain` branches on:

    * ``exact2``/``exact3`` — plain 2-/3-label suffixes;
    * ``wild1``/``wild2`` — wildcard bases (``*.ck`` -> base ``ck``
      with 1 label; ``*.kawasaki.jp`` -> 2-label base);
    * ``exc2``/``exc3`` — exception bases (``!www.ck`` -> ``www.ck``,
      2 labels; ``!city.kawasaki.jp`` -> 3 labels).

    Raises on rules outside those shapes (4-label exacts etc.) —
    silently dropping a rule would misresolve every host under it."""
    out: dict[str, list[str]] = {
        "exact2": [], "exact3": [], "wild1": [], "wild2": [],
        "exc2": [], "exc3": [],
    }
    bad = []
    for s in suffixes:
        if s.startswith("!"):
            base = s[1:]
            d = base.count(".")
            if d == 1:
                out["exc2"].append(base)
            elif d == 2:
                out["exc3"].append(base)
            else:
                bad.append(s)
        elif s.startswith("*."):
            base = s[2:]
            d = base.count(".")
            if d == 0:
                out["wild1"].append(base)
            elif d == 1:
                out["wild2"].append(base)
            else:
                bad.append(s)
        elif s.count(".") == 1:
            out["exact2"].append(s)
        elif s.count(".") == 2:
            out["exact3"].append(s)
        else:
            bad.append(s)
    if bad:
        raise ValueError(
            f"unsupported public-suffix rule shapes: {bad[:3]!r} "
            "(exact rules must have 2-3 labels, wildcard bases 1-2, "
            "exception bases 2-3)"
        )
    return out


def registered_domain(
    host: Column, *, suffixes: tuple[str, ...] | None = None
) -> Column:
    """eTLD+1 from an already-canonical host: the last two labels,
    or the last three (four) when the trailing labels match a two-
    (three-) label public suffix (``a.b.co.uk`` -> ``b.co.uk``). Hosts
    with fewer labels pass through unchanged.

    ``suffixes`` overrides the public-suffix ruleset (default
    :data:`PUBLIC_SUFFIXES`, the full vendored ruleset — includes the
    PRIVATE-section hosting suffixes, so ``user.github.io`` keeps all
    three labels; pass :data:`MULTI_LABEL_SUFFIXES` for the historical
    minimal set, or a :func:`load_public_suffix_list` result). All
    three PSL rule classes resolve, with the PSL's own precedence —
    exception rules first, then longest match:

    * exact: ``co.uk`` -> ``a.b.co.uk`` gives ``b.co.uk``;
    * wildcard: ``*.ck`` makes ANY ``x.ck`` a suffix, so
      ``a.b.foo.ck`` gives ``b.foo.ck`` (and a host that IS a public
      suffix, e.g. ``foo.ck`` itself, passes through unchanged — the
      same behavior exact rules have always had here);
    * exception: ``!www.ck`` cancels the wildcard, so ``a.www.ck``
      gives ``www.ck``.

    Still a pure isin expression chain (InSet after Catalyst's IN-list
    conversion, O(1) per row), no lookup join, no Python UDF."""
    if suffixes is None:
        suffixes = PUBLIC_SUFFIXES
    rules = partition_suffix_rules(suffixes)
    two, three = rules["exact2"], rules["exact3"]
    wild1, wild2 = rules["wild1"], rules["wild2"]
    exc2, exc3 = rules["exc2"], rules["exc3"]
    labels = F.split(host, "\\.")
    n = F.size(labels)
    last1 = F.element_at(labels, -1)
    last2 = F.concat_ws(
        ".", F.element_at(labels, -2), F.element_at(labels, -1)
    )
    last3 = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    need4 = bool(three or wild2)
    if need4:
        last4 = F.concat_ws(
            ".", F.element_at(labels, -4), F.element_at(labels, -3),
            F.element_at(labels, -2), F.element_at(labels, -1),
        )
    out = F.when(n <= 2, host)
    # exception rules win over everything (PSL §Algorithm step 2):
    # the suffix is the exception base minus its leftmost label, so
    # the registered domain IS the base
    if exc3:
        out = out.when(last3.isin(*exc3), last3)
    if exc2:
        out = out.when(last2.isin(*exc2), last2)
    # then longest match: a 2-label wildcard base makes a 3-label
    # suffix — same length as exact 3-label rules (disjoint sets)
    if wild2:
        out = out.when(last2.isin(*wild2) & (n >= 4), last4).when(
            last2.isin(*wild2), host
        )
    if three:
        out = out.when(last3.isin(*three) & (n >= 4), last4).when(
            last3.isin(*three), host
        )
    # 1-label wildcard base -> 2-label suffix (n >= 3 holds past the
    # first branch, and the suffix-only host passed through there)
    if wild1:
        out = out.when(last1.isin(*wild1), last3)
    if two:
        out = out.when(last2.isin(*two) & (n >= 3), last3)
    return out.otherwise(last2)


def load_public_suffix_list(path: str) -> tuple[str, ...]:
    """Parse a Public Suffix List file (publicsuffix.org format) into a
    ``suffixes=`` tuple for :func:`registered_domain`: comment (``//``)
    and blank lines skipped; multi-label EXACT rules, wildcard rules
    with 1-2-label bases (``*.ck``, ``*.kawasaki.jp``) and exception
    rules with 2-3-label bases (``!www.ck``, ``!city.kawasaki.jp``)
    all kept — that is every rule shape the current upstream list
    contains beyond the single-label defaults. Single-label rules
    (``com``) are skipped: last-two-labels is the resolver's default
    behavior already. Driver-side file read: the list is a few hundred
    KB, loaded once per job and folded into the expression as
    literals."""
    out = []
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("//"):
                continue
            if line.startswith("!"):
                if line.count(".") in (1, 2):
                    out.append(line.lower())
                continue
            if line.startswith("*."):
                if line[2:].count(".") in (0, 1):
                    out.append(line.lower())
                continue
            if line.count(".") in (1, 2):
                out.append(line.lower())
    return tuple(out)


PUBLIC_SUFFIXES = load_public_suffix_list(PUBLIC_SUFFIXES_PATH)


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
