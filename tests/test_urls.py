"""URL canonicalization + domain-quota operators (functions/urls.py,
operators/urls.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window, functions as F

from my_feast_spark.functions.urls import (
    registered_domain,
    url_canonicalize,
    url_host,
    url_scheme,
)
from my_feast_spark.operators.urls import blocklist_filter, domain_quota

CANON_CASES = [
    # default https port dropped, host+scheme lowercased, www stripped
    ("HTTPS://WWW.News.Example.COM:443/a/b?id=1", "https://news.example.com/a/b?id=1"),
    # default http port dropped
    ("http://x.com:80/", "http://x.com/"),
    # non-default port kept; 443 on http is NOT default
    ("http://x.com:443/a", "http://x.com:443/a"),
    ("https://x.com:8080/a", "https://x.com:8080/a"),
    # tracking params dropped, the rest sorted, fragment dropped
    (
        "https://x.com/p?utm_source=f&b=2&a=1&gclid=g&ref=r#frag",
        "https://x.com/p?a=1&b=2",
    ),
    # all params tracking -> '?' dropped entirely
    ("https://x.com/p?utm_a=1&utm_b=2", "https://x.com/p"),
    # empty path -> '/', trailing slash on non-root dropped
    ("https://x.com", "https://x.com/"),
    ("https://x.com/a/", "https://x.com/a"),
    ("https://x.com/", "https://x.com/"),
    # not a URL -> ''
    ("not a url", ""),
    ("", ""),
]


def test_canonicalize_cases(spark):
    df = spark.createDataFrame([(u,) for u, _ in CANON_CASES], "url string")
    got = [
        r["c"] for r in df.select(url_canonicalize(F.col("url")).alias("c")).collect()
    ]
    assert got == [want for _, want in CANON_CASES]


def test_canonicalize_idempotent(spark):
    df = spark.createDataFrame(
        [(u,) for u, _ in CANON_CASES if "://" in u], "url string"
    )
    once = df.select(url_canonicalize(F.col("url")).alias("c"))
    twice = once.select(url_canonicalize(F.col("c")).alias("c"))
    assert [r["c"] for r in once.collect()] == [r["c"] for r in twice.collect()]


def test_host_scheme_and_registered_domain(spark):
    cases = [
        ("https://WWW.a.B.co.uk/x", "a.b.co.uk", "b.co.uk", "https"),
        ("http://sub.x.com:8080/", "sub.x.com", "x.com", "http"),
        ("ftp://Single/x", "single", "single", "ftp"),
        ("https://x.com/", "x.com", "x.com", "https"),
    ]
    df = spark.createDataFrame([(u,) for u, *_ in cases], "url string")
    rows = df.select(
        url_host(F.col("url")).alias("h"),
        registered_domain(url_host(F.col("url"))).alias("d"),
        url_scheme(F.col("url")).alias("s"),
    ).collect()
    for row, (_u, h, d, s) in zip(rows, cases):
        assert (row["h"], row["d"], row["s"]) == (h, d, s)


@pytest.fixture()
def domain_rows(spark):
    rows = [(f"d{i % 3}.com", i) for i in range(40)]
    return spark.createDataFrame(rows, "dom string, k long")


def test_domain_quota_matches_window_reference(spark, domain_rows):
    for buckets in (1, 4, 32):
        got = sorted(
            (r["dom"], r["k"])
            for r in domain_quota(
                domain_rows, "dom", ["k"], 5, salt_buckets=buckets
            ).collect()
        )
        w = Window.partitionBy("dom").orderBy("k")
        want = sorted(
            (r["dom"], r["k"])
            for r in domain_rows.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 5)
            .drop("rn")
            .collect()
        )
        assert got == want, buckets


def test_domain_quota_keeps_all_when_under_quota(spark, domain_rows):
    got = domain_quota(domain_rows, "dom", ["k"], 100).count()
    assert got == 40


def test_domain_quota_rejects_bad_args(spark, domain_rows):
    with pytest.raises(ValueError):
        domain_quota(domain_rows, "dom", ["k"], 0)
    with pytest.raises(ValueError):
        domain_quota(domain_rows, "dom", ["k"], 5, salt_buckets=0)


def test_domain_quota_plan_has_no_window(spark, domain_rows):
    # the whole point of the salted two-phase top-n: never a per-domain
    # row_number window (one hot domain would serialize into one task)
    plan = domain_quota(domain_rows, "dom", ["k"], 5)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Window" not in plan


def test_blocklist_filter_list_and_frame(spark, domain_rows):
    kept = blocklist_filter(domain_rows, "dom", ["d1.com"])
    assert kept.count() == 27 and kept.where(F.col("dom") == "d1.com").count() == 0
    frame = spark.createDataFrame([("d0.com",), ("d2.com",)], "dom string")
    kept2 = blocklist_filter(domain_rows, "dom", frame)
    assert {r["dom"] for r in kept2.select("dom").distinct().collect()} == {"d1.com"}


def test_canonicalize_is_shuffle_free(spark):
    df = spark.createDataFrame([("https://x.com/a?b=1",)], "url string")
    plan = df.select(url_canonicalize(F.col("url")).alias("c"))._jdf\
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_domain_quota_enforces_unique_order_keys(spark, domain_rows):
    """Duplicate order keys previously made the keep-set join-back
    silently keep every row sharing a kept key (over-quota output); the
    contract is now enforced at execution time."""
    import pytest
    from pyspark.sql import Row
    from pyspark.sql.utils import AnalysisException  # noqa: F401

    from my_feast_spark.operators.urls import domain_quota

    dup = spark.createDataFrame([
        Row(domain="a.com", score=1, doc_id=10),
        Row(domain="a.com", score=1, doc_id=10),  # duplicate order key
        Row(domain="a.com", score=2, doc_id=11),
    ])
    out = domain_quota(dup, "domain", ["score", "doc_id"], 1)
    with pytest.raises(Exception, match="unique key"):
        out.collect()
    # unique keys: unchanged behavior
    ok = spark.createDataFrame([
        Row(domain="a.com", score=1, doc_id=10),
        Row(domain="a.com", score=2, doc_id=11),
    ])
    got = domain_quota(ok, "domain", ["score", "doc_id"], 1).collect()
    assert [(r.domain, r.doc_id) for r in got] == [("a.com", 10)]


def test_registered_domain_expanded_and_psl_loader(spark, tmp_path):
    """The round-12 default is the full vendored ruleset (PSL ICANN +
    PRIVATE exact rules), so com.sg / gob.mx / github.io-class
    registrations resolve by default; the historical minimal set stays
    available as an explicit override; 3-label suffixes take four
    labels."""
    from pyspark.sql import Row

    from my_feast_spark.functions.urls import (
        MULTI_LABEL_SUFFIXES_EXPANDED,
        load_public_suffix_list,
        registered_domain,
    )
    import pyspark.sql.functions as F

    rows = [
        Row(host="a.b.com.sg"),   # full/expanded: b.com.sg; minimal: com.sg
        Row(host="x.gob.mx"),     # full/expanded: x.gob.mx; minimal: gob.mx
        Row(host="shop.co.nz"),
        Row(host="plain.com"),
        Row(host="a.b.co.uk"),    # in ALL sets
        Row(host="user.github.io"),      # PRIVATE-section suffix
        Row(host="blog.blogspot.co.uk"),  # PRIVATE 3-label suffix
    ]
    df = spark.createDataFrame(rows)
    got_default = {
        r.host: r.d
        for r in df.select(
            "host", registered_domain(F.col("host")).alias("d")
        ).collect()
    }
    assert got_default == {
        "a.b.com.sg": "b.com.sg",
        "x.gob.mx": "x.gob.mx",
        "shop.co.nz": "shop.co.nz",
        "plain.com": "plain.com",
        "a.b.co.uk": "b.co.uk",
        "user.github.io": "user.github.io",
        "blog.blogspot.co.uk": "blog.blogspot.co.uk",
    }
    # the historical minimal set stays available as an explicit override
    from my_feast_spark.functions.urls import MULTI_LABEL_SUFFIXES

    got_min = {
        r.host: r.d
        for r in df.select(
            "host",
            registered_domain(
                F.col("host"), suffixes=MULTI_LABEL_SUFFIXES
            ).alias("d"),
        ).collect()
    }
    assert got_min["a.b.com.sg"] == "com.sg"
    assert got_min["user.github.io"] == "github.io"
    got_exp = {
        r.host: r.d
        for r in df.select(
            "host",
            registered_domain(
                F.col("host"), suffixes=MULTI_LABEL_SUFFIXES_EXPANDED
            ).alias("d"),
        ).collect()
    }
    assert got_exp == {
        "a.b.com.sg": "b.com.sg",
        "x.gob.mx": "x.gob.mx",
        "shop.co.nz": "shop.co.nz",
        "plain.com": "plain.com",
        "a.b.co.uk": "b.co.uk",
        # the ICANN-only expanded set has no private-section rules
        "user.github.io": "github.io",
        "blog.blogspot.co.uk": "blogspot.co.uk",
    }

    # 3-label suffix support: w.pref.aichi.jp -> 4 labels kept
    got3 = (
        spark.createDataFrame([Row(host="w.pref.aichi.jp")])
        .select(
            registered_domain(
                F.col("host"), suffixes=("pref.aichi.jp",)
            ).alias("d")
        )
        .collect()[0]
        .d
    )
    assert got3 == "w.pref.aichi.jp"

    psl = tmp_path / "psl.dat"
    psl.write_text(
        "// ===BEGIN ICANN DOMAINS===\n"
        "com\n"            # single-label: skipped (default behavior)
        "co.uk\n"
        "pref.aichi.jp\n"
        "*.ck\n"               # wildcard: kept (round 13)
        "!www.ck\n"            # exception: kept (round 13)
        "*.a.b.c\n"            # 3-label wildcard base: skipped
        "!x.a.b.c\n"           # 4-label exception: skipped
        "\n"
        "COM.SG\n"
    )
    loaded = load_public_suffix_list(str(psl))
    assert loaded == ("co.uk", "pref.aichi.jp", "*.ck", "!www.ck",
                      "com.sg")

    import pytest

    with pytest.raises(ValueError, match="rule shapes"):
        registered_domain(F.col("host"), suffixes=("a.b.c.d",))


def test_registered_domain_wildcard_and_exception_rules(spark):
    """Round-13: the PSL's wildcard and exception rule classes resolve
    with PSL precedence — ``*.ck`` makes any ``x.ck`` a suffix (so a
    4-label host keeps 3 labels), ``!www.ck`` cancels it (everything
    under www.ck collapses to www.ck), ``*.kawasaki.jp`` exercises the
    2-label wildcard base with its ``!city.kawasaki.jp`` exception, and
    exact rules still win where they apply."""
    from pyspark.sql import Row

    from my_feast_spark.functions.urls import registered_domain
    import pyspark.sql.functions as F

    rows = [
        Row(host="a.b.zone.ck"),          # *.ck: suffix zone.ck -> b.zone.ck
        Row(host="b.zone.ck"),            # registered domain itself
        Row(host="zone.ck"),              # IS a public suffix: pass-through
        Row(host="a.www.ck"),             # !www.ck: -> www.ck
        Row(host="www.ck"),               # n<=2 pass-through
        Row(host="shop.example.kawasaki.jp"),   # *.kawasaki.jp -> 4? no:
        Row(host="x.shop.example.kawasaki.jp"),
        Row(host="a.city.kawasaki.jp"),   # !city.kawasaki.jp -> city....
        Row(host="a.b.co.uk"),            # exact rules unaffected
        Row(host="plain.com"),
    ]
    df = spark.createDataFrame(rows)
    got = {
        r.host: r.d
        for r in df.select(
            "host", registered_domain(F.col("host")).alias("d")
        ).collect()
    }
    assert got == {
        "a.b.zone.ck": "b.zone.ck",
        "b.zone.ck": "b.zone.ck",
        "zone.ck": "zone.ck",
        "a.www.ck": "www.ck",
        "www.ck": "www.ck",
        # *.kawasaki.jp: suffix = example.kawasaki.jp (3 labels), so a
        # 4-label host IS the registered domain and 5 labels keep 4
        "shop.example.kawasaki.jp": "shop.example.kawasaki.jp",
        "x.shop.example.kawasaki.jp": "shop.example.kawasaki.jp",
        "a.city.kawasaki.jp": "city.kawasaki.jp",
        "a.b.co.uk": "b.co.uk",
        "plain.com": "plain.com",
    }
