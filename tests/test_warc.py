"""WARC scan (sources/warc_io.py) + HTML extraction (functions/html.py):
distributed parse of per-record-gzip and plain files, HTTP envelope
split, and the strip_html chain agreeing between Spark and DuckDB."""

from __future__ import annotations

import gzip
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from my_feast_spark.functions.html import strip_html, strip_html_sql
from my_feast_spark.sources.warc_io import (
    make_warc_parser,
    warc_scan,
    write_warc_file,
)


def _recs():
    body = b"<html><body><p>Hello &amp; welcome</p></body></html>"
    http = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=utf-8\r\n"
        b"Content-Length: " + str(len(body)).encode() + b"\r\n"
        b"\r\n" + body
    )
    return [
        dict(warc_type="warcinfo", record_id="<urn:uuid:0>", url="",
             warc_date="2024-01-01T00:00:00Z",
             content_type="application/warc-fields",
             payload=b"software: mfs-test\r\n"),
        dict(warc_type="request", record_id="<urn:uuid:1>",
             url="http://example.test/a",
             warc_date="2024-01-01T00:00:01Z",
             content_type="application/http;msgtype=request",
             payload=b"GET /a HTTP/1.1\r\nHost: example.test\r\n\r\n"),
        dict(warc_type="response", record_id="<urn:uuid:2>",
             url="http://example.test/a",
             warc_date="2024-01-01T00:00:02Z",
             content_type="application/http; msgtype=response",
             payload=http),
    ], body


def test_roundtrip_gzip_and_plain(tmp_path):
    recs, body = _recs()
    parse = make_warc_parser()
    for gz, name in ((True, "a.warc.gz"), (False, "a.warc")):
        p = str(tmp_path / name)
        write_warc_file(p, recs, gzip_records=gz)
        rows = parse(open(p, "rb").read())
        assert [r[0] for r in rows] == ["warcinfo", "request", "response"]
        # the response's HTTP envelope is split off: status + body
        resp = rows[2]
        assert resp[5] == 200
        assert resp[6] == "text/html; charset=utf-8"
        assert bytes(resp[7]) == body
        # the request record passes through unparsed (msgtype=request)
        assert rows[1][5] is None
        assert bytes(rows[1][7]).startswith(b"GET /a")
    # the gzip file really is a multi-member stream (3 members)
    blob = open(str(tmp_path / "a.warc.gz"), "rb").read()
    assert blob.count(b"\x1f\x8b\x08") >= 3


def test_warc_scan_distributed(spark, tmp_path):
    """One task per file, executors parse: the scan must return every
    record of every shard with the HTTP body extracted — driven through
    real Python workers, not a driver loop."""
    recs, body = _recs()
    for i in range(3):
        shifted = [
            {**r, "record_id": f"<urn:uuid:{i}-{j}>"}
            for j, r in enumerate(recs)
        ]
        write_warc_file(str(tmp_path / f"shard{i}.warc.gz"), shifted)
    df = warc_scan(spark, str(tmp_path))
    assert df.count() == 9
    resp = df.filter(F.col("warc_type") == "response")
    got = resp.select("url", "http_status", "payload").collect()
    assert len(got) == 3
    assert all(r.http_status == 200 and bytes(r.payload) == body
               for r in got)
    # text extraction composes on the scan
    txt = resp.select(
        strip_html(F.decode(F.col("payload"), "UTF-8")).alias("t")
    ).collect()
    assert all(r.t == "Hello & welcome" for r in txt)


def test_scan_fails_loudly_on_garbage(spark, tmp_path):
    (tmp_path / "bad.warc").write_bytes(b"NOT A WARC AT ALL\r\n\r\n")
    df = warc_scan(spark, str(tmp_path))
    with pytest.raises(Exception, match="not a WARC record"):
        df.collect()
    with pytest.raises(FileNotFoundError):
        warc_scan(spark, str(tmp_path / "empty_dir_nope"))


def test_strip_html_spark_equals_duckdb(spark):
    """The oracle contract: the SAME rule chain produces the SAME text
    on both engines, including the ordering traps (entities decoded
    after tags, &amp; last, script/style content dropped)."""
    cases = [
        "<html><head><title>T</title><style>p {color:red}</style>"
        "<script type='x'>var a = '<p>not text</p>';</script></head>"
        "<body><h1>Head</h1>\n<p>line one<br/>line&nbsp;two</p>"
        "<!-- hidden -->tail &amp;lt; &quot;q&quot; &#39;s&#39;</body>",
        "no markup at all",
        "a &lt;tag&gt; spelled out &amp; kept",
        "<p>unclosed <b>nesting</i> degrades to spaces</p",
        "",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "h string")
    got = [r.t for r in
           df.select(strip_html(F.col("h")).alias("t")).collect()]
    con = duckdb.connect()
    want = []
    for c in cases:
        sql_in = "'" + c.replace("'", "''") + "'"
        want.append(
            con.execute(f"SELECT {strip_html_sql(sql_in)}").fetchone()[0]
        )
    assert got == want
    assert got[0] == ("T Head line one line two tail &lt; \"q\" 's'")
    assert got[1] == "no markup at all"
    assert got[2] == 'a <tag> spelled out & kept'
