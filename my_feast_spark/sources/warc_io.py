"""WARC (Web ARChive) scan — the ingest format of web-crawl corpora.

Every large-scale crawl corpus (Common Crawl and its derivatives — the
upstream of C4/RefinedWeb-style curation this engine's text tier
implements) ships as WARC: a sequence of typed records (request /
response / metadata), each a small header block plus a raw payload,
usually gzip-compressed PER RECORD so the file is a concatenation of
gzip members. Spark has no built-in WARC datasource; this module is
the `avro_io.py` pattern applied to WARC:

    binaryFile scan (one task per file; executors read the bytes)
      -> mapInPandas with a SELF-CONTAINED parser closure
      -> one row per record: (warc_type, record_id, url, warc_date,
         content_type, http_status, http_content_type, payload)

with the HTTP envelope of ``response`` records parsed off so
``payload`` is the BODY bytes (the HTML the text tier consumes);
non-HTTP payloads pass through untouched.

Scale notes: crawl WARCs are sharded (~1 GB each) by convention, so
the FILE COUNT carries the parallelism — one task per shard, parse
embarrassingly parallel, zero shuffle. What this gives up vs a
record-splitting datasource is sub-file splits, which only matter for
single giant files (same tradeoff, documented the same way, as the
avro fallback). Memory: one shard is decompressed per task at a time;
keep shards at the conventional ~1 GB.

Implemented from the public ISO 28500 / WARC 1.0 specification; no
library code involved. `write_warc_file` is the driver-side writer for
fixtures and small sinks (per-record gzip members, the standard
``.warc.gz`` layout readers expect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: scan output schema (DDL) — payload is the HTTP body for parsed
#: response records, the raw record payload otherwise
WARC_SCHEMA = (
    "warc_type string, record_id string, url string, warc_date string, "
    "content_type string, http_status int, http_content_type string, "
    "payload binary"
)


def write_warc_file(path: str, records, *, gzip_records: bool = True):
    """Write WARC 1.0 records to ``path`` (driver-side — fixtures and
    small sinks). ``records``: iterables of dicts with ``warc_type``,
    ``record_id``, ``url``, ``warc_date`` (ISO-8601 Z), ``payload``
    (bytes) and optional ``content_type``. With ``gzip_records`` each
    record is its own gzip member (the standard ``.warc.gz`` layout —
    readers can seek to members independently)."""
    import gzip

    out = bytearray()
    for r in records:
        payload = r["payload"]
        head = (
            "WARC/1.0\r\n"
            f"WARC-Type: {r['warc_type']}\r\n"
            f"WARC-Record-ID: {r['record_id']}\r\n"
            f"WARC-Date: {r['warc_date']}\r\n"
            f"WARC-Target-URI: {r['url']}\r\n"
            f"Content-Type: {r.get('content_type', 'application/octet-stream')}\r\n"
            f"Content-Length: {len(payload)}\r\n"
            "\r\n"
        ).encode("utf-8")
        rec = head + payload + b"\r\n\r\n"
        out += gzip.compress(rec) if gzip_records else rec
    with open(path, "wb") as fh:
        fh.write(bytes(out))
    return path


def make_warc_parser():
    """Closure factory (stdlib only, pickled by value — safe in Python
    workers without the package on PYTHONPATH): returns
    ``parse(blob) -> list[tuple]`` yielding one tuple per record in
    WARC_SCHEMA order. Handles plain and per-record-gzip files;
    response records get their HTTP envelope split off (status +
    Content-Type parsed, payload = body)."""
    import zlib as _zlib

    def _gunzip_members(blob):
        # a .warc.gz is a CONCATENATION of gzip members; a single
        # decompress stops at the first member's end — loop on
        # unused_data until the stream is drained
        out = bytearray()
        data = blob
        while data:
            d = _zlib.decompressobj(wbits=31)
            out += d.decompress(data)
            out += d.flush()
            data = d.unused_data
        return bytes(out)

    def _parse_http(payload):
        # split an HTTP/1.x response envelope; on anything that does
        # not look like one, pass the payload through untouched
        sep = payload.find(b"\r\n\r\n")
        if sep < 0 or not payload.startswith(b"HTTP/"):
            return None, None, payload
        head = payload[:sep].decode("latin-1", "replace")
        lines = head.split("\r\n")
        try:
            status = int(lines[0].split(" ", 2)[1])
        except (IndexError, ValueError):
            return None, None, payload
        ctype = None
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            if k.strip().lower() == "content-type":
                ctype = v.strip()
        return status, ctype, payload[sep + 4:]

    def parse(blob):
        blob = bytes(blob)
        if blob[:2] == b"\x1f\x8b":
            blob = _gunzip_members(blob)
        rows = []
        pos = 0
        n = len(blob)
        while pos < n:
            # skip inter-record padding
            while pos < n and blob[pos:pos + 1] in (b"\r", b"\n"):
                pos += 1
            if pos >= n:
                break
            sep = blob.find(b"\r\n\r\n", pos)
            if sep < 0:
                raise ValueError("truncated WARC record header")
            head = blob[pos:sep].decode("utf-8", "replace")
            lines = head.split("\r\n")
            if not lines[0].startswith("WARC/"):
                raise ValueError(
                    f"not a WARC record at offset {pos}: {lines[0]!r}"
                )
            h = {}
            for ln in lines[1:]:
                k, _, v = ln.partition(":")
                h[k.strip().lower()] = v.strip()
            clen = int(h["content-length"])
            payload = blob[sep + 4: sep + 4 + clen]
            if len(payload) != clen:
                raise ValueError("truncated WARC record payload")
            pos = sep + 4 + clen
            ctype = h.get("content-type")
            status = http_ctype = None
            body = payload
            if (h.get("warc-type") == "response"
                    and ctype and "msgtype=response" in ctype.replace(" ", "")):
                status, http_ctype, body = _parse_http(payload)
            rows.append((
                h.get("warc-type"),
                h.get("warc-record-id"),
                h.get("warc-target-uri"),
                h.get("warc-date"),
                ctype,
                status,
                http_ctype,
                body,
            ))
        return rows

    return parse


def warc_scan(
    spark: SparkSession, path: str, *, pattern: str = "*.warc*"
) -> DataFrame:
    """Scan a directory (or glob) of WARC files into one row per record
    (schema: :data:`WARC_SCHEMA`; module docstring for the scale
    shape). Response records carry their parsed HTTP status /
    Content-Type and the BODY as ``payload``."""
    # list through the Hadoop FS (globStatus), not driver-local glob —
    # review-caught: glob.glob over a remote URI (the Common Crawl
    # segments this format exists for live on object storage) silently
    # returned [] and masqueraded as 'no WARC files match'; the Hadoop
    # listing serves every scheme the session's FS config backs and
    # still fails loudly on an empty match
    jvm = spark.sparkContext._jvm
    hp = jvm.org.apache.hadoop.fs.Path(path)
    fs = hp.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if fs.exists(hp) and fs.getFileStatus(hp).isDirectory():
        target = jvm.org.apache.hadoop.fs.Path(path, pattern)
    else:
        target = hp
    statuses = fs.globStatus(target)
    files = sorted(
        str(st.getPath().toString())
        for st in (statuses or [])
        if st.isFile()
    )
    if not files:
        raise FileNotFoundError(f"no WARC files match {target}")
    parse = make_warc_parser()
    names = [c.split()[0] for c in WARC_SCHEMA.split(", ")]

    def gen(batches, _parse=parse, _names=names):
        import pandas as pd

        for pdf in batches:
            for blob in pdf["content"]:
                rows = _parse(blob)
                yield pd.DataFrame(
                    {nm: [r[i] for r in rows]
                     for i, nm in enumerate(_names)},
                    columns=_names,
                )

    binfiles = spark.read.format("binaryFile").load(files)
    return binfiles.select("content").mapInPandas(gen, schema=WARC_SCHEMA)
