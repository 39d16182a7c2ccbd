"""Avro Object Container File scan (S5) — native when spark-avro is on the
classpath, Spark-distributed pure-Python decode otherwise.

The reference's weather bronze path starts from Event-Hub capture Avro
read via spark-avro (/root/reference/infra/cloud/fs-cloud/
chicago_weather_bronze.py:10-12). spark-avro is an EXTERNAL jar; this
container ships only the core avro libs, so ``avro_scan()`` tries
``spark.read.format("avro")`` first and, when the data source is absent,
falls back to:

    binaryFile scan (one task per file; executors read the bytes)
      -> mapInPandas with a SELF-CONTAINED decoder closure
      -> typed rows per the writer schema embedded in each file header.

Scale notes for the fallback: Event-Hub/Kinesis capture emits many
moderate files (one per partition x capture window), so at 100 TB the
FILE COUNT carries the parallelism — binaryFile gives one task per file,
and the decode is embarrassingly parallel with zero shuffle. What the
fallback gives up vs the native reader is sub-file (sync-marker block)
splitting, which only matters for single giant files. Schema inference,
Arrow batching, and the downstream plan are identical either way, so a
cluster WITH the jar runs the same pipeline on the native scan.

Implemented from the public Apache Avro 1.12 specification (Object
Container Files + binary encoding); no Avro library code involved.
Support: ``null``/``deflate`` codecs; records of primitives
(null/boolean/int/long/float/double/bytes/string) and ``[null, prim]``
unions — the shape capture files actually have. Anything richer raises
``NotImplementedError`` loudly.
"""

from __future__ import annotations

import glob as _glob
import hashlib
import json
import os
import struct
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MAGIC = b"Obj\x01"

_PRIM_TO_SPARK = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "bytes": T.BinaryType(),
    "string": T.StringType(),
}


def _base_type(t):
    """Normalize an Avro field type to (base, nullable). Logical types
    decode as their base representation (e.g. timestamp-micros -> long),
    matching what the downstream silver cast layer expects anyway."""
    if isinstance(t, dict):
        return _base_type(t["type"])[0], False
    if isinstance(t, list):
        branches = [b for b in t if b != "null"]
        if len(branches) != 1:
            raise NotImplementedError(f"unsupported avro union: {t}")
        base, _ = _base_type(branches[0])
        return base, True
    if not isinstance(t, str) or (t not in _PRIM_TO_SPARK and t != "null"):
        raise NotImplementedError(f"unsupported avro type: {t!r}")
    return t, t == "null"


def avro_to_spark_schema(schema: dict) -> T.StructType:
    if schema.get("type") != "record":
        raise NotImplementedError("only record top-level schemas supported")
    fields = []
    for f in schema["fields"]:
        base, nullable = _base_type(f["type"])
        if base == "null":
            continue
        fields.append(T.StructField(f["name"], _PRIM_TO_SPARK[base], nullable))
    return T.StructType(fields)


# ---------------------------------------------------------------------------
# Binary encoding (writer — driver-side, for capture fixtures and sinks)
# ---------------------------------------------------------------------------

def _enc_long(n: int, out: bytearray) -> None:
    n = (n << 1) ^ (n >> 63)  # zigzag
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _enc_value(v, t, out: bytearray) -> None:
    if isinstance(t, dict):
        _enc_value(v, t["type"], out)
        return
    if isinstance(t, list):  # [null, prim] union: branch index, then value
        if v is None:
            _enc_long(t.index("null"), out)
            return
        branch = next(i for i, b in enumerate(t) if b != "null")
        _enc_long(branch, out)
        _enc_value(v, t[branch], out)
        return
    if t == "null":
        return
    if t == "boolean":
        out.append(1 if v else 0)
    elif t in ("int", "long"):
        _enc_long(int(v), out)
    elif t == "float":
        out.extend(struct.pack("<f", float(v)))
    elif t == "double":
        out.extend(struct.pack("<d", float(v)))
    elif t in ("bytes", "string"):
        raw = v.encode("utf-8") if t == "string" else bytes(v)
        _enc_long(len(raw), out)
        out.extend(raw)
    else:
        raise NotImplementedError(f"unsupported avro type: {t!r}")


def write_avro_file(
    path: str,
    schema: dict,
    rows,
    *,
    codec: str = "deflate",
    records_per_block: int = 1000,
) -> None:
    """Write one Object Container File. The sync marker is derived from
    the schema digest, so identical inputs produce identical bytes —
    fixtures stay content-addressable across runs."""
    schema_json = json.dumps(schema, sort_keys=True)
    sync = hashlib.md5(schema_json.encode()).digest()
    names = [f["name"] for f in schema["fields"]]
    types = [f["type"] for f in schema["fields"]]

    out = bytearray(MAGIC)
    meta = {"avro.schema": schema_json.encode(), "avro.codec": codec.encode()}
    _enc_long(len(meta), out)
    for k, v in sorted(meta.items()):
        for raw in (k.encode(), v):
            _enc_long(len(raw), out)
            out.extend(raw)
    _enc_long(0, out)
    out.extend(sync)

    rows = list(rows)
    for start in range(0, len(rows), records_per_block):
        block = rows[start:start + records_per_block]
        body = bytearray()
        for row in block:
            for name, t in zip(names, types):
                _enc_value(row[name] if isinstance(row, dict) else getattr(row, name), t, body)
        data = bytes(body)
        if codec == "deflate":
            comp = zlib.compressobj(9, zlib.DEFLATED, -15)
            data = comp.compress(data) + comp.flush()
        elif codec != "null":
            raise NotImplementedError(f"unsupported codec: {codec}")
        _enc_long(len(block), out)
        _enc_long(len(data), out)
        out.extend(data)
        out.extend(sync)

    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(out)
    os.replace(tmp, path)


# ---------------------------------------------------------------------------
# Binary decoding (reader — runs ON EXECUTORS, so it is built as a
# self-contained closure: nested functions pickle by value and workers
# never need this package on their PYTHONPATH — the repo-wide pattern,
# see multimodal/assets.py)
# ---------------------------------------------------------------------------

def make_container_decoder():
    """Returns ``decode(blob) -> (schema_dict, list_of_row_dicts)``."""
    import json as _json
    import struct as _struct
    import zlib as _zlib

    magic = MAGIC

    def _cursor(buf):
        state = [0]

        def read_long():
            acc = 0
            shift = 0
            while True:
                b = buf[state[0]]
                state[0] += 1
                acc |= (b & 0x7F) << shift
                if not (b & 0x80):
                    break
                shift += 7
            return (acc >> 1) ^ -(acc & 1)

        def read_n(n):
            v = buf[state[0]:state[0] + n]
            state[0] += n
            return bytes(v)

        def read_bytes():
            return read_n(read_long())

        def at_end():
            return state[0] >= len(buf)

        return read_long, read_n, read_bytes, at_end

    def _decode_value(t, read_long, read_n, read_bytes):
        if isinstance(t, dict):
            return _decode_value(t["type"], read_long, read_n, read_bytes)
        if isinstance(t, list):
            return _decode_value(t[read_long()], read_long, read_n, read_bytes)
        if t == "null":
            return None
        if t == "boolean":
            return read_n(1)[0] != 0
        if t in ("int", "long"):
            return read_long()
        if t == "float":
            return _struct.unpack("<f", read_n(4))[0]
        if t == "double":
            return _struct.unpack("<d", read_n(8))[0]
        if t == "bytes":
            return read_bytes()
        if t == "string":
            return read_bytes().decode("utf-8")
        raise NotImplementedError(f"unsupported avro type: {t!r}")

    def decode(blob):
        if blob[:4] != magic:
            raise ValueError("not an Avro object container file")
        read_long, read_n, read_bytes, at_end = _cursor(memoryview(blob)[4:])
        meta = {}
        while True:
            n = read_long()
            if n == 0:
                break
            if n < 0:  # negative block count is followed by a byte size
                n = -n
                read_long()
            for _i in range(n):
                k = read_bytes().decode("utf-8")
                meta[k] = read_bytes()
        sync = read_n(16)
        schema = _json.loads(meta["avro.schema"].decode("utf-8"))
        codec = meta.get("avro.codec", b"null").decode("utf-8")
        names = [f["name"] for f in schema["fields"]]
        types = [f["type"] for f in schema["fields"]]

        # blocks follow the header on the same cursor
        records = []
        while not at_end():
            count = read_long()
            size = read_long()
            data = read_n(size)
            if codec == "deflate":
                data = _zlib.decompress(data, -15)
            elif codec != "null":
                raise NotImplementedError(f"unsupported codec: {codec}")
            if read_n(16) != sync:
                raise ValueError("avro block sync marker mismatch")
            rl, rn, rb, _end = _cursor(data)
            for _i in range(count):
                records.append(
                    {nm: _decode_value(t, rl, rn, rb) for nm, t in zip(names, types)}
                )
        return schema, records

    return decode


def read_avro_schema(path: str) -> dict:
    """Driver-side: parse just the header of one file for schema inference."""
    with open(path, "rb") as fh:
        head = fh.read(1 << 20)
    if head[:4] != MAGIC:
        raise ValueError(f"not an Avro object container file: {path}")
    pos = 4

    def read_long():
        nonlocal pos
        acc = 0
        shift = 0
        while True:
            b = head[pos]
            pos += 1
            acc |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    def read_bytes():
        nonlocal pos
        n = read_long()
        v = head[pos:pos + n]
        pos += n
        return v

    meta = {}
    while True:
        n = read_long()
        if n == 0:
            break
        if n < 0:
            n = -n
            read_long()
        for _ in range(n):
            k = bytes(read_bytes()).decode("utf-8")
            meta[k] = bytes(read_bytes())
    return json.loads(meta["avro.schema"].decode("utf-8"))


def avro_scan(spark: SparkSession, path: str, *, pattern: str = "*.avro") -> DataFrame:
    """S5: scan a directory (or glob) of Avro container files.

    Native ``format("avro")`` when spark-avro is on the classpath;
    otherwise the distributed pure-Python fallback documented in the
    module docstring. Both return the same schema for the same files.
    """
    target = path if not os.path.isdir(path) else os.path.join(path, pattern)
    try:
        df = spark.read.format("avro").load(target)
        df.schema  # force datasource resolution now, not at action time
        return df
    except Exception:
        pass  # spark-avro not on the classpath -> pure-Python fallback

    files = sorted(_glob.glob(target))
    if not files:
        raise FileNotFoundError(f"no avro files match {target}")
    spark_schema = avro_to_spark_schema(read_avro_schema(files[0]))
    names = [f.name for f in spark_schema.fields]
    decode = make_container_decoder()

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            for blob in pdf["content"]:
                _schema, records = decode(bytes(blob))
                yield pd.DataFrame(
                    {nm: [r[nm] for r in records] for nm in names},
                    columns=names,
                )

    binfiles = spark.read.format("binaryFile").load(files)
    return binfiles.select("content").mapInPandas(gen, schema=spark_schema)
