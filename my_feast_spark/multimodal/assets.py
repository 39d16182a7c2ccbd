"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The design (per the 100 TB training-data-pipeline target):

  * An *asset table* is an ordinary DataFrame with a ``content: binary``
    column plus typed metadata columns — Parquet stores the blobs inline
    (chunked, columnar), so scans prune metadata-only queries to the
    metadata columns and never touch the bytes (``ReadSchema`` shows the
    pruning; keep blobs in their own column for that reason).
  * Decode / feature-extract / resize / frame-sample run as Arrow-batched
    ``mapInPandas`` operators: Spark streams record batches into Python,
    one worker per partition — the only boundary per batch is one Arrow
    transfer. ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds peak
    memory when blobs are large; repartition the asset table by size
    before heavy decode stages so work balances across executors.
  * The actual image/audio codecs are NOT in this container. The decode
    core is therefore STUBBED: a deterministic fake codec (``MFIM`` header:
    magic + width + height + channels, then payload bytes) exercises the
    full Spark plumbing — schema, Arrow batching, partitioning — and a
    real-codec path is gated behind an import-try that raises
    ``NotImplementedError`` with a clear marker.

Header layout (big-endian u32 after 4-byte magic)::

    bytes 0-3    b"MFIM"
    bytes 4-7    width
    bytes 8-11   height
    bytes 12-15  channels
    bytes 16..   payload
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from my_feast_spark.functions.scalar import floor_round

MAGIC = b"MFIM"

ASSET_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("content", T.BinaryType()),
])

DECODED_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("payload_md5", T.StringType()),
])

FRAME_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame", T.BinaryType()),
])


def encode_fake_image_assets(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    *,
    width_col=None,
    height_col=None,
    channels: int = 3,
) -> DataFrame:
    """Build an asset table from any string payload — JVM-side only.

    The header is assembled natively (hex-format + unhex + binary concat),
    so asset construction is whole-stage-codegen'd and never leaves the
    executor JVM. Defaults derive deterministic fake dimensions from the
    payload length / id (the shape a real ingest would read from EXIF).
    """
    width = width_col if width_col is not None else (F.length(payload_col) % 640) + 1
    height = height_col if height_col is not None else (F.col(id_col) % 480 + 1)
    header = F.unhex(
        F.concat(
            F.lit(MAGIC.hex()),
            F.format_string("%08x", width.cast("int")),
            F.format_string("%08x", height.cast("int")),
            F.format_string("%08x", F.lit(channels)),
        )
    )
    return df.select(
        F.col(id_col).cast("long").alias("asset_id"),
        F.lit("image").alias("kind"),
        F.concat(header, F.encode(F.col(payload_col), "UTF-8")).alias("content"),
    )


def _make_parser():
    """Header parser built as a closure so worker-side pickles are
    self-contained: nested functions serialize by value (with captured
    cells), never by my_feast_spark import — executors only need stdlib
    + pandas, not this package on their PYTHONPATH."""
    magic = MAGIC

    def parse(b: bytes) -> tuple[int, int, int, bytes]:
        if b[:4] != magic:
            raise ValueError("not an MFIM asset (real codecs are stubbed — "
                             "see module docstring)")
        w, h, c = struct.unpack(">III", b[4:16])
        return w, h, c, b[16:]

    return parse


def decode_assets(assets: DataFrame, *, real_codec: bool = False) -> DataFrame:
    """Decode + feature-extract over an asset table via ``mapInPandas``.

    One Arrow batch in → one pandas batch out; no shuffle. Emits typed
    metadata + payload digest per asset. ``real_codec=True`` selects the
    actual image library path, which is NOT AVAILABLE in this container —
    it raises ``NotImplementedError`` (clearly-marked stub; the Spark-side
    plumbing is identical either way).
    """
    if real_codec:
        try:
            import PIL  # noqa: F401
        except ImportError:
            raise NotImplementedError(
                "STUB: real image decode needs Pillow/libvips, not present "
                "in this environment; use the deterministic MFIM fake codec "
                "(real_codec=False) — the Spark plumbing is the same."
            )

    _parse = _make_parser()

    def decode(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for asset_id, kind, content in zip(
                pdf["asset_id"], pdf["kind"], pdf["content"]
            ):
                b = bytes(content)
                w, h, c, payload = _parse(b)
                recs.append((
                    asset_id, kind, w, h, c, len(b),
                    hashlib.md5(payload).hexdigest(),
                ))
            yield pd.DataFrame(
                recs,
                columns=["asset_id", "kind", "width", "height", "channels",
                         "n_bytes", "payload_md5"],
            )

    return assets.mapInPandas(decode, schema=DECODED_SCHEMA)


def resize_images(assets: DataFrame, width: int, height: int) -> DataFrame:
    """Resize every image asset to (width, height) — ``mapInPandas``.

    The fake codec "resizes" by rewriting the header and truncating or
    tiling the payload to width*height bytes: deterministic, preserves the
    batch/schema contract of a real resampler. A real implementation
    swaps only the inner function (PIL/opencv per batch)."""
    target = width * height
    _parse = _make_parser()
    magic = MAGIC

    def resize(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for asset_id, kind, content in zip(
                pdf["asset_id"], pdf["kind"], pdf["content"]
            ):
                b = bytes(content)
                _w, _h, c, payload = _parse(b)
                reps = -(-target // max(len(payload), 1))
                body = (payload * reps)[:target]
                hdr = magic + struct.pack(">III", width, height, c)
                out.append((asset_id, kind, hdr + body))
            yield pd.DataFrame(out, columns=["asset_id", "kind", "content"])

    return assets.mapInPandas(resize, schema=ASSET_SCHEMA)


def sample_frames(
    assets: DataFrame, *, frame_bytes: int = 64, every_k: int = 10
) -> DataFrame:
    """Video frame sampling shape: explode each asset's payload into every
    k-th fixed-size chunk ("frame") — one row per sampled frame.

    Output cardinality grows, so this is a flatMap-shaped ``mapInPandas``;
    at scale, follow with ``repartition`` if downstream stages are
    frame-parallel. Real frame extraction (ffmpeg/pyav) is stubbed by the
    deterministic byte-chunk fake — same schema, same batch contract."""

    _parse = _make_parser()

    def sample(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                b = bytes(content)
                _w, _h, _c, payload = _parse(b)
                n_frames = len(payload) // frame_bytes
                for idx, f_i in enumerate(range(0, n_frames, every_k)):
                    out.append((
                        asset_id, idx,
                        payload[f_i * frame_bytes:(f_i + 1) * frame_bytes],
                    ))
            yield pd.DataFrame(out, columns=["asset_id", "frame_idx", "frame"])

    return assets.mapInPandas(sample, schema=FRAME_SCHEMA)


def _make_dhash():
    """The 72-cell byte-grid dHash reduction as a self-contained closure
    (the ``_make_parser`` pattern — executors never import this
    package): pad to 72 bytes, mean each of 72 equal slices, one bit
    per horizontally-adjacent cell comparison on the 9x8 grid, fold to
    a SIGNED 64-bit int. Shared by ``image_dhash`` and ``frame_dhash``
    so the two tiers can never drift apart; the oracle mirror is
    ``workload._dhash_bits``."""

    def dhash(data: bytes) -> int:
        if len(data) < 72:
            data = data + bytes(72 - len(data))
        n = len(data)
        cells = [
            sum(data[(i * n) // 72:((i + 1) * n) // 72])
            / max(((i + 1) * n) // 72 - (i * n) // 72, 1)
            for i in range(72)
        ]
        bits = 0
        for row in range(8):
            for col in range(8):
                left = cells[row * 9 + col]
                right = cells[row * 9 + col + 1]
                bits = (bits << 1) | (1 if left > right else 0)
        return bits - (1 << 64) if bits >= 1 << 63 else bits

    return dhash


def image_dhash(assets: DataFrame) -> DataFrame:
    """64-bit dHash-style perceptual fingerprint per image asset.

    Real dHash resamples the decoded pixels to a 9x8 grid and emits one
    bit per horizontally-adjacent brightness comparison. With codecs
    stubbed, the fake-codec path applies the SAME reduction to the
    decoded payload byte stream (each of 72 grid cells = the mean of an
    equal byte slice): locality is preserved — a small payload edit
    flips only the grid cells it touches, so near-identical assets land
    within small hamming distance, which is the property the dedup tier
    needs. One Arrow batch in -> (asset_id, dhash) out, map-only.
    """
    _parse = _make_parser()
    _dhash = _make_dhash()

    def fingerprint(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                _w, _h, _c, payload = _parse(bytes(content))
                ids.append(asset_id)
                hashes.append(_dhash(payload))
            yield pd.DataFrame({"asset_id": ids, "dhash": hashes})

    return assets.mapInPandas(
        fingerprint, schema="asset_id long, dhash long"
    )


def image_near_dup_pairs(assets: DataFrame, *, max_hamming: int = 6) -> DataFrame:
    """Perceptual near-duplicate image pairs: dHash fingerprints +
    the dedup tier's pigeonhole hamming join (8 chunks of 8 bits —
    recall exactly 1 up to hamming 7, no cross join). The fingerprint
    relation is 16 bytes/asset and persisted across both join sides;
    released via ``_owned_caches``."""
    from my_feast_spark.operators.dedup import hamming_pairs

    fp = image_dhash(assets).persist()
    pairs = hamming_pairs(
        fp, "asset_id", "dhash", max_hamming=max_hamming, n_chunks=8
    )
    pairs._owned_caches = [fp]
    return pairs


def frame_dhash(frames: DataFrame) -> DataFrame:
    """Per-FRAME 64-bit perceptual hash: the ``image_dhash`` byte-grid
    reduction applied to each sampled frame's bytes — one Arrow pass
    over the (asset_id, frame_idx, frame) relation."""

    _dhash = _make_dhash()

    def fingerprint(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for asset_id, frame_idx, frame in zip(
                pdf["asset_id"], pdf["frame_idx"], pdf["frame"]
            ):
                ids.append(asset_id)
                idxs.append(frame_idx)
                hashes.append(_dhash(bytes(frame)))
            yield pd.DataFrame({
                "asset_id": ids, "frame_idx": idxs, "fh": hashes,
            })

    return frames.mapInPandas(
        fingerprint, schema="asset_id long, frame_idx int, fh long"
    )


def video_near_dup_pairs(
    assets: DataFrame,
    *,
    frame_bytes: int = 64,
    every_k: int = 2,
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    max_bucket: int = 50,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Video near-duplicate pairs — the industry recipe: sample frames,
    perceptual-hash each frame, treat an asset's SET of frame hashes as
    its shingle set, and run MinHash + banded LSH over it with an exact
    frame-set-Jaccard verify. A re-encoded / trimmed copy shares most
    sampled frame hashes, so it collides in some band and survives the
    verify; candidates never come from a cross join.

    ``hash_fn``: "xxhash64" (default; seeded independent hashes as
    expressions — unlike the text MinHash tier this stays affordable
    because the hashed array is the asset's SAMPLED FRAME set, bounded
    at tens of entries, not a document's hundreds of shingles) or
    "portable" (the md5 Carter-Wegman family
    over the frame hashes, same as the text MinHash tier — lets a SQL
    oracle replay the signatures bit-for-bit; band signatures stay
    xxhash64 either way, an injective-up-to-collisions rename of the
    minhash tuples the oracle bands on directly).

    Plan shape mirrors the text MinHash tier: the per-asset frame-hash
    array is one groupBy over the sampled frames (bounded by frames per
    asset), minhashes are ``array_min(transform(...))`` folds — no
    Python past the frame hashing — band buckets are capped, and the
    (array-carrying) relation is persisted across the candidate join's
    two sides and the verify, handed back via ``_owned_caches``.
    Returns (doc_a, doc_b, jaccard).
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    r = num_hashes // bands

    frames = sample_frames(assets, frame_bytes=frame_bytes, every_k=every_k)
    sets = (
        frame_dhash(frames)
        .groupBy("asset_id")
        .agg(F.collect_set("fh").alias("fhs"))
    )
    def _seeded_hasher(seed: int):
        # closure factory: a 2-arg lambda would make transform() bind the
        # second param to the ARRAY INDEX and shadow the seed — the exact
        # pitfall operators/dedup.py::_cw_hasher documents
        return lambda x: F.xxhash64(F.lit(seed), x)

    if hash_fn == "portable":
        from my_feast_spark.operators.dedup import (
            MINHASH_A,
            MINHASH_B,
            _cw_hasher,
            _portable_base,
        )

        if num_hashes > len(MINHASH_A):
            raise ValueError(f"portable family has {len(MINHASH_A)} hashes")
        sets = sets.withColumn(
            "__bases",
            F.transform("fhs", lambda x: _portable_base(x.cast("string"))),
        )
        mh_cols = [
            F.array_min(
                F.transform("__bases", _cw_hasher(MINHASH_A[i], MINHASH_B[i]))
            ).alias(f"mh_{i}")
            for i in range(num_hashes)
        ]
    elif hash_fn == "xxhash64":
        mh_cols = [
            F.array_min(
                F.transform("fhs", _seeded_hasher(i))
            ).alias(f"mh_{i}")
            for i in range(num_hashes)
        ]
    else:
        raise ValueError(f"unknown hash_fn: {hash_fn!r}")

    sigs = sets.select("asset_id", "fhs", *mh_cols).persist()
    sigs.count()  # one frame-hash + signature pass; every consumer reads the cache

    band_rows = sigs.select(
        "asset_id",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(*[
                    F.col(f"mh_{b * r + j}") for j in range(r)
                ]).alias("bsig"),
            )
            for b in range(bands)
        ])).alias("bs"),
    ).select("asset_id", "bs.band", "bs.bsig")
    ok = (
        band_rows.groupBy("band", "bsig")
        .agg(F.count(F.lit(1)).alias("bc"))
        .filter(F.col("bc") <= max_bucket)
        .select("band", "bsig")
    )
    br = band_rows.join(ok, ["band", "bsig"])
    a, b2 = br.alias("a"), br.alias("b")
    cand = (
        a.join(
            b2,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bsig") == F.col("b.bsig"))
            & (F.col("a.asset_id") < F.col("b.asset_id")),
        )
        .select(
            F.col("a.asset_id").alias("doc_a"),
            F.col("b.asset_id").alias("doc_b"),
        )
        .distinct()
    )
    jac = (
        F.size(F.array_intersect(F.col("sa.fhs"), F.col("sb.fhs")))
        / F.size(F.array_union(F.col("sa.fhs"), F.col("sb.fhs")))
    )
    out = (
        cand.join(sigs.select(F.col("asset_id").alias("doc_a"),
                              F.col("fhs")).alias("sa"), "doc_a")
        .join(sigs.select(F.col("asset_id").alias("doc_b"),
                          F.col("fhs")).alias("sb"), "doc_b")
        .select("doc_a", "doc_b", floor_round(jac, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
    out._owned_caches = [sigs]
    return out
