"""Structured Streaming ingest — the reference's capture semantics, Spark-native.

The reference's streaming story (SURVEY §2.9) is: async producer → Event Hub
→ platform capture into Avro files on a 3-minute tumbling window → batch jobs
pick the files up (CASE.MD:98-107; infra/cloud/fs-cloud/ingest_weather_chicago.py:20-55).
Here that whole path is one Structured Streaming pipeline:

    readStream (file source)  →  watermark + tumbling window agg
                              →  writeStream (parquet capture / memory)

Scale notes (1000-executor / 100 TB target):
  * The file source lists incrementally (``maxFilesPerTrigger`` bounds a
    micro-batch); state for windows/dedup lives in the state store, sized by
    ``spark.sql.shuffle.partitions`` — set it to O(executor cores).
  * Watermarks bound state: windows older than (max event time − delay) are
    evicted, so state is O(active windows × keys), not O(history).
  * For big state (sessionization over many users) switch the state store to
    RocksDB: ``spark.sql.streaming.stateStore.providerClass =
    ...RocksDBStateStoreProvider`` — spills to local disk instead of heap.
  * ``Trigger.AvailableNow`` drains the backlog with bounded batches and
    stops — the batch-parity mode used by tests and the oracle comparison.
"""

from __future__ import annotations

import itertools
import os
import tempfile
from typing import Callable, Iterable, Mapping, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from my_feast_spark.functions.scalar import floor_round

_memory_table_ids = itertools.count()


#: layout-contract marker each dedup index carries at its root
_INDEX_META = "_mfs_index_meta.json"


def _legacy_index_layout(fs, jvm, index_path: str):
    """Inspect a pre-marker index's actual on-disk layout. Returns
    ``(has_data, bucketed, max_pbucket)`` aggregated over the index's
    datasets — the known sub-datasets (``bands``/``sigs``,
    ``buckets``/``vecs``) when present, else the root itself (exact
    ingest). Driver-side directory listing only, two levels deep
    (generation dirs + their immediate ``pbucket=`` children) — never
    reads data files."""
    root = jvm.org.apache.hadoop.fs.Path(index_path)
    if not fs.exists(root):
        return False, False, -1
    subs = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if name in ("bands", "sigs", "buckets", "vecs") and st.isDirectory():
            subs.append(st.getPath())
    has_data, bucketed, max_pb = False, False, -1
    for d in subs or [root]:
        for st in fs.listStatus(d):
            if not st.getPath().getName().startswith("batch_id="):
                continue
            has_data = True
            for sub in fs.listStatus(st.getPath()):
                sname = sub.getPath().getName()
                if sname.startswith("pbucket="):
                    bucketed = True
                    max_pb = max(max_pb, int(sname.split("=", 1)[1]))
    return has_data, bucketed, max_pb


def _ensure_index_meta(spark: SparkSession, index_path: str, meta: dict):
    """Pin an index's per-stream-lifetime layout choices (hash family,
    banding config, pbucket count) in a root marker and validate them
    on every stream (re)start. The choices are invisible in the stored
    rows themselves, so without the marker a resumed stream with a
    different config appends incompatible state SILENTLY — e.g. the
    round-15 xxhash64 bit-pattern change, or an ``index_buckets`` flip:
    new signatures simply never collide with old ones and every
    cross-era duplicate is missed with no error (review-caught). A
    mismatch now fails the stream START, loudly, naming the key.

    Written atomically (hidden temp + rename) BEFORE the first batch;
    idempotent across restarts. Pre-marker indexes (built before this
    existed) are LAYOUT-CHECKED against their actual on-disk shape
    before adoption: the bucketed-vs-flat axis and the bucket-count
    lower bound are inferrable from the ``pbucket=`` directory
    structure, so a resume whose ``index_buckets`` contradicts the data
    fails loudly instead of silently never pruning/colliding. Only the
    hash-family/banding axes stay unverifiable for that one legacy
    generation — the adoption warns, names them, and records
    ``legacy_adopted`` in the marker it stamps (round-16; closes the
    r15 "one unverifiable generation" nit as far as the data allows)."""
    import json as _json

    sc = spark.sparkContext
    jvm = sc._jvm
    mp = jvm.org.apache.hadoop.fs.Path(f"{index_path}/{_INDEX_META}")
    fs = mp.getFileSystem(sc._jsc.hadoopConfiguration())
    if fs.exists(mp):
        stream = fs.open(mp)
        try:
            stored = _json.loads(
                bytes(stream.readAllBytes()).decode("utf-8")
            )
        finally:
            stream.close()
        bad = {
            k: (stored.get(k), v)
            for k, v in meta.items()
            if stored.get(k) != v
        }
        if bad:
            raise ValueError(
                f"index at {index_path!r} was built with a different "
                f"layout: {bad} (stored, requested) — these are "
                "per-stream-lifetime choices; rebuild the index or "
                "match the stored config"
            )
        return
    has_data, bucketed, max_pb = _legacy_index_layout(fs, jvm, index_path)
    if has_data:
        # pre-marker index: verify what the directory structure proves
        req = meta.get("index_buckets")
        if bucketed and not req:
            raise ValueError(
                f"index at {index_path!r} (pre-marker) is laid out as "
                "pbucket= partition directories but the resuming stream "
                "requested index_buckets=None — a flat probe against a "
                "bucketed index breaks partition-column inference; pass "
                "the original index_buckets or rebuild the index"
            )
        if req and not bucketed:
            raise ValueError(
                f"index at {index_path!r} (pre-marker) is FLAT but the "
                f"resuming stream requested index_buckets={req} — a "
                "bucketed probe would prune against partition "
                "directories that do not exist and silently miss every "
                "stored row; resume flat or rebuild the index"
            )
        if req and bucketed and max_pb >= req:
            raise ValueError(
                f"index at {index_path!r} (pre-marker) holds "
                f"pbucket={max_pb} but the resuming stream requested "
                f"index_buckets={req} (pbuckets must be < B) — the "
                "bucket counts differ; match the original or rebuild"
            )
        import warnings as _warnings

        _warnings.warn(
            f"adopting pre-marker index at {index_path!r}: the "
            "bucketed-vs-flat layout matches the on-disk structure, "
            "but the hash-family/banding axes of its legacy generation "
            "cannot be verified — a config change across that "
            "generation would not be caught",
            stacklevel=2,
        )
        meta = {**meta, "legacy_adopted": True}
    fs.mkdirs(jvm.org.apache.hadoop.fs.Path(index_path))
    tmp = jvm.org.apache.hadoop.fs.Path(
        f"{index_path}/.{_INDEX_META}.tmp"
    )
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(_json.dumps(meta).encode("utf-8")))
    finally:
        out.close()
    if not fs.rename(tmp, mp):
        # a concurrent starter won the rename: validate against theirs
        fs.delete(tmp, False)
        _ensure_index_meta(spark, index_path, meta)


def _fs_nonempty(spark: SparkSession, path: str) -> bool:
    """True when ``path`` exists and holds at least one non-hidden
    entry, probed through Spark's Hadoop FileSystem — so ``s3a://``,
    ``hdfs://`` and ``file://`` index locations all answer correctly.
    (``os.path`` sees only the driver's local filesystem: for a cloud
    ``index_path`` it is always False, silently disabling cross-batch
    dedup instead of erroring.)"""
    sc = spark.sparkContext
    hpath = sc._jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(sc._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return False
    for status in fs.listStatus(hpath):
        name = status.getPath().getName()
        if not name.startswith((".", "_")):
            return True
    return False


def read_event_stream(
    spark: SparkSession,
    path: str,
    *,
    fmt: str = "parquet",
    schema: T.StructType | str | None = None,
    path_glob: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source ``readStream`` (the capture-directory consumer, S11).

    Streaming file sources require an explicit schema; when ``schema`` is
    None it is inferred from a one-off batch read of the same path (driver-
    side metadata only). ``max_files_per_trigger`` bounds micro-batch size —
    the knob that keeps a 100 TB backlog from becoming one giant batch.
    """
    reader = spark.readStream.format(fmt)
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    if schema is None:
        batch = spark.read.format(fmt)
        if path_glob:
            batch = batch.option("pathGlobFilter", path_glob)
        schema = batch.load(path).schema
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.schema(schema).load(path)


def tumbling_window_agg(
    sdf: DataFrame,
    ts_col: str,
    window_duration: str,
    group_cols: Sequence[str],
    aggs: Sequence[Column],
    *,
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Watermarked tumbling-window aggregation — the 3-minute-capture /
    hourly-gold semantics (CASE.MD:107; chicago_weather_hourly_fs.py:38-43)
    as one streaming operator.

    Watermark bounds state and admits late rows up to ``watermark_delay``;
    the window struct is flattened to ``bucket_ts`` (window start) so the
    output schema matches the batch gold tables.
    """
    return (
        sdf.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(F.col(ts_col), window_duration), *group_cols)
        .agg(*aggs)
        .withColumn("bucket_ts", F.col("window.start"))
        .drop("window")
    )


def streaming_dedup(
    sdf: DataFrame,
    keys: Sequence[str],
    *,
    ts_col: str | None = None,
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Streaming duplicate elimination (the reference defers this to batch
    PIT dedup — SURVEY §2.9; here it is available at ingest time too).

    With ``ts_col`` set, the watermark bounds dedup state: keys older than
    the watermark are evicted, so state does not grow with the full history.
    """
    if ts_col is not None:
        sdf = sdf.withWatermark(ts_col, watermark_delay)
        return sdf.dropDuplicates([*keys, ts_col])
    return sdf.dropDuplicates(list(keys))


# --------------------------------------------------------------------------
# Custom stateful operator: gap-based sessionization (applyInPandasWithState)
# --------------------------------------------------------------------------

SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start", T.TimestampType()),
    T.StructField("session_end", T.TimestampType()),
    T.StructField("n_events", T.LongType()),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("start_us", T.LongType()),
    T.StructField("last_us", T.LongType()),
    T.StructField("n", T.LongType()),
])


def _session_fn(gap_us: int, timeout_close: bool) -> Callable:
    def fn(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        import numpy as np

        (user_id,) = key
        # vectorized: gather the whole group's batch, sort ONCE across all
        # Arrow chunks (per-chunk order is not globally sorted), then find
        # session breaks with a single diff — no per-row Python loop
        chunks = [
            pdf["ts"].to_numpy().astype("datetime64[us]").astype("int64")
            for pdf in pdfs
        ]
        ts = (
            np.sort(np.concatenate(chunks))
            if chunks
            else np.empty(0, dtype="int64")
        )
        carry = tuple(state.get) if state.exists else None
        closed: list[tuple] = []
        if ts.size:
            breaks = np.nonzero(np.diff(ts) > gap_us)[0]
            segs = np.split(ts, breaks + 1)
            sessions = [(int(s[0]), int(s[-1]), int(s.size)) for s in segs]
            if carry is not None:
                c_start, c_last, c_n = carry
                if sessions[0][0] - c_last <= gap_us:
                    s0 = sessions[0]
                    sessions[0] = (c_start, s0[1], c_n + s0[2])
                else:
                    closed.append((c_start, c_last, c_n))
            closed.extend(sessions[:-1])
            carry = sessions[-1]
        if state.hasTimedOut or carry is None:
            if carry is not None:
                closed.append(carry)
                carry = None
            state.remove()
        else:
            state.update(carry)
            if timeout_close:
                state.setTimeoutDuration(gap_us // 1_000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": pd.to_datetime([c[0] for c in closed], unit="us"),
                    "session_end": pd.to_datetime([c[1] for c in closed], unit="us"),
                    "n_events": [c[2] for c in closed],
                }
            )

    return fn


def sessionize(
    events: DataFrame,
    *,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    timeout_close: bool = False,
) -> DataFrame:
    """Gap-based sessionization as a custom stateful streaming operator
    (``applyInPandasWithState``) — the §2.9 extension the reference lacks.

    Groups events per user; a session closes after ``gap_minutes`` of
    event-time inactivity. Output: one row per CLOSED session. State per
    user is three longs — O(active users), independent of history length.

    ``timeout_close=True`` additionally closes idle sessions via a
    processing-time timeout — the long-running-deployment mode. Leave it
    False for drain-and-stop runs (Trigger.AvailableNow): with a timeout
    registered, the query keeps scheduling empty micro-batches waiting for
    wall-clock timeouts and never terminates.
    """
    gap_us = gap_minutes * 60 * 1_000_000
    sel = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).cast("timestamp").alias("ts"),
    )
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_close
        else GroupStateTimeout.NoTimeout
    )
    return sel.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_us, timeout_close),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout_conf,
    )


# --------------------------------------------------------------------------
# Sinks / runners
# --------------------------------------------------------------------------

def capture_to_parquet(
    sdf: DataFrame,
    path: str,
    checkpoint: str,
    *,
    trigger_interval: str | None = "3 minutes",
    available_now: bool = False,
    partition_by: Sequence[str] = (),
):
    """The capture sink: micro-batched parquet files, tumbling trigger —
    Spark-native equivalent of Event Hub Capture's 3-minute Avro windows
    (CASE.MD:107). Returns the started StreamingQuery."""
    writer = (
        sdf.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_interval:
        writer = writer.trigger(processingTime=trigger_interval)
    return writer.start()


def run_to_memory_table(
    sdf: DataFrame,
    spark: SparkSession,
    *,
    output_mode: str = "complete",
    timeout_sec: int = 300,
) -> DataFrame:
    """Drain a streaming DataFrame with ``Trigger.AvailableNow`` into an
    in-memory table and return it as a batch DataFrame — the batch-parity
    runner used by tests and the DuckDB oracle comparison."""
    name = f"mfs_stream_{next(_memory_table_ids)}"
    # the memory sink's checkpoint is throwaway — clean it up at exit so
    # repeated bench/test sessions don't accumulate /tmp state
    import atexit
    import shutil

    ckpt = tempfile.mkdtemp(prefix="mfs_ckpt_")
    atexit.register(shutil.rmtree, ckpt, ignore_errors=True)
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", os.path.join(ckpt, name))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        q.stop()
    return spark.table(name)


def dedup_ingest_stream(
    sdf: DataFrame,
    *,
    out_path: str,
    index_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    index_buckets: int | None = None,
    compact_every: int | None = None,
    available_now: bool = False,
    trigger_interval: str | None = None,
):
    """Continuously ingest documents with exact dedup against everything
    already accepted — the streaming form of the incremental-ingest
    anti-join (workload.q_incremental_dedup): each micro-batch keeps the
    min-id document per content fingerprint, drops fingerprints the
    accumulated index has seen, appends survivors to ``out_path`` and
    their fingerprints to ``index_path``.

    Crash safety: ``foreachBatch`` replays a batch after failure
    (at-least-once), so both sinks write to a ``batch_id=N``
    subdirectory with ``overwrite`` — a replay rewrites the same
    partition instead of appending duplicates, making the ingest
    effectively exactly-once.

    Scale shape — ``index_buckets``. Unset, every micro-batch scans the
    FULL accumulated fingerprint index: per-batch cost grows linearly
    with the corpus, O(N²) over the stream's life. With
    ``index_buckets=B`` each batch's index partition is additionally
    laid out as ``pbucket=pmod(xxhash64(fingerprint), B)`` partition
    directories, and the probe reads ONLY the pbuckets its own
    fingerprints hash into (a directory-level partition-pruned scan —
    the listing never touches the other buckets). A batch of ``b``
    distinct fingerprints therefore reads at most ``min(b, B)/B`` of
    the index regardless of corpus size; size B so a single bucket
    stays a few hundred MB at the target corpus. The anti-join itself
    broadcasts the (small) batch side under AQE either way, so there is
    never an Exchange on the index side.

    The layout choice is PER STREAM LIFETIME: flipping ``index_buckets``
    between runs over the same ``index_path`` mixes partitioned and
    flat batch directories and breaks partition-column inference —
    pick it at first start (or rewrite the index).

    ``compact_every=k`` runs :func:`compact_index` on the foreachBatch
    thread after every k-th batch, consolidating all generations BEFORE
    the current batch — the per-batch directory-listing cost and
    small-file count stay bounded over the stream's lifetime instead of
    growing one directory per batch. Returns the started StreamingQuery.
    """
    from my_feast_spark.functions.text import doc_fingerprint

    spark = sdf.sparkSession
    _ensure_index_meta(spark, index_path, {
        "kind": "exact_fingerprint",
        "index_buckets": index_buckets,
    })

    def ingest_batch(batch_df: DataFrame, batch_id: int) -> None:
        import os

        fp = batch_df.select(
            F.col(id_col), F.col(text_col),
            doc_fingerprint(F.col(text_col)).alias("fingerprint"),
        )
        # in-batch dedup: deterministic min-id winner per fingerprint
        w = Window.partitionBy("fingerprint").orderBy(id_col)
        fresh = (
            fp.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        pbucket = F.pmod(F.xxhash64("fingerprint"), F.lit(index_buckets or 1))
        if _fs_nonempty(spark, index_path):
            # EXCLUDE this batch's own partition: after a crash between
            # the sink writes and the streaming commit, foreachBatch
            # replays the batch — anti-joining it against its own
            # already-written fingerprints would empty `fresh` and the
            # overwrite below would destroy the batch's good output
            seen = (
                spark.read.parquet(index_path)
                .filter(F.col("batch_id") != batch_id)
            )
            if index_buckets:
                # one tiny job: the batch's own pbucket set (≤ min(b, B)
                # values) becomes a partition filter — the index scan
                # lists/reads ONLY those directories
                pbs = [
                    r.pb
                    for r in fresh.select(pbucket.alias("pb"))
                    .distinct()
                    .collect()
                ]
                seen = seen.filter(F.col("pbucket").isin(pbs))
            fresh = fresh.join(
                seen.select("fingerprint"), "fingerprint", "left_anti"
            )
        # idempotent per-batch partition: a replayed batch overwrites
        # its own directory instead of double-appending
        fresh.write.mode("overwrite").parquet(
            os.path.join(out_path, f"batch_id={batch_id}")
        )
        index_rows = spark.read.parquet(
            os.path.join(out_path, f"batch_id={batch_id}")
        ).select("fingerprint")
        index_writer = index_rows.write.mode("overwrite")
        if index_buckets:
            index_writer = index_rows.withColumn(
                "pbucket", pbucket
            ).repartition("pbucket").write.mode("overwrite").partitionBy(
                "pbucket"
            )
        index_writer.parquet(os.path.join(index_path, f"batch_id={batch_id}"))
        # in-stream index maintenance: consolidate everything BEFORE
        # this batch (never the batch itself — its own partition must
        # survive separately for the crash-replay guard above); runs on
        # the foreachBatch thread, so no compactor ever races a batch
        if compact_every and batch_id % compact_every == compact_every - 1:
            compact_index(spark, index_path, exclude_from=batch_id)

    writer = (
        sdf.writeStream.foreachBatch(ingest_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_interval:
        writer = writer.trigger(processingTime=trigger_interval)
    return writer.start()


def near_dedup_ingest_stream(
    sdf: DataFrame,
    *,
    out_path: str,
    index_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    hash_fn: str = "xxhash64",
    index_buckets: int | None = None,
    compact_every: int | None = None,
    available_now: bool = False,
    trigger_interval: str | None = None,
):
    """Streaming NEAR-duplicate ingest — the MinHash twin of
    ``dedup_ingest_stream``: each micro-batch signs its documents,
    collides their LSH band buckets against the accumulated signature
    index, and drops every doc whose signature-estimated Jaccard
    (fraction of equal minhashes — the standard streaming-side verify;
    exact shingle verification would mean storing shingle sets) against
    an already-accepted doc, or a lower-id doc of its own batch, reaches
    ``threshold``. In-batch policy is pairwise-greedy like
    ``similarity.semdedup`` — a doc dominated only by an itself-dropped
    doc still drops, the conservative (over-drop, never under) direction
    for dedup.

    Index layout under ``index_path``: ``bands/batch_id=N`` holds
    (doc, band, bsig) collision rows, ``sigs/batch_id=N`` the (doc, sig
    array) signatures — both derive from the WRITTEN accepted output of
    their batch, so a crash replay regenerates identical partitions
    (same idempotent ``batch_id=N`` overwrite contract as the exact
    ingest; the probe goes through the Hadoop FileSystem so cloud paths
    work). Short docs (< n tokens) have no shingles, can't collide, and
    are accepted unconditionally.

    Scale shape — ``index_buckets``. Unset, each micro-batch scans the
    FULL accumulated band index (and the signatures of every candidate
    dominator): per-batch cost grows linearly with the corpus. With
    ``index_buckets=B`` both index relations gain a partition directory
    ``pbucket`` — ``pmod(xxhash64(band, bsig), B)`` for band rows,
    ``pmod(xxhash64(doc), B)`` for signatures — and each batch reads
    ONLY the pbuckets its own band rows / candidate dominators hash
    into, a directory-level partition-pruned scan bounded by
    ``min(batch collisions, B)/B`` of the index regardless of corpus
    size. The collision join itself broadcasts the batch side under AQE
    either way (no Exchange on the index side); like the exact ingest,
    the layout choice is per stream lifetime — don't flip
    ``index_buckets`` over an existing index. Docs per batch x bands
    rows shuffle, never the text. Band signatures are xxhash64 over the
    band's minhashes regardless of ``hash_fn`` (the index is
    engine-internal; pick hash_fn="portable" only if the SIGNATURES
    must replay elsewhere). The stored signatures are hash_fn-family-
    specific: ``hash_fn`` is a per-stream-lifetime choice like
    ``index_buckets``, and the round-15 reroute of "xxhash64" through
    the Arrow fan-out changed that family's bit patterns — an index
    persisted by a pre-round-15 build must be rebuilt (or the stream
    pinned to hash_fn="xxhash64_expr") before appending to it.
    Returns the started StreamingQuery.
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    r = num_hashes // bands
    from my_feast_spark.operators.dedup import minhash_signature_array
    from my_feast_spark.operators.graph import release_checkpoint

    spark = sdf.sparkSession
    _ensure_index_meta(spark, index_path, {
        "kind": "neardup_minhash",
        # "numpy" is an alias of "xxhash64" (same fan-out family)
        "hash_fn": "xxhash64" if hash_fn == "numpy" else hash_fn,
        "num_hashes": num_hashes,
        "bands": bands,
        "n": n,
        "index_buckets": index_buckets,
    })
    bands_dir = os.path.join(index_path, "bands")
    sigs_dir = os.path.join(index_path, "sigs")

    def ingest_batch(batch_df: DataFrame, batch_id: int) -> None:
        # one signature pass, pinned for its many consumers (band build,
        # both verify sides, the index write), released before returning;
        # `live` tracks every checkpoint the batch pins (the candidate
        # relation joins it under index_buckets) so an exception can't
        # leak blocks for the stream's lifetime
        # array-native signatures (r16): the index stores the array
        # anyway — consuming it directly drops the 64-column fan-out +
        # re-assembly from every per-batch plan (values bit-identical,
        # so existing persisted indexes stay valid)
        sig = minhash_signature_array(
            batch_df, id_col, text_col, n=n, num_hashes=num_hashes,
            hash_fn=hash_fn,
        ).select("doc", F.col("__sig").alias("sig")).localCheckpoint()
        live = [sig]
        try:
            band_rows = sig.select(
                "doc",
                F.explode(F.array(*[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(*[
                            F.element_at(F.col("sig"), b * r + j + 1)
                            for j in range(r)
                        ]).alias("bsig"),
                    )
                    for b in range(bands)
                ])).alias("bs"),
            ).select("doc", "bs.band", "bs.bsig")

            band_pb = F.pmod(
                F.xxhash64("band", "bsig"), F.lit(index_buckets or 1)
            )
            doc_pb = F.pmod(F.xxhash64("doc"), F.lit(index_buckets or 1))

            # in-batch candidates: same bucket, lower id dominates
            a, b2 = band_rows.alias("a"), band_rows.alias("b")
            cand = (
                a.join(
                    b2,
                    (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.bsig") == F.col("b.bsig"))
                    & (F.col("a.doc") < F.col("b.doc")),
                )
                .select(F.col("a.doc").alias("dom"), F.col("b.doc").alias("doc"))
            )
            all_sigs = sig
            # cross-batch candidates: collide against the accumulated
            # index, EXCLUDING this batch's own partitions (crash-replay
            # safety — see dedup_ingest_stream)
            if _fs_nonempty(spark, bands_dir):
                old_bands = spark.read.parquet(bands_dir).filter(
                    F.col("batch_id") != batch_id
                )
                if index_buckets:
                    # partition-prune the band index to the buckets this
                    # batch's own band rows hash into (one tiny job over
                    # the checkpointed signatures)
                    pbs = [
                        r.pb
                        for r in band_rows.select(band_pb.alias("pb"))
                        .distinct()
                        .collect()
                    ]
                    old_bands = old_bands.filter(F.col("pbucket").isin(pbs))
                cand = cand.union(
                    old_bands.select(F.col("doc").alias("dom"), "band", "bsig")
                    .join(band_rows, ["band", "bsig"])
                    .select("dom", "doc")
                )
                old_sigs = spark.read.parquet(sigs_dir).filter(
                    F.col("batch_id") != batch_id
                )
                cand = cand.distinct()
                if index_buckets:
                    # the signature store only needs the DOMINATOR rows:
                    # pin the (batch-collision-sized) candidate relation
                    # and prune sig partitions to the dominators' buckets
                    cand = cand.localCheckpoint()
                    live.append(cand)
                    dom_pbs = [
                        r.pb
                        for r in cand.select(
                            F.pmod(
                                F.xxhash64("dom"), F.lit(index_buckets)
                            ).alias("pb")
                        )
                        .distinct()
                        .collect()
                    ]
                    old_sigs = old_sigs.filter(F.col("pbucket").isin(dom_pbs))
                all_sigs = sig.union(old_sigs.select("doc", "sig"))
            else:
                cand = cand.distinct()
            # HOF fold, deliberately: the 64-term unroll measured ~5x
            # SLOWER (0.70s fold vs 3.43s unrolled on 400k pairs — see
            # similarity._dot_fixed's r17 contrast note; the fold's
            # single ArrayData traversal beats 64 GetArrayItem nodes)
            est_j = F.aggregate(
                F.zip_with(
                    F.col("a_sig"), F.col("b_sig"),
                    lambda x, y: (x == y).cast("int"),
                ),
                F.lit(0),
                lambda acc, x: acc + x,
            ) / F.lit(num_hashes)
            dominated = (
                cand
                .join(all_sigs.select(F.col("doc").alias("dom"),
                                      F.col("sig").alias("a_sig")), "dom")
                .join(sig.select("doc", F.col("sig").alias("b_sig")), "doc")
                .filter(est_j >= threshold)
                .select(F.col("doc").alias(id_col))
                .distinct()
            )
            accepted = batch_df.join(dominated, id_col, "left_anti")
            accepted.write.mode("overwrite").parquet(
                os.path.join(out_path, f"batch_id={batch_id}")
            )
            # index entries derive from the WRITTEN output (replay-safe)
            acc_ids = spark.read.parquet(
                os.path.join(out_path, f"batch_id={batch_id}")
            ).select(F.col(id_col).alias("doc"))
            new_sigs = sig.join(acc_ids, "doc", "left_semi")
            new_bands = band_rows.join(acc_ids, "doc", "left_semi")
            if index_buckets:
                new_sigs.withColumn("pbucket", doc_pb).repartition(
                    "pbucket"
                ).write.mode("overwrite").partitionBy("pbucket").parquet(
                    os.path.join(sigs_dir, f"batch_id={batch_id}")
                )
                new_bands.withColumn("pbucket", band_pb).repartition(
                    "pbucket"
                ).write.mode("overwrite").partitionBy("pbucket").parquet(
                    os.path.join(bands_dir, f"batch_id={batch_id}")
                )
            else:
                new_sigs.write.mode("overwrite").parquet(
                    os.path.join(sigs_dir, f"batch_id={batch_id}")
                )
                new_bands.write.mode("overwrite").parquet(
                    os.path.join(bands_dir, f"batch_id={batch_id}")
                )
            # in-stream maintenance: consolidate generations BEFORE
            # this batch (its own partitions must survive separately
            # for the crash-replay guard)
            if compact_every and batch_id % compact_every == compact_every - 1:
                compact_index(spark, sigs_dir, exclude_from=batch_id)
                compact_index(spark, bands_dir, exclude_from=batch_id)
        finally:
            for frame in live:
                release_checkpoint(frame)

    writer = (
        sdf.writeStream.foreachBatch(ingest_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_interval:
        writer = writer.trigger(processingTime=trigger_interval)
    return writer.start()


def embedding_dedup_ingest_stream(
    sdf: DataFrame,
    *,
    out_path: str,
    index_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    num_planes: int = 4,
    num_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
    index_buckets: int | None = None,
    compact_every: int | None = None,
    available_now: bool = False,
    trigger_interval: str | None = None,
):
    """Streaming SEMANTIC near-dup ingest — the embedding twin of
    ``near_dedup_ingest_stream``: each micro-batch hyperplane-LSH
    buckets its (normalized) embeddings across ``num_tables``
    independent ``num_planes``-bit sign tables, collides them against
    the accumulated bucket index, and drops every doc whose exact
    cosine against an already-accepted doc, or a lower-id doc of its
    own batch, reaches ``threshold`` (precision 1 — LSH only generates
    candidates; the verify is the true cosine over the stored vectors).
    In-batch policy is pairwise-greedy like the MinHash ingest.

    Index layout under ``index_path``: ``buckets/batch_id=N`` holds the
    (doc, table, bucket) collision rows, ``vecs/batch_id=N`` the
    accepted (doc, v) normalized vectors the verify reads — both
    derived from the WRITTEN accepted output of their batch (same
    idempotent ``batch_id=N`` overwrite / crash-replay contract as the
    exact and MinHash ingests). ``index_buckets=B`` adds the pbucket
    partition layout — ``pmod(xxhash64(table, bucket), B)`` for bucket
    rows, ``pmod(xxhash64(doc), B)`` for vectors — so each batch reads
    only the directories its own collisions hash into (a per-stream-
    lifetime layout choice, as with the other ingests). Returns the
    started StreamingQuery.
    """
    from my_feast_spark.operators.similarity import (
        _dot,
        _hyperplanes,
        _lsh_buckets_udf,
    )

    spark = sdf.sparkSession
    _ensure_index_meta(spark, index_path, {
        "kind": "embedding_lsh",
        "num_planes": num_planes,
        "num_tables": num_tables,
        "dim": dim,
        "seed": seed,
        "index_buckets": index_buckets,
    })
    buckets_dir = os.path.join(index_path, "buckets")
    vecs_dir = os.path.join(index_path, "vecs")
    planes = [
        _hyperplanes(dim, num_planes, seed + t) for t in range(num_tables)
    ]

    def ingest_batch(batch_df: DataFrame, batch_id: int) -> None:
        bucket_udf = _lsh_buckets_udf(planes)
        # one normalize+bucket pass, pinned for its many consumers
        # (collision build, both verify sides, both index writes)
        v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
        norm = F.sqrt(F.aggregate(
            F.transform(v, lambda x: x * x), F.lit(0.0),
            lambda acc, x: acc + x,
        ))
        base = batch_df.select(
            F.col(id_col).alias("doc"),
            F.transform(v, lambda x: x / F.greatest(norm, F.lit(1e-12)))
            .alias("v"),
        ).withColumn(
            "bks", bucket_udf(F.col("v"))
        ).localCheckpoint()
        live = [base]
        try:
            bucket_rows = base.select(
                "doc", F.posexplode(F.col("bks")).alias("table", "bucket")
            )
            bpb = F.pmod(
                F.xxhash64("table", "bucket"), F.lit(index_buckets or 1)
            )
            dpb = F.pmod(F.xxhash64("doc"), F.lit(index_buckets or 1))

            a, b2 = bucket_rows.alias("a"), bucket_rows.alias("b")
            cand = (
                a.join(
                    b2,
                    (F.col("a.table") == F.col("b.table"))
                    & (F.col("a.bucket") == F.col("b.bucket"))
                    & (F.col("a.doc") < F.col("b.doc")),
                )
                .select(F.col("a.doc").alias("dom"), F.col("b.doc").alias("doc"))
            )
            all_vecs = base.select("doc", "v")
            if _fs_nonempty(spark, buckets_dir):
                old_buckets = spark.read.parquet(buckets_dir).filter(
                    F.col("batch_id") != batch_id
                )
                if index_buckets:
                    pbs = [
                        r.pb
                        for r in bucket_rows.select(bpb.alias("pb"))
                        .distinct()
                        .collect()
                    ]
                    old_buckets = old_buckets.filter(
                        F.col("pbucket").isin(pbs)
                    )
                cand = cand.union(
                    old_buckets.select(
                        F.col("doc").alias("dom"), "table", "bucket"
                    )
                    .join(bucket_rows, ["table", "bucket"])
                    .select("dom", "doc")
                )
                old_vecs = spark.read.parquet(vecs_dir).filter(
                    F.col("batch_id") != batch_id
                )
                cand = cand.distinct()
                if index_buckets:
                    cand = cand.localCheckpoint()
                    live.append(cand)
                    dom_pbs = [
                        r.pb
                        for r in cand.select(
                            F.pmod(
                                F.xxhash64("dom"), F.lit(index_buckets)
                            ).alias("pb")
                        )
                        .distinct()
                        .collect()
                    ]
                    old_vecs = old_vecs.filter(F.col("pbucket").isin(dom_pbs))
                all_vecs = all_vecs.union(old_vecs.select("doc", "v"))
            else:
                cand = cand.distinct()
            dominated = (
                cand
                .join(all_vecs.select(F.col("doc").alias("dom"),
                                      F.col("v").alias("a_v")), "dom")
                .join(base.select("doc", F.col("v").alias("b_v")), "doc")
                .filter(
                    # HOF fold, deliberately: the dim=64 unroll measured
                    # 3x SLOWER per pair (similarity._dot_fixed's r17
                    # contrast note)
                    floor_round(_dot(F.col("a_v"), F.col("b_v")), 6)
                    >= F.lit(threshold)
                )
                .select(F.col("doc").alias(id_col))
                .distinct()
            )
            accepted = batch_df.join(dominated, id_col, "left_anti")
            accepted.write.mode("overwrite").parquet(
                os.path.join(out_path, f"batch_id={batch_id}")
            )
            # index entries derive from the WRITTEN output (replay-safe)
            acc_ids = spark.read.parquet(
                os.path.join(out_path, f"batch_id={batch_id}")
            ).select(F.col(id_col).alias("doc"))
            new_vecs = base.select("doc", "v").join(acc_ids, "doc", "left_semi")
            new_buckets = bucket_rows.join(acc_ids, "doc", "left_semi")
            if index_buckets:
                new_vecs.withColumn("pbucket", dpb).repartition(
                    "pbucket"
                ).write.mode("overwrite").partitionBy("pbucket").parquet(
                    os.path.join(vecs_dir, f"batch_id={batch_id}")
                )
                new_buckets.withColumn("pbucket", bpb).repartition(
                    "pbucket"
                ).write.mode("overwrite").partitionBy("pbucket").parquet(
                    os.path.join(buckets_dir, f"batch_id={batch_id}")
                )
            else:
                new_vecs.write.mode("overwrite").parquet(
                    os.path.join(vecs_dir, f"batch_id={batch_id}")
                )
                new_buckets.write.mode("overwrite").parquet(
                    os.path.join(buckets_dir, f"batch_id={batch_id}")
                )
            # in-stream maintenance (see dedup_ingest_stream)
            if compact_every and batch_id % compact_every == compact_every - 1:
                compact_index(spark, vecs_dir, exclude_from=batch_id)
                compact_index(spark, buckets_dir, exclude_from=batch_id)
        finally:
            from my_feast_spark.operators.graph import release_checkpoint

            for frame in live:
                release_checkpoint(frame)

    writer = (
        sdf.writeStream.foreachBatch(ingest_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_interval:
        writer = writer.trigger(processingTime=trigger_interval)
    return writer.start()


def compact_index(
    spark: SparkSession, index_dir: str, *, exclude_from: int | None = None
) -> dict:
    """Consolidate an ingest index's per-batch partitions into ONE
    generation directory — the maintenance op for the one unbounded
    cost the streaming ingests carry: every micro-batch appends a
    ``batch_id=N`` directory forever, so while the DATA each batch
    reads stays pruned (pbucket partition filters), the directory
    LISTING per batch and the small-file count grow linearly with
    stream lifetime (~175k dirs/year at a 3-minute trigger).

    Mechanics: the rows of EVERY mergeable generation — live
    non-negative batch dirs AND previously-compacted negative ones —
    are rewritten (dropDuplicates — set semantics hold for all three
    ingest index kinds) into a FRESH generation
    ``batch_id = min(mergeable ∪ {0}) - 1``, strictly below every id
    that exists; the source directories are then deleted. The fresh
    negative generation id keeps every ingest invariant intact:

      * the replay guard ``batch_id != current`` never matches a
        compacted generation (live ids are non-negative);
      * the target NEVER pre-exists, so the consolidated write is never
        an overwrite of a directory it also reads — and, crucially, the
        merge input always INCLUDES every earlier compacted generation,
        so no interruption point can strand rows in a directory the
        next run replaces without reading (the round-10 data-loss
        corner: a crash after deleting all live sources left only
        negative generations, and the old ``target = min(mergeable)``
        scheme overwrote the newest superset with its older subset);
      * a crash ANYWHERE between the consolidated write and the last
        source delete leaves rows duplicated across generations —
        harmless to the dedup semantics (anti-joins and candidate
        generation are set-shaped) and fully healed by re-running
        compact_index, which merges the leftover generations (superset
        included) into the next fresh id. Healing is idempotent in
        content; generation ids decrease by one per run (64-bit — no
        practical exhaustion).

    Run it from a maintenance schedule (e.g. every k-th batch or daily)
    against each index dataset — the exact ingest's ``index_path``
    itself; ``bands/`` + ``sigs/`` for the MinHash ingest; ``buckets/``
    + ``vecs/`` for the embedding ingest (see
    :func:`compact_ingest_indexes`). Concurrency: schedule it BETWEEN
    micro-batches (e.g. from the same foreachBatch driver every k
    batches) — it rewrites history while a live batch may be appending
    its own new ``batch_id=N``, which compaction never touches (ids >
    the observed high-water are excluded), but two compactors racing
    the same dataset would double-delete.

    ``exclude_from`` (the in-stream auto-compaction path — the ingests'
    ``compact_every``) leaves every generation with ``batch_id >=
    exclude_from`` untouched: folding the CURRENT batch's rows into a
    negative generation would defeat the crash-replay guard
    (``batch_id != current`` no longer excludes them, so a replayed
    batch would anti-join against its own output and destroy it).

    Returns stats: ``{"generations_before", "files_before",
    "generation", "rows", "files_after"}``; a no-op (0 or 1 mergeable
    generation) returns early with ``generation=None``.
    """
    sc = spark.sparkContext
    jvm = sc._jvm
    root = jvm.org.apache.hadoop.fs.Path(index_dir)
    fs = root.getFileSystem(sc._jsc.hadoopConfiguration())
    if not fs.exists(root):
        return {"generations_before": 0, "files_before": 0,
                "generation": None, "rows": 0, "files_after": 0}

    def _gen_ids():
        ids = []
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if name.startswith("batch_id="):
                ids.append(int(name.split("=", 1)[1]))
        return ids

    def _count_files():
        n = 0
        it = fs.listFiles(root, True)
        while it.hasNext():
            f = it.next()
            if not f.getPath().getName().startswith((".", "_")):
                n += 1
        return n

    ids = _gen_ids()
    files_before = _count_files()
    mergeable = [
        i for i in ids if exclude_from is None or i < exclude_from
    ]
    if len(mergeable) <= 1:
        return {"generations_before": len(ids),
                "files_before": files_before, "generation": None,
                "rows": 0, "files_after": files_before}
    # Fresh target strictly below every existing generation: the write
    # never overwrites a directory it reads, and the merge input is ALL
    # mergeable generations — including an earlier compaction's output —
    # so no crash/restart interleaving can drop index rows.
    target = min(mergeable + [0]) - 1
    sources = mergeable

    df = spark.read.parquet(index_dir)
    merged = df.filter(
        F.col("batch_id").isin(sources)
    ).drop("batch_id").dropDuplicates()
    out = os.path.join(index_dir, f"batch_id={target}")
    # preserve whichever bucket partitioning the dataset carries so
    # partition pruning keeps working after compaction: "pbucket" for
    # the ingest indexes, "__kb" for the streaming-SCD2 event log
    part_col = next(
        (c for c in ("pbucket", "__kb") if c in merged.columns), None
    )
    if part_col:
        merged.repartition(part_col).write.mode("overwrite").partitionBy(
            part_col
        ).parquet(out)
    else:
        merged.coalesce(1).write.mode("overwrite").parquet(out)
    rows = spark.read.parquet(out).count()
    for i in sources:
        fs.delete(
            jvm.org.apache.hadoop.fs.Path(
                os.path.join(index_dir, f"batch_id={i}")
            ),
            True,
        )
    return {"generations_before": len(ids), "files_before": files_before,
            "generation": target, "rows": rows,
            "files_after": _count_files()}


def compact_ingest_indexes(spark: SparkSession, index_path: str) -> dict:
    """Compact every index dataset under an ingest's ``index_path``:
    the known sub-datasets (``bands``/``sigs`` — MinHash ingest;
    ``buckets``/``vecs`` — embedding ingest) when present, else the
    path itself (exact ingest). Returns {dataset: compact_index stats}.
    """
    sc = spark.sparkContext
    jvm = sc._jvm
    root = jvm.org.apache.hadoop.fs.Path(index_path)
    fs = root.getFileSystem(sc._jsc.hadoopConfiguration())
    subs = []
    if fs.exists(root):
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if name in ("bands", "sigs", "buckets", "vecs"):
                subs.append(name)
    if not subs:
        return {".": compact_index(spark, index_path)}
    return {
        s: compact_index(spark, os.path.join(index_path, s)) for s in subs
    }
