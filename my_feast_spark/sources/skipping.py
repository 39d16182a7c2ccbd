"""File-level statistics skipping for plain parquet tables.

Delta/Iceberg keep per-file column min/max in the table log and prune
the FILE LIST at planning time; plain parquet has only per-row-group
footer statistics, which Spark consults AFTER listing and opening every
file. At 100 TB (~1e6 files) that listing + footer-open cost dominates
selective queries. This module is the missing layer for the plain-
parquet tables this engine manages: ``write_file_stats`` collects each
data file's per-column (min, max, null_count) into ONE underscore-
prefixed sidecar (ignored by parquet scans, same convention as the
online store's ``_mfs_online_meta.json``), and ``scan_with_skipping``
prunes the file list against range predicates BEFORE ``spark.read`` —
the scan then never lists, opens, or schedules the skipped files.

Pairs with `sources/zorder.py`: a z-ordered rewrite tiles the key space
across files, so file-level boxes are tight and range predicates on any
clustered column skip most of the table; on a naturally-ordered table
only the ingest-order column skips well (exactly Delta's behavior).

Honest semantics, documented not hidden:

* the sidecar is a SNAPSHOT — appends after ``write_file_stats``
  invalidate it. ``scan_with_skipping`` fails loudly when the directory
  holds data files the sidecar does not know (never silently drops
  unknown files); re-run ``write_file_stats`` after layout changes
  (compact_table / zorder_table / appends).
* pruning is CONSERVATIVE: a file is skipped only when a predicate's
  range provably misses the file's [min, max] (NULL-only columns and
  missing stats keep the file). Row-group and row-level filtering of
  survivors stays Spark's job — the same predicate must still be
  applied to the returned DataFrame (``scan_with_skipping`` applies it
  for you).
* stats cover orderable primitive columns (numeric / string /
  date / timestamp); other types are simply not skippable.

Scale shape: the file LISTING is one recursive filesystem listing
(unavoidable without a transaction log); the footer sweep — the
expensive part, one open + footer parse per file — runs as a
DISTRIBUTED Spark job when a session is passed (one task per slice of
the file list, footers only, no data pages), or as a driver-side loop
for small tables / sessionless callers. All IO routes through
``pyarrow.fs`` (resolved per-URI), so ``file://``-less local paths,
``file://`` URIs and remote schemes pyarrow supports (s3/gcs/hdfs)
all work; unknown schemes fail loudly at resolution, never by seeing
an empty tree. The sidecar is file-count-sized JSON, read once per
planned query.
"""

from __future__ import annotations

import json
import os
from typing import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STATS_SIDECAR = "_mfs_file_stats.json"


def _fs_and_path(path: str):
    """Resolve a table location to ``(pyarrow FileSystem, fs path,
    spark-readable base)``. Plain paths map to the local filesystem
    (absolutized — pyarrow's LocalFileSystem rejects relative forms);
    URIs resolve via ``pyarrow.fs.FileSystem.from_uri``, which raises
    loudly on schemes it cannot back (never an empty listing — the
    silent under-read this module must not do)."""
    from pyarrow import fs as pafs

    if "://" in path:
        scheme = path.split("://", 1)[0].lower()
        # explicit allowlist, not try/except: pyarrow's azure
        # filesystem ABORTS the process (not raises) on an
        # unconfigured abfss URI, so unknown/unvetted schemes must be
        # rejected before from_uri ever sees them
        if scheme not in (
            "file", "s3", "s3a", "s3n", "gs", "gcs", "hdfs", "viewfs",
        ):
            raise ValueError(
                f"file-stats skipping cannot resolve {path!r}: "
                f"scheme {scheme!r} is not supported (file/s3/s3a/gcs/"
                f"hdfs)"
            )
        # Hadoop's S3 schemes (s3a://, the one Spark actually reads;
        # legacy s3n://) resolve through pyarrow's s3 for the
        # listing/footer side, while the ORIGINAL scheme stays in the
        # spark-readable base — review-caught: rejecting s3a made the
        # advertised remote case unusable, and handing Spark a bare
        # s3:// base fails on vanilla Hadoop (no such FileSystem)
        arrow_uri = (
            "s3://" + path.split("://", 1)[1]
            if scheme in ("s3a", "s3n")
            else path
        )
        try:
            fs, p = pafs.FileSystem.from_uri(arrow_uri)
        except Exception as exc:
            raise ValueError(
                f"file-stats skipping cannot resolve {path!r}: {exc}"
            ) from exc
        spark_base = path if not path.startswith("file://") else p
        return fs, p, spark_base
    p = os.path.abspath(path)
    return pafs.LocalFileSystem(), p, p


def _data_files(fs, root: str) -> list[str]:
    """Recursive listing of the table's parquet data files as
    '/'-separated paths relative to ``root``; hidden/underscore files
    and directories are pruned at every level (the same convention
    Spark's scans use)."""
    from pyarrow import fs as pafs

    infos = fs.get_file_info(pafs.FileSelector(root, recursive=True))
    out = []
    prefix = root.rstrip("/") + "/"
    for info in infos:
        if info.type != pafs.FileType.File:
            continue
        rel = info.path[len(prefix):] if info.path.startswith(prefix) \
            else info.path
        segs = rel.split("/")
        if any(s.startswith((".", "_")) for s in segs):
            continue
        if segs[-1].endswith(".parquet"):
            out.append(rel)
    return sorted(out)


def _make_footer_reader(columns: Sequence[str], base_uri: str):
    """Closure factory (self-contained — safe to pickle into Python
    workers without the package on PYTHONPATH): returns
    ``read_footer(rel) -> per_col stats dict`` that opens ONE file's
    footer on whatever filesystem ``base_uri`` resolves to."""
    cols = list(columns)

    def read_footer(rel):
        import os as _os

        import pyarrow.parquet as _pq
        from pyarrow import fs as _pafs

        if "://" in base_uri:
            fs, base = _pafs.FileSystem.from_uri(base_uri)
        else:
            fs, base = _pafs.LocalFileSystem(), _os.path.abspath(base_uri)
        full = base.rstrip("/") + "/" + rel
        with fs.open_input_file(full) as fh:
            md = _pq.ParquetFile(fh).metadata
            idx = {md.schema.column(i).name: i
                   for i in range(md.num_columns)}
            # hive partition columns live in the directory names, not
            # the file schema — their "stats" are exact point values,
            # so a partition-column range predicate file-skips too
            hive = {}
            for seg in rel.split("/")[:-1]:
                if "=" in seg:
                    k, _, v = seg.partition("=")
                    try:
                        v = int(v)
                    except ValueError:
                        try:
                            v = float(v)
                        except ValueError:
                            pass
                    hive[k] = {"min": v, "max": v, "nulls": 0}
            per_col = dict(hive) if hive else {}
            for c in cols:
                if c not in idx:
                    continue  # hive (handled above) or absent: skip
                lo = hi = None
                nulls = 0
                ok = True
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx[c]).statistics
                    try:
                        if st is None or not st.has_min_max:
                            ok = False
                            break
                        nulls += st.null_count or 0
                        lo = st.min if lo is None else min(lo, st.min)
                        hi = st.max if hi is None else max(hi, st.max)
                    except Exception:
                        # pyarrow cannot extract stats for every
                        # physical type (e.g. decimals on some builds)
                        # — no stats means conservative keep, never a
                        # guess
                        ok = False
                        break
                if ok and lo is not None:
                    per_col[c] = {"min": lo, "max": hi, "nulls": nulls}
            return per_col

    return read_footer


def _sweep_footers(
    path: str,
    root: str,
    columns: Sequence[str],
    rels: list[str],
    spark: SparkSession | None,
) -> dict:
    """Footer-sweep ``rels`` (relative paths under ``root``) into a
    {rel: per_col_stats} mapping — distributed when a session is
    passed, driver-side loop otherwise. Both paths JSON-normalize the
    values so the sidecar bytes never depend on which path ran."""
    # hand the closure the RESOLVED root (absolute local path or the
    # original URI): Python workers run with a different cwd, so a
    # relative path must never reach them
    read_footer = _make_footer_reader(
        columns, path if "://" in path else root
    )
    if spark is not None and rels:
        n_slices = min(len(rels), spark.sparkContext.defaultParallelism)
        files_df = spark.createDataFrame(
            [(r,) for r in rels], schema="rel string"
        ).repartition(n_slices)

        def sweep(batches, _read=read_footer):
            import json as _json

            import pandas as _pd

            for pdf in batches:
                out_rel, out_js = [], []
                for rel in pdf["rel"]:
                    out_rel.append(rel)
                    # stats values are mixed-typed (int/float/str/
                    # date...) — one JSON string per file keeps Arrow
                    # out of the typing and the driver re-loads into
                    # the exact dict the serial path builds (str() for
                    # non-JSON types, same as the sidecar dump)
                    out_js.append(_json.dumps(_read(rel), default=str))
                yield _pd.DataFrame({"rel": out_rel, "js": out_js})

        collected = files_df.mapInPandas(
            sweep, schema="rel string, js string"
        ).collect()
        stats = {r["rel"]: json.loads(r["js"]) for r in collected}
        return {rel: stats[rel] for rel in rels}
    stats = {rel: read_footer(rel) for rel in rels}
    # normalize through the same JSON round-trip the distributed
    # path pays, so both paths write byte-identical sidecars
    return json.loads(json.dumps(stats, default=str))


def _write_sidecar(fs, root: str, columns: Sequence[str], stats: dict):
    payload = json.dumps({"columns": list(columns), "files": stats},
                         default=str)
    tmp = root.rstrip("/") + f"/.{STATS_SIDECAR}.tmp"
    final = root.rstrip("/") + f"/{STATS_SIDECAR}"
    with fs.open_output_stream(tmp) as out:
        out.write(payload.encode("utf-8"))
    # atomic rename on real filesystems; copy+delete on object stores
    # (acceptable: the sidecar is advisory and readers fail loudly on
    # a missing/stale one, never read a torn JSON silently)
    fs.move(tmp, final)


def write_file_stats(
    path: str,
    columns: Sequence[str],
    spark: SparkSession | None = None,
) -> dict:
    """Sweep the table's parquet FOOTERS (no data pages) and write the
    per-file min/max sidecar. Returns the stats mapping.

    With ``spark`` the sweep DISTRIBUTES: the file list becomes a
    DataFrame, one Arrow-batched task per slice opens its files'
    footers in parallel (the 1e6-file case a single-threaded driver
    loop cannot serve), and only footer-sized stats rows come back to
    the driver — which then writes the identical sidecar bytes the
    serial path writes. Without ``spark`` the sweep loops on the
    driver (fine for small tables and sessionless callers).

    After APPENDS or partial rewrites, prefer :func:`update_file_stats`
    — it sweeps only the files the sidecar does not already cover."""
    fs, root, _ = _fs_and_path(path)
    rels = _data_files(fs, root)
    stats = _sweep_footers(path, root, columns, rels, spark)
    _write_sidecar(fs, root, columns, stats)
    return stats


def update_file_stats(
    path: str,
    spark: SparkSession | None = None,
) -> dict:
    """Incrementally refresh an EXISTING stats sidecar: sweep only the
    data files the sidecar does not cover (appends, compaction output)
    and drop entries for files no longer on disk (compaction input,
    deletes). At a 1e6-file table an append of 100 files costs 100
    footer reads, not a full re-sweep — the refresh that makes
    ``scan_with_skipping``'s loud staleness check cheap to satisfy on
    an append-mode table.

    Columns come from the sidecar (the stats set must stay uniform
    across files — mixed column sets would make pruning quality depend
    on which sweep covered a file). Raises when no sidecar exists: an
    "incremental" first sweep would hide a missing
    :func:`write_file_stats` in an orchestration. Returns a report
    ``{"files_total", "swept", "removed", "kept"}``."""
    from pyarrow import fs as pafs

    fs, root, _ = _fs_and_path(path)
    sidecar = root.rstrip("/") + f"/{STATS_SIDECAR}"
    if fs.get_file_info(sidecar).type == pafs.FileType.NotFound:
        raise RuntimeError(
            f"no {STATS_SIDECAR} at {path!r} — run write_file_stats "
            "first; update_file_stats only refreshes an existing sidecar"
        )
    with fs.open_input_file(sidecar) as fh:
        meta = json.loads(fh.read().decode("utf-8"))
    columns = meta["columns"]
    known: dict[str, dict] = meta["files"]
    on_disk = _data_files(fs, root)
    new = [r for r in on_disk if r not in known]
    fresh = _sweep_footers(path, root, columns, new, spark)
    stats = {rel: (fresh[rel] if rel in fresh else known[rel])
             for rel in on_disk}
    _write_sidecar(fs, root, columns, stats)
    return {
        "files_total": len(on_disk),
        "swept": len(new),
        "removed": len(set(known) - set(on_disk)),
        "kept": len(on_disk) - len(new),
    }


def scan_with_skipping(
    spark: SparkSession,
    path: str,
    predicates: Mapping[str, tuple],
    schema=None,
) -> tuple[DataFrame, dict]:
    """Plan a scan of ``path`` reading ONLY the files whose stats ranges
    intersect every ``col: (lo, hi)`` predicate (either bound may be
    None for one-sided ranges). Returns ``(df, report)`` where the
    DataFrame already has the predicates applied row-level and the
    report records ``{"files_total", "files_read", "files_skipped"}``.

    ``schema`` (optional StructType) makes the scan plan with an
    explicit table schema instead of footer inference — columns absent
    from this directory's files read as NULL, so a predicate on a
    column added by schema evolution resolves (and drops every row)
    rather than failing analysis. Files without stats for a predicate
    column are conservatively kept either way.

    Raises if the sidecar is missing or stale (unknown data files) —
    a skipping scan that silently fell back to reading everything
    would hide exactly the regression this module exists to prevent.
    """
    from pyarrow import fs as pafs

    fs, root, spark_base = _fs_and_path(path)
    sidecar = root.rstrip("/") + f"/{STATS_SIDECAR}"
    if fs.get_file_info(sidecar).type == pafs.FileType.NotFound:
        raise RuntimeError(
            f"no {STATS_SIDECAR} at {path!r} — run write_file_stats first"
        )
    with fs.open_input_file(sidecar) as fh:
        meta = json.loads(fh.read().decode("utf-8"))
    stats: dict[str, dict] = meta["files"]
    on_disk = _data_files(fs, root)
    if not on_disk:
        raise RuntimeError(
            f"table at {path!r} holds no parquet data files — nothing "
            "to scan (stale or misplaced sidecar?)"
        )
    unknown = sorted(set(on_disk) - set(stats))
    if unknown:
        raise RuntimeError(
            f"stats sidecar at {path!r} is stale — {len(unknown)} data "
            f"files it does not cover (e.g. {unknown[0]!r}); re-run "
            "write_file_stats after appends/rewrites"
        )

    import datetime as _dt
    import decimal as _dec

    # parquet TIMESTAMP stats come back tz-AWARE (Spark writes
    # isAdjustedToUTC), while predicate bounds are usually naive
    # datetimes that Spark interprets in the session timezone — the
    # same localization must apply here or aware-vs-naive comparison
    # is undefined. Resolve the session tz once per scan.
    try:
        from zoneinfo import ZoneInfo

        _session_tz = ZoneInfo(
            spark.conf.get("spark.sql.session.timeZone")
        )
    except Exception:
        _session_tz = None  # unresolvable tz → mixed forms keep files

    def _align(fmin, fmax, lo, hi):
        """Bring sidecar stats (JSON round-trips non-native types via
        str) and predicate bounds into one comparable domain, or return
        None = NOT provably comparable (caller keeps the file — the
        conservative guarantee must never ride on '1' < '2' string
        accidents for numeric-like types)."""
        bound = lo if lo is not None else hi
        if isinstance(bound, bool):
            return None  # bool is an int subclass; don't guess
        if isinstance(bound, (int, float, _dec.Decimal)):
            try:  # numeric stats, possibly str()'d through JSON
                return float(fmin), float(fmax), \
                    float(lo) if lo is not None else None, \
                    float(hi) if hi is not None else None
            except (TypeError, ValueError):
                return None
        if isinstance(bound, (_dt.datetime, _dt.date)):
            # stats round-trip via str() — a DATE column serializes as
            # 'YYYY-MM-DD' while a datetime bound str()s to
            # 'YYYY-MM-DD HH:MM:SS', so raw string comparison would
            # prune a file whose date max equals the bound's calendar
            # day ('2024-01-05' < '2024-01-05 00:00:00'). Parse both
            # sides back to datetime and promote dates to midnight —
            # the same promotion Spark's row-level date<->timestamp
            # comparison cast applies — so mixed date/datetime forms
            # compare in one domain. Anything unparseable (or an
            # aware-vs-naive mix, which raises on compare) returns
            # None = conservative keep.
            def _to_dt(v):
                if isinstance(v, _dt.datetime):
                    return v
                if isinstance(v, _dt.date):
                    return _dt.datetime(v.year, v.month, v.day)
                if isinstance(v, str):
                    return _dt.datetime.fromisoformat(v)
                raise ValueError(f"not a temporal value: {v!r}")
            try:
                fmin_d, fmax_d = _to_dt(fmin), _to_dt(fmax)
                lo_d = _to_dt(lo) if lo is not None else None
                hi_d = _to_dt(hi) if hi is not None else None
                vals = [v for v in (fmin_d, fmax_d, lo_d, hi_d)
                        if v is not None]
                if any(v.tzinfo is not None for v in vals) and \
                        any(v.tzinfo is None for v in vals):
                    # aware/naive mix: localize naive values to the
                    # session tz — exactly how Spark interprets naive
                    # timestamp literals against UTC-stored data
                    if _session_tz is None:
                        return None
                    def _aware(v):
                        if v is None or v.tzinfo is not None:
                            return v
                        return v.replace(tzinfo=_session_tz)
                    fmin_d, fmax_d = _aware(fmin_d), _aware(fmax_d)
                    lo_d, hi_d = _aware(lo_d), _aware(hi_d)
                # force any residual incomparability to raise HERE (not
                # inside the caller's comparison): probe each bound
                if lo_d is not None:
                    _ = fmax_d < lo_d
                if hi_d is not None:
                    _ = fmin_d > hi_d
            except (ValueError, TypeError):
                return None
            return fmin_d, fmax_d, lo_d, hi_d
        if isinstance(bound, str) and isinstance(fmin, str):
            return fmin, fmax, lo, hi
        return None  # unknown pairing: conservative keep

    def survives(rel: str) -> bool:
        per_col = stats.get(rel, {})
        for c, (lo, hi) in predicates.items():
            st = per_col.get(c)
            if st is None:
                continue  # no stats for this column: conservative keep
            aligned = _align(st["min"], st["max"], lo, hi)
            if aligned is None:
                continue
            fmin, fmax, lo_c, hi_c = aligned
            if lo_c is not None and fmax < lo_c:
                return False
            if hi_c is not None and fmin > hi_c:
                return False
        return True

    keep = [rel for rel in on_disk if survives(rel)]
    report = {
        "files_total": len(on_disk),
        "files_read": len(keep),
        "files_skipped": len(on_disk) - len(keep),
    }
    # basePath keeps hive partition-column inference alive when reading
    # an explicit file list — without it a partitioned table's partition
    # columns would silently vanish from the pruned scan's schema
    base = spark_base.rstrip("/")
    reader = spark.read.option("basePath", base)
    if schema is not None:
        reader = reader.schema(schema)
    if keep:
        df = reader.parquet(*[f"{base}/{r}" for r in keep])
    else:
        # empty but schema-correct: read one file's schema, filter-false
        df = reader.parquet(f"{base}/{on_disk[0]}").filter(F.lit(False))
    for c, (lo, hi) in predicates.items():
        if lo is not None:
            df = df.filter(F.col(c) >= F.lit(lo))
        if hi is not None:
            df = df.filter(F.col(c) <= F.lit(hi))
    return df, report


