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

Scale shape: stats collection is one driver-side pyarrow footer sweep
(footers only, no data pages — the cost the sidecar amortizes away for
every future query); the sidecar is file-count-sized JSON, read once
per planned query.
"""

from __future__ import annotations

import json
import os
from typing import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STATS_SIDECAR = "_mfs_file_stats.json"


def _require_local(path: str) -> str:
    """The footer sweep and sidecar IO are driver-side LOCAL filesystem
    calls (os.walk / open). On a remote URI they would see an empty
    tree and silently produce an empty sidecar — the exact
    under-reading this module must never do. Fail loudly instead; on a
    real lake, per-file stats belong in the table format's transaction
    log (Delta/Iceberg — the documented carried gap). ``file://`` URIs
    are accepted and NORMALIZED to a plain path (os.walk/open cannot
    consume the URI form)."""
    if path.startswith("file://"):
        return path[len("file://"):] or "/"
    if "://" in path:
        raise ValueError(
            f"file-stats skipping requires a local table path, got "
            f"{path!r}; use a Delta/Iceberg table log for remote stats"
        )
    return path


def _data_files(path: str) -> list[str]:
    out = []
    for root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
        for f in files:
            if f.endswith(".parquet") and not f.startswith((".", "_")):
                out.append(os.path.relpath(os.path.join(root, f), path))
    return sorted(out)


def write_file_stats(path: str, columns: Sequence[str]) -> dict:
    """Sweep the table's parquet FOOTERS (no data pages) and write the
    per-file min/max sidecar. Returns the stats mapping."""
    import pyarrow.parquet as pq

    path = _require_local(path)
    stats: dict[str, dict] = {}
    for rel in _data_files(path):
        md = pq.ParquetFile(os.path.join(path, rel)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        # hive partition columns live in the directory names, not the
        # file schema — their "stats" are exact point values, so a
        # partition-column range predicate file-skips too
        hive = {}
        for seg in rel.split(os.sep)[:-1]:
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
        for c in columns:
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
                    # pyarrow cannot extract stats for every physical
                    # type (e.g. decimals on some builds) — no stats
                    # means conservative keep, never a guess
                    ok = False
                    break
            if ok and lo is not None:
                per_col[c] = {"min": lo, "max": hi, "nulls": nulls}
        stats[rel] = per_col
    tmp = os.path.join(path, f".{STATS_SIDECAR}.tmp")
    with open(tmp, "w") as fh:
        json.dump({"columns": list(columns), "files": stats}, fh,
                  default=str)
    os.replace(tmp, os.path.join(path, STATS_SIDECAR))
    return stats


def scan_with_skipping(
    spark: SparkSession,
    path: str,
    predicates: Mapping[str, tuple],
) -> tuple[DataFrame, dict]:
    """Plan a scan of ``path`` reading ONLY the files whose stats ranges
    intersect every ``col: (lo, hi)`` predicate (either bound may be
    None for one-sided ranges). Returns ``(df, report)`` where the
    DataFrame already has the predicates applied row-level and the
    report records ``{"files_total", "files_read", "files_skipped"}``.

    Raises if the sidecar is missing or stale (unknown data files) —
    a skipping scan that silently fell back to reading everything
    would hide exactly the regression this module exists to prevent.
    """
    path = _require_local(path)
    sidecar = os.path.join(path, STATS_SIDECAR)
    if not os.path.exists(sidecar):
        raise RuntimeError(
            f"no {STATS_SIDECAR} at {path!r} — run write_file_stats first"
        )
    with open(sidecar) as fh:
        meta = json.load(fh)
    stats: dict[str, dict] = meta["files"]
    on_disk = _data_files(path)
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
    reader = spark.read.option("basePath", path)
    if keep:
        df = reader.parquet(*[os.path.join(path, r) for r in keep])
    else:
        # empty but schema-correct: read one file's schema, filter-false
        df = reader.parquet(
            os.path.join(path, on_disk[0])
        ).filter(F.lit(False))
    for c, (lo, hi) in predicates.items():
        if lo is not None:
            df = df.filter(F.col(c) >= F.lit(lo))
        if hi is not None:
            df = df.filter(F.col(c) <= F.lit(hi))
    return df, report


