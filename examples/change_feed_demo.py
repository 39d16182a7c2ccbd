"""Change-data-feed walkthrough: a versioned table's commit history
served three ways — the netted keyed diff, the raw per-commit event
feed, and end-to-end CDC replication into a mirror that is itself a
valid CDC source.

The trade the demo shows: `diff_versions` answers "what is different
between version A and B" in one increment-composed relation (the audit
/ retrain-trigger question); `read_changes` answers "what HAPPENED,
commit by commit" (the replication question — both update images, per
commit); `mirror_changes_stream` consumes the latter with exactly-once
checkpointing, because a keyed apply is content-idempotent where an
append replay would duplicate.

Run:  python examples/change_feed_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
# the streaming change-feed source is a Python Data Source: its class is
# pickled BY REFERENCE into Spark's Python worker processes, so the
# package must be importable there too — export PYTHONPATH before the
# JVM starts (an installed package needs none of this)
os.environ["PYTHONPATH"] = (
    _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
).rstrip(os.pathsep)

from pyspark.sql import functions as F

from my_feast_spark import get_session
from my_feast_spark.sources import (
    delete_version,
    diff_versions,
    read_changes,
    read_version,
    upsert_version,
    write_version,
)
from my_feast_spark.sources.readers import load_table
from my_feast_spark.streaming import mirror_changes_stream


def main(sf_dir: str = "/root/testdata/sf0.001") -> dict:
    spark = get_session(app_name="change-feed-demo")
    root = tempfile.mkdtemp(prefix="mfs_cdf_demo_")
    src, mirror, ckpt = f"{root}/src", f"{root}/mirror", f"{root}/ckpt"

    # 1. A versioned table accumulates history: snapshot, a correction
    # upsert, a retention delete.
    users = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    write_version(users, src)                                     # v0
    upsert_version(
        users.where(F.col("event_id") % 9 == 0)
        .withColumn("value", F.col("value") * 2),
        src, ["event_id"],
    )                                                              # v1
    delete_version(spark, src, F.col("event_id") % 13 == 0)       # v2

    # 2. The AUDIT question: what changed since v0, net?
    net = {r["change"]: r["count"] for r in
           diff_versions(spark, src, 0, 2, ["event_id"])
           .groupBy("change").count().collect()}

    # 3. The REPLICATION question: every event, per commit.
    feed = read_changes(spark, src, 0, 2)
    by_type = {r["_change_type"]: r["count"] for r in
               feed.groupBy("_change_type").count().collect()}

    def drain(q):
        # awaitTermination returns False on timeout with the query
        # still running — proceeding would race a second query onto
        # the same checkpoint
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("mirror stream did not drain in 300s")

    # 4. CDC replication: seed + follow (the seed pins the feed offset
    # BEFORE snapshotting, so nothing can fall between).
    drain(mirror_changes_stream(
        spark, src, mirror, ["event_id"], checkpoint=ckpt,
        available_now=True,
    ))

    # 5. The source keeps moving; the checkpointed stream picks up only
    # the new commits — and the mirror's OWN apply commits carry change
    # sidecars, so the mirror is itself a valid CDC source for a third
    # table (feeds chain).
    upsert_version(
        users.where(F.col("event_id") % 500 == 0)
        .withColumn("value", F.lit(0.0)),
        src, ["event_id"],
    )                                                              # v3
    drain(mirror_changes_stream(
        spark, src, mirror, ["event_id"], checkpoint=ckpt,
        available_now=True, seed=False, starting_version=2,
    ))
    src_head = sorted(map(tuple, read_version(spark, src).collect()))
    mir_head = sorted(map(tuple, read_version(spark, mirror).collect()))
    assert src_head == mir_head, "mirror diverged"
    chained = read_changes(spark, mirror, 0).count()
    assert chained > 0, "mirror's own feed should carry the apply"

    out = {
        "net_diff": net,
        "feed_events": by_type,
        "mirror_rows": len(mir_head),
        "mirror_own_feed_events": chained,
    }
    print(out)
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()
    return out


if __name__ == "__main__":
    main(*sys.argv[1:])
