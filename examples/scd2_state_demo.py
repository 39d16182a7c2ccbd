"""SCD Type-2 state-history walkthrough: build the interval table from
an event stream, serve point-in-time state with a range lookup, and
cross-check against the query-time as-of join.

The trade the demo shows: `scd2_intervals` pays ONE build shuffle and
stores one row per state CHANGE; every retrieval afterwards is an
equi-join + range predicate against that small table, where the as-of
join re-windows the full event stream per query. Materialize when reads
outnumber writes.

Run:  python examples/scd2_state_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from my_feast_spark import get_session, latest_per_key, scd2_intervals, scd2_lookup
from my_feast_spark.operators.asof_join import point_in_time_join
from my_feast_spark.sources.readers import load_table


def main(sf_dir: str = "/root/testdata/sf0.001") -> dict:
    spark = get_session(app_name="scd2-state-demo")

    # 1. Build: collapse each user's event stream into state intervals.
    # Same-timestamp events are first collapsed to the max-event_id row:
    # the as-of join used for the cross-check below has no notion of an
    # event_id tie-break, so the comparison is only well-defined on a
    # tie-free stream (scd2_intervals itself handles ties via
    # tie_breakers).
    events = latest_per_key(
        load_table(spark, sf_dir, "events").select(
            "user_id", "ts", "event_id", "event_type"
        ),
        ["user_id", "ts"],
        ["event_id"],
    )
    intervals = scd2_intervals(
        events, ["user_id"], "ts", "event_type", tie_breakers=["event_id"]
    )
    n_events = events.count()
    n_intervals = intervals.count()

    # 2. Serve: what state was each user in 30 minutes after each event?
    probes = events.select(
        "user_id",
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("probe_ts"),
        F.col("event_id").alias("probe_id"),
    )
    served = scd2_lookup(intervals, probes, ["user_id"], "probe_ts")

    # 3. Cross-check: the as-of join over the (tie-free) stream must agree
    via_asof = point_in_time_join(
        probes, events.drop("event_id"), ["user_id"],
        event_ts_col="ts", entity_ts_col="probe_ts",
        features=["event_type"],
    )
    a = {r.probe_id: r.state for r in served.collect()}
    b = {r.probe_id: r.event_type for r in via_asof.collect()}
    mismatches = sum(1 for k in a if a[k] != b.get(k))

    return {
        "events": n_events,
        "intervals": n_intervals,
        "compression": round(n_events / max(n_intervals, 1), 2),
        "probes_served": len(a),
        "asof_mismatches": mismatches,
    }


if __name__ == "__main__":
    out = main(*sys.argv[1:2])
    print(out)
