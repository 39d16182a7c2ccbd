"""Property test: the versioned-table protocol against a pure-Python
model. A random sequence of append / overwrite / upsert / checkpoint /
vacuum must keep every RETAINED version's logical content equal to the
model's — the invariant that makes time travel trustworthy."""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from my_feast_spark.sources.versioned import (
    checkpoint_version,
    list_versions,
    read_version,
    upsert_version,
    vacuum,
    write_version,
)

# an operation is (kind, payload); payloads are small key->value maps
_rows = st.dictionaries(
    st.integers(min_value=0, max_value=12),
    st.integers(min_value=0, max_value=99),
    min_size=1,
    max_size=5,
)
_op = st.one_of(
    st.tuples(st.just("append"), _rows),
    st.tuples(st.just("overwrite"), _rows),
    st.tuples(st.just("upsert"), _rows),
    st.tuples(st.just("checkpoint"), st.none()),
    st.tuples(st.just("vacuum"), st.integers(min_value=1, max_value=3)),
)


#: randomized versioned-log protocol model — redundant next to the oracle-parity value sweep;
#: slow tier (see pytest.ini)
pytestmark = pytest.mark.slow


def _to_df(spark, rows: dict[int, int]):
    return spark.createDataFrame(
        [(k, v) for k, v in sorted(rows.items())], ["k", "v"]
    )


def _read_multiset(spark, path, version):
    return sorted(
        (r["k"], r["v"])
        for r in read_version(spark, path, version).collect()
    )


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_op, min_size=2, max_size=6))
def test_versioned_protocol_matches_model(spark, tmp_path_factory, ops):
    path = str(tmp_path_factory.mktemp("vprop") / "t")
    # model: committed version -> sorted multiset of (k, v)
    model: dict[int, list[tuple[int, int]]] = {}

    def latest_rows() -> list[tuple[int, int]]:
        return model[max(model)] if model else []

    # version 0 always exists (reads of an empty table are a separate,
    # loudly-tested path)
    write_version(_to_df(spark, {0: 0}), path, mode="overwrite")
    model[0] = [(0, 0)]

    for kind, payload in ops:
        if kind == "append":
            v = write_version(_to_df(spark, payload), path, mode="append")
            model[v] = sorted(latest_rows() + sorted(payload.items()))
        elif kind == "overwrite":
            v = write_version(
                _to_df(spark, payload), path, mode="overwrite"
            )
            model[v] = sorted(payload.items())
        elif kind == "upsert":
            v = upsert_version(_to_df(spark, payload), path, ["k"])
            kept = [t for t in latest_rows() if t[0] not in payload]
            model[v] = sorted(kept + sorted(payload.items()))
        elif kind == "checkpoint":
            v = checkpoint_version(spark, path)
            model[v] = latest_rows()
        elif kind == "vacuum":
            rep = vacuum(spark, path, keep_last=payload, grace_seconds=0)
            retained = sorted(model)[-payload:]
            model = {v: model[v] for v in retained}
            assert sorted(rep["retained_versions"]) == retained

        committed = list_versions(spark, path)
        assert committed == sorted(model)
        # every retained version's content matches the model
        for v in committed:
            assert _read_multiset(spark, path, v) == model[v], (
                f"version {v} diverged after {kind}"
            )


# --- txn (idempotent-append) protocol against the same model ------------

_txn_op = st.one_of(
    st.tuples(st.just("append"), _rows),
    st.tuples(st.just("overwrite"), _rows),
    st.tuples(st.just("upsert"), _rows),
    st.tuples(st.just("checkpoint"), st.none()),
    st.tuples(
        st.just("txn_append"),
        st.tuples(
            _rows,
            st.sampled_from(["appA", "appB"]),
            st.integers(min_value=0, max_value=3),
        ),
    ),
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_txn_op, min_size=2, max_size=6))
def test_txn_protocol_matches_model(spark, tmp_path_factory, ops):
    """The Delta-style txn high-water protocol: a txn append with an id
    at or below the per-app record is a no-op (content AND version
    count), content-preserving rewrites carry the record, a plain
    overwrite resets it — random interleavings vs a pure-Python model
    of both the content and the txn map."""
    from my_feast_spark.sources.versioned import _fs, _read_manifest

    path = str(tmp_path_factory.mktemp("vtxn") / "t")
    model: dict[int, list[tuple[int, int]]] = {}
    txn_model: dict[str, int] = {}

    def latest_rows() -> list[tuple[int, int]]:
        return model[max(model)] if model else []

    write_version(_to_df(spark, {0: 0}), path, mode="overwrite")
    model[0] = [(0, 0)]

    for kind, payload in ops:
        if kind == "append":
            v = write_version(_to_df(spark, payload), path, mode="append")
            model[v] = sorted(latest_rows() + sorted(payload.items()))
        elif kind == "overwrite":
            v = write_version(
                _to_df(spark, payload), path, mode="overwrite"
            )
            model[v] = sorted(payload.items())
            txn_model = {}  # new contents, new transaction history
        elif kind == "upsert":
            v = upsert_version(_to_df(spark, payload), path, ["k"])
            kept = [t for t in latest_rows() if t[0] not in payload]
            model[v] = sorted(kept + sorted(payload.items()))
        elif kind == "checkpoint":
            v = checkpoint_version(spark, path)
            model[v] = latest_rows()
        elif kind == "txn_append":
            rows, app, tid = payload
            v = write_version(
                _to_df(spark, rows), path, mode="append", txn=(app, tid)
            )
            if tid <= txn_model.get(app, -1):
                assert v == max(model), "replay must not commit"
            else:
                model[v] = sorted(latest_rows() + sorted(rows.items()))
                txn_model[app] = tid

        committed = list_versions(spark, path)
        assert committed == sorted(model)
        for v in committed:
            assert _read_multiset(spark, path, v) == model[v], (
                f"version {v} diverged after {kind}"
            )
        jvm, fs = _fs(spark, path)
        got_txn = _read_manifest(jvm, fs, path, committed[-1]).get(
            "txn", {}
        )
        assert got_txn == txn_model, f"txn map diverged after {kind}"


# ---- change feed (round 16): the event stream must REPLAY ------------

_cf_op = st.one_of(
    st.tuples(st.just("append"), _rows),
    st.tuples(st.just("upsert"), _rows),
    st.tuples(st.just("delete"), st.sets(
        st.integers(min_value=0, max_value=12), min_size=1, max_size=4)),
    st.tuples(st.just("checkpoint"), st.none()),
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    base=_rows,
    ops=st.lists(_cf_op, min_size=1, max_size=5),
)
def test_change_feed_replays_to_the_head_version(
    spark, tmp_path_factory, base, ops
):
    """The strongest contract a change feed can offer: applying the
    event stream (ordered by commit, preimages asserted against the
    running state) to the base version's content must reproduce the
    head version EXACTLY, and netting first-pre vs last-post per key
    must equal diff_versions — for ANY servable chain."""
    from my_feast_spark.sources.versioned import (
        delete_version,
        diff_versions,
        read_changes,
    )

    path = str(tmp_path_factory.mktemp("cfprop") / "t")
    write_version(_to_df(spark, base), path)
    state = dict(base)  # model of the live table content

    for kind, payload in ops:
        if kind == "append":
            # the keyed contract: appends introduce only NEW keys
            fresh = {k + 100: v for k, v in payload.items()
                     if (k + 100) not in state}
            if not fresh:
                continue
            write_version(_to_df(spark, fresh), path, mode="append")
            state.update(fresh)
        elif kind == "upsert":
            upsert_version(_to_df(spark, payload), path, ["k"])
            state.update(payload)
        elif kind == "delete":
            cond = F.col("k").isin([int(k) for k in payload])
            delete_version(spark, path, cond)
            for k in payload:
                state.pop(k, None)
        else:
            checkpoint_version(spark, path)

    head = list_versions(spark, path)[-1]
    # within a commit, pre-state reads (preimage/delete) replay before
    # post-state writes — lexicographic _change_type order would put
    # 'update_postimage' before 'update_preimage'
    _rank = {"update_preimage": 0, "delete": 0,
             "insert": 1, "update_postimage": 1}
    events = sorted(
        ((r._commit_version, _rank[r._change_type], r.k),
         r._change_type, r.k, r.v)
        for r in read_changes(spark, path, 0, head).collect()
    )
    # replay against the base, asserting preimages against the model
    replay = dict(base)
    for _v, etype, k, v in events:
        if etype == "insert":
            # appends introduce only new keys; an upsert emits 'insert'
            # only for keys absent from its parent
            assert k not in replay, (k, replay.get(k))
            replay[k] = v
        elif etype == "update_preimage":
            assert replay.get(k) == v, (k, v, replay.get(k))
        elif etype == "update_postimage":
            replay[k] = v
        else:  # delete
            assert replay.pop(k, None) == v
    head_rows = dict(_read_multiset(spark, path, head))
    assert replay == head_rows == state

    # netting == diff_versions for the same range
    net = {
        r.k: r.change
        for r in diff_versions(spark, path, 0, head, ["k"]).collect()
    }
    expect = {}
    for k in set(base) | set(state):
        if k not in base and k in state:
            expect[k] = "added"
        elif k in base and k not in state:
            expect[k] = "removed"
        elif base.get(k) != state.get(k):
            expect[k] = "changed"
    assert net == expect


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    base=_rows,
    ops=st.lists(_cf_op, min_size=1, max_size=4),
    target=_rows,
)
def test_apply_changes_matches_model_on_diverged_targets(
    spark, tmp_path_factory, base, ops, target
):
    """apply_changes_version against a pure-Python model, for ANY
    servable source chain and ANY (possibly diverged) target: the
    applied table equals {target minus netted keys} ∪ {netted
    upserts}, no-op-only batches commit nothing, and the commit's own
    sidecar replays the target to the same state (the chained-mirror
    contract)."""
    from my_feast_spark.sources.versioned import (
        apply_changes_version,
        delete_version,
        read_changes,
    )

    tmp = tmp_path_factory.mktemp("applyprop")
    src, dst = str(tmp / "src"), str(tmp / "dst")
    write_version(_to_df(spark, base), src)
    state = dict(base)
    for kind, payload in ops:
        if kind == "append":
            fresh = {k + 100: v for k, v in payload.items()
                     if (k + 100) not in state}
            if not fresh:
                continue
            write_version(_to_df(spark, fresh), src, mode="append")
            state.update(fresh)
        elif kind == "upsert":
            upsert_version(_to_df(spark, payload), src, ["k"])
            state.update(payload)
        elif kind == "delete":
            cond = F.col("k").isin([int(k) for k in payload])
            delete_version(spark, src, cond)
            for k in payload:
                state.pop(k, None)
        else:
            checkpoint_version(spark, src)

    write_version(_to_df(spark, target), dst)
    head = list_versions(spark, src)[-1]
    events = read_changes(spark, src, 0, head)

    # pure-Python model of the netting + apply
    raw = sorted(
        ((r._commit_version,
          {"update_preimage": 0, "delete": 0,
           "insert": 1, "update_postimage": 1}[r._change_type]),
         r._change_type, r.k, r.v)
        for r in events.collect()
    )
    net: dict[int, tuple] = {}
    for _o, etype, k, v in raw:
        if etype in ("insert", "update_postimage"):
            net[k] = ("upsert", v)
        elif etype == "delete":
            net[k] = ("delete", v)
    expected = {k: v for k, v in target.items() if k not in net}
    expected.update(
        {k: v for k, (op, v) in net.items() if op == "upsert"}
    )
    noop_only = all(
        op == "delete" and k not in target for k, (op, _v) in net.items()
    )

    ver = apply_changes_version(events, dst, ["k"])
    got = dict(_read_multiset(spark, dst, list_versions(spark, dst)[-1]))
    assert got == expected
    if not net or noop_only:
        assert ver is None, "no-op batch must not commit"
        return
    assert ver == 1

    # chained-mirror contract: the apply commit's OWN feed replays the
    # original target to the same final state
    replay = dict(target)
    own = sorted(
        ((r._commit_version,
          {"update_preimage": 0, "delete": 0,
           "insert": 1, "update_postimage": 1}[r._change_type]),
         r._change_type, r.k, r.v)
        for r in read_changes(spark, dst, 0, 1).collect()
    )
    for _o, etype, k, v in own:
        if etype == "insert":
            assert k not in replay
            replay[k] = v
        elif etype == "update_preimage":
            assert replay.get(k) == v
        elif etype == "update_postimage":
            replay[k] = v
        else:
            assert replay.pop(k, None) == v
    assert replay == expected
