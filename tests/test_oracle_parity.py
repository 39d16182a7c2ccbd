"""Local mirror of the driver's t2 correctness gate.

Runs every workload query on Spark AND its DuckDB oracle at sf0.01 and
compares row multisets exactly (after sorting columns by name, like the
driver's value-hash). Any drift here would fail CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from my_feast_spark import workload
from my_feast_spark.sources.readers import TESTDATA_TABLES
from tests.conftest import SF_DIR_ORACLE


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR_ORACLE}/{t}.parquet'"
        )
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact compare; rounding already applied in the queries
        return v
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )


#: registered queries AND retired ones — retirement drops a query from
#: the driver's adjudication budget, never from local value-checking
ALL_ORACLE_QUERIES = {**workload.QUERIES, **workload.RETIRED_QUERIES}


@pytest.mark.parametrize("name", sorted(ALL_ORACLE_QUERIES))
def test_oracle_parity(spark, ddb, name):
    fn, sql = ALL_ORACLE_QUERIES[name]
    sql = workload.resolve_sql(sql)
    if sql is None:
        pytest.skip("no oracle (rows-only check)")
    sdf = fn(spark, SF_DIR_ORACLE)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    from my_feast_spark.operators.graph import release_checkpoint

    for c in getattr(sdf, "_owned_caches", ()):
        c.unpersist()
    for c in getattr(sdf, "_owned_checkpoints", ()):
        release_checkpoint(c)

    res = ddb.sql(sql)
    d_cols = res.columns
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs oracle {len(d_rows)}"
    )
    s_set = _rowset(s_cols, s_rows)
    d_set = _rowset(d_cols, d_rows)
    if s_set != d_set:
        diffs = [(a, b) for a, b in zip(s_set, d_set) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
