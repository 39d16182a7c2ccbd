"""Session-factory behavior: conf application must never silently skip.

A rejected runtime conf (static conf on some build, admin-locked
cluster conf) can be determinism-critical — UTC timezone, nanos
handling — so ``apply_runtime_confs`` records every rejection instead
of swallowing it.
"""

from __future__ import annotations

from unittest import mock

from my_feast_spark import session as session_mod
from my_feast_spark.session import RUNTIME_CONFS, apply_runtime_confs


def test_apply_runtime_confs_applies_cleanly(spark):
    warnings: list[str] = []
    rejected = apply_runtime_confs(spark, warnings)
    assert warnings == []
    assert rejected == []
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


def test_rejected_conf_surfaces_in_warnings(spark):
    # a static conf cannot be set on an active session -> must be
    # recorded (returned + appended to the caller's list), not swallowed
    bad = dict(RUNTIME_CONFS)
    bad["spark.sql.warehouse.dir"] = "/tmp/nope"
    warnings: list[str] = []
    with mock.patch.object(session_mod, "RUNTIME_CONFS", bad):
        rejected = apply_runtime_confs(spark, warnings)
    assert any("spark.sql.warehouse.dir" in w for w in warnings), warnings
    assert any("spark.sql.warehouse.dir" in w for w in rejected)
    # the settable confs still landed despite the rejection
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
