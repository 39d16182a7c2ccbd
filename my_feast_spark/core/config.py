"""feature_store.yaml repo config (M1).

The reference drives project name, registry location, provider, and
online/offline store settings from a ``feature_store.yaml`` in the repo
dir (infra/cloud/fs-cloud/station_reads_hourly_fs/feature_store.yaml:1-10;
the on-prem variants add ``offline_store.spark_conf``). This loader keeps
that surface with Spark-native semantics:

  * ``project`` — registry namespace (constructor arg still wins);
  * ``registry`` — string path or ``{path: ...}`` mapping; non-local URIs
    (the reference points at a blob-store registry) fall back to the
    repo-local registry file, since remote registry stores are explicitly
    out of scope (SURVEY non-goals) — loudly, via a warning attribute;
  * ``online_store`` — this engine's online store is a Parquet
    latest-per-key snapshot (type ``parquet``); any other type (the
    reference uses redis) is recorded but served by the same snapshot;
  * ``offline_store.spark_conf`` — applied to the session at attach time
  * ``offline_store.pit_strategy`` — default PIT join strategy for
    get_historical_features (union_window / sliced_window / range_join /
    auto); per-call ``strategy=`` overrides it
    (runtime ``spark.sql.*`` confs only; static JVM confs can't change on
    a live session and are skipped).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass
class RepoConfig:
    project: str = "default"
    provider: str = "local"
    registry_path: str | None = None  # resolved local path, or None
    online_store: dict = field(default_factory=dict)
    offline_store: dict = field(default_factory=dict)
    warnings: list[str] = field(default_factory=list)

    @property
    def spark_conf(self) -> dict:
        return dict(self.offline_store.get("spark_conf") or {})


def _is_local_path(p: str) -> bool:
    return "://" not in p or p.startswith("file://")


def load_repo_config(repo_path: str) -> RepoConfig | None:
    """Parse ``<repo_path>/feature_store.yaml`` if present, else None."""
    yaml_path = os.path.join(repo_path, "feature_store.yaml")
    if not os.path.exists(yaml_path):
        return None
    import yaml

    with open(yaml_path) as fh:
        raw = yaml.safe_load(fh) or {}

    cfg = RepoConfig(
        project=str(raw.get("project") or "default"),
        provider=str(raw.get("provider") or "local"),
        online_store=dict(raw.get("online_store") or {}),
        offline_store=dict(raw.get("offline_store") or {}),
    )

    reg = raw.get("registry")
    reg_path = reg.get("path") if isinstance(reg, dict) else reg
    if reg_path:
        reg_path = str(reg_path)
        if reg_path.startswith("file://"):
            reg_path = reg_path[len("file://"):]
        if _is_local_path(reg_path):
            cfg.registry_path = (
                reg_path if os.path.isabs(reg_path)
                else os.path.join(repo_path, reg_path)
            )
        else:
            cfg.warnings.append(
                f"non-local registry {reg_path!r} unsupported; using the "
                "repo-local registry file"
            )

    ostore_type = cfg.online_store.get("type")
    if ostore_type not in (None, "parquet"):
        cfg.warnings.append(
            f"online_store type {ostore_type!r} served by the Parquet "
            "latest-per-key snapshot store"
        )
    return cfg
