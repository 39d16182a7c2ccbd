"""Local JSON registry — the engine's metadata store.

The reference keeps a serialized ``registry.db`` on blob storage with
created/updated timestamps per object (feature_store.yaml registry blocks;
listed output CASE.MD:276-279). Ours is a single JSON file with the same
observable behavior: apply upserts definitions and stamps timestamps;
list/get read them back; materialization intervals are tracked per view
(the reference's ``materialization_intervals`` in the registry repr,
chicago_taxi_trips_hourly_gold.ipynb:217).
"""

from __future__ import annotations

import datetime as dt
import json
import os
import tempfile

from my_feast_spark.core.model import (
    Entity,
    FeatureView,
    entity_from_dict,
    feature_view_from_dict,
    to_json_dict,
)


def _now() -> str:
    return dt.datetime.now(dt.timezone.utc).isoformat()


class RegistryConflictError(RuntimeError):
    """Another writer updated the registry since this process read it.

    Reload (``Registry.reload``) and re-apply the change."""


class Registry:
    def __init__(self, path: str, project: str = "default"):
        self.path = path
        self.project = project
        self._state = {
            "project": project, "version": 0,
            "entities": {}, "feature_views": {},
        }
        if os.path.exists(path):
            self.reload()

    def reload(self) -> None:
        """Re-read the on-disk state (after a RegistryConflictError)."""
        with open(self.path) as f:
            self._state = json.load(f)
        self._state.setdefault("version", 0)

    def _save(self) -> None:
        # Optimistic concurrency: every save checks the on-disk version
        # against the one this process last read/wrote and raises
        # instead of silently last-writer-wins dropping another
        # process's apply. DETECTION, not prevention — the check→write
        # window is not locked (local JSON registry; a multi-writer
        # deployment belongs on a transactional store) — but it turns a
        # lost update into a loud, retryable error for the common
        # read-modify-write race. Writes stay atomic (tmp + os.replace).
        if os.path.exists(self.path):
            with open(self.path) as f:
                disk_version = json.load(f).get("version", 0)
            if disk_version != self._state.get("version", 0):
                raise RegistryConflictError(
                    f"registry {self.path!r} changed underneath this "
                    f"process (disk version {disk_version}, ours "
                    f"{self._state.get('version', 0)}); reload() and "
                    "re-apply"
                )
        # bump the in-memory version only AFTER the replace commits, so
        # a failed write can't leave this process spuriously conflicted
        # with its own last-written file
        new_version = self._state.get("version", 0) + 1
        state = {**self._state, "version": new_version}
        os.makedirs(os.path.dirname(os.path.abspath(self.path)), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(os.path.abspath(self.path)))
        with os.fdopen(fd, "w") as f:
            json.dump(state, f, indent=2, default=str)
        os.replace(tmp, self.path)
        self._state["version"] = new_version

    # --- apply (M2) ---------------------------------------------------------
    def apply(self, objects) -> None:
        for obj in objects:
            if isinstance(obj, Entity):
                bucket, key = "entities", obj.name
            elif isinstance(obj, FeatureView):
                bucket, key = "feature_views", obj.name
            else:
                raise TypeError(f"cannot apply {type(obj).__name__}")
            existing = self._state[bucket].get(key)
            rec = to_json_dict(obj)
            rec["created_timestamp"] = (
                existing["created_timestamp"] if existing else _now()
            )
            rec["updated_timestamp"] = _now()
            if existing and bucket == "feature_views":
                rec["materialization_intervals"] = existing.get(
                    "materialization_intervals", []
                )
            self._state[bucket][key] = rec
        self._save()

    # --- list / get (M3, M4) ------------------------------------------------
    def list_entities(self) -> list[Entity]:
        return [entity_from_dict(d) for d in self._state["entities"].values()]

    def list_feature_views(self) -> list[FeatureView]:
        return [feature_view_from_dict(d) for d in self._state["feature_views"].values()]

    def get_entity(self, name: str) -> Entity:
        return entity_from_dict(self._state["entities"][name])

    def get_feature_view(self, name: str) -> FeatureView:
        return feature_view_from_dict(self._state["feature_views"][name])

    def get_metadata(self, bucket: str, name: str) -> dict:
        return dict(self._state[bucket][name])

    # --- materialization bookkeeping ---------------------------------------
    def record_materialization(self, view_name: str, start, end) -> None:
        rec = self._state["feature_views"][view_name]
        rec.setdefault("materialization_intervals", []).append(
            {"start": str(start), "end": str(end), "at": _now()}
        )
        self._save()
