"""Per-partition checkpoint / lineage store.

The reference's deployment engine keeps per-agent pending/done rows in
SQLite so a deployment is resumable mid-flight
(deployment/mod.rs:505-514 ``get_next_pending_agent``), pins the config
at a git version (deployment/mod.rs:393-395), and records health/metrics
per agent. Our batch analog (SURVEY.md §4 "retries / resume unit"):

* a run directory holds ``manifest.json`` — config hash + input snapshot
  (the pinned-version analog);
* one JSON *marker* per completed partition group under ``_markers/``,
  written only after the group's output directory is atomically renamed
  into place — the marker carries the lineage record (input files, row
  counts per stage, per-sink route counts) and metrics (duration, bytes);
* resume = skip groups whose marker exists AND whose manifest hash
  matches; a changed config invalidates all markers (like a new git
  version requiring redeployment).

Output layout is idempotent per partition: each group writes to a
private temp dir and publishes with ``os.rename`` — a crashed run leaves
only unpublished temp dirs, which are swept on resume.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from dataclasses import dataclass


def config_hash(obj) -> str:
    return hashlib.sha256(
        json.dumps(obj, sort_keys=True, default=str).encode()
    ).hexdigest()[:16]


@dataclass
class CheckpointStore:
    run_dir: str

    @property
    def marker_dir(self) -> str:
        return os.path.join(self.run_dir, "_markers")

    def open(self, manifest: dict) -> bool:
        """Create/verify the run manifest. Returns True when resuming an
        existing compatible run; raises on config mismatch unless the
        caller clears the run dir."""
        os.makedirs(self.marker_dir, exist_ok=True)
        path = os.path.join(self.run_dir, "manifest.json")
        manifest = dict(manifest, config_hash=config_hash(manifest))
        if os.path.exists(path):
            with open(path) as f:
                existing = json.load(f)
            if existing["config_hash"] != manifest["config_hash"]:
                raise RuntimeError(
                    f"run dir {self.run_dir} was started with a different "
                    f"config ({existing['config_hash']} != "
                    f"{manifest['config_hash']}); clear it or use a new dir"
                )
            self._sweep_tmp()
            return True
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=2)
        os.rename(tmp, path)
        return False

    def read_manifest(self) -> dict | None:
        path = os.path.join(self.run_dir, "manifest.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def _sweep_tmp(self) -> None:
        for root, dirs, _ in os.walk(self.run_dir):
            for d in list(dirs):
                if d.startswith(".tmp-"):
                    shutil.rmtree(os.path.join(root, d), ignore_errors=True)
                    dirs.remove(d)

    def is_done(self, group_id: str) -> bool:
        return os.path.exists(os.path.join(self.marker_dir, f"{group_id}.json"))

    def mark_done(self, group_id: str, record: dict) -> None:
        record = dict(record, group_id=group_id, completed_at=time.time())
        tmp = os.path.join(self.marker_dir, f".{group_id}.tmp")
        with open(tmp, "w") as f:
            json.dump(record, f, indent=2, default=str)
        os.rename(tmp, os.path.join(self.marker_dir, f"{group_id}.json"))

    def records(self) -> dict[str, dict]:
        out = {}
        if not os.path.isdir(self.marker_dir):
            return out
        for name in sorted(os.listdir(self.marker_dir)):
            if name.endswith(".json"):
                with open(os.path.join(self.marker_dir, name)) as f:
                    out[name[:-5]] = json.load(f)
        return out

    def publish_dir(self, final_dir: str) -> "_AtomicDir":
        return _AtomicDir(final_dir)


class _AtomicDir:
    """Write into ``.tmp-<name>`` next to the target, rename on success."""

    def __init__(self, final_dir: str):
        self.final = final_dir
        parent = os.path.dirname(final_dir) or "."
        os.makedirs(parent, exist_ok=True)
        self.tmp = os.path.join(parent, f".tmp-{os.path.basename(final_dir)}")
        shutil.rmtree(self.tmp, ignore_errors=True)

    def __enter__(self) -> str:
        os.makedirs(self.tmp)
        return self.tmp

    def __exit__(self, exc_type, exc, tb) -> None:
        if exc_type is None:
            shutil.rmtree(self.final, ignore_errors=True)
            os.rename(self.tmp, self.final)
        else:
            shutil.rmtree(self.tmp, ignore_errors=True)
