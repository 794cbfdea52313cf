"""Micro-batch ingest for the generic spec DAG — the continuous-feed
mode of ``run_pipeline`` (the flagship pipeline has its own specialized
variant in ``pipelines/flagship.py run(ingest=True)``; this is the same
contract for ARBITRARY specs).

Call ``run_ingest(spec, state_dir)`` repeatedly (cron, a tailing loop):
each call lists the file-backed sources, diffs against the append-only
seen-file state, runs the DAG over ONLY the never-seen files, and lands
each parquet sink's output in a per-batch subdirectory. Files must be
immutable once listed (the standard log-shipping contract).

Exactly-once output without coordination:
* a PENDING intent record (batch id + exact file set) commits to the
  state file BEFORE any work, so a crashed batch replays exactly that
  file set even if new files landed in the meantime — the batch id is
  a content address (sha1 of the sorted file set) and stays stable;
* each parquet sink writes to ``<path>/batch-<id>.tmp`` then atomically
  renames to ``<path>/batch-<id>`` — a completed batch dir is never
  rewritten, and a half-written ``.tmp`` is deleted before the redo
  (Ray appends uuid-named files, so a dirty tmp would duplicate rows);
* the seen-file state commits LAST (tmp + rename) and clears the
  pending record. A crash between sink publish and state commit
  replays the same batch, finds every batch dir already published,
  skips the writes, and just commits state.

Aggregating transforms aggregate WITHIN a micro-batch (documented —
cross-batch rollups belong downstream, over the landed batch dirs).
Static sources (inline, demo_logs) re-evaluate every batch: they are
the enrichment-table pattern, not a data feed; a spec whose sources are
ALL static has no notion of "new data" and is rejected.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
from typing import Any

from vector_ray.pipeline import PipelineContext, PipelineSpec, run_pipeline

# source types whose data is an on-disk file set we can diff
FILE_SOURCES = {"parquet", "json", "csv", "text"}

_STATE_NAME = "ingest_state.json"


def _list_files(options: dict) -> list[str]:
    """Expand a file source's path/paths into a concrete sorted file
    list (dir → its files, glob → matches, file → itself)."""
    raw = options.get("paths") or options["path"]
    pats = [raw] if isinstance(raw, str) else list(raw)
    out: set[str] = set()
    for p in pats:
        if os.path.isdir(p):
            for f in glob.glob(os.path.join(p, "*")):
                if os.path.isfile(f):
                    out.add(os.path.abspath(f))
        elif any(ch in p for ch in "*?["):
            for f in glob.glob(p):
                if os.path.isfile(f):
                    out.add(os.path.abspath(f))
        elif os.path.isfile(p):
            out.add(os.path.abspath(p))
    return sorted(out)


def _load_state(state_dir: str) -> dict:
    path = os.path.join(state_dir, _STATE_NAME)
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {"seen": {}, "batches": []}


def _commit_state(state_dir: str, state: dict) -> None:
    path = os.path.join(state_dir, _STATE_NAME)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f, indent=1, sort_keys=True)
    os.replace(tmp, path)  # atomic on POSIX


def run_ingest(
    spec,
    state_dir: str,
    ctx: PipelineContext | None = None,
    replay_batch: str | None = None,
) -> dict[str, Any]:
    """One micro-batch: process files never seen by this state_dir.

    Returns a summary dict: ``skipped`` (no new files), ``batch_id``,
    ``new_files`` per source, and the per-sink ``RunResult`` info for
    the executed batch.

    ``replay_batch`` reprocesses one ALREADY-COMMITTED batch id through
    the (possibly fixed) spec: its published batch dirs are removed and
    rebuilt from the recorded file set; seen-file state is untouched,
    so normal ingest continues where it left off. The ops story for
    "a bug shipped in batch N" — fix the transform, replay N."""
    spec = (
        spec if isinstance(spec, PipelineSpec) else PipelineSpec.from_dict(spec)
    )
    # (run_pipeline validates the batch spec; nothing to pre-check here)
    os.makedirs(state_dir, exist_ok=True)
    state = _load_state(state_dir)

    file_sources = {
        name: cfg
        for name, cfg in spec.sources.items()
        if cfg.get("type") in FILE_SOURCES
    }
    if not file_sources:
        raise ValueError(
            "run_ingest: no file-backed source (parquet/json/csv/text) in "
            "the spec — nothing defines 'new data'. Use run_pipeline for "
            "one-shot specs."
        )

    if replay_batch is not None:
        rec = next(
            (b for b in state["batches"] if b["batch_id"] == replay_batch),
            None,
        )
        if rec is None:
            raise ValueError(
                f"run_ingest: no committed batch {replay_batch!r} in "
                f"{state_dir} (known: "
                f"{[b['batch_id'] for b in state['batches']]})"
            )
        if not isinstance(next(iter(rec["files"].values())), list):
            raise ValueError(
                "run_ingest: this batch predates file-list tracking and "
                "cannot be replayed"
            )
        batch_id = replay_batch
        new_files = {n: list(f) for n, f in rec["files"].items()}
        # NOTE: the old published dirs are NOT torn down here — the
        # rebuild lands in batch-<id>.tmp and only replaces the old dir
        # at publish time, so a crash mid-replay leaves the original
        # output intact (and a crash inside the tiny swap window leaves
        # the complete .tmp, re-runnable).
    elif state.get("pending"):
        # a previous attempt crashed between starting this batch and
        # committing it: replay EXACTLY its recorded file set (files
        # that arrived since wait for the next call) so the batch id —
        # and therefore the published batch dirs — are identical
        pending = state["pending"]
        batch_id = pending["batch_id"]
        new_files = {n: list(f) for n, f in pending["files"].items()}
    else:
        new_files = {}
        for name, cfg in file_sources.items():
            seen = set(state["seen"].get(name, []))
            new_files[name] = [f for f in _list_files(cfg) if f not in seen]

        if not any(new_files.values()):
            return {
                "skipped": True, "batch_id": None, "new_files": {}, "sinks": {}
            }
        for name, files in new_files.items():
            if not files:
                # a stale source can't feed this batch: replaying its
                # seen files duplicates rows downstream, and an empty
                # read can't compile. Multi-feed specs advance together.
                raise ValueError(
                    f"run_ingest: source {name!r} has no new files while "
                    "another source does — split the spec into one ingest "
                    "pipeline per independent feed."
                )

        h = hashlib.sha1()
        for name in sorted(new_files):
            for f in new_files[name]:
                h.update(f"{name}\0{f}\n".encode())
        batch_id = h.hexdigest()[:12]
        # intent record BEFORE any work: pins this file set to this
        # batch id across crashes (exactly-once even if new files land
        # between a crash and the retry)
        state["pending"] = {"batch_id": batch_id, "files": new_files}
        _commit_state(state_dir, state)

    # rewrite the spec: file sources read ONLY the new files; parquet
    # sinks land in an atomic per-batch subdirectory
    import copy

    batch_spec = PipelineSpec.from_dict(copy.deepcopy(spec.to_dict()))
    run_src = dict(batch_spec.sources)
    for name, files in new_files.items():
        cfg = dict(run_src[name])
        cfg.pop("path", None)
        cfg["paths"] = files
        run_src[name] = cfg
    batch_spec.sources = run_src

    publishes: list[tuple[str, str]] = []  # (tmp_dir, final_dir)
    run_sinks = dict(batch_spec.sinks)
    for name, cfg in run_sinks.items():
        # "file" is an alias of the parquet sink in SINKS — both get
        # the atomic per-batch treatment
        if cfg.get("type") in ("parquet", "file"):
            cfg = dict(cfg)
            final = os.path.join(cfg["path"], f"batch-{batch_id}")
            tmp = final + ".tmp"
            if replay_batch is None and os.path.exists(final):
                # crash replay: this sink already published this batch
                # (a deliberate replay REBUILDS instead)
                cfg["__already_published"] = True
            elif os.path.exists(tmp):
                # half-written leftover from a crashed attempt — Ray
                # appends uuid-named files, so a rerun into a dirty tmp
                # would duplicate rows; discard and redo
                import shutil

                shutil.rmtree(tmp)
            cfg["path"] = tmp
            publishes.append((tmp, final))
            run_sinks[name] = cfg
        elif cfg.get("type") in ("csv", "json"):
            raise ValueError(
                f"run_ingest: sink {name!r} (type {cfg['type']!r}) is not "
                "idempotent under batch replay — use a parquet sink for "
                "ingest pipelines."
            )
    batch_spec.sinks = {
        n: {k: v for k, v in c.items() if k != "__already_published"}
        for n, c in run_sinks.items()
        if not c.get("__already_published")
    }

    sinks_info: dict[str, Any] = {}
    if batch_spec.sinks:
        result = run_pipeline(batch_spec, ctx)
        sinks_info = {
            n: {"kind": r.kind, "count": r.count, "path": r.path}
            for n, r in result.sinks.items()
        }
    for tmp, final in publishes:
        if os.path.exists(final):
            if replay_batch is None:
                continue  # published by a previous attempt
            if os.path.exists(tmp):
                # replay swap: drop the superseded output only once the
                # full rebuild is sitting next to it
                import shutil

                shutil.rmtree(final)
        if os.path.exists(tmp):
            os.replace(tmp, final)  # atomic publish
    # point reported paths at the published location
    for info in sinks_info.values():
        if info.get("path", "").endswith(".tmp"):
            info["path"] = info["path"][: -len(".tmp")]

    if replay_batch is None:
        # commit point: only now do the files count as seen (and the
        # pending intent record clears). A replay changes no state —
        # the batch was already committed.
        state = _load_state(state_dir)
        for name, files in new_files.items():
            state["seen"].setdefault(name, []).extend(files)
        # full file lists, not counts: they are what makes a batch
        # re-processable later (replay_batch)
        state["batches"].append({"batch_id": batch_id, "files": new_files})
        state.pop("pending", None)
        _commit_state(state_dir, state)

    return {
        "skipped": False,
        "batch_id": batch_id,
        "replayed": replay_batch is not None,
        "new_files": {n: len(f) for n, f in new_files.items()},
        "sinks": sinks_info,
    }


# ---------------------------------------------------------------------------
# Snapshots — consistent reads over the batch store while ingest runs.
#
# A published ``batch-<id>`` dir is immutable (only a deliberate
# ``replay_batch`` repair rewrites one), so a point-in-time list of
# committed batch dirs IS a consistent table snapshot: readers pinned
# to a manifest never see a half-landed batch, and new batches landing
# concurrently never shift their row set — the same isolation contract
# a lakehouse manifest (Iceberg/Delta snapshot) gives, built from the
# exactly-once machinery above.
# ---------------------------------------------------------------------------

_SNAP_DIR = "snapshots"


def snapshot(spec, state_dir: str) -> dict[str, Any]:
    """Record a point-in-time manifest of every parquet sink's
    COMMITTED batch dirs (state is the source of truth: a batch dir
    published by a crashed attempt whose state never committed is not
    visible). Atomic write to ``state_dir/snapshots/snap-<n>.json``,
    monotonically numbered."""
    spec = (
        spec if isinstance(spec, PipelineSpec) else PipelineSpec.from_dict(spec)
    )
    state = _load_state(state_dir)
    batch_ids = [b["batch_id"] for b in state["batches"]]
    sinks: dict[str, list[str]] = {}
    for name, cfg in spec.sinks.items():
        if cfg.get("type") not in ("parquet", "file"):
            continue
        dirs = [
            os.path.join(cfg["path"], f"batch-{bid}")
            for bid in batch_ids
        ]
        sinks[name] = [d for d in dirs if os.path.isdir(d)]
    snap_dir = os.path.join(state_dir, _SNAP_DIR)
    os.makedirs(snap_dir, exist_ok=True)
    existing = sorted(glob.glob(os.path.join(snap_dir, "snap-*.json")))
    n = (
        int(os.path.basename(existing[-1])[5:-5]) + 1 if existing else 1
    )
    manifest = {
        "snapshot_id": n,
        "batch_ids": batch_ids,
        "sinks": sinks,
    }
    path = os.path.join(snap_dir, f"snap-{n:08d}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, path)
    manifest["path"] = path
    return manifest


def read_snapshot(manifest, sink: str):
    """Ray Dataset over exactly the batch dirs a manifest recorded for
    ``sink`` — stable row set no matter how many batches land after.
    ``manifest`` is the dict from ``snapshot()`` or a path to its JSON
    file."""
    import ray.data as rd

    if isinstance(manifest, str):
        with open(manifest) as f:
            manifest = json.load(f)
    if sink not in manifest["sinks"]:
        raise ValueError(
            f"read_snapshot: sink {sink!r} not in manifest (has: "
            f"{sorted(manifest['sinks'])})"
        )
    dirs = manifest["sinks"][sink]
    if not dirs:
        raise ValueError(
            f"read_snapshot: snapshot {manifest.get('snapshot_id')} has no "
            f"committed batches for sink {sink!r}"
        )
    # expand each batch dir to its files: read_parquet takes a mixed
    # file list directly, and a manifest pinned to concrete files is
    # immune to anything else landing in those dirs later
    files = [
        f
        for d in dirs
        for f in sorted(glob.glob(os.path.join(d, "*.parquet")))
    ]
    return rd.read_parquet(files)
