"""Flagship ingest mode (pipelines/flagship.py run(ingest=True)):
micro-batch continuous feed — only never-seen shards process, finished
groups' markers stay valid, aggregates always cover the whole corpus
so far, and a no-new-data call is a no-op."""

import glob
import json
import os

import pyarrow.parquet as pq
import pytest

from vector_ray import datagen
from vector_ray.pipelines import flagship


def _mk_shards(d, start, n_shards, rows=800):
    os.makedirs(d, exist_ok=True)
    for i in range(start, start + n_shards):
        pq.write_table(
            datagen.generate_batch(i * rows, rows),
            os.path.join(d, f"shard-{i:05d}.parquet"),
        )


def _agg(path):
    return pq.read_table(path).sort_by(
        [("sink", "ascending"), ("source", "ascending")]
    )


def test_ingest_micro_batches(ray_session, tmp_path):
    seq = str(tmp_path / "seq")
    out = str(tmp_path / "out")
    enrich = str(tmp_path / "enrich.parquet")
    pq.write_table(datagen.enrichment_table(), enrich)
    cfg = flagship.FlagshipConfig(num_groups=2, collect_metrics=False)

    # batch 1: two shards
    _mk_shards(seq, 0, 2)
    s1 = flagship.run(seq, out, enrich, cfg, ingest=True)
    assert s1["groups"] == 2 and s1["groups_skipped"] == 0
    agg1 = _agg(os.path.join(out, "aggregates.parquet"))
    assert agg1.num_rows > 0

    # no new data: every group skips, aggregates unchanged
    s2 = flagship.run(seq, out, enrich, cfg, ingest=True)
    assert s2["groups"] == 2 and s2["groups_skipped"] == 2
    assert s2["rows_this_run"] == 0
    assert _agg(os.path.join(out, "aggregates.parquet")).equals(agg1)

    # batch 2: two more shards -> only the new groups run
    markers_before = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(out, "_markers", "*.json"))
    }
    _mk_shards(seq, 2, 2)
    s3 = flagship.run(seq, out, enrich, cfg, ingest=True)
    assert s3["groups"] == 4 and s3["groups_skipped"] == 2
    # finished groups were not reprocessed (markers untouched)
    for p, mtime in markers_before.items():
        assert os.path.getmtime(p) == mtime, p

    # the running aggregate equals a fresh batch run over ALL shards
    batch_out = str(tmp_path / "batch")
    flagship.run(seq, batch_out, enrich, cfg)
    assert _agg(os.path.join(out, "aggregates.parquet")).equals(
        _agg(os.path.join(batch_out, "aggregates.parquet"))
    )

    # group assignment is append-only and covers exactly the input set
    gmap = json.load(open(os.path.join(out, "ingest_groups.json")))
    assigned = sorted(f for fs in gmap.values() for f in fs)
    assert assigned == sorted(glob.glob(os.path.join(seq, "*.parquet")))


def test_ingest_rejects_config_drift(ray_session, tmp_path):
    seq = str(tmp_path / "seq")
    out = str(tmp_path / "out")
    enrich = str(tmp_path / "enrich.parquet")
    pq.write_table(datagen.enrichment_table(), enrich)
    _mk_shards(seq, 0, 1)
    flagship.run(
        seq, out, enrich,
        flagship.FlagshipConfig(num_groups=1, collect_metrics=False),
        ingest=True,
    )
    drifted = flagship.FlagshipConfig(
        num_groups=1, collect_metrics=False,
        routes={"everything": "true"},
    )
    with pytest.raises(Exception, match="config"):
        flagship.run(seq, out, enrich, drifted, ingest=True)


def _mk_shard(path, start, n):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "id": pa.array(range(start, start + n), pa.int64()),
            "level": pa.array(
                ["error" if i % 3 == 0 else "info" for i in range(start, start + n)],
                pa.string(),
            ),
        }
    )
    pq.write_table(t, path)


def _spec(src_dir, out_dir):
    return {
        "sources": {"logs": {"type": "parquet", "path": src_dir}},
        "transforms": {
            "errs": {"type": "filter", "inputs": ["logs"],
                     "condition": '.level == "error"'}
        },
        "sinks": {"out": {"type": "parquet", "inputs": ["errs"],
                          "path": out_dir}},
    }


def test_spec_dag_ingest_batches(ray_session, tmp_path):
    """Each run_ingest call processes only never-seen files into an
    atomic per-batch dir; a call with nothing new is a no-op."""
    import glob

    import pyarrow.parquet as pq

    from vector_ray.ingest import run_ingest

    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    state = str(tmp_path / "state")
    spec = _spec(str(src), out)

    _mk_shard(str(src / "a.parquet"), 0, 30)
    s1 = run_ingest(spec, state)
    assert not s1["skipped"] and s1["new_files"] == {"logs": 1}
    b1 = glob.glob(out + "/batch-*")
    assert len(b1) == 1 and not b1[0].endswith(".tmp")
    rows1 = pq.read_table(b1[0]).num_rows
    assert rows1 == 10  # ids 0,3,...,27

    _mk_shard(str(src / "b.parquet"), 30, 30)
    s2 = run_ingest(spec, state)
    assert s2["batch_id"] != s1["batch_id"]
    b2 = sorted(glob.glob(out + "/batch-*"))
    assert len(b2) == 2
    total = sum(pq.read_table(b).num_rows for b in b2)
    assert total == 20  # no replay of shard a

    s3 = run_ingest(spec, state)
    assert s3["skipped"] and s3["sinks"] == {}
    assert len(glob.glob(out + "/batch-*")) == 2


def test_spec_dag_ingest_crash_replay(ray_session, tmp_path):
    """A batch whose sink published but whose state commit was lost is
    replayed idempotently: the published dir is left untouched and the
    state commits."""
    import glob
    import json
    import os

    import pyarrow.parquet as pq

    from vector_ray.ingest import run_ingest

    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    state = str(tmp_path / "state")
    spec = _spec(str(src), out)

    _mk_shard(str(src / "a.parquet"), 0, 30)
    s1 = run_ingest(spec, state)
    batch_dir = glob.glob(out + "/batch-*")[0]
    stamp = sorted(os.listdir(batch_dir))
    # simulate the crash: roll the state back to before the commit
    os.remove(os.path.join(state, "ingest_state.json"))
    s2 = run_ingest(spec, state)
    assert s2["batch_id"] == s1["batch_id"]  # content-addressed replay
    assert sorted(os.listdir(batch_dir)) == stamp  # untouched, not rewritten
    st = json.load(open(os.path.join(state, "ingest_state.json")))
    assert len(st["seen"]["logs"]) == 1
    run3 = run_ingest(spec, state)
    assert run3["skipped"]


def test_spec_dag_ingest_requires_file_source(ray_session, tmp_path):
    import pytest

    from vector_ray.ingest import run_ingest

    spec = {
        "sources": {"l": {"type": "demo_logs", "count": 10}},
        "transforms": {},
        "sinks": {"s": {"type": "blackhole", "inputs": ["l"]}},
    }
    with pytest.raises(ValueError, match="file-backed"):
        run_ingest(spec, str(tmp_path / "st"))


def test_spec_dag_ingest_pending_pins_file_set(ray_session, tmp_path):
    """A crash after the pending record but before completion replays
    EXACTLY the recorded file set (a file that arrived in between waits
    for the next batch), and a dirty .tmp dir is discarded, not
    appended to."""
    import glob
    import json
    import os

    import pyarrow.parquet as pq

    from vector_ray.ingest import run_ingest

    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    state = str(tmp_path / "state")
    spec = _spec(str(src), out)

    _mk_shard(str(src / "a.parquet"), 0, 30)
    s1 = run_ingest(spec, state)

    # simulate: crash mid-batch for shard b — pending recorded, sink
    # half-written, state not committed
    _mk_shard(str(src / "b.parquet"), 30, 30)
    st = json.load(open(os.path.join(state, "ingest_state.json")))
    st["pending"] = {
        "batch_id": "deadbeef0000",
        "files": {"logs": [os.path.abspath(str(src / "b.parquet"))]},
    }
    json.dump(st, open(os.path.join(state, "ingest_state.json"), "w"))
    dirty = os.path.join(out, "batch-deadbeef0000.tmp")
    os.makedirs(dirty)
    open(os.path.join(dirty, "junk.parquet"), "w").write("junk")
    # a THIRD shard arrives before the retry
    _mk_shard(str(src / "c.parquet"), 60, 30)

    s2 = run_ingest(spec, state)
    assert s2["batch_id"] == "deadbeef0000"  # pending pinned the batch
    assert s2["new_files"] == {"logs": 1}  # only b, not c
    pub = os.path.join(out, "batch-deadbeef0000")
    files = os.listdir(pub)
    assert "junk.parquet" not in files  # dirty tmp discarded
    assert pq.read_table(pub).num_rows == 10  # exactly shard b's errors

    s3 = run_ingest(spec, state)  # c lands in its own batch
    assert not s3["skipped"] and s3["new_files"] == {"logs": 1}
    total = sum(
        pq.read_table(b).num_rows for b in glob.glob(out + "/batch-*")
    )
    assert total == 30  # 3 shards x 10 error rows, no dupes


def test_spec_dag_ingest_rejects_nonidempotent_sinks(ray_session, tmp_path):
    import pytest

    from vector_ray.ingest import run_ingest

    src = tmp_path / "src"
    src.mkdir()
    _mk_shard(str(src / "a.parquet"), 0, 10)
    spec = {
        "sources": {"logs": {"type": "parquet", "path": str(src)}},
        "transforms": {},
        "sinks": {"out": {"type": "csv", "inputs": ["logs"],
                          "path": str(tmp_path / "o")}},
    }
    with pytest.raises(ValueError, match="not\\s+idempotent"):
        run_ingest(spec, str(tmp_path / "st"))


def test_spec_dag_ingest_replay_batch(ray_session, tmp_path):
    """replay_batch rebuilds one committed batch through a FIXED spec
    (its dirs are torn down and republished); seen-file state is
    untouched so normal ingest continues, and other batches keep their
    old outputs."""
    import glob
    import json
    import os

    import pyarrow.parquet as pq
    import pytest

    from vector_ray.ingest import run_ingest

    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    state = str(tmp_path / "state")
    spec = _spec(str(src), out)

    _mk_shard(str(src / "a.parquet"), 0, 30)
    s1 = run_ingest(spec, state)
    _mk_shard(str(src / "b.parquet"), 30, 30)
    s2 = run_ingest(spec, state)
    d1 = os.path.join(out, f"batch-{s1['batch_id']}")
    d2 = os.path.join(out, f"batch-{s2['batch_id']}")
    assert pq.read_table(d1).num_rows == 10

    # "bug fix": the replayed spec keeps info rows instead of errors
    fixed = json.loads(json.dumps(spec))
    fixed["transforms"]["errs"]["condition"] = '.level == "info"'
    r = run_ingest(fixed, state, replay_batch=s1["batch_id"])
    assert r["replayed"] and r["batch_id"] == s1["batch_id"]
    assert pq.read_table(d1).num_rows == 20  # rebuilt under the fix
    assert pq.read_table(d2).num_rows == 10  # untouched

    # state unchanged: nothing new to ingest, replay not re-recorded
    s3 = run_ingest(spec, state)
    assert s3["skipped"]
    st = json.load(open(os.path.join(state, "ingest_state.json")))
    assert len(st["batches"]) == 2

    with pytest.raises(ValueError, match="no committed batch"):
        run_ingest(spec, state, replay_batch="nope00000000")


def test_spec_dag_ingest_replay_failure_keeps_old_output(ray_session, tmp_path):
    """A replay whose pipeline fails leaves the originally published
    batch dir untouched (the rebuild lands in .tmp and only swaps in at
    publish time)."""
    import glob
    import os

    import pyarrow.parquet as pq
    import pytest

    from vector_ray.ingest import run_ingest

    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    state = str(tmp_path / "state")
    spec = _spec(str(src), out)
    _mk_shard(str(src / "a.parquet"), 0, 30)
    s1 = run_ingest(spec, state)
    d1 = os.path.join(out, f"batch-{s1['batch_id']}")
    before = pq.read_table(d1)

    broken = {**spec, "transforms": {
        "errs": {"type": "filter", "inputs": ["logs"],
                 "condition": '.level =='}}}  # bad VRL -> run fails
    with pytest.raises(Exception):
        run_ingest(broken, state, replay_batch=s1["batch_id"])
    assert pq.read_table(d1).equals(before)  # old output intact
    # and a subsequent good replay still works
    r = run_ingest(spec, state, replay_batch=s1["batch_id"])
    assert r["replayed"]
    assert pq.read_table(d1).num_rows == 10
    assert not glob.glob(out + "/*.tmp")


def test_spec_dag_ingest_snapshot_isolation(ray_session, tmp_path):
    """snapshot() pins a point-in-time set of committed batch dirs;
    read_snapshot over that manifest returns the same rows no matter
    how many batches land afterwards, and only STATE-committed batches
    are visible (a stray published dir without a state record is not)."""
    import json
    import os

    from vector_ray.ingest import read_snapshot, run_ingest, snapshot

    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    state = str(tmp_path / "state")
    spec = _spec(str(src), out)

    _mk_shard(str(src / "a.parquet"), 0, 30)
    run_ingest(spec, state)
    _mk_shard(str(src / "b.parquet"), 30, 30)
    run_ingest(spec, state)

    # a published dir with no committed state record must stay invisible
    stray = os.path.join(out, "batch-straystray00")
    os.makedirs(stray)

    m1 = snapshot(spec, state)
    assert m1["snapshot_id"] == 1
    assert len(m1["sinks"]["out"]) == 2
    assert stray not in m1["sinks"]["out"]
    assert read_snapshot(m1, "out").count() == 20

    # a third batch lands — the pinned manifest's row set is unchanged
    _mk_shard(str(src / "c.parquet"), 60, 30)
    run_ingest(spec, state)
    assert read_snapshot(m1, "out").count() == 20
    # ...loading the manifest from its JSON path gives the same view
    assert read_snapshot(m1["path"], "out").count() == 20

    m2 = snapshot(spec, state)
    assert m2["snapshot_id"] == 2
    assert read_snapshot(m2, "out").count() == 30

    import pytest

    with pytest.raises(ValueError, match="not in manifest"):
        read_snapshot(m1, "nope")
