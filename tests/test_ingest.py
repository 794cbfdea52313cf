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
