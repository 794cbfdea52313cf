"""Dead-letter quarantine and per-stage lineage metrics in the flagship
checkpoint markers."""

import json
import os

import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from vector_ray import datagen
from vector_ray.pipelines import flagship


def test_dead_letter_and_stage_metrics(ray_session, tmp_path):
    good = datagen.generate_batch(0, 500)
    # corrupt 50 messages: no level=/status= keys → unparseable
    bad_msgs = pa.array(
        [f"garbled frame #{i}" for i in range(50)]
        + good["message"].to_pylist()[50:],
        pa.string(),
    )
    corrupt = good.set_column(
        good.column_names.index("message"), "message", bad_msgs
    )
    seq_dir = tmp_path / "seq"
    seq_dir.mkdir()
    pq.write_table(corrupt, seq_dir / "shard-00000.parquet")
    enrich_path = tmp_path / "enrich.parquet"
    pq.write_table(datagen.enrichment_table(), enrich_path)

    out_dir = str(tmp_path / "out")
    summary = flagship.run(
        str(seq_dir),
        out_dir,
        str(enrich_path),
        flagship.FlagshipConfig(num_groups=1, dead_letter=True),
    )
    assert summary["rows_total"] == 500

    # quarantined rows land in their own route partition
    dl_dir = os.path.join(out_dir, "routed", "group-00000", "route=_deadletter")
    assert os.path.isdir(dl_dir)
    dl = pads.dataset(dl_dir, format="parquet").to_table()
    assert dl.num_rows == 50
    # byte-exact tokens survive the quarantine path too
    assert dl.schema.field("tokens").type == pa.list_(pa.int32())

    # marker carries route counts incl. dead letter + per-stage metrics
    with open(os.path.join(out_dir, "_markers", "group-00000.json")) as f:
        marker = json.load(f)
    assert marker["route_rows"]["_deadletter"] == 50
    sm = marker["stage_metrics"]
    assert sm["parse"]["rows"] == 500
    assert sm["enrich"]["rows"] == 500
    assert sm["route"]["rows"] == 500
    assert sm["parse"]["bytes"] > 0

    # run-level settled metrics.json exists and matches
    with open(os.path.join(out_dir, "metrics.json")) as f:
        metrics = json.load(f)
    assert metrics["group-00000/route"]["rows"] == 500


def test_prometheus_exposition_format():
    from vector_ray.state.metrics import to_prometheus

    snap = {
        "parse": {"rows": 100, "bytes": 2048, "batches": 4, "errors": 0},
        'we"ird': {"rows": 1, "bytes": 2, "batches": 1, "errors": 1},
    }
    text = to_prometheus(snap)
    assert text.endswith("\n")
    assert '# TYPE vector_ray_rows_total counter' in text
    assert 'vector_ray_rows_total{component="parse"} 100' in text
    assert 'vector_ray_errors_total{component="we\\"ird"} 1' in text
    # every non-comment line: metric{label} value
    for line in text.strip().split("\n"):
        if line.startswith("#"):
            continue
        assert "} " in line and line.startswith("vector_ray_")
