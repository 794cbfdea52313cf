"""E2E golden test: flagship parse→enrich→route→aggregate vs the
single-process oracle, plus the resume-from-checkpoint test
(SURVEY.md §5 'our port of this strategy').
"""

import json
import os

import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest

from vector_ray import datagen
from vector_ray.oracle import flagship_oracle
from vector_ray.pipelines import flagship
from vector_ray.schema import assert_tokens_int32


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    seq_dir = root / "sequences"
    seq_dir.mkdir()
    n, shards = 4000, 4
    per = n // shards
    tables = []
    for i in range(shards):
        t = datagen.generate_batch(i * per, per)
        pq.write_table(t, seq_dir / f"shard-{i:05d}.parquet")
        tables.append(t)
    enrich = datagen.enrichment_table()
    pq.write_table(enrich, root / "enrichment.parquet")
    full = pa.concat_tables(tables)
    return {
        "seq_dir": str(seq_dir),
        "enrich_path": str(root / "enrichment.parquet"),
        "table": full,
        "enrich": enrich,
    }


def read_routed(routed_dir: str) -> dict[str, dict[str, tuple]]:
    ds = pads.dataset(routed_dir, format="parquet", partitioning="hive")
    tbl = ds.to_table()
    assert_tokens_int32(tbl)
    out: dict[str, dict[str, tuple]] = {}
    routes = tbl["route"].to_pylist()
    docs = tbl["doc_id"].to_pylist()
    sources = tbl["source"].to_pylist()
    tokens = tbl["tokens"].to_pylist()
    for route, doc, src, toks in zip(routes, docs, sources, tokens):
        out.setdefault(str(route), {})[doc] = (src, tuple(toks))
    return out


def test_flagship_matches_oracle(ray_session, corpus, tmp_path):
    out_dir = str(tmp_path / "run1")
    summary = flagship.run(
        corpus["seq_dir"], out_dir, corpus["enrich_path"],
        flagship.FlagshipConfig(num_groups=2, enrich_concurrency=2),
    )
    assert summary["rows_total"] == 4000

    routed_expected, agg_expected = flagship_oracle(
        corpus["table"], corpus["enrich"]
    )
    routed_actual = read_routed(summary["routed_dir"])

    # routed-row set equality, keyed by doc_id, byte-exact tokens
    assert set(routed_actual) == set(routed_expected)
    for sink in routed_expected:
        assert routed_actual[sink] == routed_expected[sink], f"sink {sink}"

    agg_actual = pq.read_table(summary["aggregates"]).to_pandas()
    assert agg_actual.to_dict("records") == agg_expected.to_dict("records")


def test_flagship_resume_skips_done_groups(ray_session, corpus, tmp_path):
    out_dir = str(tmp_path / "run2")
    cfg = flagship.FlagshipConfig(num_groups=4, enrich_concurrency=2)
    first = flagship.run(corpus["seq_dir"], out_dir, corpus["enrich_path"], cfg)
    assert first["groups_skipped"] == 0

    # simulate a crash after 2 groups: delete 2 markers + their outputs
    marker_dir = os.path.join(out_dir, "_markers")
    markers = sorted(os.listdir(marker_dir))
    assert len(markers) == 4
    with open(os.path.join(marker_dir, markers[0])) as f:
        record = json.load(f)
    assert record["rows"] > 0 and record["route_rows"]
    for m in markers[2:]:
        with open(os.path.join(marker_dir, m)) as f:
            rec = json.load(f)
        os.remove(os.path.join(marker_dir, m))
        import shutil

        shutil.rmtree(rec["routed_dir"], ignore_errors=True)
        os.remove(rec["agg_part"])

    second = flagship.run(corpus["seq_dir"], out_dir, corpus["enrich_path"], cfg)
    assert second["groups_skipped"] == 2          # untouched groups not rerun
    assert second["rows_this_run"] < first["rows_this_run"]
    assert second["rows_total"] == 4000           # final output identical

    routed_expected, agg_expected = flagship_oracle(
        corpus["table"], corpus["enrich"]
    )
    agg_actual = pq.read_table(second["aggregates"]).to_pandas()
    assert agg_actual.to_dict("records") == agg_expected.to_dict("records")


def test_flagship_config_change_rejected(ray_session, corpus, tmp_path):
    out_dir = str(tmp_path / "run3")
    cfg = flagship.FlagshipConfig(num_groups=2)
    flagship.run(corpus["seq_dir"], out_dir, corpus["enrich_path"], cfg)
    changed = flagship.FlagshipConfig(
        num_groups=2, routes={"errors": '.level == "error"'}
    )
    with pytest.raises(RuntimeError, match="different config"):
        flagship.run(corpus["seq_dir"], out_dir, corpus["enrich_path"], changed)
