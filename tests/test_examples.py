"""The shipped example configs (examples/*.toml) must load and run —
the dev/configs demo-profile contract from the reference
(vectorize-cli functional-test path over shipped TOML)."""

import glob
import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from vector_ray import run_pipeline, toml_io


def _run(path: str):
    spec = toml_io.load(path)
    return run_pipeline(spec.to_dict())


def test_log_pipeline_example(ray_session):
    shutil.rmtree("/tmp/vector_ray_examples/log_pipeline", ignore_errors=True)
    _run("examples/log_pipeline.toml")
    errors = pq.read_table("/tmp/vector_ray_examples/log_pipeline/errors")
    assert errors.num_rows > 0 and "level" in errors.column_names
    shapes = pq.read_table("/tmp/vector_ray_examples/log_pipeline/templates")
    assert shapes.num_rows > 0 and "template" in shapes.column_names


def test_telemetry_example(ray_session):
    shutil.rmtree("/tmp/vector_ray_examples/telemetry", ignore_errors=True)
    _run("examples/telemetry_windows.toml")
    enriched = pq.read_table("/tmp/vector_ray_examples/telemetry/enriched")
    assert enriched.num_rows == 1000
    assert {"session_id", "delta"} <= set(enriched.column_names)
    hourly = pq.read_table("/tmp/vector_ray_examples/telemetry/hourly")
    assert hourly.num_rows > 0 and "window_start" in hourly.column_names


def test_llm_curation_example(ray_session):
    shutil.rmtree("/tmp/vector_ray_examples/curation", ignore_errors=True)
    _run("examples/llm_curation.toml")
    out = pq.read_table("/tmp/vector_ray_examples/curation/docs")
    assert 0 < out.num_rows < 500  # bottom quartile dropped
    assert {"nll", "qbucket", "split"} <= set(out.column_names)
    assert set(out.column("qbucket").to_pylist()) <= {1, 2, 3}


def test_explain_plan_classification():
    from vector_ray import toml_io
    from vector_ray.explain import MOVEMENT, explain
    from vector_ray.stages import TRANSFORMS

    # every registered transform has a movement class (new transforms
    # must be classified here or they silently read as "narrow")
    missing = sorted(set(TRANSFORMS) - set(MOVEMENT))
    assert not missing, f"unclassified transforms: {missing}"

    spec = toml_io.load("examples/telemetry_windows.toml")
    text = explain(spec)
    assert "sessionize" in text and "[shuffle]" in text
    assert "window" in text and "[hybrid]" in text
    assert "2 full shuffle(s)" in text  # sessionize + lag_delta


def test_lineage_report(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from vector_ray import datagen
    from vector_ray.pipelines import flagship

    sys_path = __import__("sys").path
    if "tools" not in sys_path:
        sys_path.insert(0, "tools")
    from lineage_report import report

    seq = tmp_path / "seq"
    seq.mkdir()
    pq.write_table(datagen.generate_batch(0, 2000), str(seq / "s0.parquet"))
    pq.write_table(datagen.enrichment_table(), str(tmp_path / "e.parquet"))
    flagship.run(
        str(seq), str(tmp_path / "out"), str(tmp_path / "e.parquet"),
        flagship.FlagshipConfig(num_groups=2), resume=False,
    )
    text = report(str(tmp_path / "out"))
    assert "TOTAL" in text and "2,000" in text
    assert "per-stage NodeMetrics" in text


def test_compact_parquet_dir(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq2

    from vector_ray.functions.dataops import compact_parquet_dir

    # two leaf partitions, 6 tiny files each
    for part in ("route=a", "route=b"):
        d = tmp_path / "out" / part
        d.mkdir(parents=True)
        for i in range(6):
            pq2.write_table(
                pa.table({"x": pa.array([part, f"f{i}"] * 5)}),
                str(d / f"small-{i}.parquet"),
            )
    before = pq2.read_table(str(tmp_path / "out")).sort_by("x")
    s = compact_parquet_dir(str(tmp_path / "out"), target_rows_per_file=100)
    assert s["leaves"] == 2 and s["files_before"] == 12 and s["files_after"] == 2
    after = pq2.read_table(str(tmp_path / "out")).sort_by("x")
    assert before.equals(after)
    import glob as g

    assert len(g.glob(str(tmp_path / "out" / "*" / "*.parquet"))) == 2


def test_token_prep_example(ray_session):
    from vector_ray import datagen

    datagen.ensure_corpus("sf0.001")
    shutil.rmtree("/tmp/vector_ray_examples/token_prep", ignore_errors=True)
    _run("examples/token_prep.toml")
    train = pq.read_table("/tmp/vector_ray_examples/token_prep/train")
    assert 0 < train.num_rows <= 5000  # mixture downsampled
    assert max(train["n_tok"].to_pylist()) <= 512
    assert pa.types.is_int32(train["tokens"].type.value_type)
    ev = pq.read_table("/tmp/vector_ray_examples/token_prep/eval")
    assert ev.num_rows > 5000 and "win_id" in ev.column_names


def test_corpus_triage_example(ray_session):
    import pyarrow.parquet as pq
    import shutil

    shutil.rmtree("/tmp/vector_ray_examples/triage", ignore_errors=True)
    _run("examples/corpus_triage.toml")
    words = pq.read_table("/tmp/vector_ray_examples/triage/words")
    assert words.num_rows == 15
    assert words["provably_exact"].to_pylist() == [True] * 15
    sample = pq.read_table("/tmp/vector_ray_examples/triage/sample")
    assert sample.num_rows == 100


def test_click_graph_example(ray_session):
    import shutil

    shutil.rmtree("/tmp/vector_ray_examples/click_graph", ignore_errors=True)
    _run("examples/click_graph.toml")
    ranks = pq.read_table("/tmp/vector_ray_examples/click_graph/ranks")
    assert ranks.num_rows > 100  # users + items
    assert set(ranks.column_names) == {"node", "rank"}
    assert abs(sum(ranks["rank"].to_pylist()) - 1.0) < 1e-3
    hubs = pq.read_table("/tmp/vector_ray_examples/click_graph/hubs")
    assert {"node", "hub", "authority"} == set(hubs.column_names)
    assert hubs.num_rows == ranks.num_rows


def test_anomaly_alerting_example(ray_session):
    shutil.rmtree("/tmp/vector_ray_examples/anomaly", ignore_errors=True)
    _run("examples/anomaly_alerting.toml")
    alerts = pq.read_table("/tmp/vector_ray_examples/anomaly/alerts")
    assert alerts.num_rows > 0
    assert {"ewma_value", "cusum_value", "alert_value"} <= set(
        alerts.column_names
    )
    assert pc.min(alerts["alert_value"]).as_py() == 1  # filter kept alerts only
    now = pq.read_table("/tmp/vector_ray_examples/anomaly/now")
    assert {"event_type", "decayed_sum", "decayed_n"} <= set(now.column_names)
    ret = pq.read_table("/tmp/vector_ray_examples/anomaly/retention")
    assert {"cohort", "period", "n_users"} <= set(ret.column_names)
    assert ret.num_rows > 0


def test_posttraining_example(ray_session):
    from vector_ray import datagen

    datagen.ensure_corpus("sf0.001")
    shutil.rmtree("/tmp/vector_ray_examples/posttraining", ignore_errors=True)
    _run("examples/posttraining.toml")
    sft = pq.read_table("/tmp/vector_ray_examples/posttraining/sft")
    assert sft.num_rows > 0
    assert {"turn", "n_ctx", "tokens"} <= set(sft.column_names)
    assert pa.types.is_int32(sft["tokens"].type.value_type)
    assert max(len(t) for t in sft["tokens"].to_pylist()) <= 256
    dpo = pq.read_table("/tmp/vector_ray_examples/posttraining/dpo")
    assert dpo.num_rows > 0
    assert (min(dpo["gap"].to_pylist()) >= 8.0
            and {"chosen_id", "rejected_id"} <= set(dpo.column_names))
    adv = pq.read_table("/tmp/vector_ray_examples/posttraining/advantages")
    assert adv.num_rows == 5000 and "advantage" in adv.column_names


def test_privacy_release_example(ray_session):
    shutil.rmtree("/tmp/vector_ray_examples/privacy", ignore_errors=True)
    _run("examples/privacy_release.toml")
    audit = pq.read_table("/tmp/vector_ray_examples/privacy/audit")
    assert {"event_type", "vbucket", "n", "at_risk"} <= set(audit.column_names)
    assert audit.num_rows > 0
    release = pq.read_table("/tmp/vector_ray_examples/privacy/release")
    assert release.num_rows == 1000  # every event survives, cells masked
    masked = release.filter(pc.equal(release["event_type"], "*"))
    risky_n = pc.sum(
        audit.filter(audit["at_risk"])["n"]
    ).as_py() or 0
    assert masked.num_rows == risky_n  # suppression count == audit count
    out = pq.read_table("/tmp/vector_ray_examples/privacy/outliers")
    assert out.num_rows == 1000 and "hbos" in out.column_names


def test_contrastive_prep_example(ray_session):
    shutil.rmtree("/tmp/vector_ray_examples/contrastive", ignore_errors=True)
    _run("examples/contrastive_prep.toml")
    pairs = pq.read_table("/tmp/vector_ray_examples/contrastive/pairs")
    assert pairs.num_rows > 0
    assert {"doc_id", "i", "c", "ctx", "d"} <= set(pairs.column_names)
    negs = pq.read_table("/tmp/vector_ray_examples/contrastive/negatives")
    assert negs.num_rows == 2 * 500  # k=2 draws per sf0.001 document
    hard = pq.read_table("/tmp/vector_ray_examples/contrastive/hardneg")
    assert hard.num_rows > 0
    assert {"aid", "cand", "sim"} <= set(hard.column_names)


def test_vector_compat_example(ray_session):
    """Round-3 showcase: verbatim lua v2 block + watermark window + tap
    must run end-to-end from the shipped TOML."""
    spec = toml_io.load("examples/vector_compat.toml")
    from vector_ray.pipeline import run_pipeline as run_spec

    res = run_spec(spec)  # pass the spec object so taps survive
    assert res.sinks["out"].count > 0
    tbl = res.sinks["out"].table
    assert {"window_start", "n", "value_sum"} <= set(tbl.column_names)
    assert len(res.taps["lua_peek"]) == 5
    assert res.taps["lua_peek"][0]["tag"].endswith("-lua")
