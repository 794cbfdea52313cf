"""Alert threshold evaluation (reference alerts/mod.rs:56-79) — pure
predicate checks over MetricsHub snapshots, plus the flagship wiring."""

import pyarrow.parquet as pq

from vector_ray.state.alerts import evaluate_alerts


def test_low_throughput_and_degraded():
    snap = {
        "parse": {"rows": 30, "bytes": 100, "batches": 10, "errors": 0},
        "enrich": {"rows": 6000, "bytes": 100, "batches": 10, "errors": 3},
    }
    fired = evaluate_alerts(
        snap,
        elapsed_s=60.0,
        min_events_per_minute=100.0,
        max_error_pct=20.0,
    )
    kinds = {(a.rule, a.component) for a in fired}
    assert ("LowThroughput", "parse") in kinds  # 30/min < 100
    assert ("GroupDegraded", "enrich") in kinds  # 30% > 20%
    assert ("LowThroughput", "enrich") not in kinds  # 6000/min ok
    assert all("ALERT" in str(a) for a in fired)


def test_high_latency_job_level():
    fired = evaluate_alerts({}, elapsed_s=12.0, max_latency_s=5.0)
    assert len(fired) == 1 and fired[0].rule == "HighLatency"
    assert evaluate_alerts({}, elapsed_s=2.0, max_latency_s=5.0) == []


def test_flagship_emits_alerts(ray_session, tmp_path):
    import os

    from vector_ray import datagen
    from vector_ray.pipelines import flagship

    seq = tmp_path / "seq"
    seq.mkdir()
    pq.write_table(datagen.generate_batch(0, 1200), str(seq / "s0.parquet"))
    pq.write_table(datagen.enrichment_table(), str(tmp_path / "e.parquet"))
    s = flagship.run(
        str(seq),
        str(tmp_path / "out"),
        str(tmp_path / "e.parquet"),
        flagship.FlagshipConfig(
            num_groups=1,
            # impossible floor -> every stage fires LowThroughput
            alert_min_events_per_minute=1e12,
        ),
    )
    assert s["alerts"] and any("LowThroughput" in a for a in s["alerts"])
    assert os.path.exists(str(tmp_path / "out" / "alerts.json"))
    # quiet thresholds -> no alerts, no file
    s2 = flagship.run(
        str(seq),
        str(tmp_path / "out2"),
        str(tmp_path / "e.parquet"),
        flagship.FlagshipConfig(num_groups=1, alert_max_latency_s=1e9),
    )
    assert s2["alerts"] == []
    assert not os.path.exists(str(tmp_path / "out2" / "alerts.json"))
