"""Within-run fault tolerance: SIGKILL a busy Ray worker process while
the flagship pipeline is executing and assert the job still completes
with byte-identical aggregates (Ray re-executes lost tasks; lineage +
deterministic stages make the retry converge). This is the single-node
stand-in for losing a node mid-job on the fixed-size cluster."""

import os
import signal
import subprocess
import threading
import time

import pyarrow.parquet as pq
import pytest

from vector_ray import datagen
from vector_ray.pipelines import flagship


def _kill_one_busy_worker(killed: list, deadline_s: float = 25.0) -> None:
    deadline = time.time() + deadline_s
    while time.time() < deadline and not killed:
        time.sleep(1.0)
        out = subprocess.run(
            ["pgrep", "-f", "ray::"], capture_output=True, text=True
        )
        busy = []
        for pid_s in out.stdout.split():
            try:
                with open(f"/proc/{int(pid_s)}/cmdline") as f:
                    cmd = f.read()
            except (OSError, ValueError):
                continue
            # "ray::TaskName" titles mark workers CURRENTLY running a
            # task; idle workers show as "ray::IDLE"
            if "ray::" in cmd and "IDLE" not in cmd:
                busy.append(int(pid_s))
        if busy:
            victim = busy[len(busy) // 2]
            try:
                os.kill(victim, signal.SIGKILL)
                killed.append(victim)
            except OSError:
                pass


def test_flagship_survives_worker_kill(ray_session, tmp_path):
    seq = tmp_path / "seq"
    seq.mkdir()
    for i in range(8):
        pq.write_table(
            datagen.generate_batch(i * 15000, 15000),
            str(seq / f"shard-{i:05d}.parquet"),
        )
    enrich = str(tmp_path / "enrich.parquet")
    pq.write_table(datagen.enrichment_table(), enrich)
    cfg = flagship.FlagshipConfig(num_groups=4)

    s0 = flagship.run(str(seq), str(tmp_path / "out0"), enrich, cfg, resume=False)
    agg0 = pq.read_table(str(tmp_path / "out0" / "aggregates.parquet")).sort_by(
        [("sink", "ascending"), ("source", "ascending")]
    )

    killed: list = []
    t = threading.Thread(target=_kill_one_busy_worker, args=(killed,))
    t.start()
    s1 = flagship.run(str(seq), str(tmp_path / "out1"), enrich, cfg, resume=False)
    t.join()
    if not killed:
        pytest.skip("no busy worker caught during the run - inconclusive")
    agg1 = pq.read_table(str(tmp_path / "out1" / "aggregates.parquet")).sort_by(
        [("sink", "ascending"), ("source", "ascending")]
    )
    assert s1["rows_total"] == s0["rows_total"]
    assert agg0.equals(agg1)


def _kill_metrics_hub(killed: list, deadline_s: float = 20.0) -> None:
    deadline = time.time() + deadline_s
    while time.time() < deadline and not killed:
        time.sleep(0.5)
        out = subprocess.run(
            ["pgrep", "-f", "ray::MetricsHub"], capture_output=True, text=True
        )
        for pid_s in out.stdout.split():
            try:
                os.kill(int(pid_s), signal.SIGKILL)
                killed.append(int(pid_s))
                return
            except (OSError, ValueError):
                continue


def test_flagship_survives_metrics_hub_kill(ray_session, tmp_path):
    """The metrics actor is advisory — killing it mid-run must not fail
    the job (max_restarts=-1 + safe_snapshot): rows and aggregates stay
    exact because accounting lives in the checkpoint markers."""
    seq = tmp_path / "seq"
    seq.mkdir()
    for i in range(4):
        pq.write_table(
            datagen.generate_batch(i * 10000, 10000),
            str(seq / f"shard-{i:05d}.parquet"),
        )
    enrich = str(tmp_path / "enrich.parquet")
    pq.write_table(datagen.enrichment_table(), enrich)

    killed: list = []
    t = threading.Thread(target=_kill_metrics_hub, args=(killed,))
    t.start()
    s = flagship.run(
        str(seq),
        str(tmp_path / "out"),
        enrich,
        flagship.FlagshipConfig(num_groups=4),
        resume=False,
    )
    t.join()
    if not killed:
        pytest.skip("hub process not caught - inconclusive")
    assert s["rows_total"] == 40000
    agg = pq.read_table(str(tmp_path / "out" / "aggregates.parquet"))
    assert sum(agg.column("n_rows").to_pylist()) == 40000


def test_span_dedupe_survives_worker_kill(ray_session):
    """The span-dedup count phase is a raw-Ray split→merge exchange
    (driver-owned return objects): killing a busy worker mid-run must
    be recovered by lineage reconstruction with identical output."""
    import numpy as np
    import pyarrow as pa

    import ray
    import ray.data as rd

    from vector_ray.functions.tokens import span_dedupe

    rng = np.random.default_rng(11)
    base = [rng.integers(0, 50, size=60).tolist() for _ in range(400)]
    docs = base + base[:100]  # 100 exact duplicate docs -> rich dup set
    t = pa.table(
        {
            "doc_id": [f"doc-{i:010d}" for i in range(len(docs))],
            "tokens": pa.array(docs, pa.list_(pa.int32())),
        }
    )

    def run_once():
        out = span_dedupe(rd.from_arrow(t).repartition(16), n=8)
        tables = [
            x
            for x in ray.get(out.materialize().to_arrow_refs())
            if x.num_rows
        ]
        return pa.concat_tables(tables).sort_by("doc_id")

    clean = run_once()
    killed: list = []
    th = threading.Thread(target=_kill_one_busy_worker, args=(killed, 20.0))
    th.start()
    try:
        survived = run_once()
    finally:
        th.join()
    assert survived.equals(clean)


def test_span_dedupe_exchange_survives_worker_kill(ray_session):
    """mask="exchange" adds query→probe→apply raw-task stages on top of
    the count exchange — all driver-owned returns, so a killed worker
    must likewise be recovered by lineage reconstruction."""
    import numpy as np
    import pyarrow as pa

    import ray
    import ray.data as rd

    from vector_ray.functions.tokens import span_dedupe

    rng = np.random.default_rng(13)
    base = [rng.integers(0, 50, size=60).tolist() for _ in range(400)]
    docs = base + base[:100]
    t = pa.table(
        {
            "doc_id": [f"doc-{i:010d}" for i in range(len(docs))],
            "tokens": pa.array(docs, pa.list_(pa.int32())),
        }
    )

    def run_once():
        out = span_dedupe(
            rd.from_arrow(t).repartition(16), n=8, mask="exchange"
        )
        tables = [
            x
            for x in ray.get(out.materialize().to_arrow_refs())
            if x.num_rows
        ]
        return pa.concat_tables(tables).sort_by("doc_id")

    clean = run_once()
    killed: list = []
    th = threading.Thread(target=_kill_one_busy_worker, args=(killed, 20.0))
    th.start()
    try:
        survived = run_once()
    finally:
        th.join()
    assert survived.equals(clean)


def test_bucketed_pagerank_survives_worker_kill(ray_session):
    """Iterative shuffle op under fault: SIGKILL a busy worker while
    the bucketed PageRank (per-iteration hash joins + groupbys over
    materialized rank datasets) is running; the retried run must
    produce exactly the clean run's ranks."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.functions.graph import pagerank

    rng = np.random.RandomState(11)
    n = 400_000
    edges = pa.table(
        {
            "src": pa.array(rng.randint(0, 3000, n).astype(np.int64)),
            "dst": pa.array(rng.randint(0, 3000, n).astype(np.int64)),
        }
    )

    def run():
        out = pagerank(
            rd.from_arrow(edges).repartition(32),
            iters=4,
            mode="bucketed",
            num_buckets=8,
        )
        return pa.concat_tables(
            [
                b
                for b in out.iter_batches(batch_format="pyarrow")
                if b.num_rows
            ]
        ).sort_by("node")

    clean = run()
    killed: list = []
    t = threading.Thread(target=_kill_one_busy_worker, args=(killed, 20.0))
    t.start()
    faulted = run()
    t.join()
    if not killed:
        pytest.skip("no busy worker caught during the run - inconclusive")
    assert clean.equals(faulted)


def test_dense_merge_survives_worker_kill(ray_session, tmp_path):
    """Kill a busy worker while the shuffle-free dense-count tree merge
    (token_topk's plan) is running: every stage is a deterministic map,
    so Ray lineage re-executes the lost partials and the final top-k is
    identical to the undisturbed run."""
    import ray.data as rd

    from vector_ray.functions.tokens import token_topk

    seq = tmp_path / "tseq"
    seq.mkdir()
    for i in range(8):
        pq.write_table(
            datagen.generate_batch(i * 15000, 15000),
            str(seq / f"shard-{i:05d}.parquet"),
        )
    files = sorted(str(p) for p in seq.iterdir())

    def run_once():
        return token_topk(
            rd.read_parquet(files, columns=["tokens"]), k=25
        ).take_all()

    base = run_once()

    killed: list = []
    t = threading.Thread(target=_kill_one_busy_worker, args=(killed,))
    t.start()
    try:
        got = run_once()
    finally:
        t.join()
    assert got == base
    # the kill may land between datasets on a fast box; the assertion
    # above is the contract either way, but record what happened
    print(f"killed workers: {killed}")


def test_mode_per_key_survives_worker_kill(ray_session):
    """SIGKILL a busy worker mid-run of the majority-vote aggregate:
    the two-phase counts + salted top-1 + bucketed join must all retry
    to the same deterministic answer."""
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    from vector_ray.stages.shuffle import mode_per_key

    rng = np.random.default_rng(11)
    n = 400_000
    t = pa.table(
        {
            "user_id": pa.array(rng.integers(0, 2000, size=n), pa.int64()),
            "event_type": pa.array(
                np.array(["a", "b", "c", "d"])[rng.integers(0, 4, size=n)]
            ),
        }
    )
    ds = rd.from_arrow(t).repartition(32)

    def run():
        out = mode_per_key(ds, key="user_id", field="event_type")
        tables = [
            x
            for x in ray.get(out.materialize().to_arrow_refs())
            if x.num_rows
        ]
        merged = pa.concat_tables(tables).sort_by("user_id")
        return merged

    baseline = run()

    killed: list = []
    killer = threading.Thread(target=_kill_one_busy_worker, args=(killed,))
    killer.start()
    try:
        result = run()
    finally:
        killer.join()

    assert result.equals(baseline)
    # the kill may have landed between stages; the test is only
    # meaningful when a worker actually died, so surface that
    if not killed:
        pytest.skip("no busy worker observed to kill (run too fast)")
