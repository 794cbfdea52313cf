"""Hard-crash resume: SIGKILL a flagship run mid-flight, rerun, and
assert completed groups are not reprocessed and the final output is
identical to an uninterrupted run (the north rule's resumability)."""

import json
import os
import signal
import subprocess
import sys
import time

import pyarrow.parquet as pq
import pytest

WORKER = """
import ray, warnings, sys, json
warnings.filterwarnings("ignore")
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, "/root/repo")
from vector_ray.pipelines import flagship
seq_dir, enrich, out_dir = sys.argv[1], sys.argv[2], sys.argv[3]
s = flagship.run(seq_dir, out_dir, enrich,
                 flagship.FlagshipConfig(num_groups=6, parallel_groups=1,
                                         enrich_concurrency=2))
print("SUMMARY " + json.dumps(s))
ray.shutdown()
"""


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from vector_ray import datagen

    root = tmp_path_factory.mktemp("crash_corpus")
    seq = root / "seq"
    seq.mkdir()
    for i in range(6):
        pq.write_table(
            datagen.generate_batch(i * 2000, 2000), seq / f"shard-{i:05d}.parquet"
        )
    enrich = root / "enrichment.parquet"
    pq.write_table(datagen.enrichment_table(), enrich)
    return str(seq), str(enrich)


def run_worker(seq, enrich, out_dir, kill_after_markers=None, timeout=240):
    proc = subprocess.Popen(
        [sys.executable, "-c", WORKER, seq, enrich, out_dir],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        start_new_session=True,
    )
    marker_dir = os.path.join(out_dir, "_markers")
    t0 = time.time()
    if kill_after_markers is not None:
        while time.time() - t0 < timeout:
            done = (
                len([f for f in os.listdir(marker_dir) if f.endswith(".json")])
                if os.path.isdir(marker_dir)
                else 0
            )
            if done >= kill_after_markers:
                os.killpg(proc.pid, signal.SIGKILL)
                proc.wait()
                return None
            if proc.poll() is not None:
                break  # finished before we could kill it
            time.sleep(0.2)
    out, _ = proc.communicate(timeout=timeout)
    for line in out.splitlines():
        if line.startswith("SUMMARY "):
            return json.loads(line[len("SUMMARY "):])
    return None


def test_sigkill_mid_run_then_resume(corpus, tmp_path):
    seq, enrich = corpus
    out_dir = str(tmp_path / "out")

    first = run_worker(seq, enrich, out_dir, kill_after_markers=2)
    marker_dir = os.path.join(out_dir, "_markers")
    done_after_kill = len(
        [f for f in os.listdir(marker_dir) if f.endswith(".json")]
    )
    if first is not None:
        pytest.skip("run finished before the kill landed; nothing to resume")
    assert 1 <= done_after_kill < 6

    second = run_worker(seq, enrich, out_dir)
    assert second is not None, "resume run did not complete"
    assert second["groups_skipped"] >= done_after_kill
    assert second["rows_total"] == 12000

    # uninterrupted reference run → identical aggregates
    ref_dir = str(tmp_path / "ref")
    ref = run_worker(seq, enrich, ref_dir)
    a = pq.read_table(second["aggregates"])
    b = pq.read_table(ref["aggregates"])
    assert a.equals(b)

    # no stray tmp dirs survive the crash + resume
    for root, dirs, _ in os.walk(out_dir):
        for d in dirs:
            assert not d.startswith(".tmp-"), f"leftover tmp dir {d}"


def test_resume_reuses_original_group_count(corpus, tmp_path):
    """A resumed run on a different-sized cluster must keep the original
    group partitioning (markers reference group ids)."""
    import json as _json

    seq, enrich = corpus
    out_dir = str(tmp_path / "gout")
    run_worker(seq, enrich, out_dir)  # num_groups=6 pinned in WORKER
    # resume with a worker that does NOT pin num_groups (default sizing)
    worker2 = WORKER.replace(
        "flagship.FlagshipConfig(num_groups=6, parallel_groups=1,\n"
        "                                         enrich_concurrency=2)",
        "flagship.FlagshipConfig(enrich_concurrency=2)",
    )
    assert "num_groups" not in worker2
    import subprocess as sp
    import sys as _sys

    out = sp.run([_sys.executable, "-c", worker2, seq, enrich, out_dir],
                 capture_output=True, text=True, timeout=240)
    line = [l for l in out.stdout.splitlines() if l.startswith("SUMMARY ")]
    assert line, out.stderr[-400:]
    s = _json.loads(line[0][8:])
    assert s["groups"] == 6 and s["groups_skipped"] == 6


INGEST_WORKER = """
import ray, warnings, sys, json
warnings.filterwarnings("ignore")
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, "/root/repo")
from vector_ray.ingest import run_ingest
src, out, state = sys.argv[1], sys.argv[2], sys.argv[3]
spec = {
    "sources": {"logs": {"type": "parquet", "path": src}},
    "transforms": {"errs": {"type": "filter", "inputs": ["logs"],
                            "condition": '.level == "error"'}},
    "sinks": {"out": {"type": "parquet", "inputs": ["errs"], "path": out}},
}
s = run_ingest(spec, state)
print("SUMMARY " + json.dumps(s))
ray.shutdown()
"""


def test_ingest_sigkill_exactly_once(tmp_path):
    """SIGKILL an ingest micro-batch after the pending record lands but
    before it commits; the retry must deliver EXACTLY the original file
    set once (even though a new file arrived before the retry), and the
    rows must match an uninterrupted run."""
    import glob

    import pyarrow as pa

    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    state = str(tmp_path / "state")
    for i in range(3):
        pq.write_table(
            pa.table(
                {
                    "id": pa.array(range(i * 100, i * 100 + 100), pa.int64()),
                    "level": pa.array(
                        ["error" if j % 2 == 0 else "info" for j in range(100)]
                    ),
                }
            ),
            src / f"s{i}.parquet",
        )

    def launch():
        return subprocess.Popen(
            [sys.executable, "-c", INGEST_WORKER, str(src), out, state],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
            start_new_session=True,
        )

    # kill as soon as the pending intent record exists
    proc = launch()
    state_file = os.path.join(state, "ingest_state.json")
    t0 = time.time()
    killed = False
    while time.time() - t0 < 120:
        if os.path.exists(state_file):
            st = json.load(open(state_file))
            if st.get("pending"):
                os.killpg(proc.pid, signal.SIGKILL)
                killed = True
                break
        if proc.poll() is not None:
            break  # finished before we could kill — covered below
        time.sleep(0.02)
    proc.wait()

    # a NEW file arrives between crash and retry
    pq.write_table(
        pa.table({"id": pa.array([9999], pa.int64()),
                  "level": pa.array(["error"])}),
        src / "late.parquet",
    )

    p2 = launch()
    out2, _ = p2.communicate(timeout=240)
    assert p2.returncode == 0
    s2 = json.loads(out2.split("SUMMARY ", 1)[1])
    batches = glob.glob(out + "/batch-*")
    assert not any(b.endswith(".tmp") for b in batches)
    total = sum(pq.read_table(b).num_rows for b in batches)
    if killed:
        # retry delivered the pinned 3-shard set once; late waits
        assert s2["new_files"] == {"logs": 3}
        assert total == 150
        p3 = launch()
        out3, _ = p3.communicate(timeout=240)
        s3 = json.loads(out3.split("SUMMARY ", 1)[1])
        assert s3["new_files"] == {"logs": 1}  # the late file alone
    else:
        # worker finished before the kill window: run 2 ingests late
        assert s2["new_files"] == {"logs": 1}
    total = sum(
        pq.read_table(b).num_rows for b in glob.glob(out + "/batch-*")
    )
    assert total == 151  # either path: every row exactly once
