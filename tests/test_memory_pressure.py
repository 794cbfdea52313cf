"""Flagship under memory pressure: an object store far smaller than the
working set. Ray Data's streaming executor + object spilling must keep
the job correct (never OOM, never drop rows) — the single-node stand-in
for '100 TB through the object store'. Runs in a subprocess because the
object_store_memory cap must be set at ray.init."""

import json
import subprocess
import sys

SCRIPT = r"""
import os, sys, warnings, json
warnings.filterwarnings("ignore")
import ray
ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR", object_store_memory=200*1024*1024)
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, %(repo)r)
from vector_ray import datagen
from vector_ray.pipelines import flagship
import pyarrow.parquet as pq, shutil

tag = "2000000"
seq = datagen.ensure_corpus(tag)
ep = datagen.enrichment_path(tag)
out = %(out)r
shutil.rmtree(out, ignore_errors=True)
s = flagship.run(seq, out, ep, flagship.FlagshipConfig(), resume=False)
agg = pq.read_table(os.path.join(out, "aggregates.parquet"))
print("RESULT " + json.dumps({
    "rows_total": s["rows_total"],
    "agg_rows_sum": sum(agg.column("n_rows").to_pylist()),
}))
shutil.rmtree(out, ignore_errors=True)
ray.shutdown()
"""


def test_flagship_with_tiny_object_store(tmp_path):
    import os

    code = SCRIPT % {"repo": os.getcwd(), "out": str(tmp_path / "out")}
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=os.getcwd(),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")][-1]
    res = json.loads(line[len("RESULT "):])
    assert res["rows_total"] == 2_000_000
    assert res["agg_rows_sum"] == 2_000_000
