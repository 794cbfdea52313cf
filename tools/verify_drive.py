"""End-to-end drive of the public API for the verify skill: flagship
run + resume probe, generic spec DAG + error probes, driver contract
(entry/queries/oracle_sql). Exits non-zero on any failure."""

import json
import os
import shutil
import sys
import time
import warnings


def main() -> int:
    warnings.filterwarnings("ignore")
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, "/root/repo")
    from vector_ray._compat import register_package_for_workers

    register_package_for_workers()
    import pyarrow.parquet as pq

    from vector_ray import datagen, run_pipeline
    from vector_ray.pipelines import flagship

    root = "/tmp/v_verify"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(f"{root}/seq", exist_ok=True)
    for i in range(8):
        pq.write_table(
            datagen.generate_batch(i * 2000, 2000),
            f"{root}/seq/shard-{i:05d}.parquet",
        )
    pq.write_table(datagen.enrichment_table(), f"{root}/enrich.parquet")

    s = flagship.run(f"{root}/seq", f"{root}/out", f"{root}/enrich.parquet",
                     flagship.FlagshipConfig(num_groups=4))
    assert s["rows_total"] == 16000, s
    assert os.path.isdir(f"{root}/out/routed")
    assert len(os.listdir(f"{root}/out/_markers")) == 4
    agg1 = pq.read_table(f"{root}/out/aggregates.parquet")
    assert agg1.num_rows > 0

    # resume probe: wipe one group, rerun, others must be skipped and
    # the aggregate must come back identical
    m = json.load(open(f"{root}/out/_markers/group-00001.json"))
    shutil.rmtree(m["routed_dir"], ignore_errors=True)
    os.remove(m["agg_part"])
    os.remove(f"{root}/out/_markers/group-00001.json")
    s2 = flagship.run(f"{root}/seq", f"{root}/out", f"{root}/enrich.parquet",
                      flagship.FlagshipConfig(num_groups=4), resume=True)
    assert s2["groups_skipped"] == 3, s2
    agg2 = pq.read_table(f"{root}/out/aggregates.parquet")
    sk = [(c, "ascending") for c in agg1.column_names]
    assert agg1.sort_by(sk).equals(agg2.sort_by(sk)), "resume changed agg"
    print("flagship + resume probe OK", flush=True)

    run_pipeline({
        "sources": {"logs": {"type": "demo_logs", "count": 3000,
                             "override_num_blocks": 3}},
        "transforms": {
            "parse": {"type": "remap", "inputs": ["logs"],
                      "ops": [{"op": "parse_kv", "field": "message",
                               "keys": ["level", "status"],
                               "types": {"status": "int"}}]},
            "router": {"type": "route", "inputs": ["parse"],
                       "route": {"err": '.level == "error" || .status >= 500'}},
        },
        "sinks": {"err": {"type": "parquet", "inputs": ["router.err"],
                          "path": f"{root}/err"},
                  "all": {"type": "blackhole", "inputs": ["parse"]}}})
    assert pq.read_table(f"{root}/err").num_rows > 0
    print("spec DAG OK", flush=True)

    from vector_ray.validate import ValidationError
    from vector_ray.vrl import VrlError

    try:
        run_pipeline({"sources": {"a": {"type": "demo_logs", "count": 10}},
                      "sinks": {"s": {"type": "blackhole", "inputs": ["nope"]}}})
        raise AssertionError("expected ValidationError")
    except ValidationError as e:
        assert "INVALID_INPUT" in str(e)
    try:
        run_pipeline({"sources": {"a": {"type": "demo_logs", "count": 10}},
                      "transforms": {"t": {"type": "remap", "inputs": ["a"],
                                           "source": ".x =="}},
                      "sinks": {"s": {"type": "blackhole", "inputs": ["t"]}}})
        raise AssertionError("expected VrlError")
    except VrlError:
        pass
    print("error probes OK", flush=True)

    os.chdir("/root/repo")
    import __ray_entry__ as E

    ds = E.entry()
    n = ds.count() if hasattr(ds, "count") else len(ds)
    assert n > 0
    q, osql = E.queries(), E.oracle_sql()
    assert set(osql) <= set(q)
    print(f"driver contract OK: entry rows={n}, "
          f"queries={len(q)}, oracles={len(osql)}", flush=True)
    ray.shutdown()
    print("VERIFY OK", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
