"""CLI — the control-plane command surface analog (vectorize-cli
main.rs:139-210): validate / run / test a pipeline config, or run the
flagship corpus pipeline.

    python -m vector_ray validate pipeline.toml
    python -m vector_ray run pipeline.toml
    python -m vector_ray test pipeline.toml --events events.json
    python -m vector_ray flagship <input_dir> <out_dir> <enrichment.parquet>

This entry point owns its Ray session (library code never does).
"""

from __future__ import annotations

import argparse
import json
import sys
import warnings


def _init_ray(num_cpus: int | None) -> None:
    import os

    import ray

    if not ray.is_initialized():
        # Under `ray job submit` the job runtime exports RAY_ADDRESS for
        # the running cluster — attach to it (num_cpus is a local-only
        # knob and must not be passed when connecting). Standalone runs
        # default to a private local instance.
        address = os.environ.get("RAY_ADDRESS", "local")
        kwargs = {}
        if address == "local":
            kwargs["include_dashboard"] = False
            if num_cpus:
                kwargs["num_cpus"] = num_cpus
        ray.init(address=address, logging_level="ERROR", **kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from vector_ray._compat import register_package_for_workers

    register_package_for_workers()


def cmd_validate(args) -> int:
    from vector_ray.pipeline import KNOWN_TYPES
    from vector_ray.toml_io import load
    from vector_ray.validate import validate_spec

    spec = load(args.spec)
    result = validate_spec(spec.to_dict(), known_types=KNOWN_TYPES)
    for issue in result.issues:
        print(issue)
    print("valid" if result.ok else "INVALID")
    return 0 if result.ok else 1


def cmd_explain(args) -> int:
    from vector_ray.explain import explain
    from vector_ray.toml_io import load

    spec = load(args.spec)
    print(explain(spec))
    return 0


def cmd_compact(args) -> int:
    from vector_ray.functions.dataops import compact_parquet_dir

    _init_ray(args.num_cpus)
    summary = compact_parquet_dir(
        args.dir, target_rows_per_file=args.target_rows
    )
    print(json.dumps({k: summary[k] for k in ("leaves", "files_before", "files_after")}))
    import ray

    ray.shutdown()
    return 0


def cmd_run(args) -> int:
    from vector_ray.pipeline import run_pipeline
    from vector_ray.toml_io import load

    _init_ray(args.num_cpus)
    spec = load(args.spec)
    result = run_pipeline(spec)
    out = {
        name: {"kind": r.kind, "count": r.count, "path": r.path}
        for name, r in result.sinks.items()
    }
    if result.taps:
        out["_taps"] = {
            name: rows for name, rows in result.taps.items()
        }
    print(json.dumps(out, indent=2, default=str))
    import ray

    ray.shutdown()
    return 0


def cmd_ingest(args) -> int:
    from vector_ray.ingest import run_ingest
    from vector_ray.toml_io import load

    _init_ray(args.num_cpus)
    spec = load(args.spec)
    summary = run_ingest(spec, args.state_dir, replay_batch=args.replay_batch)
    print(json.dumps(summary, indent=2))
    import ray

    ray.shutdown()
    return 0


def cmd_test(args) -> int:
    from vector_ray.testing import run_functional_test
    from vector_ray.toml_io import load

    _init_ray(args.num_cpus)
    spec = load(args.spec)
    with open(args.events) as f:
        events = json.load(f)
    result = run_functional_test(spec, events, source=args.source)
    printable = {k: v for k, v in result.items() if k != "output_events"}
    printable["output_events_preview"] = result["output_events"][:10]
    print(json.dumps(printable, indent=2, default=str))
    import ray

    ray.shutdown()
    return 0 if result["status"] == "completed" else 1


def cmd_flagship(args) -> int:
    from vector_ray.pipelines import flagship

    _init_ray(args.num_cpus)
    summary = flagship.run(
        args.input, args.out, args.enrichment,
        flagship.FlagshipConfig(dead_letter=args.dead_letter),
        resume=not args.no_resume,
        ingest=args.ingest,
    )
    print(json.dumps(summary, indent=2))
    import ray

    ray.shutdown()
    return 0


def main(argv=None) -> int:
    warnings.filterwarnings("ignore")
    p = argparse.ArgumentParser(prog="vector_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("validate", help="validate a pipeline TOML")
    sp.add_argument("spec")
    sp.set_defaults(fn=cmd_validate)

    sp = sub.add_parser("explain", help="show the plan + data movement")
    sp.add_argument("spec")
    sp.set_defaults(fn=cmd_explain)

    sp = sub.add_parser("compact", help="compact small parquet files per partition dir")
    sp.add_argument("dir")
    sp.add_argument("--target-rows", type=int, default=1_000_000, dest="target_rows")
    sp.set_defaults(fn=cmd_compact)

    sp = sub.add_parser("run", help="run a pipeline TOML")
    sp.add_argument("spec")
    sp.set_defaults(fn=cmd_run)

    sp = sub.add_parser(
        "ingest",
        help="run one micro-batch of a pipeline TOML over never-seen files",
    )
    sp.add_argument("spec")
    sp.add_argument("--state-dir", required=True, dest="state_dir")
    sp.add_argument(
        "--replay-batch",
        default=None,
        dest="replay_batch",
        help="reprocess one committed batch id through the current spec",
    )
    sp.set_defaults(fn=cmd_ingest)

    sp = sub.add_parser("test", help="functional-test a pipeline TOML")
    sp.add_argument("spec")
    sp.add_argument("--events", required=True, help="JSON array of sample events")
    sp.add_argument("--source", default=None)
    sp.set_defaults(fn=cmd_test)

    sp = sub.add_parser("flagship", help="run the flagship corpus pipeline")
    sp.add_argument("input")
    sp.add_argument("out")
    sp.add_argument("enrichment")
    sp.add_argument("--dead-letter", action="store_true")
    sp.add_argument("--no-resume", action="store_true")
    sp.add_argument(
        "--ingest", action="store_true",
        help="micro-batch mode: process only never-seen shards, append "
        "new checkpoint groups, re-publish aggregates (run per cron tick)",
    )
    sp.set_defaults(fn=cmd_flagship)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
