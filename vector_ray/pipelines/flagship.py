"""Flagship pipeline: parse → enrich → route → aggregate over Parquet
shards of pre-tokenized training sequences (the BASELINE.json north
star).

Stages, all Ray-Data-native:

1. **parse** — vectorized kv/grok parse of the syslog-ish ``message``
   column (`remap` analog): one compiled regex pass per requested key
   via ``pc.extract_regex``; no Python per row.
2. **enrich** — actor-pool lookup join on ``source`` against a broadcast
   enrichment table (``ray.put`` once; fetched once per actor in
   ``__init__``) — Vector's ``enrichment_tables`` analog.
3. **route** — one computed ``__route`` label column (first-match-wins
   VRL conditions), then a SINGLE-PASS partitioned Parquet write
   (``partition_cols=["__route"]``) so N sinks do not mean N passes.
4. **aggregate** — per-sink per-source counts (rows, tokens): two-phase
   (per-batch ``pa.Table.group_by`` partials → tiny global groupby), the
   skew-safe plan for the zipf ``source`` distribution.

Scale design: the input file list is split into partition groups; each
group runs the whole pipeline and commits an atomic output dir + a
checkpoint marker with lineage + metrics (vector_ray.state.checkpoint).
A resumed run skips completed groups — nothing is reprocessed. Within a
group, Ray Data streams blocks with backpressure; nothing materializes
the full input.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

import ray
import ray.data as rd

from vector_ray.stages.core import ROUTE_COLUMN, compile_route_label

# hive partition dirs must not start with "_" (pyarrow dataset discovery
# ignores "_"/"." prefixes), so the flagship uses a plain column name
SINK_COLUMN = "route"

# auto checkpoint-group sizing target (see the sizing comment in run());
# CPU-independent so scaling legs and resumed runs see the same plan
TARGET_GROUP_BYTES = 256e6
DEAD_LETTER_ROUTE = "_deadletter"
from vector_ray.stages.enrich import Enricher
from vector_ray.stages.grouped import compile_partial_agg
from vector_ray.state.checkpoint import CheckpointStore

PARSE_KEYS = {"level": None, "status": "int", "latency_ms": "int"}

DEFAULT_ROUTES = {
    # first-match-wins, mirroring Vector route semantics
    "errors": '.level == "error" || .status >= 500',
    "lowq": ".quality_weight < 0.6",
    "bulk": ".n_tok >= 512",
}

READ_COLUMNS = ["doc_id", "tokens", "n_tok", "source", "message"]


def tune_read_blocks() -> None:
    """Size read blocks to the cluster instead of Ray's 200-block floor.

    Ray Data's default ``read_op_min_num_blocks=200`` shreds small/medium
    inputs into KB-scale blocks, which multiplies task overhead and (with
    ``partition_cols``) produces hundreds of tiny output files whose
    metadata then dominates any read-back (measured 17.8s vs 0.2s for the
    same 500k-row re-read). 2× CPUs keeps every core busy while letting
    ``target_max_block_size`` govern real block sizes at scale.
    """
    from ray.data import DataContext

    cpus = int(ray.cluster_resources().get("CPU", 8))
    ctx = DataContext.get_current()
    ctx.read_op_min_num_blocks = min(200, max(2 * cpus, 8))


@dataclass
class FlagshipConfig:
    routes: dict[str, str] = field(default_factory=lambda: dict(DEFAULT_ROUTES))
    parse_field: str = "message"
    group_key: str = "source"
    enrich_concurrency: int = 4
    batch_size: int | None = None  # None = per-block batches (zero-copy)
    num_groups: int | None = None  # checkpoint partition groups
    parallel_groups: int = 6  # concurrent group executions (driver threads)
    # remap-style consumption: the raw log line is replaced by its parsed
    # fields (`. = parse(...)` semantics) — and not re-written to sinks
    drop_after_parse: tuple = ("message",)
    # quarantine unparseable rows into a "_deadletter" route partition
    dead_letter: bool = False
    # per-stage NodeMetrics into markers/metrics.json (tiny per-batch
    # fire-and-forget actor call)
    collect_metrics: bool = True
    # alert thresholds over the settled run metrics (state/alerts.py,
    # reference alerts/mod.rs:56-79); None disables each rule
    alert_min_events_per_minute: float | None = None
    alert_max_latency_s: float | None = None
    alert_max_error_pct: float | None = None


def _parse_batch(t: pa.Table, parse_field: str) -> pa.Table:
    col = t[parse_field]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    for key, typ in PARSE_KEYS.items():
        pat = rf"(?:^|[ ,]){key}=(?P<v>[^\s,]+)"
        vals = pc.struct_field(pc.extract_regex(col, pattern=pat), "v")
        if typ == "int":
            vals = pc.cast(vals, pa.int64())
        t = t.append_column(key, vals)
    return t


def build_dataset(
    files: list[str],
    enrich_ref,
    cfg: FlagshipConfig,
    metrics_hub=None,
    metrics_prefix: str = "",
) -> "rd.Dataset":
    """The lazy parse→enrich→route-label dataset for a set of shards.

    With ``metrics_hub`` (a MetricsHub actor handle), each stage reports
    per-batch rows/bytes under ``{metrics_prefix}{stage}`` — the
    per-component NodeMetrics analog (shared/src/messages.rs:103-122),
    keyed per partition group for the lineage markers.
    """
    routes = dict(cfg.routes)
    if cfg.dead_letter:
        # quarantine route for rows the parse stage could not structure
        # (the dropped-event accounting analog, functional_test.rs:170-174);
        # first-match-wins puts it ahead of the content routes
        routes = {DEAD_LETTER_ROUTE: "!exists(.level) && !exists(.status)", **routes}
    label = compile_route_label({"route": routes})
    parse_field = cfg.parse_field

    drop = [c for c in cfg.drop_after_parse]

    def report(stage: str, t: pa.Table) -> pa.Table:
        if metrics_hub is not None:
            metrics_hub.add.remote(f"{metrics_prefix}{stage}", t.num_rows, t.nbytes)
        return t

    def parse(t: pa.Table) -> pa.Table:
        out = _parse_batch(t, parse_field)
        return report(
            "parse", out.drop_columns([c for c in drop if c in out.column_names])
        )

    ds = rd.read_parquet(files, columns=READ_COLUMNS)
    ds = ds.map_batches(parse, batch_format="pyarrow", batch_size=cfg.batch_size)
    ds = ds.map_batches(
        Enricher,
        fn_constructor_kwargs=dict(table_ref=enrich_ref, key=cfg.group_key),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        # autoscaling pool (min 1): a fixed-size pool that reserves every
        # CPU deadlocks the read/write stages on small clusters
        concurrency=(1, cfg.enrich_concurrency),
        num_cpus=1,
    )

    def label_and_rename(t: pa.Table) -> pa.Table:
        t = report("enrich", t)
        t = label(t)
        return report(
            "route",
            t.rename_columns(
                [SINK_COLUMN if c == ROUTE_COLUMN else c for c in t.column_names]
            ),
        )

    return ds.map_batches(
        label_and_rename, batch_format="pyarrow", batch_size=cfg.batch_size
    )


AGGREGATES = {
    "n_rows": {"fn": "count"},
    "n_tokens": {"fn": "sum", "field": "n_tok", "int": True},
}


def _agg_partial_fn():
    return compile_partial_agg([SINK_COLUMN, "source"], AGGREGATES)


def _merge_agg_parts(parts_dir: str) -> pa.Table:
    """Final phase of the two-phase aggregate: sum the per-group partials
    (a driver-side reduce over a few KB per group)."""
    tbl = pads.dataset(parts_dir, format="parquet").to_table()
    g = tbl.group_by([SINK_COLUMN, "source"]).aggregate(
        [("__p_n_rows", "sum"), ("__p_n_tokens", "sum")]
    )
    out = pa.table(
        {
            "sink": pc.cast(g[SINK_COLUMN], pa.string()),
            "source": pc.cast(g["source"], pa.string()),
            "n_rows": pc.cast(g["__p_n_rows_sum"], pa.int64()),
            "n_tokens": pc.cast(g["__p_n_tokens_sum"], pa.int64()),
        }
    )
    return out.sort_by([("sink", "ascending"), ("source", "ascending")])


def _partition_groups(files: list[str], num_groups: int) -> list[list[str]]:
    files = sorted(files)
    num_groups = max(1, min(num_groups, len(files)))
    per = (len(files) + num_groups - 1) // num_groups
    return [files[i : i + per] for i in range(0, len(files), per)]


def _extend_ingest_groups(
    out_dir: str, files: list[str], cfg: "FlagshipConfig"
) -> list[tuple[str, list[str]]]:
    """Append-only group assignment for ingest mode: shards already
    assigned keep their group (their markers stay valid forever); new
    shards form new byte-sized groups numbered after the existing ones.
    The map is persisted atomically BEFORE any processing so a crash
    mid-batch resumes with the identical partitioning (the same
    invariant the manifest's num_groups pin gives batch runs)."""
    import json

    path = os.path.join(out_dir, "ingest_groups.json")
    groups_map: dict[str, list[str]] = {}
    if os.path.exists(path):
        with open(path) as f:
            groups_map = json.load(f)
    known = {f for fs in groups_map.values() for f in fs}
    new_files = [f for f in files if f not in known]
    if new_files:
        if cfg.num_groups:
            n_new = cfg.num_groups
        else:
            total_bytes = sum(os.path.getsize(f) for f in new_files)
            n_new = max(1, min(512, round(total_bytes / TARGET_GROUP_BYTES)))
        start = len(groups_map)
        for i, gf in enumerate(_partition_groups(new_files, n_new)):
            groups_map[f"group-{start + i:05d}"] = gf
        with open(path + ".tmp", "w") as f:
            json.dump(groups_map, f, indent=2, sort_keys=True)
        os.replace(path + ".tmp", path)
    return sorted(groups_map.items())


def list_input_files(input_path: str) -> list[str]:
    if os.path.isdir(input_path):
        return sorted(
            os.path.join(input_path, f)
            for f in os.listdir(input_path)
            if f.endswith(".parquet")
        )
    return [input_path]


def run(
    input_path: str,
    out_dir: str,
    enrichment: str | pa.Table,
    cfg: FlagshipConfig | None = None,
    resume: bool = True,
    ingest: bool = False,
) -> dict:
    """Run (or resume) the flagship pipeline. Returns a summary dict with
    per-sink aggregate path, lineage records, and throughput numbers.

    ``ingest=True`` turns the run directory into a continuously-fed
    micro-batch pipeline (Vector's always-on topology, expressed as
    repeated batch runs): every call re-lists ``input_path``, assigns
    only NEVER-SEEN shards to NEW checkpoint groups (append-only
    ``ingest_groups.json`` — completed groups and their markers stay
    valid forever), processes just those, and re-publishes
    ``aggregates.parquet`` over all groups so far. Calls with no new
    shards are cheap no-ops. ``cfg.num_groups`` then means groups per
    ingest batch; shards must be immutable once listed (standard
    log-shipper contract)."""
    cfg = cfg or FlagshipConfig()
    tune_read_blocks()
    files = list_input_files(input_path)
    if not files:
        raise FileNotFoundError(f"no parquet shards under {input_path}")

    if isinstance(enrichment, str):
        enrich_tbl = pq.read_table(enrichment)
    else:
        enrich_tbl = enrichment
    enrich_ref = ray.put(enrich_tbl)  # broadcast ONCE for the whole run

    # checkpoint groups sized by BYTES, not file count: each group should
    # be enough work to amortize its fixed costs (actor-pool spin-up,
    # stream ramp, final merge) — ~256MB per group — while capping
    # worst-case progress lost to a crash AND overlapping enough groups
    # that one group's write tail hides behind another's compute.
    # Measured at 32 CPUs (quiet window): 1.6GB in 1 group → 51.6s, 4
    # groups → 17.0s, 6 groups → 14.2s, 16 groups → 20.3s; 160MB in 1
    # group → 3.06s vs 4 groups → 9.6s (fixed cost dominates tiny
    # groups). The sizing is deliberately CPU-independent so a resumed
    # run on a different-sized cluster sees the same partitioning and
    # the two-cluster-size scaling legs run the identical plan.
    store = CheckpointStore(out_dir)
    if ingest:
        # config hash must be stable while the input list grows: hash
        # the pipeline shape only; group assignment lives in the
        # append-only ingest_groups.json instead of the manifest
        store.open(
            {
                "pipeline": "flagship-ingest",
                "routes": cfg.routes,
                "dead_letter": cfg.dead_letter,
                "group_key": cfg.group_key,
            }
        )
        named_groups = _extend_ingest_groups(out_dir, files, cfg)
    else:
        prior_manifest = store.read_manifest() if resume else None
        if cfg.num_groups:
            n_groups = cfg.num_groups
        elif prior_manifest is not None:
            # a resumed run must reuse the ORIGINAL group partitioning:
            # re-partitioning the input would invalidate every completed
            # marker, so the pin also protects against future changes to
            # the sizing default below
            n_groups = int(prior_manifest["num_groups"])
        else:
            total_bytes = sum(os.path.getsize(f) for f in files)
            n_groups = max(1, min(512, round(total_bytes / TARGET_GROUP_BYTES)))
        groups = _partition_groups(files, n_groups)

        manifest = {
            "pipeline": "flagship",
            "routes": cfg.routes,
            "dead_letter": cfg.dead_letter,
            "group_key": cfg.group_key,
            "input_files": files,
            "num_groups": len(groups),
        }
        if not resume and os.path.isdir(out_dir):
            import shutil

            shutil.rmtree(out_dir)
        store.open(manifest)
        named_groups = [
            (f"group-{i:05d}", g) for i, g in enumerate(groups)
        ]

    hub = None
    if cfg.collect_metrics:
        from vector_ray.state.metrics import MetricsHub

        hub = MetricsHub.remote()

    t_start = time.perf_counter()
    skipped = 0
    parts_dir = os.path.join(out_dir, "agg_parts")
    routed_dir = os.path.join(out_dir, "routed")
    os.makedirs(parts_dir, exist_ok=True)

    def process_group(gid: str, group_files: list[str]) -> tuple[int, int]:
        t0 = time.perf_counter()
        partial_fn = _agg_partial_fn()
        ds = build_dataset(
            group_files, enrich_ref, cfg,
            metrics_hub=hub, metrics_prefix=f"{gid}/",
        )

        # write routed rows partitioned by sink in one pass
        final_dir = os.path.join(routed_dir, gid)
        with store.publish_dir(final_dir) as tmp_dir:
            ds.write_parquet(tmp_dir, partition_cols=[SINK_COLUMN])
        # partials from the routed output we just published (reads only the
        # 3 small columns back — cheap vs re-running the pipeline). Read the
        # FINAL dir and materialize exactly once: lazy datasets re-execute
        # for schema probes, which must not chase renamed tmp paths. A crash
        # before mark_done simply redoes the group (publish is idempotent).
        routed = rd.read_parquet(final_dir, columns=[SINK_COLUMN, "source", "n_tok"])
        partials = routed.map_batches(partial_fn, batch_format="pyarrow")
        part_tbl = pa.concat_tables(
            ray.get(partials.materialize().to_arrow_refs()),
            promote_options="default",
        )
        part_path = os.path.join(parts_dir, f"{gid}.parquet")
        pq.write_table(part_tbl, part_path + f".tmp-{gid}")
        os.replace(part_path + f".tmp-{gid}", part_path)

        # lineage + metrics marker (NodeMetrics analog)
        g = part_tbl.group_by([SINK_COLUMN]).aggregate(
            [("__p_n_rows", "sum"), ("__p_n_tokens", "sum")]
        )
        route_rows = {
            r[SINK_COLUMN]: int(r["__p_n_rows_sum"]) for r in g.to_pylist()
        }
        g_rows = sum(route_rows.values())
        g_tokens = int(pc.sum(part_tbl["__p_n_tokens"]).as_py() or 0)
        stage_metrics = {}
        if hub is not None:
            # best-effort: per-stage NodeMetrics for this group (exact
            # row accounting comes from the aggregate partials above);
            # a dead/restarting hub yields {} rather than failing the job
            from vector_ray.state.metrics import safe_snapshot

            snap = safe_snapshot(hub)
            stage_metrics = {
                k.split("/", 1)[1]: v
                for k, v in snap.items()
                if k.startswith(f"{gid}/")
            }
        store.mark_done(
            gid,
            {
                "input_files": group_files,
                "rows": g_rows,
                "tokens": g_tokens,
                "route_rows": route_rows,
                "stage_metrics": stage_metrics,
                "duration_sec": round(time.perf_counter() - t0, 3),
                "routed_dir": final_dir,
                "agg_part": part_path,
            },
        )
        return g_rows, g_tokens

    # overlap group executions: each group's stream has a serial ramp
    # (actor-pool spin-up) and tail (write fan-in, partials); running a few
    # concurrently keeps the cluster busy across those phases. Ray Data
    # executes concurrent datasets from separate driver threads.
    from concurrent.futures import ThreadPoolExecutor


    pending: list[tuple[str, list[str]]] = []
    for gid, group_files in named_groups:
        if store.is_done(gid):
            skipped += 1
        else:
            pending.append((gid, group_files))

    rows_total = tokens_total = 0
    if pending:
        # each concurrent group pins ≥1 enrich actor (1 CPU); cap overlap
        # at half the cluster so task pools (read/write) always have CPUs
        cpus = int(ray.cluster_resources().get("CPU", 8))
        workers = max(1, min(cfg.parallel_groups, len(pending), cpus // 2))
        with ThreadPoolExecutor(max_workers=workers) as pool:
            for g_rows, g_tokens in pool.map(
                lambda args: process_group(*args), pending
            ):
                rows_total += g_rows
                tokens_total += g_tokens

    if hub is not None:
        # settled run-level metrics (fire-and-forget adds need to drain)
        import json as _json

        from vector_ray.state.metrics import safe_snapshot

        snap = safe_snapshot(hub)
        for _ in range(20):
            time.sleep(0.05)
            again = safe_snapshot(hub)
            if again == snap:
                break
            snap = again
        mpath = os.path.join(out_dir, "metrics.json")
        with open(mpath + ".tmp", "w") as f:
            _json.dump(snap, f, indent=2, sort_keys=True)
        os.replace(mpath + ".tmp", mpath)

    # final merge (idempotent, re-runs on resume)
    agg = _merge_agg_parts(parts_dir)
    agg_path = os.path.join(out_dir, "aggregates.parquet")
    pq.write_table(agg, agg_path + ".tmp")
    os.replace(agg_path + ".tmp", agg_path)

    elapsed = time.perf_counter() - t_start

    alerts: list[str] = []
    if hub is not None and any(
        x is not None
        for x in (
            cfg.alert_min_events_per_minute,
            cfg.alert_max_latency_s,
            cfg.alert_max_error_pct,
        )
    ):
        from vector_ray.state.alerts import evaluate_alerts

        fired = evaluate_alerts(
            snap,
            elapsed_s=elapsed,
            min_events_per_minute=cfg.alert_min_events_per_minute,
            max_latency_s=cfg.alert_max_latency_s,
            max_error_pct=cfg.alert_max_error_pct,
        )
        alerts = [str(a) for a in fired]
        if alerts:
            apath = os.path.join(out_dir, "alerts.json")
            with open(apath + ".tmp", "w") as f:
                import json as _json

                _json.dump(alerts, f, indent=2)
            os.replace(apath + ".tmp", apath)

    records = store.records()
    all_rows = sum(r["rows"] for r in records.values())
    all_tokens = sum(r["tokens"] for r in records.values())
    return {
        "alerts": alerts,
        "out_dir": out_dir,
        "aggregates": agg_path,
        "routed_dir": routed_dir,
        "groups": len(named_groups),
        "groups_skipped": skipped,
        "rows_this_run": rows_total,
        "tokens_this_run": tokens_total,
        "rows_total": all_rows,
        "tokens_total": all_tokens,
        "elapsed_sec": round(elapsed, 3),
        "seqs_per_sec": round(rows_total / elapsed, 1) if elapsed > 0 else 0.0,
        "tokens_per_sec": round(tokens_total / elapsed, 1) if elapsed > 0 else 0.0,
    }
