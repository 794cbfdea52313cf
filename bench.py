"""Benchmark harness.

Runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) under ``ray.init(num_cpus=$RAY_GRAFT_CPUS)``
(default 32) and prints ONE JSON line:

    {"metric": "...", "value": <headline sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N,
     "seqs_per_sec": ..., "tokens_per_sec": ...}

``--scaling`` runs the headline job twice in fresh processes at
num_cpus=8 and 32 on the same input and reports both throughputs plus
the scaling efficiency (the sandbox evidence for the two-cluster-size
criterion; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
import warnings


def _reset_peak_rss() -> None:
    """Reset the kernel's driver peak-RSS counter (VmHWM) so each query
    leg reports ITS OWN high-water mark, not the session's."""
    try:
        with open("/proc/self/clear_refs", "w") as f:
            f.write("5")
    except OSError:
        pass


def _peak_rss_mb() -> float:
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmHWM:"):
                    return round(int(line.split()[1]) / 1024.0, 1)
    except OSError:
        pass
    return -1.0


def _spilled_mb(session_dir: str | None) -> float:
    """Cumulative object-store spill for this Ray session, parsed from
    the raylet's periodic 'Spilled N MiB, ...' progress lines (the
    in-process memory_summary API needs grpc, absent here). Returns the
    LAST (= largest, cumulative) value seen; 0.0 when nothing spilled."""
    import glob
    import re

    best = 0.0
    if not session_dir:
        return best
    for path in glob.glob(os.path.join(session_dir, "logs", "raylet*")):
        try:
            with open(path, errors="ignore") as f:
                for m in re.finditer(r"Spilled (\d+) MiB", f.read()):
                    best = max(best, float(m.group(1)))
        except OSError:
            continue
    return best


def run_bench() -> dict:
    warnings.filterwarnings("ignore")
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    import ray

    session_dir = None
    if not ray.is_initialized():
        rctx = ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
        session_dir = rctx.address_info.get("session_dir")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from vector_ray import datagen
    from vector_ray._compat import register_package_for_workers
    from vector_ray.pipelines import flagship

    register_package_for_workers()
    tag = datagen.tag_for_sf_dir(sf_dir)
    seq_dir = datagen.ensure_corpus(tag)
    enrich_path = datagen.enrichment_path(tag)

    # warm the page cache so we measure compute + shuffle, not cold disk
    import ray.data as rd

    rd.read_parquet(seq_dir).count()

    queries: dict[str, float] = {}

    # headline: flagship end-to-end (parse → enrich → route-partitioned
    # write → two-phase aggregate) with checkpoint markers. Best of three
    # repeats: the shared sandbox host shows 2-5x steal-noise swings
    # between identical runs (observed: 19.6s vs 3.5s for the same job
    # minutes apart), and min-of-3 measures the engine rather than
    # whichever neighbor was busy.
    mem: dict[str, dict] = {}

    def mem_leg(name: str):
        """Memory evidence per leg: reset the driver peak-RSS counter
        before and read VmHWM + session-cumulative spill delta after —
        the measured form of 'nothing materializes unbounded on the
        driver; the object store spills instead of the heap growing'."""
        spill0 = _spilled_mb(session_dir)
        _reset_peak_rss()

        def done():
            mem[name] = {
                "peak_rss_mb": _peak_rss_mb(),
                "spilled_mb": round(_spilled_mb(session_dir) - spill0, 1),
            }

        return done

    out_dir = f"/tmp/vector_ray_bench/{tag}/flagship"
    best = None
    fin = mem_leg("flagship_e2e")
    for _ in range(3):
        shutil.rmtree(out_dir, ignore_errors=True)
        os.sync()  # corpus generation's dirty pages must not steal disk BW
        t0 = time.perf_counter()
        summary = flagship.run(
            seq_dir,
            out_dir,
            enrich_path,
            flagship.FlagshipConfig(enrich_concurrency=max(2, num_cpus // 4)),
            resume=False,
        )
        elapsed = time.perf_counter() - t0
        if best is None or elapsed < best[0]:
            best = (elapsed, summary)
    fin()
    queries["flagship_e2e"] = round(best[0], 3)
    summary = best[1]

    # aggregate-only variant (no sink write): pure streaming compute.
    # Each sub-query is also best-of-2 (same steal-noise rationale).
    from vector_ray.entry_queries import (
        q_agg_lineitem,
        q_flagship_agg,
        q_minhash_pairs_documents,
        q_ann_topk,
    )
    from vector_ray.functions.tokens import pack_sequences
    from vector_ray.pipelines import flagship as _fl

    def timed(name: str, fn, reps: int = 2) -> float:
        fin = mem_leg(name)
        best_t = None
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best_t = dt if best_t is None or dt < best_t else best_t
        fin()
        return round(best_t, 3)

    queries["flagship_agg"] = timed("flagship_agg", lambda: q_flagship_agg(sf_dir), reps=3)
    queries["agg_lineitem"] = timed("agg_lineitem", lambda: q_agg_lineitem(sf_dir), reps=3)
    queries["minhash_dedup"] = timed(
        "minhash_dedup", lambda: q_minhash_pairs_documents(sf_dir).count(),
        reps=3,
    )
    queries["ann_topk"] = timed("ann_topk", lambda: q_ann_topk(sf_dir).count())
    # sequence packing (exact concat-and-chunk over the full corpus):
    # the headline tokens-axis op — shuffle-free for complete chunks
    queries["pack_2048"] = timed(
        "pack_2048",
        lambda: pack_sequences(_fl.list_input_files(seq_dir), 2048).count(),
    )
    # vocab top-k: dense bincount tree reduction, no row-level shuffle
    from vector_ray.functions.tokens import token_topk

    queries["token_topk"] = timed(
        "token_topk",
        lambda: token_topk(
            rd.read_parquet(_fl.list_input_files(seq_dir), columns=["tokens"]),
            k=50,
        ).count()
    )
    # post-training prep: per-turn SFT fan-out (narrow, one gather per
    # block) and DPO preference pairs (one candidate row per group per
    # block crosses the single exchange)
    from vector_ray.functions.tokens import turn_examples

    queries["turn_examples"] = timed(
        "turn_examples",
        lambda: turn_examples(
            rd.read_parquet(
                _fl.list_input_files(seq_dir), columns=["doc_id", "tokens"]
            ),
            lambda v: v % 97 == 0,
        ).count()
    )
    from vector_ray.entry_queries import q_preference_pairs

    queries["pref_pairs"] = timed("pref_pairs", lambda: q_preference_pairs(sf_dir).count())
    # corpus LM scoring: dense count tree reduction + broadcast logp +
    # vectorized per-sequence NLL (two passes over every token)
    from vector_ray.functions.lm import token_lm_score

    queries["lm_tokens"] = timed(
        "lm_tokens",
        lambda: token_lm_score(
            rd.read_parquet(
                _fl.list_input_files(seq_dir), columns=["doc_id", "tokens"]
            )
        ).count()
    )
    # substring (span) dedup: the one shuffle-heavy tokens-axis op —
    # combiner-reduced 128-bit gram counts; auto = the exchange mask
    # (partitioned index, query grams routed to it)
    from vector_ray.functions.tokens import plant_duplicates, span_dedupe

    # pre-materialize the planted input ONCE for the warm-up and both
    # mask legs: the legs then time the dedupe operator itself, not a
    # repeated read+plant pass (and the object-store blocks are shared
    # across all five runs below)
    planted = plant_duplicates(
        rd.read_parquet(
            _fl.list_input_files(seq_dir), columns=["doc_id", "tokens"]
        )
    ).materialize()
    # untimed warm-up: the FIRST heavy materialize of a Ray session pays
    # a one-off ~9 s allocation cost (measured: 18.8 s cold vs 9.5 s for
    # the identical plan re-run in-session). Timing the plan, not the
    # session warm-up, needs one throwaway run before either leg.
    span_dedupe(planted, n=8).count()
    # best-of-2 like every other leg: this is the longest single op in
    # the bench, so a host-steal burst mid-leg would otherwise dominate
    # the recorded number (measured 2026-08-21: 22-46 s under residual
    # load vs 7.6-9.4 s warm on the same tree, idle host)
    queries["span_dedupe"] = timed(
        "span_dedupe", lambda: span_dedupe(planted, n=8).count()
    )
    # broadcast-mask contrast (pure-streaming two-read plan, whole
    # index shipped to every worker) — the plan auto used to pick;
    # kept in the bench so the auto=exchange default stays justified
    # by a same-run measurement
    queries["span_dedupe_b"] = timed(
        "span_dedupe_b",
        lambda: span_dedupe(planted, n=8, mask="broadcast").count(),
    )
    del planted
    # n-gram novelty (round-4: packed bucket-exchange rework — the old
    # row-per-(gram,did) double groupby measured 741 s on this leg; the
    # packed two-level raw-task exchange measures ~8 s, same output)
    from vector_ray.entry_queries import q_ngram_novelty

    queries["ngram_novelty"] = timed(
        "ngram_novelty", lambda: q_ngram_novelty(sf_dir).count()
    )
    # pretrain prep e2e (mixture + split filter inside exact packing,
    # epoch shuffle, partitioned writes + checkpoints): the tokens-axis
    # counterpart of the flagship headline
    from vector_ray.pipelines import pretrain

    def _pretrain_once() -> None:
        pdir = f"/tmp/vector_ray_bench/{tag}/pretrain"
        shutil.rmtree(pdir, ignore_errors=True)
        pretrain.run(seq_dir, pdir, pretrain.PretrainConfig(), resume=False)

    queries["pretrain_pack"] = timed("pretrain_pack", _pretrain_once)

    # round-5 (VERDICT r4 item #5): heavy families previously invisible
    # to the driver bench — graph (bucketed PageRank over the events
    # edge list), Kneser–Ney bigram LM scoring, and winnowing
    # fingerprints — each through its registry query on the same sf dir
    from vector_ray.entry_queries import QUERIES as _Q

    queries["pagerank_bucketed"] = timed(
        "pagerank_bucketed",
        lambda: _Q["pagerank_events_bucketed"](sf_dir).count(),
    )
    queries["kn_bigram"] = timed(
        "kn_bigram", lambda: _Q["kn_bigram_corpus"](sf_dir).count()
    )
    queries["winnow"] = timed(
        "winnow", lambda: _Q["winnow_corpus"](sf_dir).count()
    )

    result = {
        "metric": "flagship parse->enrich->route->aggregate e2e seconds",
        "value": queries["flagship_e2e"],
        "unit": "sec",
        "queries": queries,
        "mem": mem,
        "sf": tag,
        "num_cpus": num_cpus,
        "rows": summary["rows_total"],
        "tokens": summary["tokens_total"],
        "seqs_per_sec": summary["seqs_per_sec"],
        "tokens_per_sec": summary["tokens_per_sec"],
    }
    ray.shutdown()
    return result


SCALING_ROWS = 8_000_000  # big enough that compute dominates fixed overheads


def scaling_worker(ncpu: int, tag: str) -> None:
    """One fresh-process flagship run over the scaling corpus; prints one
    JSON line with wall time + throughput."""
    warnings.filterwarnings("ignore")
    import ray

    ray.init(
        address="local", num_cpus=ncpu, include_dashboard=False,
        logging_level="ERROR",
        # honest cluster-size emulation: pyarrow's per-worker IO thread
        # pool (default 8) decompresses/encodes parquet OUTSIDE the
        # num_cpus budget, letting a "2-CPU cluster" borrow extra cores
        runtime_env={"env_vars": {"ARROW_IO_THREADS": "1",
                                  "OMP_NUM_THREADS": "1"}},
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from vector_ray import datagen
    from vector_ray._compat import register_package_for_workers
    from vector_ray.pipelines import flagship

    register_package_for_workers()
    seq = datagen.ensure_corpus(tag)
    import ray.data as rd

    rd.read_parquet(seq).count()  # warm page cache
    bench_root = os.environ.get("VECTOR_RAY_BENCH_ROOT", "/tmp/vector_ray_bench")
    out = f"{bench_root}/scaling-{tag}-{ncpu}"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.perf_counter()
    s = flagship.run(
        seq, out, datagen.enrichment_path(tag),
        # one checkpoint group: the scaling criterion measures streaming
        # throughput of the identical job shape at both levels; per-group
        # fixed costs (actor spin-up, ramp) would otherwise dominate the
        # low-CPU run (measured: 196s vs 132s at 1 CPU for 5 vs 1 groups)
        flagship.FlagshipConfig(enrich_concurrency=max(2, ncpu // 4), num_groups=1),
        resume=False,
    )
    print(
        json.dumps(
            {
                "sec": round(time.perf_counter() - t0, 3),
                "seqs_per_sec": s["seqs_per_sec"],
                "tokens_per_sec": s["tokens_per_sec"],
            }
        )
    )
    ray.shutdown()


def run_scaling_job(ncpu: int, tag: str) -> dict:
    """Fresh-process run, preceded by a sync so the previous run's dirty
    pages (GBs of routed parquet) don't steal disk bandwidth from this
    measurement. Best-of-N to damp shared-host noise."""
    bench_root = os.environ.get("VECTOR_RAY_BENCH_ROOT", "/tmp/vector_ray_bench")
    best = None
    for _ in range(2):
        shutil.rmtree(f"{bench_root}/scaling-{tag}-{ncpu}", ignore_errors=True)
        os.sync()
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--scaling-worker",
             str(ncpu), tag],
            capture_output=True, text=True, check=True,
        ).stdout
        r = json.loads(out.strip().splitlines()[-1])
        if best is None or r["sec"] < best["sec"]:
            best = r
    return best


def scaling() -> None:
    # 1 vs 4 CPUs (N vs 4N): the region where this shared single-VM
    # sandbox is actually CPU-bound — the box saturates its memory
    # bandwidth at ~8 cores for this byte-heavy workload and host noise
    # swings higher-CPU runs ±20% (full sweep + analysis in BASELINE.md).
    lo, hi = 1, 4
    tag = str(SCALING_ROWS)
    # The sandbox has ONE shared virtio disk: above ~8 concurrent writers
    # the flagship is disk-bound and extra CPUs only add I/O contention
    # (measured: 7.5s at 8 CPUs vs 13.5s at 32 for the same job). On a
    # real cluster every node brings its own disks, so for the
    # two-parallelism-level evidence we stage input + output on tmpfs
    # (RAM-backed) and measure compute + shuffle scaling.
    if os.path.isdir("/dev/shm"):
        os.environ.setdefault("VECTOR_RAY_DATA_ROOT", "/dev/shm/vector_ray_data")
        os.environ.setdefault("VECTOR_RAY_BENCH_ROOT", "/dev/shm/vector_ray_bench")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import importlib

    from vector_ray import datagen

    importlib.reload(datagen)  # pick up VECTOR_RAY_DATA_ROOT

    datagen.ensure_corpus(tag)  # generate once, outside the timed runs
    r_lo = run_scaling_job(lo, tag)
    r_hi = run_scaling_job(hi, tag)
    t_lo, t_hi = r_lo["sec"], r_hi["sec"]
    eff = (t_lo / t_hi) / (hi / lo)
    print(
        json.dumps(
            {
                "metric": "flagship e2e scaling efficiency",
                f"sec_{lo}": t_lo,
                f"sec_{hi}": t_hi,
                f"seqs_per_sec_{lo}": r_lo["seqs_per_sec"],
                f"seqs_per_sec_{hi}": r_hi["seqs_per_sec"],
                f"tokens_per_sec_{lo}": r_lo["tokens_per_sec"],
                f"tokens_per_sec_{hi}": r_hi["tokens_per_sec"],
                "scaling_efficiency": round(eff, 3),
                "rows": SCALING_ROWS,
            }
        )
    )


if __name__ == "__main__":
    if "--scaling-worker" in sys.argv:
        i = sys.argv.index("--scaling-worker")
        scaling_worker(int(sys.argv[i + 1]), sys.argv[i + 2])
    elif "--scaling" in sys.argv:
        scaling()
    else:
        print(json.dumps(run_bench()))
