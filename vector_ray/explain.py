"""Plan explanation for spec-DAG pipelines — the textual analog of the
reference's canvas DAG view (ui/src/components/pipeline/view.rs): walk
the spec in topological order and annotate every node with its data
movement class, so a user can see the shuffles BEFORE running 100 TB
through them.

Classification is static, from the transform registry:
- ``narrow``  — pure map_batches, streams block-local (no data moves)
- ``shuffle`` — hash-partitions by key (groupby / map_groups / sort)
- ``hybrid``  — two-phase: narrow partials + a small shuffle of partials
- ``broadcast`` — builds small state once (driver/actors) + narrow pass
"""

from __future__ import annotations

# transform type -> movement class (see each stage's docstring for the
# partitioning assumption behind the classification)
MOVEMENT = {
    "remap": "narrow",
    "filter": "narrow",
    "route": "narrow",
    "sample": "narrow",
    "test_basic": "narrow",
    "lua": "narrow",
    "pyscript": "narrow",
    "explode": "narrow",
    "unpivot": "narrow",
    "frame": "narrow",
    "encode": "narrow",
    "tokenize": "narrow",
    "assert_schema": "narrow",
    "mixture_sample": "narrow",
    "split_assign": "narrow",
    "fold_assign": "narrow",
    "log_to_metric": "hybrid",
    "metric_to_log": "narrow",
    "aggregate": "hybrid",
    "rollup": "hybrid",
    "grouping_sets": "hybrid",  # finest-level partials re-aggregated per set
    "pivot": "hybrid",
    "log_templates": "hybrid",
    "profile": "hybrid",
    "length_buckets": "hybrid",
    "repetition_stats": "narrow",
    "tag_cardinality_limit": "hybrid",
    "throttle": "shuffle",
    "dedupe": "shuffle",
    "reduce": "shuffle",
    "window": "hybrid",
    "sessionize": "shuffle",
    "cumulative": "shuffle",
    "moving": "shuffle",
    "ewma": "shuffle",
    "retention": "shuffle",
    "decay": "shuffle",
    "cusum": "shuffle",
    "holt": "shuffle",  # same bucketed step-vectorized recurrence as ewma
    "autocorr": "shuffle",  # one key shuffle, per-group moment sums
    "scd2": "shuffle",  # one key shuffle, per-group run collapse
    "survivorship": "shuffle",  # one key shuffle, one row out per key
    "welch_ttest": "hybrid",  # 3-float (group,arm) partials -> tiny groupby
    "adamic_adar": "shuffle",  # adjacency groupby + pair groupby + anti join
    "ols_trend": "hybrid",  # 6-float block partials -> |keys|-row groupby
    "cooccurrence": "shuffle",  # distinct (entity,state) pairs cross one exchange
    "coalesce_intervals": "shuffle",
    "robust_z": "shuffle",
    "group_normalize": "shuffle",  # bucket-vectorized one-shuffle whitening
    "transitions": "shuffle",
    "interarrival": "shuffle",
    "funnel": "shuffle",
    "rank": "shuffle",
    "lag_delta": "shuffle",
    "epoch_shuffle": "shuffle",
    "stratified_sample": "hybrid",
    "enrich": "broadcast",
    "zscore": "broadcast",
    "quantile_bucket": "broadcast",
    "lm_score": "broadcast",
    "heavy_hitters": "hybrid",  # MG summaries -> small merge -> broadcast verify
    "pagerank": "hybrid",  # per-iter: edge-block partials -> tiny groupby; rank vector broadcast or bucketed
    "hits": "hybrid",  # two passes per iter, same partial/groupby split
    "weighted_sample": "hybrid",  # local top-k prune -> k-by-blocks sort
    "kmeans": "broadcast",
    "logreg_quality": "broadcast",  # tiny gradient partials up, weights down
    "pca_whiten": "broadcast",  # d+d^2 partials up, (mean, basis) down
    "quantize_embeddings": "broadcast",  # per-dim min/max up, bounds down
    "semdedup": "shuffle",
    "hot_spans": "broadcast",
    "budget_select": "broadcast",
    "dsir": "broadcast",
    "topk_per_key": "shuffle",
    "join": "shuffle",  # one tagged-union hash exchange, per-bucket Arrow join
    "asof_join": "shuffle",  # same exchange, per-bucket searchsorted merge
    # token-layout family
    "token_entropy": "narrow",
    "strip_tokens": "narrow",
    "truncate_tokens": "narrow",
    "window_chunks": "narrow",
    "epoch_crop": "narrow",
    "fim": "narrow",
    "span_corrupt": "narrow",
    "span_dedupe": "shuffle",  # packed gram-count exchange + broadcast mask
    "positional_stats": "hybrid",
    "bigram_lm": "broadcast",
    "temperature_mixture": "broadcast",
    "bottomk_sample": "hybrid",
    "loss_mask": "narrow",  # per-row turn masking, offsets-vectorized
    "turn_examples": "narrow",  # per-turn prefix fan-out, one gather per block
    "ppl_windows": "broadcast",  # 256x256 bigram partials up, logp down
    "ngram_novelty": "shuffle",  # gram-key groupbys + bucketed join
    "unimax_sample": "broadcast",  # per-source counts up, budgets down
    "preference_pairs": "shuffle",  # 1-row-per-group block partials, one key exchange
    # privacy / anomaly / ANN-compression family
    "kanonymity": "hybrid",  # two-phase combo counts; suppress adds a bucketed join
    "hbos": "broadcast",  # bounded histograms up, lookup tables down
    "compression_ratio": "narrow",
    "kn_bigram": "broadcast",  # 256x256 KN counts up, logp table down
    "pq_codes": "broadcast",  # minmax + sample partials up, codebooks down
    "hard_negatives": "broadcast",  # anchor matrix down, per-anchor top-1 partials up
    "negative_samples": "broadcast",  # dense counts up, cum table down
    "skipgram": "narrow",  # 2*window shifted views per block, no shuffle
    "mode": "hybrid",  # (key,value) count partials -> top-1 + totals join
    "cosine_join": "broadcast",  # bounded probe matrix down, one matmul per block
    "psi": "hybrid",  # bounded (key,bucket,half) count partials -> tiny finalize
    "winnow": "narrow",  # sliding-window argmin per block, no shuffle
    "texttile": "narrow",  # per-doc block dots, one lexsort per batch
    # dense time-series family
    "gapfill": "shuffle",  # bounds partials up, then one groupby on key
    "seasonal_z": "hybrid",  # tumbling partials -> gapfill shuffle -> slot zscore
    "burn_rate": "hybrid",  # one two-phase agg; long rates re-reduced + broadcast
    "winsorize": "broadcast",  # quantile partials up, two thresholds down
}


def explain(spec_dict: dict) -> str:
    """Render a topologically-ordered plan with movement annotations and
    a shuffle count summary. Pure metadata — never touches Ray."""
    from vector_ray.pipeline import PipelineSpec, _topo_order

    spec = (
        spec_dict
        if isinstance(spec_dict, PipelineSpec)
        else PipelineSpec.from_dict(spec_dict)
    )
    lines: list[str] = []
    for name, cfg in spec.sources.items():
        lines.append(f"source    {name:<20} {cfg.get('type', '?')}")
    n_shuffles = 0
    for name in _topo_order(spec):
        cfg = spec.transforms[name]
        typ = cfg.get("type", "?")
        move = MOVEMENT.get(typ, "narrow")
        if move == "shuffle":
            n_shuffles += 1
        ins = ",".join(cfg.get("inputs", []))
        lines.append(f"transform {name:<20} {typ:<22} [{move}]  <- {ins}")
    for name, cfg in spec.sinks.items():
        ins = ",".join(cfg.get("inputs", []))
        lines.append(f"sink      {name:<20} {cfg.get('type', '?'):<22} <- {ins}")
    hybrids = sum(
        1
        for n in spec.transforms
        if MOVEMENT.get(spec.transforms[n].get("type"), "narrow") == "hybrid"
    )
    lines.append(
        f"-- {n_shuffles} full shuffle(s), {hybrids} two-phase partial "
        "aggregation(s); everything else streams block-local"
    )
    return "\n".join(lines)
