"""Transform registry — the palette analog (ui palette.rs:125-150).

Each entry maps a component ``type`` string to a function
``stage(ds, options, ctx) -> ray.data.Dataset``. Unknown types fail
validation with ``UNKNOWN_TYPE`` (the reference's unknown-component
handling, config_panel.rs:655 GenericForm / validation MISSING_TYPE
family).
"""

from __future__ import annotations

from vector_ray.stages import (
    core,
    curate,
    enrich,
    grouped,
    metricops,
    reshape,
    timeseries,
    tokenops,
)
from vector_ray.stages.encode import encode
from vector_ray.stages.framing import frame
from vector_ray.stages.tokenize import tokenize
from vector_ray.stages.window import window


def _pyscript(ds, options, ctx=None):
    """`lua` analog (palette.rs:128): arbitrary user batch UDF.

    options["fn"] is a callable ``batch -> batch``; options["batch_format"]
    selects the batch type (default pyarrow). The user-extension slot.
    """
    return ds.map_batches(
        options["fn"],
        batch_format=options.get("batch_format", "pyarrow"),
        batch_size=options.get("batch_size"),
    )


def _lua(ds, options, ctx=None):
    """Vector ``lua`` transform (palette.rs:128). Two accepted forms:
    (a) the user-extension slot — options["fn"] is a Python batch UDF
    (same as ``pyscript``); (b) a VERBATIM Vector lua v2 config
    (``hooks.process = "function (event, emit) ... end"``) whose
    trivially mappable statement subset is translated to the vectorized
    VRL remap by stages/lua_compat.py — anything outside that subset
    raises VrlError naming the construct."""
    if "fn" in options:
        return _pyscript(ds, options, ctx)
    from vector_ray.stages.lua_compat import lua_to_vrl

    return core.remap(ds, {"source": lua_to_vrl(options)}, ctx)


def _topk_per_key(ds, options, ctx=None):
    """Skew-safe per-key top-k as a spec transform (stages/shuffle.py):
    {"type": "topk_per_key", "key": "source", "order_by": "latency_ms",
     "k": 5, "descending": true, "tiebreak": "doc_id"}"""
    from vector_ray.stages.shuffle import topk_per_key

    return topk_per_key(
        ds,
        options["key"],
        options["order_by"],
        int(options["k"]),
        descending=bool(options.get("descending", True)),
        tiebreak=options.get("tiebreak"),
        salt_buckets=int(options.get("salt_buckets", 16)),
    )


def _join(ds, options, ctx=None):
    """Two-input equi-join as a spec transform (stages/shuffle.py
    bucketed_join): {"type": "join", "inputs": ["left_node"],
    "right": "right_node", "key": "user_id", "how": "inner",
    "num_buckets": 32, "suffix": "_r"}. The pipeline compiler resolves
    the ``right`` node ref and hands its Dataset in as ``_right_ds``
    (referential integrity enforced by validate_spec, and the right
    node participates in topo ordering / fan-out materialization like
    any other edge). ``how``: inner | left | full | semi | anti."""
    from vector_ray.stages.shuffle import bucketed_join

    right = options.get("_right_ds")
    if right is None:
        raise ValueError(
            "join requires a 'right' option naming an upstream node"
        )
    return bucketed_join(
        ds,
        right,
        options["key"],
        num_buckets=int(options.get("num_buckets", 32)),
        how=options.get("how", "inner"),
        suffix=options.get("suffix", "_r"),
    )


def _asof_join(ds, options, ctx=None):
    """Two-input as-of join as a spec transform (stages/shuffle.py
    bucketed_asof_join): {"type": "asof_join", "inputs": ["events"],
    "right": "configs", "by": "host", "on": "ts",
    "direction": "backward", "tolerance": 60000000}. Same ``right``
    node-ref plumbing as "join"."""
    from vector_ray.stages.shuffle import bucketed_asof_join

    right = options.get("_right_ds")
    if right is None:
        raise ValueError(
            "asof_join requires a 'right' option naming an upstream node"
        )
    tol = options.get("tolerance")
    return bucketed_asof_join(
        ds,
        right,
        by=options["by"],
        on=options["on"],
        num_buckets=int(options.get("num_buckets", 32)),
        how=options.get("how", "left"),
        suffix=options.get("suffix", "_r"),
        direction=options.get("direction", "backward"),
        tolerance=int(tol) if tol is not None else None,
    )


def _profile(ds, options, ctx=None):
    """Data-quality profile stage (functions/dataops.py): per-column
    rows / nulls / distinct counts; ``approx`` swaps exact distinct for
    the mergeable HLL sketch."""
    from vector_ray.functions.dataops import profile_columns

    return profile_columns(
        ds, options["columns"], approx=bool(options.get("approx", False))
    )



def _cosine_join(ds, options, ctx=None):
    """Two-input cosine similarity join as a spec transform
    (functions/similarity.py cosine_join): {"type": "cosine_join",
    "inputs": ["corpus"], "right": "probes", "threshold": 0.4}. The
    right node is the bounded probe set (broadcast once); same
    ``right`` node-ref plumbing as "join"."""
    from vector_ray.functions.similarity import cosine_join

    right = options.get("_right_ds")
    if right is None:
        raise ValueError(
            "cosine_join requires a 'right' option naming an upstream node"
        )
    return cosine_join(
        ds,
        right,
        threshold=float(options.get("threshold", 0.4)),
        id_field=options.get("id_field", "vec_id"),
        right_id_field=options.get("right_id_field"),
        field=options.get("field", "embedding"),
        round_to=int(options.get("round", 6)),
    )


TRANSFORMS = {
    "remap": core.remap,
    "filter": core.filter_,
    "route": core.route,
    "sample": core.sample,
    "throttle": grouped.throttle,
    "dedupe": grouped.dedupe,
    "reduce": grouped.reduce_,
    "aggregate": grouped.aggregate,
    "zscore": grouped.zscore,
    "funnel": grouped.funnel,
    "interarrival": grouped.interarrival,
    "sessionize": grouped.sessionize,
    "cumulative": grouped.cumulative,
    "moving": grouped.moving,
    "ewma": grouped.ewma,
    "retention": grouped.retention,
    "decay": grouped.decay,
    "cusum": grouped.cusum,
    "coalesce_intervals": grouped.coalesce_intervals,
    "robust_z": grouped.robust_z,
    "group_normalize": grouped.group_normalize,
    "transitions": grouped.transitions,
    "ols_trend": grouped.ols_trend,
    "cooccurrence": grouped.cooccurrence,
    "holt": grouped.holt,
    "autocorr": grouped.autocorr,
    "scd2": grouped.scd2,
    "survivorship": grouped.survivorship,
    "welch_ttest": grouped.welch_ttest,
    "rollup": grouped.rollup,
    "grouping_sets": grouped.grouping_sets,
    "pivot": grouped.pivot,
    "quantile_bucket": grouped.quantile_bucket,
    # dense time-series family (stages/timeseries.py)
    "gapfill": timeseries.gapfill,
    "seasonal_z": timeseries.seasonal_z,
    "burn_rate": timeseries.burn_rate,
    "winsorize": timeseries.winsorize,
    "explode": reshape.explode,
    "unpivot": reshape.unpivot,
    "rank": reshape.rank,
    "lag_delta": reshape.lag_delta,
    "profile": _profile,
    "topk_per_key": _topk_per_key,
    "join": _join,
    "asof_join": _asof_join,
    "cosine_join": _cosine_join,
    "log_templates": reshape.log_templates,
    "log_to_metric": metricops.log_to_metric,
    "metric_to_log": metricops.metric_to_log,
    "tag_cardinality_limit": metricops.tag_cardinality_limit,
    "lua": _lua,
    "pyscript": _pyscript,
    "test_basic": core.identity,
    "assert_schema": core.assert_schema,
    "enrich": enrich.enrich,
    "tokenize": tokenize,
    "window": window,
    "frame": frame,
    "encode": encode,
    # corpus-curation family (functions/curation.py)
    "mixture_sample": curate.mixture_sample,
    "split_assign": curate.split_assign,
    "fold_assign": curate.fold_assign,
    "epoch_shuffle": curate.epoch_shuffle,
    "length_buckets": curate.length_buckets,
    "repetition_stats": curate.repetition_stats,
    "token_entropy": curate.token_entropy,
    "logreg_quality": curate.logreg_quality,
    # semantic-curation family (functions/lm.py, functions/cluster.py)
    "lm_score": curate.lm_score,
    "weighted_sample": curate.weighted_sample,
    "heavy_hitters": curate.heavy_hitters,
    "pagerank": curate.pagerank,
    "hits": curate.hits,
    "adamic_adar": curate.adamic_adar,
    "pca_whiten": curate.pca_whiten,
    "quantize_embeddings": curate.quantize_embeddings,
    "kmeans": curate.kmeans,
    "semdedup": curate.semdedup,
    "hot_spans": curate.hot_spans,
    "budget_select": curate.budget_select,
    "stratified_sample": curate.stratified_sample,
    "dsir": curate.dsir,
    # token-layout family (functions/tokens.py, bpe.py, lm.py)
    "strip_tokens": tokenops.strip_tokens,
    "truncate_tokens": tokenops.truncate_tokens,
    "window_chunks": tokenops.window_chunks,
    "epoch_crop": tokenops.epoch_crop,
    "fim": tokenops.fim,
    "span_corrupt": tokenops.span_corrupt,
    "span_dedupe": tokenops.span_dedupe,
    "positional_stats": tokenops.positional_stats,
    "bigram_lm": tokenops.bigram_lm,
    "temperature_mixture": tokenops.temperature_mixture,
    "bottomk_sample": tokenops.bottomk_sample,
    "loss_mask": tokenops.loss_mask,
    "turn_examples": tokenops.turn_examples,
    "ppl_windows": tokenops.ppl_windows,
    "ngram_novelty": tokenops.ngram_novelty,
    "unimax_sample": curate.unimax_sample,
    "preference_pairs": curate.preference_pairs,
    # privacy / anomaly / ANN-compression family (round 5)
    "kanonymity": curate.kanonymity,
    "hbos": curate.hbos,
    "compression_ratio": curate.compression_ratio,
    "kn_bigram": curate.kn_bigram,
    "pq_codes": curate.pq_codes,
    "hard_negatives": curate.hard_negatives,
    "negative_samples": curate.negative_samples,
    "skipgram": curate.skipgram,
    "mode": curate.mode,
    "psi": curate.psi,
    "winnow": curate.winnow,
    "texttile": curate.texttile,
}

__all__ = ["TRANSFORMS", "core", "grouped", "metricops", "enrich"]
