"""Spec-DAG adapters for the corpus-curation operators
(``functions/curation.py``), so config-driven pipelines (TOML / dict
specs, the reference's component model) can use them as first-class
transform types alongside remap/filter/route.
"""

from __future__ import annotations

import pyarrow as pa

from vector_ray.functions import curation

__all__ = [
    "mixture_sample",
    "split_assign",
    "epoch_shuffle",
    "length_buckets",
    "repetition_stats",
    "token_entropy",
    "lm_score",
    "weighted_sample",
    "heavy_hitters",
    "kmeans",
    "semdedup",
    "hot_spans",
    "budget_select",
    "stratified_sample",
    "pagerank",
    "hits",
    "logreg_quality",
    "pca_whiten",
    "quantize_embeddings",
]


def mixture_sample(ds, options: dict, ctx=None):
    """{"type": "mixture_sample", "rates": {"web": 0.25}, "default": 1.0}"""
    return curation.mixture_sample(
        ds, options.get("rates", {}), float(options.get("default", 1.0))
    )


def split_assign(ds, options: dict, ctx=None):
    """{"type": "split_assign", "val_per_mille": 10}"""
    return curation.split_assign(ds, int(options.get("val_per_mille", 10)))


def epoch_shuffle(ds, options: dict, ctx=None):
    """{"type": "epoch_shuffle", "epoch": 0, "id_field": "doc_id"}"""
    return curation.epoch_shuffle(
        ds, int(options.get("epoch", 0)), options.get("id_field", "doc_id")
    )


def length_buckets(ds, options: dict, ctx=None):
    """{"type": "length_buckets", "bucket_size": 256}"""
    return curation.length_buckets(ds, int(options.get("bucket_size", 256)))


def repetition_stats(ds, options: dict, ctx=None):
    """{"type": "repetition_stats", "max_freq_pct": 5}"""
    return curation.repetition_stats(ds, int(options.get("max_freq_pct", 5)))


def logreg_quality(ds, options: dict, ctx=None):
    """{"type": "logreg_quality", "positive_sources": ["wiki"],
    "iters": 3, "lr": 0.5} — distributed logistic-regression quality
    classifier over token stats (functions/classifier.py); emits
    (doc_id, prob, label)."""
    from vector_ray.functions.classifier import quality_classifier

    return quality_classifier(
        ds,
        positive_sources=tuple(
            options.get("positive_sources", ("wiki", "books", "academic"))
        ),
        iters=int(options.get("iters", 3)),
        lr=float(options.get("lr", 0.5)),
        round_to=int(options.get("round", 6)),
    )


def token_entropy(ds, options: dict, ctx=None):
    """{"type": "token_entropy", "round": 4} — per-doc Shannon entropy
    of the token distribution (nats), the low-entropy templated-text
    filter signal (functions/curation.py)."""
    return curation.token_entropy(ds, round_to=int(options.get("round", 4)))


def lm_score(ds, options: dict, ctx=None):
    """{"type": "lm_score", "field": "text", "vocab_size": 30} — corpus
    unigram-LM NLL scoring (functions/lm.py); trains on the stage's own
    input (two passes over the upstream dataset)."""
    from vector_ray.functions.lm import lm_score as _lm_score

    return _lm_score(
        ds,
        field=options.get("field", "text"),
        vocab_size=int(options.get("vocab_size", 30)),
    )


def weighted_sample(ds, options: dict, ctx=None):
    """{"type": "weighted_sample", "k": 100, "weight_field": "q"} —
    exactly-k quality-weighted sampling (functions/curation.py)."""
    from vector_ray.functions.curation import weighted_sample as _ws

    return _ws(
        ds,
        k=int(options["k"]),
        weight_field=options["weight_field"],
        id_field=options.get("id_field", "doc_id"),
    )


def heavy_hitters(ds, options: dict, ctx=None):
    """{"type": "heavy_hitters", "field": "text", "k": 20,
    "capacity": 4096} — exact top-k over an unbounded key domain
    (functions/lm.py). The per-run exactness proof is exposed as a
    `provably_exact` bool column on every output row; set
    "require_exact": true to raise instead when the proof fails."""
    import ray.data as rd

    from vector_ray.functions.lm import heavy_hitters as _hh

    top, exact = _hh(
        ds,
        field=options.get("field", "text"),
        k=int(options.get("k", 20)),
        capacity=int(options.get("capacity", 4096)),
    )
    if options.get("require_exact") and not exact:
        raise ValueError(
            "heavy_hitters: exactness proof failed (k-th count does not "
            "dominate the Misra-Gries error bound); raise capacity"
        )
    top = top.append_column(
        "provably_exact", pa.array([exact] * top.num_rows, pa.bool_())
    )
    return rd.from_arrow(top)


def kmeans(ds, options: dict, ctx=None):
    """{"type": "kmeans", "k": 10, "iters": 3, "id_field": "vec_id",
    "field": "embedding"} — full-corpus Lloyd fit + cluster column
    (functions/cluster.py). The upstream dataset is re-executed once
    per iteration; feed it a source read, not an expensive subgraph."""
    from vector_ray.functions.cluster import kmeans_assign, kmeans_fit

    id_field = options.get("id_field", "vec_id")
    field = options.get("field", "embedding")
    cent = kmeans_fit(
        ds,
        k=int(options.get("k", 10)),
        iters=int(options.get("iters", 3)),
        id_field=id_field,
        field=field,
    )
    return kmeans_assign(ds, cent, id_field=id_field, field=field)


def semdedup(ds, options: dict, ctx=None):
    """{"type": "semdedup", "k": 10, "iters": 3, "tau": 0.9} —
    cluster-partitioned semantic dedup (functions/cluster.py)."""
    from vector_ray.functions.cluster import kmeans_fit
    from vector_ray.functions.cluster import semdedup as _semdedup

    id_field = options.get("id_field", "vec_id")
    field = options.get("field", "embedding")
    cent = kmeans_fit(
        ds,
        k=int(options.get("k", 10)),
        iters=int(options.get("iters", 3)),
        id_field=id_field,
        field=field,
    )
    return _semdedup(
        ds, cent, float(options["tau"]), id_field=id_field, field=field
    )


def hot_spans(ds, options: dict, ctx=None):
    """{"type": "hot_spans", "n": 3, "min_count": 4} — corpus-frequency
    repeated-phrase (boilerplate) stats (functions/spans.py); trains on
    the stage's own input (two passes)."""
    from vector_ray.functions.spans import hot_span_stats

    return hot_span_stats(
        ds,
        field=options.get("field", "text"),
        id_field=options.get("id_field", "doc_id"),
        n=int(options.get("n", 3)),
        min_count=int(options.get("min_count", 4)),
    )


def budget_select(ds, options: dict, ctx=None):
    """{"type": "budget_select", "budget": 10000, "score_field": "q",
    "weight_field": "n_tok"} — keep best-scoring rows until the global
    weight budget fills (functions/selection.py)."""
    from vector_ray.functions.selection import budget_select as _bs

    return _bs(
        ds,
        budget=int(options["budget"]),
        score_field=options["score_field"],
        weight_field=options["weight_field"],
        id_field=options.get("id_field", "doc_id"),
        bins=int(options.get("bins", 4096)),
        lo=float(options.get("lo", 0.0)),
        hi=float(options.get("hi", 1.0)),
    )


def pagerank(ds, options: dict, ctx=None):
    """{"type": "pagerank", "src": "src", "dst": "dst", "iters": 4,
    "damping": 0.85, "mode": "auto"} — link-graph centrality over an
    edge dataset (functions/graph.py); emits (node:int64,
    rank:float64). mode=auto broadcasts the rank vector when the node
    set fits a worker heap, else co-partitions with bucketed joins."""
    import ray.data as rd

    from vector_ray.functions.graph import pagerank as _pr

    out = _pr(
        ds,
        src=options.get("src", "src"),
        dst=options.get("dst", "dst"),
        iters=int(options.get("iters", 4)),
        damping=float(options.get("damping", 0.85)),
        mode=options.get("mode", "auto"),
        broadcast_limit=int(options.get("broadcast_limit", 4_000_000)),
        num_buckets=int(options.get("num_buckets", 32)),
        round_to=int(options.get("round", 6)),
        weight=options.get("weight"),
    )
    return rd.from_arrow(out) if isinstance(out, pa.Table) else out


def pca_whiten(ds, options: dict, ctx=None):
    """{"type": "pca_whiten", "k": 8, "field": "embedding"} —
    distributed PCA whitening (functions/embeddings.py); emits
    (id_field, whitened:list<double>)."""
    from vector_ray.functions.embeddings import pca_whiten as _pw

    return _pw(
        ds,
        k=int(options.get("k", 8)),
        field=options.get("field", "embedding"),
        id_field=options.get("id_field", "vec_id"),
        round_to=int(options.get("round", 6)),
    )


def quantize_embeddings(ds, options: dict, ctx=None):
    """{"type": "quantize_embeddings", "levels": 256} — global
    per-dimension linear quantization (functions/embeddings.py)."""
    from vector_ray.functions.embeddings import quantize_embeddings as _qe

    return _qe(
        ds,
        field=options.get("field", "embedding"),
        id_field=options.get("id_field", "vec_id"),
        levels=int(options.get("levels", 256)),
    )


def hits(ds, options: dict, ctx=None):
    """{"type": "hits", "src": "src", "dst": "dst", "iters": 4} —
    Kleinberg hubs/authorities over an edge dataset
    (functions/graph.py); emits (node, hub, authority)."""
    import ray.data as rd

    from vector_ray.functions.graph import hits as _hits

    return rd.from_arrow(
        _hits(
            ds,
            src=options.get("src", "src"),
            dst=options.get("dst", "dst"),
            iters=int(options.get("iters", 4)),
            round_to=int(options.get("round", 6)),
        )
    )


def stratified_sample(ds, options: dict, ctx=None):
    """{"type": "stratified_sample", "n_per_key": 20, "key": "source"}
    — exact deterministic per-stratum sampling (functions/curation.py)."""
    return curation.stratified_sample(
        ds,
        int(options["n_per_key"]),
        key=options.get("key", "source"),
        id_field=options.get("id_field", "doc_id"),
    )


def dsir(ds, options: dict, ctx=None):
    """{"type": "dsir", "field": "text",
        "target_condition": ".lang == 'en'", "vocab_size": 30,
        "target": "logratio"}
    — DSIR importance scoring (functions/lm.dsir_score) where the
    target-domain sample is selected from the SAME input by a VRL
    condition (the practical shape: "score everything by how much it
    looks like my curated slice")."""
    from vector_ray.functions.lm import dsir_score
    from vector_ray.stages.core import compile_filter

    keep = compile_filter(
        {
            "condition": options["target_condition"],
            "condition_type": options.get("condition_type", "vrl"),
        }
    )
    target_ds = ds.map_batches(keep, batch_format="pyarrow")
    return dsir_score(
        ds,
        target_ds,
        field=options.get("field", "text"),
        vocab_size=int(options.get("vocab_size", 30)),
    )


def adamic_adar(ds, options: dict, ctx=None):
    """{"type": "adamic_adar", "src": "src", "dst": "dst",
    "min_common": 2, "max_degree": null} — Adamic-Adar link-prediction
    scores for non-adjacent pairs (functions/graph.py); emits
    (node_a, node_b, n_common, score)."""
    from vector_ray.functions.graph import adamic_adar as _aa

    md = options.get("max_degree")
    return _aa(
        ds,
        src=options.get("src", "src"),
        dst=options.get("dst", "dst"),
        min_common=int(options.get("min_common", 2)),
        round_to=int(options.get("round", 6)),
        max_degree=int(md) if md is not None else None,
        num_buckets=int(options.get("num_buckets", 16)),
    )


def unimax_sample(ds, options: dict, ctx=None):
    """{"type": "unimax_sample", "budget_factor": 1, "max_epochs": 3}"""
    return curation.unimax_sample(
        ds,
        budget_factor=int(options.get("budget_factor", 1)),
        max_epochs=int(options.get("max_epochs", 3)),
        id_field=options.get("id_field", "doc_id"),
        count_field=options.get("count_field", "n_tok"),
        source_field=options.get("source_field", "source"),
    )


def preference_pairs(ds, options: dict, ctx=None):
    """{"type": "preference_pairs", "group_by": "prompt_id",
    "score_field": "score", "id_field": "doc_id", "margin": 0.0}"""
    return curation.preference_pairs(
        ds,
        group_field=options.get("group_by", "prompt_id"),
        score_field=options.get("score_field", "score"),
        id_field=options.get("id_field", "doc_id"),
        margin=float(options.get("margin", 0.0)),
        num_buckets=int(options.get("num_buckets", 64)),
    )


def kanonymity(ds, options: dict, ctx=None):
    """{"type": "kanonymity", "quasi": ["event_type", "vbucket"],
        "k": 25, "mode": "audit" | "suppress", "id_field": "event_id"}"""
    from vector_ray.functions.dataops import kanonymity as _kanon

    return _kanon(
        ds,
        list(options["quasi"]),
        k=int(options.get("k", 25)),
        mode=options.get("mode", "audit"),
        id_field=options.get("id_field", "event_id"),
        num_buckets=int(options.get("num_buckets", 32)),
    )


def hbos(ds, options: dict, ctx=None):
    """{"type": "hbos", "features": ["h", "vb"], "id_field": "event_id"}
    Features must already be discrete int bucket columns."""
    from vector_ray.functions.dataops import hbos_score

    return hbos_score(
        ds,
        list(options["features"]),
        id_field=options.get("id_field", "event_id"),
        target=options.get("target", "hbos"),
        round_to=int(options.get("round", 6)),
    )


def compression_ratio(ds, options: dict, ctx=None):
    """{"type": "compression_ratio", "field": "text", "id_field": "doc_id"}"""
    from vector_ray.functions.text import compression_ratio as _cr

    return _cr(
        ds,
        field=options.get("field", "text"),
        id_field=options.get("id_field", "doc_id"),
        level=int(options.get("level", 6)),
        round_to=int(options.get("round", 4)),
    )


def kn_bigram(ds, options: dict, ctx=None):
    """{"type": "kn_bigram", "field": "tokens", "discount": 0.75}"""
    from vector_ray.functions.lm import kn_bigram_score

    return kn_bigram_score(
        ds,
        field=options.get("field", "tokens"),
        target=options.get("target", "nll_kn"),
        discount=float(options.get("discount", 0.75)),
        round_to=int(options.get("round", 4)),
    )


def pq_codes(ds, options: dict, ctx=None):
    """{"type": "pq_codes", "m": 8, "k": 16, "sample_size": 512}"""
    from vector_ray.functions.similarity import pq_codes as _pq

    return _pq(
        ds,
        field=options.get("field", "embedding"),
        id_field=options.get("id_field", "vec_id"),
        m=int(options.get("m", 8)),
        k=int(options.get("k", 16)),
        sample_size=int(options.get("sample_size", 512)),
        iters=int(options.get("iters", 4)),
    )


def hard_negatives(ds, options: dict, ctx=None):
    """{"type": "hard_negatives", "n_anchors": 32, "label_field": "label"}"""
    from vector_ray.functions.similarity import hard_negatives as _hn

    return _hn(
        ds,
        n_anchors=int(options.get("n_anchors", 32)),
        id_field=options.get("id_field", "vec_id"),
        field=options.get("field", "embedding"),
        label_field=options.get("label_field", "label"),
        round_to=int(options.get("round", 6)),
    )


def negative_samples(ds, options: dict, ctx=None):
    """{"type": "negative_samples", "k": 4, "alpha": 0.75}"""
    from vector_ray.functions.tokens import negative_samples as _ns

    return _ns(
        ds,
        k=int(options.get("k", 4)),
        alpha=float(options.get("alpha", 0.75)),
        scale=int(options.get("scale", 1000)),
        id_field=options.get("id_field", "doc_id"),
    )


def skipgram(ds, options: dict, ctx=None):
    """{"type": "skipgram", "window": 2, "id_field": "doc_id"}"""
    from vector_ray.functions.tokens import skipgram_pairs

    return skipgram_pairs(
        ds,
        window=int(options.get("window", 2)),
        id_field=options.get("id_field", "doc_id"),
    )


def mode(ds, options: dict, ctx=None):
    """{"type": "mode", "key": "user_id", "field": "event_type"}"""
    from vector_ray.stages.shuffle import mode_per_key

    return mode_per_key(
        ds,
        key=options["key"],
        field=options["field"],
        salt_buckets=int(options.get("salt_buckets", 16)),
        num_buckets=int(options.get("num_buckets", 32)),
        round_to=int(options.get("round", 6)),
    )


def psi(ds, options: dict, ctx=None):
    """{"type": "psi", "key": "event_type", "bucket": "vb",
        "half": "half"} — columns pre-derived upstream (remap).
    psi_drift finalizes to one tiny Arrow table (bounded by the
    discretization); re-wrap it so downstream nodes see a Dataset."""
    import ray.data as rd

    from vector_ray.functions.dataops import psi_drift

    out = psi_drift(
        ds,
        key=options["key"],
        bucket=options["bucket"],
        half=options["half"],
        round_to=int(options.get("round", 6)),
    )
    return rd.from_arrow(out)


def winnow(ds, options: dict, ctx=None):
    """{"type": "winnow", "k": 4, "window": 4, "id_field": "doc_id"}"""
    from vector_ray.functions.dedup import winnow_fingerprints

    return winnow_fingerprints(
        ds,
        k=int(options.get("k", 4)),
        window=int(options.get("window", 4)),
        id_field=options.get("id_field", "doc_id"),
        token_field=options.get("token_field", "tokens"),
    )


def texttile(ds, options: dict, ctx=None):
    """{"type": "texttile", "field": "text", "block_words": 10}"""
    from vector_ray.functions.text import texttile as _tt

    return _tt(
        ds,
        field=options.get("field", "text"),
        id_field=options.get("id_field", "doc_id"),
        block_words=int(options.get("block_words", 10)),
    )


def fold_assign(ds, options: dict, ctx=None):
    """{"type": "fold_assign", "n_folds": 5, "id_field": "doc_id"}"""
    return curation.fold_assign(
        ds,
        n_folds=int(options.get("n_folds", 5)),
        id_field=options.get("id_field", "doc_id"),
    )
