"""Spec-DAG adapters for the token-layout operators
(``functions/tokens.py``, ``functions/bpe.py``, ``functions/lm.py``),
so config-driven pipelines can run the tokens-axis family —
strip/truncate/window/crop layout ops, span dedup/corruption, bigram
scoring, temperature mixing — as first-class transform types.
"""

from __future__ import annotations

__all__ = [
    "strip_tokens",
    "truncate_tokens",
    "window_chunks",
    "epoch_crop",
    "fim",
    "span_corrupt",
    "span_dedupe",
    "positional_stats",
    "bigram_lm",
    "temperature_mixture",
    "bottomk_sample",
]


def strip_tokens(ds, options: dict, ctx=None):
    """{"type": "strip_tokens", "blocklist": [0, 1]}"""
    from vector_ray.functions.tokens import strip_tokens as _f

    return _f(ds, options["blocklist"], col=options.get("col", "tokens"))


def truncate_tokens(ds, options: dict, ctx=None):
    """{"type": "truncate_tokens", "max_len": 2048}"""
    from vector_ray.functions.tokens import truncate_sequences as _f

    return _f(ds, int(options["max_len"]), col=options.get("col", "tokens"))


def window_chunks(ds, options: dict, ctx=None):
    """{"type": "window_chunks", "chunk_len": 64, "stride": 48}"""
    from vector_ray.functions.tokens import window_chunks as _f

    return _f(
        ds,
        int(options["chunk_len"]),
        int(options["stride"]),
        col=options.get("col", "tokens"),
        id_col=options.get("id_col", "doc_id"),
    )


def epoch_crop(ds, options: dict, ctx=None):
    """{"type": "epoch_crop", "crop_len": 96, "epoch": 0}"""
    from vector_ray.functions.tokens import epoch_crop as _f

    return _f(
        ds,
        int(options["crop_len"]),
        epoch=int(options.get("epoch", 0)),
        col=options.get("col", "tokens"),
        id_col=options.get("id_col", "doc_id"),
    )


def fim(ds, options: dict, ctx=None):
    """{"type": "fim"} — deterministic fill-in-middle PSM reorder."""
    from vector_ray.functions.tokens import fim_transform as _f

    return _f(
        ds, col=options.get("col", "tokens"), id_col=options.get("id_col", "doc_id")
    )


def span_corrupt(ds, options: dict, ctx=None):
    """{"type": "span_corrupt", "span_len": 4, "every": 7}"""
    from vector_ray.functions.tokens import span_corrupt as _f

    return _f(
        ds,
        span_len=int(options.get("span_len", 4)),
        every=int(options.get("every", 7)),
        col=options.get("col", "tokens"),
        id_col=options.get("id_col", "doc_id"),
    )


def span_dedupe(ds, options: dict, ctx=None):
    """{"type": "span_dedupe", "n": 8, "min_count": 2,
    "mask": "auto"|"broadcast"|"exchange"}"""
    from vector_ray.functions.tokens import span_dedupe as _f

    return _f(
        ds,
        n=int(options.get("n", 8)),
        min_count=int(options.get("min_count", 2)),
        mask=str(options.get("mask", "auto")),
    )


def positional_stats(ds, options: dict, ctx=None):
    """{"type": "positional_stats", "max_pos": 2048}"""
    from vector_ray.functions.tokens import positional_stats as _f

    return _f(ds, max_pos=int(options.get("max_pos", 2048)))


def bigram_lm(ds, options: dict, ctx=None):
    """{"type": "bigram_lm", "target": "nll"} — trains on the stage's
    own input (two passes over the upstream dataset)."""
    from vector_ray.functions.lm import bigram_lm_score as _f

    return _f(
        ds,
        field=options.get("field", "tokens"),
        target=options.get("target", "nll"),
    )


def temperature_mixture(ds, options: dict, ctx=None):
    """{"type": "temperature_mixture", "alpha": 0.7}"""
    from vector_ray.functions.curation import temperature_mixture as _f

    return _f(
        ds,
        alpha=float(options.get("alpha", 0.7)),
        token_field=options.get("token_field", "n_tok"),
        key_field=options.get("key_field", "source"),
    )


def bottomk_sample(ds, options: dict, ctx=None):
    """{"type": "bottomk_sample", "k": 1000}"""
    from vector_ray.functions.curation import bottomk_sample as _f

    return _f(ds, int(options["k"]), id_field=options.get("id_field", "doc_id"))


def loss_mask(ds, options: dict, ctx=None):
    """{"type": "loss_mask", "markers": [97], "stats": false}
    ``markers`` is the turn-switch token id list; ``marker_mod`` may be
    given instead (marker iff token % mod == 0). ``stats`` swaps the
    per-token mask column for per-sequence trainable counts."""
    from vector_ray.functions import tokens as _t

    if "marker_mod" in options:
        mod = int(options["marker_mod"])
        markers = lambda v, _m=mod: v % _m == 0  # noqa: E731
    else:
        markers = options["markers"]
    field = options.get("col", "tokens")
    if options.get("stats"):
        return _t.loss_mask_stats(
            ds, markers, id_field=options.get("id_field", "doc_id"),
            field=field,
        )
    return _t.loss_mask(
        ds, markers, field=field,
        mask_field=options.get("mask_field", "mask"),
    )


def turn_examples(ds, options: dict, ctx=None):
    """{"type": "turn_examples", "markers": [97], "max_turns": 4}
    ``marker_mod`` accepted like loss_mask. Expands each sequence into
    one prefix example per closed assistant turn."""
    from vector_ray.functions.tokens import turn_examples as _f

    if "marker_mod" in options:
        mod = int(options["marker_mod"])
        markers = lambda v, _m=mod: v % _m == 0  # noqa: E731
    else:
        markers = options["markers"]
    mt = options.get("max_turns")
    return _f(
        ds,
        markers,
        field=options.get("col", "tokens"),
        id_field=options.get("id_field", "doc_id"),
        max_turns=int(mt) if mt is not None else None,
    )


def ppl_windows(ds, options: dict, ctx=None):
    """{"type": "ppl_windows", "window": 32, "threshold": 5.6}"""
    from vector_ray.functions.lm import ppl_windows as _f

    return _f(
        ds,
        window=int(options.get("window", 32)),
        threshold=options.get("threshold"),
        field=options.get("col", "tokens"),
        id_field=options.get("id_field", "doc_id"),
    )


def ngram_novelty(ds, options: dict, ctx=None):
    """{"type": "ngram_novelty", "n": 8, "id_field": "did"}
    ``id_field`` must be int64 (novelty winner = minimum id)."""
    from vector_ray.functions.tokens import ngram_novelty as _f

    return _f(
        ds,
        n=int(options.get("n", 8)),
        id_field=options.get("id_field", "did"),
        field=options.get("col", "tokens"),
        num_buckets=int(options.get("num_buckets", 32)),
    )
