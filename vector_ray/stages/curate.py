"""Spec-DAG adapters for the corpus-curation operators
(``functions/curation.py``), so config-driven pipelines (TOML / dict
specs, the reference's component model) can use them as first-class
transform types alongside remap/filter/route.
"""

from __future__ import annotations

from vector_ray.functions import curation

__all__ = [
    "mixture_sample",
    "split_assign",
    "epoch_shuffle",
    "length_buckets",
    "repetition_stats",
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
