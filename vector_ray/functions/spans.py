"""Repeated-phrase (boilerplate) detection: find word n-grams that
occur at least ``min_count`` times across the WHOLE corpus and score
each document by how much of it is built from them — the repeated-span
/ boilerplate-removal step of web-corpus pipelines (the line-dedup
analog of CCNet, phrase-level because the test corpus has no line
structure).

Distributed shape (100 TB path):
  1. per-batch n-gram hash counts (``np.unique`` over the vectorized
     FNV shingle hashes — reuses the minhash word-hash kernels) ->
     one small groupby-sum over distinct gram hashes. The shuffle
     carries one (hash, count) row per distinct gram per block, never
     window-level rows.
  2. the hot set (count >= min_count) is by construction the corpus's
     boilerplate vocabulary — small; it is collected once (guarded by
     ``max_hot``), sorted, broadcast via ``ray.put``.
  3. per-doc scoring: recompute window hashes, ``np.searchsorted``
     membership against the broadcast sorted array, per-row counts.

Gram identity is the 64-bit FNV combination of the per-word hashes;
two distinct grams colliding would merge their counts (p ~ n_grams^2 /
2^65 — negligible, and the SQL oracle would catch it).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data.aggregate import Sum

from vector_ray.functions.dedup import _word_hashes
from vector_ray.schema import round_sql_np

_FNV_PRIME = np.uint64(0x100000001B3)


def _strict_windows(col, n: int) -> tuple[np.ndarray, np.ndarray]:
    """(windows_per_row, flat_window_hashes): STRICT n-word windows —
    rows shorter than n contribute zero windows (matching SQL
    ``generate_series(1, len(ws) - n + 1)``), unlike the minhash
    shingles which pad short rows."""
    offsets, h = _word_hashes(col)
    lengths = np.diff(offsets)
    n_win = np.maximum(lengths - n + 1, 0).astype(np.int64)
    total = int(n_win.sum())
    flat = np.zeros(total, dtype=np.uint64)
    if total:
        out_off = np.zeros(len(lengths) + 1, dtype=np.int64)
        np.cumsum(n_win, out=out_off[1:])
        within = np.arange(total) - np.repeat(out_off[:-1], n_win)
        starts = np.repeat(offsets[:-1], n_win) + within
        for j in range(n):
            flat = flat * _FNV_PRIME + h[starts + j]
    return n_win, flat


def hot_span_stats(
    ds,
    field: str = "text",
    id_field: str = "doc_id",
    n: int = 3,
    min_count: int = 4,
    max_hot: int = 5_000_000,
    round_to: int = 4,
):
    """Per-document boilerplate stats: (id, n_windows, n_hot,
    hot_ratio) where n_hot counts the document's n-word windows whose
    gram occurs >= min_count times corpus-wide."""

    def count_partial(t: pa.Table) -> pa.Table:
        _, flat = _strict_windows(t[field], n)
        # reinterpret the uint64 hash as int64 for the shuffle key:
        # values above 2^63 overflow Ray's python-int sort boundaries
        # and fall back to pickled object blocks
        u, c = np.unique(flat.view(np.int64), return_counts=True)
        return pa.table(
            {
                "gram": pa.array(u, pa.int64()),
                "n": pa.array(c, pa.int64()),
            }
        )

    counts = (
        ds.map_batches(count_partial, batch_format="pyarrow")
        .groupby("gram")
        .aggregate(Sum("n", alias_name="n"))
    )

    def keep_hot(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.greater_equal(t["n"], min_count)).select(["gram"])

    hot_rows = counts.map_batches(keep_hot, batch_format="pyarrow").take_all()
    if len(hot_rows) > max_hot:
        raise ValueError(
            f"hot-span set of {len(hot_rows)} grams exceeds max_hot="
            f"{max_hot}; raise min_count for this corpus"
        )
    hot = np.sort(np.array([r["gram"] for r in hot_rows], dtype=np.int64))
    hot_ref = ray.put(hot)

    def score(t: pa.Table) -> pa.Table:
        hot_arr = ray.get(hot_ref)
        n_win, flat = _strict_windows(t[field], n)
        flat = flat.view(np.int64)
        if len(flat) and len(hot_arr):
            pos = np.searchsorted(hot_arr, flat)
            pos[pos == len(hot_arr)] = 0
            is_hot = hot_arr[pos] == flat
        else:
            is_hot = np.zeros(len(flat), dtype=bool)
        row_id = np.repeat(np.arange(len(n_win)), n_win)
        n_hot = np.bincount(row_id, weights=is_hot, minlength=len(n_win)).astype(
            np.int64
        )
        ratio = np.divide(
            n_hot, n_win, out=np.zeros(len(n_win)), where=n_win > 0
        )
        ids = t[id_field]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table(
            {
                id_field: ids,
                "n_windows": pa.array(n_win, pa.int64()),
                "n_hot": pa.array(n_hot, pa.int64()),
                "hot_ratio": pa.array(
                    round_sql_np(round_sql_np(ratio, 9), round_to), pa.float64()
                ),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")
