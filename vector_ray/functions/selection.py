"""Data selection under a token/weight budget: keep the best-scoring
rows (e.g. by quality score) until a global weight budget (e.g. total
token count) is filled — the "curate N tokens from M" step of
pretraining data pipelines.

Exact semantics (what the SQL oracle computes with a window function):
order rows by (score DESC, id ASC) and keep every row whose inclusive
running weight sum is <= budget.

Distributed shape — NO global sort:
  1. per-batch dense weight histogram over ``bins`` fixed score bins
     (one vector row per block, O(bins x blocks) bytes total);
  2. the driver walks the merged histogram from the top bin down to
     find the boundary bin where the cumulative weight first exceeds
     the budget — every higher bin is kept wholesale, every lower bin
     dropped wholesale;
  3. only the boundary bin's rows (guarded by ``max_boundary``) are
     collected, sorted exactly, and prefix-selected against the
     residual budget; their kept ids broadcast;
  4. one filter pass emits the selection.

Equal scores always land in the same bin (same float -> same bin), so
the exact (score DESC, id ASC) order never interleaves bins and the
boundary prefix reproduces the window-function answer bit-for-bit.
Weights must be strictly positive (a zero-weight row after the budget
is exhausted would be kept by SQL but dropped here — rejected up
front instead).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray


def budget_select(
    ds,
    budget: int,
    score_field: str,
    weight_field: str,
    id_field: str = "doc_id",
    bins: int = 4096,
    lo: float = 0.0,
    hi: float = 1.0,
    max_boundary: int = 2_000_000,
):
    """Rows of ``ds`` (all columns preserved) whose inclusive running
    ``weight_field`` sum, in (score DESC, id ASC) order, stays within
    ``budget``. Scores outside [lo, hi] clip into the edge bins (exact
    order within a bin is still resolved exactly)."""
    width = (hi - lo) / bins

    def _bin_idx(scores: np.ndarray) -> np.ndarray:
        idx = np.floor((scores - lo) / width).astype(np.int64)
        return np.clip(idx, 0, bins - 1)

    def _cols(t: pa.Table):
        s = t[score_field]
        w = t[weight_field]
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        if isinstance(w, pa.ChunkedArray):
            w = w.combine_chunks()
        sv = np.asarray(s, dtype=np.float64)
        wv = np.asarray(w, dtype=np.int64)
        if (wv <= 0).any():
            raise ValueError(
                f"budget_select requires strictly positive "
                f"{weight_field!r} (zero-weight rows make the prefix "
                f"rule ambiguous)"
            )
        return sv, wv

    def hist_partial(t: pa.Table) -> pa.Table:
        sv, wv = _cols(t)
        h = np.bincount(_bin_idx(sv), weights=wv, minlength=bins).astype(
            np.int64
        )
        return pa.table({"h": pa.array([h], pa.list_(pa.int64()))})

    rows = ds.map_batches(
        hist_partial, batch_format="pyarrow", batch_size=None
    ).take_all()
    hist = np.zeros(bins, dtype=np.int64)
    for r in rows:
        hist += np.asarray(r["h"], dtype=np.int64)

    # walk bins from the top score down: boundary = first bin whose
    # inclusive cumulative weight exceeds the budget
    desc = hist[::-1]
    cum = np.cumsum(desc)
    over = np.nonzero(cum > budget)[0]
    if len(over) == 0:  # budget covers everything
        return ds
    t_desc = int(over[0])
    t_bin = bins - 1 - t_desc  # bins > t_bin fully kept, < t_bin dropped
    rem = int(budget - (cum[t_desc - 1] if t_desc else 0))

    def boundary_rows(t: pa.Table) -> pa.Table:
        sv, wv = _cols(t)
        mask = _bin_idx(sv) == t_bin
        ids = t[id_field]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table(
            {
                "id": ids.filter(pa.array(mask)),
                "score": pa.array(sv[mask], pa.float64()),
                "w": pa.array(wv[mask], pa.int64()),
            }
        )

    bd = ds.map_batches(boundary_rows, batch_format="pyarrow").take_all()
    if len(bd) > max_boundary:
        raise ValueError(
            f"boundary bin holds {len(bd)} rows (> max_boundary="
            f"{max_boundary}); raise bins to narrow it"
        )
    bd.sort(key=lambda r: (-r["score"], r["id"]))
    kept_ids, acc = [], 0
    for r in bd:
        if acc + r["w"] > rem:
            break
        acc += r["w"]
        kept_ids.append(r["id"])
    kept_arr = pa.array(sorted(kept_ids))
    kept_ref = ray.put(kept_arr)

    def emit(t: pa.Table) -> pa.Table:
        sv, _ = _cols(t)
        idx = _bin_idx(sv)
        keep = idx > t_bin
        if len(kept_ids):
            ids = t[id_field]
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            in_boundary = pc.is_in(ids, value_set=ray.get(kept_ref))
            keep = keep | (
                (idx == t_bin)
                & np.asarray(in_boundary.to_numpy(zero_copy_only=False))
            )
        return t.filter(pa.array(keep))

    return ds.map_batches(emit, batch_format="pyarrow")
