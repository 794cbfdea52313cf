"""Distributed BPE merge training over the tokenized corpus.

Classic byte-pair-encoding vocabulary induction (Sennrich et al. 2016),
re-expressed Ray-Data-first: each merge round is ONE streaming pass —
``map_batches`` per-batch pair-count partials (pre-aggregated with
``np.unique`` before anything is shuffled) → ``groupby(pair).sum`` →
per-block local top-1 → a driver reduce over ≤ #blocks candidate rows.
The corpus itself is never shuffled and never materialized; round k
re-applies the k accepted merges inside the batch function (stateless
tasks, merges broadcast via closure), trading O(K²) cheap vectorized
merge applications for zero intermediate materialization.

Scale notes (100 TB): pair-count partials are the only exchange —
O(distinct pairs × 16 B) per round after in-batch combining. A real
run at corpus scale would (a) train on a deterministic hash-sample of
documents (merge ranks converge long before full-corpus counts), and
(b) raise ``num_merges`` only with sampling in place; both knobs are
arguments here. Merge application is fully vectorized: adjacent-pair
matching on the flat values array with row-boundary masking, and
non-overlapping left-to-right resolution (only needed when a == b,
where runs alternate) via run-parity arithmetic — no Python loops.

No single reference transform; this is a tokens-axis corpus operator
(SURVEY §2 extension family), validated against an independent per-row
pure-Python BPE reference (tools/make_goldens.py golden + unit tests).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from vector_ray.functions.tokens import _flat_tokens, _rebuild_list

BPE_NEW_ID_BASE = 60_000  # merged-symbol ids, clear of vocab + sentinels
_PAIR_SHIFT = np.int64(1) << np.int64(31)  # key = a * 2^31 + b (a, b < 2^31)


def apply_merges(
    values: np.ndarray, offsets: np.ndarray, merges: list[tuple[int, int, int]]
) -> tuple[np.ndarray, np.ndarray]:
    """Apply accepted merges (a, b, new_id) in order to a flat token
    stream; returns the new (values, offsets). Vectorized: one boolean
    pass per merge, left-to-right non-overlap by run parity."""
    values = values.astype(np.int64)
    for a, b, new_id in merges:
        if len(values) < 2:
            continue
        lens = np.diff(offsets)
        row_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        m = (values[:-1] == a) & (values[1:] == b)
        m &= row_of[:-1] == row_of[1:]  # pairs never cross rows
        idx = np.flatnonzero(m)
        if len(idx) and a == b:
            # overlapping matches only arise for aa: keep alternate
            # matches per consecutive run (left-to-right semantics)
            run_start = np.ones(len(idx), dtype=bool)
            run_start[1:] = np.diff(idx) > 1
            run_id = np.cumsum(run_start) - 1
            first_of_run = idx[np.flatnonzero(run_start)]
            ordinal = idx - first_of_run[run_id]
            idx = idx[ordinal % 2 == 0]
        if not len(idx):
            continue
        values = values.copy()
        values[idx] = new_id
        drop = np.zeros(len(values), dtype=bool)
        drop[idx + 1] = True
        # per-row removed counts -> new offsets
        removed = np.bincount(row_of[idx + 1], minlength=len(lens))
        offsets = offsets - np.concatenate([[0], np.cumsum(removed)])
        values = values[~drop]
    return values, offsets


def _pair_partials(t: pa.Table, merges: list[tuple[int, int, int]]) -> pa.Table:
    values, offsets = _flat_tokens(t)
    values, offsets = apply_merges(values, offsets, merges)
    if len(values) < 2:
        return pa.table(
            {"pair": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
        )
    lens = np.diff(offsets)
    row_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    ok = row_of[:-1] == row_of[1:]
    keys = values[:-1][ok] * _PAIR_SHIFT + values[1:][ok]
    uniq, cnt = np.unique(keys, return_counts=True)
    return pa.table(
        {"pair": pa.array(uniq, pa.int64()), "c": pa.array(cnt, pa.int64())}
    )


def _local_top1(t: pa.Table) -> pa.Table:
    """Block-local best pair: max count, ties to the smallest pair key
    (deterministic across any block assignment)."""
    if t.num_rows == 0:
        return t
    c = t["sum(c)"].to_numpy(zero_copy_only=False)
    p = t["pair"].to_numpy(zero_copy_only=False)
    best = np.lexsort((p, -c))[0]
    return pa.table(
        {
            "pair": pa.array([p[best]], pa.int64()),
            "sum(c)": pa.array([c[best]], pa.int64()),
        }
    )


def bpe_train(
    make_ds,
    num_merges: int = 12,
    new_id_base: int = BPE_NEW_ID_BASE,
) -> pa.Table:
    """Learn ``num_merges`` BPE merges. ``make_ds`` is a zero-arg
    callable returning a fresh Dataset over (doc_id, tokens) — each
    round streams the corpus once (Datasets are consumed per round).

    Returns the merge table: (merge_idx, a, b, new_id, count) — the
    induced vocabulary extension, in acceptance order."""
    merges: list[tuple[int, int, int]] = []
    rows = []
    for k in range(num_merges):
        frozen = list(merges)
        counts = (
            make_ds()
            .map_batches(
                lambda t, _m=frozen: _pair_partials(t, _m),
                batch_format="pyarrow",
            )
            .groupby("pair")
            .sum("c")
            .map_batches(_local_top1, batch_format="pyarrow")
        )
        cand = counts.take_all()  # ≤ one candidate row per block
        if not cand:
            break
        best = min(cand, key=lambda r: (-r["sum(c)"], r["pair"]))
        pair, count = int(best["pair"]), int(best["sum(c)"])
        a, b = pair // int(_PAIR_SHIFT), pair % int(_PAIR_SHIFT)
        new_id = new_id_base + k
        merges.append((a, b, new_id))
        rows.append(
            {
                "merge_idx": k,
                "a": a,
                "b": b,
                "new_id": new_id,
                "count": count,
            }
        )
    return pa.table(
        {
            "merge_idx": pa.array([r["merge_idx"] for r in rows], pa.int32()),
            "a": pa.array([r["a"] for r in rows], pa.int64()),
            "b": pa.array([r["b"] for r in rows], pa.int64()),
            "new_id": pa.array([r["new_id"] for r in rows], pa.int64()),
            "count": pa.array([r["count"] for r in rows], pa.int64()),
        }
    )


def bpe_encode(ds, merges_table: pa.Table):
    """Apply a learned merge table to a corpus: the deployment half of
    BPE training. One vectorized pass per batch (merges broadcast by
    closure capture — a small, immutable table)."""
    merges = list(
        zip(
            merges_table["a"].to_pylist(),
            merges_table["b"].to_pylist(),
            merges_table["new_id"].to_pylist(),
        )
    )

    def encode(t: pa.Table) -> pa.Table:
        values, offsets = _flat_tokens(t)
        values, offsets = apply_merges(values, offsets, merges)
        out = t.set_column(
            t.column_names.index("tokens"),
            "tokens",
            _rebuild_list(values, offsets),
        )
        if "n_tok" in out.column_names:
            out = out.set_column(
                out.column_names.index("n_tok"),
                "n_tok",
                pa.array(np.diff(offsets).astype(np.int32), pa.int32()),
            )
        return out

    return ds.map_batches(encode, batch_format="pyarrow")
