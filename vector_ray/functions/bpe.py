"""Distributed BPE merge training over the tokenized corpus.

Classic byte-pair-encoding vocabulary induction (Sennrich et al. 2016),
re-expressed for Ray (round-5 resident-state plan): the corpus is read
once, its flat token stream held as per-group (values, offsets) state
refs in the object store; each merge round, every group applies only
the single newest accepted merge and emits per-pair count partials
pre-split by pair-hash bucket; B merge tasks compute exact per-bucket
global sums + top-1; the driver picks the global best of B. One corpus
read and one merge application per round total — the previous
stateless plan (fresh read + re-apply ALL k merges per round) paid
O(K) reads and O(K²) merge passes and measured 147 s at sf0.1 where
this measures a few seconds, with bit-identical accepted merges
(sequential single-merge application to resident state ≡ re-applying
the ordered list to a fresh read).

Scale notes (100 TB): the resident state pins the (sampled) training
corpus in the object store — spill-backed, the span_dedupe exchange
contract; pair-count partials are the only per-round traffic,
O(distinct pairs × 16 B) after in-group combining. A real run at
corpus scale would (a) train on a deterministic hash-sample of
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


def bpe_train(
    make_ds,
    num_merges: int = 12,
    new_id_base: int = BPE_NEW_ID_BASE,
    num_buckets: int = 16,
) -> pa.Table:
    """Learn ``num_merges`` BPE merges. ``make_ds`` is a zero-arg
    callable returning a Dataset over (doc_id, tokens); the corpus is
    read ONCE.

    Raw-task resident-state plan (round-5; the graph-rework shape):
    the flat token stream lives as per-group (values, offsets) state
    refs in the object store for the whole training run. Each round,
    every group applies only the SINGLE newest accepted merge to its
    resident state and emits per-pair count partials pre-split by
    pair-hash bucket; B merge tasks sum each bucket and return its
    top-1 (max count, tie to smallest pair key); the driver picks the
    global best among B candidates — exact global argmax, ~G+B tiny
    tasks per round. Sequential single-merge application to resident
    state is BY CONSTRUCTION identical to re-applying the whole merge
    list to a fresh read (``apply_merges`` iterates the list in
    order), so the accepted merges — and the frozen golden — are
    bit-identical to the previous
    read+reapply-everything-per-round plan, which cost O(K) corpus
    reads and O(K²) merge passes and measured 147 s at sf0.1 where
    this plan measures a few seconds.

    Returns the merge table: (merge_idx, a, b, new_id, count) — the
    induced vocabulary extension, in acceptance order."""
    import ray

    B = int(num_buckets)
    if B < 1:
        raise ValueError("bpe_train: num_buckets must be >= 1")

    @ray.remote(num_cpus=1)
    def init_group(*tbls):
        vs, offs = [], [np.zeros(1, np.int64)]
        base = 0
        for t in tbls:
            values, offsets = _flat_tokens(t)
            vs.append(values.astype(np.int64))
            offs.append(offsets[1:] + base)
            base += len(values)
        return (
            np.concatenate(vs) if vs else np.empty(0, np.int64),
            np.concatenate(offs),
        )

    @ray.remote(num_cpus=1, num_returns=B + 1)
    def count_round(state, merge):
        values, offsets = state
        if merge is not None:
            values, offsets = apply_merges(values, offsets, [merge])
        new_state = (values, offsets)
        if len(values) < 2:
            e = np.empty(0, np.int64)
            out = [new_state] + [(e, e)] * B
            return tuple(out)
        lens = np.diff(offsets)
        row_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        ok = row_of[:-1] == row_of[1:]
        keys = values[:-1][ok] * _PAIR_SHIFT + values[1:][ok]
        uniq, cnt = np.unique(keys, return_counts=True)
        cnt = cnt.astype(np.int64)
        bucket = uniq % B
        order = np.argsort(bucket, kind="stable")
        cuts = np.searchsorted(bucket[order], np.arange(B + 1))
        out = [new_state]
        for q in range(B):
            sl = slice(cuts[q], cuts[q + 1])
            out.append((uniq[order][sl], cnt[order][sl]))
        return tuple(out)

    @ray.remote(num_cpus=1)
    def best_of_bucket(*parts):
        # global per-pair sums for this hash range, then its top-1
        keys = np.concatenate([p[0] for p in parts])
        cnts = np.concatenate([p[1] for p in parts])
        if not len(keys):
            return None
        order = np.argsort(keys, kind="stable")
        keys, cnts = keys[order], cnts[order]
        starts = np.flatnonzero(
            np.concatenate(([True], keys[1:] != keys[:-1]))
        )
        uk = keys[starts]
        uc = np.add.reduceat(cnts, starts)
        best = np.lexsort((uk, -uc))[0]
        return (int(uc[best]), int(uk[best]))

    ds = make_ds().materialize()
    blocks = ds.to_arrow_refs()
    if not blocks:
        blocks = []
    num_groups = max(
        1,
        min(max(len(blocks), 1), int(ray.cluster_resources().get("CPU", 8))),
    )
    states = [
        init_group.remote(*blocks[g::num_groups]) for g in range(num_groups)
    ]

    merges: list[tuple[int, int, int]] = []
    rows = []
    pending: tuple[int, int, int] | None = None
    for k in range(num_merges):
        # num_returns = B+1 >= 2, so each call returns a list of refs
        outs = [count_round.remote(states[g], pending) for g in range(num_groups)]
        states = [o[0] for o in outs]
        cands = [
            c
            for c in ray.get(
                [
                    best_of_bucket.remote(
                        *[outs[g][1 + b] for g in range(num_groups)]
                    )
                    for b in range(B)
                ]
            )
            if c is not None
        ]
        if not cands:
            break
        count, pair = max(cands, key=lambda t: (t[0], -t[1]))
        a, b = pair // int(_PAIR_SHIFT), pair % int(_PAIR_SHIFT)
        new_id = new_id_base + k
        pending = (a, b, new_id)
        merges.append(pending)
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
