"""Distributed linear quality classifier (fastText-classifier shape).

Web-corpus curation trains a small classifier on a labeled seed set
(e.g. "looks like Wikipedia/books") and scores the whole corpus with
it (GPT-3's WebText-vs-CommonCrawl logistic filter; CCNet's fastText
step). This module is that shape with a deterministic, SQL-checkable
core: full-batch logistic regression by gradient descent over per-doc
token statistics.

Plan (the treeAggregate split again — corpus streams, model is tiny):

* one featurize pass builds the O(docs)-row feature table (5 float64
  columns) and materializes it — tiny next to the token payloads, so
  the T gradient passes and the scoring pass stream over it without
  re-reading (and re-tokenizing) the corpus;
* each GD iteration is ONE map_batches pass emitting a 6-float partial
  (gradient components + count) per block, summed on the driver;
* scoring is one more vectorized pass with the broadcast weights.

Determinism contract (what the SQL oracle reproduces):

* features per doc: x0 = 1 (bias), x1 = n_tok/100, x2 = distinct-token
  ratio, x3 = max-single-token-count ratio; label y from a source
  whitelist; empty docs are excluded (n_tok > 0) in both sides;
* w_0 = 0; w_{t+1} = ROUND(w_t - lr * mean((sigmoid(x.w) - y) * x), 9)
  — the per-iteration round-to-9 pins the weights to a common grid so
  distributed-vs-SQL summation-order ulps cannot compound across
  iterations;
* output probability double-rounded ROUND(ROUND(p, 9), 6).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from vector_ray.schema import round_sql_np

N_FEATURES = 4  # bias, scaled length, distinct ratio, max-count ratio


def _collect(ds) -> pa.Table:
    tables = ray.get(ds.materialize().to_arrow_refs())
    nonempty = [t for t in tables if t.num_rows > 0] or tables[:1]
    return (
        pa.concat_tables(nonempty, promote_options="default")
        if nonempty
        else pa.table({})
    )


def featurize(ds, positive_sources: tuple[str, ...]) -> "ray.data.Dataset":
    """Per-doc feature/label table from the tokenized corpus; one
    np.unique over (row, token) keys per batch (repetition_stats'
    vectorization), no shuffle. Empty docs are dropped."""
    pos = frozenset(positive_sources)

    def feats(t: pa.Table) -> pa.Table:
        arr = t["tokens"].combine_chunks()
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.chunk(0) if arr.num_chunks else pa.array([], pa.list_(pa.int32()))
        values = arr.values.to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        n = t.num_rows
        row_of = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
        if len(values) and values.min() < 0:
            raise ValueError("featurize requires non-negative token ids")
        stride = int(values.max()) + 1 if len(values) else 1
        uniq, counts = np.unique(row_of * stride + values, return_counts=True)
        urow = uniq // stride
        n_types = np.bincount(urow, minlength=n).astype(np.float64)
        max_cnt = np.zeros(n, dtype=np.float64)
        np.maximum.at(max_cnt, urow, counts)
        n_tok = (offsets[1:] - offsets[:-1]).astype(np.float64)
        keep = n_tok > 0
        nt = n_tok[keep]
        src = t["source"].to_pylist()
        y = np.array(
            [1.0 if s in pos else 0.0 for s in src], dtype=np.float64
        )[keep]
        return pa.table(
            {
                "doc_id": t["doc_id"].filter(pa.array(keep)),
                "x1": pa.array(nt / 100.0),
                "x2": pa.array(n_types[keep] / nt),
                "x3": pa.array(max_cnt[keep] / nt),
                "y": pa.array(y),
            }
        )

    return ds.map_batches(feats, batch_format="pyarrow")


def _xmat(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    n = t.num_rows
    x = np.empty((n, N_FEATURES), dtype=np.float64)
    x[:, 0] = 1.0
    for j, c in enumerate(("x1", "x2", "x3"), start=1):
        col = t[c]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        x[:, j] = np.asarray(col, dtype=np.float64)
    yc = t["y"]
    if isinstance(yc, pa.ChunkedArray):
        yc = yc.combine_chunks()
    return x, np.asarray(yc, dtype=np.float64)


def logreg_train(feats_ds, iters: int = 3, lr: float = 0.5) -> np.ndarray:
    """Full-batch GD on logistic loss over the materialized feature
    table; each iteration streams one pass of 6-float block partials."""
    w = np.zeros(N_FEATURES, dtype=np.float64)
    for _ in range(iters):
        w_ref = ray.put(w)

        def grad_part(t: pa.Table, wref=w_ref) -> pa.Table:
            wv = ray.get(wref)
            x, y = _xmat(t)
            p = 1.0 / (1.0 + np.exp(-(x @ wv)))
            g = (p - y) @ x  # (N_FEATURES,)
            return pa.table(
                {
                    "g": pa.array([g.tolist()], pa.list_(pa.float64())),
                    "n": pa.array([t.num_rows], pa.int64()),
                }
            )

        parts = _collect(
            feats_ds.map_batches(grad_part, batch_format="pyarrow")
        )
        gsum = np.zeros(N_FEATURES, dtype=np.float64)
        for row in parts["g"].to_pylist():
            gsum += np.asarray(row, dtype=np.float64)
        n_total = float(sum(parts["n"].to_pylist()))
        w = round_sql_np(w - lr * gsum / n_total, 9)
    return w


def logreg_score(feats_ds, w: np.ndarray, round_to: int = 6):
    """One vectorized pass: per-doc probability under the trained
    weights (broadcast once)."""
    w_ref = ray.put(np.asarray(w, dtype=np.float64))

    def score(t: pa.Table, wref=w_ref) -> pa.Table:
        wv = ray.get(wref)
        x, y = _xmat(t)
        p = 1.0 / (1.0 + np.exp(-(x @ wv)))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "prob": pa.array(
                    round_sql_np(round_sql_np(p, 9), round_to)
                ),
                "label": pa.array(y.astype(np.int64)),
            }
        )

    return feats_ds.map_batches(score, batch_format="pyarrow")


def quality_classifier(
    ds,
    positive_sources: tuple[str, ...] = ("wiki", "books", "academic"),
    iters: int = 3,
    lr: float = 0.5,
    round_to: int = 6,
):
    """Train-and-score in one call: featurize (one corpus pass,
    materialized — O(docs) floats, tiny next to token payloads), T
    gradient passes over the features, one scoring pass. Returns a
    Dataset of (doc_id, prob, label)."""
    feats = featurize(ds, positive_sources).materialize()
    w = logreg_train(feats, iters=iters, lr=lr)
    return logreg_score(feats, w, round_to=round_to)
