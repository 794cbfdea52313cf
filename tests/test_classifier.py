"""Distributed logistic-regression quality classifier
(functions/classifier.py): straight-line reference parity, partition
invariance of the trained weights, separable-data sanity, and the
spec-DAG wrapper."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.functions.classifier import (
    featurize,
    logreg_train,
    quality_classifier,
)


def _corpus(n=60, seed=3):
    rng = np.random.RandomState(seed)
    rows = {"doc_id": [], "tokens": [], "source": []}
    for i in range(n):
        good = i % 3 == 0
        # good docs: long and diverse; bad docs: short and repetitive
        if good:
            toks = rng.randint(0, 500, size=rng.randint(150, 250)).tolist()
        else:
            toks = (rng.randint(0, 5, size=rng.randint(10, 40))).tolist()
        rows["doc_id"].append(f"doc-{i:04d}")
        rows["tokens"].append(toks)
        rows["source"].append("wiki" if good else "web")
    return pa.table(
        {
            "doc_id": pa.array(rows["doc_id"]),
            "tokens": pa.array(rows["tokens"], pa.list_(pa.int32())),
            "source": pa.array(rows["source"]),
        }
    )


def _reference_weights(t: pa.Table, iters=3, lr=0.5):
    """Independent per-row Python loop implementing the documented
    recurrence (round-9 per iteration)."""
    xs, ys = [], []
    for i in range(t.num_rows):
        toks = t["tokens"][i].as_py()
        if not toks:
            continue
        nt = float(len(toks))
        vals, cnts = np.unique(toks, return_counts=True)
        xs.append([1.0, nt / 100.0, len(vals) / nt, cnts.max() / nt])
        ys.append(1.0 if t["source"][i].as_py() == "wiki" else 0.0)
    x = np.array(xs)
    y = np.array(ys)
    w = np.zeros(4)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(x @ w)))
        g = (p - y) @ x / len(y)
        w = w - lr * g
        w = np.sign(w) * np.floor(np.abs(w) * 1e9 + 0.5) / 1e9
    return w


def test_weights_match_reference(ray_session):
    t = _corpus()
    feats = featurize(rd.from_arrow(t).repartition(4), ("wiki",)).materialize()
    w = logreg_train(feats, iters=3, lr=0.5)
    want = _reference_weights(t)
    assert np.allclose(w, want, atol=2e-9), (w, want)


def test_weights_partition_invariant(ray_session):
    t = _corpus(n=90, seed=11)
    w1 = logreg_train(
        featurize(rd.from_arrow(t).repartition(1), ("wiki",)).materialize()
    )
    w8 = logreg_train(
        featurize(rd.from_arrow(t).repartition(8), ("wiki",)).materialize()
    )
    # the per-iteration round-9 pin makes the weights bit-identical
    # regardless of block partitioning
    assert w1.tolist() == w8.tolist()


def test_classifier_separates(ray_session):
    t = _corpus(n=120, seed=5)
    out = pa.concat_tables(
        [
            b
            for b in quality_classifier(
                rd.from_arrow(t).repartition(4),
                positive_sources=("wiki",),
                iters=20,
                lr=1.0,
            ).iter_batches(batch_format="pyarrow")
            if b.num_rows
        ]
    )
    probs = np.array(out["prob"].to_pylist())
    labels = np.array(out["label"].to_pylist())
    # mean score of the positive class clearly above the negative class
    assert probs[labels == 1].mean() > probs[labels == 0].mean() + 0.2
    # thresholding at 0.5 classifies this separable fixture well
    acc = ((probs > 0.5) == (labels == 1)).mean()
    assert acc > 0.9


def test_empty_docs_excluded(ray_session):
    t = pa.table(
        {
            "doc_id": pa.array(["a", "b"]),
            "tokens": pa.array([[1, 2, 3], []], pa.list_(pa.int32())),
            "source": pa.array(["wiki", "web"]),
        }
    )
    feats = featurize(rd.from_arrow(t), ("wiki",)).materialize()
    got = pa.concat_tables(
        [b for b in feats.iter_batches(batch_format="pyarrow") if b.num_rows]
    )
    assert got["doc_id"].to_pylist() == ["a"]


def test_spec_dag_transform(ray_session):
    from vector_ray.pipeline import run_pipeline

    t = _corpus(n=30)
    out = run_pipeline(
        {
            "sources": {"in": {"type": "inline", "rows": t.to_pylist()}},
            "transforms": {
                "q": {
                    "type": "logreg_quality",
                    "inputs": ["in"],
                    "positive_sources": ["wiki"],
                    "iters": 2,
                }
            },
            "sinks": {"out": {"type": "collect", "inputs": ["q"]}},
        }
    ).sinks["out"].table
    assert set(out.column_names) == {"doc_id", "prob", "label"}
    assert out.num_rows == 30
