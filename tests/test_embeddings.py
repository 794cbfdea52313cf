"""Embedding prep (functions/embeddings.py): whitening semantics,
partition-invariant fits (the round-6 covariance pin), quantization
bounds, and the spec-DAG wrappers."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.functions.embeddings import (
    pca_fit,
    pca_whiten,
    quantize_embeddings,
)


def _emb_table(n=400, d=12, seed=5):
    rng = np.random.RandomState(seed)
    # anisotropic: a few dominant directions so PCA has signal
    basis = rng.randn(d, d)
    scales = np.linspace(3.0, 0.1, d)
    x = rng.randn(n, d) * scales @ basis
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(
                [row.astype(np.float32).tolist() for row in x],
                pa.list_(pa.float32()),
            ),
        }
    )


def _collect(ds):
    return pa.concat_tables(
        [b for b in ds.iter_batches(batch_format="pyarrow") if b.num_rows]
    )


def test_whitened_moments(ray_session):
    t = _emb_table()
    out = _collect(pca_whiten(rd.from_arrow(t).repartition(4), k=6))
    y = np.array(out["whitened"].to_pylist())
    assert y.shape == (400, 6)
    # whitened projection: ~zero mean, ~unit variance per axis
    assert np.abs(y.mean(axis=0)).max() < 0.05
    assert np.abs(y.var(axis=0, ddof=1) - 1.0).max() < 0.05


def test_fit_partition_invariant(ray_session):
    t = _emb_table(n=300, seed=9)
    m1, b1, v1 = pca_fit(rd.from_arrow(t).repartition(1), k=5)
    m8, b8, v8 = pca_fit(rd.from_arrow(t).repartition(8), k=5)
    # the round-6 covariance pin makes the eigh input byte-identical,
    # so basis and eigenvalues match exactly at any block partitioning
    assert b1.tolist() == b8.tolist()
    assert v1.tolist() == v8.tolist()
    assert np.allclose(m1, m8, atol=1e-12)


def test_quantize_bounds_and_constant_dim(ray_session):
    rng = np.random.RandomState(2)
    x = rng.randn(100, 4).astype(np.float32)
    x[:, 2] = 7.5  # constant dimension
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(100, dtype=np.int64)),
            "embedding": pa.array(
                [r.tolist() for r in x], pa.list_(pa.float32())
            ),
        }
    )
    out = _collect(
        quantize_embeddings(rd.from_arrow(t).repartition(3))
    ).sort_by("vec_id")
    q = np.array(out["qvec"].to_pylist())
    assert q.min() >= 0 and q.max() <= 255
    assert (q[:, 2] == 0).all()  # constant dim -> 0
    # per-dim extremes map to the ends of the range
    for j in (0, 1, 3):
        assert q[x[:, j].argmin(), j] == 0
        assert q[x[:, j].argmax(), j] == 255
    # reconstruction error bounded by half a quantization step
    for j in (0, 1, 3):
        lo, hi = float(x[:, j].min()), float(x[:, j].max())
        recon = lo + q[:, j] * (hi - lo) / 255.0
        assert np.abs(recon - x[:, j].astype(np.float64)).max() <= (
            (hi - lo) / 255.0
        ) * 0.5 + 1e-9


def test_spec_dag_wrappers(ray_session):
    from vector_ray.pipeline import run_pipeline

    rows = _emb_table(n=40, d=6).to_pylist()
    res = run_pipeline(
        {
            "sources": {"e": {"type": "inline", "rows": rows}},
            "transforms": {
                "w": {"type": "pca_whiten", "inputs": ["e"], "k": 3},
                "q": {"type": "quantize_embeddings", "inputs": ["e"]},
            },
            "sinks": {
                "ow": {"type": "collect", "inputs": ["w"]},
                "oq": {"type": "collect", "inputs": ["q"]},
            },
        }
    )
    w = res.sinks["ow"].table
    q = res.sinks["oq"].table
    assert w.num_rows == 40 and len(w["whitened"][0]) == 3
    assert q.num_rows == 40 and set(q.column_names) == {"vec_id", "qvec"}
