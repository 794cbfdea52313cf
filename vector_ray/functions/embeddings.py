"""Embedding-prep operators: distributed PCA whitening and global
int8 quantization.

Both are curation-pipeline staples — SemDeDup-style pipelines whiten
embeddings before cosine pruning, and ANN serving quantizes them to
shrink the index. Both follow the treeAggregate split (the corpus
streams, the model is tiny):

* ``embedding_moments``: one pass of per-block partials (count, sum
  vector, X^T X matrix — d + d^2 floats per block), summed on the
  driver; nothing O(corpus) ever leaves the cluster.
* ``pca_whiten``: moments → covariance ROUNDED TO 6 DECIMALS (the
  determinism pin: the independent golden recomputes the covariance
  straight-line, and the round snaps both to identical bytes so the
  shared eigendecomposition sees the same input — 6 not 9 because
  the pre-round ulp noise must clear the grid edge across all d^2
  entries) → top-k eigenvectors
  (descending eigenvalue; each eigenvector's largest-|component|
  entry is made positive — the sign convention that kills LAPACK's
  sign ambiguity) → broadcast (mean, basis, 1/sqrt(eigval)) → one
  vectorized projection pass.
* ``quantize_embeddings``: per-dimension global min/max partials →
  broadcast → q = clip(round((x - mn) * 255 / (mx - mn)), 0, 255) as
  int64 (constant dims → 0), double-rounded (9 then 0) so the SQL
  oracle's summation-free expression matches bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from vector_ray.schema import round_sql_np


def _collect(ds) -> pa.Table:
    tables = ray.get(ds.materialize().to_arrow_refs())
    nonempty = [t for t in tables if t.num_rows > 0] or tables[:1]
    return (
        pa.concat_tables(nonempty, promote_options="default")
        if nonempty
        else pa.table({})
    )


def _matrix(t: pa.Table, field: str) -> np.ndarray:
    col = t[field]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = np.asarray(col.flatten(), dtype=np.float64)
    n = len(col)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def embedding_moments(ds, field: str = "embedding"):
    """One streaming pass -> (n, sum[d], xtx[d, d]) on the driver."""

    def part(t: pa.Table) -> pa.Table:
        x = _matrix(t, field)
        if not x.size:
            return pa.table(
                {
                    "n": pa.array([], pa.int64()),
                    "s": pa.array([], pa.list_(pa.float64())),
                    "xtx": pa.array([], pa.list_(pa.float64())),
                }
            )
        return pa.table(
            {
                "n": pa.array([x.shape[0]], pa.int64()),
                "s": pa.array([x.sum(axis=0).tolist()], pa.list_(pa.float64())),
                "xtx": pa.array(
                    [(x.T @ x).ravel().tolist()], pa.list_(pa.float64())
                ),
            }
        )

    parts = _collect(ds.map_batches(part, batch_format="pyarrow"))
    n = int(sum(parts["n"].to_pylist()))
    if n == 0:
        raise ValueError("embedding_moments: empty dataset")
    s = np.zeros(0)
    xtx = np.zeros(0)
    for sv, xv in zip(parts["s"].to_pylist(), parts["xtx"].to_pylist()):
        a, b = np.asarray(sv, np.float64), np.asarray(xv, np.float64)
        s = a if not s.size else s + a
        xtx = b if not xtx.size else xtx + b
    d = len(s)
    return n, s, xtx.reshape(d, d)


def pca_fit(ds, k: int = 8, field: str = "embedding"):
    """Covariance (round-6 pinned) -> top-k eigenpairs with the
    positive-max-component sign convention. Returns (mean, basis[d, k],
    eigvals[k])."""
    n, s, xtx = embedding_moments(ds, field)
    if n < 2:
        raise ValueError("pca_fit needs at least 2 rows")
    mean = s / n
    cov = (xtx - n * np.outer(mean, mean)) / (n - 1)
    cov = round_sql_np(cov, 6)  # determinism pin (see module docstring)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    vals = vals[order]
    vecs = vecs[:, order]
    for j in range(vecs.shape[1]):
        i = int(np.argmax(np.abs(vecs[:, j])))
        if vecs[i, j] < 0:
            vecs[:, j] = -vecs[:, j]
    return mean, vecs, vals


def pca_whiten(
    ds,
    k: int = 8,
    field: str = "embedding",
    id_field: str = "vec_id",
    eps: float = 1e-9,
    round_to: int = 6,
):
    """Project every embedding onto the top-k principal axes and scale
    each axis to unit variance: y = ((x - mean) @ basis) / sqrt(val +
    eps). One moments pass + one vectorized projection pass."""
    mean, basis, vals = pca_fit(ds, k=k, field=field)
    scale = 1.0 / np.sqrt(np.maximum(vals, 0) + eps)
    model_ref = ray.put((mean, basis, scale))

    def project(t: pa.Table, mref=model_ref) -> pa.Table:
        mu, w, sc = ray.get(mref)
        x = _matrix(t, field)
        y = ((x - mu) @ w) * sc if x.size else x.reshape(0, 0)
        y = round_sql_np(round_sql_np(y, 9), round_to)
        return pa.table(
            {
                id_field: t[id_field],
                "whitened": pa.array(
                    [row.tolist() for row in y], pa.list_(pa.float64())
                ),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


def quantize_embeddings(
    ds,
    field: str = "embedding",
    id_field: str = "vec_id",
    levels: int = 256,
):
    """Global per-dimension linear quantization to [0, levels-1]:
    one min/max partials pass (two d-vectors per block) + one
    vectorized quantize pass. Constant dimensions map to 0."""

    def mm_part(t: pa.Table) -> pa.Table:
        x = _matrix(t, field)
        if not x.size:
            return pa.table(
                {
                    "mn": pa.array([], pa.list_(pa.float64())),
                    "mx": pa.array([], pa.list_(pa.float64())),
                }
            )
        return pa.table(
            {
                "mn": pa.array([x.min(axis=0).tolist()], pa.list_(pa.float64())),
                "mx": pa.array([x.max(axis=0).tolist()], pa.list_(pa.float64())),
            }
        )

    parts = _collect(ds.map_batches(mm_part, batch_format="pyarrow"))
    if parts.num_rows == 0:
        raise ValueError("quantize_embeddings: empty dataset")
    mn = np.min(np.asarray(parts["mn"].to_pylist(), np.float64), axis=0)
    mx = np.max(np.asarray(parts["mx"].to_pylist(), np.float64), axis=0)
    top = float(levels - 1)
    mm_ref = ray.put((mn, mx))

    def quantize(t: pa.Table, mref=mm_ref) -> pa.Table:
        lo, hi = ray.get(mref)
        x = _matrix(t, field)
        span = hi - lo
        safe = np.where(span > 0, span, 1.0)
        q = round_sql_np((x - lo) * top / safe, 9)
        q = np.sign(q) * np.floor(np.abs(q) + 0.5)  # ROUND(..., 0)
        q = np.clip(q, 0, top)
        q = np.where(span > 0, q, 0.0).astype(np.int64)
        return pa.table(
            {
                id_field: t[id_field],
                "qvec": pa.array(
                    [row.tolist() for row in q], pa.list_(pa.int64())
                ),
            }
        )

    return ds.map_batches(quantize, batch_format="pyarrow")
