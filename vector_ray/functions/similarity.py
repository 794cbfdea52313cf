"""Similarity search over an embedding column (list<float>).

* ``brute_force_topk`` — the exact baseline: broadcast query matrix,
  one numpy matmul per batch, per-batch local top-k, tiny global sort.
* ``lsh_topk`` — the scale path: random-hyperplane LSH buckets; only
  buckets within a hamming radius of the query's bucket are scanned.
  Deterministic (seeded hyperplanes).

Both stream: nothing materializes the full embedding corpus on the
driver; per-batch candidates are k rows each, and the final top-k is a
sort over ~k × num_batches rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from vector_ray.schema import round_sql_np


def _normalize(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)


def _embedding_matrix(batch: pa.Table, field: str) -> np.ndarray:
    col = batch[field]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = np.asarray(col.values, dtype=np.float64)
    dim = len(col[0]) if len(col) else 0
    return flat.reshape(len(col), dim) if dim else flat.reshape(0, 0)


def _topk_indices(sims: np.ndarray, ids, k: int) -> np.ndarray:
    """Indices of the k best scores, ties broken by ascending id —
    identical ordering to the final `sort(score desc, id asc)`
    (null ids sort last, matching ray's nulls-last default)."""
    if len(sims) <= k:
        return np.arange(len(sims))
    id_list = ids.to_pylist()
    if any(v is None for v in id_list):
        order = np.array(
            sorted(
                range(len(sims)),
                key=lambda i: (-sims[i], id_list[i] is None, id_list[i] or 0),
            )
        )
        return order[:k]
    id_vals = np.asarray(id_list)
    order = np.argsort(id_vals, kind="stable")          # secondary: id asc
    order = order[np.argsort(-sims[order], kind="stable")]  # primary: score desc
    return order[:k]


def brute_force_topk(
    ds,
    query: np.ndarray,
    k: int = 10,
    id_field: str = "vec_id",
    field: str = "embedding",
    round_to: int = 6,
):
    """Exact cosine top-k: Dataset[(id, score)] of the k best matches.
    Ties broken by ascending id (deterministic)."""
    q = np.asarray(query, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    q_ref = ray.put(q)

    # task pool, not an actor pool: the only per-worker state is the tiny
    # broadcast query vector, and ray.get of a local object is near-free —
    # while actor-pool spin-up costs seconds per run (measured 2.7-4.4s
    # actor vs 0.9-1.0s task for the identical scan at sf0.1/32cpu)
    def score(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        mat = _embedding_matrix(batch, field)
        if mat.shape[0] == 0:
            return pa.table(
                {id_field: batch[id_field], "score": pa.array([], pa.float64())}
            )
        sims = _normalize(mat) @ qv
        sims = round_sql_np(sims, round_to)
        # local top-k prune with the SAME tie-break as the global
        # sort (score desc, id asc): a bare argpartition could drop
        # the smaller-id row of a tie at the local k boundary
        part = _topk_indices(sims, batch[id_field], k)
        ids = batch[id_field].take(pa.array(part))
        return pa.table(
            {id_field: ids, "score": pa.array(sims[part], pa.float64())}
        )

    scored = ds.map_batches(score, batch_format="pyarrow")
    top = scored.sort(["score", id_field], descending=[True, False]).limit(k)
    return top


def train_ivf_centroids(
    ds,
    field: str = "embedding",
    n_centroids: int = 16,
    sample_size: int = 2048,
    iters: int = 8,
    seed: int = 7,
) -> np.ndarray:
    """Train IVF centroids with Lloyd k-means on a BOUNDED sample
    (``ds.limit(sample_size)`` — the only driver materialization, capped
    by construction; at corpus scale you train on a sample regardless).
    Deterministic: seeded init from evenly spaced sample rows. Returns
    L2-normalized centroids (spherical k-means, cosine geometry)."""
    sample = ds.limit(sample_size).take_all()
    mat = _normalize(np.array([r[field] for r in sample], dtype=np.float64))
    n = mat.shape[0]
    k = min(n_centroids, n)
    idx = np.linspace(0, n - 1, k).astype(int)
    cent = mat[idx].copy()
    for _ in range(iters):
        assign = np.argmax(mat @ cent.T, axis=1)
        for c in range(k):
            members = mat[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    # stable order so bucket ids are deterministic across runs
    order = np.lexsort(cent.T[::-1])
    return cent[order]


def ivf_topk(
    ds,
    query: np.ndarray,
    k: int = 10,
    id_field: str = "vec_id",
    field: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
    sample_size: int = 2048,
    seed: int = 7,
    round_to: int = 6,
):
    """IVF approximate cosine top-k: coarse-quantize rows to their
    nearest centroid and scan only rows whose centroid is among the
    ``n_probe`` centroids closest to the query. ``n_probe >=
    n_centroids`` degenerates to the exact brute-force scan (the oracle
    configuration). At corpus scale the centroid id is a precomputed
    partition column and non-probed partitions never leave storage —
    same pushdown note as lsh_topk."""
    q = np.asarray(query, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    cent = train_ivf_centroids(
        ds, field=field, n_centroids=n_centroids, sample_size=sample_size, seed=seed
    )
    probes = np.argsort(-(cent @ q))[: max(1, n_probe)]
    ctx = ray.put((q, cent, np.sort(probes)))

    # task pool; see brute_force_topk for the actor-vs-task measurement
    def score(batch: pa.Table) -> pa.Table:
        qv, centv, probev = ray.get(ctx)
        mat = _embedding_matrix(batch, field)
        if mat.shape[0] == 0:
            return pa.table(
                {id_field: batch[id_field], "score": pa.array([], pa.float64())}
            )
        norm = _normalize(mat)
        assign = np.argmax(norm @ centv.T, axis=1)
        idx = np.nonzero(np.isin(assign, probev))[0]
        if len(idx) == 0:
            return pa.table(
                {
                    id_field: pa.array([], batch.schema.field(id_field).type),
                    "score": pa.array([], pa.float64()),
                }
            )
        sims = round_sql_np(norm[idx] @ qv, round_to)
        part = _topk_indices(sims, batch[id_field].take(pa.array(idx)), k)
        ids = batch[id_field].take(pa.array(idx[part]))
        return pa.table(
            {id_field: ids, "score": pa.array(sims[part], pa.float64())}
        )

    scored = ds.map_batches(score, batch_format="pyarrow")
    return scored.sort(["score", id_field], descending=[True, False]).limit(k)


def lsh_bucket_ids(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (mat @ planes.T) > 0
    return (bits.astype(np.uint64) << np.arange(bits.shape[1], dtype=np.uint64)).sum(
        axis=1
    )


def lsh_topk(
    ds,
    query: np.ndarray,
    k: int = 10,
    id_field: str = "vec_id",
    field: str = "embedding",
    n_planes: int = 8,
    hamming_radius: int = 1,
    seed: int = 11,
    round_to: int = 6,
):
    """Approximate cosine top-k: scan only rows whose random-hyperplane
    bucket is within ``hamming_radius`` of the query's bucket. At scale
    the bucket id is a precomputed partition column and non-matching
    row groups never leave storage."""
    q = np.asarray(query, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    dim = q.shape[0]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    q_bucket = int(lsh_bucket_ids(q[None, :], planes)[0])
    # buckets within hamming radius
    allowed = {q_bucket}
    frontier = {q_bucket}
    for _ in range(hamming_radius):
        nxt = set()
        for b in frontier:
            for i in range(n_planes):
                nxt.add(b ^ (1 << i))
        allowed |= nxt
        frontier = nxt
    ctx = ray.put((q, planes, np.array(sorted(allowed), dtype=np.uint64)))

    # task pool; see brute_force_topk for the actor-vs-task measurement
    def score(batch: pa.Table) -> pa.Table:
        qv, planev, allowedv = ray.get(ctx)
        mat = _embedding_matrix(batch, field)
        if mat.shape[0] == 0:
            return pa.table(
                {id_field: batch[id_field], "score": pa.array([], pa.float64())}
            )
        norm = _normalize(mat)
        buckets = lsh_bucket_ids(norm, planev)
        mask = np.isin(buckets, allowedv)
        idx = np.nonzero(mask)[0]
        if len(idx) == 0:
            return pa.table(
                {
                    id_field: pa.array([], batch.schema.field(id_field).type),
                    "score": pa.array([], pa.float64()),
                }
            )
        sims = round_sql_np(norm[idx] @ qv, round_to)
        part = _topk_indices(sims, batch[id_field].take(pa.array(idx)), k)
        ids = batch[id_field].take(pa.array(idx[part]))
        return pa.table(
            {id_field: ids, "score": pa.array(sims[part], pa.float64())}
        )

    scored = ds.map_batches(score, batch_format="pyarrow")
    return scored.sort(["score", id_field], descending=[True, False]).limit(k)


def rrf_fuse(
    ranked: list,
    k: int = 10,
    k0: int = 60,
    id_field: str = "doc_id",
    ndigits: int = 6,
):
    """Reciprocal rank fusion (Cormack, Clarke & Buettcher 2009) of N
    ranked retrieval lists: rrf(d) = sum over lists of 1/(k0 + rank_d).
    The standard hybrid-retrieval combiner (BM25 + embedding ANN).

    ``ranked``: list of (Dataset | pa.Table) each with (id, score)
    columns; each list is re-ranked by (score desc, id asc) so ties
    break identically to the SQL oracle. Inputs are top-k RESULT sets
    (k rows each) — fusing them is a driver-side numpy pass over
    N*k rows by design; the expensive retrieval stays distributed in
    the upstream operators. Output columns: (id, rank_1..rank_N
    per-list ranks, null when absent, and rrf), top-k by (rrf desc,
    id asc)."""
    import pandas as pd

    from vector_ray.schema import round_sql_np

    frames = []
    for li, r in enumerate(ranked):
        if hasattr(r, "to_pandas"):
            df = r.to_pandas()
        else:
            df = pd.DataFrame(r)
        idc = [c for c in df.columns if c != "score"][0]
        df = df.sort_values(
            ["score", idc], ascending=[False, True]
        ).reset_index(drop=True)
        out = pd.DataFrame(
            {id_field: df[idc].astype("int64"), f"rank_{li + 1}": np.arange(1, len(df) + 1)}
        )
        frames.append(out.set_index(id_field))
    merged = pd.concat(frames, axis=1, join="outer")
    contrib = np.zeros(len(merged))
    for li in range(len(ranked)):
        rk = merged[f"rank_{li + 1}"].to_numpy(dtype=np.float64)
        contrib = contrib + np.where(np.isnan(rk), 0.0, 1.0 / (k0 + rk))
    merged["rrf"] = round_sql_np(round_sql_np(contrib, 9), ndigits)
    merged = merged.reset_index().sort_values(
        ["rrf", id_field], ascending=[False, True]
    )
    out = merged.head(k).reset_index(drop=True)
    cols = {id_field: pa.array(out[id_field].astype("int64"))}
    for li in range(len(ranked)):
        rk = out[f"rank_{li + 1}"].to_numpy(dtype=np.float64)
        cols[f"rank_{li + 1}"] = pa.array(
            [None if np.isnan(v) else int(v) for v in rk], pa.int64()
        )
    cols["rrf"] = pa.array(out["rrf"].to_numpy(), pa.float64())
    return pa.table(cols)


# ---------------------------------------------------------------------------
# product quantization (PQ) — the memory-side ANN scale path
# ---------------------------------------------------------------------------
#
# Completes the ANN family (brute-force = exact baseline, LSH / IVF =
# scan-pruning paths): PQ shrinks the *per-vector memory* so a 100 TB
# embedding corpus's codes fit in RAM (m bytes/vector instead of 4·d).
# Public definition: Jégou, Douze, Schmid, "Product Quantization for
# Nearest Neighbor Search", IEEE TPAMI 2011.
#
# Everything here is EXACT INTEGER arithmetic so results are
# reproducible bit-for-bit by an independent straight-line
# reimplementation (the frozen-golden oracle): vectors are first
# scalar-quantized to the 0..255 grid with the same double-rounded
# expression as ``embeddings.quantize_embeddings``, then codebooks are
# trained by integer Lloyd k-means (centroid update = round-half-up
# integer mean, ties -> lowest centroid index) on a deterministic
# hash-bottom-k sample, and ADC search sums integer squared-L2 lookup
# tables. This mirrors real deployments (SQ8 + PQ stacks); nothing
# below ever materializes the corpus — the sample is k·O(1) rows, the
# codebooks broadcast once, and per-batch candidates are k rows each.

_PQ_HASH_MULT = 2654435761


def _pq_quantize(x: np.ndarray, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """The exact quantize expression of ``quantize_embeddings`` (round-9
    then round-half-away, clip to 0..255; constant dims -> 0)."""
    from vector_ray.schema import round_sql_np

    span = hi - lo
    safe = np.where(span > 0, span, 1.0)
    q = round_sql_np((x - lo) * 255.0 / safe, 9)
    q = np.sign(q) * np.floor(np.abs(q) + 0.5)
    q = np.clip(q, 0, 255.0)
    return np.where(span > 0, q, 0.0).astype(np.int64)


def _pq_minmax(ds, field: str) -> tuple[np.ndarray, np.ndarray]:
    """Global per-dimension min/max (one partials pass, two d-vectors
    per block — identical plan to quantize_embeddings)."""
    from vector_ray.functions.embeddings import _collect, _matrix

    def mm_part(t: pa.Table) -> pa.Table:
        x = _matrix(t, field)
        if not x.size:
            return pa.table({"mn": pa.array([], pa.list_(pa.float64())),
                             "mx": pa.array([], pa.list_(pa.float64()))})
        return pa.table(
            {"mn": pa.array([x.min(axis=0).tolist()], pa.list_(pa.float64())),
             "mx": pa.array([x.max(axis=0).tolist()], pa.list_(pa.float64()))})

    parts = _collect(ds.map_batches(mm_part, batch_format="pyarrow"))
    if parts.num_rows == 0:
        raise ValueError("pq: empty dataset")
    mn = np.min(np.asarray(parts["mn"].to_pylist(), np.float64), axis=0)
    mx = np.max(np.asarray(parts["mx"].to_pylist(), np.float64), axis=0)
    return mn, mx


def _pq_sample(
    ds,
    id_field: str,
    field: str,
    sample_size: int,
    extra_columns: tuple = (),
) -> pa.Table:
    """Deterministic bounded training sample: the ``sample_size`` rows
    with the smallest (id·2654435761 mod 2^32, id) — each block
    pre-prunes to its local bottom-k, so the global sort sees only
    k×blocks rows (the bottomk_sample plan, order-independent). The
    returned table is hash-ordered and carries ``extra_columns``
    verbatim (hard_negatives reuses this sampler for its anchor set)."""
    cols = [id_field, field, *extra_columns]

    def local(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_field].to_numpy(zero_copy_only=False), np.uint64)
        h = (ids * np.uint64(_PQ_HASH_MULT)) % np.uint64(1 << 32)
        # lexsort on (hash, id): ids colliding mod 2^32 (possible once
        # ids exceed 2^32) must use the same (h, id) total order as the
        # global sort below, or block-local selection would depend on
        # row order within the block
        keep = np.lexsort((ids, h))[:sample_size]
        out = t.select(cols).take(pa.array(np.sort(keep)))
        return out.append_column("__h", pa.array(h[np.sort(keep)].astype(np.int64)))

    from vector_ray.functions.embeddings import _collect

    pruned = ds.map_batches(local, batch_format="pyarrow")
    return _collect(pruned.sort(["__h", id_field]).limit(sample_size))


def train_pq_codebooks(
    ds,
    field: str = "embedding",
    id_field: str = "vec_id",
    m: int = 8,
    k: int = 16,
    sample_size: int = 512,
    iters: int = 4,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Integer Lloyd k-means per subspace over the quantized sample.
    Init = k evenly spaced rows of the hash-ordered sample; assignment
    ties -> lowest centroid index; update = round-half-up integer mean;
    empty clusters keep their previous centroid. Returns
    (codebooks[m, k, dsub] int64, lo[d], hi[d])."""
    lo, hi = _pq_minmax(ds, field)
    samp = _pq_sample(ds, id_field, field, sample_size)
    from vector_ray.functions.embeddings import _matrix

    x = _pq_quantize(_matrix(samp, field), lo, hi)
    n, d = x.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    kk = min(k, n)
    init_idx = np.linspace(0, n - 1, kk).astype(int)
    books = np.empty((m, kk, dsub), dtype=np.int64)
    for j in range(m):
        sub = x[:, j * dsub:(j + 1) * dsub]
        cent = sub[init_idx].copy()
        for _ in range(iters):
            d2 = (
                (sub[:, None, :] - cent[None, :, :]) ** 2
            ).sum(axis=2)
            assign = np.argmin(d2, axis=1)  # first (lowest) min index
            for c in range(kk):
                members = sub[assign == c]
                if len(members):
                    s = members.sum(axis=0)
                    cnt = len(members)
                    cent[c] = (2 * s + cnt) // (2 * cnt)
        books[j] = cent
    return books, lo, hi


def _pq_assign(xq: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Vectorized integer code assignment: argmin squared-L2 per
    subspace (exact int64; ties -> lowest index)."""
    n, d = xq.shape
    m, kk, dsub = books.shape
    codes = np.empty((n, m), dtype=np.int64)
    for j in range(m):
        sub = xq[:, j * dsub:(j + 1) * dsub]
        cent = books[j]
        # |x-c|^2 = |x|^2 - 2 x·c + |c|^2 ; |x|^2 constant per row
        cross = sub @ cent.T                        # int64 exact
        cnorm = (cent * cent).sum(axis=1)
        codes[:, j] = np.argmin(cnorm[None, :] - 2 * cross, axis=1)
    return codes


def pq_codes(
    ds,
    field: str = "embedding",
    id_field: str = "vec_id",
    m: int = 8,
    k: int = 16,
    sample_size: int = 512,
    iters: int = 4,
):
    """Encode every vector to its m-byte PQ code (one streamed pass;
    codebooks broadcast once via ray.put, fetched per actor)."""
    books, lo, hi = train_pq_codebooks(
        ds, field=field, id_field=id_field, m=m, k=k,
        sample_size=sample_size, iters=iters)
    model = ray.put((books, lo, hi))

    def encode(t: pa.Table, mref=model) -> pa.Table:
        bks, l, h = ray.get(mref)
        from vector_ray.functions.embeddings import _matrix

        x = _matrix(t, field)
        if not x.size:
            return pa.table({id_field: t[id_field],
                             "code": pa.array([], pa.list_(pa.int64()))})
        codes = _pq_assign(_pq_quantize(x, l, h), bks)
        return pa.table(
            {id_field: t[id_field],
             "code": pa.array([r.tolist() for r in codes], pa.list_(pa.int64()))})

    return ds.map_batches(encode, batch_format="pyarrow")


def pq_topk(
    ds,
    query: np.ndarray,
    k: int = 10,
    field: str = "embedding",
    id_field: str = "vec_id",
    m: int = 8,
    n_centroids: int = 16,
    sample_size: int = 512,
    iters: int = 4,
):
    """ADC (asymmetric distance) top-k: quantize the query on the same
    grid, precompute the m×k integer lookup table lut[j][c] =
    |q_sub_j − codebook[j][c]|², then each row's approximate distance is
    the sum of m table lookups over its code. Per-batch local top-k by
    (dist asc, id asc), tiny global sort — the brute_force_topk plan
    with integer distances. Smaller dist = closer."""
    books, lo, hi = train_pq_codebooks(
        ds, field=field, id_field=id_field, m=m, k=n_centroids,
        sample_size=sample_size, iters=iters)
    mq, kk, dsub = books.shape
    qv = _pq_quantize(np.asarray(query, np.float64)[None, :], lo, hi)[0]
    lut = np.empty((mq, kk), dtype=np.int64)
    for j in range(mq):
        lut[j] = ((books[j] - qv[j * dsub:(j + 1) * dsub]) ** 2).sum(axis=1)
    model = ray.put((books, lo, hi, lut))

    def score(t: pa.Table, mref=model) -> pa.Table:
        bks, l, h, tab = ray.get(mref)
        from vector_ray.functions.embeddings import _matrix

        x = _matrix(t, field)
        if not x.size:
            return pa.table({id_field: t[id_field],
                             "dist": pa.array([], pa.int64())})
        codes = _pq_assign(_pq_quantize(x, l, h), bks)
        dist = tab[np.arange(codes.shape[1])[None, :], codes].sum(axis=1)
        ids = np.asarray(t[id_field].to_numpy(zero_copy_only=False), np.int64)
        order = np.lexsort((ids, dist))[:k]
        return pa.table({id_field: t[id_field].take(pa.array(order)),
                         "dist": pa.array(dist[order], pa.int64())})

    scored = ds.map_batches(score, batch_format="pyarrow")
    return scored.sort(["dist", id_field]).limit(k)


def hard_negatives(
    ds,
    n_anchors: int = 32,
    id_field: str = "vec_id",
    field: str = "embedding",
    label_field: str = "label",
    round_to: int = 6,
):
    """Hard-negative mining for contrastive / retrieval training: for
    each of ``n_anchors`` deterministically sampled anchor vectors, the
    single most-similar vector with a DIFFERENT label (the hardest
    negative). Returns (aid, cand, sim).

    Plan: the anchor sample is the hash-bottom-``n_anchors`` rows (same
    order-independent rule as the PQ training sample) — bounded, so the
    (m × d) anchor matrix broadcasts whole via ray.put. Each batch
    computes one matmul against the anchors, masks same-label columns,
    and emits at most ONE candidate row per anchor (rows pre-sorted by
    id so argmax tie-breaks to the lowest candidate id). The final
    exact reduce is a skew-safe per-anchor top-1 over m × num_blocks
    tiny partial rows — never the raw corpus."""
    from vector_ray.stages.shuffle import topk_per_key

    samp = _pq_sample(ds, id_field, field, n_anchors,
                      extra_columns=(label_field,))
    a_ids = np.asarray(samp[id_field].to_numpy(zero_copy_only=False), np.int64)
    a_labels = np.asarray(
        samp[label_field].to_numpy(zero_copy_only=False), np.int64
    )
    from vector_ray.functions.embeddings import _matrix

    a_mat = _normalize(_matrix(samp, field))
    model = ray.put((a_ids, a_labels, a_mat))

    def score(t: pa.Table, mref=model) -> pa.Table:
        aid, alab, am = ray.get(mref)
        empty = pa.table(
            {
                "aid": pa.array([], pa.int64()),
                "cand": pa.array([], pa.int64()),
                "sim": pa.array([], pa.float64()),
            }
        )
        if t.num_rows == 0:
            return empty
        # sort rows by candidate id so np.argmax's first-max rule
        # tie-breaks to the lowest id, matching the global sort
        raw_ids = np.asarray(t[id_field].to_numpy(zero_copy_only=False), np.int64)
        t = t.take(pa.array(np.argsort(raw_ids, kind="stable")))
        mat = _embedding_matrix(t, field)
        ids = np.asarray(t[id_field].to_numpy(zero_copy_only=False), np.int64)
        labs = np.asarray(
            t[label_field].to_numpy(zero_copy_only=False), np.int64
        )
        # double-round (9 then round_to) like cosine_join so a cosine
        # landing exactly on a 0.5e-6 boundary rounds identically in
        # numpy and DuckDB (the oracle mirrors ROUND(ROUND(.., 9), 6))
        sims = round_sql_np(
            round_sql_np(_normalize(mat) @ am.T, 9), round_to
        )  # (n, m)
        sims[labs[:, None] == alab[None, :]] = -np.inf
        best = np.argmax(sims, axis=0)
        bsim = sims[best, np.arange(len(aid))]
        ok = np.isfinite(bsim)
        if not ok.any():
            return empty
        return pa.table(
            {
                "aid": pa.array(aid[ok], pa.int64()),
                "cand": pa.array(ids[best[ok]], pa.int64()),
                "sim": pa.array(bsim[ok], pa.float64()),
            }
        )

    partials = ds.map_batches(score, batch_format="pyarrow")
    return topk_per_key(partials, key="aid", order_by="sim", k=1,
                        descending=True, tiebreak="cand")


def cosine_join(
    left_ds,
    right_ds,
    threshold: float = 0.4,
    id_field: str = "vec_id",
    right_id_field: str | None = None,
    field: str = "embedding",
    round_to: int = 6,
):
    """All-pairs cosine similarity join between TWO tables: every
    (left, right) pair with rounded cosine >= ``threshold`` — the
    retrieval-eval / probe-set shape (eval queries vs corpus,
    new-batch vs blocklist).

    The RIGHT side is the bounded probe set: it is collected once and
    broadcast as a normalized matrix via ray.put (document the bound —
    at corpus scale the probe set is the small side by construction;
    for two unbounded sides use the LSH-bucketed self-join path of
    ``embedding_dup_pairs``). The left side streams one matmul per
    batch; the threshold applies to the double-rounded value on both
    engine and oracle sides so last-ulp differences cannot flip
    membership at the boundary."""
    rid = right_id_field or id_field
    from vector_ray.functions.embeddings import _collect, _matrix

    probe = _collect(right_ds.select_columns([rid, field]))
    if probe.num_rows == 0:
        raise ValueError("cosine_join: empty right side")
    r_ids = np.asarray(probe[rid].to_numpy(zero_copy_only=False), np.int64)
    r_mat = _normalize(_matrix(probe, field))
    model = ray.put((r_ids, r_mat))

    def score(t: pa.Table, mref=model) -> pa.Table:
        rids, rmat = ray.get(mref)
        empty = pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
        if t.num_rows == 0:
            return empty
        mat = _embedding_matrix(t, field)
        ids = np.asarray(t[id_field].to_numpy(zero_copy_only=False), np.int64)
        sims = round_sql_np(
            round_sql_np(_normalize(mat) @ rmat.T, 9), round_to
        )
        li, ri = np.nonzero(sims >= threshold)
        if not len(li):
            return empty
        return pa.table(
            {
                "a": pa.array(ids[li], pa.int64()),
                "b": pa.array(rids[ri], pa.int64()),
                "cosine": pa.array(sims[li, ri], pa.float64()),
            }
        )

    return left_ds.map_batches(score, batch_format="pyarrow")
