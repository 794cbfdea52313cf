"""Distributed embedding clustering (full-corpus Lloyd k-means) and
cluster-partitioned semantic dedup (SemDeDup-style).

Unlike ``similarity.train_ivf_centroids`` (bounded-sample training for
IVF bucketing), ``kmeans_fit`` runs every Lloyd iteration over the FULL
dataset: each batch computes its cluster assignment + per-cluster
partial sums (k rows of fixed-size state), and only those partials —
k x num_blocks rows, independent of corpus size — reach the driver.
This is the classic treeAggregate shape: the corpus streams, the model
is tiny.

Determinism contract (what the SQL oracle reproduces):
  * init: the embeddings of the k smallest ids, in id order;
  * assignment: argmax cosine similarity, ties to the LOWEST cluster
    index (np.argmax first-max == SQL ``ROW_NUMBER ... ORDER BY sim
    DESC, cluster ASC``);
  * update: element-wise mean of the RAW member vectors (cosine is
    scale-invariant, so the oracle may skip re-normalization);
  * fixed iteration count, no convergence test.

SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication"): cluster the corpus, then
dedup only WITHIN clusters — the per-group pairwise cosine is bounded
by cluster size (~n/k), never corpus-wide. The pruning rule here is
the pessimistic exists-lower-id variant (a row is dropped when ANY
lower-id row in its cluster is within ``tau``), which is exactly
expressible as a SQL EXISTS self-join; the greedy keep-set variant
would need sequential processing per cluster.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from vector_ray.functions.similarity import _normalize


def _matrix(t: pa.Table, field: str) -> np.ndarray:
    col = t[field]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = np.asarray(col.flatten(), dtype=np.float64)
    n = len(col)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def _assign(x: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    # cosine similarity = dot of normalized rows; argmax takes the
    # first (lowest-index) max, the oracle's tie rule
    sims = _normalize(x) @ _normalize(centroids).T
    return np.argmax(sims, axis=1)


def kmeans_fit(
    ds,
    k: int = 10,
    iters: int = 3,
    id_field: str = "vec_id",
    field: str = "embedding",
) -> np.ndarray:
    """Lloyd k-means over the full dataset, cosine geometry, fixed
    ``iters``. Returns the raw (unnormalized) centroid matrix."""
    # ---- deterministic init: rows with the k smallest ids ----------
    # two-phase min-k: each block contributes its local k smallest, the
    # driver sees k x num_blocks rows (bounded by plan shape, not data)
    def local_mink(t: pa.Table) -> pa.Table:
        return t.sort_by(id_field).slice(0, k).select([id_field, field])

    head = ds.map_batches(local_mink, batch_format="pyarrow").take_all()
    head.sort(key=lambda r: r[id_field])
    init = head[:k]
    centroids = np.array([r[field] for r in init], dtype=np.float64)

    # ---- Lloyd iterations over the streaming corpus ----------------
    for _ in range(iters):
        cref = ray.put(centroids)

        def partial(t: pa.Table, cref=cref) -> pa.Table:
            cent = ray.get(cref)
            kk, dim = cent.shape
            x = _matrix(t, field)
            if not x.size:
                return pa.table(
                    {
                        "cluster": pa.array([], pa.int64()),
                        "psum": pa.array([], pa.list_(pa.float64())),
                        "pcount": pa.array([], pa.int64()),
                    }
                )
            a = _assign(x, cent)
            sums = np.zeros((kk, dim))
            np.add.at(sums, a, x)
            counts = np.bincount(a, minlength=kk).astype(np.int64)
            return pa.table(
                {
                    "cluster": pa.array(np.arange(kk), pa.int64()),
                    "psum": pa.array(list(sums), pa.list_(pa.float64())),
                    "pcount": pa.array(counts, pa.int64()),
                }
            )

        rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
        sums = np.zeros_like(centroids)
        counts = np.zeros(len(centroids), dtype=np.int64)
        for r in rows:
            sums[r["cluster"]] += np.asarray(r["psum"])
            counts[r["cluster"]] += r["pcount"]
        nonempty = counts > 0
        # empty cluster keeps its previous centroid (the oracle CTE
        # assumes none go empty — asserted by the fixture choice)
        centroids[nonempty] = sums[nonempty] / counts[nonempty, None]
    return centroids


def kmeans_assign(
    ds,
    centroids: np.ndarray,
    id_field: str = "vec_id",
    field: str = "embedding",
    target: str = "cluster",
):
    """Adds the argmax-cosine cluster id; centroids broadcast once."""
    cref = ray.put(np.asarray(centroids, dtype=np.float64))

    def add(t: pa.Table) -> pa.Table:
        cent = ray.get(cref)
        x = _matrix(t, field)
        a = (
            _assign(x, cent)
            if x.size
            else np.zeros(t.num_rows, dtype=np.int64)
        )
        return t.append_column(target, pa.array(a, pa.int64()))

    return ds.map_batches(add, batch_format="pyarrow")


def semdedup(
    ds,
    centroids: np.ndarray,
    tau: float,
    id_field: str = "vec_id",
    field: str = "embedding",
    max_cluster: int = 200_000,
    greedy: bool = False,
):
    """Cluster-partitioned near-dup pruning: (id, cluster, kept).

    Default rule (SQL-EXISTS-expressible, what the oracle checks):
    kept = no lower-id row in the same cluster has cosine >= tau —
    pessimistic, since a chain a~b~c drops both b and c even when
    a !~ c. ``greedy=True`` gives the published SemDeDup semantics
    instead: process each cluster in id order and drop a row only if
    it is within tau of an already-KEPT row (chain keeps c). Greedy is
    sequential per cluster but vectorized per step (one similarity-row
    scan against the kept mask), and has no SQL oracle.

    The per-group work is O(cluster_size^2) vectorized; size k so that
    n/k stays within ``max_cluster`` (guard raises rather than letting
    one skewed group OOM a worker)."""
    assigned = kmeans_assign(ds, centroids, id_field, field)

    def prune(g: pa.Table) -> pa.Table:
        if g.num_rows > max_cluster:
            raise ValueError(
                f"cluster of {g.num_rows} rows exceeds max_cluster="
                f"{max_cluster}; increase k for this corpus"
            )
        ids_col = g[id_field]
        if isinstance(ids_col, pa.ChunkedArray):
            ids_col = ids_col.combine_chunks()
        ids = np.asarray(ids_col, dtype=np.int64)
        x = _normalize(_matrix(g, field))
        sims = x @ x.T
        if greedy:
            order = np.argsort(ids)
            kept_o = np.zeros(len(ids), dtype=bool)
            sims_o = sims[np.ix_(order, order)]
            for i in range(len(ids)):
                kept_o[i] = not (sims_o[i, :i][kept_o[:i]] >= tau).any()
            dropped = np.empty(len(ids), dtype=bool)
            dropped[order] = ~kept_o
        else:
            lower = ids[None, :] < ids[:, None]
            dropped = ((sims >= tau) & lower).any(axis=1)
        cl = g["cluster"]
        if isinstance(cl, pa.ChunkedArray):
            cl = cl.combine_chunks()
        return pa.table(
            {
                id_field: pa.array(ids, pa.int64()),
                "cluster": cl,
                "kept": pa.array(~dropped),
            }
        )

    return assigned.groupby("cluster").map_groups(prune, batch_format="pyarrow")


def ctfidf_top_terms(
    docs,
    labels,
    k_terms: int = 3,
    text_field: str = "text",
    id_field: str = "doc_id",
    label_id: str = "vec_id",
    num_buckets: int = 16,
    ndigits: int = 4,
):
    """Class-based TF-IDF cluster labeling (the BERTopic topic-naming
    step, Grootendorst 2022): for each cluster, the top-k terms by
    W(t, c) = tf(t, c) * ln(1 + A / f(t)) where tf is the term count
    inside the cluster, f(t) the term's corpus count, and A the average
    word count per cluster.

    Plan: ONE bucketed join co-partitions docs with their cluster
    labels; each batch collapses to local (cluster, word) counts before
    the aggregate shuffle (the exchange carries distinct class-grams,
    never corpus positions); f(t) and A are re-reduced from that tiny
    count table; the final ranking is the skew-safe salted top-k.
    Output: (cluster, term, tf, score)."""
    import pyarrow.compute as pc

    from vector_ray.schema import round_sql_np
    from vector_ray.stages.grouped import aggregate as agg_stage
    from vector_ray.stages.shuffle import bucketed_join, topk_per_key

    lab = labels.map_batches(
        lambda t: pa.table(
            {id_field: pc.cast(t[label_id], pa.int64()), "cluster": t["cluster"]}
        ),
        batch_format="pyarrow",
    )
    joined = bucketed_join(
        docs.map_batches(
            lambda t: t.select([id_field, text_field]), batch_format="pyarrow"
        ),
        lab,
        id_field,
        num_buckets=num_buckets,
    )

    def partials(t: pa.Table) -> pa.Table:
        col = t[text_field]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = pc.fill_null(pc.cast(col, pa.string()), "")
        words = pc.split_pattern(col, pattern=" ")
        offs = np.asarray(words.offsets, dtype=np.int64)
        n = offs[1:] - offs[:-1]
        cl = pc.cast(t["cluster"], pa.int64())
        if isinstance(cl, pa.ChunkedArray):
            cl = cl.combine_chunks()
        rep = cl.take(pa.array(np.repeat(np.arange(len(n)), n)))
        local = (
            pa.table({"cluster": rep, "word": words.flatten()})
            .group_by(["cluster", "word"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "cluster": local["cluster"],
                "word": local["word"],
                "tf": pc.cast(local["count_all"], pa.int64()),
            }
        )

    tf = agg_stage(
        joined.map_batches(partials, batch_format="pyarrow"),
        {
            "group_by": ["cluster", "word"],
            "aggregates": {"tf": {"fn": "sum", "field": "tf"}},
        },
    ).materialize()  # distinct (cluster, word) counts: reused 3x below

    # A = total words / n_clusters, from one tiny partial-reduce pass
    def totals(t: pa.Table) -> pa.Table:
        return pa.table(
            {"s": pa.array([pc.sum(t["tf"]).as_py() or 0], pa.int64())}
        )

    rows = tf.map_batches(totals, batch_format="pyarrow").take_all()
    total_words = float(sum(r["s"] for r in rows))
    # distinct clusters across blocks: cheap exact pass on the tf table
    n_clusters = len(
        set(
            r["cluster"]
            for r in tf.map_batches(
                lambda t: pa.table({"cluster": pc.unique(t["cluster"])}),
                batch_format="pyarrow",
            ).take_all()
        )
    )
    a_avg = total_words / float(n_clusters)

    ft = agg_stage(
        tf,
        {"group_by": ["word"], "aggregates": {"ft": {"fn": "sum", "field": "tf"}}},
    )
    scored_in = bucketed_join(tf, ft, "word", num_buckets=num_buckets)

    def score(t: pa.Table) -> pa.Table:
        tfv = np.asarray(pc.cast(t["tf"], pa.float64()))
        ftv = np.asarray(pc.cast(t["ft"], pa.float64()))
        w = round_sql_np(
            round_sql_np(tfv * np.log(1.0 + a_avg / ftv), 9), ndigits
        )
        return pa.table(
            {
                "cluster": pc.cast(t["cluster"], pa.int64()),
                "term": t["word"],
                "tf": pc.cast(t["tf"], pa.int64()),
                "score": pa.array(w, pa.float64()),
            }
        )

    return topk_per_key(
        scored_in.map_batches(score, batch_format="pyarrow"),
        key="cluster",
        order_by="score",
        k=k_terms,
        tiebreak="term",
    )
