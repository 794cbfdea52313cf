"""Deduplication operators for training-data pipelines.

Five families, all expressed Ray-Data-first (SURVEY-mandated extensions):

* **exact** — content-hash partition + per-group representative
  (hash-shuffle; the only stage that moves full rows)
* **MinHash + LSH** — shingle → minhash signature → banded bucket
  groupby → candidate pairs (signature-estimated Jaccard)
* **SimHash** — 64-bit simhash + banded hamming buckets
* **n-gram Jaccard** — exact verified similarity for candidate pairs
* **embedding cosine** — near-dup pairs over an embedding column

Scale notes: candidate generation is linear (map_batches) + one groupby
on (band, bucket); only candidate *pairs* (tiny vs corpus) ever
concentrate. Signatures are drawn per batch with seeded numpy — no
Python loop over rows or shingles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from vector_ray.stages.core import _stable_hash_u64

_MERSENNE = np.uint64((1 << 61) - 1)


def _word_hashes(col: pa.ChunkedArray | pa.Array):
    """list<string> word splits + flat uint64 hashes + offsets."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    words = pc.split_pattern(pc.fill_null(pc.cast(col, pa.string()), ""), " ")
    flat = words.flatten()
    h = _stable_hash_u64(flat) if len(flat) else np.array([], np.uint64)
    return np.asarray(words.offsets, dtype=np.int64), h


def _shingle_hashes(offsets: np.ndarray, h: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """k-word shingle hashes per row (combined from word hashes), returned
    as (row_offsets, flat_shingle_hashes). Rows shorter than k get one
    shingle from their full word sequence."""
    lengths = np.diff(offsets)
    n_sh = np.maximum(lengths - k + 1, np.minimum(lengths, 1)).astype(np.int64)
    out_off = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(n_sh, out=out_off[1:])
    total = int(out_off[-1])
    flat = np.zeros(total, dtype=np.uint64)
    mult = np.uint64(0x100000001B3)
    # combine k consecutive word hashes; vectorized over all shingles
    if total:
        row_id = np.repeat(np.arange(len(lengths)), n_sh)
        within = np.arange(total) - np.repeat(out_off[:-1], n_sh)
        starts = np.repeat(offsets[:-1], n_sh) + within
        limit = offsets[1:][row_id] - 1
        for j in range(k):
            # clamp within each row: rows shorter than k reuse last word
            idx = np.minimum(starts + j, limit)
            flat = flat * mult + h[idx]
    return out_off, flat


def minhash_signatures(
    t: pa.Table,
    field: str = "text",
    num_perm: int = 64,
    shingle_k: int = 3,
    seed: int = 7,
) -> np.ndarray:
    """(n_rows, num_perm) uint64 minhash signature matrix, vectorized."""
    offsets, h = _word_hashes(t[field])
    sh_off, sh = _shingle_hashes(offsets, h, shingle_k)
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    n = t.num_rows
    sig = np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(sh) == 0:
        return sig
    # permuted[j, p] = (a_p * sh_j + b_p) mod M ; reduce min per row
    perm = (sh[:, None] * a[None, :] + b[None, :]) % _MERSENNE
    row_id = np.repeat(np.arange(n), np.diff(sh_off))
    np.minimum.at(sig, row_id, perm)
    return sig


def minhash_lsh_candidates(
    ds,
    id_field: str = "doc_id",
    field: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.5,
    seed: int = 7,
):
    """MinHash+LSH near-duplicate candidate pairs.

    Stage 1 (map_batches): signatures → explode to one row per (band,
    band_hash, doc). Stage 2: groupby band bucket, emit all pairs within
    a bucket with signature-estimated Jaccard ≥ threshold.
    Returns Dataset[(doc_a, doc_b, est_jaccard)] with doc_a < doc_b.
    """
    rows_per_band = num_perm // bands

    def to_buckets(t: pa.Table) -> pa.Table:
        sig = minhash_signatures(t, field, num_perm, shingle_k, seed)
        n = t.num_rows
        ids = t[id_field]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        band_hashes = np.zeros((n, bands), dtype=np.uint64)
        mult = np.uint64(0x9E3779B97F4A7C15)
        for b in range(bands):
            seg = sig[:, b * rows_per_band : (b + 1) * rows_per_band]
            acc = np.zeros(n, dtype=np.uint64)
            for j in range(rows_per_band):
                acc = acc * mult + seg[:, j]
            band_hashes[:, b] = acc
        return pa.table(
            {
                "band": pa.array(
                    np.repeat(np.arange(bands, dtype=np.int32), n)
                ),
                "bucket": pa.array(
                    band_hashes.T.reshape(-1).astype(np.int64)
                ),
                id_field: pa.concat_arrays([ids] * bands),
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(
                        np.tile(sig.astype(np.int64), (bands, 1)).reshape(-1)
                    ),
                    num_perm,
                ),
            }
        )

    def pairs(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n < 2:
            return pa.table(
                {
                    "doc_a": pa.array([], group.schema.field(id_field).type),
                    "doc_b": pa.array([], group.schema.field(id_field).type),
                    "est_jaccard": pa.array([], pa.float64()),
                }
            )
        ids = group[id_field].to_pylist()
        sig = np.asarray(group["sig"].to_pylist(), dtype=np.int64)
        ia, ib, est = [], [], []
        for x in range(n):
            for y in range(x + 1, n):
                if ids[x] == ids[y]:
                    continue
                j = float(np.mean(sig[x] == sig[y]))
                if j >= threshold:
                    a_, b_ = sorted((ids[x], ids[y]))
                    ia.append(a_)
                    ib.append(b_)
                    est.append(round(j, 4))
        return pa.table(
            {"doc_a": pa.array(ia), "doc_b": pa.array(ib),
             "est_jaccard": pa.array(est, pa.float64())}
        )

    buckets = ds.map_batches(to_buckets, batch_format="pyarrow")
    cand = buckets.groupby(["band", "bucket"]).map_groups(
        pairs, batch_format="pyarrow"
    )
    # a pair can match in several bands — dedupe on (doc_a, doc_b)
    return cand.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    )


def simhash_bits(t: pa.Table, field: str = "text") -> np.ndarray:
    """64-bit SimHash per row from word hashes (vectorized bit voting)."""
    offsets, h = _word_hashes(t[field])
    n = t.num_rows
    votes = np.zeros((n, 64), dtype=np.int64)
    if len(h):
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
        contrib = bits * 2 - 1
        row_id = np.repeat(np.arange(n), np.diff(offsets))
        np.add.at(votes, row_id, contrib)
    out = (votes > 0).astype(np.uint64)
    return (out << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1)


def simhash(ds, id_field: str = "doc_id", field: str = "text"):
    """Adds a deterministic int64 `simhash` column."""

    def add(t: pa.Table) -> pa.Table:
        s = simhash_bits(t, field)
        return t.append_column("simhash", pa.array(s.astype(np.int64), pa.int64()))

    return ds.map_batches(add, batch_format="pyarrow")


def simhash_candidates(
    ds, id_field: str = "doc_id", field: str = "text", max_hamming: int = 3
):
    """Near-dup pairs by SimHash banding: 4 bands of 16 bits; pairs
    sharing any band verified by exact hamming distance."""

    def to_buckets(t: pa.Table) -> pa.Table:
        s = simhash_bits(t, field)
        ids = t[id_field]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        n = t.num_rows
        parts = []
        for band in range(4):
            chunk = ((s >> np.uint64(band * 16)) & np.uint64(0xFFFF)).astype(np.int64)
            parts.append(
                pa.table(
                    {
                        "band": pa.array(np.full(n, band, dtype=np.int32)),
                        "bucket": pa.array(chunk),
                        id_field: ids,
                        "simhash": pa.array(s.astype(np.int64)),
                    }
                )
            )
        return pa.concat_tables(parts)

    def pairs(group: pa.Table) -> pa.Table:
        n = group.num_rows
        ids = group[id_field].to_pylist()
        sh = np.asarray(group["simhash"].to_pylist(), dtype=np.uint64)
        ia, ib, dist = [], [], []
        for x in range(n):
            for y in range(x + 1, n):
                if ids[x] == ids[y]:
                    continue
                d = int(bin(int(sh[x]) ^ int(sh[y])).count("1"))
                if d <= max_hamming:
                    a_, b_ = sorted((ids[x], ids[y]))
                    ia.append(a_)
                    ib.append(b_)
                    dist.append(d)
        return pa.table(
            {"doc_a": pa.array(ia), "doc_b": pa.array(ib),
             "hamming": pa.array(dist, pa.int64())}
        )

    buckets = ds.map_batches(to_buckets, batch_format="pyarrow")
    cand = buckets.groupby(["band", "bucket"]).map_groups(pairs, batch_format="pyarrow")
    return cand.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    )


def ngram_jaccard_pairs(
    ds,
    id_field: str = "doc_id",
    field: str = "text",
    bucket_by: list[str] | None = None,
    shingle_k: int = 3,
    threshold: float = 0.5,
):
    """Exact n-gram Jaccard similarity for pairs within co-partitioned
    buckets (e.g. same (lang, source)). Buckets bound the O(n²) — state
    the partitioning assumption: near-dups must share the bucket key."""
    bucket_by = bucket_by or ["lang"]

    def pairs(group: pa.Table) -> pa.Table:
        offsets, h = _word_hashes(group[field])
        sh_off, sh = _shingle_hashes(offsets, h, shingle_k)
        sets = [
            set(sh[sh_off[i] : sh_off[i + 1]].tolist())
            for i in range(group.num_rows)
        ]
        ids = group[id_field].to_pylist()
        ia, ib, jc = [], [], []
        for x in range(len(sets)):
            for y in range(x + 1, len(sets)):
                inter = len(sets[x] & sets[y])
                if not inter:
                    continue
                j = inter / len(sets[x] | sets[y])
                if j >= threshold:
                    a_, b_ = sorted((ids[x], ids[y]))
                    ia.append(a_)
                    ib.append(b_)
                    jc.append(round(j, 4))
        return pa.table(
            {"doc_a": pa.array(ia), "doc_b": pa.array(ib),
             "jaccard": pa.array(jc, pa.float64())}
        )

    return ds.groupby(bucket_by).map_groups(pairs, batch_format="pyarrow")


def embedding_dup_pairs(
    ds,
    id_field: str = "vec_id",
    field: str = "embedding",
    threshold: float = 0.95,
    ref_table: pa.Table | None = None,
):
    """Embedding-cosine near-dup pairs: each batch is compared against a
    broadcast reference matrix (numpy matmul per batch). For corpus-scale
    all-pairs, pass the (bucketed) reference explicitly."""
    import ray

    if ref_table is None:
        ref_table = pa.concat_tables(
            ray.get(ds.materialize().to_arrow_refs()), promote_options="default"
        )
    ref_ids = np.asarray(ref_table[id_field].to_pylist())
    ref = np.asarray(ref_table[field].to_pylist(), dtype=np.float64)
    ref_n = ref / np.maximum(np.linalg.norm(ref, axis=1, keepdims=True), 1e-12)
    ref_obj = ray.put((ref_ids, ref_n))

    class Compare:
        def __init__(self):
            self.ids, self.mat = ray.get(ref_obj)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch[id_field].to_pylist())
            v = np.asarray(batch[field].to_pylist(), dtype=np.float64)
            v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
            sims = v @ self.mat.T
            ia, ib, cs = [], [], []
            xs, ys = np.nonzero(sims >= threshold)
            for x, y in zip(xs, ys):
                if ids[x] < self.ids[y]:
                    ia.append(ids[x])
                    ib.append(self.ids[y])
                    cs.append(round(float(sims[x, y]), 4))
            return pa.table(
                {"doc_a": pa.array(ia), "doc_b": pa.array(ib),
                 "cosine": pa.array(cs, pa.float64())}
            )

    return ds.map_batches(
        Compare, batch_format="pyarrow", concurrency=(1, 4), num_cpus=1
    )


def connected_components_keep_min(pairs_ds, max_rounds: int = 25):
    """Union near-dup pairs into clusters by iterative min-label
    propagation; returns Dataset[(doc_id, cluster)] with cluster = min
    doc_id of the component.

    Convergence needs one round per hop of the longest chain; if
    ``max_rounds`` is exhausted before the labels stabilize a
    RuntimeError is raised (silent partial labels would leave duplicate
    copies alive). Scale note: each round currently broadcasts the full
    node→label map to the relabel tasks — fine for candidate-pair sets
    (tiny vs corpus), not for corpus-sized graphs; for those, relabel
    via ``stages.shuffle.bucketed_join`` on the node key instead."""

    def explode(t: pa.Table) -> pa.Table:
        a = t["doc_a"]
        b = t["doc_b"]
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a,
                     b.combine_chunks() if isinstance(b, pa.ChunkedArray) else b]
                ),
                "peer": pa.concat_arrays(
                    [b.combine_chunks() if isinstance(b, pa.ChunkedArray) else b,
                     a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a]
                ),
            }
        )

    edges = pairs_ds.map_batches(explode, batch_format="pyarrow").materialize()

    def min_label(g: pa.Table) -> pa.Table:
        node = g["node"][0].as_py()
        peers = g["peer"].to_pylist()
        return pa.table({"node": [node], "label": [min([node] + peers)]})

    labels = edges.groupby("node").map_groups(min_label, batch_format="pyarrow")
    converged = False
    for _ in range(max_rounds):
        # join labels back onto edges and re-propagate
        ltbl = pa.concat_tables(
            __import__("ray").get(labels.materialize().to_arrow_refs()),
            promote_options="default",
        )
        lmap = dict(zip(ltbl["node"].to_pylist(), ltbl["label"].to_pylist()))

        def relabel(t: pa.Table, lmap=lmap) -> pa.Table:
            peer_lab = [lmap.get(p, p) for p in t["peer"].to_pylist()]
            return pa.table({"node": t["node"], "peer": pa.array(peer_lab)})

        new_edges = edges.map_batches(relabel, batch_format="pyarrow")
        new_labels = new_edges.groupby("node").map_groups(
            min_label, batch_format="pyarrow"
        )
        ntbl = pa.concat_tables(
            __import__("ray").get(new_labels.materialize().to_arrow_refs()),
            promote_options="default",
        )
        nmap = dict(zip(ntbl["node"].to_pylist(), ntbl["label"].to_pylist()))
        if nmap == lmap:
            labels = new_labels
            converged = True
            break
        labels = new_labels
    if not converged:
        raise RuntimeError(
            f"label propagation did not converge in {max_rounds} rounds "
            "(duplicate chain longer than max_rounds?); raise max_rounds"
        )
    return labels.map_batches(
        lambda t: t.rename_columns(["doc_id", "cluster"]), batch_format="pyarrow"
    )
