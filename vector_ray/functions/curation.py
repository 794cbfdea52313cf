"""Corpus-curation operators for pre-training data pipelines: mixture
sampling, train/val splitting, curriculum length-binning, and intra-doc
repetition scoring.

These run over the tokenized corpus ``(doc_id, tokens: list<int32>,
n_tok, source)`` (BASELINE.json input_hint). All are embarrassingly
parallel ``map_batches`` stages — no shuffle except the tiny final
groupby in the binning/split summaries — so they stream at any corpus
size.

Determinism at 100 TB: document selection uses a multiplicative hash of
the numeric doc id computed modulo 2^64 (numpy uint64 wrap) then modulo
2^32. Because 2^32 divides 2^64 the result equals the true product mod
2^32 at ANY id magnitude, so the same doc lands in the same
split/sample on every run, cluster size, and an exact-arithmetic SQL
oracle (HUGEINT product mod 4294967296) agrees bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

__all__ = [
    "mixture_sample",
    "split_assign",
    "length_buckets",
    "repetition_stats",
    "epoch_shuffle",
    "stratified_sample",
]

# Knuth multiplicative-hash constant (sampling), xxhash PRIME32_2
# (splitting), and xxhash PRIME32_5 (epoch shuffling) — distinct
# multipliers so the three selections decorrelate.
MIX_MULT = 2654435761
SPLIT_MULT = 2246822519
EPOCH_MULT = 374761393
HASH_MOD = 1 << 32


def _doc_hash(t: pa.Table, mult: int, field: str = "doc_id") -> np.ndarray:
    """(numeric id * mult) mod 2^32, exact at any id magnitude. ``field``
    may be the ``doc-<digits>`` string id or any integer column."""
    col = t[field]
    if pa.types.is_integer(col.type):
        ids = col.to_numpy(zero_copy_only=False).astype(np.uint64)
    else:
        ids = (
            pc.cast(pc.utf8_slice_codeunits(col, 4, 99), pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.uint64)
        )
    with np.errstate(over="ignore"):
        h = ids * np.uint64(mult)  # wraps mod 2^64; mod 2^32 unaffected
    return (h % np.uint64(HASH_MOD)).astype(np.float64)


def _source_rates(
    t: pa.Table, rates: dict[str, float], default: float
) -> np.ndarray:
    """Per-row sampling rate via dictionary-encoded source (vectorized —
    the Python lookup runs once per DISTINCT source, not per row)."""
    enc = t["source"].combine_chunks().dictionary_encode()
    per_code = np.array(
        [float(rates.get(s, default)) for s in enc.dictionary.to_pylist()]
    )
    return per_code[enc.indices.to_numpy(zero_copy_only=False)]


def mixture_sample(
    ds: rd.Dataset, rates: dict[str, float], default: float = 1.0
) -> rd.Dataset:
    """Deterministic per-source downsampling — the data-mixing step that
    rebalances a crawl-heavy corpus before training. Keeps a doc iff
    ``hash(doc_id) < rate[source] * 2^32``; reproducible across runs and
    cluster sizes (unlike random sampling), and SQL-checkable.
    """

    def keep(t: pa.Table) -> pa.Table:
        mask = _doc_hash(t, MIX_MULT) < _source_rates(t, rates, default) * HASH_MOD
        return t.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


def split_assign(ds: rd.Dataset, val_per_mille: int = 10) -> rd.Dataset:
    """Leakage-free train/val assignment: ``val`` iff
    ``hash(doc_id) % 1000 < val_per_mille``. Hash-based (not positional),
    so the split survives repartitioning, resharding, and incremental
    corpus growth — every doc keeps its split forever."""

    def assign(t: pa.Table) -> pa.Table:
        is_val = (_doc_hash(t, SPLIT_MULT) % 1000) < val_per_mille
        split = np.where(is_val, "val", "train")
        return t.append_column("split", pa.array(split, pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow")


def length_buckets(ds: rd.Dataset, bucket_size: int = 256) -> rd.Dataset:
    """Curriculum length-binning summary: docs and tokens per
    (source, n_tok // bucket_size) bucket. Two-phase: per-batch partial
    counts collapse each block to ≤ sources × buckets rows before the
    small groupby — shuffled bytes independent of corpus size."""
    from vector_ray.stages import grouped

    def bucketize(t: pa.Table) -> pa.Table:
        bucket = pc.divide(pc.cast(t["n_tok"], pa.int64()), bucket_size)
        return pa.table(
            {
                "source": t["source"],
                "bucket": bucket,
                "n_tok": pc.cast(t["n_tok"], pa.int64()),
            }
        )

    binned = ds.map_batches(bucketize, batch_format="pyarrow")
    return grouped.aggregate(
        binned,
        {
            "group_by": ["source", "bucket"],
            "aggregates": {
                "n_docs": {"fn": "count"},
                "sum_tok": {"fn": "sum", "field": "n_tok", "int": True},
            },
        },
    )


def epoch_shuffle(
    ds: rd.Dataset, epoch: int = 0, id_field: str = "doc_id"
) -> rd.Dataset:
    """Deterministic per-epoch global reshuffle — the training-order
    shuffle a data loader needs, reproducible across runs and cluster
    sizes (``ds.random_shuffle`` is not).

    Each epoch multiplies the numeric doc id by a distinct odd constant
    mod 2^32 — ``EPOCH_MULT^(epoch+1) mod 2^32`` (odd power of an odd
    constant stays odd ⇒ still a permutation of the low 32 bits, and
    successive epochs decorrelate, unlike ``MULT + 2*epoch`` whose
    orders are nearly identical for small ids). EPOCH_MULT is its own
    constant, NOT ``MIX_MULT``/``SPLIT_MULT``: if epoch 0 reused the
    mixture hash, docs surviving ``mixture_sample(rate=r)`` would all
    have shuffle keys below ``r * 2^32`` and the downsampled sources
    would cluster at the front of the "shuffled" order. Then sorts on
    the resulting ``shuffle_key`` (Ray's sort-based range shuffle — the
    one intentional all-to-all; key is uniform so range partitions
    balance). ``id_field`` breaks the rare key ties so the order is
    total.
    """
    mult = pow(EPOCH_MULT, epoch + 1, HASH_MOD)

    def key(t: pa.Table) -> pa.Table:
        h = _doc_hash(t, mult, id_field).astype(np.int64)
        return t.append_column("shuffle_key", pa.array(h, pa.int64()))

    return ds.map_batches(key, batch_format="pyarrow").sort(
        ["shuffle_key", id_field]
    )


def repetition_stats(ds: rd.Dataset, max_freq_pct: int = 5) -> rd.Dataset:
    """Per-doc token-repetition quality signals: distinct-token count,
    max single-token count, and a ``repetitive`` flag
    (``max_cnt * (100 // max_freq_pct) >= n_tok`` — integer compare, no
    float-boundary ambiguity vs the SQL oracle).

    Fully vectorized: one np.unique over (row, token) keys per batch —
    no per-row loop, no shuffle.
    """
    mult = 100 // max_freq_pct

    def stats(t: pa.Table) -> pa.Table:
        arr = t["tokens"].combine_chunks()
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.chunk(0) if arr.num_chunks else pa.array([], pa.list_(pa.int32()))
        values = arr.values.to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        n = t.num_rows
        row_of = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
        # key stride = actual token-id range in THIS batch (not a fixed
        # vocab bound): an id >= the assumed stride would bleed a doc's
        # counts into the next row's key space and silently corrupt both
        if len(values) and values.min() < 0:
            raise ValueError("repetition_stats requires non-negative token ids")
        stride = int(values.max()) + 1 if len(values) else 1
        key = row_of * stride + values
        uniq, counts = np.unique(key, return_counts=True)
        urow = uniq // stride
        n_types = np.bincount(urow, minlength=n).astype(np.int64)
        max_cnt = np.zeros(n, dtype=np.int64)
        np.maximum.at(max_cnt, urow, counts)
        n_tok = offsets[1:] - offsets[:-1]
        # empty docs are not "repetitive" (nothing repeats in them)
        rep = (n_tok > 0) & (max_cnt * mult >= n_tok)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_types": pa.array(n_types),
                "max_cnt": pa.array(max_cnt),
                "repetitive": pa.array(rep),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")


def token_entropy(ds: rd.Dataset, round_to: int = 4) -> rd.Dataset:
    """Per-doc Shannon entropy of the token distribution, in nats
    (low-entropy docs = repetitive/templated text, a standard corpus
    quality filter alongside ``repetition_stats``; entropy of an empty
    doc is 0).

    Same vectorization as ``repetition_stats``: one np.unique over
    (row, token) keys per batch, entropy summed per row with np.add.at
    — no per-row loop, no shuffle. Double-rounded half-away-from-zero
    so the distributed float sum cannot drift off the SQL oracle."""
    from vector_ray.schema import round_sql_np

    def ent(t: pa.Table) -> pa.Table:
        arr = t["tokens"].combine_chunks()
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.chunk(0) if arr.num_chunks else pa.array([], pa.list_(pa.int32()))
        values = arr.values.to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        n = t.num_rows
        row_of = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
        if len(values) and values.min() < 0:
            raise ValueError("token_entropy requires non-negative token ids")
        stride = int(values.max()) + 1 if len(values) else 1
        key = row_of * stride + values
        uniq, counts = np.unique(key, return_counts=True)
        urow = uniq // stride
        n_tok = offsets[1:] - offsets[:-1]
        p = counts / np.maximum(n_tok[urow], 1)
        h = np.zeros(n, dtype=np.float64)
        np.add.at(h, urow, -p * np.log(p))
        h = round_sql_np(round_sql_np(h, 9), round_to)
        return pa.table({"doc_id": t["doc_id"], "entropy": pa.array(h)})

    return ds.map_batches(ent, batch_format="pyarrow")


# xxhash PRIME32_3 — a fourth multiplier, decorrelated from the
# mixture/split/epoch selections above
STRAT_MULT = 3266489917


def stratified_sample(
    ds: rd.Dataset, n_per_key: int, key: str = "source",
    id_field: str = "doc_id",
) -> rd.Dataset:
    """EXACTLY ``n_per_key`` rows per key (fewer if the stratum is
    smaller), deterministic: rows rank within their key by
    (hash(id) asc, id asc) and the first n win. Unlike rate-based
    ``mixture_sample`` this guarantees the stratum count; like it, the
    selection is stable across runs, repartitioning, and cluster sizes.
    Skew-safe two-phase via ``topk_per_key`` (per-block local head, so
    a hot stratum ships at most n x blocks rows, then salted merge)."""

    def add_rank_hash(t: pa.Table) -> pa.Table:
        h = _doc_hash(t, STRAT_MULT, id_field).astype(np.int64)
        return t.append_column("__strath", pa.array(h))

    from vector_ray.stages.shuffle import topk_per_key

    ranked = ds.map_batches(add_rank_hash, batch_format="pyarrow")
    out = topk_per_key(
        ranked, key, "__strath", n_per_key, descending=False,
        tiebreak=id_field,
    )
    return out.map_batches(
        lambda t: t.drop_columns(["__strath"]), batch_format="pyarrow"
    )


def bottomk_sample(ds, k: int, id_field: str = "doc_id",
                   mult: int = 2_654_435_761):
    """Exactly-k uniform corpus sample, the deterministic distributed
    reservoir: rank rows by the multiplicative id hash (odd ``mult``
    mod 2^32 is a bijection, so distinct ids never tie) and keep the
    global bottom k. Two-phase: each block prunes to its local k
    smallest before the global sort touches anything, so the exchange
    is O(k × blocks) rows regardless of corpus size — the same
    pre-prune trick as stages/shuffle.topk_per_key, without the key."""
    import pyarrow.compute as _pc

    def local(t: pa.Table) -> pa.Table:
        h = _doc_hash(t, mult, id_field)
        t = t.append_column("__h", pa.array(h.astype(np.int64), pa.int64()))
        idx = _pc.sort_indices(t, sort_keys=[("__h", "ascending")])
        return t.take(idx.slice(0, k))

    pruned = ds.map_batches(local, batch_format="pyarrow")
    return pruned.sort("__h").limit(k).drop_columns(["__h"])


def weighted_sample(
    ds,
    k: int,
    weight_field: str,
    id_field: str = "doc_id",
    mult: int = 2_654_435_761,
):
    """Exactly-k WEIGHTED sample without replacement (Efraimidis–
    Spirakis A-ES, deterministic): each row gets key = u^(1/w) with u
    the multiplicative id hash mapped to (0, 1]; the global top-k keys
    are the sample, so inclusion probability rises with the weight
    (quality score, token count, ...). Deterministic and
    SQL-reproducible — same integer hash, same libm double pow — and
    two-phase like ``bottomk_sample``: each block prunes to its local
    top-k before the global sort, so the exchange is O(k × blocks)
    rows. Rows with null/non-positive/non-finite weight are excluded
    (mirror: SQL ``WHERE w > 0``). Ties (possible only at key = 1.0,
    i.e. hash 2^32-1) break by id ascending."""
    import pyarrow.compute as _pc

    def local(t: pa.Table) -> pa.Table:
        h = _doc_hash(t, mult, id_field)
        w = pc.cast(t[weight_field], pa.float64()).to_numpy(
            zero_copy_only=False
        )
        u = (h.astype(np.float64) + 1.0) / 4294967296.0
        with np.errstate(invalid="ignore", divide="ignore", over="ignore"):
            key = u ** (1.0 / w)
        valid = np.isfinite(w) & (w > 0) & np.isfinite(key)
        t = t.append_column("__k", pa.array(key, pa.float64()))
        t = t.filter(pa.array(valid))
        idx = _pc.sort_indices(
            t, sort_keys=[("__k", "descending"), (id_field, "ascending")]
        )
        return t.take(idx.slice(0, k))

    pruned = ds.map_batches(local, batch_format="pyarrow")
    return (
        pruned.sort(["__k", id_field], descending=[True, False])
        .limit(k)
        .drop_columns(["__k"])
    )


def temperature_mixture(ds, alpha: float = 0.7, token_field: str = "n_tok",
                        key_field: str = "source"):
    """Multinomial temperature rebalancing (the multilingual-LM mixing
    rule): sampling rate for source s ∝ (tokens_s / Σ)^alpha, scaled so
    the LARGEST source's rate is 1.0 (pure down-sampling — alpha < 1
    up-weights the tail relatively by keeping it whole while the head
    shrinks). Two phases: a tiny per-source token-count aggregate (the
    only exchange — |sources| rows), then the same deterministic
    hash-threshold keep as ``mixture_sample``. Float discipline: rates
    come from two libm pow/division ops on exact integer counts, so the
    SQL oracle computes bit-identical thresholds."""
    counts = ds.groupby(key_field).sum(token_field)
    rows = counts.take_all()  # |sources| rows
    col = f"sum({token_field})"
    tot = float(sum(r[col] for r in rows))
    raw = {r[key_field]: (r[col] / tot) ** alpha for r in rows}
    peak = max(raw.values()) if raw else 1.0
    rates = {k: v / peak for k, v in raw.items()}

    def keep(t: pa.Table) -> pa.Table:
        mask = _doc_hash(t, MIX_MULT) < _source_rates(t, rates, 1.0) * HASH_MOD
        return t.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# UniMax sampling: epoch-capped, budget-constrained source allocation
# ---------------------------------------------------------------------------

# distinct multiplier (xxhash PRIME32_3) so the fractional-epoch pick
# decorrelates from mixture/split/epoch selections above
UNIMAX_MULT = 3266489917


def unimax_allocation(
    counts: dict[str, int], budget: int, max_epochs: int = 3
) -> dict[str, int]:
    """UniMax token allocation (Chung et al. 2023, arXiv:2304.09151):
    give every source a uniform share of ``budget``, except sources so
    small that the share would exceed ``max_epochs`` passes over them —
    those are capped at ``max_epochs × size`` and the leftover is
    re-split uniformly among the rest. Exact integer math throughout
    (the uncapped share is ONE floor division, not iterative
    subtraction), so a SQL oracle reproduces it bit-for-bit.

    Returns {source: allocated_tokens}."""
    if budget > max_epochs * sum(counts.values()):
        raise ValueError(
            "budget exceeds max_epochs * corpus tokens; every source "
            "would be capped and the uniform split is undefined"
        )
    order = sorted(counts.items(), key=lambda kv: (kv[1], kv[0]))
    L, E, B = len(order), int(max_epochs), int(budget)
    pref = 0
    capped: set[str] = set()
    for i, (src, c) in enumerate(order):  # ascending; capped set is a prefix
        if E * c * (L - i) < B - E * pref:
            capped.add(src)
            pref += c
        else:
            break
    n_uncapped = L - len(capped)
    share = (B - E * pref) // n_uncapped if n_uncapped else 0
    return {
        src: (E * c if src in capped else share) for src, c in order
    }


def unimax_sample(
    ds: rd.Dataset,
    budget_factor: int = 1,
    max_epochs: int = 3,
    id_field: str = "doc_id",
    count_field: str = "n_tok",
    source_field: str = "source",
) -> rd.Dataset:
    """Deterministic UniMax corpus sampling: compute per-source token
    budgets with :func:`unimax_allocation` (total budget =
    ``budget_factor`` × corpus tokens), then give every doc
    ``alloc // c`` full epochs plus one more iff
    ``hash(doc_id) * c < 2^32 * (alloc mod c)`` — an exact-integer
    fractional-epoch lottery (hash-stable across runs, shards and
    cluster sizes). Low-resource sources are upsampled to at most
    ``max_epochs`` passes, high-resource sources are downsampled to
    the uniform share: the fairness curve UniMax prescribes.

    Distributed shape: one tiny per-source count aggregate (#sources
    rows to the driver, corpus-size independent), allocation closed
    form on the driver, then a single broadcast-lookup ``map_batches``
    pass — no shuffle of the corpus itself. Per-source thresholds are
    Python big-int floor divisions, so there is no overflow at any
    corpus size.

    Returns Dataset[(id, source, n_tok, n_epochs:int64)] with
    ``n_epochs >= 1`` (docs drawing 0 epochs are dropped)."""

    def partial(t: pa.Table) -> pa.Table:
        srcs = t[source_field]
        cnts = t[count_field]
        g = pa.table({"s": srcs, "c": cnts}).group_by("s").aggregate([("c", "sum")])
        return pa.table({source_field: g["s"], "c": g["c_sum"]})

    counts_tbl = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(source_field)
        .sum("c")
        .take_all()  # #sources rows — tiny by construction
    )
    counts = {r[source_field]: int(r["sum(c)"]) for r in counts_tbl}
    total = sum(counts.values())
    alloc = unimax_allocation(
        counts, int(budget_factor) * total, max_epochs
    )
    sources = sorted(counts)
    n_full = np.array([alloc[s] // counts[s] for s in sources], np.int64)
    # extra epoch iff h <= (2^32 * rem - 1) // c  (⟺ h*c < 2^32*rem)
    thr = np.array(
        [
            ((1 << 32) * (alloc[s] % counts[s]) - 1) // counts[s]
            for s in sources
        ],
        np.int64,
    )
    src_set = pa.array(sources, pa.string())

    def assign(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t[source_field], value_set=src_set).to_numpy(
            zero_copy_only=False
        )
        h = _doc_hash(t, UNIMAX_MULT, id_field).astype(np.int64)
        n = n_full[idx] + (h <= thr[idx])
        out = pa.table(
            {
                id_field: t[id_field],
                source_field: t[source_field],
                count_field: t[count_field],
                "n_epochs": pa.array(n, pa.int64()),
            }
        )
        return out.filter(pa.array(n > 0))

    return ds.map_batches(assign, batch_format="pyarrow")


def preference_pairs(
    ds: rd.Dataset,
    group_field: str = "prompt_id",
    score_field: str = "score",
    id_field: str = "doc_id",
    margin: float = 0.0,
    num_buckets: int = 64,
) -> rd.Dataset:
    """DPO/RLHF preference-pair construction: per prompt group, emit
    ONE (chosen, rejected) pair — the highest-scoring candidate vs the
    lowest-scoring one — iff the score gap reaches ``margin``. The
    reward-model / DPO data-prep step that turns scored candidate pools
    into training pairs.

    Tie rule (both sides): equal scores resolve to the SMALLER id, so
    the output is deterministic at any partitioning and matches a SQL
    ``ROW_NUMBER() OVER (ORDER BY score DESC|ASC, id ASC)`` oracle.
    Null and NaN scores are dropped (a pair built from a non-score is
    meaningless; SQL ranks NaN above everything, which no caller
    wants), and rows with a null group key are dropped (a candidate
    needs a prompt). Groups whose chosen and rejected collapse to the
    same row (single candidate, or all scores equal with margin 0) are
    dropped.

    Distributed shape: two-phase argmax/argmin. Phase 1 collapses each
    BLOCK to at most one candidate row per group present in it (local
    best + local worst packed side by side), so the single hash
    exchange moves O(groups-per-block × blocks) rows — never the
    corpus. Phase 2 buckets groups by hash (one bucket of groups per
    worker, ``num_buckets`` sizes the worker heap) and resolves global
    winners with one lexsort + run detection across the whole bucket —
    no per-group Python.

    Returns Dataset[(group, chosen_id, rejected_id, chosen_score,
    rejected_score, gap:float64)].
    """
    from vector_ray.stages import shuffle as _shuffle

    def partial(t: pa.Table) -> pa.Table:
        score = t[score_field]
        if isinstance(score, pa.ChunkedArray):
            score = score.combine_chunks()
        # drop null/NaN scores and null group keys up front: NaN keys
        # would each become their own run (NaN != NaN) and a null int
        # key poisons the whole block via the float64 round-trip
        fscore = pc.cast(score, pa.float64())
        valid = pc.and_kleene(
            pc.and_kleene(
                pc.is_valid(score), pc.invert(pc.is_nan(fscore))
            ),
            pc.is_valid(t[group_field]),
        )
        valid = pc.fill_null(valid, False)
        if not pc.all(valid).as_py():
            t = t.filter(valid)
            score = t[score_field]
            if isinstance(score, pa.ChunkedArray):
                score = score.combine_chunks()
        gcol = t[group_field]
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        icol = t[id_field]
        if isinstance(icol, pa.ChunkedArray):
            icol = icol.combine_chunks()
        if t.num_rows == 0:
            return pa.table(
                {
                    group_field: pa.array([], gcol.type),
                    "__b_id": pa.array([], icol.type),
                    "__b_score": pa.array([], pa.float64()),
                    "__w_id": pa.array([], icol.type),
                    "__w_score": pa.array([], pa.float64()),
                }
            )
        s = pc.cast(score, pa.float64()).to_numpy(zero_copy_only=False)
        g = np.asarray(gcol)
        i = np.asarray(icol)
        # ascending (group, score, id): run start = local worst per
        # group; for the local best, flip score only — run start of
        # (group, -score, id) = max score, min id among ties
        worst_order = np.lexsort((i, s, g))
        best_order = np.lexsort((i, -s, g))
        gw = g[worst_order]
        starts = np.flatnonzero(np.concatenate([[True], gw[1:] != gw[:-1]]))
        w_idx = worst_order[starts]
        b_idx = best_order[starts]  # same group runs: g sorts identically
        return pa.table(
            {
                group_field: pa.array(g[w_idx], gcol.type),
                "__b_id": pa.array(i[b_idx], icol.type),
                "__b_score": pa.array(s[b_idx], pa.float64()),
                "__w_id": pa.array(i[w_idx], icol.type),
                "__w_score": pa.array(s[w_idx], pa.float64()),
            }
        )

    def resolve(bucket: pa.Table) -> pa.Table:
        bucket = bucket.drop_columns([_shuffle.BUCKET_COLUMN])
        gtype = bucket.schema.field(group_field).type
        itype = bucket.schema.field("__b_id").type
        g = np.asarray(bucket[group_field].combine_chunks())
        bi = np.asarray(bucket["__b_id"].combine_chunks())
        bs = np.asarray(bucket["__b_score"].combine_chunks())
        wi = np.asarray(bucket["__w_id"].combine_chunks())
        ws = np.asarray(bucket["__w_score"].combine_chunks())
        worst_order = np.lexsort((wi, ws, g))
        best_order = np.lexsort((bi, -bs, g))
        gw = g[worst_order]
        starts = np.flatnonzero(np.concatenate([[True], gw[1:] != gw[:-1]]))
        w_idx = worst_order[starts]
        b_idx = best_order[starts]
        gap = bs[b_idx] - ws[w_idx]
        keep = (bi[b_idx] != wi[w_idx]) & (gap >= margin)
        return pa.table(
            {
                group_field: pa.array(g[w_idx][keep], gtype),
                "chosen_id": pa.array(bi[b_idx][keep], itype),
                "rejected_id": pa.array(wi[w_idx][keep], itype),
                "chosen_score": pa.array(bs[b_idx][keep], pa.float64()),
                "rejected_score": pa.array(ws[w_idx][keep], pa.float64()),
                "gap": pa.array(gap[keep], pa.float64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    bucketed = _shuffle.hash_bucket(partials, group_field, num_buckets)
    return bucketed.groupby(_shuffle.BUCKET_COLUMN).map_groups(
        resolve, batch_format="pyarrow"
    )


def fold_assign(ds: rd.Dataset, n_folds: int = 5,
                id_field: str = "doc_id") -> rd.Dataset:
    """Leakage-free k-fold cross-validation assignment: ``fold =
    hash(id) % n_folds`` with the same multiplicative split hash as
    ``split_assign`` (a doc's fold never collides with its train/val
    split semantics — the mod-1000 val rule and the mod-k fold rule
    read different residues of the same uniform hash). Hash-based, so
    folds survive repartitioning and incremental corpus growth; narrow
    pass, exact mod-2^32 parity with SQL at any id scale."""
    if n_folds < 2:
        raise ValueError("fold_assign: n_folds must be >= 2")

    def assign(t: pa.Table) -> pa.Table:
        fold = (_doc_hash(t, SPLIT_MULT) % n_folds).astype(np.int64)
        return t.append_column("fold", pa.array(fold, pa.int64()))

    return ds.map_batches(assign, batch_format="pyarrow")
