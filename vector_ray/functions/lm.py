"""Corpus language-model quality scoring (CCNet-style perplexity
filter): train an add-one-smoothed unigram LM over the whole corpus,
then score every document by mean negative log-likelihood. Low-NLL
documents look like the corpus; high-NLL documents are outliers —
the standard "LM filter" step of web-scale pretraining pipelines
(CCNet uses a KenLM 5-gram; the unigram variant keeps the same
two-phase distributed shape with an exactly SQL-reproducible model).

Distributed shape (100 TB path):
  1. word counts: per-batch ``np.unique`` partials -> small groupby sum
     (the shuffle carries one row per distinct word per block, never
     raw tokens);
  2. vocabulary: top-``vocab_size`` words by (count desc, word asc) —
     a bounded sort+limit on the counts table, NOT the corpus;
  3. scoring: the (word -> count) table is broadcast once via
     ``ray.put`` and fetched once per actor; each batch scores
     vectorized (unique words per batch -> dict lookup per UNIQUE,
     ``np.add.reduceat`` per document).

Word definition matches DuckDB ``string_split(text, ' ')`` so the SQL
oracle reproduces the model bit-for-bit (see oracle in
``entry_queries``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data.aggregate import Sum

from vector_ray.schema import round_sql_np


def _word_lists(t: pa.Table, field: str) -> pa.Array:
    col = t[field]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    words = pc.split_pattern(col, " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    return words


def word_counts(ds, field: str = "text"):
    """Dataset of (word, n) over the corpus — two-phase (per-batch
    ``np.unique`` partial, then one small groupby sum over distinct
    words)."""

    def partial(t: pa.Table) -> pa.Table:
        words = _word_lists(t, field)
        flat = words.flatten()
        u, c = np.unique(np.asarray(flat, dtype=object), return_counts=True)
        return pa.table(
            {"word": pa.array(u, pa.string()), "n": pa.array(c, pa.int64())}
        )

    counts = ds.map_batches(partial, batch_format="pyarrow")
    return counts.groupby("word").aggregate(Sum("n", alias_name="n"))


def unigram_model(ds, field: str = "text", vocab_size: int = 30):
    """(vocab dict word->count, total_tokens, vocab_size). The counts
    table is materialized once (bounded by distinct-word count — the
    word-count table itself, spillable); vocabulary selection is a
    sort+limit over that small table with the deterministic tie rule
    (count desc, word asc) the SQL oracle uses."""
    counts = word_counts(ds, field).materialize()
    total = int(counts.sum("n"))
    top = (
        counts.sort(key=["n", "word"], descending=[True, False])
        .limit(vocab_size)
        .take_all()
    )
    vocab = {r["word"]: int(r["n"]) for r in top}
    return vocab, total, vocab_size


class LmScorer:
    """Actor-pool callable: add-one-smoothed unigram NLL per document.

    p(w) = (c_w + 1) / (N + V + 1) for vocabulary words, and
    (0 + 1) / (N + V + 1) for out-of-vocabulary words (the +1 mass is
    uniform, so OOV is just c_w = 0). Score = -mean(log p) over the
    document's words; lower = more corpus-like.
    """

    def __init__(self, model_ref, field: str = "text", target: str = "nll",
                 round_to: int = 4):
        vocab, total, vsize = (
            ray.get(model_ref) if not isinstance(model_ref, tuple) else model_ref
        )
        self.vocab = vocab
        self.log_denom = float(np.log(total + vsize + 1.0))
        self.field = field
        self.target = target
        self.round_to = round_to

    def __call__(self, batch: pa.Table) -> pa.Table:
        words = _word_lists(batch, self.field)
        flat = np.asarray(words.flatten(), dtype=object)
        # recompute starts from lengths: a sliced ListArray's raw offsets
        # index the PARENT values buffer, not the flattened copy
        lens = np.asarray(pc.list_value_length(words), dtype=np.int64)
        if len(flat):
            uniq, inv = np.unique(flat, return_inverse=True)
            # python lookup per UNIQUE word only, never per token
            ulogp = np.array(
                [np.log(self.vocab.get(w, 0) + 1.0) for w in uniq],
                dtype=np.float64,
            ) - self.log_denom
            logp = ulogp[inv]
            starts = np.concatenate([[0], np.cumsum(lens[:-1])])
            # reduceat misbehaves on empty segments; documents always
            # have >= 1 word (split of "" is [""]), enforced here
            if (lens == 0).any():
                raise ValueError("empty word list: null text upstream?")
            sums = np.add.reduceat(logp, starts)
            nll = -(sums / lens)
        else:
            nll = np.zeros(0)
        # pre-round through 9 digits so the final 4-digit round can't
        # disagree with the SQL oracle on a boundary ulp
        nll = round_sql_np(round_sql_np(nll, 9), self.round_to)
        return batch.append_column(self.target, pa.array(nll, pa.float64()))


def lm_score(ds, field: str = "text", vocab_size: int = 30,
             concurrency=(1, 4), model=None):
    """Full pipeline: train the corpus unigram LM (two passes over the
    corpus: counts + scoring), broadcast it, score every document."""
    if model is None:
        model = unigram_model(ds, field, vocab_size)
    model_ref = ray.put(model)
    return ds.map_batches(
        LmScorer,
        fn_constructor_kwargs={"model_ref": model_ref, "field": field},
        batch_format="pyarrow",
        concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# token-level variant: dense-vocabulary unigram LM over the tokenized
# corpus (the 100 TB path — integer ids, no string hashing, counts as
# one dense vector per block)
# ---------------------------------------------------------------------------


def token_counts_dense(ds, field: str = "tokens") -> np.ndarray:
    """Global dense token-count vector via the same shuffle-free tree
    reduction as ``tokens.token_topk``: one ``np.bincount`` row per
    block, merged elementwise by block-coalescing ``dense_vector_merge``
    (no all-to-all); the driver sees at most ceil(blocks/4096) rows of
    VOCAB_SIZE int64 — corpus-size independent."""
    from vector_ray.functions.tokens import _flat_tokens, dense_vector_merge
    from vector_ray.schema import VOCAB_SIZE

    def partial(t: pa.Table) -> pa.Table:
        values, _ = _flat_tokens(t, field)
        counts = np.bincount(values, minlength=VOCAB_SIZE).astype(np.int64)
        if len(counts) > VOCAB_SIZE:
            raise ValueError(
                f"token id >= VOCAB_SIZE ({len(counts) - 1} >= {VOCAB_SIZE})"
            )
        return pa.table({"cnt": pa.array([counts], pa.list_(pa.int64()))})

    merged = dense_vector_merge(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        VOCAB_SIZE,
    ).take_all()
    total = np.zeros(VOCAB_SIZE, dtype=np.int64)
    for r in merged:
        total += np.asarray(r["cnt"], dtype=np.int64)
    return total


def token_lm_score(ds, field: str = "tokens", target: str = "nll",
                   round_to: int = 4):
    """Two-pass corpus LM scoring over tokenized sequences: dense
    counts (tree reduction), one 8·VOCAB_SIZE-byte broadcast of the
    log-prob vector, then vectorized per-sequence NLL.

    p(t) = (c_t + 1) / (N + VOCAB_SIZE); scoring is pure array
    indexing (``logp[token_ids]``) + ``np.add.reduceat`` — no hashing,
    no dictionary. Rows with zero tokens are dropped (unscorable; the
    SQL GROUP BY drops them identically). The scorer holds no state
    beyond the broadcast vector, so it runs as a TASK pool on whole
    blocks (per-task ``ray.get`` of the ref is a zero-copy local
    object-store read) — no actor-pool spin-up on the scan."""
    from vector_ray.schema import VOCAB_SIZE

    counts = token_counts_dense(ds, field)
    n_total = int(counts.sum())
    logp = np.log(counts + 1.0) - np.log(n_total + float(VOCAB_SIZE))
    logp_ref = ray.put(logp)

    def score(batch: pa.Table) -> pa.Table:
        from vector_ray.functions.tokens import _flat_tokens

        lp = ray.get(logp_ref)
        values, offsets = _flat_tokens(batch, field)
        lens = np.diff(offsets)
        nonempty = lens > 0
        if not nonempty.all():
            batch = batch.filter(pa.array(nonempty))
            values, offsets = _flat_tokens(batch, field)
            lens = np.diff(offsets)
        if len(values):
            # reduceat's LAST segment runs to the end of the array: trim
            # the values buffer to the final offset in case the arrow
            # array is a slice whose parent buffer extends past it
            sums = np.add.reduceat(lp[values[: offsets[-1]]], offsets[:-1])
            nll = -(sums / lens)
        else:
            nll = np.zeros(0)
        nll = round_sql_np(round_sql_np(nll, 9), round_to)
        return batch.append_column(target, pa.array(nll, pa.float64()))

    return ds.map_batches(score, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# DSIR-style importance scoring (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling"): score every corpus
# document by mean per-word log-likelihood RATIO between a target-domain
# unigram LM and the corpus unigram LM. Higher = more target-like.
# Same distributed shape as lm_score: two count passes (each a tiny
# shuffle of per-block word partials), ONE broadcast of both models,
# one vectorized scoring pass.
# ---------------------------------------------------------------------------


class DsirScorer:
    """Actor-pool callable: per-document mean(log p_target - log p_corpus)
    with the same add-one unigram construction as LmScorer (so both legs
    are SQL-reproducible)."""

    def __init__(self, models_ref, field: str = "text",
                 target: str = "logratio", round_to: int = 4):
        tgt, cor = ray.get(models_ref)
        tvocab, ttotal, tvsize = tgt
        cvocab, ctotal, cvsize = cor
        self.tvocab, self.cvocab = tvocab, cvocab
        self.t_denom = float(np.log(ttotal + tvsize + 1.0))
        self.c_denom = float(np.log(ctotal + cvsize + 1.0))
        self.field = field
        self.target = target
        self.round_to = round_to

    def __call__(self, batch: pa.Table) -> pa.Table:
        words = _word_lists(batch, self.field)
        flat = np.asarray(words.flatten(), dtype=object)
        lens = np.asarray(pc.list_value_length(words), dtype=np.int64)
        if len(flat):
            uniq, inv = np.unique(flat, return_inverse=True)
            ulr = np.array(
                [
                    (np.log(self.tvocab.get(w, 0) + 1.0) - self.t_denom)
                    - (np.log(self.cvocab.get(w, 0) + 1.0) - self.c_denom)
                    for w in uniq
                ],
                dtype=np.float64,
            )
            lr = ulr[inv]
            if (lens == 0).any():
                raise ValueError("empty word list: null text upstream?")
            starts = np.concatenate([[0], np.cumsum(lens[:-1])])
            score = np.add.reduceat(lr, starts) / lens
        else:
            score = np.zeros(0)
        score = round_sql_np(round_sql_np(score, self.round_to + 5),
                             self.round_to)
        return batch.append_column(
            self.target, pa.array(score, pa.float64())
        )


def dsir_score(ds, target_ds, field: str = "text", vocab_size: int = 30,
               concurrency=(1, 4)):
    """Score ``ds`` documents by target-vs-corpus importance log-ratio.
    ``target_ds`` is the (usually much smaller) target-domain sample;
    both unigram models are built distributed and broadcast once."""
    tgt = unigram_model(target_ds, field, vocab_size)
    cor = unigram_model(ds, field, vocab_size)
    models_ref = ray.put((tgt, cor))
    return ds.map_batches(
        DsirScorer,
        fn_constructor_kwargs={"models_ref": models_ref, "field": field},
        batch_format="pyarrow",
        concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# per-source token-distribution drift: KL(p_source || p_corpus) over the
# dense token vocabulary — the "did one source's token mix shift away
# from the corpus" monitor (mixture rebalancing, ingestion regression
# detection). One pass: each batch emits one dense count vector PER
# DISTINCT SOURCE in the batch (sources are few; vector is VOCAB_SIZE
# int64 ≈ 400 KB), a per-source groupby sums them, and the driver sees
# only |sources| rows — never the corpus.
# ---------------------------------------------------------------------------


def source_token_drift(
    ds, field: str = "tokens", key: str = "source", round_to: int = 4
) -> pa.Table:
    """Returns a tiny driver-side table (key, n_tokens, kl) where
    kl = Σ_t p(t|key)·ln(p(t|key)/p(t)), summed over tokens present in
    the source (matches the SQL oracle's join-on-present-terms shape)."""
    from vector_ray.functions.tokens import _flat_tokens
    from vector_ray.schema import VOCAB_SIZE, round_sql_np

    def partial(t: pa.Table) -> pa.Table:
        values, offsets = _flat_tokens(t, field)
        keys = t[key]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        lens = np.diff(offsets)
        denc = keys.dictionary_encode()
        codes = denc.dictionary.to_pylist()
        inv = denc.indices.to_numpy(zero_copy_only=False)
        row_src = np.repeat(inv.astype(np.int64), lens)
        combined = row_src * VOCAB_SIZE + values.astype(np.int64)
        counts = np.bincount(
            combined, minlength=len(codes) * VOCAB_SIZE
        ).reshape(len(codes), VOCAB_SIZE)
        return pa.table(
            {
                key: pa.array(codes, pa.string()),
                "cnt": pa.array(list(counts), pa.list_(pa.int64())),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        flat = group["cnt"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False
        )
        summed = flat.reshape(group.num_rows, VOCAB_SIZE).sum(axis=0)
        return pa.table(
            {
                key: group[key].slice(0, 1),
                "cnt": pa.array([summed], pa.list_(pa.int64())),
            }
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key)
        .map_groups(merge, batch_format="pyarrow")
    )
    rows = [
        t
        for t in ray.get(merged.materialize().to_arrow_refs())
        if t.num_rows
    ]
    per = pa.concat_tables(rows) if rows else pa.table(
        {key: pa.array([], pa.string()), "cnt": pa.array([], pa.list_(pa.int64()))}
    )
    names = per[key].to_pylist()
    mats = [
        np.asarray(per["cnt"][i].as_py(), dtype=np.int64)
        for i in range(per.num_rows)
    ]
    order = np.argsort(np.asarray(names, dtype=object), kind="stable")
    names = [names[i] for i in order]
    mats = [mats[i] for i in order]
    glob = np.sum(mats, axis=0) if mats else np.zeros(VOCAB_SIZE, np.int64)
    n_glob = float(glob.sum())
    out_n, out_kl = [], []
    for m in mats:
        ns = float(m.sum())
        nz = m > 0
        p = m[nz] / ns
        q = glob[nz] / n_glob
        kl = float(np.sum(p * np.log(p / q)))
        out_n.append(int(ns))
        out_kl.append(kl)
    return pa.table(
        {
            key: pa.array(names, pa.string()),
            "n_tokens": pa.array(out_n, pa.int64()),
            "kl": pa.array(
                round_sql_np(round_sql_np(np.asarray(out_kl, np.float64), 9),
                             round_to),
                pa.float64(),
            ),
        }
    )


# ---------------------------------------------------------------------------
# byte-level bigram LM scoring (CCNet-style conditional-perplexity
# filter, one level up from the unigram `token_lm_score`). Token ids
# are projected to bytes (% 256) so the conditional count table is a
# dense 256×256 int64 matrix — small enough to tree-reduce exactly and
# broadcast whole. At full-vocab bigram scale the dense matrix is
# infeasible (vocab² × 8 B); the named alternative is sparse pair-count
# partials + stages/shuffle.bucketed_join of per-position pair keys
# against the count table, regrouped per doc (same plan shape as
# functions/bpe pair counting).
# ---------------------------------------------------------------------------


def bigram_counts_dense(ds, field: str = "tokens") -> np.ndarray:
    """Global 256×256 byte-bigram count matrix: one dense
    ``np.bincount`` row per block (pairs never cross row boundaries),
    merged elementwise by the shuffle-free ``dense_vector_merge`` —
    O(65536 × surviving rows) bytes to the driver, corpus-size
    independent."""
    from vector_ray.functions.tokens import _flat_tokens, dense_vector_merge

    B = 256 * 256

    def partial(t: pa.Table) -> pa.Table:
        values, offsets = _flat_tokens(t, field)
        b = values.astype(np.int64) % 256
        if len(b) >= 2:
            lens = np.diff(offsets)
            row_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
            ok = row_of[:-1] == row_of[1:]
            keys = b[:-1][ok] * 256 + b[1:][ok]
            counts = np.bincount(keys, minlength=B).astype(np.int64)
        else:
            counts = np.zeros(B, dtype=np.int64)
        return pa.table({"cnt": pa.array([counts], pa.list_(pa.int64()))})

    merged = dense_vector_merge(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None), B
    ).take_all()
    total = np.zeros(B, dtype=np.int64)
    for r in merged:
        total += np.asarray(r["cnt"], dtype=np.int64)
    return total.reshape(256, 256)


def bigram_lm_score(ds, field: str = "tokens", target: str = "nll",
                    round_to: int = 4):
    """Two-pass byte-bigram scoring: P(cur | prev) with add-one
    smoothing = (c2[prev, cur] + 1) / (rowsum(c2[prev]) + 256); per-doc
    score = mean −log P over the doc's len−1 transitions. Docs with
    fewer than 2 tokens are unscorable and dropped (the SQL GROUP BY
    over transitions drops them identically)."""
    c2 = bigram_counts_dense(ds, field)
    logp = np.log(c2 + 1.0) - np.log(
        c2.sum(axis=1, keepdims=True) + 256.0
    )
    return _bigram_score_with_logp(ds, logp, field, target, round_to)


def kn_bigram_score(ds, field: str = "tokens", target: str = "nll_kn",
                    discount: float = 0.75, round_to: int = 4):
    """Interpolated Kneser–Ney byte-bigram scoring (the classic LM
    smoothing one level past add-one): for an observed pair,

        P(cur|prev) = (c2 − d)/c1  +  d·N1+(prev,·)/c1 · Pcont(cur)
        Pcont(cur)  = N1+(·,cur) / |{(pv,cu): c2 > 0}|

    with absolute discount ``d``. Every pair scored comes from the same
    corpus the counts were taken from, so c2 ≥ 1 and no zero branch is
    needed. Same two-pass dense-matrix plan as ``bigram_lm_score``;
    arithmetic mirrors the SQL oracle expression term-for-term so the
    float64 results round identically. Docs with < 2 tokens drop."""
    c2 = bigram_counts_dense(ds, field).astype(np.float64)
    c1 = c2.sum(axis=1, keepdims=True)
    nf = (c2 > 0).sum(axis=1, keepdims=True).astype(np.float64)
    nr = (c2 > 0).sum(axis=0, keepdims=True).astype(np.float64)
    tt = float((c2 > 0).sum())
    with np.errstate(divide="ignore", invalid="ignore"):
        p = (c2 - discount) / c1 + discount * nf / c1 * (nr / tt)
        logp = np.log(p)
    return _bigram_score_with_logp(ds, logp, field, target, round_to)


def _bigram_score_with_logp(ds, logp: np.ndarray, field: str, target: str,
                            round_to: int):
    """Shared second pass: broadcast a dense 256×256 log-prob table and
    compute each doc's mean −log P over its within-row transitions."""
    logp_ref = ray.put(logp.reshape(-1))

    def score(batch: pa.Table) -> pa.Table:
        from vector_ray.functions.tokens import _flat_tokens

        lp = ray.get(logp_ref)
        values, offsets = _flat_tokens(batch, field)
        lens = np.diff(offsets)
        scorable = lens >= 2
        if not scorable.all():
            batch = batch.filter(pa.array(scorable))
            values, offsets = _flat_tokens(batch, field)
            lens = np.diff(offsets)
        if len(values):
            b = values[: offsets[-1]].astype(np.int64) % 256
            row_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
            ok = row_of[:-1] == row_of[1:]
            per_pos = np.where(ok, lp[b[:-1] * 256 + b[1:]], 0.0)
            # segment sums over transition positions: reduceat at each
            # row's first transition (== the row's start offset)
            sums = np.add.reduceat(
                np.append(per_pos, 0.0), offsets[:-1]
            )
            nll = -(sums / (lens - 1))
        else:
            nll = np.zeros(0)
        nll = round_sql_np(round_sql_np(nll, 9), round_to)
        return batch.append_column(target, pa.array(nll, pa.float64()))

    return ds.map_batches(score, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# heavy hitters — exact top-k over an UNBOUNDED key domain
# ---------------------------------------------------------------------------
#
# token_topk handles bounded vocabularies with a dense bincount; this is
# the companion for unbounded domains (words, URLs, user agents) at
# 100 TB, where a full groupby would shuffle one row per occurrence.
# Classic two-pass shape (Misra–Gries candidates + exact verify):
#
#   pass 1  per-batch Misra–Gries summary: exact in-batch counts, then
#           subtract the (capacity+1)-th largest count d and keep the
#           positive remainder — a valid MG summary with ≤ capacity
#           counters whose per-key undercount is ≤ d. Each block ships
#           O(capacity) rows regardless of key cardinality.
#   merge   one small groupby-sum over the summaries (≤ capacity×blocks
#           rows); D = Σ per-batch d (exact, ≤ N/(capacity+1)).
#   prune   any key whose true count could still reach the k-th summed
#           counter (cnt + D ≥ kth) stays a candidate; MG guarantees
#           every key with true count > D is present.
#   pass 2  broadcast the candidate set, count ONLY candidates exactly,
#           take the true top-k by (count desc, key asc).
#
# Exactness is VERIFIED, not assumed: the result is provably the exact
# top-k iff the k-th exact candidate count exceeds every non-candidate's
# upper bound (D, or max-dropped-counter + D when the candidate set was
# capped). Zipf-shaped corpora pass easily at modest capacity; a uniform
# adversary flips the flag to False instead of silently lying.


def _mg_summary(
    u: np.ndarray, c: np.ndarray, capacity: int
) -> tuple[np.ndarray, np.ndarray, int]:
    """Misra-Gries summary of exact (key, count) pairs: subtract the
    (capacity+1)-th largest count d from everyone and keep positives —
    ≤ capacity counters, per-key undercount ≤ d (pure, testable)."""
    d = 0
    if len(u) > capacity:
        d = int(np.partition(c, len(c) - capacity - 1)[len(c) - capacity - 1])
        keep = c > d
        u, c = u[keep], c[keep] - d
    return u, c, d


def heavy_hitters(
    ds,
    field: str = "text",
    k: int = 20,
    capacity: int = 4096,
    max_candidates: int | None = None,
) -> tuple[pa.Table, bool]:
    """Exact (count desc, key asc) top-``k`` words of ``field`` without
    shuffling per-occurrence rows; returns ``(topk_table, provably_exact)``.
    Columns: word(string), n(int64)."""
    import ray.data as rd

    if max_candidates is None:
        max_candidates = max(capacity, 16 * k)

    def partial(t: pa.Table) -> pa.Table:
        flat = _word_lists(t, field).flatten()
        u, c = np.unique(np.asarray(flat, dtype=object), return_counts=True)
        u, c, d = _mg_summary(u, c, capacity)
        meta = pa.table(
            {
                "word": pa.array([""], pa.string()),
                "cnt": pa.array([d], pa.int64()),
                "meta": pa.array([1], pa.int8()),
            }
        )
        body = pa.table(
            {
                "word": pa.array(u, pa.string()),
                "cnt": pa.array(c.astype(np.int64), pa.int64()),
                "meta": pa.array(np.zeros(len(u), np.int8), pa.int8()),
            }
        )
        return pa.concat_tables([body, meta])

    summaries = ds.map_batches(partial, batch_format="pyarrow").materialize()
    big_d = sum(
        r["cnt"] for r in summaries.filter(expr="meta == 1").take_all()
    )
    merged = (
        summaries.filter(expr="meta == 0")
        .groupby("word")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .materialize()
    )
    topk_rows = merged.sort("cnt", descending=True).limit(k).take_all()
    kth = int(topk_rows[-1]["cnt"]) if len(topk_rows) >= k else 0
    cand = merged.filter(
        expr=f"cnt >= {max(kth - big_d, 1)}"
    ).take_all()
    cand.sort(key=lambda r: (-r["cnt"], r["word"]))
    dropped_upper = 0
    if len(cand) > max_candidates:
        dropped_upper = int(cand[max_candidates]["cnt"]) + big_d
        cand = cand[:max_candidates]
    cand_words = pa.array([r["word"] for r in cand], pa.string())
    cand_ref = ray.put(cand_words)

    def exact_partial(t: pa.Table) -> pa.Table:
        words = ray.get(cand_ref)
        flat = _word_lists(t, field).flatten()
        hit = flat.filter(pc.is_in(flat, value_set=words))
        u, c = np.unique(np.asarray(hit, dtype=object), return_counts=True)
        return pa.table(
            {
                "word": pa.array(u, pa.string()),
                "n": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    exact = (
        ds.map_batches(exact_partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
        .sort(["n", "word"], descending=[True, False])
        .limit(k)
    )
    tables = [t for t in ray.get(exact.materialize().to_arrow_refs()) if t.num_rows]
    top = (
        pa.concat_tables(tables)
        if tables
        else pa.table({"word": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
    )
    kth_exact = int(top["n"][top.num_rows - 1].as_py()) if top.num_rows >= k else 0
    provably_exact = kth_exact > max(big_d, dropped_upper)
    return top.select(["word", "n"]), provably_exact


# ---------------------------------------------------------------------------
# window-level perplexity segmentation: find garbage SPANS, not docs
# ---------------------------------------------------------------------------


def ppl_windows(
    ds,
    window: int = 32,
    threshold: float | None = None,
    field: str = "tokens",
    id_field: str = "doc_id",
    round_to: int = 4,
):
    """Span-level perplexity filter: score every non-overlapping window
    of ``window`` byte-bigram transitions under the corpus add-one
    bigram LM (same model as :func:`bigram_lm_score`) and, if
    ``threshold`` is given, flag high-NLL windows. Doc-level mean NLL
    hides a short garbage span inside a long clean doc; per-window NLL
    localizes it, which is how production curation pipelines excise
    boilerplate/binary junk instead of dropping whole documents.

    Two passes: the dense 256×256 count merge (driver cost O(65536),
    corpus-size independent), then one vectorized scoring pass —
    windows materialize as cumsum differences, no per-window loop, no
    shuffle. The final window of a doc may be short (its remaining
    transitions); docs with <2 tokens have no transitions and drop out.

    Returns Dataset[(id, win:int64, n_trans:int64, nll:float64
    [, flagged:bool])]."""
    from vector_ray.functions.tokens import _flat_tokens

    c2 = bigram_counts_dense(ds, field)
    logp = np.log(c2 + 1.0) - np.log(
        c2.sum(axis=1, keepdims=True) + 256.0
    )
    logp_ref = ray.put(logp.reshape(-1))
    W = int(window)

    def score(batch: pa.Table) -> pa.Table:
        lp = ray.get(logp_ref)
        values, offsets = _flat_tokens(batch, field)
        lens = np.diff(offsets)
        n_trans = np.maximum(lens - 1, 0)
        b = values.astype(np.int64) % 256
        row_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        ok = row_of[:-1] == row_of[1:] if len(b) else np.zeros(0, bool)
        trans = lp[b[:-1][ok] * 256 + b[1:][ok]] if len(b) else np.zeros(0)
        # per-row transition segment starts in the compacted array
        tstart = np.concatenate(([0], np.cumsum(n_trans)))[:-1]
        n_win = -(-n_trans // W)  # ceil
        total = int(n_win.sum())
        if total == 0:
            out = {
                id_field: pa.array([], batch.schema.field(id_field).type),
                "win": pa.array([], pa.int64()),
                "n_trans": pa.array([], pa.int64()),
                "nll": pa.array([], pa.float64()),
            }
            if threshold is not None:
                out["flagged"] = pa.array([], pa.bool_())
            return pa.table(out)
        win_row = np.repeat(np.arange(len(lens), dtype=np.int64), n_win)
        first = np.concatenate(([0], np.cumsum(n_win)))[:-1]
        wi = np.arange(total, dtype=np.int64) - np.repeat(first, n_win)
        starts = tstart[win_row] + wi * W
        ends = np.minimum(starts + W, tstart[win_row] + n_trans[win_row])
        csum = np.concatenate(([0.0], np.cumsum(trans)))
        n = ends - starts
        nll = -(csum[ends] - csum[starts]) / n
        nll = round_sql_np(round_sql_np(nll, 9), round_to)
        out = {
            id_field: batch[id_field].take(pa.array(win_row)),
            "win": pa.array(wi),
            "n_trans": pa.array(n),
            "nll": pa.array(nll, pa.float64()),
        }
        if threshold is not None:
            out["flagged"] = pa.array(nll > threshold)
        return pa.table(out)

    return ds.map_batches(score, batch_format="pyarrow", batch_size=None)
