"""Text-analysis stages for training-data pipelines: token counting,
quality scoring, language ID, content fingerprinting.

All are vectorized ``map_batches`` stages. The whitespace/word
definitions intentionally match DuckDB ``string_split(text, ' ')`` so
the SQL oracles can reproduce them exactly (see
``vector_ray.stages.tokenize``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# small deterministic stopword lists per language for the n-gram/stopword
# language-ID heuristic
STOPWORDS = {
    "en": {"the", "a", "of", "and", "to", "in", "is", "it", "that", "for"},
    "es": {"el", "la", "de", "y", "que", "en", "un", "es", "se", "no"},
    "fr": {"le", "la", "de", "et", "que", "en", "un", "est", "se", "ne"},
    "de": {"der", "die", "das", "und", "zu", "in", "ein", "ist", "nicht", "von"},
    "zh": set(),  # no-space script: detected by CJK codepoint ratio instead
}

QUALITY_STOPWORDS = sorted(STOPWORDS["en"])


def quality_features(
    t: pa.Table, field: str = "text", round_to: int = 4
) -> pa.Table:
    """Adds n_words, uniq_ratio, stop_ratio, quality_score.

    Definition (SQL-reproducible):
      n_words    = len(split(text, ' '))
      uniq_ratio = distinct(words) / n_words
      stop_ratio = |words ∩ english stopwords| / n_words
      score      = round(0.4*uniq_ratio + 0.3*(1-stop_ratio)
                         + 0.3*least(n_words,100)/100, 4)
    Vectorized with polars list expressions — no Python loop over rows.
    """
    import polars as pl

    texts = t[field]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    df = pl.DataFrame({"_t": pl.Series(texts)})
    words = pl.col("_t").str.split(" ")
    feats = df.select(
        words.list.len().alias("n_words"),
        (words.list.n_unique() / words.list.len()).alias("uniq_ratio"),
        (
            words.list.eval(pl.element().is_in(QUALITY_STOPWORDS)).list.sum()
            / words.list.len()
        ).alias("stop_ratio"),
    )
    n_words = feats["n_words"].to_numpy().astype(np.int64)
    uniq = feats["uniq_ratio"].to_numpy()
    stop = feats["stop_ratio"].to_numpy()
    from vector_ray.schema import round_sql_np

    raw = 0.4 * uniq + 0.3 * (1 - stop) + 0.3 * np.minimum(n_words, 100) / 100.0
    # double rounding (9 → 4 decimals): the multi-term float sum differs
    # from SQL's evaluation in the last ulp, which can land on opposite
    # sides of the half-boundary; both sides round through 9 decimals
    score = round_sql_np(round_sql_np(raw, 9), round_to)
    out = t
    for name, arr, typ in (
        ("n_words", n_words, pa.int64()),
        ("uniq_ratio", round_sql_np(uniq, round_to), pa.float64()),
        ("stop_ratio", round_sql_np(stop, round_to), pa.float64()),
        ("quality_score", score, pa.float64()),
    ):
        out = out.append_column(name, pa.array(arr, typ))
    return out


def quality(ds, field: str = "text"):
    return ds.map_batches(
        lambda t: quality_features(t, field), batch_format="pyarrow"
    )


class LangId:
    """Actor-pool language-ID stage: stopword-hit scoring per language,
    CJK-codepoint ratio for no-space scripts. Tables are precompiled once
    per actor in ``__init__`` (the stateful-stage pattern)."""

    def __init__(self, field: str = "text", target: str = "lang_pred"):
        self.field = field
        self.target = target
        self.langs = [l for l in STOPWORDS if STOPWORDS[l]]
        self.sets = [STOPWORDS[l] for l in self.langs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl

        texts = batch[self.field]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        df = pl.DataFrame({"_t": pl.Series(texts)})
        words = pl.col("_t").str.split(" ")
        exprs = [
            words.list.eval(pl.element().is_in(sorted(s))).list.sum().alias(l)
            for l, s in zip(self.langs, self.sets)
        ]
        cjk = (
            pl.col("_t")
            .str.count_matches(r"[一-鿿]")
            .alias("_cjk")
        )
        scores = df.select(*exprs, cjk, words.list.len().alias("_n"))
        mat = scores.select(self.langs).to_numpy()
        best = np.asarray(self.langs)[mat.argmax(axis=1)]
        no_hit = mat.max(axis=1) == 0
        best = np.where(no_hit, "und", best)
        cjk_ratio = scores["_cjk"].to_numpy() / np.maximum(
            scores["_n"].to_numpy(), 1
        )
        best = np.where(cjk_ratio > 0.2, "zh", best)
        return batch.append_column(self.target, pa.array(best, pa.string()))


def langid(ds, field: str = "text", concurrency: int = 4):
    return ds.map_batches(
        LangId,
        fn_constructor_kwargs={"field": field},
        batch_format="pyarrow",
        concurrency=(1, concurrency),
        num_cpus=1,
    )


def ngram_diversity(
    ds,
    n: int = 3,
    group_by: str = "source",
    field: str = "text",
    round_to: int = 6,
):
    """Per-slice n-gram diversity: distinct word n-grams / total word
    n-grams for each ``group_by`` value — the self-BLEU-style
    repetitiveness gate (a slice whose diversity collapses is template
    spam / boilerplate and gets down-weighted in the mixture).

    Plan: per batch, n-gram STRINGS are built vectorized (one split,
    n-1 shifted element-wise joins over the flat word array, row-
    boundary masked); the block emits (a) per-group total counts and
    (b) the block-DISTINCT (group, gram) pairs — the combiner — so the
    distinct shuffle carries each gram at most once per block. A small
    groupby dedups pairs globally, a second counts per group. Exact
    string grams (not hashes): the SQL oracle's COUNT(DISTINCT) must
    match bit-for-bit, and a 64-bit hash collision would silently
    undercount. At 100 TB swap gram strings for a 128-bit hash + the
    HLL sketch in functions/sketches.py (documented tradeoff)."""
    from ray.data.aggregate import Sum

    def grams_of(t: pa.Table):
        col = pc.fill_null(pc.cast(t[field], pa.string()), "")
        words = pc.split_pattern(col, " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        offsets = np.asarray(words.offsets, dtype=np.int64)
        lens = np.diff(offsets)
        total = len(flat)
        if total == 0:
            return None, None
        row_of = np.repeat(np.arange(t.num_rows, dtype=np.int64), lens)
        pos = np.arange(total, dtype=np.int64) - offsets[:-1][row_of]
        valid = pos <= lens[row_of] - n
        # build gram strings over the first total-(n-1) positions: the
        # j-th operand is the flat word array shifted by j
        m = total - (n - 1)
        if m <= 0:
            return None, None
        joined = flat.slice(0, m)
        for j in range(1, n):
            joined = pc.binary_join_element_wise(
                joined, flat.slice(j, m), " "
            )
        keep = valid[:m]
        groups = t[group_by].combine_chunks().take(
            pa.array(row_of[:m][keep])
        )
        grams = joined.filter(pa.array(keep))
        return groups, grams

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                group_by: pa.array([], pa.string()),
                "gram": pa.array([], pa.string()),
                "n_total": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        groups, grams = grams_of(t)
        if groups is None or len(grams) == 0:
            return empty
        pairs = pa.table({group_by: groups, "gram": grams})
        # block-level distinct pairs (combiner) + per-group totals
        dist = pairs.group_by([group_by, "gram"]).aggregate(
            [("gram", "count")]
        )
        totals = pairs.group_by([group_by]).aggregate([("gram", "count")])
        tot_map = dict(
            zip(
                totals[group_by].to_pylist(),
                totals["gram_count"].to_pylist(),
            )
        )
        # attach each group's block total to its FIRST pair row only
        # (loop over distinct GROUPS, not grams)
        first = np.zeros(dist.num_rows, np.int64)
        gcol_np = np.asarray(
            dist[group_by].to_numpy(zero_copy_only=False), object
        )
        uniq, first_idx = np.unique(gcol_np.astype(str), return_index=True)
        for g_str, idx in zip(uniq, first_idx):
            first[idx] = tot_map[gcol_np[idx]]
        return pa.table(
            {
                group_by: dist[group_by],
                "gram": dist["gram"],
                "n_total": pa.array(first, pa.int64()),
            }
        )

    pairs = ds.map_batches(partial, batch_format="pyarrow")
    # dedup pairs globally, carrying the block totals through a sum
    merged = pairs.groupby([group_by, "gram"]).aggregate(
        Sum("n_total", alias_name="n_total")
    )

    def finish_partial(t: pa.Table) -> pa.Table:
        g = t.group_by([group_by]).aggregate(
            [("gram", "count"), ("n_total", "sum")]
        )
        return pa.table(
            {
                group_by: g[group_by],
                "n_distinct": pc.cast(g["gram_count"], pa.int64()),
                "n_grams": pc.cast(g["n_total_sum"], pa.int64()),
            }
        )

    per_group = (
        merged.map_batches(finish_partial, batch_format="pyarrow")
        .groupby(group_by)
        .sum(["n_distinct", "n_grams"])
    )

    def finish(t: pa.Table) -> pa.Table:
        from vector_ray.schema import round_sql_np

        nd = np.asarray(
            t["sum(n_distinct)"].to_numpy(zero_copy_only=False), np.float64
        )
        ng = np.asarray(
            t["sum(n_grams)"].to_numpy(zero_copy_only=False), np.float64
        )
        div = round_sql_np(round_sql_np(nd / ng, 9), round_to)
        return pa.table(
            {
                group_by: t[group_by],
                "n_grams": pc.cast(t["sum(n_grams)"], pa.int64()),
                "n_distinct": pc.cast(t["sum(n_distinct)"], pa.int64()),
                "diversity": pa.array(div, pa.float64()),
            }
        )

    return per_group.map_batches(finish, batch_format="pyarrow")


_TRACKING_PREFIXES = ("utm_", "fbclid=", "gclid=", "msclkid=")


def canonical_url(
    t: pa.Table, field: str = "url", target: str = "canonical_url"
) -> pa.Table:
    """Canonicalize a URL column — the dedupe-by-URL primitive every
    web-corpus pipeline runs before content dedup:

    * scheme and host lowercased; default port (:80 http / :443 https)
      stripped;
    * fragment removed;
    * tracking parameters dropped (utm_*, fbclid, gclid, msclkid);
    * remaining query parameters SORTED (codepoint order), so
      param-order permutations collide;
    * trailing path slash removed (except the bare root path).

    Fully vectorized: one regex decomposition (pc.extract_regex), one
    flat param split + starts_with filter, one lexsort over (row,
    param), one list rebuild + join, one element-wise reassembly — no
    Python row loop. Rows that do not parse as absolute URLs pass
    through unchanged (null-safe)."""
    col = t[field]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    s = pc.fill_null(pc.cast(col, pa.string()), "")
    parts = pc.extract_regex(
        s,
        r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://(?P<host>[^/?#]*)"
        r"(?P<path>[^?#]*)(?:\?(?P<query>[^#]*))?(?:#.*)?$",
    )
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    ok = pc.is_valid(parts)
    n = t.num_rows
    scheme = pc.fill_null(
        pc.utf8_lower(pc.struct_field(parts, "scheme")), ""
    )
    host = pc.fill_null(pc.utf8_lower(pc.struct_field(parts, "host")), "")
    path = pc.fill_null(pc.struct_field(parts, "path"), "")
    query = pc.fill_null(pc.struct_field(parts, "query"), "")
    # strip default ports (element-wise conditional suffix removal)
    for sch, port in (("http", ":80"), ("https", ":443")):
        hit = pc.and_(pc.equal(scheme, sch), pc.ends_with(host, port))
        stripped = pc.utf8_replace_slice(
            host, start=-len(port), stop=2**30, replacement=""
        )
        host = pc.if_else(hit, stripped, host)
    # trailing path slash (keep the bare "/" root)
    slash = pc.and_(
        pc.ends_with(path, "/"), pc.greater(pc.utf8_length(path), 1)
    )
    path = pc.if_else(
        slash,
        pc.utf8_replace_slice(path, start=-1, stop=2**30, replacement=""),
        path,
    )
    # query params: split, drop tracking + empties, sort, rejoin
    plists = pc.split_pattern(query, "&")
    if isinstance(plists, pa.ChunkedArray):
        plists = plists.combine_chunks()
    flat = plists.flatten()
    offsets = np.asarray(plists.offsets, dtype=np.int64)
    lens = np.diff(offsets)
    row_of = np.repeat(np.arange(n, dtype=np.int64), lens)
    keep = ~np.asarray(
        pc.equal(flat, pa.scalar("")).to_numpy(zero_copy_only=False)
    )
    for pref in _TRACKING_PREFIXES:
        keep &= ~np.asarray(
            pc.starts_with(flat, pref).to_numpy(zero_copy_only=False)
        )
    flat_np = np.asarray(flat.to_numpy(zero_copy_only=False), object)[keep]
    rows_k = row_of[keep]
    order = np.lexsort((flat_np.astype(str), rows_k)) if len(rows_k) else []
    flat_sorted = flat_np[order] if len(rows_k) else flat_np
    rows_sorted = rows_k[order] if len(rows_k) else rows_k
    counts = np.bincount(rows_sorted, minlength=n) if n else np.zeros(0, np.int64)
    new_off = np.zeros(n + 1, np.int32)
    np.cumsum(counts, out=new_off[1:])
    qs = pc.binary_join(
        pa.ListArray.from_arrays(
            pa.array(new_off), pa.array(flat_sorted, pa.string())
        ),
        "&",
    )
    canon = pc.binary_join_element_wise(
        scheme, "://", host, path,
        pc.if_else(
            pc.greater(pc.utf8_length(qs), 0),
            pc.binary_join_element_wise("?", qs, ""),
            "",
        ),
        "",
    )
    out = pc.if_else(ok, canon, s)
    # null input rows stay NULL (not ""): fill_null above exists only so
    # the regex kernel runs; collapsing nulls to "" would make every
    # null-URL row collide in downstream dedupe-by-URL
    out = pc.if_else(pc.is_null(col), pa.scalar(None, pa.string()), out)
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    return t.append_column(target, out)


def fingerprint_md5(t: pa.Table, field: str = "text", target: str = "fingerprint") -> pa.Table:
    """Content fingerprint = hex md5 of the UTF-8 text (matches SQL
    ``md5(text)``). Per-row hashlib loop — kept ONLY for oracle parity
    with DuckDB's md5(); the scale default is the vectorized
    ``rolling_hash_fingerprint`` (see ``fingerprint``)."""
    col = t[field]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    vals = [
        hashlib.md5(s.encode()).hexdigest() if s is not None else None
        for s in col.to_pylist()
    ]
    return t.append_column(target, pa.array(vals, pa.string()))


def fingerprint(ds, field: str = "text", oracle_parity: bool = False):
    """Content fingerprint column ``fingerprint`` for exact dedup /
    snapshot diff. DEFAULT is the vectorized full-content 64-bit
    positional polynomial (``rolling_hash_fingerprint`` — no Python
    row loop, the 100 TB path); ``oracle_parity=True`` selects the hex
    md5 variant whose value DuckDB's ``md5()`` reproduces (per-row
    hashlib — use only where the SQL-comparable digest itself is the
    product)."""
    if oracle_parity:
        return ds.map_batches(
            lambda t: fingerprint_md5(t, field), batch_format="pyarrow"
        )
    return ds.map_batches(
        lambda t: rolling_hash_fingerprint(t, field, target="fingerprint"),
        batch_format="pyarrow",
    )


def rolling_hash_fingerprint(
    t: pa.Table,
    field: str = "text",
    target: str = "rhash",
    window: int | None = None,
) -> pa.Table:
    """Deterministic 64-bit FULL-CONTENT document fingerprint — the
    cheap non-cryptographic variant for 100TB-scale exact dedup where
    per-row md5 of full text is Python-loop-bound.

    fp(doc) = Σ_i fnv1a(word_i) · R^i  (mod 2^64),  R odd constant —
    a positional polynomial over the FNV-1a word hashes, so any
    insertion / deletion / edit / reorder anywhere in the document
    changes the fingerprint (the round-2 variant folded only the first
    8 words, which missed edits past the prefix). Fully vectorized:
    one split, one flat word-hash pass, one cumprod power table, one
    segmented reduceat — no loop over words or rows. ``window=k``
    restricts to the first k words (prefix clustering use-case)."""
    from vector_ray.stages.core import _stable_hash_u64

    col = t[field]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    words = pc.split_pattern(pc.fill_null(pc.cast(col, pa.string()), ""), " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = words.flatten()
    if t.num_rows == 0 or len(flat) == 0:
        return t.append_column(
            target, pa.array(np.zeros(t.num_rows, np.int64), pa.int64())
        )
    h = _stable_hash_u64(flat)
    offsets = np.asarray(words.offsets, dtype=np.int64)
    lengths = np.diff(offsets)
    # local word position within each document
    pos = np.arange(len(h), dtype=np.int64) - np.repeat(
        offsets[:-1], lengths
    )
    if window is not None:
        keepmask = pos < window
    else:
        keepmask = None
    mult = np.uint64(0x9E3779B97F4A7C15)
    maxw = int(lengths.max())
    # R^0 .. R^(maxw-1), uint64 wraparound = mod 2^64
    pows = np.empty(maxw, np.uint64)
    pows[0] = np.uint64(1)
    if maxw > 1:
        np.multiply.accumulate(
            np.full(maxw - 1, mult, np.uint64), out=pows[1:]
        )
    vals = h * pows[pos]
    if keepmask is not None:
        vals = np.where(keepmask, vals, np.uint64(0))
    # split() never yields an empty word list ("" -> [""]), so every
    # segment is non-empty and reduceat is well-defined
    out = np.add.reduceat(vals, offsets[:-1])
    return t.append_column(target, pa.array(out.astype(np.int64), pa.int64()))


# ---------------------------------------------------------------------------
# TF-IDF: corpus document frequencies (two-phase, batch-partitioned
# exactness) + per-doc top term
# ---------------------------------------------------------------------------


def doc_frequencies(ds, field: str = "text"):
    """Dataset of (word, df) — number of DOCUMENTS containing each word.
    Each document lives in exactly one batch, so per-batch distinct
    (word, doc) counting sums exactly across the corpus; the shuffle
    carries one row per distinct word per block."""
    import ray.data  # noqa: F401  (Sum import site)
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        col = t[field]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        words = pc.split_pattern(col, " ")
        flat = np.asarray(words.flatten(), dtype=object)
        row_id = np.repeat(
            np.arange(len(words)),
            np.asarray(pc.list_value_length(words), dtype=np.int64),
        )
        uniq, code = np.unique(flat, return_inverse=True)
        # distinct (doc, word) pairs within the batch
        pair = row_id.astype(np.int64) * len(uniq) + code
        upair = np.unique(pair)
        u, c = np.unique(upair % len(uniq), return_counts=True)
        return pa.table(
            {
                "word": pa.array(uniq[u], pa.string()),
                "df": pa.array(c, pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("df", alias_name="df"))
    )


def tfidf_top_term(ds, field: str = "text", id_field: str = "doc_id",
                   round_to: int = 4, max_vocab: int = 20_000_000):
    """Per-document top TF-IDF term: score = tf * (ln((N+1)/(df+1)) + 1)
    (smoothed sklearn-style idf), winner by (score DESC, word ASC).

    The (word -> idf) table is broadcast once; per-batch scoring is one
    np.unique for codes + one lexsort for the per-doc argmax. The
    broadcast is bounded by ``max_vocab`` (raises, never truncates —
    a silent cap would change winners): beyond that, join the df table
    back by word with ``bucketed_join`` instead of broadcasting."""
    import ray

    from vector_ray.schema import round_sql_np

    n_docs = ds.count()
    df_rows = doc_frequencies(ds, field).take_all()
    if len(df_rows) > max_vocab:
        raise ValueError(
            f"corpus vocabulary {len(df_rows)} exceeds max_vocab="
            f"{max_vocab}; use a bucketed_join of the df table instead "
            f"of the broadcast path"
        )
    idf = {
        r["word"]: float(np.log((n_docs + 1.0) / (r["df"] + 1.0)) + 1.0)
        for r in df_rows
    }
    idf_ref = ray.put(idf)

    def top_term(t: pa.Table) -> pa.Table:
        idf_map = ray.get(idf_ref)
        col = t[field]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        words = pc.split_pattern(col, " ")
        flat = np.asarray(words.flatten(), dtype=object)
        lens = np.asarray(pc.list_value_length(words), dtype=np.int64)
        row_id = np.repeat(np.arange(len(words)), lens)
        uniq, code = np.unique(flat, return_inverse=True)
        # tf per (doc, word): unique over the pair key
        pair = row_id.astype(np.int64) * len(uniq) + code
        upair, tf = np.unique(pair, return_counts=True)
        prow, pcode = upair // len(uniq), upair % len(uniq)
        uidf = np.array([idf_map[w] for w in uniq], dtype=np.float64)
        score = tf * uidf[pcode]
        # per-row argmax with (score desc, word asc): np.unique returns
        # uniq SORTED, so ascending code == ascending word
        order = np.lexsort((pcode, -score, prow))
        first = np.ones(len(order), dtype=bool)
        first[1:] = prow[order][1:] != prow[order][:-1]
        win = order[first]
        ids = t[id_field]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        sc = round_sql_np(round_sql_np(score[win], 9), round_to)
        return pa.table(
            {
                id_field: ids.take(pa.array(prow[win])),
                "top_term": pa.array(uniq[pcode[win]].astype(object), pa.string()),
                "tfidf": pa.array(sc, pa.float64()),
            }
        )

    return ds.map_batches(top_term, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# corpus-wide exact line dedup (the C4 / RefinedWeb "remove duplicated
# lines across documents" pass: keep only each line's FIRST occurrence,
# ordered by (id, line_no), then reassemble documents from surviving
# lines; documents that lose every line disappear).
#
# Scale shape (100 TB): two hash shuffles, both bounded.
#   1. winner election groups by a hash BUCKET of the line text (not
#      per-line map_groups — millions of tiny groups would pay per-call
#      overhead), after a per-block local prune keeps one candidate per
#      distinct line per block, so a line duplicated N times corpus-wide
#      ships <= num_blocks rows, never N.
#   2. reassembly groups by a hash bucket of the doc id; inside a bucket
#      everything is one vectorized sort + offsets build + binary_join.
# ---------------------------------------------------------------------------

_LN = "__ln"


def reflow(t: pa.Table, field: str = "text", words_per_line: int = 8) -> pa.Table:
    """Re-wrap single-line text into newline-separated lines of
    ``words_per_line`` whitespace-separated words (RE2 rewrite, matches
    DuckDB ``regexp_replace(..., 'g')`` byte-for-byte)."""
    pat = r"((?:\S+ ){%d}\S+) " % (words_per_line - 1)
    col = pc.replace_substring_regex(t[field], pattern=pat, replacement="\\1\n")
    return t.set_column(t.column_names.index(field), field, col)


def _explode_lines(
    t: pa.Table, field: str, id_field: str, delimiter: str
) -> pa.Table:
    """Explode each doc into one row per line: (id, __ln, line). Offsets
    math only — no Python loop over rows or lines."""
    lst = t[field]
    if isinstance(lst, pa.ChunkedArray):
        lst = lst.combine_chunks()
    lst = pc.split_pattern(pc.fill_null(lst, ""), pattern=delimiter)
    lens = np.asarray(pc.list_value_length(lst), dtype=np.int64)
    parent = np.repeat(np.arange(len(lst), dtype=np.int64), lens)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    pos = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(starts, lens)
    ids = t[id_field]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    return pa.table(
        {
            id_field: ids.take(pa.array(parent)),
            _LN: pa.array(pos, pa.int64()),
            "line": lst.flatten(),
        }
    )


def line_dedupe(
    ds,
    field: str = "text",
    id_field: str = "doc_id",
    delimiter: str = "\n",
    num_buckets: int = 64,
):
    """Corpus-wide exact line dedup; returns (id_field, field) with each
    line kept only at its first (id, line_no) occurrence."""
    from vector_ray.stages.grouped import local_head_per_group
    from vector_ray.stages.shuffle import _key_hash

    def explode_and_prune(t: pa.Table) -> pa.Table:
        tbl = _explode_lines(t, field, id_field, delimiter)
        # local prune: one candidate per distinct line per block bounds
        # what the election shuffle moves
        tbl = local_head_per_group(tbl, ["line"], [id_field, _LN], 1)
        b = (_key_hash(tbl, "line") % np.uint64(num_buckets)).astype(np.int64)
        return tbl.append_column("__b", pa.array(b))

    def elect(group: pa.Table) -> pa.Table:
        return local_head_per_group(group, ["line"], [id_field, _LN], 1)

    winners = (
        ds.map_batches(explode_and_prune, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(elect, batch_format="pyarrow")
    )

    return _reassemble_lines(winners, id_field, field, delimiter, num_buckets)


def _reassemble_lines(
    lines_ds, id_field: str, field: str, delimiter: str, num_buckets: int
):
    """Rebuild (id, text) docs from surviving (id, __ln, line) rows: hash-
    bucket by doc id, then one vectorized sort + offsets + binary_join per
    bucket (a doc's lines always land in the same bucket)."""
    from vector_ray.stages.shuffle import _key_hash

    def rebucket(t: pa.Table) -> pa.Table:
        if "__b" in t.column_names:
            t = t.drop_columns(["__b"])
        b = (_key_hash(t, id_field) % np.uint64(num_buckets)).astype(np.int64)
        return t.append_column("__b", pa.array(b))

    def assemble(group: pa.Table) -> pa.Table:
        g = group.sort_by([(id_field, "ascending"), (_LN, "ascending")])
        ids = g[id_field]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        n = len(ids)
        change = np.ones(n, dtype=bool)
        if n > 1:
            neq = pc.not_equal(ids.slice(1), ids.slice(0, n - 1))
            change[1:] = np.asarray(
                pc.fill_null(neq, True).to_numpy(zero_copy_only=False)
            )
        doc_starts = np.flatnonzero(change)
        offsets = np.concatenate([doc_starts, [n]]).astype(np.int64)
        lines = g["line"]
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        joined = pc.binary_join(
            pa.LargeListArray.from_arrays(offsets, lines), delimiter
        )
        return pa.table(
            {id_field: ids.take(pa.array(doc_starts)), field: joined}
        )

    return (
        lines_ds.map_batches(rebucket, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(assemble, batch_format="pyarrow")
    )


def boilerplate_line_filter(
    ds,
    field: str = "text",
    id_field: str = "doc_id",
    max_df: int = 3,
    delimiter: str = "\n",
    num_buckets: int = 64,
):
    """CCNet-style boilerplate removal: drop every line that occurs in
    ``max_df`` or more DISTINCT documents (nav bars, cookie banners,
    footers — the lines that repeat across a web crawl), then reassemble
    each doc from its surviving lines in original order. Docs that lose
    every line drop out. Complements ``line_dedupe`` (which keeps the
    FIRST occurrence of a duplicated line; this removes ALL occurrences
    of corpus-frequent lines).

    Distributed plan, nothing on the driver:
    1. explode docs to (id, line_no, line) rows (offsets math);
    2. exact per-line doc frequency with a per-block combiner — each doc
       is one input row, so distinct (line, id) within a block sums to
       the exact global df across blocks; only one row per distinct
       line per block crosses the groupby shuffle;
    3. the hot-line set (df >= max_df) anti-joins the exploded rows via
       ``bucketed_join`` — the hot set streams through the same hash
       shuffle as the data (never collected to the driver), and the
       anti join ships right-side keys deduped per batch;
    4. reassembly = ``line_dedupe``'s bucket-by-doc + binary_join.

    Returns Dataset[(id_field, field)]."""
    from vector_ray.stages.shuffle import bucketed_join

    exploded = ds.map_batches(
        lambda t: _explode_lines(t, field, id_field, delimiter),
        batch_format="pyarrow",
    )

    def df_part(t: pa.Table) -> pa.Table:
        d = t.select(["line", id_field]).group_by(["line", id_field]).aggregate([])
        out = d.group_by("line").aggregate([(id_field, "count")])
        return out.rename_columns(["line", "df"])

    hot = (
        exploded.map_batches(df_part, batch_format="pyarrow")
        .groupby("line")
        .sum("df")
        .map_batches(
            lambda t: t.rename_columns(["line", "df"]), batch_format="pyarrow"
        )
        .filter(expr=f"df >= {max_df}")
    )

    kept = bucketed_join(
        exploded, hot, key="line", num_buckets=num_buckets, how="anti"
    )
    return _reassemble_lines(kept, id_field, field, delimiter, num_buckets)


# ---------------------------------------------------------------------------
# unicode text normalization (NFC + whitespace collapse + trim): the
# standard first pass of a web-corpus cleanup. Pure Arrow kernels
# (utf8_normalize / replace_substring_regex), shuffle-free, zero-copy.
# Matches DuckDB trim(regexp_replace(nfc_normalize(x), '\s+', ' ', 'g')).
# ---------------------------------------------------------------------------


def normalize_text_table(
    t: pa.Table, field: str = "text", form: str = "NFC",
    collapse_ws: bool = True,
) -> pa.Table:
    import polars as pl

    col = t[field]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # polars (Rust ICU tables), not pc.utf8_normalize: this pyarrow
    # build's NFC does not COMPOSE (e+U+0301 stays two codepoints),
    # which diverges from DuckDB/CPython NFC
    col = pl.Series(col).str.normalize(form).to_arrow()
    if not isinstance(col, pa.Array):
        col = pa.array(col)
    if col.type != pa.string():
        col = pc.cast(col, pa.string())
    if collapse_ws:
        col = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(col, pattern=r"\s+", replacement=" ")
        )
    return t.set_column(t.column_names.index(field), field, col)


def normalize_text(ds, field: str = "text", form: str = "NFC"):
    return ds.map_batches(
        lambda t: normalize_text_table(t, field, form),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# BPE-ish pre-tokenizer counting (GPT-2 pretoken split): counts the
# regex pre-tokens a byte-BPE tokenizer would see — the standard cheap
# "how many tokens will this cost" estimator when the real tokenizer
# isn't in the container. One vectorized RE2 count per batch; the same
# pattern runs verbatim in DuckDB regexp_extract_all for the oracle.
# ---------------------------------------------------------------------------

# GPT-2's pretokenizer, minus the lookahead RE2 lacks (`\s+(?!\S)`);
# contraction suffixes, letter runs, digit runs, punctuation runs.
BPE_PRETOKEN_RE = (
    r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
)


def bpe_token_count(ds, field: str = "text", target: str = "n_bpe"):
    """Adds ``target`` = number of BPE pre-tokens in ``field``."""

    def count(t: pa.Table) -> pa.Table:
        col = t[field]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = pc.cast(
            pc.count_substring_regex(col, pattern=BPE_PRETOKEN_RE), pa.int64()
        )
        return t.append_column(target, n)

    return ds.map_batches(count, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Gopher-style quality rules (Rae et al. 2021 §A1.1, adapted to the
# space-separated synthetic corpus): per-document rule columns plus the
# conjunction `keep`. All thresholds compare RAW float values (exact
# IEEE parity with the SQL oracle — ratios of integers divide the same
# way in numpy and DuckDB); only the REPORTED columns are rounded.
# ---------------------------------------------------------------------------


def gopher_features(
    t: pa.Table,
    field: str = "text",
    min_words: int = 30,
    max_words: int = 80,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 8.0,
    max_top_word_ratio: float = 0.2,
    min_stopwords: int = 1,
    round_to: int = 4,
) -> pa.Table:
    import polars as pl

    from vector_ray.schema import round_sql_np

    texts = t[field]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    df = pl.DataFrame({"_t": pl.Series(texts)})
    words = pl.col("_t").str.split(" ")
    feats = df.select(
        words.list.len().alias("n"),
        words.list.eval(pl.element().str.len_chars())
        .list.sum()
        .alias("chars"),
        # most frequent word's count: sort each word list, then the
        # longest equal run — vectorized as max over value_counts
        words.list.eval(
            pl.element().value_counts(sort=False).struct.field("count")
        )
        .list.max()
        .alias("top_c"),
        words.list.eval(pl.element().is_in(QUALITY_STOPWORDS))
        .list.sum()
        .alias("n_stop"),
    )
    n = feats["n"].to_numpy().astype(np.int64)
    chars = feats["chars"].to_numpy().astype(np.int64)
    top_c = feats["top_c"].to_numpy().astype(np.int64)
    n_stop = feats["n_stop"].to_numpy().astype(np.int64)
    nn = np.maximum(n, 1)
    mwl = chars / nn
    topr = top_c / nn
    keep = (
        (n >= min_words)
        & (n <= max_words)
        & (mwl >= min_mean_word_len)
        & (mwl <= max_mean_word_len)
        & (topr <= max_top_word_ratio)
        & (n_stop >= min_stopwords)
    )
    out = t
    for name, arr, typ in (
        ("n_words", n, pa.int64()),
        ("mean_word_len", round_sql_np(round_sql_np(mwl, 9), round_to),
         pa.float64()),
        ("top_word_ratio", round_sql_np(round_sql_np(topr, 9), round_to),
         pa.float64()),
        ("n_stop", n_stop, pa.int64()),
        ("keep", keep, pa.bool_()),
    ):
        out = out.append_column(name, pa.array(arr, typ))
    return out


def gopher_filter(ds, field: str = "text", **thresholds):
    return ds.map_batches(
        lambda t: gopher_features(t, field, **thresholds),
        batch_format="pyarrow",
    )


def bm25_topk(
    ds,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    field: str = "text",
    id_field: str = "doc_id",
    round_to: int = 4,
):
    """Okapi BM25 top-k retrieval for a fixed term query — the lexical
    ranking baseline next to the ANN/embedding searches in
    functions/similarity.py. idf uses the Lucene-style +1 floor:
    ln((N - df + 0.5)/(df + 0.5) + 1), always positive.

    Two passes, both streaming:
    1. stats — per-batch partials (doc count, summed doc length, per-
       query-term document frequency); all INTEGER, so driver-side
       summing is exact regardless of batch order. One tiny row per
       batch reaches the driver, never the corpus.
    2. score — the per-term idf (a dict of len(query_terms) floats —
       closure-captured, no broadcast machinery needed) scores each
       batch vectorized (one np.isin + one bincount per term), keeps a
       local top-k per batch, and a global sort+limit over k×batches
       rows picks the winners.

    Each per-term contribution is pinned to 9 decimals before summing
    so the score matches a SQL oracle computing the identical
    expression; ties on the rounded score break by ascending doc id on
    both sides."""
    from vector_ray.schema import round_sql_np

    # dedup, order-preserving: a repeated query term must count once
    # (the SQL oracle's IN-list dedups; double-counting would also be
    # wrong BM25)
    terms = list(dict.fromkeys(query_terms))
    if not terms:
        raise ValueError("bm25_topk: query_terms must be non-empty")
    m = len(terms)

    def partial_stats(t: pa.Table) -> pa.Table:
        col = t[field]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        words = pc.split_pattern(col, " ")
        lens = np.asarray(pc.list_value_length(words), dtype=np.int64)
        flat = np.asarray(words.flatten(), dtype=object)
        row_id = np.repeat(np.arange(len(words)), lens)
        out = {
            "n": pa.array([len(lens)], pa.int64()),
            "sum_dl": pa.array([int(lens.sum())], pa.int64()),
        }
        for j, term in enumerate(terms):
            rows = np.unique(row_id[flat == term])
            out[f"df_{j}"] = pa.array([len(rows)], pa.int64())
        return pa.table(out)

    # one tiny row per batch; documents never leave the workers
    stats = ds.map_batches(partial_stats, batch_format="pyarrow").take_all()
    n_docs = sum(r["n"] for r in stats)
    sum_dl = sum(r["sum_dl"] for r in stats)
    if n_docs == 0:
        raise ValueError("bm25_topk: empty corpus")
    avgdl = sum_dl / n_docs  # exact: both operands are integers
    idf = [
        float(np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0))
        for df in (sum(r[f"df_{j}"] for r in stats) for j in range(m))
    ]
    k1p1 = k1 + 1.0

    def score(t: pa.Table) -> pa.Table:
        col = t[field]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        words = pc.split_pattern(col, " ")
        lens = np.asarray(pc.list_value_length(words), dtype=np.int64)
        flat = np.asarray(words.flatten(), dtype=object)
        row_id = np.repeat(np.arange(len(words)), lens)
        nrows = len(lens)
        dl = lens.astype(np.float64)
        total = np.zeros(nrows, dtype=np.float64)
        hit = np.zeros(nrows, dtype=bool)
        den_norm = k1 * (1.0 - b + b * dl / avgdl)
        for j in range(m):
            tf = np.bincount(
                row_id[flat == terms[j]], minlength=nrows
            ).astype(np.float64)
            contrib = round_sql_np(idf[j] * ((tf * k1p1) / (tf + den_norm)), 9)
            total += np.where(tf > 0, contrib, 0.0)
            hit |= tf > 0
        ids = t[id_field]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        sc = round_sql_np(round_sql_np(total[hit], 9), round_to)
        local = pa.table(
            {
                id_field: ids.filter(pa.array(hit)),
                "score": pa.array(sc, pa.float64()),
            }
        )
        order = pc.sort_indices(
            local,
            sort_keys=[("score", "descending"), (id_field, "ascending")],
        )
        return local.take(order[:k])

    scored = ds.map_batches(score, batch_format="pyarrow")
    return scored.sort(
        ["score", id_field], descending=[True, False]
    ).limit(k)


def inverted_index(
    ds,
    field: str = "text",
    id_field: str = "doc_id",
    min_df: int = 1,
    max_df: int | None = None,
):
    """Inverted-index materialization: one posting row (word, doc_id,
    df) per distinct word-document incidence — the build step behind
    ``bm25_topk``-style retrieval when queries are not known upfront.

    Per batch, distinct (word, doc) pairs are extracted vectorized
    (each document lives in exactly one row of one batch, so per-batch
    dedup is globally exact); one hash shuffle groups postings by word
    and each group emits its doc ids sorted with the exact df.

    ``min_df``/``max_df`` bound the output: words outside the band are
    dropped whole (max_df is the standard stopword prune — a stopword's
    posting list is O(corpus) and both its size and its usefulness make
    it the thing you exclude at scale). Dropping is by FILTER, never a
    silent truncation of a kept word's postings."""
    def pairs(t: pa.Table) -> pa.Table:
        col = t[field]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        words = pc.split_pattern(col, " ")
        flat = np.asarray(words.flatten(), dtype=object)
        lens = np.asarray(pc.list_value_length(words), dtype=np.int64)
        row_id = np.repeat(np.arange(len(words)), lens)
        uniq, code = np.unique(flat, return_inverse=True)
        pair = row_id.astype(np.int64) * len(uniq) + code
        upair = np.unique(pair)
        prow, pcode = upair // len(uniq), upair % len(uniq)
        ids = t[id_field]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table(
            {
                "word": pa.array(uniq[pcode].astype(object), pa.string()),
                id_field: ids.take(pa.array(prow)),
            }
        )

    def postings(g: pa.Table) -> pa.Table:
        df = g.num_rows
        if df < min_df or (max_df is not None and df > max_df):
            return pa.table(
                {
                    "word": pa.array([], pa.string()),
                    id_field: g[id_field].slice(0, 0).combine_chunks(),
                    "df": pa.array([], pa.int64()),
                }
            )
        ids = g[id_field]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        order = pc.sort_indices(ids)
        return pa.table(
            {
                "word": g["word"].combine_chunks()
                if isinstance(g["word"], pa.ChunkedArray)
                else g["word"],
                id_field: ids.take(order),
                "df": pa.array(np.full(df, df, np.int64)),
            }
        )

    return (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("word")
        .map_groups(postings, batch_format="pyarrow")
    )


def chunk_text(
    ds,
    field: str = "text",
    id_field: str = "doc_id",
    max_words: int = 64,
    overlap: int = 16,
):
    """RAG-style chunking: split each document into overlapping
    word-window chunks (stride = max_words - overlap). The retrieval
    preprocessing step every embedding index needs.

    Output: (id, chunk_id, n_words, chunk). Chunk starts are multiples
    of the stride; a trailing start is emitted only while it begins
    before ``n - overlap`` (so the tail is never a pure suffix of the
    previous chunk). Word split matches the corpus tokenizer contract
    (single-space split, empties kept).

    Purely narrow (flat_map shape): one split + numpy index arithmetic
    per batch, chunk text rebuilt with one ``pc.binary_join`` — no
    shuffle, no per-row Python."""
    if overlap >= max_words:
        raise ValueError("overlap must be < max_words")
    step = int(max_words) - int(overlap)
    mw, ov = int(max_words), int(overlap)

    def chunks(t: pa.Table) -> pa.Table:
        col = t[field]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = pc.fill_null(pc.cast(col, pa.string()), "")
        words = pc.split_pattern(col, pattern=" ")
        flat = words.flatten()
        offs = np.asarray(words.offsets, dtype=np.int64)
        n = offs[1:] - offs[:-1]
        extra = np.maximum((n - ov - 1) // step, 0)
        n_chunks = 1 + extra
        total = int(n_chunks.sum())
        doc_idx = np.repeat(np.arange(len(n)), n_chunks)
        cstart_excl = np.concatenate([[0], np.cumsum(n_chunks)[:-1]])
        k = np.arange(total) - np.repeat(cstart_excl, n_chunks)
        starts = k * step
        n_words = np.minimum(mw, n[doc_idx] - starts)
        # flat indices of every chunk word: base + within-chunk offset
        wtotal = int(n_words.sum())
        wstart_excl = np.concatenate([[0], np.cumsum(n_words)[:-1]])
        base = offs[:-1][doc_idx] + starts
        widx = np.repeat(base, n_words) + (
            np.arange(wtotal) - np.repeat(wstart_excl, n_words)
        )
        chunk_words = flat.take(pa.array(widx))
        loffs = np.zeros(total + 1, np.int32)
        np.cumsum(n_words, out=loffs[1:])
        lst = pa.ListArray.from_arrays(pa.array(loffs), chunk_words)
        ids = t[id_field]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table(
            {
                id_field: ids.take(pa.array(doc_idx)),
                "chunk_id": pa.array(k),
                "n_words": pa.array(n_words),
                "chunk": pc.binary_join(lst, " "),
            }
        )

    return ds.map_batches(chunks, batch_format="pyarrow")


def pmi_bigrams(
    ds,
    field: str = "text",
    min_count: int = 5,
    k: int = 20,
    ndigits: int = 6,
    num_buckets: int = 32,
):
    """Collocation mining: top-k adjacent word pairs by pointwise
    mutual information, PMI = ln( (c_ab/N_pairs) / ((c_a/N_words) *
    (c_b/N_words)) ) — the classic phrase detector (Church & Hanks
    1990; word2vec's phrase pass uses the same score shape).

    One read of the corpus: each batch emits its LOCAL (w1, w2) bigram
    counts and word counts as one long-format partial table (bigrams
    never cross document boundaries), so the one shuffle carries
    distinct-ngram partials, never corpus positions. Unigram counts are
    joined back to the min_count-surviving bigrams with two
    ``bucketed_join`` passes (co-partitioned by word — no vocab-sized
    broadcast anywhere), and the final top-k sorts only the scored
    candidate set. Word split semantics match the tokenizer/SQL
    contract exactly (single-space split, empties kept)."""
    from vector_ray.stages.grouped import aggregate as agg_stage
    from vector_ray.stages.shuffle import bucketed_join

    def partials(t: pa.Table) -> pa.Table:
        col = t[field]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = pc.fill_null(pc.cast(col, pa.string()), "")
        words = pc.split_pattern(col, pattern=" ")
        flat = words.flatten()
        n = len(flat)
        # unigram partial counts (kind=0; kind=1 marks a bigram row —
        # Ray's sort-based shuffle can't order null keys, so the marker
        # is a dedicated int column, w2 = "" for unigrams)
        ug = pa.table({"w1": flat}).group_by(["w1"]).aggregate([([], "count_all")])
        uni = pa.table(
            {
                "kind": pa.array(np.zeros(ug.num_rows, np.int8)),
                "w1": ug["w1"],
                "w2": pa.array([""] * ug.num_rows, pa.string()),
                "c": pc.cast(ug["count_all"], pa.int64()),
            }
        )
        if n >= 2:
            offs = np.asarray(words.offsets, dtype=np.int64)
            valid = np.ones(n - 1, dtype=bool)
            starts = offs[1:-1]  # first flat index of each later document
            starts = starts[(starts > 0) & (starts < n)]
            valid[starts - 1] = False  # pair would span two documents
            idx = np.flatnonzero(valid)
            w1 = flat.take(pa.array(idx))
            w2 = flat.take(pa.array(idx + 1))
            bg = (
                pa.table({"w1": w1, "w2": w2})
                .group_by(["w1", "w2"])
                .aggregate([([], "count_all")])
            )
            big = pa.table(
                {
                    "kind": pa.array(np.ones(bg.num_rows, np.int8)),
                    "w1": bg["w1"],
                    "w2": bg["w2"],
                    "c": pc.cast(bg["count_all"], pa.int64()),
                }
            )
            return pa.concat_tables([uni, big])
        return uni

    counts = agg_stage(
        ds.map_batches(partials, batch_format="pyarrow"),
        {
            "group_by": ["kind", "w1", "w2"],
            "aggregates": {"c": {"fn": "sum", "field": "c"}},
        },
    )
    counts = counts.materialize()  # distinct unigrams+bigrams: reused 4x below

    # corpus totals from one tiny partial-reduce pass over the counts
    def totals(t: pa.Table) -> pa.Table:
        isuni = pc.equal(t["kind"], pa.scalar(0, pa.int8()))
        cu = pc.sum(pc.if_else(isuni, t["c"], pa.scalar(0, pa.int64()))).as_py() or 0
        cb = pc.sum(pc.if_else(isuni, pa.scalar(0, pa.int64()), t["c"])).as_py() or 0
        return pa.table(
            {"nw": pa.array([cu], pa.int64()), "np": pa.array([cb], pa.int64())}
        )

    trows = counts.map_batches(totals, batch_format="pyarrow").take_all()
    n_words = float(sum(r["nw"] for r in trows))
    n_pairs = float(sum(r["np"] for r in trows))

    def pick_unigrams(t: pa.Table) -> pa.Table:
        m = t.filter(pc.equal(t["kind"], pa.scalar(0, pa.int8())))
        return pa.table({"word": m["w1"], "cu": m["c"]})

    mc = int(min_count)

    def pick_cands(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.equal(t["kind"], pa.scalar(1, pa.int8())),
            pc.greater_equal(t["c"], pa.scalar(mc)),
        )
        return t.filter(mask)

    unigrams = counts.map_batches(pick_unigrams, batch_format="pyarrow")
    cands = counts.map_batches(pick_cands, batch_format="pyarrow")
    j1 = bucketed_join(
        cands.map_batches(
            lambda t: pa.table(
                {"word": t["w1"], "w2": t["w2"], "c": t["c"]}
            ),
            batch_format="pyarrow",
        ),
        unigrams,
        "word",
        num_buckets=num_buckets,
    ).map_batches(
        lambda t: pa.table(
            {"w1": t["word"], "word": t["w2"], "c": t["c"], "ca": t["cu"]}
        ),
        batch_format="pyarrow",
    )
    j2 = bucketed_join(j1, unigrams, "word", num_buckets=num_buckets)

    from vector_ray.schema import round_sql_np

    def score(t: pa.Table) -> pa.Table:
        cab = np.asarray(pc.cast(t["c"], pa.float64()))
        ca = np.asarray(pc.cast(t["ca"], pa.float64()))
        cb = np.asarray(pc.cast(t["cu"], pa.float64()))
        # expression order mirrors the SQL oracle exactly
        pmi = np.log((cab / n_pairs) / ((ca / n_words) * (cb / n_words)))
        pmi = round_sql_np(round_sql_np(pmi, 9), ndigits)
        return pa.table(
            {
                "w1": t["w1"],
                "w2": t["word"],
                "c": pc.cast(t["c"], pa.int64()),
                "pmi": pa.array(pmi, pa.float64()),
            }
        )

    scored = j2.map_batches(score, batch_format="pyarrow")
    return scored.sort(
        ["pmi", "w1", "w2"], descending=[True, False, False]
    ).limit(int(k))


def compression_ratio(
    ds,
    field: str = "text",
    id_field: str = "doc_id",
    level: int = 6,
    round_to: int = 4,
):
    """Per-document deflate compression ratio — the classic corpus
    quality signal (highly compressible => boilerplate / templated
    repetition; near-incompressible => binary noise or encrypted junk;
    used by Gopher/RefinedWeb-style cleaning stacks, public defn).

    ratio = len(zlib.compress(utf8, level)) / len(utf8)  (empty -> 0).

    The per-row loop hands each string to zlib's C deflate — the Python
    overhead is one call per doc against a CPU-bound C kernel, and rows
    stream through ``map_batches`` tasks; nothing shuffles. Oracle:
    frozen golden (SQL has no deflate) recomputed by the independent
    straight-line loop in tools/make_goldens.py."""
    import zlib

    from vector_ray.schema import round_sql_np

    def score(t: pa.Table) -> pa.Table:
        texts = t[field].to_pylist()
        n_raw = np.empty(len(texts), dtype=np.int64)
        n_comp = np.empty(len(texts), dtype=np.int64)
        for i, s in enumerate(texts):
            raw = (s or "").encode("utf-8")
            n_raw[i] = len(raw)
            n_comp[i] = len(zlib.compress(raw, level))
        ratio = np.where(n_raw > 0, n_comp / np.maximum(n_raw, 1), 0.0)
        ratio = round_sql_np(round_sql_np(ratio, 9), round_to)
        return pa.table(
            {
                id_field: t[id_field],
                "n_raw": pa.array(n_raw, pa.int64()),
                "n_comp": pa.array(n_comp, pa.int64()),
                "ratio": pa.array(ratio, pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def texttile(
    ds,
    field: str = "text",
    id_field: str = "doc_id",
    block_words: int = 10,
):
    """TextTiling-style topic-boundary detection (Hearst 1997, public
    definition, integer variant): split each document into consecutive
    ``block_words``-word blocks (trailing partial block dropped), score
    every gap between adjacent blocks by the INTEGER dot product of
    their bag-of-words count vectors, and flag a gap as a boundary when
    its score is a strict local minimum (lower than both neighboring
    gaps — interior gaps only). Low lexical cohesion across a gap =
    topic shift = where a RAG chunker should cut.

    Exact integer arithmetic end-to-end (no float similarity), so the
    SQL oracle matches bit-for-bit. Pure narrow pass: per batch one
    np.unique word-coding + one lexsort; documents never span batches;
    ``block_words`` must be >= 1 (validated up front — a 0 would only
    surface as an opaque numpy divide error inside a Ray task);
    no shuffle. Output (doc_id, g, dot, boundary) with gap g = 1..nb−1
    between blocks g−1 and g."""
    if block_words < 1:
        raise ValueError(f"texttile: block_words must be >= 1, got {block_words}")

    def gaps(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_field: t[id_field].take(pa.array([], pa.int32())),
                "g": pa.array([], pa.int64()),
                "dot": pa.array([], pa.int64()),
                "boundary": pa.array([], pa.bool_()),
            }
        )
        if t.num_rows == 0:
            return empty
        col = pc.fill_null(pc.cast(t[field], pa.string()), "")
        words = pc.split_pattern(col, pattern=" ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = np.asarray(words.flatten(), dtype=object)
        offsets = np.asarray(words.offsets, dtype=np.int64)
        lens = np.diff(offsets)
        nb = lens // block_words               # full blocks per doc
        ngap = np.maximum(nb - 1, 0)
        if ngap.sum() == 0:
            return empty
        row_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        pos = np.arange(len(flat), dtype=np.int64) - offsets[row_of]
        block = pos // block_words
        keep = block < nb[row_of]              # drop trailing partial
        if not keep.any():
            return empty
        _, codes = np.unique(flat[keep], return_inverse=True)
        rows = row_of[keep]
        blks = block[keep]
        # count per (row, word, block): sort then run-length encode
        order = np.lexsort((blks, codes, rows))
        r, c, b = rows[order], codes[order], blks[order]
        new = np.ones(len(r), dtype=bool)
        new[1:] = (r[1:] != r[:-1]) | (c[1:] != c[:-1]) | (b[1:] != b[:-1])
        starts = np.nonzero(new)[0]
        counts = np.diff(np.append(starts, len(r)))
        ru, cu, bu = r[starts], c[starts], b[starts]
        # adjacent entries with same (row, word) and consecutive blocks
        adj = (
            (ru[1:] == ru[:-1]) & (cu[1:] == cu[:-1]) & (bu[1:] == bu[:-1] + 1)
        )
        prod = counts[:-1][adj] * counts[1:][adj]
        gap_row = ru[:-1][adj]
        gap_idx = bu[:-1][adj] + 1             # gap g sits after block g-1
        # dense per-doc gap arrays via a flat offset layout
        goff = np.concatenate([[0], np.cumsum(ngap)])
        dots = np.zeros(int(goff[-1]), dtype=np.int64)
        np.add.at(dots, goff[gap_row] + gap_idx - 1, prod)
        out_rows = np.repeat(np.arange(len(lens), dtype=np.int64), ngap)
        out_g = (np.arange(len(dots), dtype=np.int64) - goff[out_rows]) + 1
        prev = np.full(len(dots), -1, dtype=np.int64)
        nxt = np.full(len(dots), -1, dtype=np.int64)
        prev[1:] = dots[:-1]
        nxt[:-1] = dots[1:]
        interior = (out_g > 1) & (out_g < ngap[out_rows])
        boundary = interior & (dots < prev) & (dots < nxt)
        return pa.table(
            {
                id_field: t[id_field].take(pa.array(out_rows)),
                "g": pa.array(out_g, pa.int64()),
                "dot": pa.array(dots, pa.int64()),
                "boundary": pa.array(boundary, pa.bool_()),
            }
        )

    return ds.map_batches(gaps, batch_format="pyarrow")
