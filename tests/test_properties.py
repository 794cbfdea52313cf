"""Property-based tests (hypothesis) for the pure batch kernels — no Ray
session needed."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from hypothesis import given, settings
from hypothesis import strategies as st

texts = st.lists(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
        max_size=40,
    ),
    min_size=1,
    max_size=20,
)


@settings(max_examples=30, deadline=None)
@given(texts)
def test_tokenize_invariants(values):
    from vector_ray.stages.tokenize import tokenize_table

    t = pa.table({"text": pa.array(values, pa.string())})
    out = tokenize_table(t)
    n_tok = out["n_tok"].to_pylist()
    toks = out["tokens"].to_pylist()
    for text, n, tk in zip(values, n_tok, toks):
        assert n == len(text.split(" ")) == len(tk)
        assert all(0 <= x < 50257 for x in tk)
    # deterministic
    again = tokenize_table(t)
    assert out["tokens"].to_pylist() == again["tokens"].to_pylist()


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(min_value=-(2**40), max_value=2**40), min_size=1, max_size=50),
    st.integers(min_value=1, max_value=10),
)
def test_sample_partition_property(ids, rate):
    """The rate offsets partition the input: disjoint and complete."""
    from vector_ray.stages.core import compile_sample

    t = pa.table({"id": pa.array(ids, pa.int64())})
    seen = []
    for off in range(rate):
        part = compile_sample({"rate": rate, "offset": off, "key_field": "id"})(t)
        seen.extend(part["id"].to_pylist())
    assert sorted(seen) == sorted(ids)


@settings(max_examples=20, deadline=None)
@given(texts)
def test_minhash_bounds_and_selfsim(values):
    from vector_ray.functions.dedup import minhash_signatures

    t = pa.table({"text": pa.array(values, pa.string())})
    sig = minhash_signatures(t, "text")
    assert sig.shape == (len(values), 64)
    # identical texts → identical signatures
    for i, a in enumerate(values):
        for j, b in enumerate(values):
            if a == b:
                assert (sig[i] == sig[j]).all()


@settings(max_examples=30, deadline=None)
@given(st.lists(st.floats(min_value=-1e6, max_value=1e6), min_size=1, max_size=50),
       st.integers(min_value=0, max_value=6))
def test_round_sql_matches_duckdb(vals, nd):
    import duckdb

    from vector_ray.schema import round_sql_np

    mine = round_sql_np(np.array(vals), nd)
    con = duckdb.connect()
    theirs = [
        con.sql(f"select round({repr(v)}::DOUBLE, {nd})").fetchone()[0]
        for v in vals
    ]
    assert np.allclose(mine, theirs, rtol=0, atol=10.0 ** (-nd) / 1e6)


@settings(max_examples=30, deadline=None)
@given(texts)
def test_stable_hash_is_stable_and_chunk_invariant(values):
    from vector_ray.stages.core import _stable_hash_u64

    arr = pa.array(values, pa.string())
    h1 = _stable_hash_u64(arr)
    h2 = _stable_hash_u64(arr)
    assert (h1 == h2).all()
    # equal strings hash equal; hashing a slice matches the full run
    if len(values) > 2:
        part = _stable_hash_u64(pa.array(values[1:], pa.string()))
        assert (h1[1:] == part).all()


@settings(max_examples=25, deadline=None)
@given(st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=30))
def test_route_label_partitions_rows(kinds):
    from vector_ray.stages.core import ROUTE_COLUMN, compile_route_label

    t = pa.table({"k": pa.array(kinds, pa.string())})
    label = compile_route_label(
        {"route": {"ra": '.k == "a"', "rb": '.k == "b"'}}
    )
    out = label(t)
    routes = out[ROUTE_COLUMN].to_pylist()
    for k, r in zip(kinds, routes):
        assert r == {"a": "ra", "b": "rb"}.get(k, "_unmatched")


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=1,
        max_size=60,
    ),
    st.sampled_from(["rank", "dense_rank", "percent_rank"]),
    st.booleans(),
)
def test_rank_kernel_matches_pandas(values, mode, descending):
    import pandas as pd

    from vector_ray.stages.reshape import rank_table

    g = pa.table({"v": pa.array(values, pa.float64())})
    out = rank_table(
        g, order_cols=["v"], descending=descending, mode=mode, target="r"
    )["r"].to_pylist()
    s = pd.Series(values)
    method = {"rank": "min", "dense_rank": "dense", "percent_rank": "min"}[mode]
    ref = s.rank(method=method, ascending=not descending)
    if mode == "percent_rank":
        n = len(values)
        ref = (ref - 1) / (n - 1) if n > 1 else ref * 0.0
        assert np.allclose(out, ref.tolist())
    else:
        assert out == [int(x) for x in ref.tolist()]


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1000),  # unique-ified below
            st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_lag_delta_kernel_matches_pandas(rows):
    import pandas as pd

    from vector_ray.stages.reshape import lag_delta_table

    # make order keys unique (lag over duplicate keys is ill-defined)
    ts = list(range(len(rows)))
    vals = [v for _, v in rows]
    g = pa.table(
        {"ts": pa.array(ts, pa.int64()), "v": pa.array(vals, pa.float64())}
    )
    out = lag_delta_table(g, order_by=["ts"], field="v", target="d")[
        "d"
    ].to_pylist()
    ref = pd.Series(vals).diff().tolist()
    assert out[0] is None
    assert np.allclose(out[1:], ref[1:])


token_docs = st.lists(
    st.lists(st.integers(min_value=0, max_value=50256), max_size=25),
    min_size=1,
    max_size=12,
)


def _layout_collect(ds):
    import ray

    tables = [
        t for t in ray.get(ds.materialize().to_arrow_refs()) if t.num_rows
    ]
    return (
        pa.concat_tables(tables).sort_by("doc_id")
        if tables
        else pa.table({})
    )


def _mk_docs(docs):
    return pa.table(
        {
            "doc_id": [f"doc-{i:010d}" for i in range(len(docs))],
            "tokens": pa.array(
                [list(map(int, d)) for d in docs], pa.list_(pa.int32())
            ),
            "n_tok": pa.array([len(d) for d in docs], pa.int32()),
        }
    )


@settings(max_examples=15, deadline=None)
@given(token_docs, st.integers(min_value=1, max_value=30))
def test_layout_ops_invariants(ray_session, docs, k):
    import ray.data as rd

    from vector_ray.functions.tokens import (
        epoch_crop,
        strip_tokens,
        truncate_sequences,
        window_chunks,
    )

    t = _mk_docs(docs)
    # strip: per-row filter semantics
    bl = {0, 7, 13}
    out = _layout_collect(strip_tokens(rd.from_arrow(t), blocklist=sorted(bl)))
    for d, got, n in zip(docs, out["tokens"].to_pylist(), out["n_tok"].to_pylist()):
        want = [x for x in d if x not in bl]
        assert got == want and n == len(want)
    # truncate: exact prefix
    out = _layout_collect(truncate_sequences(rd.from_arrow(t), k))
    for d, got in zip(docs, out["tokens"].to_pylist()):
        assert got == list(d)[:k]
    # crop: a contiguous slice of the right length
    out = _layout_collect(epoch_crop(rd.from_arrow(t), crop_len=k, epoch=3))
    for d, got in zip(docs, out["tokens"].to_pylist()):
        assert len(got) == min(len(d), k)
        if d:
            joined = ",".join(map(str, d))
            assert not got or ",".join(map(str, got)) in joined
    # windows with stride == chunk_len partition the doc exactly
    out = _layout_collect(window_chunks(rd.from_arrow(t), chunk_len=k, stride=k))
    rebuilt = {}
    for did, win, toks in sorted(
        zip(
            out["doc_id"].to_pylist() if out.num_rows else [],
            out["win_id"].to_pylist() if out.num_rows else [],
            out["tokens"].to_pylist() if out.num_rows else [],
        )
    ):
        rebuilt.setdefault(did, []).extend(toks)
    for i, d in enumerate(docs):
        assert rebuilt.get(f"doc-{i:010d}", []) == list(d)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=60), min_size=1, max_size=400),
    st.integers(min_value=1, max_value=32),
)
def test_mg_summary_invariants(keys, capacity):
    """Misra-Gries summary: <= capacity counters, every counter
    underestimates its true count by at most d, and any key with true
    count > d survives."""
    from vector_ray.functions.lm import _mg_summary

    u, c = np.unique(np.array(keys), return_counts=True)
    true = dict(zip(u.tolist(), c.tolist()))
    su, sc, d = _mg_summary(u, c, capacity)
    assert len(su) <= capacity
    summary = dict(zip(su.tolist(), sc.tolist()))
    for key, cnt in true.items():
        got = summary.get(key, 0)
        assert 0 <= cnt - got <= d, (key, cnt, got, d)
        if cnt > d:
            assert key in summary
    # merging summaries of a split multiset keeps the global bound
    half = len(keys) // 2
    if half:
        parts = []
        total_d = 0
        for chunk in (keys[:half], keys[half:]):
            cu, cc = np.unique(np.array(chunk), return_counts=True)
            mu, mc, md = _mg_summary(cu, cc, capacity)
            parts.append(dict(zip(mu.tolist(), mc.tolist())))
            total_d += md
        for key, cnt in true.items():
            got = sum(p.get(key, 0) for p in parts)
            assert 0 <= cnt - got <= total_d


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.floats(min_value=0.01, max_value=1e6, allow_nan=False),
        min_size=2,
        max_size=60,
    )
)
def test_aes_key_monotone_in_weight(weights):
    """Efraimidis-Spirakis key u^(1/w) is within [0, 1] and, for a fixed
    uniform u, monotone non-decreasing in the weight — heavier rows can
    only rank higher."""
    u = 0.37
    keys = [u ** (1.0 / w) for w in weights]
    assert all(0.0 <= x <= 1.0 for x in keys)
    order = np.argsort(np.array(weights))
    sorted_keys = np.array(keys)[order]
    assert all(
        sorted_keys[i] <= sorted_keys[i + 1] + 1e-15
        for i in range(len(sorted_keys) - 1)
    )


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=20), max_size=30),
        min_size=1,
        max_size=12,
    )
)
def test_turn_examples_matches_reference(ray_session, docs):
    """turn_examples == a straight-line per-row reference: one example
    per closed assistant turn (prefix through the closing marker, which
    is every even-indexed marker), plus the whole row for a trailing
    open turn."""
    import ray.data as rd

    from vector_ray.functions.tokens import turn_examples

    MARKER = 7  # plenty of collisions in the 0..20 alphabet

    def reference(row_id, toks):
        out = []
        mpos = [i for i, v in enumerate(toks) if v == MARKER]
        for j in range(1, len(mpos), 2):  # even rank = closing marker
            out.append((row_id, j // 2 + 1, toks[: mpos[j] + 1]))
        if len(mpos) % 2 == 1:
            out.append((row_id, (len(mpos) + 1) // 2, list(toks)))
        return out

    t = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "tokens": pa.array(
                [list(map(int, d)) for d in docs], pa.list_(pa.int32())
            ),
        }
    )
    expect = sorted(
        ex for i, d in enumerate(docs) for ex in reference(i, list(d))
    )
    got = turn_examples(rd.from_arrow(t).repartition(3), [MARKER]).take_all()
    got_rows = sorted(
        (r["doc_id"], r["turn"], list(r["tokens"])) for r in got
    )
    assert got_rows == expect
    for r in got:
        assert r["n_ctx"] == len(r["tokens"])


# ---------------------------------------------------------------------------
# round-5 pure kernels
# ---------------------------------------------------------------------------

float_vecs = st.lists(
    st.lists(st.floats(-100, 100, allow_nan=False, width=32),
             min_size=8, max_size=8),
    min_size=4,
    max_size=32,
)


@settings(max_examples=30, deadline=None)
@given(float_vecs)
def test_pq_quantize_bounds_and_monotonicity(vecs):
    from vector_ray.functions.similarity import _pq_quantize

    x = np.asarray(vecs, dtype=np.float64)
    lo, hi = x.min(axis=0), x.max(axis=0)
    q = _pq_quantize(x, lo, hi)
    assert q.dtype == np.int64
    assert ((q >= 0) & (q <= 255)).all()
    # per-dim monotone: larger input never quantizes lower
    for d in range(x.shape[1]):
        order = np.argsort(x[:, d], kind="stable")
        qs = q[order, d]
        assert (np.diff(qs) >= 0).all()


@settings(max_examples=30, deadline=None)
@given(float_vecs)
def test_pq_assign_is_optimal(vecs):
    from vector_ray.functions.similarity import _pq_assign, _pq_quantize

    x = np.asarray(vecs, dtype=np.float64)
    lo, hi = x.min(axis=0), x.max(axis=0)
    xq = _pq_quantize(x, lo, hi)
    m, dsub = 2, 4
    books = np.stack(
        [xq[: min(4, len(xq)), j * dsub:(j + 1) * dsub] for j in range(m)]
    )
    codes = _pq_assign(xq, books)
    for j in range(m):
        sub = xq[:, j * dsub:(j + 1) * dsub]
        d2 = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        chosen = d2[np.arange(len(sub)), codes[:, j]]
        assert (chosen <= d2.min(axis=1)).all()  # optimal assignment
        # first-min tie rule
        assert (codes[:, j] == np.argmin(d2, axis=1)).all()


token_docs = st.lists(
    st.lists(st.integers(0, 30), min_size=0, max_size=12),
    min_size=1,
    max_size=10,
)


@settings(max_examples=30, deadline=None)
@given(token_docs, st.integers(1, 3))
def test_skipgram_batch_matches_enumeration(docs, window):
    from vector_ray.functions.tokens import skipgram_batch

    t = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(len(docs))]),
            "tokens": pa.array(docs, pa.list_(pa.int32())),
        }
    )
    out = skipgram_batch(t, window)
    got = sorted(
        zip(out["doc_id"].to_pylist(), out["i"].to_pylist(),
            out["c"].to_pylist(), out["ctx"].to_pylist(),
            out["d"].to_pylist())
    )
    want = []
    for di, doc in enumerate(docs):
        for i, c in enumerate(doc):
            for d in range(-window, window + 1):
                j = i + d
                if d != 0 and 0 <= j < len(doc):
                    want.append((f"d{di}", i + 1, c, doc[j], d))
    assert got == sorted(want)


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(1, 50), min_size=2, max_size=40))
def test_kn_probabilities_in_unit_interval(counts):
    # random observed bigram counts on a tiny alphabet: every observed
    # pair's KN probability must lie in (0, 1]
    rng = np.random.default_rng(0)
    k = 6
    c2 = np.zeros((k, k))
    for i, c in enumerate(counts):
        c2[i % k, (i * 7 + 3) % k] += c
    c1 = c2.sum(axis=1, keepdims=True)
    nf = (c2 > 0).sum(axis=1, keepdims=True).astype(float)
    nr = (c2 > 0).sum(axis=0, keepdims=True).astype(float)
    tt = float((c2 > 0).sum())
    with np.errstate(divide="ignore", invalid="ignore"):
        p = (c2 - 0.75) / c1 + 0.75 * nf / c1 * (nr / tt)
    obs = p[c2 > 0]
    assert (obs > 0).all() and (obs <= 1.0 + 1e-12).all()
