"""Round-4 additions: Jaccard-coefficient link prediction (and the
other operators added in this pass), each checked against a hand
reference on a tiny graph plus degenerate-input behavior.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data as rd


def _collect(ds) -> pa.Table:
    tables = [t for t in ray.get(ds.materialize().to_arrow_refs()) if t.num_rows]
    return pa.concat_tables(tables, promote_options="default") if tables else pa.table({})


def _edges_ds(edges, num_blocks=3):
    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, b in edges], pa.int64()),
                "dst": pa.array([b for a, b in edges], pa.int64()),
            }
        )
    ).repartition(num_blocks)


# ---------------------------------------------------------------------------
# jaccard_linkpred
# ---------------------------------------------------------------------------


def test_jaccard_linkpred_hand_graph(ray_session):
    from vector_ray.functions.graph import jaccard_linkpred

    # square 1-2-3-4-1 plus hub 5 connected to all corners: the only
    # non-adjacent pairs are the diagonals (1,3), (2,4); each shares
    # 3 neighbors (two corners + hub), deg(corner)=3 so
    # J = 3 / (3 + 3 - 3) = 1.0
    edges = [(1, 2), (2, 3), (3, 4), (4, 1), (5, 1), (5, 2), (5, 3), (5, 4)]
    out = (
        _collect(jaccard_linkpred(_edges_ds(edges), min_common=2))
        .to_pandas()
        .sort_values(["node_a", "node_b"])
        .reset_index(drop=True)
    )
    assert out.node_a.tolist() == [1, 2]
    assert out.node_b.tolist() == [3, 4]
    assert out.n_common.tolist() == [3, 3]
    assert out.deg_a.tolist() == [3, 3]
    assert out.deg_b.tolist() == [3, 3]
    assert out.jaccard.tolist() == pytest.approx([1.0, 1.0], abs=1e-9)


def test_jaccard_linkpred_asymmetric_degrees(ray_session):
    from vector_ray.functions.graph import jaccard_linkpred

    # star: 1-{2,3,4,5}; leaf pairs share exactly neighbor 1.
    # deg(leaf)=1 so J = 1/(1+1-1) = 1; with min_common=1 all six
    # leaf pairs appear. Add edge (2,3) so that pair is anti-joined
    # away and degrees of 2,3 become 2 → J(2,x)=1/(2+1-1)=0.5.
    edges = [(1, 2), (1, 3), (1, 4), (1, 5), (2, 3)]
    out = (
        _collect(jaccard_linkpred(_edges_ds(edges), min_common=1))
        .to_pandas()
        .sort_values(["node_a", "node_b"])
        .reset_index(drop=True)
    )
    got = {
        (int(r.node_a), int(r.node_b)): (int(r.n_common), float(r.jaccard))
        for r in out.itertuples()
    }
    # (2,3) is an existing edge → absent
    assert (2, 3) not in got
    assert got[(4, 5)] == (1, 1.0)
    assert got[(2, 4)] == (1, 0.5)
    assert got[(2, 5)] == (1, 0.5)
    assert got[(3, 4)] == (1, 0.5)
    assert got[(3, 5)] == (1, 0.5)
    # duplicate + reversed edges collapse to the same answer
    out2 = (
        _collect(
            jaccard_linkpred(
                _edges_ds(edges + [(b, a) for a, b in edges]), min_common=1
            )
        )
        .to_pandas()
        .sort_values(["node_a", "node_b"])
        .reset_index(drop=True)
    )
    assert out2.jaccard.tolist() == out.jaccard.tolist()


def test_jaccard_linkpred_no_pairs(ray_session):
    from vector_ray.functions.graph import jaccard_linkpred

    # a single edge has no wedges at all
    out = _collect(jaccard_linkpred(_edges_ds([(1, 2)], num_blocks=1)))
    assert out.num_rows == 0


# ---------------------------------------------------------------------------
# boilerplate_line_filter
# ---------------------------------------------------------------------------


def _docs_ds(docs, num_blocks=2):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.string()),
                "text": pa.array([t for _, t in docs], pa.string()),
            }
        )
    ).repartition(num_blocks)


def test_boilerplate_filter_drops_hot_lines_everywhere(ray_session):
    from vector_ray.functions.text import boilerplate_line_filter

    docs = [
        ("a", "cookie banner\nreal content a\nfooter"),
        ("b", "cookie banner\nreal content b\nfooter"),
        ("c", "cookie banner\nunique line c"),
        ("d", "only original content here"),
    ]
    out = _collect(boilerplate_line_filter(_docs_ds(docs), max_df=3)).to_pandas()
    got = dict(zip(out.doc_id, out.text))
    # "cookie banner" (df=3) removed from ALL docs; "footer" (df=2) kept
    assert got["a"] == "real content a\nfooter"
    assert got["b"] == "real content b\nfooter"
    assert got["c"] == "unique line c"
    assert got["d"] == "only original content here"


def test_boilerplate_filter_df_is_distinct_docs(ray_session):
    from vector_ray.functions.text import boilerplate_line_filter

    # "spam" appears 3 times but only in 2 distinct docs → df=2 < 3, kept
    docs = [
        ("a", "spam\nspam\nbody a"),
        ("b", "spam\nbody b"),
    ]
    out = _collect(boilerplate_line_filter(_docs_ds(docs), max_df=3)).to_pandas()
    got = dict(zip(out.doc_id, out.text))
    assert got["a"] == "spam\nspam\nbody a"
    assert got["b"] == "spam\nbody b"


def test_boilerplate_filter_all_boilerplate_doc_drops_out(ray_session):
    from vector_ray.functions.text import boilerplate_line_filter

    docs = [
        ("a", "nav"),
        ("b", "nav"),
        ("c", "nav"),
        ("d", "nav\nkeep me"),
    ]
    out = _collect(boilerplate_line_filter(_docs_ds(docs), max_df=3)).to_pandas()
    got = dict(zip(out.doc_id, out.text))
    assert set(got) == {"d"}
    assert got["d"] == "keep me"


# ---------------------------------------------------------------------------
# token_minhash_candidates
# ---------------------------------------------------------------------------


def _tok_ds(rows, num_blocks=2):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.string()),
                "tokens": pa.array(
                    [r[1] for r in rows], pa.list_(pa.int32())
                ),
            }
        )
    ).repartition(num_blocks)


def test_token_minhash_finds_planted_near_dup(ray_session):
    from vector_ray.functions.dedup import token_minhash_candidates

    rng = np.random.default_rng(3)
    base = rng.integers(0, 50000, size=120).tolist()
    rows = [
        ("a", base),
        ("b", base[5:]),  # near-dup of a
        ("c", rng.integers(0, 50000, size=120).tolist()),
        ("d", rng.integers(0, 50000, size=120).tolist()),
    ]
    out = _collect(token_minhash_candidates(_tok_ds(rows))).to_pandas()
    got = {(r.doc_a, r.doc_b): r.est_jaccard for r in out.itertuples()}
    assert ("a", "b") in got
    assert got[("a", "b")] >= 0.5
    # unrelated random docs never pair
    assert all(p == ("a", "b") for p in got)


def test_token_minhash_signature_matches_slow_reference(ray_session):
    from vector_ray.functions.dedup import (
        token_minhash_params,
        token_minhash_signatures,
    )

    M, P = 2147483647, 1000003
    rng = np.random.default_rng(9)
    toks = [rng.integers(0, 60000, size=n).tolist() for n in (3, 7, 30)]
    t = pa.table({"tokens": pa.array(toks, pa.list_(pa.int32()))})
    sig, valid = token_minhash_signatures(t, num_perm=4, shingle_k=3, seed=11)
    a, b = token_minhash_params(4, 11)
    for i, seq in enumerate(toks):
        shingles = []
        for s in range(len(seq) - 2):
            acc = 0
            for j in range(3):
                acc = (acc * P + seq[s + j] + 1) % M
            shingles.append(acc)
        for p in range(4):
            expect = min((int(a[p]) * sh + int(b[p])) % M for sh in shingles)
            assert sig[i, p] == expect
    assert valid.all()


def test_token_minhash_short_rows_excluded(ray_session):
    from vector_ray.functions.dedup import token_minhash_candidates

    # two identical 2-token docs are BELOW shingle_k — no shingles, no
    # band rows, no pair (and no spurious sentinel-signature match)
    rows = [("a", [1, 2]), ("b", [1, 2])]
    out = _collect(token_minhash_candidates(_tok_ds(rows, num_blocks=1)))
    assert out.num_rows == 0


# ---------------------------------------------------------------------------
# bucketed_asof_join directions + tolerance
# ---------------------------------------------------------------------------


def _asof_sides():
    left = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 1, 1, 2], pa.int64()),
                "t": pa.array([10, 25, 40, 10], pa.int64()),
                "lid": pa.array([0, 1, 2, 3], pa.int64()),
            }
        )
    ).repartition(2)
    right = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 1, 2], pa.int64()),
                "t": pa.array([20, 30, 100], pa.int64()),
                "rv": pa.array([200, 300, 999], pa.int64()),
            }
        )
    ).repartition(2)
    return left, right


def _asof_out(ds):
    df = _collect(ds).to_pandas().sort_values("lid").reset_index(drop=True)
    return [None if v != v else int(v) for v in df.rv]


def test_asof_directions(ray_session):
    from vector_ray.stages.shuffle import bucketed_asof_join

    left, right = _asof_sides()
    # backward: latest right t <= left t
    assert _asof_out(
        bucketed_asof_join(left, right, by="k", on="t")
    ) == [None, 200, 300, None]
    # forward: earliest right t >= left t
    assert _asof_out(
        bucketed_asof_join(left, right, by="k", on="t", direction="forward")
    ) == [200, 300, None, 999]
    # nearest: closest either way; lid=1 (t=25) ties 20 vs 30 -> backward
    assert _asof_out(
        bucketed_asof_join(left, right, by="k", on="t", direction="nearest")
    ) == [200, 200, 300, 999]


def test_asof_tolerance(ray_session):
    from vector_ray.stages.shuffle import bucketed_asof_join

    left, right = _asof_sides()
    # nearest with tolerance 10: lid=0 (t=10, nearest 20, d=10) kept;
    # lid=3 (t=10 vs 100, d=90) nulled
    assert _asof_out(
        bucketed_asof_join(
            left, right, by="k", on="t", direction="nearest", tolerance=10
        )
    ) == [200, 200, 300, None]
    # inner drops the out-of-tolerance row entirely
    out = _collect(
        bucketed_asof_join(
            left, right, by="k", on="t", direction="nearest",
            tolerance=10, how="inner",
        )
    ).to_pandas()
    assert sorted(out.lid.tolist()) == [0, 1, 2]
