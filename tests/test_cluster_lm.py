"""Distributed k-means, SemDeDup pruning, and unigram-LM scoring
(functions/cluster.py, functions/lm.py)."""

import numpy as np
import pyarrow as pa
import pytest


def _toy_embeddings(n=120, dim=8, k=3, seed=11):
    """k well-separated gaussian blobs; ids interleave the blobs so the
    smallest-id init picks rows from several clusters."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k, dim)) * 6
    X = np.vstack([centers[i % k] + rng.normal(size=dim) for i in range(n)])
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(
                [row.astype(np.float32).tolist() for row in X],
                pa.list_(pa.float32()),
            ),
        }
    )


def _numpy_kmeans(t, k, iters):
    ids = np.asarray(t["vec_id"])
    X = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    X = X[order]

    def norm(m):
        return m / np.linalg.norm(m, axis=1, keepdims=True)

    c = X[:k].copy()
    for _ in range(iters):
        a = np.argmax(norm(X) @ norm(c).T, axis=1)
        for j in range(k):
            members = X[a == j]
            if len(members):
                c[j] = members.mean(axis=0)
    return c, np.argmax(norm(X) @ norm(c).T, axis=1), ids[order]


def test_kmeans_matches_numpy_reference(ray_session):
    import ray.data as rd

    from vector_ray.functions.cluster import kmeans_assign, kmeans_fit

    t = _toy_embeddings()
    ds = rd.from_arrow(t).repartition(5)
    cent = kmeans_fit(ds, k=3, iters=3)
    ref_cent, ref_assign, ref_ids = _numpy_kmeans(t, 3, 3)
    assert np.allclose(cent, ref_cent, rtol=1e-12, atol=1e-12)
    out = kmeans_assign(ds, cent).to_pandas().sort_values("vec_id")
    assert (out.cluster.to_numpy() == ref_assign).all()
    # the blobs are well separated: every cluster non-empty (also the
    # assumption the SQL-oracle CTE documents)
    assert len(set(out.cluster)) == 3


def test_kmeans_oracle_fixture_has_no_empty_clusters(ray_session):
    """Backs the _kmeans_cte docstring: on the sf0.01 embeddings with
    k=10/iters=3, no Lloyd iteration empties a cluster (the SQL CTE
    drops empty clusters, the Ray path keeps the old centroid — they
    only agree while all clusters stay occupied)."""
    import pyarrow.parquet as pq

    t = pq.read_table("/root/testdata/sf0.01/embeddings.parquet")
    ids = np.asarray(t["vec_id"])
    X = np.array(t["embedding"].to_pylist(), dtype=np.float64)[np.argsort(ids)]

    def norm(m):
        return m / np.linalg.norm(m, axis=1, keepdims=True)

    c = X[:10].copy()
    for _ in range(3):
        a = np.argmax(norm(X) @ norm(c).T, axis=1)
        counts = np.bincount(a, minlength=10)
        assert (counts > 0).all()
        for j in range(10):
            c[j] = X[a == j].mean(axis=0)
    assert (np.bincount(np.argmax(norm(X) @ norm(c).T, axis=1), minlength=10) > 0).all()


def test_semdedup_drops_near_duplicates(ray_session):
    import ray.data as rd

    from vector_ray.functions.cluster import kmeans_fit, semdedup

    t = _toy_embeddings()
    X = np.array(t["embedding"].to_pylist())
    # append two near-copies of row 0 (tiny perturbation)
    rng = np.random.default_rng(3)
    dups = [X[0] + rng.normal(scale=1e-3, size=X.shape[1]).astype(np.float32) for _ in range(2)]
    t2 = pa.table(
        {
            "vec_id": pa.array(list(range(len(X) + 2)), pa.int64()),
            "embedding": pa.array(
                [r.tolist() for r in X] + [d.tolist() for d in dups],
                pa.list_(pa.float32()),
            ),
        }
    )
    ds = rd.from_arrow(t2).repartition(4)
    cent = kmeans_fit(ds, k=3, iters=3)
    out = semdedup(ds, cent, tau=0.999).to_pandas().set_index("vec_id")
    assert not out.loc[len(X), "kept"] and not out.loc[len(X) + 1, "kept"]
    assert out.loc[0, "kept"]  # the lowest id of the dup set survives


def test_semdedup_pessimistic_chain_rule(ray_session):
    """The exists-lower-id rule: in a chain a~b, b~c (a!~c), BOTH b and
    c are dropped (c via b even though b itself was dropped) — the
    documented pessimistic divergence from greedy keep-set SemDeDup."""
    import ray.data as rd

    from vector_ray.functions.cluster import semdedup

    # 2-d unit vectors at angles 0, 25, 50 degrees; tau between
    # cos(25deg)=.906 and cos(50deg)=.643: a~b and b~c but not a~c
    ang = np.deg2rad([0.0, 25.0, 50.0])
    t = pa.table(
        {
            "vec_id": pa.array([0, 1, 2], pa.int64()),
            "embedding": pa.array(
                [[float(np.cos(a)), float(np.sin(a))] for a in ang],
                pa.list_(pa.float32()),
            ),
        }
    )
    cent = np.array([[1.0, 0.5]])  # one cluster
    out = (
        semdedup(rd.from_arrow(t), cent, tau=0.8)
        .to_pandas()
        .set_index("vec_id")
        .sort_index()
    )
    assert out.kept.tolist() == [True, False, False]


def test_semdedup_max_cluster_guard(ray_session):
    import ray.data as rd

    from vector_ray.functions.cluster import semdedup

    t = _toy_embeddings(n=30)
    cent = np.ones((1, 8))
    with pytest.raises(Exception, match="max_cluster"):
        semdedup(rd.from_arrow(t), cent, tau=0.9, max_cluster=10).materialize()


def test_unigram_lm_hand_computed(ray_session):
    import ray.data as rd

    from vector_ray.functions.lm import lm_score

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["a a b", "a b c", "zz zz"]),
        }
    )
    # corpus: a=3 b=2 c=1 zz=2, N=8; vocab_size=3 keeps a,b,zz (count
    # desc, word asc -> ties b/zz broken to b first; zz count 2 ties b:
    # order a(3), b(2), zz(2)); c is OOV. denom = 8 + 3 + 1 = 12
    out = (
        lm_score(rd.from_arrow(docs), vocab_size=3)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    denom = 12.0
    exp0 = -(2 * np.log(4 / denom) + np.log(3 / denom)) / 3
    exp1 = -(np.log(4 / denom) + np.log(3 / denom) + np.log(1 / denom)) / 3
    exp2 = -(2 * np.log(3 / denom)) / 2
    assert abs(out.loc[0, "nll"] - exp0) < 1e-3
    assert abs(out.loc[1, "nll"] - exp1) < 1e-3
    assert abs(out.loc[2, "nll"] - exp2) < 1e-3
    # corpus-like doc scores lower than the OOV-bearing doc
    assert out.loc[0, "nll"] < out.loc[1, "nll"]


def test_lm_and_cluster_via_spec_dag(ray_session):
    from vector_ray import run_pipeline

    rows = [
        {"doc_id": i, "text": "a b c" if i % 2 else "a a a"} for i in range(40)
    ]
    out = run_pipeline(
        {
            "sources": {"in": {"type": "inline", "rows": rows}},
            "transforms": {
                "score": {"type": "lm_score", "inputs": ["in"], "vocab_size": 2}
            },
            "sinks": {"out": {"type": "collect", "inputs": ["score"]}},
        }
    ).sinks["out"]
    tbl = out.table
    assert "nll" in tbl.column_names and tbl.num_rows == 40

    emb = _toy_embeddings(n=60)
    out2 = run_pipeline(
        {
            "sources": {
                "e": {"type": "inline", "rows": emb.to_pylist()}
            },
            "transforms": {
                "cl": {"type": "kmeans", "inputs": ["e"], "k": 3, "iters": 2}
            },
            "sinks": {"out": {"type": "collect", "inputs": ["cl"]}},
        }
    ).sinks["out"]
    assert "cluster" in out2.table.column_names
    assert out2.table.num_rows == 60


def test_token_lm_dense_hand_computed(ray_session):
    import ray.data as rd

    from vector_ray.functions.lm import token_lm_score
    from vector_ray.schema import VOCAB_SIZE

    t = pa.table(
        {
            "doc_id": pa.array(["a", "b", "c"]),
            "tokens": pa.array(
                [[1, 1, 2], [1, 3], []], pa.list_(pa.int32())
            ),
        }
    )
    out = (
        token_lm_score(rd.from_arrow(t).repartition(2))
        .to_pandas()
        .set_index("doc_id")
    )
    # corpus counts: tok1=3 tok2=1 tok3=1, N=5, denom = 5 + VOCAB_SIZE
    denom = 5.0 + VOCAB_SIZE
    exp_a = -(2 * np.log(4 / denom) + np.log(2 / denom)) / 3
    exp_b = -(np.log(4 / denom) + np.log(2 / denom)) / 2
    assert abs(out.loc["a", "nll"] - exp_a) < 1e-3
    assert abs(out.loc["b", "nll"] - exp_b) < 1e-3
    # zero-token row is dropped, not scored
    assert "c" not in out.index
    assert out.loc["a", "nll"] < out.loc["b", "nll"]


def test_hot_spans_hand_computed(ray_session):
    import ray.data as rd

    from vector_ray.functions.spans import hot_span_stats

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "x y z a b",      # windows: xyz, yza, zab
                    "x y z c d",      # xyz, yzc, zcd
                    "q x y z e",      # qxy, xyz, yze
                    "m n",            # shorter than 3 words: 0 windows
                ]
            ),
        }
    )
    # "x y z" occurs 3 times; everything else once -> min_count=3 makes
    # it the only hot gram
    out = (
        hot_span_stats(rd.from_arrow(docs).repartition(2), n=3, min_count=3)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.n_windows.tolist() == [3, 3, 3, 0]
    assert out.n_hot.tolist() == [1, 1, 1, 0]
    assert out.hot_ratio.tolist() == [0.3333, 0.3333, 0.3333, 0.0]


def test_hot_spans_max_hot_guard(ray_session):
    import ray.data as rd

    from vector_ray.functions.spans import hot_span_stats

    docs = pa.table(
        {
            "doc_id": pa.array(list(range(4)), pa.int64()),
            "text": pa.array(["a b c d e"] * 4),
        }
    )
    with pytest.raises(ValueError, match="max_hot"):
        hot_span_stats(
            rd.from_arrow(docs), n=3, min_count=2, max_hot=1
        )


def test_semdedup_greedy_keeps_chain_tail(ray_session):
    """greedy=True implements published SemDeDup: c survives the
    a~b~c chain because its only tau-neighbor b was itself dropped."""
    import ray.data as rd

    from vector_ray.functions.cluster import semdedup

    ang = np.deg2rad([0.0, 25.0, 50.0])
    t = pa.table(
        {
            "vec_id": pa.array([0, 1, 2], pa.int64()),
            "embedding": pa.array(
                [[float(np.cos(a)), float(np.sin(a))] for a in ang],
                pa.list_(pa.float32()),
            ),
        }
    )
    cent = np.array([[1.0, 0.5]])
    out = (
        semdedup(rd.from_arrow(t), cent, tau=0.8, greedy=True)
        .to_pandas()
        .set_index("vec_id")
        .sort_index()
    )
    assert out.kept.tolist() == [True, False, True]


def test_budget_select_hand_computed(ray_session):
    import ray.data as rd

    from vector_ray.functions.selection import budget_select

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "score": pa.array([0.9, 0.5, 0.9, 0.7, 0.2]),
            "w": pa.array([4, 3, 5, 2, 1], pa.int64()),
        }
    )
    # order: (0.9, id0 w4) (0.9, id2 w5) (0.7, id3 w2) (0.5, id1 w3)
    # (0.2, id4 w1); cum: 4, 9, 11, 14, 15 -> budget 11 keeps 0,2,3
    out = (
        budget_select(
            rd.from_arrow(t).repartition(3), budget=11,
            score_field="score", weight_field="w", id_field="doc_id",
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out.doc_id.tolist() == [0, 2, 3]
    # budget mid-way through a tie bin: same score 0.9, id ASC wins
    out2 = budget_select(
        rd.from_arrow(t).repartition(3), budget=5,
        score_field="score", weight_field="w", id_field="doc_id",
    ).to_pandas()
    assert out2.doc_id.tolist() == [0]
    # budget covers everything
    out3 = budget_select(
        rd.from_arrow(t), budget=100,
        score_field="score", weight_field="w", id_field="doc_id",
    ).to_pandas()
    assert len(out3) == 5


def test_budget_select_rejects_nonpositive_weight(ray_session):
    import ray.data as rd

    from vector_ray.functions.selection import budget_select

    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "score": pa.array([0.5, 0.6]),
            "w": pa.array([3, 0], pa.int64()),
        }
    )
    with pytest.raises(Exception, match="strictly positive"):
        budget_select(
            rd.from_arrow(t), budget=2, score_field="score",
            weight_field="w", id_field="doc_id",
        ).materialize()


def test_variance_aggregates_both_paths(ray_session):
    import ray.data as rd

    from vector_ray.stages.grouped import aggregate

    rng = np.random.default_rng(5)
    vals = rng.normal(50, 12, size=4000)
    keys = np.where(np.arange(4000) % 2 == 0, "a", "b")
    t = pa.table({"k": pa.array(keys), "v": pa.array(vals)})
    ds = rd.from_arrow(t).repartition(6)

    # fast path (no list-based aggregates in the spec)
    fast = aggregate(
        ds,
        {
            "group_by": ["k"],
            "aggregates": {
                "vs": {"fn": "var", "field": "v"},
                "sp": {"fn": "stddev_pop", "field": "v"},
            },
        },
    ).to_pandas().set_index("k")
    # list path (variance mixed with an exact quantile)
    listp = aggregate(
        ds,
        {
            "group_by": ["k"],
            "aggregates": {
                "vs": {"fn": "var", "field": "v"},
                "sp": {"fn": "stddev_pop", "field": "v"},
                "med": {"fn": "p50", "field": "v"},
            },
        },
    ).to_pandas().set_index("k")
    import pandas as pd

    df = t.to_pandas()
    for k, grp in df.groupby("k"):
        for res in (fast, listp):
            assert abs(res.loc[k, "vs"] - grp.v.var(ddof=1)) < 1e-6
            assert abs(res.loc[k, "sp"] - grp.v.std(ddof=0)) < 1e-6
    # single-row group: sample variance undefined -> null
    one = aggregate(
        rd.from_arrow(pa.table({"k": ["z"], "v": [3.0]})),
        {"group_by": ["k"], "aggregates": {"vs": {"fn": "var", "field": "v"}}},
    ).to_pandas()
    assert one.vs.isna().all()


def test_reduce_extended_merge_strategies(ray_session):
    import ray.data as rd

    from vector_ray.stages.grouped import reduce_

    t = pa.table(
        {
            "k": pa.array(["g", "g", "g"]),
            "ord": pa.array([1, 2, 3], pa.int64()),
            "msg": pa.array(["x", "y", "x"]),
            "arr": pa.array([[1, 2], [3], [4, 5, 6]], pa.list_(pa.int64())),
        }
    )
    out = reduce_(
        rd.from_arrow(t),
        {
            "group_by": ["k"],
            "order_by": ["ord"],
            "merge_strategies": {
                "msg": "concat_newline",
                "arr": "longest_array",
                "ord": "array",
            },
        },
    ).to_pandas()
    assert out.msg[0] == "x\ny\nx"
    assert list(out.arr[0]) == [4, 5, 6]
    assert list(out.ord[0]) == [1, 2, 3]

    out2 = reduce_(
        rd.from_arrow(t),
        {
            "group_by": ["k"],
            "order_by": ["ord"],
            "merge_strategies": {
                "msg": "flat_unique",
                "arr": "shortest_array",
                "ord": "retain",
            },
        },
    ).to_pandas()
    assert sorted(out2.msg[0]) == ["x", "y"]
    assert list(out2.arr[0]) == [3]
    assert out2.ord[0] == 3


def test_tfidf_top_term_hand_computed(ray_session):
    import ray.data as rd

    from vector_ray.functions.text import tfidf_top_term

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(
                ["rare common common", "common common", "rare rare common"]
            ),
        }
    )
    # N=3; df(common)=3 -> idf = ln(4/4)+1 = 1; df(rare)=2 -> ln(4/3)+1
    out = (
        tfidf_top_term(rd.from_arrow(docs).repartition(2))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    idf_rare = np.log(4.0 / 3.0) + 1.0
    # doc0: rare*1 vs common*2 -> common (2.0 > 1.29)
    assert out.loc[0, "top_term"] == "common" and out.loc[0, "tfidf"] == 2.0
    # doc1: only common, tf=2
    assert out.loc[1, "top_term"] == "common"
    # doc2: rare tf=2 (2.58) beats common tf=1
    assert out.loc[2, "top_term"] == "rare"
    assert abs(out.loc[2, "tfidf"] - 2 * idf_rare) < 1e-3


def test_zscore_hand_computed_and_zero_variance(ray_session):
    import ray.data as rd

    from vector_ray.stages.grouped import zscore

    t = pa.table(
        {
            "id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "k": pa.array(["a", "a", "a", "b", "b"]),
            "v": pa.array([1.0, 2.0, 3.0, 7.0, 7.0]),
        }
    )
    out = (
        zscore(
            rd.from_arrow(t).repartition(2),
            {"group_by": "k", "field": "v", "target": "z", "round": 4},
        )
        .to_pandas()
        .set_index("id")
        .sort_index()
    )
    # group a: mean 2, stddev_pop sqrt(2/3)
    sd = np.sqrt(2.0 / 3.0)
    assert abs(out.loc[0, "z"] - (-1.0 / sd)) < 1e-3
    assert abs(out.loc[1, "z"]) < 1e-9
    assert abs(out.loc[2, "z"] - (1.0 / sd)) < 1e-3
    # zero-variance group normalizes to null, not inf
    assert np.isnan(out.loc[3, "z"]) and np.isnan(out.loc[4, "z"])


def test_funnel_strict_ordering(ray_session):
    import ray.data as rd

    from vector_ray.stages.grouped import funnel

    # u1: full funnel in order; u2: click BEFORE view (only view counts);
    # u3: view only; u4: purchase with no view (0 steps)
    rows = [
        ("u1", "view", 1), ("u1", "click", 2), ("u1", "purchase", 3),
        ("u2", "click", 1), ("u2", "view", 2),
        ("u3", "view", 5),
        ("u4", "purchase", 9),
    ]
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows]),
            "event_type": pa.array([r[1] for r in rows]),
            "ts": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    out = (
        funnel(
            rd.from_arrow(t).repartition(3),
            {"group_by": "user_id", "steps": ["view", "click", "purchase"]},
        )
        .to_pandas()
        .set_index("user_id")
        .sort_index()
    )
    assert out.steps_completed.tolist() == [3, 1, 1, 0]


def test_interarrival_gap_stats(ray_session):
    import ray.data as rd

    from vector_ray.stages.grouped import interarrival

    # k1: gaps 2s and 4s (out of order in the input); k2: single event
    t = pa.table(
        {
            "key": pa.array(["k1", "k1", "k2", "k1"]),
            "ts": pa.array(
                [7_000_000, 1_000_000, 5_000_000, 3_000_000],
                pa.timestamp("us"),
            ),
        }
    )
    out = (
        interarrival(
            rd.from_arrow(t).repartition(2),
            {"group_by": "key", "ts_field": "ts"},
        )
        .to_pandas()
        .set_index("key")
        .sort_index()
    )
    assert out.loc["k1", "n_events"] == 3
    assert out.loc["k1", "mean_gap_s"] == 3.0
    assert out.loc["k1", "max_gap_s"] == 4.0
    assert out.loc["k2", "n_events"] == 1
    assert np.isnan(out.loc["k2", "mean_gap_s"])
    assert np.isnan(out.loc["k2", "max_gap_s"])


def test_sessionize_gap_rule(ray_session):
    import ray.data as rd

    from vector_ray.stages.grouped import sessionize

    # k1: events at 0s, 10s, 2000s, 2010s, 5000s with gap_s=1800
    # -> sessions 0,0,1,1,2; tied timestamps share a session
    t = pa.table(
        {
            "key": pa.array(["k1"] * 5 + ["k2", "k2"]),
            "ts": pa.array(
                [0, 10_000_000, 2_000_000_000, 2_010_000_000, 5_000_000_000,
                 7_000_000, 7_000_000],
                pa.timestamp("us"),
            ),
            "eid": pa.array(list(range(7)), pa.int64()),
        }
    )
    out = (
        sessionize(
            rd.from_arrow(t).repartition(3),
            {"group_by": "key", "ts_field": "ts", "gap_s": 1800},
        )
        .to_pandas()
        .sort_values("eid")
    )
    assert out.session_id.tolist() == [0, 0, 1, 1, 2, 0, 0]


def test_cumulative_running_sum(ray_session):
    import ray.data as rd

    from vector_ray.stages.grouped import cumulative

    t = pa.table(
        {
            "key": pa.array(["a", "a", "a", "b"]),
            "ts": pa.array([3, 1, 2, 9], pa.int64()),
            "eid": pa.array([10, 11, 12, 13], pa.int64()),
            "v": pa.array([1.5, 2.0, 4.0, 7.0]),
        }
    )
    out = (
        cumulative(
            rd.from_arrow(t).repartition(2),
            {"group_by": "key", "order_by": ["ts", "eid"], "field": "v"},
        )
        .to_pandas()
        .sort_values("eid")
    )
    # a ordered by ts: eid 11 (2.0), 12 (+4.0=6.0), 10 (+1.5=7.5)
    assert out.rn.tolist() == [3, 1, 2, 1]
    assert out.cum_v.tolist() == [7.5, 2.0, 6.0, 7.0]


def test_rollup_two_keys(ray_session):
    import ray.data as rd

    from vector_ray.stages.grouped import rollup

    t = pa.table(
        {
            "a": pa.array(["x", "x", "y"]),
            "b": pa.array(["p", "q", "p"]),
            "v": pa.array([1.0, 2.0, 4.0]),
        }
    )
    out = rollup(
        rd.from_arrow(t).repartition(2),
        {
            "group_by": ["a", "b"],
            "aggregates": {
                "n": {"fn": "count"},
                "s": {"fn": "sum", "field": "v"},
                "m": {"fn": "mean", "field": "v"},
            },
        },
    ).to_pandas()
    # 3 finest + 2 per-a + 1 grand total
    assert len(out) == 6
    key = out.fillna({"a": "<null>", "b": "<null>"}).set_index(["a", "b"])
    assert key.loc[("x", "p"), "s"] == 1.0
    assert key.loc[("x", "<null>"), "s"] == 3.0
    assert key.loc[("x", "<null>"), "n"] == 2
    assert key.loc[("<null>", "<null>"), "s"] == 7.0
    assert key.loc[("<null>", "<null>"), "n"] == 3
    assert abs(key.loc[("<null>", "<null>"), "m"] - 7.0 / 3) < 1e-9


def test_grouping_sets_holistic(ray_session):
    """Arbitrary sets + non-reaggregatable fns (exact distinct), with
    the SQL GROUPING() bitmask and null-DATA disambiguation."""
    import ray.data as rd

    from vector_ray.stages.grouped import grouping_sets

    t = pa.table(
        {
            "a": pa.array(["x", "x", None, "y"]),
            "b": pa.array(["p", "q", "p", "p"]),
            "u": pa.array([1, 1, 2, 3], pa.int64()),
        }
    )
    out = grouping_sets(
        rd.from_arrow(t).repartition(2),
        {
            "sets": [["a"], ["b"], []],
            "aggregates": {
                "n": {"fn": "count"},
                "nd": {"fn": "count_distinct", "field": "u"},
            },
        },
    ).to_pandas()
    # sets don't overlap-group: 3 a-levels (x, y, null-DATA) + 2
    # b-levels + 1 grand total
    assert len(out) == 6
    # grouping_id: cols ordered (a, b); a aggregated -> bit 1, b -> bit 0
    by = {
        (r.a if isinstance(r.a, str) else None,
         r.b if isinstance(r.b, str) else None,
         int(r.grouping_id)): r
        for r in out.itertuples()
    }
    assert by[("x", None, 1)].n == 2 and by[("x", None, 1)].nd == 1
    # the null-DATA 'a' group is distinct from rollup nulls via gid
    assert by[(None, None, 1)].n == 1 and by[(None, None, 1)].nd == 1
    assert by[(None, "p", 2)].n == 3 and by[(None, "p", 2)].nd == 3
    assert by[(None, None, 3)].n == 4 and by[(None, None, 3)].nd == 3


def test_grouping_sets_null_keys_many_blocks(ray_session):
    """Regression: masked-away key columns inject nulls into the groupby
    shuffle; with enough blocks Ray's sort-boundary code compares key
    tuples in Python and None < str raised TypeError. The fix carries a
    sentinel-filled value plus a __n_ indicator through the shuffle."""
    import ray.data as rd

    from vector_ray.stages.grouped import grouping_sets

    n = 400
    t = pa.table(
        {
            "a": pa.array(
                [None if i % 7 == 0 else f"a{i % 11}" for i in range(n)]
            ),
            "b": pa.array([f"b{i % 5}" for i in range(n)]),
            "v": pa.array([float(i % 13) for i in range(n)]),
        }
    )
    out = grouping_sets(
        rd.from_arrow(t).repartition(16),
        {
            "sets": [["a", "b"], ["a"], ["b"], []],
            "aggregates": {
                "n": {"fn": "count"},
                "s": {"fn": "sum", "field": "v"},
            },
        },
    ).to_pandas()
    # grand total row: everything aggregated away (gid = 0b11 = 3)
    total = out[out.grouping_id == 3]
    assert len(total) == 1 and int(total.n.iloc[0]) == n
    # per-a rollup keeps the null-DATA 'a' group distinct
    a_rows = out[out.grouping_id == 1]
    assert int(a_rows.n.sum()) == n
    assert a_rows.a.isna().sum() == 1  # the real-null a group
    # full (a, b) detail sums to the corpus too
    ab = out[out.grouping_id == 0]
    assert int(ab.n.sum()) == n
    assert abs(out[out.grouping_id == 2].s.sum() - t["v"].to_pandas().sum()) < 1e-9


def test_grouping_sets_generators_and_validation(ray_session):
    import pytest
    import ray.data as rd

    from vector_ray.stages.grouped import (
        cube_sets,
        grouping_sets,
        rollup_sets,
    )

    assert rollup_sets(["a", "b"]) == [["a", "b"], ["a"], []]
    assert cube_sets(["a", "b"]) == [["a", "b"], ["a"], ["b"], []]
    ds = rd.from_arrow(pa.table({"a": ["x"]}))
    with pytest.raises(ValueError, match="at least one set"):
        grouping_sets(ds, {"sets": [], "aggregates": {"n": {"fn": "count"}}})
    with pytest.raises(ValueError, match="name a column"):
        grouping_sets(
            ds, {"sets": [[]], "aggregates": {"n": {"fn": "count"}}}
        )


def test_pivot_sum_mode(ray_session):
    import ray.data as rd

    from vector_ray.stages.grouped import pivot

    t = pa.table(
        {
            "k": pa.array(["u", "u", "u", "w"]),
            "cat": pa.array(["view", "click", "view", "click"]),
            "v": pa.array([1.0, 10.0, 2.0, 5.0]),
        }
    )
    out = pivot(
        rd.from_arrow(t).repartition(2),
        {"group_by": "k", "pivot": "cat", "values": ["view", "click"],
         "fn": "sum", "field": "v", "prefix": "s_"},
    ).to_pandas().set_index("k").sort_index()
    assert out.loc["u", "s_view"] == 3.0 and out.loc["u", "s_click"] == 10.0
    assert out.loc["w", "s_view"] == 0.0 and out.loc["w", "s_click"] == 5.0


def test_explode_nulls_and_empties(ray_session):
    import ray.data as rd

    from vector_ray.stages.reshape import explode

    t = pa.table(
        {
            "id": pa.array([1, 2, 3, 4], pa.int64()),
            "xs": pa.array([[10, 20], [], None, [30]], pa.list_(pa.int32())),
        }
    )
    out = (
        explode(
            rd.from_arrow(t).repartition(2),
            {"field": "xs", "keep": ["id"], "index_field": "pos",
             "target": "x"},
        )
        .to_pandas()
        .sort_values(["id", "pos"])
    )
    assert out.id.tolist() == [1, 1, 4]
    assert out.pos.tolist() == [0, 1, 0]
    assert out.x.tolist() == [10, 20, 30]


def test_rank_modes_and_ties(ray_session):
    import ray.data as rd

    from vector_ray.stages.reshape import rank

    t = pa.table(
        {
            "g": pa.array(["a"] * 4),
            "v": pa.array([5.0, 7.0, 7.0, 9.0]),
            "i": pa.array([0, 1, 2, 3], pa.int64()),
        }
    )
    for mode, want in [
        ("rank", [4, 2, 2, 1]),
        ("dense_rank", [3, 2, 2, 1]),
        ("percent_rank", [1.0, 1 / 3, 1 / 3, 0.0]),
    ]:
        out = (
            rank(
                rd.from_arrow(t).repartition(2),
                {"group_by": "g", "order_by": "v", "descending": True,
                 "mode": mode, "target": "r"},
            )
            .to_pandas()
            .sort_values("i")
        )
        assert out.r.tolist() == want, mode


def test_lag_delta_and_unpivot(ray_session):
    import ray.data as rd

    from vector_ray.stages.reshape import lag_delta, unpivot

    t = pa.table(
        {
            "k": pa.array(["a", "a", "a"]),
            "ts": pa.array([1, 2, 3], pa.int64()),
            "v": pa.array([10.0, 7.0, 12.0]),
        }
    )
    out = (
        lag_delta(
            rd.from_arrow(t).repartition(2),
            {"group_by": "k", "order_by": ["ts"], "field": "v",
             "target": "d"},
        )
        .to_pandas()
        .sort_values("ts")
    )
    assert np.isnan(out.d.tolist()[0])
    assert out.d.tolist()[1:] == [-3.0, 5.0]

    w = pa.table({"id": pa.array([1], pa.int64()),
                  "x": pa.array([2], pa.int64()),
                  "y": pa.array([3.5])})
    long = unpivot(
        rd.from_arrow(w),
        {"id_fields": ["id"], "fields": ["x", "y"], "key_field": "m",
         "value_field": "val"},
    ).to_pandas().sort_values("m")
    assert long.m.tolist() == ["x", "y"]
    assert long.val.tolist() == [2.0, 3.5]


def test_ntile_bucket_sizes(ray_session):
    import ray.data as rd

    from vector_ray.stages.reshape import rank

    # n=10, k=4 -> bucket sizes 3,3,2,2; n=2, k=4 -> buckets 1,2
    t = pa.table(
        {
            "g": pa.array(["a"] * 10 + ["b"] * 2),
            "i": pa.array(list(range(10)) + [0, 1], pa.int64()),
        }
    )
    out = (
        rank(
            rd.from_arrow(t).repartition(3),
            {"group_by": "g", "order_by": "i", "mode": "ntile",
             "n_buckets": 4, "target": "q"},
        )
        .to_pandas()
        .sort_values(["g", "i"])
    )
    a = out[out.g == "a"].q.tolist()
    assert a == [1, 1, 1, 2, 2, 2, 3, 3, 4, 4]
    assert out[out.g == "b"].q.tolist() == [1, 2]


def test_profile_columns_nulls(ray_session):
    import ray.data as rd

    from vector_ray.functions.dataops import profile_columns

    t = pa.table(
        {
            "a": pa.array([1, 1, None, 3], pa.int64()),
            "b": pa.array(["x", None, None, "x"]),
        }
    )
    out = (
        profile_columns(rd.from_arrow(t).repartition(2), ["a", "b"])
        .to_pandas()
        .set_index("column")
    )
    assert out.loc["a", "n"] == 4 and out.loc["a", "n_null"] == 1
    assert out.loc["a", "n_distinct"] == 2
    assert out.loc["b", "n_null"] == 2 and out.loc["b", "n_distinct"] == 1


def test_corpus_diff_statuses(ray_session):
    import ray.data as rd

    from vector_ray.functions.dataops import corpus_diff

    old = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "fp": pa.array(["a", "b", "c"]),
        }
    )
    new = pa.table(
        {
            "doc_id": pa.array([2, 3, 4], pa.int64()),
            "fp": pa.array(["b", "CHANGED", "d"]),
        }
    )
    out = (
        corpus_diff(rd.from_arrow(old), rd.from_arrow(new), num_buckets=4)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.status.to_dict() == {1: "removed", 3: "changed", 4: "added"}


def test_profile_columns_approx_hll(ray_session):
    import ray.data as rd

    from vector_ray.functions.dataops import profile_columns

    t = pa.table({"a": pa.array(list(range(2000)) * 2, pa.int64())})
    out = (
        profile_columns(rd.from_arrow(t).repartition(4), ["a"], approx=True)
        .to_pandas()
        .set_index("column")
    )
    assert out.loc["a", "n"] == 4000
    # HLL with 2^14 registers: well within a few % at 2k distinct
    assert abs(out.loc["a", "n_distinct"] - 2000) / 2000 < 0.05


def test_log_templates_masks_and_counts(ray_session):
    import ray.data as rd

    from vector_ray.stages.reshape import log_templates

    t = pa.table(
        {
            "message": pa.array(
                [
                    "conn from 10.0.0.1 port 443",
                    "conn from 10.0.0.99 port 80",
                    "disk full on /dev/sda1",
                ]
            )
        }
    )
    out = (
        log_templates(
            rd.from_arrow(t).repartition(2),
            {"field": "message", "masks": [["[0-9]+", "<N>"]]},
        )
        .to_pandas()
        .set_index("template")
        .sort_index()
    )
    assert out.loc["conn from <N>.<N>.<N>.<N> port <N>", "n"] == 2
    assert (
        out.loc["conn from <N>.<N>.<N>.<N> port <N>", "example"]
        == "conn from 10.0.0.1 port 443"
    )
    assert out.loc["disk full on /dev/sda<N>", "n"] == 1


def test_rank_multi_column_order(ray_session):
    import ray.data as rd

    from vector_ray.stages.reshape import rank

    # order by (v, w): (1,1), (1,1), (1,2), (2,1) -> dense ranks 1,1,2,3
    t = pa.table(
        {
            "g": pa.array(["a"] * 4),
            "v": pa.array([1, 1, 1, 2], pa.int64()),
            "w": pa.array([1, 1, 2, 1], pa.int64()),
            "i": pa.array([0, 1, 2, 3], pa.int64()),
        }
    )
    out = (
        rank(
            rd.from_arrow(t).repartition(2),
            {"group_by": "g", "order_by": ["v", "w"], "mode": "dense_rank",
             "target": "r"},
        )
        .to_pandas()
        .sort_values("i")
    )
    assert out.r.tolist() == [1, 1, 2, 3]


def test_cube_and_grouping_sets(ray_session):
    import ray.data as rd

    from vector_ray.stages.grouped import rollup

    t = pa.table(
        {
            "a": pa.array(["x", "x", "y"]),
            "b": pa.array(["p", "q", "p"]),
            "v": pa.array([1.0, 2.0, 4.0]),
        }
    )
    cube = rollup(
        rd.from_arrow(t).repartition(2),
        {"group_by": ["a", "b"], "mode": "cube",
         "aggregates": {"s": {"fn": "sum", "field": "v"}}},
    ).to_pandas()
    # 3 finest + 2 per-a + 2 per-b + 1 total = 8
    assert len(cube) == 8
    k = cube.fillna({"a": "-", "b": "-"}).set_index(["a", "b"])
    assert k.loc[("-", "p"), "s"] == 5.0  # per-b level (cube-only)
    assert k.loc[("-", "-"), "s"] == 7.0

    sets = rollup(
        rd.from_arrow(t).repartition(2),
        {"group_by": ["a", "b"], "mode": "sets", "sets": [["b"]],
         "aggregates": {"s": {"fn": "sum", "field": "v"}}},
    ).to_pandas()
    # ONLY the requested set appears
    assert len(sets) == 2 and sets.a.isna().all()
    assert sorted(sets.s.tolist()) == [2.0, 5.0]


def test_calendar_window_units(ray_session):
    import datetime

    import ray.data as rd

    from vector_ray.stages.window import window

    ts = [
        datetime.datetime(2026, 1, 31, 23, 59),
        datetime.datetime(2026, 2, 1, 0, 1),
        datetime.datetime(2026, 2, 15, 12, 0),
    ]
    t = pa.table({"ts": pa.array(ts, pa.timestamp("us")),
                  "v": pa.array([1.0, 2.0, 3.0])})
    out = (
        window(
            rd.from_arrow(t).repartition(2),
            {"type": "calendar", "unit": "month", "ts_field": "ts",
             "aggregates": {"n": {"fn": "count"}}},
        )
        .to_pandas()
        .sort_values("window_start")
    )
    assert out.n.tolist() == [1, 2]  # Jan: 1 event, Feb: 2 events
    assert out.window_start.dt.day.tolist() == [1, 1]


def test_rank_string_order_with_nulls(ray_session):
    import ray.data as rd

    from vector_ray.stages.reshape import rank

    t = pa.table(
        {
            "g": pa.array(["a"] * 4),
            "s": pa.array(["beta", None, "alpha", "beta"]),
            "i": pa.array([0, 1, 2, 3], pa.int64()),
        }
    )
    out = (
        rank(
            rd.from_arrow(t).repartition(2),
            {"group_by": "g", "order_by": "s", "mode": "dense_rank",
             "target": "r"},
        )
        .to_pandas()
        .sort_values("i")
    )
    # alpha=1, beta=2 (tie), null last=3
    assert out.r.tolist() == [2, 3, 1, 2]


def test_dsir_prefers_target_like_docs(ray_session):
    import ray.data as rd

    from vector_ray.functions.lm import dsir_score

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    "alpha alpha beta",     # target-like
                    "alpha beta beta",      # target-like
                    "gamma delta gamma",    # corpus-only
                    "delta delta gamma",    # corpus-only
                ]
            ),
        }
    )
    target = pa.table({"text": pa.array(["alpha beta alpha", "alpha beta"])})
    out = (
        dsir_score(
            rd.from_arrow(docs).repartition(2),
            rd.from_arrow(target),
            vocab_size=10,
        )
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # docs made of target words score higher than corpus-only docs
    assert min(out.loc[1, "logratio"], out.loc[2, "logratio"]) > max(
        out.loc[3, "logratio"], out.loc[4, "logratio"]
    )


def test_training_batches_shapes_and_determinism(ray_session):
    from vector_ray.functions.tokens import pack_sequences, training_batches
    from vector_ray.pipelines import flagship as _fl

    import os

    from vector_ray import datagen

    seq_dir = datagen.ensure_corpus("sf0.001")
    chunks = pack_sequences(_fl.list_input_files(seq_dir), chunk_len=128)
    mats = list(training_batches(chunks, batch_size=4, chunk_len=128))
    assert mats, "no batches yielded"
    for m in mats:
        assert m.shape == (4, 128) and m.dtype == np.int32
    # deterministic across iterations
    chunks2 = pack_sequences(_fl.list_input_files(seq_dir), chunk_len=128)
    mats2 = list(training_batches(chunks2, batch_size=4, chunk_len=128))
    assert len(mats) == len(mats2)
    assert all((a == b).all() for a, b in zip(mats, mats2))
    # epoch shuffle changes the order but not the multiset of chunks
    chunks3 = pack_sequences(_fl.list_input_files(seq_dir), chunk_len=128)
    mats3 = list(training_batches(chunks3, batch_size=4, chunk_len=128, epoch=1))
    assert len(mats3) == len(mats)
    flat = sorted(tuple(r) for m in mats for r in m)
    flat3 = sorted(tuple(r) for m in mats3 for r in m)
    assert flat == flat3
    assert any((a != b).any() for a, b in zip(mats, mats3))


def test_quantile_bucket_boundaries(ray_session):
    import ray.data as rd

    from vector_ray.stages.grouped import quantile_bucket

    # values 1..8: quartile thresholds 2.75, 4.5, 6.25
    t = pa.table(
        {
            "i": pa.array(list(range(8)), pa.int64()),
            "v": pa.array([float(x) for x in range(1, 9)]),
        }
    )
    out = (
        quantile_bucket(
            rd.from_arrow(t).repartition(3),
            {"field": "v", "buckets": 4, "target": "q"},
        )
        .to_pandas()
        .sort_values("i")
    )
    assert out.q.tolist() == [1, 1, 2, 2, 3, 3, 4, 4]


def test_rank_per_column_directions(ray_session):
    import ray.data as rd

    from vector_ray.stages.reshape import rank

    # order by (v DESC, w ASC): rows (1,9) (2,1) (2,3) -> v=2 first
    t = pa.table(
        {
            "g": pa.array(["a"] * 3),
            "v": pa.array([1, 2, 2], pa.int64()),
            "w": pa.array([9, 3, 1], pa.int64()),
            "i": pa.array([0, 1, 2], pa.int64()),
        }
    )
    out = (
        rank(
            rd.from_arrow(t).repartition(2),
            {"group_by": "g", "order_by": ["v", "w"],
             "descending": [True, False], "mode": "rank", "target": "r"},
        )
        .to_pandas()
        .sort_values("i")
    )
    # order: (2,1) rank1, (2,3) rank2, (1,9) rank3
    assert out.r.tolist() == [3, 2, 1]


def test_dsir_spec_transform(ray_session):
    from vector_ray import run_pipeline

    res = run_pipeline({
        "sources": {"docs": {"type": "parquet",
                             "path": "/root/testdata/sf0.001/documents.parquet",
                             "columns": ["doc_id", "text", "lang"]}},
        "transforms": {"scored": {"type": "dsir", "inputs": ["docs"],
                                  "field": "text",
                                  "target_condition": '.lang == "en"'}},
        "sinks": {"out": {"type": "blackhole", "inputs": ["scored"]}},
    })
    # every doc scored (the condition selects the TARGET slice, not output)
    assert res.sinks["out"].count == 500


def test_heavy_hitters_exact_vs_bruteforce(ray_session):
    """Misra-Gries candidates + exact verify must reproduce the exact
    (count desc, word asc) top-k on a skewed corpus, prove it, and
    refuse to claim exactness on a uniform corpus at tiny capacity."""
    from collections import Counter

    import numpy as np
    import ray.data as rd

    from vector_ray.functions.lm import heavy_hitters

    rng = np.random.default_rng(17)
    docs = [
        " ".join(f"w{int(i)}" for i in rng.zipf(1.35, size=30) % 2000)
        for _ in range(300)
    ]
    t = pa.table({"doc_id": [f"d{i}" for i in range(300)], "text": docs})
    top, exact = heavy_hitters(
        rd.from_arrow(t).repartition(6), field="text", k=12, capacity=128
    )
    assert exact is True
    cnt = Counter(w for d in docs for w in d.split(" "))
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:12]
    assert list(zip(top["word"].to_pylist(), top["n"].to_pylist())) == want

    # uniform corpus at starved capacity: flag must go False, not lie
    udocs = [
        " ".join(f"u{rng.integers(0, 4000)}" for _ in range(25))
        for _ in range(150)
    ]
    ut = pa.table({"doc_id": [f"d{i}" for i in range(150)], "text": udocs})
    _, exact2 = heavy_hitters(
        rd.from_arrow(ut).repartition(6), field="text", k=10, capacity=16
    )
    assert exact2 is False
