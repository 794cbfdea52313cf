"""Round-5 additions: k-anonymity audit/suppression, Kneser–Ney
byte-bigram LM scoring, product quantization (codes + ADC top-k), and
the deflate compression-ratio quality signal. Each checked against a
hand reference on tiny fixtures plus degenerate-input behavior.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data as rd


def _collect(ds) -> pa.Table:
    tables = [t for t in ray.get(ds.materialize().to_arrow_refs()) if t.num_rows]
    return pa.concat_tables(tables, promote_options="default") if tables else pa.table({})


# ---------------------------------------------------------------------------
# kanonymity
# ---------------------------------------------------------------------------


def _people_ds(num_blocks=3):
    # QI = (city, age): ("a", 30) x 4 rows, ("b", 30) x 2, ("b", 40) x 1
    rows = [
        (1, "a", 30), (2, "a", 30), (3, "a", 30), (4, "a", 30),
        (5, "b", 30), (6, "b", 30), (7, "b", 40),
    ]
    return rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "city": pa.array([r[1] for r in rows], pa.string()),
                "age": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
    ).repartition(num_blocks)


def test_kanonymity_audit(ray_session):
    from vector_ray.functions.dataops import kanonymity

    out = _collect(
        kanonymity(_people_ds(), ["city", "age"], k=3, mode="audit")
    )
    got = {
        (c, a): (n, r)
        for c, a, n, r in zip(
            out["city"].to_pylist(), out["age"].to_pylist(),
            out["n"].to_pylist(), out["at_risk"].to_pylist(),
        )
    }
    assert got == {
        ("a", 30): (4, False),
        ("b", 30): (2, True),
        ("b", 40): (1, True),
    }


def test_kanonymity_suppress(ray_session):
    from vector_ray.functions.dataops import kanonymity

    out = _collect(
        kanonymity(_people_ds(), ["city", "age"], k=3, mode="suppress",
                   id_field="event_id")
    )
    by_id = {
        i: (c, a)
        for i, c, a in zip(
            out["event_id"].to_pylist(), out["city"].to_pylist(),
            out["age"].to_pylist(),
        )
    }
    assert len(by_id) == 7
    # the k>=3 group survives intact; both risky groups are masked
    for i in (1, 2, 3, 4):
        assert by_id[i] == ("a", 30)
    for i in (5, 6, 7):
        assert by_id[i] == ("*", -1)


def test_kanonymity_bad_mode(ray_session):
    from vector_ray.functions.dataops import kanonymity

    with pytest.raises(ValueError):
        kanonymity(_people_ds(), ["city"], k=2, mode="nope")


# ---------------------------------------------------------------------------
# Kneser-Ney bigram LM
# ---------------------------------------------------------------------------


def test_kn_bigram_hand_reference(ray_session):
    from vector_ray.functions.lm import kn_bigram_score

    docs = {
        "d1": [1, 2, 1, 2, 3],
        "d2": [2, 1, 2],
        "d3": [7],              # unscorable, must drop
    }
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(docs), pa.string()),
                "tokens": pa.array(list(docs.values()), pa.list_(pa.int32())),
            }
        )
    ).repartition(2)
    out = _collect(kn_bigram_score(ds))
    got = dict(zip(out["doc_id"].to_pylist(), out["nll_kn"].to_pylist()))

    # straight-line reference
    pairs = []
    for toks in docs.values():
        b = [t % 256 for t in toks]
        pairs += list(zip(b[:-1], b[1:]))
    from collections import Counter

    c2 = Counter(pairs)
    c1 = Counter()
    nf = Counter()
    nr = Counter()
    for (pv, cu), n in c2.items():
        c1[pv] += n
        nf[pv] += 1
        nr[cu] += 1
    tt = float(len(c2))
    want = {}
    for did, toks in docs.items():
        b = [t % 256 for t in toks]
        if len(b) < 2:
            continue
        lps = []
        for pv, cu in zip(b[:-1], b[1:]):
            p = (c2[(pv, cu)] - 0.75) / c1[pv] \
                + 0.75 * nf[pv] / c1[pv] * (nr[cu] / tt)
            lps.append(math.log(p))
        nll = -(sum(lps) / len(lps))

        def rha(x, nd):
            scale = 10.0 ** nd
            return math.copysign(math.floor(abs(x) * scale + 0.5) / scale, x)

        want[did] = rha(rha(nll, 9), 4)
    assert set(got) == {"d1", "d2"}
    for did in want:
        assert got[did] == pytest.approx(want[did], abs=1e-9)


def test_kn_bigram_probabilities_sum_sane(ray_session):
    # KN probabilities over observed events must be in (0, 1]
    from vector_ray.functions.lm import kn_bigram_score

    rng = np.random.default_rng(5)
    toks = [rng.integers(0, 50, size=rng.integers(2, 30)).tolist()
            for _ in range(40)]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([f"d{i}" for i in range(len(toks))]),
                "tokens": pa.array(toks, pa.list_(pa.int32())),
            }
        )
    ).repartition(3)
    out = _collect(kn_bigram_score(ds))
    nll = np.asarray(out["nll_kn"].to_pylist())
    assert len(nll) == len(toks)
    assert (nll >= 0).all()          # -log p >= 0 for p <= 1
    assert np.isfinite(nll).all()


# ---------------------------------------------------------------------------
# product quantization
# ---------------------------------------------------------------------------


def _emb_ds(n=64, d=16, seed=9, num_blocks=4):
    rng = np.random.default_rng(seed)
    mat = rng.normal(size=(n, d))
    return rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n), pa.int64()),
                "embedding": pa.array(
                    [row.tolist() for row in mat], pa.list_(pa.float32())
                ),
            }
        )
    ).repartition(num_blocks), mat


def test_pq_codes_shape_and_determinism(ray_session):
    from vector_ray.functions.similarity import pq_codes

    ds, _ = _emb_ds()
    a = _collect(pq_codes(ds, m=4, k=8, sample_size=32, iters=2))
    b = _collect(pq_codes(ds, m=4, k=8, sample_size=32, iters=2))
    assert a.num_rows == 64
    codes = a["code"].to_pylist()
    assert all(len(c) == 4 for c in codes)
    assert all(0 <= v < 8 for c in codes for v in c)
    da = dict(zip(a["vec_id"].to_pylist(), a["code"].to_pylist()))
    db = dict(zip(b["vec_id"].to_pylist(), b["code"].to_pylist()))
    assert da == db  # bit-for-bit deterministic across runs


def test_pq_topk_self_query_first(ray_session):
    from vector_ray.functions.similarity import pq_topk

    ds, mat = _emb_ds()
    out = _collect(pq_topk(ds, mat[0], k=5, m=4, n_centroids=8,
                           sample_size=32, iters=2))
    ids = out["vec_id"].to_pylist()
    dists = out["dist"].to_pylist()
    assert len(ids) == 5
    # the query vector's own code minimizes its own ADC distance
    assert ids[0] == 0
    assert dists == sorted(dists)
    assert all(isinstance(v, int) and v >= 0 for v in dists)


def test_pq_dim_not_divisible_raises(ray_session):
    from vector_ray.functions.similarity import pq_topk

    ds, mat = _emb_ds(d=15)
    with pytest.raises(ValueError):
        _collect(pq_topk(ds, mat[0], m=4, sample_size=16))


# ---------------------------------------------------------------------------
# compression ratio
# ---------------------------------------------------------------------------


def test_compression_ratio_ordering(ray_session):
    from vector_ray.functions.text import compression_ratio

    rng = np.random.default_rng(3)
    noisy = "".join(chr(33 + int(v)) for v in rng.integers(0, 90, size=400))
    docs = {
        1: "spam " * 80,        # highly compressible boilerplate
        2: noisy,               # near-incompressible noise
        3: "",                  # empty -> ratio 0
    }
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(docs), pa.int64()),
                "text": pa.array(list(docs.values()), pa.string()),
            }
        )
    ).repartition(2)
    out = _collect(compression_ratio(ds))
    got = {
        i: (nr, nc, r)
        for i, nr, nc, r in zip(
            out["doc_id"].to_pylist(), out["n_raw"].to_pylist(),
            out["n_comp"].to_pylist(), out["ratio"].to_pylist(),
        )
    }
    assert got[1][2] < 0.1          # boilerplate compresses hard
    assert got[2][2] > 0.5          # noise barely compresses
    assert got[3] == (0, len(__import__("zlib").compress(b"", 6)), 0.0)
    import zlib

    for i, text in docs.items():
        raw = text.encode()
        assert got[i][0] == len(raw)
        assert got[i][1] == len(zlib.compress(raw, 6))


# ---------------------------------------------------------------------------
# hbos_score
# ---------------------------------------------------------------------------


def test_hbos_hand_reference(ray_session):
    from vector_ray.functions.dataops import hbos_score

    # feature f1: bucket 0 x 3 rows, bucket 1 x 1; f2: bucket 5 x 2, 7 x 2
    rows = [(1, 0, 5), (2, 0, 5), (3, 0, 7), (4, 1, 7)]
    ds = rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "f1": pa.array([r[1] for r in rows], pa.int64()),
                "f2": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
    ).repartition(2)
    out = _collect(hbos_score(ds, ["f1", "f2"]))
    got = dict(zip(out["event_id"].to_pylist(), out["hbos"].to_pylist()))
    c1 = {0: 3, 1: 1}
    c2 = {5: 2, 7: 2}

    def rha(x, nd):
        scale = 10.0 ** nd
        return math.copysign(math.floor(abs(x) * scale + 0.5) / scale, x)

    for eid, b1, b2 in rows:
        want = -(math.log(c1[b1] / 4.0) + math.log(c2[b2] / 4.0))
        assert got[eid] == pytest.approx(rha(rha(want, 9), 6), abs=1e-9)
    # the (1, 7) row is the rarest combination -> highest score
    assert got[4] == max(got.values())


# ---------------------------------------------------------------------------
# hard_negatives
# ---------------------------------------------------------------------------


def test_hard_negatives_hand_reference(ray_session):
    from vector_ray.functions.similarity import hard_negatives

    # two orthogonal label-0 axes plus label-1 vectors at known angles
    vecs = {
        0: ([1.0, 0.0, 0.0, 0.0], 0),
        1: ([0.0, 1.0, 0.0, 0.0], 0),
        2: ([0.9, 0.1, 0.0, 0.0], 1),   # closest label-1 to vec 0
        3: ([0.1, 0.9, 0.0, 0.0], 1),   # closest label-1 to vec 1
        4: ([0.0, 0.0, 1.0, 0.0], 1),
    }
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(list(vecs), pa.int64()),
                "embedding": pa.array(
                    [v for v, _ in vecs.values()], pa.list_(pa.float32())
                ),
                "label": pa.array([l for _, l in vecs.values()], pa.int32()),
            }
        )
    ).repartition(2)
    out = _collect(hard_negatives(ds, n_anchors=5))
    got = {a: c for a, c in zip(out["aid"].to_pylist(), out["cand"].to_pylist())}
    assert got[0] == 2
    assert got[1] == 3
    # anchors of label 1 must pick a label-0 vector
    for a in (2, 3, 4):
        assert vecs[got[a]][1] == 0


def test_hard_negatives_single_label_empty(ray_session):
    from vector_ray.functions.similarity import hard_negatives

    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([0, 1, 2], pa.int64()),
                "embedding": pa.array(
                    [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]], pa.list_(pa.float32())
                ),
                "label": pa.array([7, 7, 7], pa.int32()),
            }
        )
    ).repartition(2)
    out = _collect(hard_negatives(ds, n_anchors=3))
    assert out.num_rows == 0  # no cross-label pair exists


# ---------------------------------------------------------------------------
# spec-DAG wiring for the round-5 transform family
# ---------------------------------------------------------------------------


def test_spec_transforms_round5(ray_session):
    from vector_ray import run_pipeline

    rows = [
        {"event_id": i, "city": "a" if i < 8 else "b", "age": 30}
        for i in range(10)
    ]
    out = run_pipeline(
        {
            "sources": {"in": {"type": "inline", "rows": rows}},
            "transforms": {
                "kan": {"type": "kanonymity", "inputs": ["in"],
                        "quasi": ["city", "age"], "k": 3},
                "hb": {"type": "hbos", "inputs": ["in"],
                       "features": ["age"], "id_field": "event_id"},
            },
            "sinks": {
                "a": {"type": "collect", "inputs": ["kan"]},
                "h": {"type": "collect", "inputs": ["hb"]},
            },
        }
    ).sinks
    kan = out["a"].table
    assert set(kan.column_names) == {"city", "age", "n", "at_risk"}
    assert kan.num_rows == 2
    hb = out["h"].table
    assert hb.num_rows == 10 and "hbos" in hb.column_names

    docs = [{"doc_id": i, "text": "xyz " * (i + 1)} for i in range(6)]
    out2 = run_pipeline(
        {
            "sources": {"d": {"type": "inline", "rows": docs}},
            "transforms": {
                "cr": {"type": "compression_ratio", "inputs": ["d"]},
            },
            "sinks": {"o": {"type": "collect", "inputs": ["cr"]}},
        }
    ).sinks["o"].table
    assert out2.num_rows == 6 and "ratio" in out2.column_names


def test_explain_classifies_round5(ray_session):
    from vector_ray.explain import explain

    plan = explain(
        {
            "sources": {"in": {"type": "inline", "rows": [{"x": 1}]}},
            "transforms": {
                "k": {"type": "kanonymity", "inputs": ["in"], "quasi": ["x"]},
                "h": {"type": "hbos", "inputs": ["k"], "features": ["x"]},
            },
            "sinks": {"o": {"type": "collect", "inputs": ["h"]}},
        }
    )
    assert "hybrid" in plan and "broadcast" in plan


# ---------------------------------------------------------------------------
# negative_samples
# ---------------------------------------------------------------------------


def test_negative_samples_distribution_and_determinism(ray_session):
    from vector_ray.functions.tokens import negative_samples

    # token 7 dominates the corpus; draws must be ~proportional to c^0.75
    toks = [[7] * 50 + [11, 13] for _ in range(200)]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([f"doc-{i:05d}" for i in range(200)]),
                "tokens": pa.array(toks, pa.list_(pa.int32())),
            }
        )
    ).repartition(4)
    a = _collect(negative_samples(ds, k=4))
    b = _collect(negative_samples(ds.repartition(7), k=4))
    assert a.num_rows == 800
    da = sorted(zip(a["doc_id"].to_pylist(), a["j"].to_pylist(),
                    a["neg"].to_pylist()))
    db = sorted(zip(b["doc_id"].to_pylist(), b["j"].to_pylist(),
                    b["neg"].to_pylist()))
    assert da == db  # partitioning-invariant draws
    negs = a["neg"].to_pylist()
    assert set(negs) <= {7, 11, 13}  # only observed tokens drawn
    share7 = negs.count(7) / len(negs)
    # weights: 10000^0.75 : 200^0.75 : 200^0.75 -> token 7 share ~ 0.90
    import math

    w7 = math.floor((200 * 50) ** 0.75 * 1000 + 0.5)
    wo = math.floor(200 ** 0.75 * 1000 + 0.5)
    expect = w7 / (w7 + 2 * wo)
    assert abs(share7 - expect) < 0.05


def test_negative_samples_empty_raises(ray_session):
    from vector_ray.functions.tokens import negative_samples

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([], pa.string()),
                "tokens": pa.array([], pa.list_(pa.int32())),
            }
        )
    )
    with pytest.raises(ValueError):
        negative_samples(ds)


# ---------------------------------------------------------------------------
# skipgram_pairs
# ---------------------------------------------------------------------------


def test_skipgram_hand_reference(ray_session):
    from vector_ray.functions.tokens import skipgram_pairs

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(["a", "b"]),
                "tokens": pa.array([[10, 20, 30], [5]], pa.list_(pa.int32())),
            }
        )
    ).repartition(2)
    out = _collect(skipgram_pairs(ds, window=2))
    got = sorted(
        zip(out["doc_id"].to_pylist(), out["i"].to_pylist(),
            out["c"].to_pylist(), out["ctx"].to_pylist(),
            out["d"].to_pylist())
    )
    want = sorted([
        ("a", 1, 10, 20, 1), ("a", 2, 20, 10, -1),
        ("a", 2, 20, 30, 1), ("a", 3, 30, 20, -1),
        ("a", 1, 10, 30, 2), ("a", 3, 30, 10, -2),
    ])
    assert got == want  # single-token doc "b" emits nothing


def test_skipgram_never_crosses_docs(ray_session):
    from vector_ray.functions.tokens import skipgram_pairs

    # many single-token docs in one block: zero cross-doc pairs allowed
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([f"d{i}" for i in range(20)]),
                "tokens": pa.array([[i] for i in range(20)],
                                   pa.list_(pa.int32())),
            }
        )
    ).repartition(1)
    out = _collect(skipgram_pairs(ds, window=3))
    assert out.num_rows == 0


# ---------------------------------------------------------------------------
# keep_best
# ---------------------------------------------------------------------------


def test_keep_best_hand_reference(ray_session):
    from vector_ray.functions.dedup import keep_best

    cc = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 7, 8], pa.int64()),
                "cluster": pa.array([1, 1, 1, 7, 7], pa.int64()),
            }
        )
    ).repartition(2)
    quality = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 7, 8], pa.int64()),
                "n_chars": pa.array([10, 99, 99, 5, 5], pa.int64()),
            }
        )
    ).repartition(3)
    out = _collect(keep_best(cc, quality))
    got = {
        i: k for i, k in zip(out["doc_id"].to_pylist(),
                             out["kept"].to_pylist())
    }
    # cluster 1: docs 2 and 3 tie at 99 -> smaller id 2 wins
    # cluster 7: docs 7 and 8 tie at 5 -> smaller id 7 wins
    assert got == {1: False, 2: True, 3: False, 7: True, 8: False}


# ---------------------------------------------------------------------------
# mode_per_key
# ---------------------------------------------------------------------------


def test_mode_per_key_hand_reference(ray_session):
    from vector_ray.stages.shuffle import mode_per_key

    rows = [
        (1, "a"), (1, "a"), (1, "b"),           # user 1: a wins 2/3
        (2, "x"), (2, "y"),                     # user 2: tie -> "x"
        (3, "z"),                               # user 3: unanimous
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    ).repartition(3)
    out = _collect(mode_per_key(ds, key="user_id", field="event_type"))
    got = {
        u: (l, nv, nt, ag)
        for u, l, nv, nt, ag in zip(
            out["user_id"].to_pylist(), out["event_type"].to_pylist(),
            out["n_votes"].to_pylist(), out["n_total"].to_pylist(),
            out["agreement"].to_pylist(),
        )
    }
    assert got[1] == ("a", 2, 3, 0.666667)
    assert got[2] == ("x", 1, 2, 0.5)
    assert got[3] == ("z", 1, 1, 1.0)


# ---------------------------------------------------------------------------
# training_batches mid-epoch resume
# ---------------------------------------------------------------------------


def _chunks_ds(n=40, chunk_len=8):
    rng = np.random.default_rng(2)
    return rd.from_arrow(
        pa.table(
            {
                "chunk_id": pa.array(np.arange(n), pa.int64()),
                "tokens": pa.array(
                    [rng.integers(0, 100, size=chunk_len).tolist()
                     for _ in range(n)],
                    pa.list_(pa.int32()),
                ),
            }
        )
    ).repartition(4)


@pytest.mark.parametrize("epoch", [None, 1])
def test_training_batches_resume(ray_session, epoch):
    from vector_ray.functions.tokens import training_batches

    ds = _chunks_ds()
    full = list(training_batches(ds, batch_size=4, chunk_len=8,
                                 epoch=epoch, yield_ids=True))
    assert len(full) == 10
    # consume 3 batches, then resume after the last consumed chunk
    last = int(full[2][0][-1])
    resumed = list(training_batches(ds, batch_size=4, chunk_len=8,
                                    epoch=epoch, yield_ids=True,
                                    resume_after=last))
    assert len(resumed) == 7
    for (ids_a, mat_a), (ids_b, mat_b) in zip(full[3:], resumed):
        assert ids_a.tolist() == ids_b.tolist()
        assert np.array_equal(mat_a, mat_b)


def test_training_batches_plain_unchanged(ray_session):
    # default call still yields bare matrices (back-compat)
    from vector_ray.functions.tokens import training_batches

    out = list(training_batches(_chunks_ds(), batch_size=4, chunk_len=8))
    assert len(out) == 10
    assert all(isinstance(m, np.ndarray) and m.shape == (4, 8) for m in out)


# ---------------------------------------------------------------------------
# cosine_join
# ---------------------------------------------------------------------------


def test_cosine_join_hand_reference(ray_session):
    from vector_ray.functions.similarity import cosine_join

    left = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([0, 2], pa.int64()),
                "embedding": pa.array(
                    [[1.0, 0.0], [0.0, 1.0]], pa.list_(pa.float32())
                ),
            }
        )
    ).repartition(2)
    right = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([1, 3], pa.int64()),
                "embedding": pa.array(
                    [[1.0, 0.1], [-1.0, 0.0]], pa.list_(pa.float32())
                ),
            }
        )
    )
    out = _collect(cosine_join(left, right, threshold=0.5))
    got = {(a, b): c for a, b, c in zip(out["a"].to_pylist(),
                                        out["b"].to_pylist(),
                                        out["cosine"].to_pylist())}
    assert set(got) == {(0, 1)}       # only the aligned pair passes 0.5
    assert got[(0, 1)] > 0.99


def test_cosine_join_empty_right_raises(ray_session):
    from vector_ray.functions.similarity import cosine_join

    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([0], pa.int64()),
                "embedding": pa.array([[1.0, 0.0]], pa.list_(pa.float32())),
            }
        )
    )
    with pytest.raises(ValueError):
        cosine_join(ds, ds.filter(lambda r: False), threshold=0.5)


def test_cosine_join_spec_transform(ray_session):
    from vector_ray import run_pipeline

    rows = [
        {"vec_id": i, "embedding": [1.0, 0.0] if i % 2 == 0 else [0.9, 0.1]}
        for i in range(8)
    ]
    res = run_pipeline(
        {
            "sources": {"all": {"type": "inline", "rows": rows}},
            "transforms": {
                "corpus": {"type": "filter", "inputs": ["all"],
                           "condition": ".vec_id % 2 == 0"},
                "probes": {"type": "filter", "inputs": ["all"],
                           "condition": ".vec_id % 2 == 1"},
                "cj": {"type": "cosine_join", "inputs": ["corpus"],
                       "right": "probes", "threshold": 0.9},
            },
            "sinks": {"o": {"type": "collect", "inputs": ["cj"]}},
        }
    ).sinks["o"].table
    assert res.num_rows == 16  # 4 corpus x 4 probes, all above 0.9
    assert set(res.column_names) == {"a", "b", "cosine"}


# ---------------------------------------------------------------------------
# psi_drift
# ---------------------------------------------------------------------------


def test_psi_drift_hand_reference(ray_session):
    from vector_ray.functions.dataops import psi_drift

    # key "s": identical halves -> PSI ~ 0 (exactly 0 with symmetry);
    # key "m": all mass moves bucket 0 -> 1 between halves -> large PSI
    rows = (
        [("s", 0, 0)] * 5 + [("s", 1, 0)] * 5
        + [("s", 0, 1)] * 5 + [("s", 1, 1)] * 5
        + [("m", 0, 0)] * 10 + [("m", 1, 1)] * 10
    )
    ds = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([r[0] for r in rows]),
                "vb": pa.array([r[1] for r in rows], pa.int64()),
                "half": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
    ).repartition(3)
    out = psi_drift(ds, key="k", bucket="vb", half="half")
    got = {
        k: (r, c, p)
        for k, r, c, p in zip(out["k"].to_pylist(), out["n_ref"].to_pylist(),
                              out["n_cur"].to_pylist(), out["psi"].to_pylist())
    }
    assert got["s"] == (10, 10, 0.0)
    assert got["m"][0] == 10 and got["m"][1] == 10
    assert got["m"][2] > 1.0  # total shift reads as major drift

    import math

    def rha(x, nd):
        s = 10.0 ** nd
        return math.copysign(math.floor(abs(x) * s + 0.5) / s, x)

    # hand formula for "m": buckets {0: (10,0), 1: (0,10)}, nb=2.
    # Both buckets contribute the same |term| with the same sign
    # ((q-p)·ln(q/p) is symmetric under swapping p and q), so psi = 2·t0
    p0, q0 = 11 / 12, 1 / 12
    t0 = rha((q0 - p0) * math.log(q0 / p0), 9)
    want = rha(rha(t0 * 2, 9), 6)
    assert got["m"][2] == pytest.approx(want, abs=1e-9)


def test_psi_spec_transform(ray_session):
    from vector_ray import run_pipeline

    rows = ([{"k": "a", "vb": 0, "half": 0}] * 10
            + [{"k": "a", "vb": 3, "half": 1}] * 10)
    res = run_pipeline(
        {
            "sources": {"e": {"type": "inline", "rows": rows}},
            "transforms": {"p": {"type": "psi", "inputs": ["e"],
                                 "key": "k", "bucket": "vb",
                                 "half": "half"}},
            "sinks": {"o": {"type": "collect", "inputs": ["p"]}},
        }
    ).sinks["o"].table
    assert res.num_rows == 1 and res["psi"][0].as_py() > 1.0


# ---------------------------------------------------------------------------
# winnow_fingerprints
# ---------------------------------------------------------------------------


def test_winnow_coverage_guarantee(ray_session):
    """Any shared substring of >= window + k - 1 tokens must share at
    least one fingerprint — the paper's correctness property."""
    from vector_ray.functions.dedup import winnow_fingerprints

    rng = np.random.default_rng(4)
    shared = rng.integers(0, 1000, size=12).tolist()   # 12 >= 4 + 4 - 1
    a = rng.integers(0, 1000, size=20).tolist() + shared
    b = shared + rng.integers(0, 1000, size=17).tolist()
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(["A", "B"]),
                "tokens": pa.array([a, b], pa.list_(pa.int32())),
            }
        )
    ).repartition(2)
    out = _collect(winnow_fingerprints(ds, k=4, window=4))
    fps = {}
    for d, f in zip(out["doc_id"].to_pylist(), out["fp"].to_pylist()):
        fps.setdefault(d, set()).add(f)
    assert fps["A"] & fps["B"]  # at least one shared fingerprint


def test_winnow_density_and_boundaries(ray_session):
    from vector_ray.functions.dedup import winnow_fingerprints

    rng = np.random.default_rng(9)
    docs = [rng.integers(0, 5000, size=200).tolist() for _ in range(10)]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([f"d{i}" for i in range(10)]),
                "tokens": pa.array(docs, pa.list_(pa.int32())),
            }
        )
    )
    one_block = _collect(winnow_fingerprints(ds.repartition(1)))
    many = _collect(winnow_fingerprints(ds.repartition(5)))
    key = lambda t: sorted(zip(t["doc_id"].to_pylist(),
                               t["pos"].to_pylist(), t["fp"].to_pylist()))
    assert key(one_block) == key(many)  # doc boundaries, not block layout
    # expected density ~ 2/(w+1) = 0.4 of gram positions
    n_grams = sum(len(d) - 3 for d in docs)
    assert 0.2 < one_block.num_rows / n_grams < 0.6
    # positions are valid 1-based gram indices
    for d, p in zip(one_block["doc_id"].to_pylist(),
                    one_block["pos"].to_pylist()):
        assert 1 <= p <= 200 - 3


def test_winnow_short_docs_empty(ray_session):
    from vector_ray.functions.dedup import winnow_fingerprints

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(["x", "y"]),
                "tokens": pa.array([[1, 2, 3], []], pa.list_(pa.int32())),
            }
        )
    )
    out = _collect(winnow_fingerprints(ds, k=4, window=4))
    assert out.num_rows == 0


def test_kanonymity_suppress_null_qi(ray_session):
    # a NULL quasi-identifier forms a combo like any other value: its
    # at-risk rows must be masked, not silently skipped by the join
    from vector_ray.functions.dataops import kanonymity

    rows = [
        (1, "a", 30), (2, "a", 30), (3, "a", 30),
        (4, None, 30),                      # lone NULL-city row: at risk
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "city": pa.array([r[1] for r in rows], pa.string()),
                "age": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
    ).repartition(2)
    out = _collect(
        kanonymity(ds, ["city", "age"], k=2, mode="suppress",
                   id_field="event_id")
    )
    by_id = {
        i: (c, a)
        for i, c, a in zip(out["event_id"].to_pylist(),
                           out["city"].to_pylist(), out["age"].to_pylist())
    }
    assert len(by_id) == 4
    assert by_id[4] == ("*", -1)            # masked, not dropped/skipped
    for i in (1, 2, 3):
        assert by_id[i] == ("a", 30)


def test_hbos_and_psi_empty_inputs(ray_session):
    from vector_ray.functions.dataops import hbos_score, psi_drift

    empty = rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "f1": pa.array([], pa.int64()),
                "half": pa.array([], pa.int64()),
            }
        )
    )
    assert _collect(hbos_score(empty, ["f1"])).num_rows == 0
    out = psi_drift(empty, key="event_id", bucket="f1", half="half")
    assert out.num_rows == 0


# ---------------------------------------------------------------------------
# personalized pagerank
# ---------------------------------------------------------------------------


def _star_edges():
    # hub 0 -> {1..4}, plus a chain 5 -> 6
    edges = [(0, i) for i in range(1, 5)] + [(5, 6)]
    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in edges], pa.int64()),
                "dst": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    ).repartition(2)


def test_ppr_concentrates_on_seed_neighborhood(ray_session):
    from vector_ray.functions.graph import pagerank

    plain = pagerank(_star_edges(), iters=6, mode="broadcast")
    ppr = pagerank(_star_edges(), iters=6, mode="broadcast", seeds=[0])
    pr = dict(zip(plain["node"].to_pylist(), plain["rank"].to_pylist()))
    pp = dict(zip(ppr["node"].to_pylist(), ppr["rank"].to_pylist()))
    # teleporting to the hub concentrates mass there (dangling leaves
    # recycle to the seed instead of spreading uniformly)
    assert pp[0] > pr[0]
    # the disconnected chain gets NO teleport and no in-flow: node 5
    # is exactly zero, and both chain nodes starve vs plain PR
    assert pp[5] == 0.0
    assert pp[5] < pr[5] and pp[6] < pr[6]
    # a seed successor still dominates the disconnected leaf
    assert pp[1] > pp[6]
    assert abs(sum(pp.values()) - 1.0) < 1e-3  # still a distribution


def test_ppr_bad_seeds(ray_session):
    from vector_ray.functions.graph import pagerank

    with pytest.raises(ValueError):
        pagerank(_star_edges(), mode="broadcast", seeds=[999])
    # round 3: bucketed personalized PR is implemented — absent seeds
    # raise the same ValueError there (not NotImplementedError)
    with pytest.raises(ValueError):
        pagerank(_star_edges(), mode="bucketed", seeds=[999])


# ---------------------------------------------------------------------------
# texttile
# ---------------------------------------------------------------------------


def test_texttile_hand_reference(ray_session):
    from vector_ray.functions.text import texttile

    # 3 blocks of 4 words: blocks 0/1 share nothing -> dot 0 at gap 1;
    # block 1 has one "x", block 2 has two -> dot 1*2=2 at gap 2; only
    # two gaps, neither interior -> no boundary flagged
    text1 = "a b c d e f g x x x y z"
    # 4 blocks: cohesive-weak-cohesive around gap 2 -> boundary at g=2
    text2 = ("p p p p " + "p q r s " + "t u v w " + "t t t t").strip()
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array([text1, text2]),
            }
        )
    ).repartition(2)
    out = _collect(texttile(ds, block_words=4))
    got = {
        (d, g): (dot, b)
        for d, g, dot, b in zip(out["doc_id"].to_pylist(),
                                out["g"].to_pylist(),
                                out["dot"].to_pylist(),
                                out["boundary"].to_pylist())
    }
    assert got[(1, 1)] == (0, False)
    assert got[(1, 2)] == (2, False)       # x(2)*x(1)=2
    # doc 2 gap dots: g1 = p4*p1 = 4; g2 = 0; g3 = t1*t4 = 4
    assert got[(2, 1)] == (4, False)
    assert got[(2, 2)] == (0, True)        # strict local minimum
    assert got[(2, 3)] == (4, False)


def test_texttile_short_docs(ray_session):
    from vector_ray.functions.text import texttile

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["a b c", "a b c d e f g h i j k"]),
            }
        )
    )
    out = _collect(texttile(ds, block_words=10))
    assert out.num_rows == 0  # <2 full blocks everywhere


# ---------------------------------------------------------------------------
# fold_assign
# ---------------------------------------------------------------------------


def test_fold_assign_stability_and_balance(ray_session):
    from vector_ray.functions.curation import fold_assign

    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array([f"doc-{i:07d}" for i in range(2000)])})
    )
    a = _collect(fold_assign(ds.repartition(2), n_folds=5))
    b = _collect(fold_assign(ds.repartition(9), n_folds=5))
    da = dict(zip(a["doc_id"].to_pylist(), a["fold"].to_pylist()))
    db = dict(zip(b["doc_id"].to_pylist(), b["fold"].to_pylist()))
    assert da == db                       # partitioning-invariant folds
    assert set(da.values()) == {0, 1, 2, 3, 4}
    from collections import Counter

    sizes = Counter(da.values())
    assert max(sizes.values()) < 1.3 * min(sizes.values())  # balanced

    with pytest.raises(ValueError):
        fold_assign(ds, n_folds=1)
