"""Tests for the corpus-curation operators (vector_ray/functions/curation.py):
mixture sampling, train/val split, curriculum length-binning, and
repetition scoring.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data as rd

from vector_ray.functions.curation import (
    HASH_MOD,
    MIX_MULT,
    SPLIT_MULT,
    epoch_shuffle,
    length_buckets,
    mixture_sample,
    repetition_stats,
    split_assign,
)


def _collect(ds) -> pa.Table:
    tables = [t for t in ray.get(ds.materialize().to_arrow_refs()) if t.num_rows]
    return pa.concat_tables(tables, promote_options="default") if tables else pa.table({})


def _corpus(n=2000, seed=3) -> pa.Table:
    rng = np.random.default_rng(seed)
    ids = [f"doc-{i:010d}" for i in range(n)]
    sources = np.asarray(["web", "forum", "wiki", "code"])[
        rng.integers(0, 4, size=n)
    ]
    n_tok = rng.integers(1, 50, size=n).astype(np.int32)
    flat = rng.integers(0, 100, size=int(n_tok.sum()), dtype=np.int32)
    offsets = np.zeros(n + 1, np.int32)
    np.cumsum(n_tok, out=offsets[1:])
    return pa.table(
        {
            "doc_id": pa.array(ids),
            "tokens": pa.ListArray.from_arrays(pa.array(offsets), pa.array(flat)),
            "n_tok": pa.array(n_tok),
            "source": pa.array(sources, pa.string()),
        }
    )


def test_mixture_sample_deterministic_and_rate(ray_session):
    t = _corpus()
    rates = {"web": 0.25, "forum": 0.5}
    a = _collect(mixture_sample(rd.from_arrow(t), rates)).sort_by("doc_id")
    b = _collect(
        mixture_sample(rd.from_arrow(t).repartition(7), rates)
    ).sort_by("doc_id")
    # deterministic: identical result regardless of partitioning
    assert a.equals(b)
    # non-listed sources are kept in full
    full = t.filter(pa.compute.is_in(t["source"], pa.array(["wiki", "code"])))
    kept = a.filter(pa.compute.is_in(a["source"], pa.array(["wiki", "code"])))
    assert kept.num_rows == full.num_rows
    # sampled sources land near their rate (hash is uniform)
    n_web_in = t.filter(pa.compute.equal(t["source"], "web")).num_rows
    n_web_out = a.filter(pa.compute.equal(a["source"], "web")).num_rows
    assert 0.15 < n_web_out / n_web_in < 0.35
    # selection matches the documented hash rule exactly
    ids = np.array([int(d[4:]) for d in a["doc_id"].to_pylist()], np.uint64)
    with np.errstate(over="ignore"):
        h = (ids * np.uint64(MIX_MULT)) % np.uint64(HASH_MOD)
    rate = np.array(
        [rates.get(s, 1.0) for s in a["source"].to_pylist()]
    )
    assert bool(np.all(h < rate * HASH_MOD))


def test_split_assign_stable_and_disjoint(ray_session):
    t = _corpus()
    out = _collect(split_assign(rd.from_arrow(t), val_per_mille=100)).sort_by(
        "doc_id"
    )
    assert out.num_rows == t.num_rows
    splits = set(out["split"].to_pylist())
    assert splits <= {"train", "val"}
    n_val = out.filter(pa.compute.equal(out["split"], "val")).num_rows
    assert 0.05 < n_val / t.num_rows < 0.15  # ~10%
    # stability: assignment is a pure function of doc_id
    again = _collect(
        split_assign(rd.from_arrow(t).repartition(5), val_per_mille=100)
    ).sort_by("doc_id")
    assert out["split"].equals(again["split"])
    ids = np.array([int(d[4:]) for d in out["doc_id"].to_pylist()], np.uint64)
    with np.errstate(over="ignore"):
        h = (ids * np.uint64(SPLIT_MULT)) % np.uint64(HASH_MOD)
    expect = np.where(h % 1000 < 100, "val", "train")
    assert out["split"].to_pylist() == expect.tolist()


def test_length_buckets_totals(ray_session):
    t = _corpus()
    out = _collect(length_buckets(rd.from_arrow(t), bucket_size=16))
    assert int(pa.compute.sum(out["n_docs"]).as_py()) == t.num_rows
    assert int(pa.compute.sum(out["sum_tok"]).as_py()) == int(
        pa.compute.sum(t["n_tok"]).as_py()
    )
    # every bucket id is n_tok // 16 for some doc
    assert set(out["bucket"].to_pylist()) <= set(
        (np.asarray(t["n_tok"]) // 16).tolist()
    )


def test_epoch_shuffle_orders_and_permutes(ray_session):
    t = _corpus(n=500)
    out1 = epoch_shuffle(rd.from_arrow(t).repartition(4), epoch=1)
    # stream in sorted order and check global monotonicity + permutation
    keys, ids = [], []
    for b in out1.iter_batches(batch_format="pyarrow"):
        keys.extend(b["shuffle_key"].to_pylist())
        ids.extend(b["doc_id"].to_pylist())
    assert keys == sorted(keys)
    assert sorted(ids) == t["doc_id"].to_pylist()
    # different epoch -> different order; same epoch -> identical order
    ids2 = [
        d
        for b in epoch_shuffle(rd.from_arrow(t), epoch=2).iter_batches(
            batch_format="pyarrow"
        )
        for d in b["doc_id"].to_pylist()
    ]
    ids1b = [
        d
        for b in epoch_shuffle(rd.from_arrow(t), epoch=1).iter_batches(
            batch_format="pyarrow"
        )
        for d in b["doc_id"].to_pylist()
    ]
    assert ids2 != ids
    assert ids1b == ids


def test_curation_via_spec_dag(ray_session, tmp_path):
    """The curation ops are first-class spec-DAG transform types."""
    import pyarrow.parquet as pq

    from vector_ray import run_pipeline

    src = str(tmp_path / "corpus.parquet")
    pq.write_table(_corpus(800), src)
    out = str(tmp_path / "out")
    run_pipeline(
        {
            "sources": {"corpus": {"type": "parquet", "path": src}},
            "transforms": {
                "mix": {
                    "type": "mixture_sample",
                    "inputs": ["corpus"],
                    "rates": {"web": 0.25},
                },
                "split": {"type": "split_assign", "inputs": ["mix"],
                          "val_per_mille": 100},
            },
            "sinks": {"s": {"type": "parquet", "inputs": ["split"], "path": out}},
        }
    )
    got = pq.read_table(out)
    assert set(got["split"].to_pylist()) <= {"train", "val"}
    assert 0 < got.num_rows < 800  # mixture dropped some web docs


def test_epoch0_shuffle_decorrelated_from_mixture(ray_session):
    """Docs surviving mixture_sample must NOT cluster at the front of
    the epoch-0 order (regression: epoch 0 once reused MIX_MULT)."""
    t = _corpus(n=4000)
    sampled = _collect(mixture_sample(rd.from_arrow(t), {"web": 0.25}))
    order = [
        d
        for b in epoch_shuffle(rd.from_arrow(sampled), epoch=0).iter_batches(
            batch_format="pyarrow"
        )
        for d, s in zip(b["doc_id"].to_pylist(), b["source"].to_pylist())
        if s == "web"
    ]
    all_ids = [
        d
        for b in epoch_shuffle(rd.from_arrow(sampled), epoch=0).iter_batches(
            batch_format="pyarrow"
        )
        for d in b["doc_id"].to_pylist()
    ]
    pos = {d: i for i, d in enumerate(all_ids)}
    mean_web_pos = np.mean([pos[d] for d in order]) / len(all_ids)
    assert 0.35 < mean_web_pos < 0.65  # uniform ≈ 0.5; MIX_MULT bug gave ≈0.25


def test_repetition_stats_out_of_range_and_empty(ray_session):
    from vector_ray.schema import VOCAB_SIZE

    t = pa.table(
        {
            "doc_id": pa.array(["doc-0000000001", "doc-0000000002", "doc-0000000003"]),
            "tokens": pa.array(
                [[VOCAB_SIZE + 5], [0], []], pa.list_(pa.int32())
            ),
        }
    )
    out = _collect(repetition_stats(rd.from_arrow(t))).sort_by("doc_id")
    # ids beyond any assumed vocab bound stay per-doc (no key bleed)
    assert out["n_types"].to_pylist() == [1, 1, 0]
    assert out["max_cnt"].to_pylist() == [1, 1, 0]
    # empty docs are not repetitive
    assert out["repetitive"].to_pylist() == [True, True, False]
    with pytest.raises(Exception):
        _collect(
            repetition_stats(
                rd.from_arrow(
                    pa.table(
                        {
                            "doc_id": pa.array(["doc-0000000009"]),
                            "tokens": pa.array([[-1]], pa.list_(pa.int32())),
                        }
                    )
                )
            )
        )


def test_repetition_stats_exact(ray_session):
    # hand-built rows with known type/repeat structure
    t = pa.table(
        {
            "doc_id": pa.array(["doc-0000000001", "doc-0000000002", "doc-0000000003"]),
            "tokens": pa.array(
                [[1, 1, 1, 1], [1, 2, 3, 4, 5], [7] * 40],
                pa.list_(pa.int32()),
            ),
        }
    )
    out = _collect(repetition_stats(rd.from_arrow(t), max_freq_pct=5)).sort_by(
        "doc_id"
    )
    assert out["n_types"].to_pylist() == [1, 5, 1]
    assert out["max_cnt"].to_pylist() == [4, 1, 40]
    # repetitive iff max_cnt*20 >= n_tok: 80>=4 T, 20>=5 T... careful:
    # row2 max_cnt=1 -> 20 >= 5 is True; threshold flags docs whose top
    # token exceeds 5% of tokens, so short docs always trip it.
    assert out["repetitive"].to_pylist() == [True, True, True]
    long_uniform = pa.table(
        {
            "doc_id": pa.array(["doc-0000000009"]),
            "tokens": pa.array([list(range(50))], pa.list_(pa.int32())),
        }
    )
    out2 = _collect(repetition_stats(rd.from_arrow(long_uniform), max_freq_pct=5))
    assert out2["repetitive"].to_pylist() == [False]  # 1*20 < 50


def test_stratified_sample_exact_counts_and_stability(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.functions.curation import stratified_sample

    t = pa.table(
        {
            "doc_id": pa.array(np.arange(200), pa.int64()),
            "source": pa.array(
                ["web"] * 150 + ["book"] * 45 + ["tiny"] * 5
            ),
        }
    )
    out = (
        stratified_sample(rd.from_arrow(t).repartition(6), 10)
        .to_pandas()
        .sort_values("doc_id")
    )
    counts = out.source.value_counts().to_dict()
    # exactly n per stratum; a stratum smaller than n yields all of it
    assert counts == {"web": 10, "book": 10, "tiny": 5}
    # deterministic across repartitionings
    out2 = (
        stratified_sample(rd.from_arrow(t).repartition(2), 10)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out.doc_id.tolist() == out2.doc_id.tolist()
    # helper column is dropped from the result
    assert "__strath" not in out.columns


def test_weighted_sample_matches_reference(ray_session):
    """A-ES weighted sampling: the distributed two-phase top-k must
    equal the brute-force u^(1/w) ranking, favor heavy weights, and
    exclude null/non-positive weights."""
    from vector_ray.functions.curation import weighted_sample

    n = 1500
    t = pa.table(
        {
            "doc_id": [f"doc-{i:010d}" for i in range(n)],
            "w": pa.array([float(1 + (i % 40)) for i in range(n)], pa.float64()),
        }
    )
    out = pa.concat_tables(
        [
            x
            for x in ray.get(
                weighted_sample(rd.from_arrow(t).repartition(6), 80, "w")
                .materialize()
                .to_arrow_refs()
            )
            if x.num_rows
        ]
    )
    got = sorted(out["doc_id"].to_pylist())
    h = (np.arange(n, dtype=np.uint64) * np.uint64(2654435761)) % np.uint64(1 << 32)
    u = (h.astype(np.float64) + 1.0) / 4294967296.0
    w = np.array([float(1 + (i % 40)) for i in range(n)])
    key = u ** (1.0 / w)
    order = np.lexsort((np.arange(n), -key))
    assert got == sorted(f"doc-{i:010d}" for i in order[:80])
    picked = [int(d[4:]) % 40 for d in got]
    assert sum(1 for p in picked if p >= 30) > sum(1 for p in picked if p < 10)

    t2 = pa.table(
        {
            "doc_id": [f"doc-{i:010d}" for i in range(6)],
            "w": pa.array([0.0, -2.0, None, 3.0, 3.0, 3.0], pa.float64()),
        }
    )
    o2 = pa.concat_tables(
        [
            x
            for x in ray.get(
                weighted_sample(rd.from_arrow(t2), 6, "w")
                .materialize()
                .to_arrow_refs()
            )
            if x.num_rows
        ]
    )
    assert sorted(int(d[4:]) for d in o2["doc_id"].to_pylist()) == [3, 4, 5]


def test_token_entropy_exact(ray_session):
    from math import log

    from vector_ray.functions.curation import token_entropy

    t = pa.table(
        {
            "doc_id": pa.array(["doc-1", "doc-2", "doc-3", "doc-4"]),
            "tokens": pa.array(
                # uniform over 4 -> ln 4; constant -> 0; 2/3-1/3 mix;
                # empty -> 0
                [[1, 2, 3, 4], [7, 7, 7], [5, 5, 9], []],
                pa.list_(pa.int32()),
            ),
        }
    )
    out = pa.concat_tables(
        [
            b
            for b in token_entropy(
                rd.from_arrow(t).repartition(2)
            ).iter_batches(batch_format="pyarrow")
            if b.num_rows
        ]
    ).sort_by("doc_id")
    want = [
        log(4.0),
        0.0,
        -(2 / 3) * log(2 / 3) - (1 / 3) * log(1 / 3),
        0.0,
    ]
    got = out["entropy"].to_pylist()
    for g, w in zip(got, want):
        assert g == pytest.approx(w, abs=1e-4)


def test_token_entropy_spec_dag(ray_session):
    from vector_ray.pipeline import run_pipeline

    rows = [
        {"doc_id": "a", "tokens": [1, 1, 2]},
        {"doc_id": "b", "tokens": [3]},
    ]
    out = run_pipeline(
        {
            "sources": {"in": {"type": "inline", "rows": rows}},
            "transforms": {
                "h": {"type": "token_entropy", "inputs": ["in"]}
            },
            "sinks": {"out": {"type": "collect", "inputs": ["h"]}},
        }
    ).sinks["out"].table
    assert set(out.column_names) == {"doc_id", "entropy"}
    assert out.num_rows == 2


def test_unimax_allocation_properties():
    from vector_ray.functions.curation import unimax_allocation

    rng = np.random.default_rng(3)
    for _ in range(50):
        L = int(rng.integers(1, 12))
        counts = {
            f"s{i}": int(rng.integers(1, 10**6)) for i in range(L)
        }
        total = sum(counts.values())
        E = int(rng.integers(1, 5))
        B = int(rng.integers(1, E * total + 1))
        alloc = unimax_allocation(counts, B, E)
        # never over the epoch cap; budget never exceeded, and the
        # shortfall is only floor-division remainder (< #sources)
        assert all(alloc[s] <= E * counts[s] for s in counts)
        assert 0 <= B - sum(alloc.values()) < max(L, 1)
        # uncapped sources all share one value >= every capped alloc
        shares = {
            alloc[s] for s in counts if alloc[s] < E * counts[s]
        }
        assert len(shares) <= 1
        if shares:
            share = shares.pop()
            assert all(
                alloc[s] <= max(share, E * counts[s]) for s in counts
            )

    with pytest.raises(ValueError):
        unimax_allocation({"a": 10}, 31, 3)


def test_unimax_sample_tracks_allocation(ray_session):
    from vector_ray.functions.curation import (
        unimax_allocation,
        unimax_sample,
    )

    rng = np.random.default_rng(5)
    srcs = ["tiny"] * 40 + ["mid"] * 300 + ["big"] * 2000
    n_tok = rng.integers(50, 200, size=len(srcs))
    t = pa.table(
        {
            "doc_id": [f"doc-{i:010d}" for i in range(len(srcs))],
            "source": pa.array(srcs),
            "n_tok": pa.array(n_tok.astype(np.int32)),
        }
    )
    out = (
        unimax_sample(rd.from_arrow(t), budget_factor=1, max_epochs=3)
        .to_pandas()
    )
    counts = {
        s: int(n_tok[[x == s for x in srcs]].sum())
        for s in ("tiny", "mid", "big")
    }
    alloc = unimax_allocation(counts, sum(counts.values()), 3)
    got = out.groupby("source").apply(
        lambda g: int((g.n_tok * g.n_epochs).sum()), include_groups=False
    )
    # realized epoch-weighted tokens per source land within the
    # fractional-lottery noise of the allocation (docs are ~125 tokens)
    for s in counts:
        assert abs(got[s] - alloc[s]) <= 40 * 200, (s, got[s], alloc[s])
    # the tiny source is upsampled to exactly 3 epochs for every doc
    assert (out[out.source == "tiny"].n_epochs == 3).all()


def test_new_ops_as_spec_transforms(ray_session):
    from vector_ray import run_pipeline

    rng = np.random.default_rng(9)
    docs = [rng.integers(0, 500, size=40).tolist() for _ in range(6)]
    t = pa.table(
        {
            "did": pa.array(range(6), pa.int64()),
            "doc_id": [f"doc-{i:010d}" for i in range(6)],
            "tokens": pa.array(docs, pa.list_(pa.int32())),
        }
    )
    import pyarrow.parquet as pq
    import tempfile, os

    d = tempfile.mkdtemp()
    pq.write_table(t, os.path.join(d, "part.parquet"))
    res = run_pipeline(
        {
            "sources": {"seq": {"type": "parquet", "path": d}},
            "transforms": {
                "mask": {
                    "type": "loss_mask",
                    "inputs": ["seq"],
                    "marker_mod": 97,
                    "stats": True,
                },
                "nov": {
                    "type": "ngram_novelty",
                    "inputs": ["seq"],
                    "n": 4,
                    "num_buckets": 2,
                },
                "ppl": {
                    "type": "ppl_windows",
                    "inputs": ["seq"],
                    "window": 16,
                },
            },
            "sinks": {
                "m": {"type": "collect", "inputs": ["mask"]},
                "n": {"type": "collect", "inputs": ["nov"]},
                "p": {"type": "collect", "inputs": ["ppl"]},
            },
        }
    )
    m = res.sinks["m"].table
    assert m.num_rows == 6 and "n_trainable" in m.column_names
    n = res.sinks["n"].table
    assert n.num_rows == 6 and "novelty" in n.column_names
    p = res.sinks["p"].table
    assert p.num_rows == 6 * 3 and "nll" in p.column_names  # 39 trans -> 3 windows


def test_preference_pairs(ray_session):
    from vector_ray.functions.curation import preference_pairs

    t = pa.table(
        {
            "prompt_id": pa.array([1, 1, 1, 2, 2, 3, 4, 4, 5, 5],
                                  pa.int64()),
            "doc_id": pa.array([10, 11, 12, 20, 21, 30, 40, 41, 50, 51],
                               pa.int64()),
            # group 1: clear winner/loser; group 2: tie on top (smaller
            # id wins BOTH sides -> chosen != rejected still holds via
            # id tiebreak? no — equal scores, chosen=20, rejected=20 ->
            # dropped at margin>0 anyway); group 3: single candidate ->
            # dropped; group 4: gap below margin -> dropped; group 5:
            # null score on one side -> degenerate single -> dropped
            "score": pa.array(
                [5.0, 9.0, 1.0, 7.0, 7.0, 3.0, 4.0, 4.5, 6.0, None],
                pa.float64(),
            ),
        }
    )
    out = _collect(
        preference_pairs(
            rd.from_arrow(t).repartition(4), margin=1.0, num_buckets=4
        )
    ).sort_by("prompt_id")
    assert out.to_pydict() == {
        "prompt_id": [1],
        "chosen_id": [11],
        "rejected_id": [12],
        "chosen_score": [9.0],
        "rejected_score": [1.0],
        "gap": [8.0],
    }

    # margin 0: the tied group emits smaller-id-vs-larger? NO — both
    # sides resolve to id 20 (ties -> smaller id on BOTH), degenerate,
    # dropped. group 4's 0.5 gap now passes.
    out0 = _collect(
        preference_pairs(
            rd.from_arrow(t).repartition(3), margin=0.0, num_buckets=2
        )
    ).sort_by("prompt_id")
    assert out0["prompt_id"].to_pylist() == [1, 4]
    assert out0["chosen_id"].to_pylist() == [11, 41]
    assert out0["rejected_id"].to_pylist() == [12, 40]

    # partition invariance: single block == many blocks
    one = _collect(preference_pairs(rd.from_arrow(t), margin=0.0)).sort_by(
        "prompt_id"
    )
    assert one.equals(out0)


def test_preference_pairs_hot_group(ray_session):
    """A single group holding every row (worst-case skew): phase 1
    collapses each block to ONE candidate row, so the exchange moves
    O(blocks), and the result is still exact."""
    import numpy as np

    from vector_ray.functions.curation import preference_pairs

    n = 50_000
    rng = np.random.RandomState(7)
    scores = rng.permutation(n).astype(np.float64)
    t = pa.table(
        {
            "prompt_id": pa.array(np.zeros(n, np.int64)),
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "score": pa.array(scores, pa.float64()),
        }
    )
    out = _collect(
        preference_pairs(rd.from_arrow(t).repartition(32), margin=0.0)
    )
    assert out.num_rows == 1
    r = out.to_pylist()[0]
    assert r["chosen_id"] == int(np.argmax(scores))
    assert r["rejected_id"] == int(np.argmin(scores))
    assert r["gap"] == float(n - 1)
