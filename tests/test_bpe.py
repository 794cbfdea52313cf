"""Distributed BPE training vs an independent pure-Python reference."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd


def ref_bpe(docs, num_merges, new_id_base):
    """Straight-line reference: count ALL adjacent pairs, accept max
    count (ties to smallest (a, b)), apply left-to-right."""
    seqs = [list(map(int, d)) for d in docs]
    rows = []
    for k in range(num_merges):
        counts = {}
        for s in seqs:
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                counts[p] = counts.get(p, 0) + 1
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        new_id = new_id_base + k
        rows.append((k, a, b, new_id, c))
        for si, s in enumerate(seqs):
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(new_id)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[si] = out
    return rows, seqs


def _mk(docs):
    return pa.table(
        {
            "doc_id": [f"doc-{i:010d}" for i in range(len(docs))],
            "tokens": pa.array([list(map(int, d)) for d in docs], pa.list_(pa.int32())),
        }
    )


def test_apply_merges_edges():
    from vector_ray.functions.bpe import apply_merges

    # aa-run parity: "aaa" -> "Xa"; "aaaa" -> "XX"
    v = np.array([7, 7, 7, 7, 7, 7, 7], np.int64)
    off = np.array([0, 3, 7], np.int64)
    nv, noff = apply_merges(v, off, [(7, 7, 99)])
    assert nv.tolist() == [99, 7, 99, 99]
    assert noff.tolist() == [0, 2, 4]
    # pairs never cross row boundaries
    v = np.array([1, 2, 1, 2], np.int64)
    off = np.array([0, 2, 4], np.int64)  # rows [1,2] [1,2]; boundary 2|1
    nv, noff = apply_merges(v, off, [(2, 1, 50)])
    assert nv.tolist() == [1, 2, 1, 2]
    # chained merges: (1,2)->X then (X,3)->Y
    v = np.array([1, 2, 3, 1, 2], np.int64)
    off = np.array([0, 5], np.int64)
    nv, noff = apply_merges(v, off, [(1, 2, 80), (80, 3, 81)])
    assert nv.tolist() == [81, 80]


@pytest.mark.parametrize("seed", [0, 3])
def test_bpe_train_matches_reference(ray_session, seed):
    from vector_ray.functions.bpe import bpe_encode, bpe_train

    rng = np.random.default_rng(seed)
    docs = [rng.integers(0, 6, size=rng.integers(2, 40)).tolist() for _ in range(60)]
    ref_rows, ref_seqs = ref_bpe(docs, num_merges=8, new_id_base=100)

    table = _mk(docs)
    merges = bpe_train(lambda: rd.from_arrow(table), num_merges=8, new_id_base=100)
    got = list(
        zip(
            merges["merge_idx"].to_pylist(),
            merges["a"].to_pylist(),
            merges["b"].to_pylist(),
            merges["new_id"].to_pylist(),
            merges["count"].to_pylist(),
        )
    )
    assert got == ref_rows

    encoded = bpe_encode(rd.from_arrow(table), merges)
    import ray

    out = pa.concat_tables(
        [t for t in ray.get(encoded.materialize().to_arrow_refs()) if t.num_rows]
    ).sort_by("doc_id")
    assert out["tokens"].to_pylist() == ref_seqs


def test_bigram_lm_score_matches_reference(ray_session):
    import math

    import ray

    from vector_ray.functions.lm import bigram_lm_score

    rng = np.random.default_rng(7)
    docs = [rng.integers(0, 600, size=m).tolist() for m in [0, 1, 2, 5, 40, 300]]
    out = pa.concat_tables(
        [
            t
            for t in ray.get(
                bigram_lm_score(rd.from_arrow(_mk(docs))).materialize().to_arrow_refs()
            )
            if t.num_rows
        ]
    ).sort_by("doc_id")
    # independent reference
    c2 = {}
    for d in docs:
        bs = [x % 256 for x in d]
        for p, c in zip(bs, bs[1:]):
            c2[(p, c)] = c2.get((p, c), 0) + 1
    rows = {p: sum(v for (pp, _), v in c2.items() if pp == p) for p in range(256)}
    expected = {}
    for i, d in enumerate(docs):
        if len(d) < 2:
            continue
        bs = [x % 256 for x in d]
        lps = [
            math.log(c2.get((p, c), 0) + 1.0) - math.log(rows.get(p, 0) + 256.0)
            for p, c in zip(bs, bs[1:])
        ]
        expected[f"doc-{i:010d}"] = -sum(lps) / len(lps)
    assert out["doc_id"].to_pylist() == sorted(expected)
    for did, nll in zip(out["doc_id"].to_pylist(), out["nll"].to_pylist()):
        assert abs(nll - expected[did]) < 1e-3, (did, nll, expected[did])


def test_ppl_windows_matches_reference(ray_session):
    import math

    import ray

    from vector_ray.functions.lm import ppl_windows

    rng = np.random.default_rng(11)
    docs = [rng.integers(0, 600, size=m).tolist() for m in [0, 1, 2, 9, 40, 75]]
    W = 8
    out = pa.concat_tables(
        [
            t
            for t in ray.get(
                ppl_windows(rd.from_arrow(_mk(docs)), window=W)
                .materialize()
                .to_arrow_refs()
            )
            if t.num_rows
        ]
    ).sort_by([("doc_id", "ascending"), ("win", "ascending")])
    # independent reference
    c2 = {}
    for d in docs:
        bs = [x % 256 for x in d]
        for p, c in zip(bs, bs[1:]):
            c2[(p, c)] = c2.get((p, c), 0) + 1
    rows = {p: sum(v for (pp, _), v in c2.items() if pp == p) for p in range(256)}
    exp = []
    for i, d in enumerate(docs):
        bs = [x % 256 for x in d]
        lps = [
            math.log(c2.get((p, c), 0) + 1.0) - math.log(rows.get(p, 0) + 256.0)
            for p, c in zip(bs, bs[1:])
        ]
        for w in range(0, len(lps), W):
            seg = lps[w : w + W]
            exp.append((f"doc-{i:010d}", w // W, len(seg), -sum(seg) / len(seg)))
    assert out.num_rows == len(exp)
    for (did, win, n, nll), (gd, gw, gn, gnll) in zip(
        zip(*[out[c].to_pylist() for c in ("doc_id", "win", "n_trans", "nll")]),
        exp,
    ):
        assert (did, win, n) == (gd, gw, gn)
        assert abs(nll - round(round(gnll, 9), 4)) < 1e-9
