"""gram_slice_audit (round-5 judge item #2): the content-slice audit
of the span_dedupe / ngram_novelty gram models, checked against a
brute-force python reference on a corpus with planted duplicates.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest


def _brute(rows, n, modulus, residue, min_count):
    per_doc_grams: dict[int, set] = {}
    occ: Counter = Counter()
    first: dict[tuple, int] = {}
    for did, toks in rows:
        for i in range(len(toks) - n + 1):
            g = tuple(toks[i : i + n])
            if sum(g) % modulus != residue:
                continue
            occ[g] += 1
            per_doc_grams.setdefault(did, set()).add(g)
            if g not in first or did < first[g]:
                first[g] = did
    out = {}
    for did, grams in per_doc_grams.items():
        out[did] = (
            len(grams),
            sum(1 for g in grams if first[g] == did),
            sum(1 for g in grams if occ[g] >= min_count),
        )
    return out


def _run(rows, ray_session, **kw):
    import ray.data as rd

    from vector_ray.functions.tokens import gram_slice_audit

    t = pa.table(
        {
            "did": pa.array([r[0] for r in rows], pa.int64()),
            "tokens": pa.array(
                [list(r[1]) for r in rows], pa.list_(pa.int32())
            ),
        }
    )
    ds = rd.from_arrow(t).repartition(3)
    out = gram_slice_audit(ds, **kw).to_pandas()
    return {
        int(r.did): (int(r.n_grams), int(r.n_novel), int(r.n_dup))
        for r in out.itertuples()
    }


def test_gram_slice_audit_matches_brute_force(ray_session):
    rng = np.random.RandomState(7)
    rows = []
    for did in range(40):
        toks = rng.randint(0, 50, size=rng.randint(8, 60)).tolist()
        rows.append((did, toks))
    # planted duplicates: doc 100+i repeats doc i's tail
    for i in range(0, 40, 5):
        rows.append((100 + i, rows[i][1][2:]))
    # use a small modulus so the slice is well-populated on a tiny corpus
    kw = dict(n=4, modulus=4, residue=1, min_count=2)
    assert _run(rows, ray_session, **kw) == _brute(rows, **kw)


def test_gram_slice_audit_novel_dup_interplay(ray_session):
    # one gram duplicated across docs: novel only at min did, dup at both
    base = [1, 1, 1, 1]  # sum 4 % 4 == 0
    rows = [(3, base + [9]), (7, [5] + base)]
    kw = dict(n=4, modulus=4, residue=0, min_count=2)
    got = _run(rows, ray_session, **kw)
    brute = _brute(rows, **kw)
    assert got == brute
    assert got[3][1] >= 1  # min did owns the novelty
    # the shared gram counts as dup in BOTH docs
    assert got[3][2] >= 1 and got[7][2] >= 1


def test_gram_slice_audit_short_docs_drop(ray_session):
    rows = [(1, [1, 2]), (2, [3, 1, 0, 0, 0])]
    got = _run(rows, ray_session, n=4, modulus=4, residue=0, min_count=2)
    assert 1 not in got  # too short for any 4-gram
    assert got == _brute(rows, 4, 4, 0, 2)


def test_gram_slice_audit_validation(ray_session):
    import ray.data as rd

    from vector_ray.functions.tokens import gram_slice_audit

    ds = rd.from_arrow(
        pa.table(
            {
                "did": pa.array([1], pa.int64()),
                "tokens": pa.array([[1, 2, 3, 4]], pa.list_(pa.int32())),
            }
        )
    )
    with pytest.raises(ValueError, match="power of two"):
        gram_slice_audit(ds, num_buckets=3)
    with pytest.raises(ValueError, match="residue"):
        gram_slice_audit(ds, modulus=4, residue=4)
    neg = rd.from_arrow(
        pa.table(
            {
                "did": pa.array([-2], pa.int64()),
                "tokens": pa.array([[1, 2, 3, 4]], pa.list_(pa.int32())),
            }
        )
    )
    with pytest.raises(Exception, match=">= 0"):
        gram_slice_audit(neg, n=2).materialize()
