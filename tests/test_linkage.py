"""Unit tests for fuzzy join (functions/linkage.py) and RAG chunking
(functions/text.py chunk_text): kernel exactness vs straight-line
references, FastSS blocking losslessness, and chunk boundary rules."""

import itertools
import random

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from vector_ray.functions.linkage import (
    _FNV_PRIME,
    _deletion_hashes,
    delete_char_at,
    fuzzy_join,
    levenshtein_batch,
)


def _ed(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            cur = min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
            prev, dp[j] = dp[j], cur
    return dp[len(b)]


def _canon_hash(s: bytes) -> int:
    with np.errstate(over="ignore"):
        h = np.uint64(0)
        for c in s:
            h = h * _FNV_PRIME + np.uint64(c)
        return int(h + np.uint64(0x9E3779B97F4A7C15) * np.uint64(len(s)))


def test_levenshtein_batch_exact():
    rng = random.Random(11)
    a, b = [], []
    for _ in range(300):
        a.append("".join(rng.choice("abcd") for _ in range(rng.randint(0, 10))))
        b.append("".join(rng.choice("abcd") for _ in range(rng.randint(0, 10))))
    a += ["", "x", "same", "kitten"]
    b += ["abc", "", "same", "sitting"]
    d = levenshtein_batch(pa.array(a), pa.array(b))
    assert [int(x) for x in d] == [_ed(x, y) for x, y in zip(a, b)]


@pytest.mark.parametrize("k", [1, 2])
def test_deletion_hashes_match_canonical(k):
    strs = ["", "a", "ab", "abc", "Customer#000000042", "hello world"]
    rows, hashes = _deletion_hashes(pa.array(strs), k)
    got = {}
    for r, h in zip(rows, hashes):
        got.setdefault(int(r), set()).add(int(np.uint64(h)))
    for ri, s in enumerate(strs):
        b = s.encode()
        want = set()
        for d in range(0, k + 1):
            for combo in itertools.combinations(range(len(b)), d):
                v = bytes(c for i, c in enumerate(b) if i not in combo)
                want.add(_canon_hash(v))
        assert got[ri] == want, (k, s)


def test_fastss_blocking_lossless():
    # every pair within edit distance k shares a deletion-variant hash
    rng = random.Random(5)
    words = ["".join(rng.choice("ab") for _ in range(rng.randint(2, 6))) for _ in range(40)]
    for k in (1, 2):
        rows, hashes = _deletion_hashes(pa.array(words), k)
        sets = {}
        for r, h in zip(rows, hashes):
            sets.setdefault(int(r), set()).add(int(np.uint64(h)))
        for i, j in itertools.combinations(range(len(words)), 2):
            if _ed(words[i], words[j]) <= k:
                assert sets[i] & sets[j], (k, words[i], words[j])


def test_delete_char_at():
    arr = pa.array(["abcdef", "xy", "q"])
    out = delete_char_at(arr, np.array([3, 1, 1]))
    assert out.to_pylist() == ["abdef", "y", ""]


def test_fuzzy_join_small(ray_session):
    left = rd.from_arrow(
        pa.table({"l_id": [1, 2, 3], "name": ["alpha", "beta", "gamma"]})
    )
    right = rd.from_arrow(
        pa.table({"r_id": [10, 20, 30], "name": ["alpba", "betas", "delta"]})
    )
    out = sorted(
        fuzzy_join(left, right, field="name", max_dist=1).take_all(),
        key=lambda r: (r["l_id"], r["r_id"]),
    )
    assert [(r["l_id"], r["r_id"], r["dist"]) for r in out] == [
        (1, 10, 1),  # substitution
        (2, 20, 1),  # insertion
    ]
    with pytest.raises(ValueError, match="max_dist"):
        fuzzy_join(left, right, max_dist=3)


def test_chunk_text_boundaries(ray_session):
    from vector_ray.functions.text import chunk_text

    docs = pa.table(
        {
            "doc_id": [0, 1, 2],
            "text": [
                " ".join(f"w{i}" for i in range(10)),  # 10 words: 2 chunks
                " ".join(f"v{i}" for i in range(7)),  # 7 = max: 1 chunk
                "solo",
            ],
        }
    )
    out = sorted(
        chunk_text(rd.from_arrow(docs), max_words=7, overlap=3).take_all(),
        key=lambda r: (r["doc_id"], r["chunk_id"]),
    )
    by = {(r["doc_id"], r["chunk_id"]): r for r in out}
    assert len(by) == 4
    assert by[(0, 0)]["chunk"] == "w0 w1 w2 w3 w4 w5 w6"
    assert by[(0, 1)]["chunk"] == "w4 w5 w6 w7 w8 w9"  # stride 4, tail clipped
    assert by[(0, 1)]["n_words"] == 6
    assert by[(1, 0)]["n_words"] == 7  # exactly max -> no second chunk
    assert by[(2, 0)]["chunk"] == "solo"
    with pytest.raises(ValueError, match="overlap"):
        chunk_text(rd.from_arrow(docs), max_words=5, overlap=5)
