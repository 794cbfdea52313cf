"""Tests for row-local token layout ops: strip, truncate, sliding
windows, and fill-in-middle."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data as rd


def _collect(ds) -> pa.Table:
    tables = [t for t in ray.get(ds.materialize().to_arrow_refs()) if t.num_rows]
    return pa.concat_tables(tables, promote_options="default") if tables else pa.table({})


def _mk(docs):
    return pa.table(
        {
            "doc_id": [f"doc-{i:010d}" for i in range(len(docs))],
            "tokens": pa.array([list(map(int, d)) for d in docs], pa.list_(pa.int32())),
            "n_tok": pa.array([len(d) for d in docs], pa.int32()),
        }
    )


def test_strip_tokens(ray_session):
    from vector_ray.functions.tokens import strip_tokens

    docs = [[1, 2, 3, 2, 1], [2, 2], [], [4, 5]]
    out = _collect(strip_tokens(rd.from_arrow(_mk(docs)), blocklist=[2])).sort_by("doc_id")
    assert out["tokens"].to_pylist() == [[1, 3, 1], [], [], [4, 5]]
    assert out["n_tok"].to_pylist() == [3, 0, 0, 2]
    assert out["tokens"].type == pa.list_(pa.int32())


def test_truncate_sequences(ray_session):
    from vector_ray.functions.tokens import truncate_sequences

    docs = [[1, 2, 3, 4, 5], [9], []]
    out = _collect(truncate_sequences(rd.from_arrow(_mk(docs)), 3)).sort_by("doc_id")
    assert out["tokens"].to_pylist() == [[1, 2, 3], [9], []]
    assert out["n_tok"].to_pylist() == [3, 1, 0]


def test_window_chunks(ray_session):
    from vector_ray.functions.tokens import window_chunks

    docs = [list(range(10)), [7], []]
    out = _collect(window_chunks(rd.from_arrow(_mk(docs)), chunk_len=4, stride=3))
    out = out.sort_by([("doc_id", "ascending"), ("win_id", "ascending")])
    got = list(zip(out["doc_id"].to_pylist(), out["win_id"].to_pylist(),
                   out["tokens"].to_pylist()))
    assert got == [
        ("doc-0000000000", 0, [0, 1, 2, 3]),
        ("doc-0000000000", 1, [3, 4, 5, 6]),
        ("doc-0000000000", 2, [6, 7, 8, 9]),
        ("doc-0000000000", 3, [9]),
        ("doc-0000000001", 0, [7]),
    ]
    assert out["n_tok"].to_pylist() == [4, 4, 4, 1, 1]


def test_fim_transform_reassembles(ray_session):
    from vector_ray.functions.tokens import (
        FIM_MID,
        FIM_MULT_A,
        FIM_MULT_B,
        FIM_PRE,
        FIM_SUF,
        fim_transform,
    )

    rng = np.random.default_rng(2)
    docs = [rng.integers(0, 100, size=rng.integers(0, 12)).tolist() for _ in range(30)]
    out = _collect(fim_transform(rd.from_arrow(_mk(docs)))).sort_by("doc_id")
    for i, orig in enumerate(docs):
        seq = out["tokens"][i].as_py()
        n = len(orig)
        assert out["n_tok"][i].as_py() == n + 3
        # recompute split points exactly as the engine defines them
        a = (i * FIM_MULT_A) % (1 << 32) % (n + 1)
        b = a + (i * FIM_MULT_B) % (1 << 32) % (n - a + 1)
        expect = [FIM_PRE] + orig[:a] + [FIM_SUF] + orig[b:] + [FIM_MID] + orig[a:b]
        assert seq == expect, (i, a, b, n)


def test_span_dedupe(ray_session):
    from vector_ray.functions.tokens import span_dedupe

    # doc A and doc B share the span [100..109]; doc C is clean; doc D
    # repeats its own 8-gram (within-doc duplication also counts)
    A = [1, 2, 3] + list(range(100, 110)) + [4, 5]
    B = [9, 8] + list(range(100, 110)) + [7]
    C = list(range(200, 215))
    D = list(range(300, 308)) * 2
    out = _collect(span_dedupe(rd.from_arrow(_mk([A, B, C, D])), n=8)).sort_by("doc_id")
    toks = out["tokens"].to_pylist()
    # A: positions 3..12 covered (grams at 3,4,5 duplicated in B)
    assert toks[0] == [1, 2, 3, 4, 5][:3] + [4, 5]
    assert toks[1] == [9, 8, 7]
    assert toks[2] == C
    assert toks[3] == []
    assert out["n_removed"].to_pylist() == [10, 10, 0, 16]
    assert out["n_tok"].to_pylist() == [5, 3, 15, 0]
    assert out["tokens"].type == pa.list_(pa.int32())


def test_plant_duplicates(ray_session):
    from vector_ray.functions.tokens import plant_duplicates

    docs = [list(range(30)), list(range(5)), list(range(40, 70))]
    t = pa.table(
        {
            "doc_id": ["doc-0000000000", "doc-0000000031", "doc-0000000062"],
            "tokens": pa.array(docs, pa.list_(pa.int32())),
        }
    )
    out = _collect(plant_duplicates(rd.from_arrow(t), every=31, skip=10, min_len=24))
    out = out.sort_by("doc_id")
    ids = out["doc_id"].to_pylist()
    assert ids == [
        "doc-0000000000", "doc-0000000031", "doc-0000000062",
        "dup-doc-0000000000", "dup-doc-0000000062",
    ]
    assert out["tokens"].to_pylist()[-2:] == [list(range(10, 30)), list(range(50, 70))]


def test_span_corrupt_matches_reference(ray_session):
    from vector_ray.functions.tokens import (
        SC_EOS,
        SC_MULT_A,
        SC_MULT_B,
        SC_SENT_BASE,
        span_corrupt,
    )

    L, every = 4, 7
    rng = np.random.default_rng(5)
    docs = [rng.integers(0, 1000, size=m).tolist()
            for m in [0, 1, 3, 4, 5, 8, 29, 64, 100, 17]]
    out = _collect(span_corrupt(rd.from_arrow(_mk(docs)), span_len=L, every=every))
    out = out.sort_by("doc_id")
    for i, d in enumerate(docs):
        inputs, targets, masked_ct = [], [], 0
        k = 0
        for b in range((len(d) + L - 1) // L):
            blk = d[b * L : (b + 1) * L]
            full = len(blk) == L
            h = (i * SC_MULT_A + b * SC_MULT_B) % (1 << 32)
            if full and h % every == 0:
                inputs.append(SC_SENT_BASE + k)
                targets.extend([SC_SENT_BASE + k] + blk)
                k += 1
                masked_ct += 1
            else:
                inputs.extend(blk)
        targets.append(SC_EOS)
        assert out["inputs"][i].as_py() == inputs, (i, "inputs")
        assert out["targets"][i].as_py() == targets, (i, "targets")
        assert out["n_masked"][i].as_py() == masked_ct
    assert out["inputs"].type == pa.list_(pa.int32())
    assert out["targets"].type == pa.list_(pa.int32())


def test_epoch_crop(ray_session):
    from vector_ray.functions.tokens import CROP_MULT_A, CROP_MULT_B, epoch_crop

    docs = [list(range(20)), [5, 6], list(range(100, 103))]
    C, epoch = 8, 3
    out = _collect(epoch_crop(rd.from_arrow(_mk(docs)), crop_len=C, epoch=epoch))
    out = out.sort_by("doc_id")
    for i, d in enumerate(docs):
        got = out["tokens"][i].as_py()
        if len(d) > C:
            st = ((i * CROP_MULT_A) + epoch * CROP_MULT_B) % (1 << 32) % (len(d) - C + 1)
            assert got == d[st : st + C], (i, st)
        else:
            assert got == d
        assert out["n_tok"][i].as_py() == min(len(d), C)
    # different epochs crop at different places for long docs
    out2 = _collect(epoch_crop(rd.from_arrow(_mk(docs)), crop_len=C, epoch=4))
    assert out2.sort_by("doc_id")["tokens"][0].as_py() != out["tokens"][0].as_py()


def test_bottomk_sample_exact_k(ray_session):
    from vector_ray.functions.curation import bottomk_sample

    t = pa.table(
        {
            "doc_id": [f"doc-{i:010d}" for i in range(500)],
            "v": list(range(500)),
        }
    )
    out = _collect(bottomk_sample(rd.from_arrow(t).repartition(8), k=20))
    assert out.num_rows == 20
    # matches the brute-force bottom-20 by the same hash
    h = [(i * 2_654_435_761) % (1 << 32) for i in range(500)]
    want = sorted(sorted(range(500), key=lambda i: h[i])[:20])
    got = sorted(int(d[4:]) for d in out["doc_id"].to_pylist())
    assert got == want
    assert "__h" not in out.column_names


def test_positional_stats(ray_session):
    from vector_ray.functions.tokens import positional_stats

    docs = [[10, 20, 30], [40, 50], [60]]
    out = _collect(positional_stats(rd.from_arrow(_mk(docs)), max_pos=8))
    out = out.sort_by("pos")
    assert out["pos"].to_pylist() == [0, 1, 2]
    assert out["n"].to_pylist() == [3, 2, 1]
    assert out["sum_tok"].to_pylist() == [110, 70, 30]
    assert out["mean_tok"].to_pylist() == [pytest.approx(110 / 3, abs=1e-4), 35.0, 30.0]


def test_temperature_mixture(ray_session):
    from vector_ray.functions.curation import MIX_MULT, temperature_mixture

    t = pa.table(
        {
            "doc_id": [f"doc-{i:010d}" for i in range(400)],
            "source": ["web"] * 300 + ["wiki"] * 100,
            "n_tok": [100] * 300 + [50] * 100,
        }
    )
    out = _collect(temperature_mixture(rd.from_arrow(t), alpha=0.5))
    # rates: shares 30000/35000, 5000/35000 -> sqrt -> peak=web -> web 1.0
    rate_wiki = (5000 / 35000) ** 0.5 / (30000 / 35000) ** 0.5
    kept_web = sum(1 for s in out["source"].to_pylist() if s == "web")
    assert kept_web == 300  # largest source kept whole
    expect_wiki = sum(
        1
        for i in range(300, 400)
        if (i * MIX_MULT) % (1 << 32) < rate_wiki * (1 << 32)
    )
    assert out.num_rows - kept_web == expect_wiki


def test_span_dedupe_identical_doc_skew(ray_session):
    """Adversarial duplication: 3000 identical docs. The gram-count
    groupby sees each gram once per BLOCK (batch partials), never one
    row per occurrence, and the masker is per-batch vectorized — no
    single-task straggler. Every token of every doc must be removed."""
    import time

    from vector_ray.functions.tokens import span_dedupe

    doc = list(range(500, 540))
    t = pa.table(
        {
            "doc_id": [f"doc-{i:010d}" for i in range(3000)],
            "tokens": pa.array([doc] * 3000, pa.list_(pa.int32())),
        }
    )
    for mask in ("broadcast", "exchange"):
        t0 = time.perf_counter()
        out = _collect(
            span_dedupe(rd.from_arrow(t).repartition(8), n=8, mask=mask)
        )
        elapsed = time.perf_counter() - t0
        assert out.num_rows == 3000
        assert out["n_tok"].to_pylist() == [0] * 3000
        assert out["n_removed"].to_pylist() == [40] * 3000
        assert elapsed < 60, f"{mask} skew straggler: {elapsed:.1f}s"


def test_token_ops_via_spec_dag(ray_session):
    """The token-layout family runs as config-driven spec transforms."""
    import ray

    from vector_ray import run_pipeline

    res = run_pipeline(
        {
            "sources": {
                "corpus": {
                    "type": "inline",
                    "table": _mk([[1, 2, 0, 3, 4, 5], [0, 0], list(range(40))]),
                }
            },
            "transforms": {
                "strip": {
                    "type": "strip_tokens",
                    "inputs": ["corpus"],
                    "blocklist": [0],
                },
                "trunc": {
                    "type": "truncate_tokens",
                    "inputs": ["strip"],
                    "max_len": 16,
                },
                "crop": {
                    "type": "epoch_crop",
                    "inputs": ["trunc"],
                    "crop_len": 8,
                    "epoch": 2,
                },
            },
            "sinks": {"out": {"type": "collect", "inputs": ["crop"]}},
        }
    )
    t = res.sinks["out"].table
    assert t.num_rows == 3
    assert max(t["n_tok"].to_pylist()) <= 8
    assert 0 not in [x for row in t["tokens"].to_pylist() for x in row]


def test_span_dedupe_against_reference(ray_session):
    from vector_ray.functions.tokens import span_dedupe_against, splice_mutants

    # ref corpus; new shard duplicates ref spans plus novel material
    ref_docs = [list(range(100, 140)), list(range(500, 520))]
    ref = rd.from_arrow(_mk(ref_docs))
    new = pa.table(
        {
            "doc_id": ["new-1", "new-2"],
            "tokens": pa.array(
                [
                    list(range(100, 116)) + [9999] * 4,  # 16 dup + 4 novel
                    [7, 8, 9, 10, 11, 12, 13, 14],  # entirely novel
                ],
                pa.list_(pa.int32()),
            ),
        }
    )
    out = _collect(span_dedupe_against(rd.from_arrow(new), ref, n=8)).sort_by("doc_id")
    toks = out["tokens"].to_pylist()
    # new-1: grams at starts 0..8 are in ref -> positions 0..15 masked;
    # grams at 9..12 cross into the novel tail -> 16..19 kept
    assert toks[0] == [9999] * 4
    assert out["n_removed"].to_pylist()[0] == 16
    assert toks[1] == [7, 8, 9, 10, 11, 12, 13, 14]


def test_splice_mutants(ray_session):
    from vector_ray.functions.tokens import splice_mutants

    docs = [list(range(30)), [1, 2, 3]]
    t = pa.table(
        {
            "doc_id": ["doc-0000000000", "doc-0000000031"],
            "tokens": pa.array(docs, pa.list_(pa.int32())),
        }
    )
    out = _collect(splice_mutants(rd.from_arrow(t), every=31, skip=10, min_len=24))
    assert out["doc_id"].to_pylist() == ["mut-doc-0000000000"]
    assert out["tokens"][0].as_py() == list(range(10, 30)) + list(range(9, -1, -1))


def test_append_eos(ray_session):
    from vector_ray.functions.tokens import EOS_TOKEN, append_eos

    docs = [[1, 2, 3], [], [7]]
    out = append_eos(_mk(docs))
    assert out["tokens"].to_pylist() == [
        [1, 2, 3, EOS_TOKEN], [EOS_TOKEN], [7, EOS_TOKEN]
    ]
    assert out["n_tok"].to_pylist() == [4, 1, 2]
    assert out["tokens"].type == pa.list_(pa.int32())


def test_chunk_boundaries(ray_session, tmp_path):
    import pyarrow.parquet as _pq

    from vector_ray.functions.tokens import chunk_boundaries

    # two files; doc lengths 3, 4 | 5 -> starts 0, 3, 7; chunk_len 5
    t1 = _mk([[1, 2, 3], [4, 5, 6, 7]])
    t2 = _mk([[9] * 5]).set_column(
        0, "doc_id", pa.array(["doc-0000000009"])
    )
    _pq.write_table(t1, str(tmp_path / "a.parquet"))
    _pq.write_table(t2, str(tmp_path / "b.parquet"))
    out = _collect(
        chunk_boundaries(
            [str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")],
            chunk_len=5,
        )
    ).sort_by("chunk_id")
    assert out["chunk_id"].to_pylist() == [0, 1]
    assert out["doc_starts"].to_pylist() == [[0, 3], [2]]
    assert out["n_docs"].to_pylist() == [2, 1]


def test_gram_index_roundtrip(ray_session, tmp_path):
    from vector_ray.functions.tokens import (
        gram_set,
        save_gram_index,
        span_dedupe_against,
        span_dedupe_against_index,
    )

    ref_docs = [list(range(100, 140)), list(range(500, 520))]
    ref = rd.from_arrow(_mk(ref_docs))
    h1, h2 = gram_set(ref, n=8, min_count=1)
    idx = str(tmp_path / "grams.parquet")
    assert save_gram_index(h1, h2, idx) == len(h1) > 0
    new = pa.table(
        {
            "doc_id": ["new-1"],
            "tokens": pa.array(
                [list(range(100, 116)) + [9999] * 4], pa.list_(pa.int32())
            ),
        }
    )
    via_index = _collect(span_dedupe_against_index(rd.from_arrow(new), idx, n=8))
    direct = _collect(span_dedupe_against(rd.from_arrow(new), ref, n=8))
    assert via_index.equals(direct)
    assert via_index["tokens"].to_pylist() == [[9999] * 4]
    # exchange mask: same result without concatenating the ref index
    exch = _collect(
        span_dedupe_against(rd.from_arrow(new), ref, n=8, mask="exchange")
    )
    assert exch.equals(direct)


def test_pair_member_exactness(ray_session):
    """_pair_member == brute-force set membership, including equal-h1
    runs (the width>1 branch a real 64-bit hash never exercises) and
    bitmap prefilter interplay via _build_mask_state/_mask_spans."""
    from vector_ray.functions.tokens import _build_mask_state, _pair_member

    rng = np.random.default_rng(7)
    # keys: random pairs PLUS three keys sharing one h1 (forced run)
    k1 = rng.integers(0, 2**63, 500, dtype=np.int64).astype(np.uint64)
    k2 = rng.integers(0, 2**63, 500, dtype=np.int64).astype(np.uint64)
    shared = np.uint64(123456789)
    k1 = np.concatenate([k1, [shared, shared, shared]])
    k2 = np.concatenate([k2, np.array([7, 9, 11], np.uint64)])
    s1, s2, _bitmap = _build_mask_state(k1, k2)

    # queries: half true members (incl. all three run members), half
    # near-misses (member h1 with non-member h2 — the case a naive
    # h1-only check gets wrong), half randoms
    q1 = np.concatenate([k1, k1, rng.integers(0, 2**63, 300, dtype=np.int64).astype(np.uint64)])
    q2 = np.concatenate([k2, k2 + np.uint64(1), rng.integers(0, 2**63, 300, dtype=np.int64).astype(np.uint64)])
    got = _pair_member(s1, s2, q1, q2)

    truth = set(zip(k1.tolist(), k2.tolist()))
    want = np.array([(a, b) in truth for a, b in zip(q1.tolist(), q2.tolist())])
    assert (got == want).all()


def test_mask_spans_bitmap_equals_bruteforce(ray_session):
    """span_dedupe output is identical whether membership goes through
    the bitmap prefilter or a brute-force per-gram set check."""
    from vector_ray.functions.tokens import (
        _build_mask_state,
        _flat_tokens,
        _gram_windows,
        _hash_grams,
        _hash_grams2,
        _mask_spans,
        gram_set,
    )

    rng = np.random.default_rng(11)
    docs = [rng.integers(0, 50, rng.integers(8, 40)).tolist() for _ in range(60)]
    docs[10] = docs[3][:]  # exact dup
    docs[20] = docs[3][:12] + docs[7][:12]  # shared spans
    t = _mk(docs)
    ds = rd.from_arrow(t)
    h1, h2 = gram_set(ds, n=8)
    assert len(h1) > 0
    state_ref = ray.put(_build_mask_state(h1, h2))
    out = _mask_spans(t, state_ref, 8)

    # brute force: membership via a Python set of (h1, h2)
    dup = set(zip(h1.tolist(), h2.tolist()))
    values, offsets = _flat_tokens(t)
    starts, _ = _gram_windows(values, offsets, 8)
    g1 = _hash_grams(values, starts, 8)
    g2 = _hash_grams2(values, starts, 8)
    cover = np.zeros(len(values) + 1, dtype=np.int64)
    for s, a, b in zip(starts, g1.tolist(), g2.tolist()):
        if (a, b) in dup:
            cover[s] += 1
            cover[s + 8] -= 1
    keep = ~(np.cumsum(cover[:-1]) > 0)
    got_flat, got_off = _flat_tokens(out)
    assert got_flat.tolist() == values[keep].tolist()
    assert out["n_removed"].to_pylist() == [
        int((~keep)[offsets[i]:offsets[i + 1]].sum()) for i in range(len(docs))
    ]


def test_hash_grams_sparse_dense_paths():
    """_hash_grams picks a slice path for dense starts and a gather path
    for sparse starts (< 1/4 of window positions); both must produce the
    exact per-window FNV-1a values of a per-row reference loop."""
    from vector_ray.functions.tokens import (
        _FNV2_OFFSET,
        _FNV2_PRIME,
        _FNV_OFFSET,
        _FNV_PRIME,
        _hash_grams,
        _hash_grams2,
        _hash_grams_pair,
    )

    rng = np.random.default_rng(5)
    values = rng.integers(0, 1000, 4000).astype(np.int32)

    def ref(starts, off, prime):
        out = []
        for s in starts:
            h = int(off)
            for tok in values[s : s + 8]:
                h = ((h ^ int(np.uint64(np.int64(tok).astype(np.uint64))))
                     * int(prime)) % (1 << 64)
            out.append(h)
        return out

    dense = np.arange(len(values) - 7, dtype=np.int64)
    sparse = dense[::29]  # < 1/4 of positions -> gather path
    for starts in (dense, sparse):
        assert _hash_grams(values, starts, 8).tolist() == ref(
            starts, _FNV_OFFSET, _FNV_PRIME
        )
        assert _hash_grams2(values, starts, 8).tolist() == ref(
            starts, _FNV2_OFFSET, _FNV2_PRIME
        )
        p1, p2 = _hash_grams_pair(values, starts, 8)
        assert p1.tolist() == ref(starts, _FNV_OFFSET, _FNV_PRIME)
        assert p2.tolist() == ref(starts, _FNV2_OFFSET, _FNV2_PRIME)
    # empty starts
    e1, e2 = _hash_grams_pair(values, np.empty(0, np.int64), 8)
    assert len(e1) == 0 and len(e2) == 0


def test_span_dedupe_exchange_equals_broadcast(ray_session):
    """mask="exchange" (index stays partitioned per bucket, query grams
    routed to it) must produce byte-identical rows to the broadcast
    default, across several num_buckets/num-groups shapes including the
    num_buckets=1 / single-block degenerate cases."""
    from vector_ray.functions.tokens import span_dedupe

    rng = np.random.default_rng(23)
    docs = [rng.integers(0, 40, rng.integers(8, 60)).tolist() for _ in range(150)]
    docs[30] = docs[4][:]
    docs[75] = docs[4][:15] + docs[9][:15]
    t = _mk(docs)

    for num_buckets, blocks in [(8, 6), (1, 1), (4, 1)]:
        ds_b = rd.from_arrow(t).repartition(blocks)
        ds_e = rd.from_arrow(t).repartition(blocks)
        b = _collect(
            span_dedupe(ds_b, n=8, num_buckets=num_buckets, mask="broadcast")
        ).sort_by("doc_id")
        e = _collect(
            span_dedupe(ds_e, n=8, num_buckets=num_buckets, mask="exchange")
        ).sort_by("doc_id")
        assert b.equals(e), f"mismatch at num_buckets={num_buckets} blocks={blocks}"
        assert e["tokens"].type == pa.list_(pa.int32())
    # some tokens must actually have been removed for the test to bite
    assert sum(e["n_removed"].to_pylist()) > 0

    # no duplicates at all -> output equals input layout
    clean = _mk([[i, i + 1, i + 2] for i in range(10)])
    out = _collect(
        span_dedupe(rd.from_arrow(clean), n=8, mask="exchange")
    ).sort_by("doc_id")
    assert out["tokens"].to_pylist() == clean["tokens"].to_pylist()

    with pytest.raises(ValueError):
        span_dedupe(rd.from_arrow(clean), mask="nope")


def test_span_dedupe_auto_mask(ray_session):
    """mask="auto" (= the exchange plan) matches the explicit
    broadcast and exchange modes byte-for-byte."""
    from vector_ray.functions.tokens import span_dedupe

    rng = np.random.default_rng(31)
    docs = [rng.integers(0, 40, rng.integers(8, 60)).tolist() for _ in range(120)]
    docs[40] = docs[7][:]
    t = _mk(docs)

    want = _collect(
        span_dedupe(rd.from_arrow(t).repartition(4), n=8, mask="broadcast")
    ).sort_by("doc_id")
    via_auto = _collect(
        span_dedupe(rd.from_arrow(t).repartition(4), n=8, mask="auto")
    ).sort_by("doc_id")
    via_exch = _collect(
        span_dedupe(rd.from_arrow(t).repartition(4), n=8, mask="exchange")
    ).sort_by("doc_id")
    assert via_auto.equals(want) and via_exch.equals(want)
    assert sum(want["n_removed"].to_pylist()) > 0


def test_turn_examples(ray_session):
    from vector_ray.functions.tokens import turn_examples

    M = 99
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "tokens": pa.array(
                [
                    [5, M, 6, 7, M, 8],        # one closed turn
                    [M, 1, 2],                 # trailing open turn
                    [3, 4],                    # no markers -> nothing
                    [M, 1, M, 2, M, 3, M, 4],  # two closed turns
                ],
                pa.list_(pa.int32()),
            ),
        }
    )
    out = _collect(
        turn_examples(rd.from_arrow(t).repartition(3), [M])
    ).sort_by([("doc_id", "ascending"), ("turn", "ascending")])
    assert out.to_pydict() == {
        "doc_id": [1, 2, 4, 4],
        "turn": [1, 1, 1, 2],
        "n_ctx": [5, 3, 3, 7],
        "tokens": [
            [5, M, 6, 7, M],
            [M, 1, 2],
            [M, 1, M],
            [M, 1, M, 2, M, 3, M],
        ],
    }
    assert pa.types.is_int32(out["tokens"].type.value_type)

    # max_turns caps the fan-out at the earliest turns
    capped = _collect(
        turn_examples(rd.from_arrow(t), [M], max_turns=1)
    ).sort_by([("doc_id", "ascending")])
    assert capped["doc_id"].to_pylist() == [1, 2, 4]
    assert capped["turn"].to_pylist() == [1, 1, 1]

    # marker-free corpus -> empty output with the right schema
    none = _collect(
        turn_examples(rd.from_arrow(_mk([[1, 2], [3]])), [M])
    )
    assert none.num_rows == 0
