"""Tests for corpus-wide line dedup, vocabulary rank remap, and
document-boundary next-fit packing (the three late-round operators)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data as rd


def _collect(ds) -> pa.Table:
    tables = [t for t in ray.get(ds.materialize().to_arrow_refs()) if t.num_rows]
    return pa.concat_tables(tables, promote_options="default") if tables else pa.table({})


# ---------------------------------------------------------------- reflow


def test_reflow_wraps_every_eighth_word(ray_session):
    from vector_ray.functions.text import reflow

    words = [f"w{i}" for i in range(20)]
    t = pa.table({"doc_id": ["a"], "text": [" ".join(words)]})
    out = reflow(t)
    lines = out["text"][0].as_py().split("\n")
    assert lines[0] == " ".join(words[:8])
    assert lines[1] == " ".join(words[8:16])
    assert lines[2] == " ".join(words[16:])


# ----------------------------------------------------------- line_dedupe


def test_line_dedupe_keeps_first_occurrence(ray_session):
    from vector_ray.functions.text import line_dedupe

    t = pa.table(
        {
            "doc_id": ["a", "b", "c"],
            "text": [
                "shared line\nunique a",
                "shared line\nunique b",
                "shared line",  # loses its only line -> drops out
            ],
        }
    )
    out = _collect(line_dedupe(rd.from_arrow(t)))
    got = dict(zip(out["doc_id"].to_pylist(), out["text"].to_pylist()))
    assert got == {"a": "shared line\nunique a", "b": "unique b"}


def test_line_dedupe_line_order_preserved(ray_session):
    from vector_ray.functions.text import line_dedupe

    t = pa.table(
        {
            "doc_id": ["d1", "d2"],
            "text": ["x\ny\nz", "z\nq\nx"],
        }
    )
    out = _collect(line_dedupe(rd.from_arrow(t)))
    got = dict(zip(out["doc_id"].to_pylist(), out["text"].to_pylist()))
    assert got == {"d1": "x\ny\nz", "d2": "q"}


# ------------------------------------------------------ vocab_rank_remap


def test_vocab_rank_remap_matches_naive(ray_session):
    from vector_ray.functions.tokens import (
        rank_mapping,
        token_counts,
        vocab_rank_remap,
    )

    rng = np.random.default_rng(11)
    docs = [rng.integers(0, 50, size=rng.integers(1, 30)).astype(np.int32)
            for _ in range(40)]
    t = pa.table(
        {
            "doc_id": [f"d{i:03d}" for i in range(len(docs))],
            "tokens": pa.array([d.tolist() for d in docs], pa.list_(pa.int32())),
        }
    )
    ds = rd.from_arrow(t)

    counts = token_counts(ds.select_columns(["tokens"]))
    flat = np.concatenate(docs)
    naive = np.bincount(flat, minlength=len(counts))
    assert (counts[: len(naive)] == naive).all()
    assert counts[len(naive):].sum() == 0

    mapping = rank_mapping(counts)
    # rank 1 = most frequent token, ties broken by token asc
    order = np.lexsort((np.arange(len(counts)), -counts))
    assert mapping[order[0]] == 1
    # absent tokens map to 0
    assert mapping[counts == 0].sum() == 0

    out = _collect(vocab_rank_remap(ds)).sort_by("doc_id")
    assert out["tokens"].type == pa.list_(pa.int32())
    for i in range(len(docs)):
        got = np.asarray(out["tokens"][i].as_py())
        assert (got == mapping[docs[i]]).all()


# -------------------------------------------------------- pack_documents


def _naive_pack(rows, chunk_len):
    """(source, doc_id, n_tok) sorted -> {doc_id: (bin, pos)} next-fit."""
    state = {}
    out = {}
    for src, did, nt in sorted(rows):
        b, fill, pos = state.get(src, (0, 0, 0))
        if fill and fill + nt > chunk_len:
            b, fill, pos = b + 1, 0, 0
        out[did] = (b, pos)
        state[src] = (b, fill + nt, pos + 1)
    return out


def test_pack_documents_next_fit(ray_session):
    from vector_ray.functions.tokens import pack_documents

    rng = np.random.default_rng(3)
    rows = []
    for i in range(200):
        src = f"s{int(rng.integers(0, 3))}"
        nt = int(rng.integers(1, 120))
        if i == 17:
            nt = 999  # oversize: gets its own bin
        rows.append((src, f"doc-{i:05d}", nt))
    t = pa.table(
        {
            "doc_id": pa.array([r[1] for r in rows]),
            "source": pa.array([r[0] for r in rows]),
            "n_tok": pa.array([r[2] for r in rows], pa.int32()),
        }
    )
    out = _collect(pack_documents(rd.from_arrow(t), chunk_len=256))
    expect = _naive_pack(rows, 256)
    got = {
        d: (b, p)
        for d, b, p in zip(
            out["doc_id"].to_pylist(),
            out["bin_id"].to_pylist(),
            out["bin_pos"].to_pylist(),
        )
    }
    assert got == expect
    # no bin overflows except single-oversize-doc bins
    fills = {}
    for src, did, nt in rows:
        b, _ = expect[did]
        fills.setdefault((src, b), []).append(nt)
    for (src, b), lens in fills.items():
        assert sum(lens) <= 256 or len(lens) == 1
