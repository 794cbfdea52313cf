"""Tests for text normalization, BPE pre-token counting, Gopher rules,
and per-source token drift."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data as rd


def _collect(ds) -> pa.Table:
    tables = [t for t in ray.get(ds.materialize().to_arrow_refs()) if t.num_rows]
    return pa.concat_tables(tables, promote_options="default") if tables else pa.table({})


def test_normalize_text_composes_and_collapses(ray_session):
    from vector_ray.functions.text import normalize_text

    t = pa.table(
        {
            "doc_id": ["a"],
            "text": ["  Café   x\t\ny  "],  # decomposed accent
        }
    )
    out = _collect(normalize_text(rd.from_arrow(t)))
    got = out["text"][0].as_py()
    assert got == "Café x y"  # composed single codepoint, single spaces
    assert "́" not in got


def test_bpe_token_count_matches_duckdb(ray_session):
    import duckdb

    from vector_ray.functions.text import BPE_PRETOKEN_RE, bpe_token_count

    texts = ["Hello world, it's 2026!", "a  b", "", "foo_bar-baz 12x", "你好 world"]
    t = pa.table({"doc_id": [f"d{i}" for i in range(len(texts))], "text": texts})
    out = _collect(bpe_token_count(rd.from_arrow(t))).sort_by("doc_id")
    expect = [
        duckdb.sql(
            "SELECT length(regexp_extract_all(?, ?))",
            params=[s, BPE_PRETOKEN_RE],
        ).fetchone()[0]
        for s in texts
    ]
    assert out["n_bpe"].to_pylist() == expect
    assert out["n_bpe"].to_pylist()[0] == 7  # Hello/ world/,/ it/'s/ 2026/!


def test_gopher_filter_rules(ray_session):
    from vector_ray.functions.text import gopher_filter

    docs = {
        "short": "the cat sat",  # too few words
        "spam": " ".join(["buy"] * 40),  # top-word ratio 1.0
        "nostop": " ".join(f"w{i}" for i in range(40)),  # no stopwords
        "good": "the quick brown fox jumps over lazy dogs and " * 4 + "the end",
    }
    t = pa.table({"doc_id": list(docs), "text": list(docs.values())})
    out = _collect(gopher_filter(rd.from_arrow(t), min_words=20, max_words=80))
    got = dict(zip(out["doc_id"].to_pylist(), out["keep"].to_pylist()))
    assert got == {"short": False, "spam": False, "nostop": False, "good": True}


def test_source_token_drift_matches_naive(ray_session):
    from vector_ray.functions.lm import source_token_drift

    rng = np.random.default_rng(5)
    rows_src, rows_tok = [], []
    for i in range(60):
        src = f"s{i % 3}"
        # skew s2 toward high token ids so its KL is clearly nonzero
        lo, hi = (0, 40) if src != "s2" else (20, 60)
        rows_src.append(src)
        rows_tok.append(rng.integers(lo, hi, size=rng.integers(2, 20)).astype(np.int32).tolist())
    t = pa.table(
        {"source": rows_src, "tokens": pa.array(rows_tok, pa.list_(pa.int32()))}
    )
    out = source_token_drift(rd.from_arrow(t))
    assert out["source"].to_pylist() == ["s0", "s1", "s2"]

    # naive reference
    from collections import Counter

    per = {}
    for s, toks in zip(rows_src, rows_tok):
        per.setdefault(s, Counter()).update(toks)
    glob = Counter()
    for c in per.values():
        glob.update(c)
    ng = sum(glob.values())
    for i, s in enumerate(["s0", "s1", "s2"]):
        ns = sum(per[s].values())
        kl = sum(
            (c / ns) * np.log((c / ns) / (glob[tok] / ng))
            for tok, c in per[s].items()
        )
        assert out["n_tokens"][i].as_py() == ns
        assert abs(out["kl"][i].as_py() - kl) < 1e-3
    assert out["kl"][2].as_py() > out["kl"][0].as_py()


def test_ngram_diversity_reference(ray_session):
    """Trigram diversity vs a straight-line dict reference, across
    multiple blocks so the combiner path is exercised."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.functions.text import ngram_diversity

    docs = [
        ("a", "x y z x y z x y z"),          # repeated gram
        ("a", "p q r s"),
        ("b", "one two three four five"),
        ("b", "one two three four five"),    # exact dup doc
        ("a", ""),                            # empty
    ]
    t = pa.table({"source": [d[0] for d in docs],
                  "text": [d[1] for d in docs]})
    out = (
        ngram_diversity(
            rd.from_arrow(t).repartition(3), n=3, group_by="source"
        )
        .to_pandas()
        .set_index("source")
    )

    ref: dict = {}
    for src, text in docs:
        ws = text.split(" ")
        grams = [" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)]
        tot, dis = ref.setdefault(src, [0, set()])
        ref[src][0] += len(grams)
        ref[src][1].update(grams)
    for src, (tot, dis) in ref.items():
        if tot == 0:
            assert src not in out.index
            continue
        row = out.loc[src]
        assert row["n_grams"] == tot
        assert row["n_distinct"] == len(dis)
        assert abs(row["diversity"] - len(dis) / tot) < 1e-6
