"""Deterministic synthetic sequence corpus (the demo_logs analog).

The reference generates demo workloads with its ``demo_logs`` source
(count/interval/format options, ui config_panel.rs:794-846;
dev/configs/production/vector.toml:13-17). Our analog is a seeded,
numpy-vectorized generator producing the BASELINE.json input shape

    doc_id: string, tokens: list<int32>, n_tok: int32, source: string

plus a syslog-ish ``message`` line per row so the grok/regex parse stage
has something to extract (FIXTURES.md §1).

Corpora are cached as *sharded* Parquet under ``/tmp/vector_ray_data/<tag>/``
(one file per shard = the checkpoint/resume partition unit) and written
atomically (tmp dir + rename) so concurrent callers never see partial data.
Generation is a pure function of (tag,) — no Ray needed.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from vector_ray.schema import ENRICHMENT_SCHEMA, VOCAB_SIZE

DATA_ROOT = os.environ.get("VECTOR_RAY_DATA_ROOT", "/tmp/vector_ray_data")
SEED = 42
ROWS_PER_SF = 5_000_000  # sf0.001 → 5k rows, sf0.01 → 50k, sf0.1 → 500k
ROWS_PER_SHARD = 50_000

SOURCES = ["web", "books", "code", "wiki", "news", "forum", "academic", "synthetic"]
# one source value intentionally absent from the enrichment table to test
# miss behavior (FIXTURES.md §3): "synthetic" has no enrichment row.
ENRICHED_SOURCES = SOURCES[:-1]

LEVELS = np.array(["info", "debug", "warn", "error"])
STATUSES = np.array([200, 200, 200, 301, 404, 500], dtype=np.int32)
HOSTS = np.array(["host-a", "host-b", "host-c", "host-d"])
APPS = np.array(["ingestd", "tokenizerd", "shardmv", "demo-app"])


def rows_for_tag(tag: str) -> int:
    """sf0.01 → 50_000 etc.; non-sf tags parse as an explicit row count."""
    if tag.startswith("sf"):
        return max(1000, int(round(float(tag[2:]) * ROWS_PER_SF)))
    return int(tag)


def _zipf_sources(rng: np.random.Generator, n: int) -> np.ndarray:
    # zipf-skewed categorical over the 8 sources: p(k) ∝ 1/(k+1)^1.1
    ranks = np.arange(1, len(SOURCES) + 1, dtype=np.float64)
    p = 1.0 / ranks**1.1
    p /= p.sum()
    return rng.choice(len(SOURCES), size=n, p=p)


def generate_batch(start: int, n: int, seed: int = SEED) -> pa.Table:
    """Generate rows [start, start+n) deterministically.

    Each shard seeds its own Generator from (seed, start) so any shard can
    be produced independently — the property that makes re-generation and
    resume cheap at scale.
    """
    rng = np.random.default_rng((seed, start))
    idx = np.arange(start, start + n, dtype=np.int64)
    doc_id = np.char.add("doc-", np.char.zfill(idx.astype("U10"), 10))

    n_tok = np.clip(
        np.round(rng.lognormal(mean=4.6, sigma=0.9, size=n)), 1, 2048
    ).astype(np.int32)
    total = int(n_tok.sum())
    flat = rng.integers(0, VOCAB_SIZE, size=total, dtype=np.int32)
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(n_tok, out=offsets[1:])
    tokens = pa.ListArray.from_arrays(pa.array(offsets), pa.array(flat))

    src_idx = _zipf_sources(rng, n)
    source = np.asarray(SOURCES)[src_idx]

    level = LEVELS[rng.integers(0, len(LEVELS), size=n)]
    status = STATUSES[rng.integers(0, len(STATUSES), size=n)]
    host = HOSTS[src_idx % len(HOSTS)]
    app = APPS[rng.integers(0, len(APPS), size=n)]
    pid = rng.integers(100, 32768, size=n)
    lat = rng.integers(1, 2500, size=n)

    # syslog-ish line: "host app[pid]: level=error status=404 latency_ms=12 doc=doc-0000000001"
    message = [
        f"{h} {a}[{p}]: level={l} status={s} latency_ms={m} doc={d}"
        for h, a, p, l, s, m, d in zip(host, app, pid, level, status, lat, doc_id)
    ]

    return pa.table(
        {
            "doc_id": pa.array(doc_id, pa.string()),
            "tokens": tokens,
            "n_tok": pa.array(n_tok, pa.int32()),
            "source": pa.array(source, pa.string()),
            "message": pa.array(message, pa.string()),
        }
    )


def enrichment_table() -> pa.Table:
    """Source-keyed lookup table (enrichment_tables analog,
    reference validation/mod.rs:184; FIXTURES.md §3)."""
    groups = {
        "web": "crawl",
        "forum": "crawl",
        "news": "crawl",
        "books": "curated",
        "wiki": "curated",
        "academic": "curated",
        "code": "curated",
    }
    weights = {
        "web": 0.5,
        "books": 1.5,
        "code": 1.2,
        "wiki": 1.4,
        "news": 0.9,
        "forum": 0.4,
        "academic": 1.6,
    }
    lic = {
        "web": "cc",
        "books": "proprietary",
        "code": "public",
        "wiki": "cc",
        "news": "proprietary",
        "forum": "cc",
        "academic": "public",
    }
    return pa.table(
        {
            "source": pa.array(ENRICHED_SOURCES, pa.string()),
            "source_group": pa.array([groups[s] for s in ENRICHED_SOURCES]),
            "quality_weight": pa.array([weights[s] for s in ENRICHED_SOURCES]),
            "license": pa.array([lic[s] for s in ENRICHED_SOURCES]),
        },
        schema=ENRICHMENT_SCHEMA,
    )


def corpus_dir(tag: str) -> str:
    return os.path.join(DATA_ROOT, tag)


def sequences_dir(tag: str) -> str:
    return os.path.join(corpus_dir(tag), "sequences")


def enrichment_path(tag: str) -> str:
    return os.path.join(corpus_dir(tag), "enrichment.parquet")


def ensure_corpus(tag: str) -> str:
    """Idempotently materialize the corpus for ``tag``; returns the
    sequences directory. Safe to call from several processes: writers
    build in a private tmp dir and publish with an atomic rename."""
    seq_dir = sequences_dir(tag)
    done = os.path.join(corpus_dir(tag), "_DONE")
    if os.path.exists(done):
        return seq_dir
    os.makedirs(DATA_ROOT, exist_ok=True)
    n = rows_for_tag(tag)
    tmp = tempfile.mkdtemp(prefix=f".{tag}-", dir=DATA_ROOT)
    try:
        tmp_seq = os.path.join(tmp, "sequences")
        os.makedirs(tmp_seq)
        n_shards = max(4, (n + ROWS_PER_SHARD - 1) // ROWS_PER_SHARD)
        per = (n + n_shards - 1) // n_shards
        for i in range(n_shards):
            start = i * per
            cnt = min(per, n - start)
            if cnt <= 0:
                break
            pq.write_table(
                generate_batch(start, cnt),
                os.path.join(tmp_seq, f"shard-{i:05d}.parquet"),
                compression="zstd",
            )
        pq.write_table(enrichment_table(), os.path.join(tmp, "enrichment.parquet"))
        with open(os.path.join(tmp, "_DONE"), "w") as f:
            f.write(f"rows={n}\n")
        try:
            os.rename(tmp, corpus_dir(tag))
        except OSError:
            # another process won the race; keep theirs
            shutil.rmtree(tmp, ignore_errors=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return seq_dir


def tag_for_sf_dir(sf_dir: str) -> str:
    """Map a driver sf dir (/root/testdata/sf0.01) to a corpus tag."""
    return os.path.basename(os.path.normpath(sf_dir)) or "sf0.01"
