"""Pre-training data-prep pipeline: mixture-sample → split → exact
sequence packing → epoch shuffle → partitioned Parquet.

The tokens-axis composite that turns the raw tokenized corpus
(``doc_id, tokens:list<int32>, n_tok, source`` — BASELINE.json
input_hint) into training-ready fixed-length chunks:

1. **mixture_sample** — deterministic per-source hash downsampling
   (rebalance crawl-heavy sources).
2. **split_assign** — leakage-free hash split; val docs are written
   out unpacked (eval wants document boundaries), train docs continue.
3. **pack_sequences(row_filter=...)** — exact concat-and-chunk into
   ``chunk_len`` windows. The mixture+split mask is a pure function of
   row content, so it runs inside pack's count AND emit passes and the
   chunk stream is byte-identical to filtering first — without an extra
   materialized copy of the corpus.
4. **epoch_shuffle(id_field="chunk_id")** — deterministic training
   order for the requested epoch (the one intentional all-to-all).
5. Partitioned Parquet out: ``train_chunks/`` + ``val_docs/``.

Every step is a pure function of content hashes, so reruns, different
cluster sizes, and resumed jobs produce identical bytes.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

import pyarrow as pa

import ray.data as rd

from vector_ray.functions.curation import (
    epoch_shuffle,
    mixture_sample,
    split_assign,
)
from vector_ray.functions.tokens import pack_sequences
from vector_ray.pipelines.flagship import list_input_files

__all__ = ["PretrainConfig", "train_filter", "run"]


@dataclass
class PretrainConfig:
    rates: dict = field(default_factory=dict)  # per-source mixture rates
    default_rate: float = 1.0
    val_per_mille: int = 10
    chunk_len: int = 2048
    epoch: int = 0
    # token-layout knobs (both pure row transforms, so the pack's count
    # and emit passes stay exactly agreed): strip these ids before
    # packing; append one EOS separator per document (GPT layout)
    blocklist: tuple = ()
    append_eos: bool = False


def train_filter(cfg: PretrainConfig):
    """Pure row filter: mixture-sampled AND split == train. Safe to run
    in any pass, any order, any partitioning — it only hashes ids."""
    from vector_ray.functions.curation import (
        _doc_hash,
        _source_rates,
        HASH_MOD,
        MIX_MULT,
        SPLIT_MULT,
    )

    def keep(t: pa.Table) -> pa.Table:
        sampled = _doc_hash(t, MIX_MULT) < (
            _source_rates(t, cfg.rates, cfg.default_rate) * HASH_MOD
        )
        is_train = (_doc_hash(t, SPLIT_MULT) % 1000) >= cfg.val_per_mille
        t = t.filter(pa.array(sampled & is_train))
        if cfg.blocklist:
            from vector_ray.functions.tokens import strip_tokens_table

            t = strip_tokens_table(t, cfg.blocklist)
        if cfg.append_eos:
            from vector_ray.functions.tokens import append_eos

            t = append_eos(t)
        return t

    return keep


def run(
    seq_dir: str,
    out_dir: str,
    cfg: PretrainConfig | None = None,
    resume: bool = True,
) -> dict:
    """Execute the prep pipeline; returns a summary dict.

    Resumable mid-pipeline: each stage (``val_docs``, ``train_chunks``)
    publishes atomically (write to ``.tmp-`` then rename) and drops a
    lineage marker; a rerun skips completed stages — the same
    checkpoint contract as the flagship (``state/checkpoint.py``). A
    config change is detected via the manifest hash and refused.
    """
    from vector_ray.state.checkpoint import CheckpointStore

    cfg = cfg or PretrainConfig()
    files = list_input_files(seq_dir)
    store = CheckpointStore(out_dir)
    store.open(
        {
            "pipeline": "pretrain",
            "seq_dir": seq_dir,
            "files": files,
            "rates": sorted(cfg.rates.items()),
            "default_rate": cfg.default_rate,
            "val_per_mille": cfg.val_per_mille,
            "chunk_len": cfg.chunk_len,
            "epoch": cfg.epoch,
            "blocklist": sorted(cfg.blocklist),
            "append_eos": cfg.append_eos,
        }
    )
    t0 = time.perf_counter()
    skipped = 0
    val_dir = os.path.join(out_dir, "val_docs")
    train_dir = os.path.join(out_dir, "train_chunks")

    # val docs: sampled, split == val, kept as whole documents
    if resume and store.is_done("val_docs"):
        skipped += 1
        n_val = int(store.records()["val_docs"]["rows"])
    else:
        val = split_assign(
            mixture_sample(
                rd.read_parquet(
                    files, columns=["doc_id", "tokens", "n_tok", "source"]
                ),
                cfg.rates,
                cfg.default_rate,
            ),
            cfg.val_per_mille,
        ).map_batches(
            lambda t: t.filter(pa.compute.equal(t["split"], "val")),
            batch_format="pyarrow",
        )
        with store.publish_dir(val_dir) as tmp:
            val.write_parquet(tmp)
        # count from parquet footers (metadata-only, no data scan)
        n_val = rd.read_parquet(val_dir, columns=["doc_id"]).count()
        store.mark_done("val_docs", {"rows": n_val})

    # train chunks: filter applied inside pack (no materialized copy)
    if resume and store.is_done("train_chunks"):
        skipped += 1
        rec = store.records()["train_chunks"]
        n_chunks, train_tokens = int(rec["rows"]), int(rec["tokens"])
    else:
        fcols = ("doc_id", "source") + (
            ("tokens",) if (cfg.blocklist or cfg.append_eos) else ()
        )
        chunks = pack_sequences(
            files,
            chunk_len=cfg.chunk_len,
            row_filter=train_filter(cfg),
            filter_columns=fcols,
        )
        ordered = (
            chunks
            if cfg.epoch is None
            else epoch_shuffle(chunks, cfg.epoch, id_field="chunk_id")
        )
        with store.publish_dir(train_dir) as tmp:
            ordered.write_parquet(tmp)
        # one pruned pass over n_tok; count() is footer-metadata-only
        tr = rd.read_parquet(train_dir, columns=["n_tok"])
        n_chunks = tr.count()
        train_tokens = int(tr.sum("n_tok") or 0)
        store.mark_done("train_chunks", {"rows": n_chunks, "tokens": train_tokens})

    return {
        "n_train_chunks": n_chunks,
        "train_tokens": train_tokens,
        "n_val_docs": n_val,
        "chunk_len": cfg.chunk_len,
        "epoch": cfg.epoch,
        "stages_skipped": skipped,
        "sec": round(time.perf_counter() - t0, 3),
        "train_dir": train_dir,
        "val_dir": val_dir,
    }
