"""End-to-end test for the pre-training prep pipeline
(vector_ray/pipelines/pretrain.py): mixture → split → filtered exact
packing → epoch shuffle → partitioned parquet.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray
import ray.data as rd

from vector_ray import datagen
from vector_ray.pipelines import pretrain


@pytest.fixture(scope="module")
def seq_dir(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("pretrain_corpus")
    for i in range(4):
        pq.write_table(
            datagen.generate_batch(i * 1500, 1500),
            str(root / f"shard-{i:05d}.parquet"),
        )
    return str(root)


def test_pretrain_run_end_to_end(seq_dir, tmp_path):
    cfg = pretrain.PretrainConfig(
        rates={"web": 0.25, "forum": 0.5}, val_per_mille=50, chunk_len=512,
        epoch=1,
    )
    out = str(tmp_path / "out")
    s = pretrain.run(seq_dir, out, cfg)
    assert s["n_train_chunks"] > 0 and s["n_val_docs"] > 0

    train = pq.read_table(s["train_dir"])
    # chunks are exactly chunk_len except at most one trailing chunk
    lens = train["n_tok"].to_pylist()
    assert sum(1 for x in lens if x != 512) <= 1
    # tokens column type preserved
    assert train.schema.field("tokens").type == pa.list_(pa.int32())
    # shuffle key present and consistent with chunk_id permutation
    assert "shuffle_key" in train.column_names

    # byte-exact equivalence vs filter-then-serial-concat reference
    tables = [
        pq.read_table(f, columns=["doc_id", "tokens", "n_tok", "source"])
        for f in sorted(__import__("glob").glob(f"{seq_dir}/*.parquet"))
    ]
    full = pa.concat_tables(tables)
    keep = pretrain.train_filter(cfg)(full)
    flat = np.concatenate(
        [np.asarray(x, dtype=np.int32) for x in keep["tokens"].to_pylist()]
    )
    got = train.sort_by("chunk_id")
    got_flat = np.concatenate(
        [np.asarray(x, np.int32) for x in got["tokens"].to_pylist()]
    )
    assert np.array_equal(got_flat, flat)
    # val docs are disjoint from train docs and match the split rule
    val_ids = set(
        pq.read_table(s["val_dir"], columns=["doc_id"])["doc_id"].to_pylist()
    )
    train_ids = set(keep["doc_id"].to_pylist())
    assert not (val_ids & train_ids)

    # resume: a rerun skips both completed stages and output is unchanged
    s2 = pretrain.run(seq_dir, out, cfg)
    assert s2["stages_skipped"] == 2
    assert s2["n_train_chunks"] == s["n_train_chunks"]

    # crash-resume: wipe ONE stage's marker + output; only it reruns
    import os
    import shutil

    os.remove(f"{out}/_markers/train_chunks.json")
    shutil.rmtree(s["train_dir"])
    s3 = pretrain.run(seq_dir, out, cfg)
    assert s3["stages_skipped"] == 1
    redone = pq.read_table(s3["train_dir"]).sort_by("chunk_id")
    assert redone.equals(train.sort_by("chunk_id"))

    # config drift is refused
    with pytest.raises(RuntimeError):
        pretrain.run(
            seq_dir, out, pretrain.PretrainConfig(chunk_len=1024)
        )


def test_pretrain_blocklist_and_eos(ray_session, tmp_path):
    """The token-layout knobs compose into the packed stream exactly:
    chunks equal the serial strip -> +EOS -> concat -> cut reference."""
    import numpy as np

    from vector_ray.functions.tokens import EOS_TOKEN
    from vector_ray.pipelines import pretrain

    seq = tmp_path / "seq"
    seq.mkdir()
    for i in range(3):
        pq.write_table(
            datagen.generate_batch(i * 400, 400), str(seq / f"s-{i:05d}.parquet")
        )
    cfg = pretrain.PretrainConfig(
        chunk_len=256, blocklist=(0, 1, 2, 3), append_eos=True
    )
    out = tmp_path / "out"
    pretrain.run(str(seq), str(out), cfg, resume=False)
    got = pq.read_table(str(out / "train_chunks")).sort_by("chunk_id")
    stream = [x for row in got["tokens"].to_pylist() for x in row]

    # serial reference over the same filter + layout
    import pyarrow.compute as pc2

    ref_stream = []
    for i in range(3):
        t = pq.read_table(str(seq / f"s-{i:05d}.parquet"))
        kept = pretrain.train_filter(cfg)(t)
        for row in kept["tokens"].to_pylist():
            ref_stream.extend(row)
    assert stream == ref_stream
    assert EOS_TOKEN in set(stream[:100000])
    lens = got["n_tok"].to_pylist()
    assert all(x == 256 for x in lens[:-1])
