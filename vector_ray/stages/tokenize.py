"""Deterministic tokenizer stage: text → tokens (list<int32>).

Definition (chosen to be exactly reproducible by a SQL oracle):
words = ``text.split(' ')`` (single-space split, empty pieces kept —
identical semantics to DuckDB ``string_split(text, ' ')``), and each
word maps to ``fnv1a64(word) % vocab_size`` as int32. So
``n_tok == len(string_split(text, ' '))`` holds on both engines, and the
token values themselves are a pure deterministic function of the text.

Vectorized: one ``pc.split_pattern`` per batch, a numpy FNV-1a over the
flattened word array, and a rebuilt ``ListArray`` on the original
offsets — no Python loop over rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from vector_ray.schema import VOCAB_SIZE
from vector_ray.stages.core import _stable_hash_u64


def tokenize_table(
    t: pa.Table,
    field: str = "text",
    target: str = "tokens",
    n_tok_col: str = "n_tok",
    vocab_size: int = VOCAB_SIZE,
) -> pa.Table:
    col = t[field]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(pc.cast(col, pa.string()), "")
    words = pc.split_pattern(col, pattern=" ")
    flat = words.flatten()
    if len(flat):
        ids = (_stable_hash_u64(flat) % np.uint64(vocab_size)).astype(np.int32)
    else:
        ids = np.array([], dtype=np.int32)
    offsets = words.offsets
    tokens = pa.ListArray.from_arrays(offsets, pa.array(ids, pa.int32()))
    n_tok = pc.cast(pc.list_value_length(words), pa.int32())
    out = t
    for name, vals in ((target, tokens), (n_tok_col, n_tok)):
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        if name in out.column_names:
            out = out.set_column(out.column_names.index(name), name, vals)
        else:
            out = out.append_column(name, vals)
    return out


def tokenize(ds, options: dict, ctx=None):
    field = options.get("field", "text")
    target = options.get("target", "tokens")
    n_tok_col = options.get("n_tok_field", "n_tok")
    vocab = options.get("vocab_size", VOCAB_SIZE)
    return ds.map_batches(
        lambda t: tokenize_table(t, field, target, n_tok_col, vocab),
        batch_format="pyarrow",
    )
