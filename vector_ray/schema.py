"""Canonical Arrow schemas for the engine.

The primary input is a Parquet table of pre-tokenized training sequences
(BASELINE.json ``input_hint``):

    doc_id: string, tokens: list<int32>, n_tok: int32, source: string

The reference's event model is a schemaless JSON LogEvent
(shared/src/messages.rs:126-141); our Arrow mapping keeps the known
columns typed and carries any parse-derived fields as additional typed
columns (SURVEY.md §1.3).
"""

from __future__ import annotations

import pyarrow as pa

TOKENS_TYPE = pa.list_(pa.int32())

SEQUENCE_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("tokens", TOKENS_TYPE),
        pa.field("n_tok", pa.int32()),
        pa.field("source", pa.string()),
    ]
)

# parse-test variant: sequences plus a raw log line for the grok/regex
# parse stage to chew on (mirrors demo_logs formats, FIXTURES.md §1).
SEQUENCE_LOG_SCHEMA = pa.schema(
    list(SEQUENCE_SCHEMA) + [pa.field("message", pa.string())]
)

# Enrichment lookup table (enrichment_tables analog, validation/mod.rs:184)
ENRICHMENT_SCHEMA = pa.schema(
    [
        pa.field("source", pa.string()),
        pa.field("source_group", pa.string()),
        pa.field("quality_weight", pa.float64()),
        pa.field("license", pa.string()),
    ]
)

# MetricEvent analog (shared/src/messages.rs:145-183)
METRIC_SCHEMA = pa.schema(
    [
        pa.field("name", pa.string()),
        pa.field("namespace", pa.string()),
        pa.field("kind", pa.string()),  # incremental | absolute
        pa.field("value", pa.float64()),
    ]
)

VOCAB_SIZE = 50_257  # GPT-2-ish vocab bound for synthetic token ids


def assert_tokens_int32(table: pa.Table, column: str = "tokens") -> None:
    """Guard against silent int64 coercion of the token payload
    (pandas round-trips promote list<int32> to object/int64 — SURVEY.md §7.4)."""
    typ = table.schema.field(column).type
    if not (pa.types.is_list(typ) or pa.types.is_large_list(typ)):
        raise TypeError(f"{column} is not a list type: {typ}")
    if not pa.types.is_int32(typ.value_type):
        raise TypeError(f"{column} value type is {typ.value_type}, expected int32")


# SQL ROUND parity: DuckDB rounds half away from zero; arrow/numpy default
# to half-to-even. Use this mode whenever a value is compared to a SQL oracle.
SQL_ROUND_MODE = "half_towards_infinity"


def round_sql(arr, ndigits: int):
    """pc.round with SQL (half-away-from-zero) semantics."""
    import pyarrow.compute as _pc

    return _pc.round(arr, ndigits=ndigits, round_mode=SQL_ROUND_MODE)


def round_sql_np(arr, ndigits: int):
    """numpy rounding with SQL (half-away-from-zero) semantics."""
    import numpy as _np

    scale = 10.0 ** ndigits
    a = _np.asarray(arr, dtype=_np.float64)
    return _np.sign(a) * _np.floor(_np.abs(a) * scale + 0.5) / scale
