"""Single-process reference oracle for the flagship pipeline.

Deliberately written with pandas / per-row Python — an independent
implementation of the same semantics (the functional-test "expected
output" role, reference functional_test.rs:114-197). Tests compare the
Ray pipeline's routed-row sets (keyed by doc_id, byte-exact tokens) and
per-sink aggregate counts against this.
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa

KV_RE = {
    "level": re.compile(r"(?:^|[ ,])level=([^\s,]+)"),
    "status": re.compile(r"(?:^|[ ,])status=([^\s,]+)"),
    "latency_ms": re.compile(r"(?:^|[ ,])latency_ms=([^\s,]+)"),
}


def parse_df(df: pd.DataFrame, field: str = "message") -> pd.DataFrame:
    df = df.copy()
    for key, rx in KV_RE.items():
        vals = []
        for msg in df[field]:
            m = rx.search(msg) if isinstance(msg, str) else None
            vals.append(m.group(1) if m else None)
        if key in ("status", "latency_ms"):
            df[key] = pd.array(
                [int(v) if v is not None else None for v in vals], dtype="Int64"
            )
        else:
            df[key] = vals
    return df


def enrich_df(df: pd.DataFrame, enrichment: pd.DataFrame, key: str = "source") -> pd.DataFrame:
    return df.merge(enrichment, on=key, how="left")


def route_df(df: pd.DataFrame, routes: dict[str, str] | None = None) -> pd.DataFrame:
    """First-match-wins routing with per-row Python evaluation of the
    default flagship conditions."""
    df = df.copy()

    def label(row) -> str:
        if row.get("level") == "error" or (
            pd.notna(row.get("status")) and row["status"] >= 500
        ):
            return "errors"
        if pd.notna(row.get("quality_weight")) and row["quality_weight"] < 0.6:
            return "lowq"
        if row["n_tok"] >= 512:
            return "bulk"
        return "_unmatched"

    df["__route"] = [label(r) for r in df.to_dict("records")]
    return df


def aggregate_df(df: pd.DataFrame) -> pd.DataFrame:
    out = (
        df.groupby(["__route", "source"], as_index=False)
        .agg(n_rows=("doc_id", "size"), n_tokens=("n_tok", "sum"))
        .rename(columns={"__route": "sink"})
        .sort_values(["sink", "source"])
        .reset_index(drop=True)
    )
    out["n_rows"] = out["n_rows"].astype("int64")
    out["n_tokens"] = out["n_tokens"].astype("int64")
    return out


def flagship_oracle(
    table: pa.Table, enrichment: pa.Table
) -> tuple[dict[str, dict[str, tuple]], pd.DataFrame]:
    """Returns (routed, aggregates):
    routed[sink] = {doc_id: (source, tokens_tuple)} — the set-equality
    oracle with byte-exact tokens; aggregates = per-(sink, source) counts.
    """
    df = table.to_pandas()
    df = parse_df(df)
    df = enrich_df(df, enrichment.to_pandas())
    df = route_df(df)
    routed: dict[str, dict[str, tuple]] = {}
    for sink, sub in df.groupby("__route"):
        routed[sink] = {
            r["doc_id"]: (r["source"], tuple(int(x) for x in r["tokens"]))
            for r in sub.to_dict("records")
        }
    return routed, aggregate_df(df)
