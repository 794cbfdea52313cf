"""Driver-contract query registry.

One entry per implemented operator/pipeline (SURVEY.md §2 + the
training-data extensions). Each query is ``fn(sf_dir) -> Dataset |
pa.Table``; most have a DuckDB oracle in ``ORACLE_SQL`` that computes
the identical result on the same inputs (matching column names AND
rounding semantics — see ``vector_ray.schema.round_sql``). Queries over
the synthetic tokenized-sequence corpus generate it deterministically
under /tmp (``vector_ray.datagen``) and their oracles read the same
parquet via ``read_parquet``.

Ray is initialised by the caller — nothing here calls ray.init().
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd

from vector_ray import datagen
from vector_ray.schema import round_sql
from vector_ray.stages import core, grouped, metricops
from vector_ray.stages.enrich import enrich as enrich_stage
from vector_ray.stages.tokenize import tokenize_table

# The driver compares at sf0.01; oracle SQL for synthetic-corpus queries
# hardcodes that corpus path (generated on demand by oracle_sql()/queries()).
ORACLE_TAG = "sf0.01"


def _seq_glob(tag: str) -> str:
    return f"{datagen.sequences_dir(tag)}/*.parquet"


def _collect(ds) -> pa.Table:
    tables = ray.get(ds.materialize().to_arrow_refs())
    nonempty = [t for t in tables if t.num_rows > 0] or tables[:1]
    return pa.concat_tables(nonempty, promote_options="default") if nonempty else pa.table({})


def _tag(sf_dir: str) -> str:
    tag = datagen.tag_for_sf_dir(sf_dir)
    datagen.ensure_corpus(tag)
    return tag


# ---------------------------------------------------------------------------
# flagship family — over the deterministic tokenized-sequence corpus
# ---------------------------------------------------------------------------

_PARSE_SQL = """
SELECT s.*,
       regexp_extract(message, 'level=([^ ]+)', 1) AS level,
       CAST(regexp_extract(message, 'status=([^ ]+)', 1) AS BIGINT) AS status,
       CAST(regexp_extract(message, 'latency_ms=([^ ]+)', 1) AS BIGINT) AS latency_ms
FROM read_parquet('{seq}') s
"""

_ROUTED_SQL = """
WITH parsed AS ({parse}),
enr AS (
  SELECT p.*, e.quality_weight
  FROM parsed p LEFT JOIN read_parquet('{enrich}') e USING (source)
)
SELECT doc_id, source, n_tok,
       CASE WHEN level = 'error' OR status >= 500 THEN 'errors'
            WHEN quality_weight < 0.6 THEN 'lowq'
            WHEN n_tok >= 512 THEN 'bulk'
            ELSE '_unmatched' END AS sink
FROM enr
"""


def _flagship_labeled_ds(sf_dir: str):
    from vector_ray.pipelines import flagship

    flagship.tune_read_blocks()
    tag = _tag(sf_dir)
    files = flagship.list_input_files(datagen.sequences_dir(tag))
    enrich_ref = ray.put(pq.read_table(datagen.enrichment_path(tag)))
    return flagship.build_dataset(files, enrich_ref, flagship.FlagshipConfig())


def q_flagship_agg(sf_dir: str):
    ds = _flagship_labeled_ds(sf_dir)
    agg = grouped.aggregate(
        ds,
        {
            "group_by": ["route", "source"],
            "aggregates": {
                "n_rows": {"fn": "count"},
                "n_tokens": {"fn": "sum", "field": "n_tok", "int": True},
            },
        },
    )
    tbl = _collect(agg)
    return tbl.rename_columns(
        ["sink" if c == "route" else c for c in tbl.column_names]
    )


def q_flagship_routed(sf_dir: str):
    ds = _flagship_labeled_ds(sf_dir)
    return ds.map_batches(
        lambda t: t.select(["doc_id", "source", "n_tok", "route"]).rename_columns(
            ["doc_id", "source", "n_tok", "sink"]
        ),
        batch_format="pyarrow",
    )


def q_flagship_parse(sf_dir: str):
    from vector_ray.pipelines import flagship

    tag = _tag(sf_dir)
    ds = rd.read_parquet(datagen.sequences_dir(tag), columns=["doc_id", "message"])
    return ds.map_batches(
        lambda t: flagship._parse_batch(t, "message").drop_columns(["message"]),
        batch_format="pyarrow",
    )


def q_flagship_enrich(sf_dir: str):
    tag = _tag(sf_dir)
    ds = rd.read_parquet(datagen.sequences_dir(tag), columns=["doc_id", "source"])
    out = enrich_stage(
        ds, {"table": datagen.enrichment_path(tag), "key": "source"}
    )
    return out


def _flagship_oracles() -> dict[str, str]:
    seq = _seq_glob(ORACLE_TAG)
    enrich = datagen.enrichment_path(ORACLE_TAG)
    parse = _PARSE_SQL.format(seq=seq)
    routed = _ROUTED_SQL.format(parse=parse, enrich=enrich)
    return {
        "flagship_parse": f"SELECT doc_id, level, status, latency_ms FROM ({parse})",
        "flagship_enrich": (
            f"SELECT s.doc_id, s.source, e.source_group, e.quality_weight, e.license "
            f"FROM read_parquet('{seq}') s "
            f"LEFT JOIN read_parquet('{enrich}') e USING (source)"
        ),
        "flagship_routed": routed,
        "flagship_agg": (
            f"SELECT sink, source, COUNT(*) AS n_rows, "
            f"CAST(SUM(n_tok) AS BIGINT) AS n_tokens "
            f"FROM ({routed}) GROUP BY sink, source"
        ),
    }


# ---------------------------------------------------------------------------
# operator family — over the driver's TPC-H-ish tables (views registered)
# ---------------------------------------------------------------------------


def q_filter_events(sf_dir: str):
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type", "value"],
    )
    return core.filter_(
        ds, {"condition": '.event_type == "click" && .value >= 10'}
    )


def q_parse_json_events(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "props"])
    remapped = core.remap(
        ds, {"ops": [{"op": "parse_json", "field": "props", "keys": ["k"]}]}
    )
    return remapped.map_batches(
        lambda t: t.select(["event_id", "k"]), batch_format="pyarrow"
    )


def q_route_events(sf_dir: str):
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    )
    labeled = core.route(
        ds,
        {"route": {"purchases": '.event_type == "purchase"', "big": ".value >= 50"}},
    )
    agg = grouped.aggregate(
        labeled,
        {"group_by": [core.ROUTE_COLUMN], "aggregates": {"n": {"fn": "count"}}},
    )
    tbl = _collect(agg)
    return tbl.rename_columns(["route", "n"])


def q_sample_events(sf_dir: str):
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    )
    return core.sample(ds, {"rate": 10, "key_field": "event_id"})


def q_throttle_events(sf_dir: str):
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    out = grouped.throttle(
        ds,
        {
            "threshold": 2,
            "window_secs": 3600,
            "key_field": "user_id",
            "ts_field": "ts",
            "order_by": ["ts", "event_id"],
        },
    )
    return out.map_batches(
        lambda t: t.select(["event_id", "user_id"]), batch_format="pyarrow"
    )


def q_reduce_events(sf_dir: str):
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    )
    out = grouped.reduce_(
        ds,
        {
            "group_by": ["user_id"],
            "merge_strategies": {
                "ts": "min",
                "event_type": "first",
                "event_id": "drop",
            },
            "order_by": ["ts", "event_id"],
            "count_field": "n",
        },
    )
    return out.map_batches(
        lambda t: t.rename_columns(
            ["user_id", "first_ts", "first_type", "n"]
        ),
        batch_format="pyarrow",
    )


def q_agg_events(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    agg = grouped.aggregate(
        ds,
        {
            "group_by": ["event_type"],
            "aggregates": {
                "n": {"fn": "count"},
                "total": {"fn": "sum", "field": "value"},
                "avg": {"fn": "mean", "field": "value"},
                "vmin": {"fn": "min", "field": "value"},
                "vmax": {"fn": "max", "field": "value"},
            },
            "round": 4,
        },
    )
    return _collect(agg)


def q_agg_lineitem(sf_dir: str):
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )

    # price summed as integer cents: float sums of ~1e8 magnitude carry
    # order-dependent FP error larger than cent rounding — integer math
    # is exact and matches the SQL oracle bit-for-bit
    def to_cents(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            round_sql(pc.multiply(t["l_extendedprice"], 100.0), 0), pa.int64()
        )
        if isinstance(cents, pa.ChunkedArray):
            cents = cents.combine_chunks()
        return t.append_column("price_cents", cents)

    agg = grouped.aggregate(
        ds.map_batches(to_cents, batch_format="pyarrow"),
        {
            "group_by": ["l_returnflag", "l_linestatus"],
            "aggregates": {
                "sum_qty": {"fn": "sum", "field": "l_quantity"},
                "sum_price_cents": {"fn": "sum", "field": "price_cents", "int": True},
                "n": {"fn": "count"},
            },
            "round": 2,
        },
    )
    return _collect(agg)


def q_log_to_metric_events(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    metrics = metricops.log_to_metric(
        ds,
        {
            "metrics": [
                {
                    "type": "counter",
                    "name": "events_total",
                    "namespace": "app",
                    "tags": {"event_type": ".event_type"},
                },
                {
                    "type": "counter",
                    "name": "value_total",
                    "namespace": "app",
                    "field": "value",
                    "increment_by_value": True,
                    "tags": {"event_type": ".event_type"},
                },
            ]
        },
    )
    agg = grouped.aggregate(
        metrics,
        {
            "group_by": ["name", "namespace", "kind", "event_type"],
            "aggregates": {"value": {"fn": "sum", "field": "value"}},
            "round": 2,
        },
    )
    return _collect(agg)


def q_tag_limit_events(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "event_type"])
    out = metricops.tag_cardinality_limit(
        ds,
        {"fields": ["event_type"], "value_limit": 2, "limit_exceeded_action": "drop_event"},
    )
    return out


def q_enrich_customer(sf_dir: str):
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).rename_columns(["c_nationkey", "n_name"])
    ds = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_nationkey"]
    )
    out = enrich_stage(ds, {"table": nation, "key": "c_nationkey"})
    return out.map_batches(
        lambda t: t.select(["c_custkey", "c_name", "n_name"]),
        batch_format="pyarrow",
    )


def q_dedupe_documents(sf_dir: str):
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source", "n_chars"]
    )
    out = grouped.dedupe(ds, {"match": ["text"], "order_by": ["doc_id"]})
    return out.map_batches(
        lambda t: t.select(["doc_id", "source", "n_chars"]), batch_format="pyarrow"
    )


def q_tokenize_documents(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def tok(t: pa.Table) -> pa.Table:
        out = tokenize_table(t).select(["doc_id", "n_tok"])
        return out.set_column(1, "n_tok", pc.cast(out["n_tok"], pa.int64()))

    return ds.map_batches(tok, batch_format="pyarrow")


def q_token_stats_documents(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    with_tok = ds.map_batches(
        lambda t: tokenize_table(t).select(["lang", "n_tok"]),
        batch_format="pyarrow",
    )
    agg = grouped.aggregate(
        with_tok,
        {
            "group_by": ["lang"],
            "aggregates": {
                "n_docs": {"fn": "count"},
                "total_tokens": {"fn": "sum", "field": "n_tok", "int": True},
            },
        },
    )
    return _collect(agg)


def q_quality_documents(sf_dir: str):
    from vector_ray.functions.text import quality_features

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def feats(t: pa.Table) -> pa.Table:
        out = quality_features(t)
        return out.select(
            ["doc_id", "n_words", "uniq_ratio", "stop_ratio", "quality_score"]
        )

    return ds.map_batches(feats, batch_format="pyarrow")


def q_fingerprint_documents(sf_dir: str):
    from vector_ray.functions.text import fingerprint

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = fingerprint(ds)
    return out.map_batches(
        lambda t: t.select(["doc_id", "fingerprint"]), batch_format="pyarrow"
    )


def q_ann_topk(sf_dir: str):
    from vector_ray.functions.similarity import brute_force_topk

    query = (
        pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        .filter(pc.equal(pc.field("vec_id"), 0))["embedding"][0]
        .as_py()
    )
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return brute_force_topk(ds, np.asarray(query), k=10)


def q_window_tumbling_events(sf_dir: str):
    from vector_ray.stages.window import window

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"])

    # sum integer micro-units: float sums are order-dependent and at
    # scale the error can cross the rounding boundary (oracle parity)
    def micros(t: pa.Table) -> pa.Table:
        m = pc.cast(round_sql(pc.multiply(t["value"], 1e6), 0), pa.int64())
        if isinstance(m, pa.ChunkedArray):
            m = m.combine_chunks()
        return t.append_column("value_micros", m)

    out = window(
        ds.map_batches(micros, batch_format="pyarrow"),
        {
            "type": "tumbling",
            "size_secs": 3600,
            "ts_field": "ts",
            "key_field": "event_type",
            "aggregates": {
                "n": {"fn": "count"},
                "total_micros": {"fn": "sum", "field": "value_micros", "int": True},
            },
        },
    )
    return _collect(out)


def q_window_sliding_events(sf_dir: str):
    from vector_ray.stages.window import window

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "value"])
    out = window(
        ds,
        {
            "type": "sliding",
            "size_secs": 7200,
            "slide_secs": 3600,
            "ts_field": "ts",
            "aggregates": {"n": {"fn": "count"}},
        },
    )
    return _collect(out)


def q_window_session_events(sf_dir: str):
    from vector_ray.stages.window import window

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    out = window(
        ds,
        {
            "type": "session",
            "gap_secs": 3600,
            "ts_field": "ts",
            "key_field": "user_id",
            "aggregates": {"n": {"fn": "count"}},
        },
    )
    return out


def q_topk_per_source(sf_dir: str):
    """Skew-safe per-key top-k via salted sub-groups (the explicit
    skew-handling path for per-group logic on hot keys)."""
    from vector_ray.stages.shuffle import topk_per_key

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    )
    out = topk_per_key(
        ds, "source", "n_chars", k=3, tiebreak="doc_id", salt_buckets=8
    )
    return out.map_batches(
        lambda t: t.select(["doc_id", "source", "n_chars"]),
        batch_format="pyarrow",
    )


def q_join_orders_customer(sf_dir: str):
    """Explicit bucketed large×large hash join (one shuffle, per-bucket
    pandas merge)."""
    from vector_ray.stages.shuffle import bucketed_join

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )
    customer = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    ).map_batches(
        lambda t: t.rename_columns(["o_custkey", "c_name"]),
        batch_format="pyarrow",
    )
    out = bucketed_join(orders, customer, "o_custkey", num_buckets=16)
    return out.map_batches(
        lambda t: t.select(["o_orderkey", "o_custkey", "o_totalprice", "c_name"]),
        batch_format="pyarrow",
    )


def q_topk_orders(sf_dir: str):
    """Global sort + limit (the tap/test top-k pattern,
    functional_test.rs:206-212): 10 most expensive orders."""
    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)


def q_distinct_sources(sf_dir: str):
    """Set op: distinct values of one column (ds.unique ~ SELECT DISTINCT)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source"])
    vals = sorted(ds.unique("source"))
    return pa.table({"source": pa.array(vals, pa.string())})


def q_union_names(sf_dir: str):
    """Multi-input stream union (validation/mod.rs:475-490 semantics)."""
    region = rd.read_parquet(f"{sf_dir}/region.parquet", columns=["r_name"]).map_batches(
        lambda t: t.rename_columns(["name"]), batch_format="pyarrow"
    )
    nation = rd.read_parquet(f"{sf_dir}/nation.parquet", columns=["n_name"]).map_batches(
        lambda t: t.rename_columns(["name"]), batch_format="pyarrow"
    )
    return region.union(nation)


def q_dedupe_events(sf_dir: str):
    """Exact dedupe on a composite key, first-by-timestamp representative."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type", "ts"],
    )
    out = grouped.dedupe(
        ds,
        {"match": ["user_id", "event_type"], "order_by": ["ts", "event_id"]},
    )
    return out.map_batches(
        lambda t: t.select(["event_id", "user_id", "event_type"]),
        batch_format="pyarrow",
    )


def q_filter_datadog_events(sf_dir: str):
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    )
    return core.filter_(
        ds,
        {
            "condition": "event_type:(click OR view) AND value:>=50",
            "condition_type": "datadog_search",
        },
    )


# --- rows-only queries (no SQL-expressible oracle) -------------------------


def q_langid_documents(sf_dir: str):
    from vector_ray.functions.text import langid

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = langid(ds)
    return out.map_batches(
        lambda t: t.select(["doc_id", "lang_pred"]), batch_format="pyarrow"
    )


def q_simhash_documents(sf_dir: str):
    from vector_ray.functions.dedup import simhash

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = simhash(ds)
    return out.map_batches(
        lambda t: t.select(["doc_id", "simhash"]), batch_format="pyarrow"
    )


def q_minhash_pairs_documents(sf_dir: str):
    from vector_ray.functions.dedup import minhash_lsh_candidates

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return minhash_lsh_candidates(ds, threshold=0.4)


def q_ngram_pairs_documents(sf_dir: str):
    from vector_ray.functions.dedup import ngram_jaccard_pairs

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    return ngram_jaccard_pairs(ds, bucket_by=["lang"], threshold=0.3)


def q_embedding_dups(sf_dir: str):
    from vector_ray.functions.dedup import embedding_dup_pairs

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return embedding_dup_pairs(ds, threshold=0.9)


def q_ann_lsh_topk(sf_dir: str):
    from vector_ray.functions.similarity import lsh_topk

    query = (
        pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        .filter(pc.equal(pc.field("vec_id"), 0))["embedding"][0]
        .as_py()
    )
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return lsh_topk(ds, np.asarray(query), k=10)


def q_multimodal_features(sf_dir: str):
    from vector_ray.functions.multimodal import extract_features, fake_media_table

    ds = rd.from_arrow(fake_media_table(200, seed=3))
    return extract_features(ds, mode="fake", concurrency=2)


QUERIES = {
    "flagship_agg": q_flagship_agg,
    "flagship_routed": q_flagship_routed,
    "flagship_parse": q_flagship_parse,
    "flagship_enrich": q_flagship_enrich,
    "filter_events": q_filter_events,
    "parse_json_events": q_parse_json_events,
    "route_events": q_route_events,
    "sample_events": q_sample_events,
    "throttle_events": q_throttle_events,
    "reduce_events": q_reduce_events,
    "agg_events": q_agg_events,
    "agg_lineitem": q_agg_lineitem,
    "log_to_metric_events": q_log_to_metric_events,
    "tag_limit_events": q_tag_limit_events,
    "enrich_customer": q_enrich_customer,
    "dedupe_documents": q_dedupe_documents,
    "tokenize_documents": q_tokenize_documents,
    "token_stats_documents": q_token_stats_documents,
    "quality_documents": q_quality_documents,
    "fingerprint_documents": q_fingerprint_documents,
    "ann_topk": q_ann_topk,
    "window_tumbling_events": q_window_tumbling_events,
    "window_sliding_events": q_window_sliding_events,
    "window_session_events": q_window_session_events,
    "filter_datadog_events": q_filter_datadog_events,
    "topk_per_source": q_topk_per_source,
    "join_orders_customer": q_join_orders_customer,
    "topk_orders": q_topk_orders,
    "distinct_sources": q_distinct_sources,
    "union_names": q_union_names,
    "dedupe_events": q_dedupe_events,
    "langid_documents": q_langid_documents,
    "simhash_documents": q_simhash_documents,
    "minhash_pairs_documents": q_minhash_pairs_documents,
    "ngram_pairs_documents": q_ngram_pairs_documents,
    "embedding_dups": q_embedding_dups,
    "ann_lsh_topk": q_ann_lsh_topk,
    "multimodal_features": q_multimodal_features,
}

_STOPLIST_SQL = "['a','and','for','in','is','it','of','that','the','to']"


def oracle_sql() -> dict[str, str]:
    datagen.ensure_corpus(ORACLE_TAG)  # oracle reads the same corpus files
    sql = dict(_flagship_oracles())
    sql.update(
        {
            "filter_events": (
                "SELECT event_id, user_id, event_type, value FROM events "
                "WHERE event_type = 'click' AND value >= 10"
            ),
            "parse_json_events": (
                "SELECT event_id, CAST(props::JSON->>'k' AS BIGINT) AS k FROM events"
            ),
            "route_events": (
                "SELECT CASE WHEN event_type = 'purchase' THEN 'purchases' "
                "WHEN value >= 50 THEN 'big' ELSE '_unmatched' END AS route, "
                "COUNT(*) AS n FROM events GROUP BY 1"
            ),
            "sample_events": (
                "SELECT event_id, event_type, value FROM events WHERE event_id % 10 = 0"
            ),
            "throttle_events": (
                "SELECT event_id, user_id FROM ("
                "  SELECT event_id, user_id, row_number() OVER ("
                "    PARTITION BY user_id, CAST(floor(epoch(ts)/3600) AS BIGINT) "
                "    ORDER BY ts, event_id) AS rn FROM events) WHERE rn <= 2"
            ),
            "reduce_events": (
                "SELECT user_id, MIN(ts) AS first_ts, "
                "(list(event_type ORDER BY ts, event_id))[1] AS first_type, "
                "COUNT(*) AS n FROM events GROUP BY user_id"
            ),
            "agg_events": (
                "SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 4) AS total, "
                "ROUND(SUM(value)/COUNT(*), 4) AS avg, "
                "ROUND(MIN(value), 4) AS vmin, ROUND(MAX(value), 4) AS vmax "
                "FROM events GROUP BY event_type"
            ),
            "agg_lineitem": (
                "SELECT l_returnflag, l_linestatus, ROUND(SUM(l_quantity), 2) AS sum_qty, "
                "CAST(SUM(CAST(ROUND(l_extendedprice * 100.0, 0) AS BIGINT)) AS BIGINT) "
                "AS sum_price_cents, COUNT(*) AS n "
                "FROM lineitem GROUP BY l_returnflag, l_linestatus"
            ),
            "log_to_metric_events": (
                "SELECT 'events_total' AS name, 'app' AS namespace, "
                "'incremental' AS kind, event_type, "
                "ROUND(CAST(COUNT(*) AS DOUBLE), 2) AS value FROM events GROUP BY event_type "
                "UNION ALL "
                "SELECT 'value_total', 'app', 'incremental', event_type, "
                "ROUND(SUM(value), 2) FROM events GROUP BY event_type"
            ),
            "tag_limit_events": (
                "SELECT event_id, event_type FROM events WHERE event_type IN ("
                "  SELECT event_type FROM events GROUP BY event_type "
                "  ORDER BY COUNT(*) DESC, event_type LIMIT 2)"
            ),
            "enrich_customer": (
                "SELECT c_custkey, c_name, n_name FROM customer "
                "LEFT JOIN nation ON c_nationkey = n_nationkey"
            ),
            "dedupe_documents": (
                "SELECT doc_id, source, n_chars FROM ("
                "  SELECT doc_id, source, n_chars, "
                "  row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn "
                "  FROM documents) WHERE rn = 1"
            ),
            "tokenize_documents": (
                "SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok "
                "FROM documents"
            ),
            "token_stats_documents": (
                "SELECT lang, COUNT(*) AS n_docs, "
                "CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens "
                "FROM documents GROUP BY lang"
            ),
            "quality_documents": (
                "WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), "
                "f AS (SELECT doc_id, len(ws) AS n_words, "
                "  CAST(len(list_distinct(ws)) AS DOUBLE)/len(ws) AS uniq_ratio, "
                f"  CAST(len(list_filter(ws, x -> list_contains({_STOPLIST_SQL}, x))) AS DOUBLE)/len(ws) AS stop_ratio "
                "  FROM w) "
                "SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, "
                "ROUND(uniq_ratio, 4) AS uniq_ratio, ROUND(stop_ratio, 4) AS stop_ratio, "
                "ROUND(ROUND(0.4*uniq_ratio + 0.3*(1-stop_ratio) + 0.3*LEAST(n_words, 100)/100.0, 9), 4) "
                "AS quality_score FROM f"
            ),
            "fingerprint_documents": (
                "SELECT doc_id, md5(text) AS fingerprint FROM documents"
            ),
            "window_tumbling_events": (
                "SELECT event_type, floor(epoch(ts)/3600)*3600 AS window_start, "
                "COUNT(*) AS n, "
                "CAST(SUM(CAST(ROUND(value * 1000000.0, 0) AS BIGINT)) AS BIGINT) "
                "AS total_micros FROM events GROUP BY event_type, window_start"
            ),
            "window_sliding_events": (
                # size 7200 slide 3600 → each event lands in exactly 2 windows
                "SELECT window_start, COUNT(*) AS n FROM ("
                "  SELECT floor(epoch(ts)/3600)*3600 AS window_start FROM events"
                "  UNION ALL"
                "  SELECT (floor(epoch(ts)/3600)-1)*3600 AS window_start FROM events"
                ") GROUP BY window_start"
            ),
            "window_session_events": (
                "SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end, "
                "COUNT(*) AS n FROM ("
                "  SELECT user_id, ts, SUM(new_session) OVER ("
                "    PARTITION BY user_id ORDER BY ts) AS sid FROM ("
                "    SELECT user_id, ts, CASE WHEN epoch(ts) - epoch(lag(ts) OVER ("
                "      PARTITION BY user_id ORDER BY ts)) > 3600 OR lag(ts) OVER ("
                "      PARTITION BY user_id ORDER BY ts) IS NULL THEN 1 ELSE 0 END "
                "    AS new_session FROM events)"
                ") GROUP BY user_id, sid"
            ),
            "filter_datadog_events": (
                "SELECT event_id, event_type, value FROM events "
                "WHERE event_type IN ('click', 'view') AND value >= 50"
            ),
            "topk_orders": (
                "SELECT o_orderkey, o_totalprice FROM orders "
                "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"
            ),
            "distinct_sources": ("SELECT DISTINCT source FROM documents"),
            "union_names": (
                "SELECT r_name AS name FROM region "
                "UNION ALL SELECT n_name FROM nation"
            ),
            "dedupe_events": (
                "SELECT event_id, user_id, event_type FROM ("
                "  SELECT event_id, user_id, event_type, row_number() OVER ("
                "    PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn "
                "  FROM events) WHERE rn = 1"
            ),
            "topk_per_source": (
                "SELECT doc_id, source, n_chars FROM ("
                "  SELECT doc_id, source, n_chars, row_number() OVER ("
                "    PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rn "
                "  FROM documents) WHERE rn <= 3"
            ),
            "join_orders_customer": (
                "SELECT o_orderkey, o_custkey, o_totalprice, c_name "
                "FROM orders JOIN customer ON o_custkey = c_custkey"
            ),
            "ann_topk": (
                "SELECT e.vec_id, "
                "ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), "
                "  (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 6) AS score "
                "FROM embeddings e ORDER BY score DESC, e.vec_id LIMIT 10"
            ),
        }
    )
    return sql
