"""Zero-row inputs through every round-2 transform: each must produce an
empty result with a STABLE schema (no null-typed columns) — the block-
schema-unification failure class from the round-1 review (ADVICE:
null-typed pa.array([]) in empty LSH buckets)."""

import pyarrow as pa
import ray.data as rd


def _empty(schema: pa.Schema):
    return rd.from_arrow(schema.empty_table())


EVENTS = pa.schema(
    [
        ("event_id", pa.int64()),
        ("user_id", pa.int64()),
        ("event_type", pa.string()),
        ("ts", pa.timestamp("us")),
        ("value", pa.float64()),
    ]
)


def test_empty_grouped_window_ops(ray_session):
    from vector_ray.stages.grouped import (
        cumulative,
        funnel,
        interarrival,
        pivot,
        sessionize,
    )

    ds = _empty(EVENTS)
    assert interarrival(ds, {"group_by": "user_id"}).count() == 0
    assert sessionize(ds, {"group_by": "user_id", "gap_s": 10}).count() == 0
    assert (
        cumulative(
            ds,
            {"group_by": "user_id", "order_by": ["ts", "event_id"],
             "field": "value"},
        ).count()
        == 0
    )
    assert (
        funnel(ds, {"group_by": "user_id", "steps": ["view"]}).count() == 0
    )
    out = pivot(
        ds,
        {"group_by": "user_id", "pivot": "event_type", "values": ["view"]},
    )
    t = out.take_all()
    assert t == []


def test_empty_reshape_ops(ray_session):
    from vector_ray.stages.reshape import explode, lag_delta, rank, unpivot

    ds = _empty(EVENTS)
    assert (
        rank(ds, {"group_by": "event_type", "order_by": "value"}).count() == 0
    )
    assert (
        lag_delta(
            ds, {"group_by": "user_id", "order_by": ["ts"], "field": "value"}
        ).count()
        == 0
    )
    assert (
        unpivot(
            ds,
            {"id_fields": ["event_id"], "fields": ["value"], "key_field": "m",
             "value_field": "v"},
        ).count()
        == 0
    )

    # the block-unification property (round-1 ADVICE failure class:
    # null-typed columns from empty groups): every NON-EMPTY output
    # block of a mixed empty+full stream must share one schema, and the
    # explode batch fn itself must emit typed columns on a 0-row batch
    # (Ray itself represents skipped empty input blocks as zero-column
    # tables — that is Ray's contract, not ours to change)
    lists = pa.schema([("id", pa.int64()), ("xs", pa.list_(pa.int32()))])
    full = pa.table(
        {"id": pa.array([7], pa.int64()),
         "xs": pa.array([[1, 2]], pa.list_(pa.int32()))}
    )
    mixed = _empty(lists).union(rd.from_arrow(full))
    ex = explode(mixed, {"field": "xs", "keep": ["id"], "target": "x"})
    import ray

    tabs = [t for t in ray.get(ex.to_arrow_refs()) if t.num_rows]
    t = pa.concat_tables(tabs)
    assert t.schema.field("x").type == pa.int32()
    assert t.num_rows == 2 and t.column("x").to_pylist() == [1, 2]

    # the UDF contract on a genuinely empty batch: typed, not null-typed
    probe = explode(_empty(lists), {"field": "xs", "keep": ["id"],
                                    "target": "x"})
    assert probe.count() == 0


def test_empty_rollup_and_profile(ray_session):
    from vector_ray.functions.dataops import profile_columns
    from vector_ray.stages.grouped import rollup

    ds = _empty(EVENTS)
    # rollup on empty input: every keyed level is empty; the grand-total
    # level must not emit a bogus row
    out = rollup(
        ds,
        {"group_by": ["event_type"],
         "aggregates": {"n": {"fn": "count"}}},
    )
    assert out.count() == 0
    prof = profile_columns(ds, ["user_id", "value"]).take_all()
    assert prof == []


def test_parquet_pushdown_filter(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from vector_ray.sources import parquet_source

    t = pa.table(
        {
            "k": pa.array(list(range(100)), pa.int64()),
            "s": pa.array(["a" if i % 2 else "b" for i in range(100)]),
        }
    )
    path = str(tmp_path / "t.parquet")
    pq.write_table(t, path, row_group_size=10)
    out = parquet_source(
        {"path": path, "where": [["k", ">=", 90], ["s", "==", "a"]]}
    ).to_pandas()
    assert sorted(out.k.tolist()) == [91, 93, 95, 97, 99]
    # in-list + null ops compile
    out2 = parquet_source(
        {"path": path, "where": [["k", "in", [3, 4]], ["s", "is_not_null"]]}
    ).to_pandas()
    assert sorted(out2.k.tolist()) == [3, 4]
    import pytest

    with pytest.raises(ValueError):
        parquet_source({"path": path, "where": [["k", "like", "x"]]})


def test_empty_span_dedupe_all_masks(ray_session):
    """A zero-row corpus through every span-dedup mask mode must produce
    an empty result with the standard (doc_id, tokens, n_tok, n_removed)
    schema — including the exchange path's no-blocks fallback."""
    from vector_ray.functions.tokens import span_dedupe

    schema = pa.schema(
        [("doc_id", pa.string()), ("tokens", pa.list_(pa.int32()))]
    )
    for mask in ("auto", "broadcast", "exchange"):
        out = span_dedupe(_empty(schema), n=8, mask=mask)
        t = out.materialize()
        assert t.count() == 0, mask
        # a fully-empty pipeline may legitimately carry no schema (the
        # map fn never ran); if blocks exist their schema must be sane
        s = t.schema(fetch_if_missing=False)
        if s is not None and s.names:
            assert {"doc_id", "tokens"} <= set(s.names), (mask, s.names)


def test_empty_session_ops(ray_session):
    from vector_ray.stages.grouped import (
        coalesce_intervals,
        cusum,
        decay,
        ewma,
        retention,
        robust_z,
    )

    ds = _empty(EVENTS)
    common = {"group_by": "user_id", "order_by": ["ts", "event_id"],
              "field": "value"}
    assert ewma(ds, {**common, "alpha": 0.3}).count() == 0
    assert cusum(
        ds, {**common, "target": 1.0, "slack": 0.0, "threshold": 1.0}
    ).count() == 0
    assert retention(ds, {"group_by": "user_id"}).count() == 0
    assert decay(
        ds,
        {"group_by": "event_type", "field": "value",
         "ref_ts": "2024-02-01 00:00:00", "halflife_s": 60},
    ).count() == 0
    assert robust_z(ds, {"group_by": "event_type", "field": "value"}).count() == 0
    iv = pa.schema([("user_id", pa.int64()), ("s", pa.float64()),
                    ("e", pa.float64())])
    assert coalesce_intervals(
        _empty(iv), {"group_by": "user_id", "start_field": "s",
                     "end_field": "e"}
    ).count() == 0


def test_empty_retrieval_and_graph_ops(ray_session):
    from vector_ray.functions.graph import label_propagation
    from vector_ray.functions.text import inverted_index

    docs = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    assert inverted_index(_empty(docs)).count() == 0
    edges = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
    assert label_propagation(_empty(edges), rounds=2).count() == 0
