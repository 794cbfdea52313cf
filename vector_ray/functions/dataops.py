"""Corpus-operations utilities: column profiling and snapshot diffing.

The data-quality / data-versioning ops a 100 TB pipeline runs before and
after every transformation batch:

- ``profile_columns``: per-column row / null / exact-distinct counts in
  ONE pass — each batch is unpivoted to (column, value-as-string) rows
  and fed to the two-phase grouped aggregate, so the shuffle carries one
  compact partial per (column, batch), never raw rows.
- ``corpus_diff``: compare two corpus snapshots by key: added / removed /
  changed(fingerprint) rows via one bucketed full-outer join (reuses
  stages/shuffle.bucketed_join — no driver materialization).

Reference mapping: the reference's data-quality surface is per-component
NodeMetrics counts (shared/src/messages.rs:103-122) and the functional
test's output-count compare (validation/functional_test.rs:206-212);
these extend that contract to column- and row-level.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def profile_columns(ds, columns: list[str], approx: bool = False):
    """One-pass per-column profile: (column, n, n_null, n_distinct).

    Exact distinct via the two-phase list-merging aggregate (the per-key
    distinct set lives on one worker at the final merge — same
    requirement as any exact COUNT(DISTINCT)). ``approx=True`` swaps in
    the mergeable HLL sketch (functions/sketches.py): fixed-size state
    per column regardless of cardinality — the 100 TB default for
    columns like doc_id where the distinct set itself is corpus-sized.
    """
    from vector_ray.stages.grouped import aggregate

    cols = list(columns)

    def to_long(t: pa.Table) -> pa.Table:
        parts = []
        for c in cols:
            col = t[c]
            sval = pc.cast(col, pa.string())
            nul = pc.cast(pc.is_null(col), pa.int64())
            parts.append(
                pa.table(
                    {
                        "column": pa.array([c] * t.num_rows, pa.string()),
                        "val": sval.combine_chunks()
                        if isinstance(sval, pa.ChunkedArray)
                        else sval,
                        "nul": nul.combine_chunks()
                        if isinstance(nul, pa.ChunkedArray)
                        else nul,
                    }
                )
            )
        return pa.concat_tables(parts)

    long = ds.map_batches(to_long, batch_format="pyarrow")
    return aggregate(
        long,
        {
            "group_by": ["column"],
            "aggregates": {
                "n": {"fn": "count"},
                "n_null": {"fn": "sum", "field": "nul", "int": True},
                "n_distinct": {
                    "fn": "approx_count_distinct" if approx else "count_distinct",
                    "field": "val",
                },
            },
        },
    )


def corpus_diff(
    old_ds,
    new_ds,
    key: str = "doc_id",
    fingerprint: str = "fp",
    num_buckets: int = 32,
):
    """Diff two corpus snapshots on a key column: one row per key that
    was added, removed, or changed (fingerprints differ). Unchanged keys
    produce no output.

    Both inputs must carry (key, fingerprint) columns — compute the
    fingerprint upstream (functions/text.fingerprint /
    rolling_hash_fingerprint). One bucketed full-outer join on the key;
    the verdict is a vectorized three-way mask per bucket."""
    from vector_ray.stages.shuffle import bucketed_join

    def tag(name: str):
        def _tag(t: pa.Table) -> pa.Table:
            return pa.table({key: t[key], name: t[fingerprint]})

        return _tag

    old_t = old_ds.map_batches(tag("__fp_old"), batch_format="pyarrow")
    new_t = new_ds.map_batches(tag("__fp_new"), batch_format="pyarrow")
    joined = bucketed_join(
        old_t, new_t, key, num_buckets=num_buckets, how="full"
    )

    def verdict(t: pa.Table) -> pa.Table:
        old_fp = t["__fp_old"]
        new_fp = t["__fp_new"]
        old_null = np.asarray(pc.is_null(old_fp).to_numpy(zero_copy_only=False))
        new_null = np.asarray(pc.is_null(new_fp).to_numpy(zero_copy_only=False))
        eq = np.asarray(
            pc.fill_null(pc.equal(old_fp, new_fp), False).to_numpy(
                zero_copy_only=False
            )
        )
        status = np.where(
            old_null, "added", np.where(new_null, "removed", np.where(eq, "", "changed"))
        )
        keep = status != ""
        out = pa.table(
            {
                key: t[key].combine_chunks().filter(pa.array(keep)),
                "status": pa.array(status[keep], pa.string()),
            }
        )
        return out

    return joined.map_batches(verdict, batch_format="pyarrow")


def compact_parquet_dir(
    root: str,
    target_rows_per_file: int = 1_000_000,
    pattern: str = "*.parquet",
):
    """Compact the small-files output of a partitioned, resumable run:
    rewrite each LEAF directory's many small parquet files into
    ceil(rows / target) files, atomically (write to a sibling tmp dir,
    then one os.replace per leaf — a crashed compaction leaves the
    original files untouched).

    One Ray task per leaf directory (leaves are independent), streaming
    within the task via Parquet row-group iteration — a leaf larger
    than worker memory still compacts. Returns a summary dict."""
    import glob as _glob
    import os
    import shutil

    import ray as _ray

    leaves = sorted(
        {
            os.path.dirname(p)
            for p in _glob.glob(
                os.path.join(root, "**", pattern), recursive=True
            )
        }
    )

    @_ray.remote
    def compact_leaf(leaf: str) -> tuple[str, int, int]:
        import pyarrow.parquet as _pq

        files = sorted(_glob.glob(os.path.join(leaf, pattern)))
        if len(files) <= 1:
            return (leaf, len(files), len(files))
        tmp = leaf + ".compact-tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        writer = None
        out_idx = rows_in_file = 0
        schema = _pq.ParquetFile(files[0]).schema_arrow
        try:
            for f in files:
                pf = _pq.ParquetFile(f)
                for rg in range(pf.num_row_groups):
                    tbl = pf.read_row_group(rg).cast(schema)
                    if writer is None:
                        writer = _pq.ParquetWriter(
                            os.path.join(tmp, f"part-{out_idx:05d}.parquet"),
                            schema,
                        )
                    writer.write_table(tbl)
                    rows_in_file += tbl.num_rows
                    if rows_in_file >= target_rows_per_file:
                        writer.close()
                        writer = None
                        out_idx += 1
                        rows_in_file = 0
            if writer is not None:
                writer.close()
        except BaseException:
            shutil.rmtree(tmp, ignore_errors=True)
            raise
        n_out = len(_glob.glob(os.path.join(tmp, pattern)))
        # atomic swap: move originals out, tmp in, then drop originals
        old = leaf + ".compact-old"
        shutil.rmtree(old, ignore_errors=True)
        os.replace(leaf, old)
        os.replace(tmp, leaf)
        shutil.rmtree(old)
        return (leaf, len(files), n_out)

    results = _ray.get([compact_leaf.remote(l) for l in leaves])
    return {
        "leaves": len(results),
        "files_before": sum(r[1] for r in results),
        "files_after": sum(r[2] for r in results),
        "details": results,
    }


def cdc_merge(
    base_ds,
    updates_ds,
    key: str,
    version_field: str = "version",
    op_field: str = "op",
):
    """Change-data-capture MERGE: apply an upsert/delete log to a base
    snapshot and return the merged snapshot — the Delta/Iceberg MERGE
    INTO shape for an engine whose tables are immutable parquet.

    ``updates_ds`` carries the base's value columns plus
    ``version_field`` (monotone per key; higher wins) and ``op_field``
    ('upsert' | 'delete'). Base rows rank as version 0, and an update
    beats a base row of the same version (source tiebreak), so the
    merge is deterministic even on version collisions.

    Plan: tag both sides (2 narrow column appends), union, ONE hash
    shuffle on the key, then a per-group vectorized argmax by
    (version, source); a winning delete drops the key. Output schema =
    the base schema. Per-key groups are tiny (1 + that key's updates),
    so skew follows the update log, not the base."""
    base_schema = base_ds.schema()
    value_cols = [c for c in base_schema.names]
    if key not in value_cols:
        raise ValueError(f"cdc_merge: key {key!r} not in base columns")

    def tag_base(t: pa.Table) -> pa.Table:
        t = t.select(value_cols)
        return t.append_column(
            "__cdc_v", pa.array(np.zeros(t.num_rows, np.int64))
        ).append_column(
            "__cdc_op", pa.array(["upsert"] * t.num_rows, pa.string())
        ).append_column(
            "__cdc_src", pa.array(np.zeros(t.num_rows, np.int64))
        )

    def tag_upd(t: pa.Table) -> pa.Table:
        v = pc.cast(t[version_field], pa.int64())
        op = pc.cast(t[op_field], pa.string())
        t = t.select(value_cols)
        return t.append_column("__cdc_v", v).append_column(
            "__cdc_op", op
        ).append_column(
            "__cdc_src", pa.array(np.ones(t.num_rows, np.int64))
        )

    tagged = base_ds.map_batches(tag_base, batch_format="pyarrow").union(
        updates_ds.map_batches(tag_upd, batch_format="pyarrow")
    )

    def latest(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g,
            sort_keys=[("__cdc_v", "descending"), ("__cdc_src", "descending")],
        )
        win = g.take(idx.slice(0, 1))
        if win["__cdc_op"][0].as_py() == "delete":
            win = win.slice(0, 0)
        return win.select(value_cols)

    return tagged.groupby(key).map_groups(latest, batch_format="pyarrow")


def flatten_json(ds, field: str = "props", keep: list | None = None):
    """Schema-inferring JSON flatten: discover the union of keys (and
    unified value types) across the corpus, then extract one typed
    column per key — the "turn this props blob into real columns" step
    every log pipeline starts with. Vector's remap requires the keys to
    be declared; this op infers them.

    Two phases, both streaming:
      1. INFER — each batch parses its JSON strings with the vectorized
         pyarrow JSON reader and emits its (key, type) pairs as one
         tiny table (bounded by the schema, not the rows); the driver
         unifies them (int64 stays int64, anything mixed widens to
         string) into a deterministic sorted key list.
      2. EXTRACT — the unified (keys, types) are passed to the existing
         remap parse_json compile path, so extraction runs the same
         vectorized parse + fallible-cast machinery as a declared
         schema would.

    ``keep``: original columns to carry through (default: all)."""
    from vector_ray.stages.core import remap

    def key_types(t: pa.Table) -> pa.Table:
        import io

        from pyarrow import json as pa_json

        col = pc.fill_null(pc.cast(t[field], pa.string()), "{}")
        lines = "\n".join(
            s if s.strip() else "{}" for s in col.to_pylist()
        )
        try:
            parsed = pa_json.read_json(io.BytesIO((lines + "\n").encode()))
            pairs = [(f.name, str(f.type)) for f in parsed.schema]
        except Exception:
            # heterogeneous batch: fall back to per-row key scan
            import json as _json

            seen: dict[str, str] = {}
            for s in col.to_pylist():
                try:
                    obj = _json.loads(s)
                except Exception:
                    continue
                if isinstance(obj, dict):
                    for k, v in obj.items():
                        ty = (
                            "int64"
                            if isinstance(v, bool) is False and isinstance(v, int)
                            else "double"
                            if isinstance(v, float)
                            else "string"
                        )
                        prev = seen.get(k)
                        seen[k] = ty if prev in (None, ty) else "string"
            pairs = sorted(seen.items())
        return pa.table(
            {
                "key": pa.array([p[0] for p in pairs], pa.string()),
                "ty": pa.array([p[1] for p in pairs], pa.string()),
            }
        )

    rows = ds.map_batches(key_types, batch_format="pyarrow").take_all()
    unified: dict[str, str] = {}
    for r in rows:
        k, ty = r["key"], r["ty"]
        if ty in ("int64", "int32", "int16", "int8"):
            want = "int"
        elif ty in ("double", "float"):
            want = "float"
        elif ty == "bool":
            want = "bool"
        else:
            want = "string"
        prev = unified.get(k)
        if prev is None:
            unified[k] = want
        elif prev != want:
            # int + float unify to float; anything else widens to string
            unified[k] = (
                "float" if {prev, want} == {"int", "float"} else "string"
            )
    keys = sorted(unified)
    out = remap(
        ds,
        {
            "ops": [
                {
                    "op": "parse_json",
                    "field": field,
                    "keys": keys,
                    "types": {k: unified[k] for k in keys},
                }
            ]
        },
    )
    if keep is not None:
        out = out.map_batches(
            lambda t: t.select(list(keep) + keys), batch_format="pyarrow"
        )
    return out


def incremental_rollup(
    base,
    deltas,
    key: str,
    sum_field: str = "sum_v",
    count_field: str = "n",
    value_field: str = "v",
    sign_field: str = "sign",
    num_buckets: int = 16,
):
    """Incremental view maintenance for a per-key (SUM, COUNT) rollup:
    apply a change log of signed rows (+1 insert, -1 delete) to a
    materialized aggregate WITHOUT rescanning the base facts — the
    delta log is aggregated to per-key (d_sum, d_n) and merged into the
    base with one full outer join; keys whose count reaches 0 drop out.

    Cost is O(|delta| + |base keys touched|): the classic reason
    incremental refresh beats recompute when the change rate is small.
    ``base``: (key, sum_field, count_field); ``deltas``: (key,
    value_field, sign_field)."""
    from vector_ray.stages.grouped import aggregate as agg_stage
    from vector_ray.stages.shuffle import bucketed_join

    def signed(t: pa.Table) -> pa.Table:
        sign = pc.cast(t[sign_field], pa.int64())
        v = pc.cast(t[value_field], pa.int64())
        return pa.table(
            {
                key: t[key],
                "__dv": pc.multiply(v, sign),
                "__dn": sign,
            }
        )

    dagg = agg_stage(
        deltas.map_batches(signed, batch_format="pyarrow"),
        {
            "group_by": [key],
            "aggregates": {
                "d_sum": {"fn": "sum", "field": "__dv"},
                "d_n": {"fn": "sum", "field": "__dn"},
            },
        },
    )
    merged = bucketed_join(base, dagg, key, num_buckets=num_buckets, how="full")

    def apply(t: pa.Table) -> pa.Table:
        z = pa.scalar(0, pa.int64())
        s = pc.add(
            pc.fill_null(pc.cast(t[sum_field], pa.int64()), z),
            pc.fill_null(pc.cast(t["d_sum"], pa.int64()), z),
        )
        n = pc.add(
            pc.fill_null(pc.cast(t[count_field], pa.int64()), z),
            pc.fill_null(pc.cast(t["d_n"], pa.int64()), z),
        )
        out = pa.table({key: t[key], sum_field: s, count_field: n})
        return out.filter(pc.greater(n, z))

    return merged.map_batches(apply, batch_format="pyarrow")


def kanonymity(
    ds,
    quasi: list[str],
    k: int = 25,
    mode: str = "audit",
    id_field: str = "event_id",
    num_buckets: int = 32,
):
    """k-anonymity over a set of quasi-identifier columns — the privacy
    audit a corpus runs before release (Sweeney 2002, public defn): a
    row is re-identifiable when its quasi-identifier combination is
    shared by fewer than ``k`` rows.

    ``mode="audit"``    → one row per QI combination: quasi columns,
                          its population ``n``, and ``at_risk = n < k``.
                          Plan: the existing two-phase grouped aggregate
                          (per-block partial counts, then a small
                          groupby-sum) — the shuffle moves one partial
                          per (combo, block), never raw rows.
    ``mode="suppress"`` → the row stream with the QI cells of at-risk
                          rows replaced by sentinels ('*' for strings,
                          -1 for other types — cell suppression).
                          Plan: the at-risk combo set joins back via ONE
                          ``bucketed_join`` on NULL-safe derived keys —
                          the risky set is unbounded at corpus scale
                          (every rare combo), so it is never broadcast.

    NULL quasi values are first-class: a combo like (NULL, 3) is
    counted, flagged, and suppressed like any other. The entire
    pipeline runs on sentinel-encoded STRING key columns (NULL →
    ``"\\x00null"``) because both Ray's sort-boundary partitioning
    (None < str raises in Python) and Arrow's hash join (NULL never
    equals NULL) mishandle null keys; original values/types are decoded
    back for the audit output.

    Reference mapping: extends the reference's per-component count
    contract (validation/functional_test.rs:206-212) to a row-privacy
    gate; no reference analog — LLM-pipeline addition.
    """
    from vector_ray.stages.grouped import aggregate
    from vector_ray.stages.shuffle import bucketed_join

    qcols = list(quasi)
    schema = ds.schema()
    qtypes = dict(zip(schema.names, schema.types))
    null_sent = "\x00null"
    jkeys = [f"__jk{i}" for i in range(len(qcols))]

    def add_jkeys(t: pa.Table) -> pa.Table:
        for i, c in enumerate(qcols):
            t = t.append_column(
                jkeys[i],
                pc.fill_null(pc.cast(t[c], pa.string()), null_sent),
            )
        return t

    encoded = ds.map_batches(add_jkeys, batch_format="pyarrow")
    audit = aggregate(
        encoded.select_columns(jkeys),
        {"group_by": jkeys, "aggregates": {"n": {"fn": "count"}}},
    )

    def flag(t: pa.Table) -> pa.Table:
        return t.append_column(
            "at_risk", pc.less(pc.cast(t["n"], pa.int64()), pa.scalar(k))
        )

    audit = audit.map_batches(flag, batch_format="pyarrow")
    if mode == "audit":

        def decode(t: pa.Table) -> pa.Table:
            cols = {}
            for i, c in enumerate(qcols):
                jk = t[jkeys[i]]
                cols[c] = pc.cast(
                    pc.if_else(pc.equal(jk, null_sent),
                               pa.scalar(None, pa.string()), jk),
                    qtypes[c],
                )
            cols["n"] = t["n"]
            cols["at_risk"] = t["at_risk"]
            return pa.table(cols)

        return audit.map_batches(decode, batch_format="pyarrow")
    if mode != "suppress":
        raise ValueError(f"unknown kanonymity mode {mode!r} (audit | suppress)")

    def risky_jkeys(t: pa.Table) -> pa.Table:
        out = t.filter(t["at_risk"]).select(jkeys)
        return out.append_column(
            "__risk", pa.array(np.ones(out.num_rows, dtype=bool))
        )

    risky = audit.map_batches(risky_jkeys, batch_format="pyarrow")
    rows = encoded.select_columns([id_field, *qcols, *jkeys])
    joined = bucketed_join(rows, risky, key=jkeys,
                           num_buckets=num_buckets, how="left")

    def mask(t: pa.Table) -> pa.Table:
        hit = pc.fill_null(t["__risk"], False)
        cols = {id_field: t[id_field]}
        for c in qcols:
            typ = t.schema.field(c).type
            sent = (
                pa.scalar("*", typ)
                if pa.types.is_string(typ) or pa.types.is_large_string(typ)
                else pa.scalar(-1, typ)
            )
            cols[c] = pc.if_else(hit, sent, t[c])
        return pa.table(cols)

    return joined.map_batches(mask, batch_format="pyarrow")


def hbos_score(
    ds,
    features: list[str],
    id_field: str = "event_id",
    target: str = "hbos",
    round_to: int = 6,
):
    """Histogram-Based Outlier Score (Goldstein & Dengel, KI 2012 —
    public definition): with each feature pre-discretized to an int64
    bucket column, score(x) = −Σ_f log( count_f(bucket_f(x)) / N ).
    Rare feature-bucket combinations score high; the score is additive
    over features, so no joint histogram (and no joint-sparsity blowup)
    is needed.

    Plan: ONE unpivot pass feeds the two-phase grouped count over
    (feature, bucket) — the shuffle carries one partial per (feature,
    bucket, block) and the result is Σ_f |buckets_f| rows, bounded by
    the discretization the caller chose (small by construction — e.g.
    24 hour bins × a handful of value bins), NOT by corpus size. The
    tiny histogram broadcasts once via ray.put; the scoring pass is
    vectorized searchsorted lookups. Every row's bucket is observed
    (it contributed to the histogram), so lookups always hit.
    Arithmetic mirrors the SQL oracle term-for-term."""
    import ray

    from vector_ray.schema import round_sql_np
    from vector_ray.stages.grouped import aggregate

    feats = list(features)

    def unpivot(t: pa.Table) -> pa.Table:
        parts = []
        for f in feats:
            parts.append(
                pa.table(
                    {
                        "feature": pa.array([f] * t.num_rows, pa.string()),
                        "bucket": pc.cast(t[f], pa.int64()),
                    }
                )
            )
        return pa.concat_tables(parts)

    hist = aggregate(
        ds.map_batches(unpivot, batch_format="pyarrow"),
        {"group_by": ["feature", "bucket"], "aggregates": {"n": {"fn": "count"}}},
    )
    from vector_ray.functions.embeddings import _collect

    htbl = _collect(hist)
    lookups = {}
    total = 0.0
    if htbl.num_rows:
        for f in feats:
            sel = htbl.filter(pc.equal(htbl["feature"], f))
            buckets = np.asarray(
                sel["bucket"].to_numpy(zero_copy_only=False), np.int64
            )
            counts = np.asarray(
                sel["n"].to_numpy(zero_copy_only=False), np.float64
            )
            order = np.argsort(buckets)
            lookups[f] = (buckets[order], counts[order])
            if f == feats[0]:
                total = float(counts.sum())
    else:
        # empty input: nothing will be scored, but the broadcast model
        # must still exist for the (empty) scoring pass
        lookups = {
            f: (np.empty(0, np.int64), np.empty(0, np.float64)) for f in feats
        }
    model = ray.put((lookups, total))

    def score(t: pa.Table, mref=model) -> pa.Table:
        lk, nn = ray.get(mref)
        acc = None
        for f in feats:
            b, c = lk[f]
            col = t[f]
            if col.null_count:
                raise ValueError(
                    f"hbos_score: null values in feature {f!r}; "
                    "fill or filter nulls before scoring"
                )
            vals = np.asarray(col.to_numpy(zero_copy_only=False), np.int64)
            idx = np.searchsorted(b, vals)
            # every scored value must be a bucket seen in the histogram
            # pass; an unseen value would index out of range or hit a
            # silently wrong neighbor count
            if len(b) == 0:
                bad = np.ones(len(vals), bool)
            else:
                safe = np.minimum(idx, len(b) - 1)
                bad = (idx >= len(b)) | (b[safe] != vals)
            if vals.size and bad.any():
                raise ValueError(
                    f"hbos_score: value(s) in feature {f!r} not present "
                    "in the training histogram (score the same table the "
                    "histogram was built from, or bucket new data first)"
                )
            cnt = c[idx]
            term = np.log(cnt / nn)
            acc = term if acc is None else acc + term
        s = -acc if acc is not None else np.zeros(t.num_rows)
        s = round_sql_np(round_sql_np(s, 9), round_to)
        return pa.table({id_field: t[id_field], target: pa.array(s, pa.float64())})

    return ds.map_batches(score, batch_format="pyarrow")


def psi_drift(
    ds,
    key: str,
    bucket: str,
    half: str,
    round_to: int = 6,
):
    """Population Stability Index per key — the classic feature-drift
    gate (credit-scoring literature, public defn): with rows already
    tagged ``half`` ∈ {0 = reference, 1 = current} and discretized to
    ``bucket``,

        PSI(key) = Σ_buckets (q_b − p_b) · ln(q_b / p_b)

    with add-one (Laplace) smoothed shares p_b = (c_ref+1)/(n_ref+B),
    q_b = (c_cur+1)/(n_cur+B) over the key's union bucket set B — total
    and deterministic with zero-count buckets on either side.
    PSI < 0.1 reads "stable", 0.1–0.25 "moderate shift", > 0.25 "major
    shift" (the conventional thresholds).

    Plan: ONE two-phase count over (key, bucket, half) — bounded by the
    caller's discretization × 2, never by corpus size — then the tiny
    histogram finalizes per key (each term rounded to 9 before the sum,
    the bm25 oracle-parity trick). Output: (key, n_ref, n_cur, psi)."""
    import math

    from vector_ray.schema import round_sql_np
    from vector_ray.stages.grouped import aggregate

    hist = aggregate(
        ds.select_columns([key, bucket, half]),
        {"group_by": [key, bucket, half],
         "aggregates": {"n": {"fn": "count"}}},
    )
    from vector_ray.functions.embeddings import _collect

    htbl = _collect(hist)
    if htbl.num_rows == 0:
        return pa.table(
            {key: pa.array([], pa.string()), "n_ref": pa.array([], pa.int64()),
             "n_cur": pa.array([], pa.int64()), "psi": pa.array([], pa.float64())}
        )
    keys = htbl[key].to_pylist()
    buckets = htbl[bucket].to_pylist()
    halves = htbl[half].to_pylist()
    counts = htbl["n"].to_pylist()
    per_key: dict = {}
    for kk, b, h, n in zip(keys, buckets, halves, counts):
        per_key.setdefault(kk, {}).setdefault(b, [0, 0])[int(h)] = int(n)
    out_k, out_r, out_c, out_psi = [], [], [], []
    for kk in sorted(per_key):
        bmap = per_key[kk]
        nb = len(bmap)
        n_ref = sum(v[0] for v in bmap.values())
        n_cur = sum(v[1] for v in bmap.values())
        terms = []
        for b in sorted(bmap):
            cr, cc = bmap[b]
            p = (cr + 1.0) / (n_ref + nb)
            q = (cc + 1.0) / (n_cur + nb)
            t = (q - p) * math.log(q / p)
            terms.append(math.copysign(
                math.floor(abs(t) * 1e9 + 0.5) / 1e9, t))
        psi = float(round_sql_np(round_sql_np(np.asarray([sum(terms)]), 9),
                                 round_to)[0])
        out_k.append(kk)
        out_r.append(n_ref)
        out_c.append(n_cur)
        out_psi.append(psi)
    return pa.table(
        {
            key: pa.array(out_k),
            "n_ref": pa.array(out_r, pa.int64()),
            "n_cur": pa.array(out_c, pa.int64()),
            "psi": pa.array(out_psi, pa.float64()),
        }
    )
