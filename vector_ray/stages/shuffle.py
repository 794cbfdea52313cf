"""Explicit partitioning / shuffle / skew machinery.

The north rule requires source-key skew to be handled explicitly (the
``source`` column is zipf-distributed by construction). Three tools:

* ``hash_bucket`` — deterministic hash-partition column (FNV over key
  bytes % B): pick ONE partitioning key, reuse it across stages.
* ``salted_map_groups`` — per-group logic on hot keys without shipping a
  whole key to one worker: salt each row into (key, salt) sub-groups,
  run the per-group fn per sub-group, then merge the (at most B) partial
  results per key in a second, tiny ``map_groups``. Correct whenever the
  per-group computation is mergeable (top-k, count, distinct, sample).
* ``bucketed_join`` — the portable large×large equi-join: tag and union
  both sides, hash-shuffle once on the bucket column, and join matching
  buckets pairwise inside ``map_groups`` (Arrow-native ``pa.Table.join``
  per bucket). Partitioning assumption: each bucket's two sides fit a
  worker; size B accordingly and salt hot keys upstream.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from vector_ray.stages.core import _stable_hash_u64

BUCKET_COLUMN = "__bucket"
SALT_COLUMN = "__salt"


def _key_hash(t: pa.Table, key: str) -> np.ndarray:
    col = t[key]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        # fill nulls BEFORE to_numpy: a null-bearing int column converts
        # via float64 (NaN), which corrupts >2^53 keys and makes the NaN
        # cast platform-dependent — same key, different bucket. Unsigned
        # columns widen to uint64 (an int64 cast would reject >= 2^63).
        wide = (
            pa.uint64() if pa.types.is_unsigned_integer(col.type) else pa.int64()
        )
        filled = pc.fill_null(pc.cast(col, wide), 0)
        vals = filled.to_numpy(zero_copy_only=False).astype(np.uint64)
        return vals * np.uint64(0x9E3779B97F4A7C15)
    return _stable_hash_u64(pc.cast(col, pa.string()))


def _hashable(typ: pa.DataType) -> bool:
    return (
        pa.types.is_integer(typ)
        or pa.types.is_floating(typ)
        or pa.types.is_string(typ)
        or pa.types.is_large_string(typ)
        or pa.types.is_boolean(typ)
    )


def hash_bucket(ds, key: str, num_buckets: int, column: str = BUCKET_COLUMN):
    """Append a deterministic hash-partition column for ``key``."""

    def add(t: pa.Table) -> pa.Table:
        b = (_key_hash(t, key) % np.uint64(num_buckets)).astype(np.int64)
        return t.append_column(column, pa.array(b))

    return ds.map_batches(add, batch_format="pyarrow")


def salted_map_groups(
    ds,
    key: str | list[str],
    partial_fn,
    merge_fn,
    salt_buckets: int = 16,
):
    """groupby(key).map_groups(fn) for skewed keys.

    ``partial_fn(table) -> table`` runs once per (key, salt) sub-group;
    ``merge_fn(table) -> table`` merges a key's partials (≤ salt_buckets
    rows of partial output per key). Salt is derived from a per-row hash
    of the row's position-independent content (first non-key column) so
    it is deterministic.
    """
    keys = [key] if isinstance(key, str) else list(key)

    def add_salt(t: pa.Table) -> pa.Table:
        # deterministic per-row salt: XOR of hashes over all HASHABLE
        # non-key columns (a single column could be constant within a
        # hot key, which would collapse every row into one sub-group and
        # defeat the skew mitigation; list/struct/binary columns are
        # skipped — they have no string cast). Row index is NOT usable —
        # it depends on block layout.
        non_key = [
            c
            for c in t.column_names
            if c not in keys and _hashable(t.schema.field(c).type)
        ]
        if non_key:
            h = np.zeros(t.num_rows, dtype=np.uint64)
            for c in non_key:
                h ^= _key_hash(t, c)
        else:
            # key-only rows are interchangeable within a group: any
            # deterministic-enough spread is correct post-merge
            h = np.arange(t.num_rows, dtype=np.uint64)
        return t.append_column(
            SALT_COLUMN,
            pa.array((h % np.uint64(salt_buckets)).astype(np.int64)),
        )

    def drop_salt(t: pa.Table) -> pa.Table:
        return t.drop_columns([c for c in (SALT_COLUMN,) if c in t.column_names])

    salted = ds.map_batches(add_salt, batch_format="pyarrow")
    partials = salted.groupby(keys + [SALT_COLUMN]).map_groups(
        lambda g: partial_fn(drop_salt(g)), batch_format="pyarrow"
    )
    return partials.groupby(keys).map_groups(merge_fn, batch_format="pyarrow")


def topk_per_key(
    ds,
    key: str,
    order_by: str,
    k: int,
    descending: bool = True,
    tiebreak: str | None = None,
    salt_buckets: int = 16,
):
    """Skew-safe per-key top-k (the canonical salted_map_groups use)."""
    sort_keys = [(order_by, "descending" if descending else "ascending")]
    if tiebreak:
        sort_keys.append((tiebreak, "ascending"))

    def local_topk(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=sort_keys)
        return t.take(idx.slice(0, k))

    return salted_map_groups(
        ds, key, local_topk, local_topk, salt_buckets=salt_buckets
    )


def bucketed_join(
    left,
    right,
    key: str | list[str],
    num_buckets: int = 32,
    how: str = "inner",
    suffix: str = "_r",
):
    """Explicit partitioned hash join of two large Datasets.

    One hash shuffle total: both sides are tagged, unioned, bucketed on
    the join key, and each bucket joins its two sides Arrow-natively
    inside ``map_groups``.

    ``how``: inner | left | full — row-combining joins; semi | anti —
    filtering joins that return LEFT columns only (anti is the
    contamination-filter shape: keep left rows with NO key match in
    right, e.g. drop training docs whose fingerprint appears in an
    eval-set blocklist).
    """
    if how not in ("inner", "left", "full", "semi", "anti"):
        raise ValueError(
            f"unsupported join type {how!r} (inner | left | full | semi | anti)"
        )
    keys = [key] if isinstance(key, str) else list(key)
    if how in ("semi", "anti"):
        # filtering joins never read right payload columns: ship only the
        # key columns across the shuffle, deduped per batch (a blocklist
        # with many repeats of a hot key shrinks before it moves)
        kl = list(keys)

        def _keys_only(t: pa.Table) -> pa.Table:
            return t.select(kl).group_by(kl).aggregate([])

        right = right.map_batches(_keys_only, batch_format="pyarrow")
    lschema, rschema = left.schema(), right.schema()
    # a side that produced zero blocks (e.g. a filter that matched
    # nothing after a groupby) has no schema at all; resolve the join
    # without the shuffle where the semantics are unambiguous
    if lschema is None:
        # empty left: every supported join type yields no rows from it
        # (full would need right rows back, but without a left schema the
        # unified block schema is unknowable — surface that explicitly)
        if how == "full":
            raise TypeError(
                "bucketed_join: full join requires a left schema "
                "(left side produced no blocks)"
            )
        return left
    if rschema is None:
        if how == "anti":
            return left  # nothing to remove
        if how in ("inner", "semi"):
            return left.limit(0)
        # left/full would need the right columns (as nulls) — without a
        # right schema the output schema is unknowable
        raise TypeError(
            f"bucketed_join: {how} join requires a right schema "
            "(right side produced no blocks)"
        )
    left_cols = list(lschema.names)
    # same-named non-key right columns get the suffix up front
    rename = {
        c: (f"{c}{suffix}" if c in left_cols and c not in keys else c)
        for c in rschema.names
    }
    right_cols = [rename[c] for c in rschema.names]
    # the two sides must agree on key column types: the union carries ONE
    # key column, so a silent dtype overwrite (int32 left vs int64 right)
    # would produce conflicting block schemas and fail mid-shuffle
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    for k in keys:
        lt, rt = ltypes[k], rtypes[k]
        if lt != rt:
            raise TypeError(
                f"bucketed_join key {k!r} dtype mismatch: left={lt} right={rt}; "
                f"cast both sides to a common type before joining"
            )
    # unified schema for the single shuffle: union of both sides + nulls
    types: dict[str, pa.DataType] = {}
    for name, typ in zip(lschema.names, lschema.types):
        types[name] = typ
    for name, typ in zip(rschema.names, rschema.types):
        types[rename[name]] = typ
    all_cols = list(dict.fromkeys(left_cols + right_cols))

    def tag(side: str):
        def fn(t: pa.Table) -> pa.Table:
            if side == "r":
                t = t.rename_columns([rename[c] for c in t.column_names])
            b = (_key_hash(t, keys[0]) % np.uint64(num_buckets)).astype(np.int64)
            cols = {}
            for c in all_cols:
                if c in t.column_names:
                    v = t[c]
                    cols[c] = v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
                else:
                    cols[c] = pa.nulls(t.num_rows, types[c])
            cols[BUCKET_COLUMN] = pa.array(b)
            cols["__side"] = pa.array([side] * t.num_rows)
            return pa.table(cols)

        return fn

    lt = left.map_batches(tag("l"), batch_format="pyarrow")
    rt = right.map_batches(tag("r"), batch_format="pyarrow")
    both = lt.union(rt)

    join_type = {
        "inner": "inner",
        "left": "left outer",
        "full": "full outer",
        "semi": "left semi",
        "anti": "left anti",
    }[how]
    out_cols = left_cols if how in ("semi", "anti") else all_cols

    def join_bucket(g: pa.Table) -> pa.Table:
        # arrow-native per-bucket hash join: a pandas round-trip would
        # promote the union's null-padded int columns to float64 (lossy
        # above 2^53 and a schema mismatch vs SQL oracles)
        side = g["__side"]
        if isinstance(side, pa.ChunkedArray):
            side = side.combine_chunks()
        l = g.filter(pc.equal(side, "l")).select(left_cols).combine_chunks()
        r = g.filter(pc.equal(side, "r")).select(right_cols).combine_chunks()
        out = l.join(r, keys=keys, join_type=join_type)
        return out.select(out_cols).combine_chunks()

    return both.groupby(BUCKET_COLUMN).map_groups(
        join_bucket, batch_format="pyarrow"
    )


def skew_join(
    left,
    right,
    key: str,
    num_buckets: int = 32,
    how: str = "inner",
    suffix: str = "_r",
    hot_capacity: int = 64,
    hot_min_frac: float = 0.02,
    broadcast_limit: int = 2_000_000,
):
    """Skew-safe large×large equi-join (hybrid broadcast/shuffle).

    A plain hash join puts every row of a hot key into ONE bucket —
    one straggler task holds the whole hot group. This operator splits
    the plan: hot join keys are detected from the LEFT side with
    per-block top-``hot_capacity`` count summaries (bounded state, the
    Misra-Gries idea — detection is a PERFORMANCE decision, any split
    is exact, so approximate counts are safe), their RIGHT rows are
    broadcast once for a map-side per-batch Arrow join (hot left rows
    never shuffle), and only the cold remainder of BOTH sides takes
    the ``bucketed_join`` hash shuffle. The two outputs union.

    ``how``: inner | left. A hot set whose right rows exceed
    ``broadcast_limit`` falls back to the plain bucketed join for
    everything (warned, not silent) — that means the right side is
    itself huge per key, and no broadcast plan is safe.

    When to use (measured, BASELINE.md): the detection + split passes
    cost ~2 extra scans, so the plain ``bucketed_join`` wins on
    moderate inputs (4M rows / 90%-hot: 2.5 s vs 3.2 s at 32 CPUs);
    skew_join wins once the hot group outgrows one task's fair share
    and becomes the serial tail (16M rows / 90%-hot: 4.8 s vs 7.2 s,
    and the gap grows linearly with the hot group).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"skew_join supports inner | left, got {how!r}")

    # ---- pass 1: bounded hot-key detection over the left side -------
    def detect(t: pa.Table) -> pa.Table:
        counts = (
            t.select([key])
            .group_by([key])
            .aggregate([(key, "count")])
            .rename_columns([key, "__cnt"])
            .sort_by([("__cnt", "descending")])
            .slice(0, hot_capacity)
        )
        kt = counts[key]
        sentinel = pa.table(
            {
                key: pa.nulls(1, t.schema.field(key).type),
                "__cnt": pa.array([0], pa.int64()),
                "__rows": pa.array([t.num_rows], pa.int64()),
            }
        )
        body = pa.table(
            {
                key: kt,
                "__cnt": pc.cast(counts["__cnt"], pa.int64()),
                "__rows": pa.array(
                    np.zeros(counts.num_rows, np.int64)
                ),
            }
        )
        return pa.concat_tables([body, sentinel])

    import ray as _ray

    parts_tables = _ray.get(
        left.map_batches(detect, batch_format="pyarrow")
        .materialize()
        .to_arrow_refs()
    )
    parts = pa.concat_tables(
        [t for t in parts_tables if t.num_rows > 0] or parts_tables[:1],
        promote_options="default",
    )
    total = int(pc.sum(parts["__rows"]).as_py() or 0)
    cand = (
        parts.filter(pc.is_valid(parts[key]))
        .group_by([key])
        .aggregate([("__cnt", "sum")])
        .rename_columns([key, "__cnt"])
    )
    threshold = max(2, int(hot_min_frac * total))
    hot_t = (
        cand.filter(pc.greater_equal(cand["__cnt"], threshold))
        .sort_by([("__cnt", "descending"), (key, "ascending")])
        .slice(0, hot_capacity)
    )
    hot_vals = hot_t[key].combine_chunks()
    if len(hot_vals) == 0:
        return bucketed_join(
            left, right, key, num_buckets=num_buckets, how=how,
            suffix=suffix,
        )

    # ---- split: hot right rows broadcast, cold rows shuffle ----------
    lschema, rschema = left.schema(), right.schema()
    left_cols = list(lschema.names)
    rename = {
        c: (f"{c}{suffix}" if c in left_cols and c != key else c)
        for c in rschema.names
    }
    all_cols = list(
        dict.fromkeys(left_cols + [rename[c] for c in rschema.names])
    )

    hot_ref_vals = _ray.put(hot_vals)

    def _split(t: pa.Table, keep_hot: bool) -> pa.Table:
        hv = _ray.get(hot_ref_vals)
        # null keys go to the cold path (fill_null, not drop): a LEFT
        # join must still emit them null-padded, and bucketed_join
        # already handles null keys
        mask = pc.fill_null(pc.is_in(t[key], value_set=hv), False)
        return t.filter(mask if keep_hot else pc.invert(mask))

    right_hot_tables = _ray.get(
        right.map_batches(
            lambda t: _split(t, True), batch_format="pyarrow"
        )
        .materialize()
        .to_arrow_refs()
    )
    right_hot = pa.concat_tables(
        [t for t in right_hot_tables if t.num_rows > 0]
        or right_hot_tables[:1],
        promote_options="default",
    )
    if right_hot.num_rows > broadcast_limit:
        import warnings

        warnings.warn(
            f"skew_join: hot right side has {right_hot.num_rows} rows "
            f"(> broadcast_limit {broadcast_limit}); falling back to the "
            "plain bucketed join",
            stacklevel=2,
        )
        return bucketed_join(
            left, right, key, num_buckets=num_buckets, how=how,
            suffix=suffix,
        )
    right_hot = right_hot.rename_columns(
        [rename[c] for c in right_hot.column_names]
    ).combine_chunks()
    rh_ref = _ray.put(right_hot)
    join_type = {"inner": "inner", "left": "left outer"}[how]

    def map_side_join(t: pa.Table) -> pa.Table:
        rh = _ray.get(rh_ref)
        out = t.combine_chunks().join(rh, keys=[key], join_type=join_type)
        return out.select(all_cols).combine_chunks()

    hot_out = left.map_batches(
        lambda t: _split(t, True), batch_format="pyarrow"
    ).map_batches(map_side_join, batch_format="pyarrow")

    cold_out = bucketed_join(
        left.map_batches(lambda t: _split(t, False), batch_format="pyarrow"),
        right.map_batches(lambda t: _split(t, False), batch_format="pyarrow"),
        key,
        num_buckets=num_buckets,
        how=how,
        suffix=suffix,
    ).map_batches(
        lambda t: t.select(all_cols), batch_format="pyarrow"
    )
    return hot_out.union(cold_out)


def bucketed_asof_join(
    left,
    right,
    by: str,
    on: str,
    num_buckets: int = 32,
    how: str = "left",
    suffix: str = "_r",
    direction: str = "backward",
    tolerance: int | None = None,
):
    """Distributed as-of join: each left row picks one right row within
    the same ``by`` key — the telemetry/"latest snapshot" join (events
    to their most recent config push, trades to quotes). Ray Data has no
    native as-of join.

    ``direction``: "backward" (default) picks the LARGEST right ``on``
    <= the left's; "forward" the SMALLEST >=; "nearest" whichever of the
    two is closer (exact tie → backward, deterministically).
    ``tolerance`` (int, in the ``on`` column's int64 units — e.g. µs for
    timestamp[us]) discards a match farther than that: left join keeps
    the row with null right columns, inner join drops it.

    Same one-shuffle shape as ``bucketed_join``: tag + union both sides,
    hash-bucket on ``by``, and merge each bucket with a fully vectorized
    searchsorted over a (key-code, time) composite — no per-row or
    per-key Python loop. Determinism contract: the right side must be
    unique per (by, on) pair (pre-aggregate duplicates first), otherwise
    which duplicate wins is undefined.

    ``on`` may be any integer or timestamp type (compared on the int64
    representation, identical across sides by the dtype check).
    """
    if how not in ("left", "inner"):
        raise ValueError(f"unsupported as-of join type {how!r} (left | inner)")
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"unsupported as-of direction {direction!r} "
            "(backward | forward | nearest)"
        )
    if tolerance is not None and tolerance < 0:
        raise ValueError("asof tolerance must be >= 0")
    lschema, rschema = left.schema(), right.schema()
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    for col in (by, on):
        if ltypes[col] != rtypes[col]:
            raise TypeError(
                f"asof join column {col!r} dtype mismatch: "
                f"{ltypes[col]} vs {rtypes[col]}"
            )
    left_cols = list(lschema.names)
    rename = {
        c: (f"{c}{suffix}" if c in left_cols else c)
        for c in rschema.names
        if c not in (by, on)
    }
    rename[by], rename[on] = by, on
    right_out = [rename[c] for c in rschema.names if c not in (by, on)]

    types: dict[str, pa.DataType] = {
        name: typ for name, typ in zip(lschema.names, lschema.types)
    }
    for name, typ in zip(rschema.names, rschema.types):
        types[rename[name]] = typ
    all_cols = list(dict.fromkeys(left_cols + right_out))

    def tag(side: str):
        def fn(t: pa.Table) -> pa.Table:
            if side == "r":
                t = t.rename_columns([rename[c] for c in t.column_names])
            b = (_key_hash(t, by) % np.uint64(num_buckets)).astype(np.int64)
            cols = {}
            for c in all_cols:
                if c in t.column_names:
                    v = t[c]
                    cols[c] = (
                        v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
                    )
                else:
                    cols[c] = pa.nulls(t.num_rows, types[c])
            cols[BUCKET_COLUMN] = pa.array(b)
            cols["__side"] = pa.array([side] * t.num_rows)
            return pa.table(cols)

        return fn

    both = left.map_batches(tag("l"), batch_format="pyarrow").union(
        right.map_batches(tag("r"), batch_format="pyarrow")
    )

    def _on_i64(t: pa.Table) -> np.ndarray:
        col = t[on]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return pc.cast(col, pa.int64()).to_numpy(zero_copy_only=False)

    def merge_bucket(g: pa.Table) -> pa.Table:
        side = g["__side"]
        if isinstance(side, pa.ChunkedArray):
            side = side.combine_chunks()
        is_l = pc.equal(side, "l")
        l = g.filter(is_l).combine_chunks()
        r = g.filter(pc.invert(is_l)).combine_chunks()
        # SQL semantics: a null key or null 'on' matches nothing. Nulls
        # would otherwise corrupt the int64 composite (NaN round-trip).
        r = r.filter(
            pc.and_(pc.is_valid(r[by]), pc.is_valid(r[on]))
        ).combine_chunks()
        l_ok = pc.and_(pc.is_valid(l[by]), pc.is_valid(l[on]))
        l_null = l.filter(pc.invert(l_ok)).combine_chunks()
        l = l.filter(l_ok).combine_chunks()

        def _with_null_left(out: pa.Table) -> pa.Table:
            if how == "inner" or l_null.num_rows == 0:
                return out
            cols = {c: l_null[c] for c in left_cols}
            for c in right_out:
                cols[c] = pa.nulls(l_null.num_rows, types[c])
            pad = pa.table({c: cols[c] for c in all_cols})
            return pa.concat_tables([out, pad])

        if l.num_rows == 0:
            return _with_null_left(
                pa.table({c: pa.array([], types[c]) for c in all_cols})
            )
        if r.num_rows == 0:
            # no snapshot rows in this bucket: left join yields all-null
            # right columns, inner join yields nothing
            if how == "inner":
                return pa.table({c: pa.array([], types[c]) for c in all_cols})
            cols = {c: l[c] for c in left_cols}
            for c in right_out:
                cols[c] = pa.nulls(l.num_rows, types[c])
            return _with_null_left(pa.table({c: cols[c] for c in all_cols}))
        # key codes shared across both sides via one dictionary encode
        key_all = pa.chunked_array(
            list(l[by].chunks) + list(r[by].chunks), type=types[by]
        ).combine_chunks()
        if isinstance(key_all, pa.ChunkedArray):  # pyarrow version dependent
            key_all = (
                key_all.chunk(0)
                if key_all.num_chunks
                else pa.array([], types[by])
            )
        codes = (
            key_all.dictionary_encode()
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        lcode, rcode = codes[: l.num_rows], codes[l.num_rows :]
        lon, ron = (
            _on_i64(l),
            _on_i64(r) if r.num_rows else np.empty(0, np.int64),
        )
        # composite (code, on) -> single int64; span bounded per bucket
        lo = min(lon.min(), ron.min()) if len(ron) else lon.min()
        hi = max(lon.max(), ron.max()) if len(ron) else lon.max()
        span = int(hi) - int(lo) + 2
        n_codes = int(codes.max()) + 1 if len(codes) else 1
        if n_codes * span >= (1 << 62):
            raise OverflowError(
                "asof composite key overflow: shrink the bucket's time "
                "range or key cardinality (increase num_buckets)"
            )
        rcomp = rcode * span + (ron - lo) + 1
        order = np.argsort(rcomp, kind="stable")
        rcomp = rcomp[order]
        rcode_ord = rcode[order]
        ron_ord = ron[order]
        lcomp = lcode * span + (lon - lo) + 1

        def pick(side_):
            # both directions include the exact-equal match (pandas
            # merge_asof semantics)
            if side_ == "backward":
                i = np.searchsorted(rcomp, lcomp, side="right") - 1
                v = i >= 0
                i0 = np.maximum(i, 0)
                delta = lon - ron_ord[i0]
            else:
                i = np.searchsorted(rcomp, lcomp, side="left")
                v = i < len(rcomp)
                i0 = np.minimum(i, len(rcomp) - 1)
                delta = ron_ord[i0] - lon
            v &= rcode_ord[i0] == lcode
            if tolerance is not None:
                v &= delta <= tolerance
            return i0, v, delta

        if direction == "nearest":
            ib, vb, db = pick("backward")
            if_, vf, df = pick("forward")
            # forward wins only when strictly closer: ties go backward
            use_f = vf & (~vb | (df < db))
            idx0 = np.where(use_f, if_, ib)
            valid = vb | vf
        else:
            idx0, valid, _ = pick(direction)
        take = order[idx0]
        cols = {c: l[c] for c in left_cols}
        mask = pa.array(~valid)
        for c in right_out:
            src = r[c].combine_chunks() if r.num_rows else pa.array([], types[c])
            if r.num_rows:
                taken = src.take(
                    pa.array(np.where(valid, take, 0), pa.int64())
                )
                cols[c] = pc.if_else(mask, pa.nulls(l.num_rows, types[c]), taken)
            else:
                cols[c] = pa.nulls(l.num_rows, types[c])
        out = pa.table({c: cols[c] for c in all_cols})
        if how == "inner":
            out = out.filter(pa.array(valid))
        return _with_null_left(out)

    return both.groupby(BUCKET_COLUMN).map_groups(
        merge_bucket, batch_format="pyarrow"
    )


def bucketed_range_join(
    left,
    right,
    value: str,
    lo: str = "lo",
    hi: str = "hi",
    num_buckets: int = 16,
    bounds: tuple | None = None,
    suffix: str = "_r",
):
    """Distributed range (interval) join: each left row matches every
    right interval with ``lo <= value < hi`` (inner, many-to-many —
    overlapping intervals emit one output row per match).

    Scale shape: the value domain is cut into ``num_buckets`` uniform
    ranges; every left row hashes to exactly ONE bucket (its value's
    range) while each interval is REPLICATED to all buckets it overlaps
    — so a match can only happen in the left row's bucket and no
    duplicates arise. One shuffle total; per bucket the match is a
    numpy mask per resident interval (vectorized over the left side).
    Partitioning assumption: intervals-per-bucket stays modest (wide
    intervals replicate widely); pick num_buckets to match the interval
    width distribution.

    ``bounds=(min, max)`` of the value domain skips the extra min/max
    pass over the left side.
    """
    lschema, rschema = left.schema(), right.schema()
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    left_cols = list(lschema.names)
    rename = {
        c: (f"{c}{suffix}" if c in left_cols else c) for c in rschema.names
    }
    right_out = [rename[c] for c in rschema.names]
    types: dict[str, pa.DataType] = dict(ltypes)
    for name, typ in zip(rschema.names, rschema.types):
        types[rename[name]] = typ
    all_cols = list(dict.fromkeys(left_cols + right_out))
    rlo, rhi = rename[lo], rename[hi]

    if bounds is None:
        # one aggregate pass, not two — left's lineage would otherwise
        # re-execute for .min and again for .max
        from ray.data.aggregate import Max, Min

        mm = left.aggregate(Min(value), Max(value))
        vmin, vmax = mm[f"min({value})"], mm[f"max({value})"]
    else:
        vmin, vmax = bounds
    vmin, vmax = float(vmin), float(vmax)
    width = (vmax - vmin) / num_buckets or 1.0

    def _bucket_of(vals: np.ndarray) -> np.ndarray:
        b = np.floor((vals - vmin) / width).astype(np.int64)
        return np.clip(b, 0, num_buckets - 1)

    def tag_left(t: pa.Table) -> pa.Table:
        vals = t[value].combine_chunks().to_numpy(zero_copy_only=False)
        cols = {}
        for c in all_cols:
            if c in t.column_names:
                v = t[c]
                cols[c] = v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
            else:
                cols[c] = pa.nulls(t.num_rows, types[c])
        cols[BUCKET_COLUMN] = pa.array(_bucket_of(vals.astype(np.float64)))
        cols["__side"] = pa.array(["l"] * t.num_rows)
        return pa.table(cols)

    def replicate_right(t: pa.Table) -> pa.Table:
        t = t.rename_columns([rename[c] for c in t.column_names])
        los = t[rlo].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        his = t[rhi].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        b_lo = _bucket_of(los)
        # hi is exclusive: an interval touching a bucket's start only
        # via hi does not overlap it
        b_hi = _bucket_of(np.nextafter(his, -np.inf))
        # empty/inverted intervals (hi <= lo) replicate nowhere
        reps = np.maximum((b_hi - b_lo + 1), 0).astype(np.int64)
        row_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), reps)
        buckets = np.concatenate(
            [np.arange(b_lo[i], b_hi[i] + 1) for i in range(t.num_rows) if reps[i]]
        ) if row_idx.size else np.empty(0, np.int64)
        rt = t.take(pa.array(row_idx))
        cols = {}
        for c in all_cols:
            if c in rt.column_names:
                v = rt[c]
                cols[c] = v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
            else:
                cols[c] = pa.nulls(rt.num_rows, types[c])
        cols[BUCKET_COLUMN] = pa.array(buckets)
        cols["__side"] = pa.array(["r"] * rt.num_rows)
        return pa.table(cols)

    both = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(replicate_right, batch_format="pyarrow")
    )

    def match_bucket(g: pa.Table) -> pa.Table:
        side = g["__side"]
        if isinstance(side, pa.ChunkedArray):
            side = side.combine_chunks()
        is_l = pc.equal(side, "l")
        l = g.filter(is_l).combine_chunks()
        r = g.filter(pc.invert(is_l)).combine_chunks()
        empty = pa.table({c: pa.array([], types[c]) for c in all_cols})
        if l.num_rows == 0 or r.num_rows == 0:
            return empty
        vals = l[value].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        los = r[rlo].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        his = r[rhi].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        out_parts = []
        for i in range(r.num_rows):  # intervals per bucket assumed modest
            mask = (vals >= los[i]) & (vals < his[i])
            if not mask.any():
                continue
            lm = l.filter(pa.array(mask))
            cols = {c: lm[c] for c in left_cols}
            for c in right_out:
                cols[c] = pa.concat_arrays(
                    [r[c].combine_chunks().slice(i, 1)] * lm.num_rows
                ) if lm.num_rows else pa.array([], types[c])
            out_parts.append(pa.table({c: cols[c] for c in all_cols}))
        if not out_parts:
            return empty
        return pa.concat_tables(out_parts)

    return both.groupby(BUCKET_COLUMN).map_groups(
        match_bucket, batch_format="pyarrow"
    )


def bloom_prefilter(
    big_ds,
    small_ds,
    key: str,
    m_bits: int = 1 << 22,
    k: int = 8,
):
    """Shuffle reducer: drop ``big_ds`` rows whose join key CANNOT
    appear in ``small_ds`` before the join moves anything — the classic
    bloom-filter semi-join pushdown. False positives only pass extra
    rows to the real join (correctness is the join's), so the filter
    is safe at any FPR; with the default 4M bits / k=8 the FPR stays
    under ~0.6% up to ~300k distinct keys.

    Plan: one pass over the small side builds per-block partial blooms
    (fixed ``m_bits/8`` bytes each — ONE binary row per block crosses
    to the driver, never the keys), the driver ORs them (bitwise union
    is exact for blooms) and ``ray.put``s the result once; the big side
    streams through a vectorized membership mask. Total driver memory
    is O(m_bits), independent of either side's row count."""
    import ray

    from vector_ray.functions import sketches

    def part(t: pa.Table) -> pa.Table:
        words = sketches.bloom_build(_key_hash(t, key), m_bits, k)
        return pa.table(
            {"bloom": pa.array([words.tobytes()], pa.binary())}
        )

    words = np.zeros((m_bits + 63) // 64, dtype=np.uint64)
    # iter_rows streams one partial bloom at a time — driver memory
    # stays O(m_bits), not O(blocks x m_bits)
    for row in small_ds.map_batches(part, batch_format="pyarrow").iter_rows():
        words |= np.frombuffer(row["bloom"], dtype=np.uint64)
    ref = ray.put(words)

    def filt(t: pa.Table) -> pa.Table:
        w = ray.get(ref)
        return t.filter(
            pa.array(sketches.bloom_contains(w, _key_hash(t, key), m_bits, k))
        )

    return big_ds.map_batches(filt, batch_format="pyarrow")


def mode_per_key(
    ds,
    key: str,
    field: str,
    salt_buckets: int = 16,
    num_buckets: int = 32,
    round_to: int = 6,
):
    """Distributed mode (majority vote): each key's most frequent
    ``field`` value, vote count, total votes, and agreement share —
    the label-aggregation primitive for rater pools / weak supervision.
    Ties break to the smallest value (deterministic).

    Plan: per-block (key, value) count combiner feeds the two-phase
    grouped count, a skew-safe per-key top-1 picks the winner, and the
    per-key totals re-reduce from the SAME (key, value) count table
    (no second corpus pass) before one bucketed join — winner and
    total sets are one row per key and never broadcast."""
    import pyarrow.compute as _pc

    from vector_ray.stages.grouped import aggregate

    counts = aggregate(
        ds.select_columns([key, field]),
        {"group_by": [key, field], "aggregates": {"n": {"fn": "count"}}},
    )
    counts = counts.materialize()  # one table feeds winner + totals
    win = topk_per_key(counts, key=key, order_by="n", k=1,
                       descending=True, tiebreak=field,
                       salt_buckets=salt_buckets)
    totals = aggregate(
        counts,
        {"group_by": [key],
         "aggregates": {"n_total": {"fn": "sum", "field": "n", "int": True}}},
    )
    joined = bucketed_join(win, totals, key, num_buckets=num_buckets,
                           how="inner")

    def finish(t: pa.Table) -> pa.Table:
        n = _pc.cast(t["n"], pa.int64())
        tot = _pc.cast(t["n_total"], pa.int64())
        import numpy as _np

        from vector_ray.schema import round_sql_np

        share = round_sql_np(
            round_sql_np(
                _np.asarray(n.to_numpy(zero_copy_only=False), _np.float64)
                / _np.asarray(tot.to_numpy(zero_copy_only=False), _np.float64),
                9,
            ),
            round_to,
        )
        return pa.table(
            {
                key: t[key],
                field: t[field],
                "n_votes": n,
                "n_total": tot,
                "agreement": pa.array(share, pa.float64()),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")
