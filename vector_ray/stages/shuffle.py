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
    the join key, and each bucket joins its two sides with a pandas
    merge inside ``map_groups``.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported join type {how!r} (inner | left)")
    keys = [key] if isinstance(key, str) else list(key)
    lschema, rschema = left.schema(), right.schema()
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

    join_type = "inner" if how == "inner" else "left outer"

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
        return out.select(all_cols).combine_chunks()

    return both.groupby(BUCKET_COLUMN).map_groups(
        join_bucket, batch_format="pyarrow"
    )
