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
