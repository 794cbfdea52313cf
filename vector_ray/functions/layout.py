"""Z-order (Morton-curve) data layout for multi-column scan pruning.

At 100 TB the cheapest query is the one that never reads the bytes:
Parquet row-group min/max statistics prune a scan only when the file
layout clusters the filtered column. A single-column sort clusters ONE
column; interleaving the bits of k columns into one sort key (a
space-filling Z-curve) clusters ALL of them at once — a range filter on
any participating column skips most row groups. This is the layout
trick behind Delta Lake / Iceberg ``OPTIMIZE ZORDER BY`` and the
classic UB-tree literature (Bayer 1997).

Pieces:

- ``zorder_key`` — vectorized Morton interleave of k integer arrays
  (fast bit-spread path for k=2, generic bit loop for k>2).
- ``add_zorder_key`` — tag a Dataset with the key. ``normalize="mask"``
  keeps the low ``bits`` of each value (deterministic, SQL-checkable);
  ``normalize="rank"`` maps each column through sampled quantile
  boundaries first, so skewed or unbounded domains (timestamps, ids)
  fill the curve evenly — the 100 TB default. The boundary sample is
  size-capped per block and broadcast once via ``ray.put``.
- ``zorder_layout`` — key → sort → partitioned Parquet write. The sort
  is Ray Data's distributed range-partition sort (the one all-to-all
  this operator exists to amortize: pay the shuffle once at write time,
  prune every later read).
- ``file_range_stats`` / ``pruned_row_groups`` — read back row-group
  min/max metadata: the measurable proof that the layout tightened
  per-group ranges and that a range filter skips groups.

Reference mapping: the reference's sinks write unclustered append logs
(ui/src/components/pipeline/config_panel.rs sink options carry no
layout knobs); this extends the sink surface with the layout step a
Parquet data lake needs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SPREAD16 = ((8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555))


def _spread16(x: np.ndarray) -> np.ndarray:
    """Spread the low 16 bits of each value apart by one zero bit:
    abcd -> 0a0b0c0d (uint32)."""
    x = x.astype(np.uint32) & np.uint32(0xFFFF)
    for shift, mask in _SPREAD16:
        x = (x | (x << np.uint32(shift))) & np.uint32(mask)
    return x


def zorder_key(cols: list[np.ndarray], bits: int = 16) -> np.ndarray:
    """Morton-interleave k non-negative integer arrays into one int64
    sort key. Bit j of column i lands at output bit ``j*k + i`` —
    column 0 owns the LOW bit, matching the classic (x, y) -> yx...yx
    layout. ``k * bits`` must fit in 63 bits. Values are masked to the
    low ``bits`` bits (callers normalize first; see add_zorder_key)."""
    k = len(cols)
    if k < 2:
        raise ValueError("zorder_key: need at least 2 columns")
    if k * bits > 63:
        raise ValueError(f"zorder_key: {k} cols x {bits} bits > 63 bits")
    arrs = [np.asarray(c).astype(np.int64) for c in cols]
    if bits == 16 and k == 2:
        xs = _spread16(arrs[0])
        ys = _spread16(arrs[1])
        return (xs | (ys << np.uint32(1))).astype(np.int64)
    mask = np.int64((1 << bits) - 1)
    out = np.zeros(len(arrs[0]), np.int64)
    for i, a in enumerate(arrs):
        a = a & mask
        for j in range(bits):
            out |= ((a >> np.int64(j)) & np.int64(1)) << np.int64(j * k + i)
    return out


def _sample_boundaries(ds, cols: list[str], bits: int, per_block: int = 4096):
    """Quantile boundaries per column from a bounded per-block sample.
    Each block contributes at most ``per_block`` values per column, so
    the driver-side quantile holds O(blocks * per_block) scalars — a
    fixed budget regardless of corpus size, same shape as Ray Data's
    own sort-boundary sampling."""
    n_bound = (1 << bits) - 1

    def sample(t: pa.Table) -> pa.Table:
        out = {}
        for c in cols:
            v = np.asarray(
                pc.drop_null(t[c].combine_chunks()).to_numpy(
                    zero_copy_only=False
                ),
                dtype=np.float64,
            )
            if len(v) > per_block:
                # deterministic stride sample (no RNG in workers)
                idx = np.linspace(0, len(v) - 1, per_block).astype(np.int64)
                v = np.sort(v)[idx]
            pad = np.full(per_block - len(v), np.nan)
            out[c] = np.concatenate([v, pad])
        return pa.table(out)

    samp = ds.map_batches(sample, batch_format="pyarrow").take_all()
    bounds = {}
    for c in cols:
        v = np.asarray([r[c] for r in samp], np.float64)
        v = v[~np.isnan(v)]
        qs = np.linspace(0.0, 1.0, n_bound + 2)[1:-1]
        bounds[c] = np.quantile(v, qs) if len(v) else np.zeros(n_bound)
    return bounds


def add_zorder_key(
    ds,
    cols: list[str],
    bits: int = 16,
    out: str = "zkey",
    normalize: str = "mask",
):
    """Append a Morton key column built from ``cols``.

    normalize="mask": use the low ``bits`` of each (integer) value
    directly — deterministic, reproducible in plain SQL bit arithmetic
    (the oracle mode). normalize="rank": map values through sampled
    quantile boundaries to [0, 2^bits) so arbitrary / skewed domains
    spread across the curve (the layout mode; boundaries broadcast
    once, np.searchsorted per batch)."""
    import ray

    if normalize not in ("mask", "rank"):
        raise ValueError(f"add_zorder_key: unknown normalize={normalize!r}")
    bounds_ref = None
    if normalize == "rank":
        bounds_ref = ray.put(_sample_boundaries(ds, cols, bits))

    def key(t: pa.Table) -> pa.Table:
        arrs = []
        bounds = ray.get(bounds_ref) if bounds_ref is not None else None
        for c in cols:
            v = np.asarray(
                t[c].combine_chunks().to_numpy(zero_copy_only=False)
            )
            if bounds is not None:
                v = np.searchsorted(
                    bounds[c], v.astype(np.float64), side="right"
                ).astype(np.int64)
            else:
                v = v.astype(np.int64)
            arrs.append(v)
        z = zorder_key(arrs, bits=bits)
        return t.append_column(out, pa.array(z, pa.int64()))

    return ds.map_batches(key, batch_format="pyarrow")


def zorder_layout(
    ds,
    cols: list[str],
    out_dir: str,
    bits: int = 16,
    normalize: str = "rank",
    rows_per_row_group: int = 65536,
):
    """Cluster a Dataset on the Z-curve of ``cols`` and write it as
    Parquet whose row-group stats prune range filters on EVERY listed
    column. One distributed sort (range-partitioned shuffle) at write
    time; the key column is dropped from the stored files."""
    keyed = add_zorder_key(ds, cols, bits=bits, normalize=normalize)
    ordered = keyed.sort("zkey").drop_columns(["zkey"])
    ordered.write_parquet(
        out_dir,
        row_group_size=rows_per_row_group,
        min_rows_per_file=rows_per_row_group,
    )


def file_range_stats(path_or_dir: str, cols: list[str]):
    """Per-row-group (file, group, col, min, max) from Parquet footer
    metadata only — no data pages are read."""
    import glob
    import os

    import pyarrow.parquet as pq

    if os.path.isdir(path_or_dir):
        files = sorted(
            glob.glob(os.path.join(path_or_dir, "**", "*.parquet"), recursive=True)
        )
    else:
        files = [path_or_dir]
    rows = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        name_to_idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            for c in cols:
                st = rg.column(name_to_idx[c]).statistics
                rows.append(
                    {
                        "file": os.path.basename(f),
                        "group": g,
                        "col": c,
                        # min/max are None when the footer carries no
                        # stats (or the group is all-null) — a reader
                        # cannot prune such a group
                        "min": None if st is None else st.min,
                        "max": None if st is None else st.max,
                        "rows": rg.num_rows,
                    }
                )
    return rows


def pruned_row_groups(path_or_dir: str, col: str, lo, hi) -> tuple[int, int]:
    """(groups that a [lo, hi] filter on ``col`` must read, total
    groups) judged purely on footer min/max — the same decision a
    Parquet reader's predicate pushdown makes."""
    stats = file_range_stats(path_or_dir, [col])
    total = len(stats)
    need = sum(
        1
        for s in stats
        if s["min"] is None
        or s["max"] is None
        or not (s["max"] < lo or s["min"] > hi)
    )
    return need, total
