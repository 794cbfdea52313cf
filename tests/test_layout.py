"""Z-order layout: Morton key correctness, rank normalization, and the
row-group-pruning payoff the layout exists for."""

import numpy as np
import pyarrow as pa
import pytest

from vector_ray.functions.layout import (
    add_zorder_key,
    file_range_stats,
    pruned_row_groups,
    zorder_key,
    zorder_layout,
)


def _morton_ref(cols, bits):
    """Slow but obviously-correct per-row bit interleave."""
    k = len(cols)
    out = []
    for row in zip(*cols):
        z = 0
        for i, v in enumerate(row):
            v = int(v) & ((1 << bits) - 1)
            for j in range(bits):
                z |= ((v >> j) & 1) << (j * k + i)
        out.append(z)
    return np.array(out, np.int64)


def test_zorder_key_matches_reference():
    rng = np.random.default_rng(7)
    x = rng.integers(0, 1 << 16, 500)
    y = rng.integers(0, 1 << 16, 500)
    np.testing.assert_array_equal(
        zorder_key([x, y], bits=16), _morton_ref([x, y], 16)
    )


def test_zorder_key_generic_matches_fast():
    rng = np.random.default_rng(8)
    x = rng.integers(0, 1 << 16, 300)
    y = rng.integers(0, 1 << 16, 300)
    fast = zorder_key([x, y], bits=16)
    # force the generic path with a 3rd constant column, then strip its
    # bits: interleaving (x, y, 0) puts x at bits 0,3,6.. y at 1,4,7..
    z3 = zorder_key([x, y, np.zeros_like(x)], bits=16)
    back = np.zeros_like(fast)
    for j in range(16):
        back |= ((z3 >> (3 * j)) & 1) << (2 * j)
        back |= ((z3 >> (3 * j + 1)) & 1) << (2 * j + 1)
    np.testing.assert_array_equal(back, fast)


def test_zorder_key_validates():
    with pytest.raises(ValueError, match="at least 2"):
        zorder_key([np.arange(3)])
    with pytest.raises(ValueError, match="63 bits"):
        zorder_key([np.arange(3)] * 4, bits=16)


def test_add_zorder_key_mask(ray_session):
    import ray.data as rd

    t = pa.table({"a": pa.array([1, 2, 3], pa.int64()),
                  "b": pa.array([70000, 0, 5], pa.int64())})
    out = add_zorder_key(rd.from_arrow(t), ["a", "b"], normalize="mask")
    got = {r["a"]: r["zkey"] for r in out.take_all()}
    exp = _morton_ref([[1, 2, 3], [70000 & 0xFFFF, 0, 5]], 16)
    assert [got[1], got[2], got[3]] == exp.tolist()


def test_zorder_layout_prunes(ray_session, tmp_path):
    """A range filter on the SECOND column prunes most row groups in
    the z-ordered layout, and almost none in a linear first-column
    sort — the whole point of the curve."""
    import ray.data as rd

    rng = np.random.default_rng(42)
    n = 65536
    t = pa.table(
        {
            "x": rng.integers(0, 1 << 16, n),
            "y": rng.integers(0, 1 << 16, n),
        }
    )
    ds = rd.from_arrow(t)

    lin_dir = str(tmp_path / "linear")
    (
        ds.sort("x").write_parquet(
            lin_dir, row_group_size=1024, min_rows_per_file=1024
        )
    )
    z_dir = str(tmp_path / "zorder")
    zorder_layout(
        rd.from_arrow(t), ["x", "y"], z_dir, normalize="mask",
        rows_per_row_group=1024,
    )

    # same data landed
    import pyarrow.parquet as pq
    import glob

    z_rows = sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(z_dir + "/**/*.parquet", recursive=True)
    )
    assert z_rows == n

    band = (30000, 30000 + (1 << 12))  # 1/16 of the y domain
    need_lin, total_lin = pruned_row_groups(lin_dir, "y", *band)
    need_z, total_z = pruned_row_groups(z_dir, "y", *band)
    assert total_z >= 32
    assert need_lin / total_lin > 0.9  # linear layout can't prune y
    assert need_z / total_z < 0.5  # z layout prunes most groups
    # and x still prunes too (z keeps BOTH columns clustered)
    need_zx, total_zx = pruned_row_groups(z_dir, "x", *band)
    assert need_zx / total_zx < 0.5


def test_rank_normalize_spreads_skew(ray_session):
    """Zipf-skewed and huge-domain values still fill the key space when
    rank-normalized (mask mode would collapse them onto a few keys)."""
    import ray.data as rd

    rng = np.random.default_rng(3)
    a = (rng.zipf(1.3, 4000) * 1_000_003) % (1 << 62)  # huge sparse domain
    b = rng.integers(0, 100, 4000)  # tiny domain
    ds = rd.from_arrow(pa.table({"a": a.astype(np.int64), "b": b}))
    out = add_zorder_key(ds, ["a", "b"], bits=8, normalize="rank")
    z = np.array([r["zkey"] for r in out.take_all()])
    assert len(np.unique(z)) > 200  # spread, not collapsed
    assert z.min() >= 0 and z.max() < (1 << 16)


def test_parquet_sink_zorder_option(ray_session, tmp_path):
    """The spec-DAG parquet sink accepts zorder=[cols] and writes a
    clustered directory; zorder + partition_cols is rejected."""
    import ray.data as rd

    from vector_ray.sinks import SINKS

    rng = np.random.default_rng(1)
    t = pa.table(
        {
            "x": rng.integers(0, 1 << 16, 8192),
            "y": rng.integers(0, 1 << 16, 8192),
        }
    )
    d = str(tmp_path / "zs")
    SINKS["parquet"](
        rd.from_arrow(t),
        {"path": d, "zorder": ["x", "y"], "min_rows_per_file": 512,
         "row_group_size": 512},
    )
    need, total = pruned_row_groups(d, "y", 30000, 30000 + (1 << 12))
    assert total >= 8 and need / total < 0.7

    with pytest.raises(ValueError, match="mutually exclusive"):
        SINKS["parquet"](
            rd.from_arrow(t),
            {"path": d, "zorder": ["x"], "partition_cols": ["y"]},
        )


def test_file_range_stats_reads_footers_only(ray_session, tmp_path):
    import ray.data as rd

    t = pa.table({"x": pa.array(range(100), pa.int64())})
    d = str(tmp_path / "p")
    rd.from_arrow(t).write_parquet(d)
    stats = file_range_stats(d, ["x"])
    assert stats and stats[0]["min"] == 0 and stats[-1]["max"] == 99
