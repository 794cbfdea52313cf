"""skew_join (stages/shuffle.py): exactness vs a single-process Arrow
join under heavy key skew, left-join null padding (incl. null keys),
no-hot-keys fast path, and the broadcast-limit fallback."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.stages.shuffle import skew_join


def _tables(n_left=5000, hot_frac=0.85, seed=7):
    rng = np.random.RandomState(seed)
    # one key owns hot_frac of the left side; the rest spread over 50
    keys = np.where(
        rng.rand(n_left) < hot_frac, 0, rng.randint(1, 50, size=n_left)
    ).astype(np.int64)
    left = pa.table(
        {
            "k": pa.array(keys),
            "lval": pa.array(np.arange(n_left, dtype=np.int64)),
        }
    )
    right = pa.table(
        {
            "k": pa.array(np.arange(0, 40, dtype=np.int64)),
            "rval": pa.array([f"r{i}" for i in range(40)]),
        }
    )
    return left, right


def _collect_sorted(ds):
    t = pa.concat_tables(
        [b for b in ds.iter_batches(batch_format="pyarrow") if b.num_rows],
        promote_options="default",
    )
    return t.sort_by([("lval", "ascending")])


def test_skew_join_inner_exact(ray_session):
    left, right = _tables()
    want = left.join(right, keys=["k"], join_type="inner").sort_by(
        [("lval", "ascending")]
    )
    got = _collect_sorted(
        skew_join(
            rd.from_arrow(left).repartition(8),
            rd.from_arrow(right).repartition(2),
            "k",
            num_buckets=4,
            hot_min_frac=0.05,
        )
    )
    assert got.select(want.column_names).equals(want)


def test_skew_join_left_nulls(ray_session):
    left = pa.table(
        {
            # hot key 0, a key missing from right (99), and a null key
            "k": pa.array([0] * 40 + [1, 99, None], pa.int64()),
            "lval": pa.array(range(43), pa.int64()),
        }
    )
    right = pa.table(
        {
            "k": pa.array([0, 1], pa.int64()),
            "rval": pa.array(["a", "b"]),
        }
    )
    want = left.join(right, keys=["k"], join_type="left outer").sort_by(
        [("lval", "ascending")]
    )
    got = _collect_sorted(
        skew_join(
            rd.from_arrow(left).repartition(4),
            rd.from_arrow(right),
            "k",
            how="left",
            num_buckets=2,
            hot_min_frac=0.2,
        )
    )
    assert got.select(want.column_names).equals(want)


def test_skew_join_no_hot_keys_path(ray_session):
    left, right = _tables(hot_frac=0.0)
    want = left.join(right, keys=["k"], join_type="inner").sort_by(
        [("lval", "ascending")]
    )
    # impossible threshold -> empty hot set -> pure bucketed join
    got = _collect_sorted(
        skew_join(
            rd.from_arrow(left).repartition(4),
            rd.from_arrow(right),
            "k",
            hot_min_frac=1.1,
            num_buckets=4,
        )
    )
    assert got.select(want.column_names).equals(want)


def test_skew_join_broadcast_limit_fallback(ray_session):
    left, right = _tables()
    want = left.join(right, keys=["k"], join_type="inner").sort_by(
        [("lval", "ascending")]
    )
    with pytest.warns(UserWarning, match="broadcast_limit"):
        out = skew_join(
            rd.from_arrow(left).repartition(4),
            rd.from_arrow(right),
            "k",
            hot_min_frac=0.05,
            broadcast_limit=0,
            num_buckets=4,
        )
    assert _collect_sorted(out).select(want.column_names).equals(want)


def test_skew_join_column_collision_suffix(ray_session):
    left = pa.table(
        {
            "k": pa.array([1, 1, 2], pa.int64()),
            "v": pa.array([10, 11, 12], pa.int64()),
            "lval": pa.array([0, 1, 2], pa.int64()),
        }
    )
    right = pa.table(
        {
            "k": pa.array([1, 2], pa.int64()),
            "v": pa.array([100, 200], pa.int64()),
        }
    )
    got = _collect_sorted(
        skew_join(
            rd.from_arrow(left),
            rd.from_arrow(right),
            "k",
            hot_min_frac=0.4,
        )
    )
    assert set(got.column_names) == {"k", "v", "lval", "v_r"}
    assert got["v_r"].to_pylist() == [100, 100, 200]
