"""Tests for explicit partitioning / skew / join machinery."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def test_hash_bucket_deterministic(ray_session):
    from vector_ray.stages.shuffle import hash_bucket

    rows = [{"k": f"key-{i%7}", "v": i} for i in range(50)]
    b1 = hash_bucket(rd.from_items(rows), "k", 8).to_pandas()
    b2 = hash_bucket(rd.from_items(rows), "k", 8).to_pandas()
    assert (b1.sort_values("v").__bucket.values == b2.sort_values("v").__bucket.values).all()
    # same key → same bucket
    per_key = b1.groupby("k")["__bucket"].nunique()
    assert (per_key == 1).all()


def test_salted_topk_matches_direct(ray_session):
    from vector_ray.stages.shuffle import topk_per_key

    rng = np.random.default_rng(5)
    # zipf-skewed keys: one hot key dominating
    keys = np.where(rng.random(500) < 0.7, "hot", rng.choice(["a", "b", "c"], 500))
    rows = [
        {"k": str(k), "score": int(s), "id": i}
        for i, (k, s) in enumerate(zip(keys, rng.integers(0, 1000, 500)))
    ]
    out = topk_per_key(
        rd.from_items(rows), "k", "score", k=3, tiebreak="id", salt_buckets=8
    ).to_pandas()

    df = pd.DataFrame(rows)
    expected = (
        df.sort_values(["score", "id"], ascending=[False, True])
        .groupby("k")
        .head(3)
    )
    got = set(zip(out.k, out.id))
    want = set(zip(expected.k, expected.id))
    assert got == want


def test_bucketed_join_inner(ray_session):
    from vector_ray.stages.shuffle import bucketed_join

    left = [{"k": i % 10, "lv": i} for i in range(100)]
    right = [{"k": k, "rv": k * 100} for k in range(7)]  # keys 7,8,9 unmatched
    out = bucketed_join(
        rd.from_items(left), rd.from_items(right), "k", num_buckets=4
    ).to_pandas()
    expected = pd.DataFrame(left).merge(pd.DataFrame(right), on="k")
    assert len(out) == len(expected) == 70
    assert set(zip(out.k, out.lv, out.rv)) == set(
        zip(expected.k, expected.lv, expected.rv)
    )


def test_bucketed_join_overlapping_columns(ray_session):
    from vector_ray.stages.shuffle import bucketed_join

    left = [{"k": 1, "v": 10}, {"k": 2, "v": 20}]
    right = [{"k": 1, "v": 111}, {"k": 2, "v": 222}]
    out = bucketed_join(
        rd.from_items(left), rd.from_items(right), "k", num_buckets=2
    ).to_pandas().sort_values("k")
    assert list(out.columns) == ["k", "v", "v_r"]
    assert list(out.v) == [10, 20] and list(out.v_r) == [111, 222]


def test_bucketed_join_left(ray_session):
    from vector_ray.stages.shuffle import bucketed_join

    left = [{"k": 1, "lv": 1}, {"k": 9, "lv": 9}]
    right = [{"k": 1, "rv": 100}]
    out = bucketed_join(
        rd.from_items(left), rd.from_items(right), "k", num_buckets=2, how="left"
    ).to_pandas().sort_values("k")
    assert len(out) == 2
    assert out[out.k == 9].rv.isna().all()


def test_asof_join_basic(ray_session):
    from vector_ray.stages.shuffle import bucketed_asof_join

    left = pa.table(
        {
            "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "k": pa.array(["a", "a", "a", "b", "c"]),
            "t": pa.array([10, 25, 5, 40, 50], pa.int64()),
        }
    )
    right = pa.table(
        {
            "k": pa.array(["a", "a", "b"]),
            "t": pa.array([10, 20, 41], pa.int64()),
            "snap": pa.array([100, 200, 300], pa.int64()),
        }
    )
    out = (
        bucketed_asof_join(
            rd.from_arrow(left), rd.from_arrow(right), by="k", on="t"
        )
        .to_pandas()
        .sort_values("id")
    )
    # id1: t=10 matches right t=10 (inclusive); id2: t=25 -> t=20;
    # id3: t=5 precedes all -> null; id4: t=40 < 41 -> null; id5: no key
    assert out.snap.tolist()[0] == 100
    assert out.snap.tolist()[1] == 200
    assert pd.isna(out.snap.tolist()[2])
    assert pd.isna(out.snap.tolist()[3])
    assert pd.isna(out.snap.tolist()[4])

    inner = bucketed_asof_join(
        rd.from_arrow(left), rd.from_arrow(right), by="k", on="t", how="inner"
    ).to_pandas()
    assert sorted(inner.id.tolist()) == [1, 2]


def test_asof_join_dtype_mismatch(ray_session):
    from vector_ray.stages.shuffle import bucketed_asof_join

    left = rd.from_arrow(
        pa.table({"k": pa.array([1], pa.int64()), "t": pa.array([1], pa.int64())})
    )
    right = rd.from_arrow(
        pa.table({"k": pa.array([1], pa.int32()), "t": pa.array([1], pa.int64()),
                  "v": pa.array([1], pa.int64())})
    )
    import pytest as _pytest

    with _pytest.raises(TypeError):
        bucketed_asof_join(left, right, by="k", on="t")


def test_range_join_semantics(ray_session):
    from vector_ray.stages.shuffle import bucketed_range_join

    left = pa.table(
        {
            "id": pa.array(list(range(6)), pa.int64()),
            "v": pa.array([0.0, 4.9, 5.0, 7.5, 9.99, 10.0], pa.float64()),
        }
    )
    # [0,5) ; [5,10) ; wide [0,10) overlaps both; empty [100,200)
    right = pa.table(
        {
            "band": pa.array(["a", "b", "wide", "none"]),
            "lo": pa.array([0.0, 5.0, 0.0, 100.0], pa.float64()),
            "hi": pa.array([5.0, 10.0, 10.0, 200.0], pa.float64()),
        }
    )
    out = (
        bucketed_range_join(
            rd.from_arrow(left), rd.from_arrow(right),
            value="v", lo="lo", hi="hi", num_buckets=4,
        )
        .to_pandas()
        .sort_values(["id", "band"])
    )
    by_id = out.groupby("id")["band"].apply(lambda s: sorted(s))
    assert by_id[0] == ["a", "wide"]       # lo inclusive
    assert by_id[1] == ["a", "wide"]
    assert by_id[2] == ["b", "wide"]       # 5.0 crosses into [5,10)
    assert by_id[4] == ["b", "wide"]
    assert 5 not in by_id.index            # 10.0 >= every hi (exclusive)
    assert "none" not in set(out.band)


def test_join_semi_anti_full(ray_session):
    from vector_ray.stages.shuffle import bucketed_join

    left = pa.table(
        {"k": pa.array([1, 2, 3, 4], pa.int64()),
         "lv": pa.array(["a", "b", "c", "d"])}
    )
    # duplicate keys on the right: semi/anti must not multiply left rows
    right = pa.table(
        {"k": pa.array([2, 2, 4, 9], pa.int64()),
         "rv": pa.array([20, 21, 40, 90], pa.int64())}
    )
    semi = bucketed_join(
        rd.from_arrow(left), rd.from_arrow(right), "k", num_buckets=2, how="semi"
    ).to_pandas().sort_values("k")
    assert semi.k.tolist() == [2, 4]
    assert list(semi.columns) == ["k", "lv"]

    anti = bucketed_join(
        rd.from_arrow(left), rd.from_arrow(right), "k", num_buckets=2, how="anti"
    ).to_pandas().sort_values("k")
    assert anti.k.tolist() == [1, 3]

    full = bucketed_join(
        rd.from_arrow(left), rd.from_arrow(right), "k", num_buckets=2, how="full"
    ).to_pandas().sort_values(["k", "rv"])
    # key 9 exists only on the right: full outer keeps it with null lv
    assert sorted(full.k.tolist()) == [1, 2, 2, 3, 4, 9]
    assert full[full.k == 9].lv.isna().all()
    assert full[full.k == 1].rv.isna().all()


def test_asof_join_null_keys(ray_session):
    """Null by/on values match nothing (SQL semantics) instead of
    corrupting the int64 composite via a NaN round-trip."""
    from vector_ray.stages.shuffle import bucketed_asof_join

    left = pa.table(
        {
            "id": pa.array([1, 2, 3], pa.int64()),
            "k": pa.array(["a", None, "a"]),
            "t": pa.array([25, 25, None], pa.int64()),
        }
    )
    right = pa.table(
        {
            "k": pa.array(["a", None]),
            "t": pa.array([10, 5], pa.int64()),
            "snap": pa.array([100, 999], pa.int64()),
        }
    )
    out = (
        bucketed_asof_join(
            rd.from_arrow(left), rd.from_arrow(right), by="k", on="t"
        )
        .to_pandas()
        .sort_values("id")
    )
    assert out.snap.tolist()[0] == 100          # normal match survives
    assert pd.isna(out.snap.tolist()[1])        # null key -> no match
    assert pd.isna(out.snap.tolist()[2])        # null on  -> no match
    assert len(out) == 3                        # left join keeps all rows

    inner = bucketed_asof_join(
        rd.from_arrow(left), rd.from_arrow(right), by="k", on="t", how="inner"
    ).to_pandas()
    assert inner.id.tolist() == [1]


def test_range_join_inverted_interval(ray_session):
    """hi <= lo intervals are empty: dropped, not a crash."""
    from vector_ray.stages.shuffle import bucketed_range_join

    left = pa.table(
        {"id": pa.array([0, 1], pa.int64()),
         "v": pa.array([1.0, 6.0], pa.float64())}
    )
    right = pa.table(
        {
            "band": pa.array(["ok", "empty", "inverted"]),
            "lo": pa.array([0.0, 3.0, 8.0], pa.float64()),
            "hi": pa.array([10.0, 3.0, 2.0], pa.float64()),
        }
    )
    out = bucketed_range_join(
        rd.from_arrow(left), rd.from_arrow(right),
        value="v", num_buckets=3,
    ).to_pandas()
    assert sorted(out.band) == ["ok", "ok"]


def test_bloom_prefilter_no_false_negatives(ray_session):
    """Every true member survives the prefilter (blooms can only
    over-approximate); non-members are mostly pruned at the default
    sizing, and even a tiny, FP-heavy bloom never changes the final
    join result."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.stages.shuffle import bloom_prefilter, bucketed_join

    big = pa.table({"k": pa.array(np.arange(20000) % 997, pa.int64()),
                    "v": pa.array(np.arange(20000), pa.int64())})
    small_keys = [3, 11, 500, 996]
    small = pa.table({"k": pa.array(small_keys, pa.int64()),
                      "name": pa.array([f"s{i}" for i in small_keys])})
    big_ds = rd.from_arrow(big).repartition(4)
    small_ds = rd.from_arrow(small)

    pruned = bloom_prefilter(big_ds, small_ds, "k").to_pandas()
    member_rows = big.filter(
        pa.compute.is_in(big["k"], value_set=pa.array(small_keys))
    ).num_rows
    assert set(small_keys) <= set(pruned["k"])          # no false negatives
    assert len(pruned) >= member_rows
    assert len(pruned) < 20000 * 0.05                   # real pruning happened

    # FP-heavy bloom (64 bits): prefilter keeps junk, join discards it
    noisy = bloom_prefilter(big_ds, small_ds, "k", m_bits=64, k=2)
    joined = bucketed_join(noisy, small_ds, "k", num_buckets=4).to_pandas()
    assert len(joined) == member_rows
    assert set(joined["k"]) == set(small_keys)
