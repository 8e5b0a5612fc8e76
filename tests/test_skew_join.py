"""skew_join: hot keys bypass the partitioned shuffle via broadcast;
result must equal a plain join on any input."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from pdf_toolkit_ray import relops


def _skewed_tables(n_cold=2000, n_hot=5000, seed=3):
    rng = np.random.default_rng(seed)
    # cold keys 0..199 uniform; key 7777 is pathologically hot
    big = pd.DataFrame(
        {
            "k": np.r_[rng.integers(0, 200, n_cold), np.full(n_hot, 7777)],
            "v": np.arange(n_cold + n_hot, dtype=np.int64),
        }
    )
    small = pd.DataFrame(
        {
            "k": np.r_[np.arange(0, 150), [7777]],
            "name": [f"n{k}" for k in np.r_[np.arange(0, 150), [7777]]],
        }
    )
    return big, small


def _ref_merge(big, small, how):
    ref = big.merge(small, on="k", how=how)
    return ref.sort_values(["k", "v"]).reset_index(drop=True)


@pytest.mark.parametrize("how", ["inner", "left"])
def test_skew_join_matches_pandas(ray_session, how):
    big, small = _skewed_tables()
    out = (
        relops.skew_join(
            ray_session.data.from_pandas(big),
            ray_session.data.from_pandas(small),
            on="k",
            how=how,
            hot_key_threshold=1000,  # key 7777 (5000 rows) is hot
            num_partitions=8,
        )
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    ref = _ref_merge(big, small, how)
    pd.testing.assert_frame_equal(
        out[["k", "v", "name"]], ref[["k", "v", "name"]], check_dtype=False
    )


def test_skew_join_no_hot_keys_plain_path(ray_session):
    big, small = _skewed_tables(n_hot=0)
    out = (
        relops.skew_join(
            ray_session.data.from_pandas(big),
            ray_session.data.from_pandas(small),
            on="k",
            hot_key_threshold=10_000_000,
            num_partitions=8,
        )
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    ref = _ref_merge(big, small, "inner")
    pd.testing.assert_frame_equal(
        out[["k", "v", "name"]], ref[["k", "v", "name"]], check_dtype=False
    )


def test_skew_join_hot_key_missing_in_small(ray_session):
    # hot key absent from the small side: inner drops it, left keeps nulls
    big, small = _skewed_tables()
    small = small[small["k"] != 7777]
    for how in ("inner", "left"):
        out = (
            relops.skew_join(
                ray_session.data.from_pandas(big),
                ray_session.data.from_pandas(small),
                on="k",
                how=how,
                hot_key_threshold=1000,
                num_partitions=8,
            )
            .to_pandas()
            .sort_values(["k", "v"])
            .reset_index(drop=True)
        )
        ref = _ref_merge(big, small, how)
        assert len(out) == len(ref)
        assert out["k"].tolist() == ref["k"].tolist()
        pd.testing.assert_series_equal(
            out["name"].fillna("∅"), ref["name"].fillna("∅"), check_dtype=False
        )


def test_skew_join_right_on(ray_session):
    big, small = _skewed_tables()
    small = small.rename(columns={"k": "sk"})
    out = (
        relops.skew_join(
            ray_session.data.from_pandas(big),
            ray_session.data.from_pandas(small),
            on="k",
            right_on="sk",
            hot_key_threshold=1000,
            num_partitions=8,
        )
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    ref = _ref_merge(big, small.rename(columns={"sk": "k"}), "inner")
    pd.testing.assert_frame_equal(
        out[["k", "v", "name"]], ref[["k", "v", "name"]], check_dtype=False
    )


def test_skew_join_too_many_hot_keys_raises(ray_session):
    big, small = _skewed_tables()
    with pytest.raises(ValueError, match="salt the"):
        relops.skew_join(
            ray_session.data.from_pandas(big),
            ray_session.data.from_pandas(small),
            on="k",
            hot_key_threshold=1,  # every key "hot"
            max_hot_keys=5,
        )


def test_skew_join_null_keys(ray_session):
    # null keys: SQL semantics (match nothing) — dropped for inner, kept
    # with typed-null small columns for left; never shuffled either way
    big = pa.table(
        {
            "k": pa.array([1, None, 2, None, 1], pa.int64()),
            "v": pa.array([0, 1, 2, 3, 4], pa.int64()),
        }
    )
    small = pa.table(
        {"k": pa.array([1], pa.int64()), "name": pa.array(["one"])}
    )
    b = ray_session.data.from_arrow(big)
    s = ray_session.data.from_arrow(small)

    inner = (
        relops.skew_join(b, s, on="k", how="inner", hot_key_threshold=1,
                         num_partitions=4, max_hot_keys=10)
        .to_pandas().sort_values("v").reset_index(drop=True)
    )
    assert inner["v"].tolist() == [0, 4]
    assert inner["name"].tolist() == ["one", "one"]

    left = (
        relops.skew_join(b, s, on="k", how="left", hot_key_threshold=1,
                         num_partitions=4, max_hot_keys=10)
        .to_pandas().sort_values("v").reset_index(drop=True)
    )
    assert left["v"].tolist() == [0, 1, 2, 3, 4]
    assert left.loc[left["v"].isin([1, 3]), "name"].isna().all()
    assert left.loc[left["v"] == 0, "name"].tolist() == ["one"]
    assert left.loc[left["v"] == 2, "name"].isna().all()


@pytest.mark.parametrize("how", ["inner", "left"])
def test_skew_join_all_keys_hot_empty_cold_branch(ray_session, how):
    # hypothesis falsifying example (seed 251283): with threshold=1 EVERY
    # key is hot, the cold branch is entirely empty, and Ray's hash join
    # used to receive schema-less zero-row left partitions (acero:
    # "No match ... FieldRef.Name(k)"). The histogram now proves
    # cold_rows == 0 and the shuffle branch is skipped outright.
    big = pd.DataFrame({"k": [3, 2, 2, 3], "v": [0, 1, 2, 3]})
    small_keys = [10, 4, 9, 0, 3, 7, 8, 2]
    small = pd.DataFrame(
        {"k": small_keys, "name": [f"n{k}" for k in small_keys]}
    )
    out = (
        relops.skew_join(
            ray_session.data.from_pandas(big),
            ray_session.data.from_pandas(small),
            on="k",
            how=how,
            hot_key_threshold=1,
            num_partitions=4,
            max_hot_keys=10,
        )
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    ref = _ref_merge(big, small, how)
    pd.testing.assert_frame_equal(
        out[["k", "v", "name"]], ref[["k", "v", "name"]], check_dtype=False
    )
