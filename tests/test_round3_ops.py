"""Edge-case tests for the round-3 widening operators: word-explode
boundaries, bigram doc-boundary masking, argmin tie-breaks, sufficient-
statistics correlation, rollup level consistency and lag-gap windows.
The sf0.01 oracle gate checks fixture parity; these pin the semantics the
fixture may not exercise (ties, single-row groups, cross-doc bigrams)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write(tmp_path, name, table: pa.Table) -> str:
    pq.write_table(table, tmp_path / f"{name}.parquet")
    return str(tmp_path)


def test_exploded_words_edges():
    from pdf_toolkit_ray.queries import _exploded_words

    batch = pa.table(
        {
            "doc_id": pa.array([7, 8, 9], pa.int64()),
            "text": pa.array(["x y z", "solo", ""]),
        }
    )
    parent, flat, lengths = _exploded_words(batch)
    # "" splits to [""] — one empty-string token, same as DuckDB string_split
    assert list(lengths) == [3, 1, 1]
    assert list(parent) == [7, 7, 7, 8, 9]
    assert flat.to_pylist() == ["x", "y", "z", "solo", ""]


def test_bigram_repetition_does_not_straddle_docs(ray_session, tmp_path):
    from pdf_toolkit_ray.queries import bigram_repetition_documents

    # doc 1 ends with "b" and doc 2 starts with "b": the bigram "b b"
    # must NOT appear; doc 3 has a duplicate bigram; doc 4 is too short
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(["a b", "b c", "u v u v", "w"]),
        }
    )
    sf = _write(tmp_path, "documents", docs)
    out = (
        bigram_repetition_documents(sf)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(out.index) == [1, 2, 3]  # doc 4 (<2 words) drops out
    assert out.loc[1, "n_bigrams"] == 1 and out.loc[1, "dup_frac"] == 0.0
    assert out.loc[2, "n_bigrams"] == 1
    # doc 3 bigrams: "u v", "v u", "u v" -> 3 total, 2 distinct
    assert out.loc[3, "n_bigrams"] == 3
    assert out.loc[3, "n_distinct"] == 2
    assert out.loc[3, "dup_frac"] == pytest.approx(round(1 / 3, 4))


def test_cheapest_supplier_tie_breaks_by_suppkey(ray_session, tmp_path):
    from pdf_toolkit_ray.queries import cheapest_supplier_per_part

    li = pa.table(
        {
            "l_partkey": pa.array([1, 1, 1, 2, 2], pa.int64()),
            "l_suppkey": pa.array([9, 3, 5, 4, 2], pa.int64()),
            "l_extendedprice": pa.array([10.0, 10.0, 12.0, 7.0, 8.0]),
        }
    )
    sf = _write(tmp_path, "lineitem", li)
    out = (
        cheapest_supplier_per_part(sf)
        .to_pandas()
        .set_index("l_partkey")
        .sort_index()
    )
    # part 1: price tie at 10.0 -> smaller suppkey (3) wins
    assert out.loc[1, "best_suppkey"] == 3 and out.loc[1, "min_price"] == 10.0
    assert out.loc[2, "best_suppkey"] == 4 and out.loc[2, "min_price"] == 7.0


def test_corr_sufficient_stats_matches_numpy(ray_session, tmp_path):
    from pdf_toolkit_ray.queries import corr_qty_price_by_flag

    rng = np.random.default_rng(11)
    n = 400
    qty = rng.integers(1, 50, n).astype(np.float64)
    price = qty * 1000 + rng.integers(0, 5000, n).astype(np.float64)
    li = pa.table(
        {
            "l_returnflag": pa.array(["A"] * (n // 2) + ["B"] * (n // 2)),
            "l_quantity": pa.array(qty),
            "l_extendedprice": pa.array(price),
        }
    )
    sf = _write(tmp_path, "lineitem", li)
    out = corr_qty_price_by_flag(sf).to_pandas().set_index("l_returnflag")
    for flag, sl in (("A", slice(0, n // 2)), ("B", slice(n // 2, n))):
        expect = np.corrcoef(np.round(qty[sl]), np.round(price[sl]))[0, 1]
        assert out.loc[flag, "corr_qty_price"] == pytest.approx(expect, abs=1e-4)
        assert out.loc[flag, "n"] == n // 2


def test_rollup_levels_are_consistent(ray_session, tmp_path):
    from pdf_toolkit_ray.queries import rollup_events_daily

    ev = pa.table(
        {
            "ts": pa.array(
                [np.datetime64("2024-01-01T05:00:00", "us"),
                 np.datetime64("2024-01-01T09:00:00", "us"),
                 np.datetime64("2024-01-02T05:00:00", "us")],
                pa.timestamp("us"),
            ),
            "event_type": pa.array(["click", "click", "view"]),
            "value": pa.array([1.5, 2.25, 4.0]),
        }
    )
    sf = _write(tmp_path, "events", ev)
    out = rollup_events_daily(sf).to_pandas()
    fine = out[(out.event_type != "__all__") & (out.day != "__all__")]
    mid = out[(out.event_type != "__all__") & (out.day == "__all__")]
    total = out[(out.event_type == "__all__") & (out.day == "__all__")]
    assert len(fine) == 2 and len(mid) == 2 and len(total) == 1
    assert total.iloc[0]["n"] == 3 and total.iloc[0]["sum_value"] == 7.75
    assert mid.set_index("event_type").loc["click", "sum_value"] == 3.75
    assert fine["n"].sum() == 3
    assert np.isclose(fine["sum_value"].sum(), 7.75)


def test_order_gap_days(ray_session, tmp_path):
    from pdf_toolkit_ray.queries import order_gap_days_per_customer

    orders = pa.table(
        {
            "o_custkey": pa.array([1, 1, 1, 2], pa.int64()),
            "o_orderkey": pa.array([10, 11, 12, 13], pa.int64()),
            "o_orderdate": pa.array(
                [np.datetime64("2024-01-10", "us"),
                 np.datetime64("2024-01-01", "us"),
                 np.datetime64("2024-01-04", "us"),
                 np.datetime64("2024-06-01", "us")],
                pa.timestamp("us"),
            ),
        }
    )
    sf = _write(tmp_path, "orders", orders)
    out = order_gap_days_per_customer(sf).to_pandas().set_index("o_custkey")
    # customer 1 sorted dates: 1st, 4th, 10th -> gaps 3 and 6 -> avg 4.5
    assert out.loc[1, "n_gaps"] == 2
    assert out.loc[1, "avg_gap_days"] == 4.5
    # customer 2 has a single order -> no gap row
    assert 2 not in out.index
