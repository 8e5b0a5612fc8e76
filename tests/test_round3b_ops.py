"""Edge-case tests for the late-round-3 operators: funnel strict
ordering, inverted-index caps, TF-IDF integer rank keys, redaction
counts, q13 zero-count inclusion, q22 strict-threshold arithmetic, q16
cross-part supplier dedup and histogram bucket edges. The sf0.01 oracle
gate checks fixture parity; these pin semantics the fixture may not
exercise (same-timestamp events, exact-average balances, bucket
boundaries)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write(tmp_path, name, table: pa.Table) -> str:
    pq.write_table(table, tmp_path / f"{name}.parquet")
    return str(tmp_path)


def _ts(*secs):
    return pa.array(np.array(secs, dtype="datetime64[s]").astype("datetime64[us]"))


def test_funnel_strict_ordering(ray_session, tmp_path):
    from pdf_toolkit_ray.queries import funnel_stages_events

    # u1: full funnel; u2: click BEFORE its first view -> stage 1;
    # u3: click at the SAME ts as the view (not strictly after) -> 1;
    # u4: purchase only (no view) -> omitted;
    # u5: purchase at the same ts as the click -> stage 2
    rows = [
        (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),
        (2, 10, "click"), (2, 20, "view"), (2, 30, "purchase"),
        (3, 10, "view"), (3, 10, "click"),
        (4, 10, "purchase"),
        (5, 10, "view"), (5, 20, "click"), (5, 20, "purchase"),
    ]
    events = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": _ts(*[r[1] for r in rows]),
            "event_type": pa.array([r[2] for r in rows]),
        }
    )
    sf = _write(tmp_path, "events", events)
    out = funnel_stages_events(sf).to_pandas().set_index("user_id")["funnel_stage"]
    assert out.to_dict() == {1: 3, 2: 1, 3: 1, 5: 2}


def test_inverted_index_cap_and_df(ray_session, tmp_path):
    from pdf_toolkit_ray.queries import inverted_index_documents

    docs = pa.table(
        {
            "doc_id": pa.array([3, 1, 2], pa.int64()),
            "text": pa.array(["a b", "a", "a a c"]),
        }
    )
    sf = _write(tmp_path, "documents", docs)
    out = (
        inverted_index_documents(sf, cap=2).to_pandas().set_index("word").sort_index()
    )
    # df counts DOCUMENTS (doc 2's repeated "a" counts once); postings
    # are ascending doc_ids truncated at cap
    assert out.loc["a", "df"] == 3 and out.loc["a", "postings"] == "1,2"
    assert out.loc["b", "df"] == 1 and out.loc["b", "postings"] == "3"
    assert out.loc["c", "df"] == 1 and out.loc["c", "postings"] == "2"


def test_tfidf_rank_keys_are_integer_deterministic(ray_session, tmp_path):
    from pdf_toolkit_ray.queries import tfidf_top_terms_documents

    # doc 1 has four distinct words; k=3 must keep (tf desc, df asc,
    # word asc): a and b at tf=2 (a wins the df tie-break but both fit),
    # then c beats d on the word tie-break at tf=1, df=1
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["a a b b c d", "b"]),
        }
    )
    sf = _write(tmp_path, "documents", docs)
    out = tfidf_top_terms_documents(sf).to_pandas()
    d1 = set(out[out["doc_id"] == 1]["word"])
    assert d1 == {"a", "b", "c"}
    # idf sanity: a appears in 1 of 2 docs -> score 2*ln(2)
    a_score = float(out[(out["doc_id"] == 1) & (out["word"] == "a")]["score"].iloc[0])
    assert a_score == round(2 * np.log(2.0), 4)
    # b appears in both docs -> idf 0 -> score 0, but it still ranks by tf
    b_score = float(out[(out["doc_id"] == 1) & (out["word"] == "b")]["score"].iloc[0])
    assert b_score == 0.0


def test_redact_counts_and_boundaries(ray_session, tmp_path):
    from pdf_toolkit_ray.queries import redact_documents

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            # "customers" must NOT match (\b word boundary)
            "text": pa.array(["customer x supplier customer", "customers only"]),
        }
    )
    sf = _write(tmp_path, "documents", docs)
    out = redact_documents(sf).to_pandas().set_index("doc_id")
    assert out.loc[1, "n_hits"] == 3
    assert out.loc[1, "redacted"] == "[X] x [X] [X]"
    assert out.loc[2, "n_hits"] == 0
    assert out.loc[2, "redacted"] == "customers only"


def test_q13_includes_zero_order_customers(ray_session, tmp_path):
    from pdf_toolkit_ray.queries import q13_customer_distribution

    cust = pa.table(
        {
            "c_custkey": pa.array([1, 2, 3], pa.int64()),
        }
    )
    orders = pa.table(
        {
            "o_custkey": pa.array([1, 1, 2], pa.int64()),
        }
    )
    _write(tmp_path, "customer", cust)
    sf = _write(tmp_path, "orders", orders)
    out = q13_customer_distribution(sf).to_pandas().set_index("c_count")["custdist"]
    assert out.to_dict() == {0: 1, 1: 1, 2: 1}


def test_q22_threshold_is_strict_and_exact(ray_session, tmp_path):
    from pdf_toolkit_ray.queries import q22_sales_opportunity

    # positive balances 10, 20, 30 -> avg exactly 20.00; customer 2 sits
    # EXACTLY on the average and must be excluded (strict >). Customer 3
    # is rich with only an old order (kept); customer 4 is rich with a
    # recent order (dropped by the anti-join).
    cust = pa.table(
        {
            "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
            "c_nationkey": pa.array([0, 0, 1, 1], pa.int64()),
            "c_acctbal": pa.array([10.0, 20.0, 30.0, 20.0], pa.float64()),
        }
    )
    # avg over positives of (10,20,30,20) = 20.0; customers 3 (30) only
    orders = pa.table(
        {
            "o_custkey": pa.array([3, 4], pa.int64()),
            "o_orderdate": _ts(0, 32 * 365 * 86400),  # 1970 (old) vs 2002 (recent)
        }
    )
    _write(tmp_path, "customer", cust)
    sf = _write(tmp_path, "orders", orders)
    out = q22_sales_opportunity(sf).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert row["c_nationkey"] == 1 and row["numcust"] == 1
    assert row["totacctbal"] == 30.0


def test_q16_counts_suppliers_once_across_parts(ray_session, tmp_path):
    from pdf_toolkit_ray.queries import q16_parts_supplier_counts

    # parts 1 and 2 share (brand, type, size); supplier 7 serves both ->
    # counted ONCE for the group; brand Brand#13 is excluded
    part = pa.table(
        {
            "p_partkey": pa.array([1, 2, 3], pa.int64()),
            "p_brand": pa.array(["Brand#1", "Brand#1", "Brand#13"]),
            "p_type": pa.array(["T", "T", "T"]),
            "p_size": pa.array([5, 5, 5], pa.int64()),
        }
    )
    li = pa.table(
        {
            "l_partkey": pa.array([1, 1, 2, 2, 3], pa.int64()),
            "l_suppkey": pa.array([7, 8, 7, 7, 9], pa.int64()),
        }
    )
    _write(tmp_path, "part", part)
    sf = _write(tmp_path, "lineitem", li)
    out = q16_parts_supplier_counts(sf).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["supplier_cnt"] == 2  # suppliers {7, 8}


def test_price_histogram_bucket_edges(ray_session, tmp_path):
    from pdf_toolkit_ray.queries import price_histogram_lineitem

    li = pa.table(
        {
            "l_extendedprice": pa.array([9999.99, 10000.00, 10000.01, 0.01]),
        }
    )
    sf = _write(tmp_path, "lineitem", li)
    out = price_histogram_lineitem(sf).to_pandas().set_index("bucket")
    assert out.loc[0, "n"] == 2 and out.loc[0, "total"] == 10000.00
    assert out.loc[1, "n"] == 2 and out.loc[1, "total"] == 20000.01


def test_bucketed_groupby_matches_plain_groupby(ray_session):
    import pyarrow.compute as pc
    import ray

    from pdf_toolkit_ray import relops

    rng = np.random.default_rng(7)
    keys = rng.integers(0, 997, size=20_000)
    vals = rng.integers(0, 1000, size=20_000)
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(keys, pa.int64()), "v": pa.array(vals, pa.int64())})
    ).repartition(13)

    def per_group(t: pa.Table) -> pa.Table:
        g = t.group_by(["k"]).aggregate([("v", "sum")])
        return pa.table({"k": g.column("k"), "s": pc.cast(g.column("v_sum"), pa.int64())})

    got = (
        relops.bucketed_groupby(ds, ["k"], per_group, num_buckets=17)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    import pandas as pd

    want = (
        pd.DataFrame({"k": keys, "v": vals})
        .groupby("k")["v"].sum().rename("s").reset_index().astype(np.int64)
    )
    pd.testing.assert_frame_equal(got, want)


def test_unigram_xent_smoothing(ray_session, tmp_path):
    from pdf_toolkit_ray.queries import unigram_xent_documents

    # corpus: "a a b" + "a" -> counts a:3, b:1; T=4, V=2
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["a a b", "a"]),
        }
    )
    sf = _write(tmp_path, "documents", docs)
    out = unigram_xent_documents(sf).to_pandas().set_index("doc_id")["xent"]
    pa_ = (3 + 1) / (4 + 2)
    pb = (1 + 1) / (4 + 2)
    want1 = round(-(2 * np.log(pa_) + np.log(pb)) / 3, 4)
    want2 = round(-np.log(pa_), 4)
    assert out.loc[1] == want1
    assert out.loc[2] == want2
