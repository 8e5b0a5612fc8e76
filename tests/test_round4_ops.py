"""Engineered goldens for the round-4 session-8 ops: cohort retention,
CDC upsert merge, and tool association rules."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from pdf_toolkit_ray import queries

D0 = np.datetime64("2026-03-01T08:15:00", "us")
DAY = np.timedelta64(1, "D").astype("timedelta64[us]")


def _write_events(tmp_path, rows):
    """rows: (user_id, ts)."""
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array(["click"] * len(rows), pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    return str(tmp_path)


def test_cohort_retention_engineered(ray_session, tmp_path):
    # u1: days 0,1,3 (two events day 0 — same-day dup must not double
    # count); u2: day 0 only; u3: days 1,2 (later cohort)
    rows = [
        (1, D0), (1, D0 + np.timedelta64(3, "h")), (1, D0 + DAY), (1, D0 + 3 * DAY),
        (2, D0),
        (3, D0 + DAY), (3, D0 + 2 * DAY),
    ]
    got = {
        (str(r["cohort_day"]), r["offset_days"]): r["n_users"]
        for r in queries.cohort_retention_events(_write_events(tmp_path, rows)).to_pylist()
    }
    d0 = "2026-03-01 00:00:00"
    d1 = "2026-03-02 00:00:00"
    assert got == {
        (d0, 0): 2, (d0, 1): 1, (d0, 3): 1,
        (d1, 0): 1, (d1, 1): 1,
    }


def _write_orders(tmp_path, rows):
    """rows: (o_orderkey, o_custkey, o_orderstatus, o_totalprice)."""
    tbl = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
            "o_orderstatus": pa.array([r[2] for r in rows], pa.string()),
            "o_totalprice": pa.array([r[3] for r in rows], pa.float64()),
        }
    )
    pq.write_table(tbl, tmp_path / "orders.parquet")
    return str(tmp_path)


def test_merge_upsert_engineered(ray_session, tmp_path):
    rows = [
        (97, 1, "O", 100.10),    # base only, in slice
        (679, 2, "F", 200.20),   # 7*97: updated, update wins in slice
        (1066, 3, "O", 300.30),  # %13: insert keyed -1067 = -11*97, in slice
        (91, 4, "O", 400.40),    # 7*13 but not %97: nothing lands in slice
        (0, 5, "P", 500.50),     # k=0 is BOTH %7 and %13: the update owns
                                 # key 0, the insert goes to -1 — no collision
    ]
    got = {
        r["o_orderkey"]: r
        for r in queries.merge_upsert_orders(_write_orders(tmp_path, rows)).to_pylist()
    }
    assert set(got) == {-1067, 0, 97, 679}
    assert got[97] == {
        "o_orderkey": 97, "o_custkey": 1, "status": "O",
        "price_c": 10010, "src_ver": 0,
    }
    # last-writer-wins: the ver=1 update replaces the base row
    assert got[679] == {
        "o_orderkey": 679, "o_custkey": 2, "status": "U",
        "price_c": 20020 + 100055, "src_ver": 1,
    }
    assert got[-1067] == {
        "o_orderkey": -1067, "o_custkey": 3, "status": "N",
        "price_c": 30030, "src_ver": 1,
    }
    assert got[0] == {
        "o_orderkey": 0, "o_custkey": 5, "status": "U",
        "price_c": 50050 + 100055, "src_ver": 1,
    }


def _pin_transcripts(monkeypatch, tmp_path, rows):
    """rows: (conv_id, tool) — one tool-role turn each."""
    base = np.datetime64("2026-01-01T00:00:00", "us")
    tbl = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array(range(len(rows)), pa.int32()),
            "role": pa.array(
                ["tool" if r[1] else "user" for r in rows], pa.string()
            ),
            "text": pa.array(["x"] * len(rows), pa.string()),
            "tool": pa.array([r[1] for r in rows], pa.string()),
            "ts": pa.array(
                [base + np.timedelta64(i, "s") for i in range(len(rows))],
                pa.timestamp("us"),
            ),
        }
    )
    p = tmp_path / "t.parquet"
    pq.write_table(tbl, p)
    monkeypatch.setattr(queries, "_transcripts_path", lambda sf: str(p))


def test_tool_assoc_rules_engineered(ray_session, tmp_path, monkeypatch):
    rows = [
        ("c1", "search"), ("c1", "python"), ("c1", "search"),  # dup must collapse
        ("c2", "search"), ("c2", ""),                          # '' is not a tool
        ("c3", "search"), ("c3", "python"), ("c3", "browser"),
    ]
    _pin_transcripts(monkeypatch, tmp_path, rows)
    got = {
        (r["tool_a"], r["tool_b"]): r
        for r in queries.tool_assoc_rules_transcripts("x").to_pylist()
    }
    # N=3 convs; singles: search 3, python 2, browser 1
    assert set(got) == {
        ("python", "search"), ("search", "python"),
        ("browser", "python"), ("python", "browser"),
        ("browser", "search"), ("search", "browser"),
    }
    r = got[("python", "search")]
    assert (r["n_ab"], r["n_a"], r["n_b"]) == (2, 2, 3)
    assert r["support"] == 2.0 / 3.0
    assert r["confidence"] == 1.0
    assert r["lift"] == (2.0 * 3.0) / (2.0 * 3.0)
    r = got[("search", "browser")]
    assert (r["n_ab"], r["n_a"], r["n_b"]) == (1, 3, 1)
    assert r["confidence"] == 1.0 / 3.0
    assert r["lift"] == (1.0 * 3.0) / (3.0 * 1.0)


def _write_tpch_mini(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([1, 1, 2, 2, 9], pa.int64()),
                "l_linenumber": pa.array([1, 1, 1, 2, 1], pa.int64()),
                "l_quantity": pa.array([5.0, 0.0, 3.0, 2.0, 1.0], pa.float64()),
                "l_extendedprice": pa.array(
                    [10.0, 20.0, -1.0, 30.0, 40.0], pa.float64()
                ),
            }
        ),
        tmp_path / "lineitem.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3], pa.int64()),
                "o_custkey": pa.array([10, 10, 99], pa.int64()),
            }
        ),
        tmp_path / "orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([10, 11], pa.int64()),
                "c_nationkey": pa.array([0, 7], pa.int64()),
            }
        ),
        tmp_path / "customer.parquet",
    )
    pq.write_table(
        pa.table({"n_nationkey": pa.array([0, 1, 2], pa.int64())}),
        tmp_path / "nation.parquet",
    )
    return str(tmp_path)


def test_dq_audit_engineered(ray_session, tmp_path):
    got = {
        r["check_name"]: (r["n_bad"], r["n_checked"])
        for r in queries.dq_audit_tpch(_write_tpch_mini(tmp_path)).to_pylist()
    }
    assert got == {
        # c_nationkey 7 has no nation row
        "customer_bad_nationkey": (1, 2),
        # (1,1) appears twice -> one surplus row
        "lineitem_dup_line": (1, 5),
        # price -1.0
        "lineitem_nonpos_price": (1, 5),
        # quantity 0.0
        "lineitem_nonpos_qty": (1, 5),
        # l_orderkey 9 has no order
        "lineitem_orphan_orderkey": (1, 5),
        # o_custkey 99 has no customer
        "orders_orphan_custkey": (1, 3),
    }


def test_bigram_xent_engineered(ray_session, tmp_path):
    # corpus: d1 = "a b a", d2 = "b a"
    # cb: (a,b)=1, (b,a)=2 ; cu: a=1, b=2 ; V=2
    # p(b|a)=(1+1)/(1+2)=2/3 ; p(a|b)=(2+1)/(2+2)=3/4
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["a b a", "b a"], pa.string()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    import math

    q_ab = round(math.log(2.0 / 3.0) * 1e6)   # -405465
    q_ba = round(math.log(3.0 / 4.0) * 1e6)   # -287682
    got = {
        int(r["doc_id"]): r
        for _, r in queries.bigram_xent_documents(str(tmp_path))
        .to_pandas().iterrows()
    }
    assert got[1]["n_bigrams"] == 2
    assert got[1]["xent"] == -(((q_ab + q_ba) / 1e6) / 2)
    assert got[2]["n_bigrams"] == 1
    assert got[2]["xent"] == -((q_ba / 1e6) / 1)


def test_analyze_stats_engineered(ray_session, tmp_path):
    base = np.datetime64("2026-03-01T00:00:00", "us")
    tbl = pa.table(
        {
            "l_orderkey": pa.array([1, 1, 2, None], pa.int64()),
            "l_partkey": pa.array([10, 20, 10, 30], pa.int64()),
            "l_suppkey": pa.array([5, 5, 5, 5], pa.int64()),
            "l_quantity": pa.array([1.0, 2.0, 2.0, None], pa.float64()),
            "l_extendedprice": pa.array([9.5, 8.5, 7.5, 6.5], pa.float64()),
            "l_discount": pa.array([0.0, 0.1, 0.0, 0.1], pa.float64()),
            "l_tax": pa.array([0.02, 0.02, 0.02, 0.02], pa.float64()),
            "l_returnflag": pa.array(["A", "R", "A", "N"], pa.string()),
            "l_linestatus": pa.array(["O", "O", "F", "F"], pa.string()),
            "l_shipdate": pa.array(
                [base, base + np.timedelta64(1, "D"), base, base], pa.timestamp("us")
            ),
        }
    )
    pq.write_table(tbl, tmp_path / "lineitem.parquet")
    got = {
        r["col"]: r
        for r in queries.analyze_stats_lineitem(str(tmp_path)).to_pylist()
    }
    # NULLs: excluded from ndv/min/max, counted in n_null
    assert got["l_orderkey"] == {
        "col": "l_orderkey", "n": 4, "n_null": 1, "ndv": 2,
        "min_val": 1.0, "max_val": 2.0,
    }
    assert got["l_quantity"]["ndv"] == 2 and got["l_quantity"]["n_null"] == 1
    assert got["l_returnflag"] == {
        "col": "l_returnflag", "n": 4, "n_null": 0, "ndv": 3,
        "min_val": -1.0, "max_val": -1.0,
    }
    ep0 = float(np.datetime64("2026-03-01T00:00:00", "us").astype(np.int64))
    assert got["l_shipdate"]["ndv"] == 2
    assert got["l_shipdate"]["min_val"] == ep0


def test_zorder_layout_engineered(ray_session, tmp_path):
    n = 1200
    pk = (np.arange(n, dtype=np.int64) * 13) % 101
    sk = (np.arange(n, dtype=np.int64) * 7) % 53
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(np.arange(n, dtype=np.int64)),
                "l_linenumber": pa.array(np.ones(n, dtype=np.int64)),
                "l_partkey": pa.array(pk),
                "l_suppkey": pa.array(sk),
            }
        ),
        tmp_path / "lineitem.parquet",
    )
    z = np.zeros(n, np.int64)
    for i in range(16):
        z |= ((pk >> i) & 1) << (2 * i + 1)
        z |= ((sk >> i) & 1) << (2 * i)
    order = np.lexsort((np.ones(n), np.arange(n), sk, pk, z))
    got = queries.zorder_layout_lineitem(str(tmp_path)).to_pylist()
    assert [r["rnk"] for r in got] == [499, 998]
    for r in got:
        j = order[r["rnk"] - 1]
        assert (r["zval"], r["l_partkey"], r["l_suppkey"]) == (
            int(z[j]), int(pk[j]), int(sk[j])
        )
    # Morton interleave spot check: pk=3, sk=1 -> 0b1011
    zz = np.int64(0)
    for i in range(16):
        zz |= ((np.int64(3) >> i) & 1) << (2 * i + 1)
        zz |= ((np.int64(1) >> i) & 1) << (2 * i)
    assert zz == 0b1011


def test_cusum_changepoint_engineered(ray_session, tmp_path):
    # type x: daily counts [1,1,5,5] -> scaled terms 4c-12 = [-8,-8,8,8],
    # cusum [-8,-16,-8,0] -> peak |.| at day 1 with value -16
    rows = []
    for day, n in enumerate([1, 1, 5, 5]):
        rows += [(7, D0 + day * DAY)] * n
    got = queries.cusum_changepoint_events(
        _write_events(tmp_path, rows)
    ).to_pylist()
    assert len(got) == 1
    r = got[0]
    assert r["event_type"] == "click"
    assert str(r["cp_day"]) == "2026-03-02 00:00:00"
    assert r["cusum_scaled"] == -16
    assert r["n_days"] == 4


def test_bfs_hops_engineered(ray_session, tmp_path):
    # path graph 1-2-3-4-5-6-7 via chained orders; {8,9} is a separate
    # component (unreachable); hop cap 4 excludes parts 6 and 7
    orders = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7), (8, 9)]
    ok, pk = [], []
    for i, (a, b) in enumerate(orders):
        ok += [i, i]
        pk += [a, b]
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(ok, pa.int64()),
                "l_partkey": pa.array(pk, pa.int64()),
            }
        ),
        tmp_path / "lineitem.parquet",
    )
    got = {
        r["partkey"]: r["hop"]
        for r in queries.bfs_hops_parts(str(tmp_path)).to_pylist()
    }
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}


def test_funnel_engineered(ray_session, tmp_path):
    # u1 completes view->click->purchase; u2 clicks BEFORE viewing (click
    # must not count — strict ordering); u3 views only; u4 purchases
    # before clicking (step3 requires t2 first).
    H = np.timedelta64(1, "h").astype("timedelta64[us]")
    rows = [
        (1, "view", D0), (1, "click", D0 + H), (1, "purchase", D0 + 3 * H),
        (2, "click", D0), (2, "view", D0 + H), (2, "purchase", D0 + 2 * H),
        (3, "view", D0),
        (4, "view", D0), (4, "purchase", D0 + H), (4, "click", D0 + 2 * H),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    got = queries.funnel_events(str(tmp_path)).to_pylist()[0]
    us = 3_600_000_000
    assert got == {
        "n_step1": 4,          # u1..u4 all view
        "n_step2": 2,          # u1 (click after view), u4 (click at +2h)
        "n_step3": 1,          # only u1 purchases after a valid click
        "sum_us_12": 1 * us + 2 * us,
        "sum_us_13": 3 * us,
    }


def test_corpus_divergence_engineered(ray_session, tmp_path):
    # A (even ids) favors "alpha", B (odd ids) favors "beta"; "gamma" is
    # B-only so add-one smoothing must cover the union vocab on both sides.
    docs = [
        (0, "alpha alpha beta"),
        (2, "alpha alpha"),
        (1, "beta beta alpha"),
        (3, "beta gamma"),
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], pa.int64()),
            "text": pa.array([t for _, t in docs], pa.string()),
            "lang": pa.array(["en"] * len(docs), pa.string()),
            "source": pa.array(["x"] * len(docs), pa.string()),
            "n_chars": pa.array([len(t) for _, t in docs], pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    got = queries.corpus_divergence_documents(str(tmp_path)).to_pylist()[0]

    import math
    from collections import Counter

    ca = Counter("alpha alpha beta alpha alpha".split())
    cb = Counter("beta beta alpha beta gamma".split())
    vocab = set(ca) | set(cb)
    v, ta, tb = len(vocab), sum(ca.values()), sum(cb.values())
    assert (got["vocab"], got["total_a"], got["total_b"]) == (v, ta, tb)

    def kl(cx, tx, cy, ty):
        return sum(
            (cx[w] + 1) / (tx + v) * math.log(
                ((cx[w] + 1) * (ty + v)) / ((cy[w] + 1) * (tx + v))
            )
            for w in vocab
        )

    assert abs(got["kl_ab"] - kl(ca, ta, cb, tb)) < 1e-5
    assert abs(got["kl_ba"] - kl(cb, tb, ca, ta)) < 1e-5
    assert got["kl_ab"] > 0 and got["kl_ba"] > 0


def test_running_balance_engineered(ray_session, tmp_path):
    # u1: three events with a ts TIE broken by event_id; u2: single
    # event; negative values exercise signed cents.
    H = np.timedelta64(1, "h").astype("timedelta64[us]")
    rows = [  # (event_id, user_id, ts, value)
        (10, 1, D0, 1.25),
        (11, 1, D0 + H, -0.75),
        (12, 1, D0 + H, 2.00),   # same ts as 11 -> ordered after by id
        (20, 2, D0, 0.10),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array(["click"] * len(rows), pa.string()),
            "value": pa.array([r[3] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    got = {
        r["event_id"]: (r["running_cents"], r["running"])
        for r in queries.running_balance_events(str(tmp_path))
        .to_pandas().to_dict("records")
    }
    assert got == {
        10: (125, 1.25),
        11: (50, 0.50),
        12: (250, 2.50),
        20: (10, 0.10),
    }


def test_incremental_mv_engineered(ray_session, tmp_path):
    # k=0 is both updated (0%7==0) and spawns insert -1 (0%13==0);
    # k=7 updated only; k=13 insert only; k=5 untouched. Two days.
    rows = [  # (o_orderkey, day_offset, totalprice)
        (0, 0, 10.00),
        (7, 0, 20.00),
        (13, 1, 30.00),
        (5, 1, 40.00),
    ]
    tbl = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_custkey": pa.array([1] * len(rows), pa.int64()),
            "o_orderstatus": pa.array(["O"] * len(rows), pa.string()),
            "o_totalprice": pa.array([r[2] for r in rows], pa.float64()),
            "o_orderdate": pa.array(
                [D0 + r[1] * DAY for r in rows], pa.timestamp("us")
            ),
            "o_orderpriority": pa.array(["1"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "orders.parquet")
    got = {
        str(np.datetime64(r["order_day"], "D")): (r["n_orders"], r["sum_cents"])
        for r in queries.incremental_mv_orders(str(tmp_path))
        .to_pandas().to_dict("records")
    }
    # day0: k=0 (updated -> 100000+0=100000c), k=7 (updated -> 100007c),
    #       insert -1 from k=0 (+1000c)  => n=3, sum=201007
    # day1: k=13 (30.00), k=5 (40.00), insert -14 from k=13 (+3000c)
    #       => n=3, sum=10000
    assert got == {
        "2026-03-01": (3, 100000 + 100007 + 1000),
        "2026-03-02": (3, 3000 + 4000 + 3000),
    }


def test_pivot_users_engineered(ray_session, tmp_path):
    rows = [  # (user, type) — includes an unknown type to be ignored
        (1, "click"), (1, "click"), (1, "view"), (1, "mystery"),
        (2, "error"),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([D0] * len(rows), pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    got = {
        r["user_id"]: (r["n_click"], r["n_error"], r["n_view"], r["n_total"])
        for r in queries.pivot_users_events(str(tmp_path))
        .to_pandas().to_dict("records")
    }
    assert got == {1: (2, 0, 1, 3), 2: (0, 1, 0, 1)}


def test_grouped_median_engineered(ray_session, tmp_path):
    # flag A: qties [1,2,3,4] -> n=4, median rank ceil(4/2)=2 -> 2,
    # p90 rank ceil(3.6)=4 -> 4; flag B: [5,5,7] -> median rank 2 -> 5,
    # p90 rank ceil(2.7)=3 -> 7
    q = [("A", 1.0), ("A", 2.0), ("A", 3.0), ("A", 4.0),
         ("B", 5.0), ("B", 5.0), ("B", 7.0)]
    tbl = pa.table(
        {
            "l_orderkey": pa.array(range(len(q)), pa.int64()),
            "l_partkey": pa.array([1] * len(q), pa.int64()),
            "l_suppkey": pa.array([1] * len(q), pa.int64()),
            "l_linenumber": pa.array([1] * len(q), pa.int32()),
            "l_quantity": pa.array([x[1] for x in q], pa.float64()),
            "l_extendedprice": pa.array([1.0] * len(q), pa.float64()),
            "l_discount": pa.array([0.0] * len(q), pa.float64()),
            "l_tax": pa.array([0.0] * len(q), pa.float64()),
            "l_returnflag": pa.array([x[0] for x in q], pa.string()),
            "l_linestatus": pa.array(["O"] * len(q), pa.string()),
            "l_shipdate": pa.array([D0] * len(q), pa.timestamp("us")),
        }
    )
    pq.write_table(tbl, tmp_path / "lineitem.parquet")
    got = {
        r["l_returnflag"]: (r["n"], r["median_qty"], r["p90_qty"])
        for r in queries.grouped_median_lineitem(str(tmp_path))
        .to_pylist()
    }
    assert got == {"A": (4, 2.0, 4.0), "B": (3, 5.0, 7.0)}


def test_concat_orders_engineered(ray_session, tmp_path):
    rows = [(1, 30), (1, 10), (1, 20), (2, 5)]  # (cust, orderkey) unsorted
    tbl = pa.table(
        {
            "o_orderkey": pa.array([r[1] for r in rows], pa.int64()),
            "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_orderstatus": pa.array(["O"] * len(rows), pa.string()),
            "o_totalprice": pa.array([1.0] * len(rows), pa.float64()),
            "o_orderdate": pa.array([D0] * len(rows), pa.timestamp("us")),
            "o_orderpriority": pa.array(["1"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "orders.parquet")
    got = {
        r["o_custkey"]: (r["n_orders"], r["order_keys"])
        for r in queries.concat_orders_customer(str(tmp_path))
        .to_pandas().to_dict("records")
    }
    assert got == {1: (3, "10,20,30"), 2: (1, "5")}


def test_histogram_value_engineered(ray_session, tmp_path):
    # values 0.00..0.15 cents 0..15, r=16, 16 bins -> one per cent, plus
    # a fat bin at the max
    vals = [i / 100.0 for i in range(16)] + [0.15, 0.15]
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(vals)), pa.int64()),
            "ts": pa.array([D0] * len(vals), pa.timestamp("us")),
            "user_id": pa.array([1] * len(vals), pa.int64()),
            "event_type": pa.array(["click"] * len(vals), pa.string()),
            "value": pa.array(vals, pa.float64()),
            "props": pa.array(["{}"] * len(vals), pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    rows = queries.histogram_value_events(str(tmp_path)).to_pylist()
    assert len(rows) == 16
    for r in rows:
        assert r["lo_cents"] == r["hi_cents"] == r["bin"]  # width-1 bins
    assert {r["bin"]: r["n_events"] for r in rows}[15] == 3


def test_jsonl_source_roundtrip_engineered(ray_session, tmp_path):
    # adversarial doubles: repr-round-trip values that are NOT exact
    # binary fractions, plus µs-precision timestamps
    vals = [0.1, 123.45, -9.99]
    us = np.timedelta64(1, "us").astype("timedelta64[us]")
    tbl = pa.table(
        {
            "event_id": pa.array(range(3), pa.int64()),
            "ts": pa.array([D0, D0 + us, D0 + 2 * us], pa.timestamp("us")),
            "user_id": pa.array([1, 1, 2], pa.int64()),
            "event_type": pa.array(["a", "a", "b"], pa.string()),
            "value": pa.array(vals, pa.float64()),
            "props": pa.array(["{}"] * 3, pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    got = {
        r["event_type"]: (r["n"], r["sum_cents"], r["max_ts_us"] - r["min_ts_us"])
        for r in queries.jsonl_source_events(str(tmp_path)).to_pylist()
    }
    assert got == {"a": (2, 10 + 12345, 1), "b": (1, -999, 0)}


def test_rolling_7d_engineered(ray_session, tmp_path):
    # u1: events at day 0, 3, 7, 7 (tie), 8 — the 7-day frame is
    # boundary-INCLUSIVE and equal-ts peers see each other's rows
    rows = [  # (event_id, user, day_offset, value)
        (0, 1, 0, 1.00),
        (1, 1, 3, 2.00),
        (2, 1, 7, 4.00),
        (3, 1, 7, 8.00),
        (4, 1, 8, 16.00),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([D0 + r[2] * DAY for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array(["click"] * len(rows), pa.string()),
            "value": pa.array([r[3] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    got = {
        r["event_id"]: (r["n7"], r["sum7_cents"])
        for r in queries.rolling_7d_user_events(str(tmp_path))
        .to_pandas().to_dict("records")
    }
    assert got == {
        0: (1, 100),
        1: (2, 300),
        2: (4, 1500),          # day0 still inside (inclusive boundary)
        3: (4, 1500),          # tie peer sees identical frame
        4: (4, 3000),          # day0 dropped, day3+7+7+8
    }


def test_range_join_engineered(ray_session, tmp_path):
    # span exactly 8 units -> interval i = [i, i+2): event at t=1 falls
    # in intervals 0 and 1 (overlap); t=7 only in 6 (half-open ends)
    us = np.timedelta64(1, "us").astype("timedelta64[us]")
    offs = [0, 1, 7]
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(offs)), pa.int64()),
            "ts": pa.array([D0 + o * us for o in offs], pa.timestamp("us")),
            "user_id": pa.array([1] * len(offs), pa.int64()),
            "event_type": pa.array(["click"] * len(offs), pa.string()),
            "value": pa.array([1.0] * len(offs), pa.float64()),
            "props": pa.array(["{}"] * len(offs), pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    got = {
        r["interval_id"]: r["n_events"]
        for r in queries.range_join_events(str(tmp_path)).to_pylist()
    }
    assert got == {0: 2, 1: 1, 2: 0, 3: 0, 4: 0, 5: 0, 6: 1}


def test_winsorized_stats_engineered(ray_session, tmp_path):
    # 100 values 1.00..100.00: p01 rank ceil(100/100)=1 -> 1.00,
    # p99 rank ceil(9900/100)=99 -> 99.00; only the 100.00 row clips
    vals = [float(i) for i in range(1, 101)]
    tbl = pa.table(
        {
            "l_orderkey": pa.array(range(len(vals)), pa.int64()),
            "l_partkey": pa.array([1] * len(vals), pa.int64()),
            "l_suppkey": pa.array([1] * len(vals), pa.int64()),
            "l_linenumber": pa.array([1] * len(vals), pa.int32()),
            "l_quantity": pa.array([1.0] * len(vals), pa.float64()),
            "l_extendedprice": pa.array(vals, pa.float64()),
            "l_discount": pa.array([0.0] * len(vals), pa.float64()),
            "l_tax": pa.array([0.0] * len(vals), pa.float64()),
            "l_returnflag": pa.array(["A"] * len(vals), pa.string()),
            "l_linestatus": pa.array(["O"] * len(vals), pa.string()),
            "l_shipdate": pa.array([D0] * len(vals), pa.timestamp("us")),
        }
    )
    pq.write_table(tbl, tmp_path / "lineitem.parquet")
    r = queries.winsorized_stats_lineitem(str(tmp_path)).to_pylist()[0]
    assert (r["n"], r["p01_cents"], r["p99_cents"]) == (100, 100, 9900)
    assert (r["n_clipped_lo"], r["n_clipped_hi"]) == (0, 1)
    # sum 1..100 = 5050.00 -> clip 100.00 down to 99.00 => 5049.00
    assert r["winsorized_sum_cents"] == 504900
    assert r["winsorized_mean"] == 5049.0 / 100


def test_first_touch_attribution_engineered(ray_session, tmp_path):
    H = np.timedelta64(1, "h").astype("timedelta64[us]")
    rows = [  # (event_id, user, type, ts)
        # u1: view then click then purchase -> first-touch = view
        (0, 1, "view", D0), (1, 1, "click", D0 + H), (2, 1, "purchase", D0 + 2 * H),
        # u2: candidate OUTSIDE the 3-day window -> (none)
        (3, 2, "view", D0), (4, 2, "purchase", D0 + 4 * DAY),
        # u3: candidate exactly at ts-3d (inclusive) and a click at the
        # purchase instant (strict end -> excluded)
        (5, 3, "click", D0), (6, 3, "click", D0 + 3 * DAY),
        (7, 3, "purchase", D0 + 3 * DAY),
        # u4: ts tie between two candidates -> smaller event_id (view) wins
        (8, 4, "click", D0), (9, 4, "purchase", D0 + H),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    got = {
        r["attributed_type"]: r["n_purchases"]
        for r in queries.first_touch_attribution_events(str(tmp_path)).to_pylist()
    }
    assert got == {"view": 1, "(none)": 1, "click": 2}


def test_describe_partials_handle_nulls(ray_session, tmp_path):
    """describe over a null-bearing table: nulls counted per column,
    min/max/sums ignore them (matching SQL COUNT/MIN/MAX semantics)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    import pdf_toolkit_ray.queries as q

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(["aa", None, "cccc", ""], pa.string()),
            "lang": pa.array(["en", "de", None, "en"], pa.string()),
            "source": pa.array([None, None, "web", "web"], pa.string()),
            "n_chars": pa.array([2, 0, 4, 0], pa.int64()),
        }
    )
    sf = tmp_path / "sfnull"
    sf.mkdir()
    pq.write_table(tbl, str(sf / "documents.parquet"))
    got = (
        q.describe_documents(str(sf))
        .to_pandas()
        .sort_values("col")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = (
        con.execute(q.DESCRIBE_DOCUMENTS_SQL).df().sort_values("col").reset_index(drop=True)
    )
    for c in want.columns:
        assert (got[c] == want[c]).all(), c
    assert got.set_index("col").loc["source", "n_null"] == 2


def test_describe_fully_null_column(ray_session, tmp_path):
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    import pdf_toolkit_ray.queries as q

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["x", "yy"], pa.string()),
            "lang": pa.array([None, None], pa.string()),
            "source": pa.array(["w", "w"], pa.string()),
            "n_chars": pa.array([1, 2], pa.int64()),
        }
    )
    sf = tmp_path / "sfnull2"
    sf.mkdir()
    pq.write_table(tbl, str(sf / "documents.parquet"))
    got = q.describe_documents(str(sf)).to_pandas().sort_values("col").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')")
    want = con.execute(q.DESCRIBE_DOCUMENTS_SQL).df().sort_values("col").reset_index(drop=True)
    for c in want.columns:
        assert (got[c] == want[c]).all(), c
