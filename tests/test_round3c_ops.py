"""Edge-case tests for the round-3 third-batch operators: q19 disjunctive
clause boundaries, q20 strict-threshold + prefix semantics, q21
sole-returner qualification rules, cross-doc shingle-dup fractions,
mixture-sample quotas and gopher rule flags. The sf0.01 oracle gate
checks fixture parity; these pin semantics on crafted micro-tables the
fixture may not exercise (clause edges, single-supplier orders,
absent-language mixtures)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write_tables(tmp_path, **tables) -> str:
    for name, tbl in tables.items():
        pq.write_table(tbl, tmp_path / f"{name}.parquet")
    return str(tmp_path)


def _run_sql(sf_dir: str, sql: str, tables=("documents",)) -> pd.DataFrame:
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.execute(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _assert_matches_sql(ray_out, sf_dir, sql, tables):
    got = ray_out.to_pandas() if not isinstance(ray_out, pd.DataFrame) else ray_out
    want = _run_sql(sf_dir, sql, tables)
    pd.testing.assert_frame_equal(
        _canon(got), _canon(want), check_dtype=False, atol=1e-9
    )


def test_q19_clause_boundaries(ray_session, tmp_path):
    """Quantity/size boundaries are INCLUSIVE per clause and a row must
    satisfy one clause IN FULL — brand from one clause with the quantity
    of another contributes nothing."""
    from pdf_toolkit_ray.queries import Q19_SQL, q19_disjunctive_revenue

    part = pa.table(
        {
            "p_partkey": pa.array([1, 2, 3, 4], pa.int64()),
            "p_brand": ["Brand#1", "Brand#2", "Brand#3", "Brand#1"],
            "p_size": pa.array([5, 10, 15, 6], pa.int32()),  # 4: size just over clause-1
            "p_name": ["a", "b", "c", "d"],
        }
    )
    li = pa.table(
        {
            "l_partkey": pa.array([1, 1, 2, 3, 4, 2], pa.int64()),
            # rows: qty 11 (edge in), 12 (out for clause 1), 10 (edge in,
            # clause 2), 30 (edge in, clause 3), 5 (part 4 size 6 -> no
            # clause), 25 (brand#2 but qty in clause-3 band -> out)
            "l_quantity": pa.array([11.0, 12.0, 10.0, 30.0, 5.0, 25.0]),
            "l_extendedprice": pa.array([100.0, 100.0, 200.0, 300.0, 50.0, 70.0]),
            "l_discount": pa.array([0.0, 0.0, 0.1, 0.0, 0.0, 0.0]),
        }
    )
    sf = _write_tables(tmp_path, part=part, lineitem=li)
    out = q19_disjunctive_revenue(sf)
    assert out.to_pandas()["revenue"][0] == 100.0 + 180.0 + 300.0
    _assert_matches_sql(out, sf, Q19_SQL, ("part", "lineitem"))


def test_q20_strict_threshold_and_prefix(ray_session, tmp_path):
    """Pair sums EQUAL to 2.5x the mean pair-sum are excluded (strict >),
    only 'red'-prefixed parts participate, and an all-excluded corpus
    returns a TYPED empty table (regression: empty Ray datasets lose
    their schema)."""
    from pdf_toolkit_ray.queries import Q20_SQL, q20_potential_promotion

    part = pa.table(
        {
            "p_partkey": pa.array([1, 2, 3], pa.int64()),
            "p_name": ["red widget", "red bolt", "blue widget"],
        }
    )
    supplier = pa.table(
        {
            "s_suppkey": pa.array([1, 2], pa.int64()),
            "s_name": ["Supp1", "Supp2"],
        }
    )
    # red pair sums (10, 10, 100): mean 40, thr exactly 100 -> s2's 100 is
    # NOT > thr: nobody qualifies. Blue part rows are noise.
    li = pa.table(
        {
            "l_partkey": pa.array([1, 2, 1, 3, 3], pa.int64()),
            "l_suppkey": pa.array([1, 1, 2, 1, 2], pa.int64()),
            "l_quantity": pa.array([10.0, 10.0, 100.0, 99.0, 99.0]),
        }
    )
    sf = _write_tables(tmp_path, part=part, lineitem=li, supplier=supplier)
    out = q20_potential_promotion(sf)
    assert out.num_rows == 0
    assert out.schema.names == ["s_suppkey", "s_name"]
    _assert_matches_sql(out, sf, Q20_SQL, ("part", "lineitem", "supplier"))

    # bump s2's pair to 101: total 121, thr 100.8333 -> s2 qualifies
    li2 = li.set_column(
        2, "l_quantity", pa.array([10.0, 10.0, 101.0, 99.0, 99.0])
    )
    (tmp_path / "b").mkdir()
    sf2 = _write_tables(tmp_path / "b", part=part, lineitem=li2, supplier=supplier)
    out2 = q20_potential_promotion(sf2).to_pandas()
    assert list(out2["s_suppkey"]) == [2]
    _assert_matches_sql(
        q20_potential_promotion(sf2), sf2, Q20_SQL, ("part", "lineitem", "supplier")
    )


def test_q21_sole_returner_rules(ray_session, tmp_path):
    """Qualifying order: >1 distinct suppliers AND exactly one distinct
    returning supplier AND order status F. Single-supplier orders,
    two-returner orders and open orders never count."""
    from pdf_toolkit_ray.queries import Q21_SQL, q21_waiting_suppliers

    li = pa.table(
        {
            #         o1 qualifies (s1 R, s2 N); o2 single supplier; o3 two
            #         returners; o4 qualifies but order status O
            "l_orderkey": pa.array([1, 1, 2, 3, 3, 4, 4], pa.int64()),
            "l_suppkey": pa.array([1, 2, 1, 1, 2, 2, 1], pa.int64()),
            "l_returnflag": ["R", "N", "R", "R", "R", "R", "N"],
        }
    )
    orders = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
            "o_orderstatus": ["F", "F", "F", "O"],
        }
    )
    supplier = pa.table(
        {
            "s_suppkey": pa.array([1, 2], pa.int64()),
            "s_name": ["Supp1", "Supp2"],
        }
    )
    sf = _write_tables(tmp_path, lineitem=li, orders=orders, supplier=supplier)
    out = q21_waiting_suppliers(sf).to_pandas()
    assert list(out["s_suppkey"]) == [1]
    assert list(out["numwait"]) == [1]
    _assert_matches_sql(
        q21_waiting_suppliers(sf), sf, Q21_SQL, ("lineitem", "orders", "supplier")
    )


def _docs(rows):
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": [r[1] for r in rows],
            "lang": [r[2] if len(r) > 2 else "en" for r in rows],
        }
    )


def test_dup_shingle_cross_doc_only(ray_session, tmp_path):
    """A shingle repeated WITHIN one document is not a duplicate; the
    same shingle appearing in two documents flags both."""
    from pdf_toolkit_ray.queries import DUP_SHINGLE_SQL, dup_shingle_frac_documents

    docs = _docs(
        [
            # doc 1 and 2 share the shingle "x y z"; doc 3 repeats its own
            # shingle twice (distinct-set, still unique corpus-wide)
            (1, "x y z p q"),
            (2, "a b x y z"),
            (3, "m n o m n o m"),
        ]
    )
    sf = _write_tables(tmp_path, documents=docs)
    out = dup_shingle_frac_documents(sf).to_pandas().set_index("doc_id")
    assert out.loc[1, "n_dup"] == 1 and out.loc[2, "n_dup"] == 1
    assert out.loc[3, "n_dup"] == 0
    # doc 1: shingles {xyz, yzp, zpq} -> 1/3
    assert abs(out.loc[1, "dup_frac"] - round(1 / 3, 4)) < 1e-9
    _assert_matches_sql(
        dup_shingle_frac_documents(sf), sf, DUP_SHINGLE_SQL, ("documents",)
    )


def test_mixture_sample_quotas_and_determinism(ray_session, tmp_path):
    """Per-language keep counts equal floor(w_l * cap) with cap over the
    PRESENT languages only, and the kept set is the md5-smallest ids —
    invariant to input order."""
    from pdf_toolkit_ray.queries import MIXTURE_SAMPLE_SQL, mixture_sample_documents

    rows = [(i, f"text {i}", lang) for i, lang in enumerate(
        ["en"] * 40 + ["de"] * 10 + ["fr"] * 12 + ["es"] * 30 + ["zh"] * 15
    )]
    docs = _docs(rows)
    sf = _write_tables(tmp_path, documents=docs)
    out = mixture_sample_documents(sf).to_pandas()
    # cap = min(40/.4, 10/.15, 12/.15, 30/.15, 15/.15) = 10/.15
    cap = 10 / 0.15
    want = {"en": int(np.floor(0.4 * cap)), "de": int(np.floor(0.15 * cap)),
            "fr": int(np.floor(0.15 * cap)), "es": int(np.floor(0.15 * cap)),
            "zh": int(np.floor(0.15 * cap))}
    got = out.groupby("lang")["doc_id"].count().to_dict()
    assert got == want
    _assert_matches_sql(
        mixture_sample_documents(sf), sf, MIXTURE_SAMPLE_SQL, ("documents",)
    )

    # shuffled input -> identical kept set
    shuffled = docs.take(pa.array(np.random.RandomState(7).permutation(len(rows))))
    (tmp_path / "b").mkdir()
    sf2 = _write_tables(tmp_path / "b", documents=shuffled)
    out2 = mixture_sample_documents(sf2).to_pandas()
    assert sorted(out2["doc_id"]) == sorted(out["doc_id"])


def test_gopher_rules_flags(ray_session, tmp_path):
    """keep requires n_words >= 40 AND >= 2 distinct stopwords AND
    top-bigram coverage <= 0.1 — each rule falsified independently."""
    from pdf_toolkit_ray.queries import GOPHER_RULES_SQL, gopher_rules_documents

    filler = " ".join(f"w{i}" for i in range(36))  # 36 distinct words
    good = f"the a {filler} end done"  # 40 words, 2 stops, all bigrams unique
    short = "the a tiny doc"
    one_stop = f"the the {filler} end done"  # only 'the' as stopword
    repetitive = "the a " + "x y " * 19  # 'x y' dominates bigrams
    docs = _docs([(1, good), (2, short), (3, one_stop), (4, repetitive)])
    sf = _write_tables(tmp_path, documents=docs)
    out = gopher_rules_documents(sf).to_pandas().set_index("doc_id")
    assert bool(out.loc[1, "keep"]) is True
    assert bool(out.loc[2, "keep"]) is False  # n_words < 40
    assert bool(out.loc[3, "keep"]) is False  # 1 distinct stopword
    assert bool(out.loc[4, "keep"]) is False  # top bigram > 0.1
    _assert_matches_sql(
        gopher_rules_documents(sf), sf, GOPHER_RULES_SQL, ("documents",)
    )


def test_q18_broadcast_and_join_paths_match(ray_session, monkeypatch):
    """The row-count-gated broadcast of qualifying orders must equal the
    bloom+hash-join scale path (gate forced to 0)."""
    from pdf_toolkit_ray import queries

    sf = "/root/testdata/sf0.001"
    a = queries.q18_large_volume_orders(sf)
    a = (a.to_pandas() if not isinstance(a, pd.DataFrame) else a)
    monkeypatch.setattr(queries, "Q18_BROADCAST_ROWS", 0)
    b = queries.q18_large_volume_orders(sf).to_pandas()
    pd.testing.assert_frame_equal(_canon(a), _canon(b), check_dtype=False)


def test_full_outer_one_sided_rows(ray_session, tmp_path):
    """Users with only errors or only purchases appear with the other
    count null-filled to 0; same-day same-user rows merge."""
    from pdf_toolkit_ray.queries import FULL_OUTER_SQL, full_outer_user_day

    ts = pa.array(
        np.array(
            ["2024-01-01T05:00", "2024-01-01T06:00", "2024-01-01T07:00",
             "2024-01-02T05:00", "2024-01-01T08:00"],
            dtype="datetime64[us]",
        )
    )
    events = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "ts": ts,
            "user_id": pa.array([1, 1, 2, 1, 3], pa.int64()),
            # u1 d1: error+purchase (merged row); u2 d1: error only;
            # u1 d2: purchase only; u3 d1: purchase only
            "event_type": ["error", "purchase", "error", "purchase", "purchase"],
        }
    )
    sf = _write_tables(tmp_path, events=events)
    out = full_outer_user_day(sf).to_pandas()
    got = {
        (r.user_id, r.day): (r.n_err, r.n_buy) for r in out.itertuples()
    }
    assert got == {
        (1, "2024-01-01"): (1, 1),
        (2, "2024-01-01"): (1, 0),
        (1, "2024-01-02"): (0, 1),
        (3, "2024-01-01"): (0, 1),
    }
    _assert_matches_sql(full_outer_user_day(sf), sf, FULL_OUTER_SQL, ("events",))


def test_unpivot_includes_zero_cells(ray_session, tmp_path):
    """The melt emits a row for EVERY (day, type) cell of the wide pivot,
    including types absent on a day (n=0)."""
    from pdf_toolkit_ray.queries import UNPIVOT_SQL, unpivot_events_daily

    ts = pa.array(
        np.array(["2024-01-01T05:00", "2024-01-02T05:00"], dtype="datetime64[us]")
    )
    events = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": ts,
            "user_id": pa.array([1, 1], pa.int64()),
            "event_type": ["click", "view"],
        }
    )
    sf = _write_tables(tmp_path, events=events)
    out = unpivot_events_daily(sf)
    assert out.num_rows == 2 * 5  # 2 days x 5 fixed types
    df = out.to_pandas()
    assert df[(df.d == "2024-01-01") & (df.event_type == "click")]["n"].iloc[0] == 1
    assert df[(df.d == "2024-01-01") & (df.event_type == "view")]["n"].iloc[0] == 0
    _assert_matches_sql(out, sf, UNPIVOT_SQL, ("events",))


def test_vocab_entropy_matches_numpy(ray_session, tmp_path):
    """Entropy equals the direct numpy computation on hand-built word
    distributions (uniform -> ln(k), degenerate single word -> 0)."""
    from pdf_toolkit_ray.queries import VOCAB_ENTROPY_SQL, vocab_entropy_by_lang

    docs = _docs(
        [
            (1, "a b c d", "en"),       # uniform over 4 -> ln(4)
            (2, "x x x x x", "de"),     # single word -> 0
            (3, "p p q", "fr"),         # H = ln(3) - (2 ln 2)/3
        ]
    )
    sf = _write_tables(tmp_path, documents=docs)
    out = vocab_entropy_by_lang(sf).to_pandas().set_index("lang")
    assert abs(out.loc["en", "entropy"] - round(np.log(4), 4)) < 1e-9
    assert out.loc["de", "entropy"] == 0.0
    assert abs(out.loc["fr", "entropy"] - round(np.log(3) - 2 * np.log(2) / 3, 4)) < 1e-9
    assert out.loc["en", "n_vocab"] == 4 and out.loc["de", "n_words"] == 5
    _assert_matches_sql(vocab_entropy_by_lang(sf), sf, VOCAB_ENTROPY_SQL, ("documents",))
