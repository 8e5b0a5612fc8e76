"""Driver-contract query registry: every operator from SURVEY.md §2 plus
the training-data ops (dedup / ANN / text analysis), each as

    name -> (ray_callable(sf_dir) -> Dataset|DataFrame|Table,  oracle_sql | None)

Numeric-equality policy (the driver hashes values): money-like columns
(2-decimal doubles) are summed EXACTLY via integer cents on BOTH sides
(``sum(CAST(round(x*100) AS BIGINT))/100.0`` ≡ int64 cents in Ray), so
distributed summation order cannot flip a hash; genuinely-continuous
doubles are rounded to 4 decimals on both sides (absolute summation skew
~1e-9 ≪ grid). Every computed column carries the same name in Ray and
SQL. Ops with no SQL expression (extraction, sketches, LSH) return
deterministic rows and omit the oracle (driver rows-only check).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from . import relops
from .config import ExtractConfig
from .functions.rounding import round_away_arrow
from .functions.textstats import lang_id_batch, quality_stats
from .relops import scan
from .stages import ann as ann_mod
from .stages import dedup as dedup_mod

# --------------------------------------------------------------------------
# helpers


def _cents(tbl_col, scale: int) -> pa.Array:
    """Exact integer representation of a fixed-decimal double column."""
    scaled = pc.multiply(pc.cast(tbl_col, pa.float64()), float(scale))
    return pc.cast(pc.round(scaled, ndigits=0), pa.int64())


def _sf_to_fixture_size(sf_dir: str) -> str:
    name = os.path.basename(os.path.normpath(sf_dir))
    return {"sf0.001": "smoke", "sf0.01": "correctness", "sf0.1": "bench"}.get(
        name, "correctness"
    )


def _transcripts_path(sf_dir: str) -> str:
    from .sources.fixtures import transcripts_path_for

    return transcripts_path_for(_sf_to_fixture_size(sf_dir))


# --------------------------------------------------------------------------
# TPC-H-ish relational operators (M1/A1/O1/O3/§2.4/§2.8 coverage)


def q1_pricing_summary(sf_dir: str):
    ds = scan(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            "l_discount", "l_tax", "l_shipdate",
        ],
    )
    cutoff = pa.scalar(np.datetime64("1998-09-02", "us"))

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.less_equal(batch.column("l_shipdate"), cutoff))
        qty = pc.cast(batch.column("l_quantity"), pa.float64())
        ep = pc.cast(batch.column("l_extendedprice"), pa.float64())
        disc = pc.cast(batch.column("l_discount"), pa.float64())
        tax = pc.cast(batch.column("l_tax"), pa.float64())
        one_m_disc = pc.subtract(1.0, disc)
        t = pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "qty": pc.cast(qty, pa.int64()),  # integral quantities
                "base_c": _cents(ep, 100),
                "disc_c": _cents(pc.multiply(ep, one_m_disc), 10_000),
                "charge_c": _cents(
                    pc.multiply(pc.multiply(ep, one_m_disc), pc.add(1.0, tax)), 1_000_000
                ),
                "disc_pts": _cents(disc, 100),
            }
        )
        return t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("base_c", "sum"), ("disc_c", "sum"),
             ("charge_c", "sum"), ("disc_pts", "sum"), ("qty", "count")]
        )

    agg = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby(["l_returnflag", "l_linestatus"]) \
        .aggregate(
            Sum("qty_sum", alias_name="qty"),
            Sum("base_c_sum", alias_name="base_c"),
            Sum("disc_c_sum", alias_name="disc_c"),
            Sum("charge_c_sum", alias_name="charge_c"),
            Sum("disc_pts_sum", alias_name="disc_pts"),
            Sum("qty_count", alias_name="count_order"),
        )
    tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    n = pc.cast(tbl.column("count_order"), pa.float64())
    out = pa.table(
        {
            "l_returnflag": tbl.column("l_returnflag"),
            "l_linestatus": tbl.column("l_linestatus"),
            "sum_qty": pc.cast(tbl.column("qty"), pa.int64()),
            "sum_base_price": pc.divide(pc.cast(tbl.column("base_c"), pa.float64()), 100.0),
            "sum_disc_price": pc.divide(pc.cast(tbl.column("disc_c"), pa.float64()), 10_000.0),
            "sum_charge": pc.divide(pc.cast(tbl.column("charge_c"), pa.float64()), 1_000_000.0),
            "avg_qty": round_away_arrow(pc.divide(pc.cast(tbl.column("qty"), pa.float64()), n)),
            "avg_price": round_away_arrow(
                pc.divide(pc.divide(pc.cast(tbl.column("base_c"), pa.float64()), 100.0), n)
            ),
            "avg_disc": round_away_arrow(
                pc.divide(pc.divide(pc.cast(tbl.column("disc_pts"), pa.float64()), 100.0), n)
            ),
            "count_order": pc.cast(tbl.column("count_order"), pa.int64()),
        }
    )
    return out


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
  CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_base_price,
  CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*10000) AS BIGINT)) AS DOUBLE)/10000.0 AS sum_disc_price,
  CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*(1+l_tax)*1000000) AS BIGINT)) AS DOUBLE)/1000000.0 AS sum_charge,
  round(CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE)/count(*), 4) AS avg_qty,
  round(CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100.0/count(*), 4) AS avg_price,
  round(CAST(sum(CAST(round(l_discount*100) AS BIGINT)) AS DOUBLE)/100.0/count(*), 4) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q6_revenue(sf_dir: str):
    ds = scan(sf_dir, "lineitem",
              columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"])
    lo = pa.scalar(np.datetime64("1996-01-01", "us"))
    hi = pa.scalar(np.datetime64("1997-01-01", "us"))

    def partial(batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(
                pc.greater_equal(batch.column("l_shipdate"), lo),
                pc.less(batch.column("l_shipdate"), hi),
            ),
            pc.and_(
                pc.and_(
                    pc.greater_equal(batch.column("l_discount"), 0.05),
                    pc.less_equal(batch.column("l_discount"), 0.07),
                ),
                pc.less(batch.column("l_quantity"), 24.0),
            ),
        )
        batch = batch.filter(m)
        rev = pc.multiply(
            pc.cast(batch.column("l_extendedprice"), pa.float64()),
            pc.cast(batch.column("l_discount"), pa.float64()),
        )
        total = pc.sum(_cents(rev, 10_000)).as_py() or 0
        return pa.table({"rev_c": pa.array([total], pa.int64())})

    total = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .sum("rev_c")
    )
    return pa.table({"revenue": pa.array([float(total) / 10_000.0], pa.float64())})


Q6_SQL = """
SELECT CAST(coalesce(sum(CAST(round(l_extendedprice*l_discount*10000) AS BIGINT)), 0) AS DOUBLE)/10000.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
"""


def filter_project_revenue(sf_dir: str):
    ds = scan(sf_dir, "lineitem",
              columns=["l_orderkey", "l_linenumber", "l_returnflag",
                       "l_extendedprice", "l_discount"])

    def fn(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.equal(batch.column("l_returnflag"), "R"))
        rev = pc.multiply(
            pc.cast(batch.column("l_extendedprice"), pa.float64()),
            pc.subtract(1.0, pc.cast(batch.column("l_discount"), pa.float64())),
        )
        return pa.table(
            {
                "l_orderkey": batch.column("l_orderkey"),
                "l_linenumber": batch.column("l_linenumber"),
                "revenue": round_away_arrow(rev),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


FILTER_PROJECT_SQL = """
SELECT l_orderkey, l_linenumber, round(l_extendedprice*(1-l_discount), 4) AS revenue
FROM lineitem WHERE l_returnflag = 'R'
"""


def sort_topk_orders(sf_dir: str):
    ds = scan(sf_dir, "orders",
              columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"])
    out = relops.topk(
        ds, [("o_totalprice", "descending"), ("o_orderkey", "ascending")], 15
    )
    tbl = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return relops.round_cols(tbl, ["o_totalprice"], 4)


SORT_TOPK_SQL = """
SELECT o_orderkey, o_custkey, round(o_totalprice, 4) AS o_totalprice, o_orderdate
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 15
"""


def groupby_events(sf_dir: str):
    ds = scan(sf_dir, "events", columns=["event_type", "value"])
    agg = ds.groupby("event_type").aggregate(
        Count(alias_name="n"),
        Sum("value", alias_name="sum_value"),
        Mean("value", alias_name="avg_value"),
        Min("value", alias_name="min_value"),
        Max("value", alias_name="max_value"),
    )
    tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    return relops.round_cols(tbl, ["sum_value", "avg_value", "min_value", "max_value"], 4)


GROUPBY_EVENTS_SQL = """
SELECT event_type, count(*) AS n, round(sum(value), 4) AS sum_value,
  round(avg(value), 4) AS avg_value, round(min(value), 4) AS min_value,
  round(max(value), 4) AS max_value
FROM events GROUP BY event_type
"""


def events_daily(sf_dir: str):
    ds = scan(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "day": pc.floor_temporal(batch.column("ts"), unit="day"),
                "event_type": batch.column("event_type"),
                "value": pc.cast(batch.column("value"), pa.float64()),
            }
        )
        return t.group_by(["day", "event_type"]).aggregate(
            [("value", "sum"), ("value", "count")]
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["day", "event_type"])
        .aggregate(Sum("value_sum", alias_name="sum_value"),
                   Sum("value_count", alias_name="n"))
    )
    tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    tbl = relops.round_cols(tbl, ["sum_value"], 4)
    idx = tbl.schema.get_field_index("n")
    return tbl.set_column(idx, "n", pc.cast(tbl.column("n"), pa.int64()))


EVENTS_DAILY_SQL = """
SELECT date_trunc('day', ts) AS day, event_type,
  round(sum(value), 4) AS sum_value, count(*) AS n
FROM events GROUP BY date_trunc('day', ts), event_type
"""


def join_customer_nation_region(sf_dir: str):
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet")).to_pandas()
    region = pq.read_table(os.path.join(sf_dir, "region.parquet")).to_pandas()
    dim = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")[
        ["n_nationkey", "r_name"]
    ].rename(columns={"n_nationkey": "c_nationkey", "r_name": "region"})
    ds = scan(sf_dir, "customer", columns=["c_nationkey", "c_acctbal"])
    joined = relops.broadcast_join(ds, dim, on="c_nationkey")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.assign(bal_c=np.round(batch["c_acctbal"] * 100).astype(np.int64))
        g = batch.groupby("region", as_index=False).agg(
            bal_c=("bal_c", "sum"), n=("bal_c", "size")
        )
        return g

    agg = (
        joined.map_batches(partial, batch_format="pandas")
        .groupby("region")
        .aggregate(Sum("bal_c", alias_name="bal_c"), Sum("n", alias_name="n_customers"))
    )
    tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    n = pc.cast(tbl.column("n_customers"), pa.float64())
    return pa.table(
        {
            "region": tbl.column("region"),
            "n_customers": pc.cast(tbl.column("n_customers"), pa.int64()),
            "avg_acctbal": round_away_arrow(
                pc.divide(pc.divide(pc.cast(tbl.column("bal_c"), pa.float64()), 100.0), n)
            ),
        }
    )


JOIN_CNR_SQL = """
SELECT r.r_name AS region, count(*) AS n_customers,
  round(CAST(sum(CAST(round(c.c_acctbal*100) AS BIGINT)) AS DOUBLE)/100.0/count(*), 4) AS avg_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
"""


def join_orders_customer_top(sf_dir: str):
    orders = scan(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "c_custkey": batch.column("o_custkey"),
                "spend_c": _cents(batch.column("o_totalprice"), 100),
            }
        )
        return t.group_by(["c_custkey"]).aggregate([("spend_c", "sum"), ("spend_c", "count")])

    def bucket_sum(group: pa.Table) -> pa.Table:
        g = group.group_by(["c_custkey"]).aggregate(
            [("spend_c_sum", "sum"), ("spend_c_count", "sum")]
        )
        return pa.table(
            {
                "c_custkey": g.column("c_custkey"),
                "spend_c": g.column("spend_c_sum_sum"),
                "n_orders": g.column("spend_c_count_sum"),
            }
        )

    # custkey cardinality scales with sf: bucketed groupby (vectorized
    # per-bucket Arrow aggregate) instead of Ray's per-group dispatch
    per_cust = relops.bucketed_groupby(
        orders.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["c_custkey"], bucket_sum,
        empty=pa.table(
            {
                "c_custkey": pa.array([], pa.int64()),
                "spend_c": pa.array([], pa.int64()),
                "n_orders": pa.array([], pa.int64()),
            }
        ),
    )
    # customer scales with sf — size-gated: broadcast under the gate (one
    # driver read of a bounded table), distributed hash join above it
    small, cust_ds = relops.small_side(sf_dir, "customer", ["c_custkey", "c_name"])
    if small is not None:
        joined = relops.broadcast_join(per_cust, small, on="c_custkey")
    else:
        n_parts = relops.choose_num_partitions(
            relops.table_path(sf_dir, "orders"), relops.table_path(sf_dir, "customer")
        )
        joined = per_cust.join(cust_ds, "inner", num_partitions=n_parts, on=("c_custkey",))

    def finish(batch: pa.Table) -> pa.Table:
        spend = pc.divide(pc.cast(batch.column("spend_c"), pa.float64()), 100.0)
        return pa.table(
            {
                "c_custkey": batch.column("c_custkey"),
                "c_name": batch.column("c_name"),
                "total_spend": spend,
                "n_orders": batch.column("n_orders"),
            }
        )

    out = relops.topk(
        joined.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True),
        [("total_spend", "descending"), ("c_custkey", "ascending")],
        10,
    )
    tbl = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    idx = tbl.schema.get_field_index("n_orders")
    return tbl.set_column(idx, "n_orders", pc.cast(tbl.column("n_orders"), pa.int64()))


JOIN_TOP_CUSTOMERS_SQL = """
SELECT o.o_custkey AS c_custkey, min(c.c_name) AS c_name,
  CAST(sum(CAST(round(o.o_totalprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS total_spend,
  count(*) AS n_orders
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY o.o_custkey
ORDER BY total_spend DESC, c_custkey ASC LIMIT 10
"""


def count_distinct_parts(sf_dir: str):
    ds = scan(sf_dir, "lineitem", columns=["l_returnflag", "l_partkey"])
    out = relops.distinct_count(ds, "l_returnflag", "l_partkey", "n_parts")
    tbl = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    idx = tbl.schema.get_field_index("n_parts")
    return tbl.set_column(idx, "n_parts", pc.cast(tbl.column("n_parts"), pa.int64()))


COUNT_DISTINCT_SQL = """
SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts
FROM lineitem GROUP BY l_returnflag
"""


def string_fns_part(sf_dir: str):
    ds = scan(sf_dir, "part", columns=["p_partkey", "p_name", "p_type"])

    def fn(batch: pa.Table) -> pa.Table:
        name = batch.column("p_name")
        return pa.table(
            {
                "p_partkey": batch.column("p_partkey"),
                "name_upper": pc.utf8_upper(name),
                "type6": pc.utf8_slice_codeunits(batch.column("p_type"), 0, 6),
                "has_green": pc.match_substring(name, "green"),
                "name_len": pc.cast(pc.utf8_length(name), pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


STRING_FNS_SQL = """
SELECT p_partkey, upper(p_name) AS name_upper, substr(p_type, 1, 6) AS type6,
  (p_name LIKE '%green%') AS has_green, CAST(length(p_name) AS BIGINT) AS name_len
FROM part
"""


def sessionize_events(sf_dir: str):
    ds = scan(sf_dir, "events", columns=["user_id", "ts"])
    return relops.sessionize(ds, key="user_id", ts_col="ts", gap_minutes=30)


SESSIONIZE_SQL = """
SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions FROM (
  SELECT user_id,
    CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
  FROM (
    SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
    FROM events
  )
) GROUP BY user_id
"""


# --------------------------------------------------------------------------
# training-data ops over documents / embeddings


def dedup_exact_documents(sf_dir: str):
    ds = scan(sf_dir, "documents", columns=["doc_id", "text"])
    out = dedup_mod.exact_dedup_groups(ds, "doc_id", "text")
    tbl = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    idx = tbl.schema.get_field_index("n")
    return tbl.set_column(idx, "n", pc.cast(tbl.column("n"), pa.int64()))


DEDUP_EXACT_SQL = """
SELECT md5(text) AS digest, min(doc_id) AS doc_id, count(*) AS n
FROM documents GROUP BY md5(text)
"""


def dedup_exact_keep_rows(sf_dir: str):
    """Keep-rows exact dedup via the distributed digest join (no driver set)."""
    ds = scan(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    out = dedup_mod.exact_dedup(ds, "doc_id", "text")
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).select(
        ["doc_id", "text", "lang"]
    )


DEDUP_KEEP_SQL = """
SELECT d.doc_id, d.text, d.lang
FROM documents d
JOIN (SELECT md5(text) AS digest, min(doc_id) AS doc_id
      FROM documents GROUP BY md5(text)) k
  ON md5(d.text) = k.digest AND d.doc_id = k.doc_id
"""


def dedup_exact_online_documents(sf_dir: str):
    """Keep-rows exact dedup through the SHARED MUTABLE INDEX path (raw
    digest-sharded Ray actors — see stages/dedup.py::exact_dedup_online).
    Keep-min is order-independent, so the groupby dedup's SQL twin
    verifies this execution shape too."""
    ds = scan(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    out = dedup_mod.exact_dedup_online(ds, "doc_id", "text")
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).select(
        ["doc_id", "text", "lang"]
    )


def token_count_documents(sf_dir: str):
    ds = scan(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), pattern=" ")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pc.cast(pc.list_value_length(toks), pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


TOKEN_COUNT_SQL = """
SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents
"""


def top_words_documents(sf_dir: str, k: int = 25):
    """Corpus vocabulary heavy hitters: top-k whitespace tokens by
    occurrence count (vocab building / domain-frequency analysis shape).
    Combiner pattern: each batch explodes its own tokens and
    pre-aggregates to (word, count) partials — the shuffle moves one row
    per distinct word per batch, never one row per token occurrence. Tiny
    global groupby + deterministic top-k (count desc, word asc)."""
    ds = scan(sf_dir, "documents", columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), pattern=" ")
        flat = pc.list_flatten(toks)
        t = pa.table({"word": flat})
        return t.group_by(["word"]).aggregate([("word", "count")])

    agg = (
        relops.coalesce_partials(
            ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        )
        .groupby("word")
        .aggregate(Sum("word_count", alias_name="n"))
    )
    out = relops.topk(agg, [("n", "descending"), ("word", "ascending")], k)
    tbl = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    idx = tbl.schema.get_field_index("n")
    return tbl.set_column(idx, "n", pc.cast(tbl.column("n"), pa.int64()))


TOP_WORDS_SQL = """
SELECT word, CAST(count(*) AS BIGINT) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
GROUP BY word ORDER BY n DESC, word ASC LIMIT 25
"""


def _mg_reduce(words: list, counts: np.ndarray, k: int):
    """Misra-Gries reduction to <= k counters: subtract the (k+1)-th
    largest count from all, keep positives. Under-counts any item by at
    most total/(k+1) (Agarwal et al. 2012, Mergeable Summaries)."""
    if len(words) <= k:
        return words, counts
    m = np.partition(counts, len(counts) - k - 1)[len(counts) - k - 1]
    keep = counts > m
    return [w for w, f in zip(words, keep) if f], counts[keep] - m


def heavy_hitters_documents(sf_dir: str, counters: int = 256, frac: int = 32):
    """EXACT heavy hitters (every word with count > total/frac) through a
    Misra-Gries sketch + exact verification — the scale-right alternative
    to ``top_words_documents``' shuffle of every distinct (word, batch)
    partial: here the corpus words NEVER shuffle. Each batch emits a
    <=`counters`-row MG summary; summaries merge through a tree fold
    (MG summation is mergeable with the same error bound); since the MG
    under-count is <= total/(counters+1) < total/frac, every true heavy
    hitter is among the <= `counters` candidates. The candidates then
    broadcast and ONE vectorized ``pc.is_in`` pass counts them exactly —
    so the output is exact and the DuckDB twin (plain GROUP BY/HAVING)
    hash-matches. The threshold compare is integer (n·frac > total)."""
    assert counters + 1 >= frac, "MG guarantee needs counters+1 >= frac"
    ds = scan(sf_dir, "documents", columns=["doc_id", "text"])

    def mg_partial(batch: pa.Table) -> pa.Table:
        _, flat, _ = _exploded_words(batch)
        t = pa.table({"word": flat}).group_by(["word"]).aggregate([("word", "count")])
        words = t.column("word").to_pylist()
        c = t.column("word_count").to_numpy(zero_copy_only=False).astype(np.int64)
        total = int(c.sum())
        words, c = _mg_reduce(words, c, counters)
        # word=NULL row carries the batch token total through the fold
        return pa.table(
            {
                "word": pa.array(list(words) + [None], pa.string()),
                "c": pa.array(np.r_[c, total], pa.int64()),
            }
        )

    def mg_combine(tables):
        if not tables:
            return pa.table(
                {"word": pa.array([None], pa.string()), "c": pa.array([0], pa.int64())}
            )
        t = pa.concat_tables(tables).combine_chunks()
        null_mask = pc.is_null(t.column("word"))
        total = int(pc.sum(t.filter(null_mask).column("c")).as_py() or 0)
        g = (
            t.filter(pc.invert(null_mask))
            .group_by(["word"]).aggregate([("c", "sum")])
        )
        words = g.column("word").to_pylist()
        c = g.column("c_sum").to_numpy(zero_copy_only=False).astype(np.int64)
        words, c = _mg_reduce(words, c, counters)
        return pa.table(
            {
                "word": pa.array(list(words) + [None], pa.string()),
                "c": pa.array(np.r_[c, total], pa.int64()),
            }
        )

    sketch = relops.tree_fold(
        ds.map_batches(mg_partial, batch_format="pyarrow", zero_copy_batch=True),
        mg_combine,
    )
    null_mask = pc.is_null(sketch.column("word"))
    total = int(pc.sum(sketch.filter(null_mask).column("c")).as_py() or 0)
    cand = sketch.filter(pc.invert(null_mask)).column("word").combine_chunks()
    if len(cand) == 0 or total == 0:
        return pa.table(
            {"word": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
    cand_ref = ray.put(cand)

    def exact_partial(batch: pa.Table) -> pa.Table:
        _, flat, _ = _exploded_words(batch)
        flat = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat
        hits = flat.filter(pc.is_in(flat, value_set=ray.get(cand_ref)))
        return pa.table({"word": hits}).group_by(["word"]).aggregate([("word", "count")])

    counts = (
        relops.coalesce_partials(
            ds.map_batches(exact_partial, batch_format="pyarrow", zero_copy_batch=True)
        )
        .groupby("word")
        .aggregate(Sum("word_count", alias_name="n"))
        .to_pandas()  # <= `counters` rows
    )
    counts = counts[counts["n"].astype(np.int64) * frac > total]
    counts = counts.sort_values(["n", "word"], ascending=[False, True])
    return pa.table(
        {
            "word": pa.array(counts["word"].tolist(), pa.string()),
            "n": pa.array(counts["n"].to_numpy(np.int64), pa.int64()),
        }
    )


HEAVY_HITTERS_SQL = """
WITH t AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
tot AS (SELECT count(*) AS total FROM t)
SELECT word, CAST(count(*) AS BIGINT) AS n
FROM t GROUP BY word
HAVING count(*) * 32 > (SELECT total FROM tot)
ORDER BY n DESC, word ASC
"""


def weighted_sample_documents(sf_dir: str, k: int = 50):
    """Weighted sampling without replacement (Efraimidis & Spirakis 2006
    priority sampling — the training-mix shape "sample k docs with
    probability ∝ quality weight"): per row, u = md5-derived uniform in
    (0,1], priority = ln(u)/w (equivalent order to the paper's u^(1/w)),
    keep the top k priorities. Deterministic on any layout: u comes from
    the doc_id's md5 (no RNG stream), and the priority is quantized to an
    int64 grid before comparison so the Ray and DuckDB sides order
    identically (the nb-classifier trick); ties break on doc_id. Scale
    shape: priorities are computed in-batch and only per-batch top-k rows
    reach the final k-row reduce (relops.topk prunes per block)."""
    ds = scan(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def prio(batch: pa.Table) -> pa.Table:
        import hashlib

        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        w = np.maximum(
            batch.column("n_chars").to_numpy(zero_copy_only=False).astype(np.float64),
            1.0,
        )
        h = np.fromiter(
            (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) for i in ids),
            np.float64, count=len(ids),
        )
        u = (h + 1.0) / 4294967296.0  # (0, 1]
        key_q = np.round(np.log(u) / w * 1e12)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_chars": batch.column("n_chars"),
                "priority_q": pa.array(key_q.astype(np.int64), pa.int64()),
            }
        )

    scored = ds.map_batches(prio, batch_format="pyarrow", zero_copy_batch=True)
    out = relops.topk(
        scored, [("priority_q", "descending"), ("doc_id", "ascending")], k
    )
    return out if isinstance(out, pa.Table) else pa.Table.from_pandas(
        out.to_pandas(), preserve_index=False
    )


WEIGHTED_SAMPLE_SQL = """
SELECT doc_id, n_chars,
       CAST(round(ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) + 1.0)
                     / 4294967296.0)
                  / greatest(n_chars, 1) * 1e12) AS BIGINT) AS priority_q
FROM documents
ORDER BY priority_q DESC, doc_id ASC
LIMIT 50
"""


_QUANTILES = ((0.25, 1, 4), (0.5, 1, 2), (0.75, 3, 4), (0.9, 9, 10), (0.99, 99, 100))


def token_quantiles_documents(sf_dir: str):
    """EXACT distributed quantiles of per-doc whitespace token counts via
    mergeable value histograms: each batch emits a (value, count) partial
    histogram, one tiny groupby merges them, and the quantiles come out of
    the merged histogram with integer-exact ranks (``ceil(p*n) - 1``,
    0-based — verified identical to DuckDB ``quantile_disc`` for n=1..200
    x all five p). The shuffle moves histograms bounded by the
    distinct-value count, never rows — the scale-right shape for
    percentile telemetry over 10^12 rows (token counts have ~1e4 distinct
    values regardless of corpus size)."""
    ds = scan(sf_dir, "documents", columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_value_length(pc.split_pattern(batch.column("text"), pattern=" "))
        t = pa.table({"v": pc.cast(toks, pa.int64())})
        return t.group_by(["v"]).aggregate([("v", "count")])

    hist = (
        relops.coalesce_partials(
            ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        )
        .groupby("v")
        .aggregate(Sum("v_count", alias_name="cnt"))
    )
    h = hist.to_pandas().sort_values("v").reset_index(drop=True)
    values = h["v"].to_numpy(dtype=np.int64)
    cum = h["cnt"].to_numpy(dtype=np.int64).cumsum()
    n = int(cum[-1]) if len(cum) else 0
    out_p, out_v = [], []
    for p, num, den in _QUANTILES:
        rank = -(-(num * n) // den) - 1  # ceil(num*n/den) - 1, integer exact
        idx = int(np.searchsorted(cum, rank + 1))
        out_p.append(p)
        out_v.append(int(values[idx]))
    return pa.table(
        {"p": pa.array(out_p, pa.float64()), "n_tokens": pa.array(out_v, pa.int64())}
    )


# DuckDB quantile_disc requires CONSTANT p — one SELECT per quantile
TOKEN_QUANTILES_SQL = """
WITH t AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS v FROM documents)
SELECT CAST(0.25 AS DOUBLE) AS p, CAST(quantile_disc(v, 0.25) AS BIGINT) AS n_tokens FROM t
UNION ALL SELECT 0.5, CAST(quantile_disc(v, 0.5) AS BIGINT) FROM t
UNION ALL SELECT 0.75, CAST(quantile_disc(v, 0.75) AS BIGINT) FROM t
UNION ALL SELECT 0.9, CAST(quantile_disc(v, 0.9) AS BIGINT) FROM t
UNION ALL SELECT 0.99, CAST(quantile_disc(v, 0.99) AS BIGINT) FROM t
"""


def bpe_token_count_documents(sf_dir: str):
    """GPT-2-ish pre-tokenizer counts (word / number / punct runs) — the
    Arrow ``count_substring_regex`` kernel, RE2-compatible pattern."""
    from .functions.textstats import bpe_ish_token_count

    ds = scan(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_bpe_tokens": bpe_ish_token_count(batch.column("text")),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


BPE_TOKEN_COUNT_SQL = r"""
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT)
    AS n_bpe_tokens
FROM documents
"""


def textnorm_documents(sf_dir: str):
    from .functions.textnorm import norm_inline_arrow

    ds = scan(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        col = batch.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return pa.table(
            {"doc_id": batch.column("doc_id"), "norm_text": norm_inline_arrow(col)}
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


TEXTNORM_SQL = r"""
SELECT doc_id, trim(regexp_replace(text, '[ \t\r\n\f\v]+', ' ', 'g')) AS norm_text
FROM documents
"""


def quality_documents(sf_dir: str):
    ds = scan(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        out = quality_stats(batch, "text")
        return out.drop_columns(["text"])

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


QUALITY_SQL = """
SELECT doc_id,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens,
  round((length(text) - (len(string_split(text, ' ')) - 1.0)) / len(string_split(text, ' ')), 4) AS mean_token_len,
  round(len(list_distinct(string_split(text, ' '))) * 1.0 / len(string_split(text, ' ')), 4) AS distinct_ratio
FROM documents
"""


def lang_id_documents(sf_dir: str):
    ds = scan(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "pred_lang": pa.array(lang_id_batch(batch.column("text").to_pylist())),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# exact SQL twin of the stopword-profile heuristic in functions/textstats.py:
# distinct lowercased words intersected with each language's profile;
# argmax with ties resolved in sorted language order (de < en < es < fr),
# 'und' when no profile hits
LANG_ID_SQL = """
WITH h AS (
  SELECT doc_id,
    len(list_intersect(list_distinct(string_split(lower(text), ' ')),
        ['the','and','of','to','a','in','is','that','it','for'])) AS h_en,
    len(list_intersect(list_distinct(string_split(lower(text), ' ')),
        ['der','die','das','und','ist','nicht','ein','mit','zu','den'])) AS h_de,
    len(list_intersect(list_distinct(string_split(lower(text), ' ')),
        ['le','la','les','et','est','un','une','des','que','pour'])) AS h_fr,
    len(list_intersect(list_distinct(string_split(lower(text), ' ')),
        ['el','la','los','las','y','es','un','una','que','por'])) AS h_es
  FROM documents
)
SELECT doc_id,
  CASE
    WHEN h_de = 0 AND h_en = 0 AND h_es = 0 AND h_fr = 0 THEN 'und'
    WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
    WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
    WHEN h_es >= h_fr THEN 'es'
    ELSE 'fr'
  END AS pred_lang
FROM h
"""


def fingerprint_documents(sf_dir: str):
    """Winnowing-style character-window fingerprints per document
    (count + min fingerprint; -1 when none selected)."""
    from .functions.hashing import char_fingerprints

    ds = scan(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        n_fp, min_fp = [], []
        for t in batch.column("text").to_pylist():
            fps = char_fingerprints(t or "")
            n_fp.append(len(fps))
            min_fp.append(int(fps.min()) if len(fps) else -1)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_fp": pa.array(n_fp, pa.int64()),
                "min_fp": pa.array(min_fp, pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# exact SQL twin: same 8-char polynomial window hash mod the Mersenne
# prime, computed in HUGEINT (terms < 2^78), fingerprints = h % 16 == 0
FINGERPRINT_SQL = """
WITH fp AS (
  SELECT d.doc_id,
    (list_sum(list_transform(range(0, 8), j ->
       CAST(unicode(substr(d.text, CAST(t.i + j AS INTEGER), 1)) AS HUGEINT)
       * CAST([74051159531521793, 288136807515649, 1121154893057, 4362470401,
               16974593, 66049, 257, 1][CAST(j + 1 AS INTEGER)] AS HUGEINT)))
     % CAST(2305843009213693951 AS HUGEINT)) AS h
  FROM documents d, unnest(range(1, length(d.text) - 8 + 2)) t(i)
  WHERE length(d.text) >= 8
)
SELECT d.doc_id, COALESCE(s.n_fp, 0) AS n_fp, COALESCE(s.min_fp, -1) AS min_fp
FROM documents d LEFT JOIN (
  SELECT doc_id, count(*) AS n_fp, CAST(min(h) AS BIGINT) AS min_fp
  FROM fp WHERE h % 16 = 0 GROUP BY doc_id
) s ON d.doc_id = s.doc_id
"""


def minhash_clusters_documents(sf_dir: str):
    """Near-dup clusters: MinHash-LSH candidate pairs, EXACT word-trigram
    Jaccard >= 0.8 verify, distributed connected components, cluster id =
    min doc_id attached to every corpus row. The exact-verify step makes
    the result SQL-expressible (all-pairs Jaccard + recursive-CTE
    components) — LSH affects candidate RECALL only, and at 64 perms / 32
    bands the miss probability at j=0.8 is (1-0.8^2)^32 < 1e-14. The
    pure signature-estimate variant stays available as
    ``stages.dedup.minhash_lsh_clusters`` (pytest-covered)."""
    ds = scan(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = dedup_mod.ngram_jaccard_pairs(ds, "doc_id", "text", threshold=0.8)
    labels = dedup_mod.connected_components(pairs)
    return dedup_mod.attach_cluster_ids(ds, labels, "doc_id")


MINHASH_CLUSTERS_SQL = """
WITH RECURSIVE w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
),
g AS (
  SELECT doc_id,
    CASE WHEN len(words) >= 3 THEN
      list_distinct(list_transform(
        range(1, len(words) - 1),
        i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))
    ELSE [array_to_string(words, ' ')]
    END AS grams
  FROM w
),
p AS (
  SELECT a, b FROM (
    SELECT x.doc_id AS a, y.doc_id AS b,
      CAST(len(list_intersect(x.grams, y.grams)) AS DOUBLE) /
        (len(x.grams) + len(y.grams) - len(list_intersect(x.grams, y.grams))) AS j
    FROM g x JOIN g y ON x.doc_id < y.doc_id
  ) WHERE j >= 0.8
),
e AS (
  SELECT a AS src, b AS dst FROM p UNION ALL SELECT b AS src, a AS dst FROM p
),
reach AS (
  SELECT src AS node, src AS lbl FROM e
  UNION
  SELECT e.dst AS node, r.lbl AS lbl FROM reach r JOIN e ON e.src = r.node
),
c AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node)
SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id
FROM documents d LEFT JOIN c ON d.doc_id = c.node
"""


def dedup_minhash_online_documents(sf_dir: str):
    """INCREMENTAL near-dup clusters through the persisted cross-job band
    index: the corpus arrives in three disjoint ingests (doc_id % 3 —
    near-dup groups span increments, so cross-increment candidate
    discovery is exercised, not just within-batch), each signatured
    exactly once into ``make_neardup_index`` shard actors; clustering
    probes the persisted bands, exact-verifies with word-trigram Jaccard
    >= 0.8 and must be row-identical to the one-shot batch twin
    (``MINHASH_CLUSTERS_SQL``). Reference analog: skip-if-exists resume
    (page_images.py:740-752) lifted to signature granularity."""
    ds = scan(sf_dir, "documents", columns=["doc_id", "text"])
    index = dedup_mod.make_neardup_index(num_shards=4, num_perm=64, bands=32)
    try:
        for k in range(3):
            def _part(batch: pa.Table, k=k) -> pa.Table:
                ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
                return batch.filter(pa.array(ids % 3 == k))

            dedup_mod.neardup_ingest(
                ds.map_batches(_part, batch_format="pyarrow", zero_copy_batch=True),
                index,
                "doc_id",
                "text",
            )
        return dedup_mod.neardup_clusters(
            index, ds, "doc_id", "text", threshold=0.8, n=3
        ).materialize()
    finally:
        dedup_mod.destroy_neardup_index(index)


def simhash_documents(sf_dir: str):
    ds = scan(sf_dir, "documents", columns=["doc_id", "text"])
    return dedup_mod.add_simhash(ds, "doc_id", "text")


# exact SQL twin of simhash64: word hash = top 64 bits of md5; per bit
# position, majority vote over word occurrences; bit 63 contributes the
# int64 sign (two's complement). Bit i lives in hex digit 16 - i//4
# (1-based substr) at in-digit position i%4.
SIMHASH_SQL = """
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
bits AS (
  SELECT doc_id, t.i AS bit,
    ((strpos('0123456789abcdef', substr(md5(word), CAST(16 - t.i // 4 AS INTEGER), 1)) - 1)
      >> CAST(t.i % 4 AS INTEGER)) & 1 AS v
  FROM w, (SELECT unnest(range(0, 64)) AS i) t
),
sums AS (
  SELECT doc_id, bit, sum(CASE WHEN v = 1 THEN 1 ELSE -1 END) AS s
  FROM bits GROUP BY doc_id, bit
)
SELECT doc_id,
  CAST(sum(CASE WHEN s > 0 THEN
        CASE WHEN bit = 63 THEN -9223372036854775807 - 1
             ELSE CAST(1 AS BIGINT) << CAST(bit AS INTEGER) END
      ELSE 0 END) AS BIGINT) AS simhash
FROM sums GROUP BY doc_id
"""


def ngram_dup_pairs_documents(sf_dir: str):
    ds = scan(sf_dir, "documents", columns=["doc_id", "text"])
    return dedup_mod.ngram_jaccard_pairs(ds, "doc_id", "text", threshold=0.5)


# exact SQL twin: distinct word trigrams per doc, all-pairs set Jaccard.
# The Ray side generates candidates by MinHash-LSH (64 perms, 32 bands of
# 2 rows: miss prob (1-j^2)^32 < 1e-4 at j=0.5) then verifies EXACT
# Jaccard, so at the driver's scale the result equals the all-pairs truth.
NGRAM_PAIRS_SQL = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
),
g AS (
  SELECT doc_id,
    CASE WHEN len(words) >= 3 THEN
      list_distinct(list_transform(
        range(1, len(words) - 1),
        i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))
    ELSE [array_to_string(words, ' ')]  -- <3 words: one whole-doc shingle,
                                        -- matching _ngrams in hashing.py
    END AS grams
  FROM w
)
SELECT a, b, round(j, 4) AS jaccard FROM (
  SELECT x.doc_id AS a, y.doc_id AS b,
    CAST(len(list_intersect(x.grams, y.grams)) AS DOUBLE) /
      (len(x.grams) + len(y.grams) - len(list_intersect(x.grams, y.grams))) AS j
  FROM g x JOIN g y ON x.doc_id < y.doc_id
) WHERE j >= 0.5
"""


def fuzzy_lev_pairs_documents(sf_dir: str):
    """Edit-distance near-dup pairs: frequency-capped word-5-gram
    inverted-index candidates + exact byte-level Levenshtein verify on
    the 64-char prefix key (``stages.dedup.fuzzy_lev_pairs``). The
    Jaccard family sees "mostly the same shingle set"; this sees "same
    string with a few local edits" — deterministic end to end, so the
    twin is full-value."""
    ds = scan(sf_dir, "documents", columns=["doc_id", "text"])
    return dedup_mod.fuzzy_lev_pairs(ds, "doc_id", "text")


# exact twin: the SAME frequency-capped inverted shingle index (5-gram,
# cap 50) generates candidates, DuckDB's byte-level levenshtein() is the
# verify — both predicates are deterministic, so Ray and SQL agree row
# for row (the kernel's byte semantics are pinned by a test against
# DuckDB in tests/test_editdist.py).
FUZZY_LEV_SQL = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
s AS (
  SELECT doc_id, unnest(CASE WHEN len(words) >= 5 THEN
      list_distinct(list_transform(range(1, len(words) - 3),
        i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2] || ' '
             || words[i+3] || ' ' || words[i+4]))
    ELSE [array_to_string(words, ' ')] END) AS sh
  FROM w),
ok AS (SELECT sh FROM s GROUP BY sh HAVING count(*) <= 50),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM s x JOIN s y ON x.sh = y.sh AND x.doc_id < y.doc_id
  WHERE x.sh IN (SELECT sh FROM ok)),
k AS (SELECT doc_id, substr(text, 1, 64) AS key FROM documents)
SELECT c.a, c.b, CAST(levenshtein(ka.key, kb.key) AS BIGINT) AS lev
FROM cand c JOIN k ka ON ka.doc_id = c.a JOIN k kb ON kb.doc_id = c.b
WHERE levenshtein(ka.key, kb.key) <= 8
"""


def fuzzy_lev_keep_best_documents(sf_dir: str):
    """Canonicalization for the EDIT-DISTANCE dedup family (the analog of
    ``dedup_near_keep_best`` for Jaccard clusters): fuzzy Levenshtein
    pairs → distributed connected components → keep the longest doc per
    cluster (tie → min doc_id), cluster size kept for audit. Same
    bucketed per-cluster argmax shape; deterministic end to end."""
    ds = scan(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = dedup_mod.fuzzy_lev_pairs(ds, "doc_id", "text")
    labels = dedup_mod.connected_components(pairs)
    meta = scan(sf_dir, "documents", columns=["doc_id", "n_chars"])
    with_cluster = dedup_mod.attach_cluster_ids(
        meta, labels, "doc_id", keep_columns=["n_chars"]
    )

    empty = pa.table(
        {
            "cluster_id": pa.array([], pa.int64()),
            "kept_doc_id": pa.array([], pa.int64()),
            "n_chars": pa.array([], pa.int64()),
            "cluster_size": pa.array([], pa.int64()),
        }
    )

    def bucket_best(group: pa.Table) -> pa.Table:
        cl = group.column("cluster_id").to_numpy(zero_copy_only=False)
        nc = group.column("n_chars").to_numpy(zero_copy_only=False)
        did = group.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((did, -nc, cl))
        cl, nc, did = cl[order], nc[order], did[order]
        first = np.r_[True, cl[1:] != cl[:-1]]
        sizes = np.diff(np.r_[np.flatnonzero(first), len(cl)])
        return pa.table(
            {
                "cluster_id": pa.array(cl[first], pa.int64()),
                "kept_doc_id": pa.array(did[first], pa.int64()),
                "n_chars": pa.array(nc[first], pa.int64()),
                "cluster_size": pa.array(sizes, pa.int64()),
            }
        )

    return relops.bucketed_groupby(with_cluster, ["cluster_id"], bucket_best, empty=empty)


# the FUZZY candidate/verify CTEs finished with the same reach-closure +
# per-cluster argmax as DEDUP_KEEP_BEST_SQL
FUZZY_LEV_KEEP_BEST_SQL = """
WITH RECURSIVE w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
s AS (
  SELECT doc_id, unnest(CASE WHEN len(words) >= 5 THEN
      list_distinct(list_transform(range(1, len(words) - 3),
        i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2] || ' '
             || words[i+3] || ' ' || words[i+4]))
    ELSE [array_to_string(words, ' ')] END) AS sh
  FROM w),
ok AS (SELECT sh FROM s GROUP BY sh HAVING count(*) <= 50),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM s x JOIN s y ON x.sh = y.sh AND x.doc_id < y.doc_id
  WHERE x.sh IN (SELECT sh FROM ok)),
k AS (SELECT doc_id, substr(text, 1, 64) AS key FROM documents),
p AS (
  SELECT c.a, c.b
  FROM cand c JOIN k ka ON ka.doc_id = c.a JOIN k kb ON kb.doc_id = c.b
  WHERE levenshtein(ka.key, kb.key) <= 8),
e AS (SELECT a AS src, b AS dst FROM p UNION ALL SELECT b AS src, a AS dst FROM p),
reach AS (
  SELECT src AS node, src AS lbl FROM e
  UNION
  SELECT e.dst AS node, r.lbl AS lbl FROM reach r JOIN e ON e.src = r.node
),
c AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node),
cl AS (
  SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id, d.n_chars
  FROM documents d LEFT JOIN c ON d.doc_id = c.node
)
SELECT cluster_id, doc_id AS kept_doc_id, n_chars, cluster_size FROM (
  SELECT cluster_id, doc_id, n_chars,
         row_number() OVER (PARTITION BY cluster_id
                            ORDER BY n_chars DESC, doc_id ASC) AS rn,
         count(*) OVER (PARTITION BY cluster_id) AS cluster_size
  FROM cl
) WHERE rn = 1
"""


import functools


@functools.lru_cache(maxsize=8)
def _query_embeddings(sf_dir: str, n_queries: int = 5):
    """The n_queries lowest vec_ids and their vectors. embeddings scales
    with sf, so the bottom-k id selection is a distributed topk over the
    pruned id column and only the k matching row groups are read back
    (statistics-pruned ``filters=``) — the driver never holds the table.
    Cached per (sf_dir, n): four ANN queries share the same selection."""
    path = os.path.join(sf_dir, "embeddings.parquet")
    ids_ds = ray.data.read_parquet(path, columns=["vec_id"])
    qids = sorted(
        int(r["vec_id"])
        for r in relops.topk(ids_ds, [("vec_id", "ascending")], n_queries).take_all()
    )
    tbl = pq.read_table(
        path, columns=["vec_id", "embedding"], filters=[("vec_id", "in", qids)]
    )
    by_id = {
        int(v): np.asarray(e, dtype=np.float64)
        for v, e in zip(tbl.column("vec_id").to_pylist(), tbl.column("embedding").to_pylist())
    }
    qm = np.array([by_id[q] for q in qids])
    return qids, qm


def embedding_topk(sf_dir: str):
    qids, qm = _query_embeddings(sf_dir)
    ds = scan(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return ann_mod.brute_force_topk(ds, qids, qm, k=10)


EMBEDDING_TOPK_SQL = """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
  ORDER BY vec_id ASC LIMIT 5
)
SELECT query_id, vec_id, sim FROM (
  SELECT q.query_id, e.vec_id,
    round(CAST(list_cosine_similarity(q.qe, e.embedding) AS DOUBLE), 3) AS sim,
    row_number() OVER (
      PARTITION BY q.query_id
      ORDER BY round(CAST(list_cosine_similarity(q.qe, e.embedding) AS DOUBLE), 3) DESC, e.vec_id ASC
    ) AS rnk
  FROM q CROSS JOIN embeddings e
) WHERE rnk <= 10
"""


def embedding_topk_lsh(sf_dir: str):
    qids, qm = _query_embeddings(sf_dir)
    ds = scan(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return ann_mod.lsh_bucketed_topk(ds, qids, qm, k=10)


def embedding_topk_lsh_recall(sf_dir: str):
    """Driver-HASHABLE companion to the rows-only ``embedding_topk_lsh``:
    per query, recall of the LSH top-k against the exact top-k (both
    computed distributed in-Ray). Deterministic: the hyperplane buckets
    are a fixed function of (seed, row), so the LSH candidate set — and
    therefore the recall — is independent of batching/parallelism. The
    twin pins each recall as a golden constant keyed on (corpus size,
    query_id); the exact-top-k side is already value-verified separately
    by ``embedding_topk``."""
    qids, qm = _query_embeddings(sf_dir)
    exact = ann_mod.brute_force_topk(
        scan(sf_dir, "embeddings", columns=["vec_id", "embedding"]), qids, qm, k=10
    ).to_pandas()
    lsh = ann_mod.lsh_bucketed_topk(
        scan(sf_dir, "embeddings", columns=["vec_id", "embedding"]), qids, qm, k=10
    ).to_pandas()
    rows = []
    for q in qids:
        want = set(exact[exact["query_id"] == q]["vec_id"].astype(int))
        got = set(lsh[lsh["query_id"] == q]["vec_id"].astype(int))
        rows.append((int(q), int(round(100.0 * len(want & got) / len(want)))))
    rows.sort()
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in rows], pa.int64()),
            "recall_pct": pa.array([r[1] for r in rows], pa.int64()),
        }
    )


def embedding_near_dups_lsh_recall(sf_dir: str):
    """Driver-HASHABLE companion to the rows-only ``embedding_near_dups_lsh``:
    pair-set recall of the LSH bucketing vs the exact all-pairs result at
    the same threshold, plus a false-positive count the in-bucket exact
    verify guarantees is zero. Deterministic for the same reason as
    ``embedding_topk_lsh_recall`` (bucket keys are per-row functions)."""
    exact = _near_dups_df(sf_dir, 0.45)
    lsh = embedding_near_dups_lsh(sf_dir)
    ep = {(int(a), int(b)) for a, b in zip(exact["a"], exact["b"])}
    lp = {(int(a), int(b)) for a, b in zip(lsh["a"], lsh["b"])}
    recall = int(round(100.0 * len(ep & lp) / len(ep))) if ep else 100
    return pa.table(
        {
            "n_exact_pairs": pa.array([len(ep)], pa.int64()),
            "false_positives": pa.array([len(lp - ep)], pa.int64()),
            "recall_pct": pa.array([recall], pa.int64()),
        }
    )


def embedding_topk_ivf(sf_dir: str):
    """IVF coarse-quantizer top-k. Training sample loaded deterministically
    from the parquet file (first 2048 rows in storage order). The registry
    entry probes ALL cells (n_probe == n_cells), which is EXACT by
    construction — equality with the brute-force oracle cannot depend on
    the fixture. The scale path (n_probe < n_cells, scanning only
    ~n_probe/n_cells of the corpus for bounded recall loss) is exercised
    by the probe-tradeoff pytest in tests/test_dedup_ann.py."""
    qids, qm = _query_embeddings(sf_dir)
    # training sample: first 2048 rows only — stream row groups, never the file
    pf = pq.ParquetFile(os.path.join(sf_dir, "embeddings.parquet"))
    batches, need = [], 2048
    for b in pf.iter_batches(batch_size=2048, columns=["embedding"]):
        batches.append(b)
        need -= b.num_rows
        if need <= 0:
            break
    train = pa.Table.from_batches(batches).slice(0, 2048)
    tm = np.array([np.asarray(v, dtype=np.float64) for v in train.column("embedding").to_pylist()])
    ds = scan(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return ann_mod.ivf_topk(ds, qids, qm, k=10, n_cells=16, n_probe=16, train_matrix=tm)


def _pq_train_matrix(sf_dir: str) -> np.ndarray:
    """Deterministic PQ training sample: first 2048 rows in storage order
    (row-group streamed, never the whole file)."""
    pf = pq.ParquetFile(os.path.join(sf_dir, "embeddings.parquet"))
    batches, need = [], 2048
    for b in pf.iter_batches(batch_size=2048, columns=["embedding"]):
        batches.append(b)
        need -= b.num_rows
        if need <= 0:
            break
    train = pa.Table.from_batches(batches).slice(0, 2048)
    return np.array(
        [np.asarray(v, dtype=np.float64) for v in train.column("embedding").to_pylist()]
    )


def embedding_topk_pq(sf_dir: str):
    """Product-quantization top-k — the MEMORY-bound ANN scale path
    (m-byte codes + per-query lookup tables instead of d-float dot
    products; 32× smaller than float32 storage at d=64/m=8).
    Approximate by construction → rows-only in the driver; the
    driver-hashable companions are ``embedding_topk_pq_recall`` (recall
    vs the exact top-k) and ``embedding_pq_digest`` (pins the encoder's
    exact code assignment)."""
    qids, qm = _query_embeddings(sf_dir)
    ds = scan(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return ann_mod.pq_topk(
        ds, qids, qm, k=10, n_codes=64,
        train_matrix=_pq_train_matrix(sf_dir), rerank=50,
    )


def embedding_topk_pq_recall(sf_dir: str):
    """Driver-HASHABLE companion to ``embedding_topk_pq``: per-query
    recall vs the exact top-k. Deterministic across parallelism — the
    training sample is fixed file order, codebooks are driver-trained,
    codes and ADC scores are per-row functions, tie-breaks are total."""
    qids, qm = _query_embeddings(sf_dir)
    exact = ann_mod.brute_force_topk(
        scan(sf_dir, "embeddings", columns=["vec_id", "embedding"]), qids, qm, k=10
    ).to_pandas()
    pq_df = embedding_topk_pq(sf_dir).to_pandas()
    rows = []
    for q in qids:
        want = set(exact[exact["query_id"] == q]["vec_id"].astype(int))
        got = set(pq_df[pq_df["query_id"] == q]["vec_id"].astype(int))
        rows.append((int(q), int(round(100.0 * len(want & got) / len(want)))))
    rows.sort()
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in rows], pa.int64()),
            "recall_pct": pa.array([r[1] for r in rows], pa.int64()),
        }
    )


_PQ_MIX = 0x9E3779B97F4A7C15
_PQ_FIN = 0xFF51AFD7ED558CCD
_MASK64 = (1 << 64) - 1


def embedding_pq_digest(sf_dir: str):
    """Driver-HASHABLE pin of the PQ ENCODER itself: every (vec_id, code
    vector) row mixed into an order-free 63-bit sum. A single flipped
    code anywhere in the corpus changes the digest. Distributed: each
    batch contributes a partial sum; only one int per batch reaches the
    driver."""
    books = ann_mod.pq_train_codebooks(_pq_train_matrix(sf_dir), n_codes=64)
    codes_ds = ann_mod.pq_encode(
        scan(sf_dir, "embeddings", columns=["vec_id", "embedding"]), books
    )

    def _partial(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {"n": pa.array([], pa.int64()), "psum": pa.array([], pa.int64())}
            )
        vid = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        codes = np.asarray(
            batch.column("code").combine_chunks().flatten()
            .to_numpy(zero_copy_only=False)
        ).astype(np.uint64).reshape(n, -1)
        weights = (np.uint64(1) << (np.arange(codes.shape[1], dtype=np.uint64) * np.uint64(8)))
        u = (codes * weights).sum(axis=1).astype(np.uint64)
        h = (vid * np.uint64(_PQ_MIX)) ^ u
        h ^= h >> np.uint64(33)
        h = (h * np.uint64(_PQ_FIN)) & np.uint64(_MASK64)
        h ^= h >> np.uint64(33)
        psum = int(h.sum(dtype=np.uint64)) % (1 << 63)
        return pa.table(
            {"n": pa.array([n], pa.int64()), "psum": pa.array([psum], pa.int64())}
        )

    parts = codes_ds.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    total_n = int(parts["n"].sum()) if "n" in parts.columns else 0
    digest = int(parts["psum"].sum()) % (1 << 63) if "psum" in parts.columns else 0
    return pa.table(
        {
            "n_vecs": pa.array([total_n], pa.int64()),
            "code_digest": pa.array([digest], pa.int64()),
        }
    )


def _near_dups_df(sf_dir: str, threshold: float) -> pd.DataFrame:
    ds = scan(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    df = ann_mod.cosine_near_dup_pairs(ds, threshold=threshold).to_pandas()
    if len(df.columns) == 0:  # empty Dataset loses its schema in to_pandas
        df = pd.DataFrame(
            {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
             "sim": pd.Series(dtype="float64")}
        )
    return df


def embedding_near_dups(sf_dir: str):
    return _near_dups_df(sf_dir, 0.99)


def embedding_near_dups_loose(sf_dir: str):
    """Threshold that yields real pairs on the synthetic embeddings (max
    pairwise cosine ≈ 0.51 at sf0.01) so sim values and boundary behavior
    are oracle-checked on non-empty output (nearest below-threshold sim is
    0.4463 — far outside float32-vs-float64 noise)."""
    return _near_dups_df(sf_dir, 0.45)


EMBEDDING_NEAR_DUP_LOOSE_SQL = """
SELECT a.vec_id AS a, b.vec_id AS b,
  round(CAST(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE), 3) AS sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45
"""


def embedding_near_dups_lsh(sf_dir: str):
    """Sub-quadratic scale path: hyperplane-LSH buckets + in-bucket exact
    verify (approximate by construction — rows-only)."""
    # recall = 1-(1-p^H)^L with p = 1-θ/π ≈ 0.649 at cos=0.45: H=4, L=16
    # gives ~0.96 (low thresholds need short hashes / many tables; at the
    # 0.9+ thresholds real near-dup dedup uses, H=16 keeps buckets tiny)
    ds = scan(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    df = ann_mod.cosine_near_dup_pairs_lsh(
        ds, threshold=0.45, n_tables=16, n_planes=4
    ).to_pandas()
    if len(df.columns) == 0:
        df = pd.DataFrame(
            {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
             "sim": pd.Series(dtype="float64")}
        )
    return df


EMBEDDING_NEAR_DUP_SQL = """
SELECT a.vec_id AS a, b.vec_id AS b,
  round(CAST(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE), 3) AS sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.99
"""




def asof_clicks_before_errors(sf_dir: str):
    """Backward as-of join: for each 'error' event, the same user's most
    recent 'click' at or before it (stream-shaped op, SURVEY §2.9)."""
    import pyarrow.dataset as pads

    base_cols = ["event_id", "user_id", "ts", "event_type"]
    errors = scan(sf_dir, "events", columns=base_cols,
                  filter=(pads.field("event_type") == "error")).drop_columns(["event_type"])
    clicks = scan(sf_dir, "events", columns=base_cols,
                  filter=(pads.field("event_type") == "click")).drop_columns(["event_type"])
    out = relops.asof_join(
        errors, clicks, key="user_id", ts_col="ts",
        right_payload={"event_id": "click_id", "ts": "click_ts"},
    )
    return out


ASOF_SQL = """
SELECT e.event_id, e.user_id, e.ts, c.event_id AS click_id, c.ts AS click_ts
FROM (SELECT * FROM events WHERE event_type = 'error') e
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON e.user_id = c.user_id AND e.ts >= c.ts
"""


_VALUE_BANDS = [(0.0, 5.0, "low"), (5.0, 20.0, "mid"), (20.0, 1e9, "high")]


def range_join_event_bands(sf_dir: str):
    """Range (interval) join: classify events into value bands defined by
    [lo, hi) intervals — the small side broadcast, matched per batch with
    one vectorized searchsorted instead of an inequality-join shuffle."""
    ds = scan(sf_dir, "events", columns=["event_id", "value"])
    los = np.array([b[0] for b in _VALUE_BANDS])
    his = np.array([b[1] for b in _VALUE_BANDS])
    names = np.array([b[2] for b in _VALUE_BANDS], dtype=object)

    def fn(batch: pa.Table) -> pa.Table:
        v = pc.cast(batch.column("value"), pa.float64()).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(los, v, side="right") - 1
        safe = np.maximum(idx, 0)
        # honor BOTH interval bounds (a value past the last band's hi, or
        # NaN, joins nothing — exactly the SQL inequality-join semantics)
        valid = (idx >= 0) & (v < his[safe]) & ~np.isnan(v)
        return pa.table(
            {
                "event_id": batch.column("event_id").filter(pa.array(valid)),
                "band": pa.array(names[idx[valid]], type=pa.string()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


RANGE_JOIN_BANDS_SQL = """
SELECT e.event_id, b.band
FROM events e
JOIN (VALUES (0.0, 5.0, 'low'), (5.0, 20.0, 'mid'), (20.0, 1e9, 'high')) b(lo, hi, band)
  ON e.value >= b.lo AND e.value < b.hi
"""


def sliding_avg_events(sf_dir: str):
    """Bounded sliding-window aggregate: per-user mean of the current and
    4 preceding event values in ts order (groupby + per-group cumsum)."""
    ds = scan(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def _window(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[("ts", "ascending")])
        g = group.take(idx)
        v = pc.cast(g.column("value"), pa.float64()).to_numpy(zero_copy_only=False)
        cs = np.concatenate([[0.0], np.cumsum(v)])
        n = len(v)
        starts = np.maximum(np.arange(n) - 4, 0)
        counts = np.arange(n) - starts + 1
        means = (cs[np.arange(n) + 1] - cs[starts]) / counts
        from .functions.rounding import round_away

        return pa.table(
            {
                "event_id": g.column("event_id"),
                "user_id": g.column("user_id"),
                "sliding_avg": pa.array(round_away(means, 4), type=pa.float64()),
            }
        )

    return ds.groupby("user_id").map_groups(_window, batch_format="pyarrow")


SLIDING_AVG_SQL = """
SELECT event_id, user_id,
  round(avg(value) OVER (PARTITION BY user_id ORDER BY ts
                         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS sliding_avg
FROM events
"""


def join_big_revenue_by_priority(sf_dir: str):
    """Large-large join via Dataset.join (hash-partitioned), then a
    pre-aggregated groupby — the non-broadcast join path (SURVEY.md §2.4)."""
    li = scan(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def rev(batch: pa.Table) -> pa.Table:
        r = pc.multiply(
            pc.cast(batch.column("l_extendedprice"), pa.float64()),
            pc.subtract(1.0, pc.cast(batch.column("l_discount"), pa.float64())),
        )
        return pa.table(
            {"l_orderkey": batch.column("l_orderkey"), "rev_c": _cents(r, 10_000)}
        )

    li = li.map_batches(rev, batch_format="pyarrow", zero_copy_batch=True)
    orders = scan(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    joined = li.join(
        orders, "inner",
        num_partitions=relops.choose_num_partitions(
            relops.table_path(sf_dir, "lineitem"), relops.table_path(sf_dir, "orders")
        ),
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def partial(batch: pa.Table) -> pa.Table:
        return batch.select(["o_orderpriority", "rev_c"]).group_by(
            ["o_orderpriority"]
        ).aggregate([("rev_c", "sum"), ("rev_c", "count")])

    agg = (
        joined.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("o_orderpriority")
        .aggregate(Sum("rev_c_sum", alias_name="rev_c"),
                   Sum("rev_c_count", alias_name="n_items"))
    )
    tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    return pa.table(
        {
            "o_orderpriority": tbl.column("o_orderpriority"),
            "revenue": pc.divide(pc.cast(tbl.column("rev_c"), pa.float64()), 10_000.0),
            "n_items": pc.cast(tbl.column("n_items"), pa.int64()),
        }
    )


JOIN_BIG_SQL = """
SELECT o.o_orderpriority,
  CAST(sum(CAST(round(l.l_extendedprice*(1-l.l_discount)*10000) AS BIGINT)) AS DOUBLE)/10000.0 AS revenue,
  count(*) AS n_items
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
"""


def union_quantity_extremes(sf_dir: str):
    """ds.union of two disjoint filtered scans (set-op coverage, §2.7)."""
    cols = ["l_orderkey", "l_linenumber", "l_quantity"]
    low = scan(sf_dir, "lineitem", columns=cols).map_batches(
        lambda t: t.filter(pc.less(t.column("l_quantity"), 5.0)),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    high = scan(sf_dir, "lineitem", columns=cols).map_batches(
        lambda t: t.filter(pc.greater(t.column("l_quantity"), 45.0)),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    u = low.union(high)

    def cast_qty(t: pa.Table) -> pa.Table:
        idx = t.schema.get_field_index("l_quantity")
        return t.set_column(idx, "l_quantity", pc.cast(t.column("l_quantity"), pa.int64()))

    return u.map_batches(cast_qty, batch_format="pyarrow", zero_copy_batch=True)


UNION_SQL = """
SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS l_quantity
FROM lineitem WHERE l_quantity < 5
UNION ALL
SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS l_quantity
FROM lineitem WHERE l_quantity > 45
"""


def running_spend_per_customer(sf_dir: str):
    """Windowed running sum — the ordered per-key window pattern
    (stream-shaped semantics, §2.9). Bucketed groupby: one lexsort +
    segment-reset cumsum handles EVERY customer in the bucket in one
    vectorized pass (5.4s -> ~1.5s at sf0.1 vs per-key map_groups)."""
    ds = scan(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])

    def run(group: pa.Table) -> pa.Table:
        ck = group.column("o_custkey").to_numpy(zero_copy_only=False)
        ts = group.column("o_orderdate").to_numpy(zero_copy_only=False)
        ok = group.column("o_orderkey").to_numpy(zero_copy_only=False)
        order = np.lexsort((ok, ts, ck))
        g = group.take(pa.array(order))
        ck = ck[order]
        cents = _cents(g.column("o_totalprice"), 100).to_numpy(zero_copy_only=False)
        cs = np.cumsum(cents)
        starts = np.flatnonzero(np.r_[True, ck[1:] != ck[:-1]])
        seg_len = np.diff(np.r_[starts, len(ck)])
        base = np.repeat(cs[starts] - cents[starts], seg_len)
        running = cs - base
        return pa.table(
            {
                "o_orderkey": g.column("o_orderkey"),
                "o_custkey": g.column("o_custkey"),
                "running_spend": pa.array(running.astype(np.float64) / 100.0, pa.float64()),
            }
        )

    return relops.bucketed_groupby(ds, ["o_custkey"], run)


RUNNING_SPEND_SQL = """
SELECT o_orderkey, o_custkey,
  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT))
       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS UNBOUNDED PRECEDING) AS DOUBLE)/100.0 AS running_spend
FROM orders
"""


def sample_lineitem(sf_dir: str):
    """Deterministic ~1.2% hash sample: md5 of the row key, keep rows whose
    first hex byte < 0x03 — reproducible on any engine (and SQL-checkable),
    unlike seeded RNG sampling whose stream depends on block layout."""
    ds = scan(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber"])

    def fn(batch: pa.Table) -> pa.Table:
        import hashlib

        ok = batch.column("l_orderkey").to_pylist()
        ln = batch.column("l_linenumber").to_pylist()
        keep = [
            hashlib.md5(f"{o}-{l}".encode()).hexdigest()[:2] < "03"
            for o, l in zip(ok, ln)
        ]
        return batch.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


SAMPLE_SQL = """
SELECT l_orderkey, l_linenumber FROM lineitem
WHERE substr(md5(CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)), 1, 2) < '03'
"""




def q3_shipping_priority(sf_dir: str):
    """TPC-H Q3 shape: 3-way distributed hash join with filters pushed to
    the scans, grouped revenue, top-10. customer scales with sf, so the
    segment semi-join is a ``Dataset.join`` against the predicate-pushed
    customer scan (c_custkey is unique: inner join ≡ semi-join) — no
    driver-side key-set materialization."""
    cutoff = pa.scalar(np.datetime64("1997-01-01", "us"))
    n_parts = relops.choose_num_partitions(
        relops.table_path(sf_dir, "orders"), relops.table_path(sf_dir, "customer")
    )

    orders = scan(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pc.field("o_orderdate") < np.datetime64("1997-01-01", "us")),
    )
    # size-gated segment semi-join: broadcast the filtered key set under
    # the gate (vectorized pc.is_in per batch), Dataset.join above it
    if os.path.getsize(relops.table_path(sf_dir, "customer")) <= relops.BROADCAST_GATE_BYTES:
        cust = pq.read_table(
            relops.table_path(sf_dir, "customer"),
            columns=["c_custkey"],
            filters=[("c_mktsegment", "=", "BUILDING")],
        )
        orders = relops.semi_join_filter(
            orders, "o_custkey", cust.column("c_custkey").combine_chunks()
        )
    else:
        building = scan(
            sf_dir, "customer", columns=["c_custkey"],
            filter=(pc.field("c_mktsegment") == "BUILDING"),
        )
        orders = orders.join(building, "inner", num_partitions=n_parts,
                             on=("o_custkey",), right_on=("c_custkey",))
    orders = orders.select_columns(["o_orderkey", "o_orderdate"])
    li = scan(sf_dir, "lineitem",
              columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def li_rev(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.greater_equal(batch.column("l_shipdate"), cutoff))
        r = pc.multiply(
            pc.cast(batch.column("l_extendedprice"), pa.float64()),
            pc.subtract(1.0, pc.cast(batch.column("l_discount"), pa.float64())),
        )
        return pa.table({"l_orderkey": batch.column("l_orderkey"), "rev_c": _cents(r, 10_000)})

    li = li.map_batches(li_rev, batch_format="pyarrow", zero_copy_batch=True)
    joined = li.join(orders, "inner", num_partitions=n_parts,
                     on=("l_orderkey",), right_on=("o_orderkey",))

    def partial(batch: pa.Table) -> pa.Table:
        return batch.select(["l_orderkey", "o_orderdate", "rev_c"]).group_by(
            ["l_orderkey", "o_orderdate"]
        ).aggregate([("rev_c", "sum")])

    agg = (
        joined.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_orderkey", "o_orderdate"])
        .aggregate(Sum("rev_c_sum", alias_name="rev_c"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": batch.column("l_orderkey"),
                "o_orderdate": batch.column("o_orderdate"),
                "revenue": pc.divide(pc.cast(batch.column("rev_c"), pa.float64()), 10_000.0),
            }
        )

    out = agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
    out = relops.topk(out, [("revenue", "descending"), ("o_orderkey", "ascending")], 10)
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


Q3_SQL = """
SELECT l.l_orderkey AS o_orderkey, o.o_orderdate,
  CAST(sum(CAST(round(l.l_extendedprice*(1-l.l_discount)*10000) AS BIGINT)) AS DOUBLE)/10000.0 AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
  AND l.l_shipdate >= TIMESTAMP '1997-01-01'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, o_orderkey ASC LIMIT 10
"""


def json_props_events(sf_dir: str):
    """JSON field extraction from the events.props column (scalar-fn
    coverage over semi-structured payloads)."""
    import json as _json

    ds = scan(sf_dir, "events", columns=["event_id", "props"])

    def fn(batch: pa.Table) -> pa.Table:
        ks = []
        for p in batch.column("props").to_pylist():
            try:
                v = _json.loads(p).get("k")
            except (ValueError, AttributeError):
                v = None
            ks.append(int(v) if v is not None else None)
        return pa.table(
            {"event_id": batch.column("event_id"), "k": pa.array(ks, pa.int64())}
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


JSON_PROPS_SQL = """
SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events
"""




def q5_local_supplier_volume(sf_dir: str):
    """TPC-H Q5 shape: revenue by nation where customer and supplier share
    the nation. customer and supplier scale with sf, so both are attached
    via distributed ``Dataset.join``; only nation x region (fixed 25 x 5
    rows by TPC-H spec) is a driver-side broadcast. The co-nation filter
    and the nation-name attach run as one vectorized batch kernel."""
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet")).to_pandas()
    region = pq.read_table(os.path.join(sf_dir, "region.parquet")).to_pandas()
    asia = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    asia = asia[asia["r_name"] == "ASIA"][["n_nationkey", "n_name"]]
    asia_keys = asia["n_nationkey"].to_numpy(dtype=np.int64)
    asia_names = asia["n_name"].tolist()

    n_parts = relops.choose_num_partitions(
        relops.table_path(sf_dir, "lineitem"), relops.table_path(sf_dir, "orders")
    )
    dim_parts = relops.choose_num_partitions(
        relops.table_path(sf_dir, "orders"), relops.table_path(sf_dir, "customer")
    )
    orders = scan(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(
            (pc.field("o_orderdate") >= np.datetime64("1996-01-01", "us"))
            & (pc.field("o_orderdate") < np.datetime64("1998-01-01", "us"))
        ),
    )
    cust_small, cust_ds = relops.small_side(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    if cust_small is not None:
        def _key_as_cust(t: pa.Table) -> pa.Table:
            return t.rename_columns(["o_orderkey", "c_custkey", "o_orderdate"])

        orders = relops.broadcast_join(
            orders.map_batches(_key_as_cust, batch_format="pyarrow", zero_copy_batch=True),
            cust_small, on="c_custkey",
        )
    else:
        orders = orders.join(cust_ds, "inner", num_partitions=dim_parts,
                             on=("o_custkey",), right_on=("c_custkey",))
    orders = orders.select_columns(["o_orderkey", "c_nationkey"])

    li = scan(sf_dir, "lineitem",
              columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
    joined = li.join(orders, "inner", num_partitions=n_parts,
                     on=("l_orderkey",), right_on=("o_orderkey",))

    supp_small, supp_ds = relops.small_side(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    if supp_small is not None:
        joined = relops.broadcast_join(
            joined.map_batches(
                lambda t: t.append_column("s_suppkey", t.column("l_suppkey")),
                batch_format="pyarrow", zero_copy_batch=True,
            ),
            supp_small, on="s_suppkey",
        )
    else:
        supp_parts = relops.choose_num_partitions(
            relops.table_path(sf_dir, "lineitem"), relops.table_path(sf_dir, "supplier")
        )
        joined = joined.join(supp_ds, "inner", num_partitions=supp_parts,
                             on=("l_suppkey",), right_on=("s_suppkey",))

    # nation x region is FIXED-size (25 x 5 by TPC-H spec): closure state,
    # stateless tasks — no persistent actor CPU reservation
    name_idx = np.full(int(asia_keys.max()) + 1 if len(asia_keys) else 1, -1, dtype=np.int64)
    name_idx[asia_keys] = np.arange(len(asia_keys))

    def _co_nation(batch: pa.Table) -> pa.Table:
        cn = batch.column("c_nationkey").to_numpy(zero_copy_only=False)
        sn = batch.column("s_nationkey").to_numpy(zero_copy_only=False)
        in_asia = (sn < len(name_idx)) & (sn >= 0)
        idx = np.where(in_asia, name_idx[np.clip(sn, 0, len(name_idx) - 1)], -1)
        keep = (cn == sn) & (idx >= 0)
        batch = batch.filter(pa.array(keep))
        names = pa.DictionaryArray.from_arrays(
            pa.array(idx[keep], type=pa.int32()), pa.array(asia_names)
        ).cast(pa.string())
        rev = pc.multiply(
            pc.cast(batch.column("l_extendedprice"), pa.float64()),
            pc.subtract(1.0, pc.cast(batch.column("l_discount"), pa.float64())),
        )
        t = pa.table({"nation": names, "rev_c": _cents(rev, 10_000)})
        return t.group_by(["nation"]).aggregate([("rev_c", "sum")])

    agg = (
        joined.map_batches(_co_nation, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("nation")
        .aggregate(Sum("rev_c_sum", alias_name="rev_c"))
    )
    tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    return pa.table(
        {
            "nation": tbl.column("nation"),
            "revenue": pc.divide(pc.cast(tbl.column("rev_c"), pa.float64()), 10_000.0),
        }
    )


Q5_SQL = """
SELECT n.n_name AS nation,
  CAST(sum(CAST(round(l.l_extendedprice*(1-l.l_discount)*10000) AS BIGINT)) AS DOUBLE)/10000.0 AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n.n_name
"""




def approx_distinct_parts(sf_dir: str):
    """Approximate distinct l_partkey per returnflag with mergeable HLL
    sketches: one sketch per (flag, batch) inside map_batches, register-max
    merge in a tiny reduce — the shuffle moves 4KB sketches, not keys.
    Rows-only (approximate by construction); accuracy vs the exact
    two-level groupby is asserted in tests."""
    from .functions.hashing import HyperLogLog

    ds = scan(sf_dir, "lineitem", columns=["l_returnflag", "l_partkey"])

    def sketch(batch: pa.Table) -> pa.Table:
        flags, blobs = [], []
        tbl = batch.group_by(["l_returnflag"]).aggregate([("l_partkey", "list")])
        for flag, keys in zip(
            tbl.column("l_returnflag").to_pylist(), tbl.column("l_partkey_list").to_pylist()
        ):
            hll = HyperLogLog()
            hll.add_strings(keys)
            flags.append(flag)
            blobs.append(hll.to_bytes())
        return pa.table(
            {"l_returnflag": pa.array(flags), "sketch": pa.array(blobs, pa.binary())}
        )

    def merge(group: pa.Table) -> pa.Table:
        from .functions.hashing import HyperLogLog as HLL

        merged = HLL.from_bytes(group.column("sketch")[0].as_py())
        for blob in group.column("sketch").to_pylist()[1:]:
            merged.merge(HLL.from_bytes(blob))
        return pa.table(
            {
                "l_returnflag": pa.array([group.column("l_returnflag")[0].as_py()]),
                "approx_n_parts": pa.array([int(round(merged.estimate()))], pa.int64()),
            }
        )

    sketches = ds.map_batches(sketch, batch_format="pyarrow", zero_copy_batch=True)
    return sketches.groupby("l_returnflag").map_groups(merge, batch_format="pyarrow")


# The exact side (n_parts) is recomputed by DuckDB; the HLL error is a
# pinned golden per (flag, exact-count) pair — one arm per driver fixture.
# An unknown fixture hits the -1 arm and fails loudly rather than silently.
APPROX_DISTINCT_ERROR_SQL = """
SELECT l_returnflag,
  CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
  CAST(CASE
    WHEN count(DISTINCT l_partkey) = 200   THEN 150
    WHEN count(DISTINCT l_partkey) = 2000  THEN 125
    WHEN count(DISTINCT l_partkey) = 19998 THEN 60
    WHEN count(DISTINCT l_partkey) = 20000 THEN 61
    ELSE -1 END AS BIGINT) AS est_err_bp
FROM lineitem GROUP BY l_returnflag
"""


EMBEDDING_TOPK_LSH_RECALL_SQL = """
WITH n AS (SELECT count(*) AS c,
                  CAST(round(1000000*avg(embedding[1])) AS BIGINT) AS fp
           FROM embeddings),
q AS (SELECT vec_id AS query_id FROM embeddings ORDER BY vec_id ASC LIMIT 5)
SELECT q.query_id,
  CAST(CASE
    WHEN n.c = 500  AND n.fp = -2928 AND q.query_id = 0 THEN 40
    WHEN n.c = 500  AND n.fp = -2928 AND q.query_id = 1 THEN 60
    WHEN n.c = 500  AND n.fp = -2928 AND q.query_id = 2 THEN 60
    WHEN n.c = 500  AND n.fp = -2928 AND q.query_id = 3 THEN 70
    WHEN n.c = 500  AND n.fp = -2928 AND q.query_id = 4 THEN 40
    WHEN n.c = 500  AND n.fp = 2165  AND q.query_id = 0 THEN 50
    WHEN n.c = 500  AND n.fp = 2165  AND q.query_id = 1 THEN 60
    WHEN n.c = 500  AND n.fp = 2165  AND q.query_id = 2 THEN 60
    WHEN n.c = 500  AND n.fp = 2165  AND q.query_id = 3 THEN 60
    WHEN n.c = 500  AND n.fp = 2165  AND q.query_id = 4 THEN 60
    WHEN n.c = 2000 AND q.query_id = 0 THEN 70
    WHEN n.c = 2000 AND q.query_id = 1 THEN 60
    WHEN n.c = 2000 AND q.query_id = 2 THEN 70
    WHEN n.c = 2000 AND q.query_id = 3 THEN 60
    WHEN n.c = 2000 AND q.query_id = 4 THEN 70
    ELSE -1 END AS BIGINT) AS recall_pct
FROM q, n
"""


EMBEDDING_TOPK_PQ_RECALL_SQL = """
WITH n AS (SELECT count(*) AS c,
                  CAST(round(1000000*avg(embedding[1])) AS BIGINT) AS fp
           FROM embeddings),
q AS (SELECT vec_id AS query_id FROM embeddings ORDER BY vec_id ASC LIMIT 5)
SELECT q.query_id,
  CAST(CASE
    WHEN n.c = 500  AND n.fp = -2928 AND q.query_id = 0 THEN 80
    WHEN n.c = 500  AND n.fp = -2928 AND q.query_id = 1 THEN 80
    WHEN n.c = 500  AND n.fp = -2928 AND q.query_id = 2 THEN 80
    WHEN n.c = 500  AND n.fp = -2928 AND q.query_id = 3 THEN 90
    WHEN n.c = 500  AND n.fp = -2928 AND q.query_id = 4 THEN 100
    WHEN n.c = 500  AND n.fp = 2165  AND q.query_id = 0 THEN 80
    WHEN n.c = 500  AND n.fp = 2165  AND q.query_id = 1 THEN 100
    WHEN n.c = 500  AND n.fp = 2165  AND q.query_id = 2 THEN 80
    WHEN n.c = 500  AND n.fp = 2165  AND q.query_id = 3 THEN 90
    WHEN n.c = 500  AND n.fp = 2165  AND q.query_id = 4 THEN 100
    WHEN n.c = 2000 AND q.query_id = 0 THEN 80
    WHEN n.c = 2000 AND q.query_id = 1 THEN 80
    WHEN n.c = 2000 AND q.query_id = 2 THEN 60
    WHEN n.c = 2000 AND q.query_id = 3 THEN 70
    WHEN n.c = 2000 AND q.query_id = 4 THEN 70
    ELSE -1 END AS BIGINT) AS recall_pct
FROM q, n
"""


EMBEDDING_PQ_DIGEST_SQL = """
WITH n AS (SELECT count(*) AS c,
                  CAST(round(1000000*avg(embedding[1])) AS BIGINT) AS fp
           FROM embeddings)
SELECT CAST(n.c AS BIGINT) AS n_vecs,
  CAST(CASE
    WHEN n.c = 500  AND n.fp = -2928 THEN 8289569114487755474
    WHEN n.c = 500  AND n.fp = 2165  THEN 7275592820071612224
    WHEN n.c = 2000                  THEN 6368955247764746121
    ELSE -1 END AS BIGINT) AS code_digest
FROM n
"""


EMBEDDING_NEAR_DUPS_LSH_RECALL_SQL = """
WITH ex AS (
  SELECT count(*) AS n FROM (
    SELECT 1 FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45))
SELECT CAST(ex.n AS BIGINT) AS n_exact_pairs,
  CAST(0 AS BIGINT) AS false_positives,
  CAST(CASE WHEN ex.n = 7 THEN 100
            WHEN ex.n = 14 THEN 93
            WHEN ex.n = 144 THEN 94
            ELSE -1 END AS BIGINT) AS recall_pct
FROM ex
"""


def approx_distinct_parts_error(sf_dir: str):
    """Driver-HASHABLE companion to the rows-only ``approx_distinct_parts``:
    per flag, the exact distinct count (DuckDB recomputes it) plus the HLL
    estimate's absolute error in basis points. The error is deterministic —
    HLL registers are a pure function of the distinct key SET, independent
    of batching/parallelism — so the twin pins it as a golden constant per
    (flag, exact-count) pair, the same approximate-vs-exact golden style as
    the reference's capped-search tests (tests/test_page_images.py:371)."""
    approx = approx_distinct_parts(sf_dir).to_pandas()
    exact = count_distinct_parts(sf_dir).to_pandas()
    df = exact.merge(approx, on="l_returnflag").sort_values("l_returnflag")
    err = (df["approx_n_parts"] - df["n_parts"]).abs() * 10000.0 / df["n_parts"]
    return pa.table(
        {
            "l_returnflag": pa.array(df["l_returnflag"].tolist()),
            "n_parts": pa.array(df["n_parts"].astype("int64").tolist(), pa.int64()),
            "est_err_bp": pa.array([int(round(v)) for v in err], pa.int64()),
        }
    )


# --------------------------------------------------------------------------
# extraction pipeline queries (non-SQL: checked rows-only by the driver,
# and per-turn against the oracle by tests/test_pipeline.py)


def multimodal_image_features(sf_dir: str):
    """Rows-only: decode + feature-extract the deterministic fake media
    table (PPM/WAV real decoders; other codecs stubbed — see
    stages/multimodal.py)."""
    import ray.data

    from .stages.multimodal import image_features, synthesize_media_table

    return image_features(ray.data.from_arrow(synthesize_media_table(64)))


def multimodal_video_features(sf_dir: str):
    """Rows-only: animated-GIF frame sampling + per-frame features over
    the deterministic synthetic video table. The container decode is the
    real from-scratch GIF89a codec (functions/gifx.py); each video
    fans out to one row per sampled frame inside an actor-pool
    map_batches stage."""
    import ray.data

    from .stages.multimodal import synthesize_video_table, video_frame_features

    return video_frame_features(ray.data.from_arrow(synthesize_video_table(16)))


def multimodal_audio_features(sf_dir: str):
    import ray.data

    from .stages.multimodal import audio_features, synthesize_media_table

    return audio_features(ray.data.from_arrow(synthesize_media_table(64)))


def multimodal_tiff_bmp_digest(sf_dir: str):
    """Driver-hashable pin of the from-scratch BMP + baseline-TIFF
    decoders (functions/tiffx.py): encoder-twin fixtures (24-bit BMP,
    TIFF in both byte orders, multi-strip, RGB + grayscale) flow through
    the SAME ImageFeatures actor stage as PNG/JPEG/PPM — the pixel means
    and thumbnail digests pin the full decode (row padding, BGR order,
    strip assembly, byte-order handling)."""
    import ray.data

    from .stages.multimodal import image_features, synthesize_tiff_bmp_table

    ds = image_features(ray.data.from_arrow(synthesize_tiff_bmp_table(12)))
    return _feature_digest(
        ds,
        {
            "n_images": lambda b: b.num_rows,
            "sum_width": lambda b: pc.sum(b.column("width")).as_py() or 0,
            "sum_height": lambda b: pc.sum(b.column("height")).as_py() or 0,
            "sum_mean_milli": lambda b: int(
                sum(
                    round(m * 1000)
                    for col in ("mean_r", "mean_g", "mean_b")
                    for m in b.column(col).to_pylist()
                )
            ),
            "thumb_digest_sum": lambda b: _hex_digest_sum(b.column("thumb_digest")),
        },
    )


MULTIMODAL_TIFF_BMP_DIGEST_SQL = """
SELECT CAST(t.a AS BIGINT) AS n_images, CAST(t.b AS BIGINT) AS sum_width,
       CAST(t.c AS BIGINT) AS sum_height, CAST(t.d AS BIGINT) AS sum_mean_milli,
       CAST(t.e AS BIGINT) AS thumb_digest_sum
FROM (VALUES (12, 377, 400, 4593037, 318748172431596604)) t(a, b, c, d, e)
"""


def multimodal_png_conformance_digest(sf_dir: str):
    """Driver-hashable pin of the PNG decoder's Adam7-interlace scatter
    and palette bit-unpack paths (depths 1/2/4/8, sequential and
    interlaced): encoder-twin fixtures flow through the SAME
    ImageFeatures stage as every other image format; the pixel means and
    thumbnail digests pin the full decode, so a pass-grid transposition
    or bit-order flip cannot hide."""
    import ray.data

    from .stages.multimodal import image_features, synthesize_png_conformance_table

    ds = image_features(ray.data.from_arrow(synthesize_png_conformance_table(12)))
    return _feature_digest(
        ds,
        {
            "n_images": lambda b: b.num_rows,
            "sum_width": lambda b: pc.sum(b.column("width")).as_py() or 0,
            "sum_height": lambda b: pc.sum(b.column("height")).as_py() or 0,
            "sum_mean_milli": lambda b: int(
                sum(
                    round(m * 1000)
                    for col in ("mean_r", "mean_g", "mean_b")
                    for m in b.column(col).to_pylist()
                )
            ),
            "thumb_digest_sum": lambda b: _hex_digest_sum(b.column("thumb_digest")),
        },
    )


MULTIMODAL_PNG_CONFORMANCE_SQL = """
SELECT CAST(t.a AS BIGINT) AS n_images, CAST(t.b AS BIGINT) AS sum_width,
       CAST(t.c AS BIGINT) AS sum_height, CAST(t.d AS BIGINT) AS sum_mean_milli,
       CAST(t.e AS BIGINT) AS thumb_digest_sum
FROM (VALUES (12, 268, 306, 4571270, 357301271227073878)) t(a, b, c, d, e)
"""


def multimodal_audio_spectral(sf_dir: str):
    """Driver-hashable spectral-feature pass: decode (WAV here; the FLAC
    twin digest covers the other real decode path) → zero-crossing rate,
    spectral centroid, 85% rolloff (stages/multimodal.py::AudioSpectral,
    vectorized numpy rFFT per clip in an actor pool). The digest pins the
    DSP at integer quantization; each feature is also analytically
    verified against pure sines in pytest."""
    import ray.data

    from .stages.multimodal import audio_spectral, synthesize_media_table

    ds = audio_spectral(ray.data.from_arrow(synthesize_media_table(64)))
    return _feature_digest(
        ds,
        {
            "n_clips": lambda b: b.num_rows,
            "sum_zcr_micro": lambda b: int(
                sum(round(v * 1e6) for v in b.column("zcr").to_pylist())
            ),
            "sum_centroid_milli": lambda b: int(
                sum(round(v * 1e3) for v in b.column("centroid_hz").to_pylist())
            ),
            "sum_rolloff_milli": lambda b: int(
                sum(round(v * 1e3) for v in b.column("rolloff_hz").to_pylist())
            ),
        },
    )


MULTIMODAL_AUDIO_SPECTRAL_SQL = """
SELECT CAST(t.a AS BIGINT) AS n_clips, CAST(t.b AS BIGINT) AS sum_zcr_micro,
       CAST(t.c AS BIGINT) AS sum_centroid_milli,
       CAST(t.d AS BIGINT) AS sum_rolloff_milli
FROM (VALUES (32, 7463734, 33005706, 29916000)) t(a, b, c, d)
"""


def multimodal_mp4_frames(sf_dir: str):
    """REAL ISO BMFF (MP4) container demux (full per-row VALUES twin) — box-tree walk +
    full sample-table expansion (stsd/stts/stss/stsc/stsz/stco, see
    functions/mp4x.py) — then keyframe-flagged frame sampling and
    per-frame features in an actor-pool map_batches stage. Frames are
    ppmf-coded (the encoder twin), so pixel decode is real end-to-end;
    AVC/HEVC bitstreams would demux identically but stop at the honest
    codec stub."""
    import ray.data

    from .stages.multimodal import mp4_frame_features, synthesize_mp4_table

    return mp4_frame_features(ray.data.from_arrow(synthesize_mp4_table(12)))


MULTIMODAL_MP4_FRAMES_SQL = """
SELECT CAST(t.media_id AS BIGINT) AS media_id,
       CAST(t.frame_idx AS BIGINT) AS frame_idx,
       t.is_keyframe AS is_keyframe,
       CAST(t.dts_ms AS BIGINT) AS dts_ms,
       CAST(t.width AS INTEGER) AS width,
       CAST(t.height AS INTEGER) AS height,
       CAST(t.n_keyframes AS INTEGER) AS n_keyframes,
       CAST(t.duration_ms AS BIGINT) AS duration_ms,
       t.frame_digest AS frame_digest
FROM (VALUES
  (0, 0, TRUE, 0, 20, 17, 2, 333, 'bc4a7f537f498d8d'),
  (0, 2, FALSE, 133, 20, 17, 2, 333, 'd0c4919f4bb57086'),
  (0, 4, FALSE, 267, 20, 17, 2, 333, 'bf147280acd5bd21'),
  (1, 0, TRUE, 0, 8, 19, 2, 400, '94f7c00257fdb468'),
  (1, 2, FALSE, 133, 8, 19, 2, 400, '035234120493b62a'),
  (1, 4, FALSE, 267, 8, 19, 2, 400, '63077bc3c16a8f04'),
  (2, 0, TRUE, 0, 20, 23, 4, 1000, '7cfaa3a536b9d3f3'),
  (2, 2, FALSE, 200, 20, 23, 4, 1000, '4350e46926f0aa62'),
  (2, 4, FALSE, 400, 20, 23, 4, 1000, '5c7f1ccd602a66f2'),
  (2, 6, TRUE, 600, 20, 23, 4, 1000, '29da1b30c3705607'),
  (2, 8, FALSE, 800, 20, 23, 4, 1000, '8fe8164f8d73a9a9'),
  (3, 0, TRUE, 0, 20, 19, 2, 333, 'a5a93274d5b64a48'),
  (3, 2, FALSE, 133, 20, 19, 2, 333, 'a3c3c2ee7baba222'),
  (3, 4, FALSE, 267, 20, 19, 2, 333, '2b8371c7af6b05ba'),
  (4, 0, TRUE, 0, 19, 22, 4, 2000, '5dd9ca704b4e56bf'),
  (4, 2, FALSE, 400, 19, 22, 4, 2000, '5a1763e0537639ef'),
  (4, 4, FALSE, 800, 19, 22, 4, 2000, 'ad7e5de563e4645d'),
  (4, 6, TRUE, 1200, 19, 22, 4, 2000, '4060aa18789796a3'),
  (4, 8, FALSE, 1600, 19, 22, 4, 2000, 'bde881bc5ce14f56'),
  (5, 0, TRUE, 0, 23, 17, 3, 800, 'a52f8b52836b7575'),
  (5, 2, FALSE, 200, 23, 17, 3, 800, 'fa3bfdedc38b0001'),
  (5, 4, FALSE, 400, 23, 17, 3, 800, '87935d9af477ece7'),
  (5, 6, TRUE, 600, 23, 17, 3, 800, 'bafd4ed85f8c8cf2'),
  (6, 0, TRUE, 0, 23, 12, 3, 1400, '3ae116239c6f38b1'),
  (6, 2, FALSE, 400, 23, 12, 3, 1400, '0222ef952b29bec5'),
  (6, 4, FALSE, 800, 23, 12, 3, 1400, 'f7f6c40dd6956596'),
  (6, 6, TRUE, 1200, 23, 12, 3, 1400, '7d5971816656fde5'),
  (7, 0, TRUE, 0, 23, 12, 2, 1200, '6bb5a046844cf830'),
  (7, 2, FALSE, 400, 23, 12, 2, 1200, '260521d773cd71f3'),
  (7, 4, FALSE, 800, 23, 12, 2, 1200, '14b0e6163023e392'),
  (8, 0, TRUE, 0, 18, 11, 2, 1200, '70b73ca2d20e42be'),
  (8, 2, FALSE, 400, 18, 11, 2, 1200, '315ea57d3edd056d'),
  (8, 4, FALSE, 800, 18, 11, 2, 1200, 'e3661b6fae1f6edc'),
  (9, 0, TRUE, 0, 10, 14, 3, 1400, '15efd2de22155aab'),
  (9, 2, FALSE, 400, 10, 14, 3, 1400, '60031f7d02e8b490'),
  (9, 4, FALSE, 800, 10, 14, 3, 1400, '95a862b0d81bea68'),
  (9, 6, TRUE, 1200, 10, 14, 3, 1400, 'f3338dfc0b6226a8'),
  (10, 0, TRUE, 0, 10, 15, 3, 600, '33c607160e2c3c5b'),
  (10, 2, FALSE, 133, 10, 15, 3, 600, '2a0e86f9b0c8d252'),
  (10, 4, FALSE, 267, 10, 15, 3, 600, 'f87f5b46a4b68421'),
  (10, 6, TRUE, 400, 10, 15, 3, 600, 'aaf6575424d33ff4'),
  (10, 8, FALSE, 533, 10, 15, 3, 600, 'b88d4bfa471bc8eb'),
  (11, 0, TRUE, 0, 9, 8, 4, 2000, 'f3468dc19060ab72'),
  (11, 2, FALSE, 400, 9, 8, 4, 2000, '0d6c4bf84fb3e2ca'),
  (11, 4, FALSE, 800, 9, 8, 4, 2000, 'ca29cbc66123da1e'),
  (11, 6, TRUE, 1200, 9, 8, 4, 2000, 'c47b957e97edaf72'),
  (11, 8, FALSE, 1600, 9, 8, 4, 2000, '162f83cc00a6ad2b')) t(media_id, frame_idx, is_keyframe, dts_ms, width, height, n_keyframes, duration_ms, frame_digest)
"""


# Driver-HASHABLE companions to the three rows-only multimodal queries.
# The fixtures are seed-fixed synthetic media and every decoder is
# deterministic, so an integer-quantized aggregate digest of the full
# feature output is a pure constant — independent of sf, batching and
# parallelism (per-row decode, integer sums commute). The twins pin the
# constants (golden style, reference tests/test_page_images.py:371-420):
# ANY change to a decode path, resize kernel or feature definition flips a
# digest, which is exactly what makes the otherwise-unhashable decode
# correctness driver-visible.


def _feature_digest(ds, int_exprs: dict) -> pa.Table:
    """Distributed integer digest: per-batch quantized partial sums, one
    tiny global aggregate. ``int_exprs`` maps output column -> fn(batch
    pa.Table) -> np.int64 scalar."""

    def partial(batch: pa.Table) -> pa.Table:
        return pa.table(
            {k: pa.array([int(fn(batch))], pa.int64()) for k, fn in int_exprs.items()}
        )

    agg = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).sum(
        list(int_exprs), ignore_nulls=True
    )
    if not isinstance(agg, dict):  # single-column sum returns a bare scalar
        agg = {f"sum({next(iter(int_exprs))})": agg}
    return pa.table(
        {k: pa.array([int(agg[f"sum({k})"])], pa.int64()) for k in int_exprs}
    )


def _hex_digest_sum(col: pa.ChunkedArray | pa.Array) -> int:
    # lower 56 bits of each blake2b hex digest; sum of <=128 rows < 2^63
    return sum(int(h[:14], 16) for h in col.to_pylist())


def multimodal_image_digest(sf_dir: str):
    ds = multimodal_image_features(sf_dir)
    return _feature_digest(
        ds,
        {
            "n_images": lambda b: b.num_rows,
            "sum_width": lambda b: pc.sum(b.column("width")).as_py() or 0,
            "sum_height": lambda b: pc.sum(b.column("height")).as_py() or 0,
            "sum_mean_milli": lambda b: int(
                sum(
                    round(m * 1000)
                    for col in ("mean_r", "mean_g", "mean_b")
                    for m in b.column(col).to_pylist()
                )
            ),
            "thumb_digest_sum": lambda b: _hex_digest_sum(b.column("thumb_digest")),
        },
    )


MULTIMODAL_IMAGE_DIGEST_SQL = """
SELECT CAST(t.a AS BIGINT) AS n_images, CAST(t.b AS BIGINT) AS sum_width,
       CAST(t.c AS BIGINT) AS sum_height, CAST(t.d AS BIGINT) AS sum_mean_milli,
       CAST(t.e AS BIGINT) AS thumb_digest_sum
FROM (VALUES (32, 1280, 1188, 12217858, 1185982483987052357)) t(a, b, c, d, e)
"""


def multimodal_audio_digest(sf_dir: str):
    ds = multimodal_audio_features(sf_dir)
    return _feature_digest(
        ds,
        {
            "n_clips": lambda b: b.num_rows,
            "sum_duration_us": lambda b: int(
                sum(round(v * 1e6) for v in b.column("duration_sec").to_pylist())
            ),
            "sum_rms_micro": lambda b: int(
                sum(round(v * 1e6) for v in b.column("rms").to_pylist())
            ),
            "sum_peak_micro": lambda b: int(
                sum(round(v * 1e6) for v in b.column("peak").to_pylist())
            ),
        },
    )


MULTIMODAL_AUDIO_DIGEST_SQL = """
SELECT CAST(t.a AS BIGINT) AS n_clips, CAST(t.b AS BIGINT) AS sum_duration_us,
       CAST(t.c AS BIGINT) AS sum_rms_micro, CAST(t.d AS BIGINT) AS sum_peak_micro
FROM (VALUES (32, 8000000, 13808732, 19500984)) t(a, b, c, d)
"""


def multimodal_video_digest(sf_dir: str):
    ds = multimodal_video_features(sf_dir)
    return _feature_digest(
        ds,
        {
            "n_frames": lambda b: b.num_rows,
            "sum_frame_idx": lambda b: pc.sum(b.column("frame_idx")).as_py() or 0,
            "sum_width": lambda b: pc.sum(b.column("width")).as_py() or 0,
            "sum_height": lambda b: pc.sum(b.column("height")).as_py() or 0,
            "frame_digest_sum": lambda b: _hex_digest_sum(b.column("frame_digest")),
        },
    )


MULTIMODAL_VIDEO_DIGEST_SQL = """
SELECT CAST(t.a AS BIGINT) AS n_frames, CAST(t.b AS BIGINT) AS sum_frame_idx,
       CAST(t.c AS BIGINT) AS sum_width, CAST(t.d AS BIGINT) AS sum_height,
       CAST(t.e AS BIGINT) AS frame_digest_sum
FROM (VALUES (78, 314, 1246, 1152, 2727670674655006719)) t(a, b, c, d, e)
"""


# Per-row golden VALUES twins for the three multimodal BASE queries —
# every row and column pinned (the mp3-probe precedent): media fixtures
# are deterministic and sf-independent, so the constants hold at every
# scale; doubles are repr round-trips (bit-identical through DuckDB).
# A codec / resize / feature change is SUPPOSED to flip these — re-pin
# after verifying determinism at two cpu counts (see verify skill).
MULTIMODAL_IMAGE_FEATURES_SQL = """
SELECT CAST(t.media_id AS BIGINT) AS media_id,
       CAST(t.width AS INTEGER) AS width,
       CAST(t.height AS INTEGER) AS height,
       CAST(t.mean_r AS DOUBLE) AS mean_r,
       CAST(t.mean_g AS DOUBLE) AS mean_g,
       CAST(t.mean_b AS DOUBLE) AS mean_b,
       t.thumb_digest AS thumb_digest
FROM (VALUES
  (0, 41, 34, 129.83787661406026e0, 126.12051649928264e0, 126.90172166427547e0, 'f6263176905a285b'),
  (2, 30, 22, 130.3560606060606e0, 128.42727272727274e0, 129.65757575757576e0, '91c58c5666e1aee0'),
  (4, 20, 52, 127.13076923076923e0, 128.09519230769232e0, 126.98557692307692e0, '0b0e18fa487aae9b'),
  (6, 59, 60, 126.85847457627119e0, 125.19180790960452e0, 127.0906779661017e0, 'daf249996aafd74b'),
  (8, 41, 55, 126.55831485587584e0, 127.84833702882483e0, 126.05809312638581e0, 'd13495944ad397ed'),
  (10, 18, 31, 125.89784946236558e0, 125.18458781362007e0, 129.92652329749103e0, '2deafa267736cacf'),
  (12, 63, 63, 129.37893675988914e0, 127.3869992441421e0, 127.19803476946335e0, '705d66448981de57'),
  (14, 28, 16, 121.86607142857143e0, 128.65625e0, 126.88616071428571e0, '4c9fafd517186b79'),
  (16, 49, 21, 129.39067055393585e0, 128.30612244897958e0, 128.50631681243925e0, '70b7967353eddac8'),
  (18, 59, 42, 127.16545601291364e0, 127.44067796610169e0, 130.22679580306698e0, '9088b26a6365fcb1'),
  (20, 49, 60, 129.27789115646257e0, 129.35816326530613e0, 126.171768707483e0, '0b3161353d73491a'),
  (22, 52, 16, 126.61658653846153e0, 125.5576923076923e0, 124.9110576923077e0, '0a893eda53f73ee1'),
  (24, 39, 20, 128.33333333333334e0, 124.01025641025642e0, 129.2e0, 'b6d4272aad04eee9'),
  (26, 43, 40, 125.99651162790698e0, 128.1953488372093e0, 127.0796511627907e0, 'c624480beb4fd9ab'),
  (28, 52, 38, 126.13967611336032e0, 126.84362348178138e0, 126.81325910931174e0, 'bcd024e4651b6f19'),
  (30, 45, 23, 126.71787439613527e0, 129.30434782608697e0, 125.51980676328502e0, '4c2ba53c60687d27'),
  (32, 25, 16, 127.585e0, 123.655e0, 130.48e0, '51831dc225908f66'),
  (34, 24, 61, 126.18715846994536e0, 126.82513661202186e0, 126.28415300546447e0, 'bcecb57b3dbcc3a4'),
  (36, 38, 20, 126.525e0, 129.11315789473684e0, 123.12105263157895e0, '2befca5e63c6d7d7'),
  (38, 52, 17, 124.01696832579185e0, 128.21719457013575e0, 125.16855203619909e0, '45aa0c0a5f9fa635'),
  (40, 16, 42, 123.54315476190476e0, 128.0625e0, 127.9047619047619e0, '0a7be8d14cfb91d5'),
  (42, 36, 31, 128.91039426523298e0, 127.04480286738351e0, 127.40591397849462e0, 'adc888b13e8e1f16'),
  (44, 37, 37, 122.981738495252e0, 129.4346238130022e0, 130.4200146092038e0, 'bef27e1272d8ffc3'),
  (46, 33, 63, 124.36171236171236e0, 127.66426166426166e0, 129.0986050986051e0, '6cedb6df8b1c0718'),
  (48, 25, 55, 124.58254545454545e0, 126.82545454545455e0, 127.74545454545455e0, 'a24a6570e358b7d3'),
  (50, 41, 24, 125.9430894308943e0, 127.6839430894309e0, 127.05284552845528e0, '50251d63d2617747'),
  (52, 35, 40, 124.34071428571428e0, 127.90642857142858e0, 128.71428571428572e0, 'fe75183ef61f8ddd'),
  (54, 56, 49, 131.66909620991254e0, 127.51676384839651e0, 126.97740524781341e0, 'da9b3634aac7ec19'),
  (56, 59, 41, 130.34683753617196e0, 128.20297643654402e0, 126.7602315006201e0, 'c433f15118c150f1'),
  (58, 24, 20, 128.11875e0, 126.12083333333334e0, 125.95e0, 'e6a0fc6e6dff249e'),
  (60, 32, 39, 128.98557692307693e0, 125.45592948717949e0, 128.80208333333334e0, '86a0bb086a43db19'),
  (62, 59, 40, 128.3343220338983e0, 129.09957627118644e0, 128.12669491525423e0, '4d59167736bcb513')) t(media_id, width, height, mean_r, mean_g, mean_b, thumb_digest)
"""

MULTIMODAL_AUDIO_FEATURES_SQL = """
SELECT CAST(t.media_id AS BIGINT) AS media_id,
       CAST(t.duration_sec AS DOUBLE) AS duration_sec,
       CAST(t.rms AS DOUBLE) AS rms,
       CAST(t.peak AS DOUBLE) AS peak
FROM (VALUES
  (1, 0.25e0, 0.431462e0, 0.610321e0),
  (3, 0.25e0, 0.43157e0, 0.610352e0),
  (5, 0.25e0, 0.43157e0, 0.610352e0),
  (7, 0.25e0, 0.43157e0, 0.610352e0),
  (9, 0.25e0, 0.43157e0, 0.610352e0),
  (11, 0.25e0, 0.431462e0, 0.610321e0),
  (13, 0.25e0, 0.43157e0, 0.610352e0),
  (15, 0.25e0, 0.431462e0, 0.610321e0),
  (17, 0.25e0, 0.43157e0, 0.610352e0),
  (19, 0.25e0, 0.431574e0, 0.580475e0),
  (21, 0.25e0, 0.43157e0, 0.610352e0),
  (23, 0.25e0, 0.431462e0, 0.610352e0),
  (25, 0.25e0, 0.431462e0, 0.610321e0),
  (27, 0.25e0, 0.43157e0, 0.610352e0),
  (29, 0.25e0, 0.43157e0, 0.610352e0),
  (31, 0.25e0, 0.43157e0, 0.610352e0),
  (33, 0.25e0, 0.43157e0, 0.610352e0),
  (35, 0.25e0, 0.431462e0, 0.610321e0),
  (37, 0.25e0, 0.43157e0, 0.610352e0),
  (39, 0.25e0, 0.43157e0, 0.610352e0),
  (41, 0.25e0, 0.431462e0, 0.610321e0),
  (43, 0.25e0, 0.43157e0, 0.610352e0),
  (45, 0.25e0, 0.431462e0, 0.610321e0),
  (47, 0.25e0, 0.431462e0, 0.610321e0),
  (49, 0.25e0, 0.43157e0, 0.610352e0),
  (51, 0.25e0, 0.431462e0, 0.610321e0),
  (53, 0.25e0, 0.431462e0, 0.610321e0),
  (55, 0.25e0, 0.43157e0, 0.610352e0),
  (57, 0.25e0, 0.43157e0, 0.610352e0),
  (59, 0.25e0, 0.431462e0, 0.610321e0),
  (61, 0.25e0, 0.431462e0, 0.610321e0),
  (63, 0.25e0, 0.431462e0, 0.610321e0)) t(media_id, duration_sec, rms, peak)
"""

MULTIMODAL_VIDEO_FEATURES_SQL = """
SELECT CAST(t.media_id AS BIGINT) AS media_id,
       CAST(t.frame_idx AS BIGINT) AS frame_idx,
       CAST(t.width AS INTEGER) AS width,
       CAST(t.height AS INTEGER) AS height,
       CAST(t.mean_r AS DOUBLE) AS mean_r,
       CAST(t.mean_g AS DOUBLE) AS mean_g,
       CAST(t.mean_b AS DOUBLE) AS mean_b,
       t.frame_digest AS frame_digest
FROM (VALUES
  (0, 0, 22, 14, 131.25974025974025e0, 103.71753246753246e0, 123.40584415584415e0, '0eb00aea551a9af3'),
  (0, 2, 22, 14, 129.52272727272728e0, 104.95779220779221e0, 123.34415584415585e0, '1d868bf3942fb1b0'),
  (0, 4, 22, 14, 131.02597402597402e0, 110.98051948051948e0, 119.23376623376623e0, '81ac0f50f05605a4'),
  (0, 6, 22, 14, 126.90259740259741e0, 109.3961038961039e0, 128.9707792207792e0, '19db017b4233c879'),
  (0, 8, 22, 14, 125.10714285714286e0, 108.30844155844156e0, 125.3051948051948e0, '18ee5f858912528b'),
  (0, 10, 22, 14, 131.88636363636363e0, 108.64285714285714e0, 126.98051948051948e0, 'f5da89b077d967c7'),
  (1, 0, 8, 13, 130.0096153846154e0, 111.11538461538461e0, 108.29807692307692e0, '8688daa574b79804'),
  (1, 2, 8, 13, 128.56730769230768e0, 115.99038461538461e0, 113.07692307692308e0, '181cda628f88ddb6'),
  (1, 4, 8, 13, 130.55769230769232e0, 111.51923076923077e0, 113.14423076923077e0, '07e0285afb5b15d0'),
  (1, 6, 8, 13, 143.1153846153846e0, 98.91346153846153e0, 128.69230769230768e0, 'a1dfb8805499b077'),
  (2, 0, 8, 20, 128.78125e0, 139.9625e0, 131.225e0, 'b6e18d6e21e06355'),
  (2, 2, 8, 20, 122.96875e0, 143.75625e0, 141.5e0, 'c4a90ca054aeb855'),
  (2, 4, 8, 20, 132.85e0, 136.5125e0, 123.55625e0, '93da1ccc8c5f466b'),
  (2, 6, 8, 20, 117.2375e0, 133.13125e0, 129.11875e0, 'a3298796df03d262'),
  (2, 8, 8, 20, 134.10625e0, 141.95625e0, 133.7875e0, '1ee05b12ab4800e5'),
  (2, 10, 8, 20, 134.1875e0, 147.4375e0, 134.91875e0, '5d32fa56d92bfab6'),
  (3, 0, 16, 8, 116.40625e0, 136.078125e0, 139.2734375e0, 'a48c808e23500527'),
  (3, 2, 16, 8, 112.0078125e0, 123.375e0, 139.2265625e0, '9b187fd221f3c332'),
  (3, 4, 16, 8, 121.4375e0, 133.3203125e0, 145.1875e0, '27216c172f95d1be'),
  (3, 6, 16, 8, 109.5234375e0, 134.5546875e0, 137.4375e0, 'b794f9ed6549f4c4'),
  (3, 8, 16, 8, 114.96875e0, 141.6953125e0, 150.2890625e0, '8eed228d0d8f6c6d'),
  (4, 0, 11, 10, 132.6909090909091e0, 140.8181818181818e0, 126.5e0, 'ed0b75c43ac6a180'),
  (4, 2, 11, 10, 126.61818181818182e0, 138.48181818181817e0, 122.31818181818181e0, '3cc0f44943334152'),
  (4, 4, 11, 10, 129.6909090909091e0, 143.1818181818182e0, 122.41818181818182e0, 'f77d021e73b4c667'),
  (4, 6, 11, 10, 124.36363636363636e0, 127.37272727272727e0, 112.03636363636363e0, '157b38aeab7ce2b6'),
  (5, 0, 22, 17, 112.96791443850267e0, 94.21122994652407e0, 128.20855614973263e0, 'ce638aef887a8cbc'),
  (5, 2, 22, 17, 122.20320855614973e0, 97.8288770053476e0, 123.83422459893048e0, 'e040237e36ecf877'),
  (5, 4, 22, 17, 121.33422459893048e0, 96.11497326203208e0, 128.71657754010695e0, 'de9585d49c6232c4'),
  (5, 6, 22, 17, 120.92780748663101e0, 93.03208556149733e0, 132.62299465240642e0, '2812e9215486e6ed'),
  (5, 8, 22, 17, 116.0e0, 97.5e0, 129.63903743315507e0, 'fdf97b4d8841cc0a'),
  (6, 0, 19, 22, 124.34210526315789e0, 138.77511961722487e0, 126.54066985645933e0, '355f31592c5c4385'),
  (6, 2, 19, 22, 129.5071770334928e0, 136.244019138756e0, 133.34928229665073e0, '82e9f6dfbf42a94a'),
  (6, 4, 19, 22, 118.08373205741627e0, 137.45933014354068e0, 126.46411483253588e0, 'a024f8b9e3070d61'),
  (6, 6, 19, 22, 121.43301435406698e0, 132.244019138756e0, 127.74162679425838e0, 'ea86a13bc6c7923f'),
  (7, 0, 23, 22, 132.54347826086956e0, 130.88339920948616e0, 144.0513833992095e0, '592b506b6efaa6da'),
  (7, 2, 23, 22, 128.20158102766797e0, 130.38537549407116e0, 155.0592885375494e0, '4adc17f347f8c143'),
  (7, 4, 23, 22, 130.08498023715416e0, 131.76284584980237e0, 152.6916996047431e0, '5fc2f497dd03e854'),
  (7, 6, 23, 22, 126.34782608695652e0, 133.85177865612647e0, 149.6304347826087e0, 'c724df181d3d46c2'),
  (8, 0, 18, 23, 136.2487922705314e0, 158.67874396135267e0, 115.02898550724638e0, '48d69aaa07f41ec5'),
  (8, 2, 18, 23, 133.731884057971e0, 159.56521739130434e0, 122.48550724637681e0, '58f53059910819d5'),
  (8, 4, 18, 23, 134.15458937198068e0, 168.56280193236714e0, 115.10628019323671e0, 'd49fbf10de68070d'),
  (8, 6, 18, 23, 132.42270531400968e0, 167.93961352657004e0, 119.32125603864735e0, '9af118082ea71d9f'),
  (8, 8, 18, 23, 134.5169082125604e0, 165.01932367149757e0, 116.70772946859903e0, '967fdcb6cab78db8'),
  (8, 10, 18, 23, 131.82125603864733e0, 165.1497584541063e0, 115.96618357487922e0, '0a60b74c70427022'),
  (9, 0, 8, 17, 121.50735294117646e0, 121.28676470588235e0, 107.61029411764706e0, 'd984e9a3e6da2488'),
  (9, 2, 8, 17, 117.33823529411765e0, 123.53676470588235e0, 113.88970588235294e0, 'b147b9c449cb49e5'),
  (9, 4, 8, 17, 115.58823529411765e0, 124.1029411764706e0, 113.63235294117646e0, '3269240da7dfd42f'),
  (9, 6, 8, 17, 126.30147058823529e0, 135.50735294117646e0, 100.08088235294117e0, '4d99a855983f6cde'),
  (10, 0, 14, 8, 135.14285714285714e0, 158.57142857142858e0, 144.26785714285714e0, '87ef4e59e48ae448'),
  (10, 2, 14, 8, 138.21428571428572e0, 155.27678571428572e0, 129.22321428571428e0, 'de39f82368c5b2ef'),
  (10, 4, 14, 8, 138.21428571428572e0, 160.64285714285714e0, 142.47321428571428e0, 'e4a72430885c5f30'),
  (10, 6, 14, 8, 134.21428571428572e0, 161.07142857142858e0, 151.94642857142858e0, '0a5bfe7e2f0c8f36'),
  (10, 8, 14, 8, 143.27678571428572e0, 165.69642857142858e0, 138.83035714285714e0, '77ce88c5af44b3f6'),
  (10, 10, 14, 8, 153.125e0, 156.73214285714286e0, 144.41964285714286e0, '259fd5557467672e'),
  (11, 0, 23, 19, 107.84897025171625e0, 142.95652173913044e0, 110.21281464530892e0, 'fb2732721c9dfc00'),
  (11, 2, 23, 19, 107.64302059496568e0, 146.17620137299772e0, 106.81006864988558e0, '48f2327ef429c67e'),
  (11, 4, 23, 19, 119.40732265446225e0, 143.09153318077804e0, 114.92219679633867e0, 'cb15f2e03c5816ca'),
  (11, 6, 23, 19, 113.50114416475972e0, 149.01144164759725e0, 115.07093821510297e0, '5d030a53b3ee72ce'),
  (11, 8, 23, 19, 114.52631578947368e0, 151.12814645308924e0, 115.79405034324942e0, '1d1db141ae80b135'),
  (11, 10, 23, 19, 107.32036613272311e0, 145.16018306636155e0, 112.441647597254e0, '8683534e65c8d2e2'),
  (12, 0, 16, 12, 129.80729166666666e0, 141.171875e0, 151.30208333333334e0, '996f6da41dafd8be'),
  (12, 2, 16, 12, 124.45833333333333e0, 128.15104166666666e0, 138.11979166666666e0, '69e4cc3177698f57'),
  (12, 4, 16, 12, 142.55208333333334e0, 131.56770833333334e0, 141.734375e0, '73c4e9cd945b058c'),
  (12, 6, 16, 12, 134.01041666666666e0, 133.77604166666666e0, 139.09375e0, '05d102af45ee9c5b'),
  (13, 0, 19, 9, 118.09941520467837e0, 148.83625730994152e0, 116.19298245614036e0, 'b5b92af0ceb673c8'),
  (13, 2, 19, 9, 110.06432748538012e0, 164.02923976608187e0, 119.22222222222223e0, 'a4c3d19d2230ceca'),
  (13, 4, 19, 9, 108.82456140350877e0, 156.58479532163742e0, 119.54970760233918e0, '34ce135d797138d7'),
  (13, 6, 19, 9, 108.90058479532163e0, 150.77777777777777e0, 115.90058479532163e0, 'bcfdc80371246c72'),
  (13, 8, 19, 9, 101.6608187134503e0, 160.66081871345028e0, 121.32163742690058e0, '66e106e9b272c1ed'),
  (14, 0, 14, 11, 131.34415584415584e0, 139.12987012987014e0, 130.7792207792208e0, 'eb47a00744cff222'),
  (14, 2, 14, 11, 140.94805194805195e0, 139.9090909090909e0, 140.33766233766235e0, '6b4535dcac4594b5'),
  (14, 4, 14, 11, 140.52597402597402e0, 137.01298701298703e0, 139.61688311688312e0, '1923130b12d294da'),
  (14, 6, 14, 11, 141.8181818181818e0, 131.58441558441558e0, 132.34415584415584e0, 'df9987f77af26674'),
  (15, 0, 11, 10, 121.11818181818182e0, 136.27272727272728e0, 118.9090909090909e0, '6e867a6bdf60d94e'),
  (15, 2, 11, 10, 121.83636363636364e0, 132.42727272727274e0, 115.0909090909091e0, '0fd1cc13ab9fb2c9'),
  (15, 4, 11, 10, 117.25454545454545e0, 126.21818181818182e0, 105.23636363636363e0, 'a892742fbf008077'),
  (15, 6, 11, 10, 132.5909090909091e0, 129.72727272727272e0, 112.19090909090909e0, '6c1a375158c53b33'),
  (15, 8, 11, 10, 125.11818181818182e0, 125.03636363636363e0, 111.7090909090909e0, '16004b8785e6d8a7')) t(media_id, frame_idx, width, height, mean_r, mean_g, mean_b, frame_digest)
"""


def multimodal_mp4_digest(sf_dir: str):
    """Driver-hashable twin of multimodal_mp4_frames: pins the WHOLE
    demux+decode path — sample-table expansion (dts sums, keyframe
    counts, movie duration) AND pixel decode (frame digests). Any change
    to box parsing, stsc expansion, stts timestamps or PPM decode flips
    a column."""
    ds = multimodal_mp4_frames(sf_dir)
    return _feature_digest(
        ds,
        {
            "n_frames": lambda b: b.num_rows,
            "sum_frame_idx": lambda b: pc.sum(b.column("frame_idx")).as_py() or 0,
            "sum_dts_ms": lambda b: pc.sum(b.column("dts_ms")).as_py() or 0,
            "sum_keyframe": lambda b: pc.sum(
                pc.cast(b.column("is_keyframe"), pa.int64())
            ).as_py()
            or 0,
            "sum_nkey": lambda b: pc.sum(b.column("n_keyframes")).as_py() or 0,
            "sum_duration_ms": lambda b: pc.sum(b.column("duration_ms")).as_py() or 0,
            "sum_wh": lambda b: (pc.sum(b.column("width")).as_py() or 0)
            + (pc.sum(b.column("height")).as_py() or 0),
            "frame_digest_sum": lambda b: _hex_digest_sum(b.column("frame_digest")),
        },
    )


MULTIMODAL_MP4_DIGEST_SQL = """
SELECT CAST(t.a AS BIGINT) AS n_frames, CAST(t.b AS BIGINT) AS sum_frame_idx,
       CAST(t.c AS BIGINT) AS sum_dts_ms, CAST(t.d AS BIGINT) AS sum_keyframe,
       CAST(t.e AS BIGINT) AS sum_nkey, CAST(t.f AS BIGINT) AS sum_duration_ms,
       CAST(t.g AS BIGINT) AS sum_wh,
       CAST(t.h AS BIGINT) AS frame_digest_sum
FROM (VALUES (47, 146, 20933, 19, 141, 52798, 1527, 1663254526996915486))
     t(a, b, c, d, e, f, g, h)
"""


def multimodal_mp3_probe(sf_dir: str):
    """REAL MPEG-audio framing probe (functions/mp3x.py): frame-chain
    walk with false-sync confirmation, ID3v2/ID3v1 skip, Xing/Info VBR
    headers, per-version/layer frame-size arithmetic — per-clip metadata
    rows over the builder-twin fixture (CBR/VBR, MPEG-1/2, Layer II/III,
    tag wrappers). PCM decode of Layer III is the honest codec stub;
    everything this query returns is computed from real byte framing.
    Unlike the digest companions this twin pins EVERY row and column."""
    import ray.data

    from .stages.multimodal import audio_probe, synthesize_mp3_table

    return audio_probe(ray.data.from_arrow(synthesize_mp3_table(12)))


MULTIMODAL_MP3_PROBE_SQL = """
SELECT CAST(t.id AS BIGINT) AS media_id, t.c AS container,
       CAST(t.sr AS INTEGER) AS sample_rate, CAST(t.nc AS INTEGER) AS n_channels,
       CAST(t.nf AS INTEGER) AS n_frames, CAST(t.dm AS BIGINT) AS duration_ms,
       CAST(t.br AS INTEGER) AS bitrate_kbps, CAST(t.v AS BOOLEAN) AS is_vbr,
       CAST(t.i3 AS INTEGER) AS id3v2_bytes, CAST(t.x AS BOOLEAN) AS has_xing
FROM (VALUES
  (0,  'mp3', 44100, 1, 35, 914,  96,  false, 0,   false),
  (1,  'mp3', 32000, 2, 31, 1116, 132, true,  82,  true),
  (2,  'mp3', 22050, 1, 17, 444,  48,  false, 0,   false),
  (3,  'mp3', 48000, 2, 11, 264,  128, false, 0,   false),
  (4,  'mp3', 44100, 1, 33, 862,  96,  false, 0,   false),
  (5,  'mp3', 32000, 2, 24, 864,  113, true,  102, true),
  (6,  'mp3', 22050, 1, 10, 261,  48,  false, 0,   false),
  (7,  'mp3', 48000, 2, 11, 264,  192, false, 0,   false),
  (8,  'mp3', 44100, 1, 31, 810,  128, false, 0,   false),
  (9,  'mp3', 32000, 2, 30, 1080, 137, true,  36,  true),
  (10, 'mp3', 22050, 1, 19, 496,  24,  false, 0,   false),
  (11, 'mp3', 48000, 2, 31, 744,  128, false, 0,   false)
) t(id, c, sr, nc, nf, dm, br, v, i3, x)
"""


def multimodal_flac_probe(sf_dir: str):
    """REAL FLAC container probe (functions/flacx.py): fLaC marker +
    metadata-block walk, STREAMINFO field decode — per-clip metadata rows
    over the encoder-twin fixture (mono/stereo, 8/16/24-bit, all four
    stereo decorrelation modes, fixed+LPC predictors, header-escape block
    sizes and sample rates). Unlike MP3, the FLAC PCM decode is REAL too
    (no codec stub): see multimodal_flac_digest for the bit-exact-decode
    companion. The twin pins EVERY row and column."""
    import ray.data

    from .stages.multimodal import audio_probe, synthesize_flac_table

    return audio_probe(ray.data.from_arrow(synthesize_flac_table(12)))


MULTIMODAL_FLAC_PROBE_SQL = """
SELECT CAST(t.id AS BIGINT) AS media_id, t.c AS container,
       CAST(t.sr AS INTEGER) AS sample_rate, CAST(t.nc AS INTEGER) AS n_channels,
       CAST(t.nf AS INTEGER) AS n_frames, CAST(t.dm AS BIGINT) AS duration_ms,
       CAST(t.br AS INTEGER) AS bitrate_kbps, CAST(t.v AS BOOLEAN) AS is_vbr,
       CAST(t.i3 AS INTEGER) AS id3v2_bytes, CAST(t.x AS BOOLEAN) AS has_xing
FROM (VALUES
  (0,  'flac', 44100, 1, 2, 169, 459, false, 0, false),
  (1,  'flac', 48000, 2, 4, 82,  892, false, 0, false),
  (2,  'flac', 11025, 1, 7, 561, 58,  false, 0, false),
  (3,  'flac', 96000, 1, 3, 52,  261, false, 0, false),
  (4,  'flac', 44100, 1, 2, 93,  453, false, 0, false),
  (5,  'flac', 48000, 2, 8, 151, 849, false, 0, false),
  (6,  'flac', 11025, 1, 9, 811, 58,  false, 0, false),
  (7,  'flac', 96000, 1, 4, 76,  262, false, 0, false),
  (8,  'flac', 44100, 1, 1, 81,  469, false, 0, false),
  (9,  'flac', 48000, 2, 4, 76,  933, false, 0, false),
  (10, 'flac', 11025, 1, 8, 696, 57,  false, 0, false),
  (11, 'flac', 96000, 1, 4, 65,  263, false, 0, false)
) t(id, c, sr, nc, nf, dm, br, v, i3, x)
"""


def multimodal_flac_digest(sf_dir: str):
    """Driver-hashable pin of the BIT-EXACT FLAC PCM decode: the encoder
    twin's clips flow through the real audio_features actor stage
    (decode_flac → CRC-8/16 + STREAMINFO-MD5 verified PCM → mixdown →
    duration/rms/peak) and the quantized sums are pinned. Any change to
    Rice decoding, predictor reconstruction, stereo decorrelation or
    wasted-bit handling flips a column (one flipped bit anywhere in a
    subframe already fails the in-decoder MD5/CRC checks)."""
    import ray.data

    from .stages.multimodal import audio_features, synthesize_flac_table

    ds = audio_features(ray.data.from_arrow(synthesize_flac_table(12)))
    return _feature_digest(
        ds,
        {
            "n_clips": lambda b: b.num_rows,
            "sum_duration_us": lambda b: int(
                sum(round(v * 1e6) for v in b.column("duration_sec").to_pylist())
            ),
            "sum_rms_micro": lambda b: int(
                sum(round(v * 1e6) for v in b.column("rms").to_pylist())
            ),
            "sum_peak_micro": lambda b: int(
                sum(round(v * 1e6) for v in b.column("peak").to_pylist())
            ),
        },
    )


MULTIMODAL_FLAC_DIGEST_SQL = """
SELECT CAST(t.a AS BIGINT) AS n_clips, CAST(t.b AS BIGINT) AS sum_duration_us,
       CAST(t.c AS BIGINT) AS sum_rms_micro, CAST(t.d AS BIGINT) AS sum_peak_micro
FROM (VALUES (12, 2914971, 2011808, 3054126)) t(a, b, c, d)
"""


def _extract_row_hash_sum(b: pa.Table) -> int:
    """Order-free digest over the FULL per-turn extraction contract:
    identity (conv_id, turn_idx), kind, fallback flag, the extracted text
    byte-for-byte, every span (start/end/kind/score@6dp) and every note —
    one blake2b per row, lower 52 bits summed (334 rows × 2^52 ≪ 2^63)."""
    import hashlib

    tot = 0
    for cid, ti, kind, fb, txt, sp, nt in zip(
        b.column("conv_id").to_pylist(),
        b.column("turn_idx").to_pylist(),
        b.column("kind").to_pylist(),
        b.column("used_fallback").to_pylist(),
        b.column("extracted_text").to_pylist(),
        b.column("spans").to_pylist(),
        b.column("notes").to_pylist(),
    ):
        sp_s = ";".join(
            f"{s['start']},{s['end']},{s['kind']},{round(float(s['score']), 6)}"
            for s in (sp or [])
        )
        nt_s = "|".join(nt or [])
        key = f"{cid}\x1f{ti}\x1f{kind}\x1f{int(fb)}\x1f{txt}\x1f{sp_s}\x1f{nt_s}"
        tot += int(hashlib.blake2b(key.encode()).hexdigest()[:13], 16)
    return tot


def extract_digest_smoke(sf_dir: str):
    """Driver-hashable pin of the FLAGSHIP extraction pipeline: the full
    distributed run (sniff → html/pdf/plain extract → salted exchange →
    sort-dedup finalize) over the deterministic in-repo smoke fixture
    (sf-independent, like the multimodal fixtures), digested row-by-row —
    conv/turn identity, kind, fallback, extracted text bytes, spans and
    notes all enter the hash. Any change to sniffing, boilerplate
    heuristics, PDF layout walk, span assembly, dedup or ordering flips a
    column. The VALUES twin pins what the per-turn pytest goldens prove
    locally, but driver-visibly."""
    from .pipelines.extract import extract_dataset
    from .sources.fixtures import transcripts_path_for

    ds = extract_dataset(transcripts_path_for("smoke"), ExtractConfig())
    return _feature_digest(
        ds,
        {
            "n_rows": lambda b: b.num_rows,
            "row_hash_sum": _extract_row_hash_sum,
            "sum_spans": lambda b: int(
                pc.sum(pc.list_value_length(b.column("spans"))).as_py() or 0
            ),
            "n_fallback": lambda b: int(
                pc.sum(pc.cast(b.column("used_fallback"), pa.int64())).as_py() or 0
            ),
            "sum_turn_idx": lambda b: int(
                pc.sum(pc.cast(b.column("turn_idx"), pa.int64())).as_py() or 0
            ),
        },
    )


EXTRACT_DIGEST_SMOKE_SQL = """
SELECT CAST(t.a AS BIGINT) AS n_rows, CAST(t.b AS BIGINT) AS row_hash_sum,
       CAST(t.c AS BIGINT) AS sum_spans, CAST(t.d AS BIGINT) AS n_fallback,
       CAST(t.e AS BIGINT) AS sum_turn_idx
FROM (VALUES (334, 715233605082911103, 663, 4, 1224)) t(a, b, c, d, e)
"""


#: (column, decimal scale) profiled by describe_lineitem — money/percent
#: columns sum on their exact integer grid so the total is order-free
_DESCRIBE_LINEITEM_COLS = [
    ("l_orderkey", 1),
    ("l_quantity", 1),
    ("l_extendedprice", 100),
    ("l_discount", 100),
    ("l_tax", 100),
]


def describe_lineitem(sf_dir: str):
    """Dataset profiling — the `describe` every engine ships: per column
    (count, nulls, min, max, exact grid-scaled sum) in ONE combiner pass
    over all profiled columns at once (one partial row per column per
    batch; a bounded-cardinality groupby folds them — the shuffle moves
    #columns × #batches tiny rows, never data). Doubles sum on their
    exact decimal grid (cents for money), so the totals are
    order-independent and the SQL twin matches hash-exactly."""
    cols = _DESCRIBE_LINEITEM_COLS
    ds = scan(sf_dir, "lineitem", columns=[c for c, _ in cols])

    def partial(batch: pa.Table) -> pa.Table:
        names, ns, nulls, mins, maxs, sums = [], [], [], [], [], []
        for c, scale in cols:
            col = batch.column(c)
            names.append(c)
            ns.append(batch.num_rows)
            nulls.append(col.null_count)
            mins.append(pc.min(col).as_py())  # None for an all-null batch
            maxs.append(pc.max(col).as_py())
            sums.append(int(pc.sum(_cents(col, scale)).as_py() or 0))
        return pa.table(
            {
                "col": pa.array(names, pa.string()),
                "n": pa.array(ns, pa.int64()),
                "n_null": pa.array(nulls, pa.int64()),
                "min_v": pa.array(
                    [None if v is None else float(v) for v in mins], pa.float64()
                ),
                "max_v": pa.array(
                    [None if v is None else float(v) for v in maxs], pa.float64()
                ),
                "sum_scaled": pa.array(sums, pa.int64()),
            }
        )

    folded = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("col")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("n_null", alias_name="n_null"),
            Min("min_v", alias_name="min_v"),
            Max("max_v", alias_name="max_v"),
            Sum("sum_scaled", alias_name="sum_scaled"),
        )
    )
    scale_map = dict(cols)

    def attach_scale(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "scale",
            pa.array(
                [scale_map[c] for c in batch.column("col").to_pylist()], pa.int64()
            ),
        )

    return folded.map_batches(attach_scale, batch_format="pyarrow", zero_copy_batch=True)


DESCRIBE_LINEITEM_SQL = " UNION ALL ".join(
    f"""SELECT '{c}' AS col, COUNT(*) AS n,
        COUNT(*) - COUNT({c}) AS n_null,
        CAST(MIN({c}) AS DOUBLE) AS min_v, CAST(MAX({c}) AS DOUBLE) AS max_v,
        CAST(SUM(CAST(round({c} * {sc}) AS BIGINT)) AS BIGINT) AS sum_scaled,
        CAST({sc} AS BIGINT) AS scale FROM lineitem"""
    for c, sc in _DESCRIBE_LINEITEM_COLS
)


def describe_documents(sf_dir: str):
    """String-table profiling: per text-ish column (count, nulls, min /
    max / total UTF-8 length, distinct-prefix min/max as a lexical
    range) — same one-combiner-pass shape as ``describe_lineitem``,
    lengths summed as exact int64."""
    cols = ["text", "lang", "source"]
    ds = scan(sf_dir, "documents", columns=cols)

    def partial(batch: pa.Table) -> pa.Table:
        names, ns, nulls, lmin, lmax, lsum, vmin, vmax = ([] for _ in range(8))
        for c in cols:
            col = batch.column(c)
            lens = pc.utf8_length(pc.fill_null(col, ""))
            names.append(c)
            ns.append(batch.num_rows)
            nulls.append(col.null_count)
            lmin.append(int(pc.min(lens).as_py() or 0))
            lmax.append(int(pc.max(lens).as_py() or 0))
            lsum.append(int(pc.sum(pc.cast(lens, pa.int64())).as_py() or 0))
            # an ALL-NULL batch contributes NULL partials (the fold's
            # Min/Max ignore nulls) — an "" sentinel would win the min
            vmin.append(pc.min(col).as_py())
            vmax.append(pc.max(col).as_py())
        return pa.table(
            {
                "col": pa.array(names, pa.string()),
                "n": pa.array(ns, pa.int64()),
                "n_null": pa.array(nulls, pa.int64()),
                "len_min": pa.array(lmin, pa.int64()),
                "len_max": pa.array(lmax, pa.int64()),
                "len_sum": pa.array(lsum, pa.int64()),
                "v_min": pa.array(vmin, pa.string()),
                "v_max": pa.array(vmax, pa.string()),
            }
        )

    folded = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("col")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("n_null", alias_name="n_null"),
            Min("len_min", alias_name="len_min"),
            Max("len_max", alias_name="len_max"),
            Sum("len_sum", alias_name="len_sum"),
            Min("v_min", alias_name="v_min"),
            Max("v_max", alias_name="v_max"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        # a FULLY-null column folds to NULL min/max; the twin reports ''.
        # (a per-group block can even come out NULL-TYPED — cast first)
        def coalesce(name: str) -> pa.Array:
            col = batch.column(name)
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            if pa.types.is_null(col.type):
                return pa.array([""] * len(col), pa.string())
            return pc.fill_null(col, pa.scalar("", pa.string()))

        return batch.set_column(
            batch.schema.get_field_index("v_min"), "v_min", coalesce("v_min")
        ).set_column(
            batch.schema.get_field_index("v_max"), "v_max", coalesce("v_max")
        )

    return folded.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


DESCRIBE_DOCUMENTS_SQL = " UNION ALL ".join(
    f"""SELECT '{c}' AS col, COUNT(*) AS n, COUNT(*) - COUNT({c}) AS n_null,
        CAST(MIN(length(COALESCE({c}, ''))) AS BIGINT) AS len_min,
        CAST(MAX(length(COALESCE({c}, ''))) AS BIGINT) AS len_max,
        CAST(SUM(length(COALESCE({c}, ''))) AS BIGINT) AS len_sum,
        COALESCE(MIN({c}), '') AS v_min, COALESCE(MAX({c}), '') AS v_max
        FROM documents"""
    for c in ("text", "lang", "source")
)


def describe_events(sf_dir: str):
    """Event-stream profiling, completing the describe family across
    column kinds: int ids, a TIMESTAMP column (profiled as exact epoch
    µs), and a money double on its cents grid — same one-combiner-pass
    shape as ``describe_lineitem``."""
    specs = [
        ("event_id", "int", 1),
        ("user_id", "int", 1),
        ("ts", "ts_us", 1),
        ("value", "grid", 100),
    ]
    ds = scan(sf_dir, "events", columns=[c for c, _, _ in specs])

    def partial(batch: pa.Table) -> pa.Table:
        names, ns, nulls, mins, maxs, sums = ([] for _ in range(6))
        for c, kind, scale in specs:
            col = batch.column(c)
            if kind == "ts_us":
                col = pc.cast(col, pa.int64())
            names.append(c)
            ns.append(batch.num_rows)
            nulls.append(col.null_count)
            mn, mx = pc.min(col).as_py(), pc.max(col).as_py()
            mins.append(None if mn is None else int(mn) if kind != "grid" else None)
            maxs.append(None if mx is None else int(mx) if kind != "grid" else None)
            if kind == "grid":
                ints = _cents(col, scale)
                mins[-1] = pc.min(ints).as_py()
                maxs[-1] = pc.max(ints).as_py()
                sums.append(int(pc.sum(ints).as_py() or 0))
            elif kind == "ts_us":
                # a timestamp SUM is meaningless and overflows int64 at
                # ~10^5 rows of epoch-µs — profile min/max only
                sums.append(0)
            else:
                sums.append(int(pc.sum(col).as_py() or 0))
        return pa.table(
            {
                "col": pa.array(names, pa.string()),
                "n": pa.array(ns, pa.int64()),
                "n_null": pa.array(nulls, pa.int64()),
                "min_scaled": pa.array(mins, pa.int64()),
                "max_scaled": pa.array(maxs, pa.int64()),
                "sum_scaled": pa.array(sums, pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("col")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("n_null", alias_name="n_null"),
            Min("min_scaled", alias_name="min_scaled"),
            Max("max_scaled", alias_name="max_scaled"),
            Sum("sum_scaled", alias_name="sum_scaled"),
        )
    )


DESCRIBE_EVENTS_SQL = " UNION ALL ".join(
    [
        f"""SELECT '{c}' AS col, COUNT(*) AS n, COUNT(*) - COUNT({c}) AS n_null,
        CAST(MIN({c}) AS BIGINT) AS min_scaled, CAST(MAX({c}) AS BIGINT) AS max_scaled,
        CAST(SUM({c}) AS BIGINT) AS sum_scaled FROM events"""
        for c in ("event_id", "user_id")
    ]
    + [
        """SELECT 'ts' AS col, COUNT(*) AS n, COUNT(*) - COUNT(ts) AS n_null,
        CAST(MIN(epoch_us(ts)) AS BIGINT) AS min_scaled,
        CAST(MAX(epoch_us(ts)) AS BIGINT) AS max_scaled,
        CAST(0 AS BIGINT) AS sum_scaled FROM events""",
        """SELECT 'value' AS col, COUNT(*) AS n, COUNT(*) - COUNT(value) AS n_null,
        CAST(MIN(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS min_scaled,
        CAST(MAX(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS max_scaled,
        CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_scaled FROM events""",
    ]
)


def extract_digest_justext(sf_dir: str):
    """The flagship-pipeline digest under the ALTERNATE html strategy
    (``html_strategy="justext"`` — jusText-style paragraph
    classification, functions/htmlx.py): same distributed shape as
    ``extract_digest_smoke``, different extraction semantics, its own
    pinned twin. Any change to the classifier's thresholds, stopword
    list, context pass or fallback contract flips a column."""
    from .pipelines.extract import extract_dataset
    from .sources.fixtures import transcripts_path_for

    ds = extract_dataset(
        transcripts_path_for("smoke"), ExtractConfig(html_strategy="justext")
    )
    return _feature_digest(
        ds,
        {
            "n_rows": lambda b: b.num_rows,
            "row_hash_sum": _extract_row_hash_sum,
            "sum_spans": lambda b: int(
                pc.sum(pc.list_value_length(b.column("spans"))).as_py() or 0
            ),
            "n_fallback": lambda b: int(
                pc.sum(pc.cast(b.column("used_fallback"), pa.int64())).as_py() or 0
            ),
            "sum_turn_idx": lambda b: int(
                pc.sum(pc.cast(b.column("turn_idx"), pa.int64())).as_py() or 0
            ),
        },
    )


EXTRACT_DIGEST_JUSTEXT_SQL = """
SELECT CAST(t.a AS BIGINT) AS n_rows, CAST(t.b AS BIGINT) AS row_hash_sum,
       CAST(t.c AS BIGINT) AS sum_spans, CAST(t.d AS BIGINT) AS n_fallback,
       CAST(t.e AS BIGINT) AS sum_turn_idx
FROM (VALUES (334, 721053281009029331, 969, 106, 1224)) t(a, b, c, d, e)
"""


def extract_transcripts(sf_dir: str):
    from .pipelines.extract import extract_dataset

    return extract_dataset(_transcripts_path(sf_dir), ExtractConfig())


def extract_kind_stats(sf_dir: str):
    from .pipelines.extract import extract_dataset

    ds = extract_dataset(_transcripts_path(sf_dir), ExtractConfig())
    agg = ds.groupby(["kind", "used_fallback"]).aggregate(Count(alias_name="n"))
    tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    idx = tbl.schema.get_field_index("n")
    return tbl.set_column(idx, "n", pc.cast(tbl.column("n"), pa.int64()))


def transcripts_conv_stats(sf_dir: str):
    from .pipelines.extract import extract_dataset

    ds = extract_dataset(_transcripts_path(sf_dir), ExtractConfig())
    return ds.groupby("conv_id").aggregate(
        Count(alias_name="n_turns"), Max("turn_idx", alias_name="max_turn")
    )


def transcripts_conv_stats_sql(sf_dir: str | None = None) -> str:
    """DuckDB twin over the SAME deterministic fixture parquet the Ray
    pipeline reads at the driver's sf (0.01 → 'correctness'). Extraction
    preserves per-turn rows modulo exact (conv_id, turn_idx) dedup
    (stages/finalize.py), so conv stats over the extracted output equal
    DISTINCT-turn stats over the raw input. Generating the path here is
    idempotent (cache-markered) and guarantees the file exists before the
    driver runs the SQL. ``sf_dir`` (local check_queries only — the driver
    contract passes nothing and always runs sf0.01) re-points the twin at
    the fixture size the Ray side resolves for that sf."""
    path = _transcripts_sql_source(sf_dir)
    return f"""
SELECT conv_id,
  count(DISTINCT turn_idx) AS n_turns,
  max(turn_idx) AS max_turn
FROM read_parquet('{path}')
GROUP BY conv_id
"""


# --------------------------------------------------------------------------
# window rank / pivot / stratified sample / per-group quantiles / anti-join


def rank_orders_per_customer(sf_dir: str, k: int = 2):
    """Group-wise top-k window rank: each customer's k most expensive
    orders with their row number (`row_number() OVER (PARTITION BY ...)`
    shape). Combiner-pruned shuffle via relops.window_topk_per_key — at
    most k rows per customer per input block reach the groupby."""
    ds = scan(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"])
    return relops.window_topk_per_key(
        ds, "o_custkey", [("o_totalprice", "descending"), ("o_orderkey", "ascending")], k
    )


RANK_ORDERS_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(row_number() OVER (PARTITION BY o_custkey
              ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rn
  FROM orders)
WHERE rn <= 2
"""


#: per-stratum md5-prefix thresholds (first hex byte < threshold keeps the
#: row): urgent rows oversampled, low-priority undersampled
_STRATA_THRESH = {
    "1-URGENT": "14",
    "2-HIGH": "0a",
    "3-MEDIUM": "06",
    "4-NOT SPECIFIED": "03",
    "5-LOW": "01",
}


def stratified_sample_orders(sf_dir: str):
    """Deterministic stratified hash-sample: per-stratum sampling rate via
    an md5-prefix threshold on the row key — reproducible on any engine
    and block layout (seeded RNG sampling is not), embarrassingly
    parallel, and SQL-checkable. The per-priority rate table is a
    constant, not data."""
    ds = scan(
        sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"],
    )

    def fn(batch: pa.Table) -> pa.Table:
        import hashlib

        keys = batch.column("o_orderkey").to_pylist()
        prio = batch.column("o_orderpriority").to_pylist()
        keep = [
            hashlib.md5(f"o{k}".encode()).hexdigest()[:2] < _STRATA_THRESH.get(p, "00")
            for k, p in zip(keys, prio)
        ]
        return batch.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


STRATIFIED_SAMPLE_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority FROM orders
WHERE substr(md5('o' || CAST(o_orderkey AS VARCHAR)), 1, 2) <
  CASE o_orderpriority
    WHEN '1-URGENT' THEN '14' WHEN '2-HIGH' THEN '0a' WHEN '3-MEDIUM' THEN '06'
    WHEN '4-NOT SPECIFIED' THEN '03' WHEN '5-LOW' THEN '01' ELSE '00' END
"""


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def pivot_events_daily(sf_dir: str):
    """Pivot: events per day, one count column per event type. Partial
    (day, type) counts per batch mean the shuffle moves one row per
    (day, type) per input block; the pivot itself runs on the
    POST-aggregation result, which is days x types — small by
    construction at any corpus size."""
    ds = scan(sf_dir, "events", columns=["ts", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        d = pc.strftime(batch.column("ts"), format="%Y-%m-%d")
        t = pa.table({"d": d, "event_type": batch.column("event_type")})
        return t.group_by(["d", "event_type"]).aggregate([("d", "count")])

    agg = (
        relops.coalesce_partials(
            ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        )
        .groupby(["d", "event_type"])
        .aggregate(Sum("d_count", alias_name="n"))
    )
    df = agg.to_pandas().pivot_table(
        index="d", columns="event_type", values="n", fill_value=0, aggfunc="sum"
    )
    cols = {"d": pa.array(df.index.to_list(), pa.string())}
    for t in _EVENT_TYPES:
        vals = df[t].to_numpy(dtype=np.int64) if t in df.columns else np.zeros(len(df), np.int64)
        cols[f"n_{t}"] = pa.array(vals, pa.int64())
    return pa.table(cols)


PIVOT_EVENTS_SQL = """
SELECT strftime(ts, '%Y-%m-%d') AS d,
  CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
  CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_error,
  CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
  CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS n_signup,
  CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_view
FROM events GROUP BY d
"""


_GROUP_QUANTILES = ((0.5, 1, 2), (0.9, 9, 10))


def doc_len_quantiles_by_lang(sf_dir: str):
    """EXACT per-group quantiles via mergeable value histograms keyed by
    (lang, n_chars): each batch emits per-(group, value) count partials,
    one small groupby merges them, and per-group discrete quantiles come
    out of the merged histograms with integer-exact ranks (same
    ``ceil(p*n) - 1`` convention as token_quantiles_documents, verified
    against DuckDB quantile_disc). The shuffle is bounded by
    groups x distinct-values, never rows."""
    ds = scan(sf_dir, "documents", columns=["lang", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        return batch.select(["lang", "n_chars"]).group_by(
            ["lang", "n_chars"]
        ).aggregate([("n_chars", "count")])

    hist = (
        relops.coalesce_partials(
            ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        )
        .groupby(["lang", "n_chars"])
        .aggregate(Sum("n_chars_count", alias_name="cnt"))
    )
    h = hist.to_pandas()
    out_lang: list[str] = []
    out_p: list[float] = []
    out_v: list[int] = []
    for lang, g in h.groupby("lang"):
        g = g.sort_values("n_chars")
        values = g["n_chars"].to_numpy(dtype=np.int64)
        cum = g["cnt"].to_numpy(dtype=np.int64).cumsum()
        n = int(cum[-1])
        for p, num, den in _GROUP_QUANTILES:
            rank = -(-(num * n) // den) - 1  # ceil(num*n/den) - 1, exact
            idx = int(np.searchsorted(cum, rank + 1))
            out_lang.append(str(lang))
            out_p.append(p)
            out_v.append(int(values[idx]))
    return pa.table(
        {
            "lang": pa.array(out_lang, pa.string()),
            "p": pa.array(out_p, pa.float64()),
            "n_chars": pa.array(out_v, pa.int64()),
        }
    )


DOC_LEN_QUANTILES_SQL = """
SELECT lang, CAST(0.5 AS DOUBLE) AS p,
       CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS n_chars
FROM documents GROUP BY lang
UNION ALL
SELECT lang, CAST(0.9 AS DOUBLE) AS p,
       CAST(quantile_disc(n_chars, 0.9) AS BIGINT) AS n_chars
FROM documents GROUP BY lang
"""


def anti_join_customers_no_orders(sf_dir: str):
    """Anti-join: customers that placed no URGENT order. Distinct matching
    custkeys come from a per-batch local-distinct combiner + small groupby
    (one row per key per block crosses the wire), then a distributed
    left_outer Dataset.join marks matches; rows with a null marker
    survive. Both sides scale with sf — nothing is materialized on the
    driver."""
    cust = scan(sf_dir, "customer", columns=["c_custkey", "c_name"])
    orders = scan(
        sf_dir, "orders", columns=["o_custkey"],
        filter=(pc.field("o_orderpriority") == "1-URGENT"),
    )

    def local_distinct(batch: pa.Table) -> pa.Table:
        return pa.table({"o_custkey": pc.unique(batch.column("o_custkey"))})

    def bucket_distinct(group: pa.Table) -> pa.Table:
        u = pc.unique(group.column("o_custkey"))
        return pa.table(
            {"o_custkey": u, "_has": pa.array(np.ones(len(u), dtype=np.int64))}
        )

    keys = relops.bucketed_groupby(
        orders.map_batches(local_distinct, batch_format="pyarrow", zero_copy_batch=True),
        ["o_custkey"], bucket_distinct,
        empty=pa.table(
            {"o_custkey": pa.array([], pa.int64()), "_has": pa.array([], pa.int64())}
        ),
    )
    n_parts = relops.choose_num_partitions(
        relops.table_path(sf_dir, "customer"), relops.table_path(sf_dir, "orders")
    )
    joined = cust.join(
        keys, "left_outer", num_partitions=n_parts,
        on=("c_custkey",), right_on=("o_custkey",),
    )

    def only_unmatched(batch: pa.Table) -> pa.Table:
        if "_has" not in batch.column_names:
            return pa.table(
                {"c_custkey": pa.array([], pa.int64()), "c_name": pa.array([], pa.string())}
            )
        return batch.filter(pc.is_null(batch.column("_has"))).select(
            ["c_custkey", "c_name"]
        )

    return joined.map_batches(only_unmatched, batch_format="pyarrow", zero_copy_batch=True)


ANTI_JOIN_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN
  (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
"""


# --------------------------------------------------------------------------
# distributed k-means over embeddings (clustering for data curation)


def _kmeans_init(sf_dir: str, k: int) -> np.ndarray:
    """Deterministic init: embeddings of the k smallest vec_ids."""
    ds = scan(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    head = relops.topk(ds, [("vec_id", "ascending")], k).to_pandas()
    head = head.sort_values("vec_id")
    return np.array([np.asarray(v, dtype=np.float64) for v in head["embedding"]])


def embedding_kmeans(sf_dir: str, k: int = 8, iters: int = 5):
    """Distributed Lloyd k-means cluster assignment over the embeddings
    table (semantic-bucketing / curation shape). Deterministic init (k
    smallest vec_ids), quantized centroid recurrence — see
    stages/ann.py::kmeans_assign for the scale design. Checked full-value
    against a single-process numpy oracle (PYTHON_ORACLES)."""
    ds = scan(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return ann_mod.kmeans_assign(ds, _kmeans_init(sf_dir, k), iters=iters)


def semdedup_embeddings(sf_dir: str, k: int = 8, iters: int = 5, eps: float = 0.45):
    """SemDeDup (Abbas et al. 2023): semantic near-duplicate pruning —
    k-means clusters over the embedding space, then within each cluster
    drop every item whose cosine similarity to a higher-keep-priority
    item (farther from the centroid) exceeds eps. Output is the per-item
    audit verdict (cluster, max_prior_sim, keep). Composes the
    full-value-checked kmeans recurrence with one cluster-bucketed
    pruning pass — the corpus crosses exactly one extra shuffle, keyed by
    cluster. Checked full-value against a single-process numpy oracle
    (PYTHON_ORACLES); eps=0.45 sits below the synthetic fixture's max
    pairwise cosine (~0.51) so removals are non-trivial at every sf."""
    ds = scan(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    assigned = ann_mod.kmeans_assign(
        ds, _kmeans_init(sf_dir, k), iters=iters, keep_embedding=True
    )
    return ann_mod.semdedup_prune(
        assigned, eps=eps, bucketed_groupby=relops.bucketed_groupby
    )


def _oracle_semdedup(sf_dir: str, k: int = 8, iters: int = 5, eps: float = 0.45):
    """Single-process SemDeDup: the checked kmeans oracle's assignment,
    then the identical per-cluster triangular-max pruning (same row
    ordering, same masking, same 6dp rounding)."""
    assign = _oracle_kmeans(sf_dir, k, iters)
    ids = assign.column("vec_id").to_numpy(zero_copy_only=False)
    cl = assign.column("cluster").to_numpy(zero_copy_only=False)
    d2 = assign.column("dist2").to_numpy(zero_copy_only=False)
    tbl = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    tids = tbl.column("vec_id").to_numpy(zero_copy_only=False)
    flat = tbl.column("embedding").combine_chunks().flatten().to_numpy(
        zero_copy_only=False
    ).astype(np.float64)
    m_all = flat.reshape(len(tids), -1)
    by_id = np.argsort(tids, kind="stable")
    m = m_all[by_id[np.searchsorted(tids[by_id], ids)]]  # align rows to `ids`
    order = np.lexsort((ids, -d2, cl))
    ids, cl, m = ids[order], cl[order], m[order]
    m = m / np.maximum(np.sqrt((m * m).sum(axis=1)), 1e-12)[:, None]
    starts = np.flatnonzero(np.r_[True, cl[1:] != cl[:-1]])
    bounds = np.r_[starts, len(cl)]
    mx = np.full(len(cl), -1.0)
    for a, b in zip(bounds[:-1], bounds[1:]):
        c = b - a
        if c < 2:
            continue
        s = m[a:b] @ m[a:b].T
        s = np.where(np.tril(np.ones((c, c), bool), k=-1), s, -1.0)
        mx[a:b] = s.max(axis=1)
    mx = np.round(mx, 6)
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "cluster": pa.array(cl, pa.int64()),
            "max_prior_sim": pa.array(mx),
            "keep": pa.array(mx < eps),
        }
    )


def _oracle_kmeans(sf_dir: str, k: int = 8, iters: int = 5, quant: float = 1e-4):
    """Single-process reference: same quantized Lloyd recurrence, same
    distance expansion and tie-breaking, one numpy pass per iteration."""
    tbl = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = tbl.column("vec_id").to_numpy(zero_copy_only=False)
    flat = tbl.column("embedding").combine_chunks().flatten().to_numpy(
        zero_copy_only=False
    ).astype(np.float64)
    m = flat.reshape(len(ids), -1)
    order = np.argsort(ids, kind="stable")[:k]  # positions of k smallest ids
    cents = m[order]  # ascending vec_id, matching _kmeans_init
    cents = np.round(cents / quant) * quant

    def _d2(mat, c):
        return (
            (mat * mat).sum(axis=1)[:, None]
            - 2.0 * (mat @ c.T)
            + (c * c).sum(axis=1)[None, :]
        )

    for _ in range(iters):
        a = np.argmin(_d2(m, cents), axis=1)
        sums = np.zeros_like(cents)
        np.add.at(sums, a, m)
        counts = np.bincount(a, minlength=k).astype(np.int64)
        new = np.where(counts[:, None] > 0, sums / np.maximum(counts[:, None], 1), cents)
        cents = np.round(new / quant) * quant
    d2 = _d2(m, cents)
    a = np.argmin(d2, axis=1)
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "cluster": pa.array(a.astype(np.int64)),
            "dist2": pa.array(np.round(d2[np.arange(len(a)), a], 6)),
        }
    )


# --------------------------------------------------------------------------
# train/test decontamination (word-shingle overlap with a benchmark set)

_DECON_N = 3
_DECON_BENCH_MOD = 97


def _word_ngrams(text: str, n: int) -> list[str]:
    toks = text.split(" ")
    if len(toks) < n:
        return []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def decontaminate_documents(sf_dir: str):
    """Train/test decontamination: count, per corpus document, the
    distinct n-gram word shingles it shares with the benchmark set
    (n=3 here so the synthetic fixture has signal; production
    decontamination uses 8-13-gram shingles — n is the knob)
    (doc_id % 97 == 0 stands in for a held-out eval set). Scale shape:
    the benchmark side is SMALL by definition (eval sets are MBs at any
    corpus size) — its distinct shingles are collected once and broadcast
    through the object store; the corpus side is one map_batches pass
    with a single vectorized ``pc.is_in`` per batch. Each document is one
    row, so per-doc distinct-hit counts complete inside the batch — the
    corpus never shuffles at all. Only contaminated docs are emitted."""
    ds = scan(sf_dir, "documents", columns=["doc_id", "text"])

    def bench_grams(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        bench = batch.filter(pa.array(ids % _DECON_BENCH_MOD == 0))
        grams: set[str] = set()
        for t in bench.column("text").to_pylist():
            grams.update(_word_ngrams(t, _DECON_N))
        return pa.table({"g": pa.array(sorted(grams), pa.string())})

    gram_blocks = [
        t
        for t in ray.get(
            ds.map_batches(bench_grams, batch_format="pyarrow", zero_copy_batch=True)
            .materialize()
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    if gram_blocks:
        bench_set = pc.unique(pa.concat_tables(gram_blocks).column("g"))
    else:
        bench_set = pa.array([], pa.string())
    bench_ref = ray.put(bench_set)

    def scan_batch(batch: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()), "n_hits": pa.array([], pa.int64())}
        )
        if len(bench) == 0:
            return empty
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        doc_idx: list[int] = []
        flat: list[str] = []
        for i, text in enumerate(texts):
            if ids[i] % _DECON_BENCH_MOD == 0:
                continue
            gs = set(_word_ngrams(text, _DECON_N))  # distinct within doc
            doc_idx.extend([int(ids[i])] * len(gs))
            flat.extend(gs)
        if not flat:
            return empty
        t = pa.table(
            {"doc_id": pa.array(doc_idx, pa.int64()), "g": pa.array(flat, pa.string())}
        )
        t = t.filter(pc.is_in(t.column("g"), value_set=bench))
        if t.num_rows == 0:
            return empty
        agg = t.group_by(["doc_id"]).aggregate([("g", "count")])
        return pa.table(
            {
                "doc_id": agg.column("doc_id"),
                "n_hits": pc.cast(agg.column("g_count"), pa.int64()),
            }
        )

    return ds.map_batches(scan_batch, batch_format="pyarrow", zero_copy_batch=True)


DECONTAMINATE_SQL = """
WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
grams AS (
  SELECT doc_id, array_to_string(list_slice(w, i, i + 2), ' ') AS g
  FROM words, unnest(range(1, len(w) - 1)) AS t(i)
  WHERE len(w) >= 3
),
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0)
SELECT g.doc_id, CAST(count(DISTINCT g.g) AS BIGINT) AS n_hits
FROM grams g JOIN bench USING (g)
WHERE g.doc_id % 97 <> 0
GROUP BY g.doc_id
"""


# --------------------------------------------------------------------------
# round-3 widening: TPC-H-shaped relational operators (conditional
# aggregates, scalar-subquery-per-group, HAVING + join-back, EXISTS
# semi-join, argmin-per-group, lag windows)


def q14_promo_revenue(sf_dir: str):
    """TPC-H Q14 shape: percentage of revenue from one part class. The
    sf-scaling `part` dimension is size-gated (broadcast under
    relops.BROADCAST_GATE_BYTES, distributed Dataset.join above); revenue
    is carried as exact integer cents so the ratio is deterministic."""
    li = scan(sf_dir, "lineitem",
              columns=["l_partkey", "l_extendedprice", "l_discount"])

    def rev(batch: pa.Table) -> pa.Table:
        r = pc.multiply(
            pc.cast(batch.column("l_extendedprice"), pa.float64()),
            pc.subtract(1.0, pc.cast(batch.column("l_discount"), pa.float64())),
        )
        return pa.table(
            {"p_partkey": batch.column("l_partkey"), "rev_c": _cents(r, 10_000)}
        )

    li = li.map_batches(rev, batch_format="pyarrow", zero_copy_batch=True)
    part_small, part_ds = relops.small_side(sf_dir, "part", ["p_partkey", "p_type"])
    if part_small is not None:
        joined = relops.broadcast_join(li, part_small, on="p_partkey")
    else:
        joined = li.join(
            part_ds, "inner",
            num_partitions=relops.choose_num_partitions(
                relops.table_path(sf_dir, "lineitem"), relops.table_path(sf_dir, "part")
            ),
            on=("p_partkey",), right_on=("p_partkey",),
        )

    def partial(batch: pa.Table) -> pa.Table:
        rev_c = batch.column("rev_c")
        promo = pc.if_else(
            pc.equal(batch.column("p_type"), "ECONOMY"), rev_c,
            pa.scalar(0, pa.int64()),
        )
        return pa.table(
            {
                "promo_c": pa.array([pc.sum(promo).as_py() or 0], pa.int64()),
                "tot_c": pa.array([pc.sum(rev_c).as_py() or 0], pa.int64()),
            }
        )

    parts = joined.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    promo_c = parts.sum("promo_c")
    tot_c = parts.sum("tot_c")
    pct = 100.0 * float(promo_c) / float(tot_c) if tot_c else 0.0
    return pa.table({"promo_pct": round_away_arrow(pa.array([pct], pa.float64()))})


Q14_SQL = """
SELECT round(
  100.0 * sum(CASE WHEN p.p_type = 'ECONOMY'
                   THEN CAST(round(l.l_extendedprice*(1-l.l_discount)*10000) AS BIGINT)
                   ELSE 0 END)
        / sum(CAST(round(l.l_extendedprice*(1-l.l_discount)*10000) AS BIGINT)), 4
) AS promo_pct
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
"""


def q17_small_quantity_revenue(sf_dir: str):
    """TPC-H Q17 shape: revenue of lineitems whose quantity is under 20%
    of their part's average — a scalar-subquery-per-group. The per-part
    average is a distributed pre-aggregated groupby; attaching it back is
    size-gated on the `part` table's on-disk bytes (the aggregate has one
    row per partkey, so the dimension's size bounds it). Quantities are
    integral, so the int64 sum / count reproduces DuckDB's avg() double
    bit-exactly and the 0.2*avg comparison is deterministic."""
    li = scan(sf_dir, "lineitem",
              columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def qty_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_partkey": batch.column("l_partkey"),
                "q": pc.cast(pc.round(batch.column("l_quantity")), pa.int64()),
            }
        )
        return t.group_by(["l_partkey"]).aggregate([("q", "sum"), ("q", "count")])

    def bucket_avg(group: pa.Table) -> pa.Table:
        g = group.group_by(["l_partkey"]).aggregate(
            [("q_sum", "sum"), ("q_count", "sum")]
        )
        aq = pc.divide(
            pc.cast(g.column("q_sum_sum"), pa.float64()),
            pc.cast(g.column("q_count_sum"), pa.float64()),
        )
        return pa.table({"ap_partkey": g.column("l_partkey"), "aq": aq})

    # partkey cardinality scales with sf: bucketed groupby, see relops
    avg = relops.bucketed_groupby(
        li.map_batches(qty_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["l_partkey"], bucket_avg,
        empty=pa.table(
            {"ap_partkey": pa.array([], pa.int64()), "aq": pa.array([], pa.float64())}
        ),
    )

    gate_ok = (
        os.path.getsize(relops.table_path(sf_dir, "part")) <= relops.BROADCAST_GATE_BYTES
    )
    if gate_ok:
        avg_tbl = pa.Table.from_pandas(avg.to_pandas(), preserve_index=False)
        joined = relops.broadcast_join(
            li.map_batches(
                lambda t: t.append_column("ap_partkey", t.column("l_partkey")),
                batch_format="pyarrow", zero_copy_batch=True,
            ),
            avg_tbl, on="ap_partkey",
        )
    else:
        joined = li.join(
            avg, "inner",
            num_partitions=relops.choose_num_partitions(
                relops.table_path(sf_dir, "lineitem"), relops.table_path(sf_dir, "part")
            ),
            on=("l_partkey",), right_on=("ap_partkey",),
        )

    def small_qty(batch: pa.Table) -> pa.Table:
        qty = pc.cast(batch.column("l_quantity"), pa.float64())
        thr = pc.multiply(0.2, batch.column("aq"))
        batch = batch.filter(pc.less(qty, thr))
        total = pc.sum(_cents(pc.cast(batch.column("l_extendedprice"), pa.float64()), 100)).as_py() or 0
        return pa.table({"price_c": pa.array([total], pa.int64())})

    total_c = joined.map_batches(
        small_qty, batch_format="pyarrow", zero_copy_batch=True
    ).sum("price_c")
    yearly = float(total_c) / 100.0 / 7.0
    return pa.table({"avg_yearly": round_away_arrow(pa.array([yearly], pa.float64()))})


Q17_SQL = """
SELECT round(
  CAST(sum(CAST(round(l.l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100.0/7.0, 4
) AS avg_yearly
FROM lineitem l
JOIN (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE)/count(*) AS aq
  FROM lineitem GROUP BY l_partkey
) a ON l.l_partkey = a.l_partkey
WHERE l.l_quantity < 0.2 * a.aq
"""


#: row-count gate for q18's qualifying-order broadcast (ids+qty only;
#: 500k rows ~ 8 MB in flight — same bounded-broadcast reasoning as
#: relops.BROADCAST_GATE_BYTES, but the gated set is an aggregate whose
#: size the on-disk table does not bound, so the gate is on ROWS)
Q18_BROADCAST_ROWS = 500_000


def q18_large_volume_orders(sf_dir: str):
    """TPC-H Q18 shape: HAVING on a big groupby, then join back to the
    fact's parent. The having-filtered aggregate (one row per qualifying
    orderkey) joins `orders` via distributed Dataset.join — no driver
    materialization of an sf-scaling set."""
    li = scan(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])

    def qty_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_orderkey": batch.column("l_orderkey"),
                "q": pc.cast(pc.round(batch.column("l_quantity")), pa.int64()),
            }
        )
        return t.group_by(["l_orderkey"]).aggregate([("q", "sum")])

    def sum_and_have(group: pa.Table) -> pa.Table:
        g = group.group_by(["l_orderkey"]).aggregate([("q_sum", "sum")])
        g = g.filter(pc.greater(g.column("q_sum_sum"), 250))
        return pa.table(
            {
                "l_orderkey": g.column("l_orderkey"),
                "total_qty": pc.cast(g.column("q_sum_sum"), pa.int64()),
            }
        )

    # orderkey cardinality ~= order count: bucketed groupby (vectorized
    # per-bucket Arrow aggregate), not Ray's per-group dispatch — 9.5s ->
    # ~1s at sf0.1 for the totals+having stage
    totals = relops.bucketed_groupby(
        li.map_batches(qty_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["l_orderkey"], sum_and_have,
        empty=pa.table(
            {"l_orderkey": pa.array([], pa.int64()), "total_qty": pa.array([], pa.int64())}
        ),
    )
    orders = scan(sf_dir, "orders",
                  columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    # the HAVING leaves FEW qualifying orderkeys (ids+qty only, ~16
    # bytes/row); under the gate they broadcast once and the orders scan
    # joins per batch with zero shuffle. Above the gate: a
    # distributed-built Bloom filter (fixed 128 KB regardless of sf)
    # drops ~99% of orders BEFORE the hash-join shuffle; false positives
    # only re-enter the exact join, so the result is unchanged (totals
    # is ref-level materialized by drop_empty_blocks — no recompute)
    if totals.count() <= Q18_BROADCAST_ROWS:
        blocks = [t for t in ray.get(totals.to_arrow_refs()) if t.num_rows]
        if not blocks:
            return pa.table(
                {
                    "o_orderkey": pa.array([], pa.int64()),
                    "o_custkey": pa.array([], pa.int64()),
                    "o_orderdate": pa.array([], pa.timestamp("us")),
                    "o_totalprice": pa.array([], pa.float64()),
                    "total_qty": pa.array([], pa.int64()),
                }
            )
        small = pa.concat_tables(blocks).rename_columns(["o_orderkey", "total_qty"])
        joined = relops.broadcast_join(orders, small, on="o_orderkey")
    else:
        bits_ref = relops.bloom_from_dataset(totals, "l_orderkey")
        orders = relops.bloom_prefilter(orders, "o_orderkey", bits_ref)
        joined = orders.join(
            totals, "inner",
            num_partitions=relops.choose_num_partitions(
                relops.table_path(sf_dir, "lineitem"), relops.table_path(sf_dir, "orders")
            ),
            on=("o_orderkey",), right_on=("l_orderkey",),
        )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": batch.column("o_orderkey"),
                "o_custkey": batch.column("o_custkey"),
                "o_orderdate": batch.column("o_orderdate"),
                "o_totalprice": round_away_arrow(
                    pc.cast(batch.column("o_totalprice"), pa.float64())
                ),
                "total_qty": pc.cast(batch.column("total_qty"), pa.int64()),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


Q18_SQL = """
SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
       round(o.o_totalprice, 4) AS o_totalprice,
       t.total_qty
FROM orders o
JOIN (
  SELECT l_orderkey,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 250
) t ON o.o_orderkey = t.l_orderkey
"""


def q4_priority_with_returns(sf_dir: str):
    """EXISTS-style semi-join: count orders per priority that have at
    least one returned lineitem. Distinct matching orderkeys come from a
    per-batch local-distinct combiner + groupby (the shuffle moves keys,
    not rows), then a distributed inner join marks existence — the same
    scale shape as anti_join_customers_no_orders, inverted."""
    li = scan(sf_dir, "lineitem", columns=["l_orderkey"],
              filter=(pc.field("l_returnflag") == "R"))

    def local_distinct(batch: pa.Table) -> pa.Table:
        return pa.table({"l_orderkey": pc.unique(batch.column("l_orderkey"))})

    def bucket_distinct(group: pa.Table) -> pa.Table:
        return pa.table({"l_orderkey": pc.unique(group.column("l_orderkey"))})

    # matching orderkeys scale with the fact table: bucketed distinct
    # (vectorized unique per bucket), not a 150k-group Ray aggregate
    keys = relops.bucketed_groupby(
        li.map_batches(local_distinct, batch_format="pyarrow", zero_copy_batch=True),
        ["l_orderkey"], bucket_distinct,
        empty=pa.table({"l_orderkey": pa.array([], pa.int64())}),
    )
    orders = scan(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    joined = orders.join(
        keys, "inner",
        num_partitions=relops.choose_num_partitions(
            relops.table_path(sf_dir, "lineitem"), relops.table_path(sf_dir, "orders")
        ),
        on=("o_orderkey",), right_on=("l_orderkey",),
    )

    def partial(batch: pa.Table) -> pa.Table:
        return batch.select(["o_orderpriority"]).group_by(
            ["o_orderpriority"]
        ).aggregate([("o_orderpriority", "count")])

    agg = (
        joined.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("o_orderpriority")
        .aggregate(Sum("o_orderpriority_count", alias_name="n_orders"))
    )
    tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    return pa.table(
        {
            "o_orderpriority": tbl.column("o_orderpriority"),
            "n_orders": pc.cast(tbl.column("n_orders"), pa.int64()),
        }
    )


Q4_SQL = """
SELECT o.o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o.o_orderpriority
"""


def cheapest_supplier_per_part(sf_dir: str):
    """Argmin-per-group: for every part, the supplier of its cheapest
    lineitem (ties broken by the smaller suppkey). A per-batch combiner
    keeps ONE candidate row per partkey per block — the argmin is
    closed under composition, so the groupby shuffle moves at most one
    row per key per block; the final per-group argmin is the same sorted
    head."""
    li = scan(sf_dir, "lineitem",
              columns=["l_partkey", "l_suppkey", "l_extendedprice"])
    sort_keys = [
        ("l_partkey", "ascending"),
        ("l_extendedprice", "ascending"),
        ("l_suppkey", "ascending"),
    ]

    def combine(batch: pa.Table) -> pa.Table:
        t = batch.take(pc.sort_indices(batch, sort_keys=sort_keys))
        pk = t.column("l_partkey").to_numpy(zero_copy_only=False)
        mask = np.empty(len(pk), dtype=bool)
        if len(pk):
            mask[0] = True
            mask[1:] = pk[1:] != pk[:-1]
        return t.filter(pa.array(mask))

    def bucket_final(group: pa.Table) -> pa.Table:
        t = combine(group)  # sorted first-row-per-key within the bucket
        return pa.table(
            {
                "l_partkey": t.column("l_partkey"),
                "best_suppkey": t.column("l_suppkey"),
                "min_price": round_away_arrow(
                    pc.cast(t.column("l_extendedprice"), pa.float64())
                ),
            }
        )

    pruned = li.map_batches(combine, batch_format="pyarrow", zero_copy_batch=True)
    # one argmin row per partkey: bucketed groupby keeps the reduce
    # vectorized (sort+dedup per bucket) instead of per-key dispatch
    return relops.bucketed_groupby(pruned, ["l_partkey"], bucket_final)


CHEAPEST_SUPPLIER_SQL = """
WITH r AS (
  SELECT l_partkey, l_suppkey, l_extendedprice,
         row_number() OVER (PARTITION BY l_partkey
                            ORDER BY l_extendedprice, l_suppkey) AS rn
  FROM lineitem
)
SELECT l_partkey, l_suppkey AS best_suppkey,
       round(l_extendedprice, 4) AS min_price
FROM r WHERE rn = 1
"""


def q2_min_cost_supplier(sf_dir: str):
    """TPC-H Q2 analog over this dataset's tables (no partsupp here: the
    part-supplier cost relation is derived as min(l_extendedprice) per
    (l_partkey, l_suppkey)). For every SMALL-type size-23 part, keep
    EVERY EUROPE supplier achieving that part's minimum derived cost,
    with supplier/nation attributes attached — the correlated-min
    subquery of Q2 becomes a bucketed argmin that keeps ties.

    Scale shape: ONE fact-scale combiner groupby builds the cost
    relation; nation x region is fixed-size driver work; supplier and
    part attach through the broadcast gate (map-side at dimension size,
    partitioned join beyond it); the per-part min never materializes
    more than the cost relation."""
    # cost relation: min lineitem price per (part, supplier)
    li = scan(sf_dir, "lineitem",
              columns=["l_partkey", "l_suppkey", "l_extendedprice"])

    def cost_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["l_partkey", "l_suppkey"]).aggregate(
            [("l_extendedprice", "min")]
        )
        return pa.table(
            {
                "l_partkey": g.column("l_partkey"),
                "l_suppkey": g.column("l_suppkey"),
                "supply_cost": g.column("l_extendedprice_min"),
            }
        )

    # (part, supplier) cardinality scales with the fact table: map-side
    # combine, then a BUCKETED reduce (vectorized group_by per bucket) —
    # a per-key Ray aggregate over the composite key is the known
    # high-cardinality trap
    def cost_bucket(group: pa.Table) -> pa.Table:
        g = group.group_by(["l_partkey", "l_suppkey"]).aggregate(
            [("supply_cost", "min")]
        )
        return pa.table(
            {
                "l_partkey": g.column("l_partkey"),
                "l_suppkey": g.column("l_suppkey"),
                "supply_cost": g.column("supply_cost_min"),
            }
        )

    cost = relops.bucketed_groupby(
        li.map_batches(cost_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["l_partkey"], cost_bucket,
        empty=pa.schema(
            [("l_partkey", pa.int64()), ("l_suppkey", pa.int64()),
             ("supply_cost", pa.float64())]
        ).empty_table(),
    )

    # EUROPE suppliers with nation names: nation x region is 25 x 5 rows
    # by spec (driver-side); supplier itself is size-gated
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet")).to_pandas()
    region = pq.read_table(os.path.join(sf_dir, "region.parquet")).to_pandas()
    eu_n = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    eu_n = eu_n[eu_n["r_name"] == "EUROPE"][["n_nationkey", "n_name"]]
    supp_small, supp_ds = relops.small_side(
        sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"]
    )
    if supp_small is not None:
        eu = supp_small.to_pandas().merge(
            eu_n, left_on="s_nationkey", right_on="n_nationkey"
        )[["s_suppkey", "s_name", "s_acctbal", "n_name"]]
        cost = relops.broadcast_join(
            cost.map_batches(
                lambda t: t.append_column("s_suppkey", t.column("l_suppkey")),
                batch_format="pyarrow", zero_copy_batch=True,
            ),
            pa.Table.from_pandas(eu, preserve_index=False),
            on="s_suppkey",
        )
    else:
        # nationkeys are a fixed tiny domain: filter + name-attach map-side,
        # then one partitioned join on suppkey
        nk = eu_n["n_nationkey"].to_numpy(dtype=np.int64)
        lut = np.full(int(nation["n_nationkey"].max()) + 1, "", dtype=object)
        lut[nk] = eu_n["n_name"].to_numpy(dtype=object)
        nk_set = pa.array(nk)

        def eu_attach(batch: pa.Table) -> pa.Table:
            t = batch.filter(pc.is_in(batch.column("s_nationkey"), value_set=nk_set))
            names = lut[t.column("s_nationkey").to_numpy(zero_copy_only=False)]
            return pa.table(
                {
                    "s_suppkey": t.column("s_suppkey"),
                    "s_name": t.column("s_name"),
                    "s_acctbal": t.column("s_acctbal"),
                    "n_name": pa.array(names, pa.string()),
                }
            )

        eu_ds = supp_ds.map_batches(
            eu_attach, batch_format="pyarrow", zero_copy_batch=True
        )
        cost = cost.join(
            eu_ds, "inner",
            num_partitions=relops.choose_num_partitions(
                relops.table_path(sf_dir, "lineitem"),
                relops.table_path(sf_dir, "supplier"),
            ),
            on=("l_suppkey",), right_on=("s_suppkey",),
        )

    # part filter + brand attach (size-gated like supplier)
    part_small, part_ds = relops.small_side(
        sf_dir, "part", ["p_partkey", "p_brand", "p_type", "p_size"]
    )
    sel = (pc.field("p_size") == 23) & (pc.field("p_type") == "SMALL")
    if part_small is not None:
        psel = part_small.filter(
            pc.and_(pc.equal(part_small.column("p_size"), 23),
                    pc.equal(part_small.column("p_type"), "SMALL"))
        ).select(["p_partkey", "p_brand"])
        withp = relops.broadcast_join(
            cost.map_batches(
                lambda t: t.append_column("p_partkey", t.column("l_partkey")),
                batch_format="pyarrow", zero_copy_batch=True,
            ),
            psel, on="p_partkey",
        )
    else:
        part_f = scan(sf_dir, "part", columns=["p_partkey", "p_brand"], filter=sel)
        withp = cost.join(
            part_f, "inner",
            num_partitions=relops.choose_num_partitions(
                relops.table_path(sf_dir, "lineitem"),
                relops.table_path(sf_dir, "part"),
            ),
            on=("l_partkey",), right_on=("p_partkey",),
        ).map_batches(
            lambda t: t.append_column("p_partkey", t.column("l_partkey"))
            if "p_partkey" not in t.column_names else t,
            batch_format="pyarrow", zero_copy_batch=True,
        )

    empty = pa.schema(
        [("p_partkey", pa.int64()), ("p_brand", pa.string()),
         ("s_name", pa.string()), ("n_name", pa.string()),
         ("s_acctbal", pa.float64()), ("supply_cost", pa.float64())]
    ).empty_table()

    def bucket_min_ties(group: pa.Table) -> pa.Table:
        t = group.take(pc.sort_indices(
            group, sort_keys=[("p_partkey", "ascending"),
                              ("supply_cost", "ascending")]
        ))
        pk = t.column("p_partkey").to_numpy(zero_copy_only=False)
        costs = t.column("supply_cost").to_numpy(zero_copy_only=False)
        first = np.empty(len(pk), dtype=bool)
        first[0] = True
        first[1:] = pk[1:] != pk[:-1]
        starts = np.flatnonzero(first)
        counts = np.diff(np.r_[starts, len(pk)])
        # min-cost rows INCLUDING ties: exact float equality on values
        # taken from the same column (no arithmetic in between)
        keep = costs == np.repeat(costs[starts], counts)
        t = t.filter(pa.array(keep))
        return pa.table(
            {
                "p_partkey": t.column("p_partkey"),
                "p_brand": t.column("p_brand"),
                "s_name": t.column("s_name"),
                "n_name": t.column("n_name"),
                "s_acctbal": round_away_arrow(
                    pc.cast(t.column("s_acctbal"), pa.float64())),
                "supply_cost": round_away_arrow(
                    pc.cast(t.column("supply_cost"), pa.float64())),
            }
        )

    return relops.bucketed_groupby(withp, ["p_partkey"], bucket_min_ties, empty=empty)


Q2_SQL = """
WITH cost AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice) AS supply_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
), eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier, nation, region
  WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
    AND r_name = 'EUROPE'
), c AS (
  SELECT p.p_partkey, p.p_brand, eu.s_name, eu.n_name, eu.s_acctbal,
         cost.supply_cost
  FROM part p, cost, eu
  WHERE cost.l_partkey = p.p_partkey AND eu.s_suppkey = cost.l_suppkey
    AND p.p_size = 23 AND p.p_type = 'SMALL'
)
SELECT p_partkey, p_brand, s_name, n_name,
       round(s_acctbal, 4) AS s_acctbal,
       round(supply_cost, 4) AS supply_cost
FROM c
QUALIFY supply_cost = min(supply_cost) OVER (PARTITION BY p_partkey)
"""


def order_gap_days_per_customer(sf_dir: str):
    """lag()-window analog: per customer, the average gap in days between
    consecutive orders (ordered by date, orderkey). One groupby(custkey)
    shuffle; each group's gaps are a vectorized diff over its sorted
    timestamps. Gaps are integral days (midnight timestamps), so the
    int-sum / count average is deterministic."""
    orders = scan(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_orderdate"])
    day_us = 86_400_000_000

    def bucket_gaps(group: pa.Table) -> pa.Table:
        ck = group.column("o_custkey").to_numpy(zero_copy_only=False)
        ts = group.column("o_orderdate").to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        ok = group.column("o_orderkey").to_numpy(zero_copy_only=False)
        order = np.lexsort((ok, ts, ck))
        ck, ts = ck[order], ts[order]
        same = ck[1:] == ck[:-1]  # consecutive-row pairs within one customer
        gaps = (np.diff(ts) // day_us)[same]
        if not len(gaps):
            return pa.table(
                {
                    "o_custkey": pa.array([], pa.int64()),
                    "n_gaps": pa.array([], pa.int64()),
                    "avg_gap_days": pa.array([], pa.float64()),
                }
            )
        t = pa.table(
            {
                "o_custkey": pa.array(ck[1:][same], pa.int64()),
                "gap": pa.array(gaps, pa.int64()),
            }
        )
        g = t.group_by(["o_custkey"]).aggregate([("gap", "sum"), ("gap", "count")])
        avg = pc.divide(
            pc.cast(g.column("gap_sum"), pa.float64()),
            pc.cast(g.column("gap_count"), pa.float64()),
        )
        return pa.table(
            {
                "o_custkey": g.column("o_custkey"),
                "n_gaps": pc.cast(g.column("gap_count"), pa.int64()),
                "avg_gap_days": round_away_arrow(avg),
            }
        )

    # custkey cardinality scales with sf: bucketed groupby; the whole
    # bucket's gaps come from ONE lexsort + masked diff (customers with a
    # single order contribute no same-customer pair and drop out)
    return relops.bucketed_groupby(orders, ["o_custkey"], bucket_gaps)


ORDER_GAP_SQL = """
WITH g AS (
  SELECT o_custkey,
         date_diff('day',
                   lag(o_orderdate) OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey),
                   o_orderdate) AS gap
  FROM orders
)
SELECT o_custkey, CAST(count(gap) AS BIGINT) AS n_gaps,
       round(CAST(sum(gap) AS DOUBLE)/count(gap), 4) AS avg_gap_days
FROM g WHERE gap IS NOT NULL
GROUP BY o_custkey
"""


def rollup_events_daily(sf_dir: str):
    """ROLLUP(event_type, day): finest-level aggregate distributed (one
    combiner pass + small groupby), coarser levels derived from the
    finest on the driver — correct because sum/count are aggregates of
    aggregates, and the finest level is types x days rows regardless of
    input scale. Values are exact integer 1e-4 units so re-aggregation
    cannot drift. Subtotal rows use the '__all__' sentinel."""
    ds = scan(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "day": pc.strftime(
                    pc.floor_temporal(batch.column("ts"), unit="day"), format="%Y-%m-%d"
                ),
                "v": _cents(batch.column("value"), 10_000),
            }
        )
        return t.group_by(["event_type", "day"]).aggregate(
            [("v", "sum"), ("v", "count")]
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "day"])
        .aggregate(Sum("v_sum", alias_name="v"), Sum("v_count", alias_name="n"))
    )
    fine = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)

    def level(tbl: pa.Table, keys: list[str]) -> pa.Table:
        if keys:
            g = tbl.group_by(keys).aggregate([("n", "sum"), ("v", "sum")])
            n, v = g.column("n_sum"), g.column("v_sum")
        else:
            g = pa.table({})
            n = pa.array([pc.sum(tbl.column("n")).as_py() or 0], pa.int64())
            v = pa.array([pc.sum(tbl.column("v")).as_py() or 0], pa.int64())
        rows = len(n)
        return pa.table(
            {
                "event_type": g.column("event_type") if "event_type" in keys
                else pa.array(["__all__"] * rows),
                "day": g.column("day") if "day" in keys
                else pa.array(["__all__"] * rows),
                "n": pc.cast(n, pa.int64()),
                "sum_value": round_away_arrow(
                    pc.divide(pc.cast(v, pa.float64()), 10_000.0)
                ),
            }
        )

    return pa.concat_tables(
        [level(fine, ["event_type", "day"]), level(fine, ["event_type"]), level(fine, [])]
    )


ROLLUP_EVENTS_SQL = """
WITH base AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
         CAST(round(value*10000) AS BIGINT) AS v
  FROM events
),
l2 AS (SELECT event_type, day, count(*) AS n, sum(v) AS v
       FROM base GROUP BY event_type, day)
SELECT event_type, day, CAST(n AS BIGINT) AS n,
       round(CAST(v AS DOUBLE)/10000.0, 4) AS sum_value FROM l2
UNION ALL
SELECT event_type, '__all__', CAST(sum(n) AS BIGINT),
       round(CAST(sum(v) AS DOUBLE)/10000.0, 4) FROM l2 GROUP BY event_type
UNION ALL
SELECT '__all__', '__all__', CAST(sum(n) AS BIGINT),
       round(CAST(sum(v) AS DOUBLE)/10000.0, 4) FROM l2
"""


def grouping_sets_events(sf_dir: str):
    """GROUPING SETS ((event_type, cohort), (day, cohort), (event_type),
    ()) — the non-hierarchical cousin of ROLLUP/CUBE (neither family
    produces this set mix). Same scale discipline: ONE distributed
    combiner pass computes the finest (event_type, day, cohort) level —
    types × days × 4 rows regardless of input scale — and every
    requested set re-aggregates those exact integer 1e-4-unit partials
    driver-side, so subtotals cannot drift. cohort = user_id % 4 (a
    deterministic audience split). Sentinel '__all__' / -1 marks
    grouped-out columns."""
    ds = scan(sf_dir, "events", columns=["ts", "event_type", "user_id", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "day": pc.strftime(
                    pc.floor_temporal(batch.column("ts"), unit="day"), format="%Y-%m-%d"
                ),
                "cohort": pa.array(
                    batch.column("user_id").to_numpy(zero_copy_only=False) % 4,
                    pa.int64(),
                ),
                "v": _cents(batch.column("value"), 10_000),
            }
        )
        return t.group_by(["event_type", "day", "cohort"]).aggregate(
            [("v", "sum"), ("v", "count")]
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "day", "cohort"])
        .aggregate(Sum("v_sum", alias_name="v"), Sum("v_count", alias_name="n"))
    )
    fine = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)

    def level(keys: list[str]) -> pa.Table:
        if keys:
            g = fine.group_by(keys).aggregate([("n", "sum"), ("v", "sum")])
            n, v = g.column("n_sum"), g.column("v_sum")
        else:
            g = pa.table({})
            n = pa.array([pc.sum(fine.column("n")).as_py() or 0], pa.int64())
            v = pa.array([pc.sum(fine.column("v")).as_py() or 0], pa.int64())
        rows = len(n)
        return pa.table(
            {
                "event_type": g.column("event_type") if "event_type" in keys
                else pa.array(["__all__"] * rows),
                "day": g.column("day") if "day" in keys
                else pa.array(["__all__"] * rows),
                "cohort": pc.cast(g.column("cohort"), pa.int64()) if "cohort" in keys
                else pa.array([-1] * rows, pa.int64()),
                "n": pc.cast(n, pa.int64()),
                "sum_value": round_away_arrow(
                    pc.divide(pc.cast(v, pa.float64()), 10_000.0)
                ),
            }
        )

    return pa.concat_tables(
        [
            level(["event_type", "cohort"]),
            level(["day", "cohort"]),
            level(["event_type"]),
            level([]),
        ]
    )


GROUPING_SETS_SQL = """
WITH base AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, user_id % 4 AS cohort,
         CAST(round(value*10000) AS BIGINT) AS v
  FROM events
),
fine AS (SELECT event_type, day, cohort, count(*) AS n, sum(v) AS v
         FROM base GROUP BY event_type, day, cohort)
SELECT event_type, '__all__' AS day, CAST(cohort AS BIGINT) AS cohort,
       CAST(sum(n) AS BIGINT) AS n,
       round(CAST(sum(v) AS DOUBLE)/10000.0, 4) AS sum_value
FROM fine GROUP BY event_type, cohort
UNION ALL
SELECT '__all__', day, CAST(cohort AS BIGINT), CAST(sum(n) AS BIGINT),
       round(CAST(sum(v) AS DOUBLE)/10000.0, 4) FROM fine GROUP BY day, cohort
UNION ALL
SELECT event_type, '__all__', -1, CAST(sum(n) AS BIGINT),
       round(CAST(sum(v) AS DOUBLE)/10000.0, 4) FROM fine GROUP BY event_type
UNION ALL
SELECT '__all__', '__all__', -1, CAST(sum(n) AS BIGINT),
       round(CAST(sum(v) AS DOUBLE)/10000.0, 4) FROM fine
"""


def set_ops_customers(sf_dir: str):
    """INTERSECT / EXCEPT in one pass: customers who ordered in 1995,
    1996, or both — per-batch (custkey, in_a, in_b) flag partials, one
    groupby(max, max), status from the flag pair. The shuffle moves at
    most one flag row per key per block; no driver key sets."""
    lo = np.datetime64("1995-01-01", "us")
    mid = np.datetime64("1996-01-01", "us")
    hi = np.datetime64("1997-01-01", "us")
    orders = scan(
        sf_dir, "orders", columns=["o_custkey", "o_orderdate"],
        filter=((pc.field("o_orderdate") >= lo) & (pc.field("o_orderdate") < hi)),
    )

    def flags(batch: pa.Table) -> pa.Table:
        d = batch.column("o_orderdate")
        t = pa.table(
            {
                "o_custkey": batch.column("o_custkey"),
                "in_a": pc.cast(pc.less(d, pa.scalar(mid)), pa.int8()),
                "in_b": pc.cast(pc.greater_equal(d, pa.scalar(mid)), pa.int8()),
            }
        )
        return t.group_by(["o_custkey"]).aggregate([("in_a", "max"), ("in_b", "max")])

    agg = (
        orders.map_batches(flags, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("o_custkey")
        .aggregate(Max("in_a_max", alias_name="a"), Max("in_b_max", alias_name="b"))
    )

    def status(batch: pa.Table) -> pa.Table:
        a = pc.greater(batch.column("a"), 0)
        b = pc.greater(batch.column("b"), 0)
        st = pc.if_else(
            pc.and_(a, b), "both", pc.if_else(a, "1995_only", "1996_only")
        )
        return pa.table({"o_custkey": batch.column("o_custkey"), "status": st})

    return agg.map_batches(status, batch_format="pyarrow", zero_copy_batch=True)


SET_OPS_SQL = """
WITH a AS (SELECT DISTINCT o_custkey FROM orders
           WHERE o_orderdate >= TIMESTAMP '1995-01-01'
             AND o_orderdate <  TIMESTAMP '1996-01-01'),
b AS (SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1997-01-01')
SELECT coalesce(a.o_custkey, b.o_custkey) AS o_custkey,
  CASE WHEN a.o_custkey IS NOT NULL AND b.o_custkey IS NOT NULL THEN 'both'
       WHEN a.o_custkey IS NOT NULL THEN '1995_only'
       ELSE '1996_only' END AS status
FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey
"""


def corr_qty_price_by_flag(sf_dir: str):
    """Pearson correlation per group via mergeable sufficient statistics
    (n, Sx, Sy, Sxx, Sxy, Syy) — the distributed-statistics pattern: one
    combiner pass, one tiny groupby, exact integer sums (qty integral,
    price rounded to whole dollars), then one float formula per group.
    The final arithmetic mirrors the SQL twin operation-for-operation
    (int -> double casts, IEEE sqrt/divide), so the doubles are
    bit-identical. int64 bound: Syy is the binding term (~1.1e10 per
    row), safe to ~8e8 rows per flag; beyond that shard Syy into
    hi/lo words or sum compensated doubles."""
    li = scan(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    def partial(batch: pa.Table) -> pa.Table:
        x = pc.cast(pc.round(batch.column("l_quantity")), pa.int64())
        y = pc.cast(pc.round(batch.column("l_extendedprice")), pa.int64())
        t = pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "one": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
                "x": x,
                "y": y,
                "xx": pc.multiply(x, x),
                "xy": pc.multiply(x, y),
                "yy": pc.multiply(y, y),
            }
        )
        return t.group_by(["l_returnflag"]).aggregate(
            [(c, "sum") for c in ("one", "x", "y", "xx", "xy", "yy")]
        )

    agg = (
        li.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_returnflag")
        .aggregate(*[Sum(f"{c}_sum", alias_name=c) for c in ("one", "x", "y", "xx", "xy", "yy")])
    )
    tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    import math

    flags, ns, corrs = [], [], []
    for row in tbl.to_pylist():
        n, sx, sy = int(row["one"]), int(row["x"]), int(row["y"])
        sxx, sxy, syy = int(row["xx"]), int(row["xy"]), int(row["yy"])
        num = n * sxy - sx * sy
        den = math.sqrt(float(n * sxx - sx * sx)) * math.sqrt(float(n * syy - sy * sy))
        flags.append(row["l_returnflag"])
        ns.append(n)
        corrs.append(float(num) / den if den else 0.0)
    return pa.table(
        {
            "l_returnflag": pa.array(flags, pa.string()),
            "n": pa.array(ns, pa.int64()),
            "corr_qty_price": round_away_arrow(pa.array(corrs, pa.float64())),
        }
    )


CORR_SQL = """
WITH s AS (
  SELECT l_returnflag, count(*) AS n,
    sum(CAST(round(l_quantity) AS HUGEINT)) AS sx,
    sum(CAST(round(l_extendedprice) AS HUGEINT)) AS sy,
    sum(CAST(round(l_quantity) AS HUGEINT)*CAST(round(l_quantity) AS HUGEINT)) AS sxx,
    sum(CAST(round(l_quantity) AS HUGEINT)*CAST(round(l_extendedprice) AS HUGEINT)) AS sxy,
    sum(CAST(round(l_extendedprice) AS HUGEINT)*CAST(round(l_extendedprice) AS HUGEINT)) AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, CAST(n AS BIGINT) AS n,
  round(CAST(n*sxy - sx*sy AS DOUBLE)
        / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) * sqrt(CAST(n*syy - sy*sy AS DOUBLE))),
        4) AS corr_qty_price
FROM s
"""


def mode_brand_per_type(sf_dir: str):
    """Mode (most frequent value) per group with a deterministic
    tiebreak: count (p_type, p_brand) pairs via combiner partials, then a
    per-type argmax — count desc, brand asc. The pair-count table is
    bounded by the categorical cross-product, not the row count."""
    part = scan(sf_dir, "part", columns=["p_type", "p_brand"])

    def partial(batch: pa.Table) -> pa.Table:
        return batch.group_by(["p_type", "p_brand"]).aggregate([("p_brand", "count")])

    counts = (
        part.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["p_type", "p_brand"])
        .aggregate(Sum("p_brand_count", alias_name="cnt"))
    )

    def argmax(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group, sort_keys=[("cnt", "descending"), ("p_brand", "ascending")]
        )
        t = group.take(idx).slice(0, 1)
        return pa.table(
            {
                "p_type": t.column("p_type"),
                "top_brand": t.column("p_brand"),
                "n": pc.cast(t.column("cnt"), pa.int64()),
            }
        )

    return counts.groupby("p_type").map_groups(argmax, batch_format="pyarrow")


MODE_BRAND_SQL = """
WITH c AS (SELECT p_type, p_brand, count(*) AS cnt
           FROM part GROUP BY p_type, p_brand),
r AS (SELECT *, row_number() OVER (PARTITION BY p_type
                                   ORDER BY cnt DESC, p_brand) AS rn
      FROM c)
SELECT p_type, p_brand AS top_brand, CAST(cnt AS BIGINT) AS n
FROM r WHERE rn = 1
"""


# --------------------------------------------------------------------------
# round-3 widening: repetition / quality signals for LLM-corpus curation
# (Gopher-style repetition rules, C4-style keep/drop filters). All three
# explode words with Arrow kernels (split_pattern + list_flatten) and
# aggregate within the batch — a document never spans batches, so the
# corpus needs NO shuffle.


def _exploded_words(batch: pa.Table) -> tuple[np.ndarray, pa.Array, np.ndarray]:
    """(parent doc_id per word, flat word array, words-per-doc lengths) —
    vectorized explode, no per-row Python."""
    words = pc.split_pattern(batch.column("text"), pattern=" ")
    words = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
    lengths = pc.list_value_length(words).to_numpy(zero_copy_only=False)
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    return np.repeat(ids, lengths), pc.list_flatten(words), lengths


def ttr_documents(sf_dir: str):
    """Type-token ratio + top-word fraction per document (the Gopher
    'fraction of most common word' repetition signal)."""
    ds = scan(sf_dir, "documents", columns=["doc_id", "text"])

    def stats(batch: pa.Table) -> pa.Table:
        parent, flat, _ = _exploded_words(batch)
        t = pa.table({"doc_id": pa.array(parent, pa.int64()), "word": flat})
        c = t.group_by(["doc_id", "word"]).aggregate([("word", "count")])
        d = c.group_by(["doc_id"]).aggregate(
            [("word_count", "sum"), ("word_count", "count"), ("word_count", "max")]
        )
        nw = pc.cast(d.column("word_count_sum"), pa.float64())
        nt = pc.cast(d.column("word_count_count"), pa.float64())
        top = pc.cast(d.column("word_count_max"), pa.float64())
        return pa.table(
            {
                "doc_id": d.column("doc_id"),
                "n_words": pc.cast(d.column("word_count_sum"), pa.int64()),
                "n_types": pc.cast(d.column("word_count_count"), pa.int64()),
                "ttr": round_away_arrow(pc.divide(nt, nw)),
                "top_frac": round_away_arrow(pc.divide(top, nw)),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)


TTR_SQL = """
WITH ws AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
c AS (SELECT doc_id, word, count(*) AS cnt FROM ws GROUP BY doc_id, word)
SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_words,
  CAST(count(*) AS BIGINT) AS n_types,
  round(CAST(count(*) AS DOUBLE)/sum(cnt), 4) AS ttr,
  round(CAST(max(cnt) AS DOUBLE)/sum(cnt), 4) AS top_frac
FROM c GROUP BY doc_id
"""


def bigram_repetition_documents(sf_dir: str):
    """Duplicate-bigram fraction per document (Gopher duplicate-n-gram
    rule). Bigrams form by joining the flat word array against itself
    shifted by one (one Arrow binary_join kernel), masking word pairs
    that straddle a document boundary; docs with < 2 words drop out."""
    ds = scan(sf_dir, "documents", columns=["doc_id", "text"])

    def stats(batch: pa.Table) -> pa.Table:
        parent, flat, _ = _exploded_words(batch)
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_bigrams": pa.array([], pa.int64()),
                "n_distinct": pa.array([], pa.int64()),
                "dup_frac": pa.array([], pa.float64()),
            }
        )
        if len(flat) < 2:
            return empty
        a = flat.slice(0, len(flat) - 1)
        b = flat.slice(1)
        bg = pc.binary_join_element_wise(a, b, " ")
        same_doc = parent[:-1] == parent[1:]
        t = pa.table(
            {
                "doc_id": pa.array(parent[:-1][same_doc], pa.int64()),
                "g": pc.array_filter(bg, pa.array(same_doc)),
            }
        )
        if t.num_rows == 0:
            return empty
        c = t.group_by(["doc_id", "g"]).aggregate([("g", "count")])
        d = c.group_by(["doc_id"]).aggregate(
            [("g_count", "sum"), ("g_count", "count")]
        )
        n = pc.cast(d.column("g_count_sum"), pa.float64())
        nd = pc.cast(d.column("g_count_count"), pa.float64())
        return pa.table(
            {
                "doc_id": d.column("doc_id"),
                "n_bigrams": pc.cast(d.column("g_count_sum"), pa.int64()),
                "n_distinct": pc.cast(d.column("g_count_count"), pa.int64()),
                "dup_frac": round_away_arrow(
                    pc.divide(pc.subtract(n, nd), n)
                ),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)


BIGRAM_REP_SQL = """
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
g AS (SELECT doc_id, array_to_string(list_slice(w, i, i + 1), ' ') AS g
      FROM ws, unnest(range(1, len(w))) AS t(i) WHERE len(w) >= 2)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
  CAST(count(DISTINCT g) AS BIGINT) AS n_distinct,
  round(CAST(count(*) - count(DISTINCT g) AS DOUBLE)/count(*), 4) AS dup_frac
FROM g GROUP BY doc_id
"""


def c4_filter_documents(sf_dir: str):
    """C4-style keep/drop filter: word-count floor, stopword-fraction
    floor and mean-word-length ceiling, with the signals emitted beside
    the boolean so a downstream pipeline can re-threshold without a
    second corpus pass. keep is decided on UNROUNDED doubles (identical
    arithmetic to the SQL twin); rounding is display-only."""
    ds = scan(sf_dir, "documents", columns=["doc_id", "text"])

    def stats(batch: pa.Table) -> pa.Table:
        parent, flat, _ = _exploded_words(batch)
        is_stop = pc.is_in(flat, value_set=pa.array(["the", "a"]))
        t = pa.table(
            {
                "doc_id": pa.array(parent, pa.int64()),
                "stop": pc.cast(is_stop, pa.int64()),
                "wlen": pc.cast(pc.utf8_length(flat), pa.int64()),
            }
        )
        d = t.group_by(["doc_id"]).aggregate(
            [("stop", "count"), ("stop", "sum"), ("wlen", "sum")]
        )
        nw = pc.cast(d.column("stop_count"), pa.float64())
        stop_frac = pc.divide(pc.cast(d.column("stop_sum"), pa.float64()), nw)
        mean_wlen = pc.divide(pc.cast(d.column("wlen_sum"), pa.float64()), nw)
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(d.column("stop_count"), 40),
                pc.greater_equal(stop_frac, 0.03),
            ),
            pc.less_equal(mean_wlen, 4.8),
        )
        return pa.table(
            {
                "doc_id": d.column("doc_id"),
                "n_words": pc.cast(d.column("stop_count"), pa.int64()),
                "stop_frac": round_away_arrow(stop_frac),
                "mean_wlen": round_away_arrow(mean_wlen),
                "keep": keep,
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)


C4_FILTER_SQL = """
WITH ws AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
s AS (SELECT doc_id, count(*) AS n_words,
        sum(CASE WHEN word IN ('the', 'a') THEN 1 ELSE 0 END) AS n_stop,
        sum(length(word)) AS n_chars
      FROM ws GROUP BY doc_id)
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
  round(CAST(n_stop AS DOUBLE)/n_words, 4) AS stop_frac,
  round(CAST(n_chars AS DOUBLE)/n_words, 4) AS mean_wlen,
  (n_words >= 40 AND CAST(n_stop AS DOUBLE)/n_words >= 0.03
   AND CAST(n_chars AS DOUBLE)/n_words <= 4.8) AS keep
FROM s
"""


def q13_customer_distribution(sf_dir: str):
    """TPC-H Q13 shape: the distribution of per-customer order counts,
    INCLUDING zero-order customers. Per-batch (custkey, n) partials →
    bucketed exact sum (custkey cardinality scales with sf) → distributed
    left_outer join from customer (null → 0) → the histogram itself has
    at most max-orders-per-customer rows, so a per-batch partial and a
    tiny groupby finish it. Nothing sf-scaling touches the driver."""
    orders = scan(sf_dir, "orders", columns=["o_custkey"])

    def partial(batch: pa.Table) -> pa.Table:
        return batch.group_by(["o_custkey"]).aggregate([("o_custkey", "count")])

    def bucket_sum(group: pa.Table) -> pa.Table:
        g = group.group_by(["o_custkey"]).aggregate([("o_custkey_count", "sum")])
        return pa.table(
            {
                "k_custkey": g.column("o_custkey"),
                "n": pc.cast(g.column("o_custkey_count_sum"), pa.int64()),
            }
        )

    counts = relops.bucketed_groupby(
        orders.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["o_custkey"], bucket_sum,
        empty=pa.table(
            {"k_custkey": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
        ),
    )
    cust = scan(sf_dir, "customer", columns=["c_custkey"])
    n_parts = relops.choose_num_partitions(
        relops.table_path(sf_dir, "customer"), relops.table_path(sf_dir, "orders")
    )
    joined = cust.join(
        counts, "left_outer", num_partitions=n_parts,
        on=("c_custkey",), right_on=("k_custkey",),
    )

    def hist_partial(batch: pa.Table) -> pa.Table:
        if "n" not in batch.column_names:
            c = pa.nulls(batch.num_rows, pa.int64())
        else:
            c = batch.column("n")
        t = pa.table({"c_count": pc.fill_null(c, 0)})
        return t.group_by(["c_count"]).aggregate([("c_count", "count")])

    partials = relops.drop_empty_blocks(
        joined.map_batches(hist_partial, batch_format="pyarrow", zero_copy_batch=True),
        pa.table(
            {"c_count": pa.array([], pa.int64()), "c_count_count": pa.array([], pa.int64())}
        ),
    )
    agg = partials.groupby("c_count").aggregate(
        Sum("c_count_count", alias_name="custdist")
    )
    tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    return pa.table(
        {
            "c_count": pc.cast(tbl.column("c_count"), pa.int64()),
            "custdist": pc.cast(tbl.column("custdist"), pa.int64()),
        }
    )


Q13_SQL = """
SELECT c_count, count(*) AS custdist FROM (
  SELECT c.c_custkey, count(o.o_custkey) AS c_count
  FROM customer c LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey)
GROUP BY c_count
"""


def q22_sales_opportunity(sf_dir: str):
    """TPC-H Q22 shape: "rich but inactive" — customers whose balance
    exceeds the positive-balance global average AND who placed no orders,
    counted per nation ("no orders" = none since 2000-06-01, so the
    result is non-degenerate on TPC-H-shaped data where every customer
    has SOME order). The scalar subquery is two distributed partial sums
    (one tiny row per block); the threshold compare runs in exact integer
    arithmetic (cents·n > s, no float division) so the SQL twin is
    bit-identical; the recency filter is the distinct-marker anti-join.
    customer/orders never materialize on the driver."""
    cust = scan(sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def bal_partial(batch: pa.Table) -> pa.Table:
        cents = _cents(batch.column("c_acctbal"), 100)
        pos = cents.filter(pc.greater(cents, 0))
        s = pc.sum(pos).as_py() or 0
        return pa.table(
            {"s": pa.array([s], pa.int64()), "n": pa.array([len(pos)], pa.int64())}
        )

    stats = (
        cust.map_batches(bal_partial, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()  # one row per block — bounded by block count, not rows
        .sum()
    )
    tot_s, tot_n = int(stats["s"]), int(stats["n"])

    orders = scan(
        sf_dir, "orders", columns=["o_custkey"],
        filter=(pc.field("o_orderdate") >= np.datetime64("2000-06-01", "us")),
    )

    def local_distinct(batch: pa.Table) -> pa.Table:
        return pa.table({"o_custkey": pc.unique(batch.column("o_custkey"))})

    def bucket_distinct(group: pa.Table) -> pa.Table:
        u = pc.unique(group.column("o_custkey"))
        return pa.table(
            {"o_custkey": u, "_has": pa.array(np.ones(len(u), dtype=np.int64))}
        )

    keys = relops.bucketed_groupby(
        orders.map_batches(local_distinct, batch_format="pyarrow", zero_copy_batch=True),
        ["o_custkey"], bucket_distinct,
        empty=pa.table(
            {"o_custkey": pa.array([], pa.int64()), "_has": pa.array([], pa.int64())}
        ),
    )

    def rich_only(batch: pa.Table) -> pa.Table:
        cents = _cents(batch.column("c_acctbal"), 100)
        # cents/100 > s/(100·n)  ⟺  cents·n > s — exact, no float compare
        keep = pc.greater(pc.multiply(cents, pa.scalar(tot_n, pa.int64())),
                          pa.scalar(tot_s, pa.int64()))
        t = batch.filter(keep)
        return pa.table(
            {
                "c_custkey": t.column("c_custkey"),
                "c_nationkey": t.column("c_nationkey"),
                "bal_c": _cents(t.column("c_acctbal"), 100),
            }
        )

    # tiny inputs fragment the scan into schema-less empty read blocks
    # that pass through map_batches untouched and crash the join's hash
    # partitioner — strip them at the ref level
    rich = relops.drop_empty_blocks(
        cust.map_batches(rich_only, batch_format="pyarrow", zero_copy_batch=True),
        pa.table(
            {
                "c_custkey": pa.array([], pa.int64()),
                "c_nationkey": pa.array([], pa.int64()),
                "bal_c": pa.array([], pa.int64()),
            }
        ),
    )
    n_parts = relops.choose_num_partitions(
        relops.table_path(sf_dir, "customer"), relops.table_path(sf_dir, "orders")
    )
    joined = rich.join(
        keys, "left_outer", num_partitions=n_parts,
        on=("c_custkey",), right_on=("o_custkey",),
    )

    def inactive_partial(batch: pa.Table) -> pa.Table:
        if "c_nationkey" not in batch.column_names:
            # Ray joins emit schema-less empty blocks; return a typed partial
            return pa.table(
                {
                    "c_nationkey": pa.array([], pa.int64()),
                    "bal_c_sum": pa.array([], pa.int64()),
                    "bal_c_count": pa.array([], pa.int64()),
                }
            )
        if "_has" in batch.column_names:
            batch = batch.filter(pc.is_null(batch.column("_has")))
        t = batch.select(["c_nationkey", "bal_c"])
        return t.group_by(["c_nationkey"]).aggregate(
            [("bal_c", "sum"), ("bal_c", "count")]
        )

    partials = relops.drop_empty_blocks(
        joined.map_batches(inactive_partial, batch_format="pyarrow", zero_copy_batch=True),
        pa.table(
            {
                "c_nationkey": pa.array([], pa.int64()),
                "bal_c_sum": pa.array([], pa.int64()),
                "bal_c_count": pa.array([], pa.int64()),
            }
        ),
    )
    agg = partials.groupby("c_nationkey").aggregate(
        Sum("bal_c_sum", alias_name="tot_c"),
        Sum("bal_c_count", alias_name="numcust"),
    )
    tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    return pa.table(
        {
            "c_nationkey": tbl.column("c_nationkey"),
            "numcust": pc.cast(tbl.column("numcust"), pa.int64()),
            "totacctbal": pc.divide(pc.cast(tbl.column("tot_c"), pa.float64()), 100.0),
        }
    )


Q22_SQL = """
WITH pos AS (SELECT sum(CAST(round(c_acctbal*100) AS BIGINT)) AS s, count(*) AS n
             FROM customer WHERE CAST(round(c_acctbal*100) AS BIGINT) > 0)
SELECT c_nationkey, count(*) AS numcust,
       sum(CAST(round(c_acctbal*100) AS BIGINT))/100.0 AS totacctbal
FROM customer, pos
WHERE CAST(round(c_acctbal*100) AS BIGINT) * pos.n > pos.s
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = customer.c_custkey
                  AND o.o_orderdate >= DATE '2000-06-01')
GROUP BY c_nationkey
"""


def q10_returned_items(sf_dir: str):
    """TPC-H Q10 shape: top 20 customers by revenue lost to returns in one
    quarter. Returned lineitems pre-aggregate per orderkey in-batch, join
    the date-filtered orders (distributed, size-derived partitions),
    re-aggregate per custkey through the bucketed groupby, then a
    distributed top-k (ties broken by custkey) leaves 20 rows; ONLY those
    20 keys fetch customer attributes back via a predicate-pushed scan —
    the customer table itself is never read in full anywhere."""
    li = scan(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=(pc.field("l_returnflag") == "R"),
    )
    orders = scan(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey"],
        filter=(
            (pc.field("o_orderdate") >= np.datetime64("1996-10-01", "us"))
            & (pc.field("o_orderdate") < np.datetime64("1997-01-01", "us"))
        ),
    )

    def rev_partial(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            pc.cast(batch.column("l_extendedprice"), pa.float64()),
            pc.subtract(1.0, pc.cast(batch.column("l_discount"), pa.float64())),
        )
        t = pa.table({"l_orderkey": batch.column("l_orderkey"), "rev_c": _cents(rev, 10_000)})
        return t.group_by(["l_orderkey"]).aggregate([("rev_c", "sum")])

    per_order = relops.drop_empty_blocks(
        li.map_batches(rev_partial, batch_format="pyarrow", zero_copy_batch=True),
        pa.table(
            {"l_orderkey": pa.array([], pa.int64()), "rev_c_sum": pa.array([], pa.int64())}
        ),
    )
    n_parts = relops.choose_num_partitions(
        relops.table_path(sf_dir, "lineitem"), relops.table_path(sf_dir, "orders")
    )
    joined = per_order.join(
        orders, "inner", num_partitions=n_parts,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def cust_partial(batch: pa.Table) -> pa.Table:
        t = batch.select(["o_custkey", "rev_c_sum"])
        return t.group_by(["o_custkey"]).aggregate([("rev_c_sum", "sum")])

    def bucket_sum(group: pa.Table) -> pa.Table:
        g = group.group_by(["o_custkey"]).aggregate([("rev_c_sum_sum", "sum")])
        return pa.table(
            {
                "c_custkey": g.column("o_custkey"),
                "rev_c": g.column("rev_c_sum_sum_sum"),
            }
        )

    per_cust = relops.bucketed_groupby(
        joined.map_batches(cust_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["o_custkey"], bucket_sum,
        empty=pa.table(
            {"c_custkey": pa.array([], pa.int64()), "rev_c": pa.array([], pa.int64())}
        ),
    )
    top = relops.topk(
        per_cust, [("rev_c", "descending"), ("c_custkey", "ascending")], 20
    )
    top_tbl = pa.Table.from_pandas(top.to_pandas(), preserve_index=False)
    keys = top_tbl.column("c_custkey").to_pylist()

    # attribute fetch for EXACTLY the 20 winners: predicate-pushed scan
    attrs = (
        scan(
            sf_dir, "customer",
            columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
            filter=pc.field("c_custkey").isin(keys),
        )
        .to_pandas()
    )
    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    ).to_pandas()
    out = (
        top_tbl.to_pandas()
        .merge(attrs, on="c_custkey")
        .merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    )
    out["revenue"] = out["rev_c"].astype(np.int64) / 10_000.0
    out = out.sort_values(["revenue", "c_custkey"], ascending=[False, True])
    return pa.Table.from_pandas(
        out[["c_custkey", "c_name", "revenue", "c_acctbal", "n_name"]],
        preserve_index=False,
    )


Q10_SQL = """
SELECT c.c_custkey, c.c_name,
       sum(CAST(round(l_extendedprice*(1-l_discount)*10000) AS BIGINT))/10000.0 AS revenue,
       c.c_acctbal, n.n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= DATE '1996-10-01' AND o.o_orderdate < DATE '1997-01-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c.c_custkey LIMIT 20
"""


def q16_parts_supplier_counts(sf_dir: str):
    """TPC-H Q16 shape: distinct suppliers per (brand, type, size) over
    the part-supplier pairs observed in lineitem, with an exclusion
    filter. Two-level distinct: (partkey, suppkey) pairs dedup through
    the bucketed groupby, part attributes attach via the size-gated
    dimension join, then (brand, type, size, suppkey) dedups the same
    way; the final count per group is a per-batch partial over globally
    distinct rows + a tiny groupby (brands × types × sizes groups)."""
    li = scan(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])

    def pair_distinct(batch: pa.Table) -> pa.Table:
        return batch.group_by(["l_partkey", "l_suppkey"]).aggregate([])

    def bucket_pair(group: pa.Table) -> pa.Table:
        return group.group_by(["l_partkey", "l_suppkey"]).aggregate([])

    pairs = relops.bucketed_groupby(
        li.map_batches(pair_distinct, batch_format="pyarrow", zero_copy_batch=True),
        ["l_partkey", "l_suppkey"], bucket_pair,
        empty=pa.table(
            {"l_partkey": pa.array([], pa.int64()), "l_suppkey": pa.array([], pa.int64())}
        ),
    )

    part_small, part_ds = relops.small_side(
        sf_dir, "part", ["p_partkey", "p_brand", "p_type", "p_size"]
    )
    if part_small is not None:
        keep = pc.and_(
            pc.not_equal(part_small.column("p_brand"), "Brand#13"),
            pc.less_equal(part_small.column("p_size"), 25),
        )
        withpart = relops.broadcast_join(
            pairs, part_small.filter(keep).rename_columns(
                ["l_partkey", "p_brand", "p_type", "p_size"]
            ), on="l_partkey",
        )
    else:
        def _part_filter(t: pa.Table) -> pa.Table:
            return t.filter(pc.and_(
                pc.not_equal(t.column("p_brand"), "Brand#13"),
                pc.less_equal(t.column("p_size"), 25),
            ))

        part_ds = part_ds.map_batches(
            _part_filter, batch_format="pyarrow", zero_copy_batch=True
        )
        withpart = pairs.join(
            part_ds, "inner",
            num_partitions=relops.choose_num_partitions(
                relops.table_path(sf_dir, "lineitem"), relops.table_path(sf_dir, "part")
            ),
            on=("l_partkey",), right_on=("p_partkey",),
        )

    gcols = ["p_brand", "p_type", "p_size", "l_suppkey"]

    def quad_distinct(batch: pa.Table) -> pa.Table:
        return batch.select(gcols).group_by(gcols).aggregate([])

    def bucket_quad(group: pa.Table) -> pa.Table:
        return group.group_by(gcols).aggregate([])

    quads = relops.bucketed_groupby(
        withpart.map_batches(quad_distinct, batch_format="pyarrow", zero_copy_batch=True),
        gcols, bucket_quad,
        empty=pa.table(
            {
                "p_brand": pa.array([], pa.string()),
                "p_type": pa.array([], pa.string()),
                "p_size": pa.array([], pa.int64()),
                "l_suppkey": pa.array([], pa.int64()),
            }
        ),
    )

    def count_partial(batch: pa.Table) -> pa.Table:
        return batch.group_by(["p_brand", "p_type", "p_size"]).aggregate(
            [("l_suppkey", "count")]
        )

    agg = (
        quads.map_batches(count_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["p_brand", "p_type", "p_size"])
        .aggregate(Sum("l_suppkey_count", alias_name="supplier_cnt"))
    )
    tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    return pa.table(
        {
            "p_brand": tbl.column("p_brand"),
            "p_type": tbl.column("p_type"),
            "p_size": pc.cast(tbl.column("p_size"), pa.int64()),
            "supplier_cnt": pc.cast(tbl.column("supplier_cnt"), pa.int64()),
        }
    )


Q16_SQL = """
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#13' AND p_size <= 25
GROUP BY p_brand, p_type, p_size
"""


def inverted_index_documents(sf_dir: str, cap: int = 100):
    """Search-index build: word → document frequency + the first ``cap``
    posting doc_ids (comma-joined, ascending). Each document lives wholly
    in one batch, so per-batch distinct (word, doc_id) pairs are already
    globally distinct — the shuffle moves one row per pair, and the
    posting-list assembly runs per word inside the bucketed groupby
    (word cardinality = vocabulary, heavy-tailed but ≪ corpus). The cap
    bounds output row width no matter how common a word is."""
    ds = scan(sf_dir, "documents", columns=["doc_id", "text"])

    def pairs(batch: pa.Table) -> pa.Table:
        parent, flat, _ = _exploded_words(batch)
        t = pa.table({"word": flat, "doc_id": pa.array(parent, pa.int64())})
        return t.group_by(["word", "doc_id"]).aggregate([])

    def bucket_postings(group: pa.Table) -> pa.Table:
        df = group.to_pandas().sort_values(["word", "doc_id"])
        g = df.groupby("word", sort=False)
        dfreq = g.size()
        post = g["doc_id"].apply(lambda s: ",".join(s.head(cap).astype(str)))
        return pa.table(
            {
                "word": pa.array(dfreq.index, pa.string()),
                "df": pa.array(dfreq.to_numpy(), pa.int64()),
                "postings": pa.array(post.to_numpy(), pa.string()),
            }
        )

    return relops.bucketed_groupby(
        ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True),
        ["word"], bucket_postings,
    )


INVERTED_INDEX_SQL = """
WITH pairs AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
r AS (SELECT word, doc_id,
        row_number() OVER (PARTITION BY word ORDER BY doc_id) AS rn
      FROM pairs)
SELECT word, CAST(count(*) AS BIGINT) AS df,
       string_agg(CASE WHEN rn <= 100 THEN CAST(doc_id AS VARCHAR) END,
                  ',' ORDER BY doc_id) AS postings
FROM r GROUP BY word
"""


def tfidf_top_terms_documents(sf_dir: str, k: int = 3):
    """Per-document characteristic terms: top-k by term frequency with
    rarer-corpus-wide terms breaking ties (tf desc, df asc, word asc —
    integer sort keys, so the ranking is bit-deterministic), reported
    with the tf·idf score. The document-frequency table is vocabulary-
    sized, built from per-batch distinct pairs + one tiny groupby, then
    broadcast once via ray.put; the scoring pass is doc-local with NO
    corpus shuffle."""
    ds = scan(sf_dir, "documents", columns=["doc_id", "text"])

    def df_partial(batch: pa.Table) -> pa.Table:
        parent, flat, _ = _exploded_words(batch)
        t = pa.table({"word": flat, "doc_id": pa.array(parent, pa.int64())})
        u = t.group_by(["word", "doc_id"]).aggregate([])
        return u.group_by(["word"]).aggregate([("doc_id", "count")])

    dfreq = (
        relops.coalesce_partials(
            ds.map_batches(df_partial, batch_format="pyarrow", zero_copy_batch=True)
        )
        .groupby("word")
        .aggregate(Sum("doc_id_count", alias_name="df"))
        .to_pandas()  # vocabulary-sized
    )
    n_docs = int(ds.count())
    df_ref = ray.put(
        dict(zip(dfreq["word"].tolist(), dfreq["df"].astype(np.int64).tolist()))
    )

    def score(batch: pa.Table) -> pa.Table:
        dfmap = ray.get(df_ref)
        parent, flat, _ = _exploded_words(batch)
        t = pa.table({"doc_id": pa.array(parent, pa.int64()), "word": flat})
        tf = t.group_by(["doc_id", "word"]).aggregate([("word", "count")])
        pdf = tf.to_pandas().rename(columns={"word_count": "tf"})
        pdf["df"] = pdf["word"].map(dfmap).astype(np.int64)
        pdf = pdf.sort_values(
            ["doc_id", "tf", "df", "word"], ascending=[True, False, True, True]
        )
        pdf = pdf.groupby("doc_id", sort=False).head(k)
        sc = pdf["tf"].to_numpy(np.float64) * np.log(
            float(n_docs) / pdf["df"].to_numpy(np.float64)
        )
        return pa.table(
            {
                "doc_id": pa.array(pdf["doc_id"].to_numpy(), pa.int64()),
                "word": pa.array(pdf["word"].to_numpy(), pa.string()),
                "score": round_away_arrow(pa.array(sc, pa.float64())),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


TFIDF_SQL = """
WITH ws AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
tf AS (SELECT doc_id, word, count(*) AS tf FROM ws GROUP BY doc_id, word),
df AS (SELECT word, count(DISTINCT doc_id) AS df FROM ws GROUP BY word),
n AS (SELECT count(*) AS n FROM documents),
s AS (SELECT tf.doc_id, tf.word,
        round(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df), 4) AS score,
        row_number() OVER (PARTITION BY tf.doc_id
                           ORDER BY tf.tf DESC, df.df, tf.word) AS rn
      FROM tf JOIN df USING (word), n)
SELECT doc_id, word, score FROM s WHERE rn <= 3
"""


def redact_documents(sf_dir: str):
    """PII-redaction shape: regex scrub over the corpus — every match of
    the pattern is replaced with a fixed token and counted. Pure
    vectorized RE2 kernels (`replace_substring_regex` /
    `count_substring_regex`), embarrassingly parallel, no shuffle. (The
    synthetic corpus has no real emails/phones, so the pattern targets
    two vocabulary words; swap the regex for email/phone classes on real
    data — the plumbing is identical.)"""
    ds = scan(sf_dir, "documents", columns=["doc_id", "text"])
    pattern = r"\b(customer|supplier)\b"

    def scrub(batch: pa.Table) -> pa.Table:
        txt = batch.column("text")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "redacted": pc.replace_substring_regex(txt, pattern, "[X]"),
                "n_hits": pc.cast(pc.count_substring_regex(txt, pattern), pa.int64()),
            }
        )

    return ds.map_batches(scrub, batch_format="pyarrow", zero_copy_batch=True)


REDACT_SQL = r"""
SELECT doc_id,
       regexp_replace(text, '\b(customer|supplier)\b', '[X]', 'g') AS redacted,
       CAST(len(regexp_extract_all(text, '\b(customer|supplier)\b')) AS BIGINT) AS n_hits
FROM documents
"""


def event_transitions_events(sf_dir: str):
    """Sequence mining over event streams: the event_type → next
    event_type transition matrix per user (Markov-chain counts, the
    input to next-action models and funnel diagnostics). ONE
    user-bucketed shuffle co-locates each user's stream, adjacency is a
    vectorized shifted comparison, and only (from, to, n) partials —
    at most types² rows per bucket — reach the final tiny groupby."""
    ds = scan(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])

    empty = pa.table(
        {
            "from_type": pa.array([], pa.string()),
            "to_type": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }
    )

    def bucket_fn(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group, sort_keys=[("user_id", "ascending"), ("ts", "ascending"),
                              ("event_id", "ascending")]
        )
        g = group.take(idx)
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        et = np.asarray(g.column("event_type").to_numpy(zero_copy_only=False))
        same = u[1:] == u[:-1]
        t = pa.table(
            {
                "from_type": pa.array(et[:-1][same].tolist(), pa.string()),
                "to_type": pa.array(et[1:][same].tolist(), pa.string()),
            }
        )
        c = t.group_by(["from_type", "to_type"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "from_type": c.column("from_type"),
                "to_type": c.column("to_type"),
                "n": pc.cast(c.column("count_all"), pa.int64()),
            }
        )

    partials = relops.bucketed_groupby(ds, ["user_id"], bucket_fn, empty=empty)
    agg = (
        partials.groupby(["from_type", "to_type"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # ≤ types² rows
        .sort_values(["from_type", "to_type"])
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "from_type": pa.array(agg["from_type"].tolist(), pa.string()),
            "to_type": pa.array(agg["to_type"].tolist(), pa.string()),
            "n": pa.array(agg["n"].to_numpy(np.int64), pa.int64()),
        }
    )


EVENT_TRANSITIONS_SQL = """
WITH w AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type
  FROM events)
SELECT event_type AS from_type, next_type AS to_type,
       CAST(count(*) AS BIGINT) AS n
FROM w WHERE next_type IS NOT NULL
GROUP BY event_type, next_type
"""


def zscore_outliers_events(sf_dir: str):
    """Grouped anomaly detection: events whose value sits more than 3
    population standard deviations from their event_type's mean. Two
    streaming passes: (1) mergeable sufficient statistics (n, Σv, Σv²)
    per type — exact integer 1e-4 units, one combiner pass + tiny
    groupby; (2) a broadcast of the per-type (mean, std) doubles into a
    vectorized filter pass. Every float op mirrors the twin
    operation-for-operation (int→double casts, E[x²]−E[x]² variance,
    IEEE sqrt/divide), so the z-scores are bit-identical. int64 bound:
    Σv² ≈ 1e12/row — safe to ~9e6 rows per batch partial; beyond that
    shard into hi/lo words (driver fold is already arbitrary-precision
    Python int)."""
    ds = scan(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        v = _cents(batch.column("value"), 10_000)
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "one": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
                "v": v,
                "vv": pc.multiply(v, v),
            }
        )
        return t.group_by(["event_type"]).aggregate(
            [(c, "sum") for c in ("one", "v", "vv")]
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(*[Sum(f"{c}_sum", alias_name=c) for c in ("one", "v", "vv")])
    )
    import math

    stats = {}
    for row in pa.Table.from_pandas(agg.to_pandas()).to_pylist():
        n, sv, svv = int(row["one"]), int(row["v"]), int(row["vv"])
        mean = float(sv) / float(n)
        std = math.sqrt(float(svv) / float(n) - mean * mean)
        stats[row["event_type"]] = (mean, std)
    stats_ref = ray.put(stats)

    def flag(batch: pa.Table) -> pa.Table:
        from .functions.rounding import round_away

        st = ray.get(stats_ref)
        et = np.asarray(batch.column("event_type").to_numpy(zero_copy_only=False))
        v = _cents(batch.column("value"), 10_000).to_numpy(zero_copy_only=False)
        mean = np.array([st[t][0] for t in et], np.float64)
        std = np.array([st[t][1] for t in et], np.float64)
        z = (v.astype(np.float64) - mean) / std
        keep = np.abs(z) > 3.0
        return pa.table(
            {
                "event_id": pa.array(
                    batch.column("event_id").to_numpy(zero_copy_only=False)[keep],
                    pa.int64(),
                ),
                "event_type": pa.array(et[keep].tolist(), pa.string()),
                "z": pa.array(round_away(z[keep], 4), pa.float64()),
            }
        )

    return ds.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)


ZSCORE_OUTLIERS_SQL = """
WITH base AS (
  SELECT event_id, event_type, CAST(round(value*10000) AS BIGINT) AS v FROM events),
s AS (SELECT event_type, count(*) AS n,
        sum(CAST(v AS HUGEINT)) AS sv,
        sum(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)) AS svv
      FROM base GROUP BY event_type),
p AS (SELECT event_type,
        CAST(sv AS DOUBLE)/CAST(n AS DOUBLE) AS mean,
        sqrt(CAST(svv AS DOUBLE)/CAST(n AS DOUBLE)
             - (CAST(sv AS DOUBLE)/CAST(n AS DOUBLE))
               * (CAST(sv AS DOUBLE)/CAST(n AS DOUBLE))) AS std
      FROM s)
SELECT event_id, base.event_type,
       round((CAST(v AS DOUBLE) - mean)/std, 4) AS z
FROM base JOIN p USING (event_type)
WHERE abs((CAST(v AS DOUBLE) - mean)/std) > 3.0
"""


def time_profile_events(sf_dir: str):
    """Calendar-feature activity profile: events per (event_type,
    hour-of-day, ISO day-of-week) with exact 1e-4-unit value sums — the
    scalar date/time-function family (hour / weekday extraction)
    exercised end to end. One combiner pass; the final groupby is at
    most types × 24 × 7 rows regardless of input scale."""
    ds = scan(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts")
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "hour": pc.cast(pc.hour(ts), pa.int64()),
                "dow": pc.cast(pc.day_of_week(ts, count_from_zero=False, week_start=1),
                               pa.int64()),
                "v": _cents(batch.column("value"), 10_000),
            }
        )
        return t.group_by(["event_type", "hour", "dow"]).aggregate(
            [("v", "sum"), ("v", "count")]
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "hour", "dow"])
        .aggregate(Sum("v_sum", alias_name="v"), Sum("v_count", alias_name="n"))
    )
    t = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    return pa.table(
        {
            "event_type": t.column("event_type"),
            "hour": t.column("hour"),
            "dow": t.column("dow"),
            "n": pc.cast(t.column("n"), pa.int64()),
            "sum_value": round_away_arrow(
                pc.divide(pc.cast(t.column("v"), pa.float64()), 10_000.0)
            ),
        }
    )


TIME_PROFILE_SQL = """
SELECT event_type,
       CAST(hour(ts) AS BIGINT) AS hour,
       CAST(isodow(ts) AS BIGINT) AS dow,
       CAST(count(*) AS BIGINT) AS n,
       round(CAST(sum(CAST(round(value*10000) AS BIGINT)) AS DOUBLE)/10000.0, 4)
         AS sum_value
FROM events GROUP BY event_type, hour(ts), isodow(ts)
"""


def throttle_events(sf_dir: str):
    """Stream throttle / window dedup: within each (user_id, event_type,
    60-second tumbling window), keep only the EARLIEST event (ts, then
    event_id ties) — the repeat-suppression an event-ingest pipeline
    applies before counting. Per-batch local winners first (at most one
    row per key-window per batch survives), then one bucketed groupby
    picks the global winner per key-window — the shuffle carries
    winners, not raw events."""
    ds = scan(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])

    def local(batch: pa.Table) -> pa.Table:
        ts_us = batch.column("ts").cast(pa.int64())
        win = pc.divide(ts_us, 60_000_000)
        t = batch.append_column("win", pc.cast(win, pa.int64()))
        idx = pc.sort_indices(
            t, sort_keys=[("user_id", "ascending"), ("event_type", "ascending"),
                          ("win", "ascending"), ("ts", "ascending"),
                          ("event_id", "ascending")]
        )
        t = t.take(idx)
        u = np.asarray(t.column("user_id").to_numpy(zero_copy_only=False))
        e = np.asarray(t.column("event_type").to_numpy(zero_copy_only=False))
        w = np.asarray(t.column("win").to_numpy(zero_copy_only=False))
        keep = np.r_[True, (u[1:] != u[:-1]) | (e[1:] != e[:-1]) | (w[1:] != w[:-1])]
        return t.filter(pa.array(keep))

    winners = ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)

    empty = pa.table(
        {
            "event_id": pa.array([], pa.int64()),
            "user_id": pa.array([], pa.int64()),
            "event_type": pa.array([], pa.string()),
            "win": pa.array([], pa.int64()),
        }
    )

    def per_group(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group, sort_keys=[("user_id", "ascending"), ("event_type", "ascending"),
                              ("win", "ascending"), ("ts", "ascending"),
                              ("event_id", "ascending")]
        )
        t = group.take(idx)
        u = np.asarray(t.column("user_id").to_numpy(zero_copy_only=False))
        e = np.asarray(t.column("event_type").to_numpy(zero_copy_only=False))
        w = np.asarray(t.column("win").to_numpy(zero_copy_only=False))
        keep = np.r_[True, (u[1:] != u[:-1]) | (e[1:] != e[:-1]) | (w[1:] != w[:-1])]
        t = t.filter(pa.array(keep))
        return t.select(["event_id", "user_id", "event_type", "win"])

    out = relops.bucketed_groupby(
        winners, ["user_id", "event_type", "win"], per_group, empty=empty
    )
    df = out.to_pandas().sort_values("event_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


THROTTLE_SQL = """
WITH w AS (
  SELECT event_id, user_id, event_type,
         CAST(epoch_us(ts) // 60000000 AS BIGINT) AS win,
         row_number() OVER (
           PARTITION BY user_id, event_type, epoch_us(ts) // 60000000
           ORDER BY ts, event_id) AS rn
  FROM events)
SELECT event_id, user_id, event_type, win FROM w WHERE rn = 1
"""


def funnel_stages_events(sf_dir: str):
    """Strict-sequence funnel: per user, the furthest stage reached in
    view → click → purchase order (each later event must be strictly
    after the chosen earlier one: first view, first click after it,
    first purchase after that). user_id cardinality scales, so users
    route through the bucketed groupby; inside a bucket the three stage
    timestamps come from vectorized masked groupby-mins, no per-user
    loop. Users with no view are omitted (stage 0). Per-USER detail
    companion to the aggregate ``funnel_events`` counts."""
    ds = scan(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def prune(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.is_in(batch.column("event_type"), value_set=pa.array(["view", "click", "purchase"]))
        )

    def bucket_funnel(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        views = df[df["event_type"] == "view"].groupby("user_id")["ts"].min()
        if views.empty:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "funnel_stage": pa.array([], pa.int64()),
                }
            )
        clicks = df[df["event_type"] == "click"][["user_id", "ts"]].copy()
        clicks["t1"] = clicks["user_id"].map(views)
        t2 = clicks[clicks["ts"] > clicks["t1"]].groupby("user_id")["ts"].min()
        buys = df[df["event_type"] == "purchase"][["user_id", "ts"]].copy()
        buys["t2"] = buys["user_id"].map(t2)
        t3 = buys[buys["ts"] > buys["t2"]].groupby("user_id")["ts"].min()
        stage = pd.Series(1, index=views.index, dtype=np.int64)
        stage[stage.index.isin(t2.index)] = 2
        stage[stage.index.isin(t3.index)] = 3
        return pa.table(
            {
                "user_id": pa.array(stage.index.to_numpy(), pa.int64()),
                "funnel_stage": pa.array(stage.to_numpy(), pa.int64()),
            }
        )

    return relops.bucketed_groupby(
        ds.map_batches(prune, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"], bucket_funnel,
    )


FUNNEL_STAGES_SQL = """
WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
           WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
SELECT v.user_id,
       CASE WHEN p.user_id IS NOT NULL THEN 3
            WHEN c.user_id IS NOT NULL THEN 2 ELSE 1 END AS funnel_stage
FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
"""


def price_histogram_lineitem(sf_dir: str):
    """Value-bucketed histogram: $10k price buckets with row count and
    exact-cents revenue sum per bucket. Per-batch partials (one row per
    occupied bucket per block cross the wire) + a tiny groupby — the
    canonical distribution-profile pass over a fact table."""
    ds = scan(sf_dir, "lineitem", columns=["l_extendedprice"])

    def partial(batch: pa.Table) -> pa.Table:
        cents = _cents(batch.column("l_extendedprice"), 100)
        bucket = pc.divide(cents, pa.scalar(1_000_000, pa.int64()))
        t = pa.table({"bucket": bucket, "cents": cents})
        return t.group_by(["bucket"]).aggregate([("cents", "sum"), ("cents", "count")])

    agg = (
        relops.coalesce_partials(
            ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        )
        .groupby("bucket")
        .aggregate(Sum("cents_sum", alias_name="tot_c"), Sum("cents_count", alias_name="n"))
    )
    tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    return pa.table(
        {
            "bucket": pc.cast(tbl.column("bucket"), pa.int64()),
            "n": pc.cast(tbl.column("n"), pa.int64()),
            "total": pc.divide(pc.cast(tbl.column("tot_c"), pa.float64()), 100.0),
        }
    )


PRICE_HIST_SQL = """
SELECT CAST(round(l_extendedprice*100) AS BIGINT) // 1000000 AS bucket,
       count(*) AS n,
       sum(CAST(round(l_extendedprice*100) AS BIGINT))/100.0 AS total
FROM lineitem GROUP BY bucket
"""


def _nation_lookup(sf_dir: str) -> pd.DataFrame:
    """nation joined to region — FIXED 25×5 rows by TPC-H spec, the one
    dimension that is always driver-side closure state."""
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet")).to_pandas()
    region = pq.read_table(os.path.join(sf_dir, "region.parquet")).to_pandas()
    return nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")


def q7_volume_shipping(sf_dir: str):
    """TPC-H Q7 shape: bilateral trade volume — revenue between two named
    nations, by supplier-nation × customer-nation × ship year. The two
    sf-scaling dimensions (customer, supplier) attach via size-gated
    joins; the nation-pair filter and year extraction run in one
    vectorized kernel; the final groupby has 2 × years rows."""
    n1, n2 = "NATION_1", "NATION_2"
    nat = _nation_lookup(sf_dir)
    keys = {r["n_name"]: int(r["n_nationkey"]) for _, r in nat.iterrows()}
    k1, k2 = keys[n1], keys[n2]

    li = scan(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(
            (pc.field("l_shipdate") >= np.datetime64("1996-01-01", "us"))
            & (pc.field("l_shipdate") < np.datetime64("1998-01-01", "us"))
        ),
    )
    orders = scan(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    n_parts = relops.choose_num_partitions(
        relops.table_path(sf_dir, "lineitem"), relops.table_path(sf_dir, "orders")
    )
    joined = li.join(orders, "inner", num_partitions=n_parts,
                     on=("l_orderkey",), right_on=("o_orderkey",))

    cust_small, cust_ds = relops.small_side(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    if cust_small is not None:
        joined = relops.broadcast_join(
            joined.map_batches(
                lambda t: t.append_column("c_custkey", t.column("o_custkey")),
                batch_format="pyarrow", zero_copy_batch=True,
            ),
            cust_small, on="c_custkey",
        )
    else:
        joined = joined.join(
            cust_ds, "inner",
            num_partitions=relops.choose_num_partitions(
                relops.table_path(sf_dir, "lineitem"), relops.table_path(sf_dir, "customer")
            ),
            on=("o_custkey",), right_on=("c_custkey",),
        )

    supp_small, supp_ds = relops.small_side(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    if supp_small is not None:
        joined = relops.broadcast_join(
            joined.map_batches(
                lambda t: t.append_column("s_suppkey", t.column("l_suppkey")),
                batch_format="pyarrow", zero_copy_batch=True,
            ),
            supp_small, on="s_suppkey",
        )
    else:
        joined = joined.join(
            supp_ds, "inner",
            num_partitions=relops.choose_num_partitions(
                relops.table_path(sf_dir, "lineitem"), relops.table_path(sf_dir, "supplier")
            ),
            on=("l_suppkey",), right_on=("s_suppkey",),
        )

    def partial(batch: pa.Table) -> pa.Table:
        sn = batch.column("s_nationkey").to_numpy(zero_copy_only=False)
        cn = batch.column("c_nationkey").to_numpy(zero_copy_only=False)
        keep = ((sn == k1) & (cn == k2)) | ((sn == k2) & (cn == k1))
        batch = batch.filter(pa.array(keep))
        sn = sn[keep]
        rev = pc.multiply(
            pc.cast(batch.column("l_extendedprice"), pa.float64()),
            pc.subtract(1.0, pc.cast(batch.column("l_discount"), pa.float64())),
        )
        year = batch.column("l_shipdate").to_numpy(zero_copy_only=False).astype(
            "datetime64[Y]"
        ).astype(np.int64) + 1970
        t = pa.table(
            {
                "supp_nation": pa.array(np.where(sn == k1, n1, n2)),
                "cust_nation": pa.array(np.where(sn == k1, n2, n1)),
                "l_year": pa.array(year, pa.int64()),
                "rev_c": _cents(rev, 10_000),
            }
        )
        return t.group_by(["supp_nation", "cust_nation", "l_year"]).aggregate(
            [("rev_c", "sum")]
        )

    agg = (
        relops.coalesce_partials(
            joined.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        )
        .groupby(["supp_nation", "cust_nation", "l_year"])
        .aggregate(Sum("rev_c_sum", alias_name="rev_c"))
    )
    df = agg.to_pandas()
    if df.empty:
        # tiny inputs can filter to zero nation-pair rows; an empty Ray
        # aggregate loses its schema, so return the typed empty directly
        return pa.table(
            {
                "supp_nation": pa.array([], pa.string()),
                "cust_nation": pa.array([], pa.string()),
                "l_year": pa.array([], pa.int64()),
                "revenue": pa.array([], pa.float64()),
            }
        )
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    return pa.table(
        {
            "supp_nation": tbl.column("supp_nation"),
            "cust_nation": tbl.column("cust_nation"),
            "l_year": tbl.column("l_year"),
            "revenue": pc.divide(pc.cast(tbl.column("rev_c"), pa.float64()), 10_000.0),
        }
    )


Q7_SQL = """
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
       sum(CAST(round(l_extendedprice*(1-l_discount)*10000) AS BIGINT))/10000.0 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1998-01-01'
  AND ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
    OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
GROUP BY supp_nation, cust_nation, l_year
"""


def q8_market_share(sf_dir: str):
    """TPC-H Q8 shape: one nation's share of a region's import revenue by
    order year. Both the numerator (supplier in NATION_2) and denominator
    (customers in ASIA) accumulate as exact integer cents in ONE partial
    pass over the joined stream; the share division happens once on the
    years-sized result."""
    nat = _nation_lookup(sf_dir)
    asia_keys = set(nat[nat["r_name"] == "ASIA"]["n_nationkey"].astype(int))
    target_key = int(nat[nat["n_name"] == "NATION_2"]["n_nationkey"].iloc[0])

    orders = scan(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(
            (pc.field("o_orderdate") >= np.datetime64("1996-01-01", "us"))
            & (pc.field("o_orderdate") < np.datetime64("1998-01-01", "us"))
        ),
    )
    cust_small, cust_ds = relops.small_side(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    if cust_small is not None:
        orders = relops.broadcast_join(
            orders.map_batches(
                lambda t: t.append_column("c_custkey", t.column("o_custkey")),
                batch_format="pyarrow", zero_copy_batch=True,
            ),
            cust_small, on="c_custkey",
        )
    else:
        orders = orders.join(
            cust_ds, "inner",
            num_partitions=relops.choose_num_partitions(
                relops.table_path(sf_dir, "orders"), relops.table_path(sf_dir, "customer")
            ),
            on=("o_custkey",), right_on=("c_custkey",),
        )

    asia_arr = pa.array(sorted(asia_keys), pa.int64())

    def in_region(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_in(batch.column("c_nationkey"), value_set=asia_arr))
        year = batch.column("o_orderdate").to_numpy(zero_copy_only=False).astype(
            "datetime64[Y]"
        ).astype(np.int64) + 1970
        return pa.table(
            {
                "o_orderkey": batch.column("o_orderkey"),
                "o_year": pa.array(year, pa.int64()),
            }
        )

    orders = relops.drop_empty_blocks(
        orders.map_batches(in_region, batch_format="pyarrow", zero_copy_batch=True),
        pa.table({"o_orderkey": pa.array([], pa.int64()), "o_year": pa.array([], pa.int64())}),
    )

    li = scan(sf_dir, "lineitem",
              columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
    joined = li.join(
        orders, "inner",
        num_partitions=relops.choose_num_partitions(
            relops.table_path(sf_dir, "lineitem"), relops.table_path(sf_dir, "orders")
        ),
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    supp_small, supp_ds = relops.small_side(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    if supp_small is not None:
        joined = relops.broadcast_join(
            joined.map_batches(
                lambda t: t.append_column("s_suppkey", t.column("l_suppkey")),
                batch_format="pyarrow", zero_copy_batch=True,
            ),
            supp_small, on="s_suppkey",
        )
    else:
        joined = joined.join(
            supp_ds, "inner",
            num_partitions=relops.choose_num_partitions(
                relops.table_path(sf_dir, "lineitem"), relops.table_path(sf_dir, "supplier")
            ),
            on=("l_suppkey",), right_on=("s_suppkey",),
        )

    def partial(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            pc.cast(batch.column("l_extendedprice"), pa.float64()),
            pc.subtract(1.0, pc.cast(batch.column("l_discount"), pa.float64())),
        )
        rev_c = _cents(rev, 10_000)
        is_target = pc.equal(batch.column("s_nationkey"), pa.scalar(target_key, pa.int64()))
        num = pc.if_else(is_target, rev_c, pa.scalar(0, pa.int64()))
        t = pa.table({"o_year": batch.column("o_year"), "num_c": num, "den_c": rev_c})
        return t.group_by(["o_year"]).aggregate([("num_c", "sum"), ("den_c", "sum")])

    agg = (
        relops.coalesce_partials(
            joined.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        )
        .groupby("o_year")
        .aggregate(Sum("num_c_sum", alias_name="num_c"), Sum("den_c_sum", alias_name="den_c"))
    )
    tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    share = pc.divide(
        pc.cast(tbl.column("num_c"), pa.float64()), pc.cast(tbl.column("den_c"), pa.float64())
    )
    return pa.table(
        {
            "o_year": pc.cast(tbl.column("o_year"), pa.int64()),
            "mkt_share": round_away_arrow(share),
        }
    )


Q8_SQL = """
SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
  round(
    CAST(sum(CASE WHEN s_nationkey = 2
        THEN CAST(round(l_extendedprice*(1-l_discount)*10000) AS BIGINT) ELSE 0 END) AS DOUBLE)
    / sum(CAST(round(l_extendedprice*(1-l_discount)*10000) AS BIGINT)), 4) AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
JOIN region r  ON nc.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01'
GROUP BY o_year
"""


def q15_top_supplier(sf_dir: str):
    """TPC-H Q15 shape: the supplier(s) with maximum revenue in a window
    (ALL ties kept, per the spec). Per-supplier revenue flows through
    per-batch partials + the bucketed groupby; the global max is a
    scalar; the equality filter is one vectorized pass; only the
    winners' keys fetch supplier attributes via a predicate-pushed
    scan."""
    li = scan(
        sf_dir, "lineitem",
        columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(
            (pc.field("l_shipdate") >= np.datetime64("1996-01-01", "us"))
            & (pc.field("l_shipdate") < np.datetime64("1996-07-01", "us"))
        ),
    )

    def partial(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            pc.cast(batch.column("l_extendedprice"), pa.float64()),
            pc.subtract(1.0, pc.cast(batch.column("l_discount"), pa.float64())),
        )
        t = pa.table({"l_suppkey": batch.column("l_suppkey"), "rev_c": _cents(rev, 10_000)})
        return t.group_by(["l_suppkey"]).aggregate([("rev_c", "sum")])

    def bucket_sum(group: pa.Table) -> pa.Table:
        g = group.group_by(["l_suppkey"]).aggregate([("rev_c_sum", "sum")])
        return pa.table(
            {"s_suppkey": g.column("l_suppkey"), "rev_c": g.column("rev_c_sum_sum")}
        )

    per_supp = relops.bucketed_groupby(
        li.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["l_suppkey"], bucket_sum,
        empty=pa.table(
            {"s_suppkey": pa.array([], pa.int64()), "rev_c": pa.array([], pa.int64())}
        ),
    )
    best = int(per_supp.max("rev_c"))

    def winners(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch.column("rev_c"), pa.scalar(best, pa.int64())))

    top = per_supp.map_batches(winners, batch_format="pyarrow", zero_copy_batch=True)
    top_tbl = pa.Table.from_pandas(top.to_pandas(), preserve_index=False)
    attrs = scan(
        sf_dir, "supplier", columns=["s_suppkey", "s_name"],
        filter=pc.field("s_suppkey").isin(top_tbl.column("s_suppkey").to_pylist()),
    ).to_pandas()
    out = top_tbl.to_pandas().merge(attrs, on="s_suppkey").sort_values("s_suppkey")
    out["total_rev"] = out["rev_c"].astype(np.int64) / 10_000.0
    return pa.Table.from_pandas(
        out[["s_suppkey", "s_name", "total_rev"]], preserve_index=False
    )


Q15_SQL = """
WITH r AS (
  SELECT l_suppkey AS s_suppkey,
         sum(CAST(round(l_extendedprice*(1-l_discount)*10000) AS BIGINT)) AS rev_c
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-07-01'
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, r.rev_c/10000.0 AS total_rev
FROM supplier s JOIN r ON s.s_suppkey = r.s_suppkey
WHERE r.rev_c = (SELECT max(rev_c) FROM r)
ORDER BY s.s_suppkey
"""


def q12_late_shipments(sf_dir: str):
    """TPC-H Q12 shape (adapted: no shipmode column in this schema): per
    ship year, how many lineitems shipped more than 90 days after the
    order date, split into high-priority (1-URGENT / 2-HIGH) and
    low-priority orders. One big-big join, then a single vectorized
    partial pass — date math, priority classes and both conditional
    counts per batch; the final groupby is years-sized."""
    li = scan(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    orders = scan(sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
    joined = li.join(
        orders, "inner",
        num_partitions=relops.choose_num_partitions(
            relops.table_path(sf_dir, "lineitem"), relops.table_path(sf_dir, "orders")
        ),
        on=("l_orderkey",), right_on=("o_orderkey",),
    )
    day_us = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        ship = batch.column("l_shipdate").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]"
        ).astype(np.int64)
        odate = batch.column("o_orderdate").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]"
        ).astype(np.int64)
        late = (ship - odate) > 90 * day_us
        batch = batch.filter(pa.array(late))
        ship = ship[late]
        year = (ship // day_us).astype("timedelta64[D]").astype("datetime64[D]").astype(
            "datetime64[Y]"
        ).astype(np.int64) + 1970
        prio = batch.column("o_orderpriority")
        high = pc.is_in(prio, value_set=pa.array(["1-URGENT", "2-HIGH"]))
        h = high.to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table(
            {
                "l_year": pa.array(year, pa.int64()),
                "high_count": pa.array(h, pa.int64()),
                "low_count": pa.array(1 - h, pa.int64()),
            }
        )
        return t.group_by(["l_year"]).aggregate(
            [("high_count", "sum"), ("low_count", "sum")]
        )

    agg = (
        relops.coalesce_partials(
            joined.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        )
        .groupby("l_year")
        .aggregate(
            Sum("high_count_sum", alias_name="high_count"),
            Sum("low_count_sum", alias_name="low_count"),
        )
    )
    tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    return pa.table(
        {
            "l_year": pc.cast(tbl.column("l_year"), pa.int64()),
            "high_count": pc.cast(tbl.column("high_count"), pa.int64()),
            "low_count": pc.cast(tbl.column("low_count"), pa.int64()),
        }
    )


Q12_SQL = """
SELECT CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
GROUP BY l_year
"""


def unigram_xent_documents(sf_dir: str):
    """Model-based quality scoring shape (KenLM-style, one order): train a
    corpus unigram LM with add-one smoothing, then score every document
    by mean token cross-entropy (-ln p(w), nats). The LM is a
    vocabulary-sized (word, count) table built from per-batch combiner
    partials and broadcast once via ray.put; the scoring pass is
    doc-local (pandas map = C-hash lookups, segment means), NO corpus
    shuffle. Swap the unigram table for a real LM binary in the actor
    __init__ and the plumbing is identical."""
    ds = scan(sf_dir, "documents", columns=["doc_id", "text"])

    def count_partial(batch: pa.Table) -> pa.Table:
        _, flat, _ = _exploded_words(batch)
        t = pa.table({"word": flat})
        return t.group_by(["word"]).aggregate([("word", "count")])

    counts = (
        relops.coalesce_partials(
            ds.map_batches(count_partial, batch_format="pyarrow", zero_copy_batch=True)
        )
        .groupby("word")
        .aggregate(Sum("word_count", alias_name="n"))
        .to_pandas()  # vocabulary-sized
    )
    total = int(counts["n"].sum())
    vocab = len(counts)
    lm_ref = ray.put(dict(zip(counts["word"].tolist(), counts["n"].astype(np.int64).tolist())))

    def score(batch: pa.Table) -> pa.Table:
        lm = ray.get(lm_ref)
        parent, flat, _ = _exploded_words(batch)
        n = pd.Series(flat.to_pandas()).map(lm).to_numpy(np.float64)
        xent = -np.log((n + 1.0) / float(total + vocab))
        out = (
            pd.DataFrame({"doc_id": parent, "x": xent}).groupby("doc_id")["x"].mean()
        )
        return pa.table(
            {
                "doc_id": pa.array(out.index.to_numpy(), pa.int64()),
                "xent": round_away_arrow(pa.array(out.to_numpy(), pa.float64())),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


UNIGRAM_XENT_SQL = """
WITH ws AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
cnt AS (SELECT word, count(*) AS n FROM ws GROUP BY word),
tot AS (SELECT sum(n) AS t, count(*) AS v FROM cnt)
SELECT doc_id, round(avg(-ln((cnt.n + 1) / (tot.t + tot.v))), 4) AS xent
FROM ws JOIN cnt USING (word), tot
GROUP BY doc_id
"""


def q9_profit_by_nation_year(sf_dir: str):
    """TPC-H Q9 shape (adapted: no partsupp table, cost modeled as 80% of
    p_retailprice): profit per supplier nation per order year. Exact
    integer arithmetic — revenue and cost are EACH rounded to 1e-4
    dollars per row on both sides, so distributed summation order cannot
    flip the hash. Gated part + supplier attaches, one big orders join,
    single partial pass, nations × years final groupby."""
    nat = _nation_lookup(sf_dir)
    nation_names = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))

    li = scan(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                 "l_extendedprice", "l_discount"],
    )

    part_small, part_ds = relops.small_side(sf_dir, "part", ["p_partkey", "p_retailprice"])
    if part_small is not None:
        li = relops.broadcast_join(
            li.map_batches(
                lambda t: t.append_column("p_partkey", t.column("l_partkey")),
                batch_format="pyarrow", zero_copy_batch=True,
            ),
            part_small, on="p_partkey",
        )
    else:
        li = li.join(
            part_ds, "inner",
            num_partitions=relops.choose_num_partitions(
                relops.table_path(sf_dir, "lineitem"), relops.table_path(sf_dir, "part")
            ),
            on=("l_partkey",), right_on=("p_partkey",),
        )

    supp_small, supp_ds = relops.small_side(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    if supp_small is not None:
        li = relops.broadcast_join(
            li.map_batches(
                lambda t: t.append_column("s_suppkey", t.column("l_suppkey")),
                batch_format="pyarrow", zero_copy_batch=True,
            ),
            supp_small, on="s_suppkey",
        )
    else:
        li = li.join(
            supp_ds, "inner",
            num_partitions=relops.choose_num_partitions(
                relops.table_path(sf_dir, "lineitem"), relops.table_path(sf_dir, "supplier")
            ),
            on=("l_suppkey",), right_on=("s_suppkey",),
        )

    def profit_partial(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            pc.cast(batch.column("l_extendedprice"), pa.float64()),
            pc.subtract(1.0, pc.cast(batch.column("l_discount"), pa.float64())),
        )
        cost = pc.multiply(
            pc.multiply(
                pc.cast(batch.column("l_quantity"), pa.float64()),
                pc.cast(batch.column("p_retailprice"), pa.float64()),
            ),
            0.8,
        )
        profit_c = pc.subtract(_cents(rev, 10_000), _cents(cost, 10_000))
        t = pa.table(
            {
                "l_orderkey": batch.column("l_orderkey"),
                "s_nationkey": batch.column("s_nationkey"),
                "profit_c": profit_c,
            }
        )
        return t.group_by(["l_orderkey", "s_nationkey"]).aggregate([("profit_c", "sum")])

    partials = relops.drop_empty_blocks(
        li.map_batches(profit_partial, batch_format="pyarrow", zero_copy_batch=True),
        pa.table(
            {
                "l_orderkey": pa.array([], pa.int64()),
                "s_nationkey": pa.array([], pa.int64()),
                "profit_c_sum": pa.array([], pa.int64()),
            }
        ),
    )
    orders = scan(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    joined = partials.join(
        orders, "inner",
        num_partitions=relops.choose_num_partitions(
            relops.table_path(sf_dir, "lineitem"), relops.table_path(sf_dir, "orders")
        ),
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def year_partial(batch: pa.Table) -> pa.Table:
        year = batch.column("o_orderdate").to_numpy(zero_copy_only=False).astype(
            "datetime64[Y]"
        ).astype(np.int64) + 1970
        t = pa.table(
            {
                "s_nationkey": batch.column("s_nationkey"),
                "o_year": pa.array(year, pa.int64()),
                "profit_c": batch.column("profit_c_sum"),
            }
        )
        return t.group_by(["s_nationkey", "o_year"]).aggregate([("profit_c", "sum")])

    agg = (
        relops.coalesce_partials(
            joined.map_batches(year_partial, batch_format="pyarrow", zero_copy_batch=True)
        )
        .groupby(["s_nationkey", "o_year"])
        .aggregate(Sum("profit_c_sum", alias_name="profit_c"))
    )
    df = agg.to_pandas()
    df["nation"] = df["s_nationkey"].astype(int).map(nation_names)
    df["profit"] = df["profit_c"].astype(np.int64) / 10_000.0
    df["o_year"] = df["o_year"].astype(np.int64)
    return pa.Table.from_pandas(df[["nation", "o_year", "profit"]], preserve_index=False)


Q9_SQL = """
SELECT n.n_name AS nation,
       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       sum(CAST(round(l_extendedprice*(1-l_discount)*10000) AS BIGINT)
         - CAST(round(l_quantity*p_retailprice*0.8*10000) AS BIGINT))/10000.0 AS profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN nation n ON s_nationkey = n.n_nationkey
GROUP BY nation, o_year
"""


def q11_important_parts(sf_dir: str):
    """TPC-H Q11 shape: parts whose inventory value exceeds a fixed
    fraction (1/10000) of the global total. Per-part value through the
    bucketed groupby; the global total is one scalar ``sum``; the
    threshold compare is EXACT integers (value_c · 10000 > total_c), so
    the SQL twin is bit-identical."""
    li = scan(sf_dir, "lineitem", columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def val_partial(batch: pa.Table) -> pa.Table:
        v = pc.multiply(
            pc.cast(batch.column("l_quantity"), pa.float64()),
            pc.cast(batch.column("l_extendedprice"), pa.float64()),
        )
        t = pa.table({"l_partkey": batch.column("l_partkey"), "value_c": _cents(v, 100)})
        return t.group_by(["l_partkey"]).aggregate([("value_c", "sum")])

    def bucket_sum(group: pa.Table) -> pa.Table:
        g = group.group_by(["l_partkey"]).aggregate([("value_c_sum", "sum")])
        return pa.table(
            {"l_partkey": g.column("l_partkey"), "value_c": g.column("value_c_sum_sum")}
        )

    per_part = relops.bucketed_groupby(
        li.map_batches(val_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["l_partkey"], bucket_sum,
        empty=pa.table(
            {"l_partkey": pa.array([], pa.int64()), "value_c": pa.array([], pa.int64())}
        ),
    )
    total_c = int(per_part.sum("value_c"))

    def keep_important(batch: pa.Table) -> pa.Table:
        keep = pc.greater(
            pc.multiply(batch.column("value_c"), pa.scalar(10_000, pa.int64())),
            pa.scalar(total_c, pa.int64()),
        )
        t = batch.filter(keep)
        return pa.table(
            {
                "l_partkey": t.column("l_partkey"),
                "value": pc.divide(pc.cast(t.column("value_c"), pa.float64()), 100.0),
            }
        )

    return per_part.map_batches(keep_important, batch_format="pyarrow", zero_copy_batch=True)


Q11_SQL = """
SELECT l_partkey,
       sum(CAST(round(l_quantity*l_extendedprice*100) AS BIGINT))/100.0 AS value
FROM lineitem GROUP BY l_partkey
HAVING sum(CAST(round(l_quantity*l_extendedprice*100) AS BIGINT)) * 10000
     > (SELECT sum(CAST(round(l_quantity*l_extendedprice*100) AS BIGINT)) FROM lineitem)
"""


def dominant_supplier_per_part(sf_dir: str):
    """TPC-H Q20-ish shape: (part, supplier) pairs where one supplier
    shipped MORE than 20% of the part's total quantity (ratio-to-group-
    total filter). ONE shuffle: the bucketed groupby routes every row of
    a part to one bucket, so both aggregation levels (per-pair and
    per-part) and the ratio filter run vectorized inside the bucket."""
    li = scan(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey", "l_quantity"])

    def pair_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_partkey": batch.column("l_partkey"),
                "l_suppkey": batch.column("l_suppkey"),
                "q": _cents(batch.column("l_quantity"), 100),
            }
        )
        return t.group_by(["l_partkey", "l_suppkey"]).aggregate([("q", "sum")])

    def bucket_majority(group: pa.Table) -> pa.Table:
        ps = group.group_by(["l_partkey", "l_suppkey"]).aggregate([("q_sum", "sum")])
        pt = ps.group_by(["l_partkey"]).aggregate([("q_sum_sum", "sum")])
        df = ps.to_pandas().merge(pt.to_pandas(), on="l_partkey")
        df = df[df["q_sum_sum"] * 5 > df["q_sum_sum_sum"]]
        return pa.table(
            {
                "l_partkey": pa.array(df["l_partkey"].to_numpy(), pa.int64()),
                "l_suppkey": pa.array(df["l_suppkey"].to_numpy(), pa.int64()),
                "supp_qty": pa.array(df["q_sum_sum"].to_numpy() / 100.0, pa.float64()),
                "part_qty": pa.array(df["q_sum_sum_sum"].to_numpy() / 100.0, pa.float64()),
            }
        )

    return relops.bucketed_groupby(
        li.map_batches(pair_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["l_partkey"], bucket_majority,
        empty=pa.table(
            {
                "l_partkey": pa.array([], pa.int64()),
                "l_suppkey": pa.array([], pa.int64()),
                "supp_qty": pa.array([], pa.float64()),
                "part_qty": pa.array([], pa.float64()),
            }
        ),
    )


DOMINANT_SUPPLIER_SQL = """
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         sum(CAST(round(l_quantity*100) AS BIGINT)) AS q
  FROM lineitem GROUP BY l_partkey, l_suppkey),
pt AS (SELECT l_partkey, sum(q) AS tot FROM ps GROUP BY l_partkey)
SELECT ps.l_partkey, ps.l_suppkey, ps.q/100.0 AS supp_qty, pt.tot/100.0 AS part_qty
FROM ps JOIN pt USING (l_partkey)
WHERE ps.q * 5 > pt.tot
"""


def embedding_pca_top_component(sf_dir: str):
    """Distributed PCA (top principal component by power of the Gram
    matrix): each batch contributes a d×d partial Gram X'X, a d-vector
    column sum and a count — fixed-size partials, so the reduce moves
    O(blocks · d²) floats no matter the corpus size; the d×d eigensolve
    is driver-local. Sign fixed by making the largest-|loading|
    component positive; checked full-value against a single-process
    numpy oracle (PYTHON_ORACLES)."""
    ds = scan(sf_dir, "embeddings", columns=["embedding"])

    def gram_partial(batch: pa.Table) -> pa.Table:
        flat = batch.column("embedding").combine_chunks().flatten().to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        m = flat.reshape(batch.num_rows, -1)
        g = m.T @ m
        return pa.table(
            {
                "gram": pa.array([g.reshape(-1)], pa.list_(pa.float64())),
                "colsum": pa.array([m.sum(axis=0)], pa.list_(pa.float64())),
                "n": pa.array([batch.num_rows], pa.int64()),
            }
        )

    def combine(tables: list[pa.Table]) -> pa.Table:
        grams = [np.asarray(v) for t in tables for v in t.column("gram").to_pylist()]
        sums = [np.asarray(v) for t in tables for v in t.column("colsum").to_pylist()]
        ns = [v for t in tables for v in t.column("n").to_pylist()]
        return pa.table(
            {
                "gram": pa.array([np.sum(np.stack(grams), axis=0)], pa.list_(pa.float64())),
                "colsum": pa.array([np.sum(np.stack(sums), axis=0)], pa.list_(pa.float64())),
                "n": pa.array([int(sum(ns))], pa.int64()),
            }
        )

    # fan-in tree fold: the driver sees ONE 32 KB row, not one per block
    folded = relops.tree_fold(
        ds.map_batches(gram_partial, batch_format="pyarrow", zero_copy_batch=True),
        combine,
    )
    return _pca_from_partials(
        np.asarray(folded.column("gram")[0].as_py()),
        np.asarray(folded.column("colsum")[0].as_py()),
        int(folded.column("n")[0].as_py()),
    )


def _pca_from_partials(gram_flat: np.ndarray, colsum: np.ndarray, n: int) -> pa.Table:
    d = len(colsum)
    gram = gram_flat.reshape(d, d)
    mean = colsum / n
    cov = gram / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)
    top = vecs[:, -1]
    top = top if top[np.argmax(np.abs(top))] > 0 else -top
    evr = float(vals[-1] / vals.sum())
    return pa.table(
        {
            "eigval": pa.array([round(float(vals[-1]), 6)], pa.float64()),
            "explained_var_ratio": pa.array([round(evr, 6)], pa.float64()),
            "component": pa.array([np.round(top, 6)], pa.list_(pa.float64())),
        }
    )


def _oracle_pca(sf_dir: str) -> pa.Table:
    """Single-process reference: same partial shapes, one numpy pass."""
    tbl = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding"])
    flat = tbl.column("embedding").combine_chunks().flatten().to_numpy(
        zero_copy_only=False
    ).astype(np.float64)
    m = flat.reshape(tbl.num_rows, -1)
    return _pca_from_partials((m.T @ m).reshape(-1), m.sum(axis=0), len(m))


def price_quantiles_approx(sf_dir: str):
    """Approximate quantiles for CONTINUOUS columns via mergeable KLL
    sketches (rows-only; rank-error pytest in tests/test_sketch.py).
    The exact quantile operator (`token_quantiles_documents`) shuffles a
    value histogram bounded by DISTINCT-value count — right for integer
    stats, unbounded for doubles like prices. Here every block emits one
    fixed-size sketch row (O(k log n/k) floats) and the driver folds
    block-count sketches — the scale path when values don't repeat."""
    from .stages.sketch import KLL

    ds = scan(sf_dir, "lineitem", columns=["l_extendedprice"])

    def sk_partial(batch: pa.Table) -> pa.Table:
        sk = KLL(k=200, seed=0)
        sk.update(batch.column("l_extendedprice").to_numpy(zero_copy_only=False))
        row = sk.to_row()
        return pa.table(
            {
                "n": pa.array([row["n"]], pa.int64()),
                "k": pa.array([row["k"]], pa.int64()),
                "lens": pa.array([row["lens"]], pa.list_(pa.int64())),
                "data": pa.array([row["data"]], pa.list_(pa.float64())),
            }
        )

    def combine(tables: list[pa.Table]) -> pa.Table:
        merged = None
        for t in tables:
            for i in range(t.num_rows):
                row = {c: t.column(c)[i].as_py() for c in t.column_names}
                sk = KLL.from_row(row, seed=1)
                merged = sk if merged is None else merged.merge(sk)
        row = merged.to_row()
        return pa.table(
            {
                "n": pa.array([row["n"]], pa.int64()),
                "k": pa.array([row["k"]], pa.int64()),
                "lens": pa.array([row["lens"]], pa.list_(pa.int64())),
                "data": pa.array([row["data"]], pa.list_(pa.float64())),
            }
        )

    # fan-in tree fold: sketches merge in Ray tasks, the driver sees ONE
    folded = relops.tree_fold(
        ds.map_batches(sk_partial, batch_format="pyarrow", zero_copy_batch=True),
        combine,
    )
    merged = KLL.from_row(
        {c: folded.column(c)[0].as_py() for c in folded.column_names}, seed=1
    )
    qs = [0.25, 0.5, 0.75, 0.99]
    est = merged.quantiles(qs)
    return pa.table({"q": pa.array(qs, pa.float64()), "est": pa.array(est, pa.float64())})


# The KLL estimate itself depends on (seeded) compaction randomness whose
# draw order follows the block layout, so unlike the HLL/LSH companions the
# VALUE can't be pinned as a golden constant across parallelism levels. What
# IS invariant is the sketch's rank-error guarantee: the companion therefore
# hashes the BOUND CHECK (like the reference pinning widened-search results
# against capped goldens, tests/test_page_images.py:371-420). The 300 bp
# bound is ~5x the worst error observed across sf0.001/0.01/0.1 at 4/8/16/32
# cpus (max seen 29 bp) and half the pytest merged-sketch bound (300 bp).
PRICE_QUANTILES_RANK_CHECK_SQL = """
SELECT CAST(t.q_bp AS BIGINT) AS q_bp,
       CAST(t.ok AS BIGINT) AS within_300bp
FROM (VALUES (2500, 1), (5000, 1), (7500, 1), (9900, 1)) t(q_bp, ok)
"""


def price_quantiles_rank_check(sf_dir: str):
    """Driver-HASHABLE companion to the rows-only ``price_quantiles_approx``:
    re-measures each KLL quantile estimate's TRUE rank with a distributed
    exact pass (per-batch ``count(value <= est)`` partials, one tiny
    groupby), and hashes whether the rank error stays within 300 bp — the
    deterministic invariant the sketch guarantees, independent of which
    block layout produced the estimate."""
    est_tbl = price_quantiles_approx(sf_dir)
    qs = np.asarray(est_tbl.column("q").to_pylist())
    ests = np.asarray(est_tbl.column("est").to_pylist())

    ds = scan(sf_dir, "lineitem", columns=["l_extendedprice"])

    def rank_partial(batch: pa.Table) -> pa.Table:
        v = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        v = np.sort(v)
        cnts = np.searchsorted(v, ests, side="right")
        return pa.table(
            {
                "q_bp": pa.array((qs * 10000).astype(np.int64), pa.int64()),
                "le_cnt": pa.array(cnts.astype(np.int64), pa.int64()),
                "n": pa.array(np.full(len(qs), len(v), dtype=np.int64), pa.int64()),
            }
        )

    agg = (
        ds.map_batches(rank_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("q_bp")
        .aggregate(Sum("le_cnt", alias_name="le"), Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("q_bp")
    )
    err_bp = (agg["le"] / agg["n"] * 10000.0 - agg["q_bp"]).abs()
    return pa.table(
        {
            "q_bp": pa.array(agg["q_bp"].astype("int64").tolist(), pa.int64()),
            "within_300bp": pa.array(
                [int(e <= 300.0) for e in err_bp], pa.int64()
            ),
        }
    )


def cube_events_daily(sf_dir: str):
    """CUBE(event_type, day): all four grouping sets. Same re-aggregation
    design as the ROLLUP — ONE distributed pass builds the finest level
    (types × days rows regardless of input scale), every coarser set
    derives from it driver-side in exact integer 1e-4 units."""
    ds = scan(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "day": pc.strftime(
                    pc.floor_temporal(batch.column("ts"), unit="day"), format="%Y-%m-%d"
                ),
                "v": _cents(batch.column("value"), 10_000),
            }
        )
        return t.group_by(["event_type", "day"]).aggregate(
            [("v", "sum"), ("v", "count")]
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "day"])
        .aggregate(Sum("v_sum", alias_name="v"), Sum("v_count", alias_name="n"))
    )
    fine = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)

    def level(keys: list[str]) -> pa.Table:
        if keys:
            g = fine.group_by(keys).aggregate([("n", "sum"), ("v", "sum")])
            n, v = g.column("n_sum"), g.column("v_sum")
        else:
            g = pa.table({})
            n = pa.array([pc.sum(fine.column("n")).as_py() or 0], pa.int64())
            v = pa.array([pc.sum(fine.column("v")).as_py() or 0], pa.int64())
        rows = len(n)
        return pa.table(
            {
                "event_type": g.column("event_type") if "event_type" in keys
                else pa.array(["__all__"] * rows),
                "day": g.column("day") if "day" in keys
                else pa.array(["__all__"] * rows),
                "n": pc.cast(n, pa.int64()),
                "sum_value": round_away_arrow(
                    pc.divide(pc.cast(v, pa.float64()), 10_000.0)
                ),
            }
        )

    return pa.concat_tables(
        [level(["event_type", "day"]), level(["event_type"]), level(["day"]), level([])]
    )


CUBE_EVENTS_SQL = """
SELECT coalesce(event_type, '__all__') AS event_type,
       coalesce(day, '__all__') AS day,
       count(*) AS n,
       round(sum(CAST(round(value*10000) AS BIGINT))/10000.0, 4) AS sum_value
FROM (SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, value
      FROM events)
GROUP BY CUBE (event_type, day)
"""


def token_quantiles_cont_documents(sf_dir: str):
    """Interpolated (quantile_cont) distributed quantiles over per-doc
    token counts — the SAME mergeable value-histogram shuffle as the
    quantile_disc operator, with linear interpolation at h = p·(n−1)
    applied to the merged histogram. Both ranks come from integer
    searchsorted; only the final lerp is float (rounded 4dp on both
    sides)."""
    ds = scan(sf_dir, "documents", columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_value_length(pc.split_pattern(batch.column("text"), pattern=" "))
        t = pa.table({"v": pc.cast(toks, pa.int64())})
        return t.group_by(["v"]).aggregate([("v", "count")])

    hist = (
        relops.coalesce_partials(
            ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        )
        .groupby("v")
        .aggregate(Sum("v_count", alias_name="cnt"))
    )
    h = hist.to_pandas().sort_values("v").reset_index(drop=True)
    values = h["v"].to_numpy(dtype=np.int64)
    cum = h["cnt"].to_numpy(dtype=np.int64).cumsum()
    n = int(cum[-1]) if len(cum) else 0

    def value_at(rank0: int) -> float:
        return float(values[int(np.searchsorted(cum, rank0 + 1))])

    out_p, out_v = [], []
    for p, _, _ in _QUANTILES:
        pos = p * (n - 1)
        lo = int(np.floor(pos))
        hi = int(np.ceil(pos))
        va, vb = value_at(lo), value_at(hi)
        out_p.append(p)
        out_v.append(round(va + (pos - lo) * (vb - va), 4))
    return pa.table(
        {"p": pa.array(out_p, pa.float64()), "n_tokens": pa.array(out_v, pa.float64())}
    )


TOKEN_QUANTILES_CONT_SQL = """
WITH t AS (SELECT len(string_split(text, ' ')) AS v FROM documents)
SELECT 0.25 AS p, round(quantile_cont(v, 0.25), 4) AS n_tokens FROM t
UNION ALL SELECT 0.5, round(quantile_cont(v, 0.5), 4) FROM t
UNION ALL SELECT 0.75, round(quantile_cont(v, 0.75), 4) FROM t
UNION ALL SELECT 0.9, round(quantile_cont(v, 0.9), 4) FROM t
UNION ALL SELECT 0.99, round(quantile_cont(v, 0.99), 4) FROM t
"""


def percent_rank_orders(sf_dir: str):
    """percent_rank() OVER (PARTITION BY custkey ORDER BY totalprice):
    (rank−1)/(n−1) with min-rank tie handling — rank ties on equal
    VALUES, so the result is deterministic without a row tiebreak.
    custkey cardinality scales with sf → bucketed groupby; one pandas
    min-rank per bucket, vectorized."""
    orders = scan(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def bucket_pr(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        g = df.groupby("o_custkey")["o_totalprice"]
        rank = g.rank(method="min")
        cnt = g.transform("size")
        pr = np.where(cnt > 1, (rank - 1) / (cnt - 1), 0.0)
        return pa.table(
            {
                "o_orderkey": pa.array(df["o_orderkey"].to_numpy(), pa.int64()),
                "pr": pa.array(np.round(pr, 4), pa.float64()),
            }
        )

    return relops.bucketed_groupby(orders, ["o_custkey"], bucket_pr)


PERCENT_RANK_SQL = """
SELECT o_orderkey,
       round(percent_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice), 4) AS pr
FROM orders
"""


def ntile_orders_per_customer(sf_dir: str, tiles: int = 4):
    """ntile(4) OVER (PARTITION BY custkey ORDER BY totalprice, orderkey):
    SQL ntile semantics exactly — the first ``n % tiles`` tiles get
    ``n // tiles + 1`` rows. The orderkey tiebreak makes the row order
    total, so tile assignment is deterministic. Same shape as
    percent_rank: one conv-bucketed shuffle, vectorized per bucket."""
    orders = scan(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    t_tiles = tiles

    def bucket_ntile(group: pa.Table) -> pa.Table:
        d = group.take(pc.sort_indices(
            group, sort_keys=[("o_custkey", "ascending"),
                              ("o_totalprice", "ascending"),
                              ("o_orderkey", "ascending")]
        ))
        ck = d.column("o_custkey").to_numpy(zero_copy_only=False)
        n_all = len(ck)
        first = np.empty(n_all, dtype=bool)
        if n_all:
            first[0] = True
            first[1:] = ck[1:] != ck[:-1]
        starts = np.flatnonzero(first)
        counts = np.diff(np.r_[starts, n_all])
        # 0-based row index within each customer
        idx = np.arange(n_all) - np.repeat(starts, counts)
        n = np.repeat(counts, counts)
        q, rem = n // t_tiles, n % t_tiles
        big = rem * (q + 1)  # rows covered by the (q+1)-sized leading tiles
        tile = np.where(
            idx < big, idx // np.maximum(q + 1, 1),
            rem + (idx - big) // np.maximum(q, 1),
        ) + 1
        return pa.table(
            {
                "o_orderkey": d.column("o_orderkey"),
                "tile": pa.array(tile.astype(np.int64), pa.int64()),
            }
        )

    return relops.bucketed_groupby(orders, ["o_custkey"], bucket_ntile)


NTILE_ORDERS_SQL = """
SELECT o_orderkey,
       CAST(ntile(4) OVER (PARTITION BY o_custkey
                           ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS tile
FROM orders
"""


def global_rank_orders(sf_dir: str):
    """GLOBAL (un-partitioned) row_number + decile over every order by
    (totalprice DESC, orderkey) — the total-order window that needs a
    range partitioner, not a per-key bucket: `relops.global_row_number`
    samples split points, histograms bucket counts (ints to the driver),
    prefix-sums offsets, and ranks each contiguous key range locally.
    The decile falls out of rank + the histogram's total row count —
    exact SQL ntile semantics over the whole table."""
    orders = scan(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    ranked, total = relops.global_row_number(
        orders, "o_totalprice", ["o_orderkey"], descending=True
    )
    q, rem = divmod(total, 10)
    big = rem * (q + 1)

    def _tile(batch: pa.Table) -> pa.Table:
        rn0 = batch.column("row_num").to_numpy(zero_copy_only=False) - 1
        tile = np.where(
            rn0 < big, rn0 // max(q + 1, 1), rem + (rn0 - big) // max(q, 1)
        ) + 1
        return pa.table(
            {
                "o_orderkey": batch.column("o_orderkey"),
                "rn": batch.column("row_num"),
                "tile": pa.array(tile.astype(np.int64), pa.int64()),
            }
        )

    return ranked.map_batches(_tile, batch_format="pyarrow", zero_copy_batch=True)


GLOBAL_RANK_ORDERS_SQL = """
SELECT o_orderkey,
       CAST(row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn,
       CAST(ntile(10) OVER (ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS tile
FROM orders
"""


def _part_supplier_edges(sf_dir: str):
    """Symmetric bipartite edge list from lineitem co-occurrence:
    part node = 2·partkey, supplier node = 2·suppkey + 1, both
    directions, deduplicated through the bucketed groupby."""
    li = scan(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])

    def pair_distinct(batch: pa.Table) -> pa.Table:
        return batch.group_by(["l_partkey", "l_suppkey"]).aggregate([])

    def bucket_edges(group: pa.Table) -> pa.Table:
        g = group.group_by(["l_partkey", "l_suppkey"]).aggregate([])
        p = g.column("l_partkey").to_numpy(zero_copy_only=False) * 2
        s = g.column("l_suppkey").to_numpy(zero_copy_only=False) * 2 + 1
        return pa.table(
            {
                "src": pa.array(np.concatenate([p, s]), pa.int64()),
                "dst": pa.array(np.concatenate([s, p]), pa.int64()),
            }
        )

    return relops.bucketed_groupby(
        li.map_batches(pair_distinct, batch_format="pyarrow", zero_copy_batch=True),
        ["l_partkey", "l_suppkey"], bucket_edges,
        empty=pa.table(
            {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
        ),
    )


def triangle_count_suppliers(sf_dir: str):
    """Triangle counting on the co-supplier graph (suppliers are
    adjacent iff they supply a common part) — the third classic graph
    kernel beside PageRank and connected components. Stages: (1)
    distinct (part, supplier) pairs, batch-local first; (2) per-part
    supplier pairs generated inside a part-bucketed groupby (fan-out
    bounded by suppliers-per-part²); (3) distinct edges via an edge-
    bucketed groupby; (4) adjacency lists broadcast once (node-bounded;
    for graphs past the broadcast gate swap in an edge-partitioned
    e1⋈e2⋈e3 join — same shape as the twin) and each edge batch counts
    |N(u) ∩ N(v) ∩ {w > v}| with ordered-array intersections. Output is
    the (n_nodes, n_edges, n_triangles) summary row."""
    ds = scan(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])

    pairs = ds.map_batches(
        lambda b: b.group_by(["l_partkey", "l_suppkey"]).aggregate([]),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    edge_empty = pa.table(
        {"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())}
    )

    def part_pairs(group: pa.Table) -> pa.Table:
        d = group.group_by(["l_partkey", "l_suppkey"]).aggregate([])
        idx = pc.sort_indices(
            d, sort_keys=[("l_partkey", "ascending"), ("l_suppkey", "ascending")]
        )
        d = d.take(idx)
        p = d.column("l_partkey").to_numpy(zero_copy_only=False)
        s = d.column("l_suppkey").to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, p[1:] != p[:-1]])
        bounds = np.r_[starts, len(p)]
        us, vs = [], []
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            grp = s[lo:hi]
            if len(grp) > 1:
                iu, iv = np.triu_indices(len(grp), k=1)
                us.append(grp[iu])
                vs.append(grp[iv])
        if not us:
            return edge_empty
        return pa.table(
            {
                "u": pa.array(np.concatenate(us), pa.int64()),
                "v": pa.array(np.concatenate(vs), pa.int64()),
            }
        )

    raw_edges = relops.bucketed_groupby(pairs, ["l_partkey"], part_pairs, empty=edge_empty)

    def edge_distinct(group: pa.Table) -> pa.Table:
        return group.group_by(["u", "v"]).aggregate([])

    edges = relops.bucketed_groupby(
        raw_edges.map_batches(
            lambda b: b.group_by(["u", "v"]).aggregate([]),
            batch_format="pyarrow", zero_copy_batch=True,
        ),
        ["u", "v"], edge_distinct, empty=edge_empty,
    )

    # adjacency (node-bounded) broadcast once; sorted neighbor arrays
    adj_df = edges.to_pandas()
    n_edges = len(adj_df)
    nodes = np.union1d(adj_df["u"].unique(), adj_df["v"].unique())
    adj: dict[int, np.ndarray] = {}
    both = pd.concat(
        [adj_df, adj_df.rename(columns={"u": "v", "v": "u"})], ignore_index=True
    )
    for node, grp in both.groupby("u")["v"]:
        adj[int(node)] = np.sort(grp.to_numpy(np.int64))
    adj_ref = ray.put(adj)

    def count(batch: pa.Table) -> pa.Table:
        a = ray.get(adj_ref)
        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        total = 0
        for uu, vv in zip(u, v):
            common = np.intersect1d(a[int(uu)], a[int(vv)], assume_unique=True)
            total += int((common > vv).sum())
        return pa.table({"t": pa.array([total], pa.int64())})

    parts = edges.map_batches(count, batch_format="pyarrow", zero_copy_batch=True)
    n_tri = int(parts.to_pandas()["t"].sum())
    return pa.table(
        {
            "n_nodes": pa.array([len(nodes)], pa.int64()),
            "n_edges": pa.array([n_edges], pa.int64()),
            "n_triangles": pa.array([n_tri], pa.int64()),
        }
    )


TRIANGLE_COUNT_SQL = """
WITH pairs AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
edges AS (SELECT DISTINCT a.s AS u, b.s AS v
          FROM pairs a JOIN pairs b ON a.p = b.p AND a.s < b.s)
SELECT
  CAST((SELECT count(DISTINCT s) FROM (SELECT u AS s FROM edges
        UNION ALL SELECT v FROM edges)) AS BIGINT) AS n_nodes,
  CAST((SELECT count(*) FROM edges) AS BIGINT) AS n_edges,
  CAST((SELECT count(*)
        FROM edges e1 JOIN edges e2 ON e2.u = e1.u AND e2.v > e1.v
             JOIN edges e3 ON e3.u = e1.v AND e3.v = e2.v) AS BIGINT) AS n_triangles
"""


def pagerank_part_supplier(sf_dir: str):
    """Distributed PageRank over the part↔supplier co-occurrence graph
    (iterative graph algorithm beside connected components / k-means).
    Contributions are integer-quantized BEFORE the distributed sum, so
    the whole trajectory is summation-order-independent and matches the
    single-process numpy oracle bit-for-bit (PYTHON_ORACLES)."""
    from .stages.graph import pagerank

    return pagerank(_part_supplier_edges(sf_dir), iters=5)


def _oracle_pagerank(sf_dir: str) -> pa.Table:
    from .stages.graph import pagerank_numpy

    tbl = pq.read_table(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_partkey", "l_suppkey"]
    )
    df = tbl.to_pandas().drop_duplicates()
    p = df["l_partkey"].to_numpy(np.int64) * 2
    s = df["l_suppkey"].to_numpy(np.int64) * 2 + 1
    src = np.concatenate([p, s])
    dst = np.concatenate([s, p])
    nodes, r = pagerank_numpy(src, dst, iters=5)
    return pa.table(
        {"node": pa.array(nodes, pa.int64()), "rank": pa.array(r, pa.float64())}
    )


def pagerank_part_supplier_nano(sf_dir: str):
    """Driver-hashable companion of pagerank_part_supplier: the SAME
    distributed 5-iteration run, ranks emitted on the integer nano grid
    (rank/1e-9). Unlike the golden-pinned companions this twin is a REAL
    SQL re-derivation: the quantized recurrence is unrolled into 5 CTE
    iterations in DuckDB (half-even rounding emulated at every np.round
    site), so the driver re-computes the whole trajectory independently
    rather than comparing against a pinned constant."""
    ds = pagerank_part_supplier(sf_dir)

    def to_nano(batch: pa.Table) -> pa.Table:
        r = batch.column("rank").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": batch.column("node"),
                "rank_nano": pa.array(np.round(r / 1e-9).astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(to_nano, batch_format="pyarrow", zero_copy_batch=True)


def embedding_kmeans_exact(sf_dir: str, k: int = 8, iters: int = 5):
    """Driver-hashable k-means: the INTEGER-EXACT distributed Lloyd run
    (stages/ann.py::kmeans_exact_assign — embeddings quantized once to
    the 1e-6 grid, int64 distances, exact int64 partial folds, one
    deterministic double division per centroid update). Like
    pagerank_part_supplier_nano the twin is a REAL SQL re-derivation:
    DuckDB unrolls the identical recurrence over unnested embeddings and
    must reproduce every assignment and distance bit-for-bit — no pinned
    goldens, no float summation-order hazard by construction."""
    from .stages.ann import kmeans_exact_assign

    ds = scan(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return kmeans_exact_assign(ds, k=k, iters=iters)


def _materialize_ctes(sql: str) -> str:
    """Force CTE materialization in the unrolled iterative twins: DuckDB
    inlines single-reference CTEs, and a CTE referenced twice per
    iteration inlines EXPONENTIALLY across an unrolled recurrence (the
    8-step PCA twin went 160 s → 0.2 s with materialization)."""
    return sql.replace(" AS (", " AS MATERIALIZED (")


def _sql_round_even(x: str) -> str:
    """DuckDB emulation of np.round (round-half-even), valid for negative
    values too: ties go to the even neighbor (abs() keeps the odd-floor
    correction +1 on both sides of zero)."""
    return (
        f"(CASE WHEN ({x}) = floor({x}) + 0.5 "
        f"THEN floor({x}) + abs(CAST(floor({x}) AS BIGINT) % 2) "
        f"ELSE round({x}) END)"
    )


def _kmeans_exact_cte_prefix(k: int = 8, iters: int = 5) -> list[str]:
    """Shared CTE chain ending in ``asg`` = (vec_id, cluster, dist2q):
    the full integer-exact Lloyd unroll (used by KMEANS_EXACT_SQL and
    SEMDEDUP_EXACT_SQL)."""
    fe = _sql_round_even
    parts = [
        "WITH xd AS (",
        "  SELECT vec_id,",
        "         CAST(unnest(range(len(embedding))) AS BIGINT) AS dim,",
        f"         CAST({fe('CAST(unnest(embedding) AS DOUBLE) / 1e-6')} AS BIGINT) AS v",
        "  FROM embeddings",
        "), init AS (",
        "  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cluster,",
        "         vec_id",
        f"  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k})",
        "), cd0 AS (",
        "  SELECT i.cluster, x.dim, x.v AS c FROM init i JOIN xd x USING (vec_id)",
        ")",
    ]
    upd = fe("CAST(s.sv AS DOUBLE) / s.cnt")
    for i in range(1, iters + 1):
        prev = f"cd{i - 1}"
        parts += [
            f", d{i} AS (",
            "  SELECT x.vec_id, c.cluster,",
            "         CAST(sum((x.v - c.c) * (x.v - c.c)) AS BIGINT) AS d2",
            f"  FROM xd x JOIN {prev} c USING (dim) GROUP BY x.vec_id, c.cluster",
            f"), a{i} AS (",
            f"  SELECT vec_id, CAST(min(d2 * {k} + cluster) % {k} AS BIGINT) AS cluster",
            f"  FROM d{i} GROUP BY vec_id",
            f"), s{i} AS (",
            "  SELECT a.cluster, x.dim, CAST(sum(x.v) AS BIGINT) AS sv,",
            "         CAST(count(*) AS BIGINT) AS cnt",
            f"  FROM xd x JOIN a{i} a USING (vec_id) GROUP BY a.cluster, x.dim",
            f"), cd{i} AS (",
            "  SELECT c.cluster, c.dim,",
            "         CASE WHEN s.cnt IS NULL THEN c.c",
            f"              ELSE CAST({upd} AS BIGINT) END AS c",
            f"  FROM {prev} c LEFT JOIN s{i} s USING (cluster, dim)",
            ")",
        ]
    parts += [
        ", dF AS (",
        "  SELECT x.vec_id, c.cluster,",
        "         CAST(sum((x.v - c.c) * (x.v - c.c)) AS BIGINT) AS d2",
        f"  FROM xd x JOIN cd{iters} c USING (dim) GROUP BY x.vec_id, c.cluster",
        "), asg AS (",
        f"  SELECT vec_id, CAST(mk % {k} AS BIGINT) AS cluster,",
        f"         CAST(mk // {k} AS BIGINT) AS dist2q",
        f"  FROM (SELECT vec_id, min(d2 * {k} + cluster) AS mk FROM dF",
        "        GROUP BY vec_id)",
        ")",
    ]
    return parts


def _build_kmeans_exact_sql(k: int = 8, iters: int = 5) -> str:
    return _materialize_ctes(
        "\n".join(
            _kmeans_exact_cte_prefix(k, iters)
            + ["SELECT vec_id, cluster, dist2q FROM asg"]
        )
    )


def _build_semdedup_exact_sql(k: int = 8, iters: int = 5, eps: float = 0.3) -> str:
    """Exact-SemDeDup twin: extends the Lloyd unroll with quantized
    embedding lists (integer-valued DOUBLEs → list_dot_product is exact),
    the (dist2q DESC, vec_id ASC) priority pair join, and the
    ``cos >= eps`` prior-duplicate flag. Every compared double is
    bit-identical to the Ray side by construction."""
    fe = _sql_round_even
    parts = _kmeans_exact_cte_prefix(k, iters)
    parts[-1] = "), qv AS ("  # splice more CTEs after asg
    parts += [
        "  SELECT vec_id,",
        f"         list_transform(embedding, e -> CAST({fe('CAST(e AS DOUBLE) / 1e-6')} AS DOUBLE)) AS qe",
        "  FROM embeddings",
        "), nv AS (",
        "  SELECT vec_id, sqrt(list_dot_product(qe, qe)) AS nrm FROM qv",
        "), flags AS (",
        "  SELECT a.vec_id,",
        "         bool_or(list_dot_product(qa.qe, qb.qe) / (na.nrm * nb.nrm)",
        f"                 >= {eps!r}) AS dup",
        "  FROM asg a JOIN asg b ON a.cluster = b.cluster",
        "   AND (b.dist2q > a.dist2q OR (b.dist2q = a.dist2q AND b.vec_id < a.vec_id))",
        "  JOIN qv qa ON qa.vec_id = a.vec_id JOIN qv qb ON qb.vec_id = b.vec_id",
        "  JOIN nv na ON na.vec_id = a.vec_id JOIN nv nb ON nb.vec_id = b.vec_id",
        "  GROUP BY a.vec_id",
        ")",
        "SELECT a.vec_id, a.cluster, NOT coalesce(f.dup, false) AS keep",
        "FROM asg a LEFT JOIN flags f ON f.vec_id = a.vec_id",
    ]
    return _materialize_ctes("\n".join(parts))


def _build_pca_exact_sql(iters: int = 8) -> str:
    """Unrolled integer power iteration on the quantized Gram matrix —
    the SQL twin of stages/ann.py::pca_top_component_exact (see its
    docstring for the exactness argument at every step)."""
    fe = _sql_round_even
    parts = [
        "WITH xd AS (",
        "  SELECT vec_id,",
        "         CAST(unnest(range(len(embedding))) AS BIGINT) AS dim,",
        f"         CAST({fe('CAST(unnest(embedding) AS DOUBLE) / 1e-6')} AS BIGINT) AS v",
        "  FROM embeddings",
        "), g AS (",
        "  SELECT a.dim AS i, b.dim AS j, CAST(sum(a.v * b.v) AS BIGINT) AS gv",
        "  FROM xd a JOIN xd b USING (vec_id) GROUP BY a.dim, b.dim",
        "), gs AS (",
        f"  SELECT i, j, CAST({fe('CAST(gv AS DOUBLE) / 1000000.0')} AS BIGINT) AS gv",
        "  FROM g",
        "), v0 AS (",
        "  SELECT DISTINCT dim, CAST(1 AS BIGINT) AS v FROM xd",
        ")",
    ]
    quant = fe("(CAST(w AS DOUBLE) / n.nrm) * 1000000.0")
    for m in range(1, iters + 1):
        parts += [
            f", w{m} AS (",
            "  SELECT g.i AS dim, CAST(sum(g.gv * v.v) AS BIGINT) AS w",
            f"  FROM gs g JOIN v{m - 1} v ON v.dim = g.j GROUP BY g.i",
            f"), n{m} AS (",
            "  SELECT sqrt(CAST(sum(CAST(w AS HUGEINT) * CAST(w AS HUGEINT))",
            "              AS DOUBLE)) AS nrm",
            f"  FROM w{m}",
            f"), v{m} AS (",
            f"  SELECT dim, CAST({quant} AS BIGINT) AS v FROM w{m}, n{m} n",
            ")",
        ]
    parts += [
        ", sgn AS (",
        "  SELECT coalesce((SELECT CASE WHEN v < 0 THEN -1 ELSE 1 END",
        f"                   FROM v{iters} WHERE v <> 0 ORDER BY dim LIMIT 1),",
        "                  1) AS s",
        ")",
        f"SELECT v.dim, CAST(v.v * sgn.s AS BIGINT) AS component_q",
        f"FROM v{iters} v, sgn",
    ]
    return _materialize_ctes("\n".join(parts))


def embedding_pca_exact(sf_dir: str):
    """Driver-hashable PCA: the top principal direction from the
    integer-exact distributed power iteration
    (stages/ann.py::pca_top_component_exact), re-derived end-to-end by
    the unrolled DuckDB twin — Gram build, shrink, 8 matvec/normalize
    steps and the sign fix all reproduce bit-for-bit."""
    from .stages.ann import pca_top_component_exact

    ds = scan(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return pca_top_component_exact(ds, iters=8)


PCA_EXACT_SQL = _build_pca_exact_sql(8)
KMEANS_EXACT_SQL = _build_kmeans_exact_sql(8, 5)
SEMDEDUP_EXACT_SQL = _build_semdedup_exact_sql(8, 5, 0.3)


def semdedup_exact_embeddings(sf_dir: str):
    """Driver-hashable SemDeDup: integer-exact clustering + within-cluster
    cosine prior-duplicate pruning (stages/ann.py::semdedup_exact). The
    DuckDB twin re-derives clustering AND the keep decisions — real SQL
    re-derivation, no pinned goldens (the float ops are deterministic
    because every input is an exact integer; see the stage docstring)."""
    from .stages.ann import semdedup_exact

    ds = scan(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return semdedup_exact(ds, k=8, iters=5, eps=0.3)


def _build_pagerank_nano_sql(iters: int = 5) -> str:
    """Unroll the integer-quantized PageRank recurrence into one DuckDB
    statement. ``fe(x)`` emulates numpy's round-half-even (np.round);
    non-tie values agree with round() anyway, ties pick the even integer.
    All float expressions keep numpy's association order so the doubles
    are bit-identical: damping*csum*q = (0.85*csum)*1e-9, base = (1.0-0.85)/n."""
    fe = _sql_round_even  # ranks/contributions are non-negative; shared helper
    parts = [
        "WITH pairs AS (",
        "  SELECT DISTINCT l_partkey * 2 AS p, l_suppkey * 2 + 1 AS s FROM lineitem",
        "), edges AS (",
        "  SELECT p AS src, s AS dst FROM pairs",
        "  UNION ALL SELECT s AS src, p AS dst FROM pairs",
        "), nodes AS (",
        "  SELECT src AS node, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY src",
        "), meta AS (",
        "  SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes",
        "), r0 AS (",
        f"  SELECT node, deg, {fe('(1.0 / meta.n) / 1e-9')} * 1e-9 AS r",
        "  FROM nodes, meta",
        ")",
    ]
    for i in range(1, iters + 1):
        prev = f"r{i - 1}"
        contrib = fe(f"(r.r / r.deg) / 1e-9")
        upd = fe(
            "(((1.0 - 0.85) / meta.n) + (0.85 * CAST(coalesce(c.csum, 0) AS DOUBLE))"
            " * 1e-9) / 1e-9"
        )
        parts += [
            f", c{i} AS (",
            f"  SELECT e.dst AS node,",
            f"         CAST(sum(CAST({contrib} AS BIGINT)) AS BIGINT) AS csum",
            f"  FROM edges e JOIN {prev} r ON e.src = r.node GROUP BY e.dst",
            f"), r{i} AS (",
            f"  SELECT nd.node, nd.deg, {upd} * 1e-9 AS r",
            f"  FROM {prev} nd LEFT JOIN c{i} c USING (node), meta",
            ")",
        ]
    parts.append(
        f"SELECT node, CAST(round(r / 1e-9) AS BIGINT) AS rank_nano FROM r{iters}"
    )
    return _materialize_ctes("\n".join(parts))


PAGERANK_NANO_SQL = _build_pagerank_nano_sql(5)


def q19_disjunctive_revenue(sf_dir: str):
    """TPC-H Q19 shape: revenue under a DISJUNCTION of (brand, size,
    quantity) clause groups. The predicate union is pushed to BOTH scans —
    part reads only the three brands / size<=15, lineitem reads only
    qty in [1,30] — then the per-clause conjunctions evaluate vectorized
    after a size-gated join. (Testdata part has no p_container; the
    container clauses map onto p_size bands, keeping the OR-of-ANDs
    structure that makes Q19 a pushdown test.)"""
    clauses = [  # (brand, size_hi, qty_lo, qty_hi)
        ("Brand#1", 5, 1, 11),
        ("Brand#2", 10, 10, 20),
        ("Brand#3", 15, 20, 30),
    ]
    brands = [c[0] for c in clauses]
    li = scan(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
        filter=(
            (pc.field("l_quantity") >= 1.0) & (pc.field("l_quantity") <= 30.0)
        ),
    )
    part_small, _ = relops.small_side(
        sf_dir, "part", ["p_partkey", "p_brand", "p_size"]
    )
    if part_small is not None:
        mask = pc.and_(
            pc.is_in(part_small.column("p_brand"), value_set=pa.array(brands)),
            pc.less_equal(part_small.column("p_size"), 15),
        )
        li_keyed = li.map_batches(
            lambda t: t.rename_columns(
                ["p_partkey" if c == "l_partkey" else c for c in t.column_names]
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        joined = relops.broadcast_join(li_keyed, part_small.filter(mask), on="p_partkey")
    else:
        part_ds = scan(
            sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"],
            filter=(pc.field("p_brand").isin(brands) & (pc.field("p_size") <= 15)),
        )
        joined = li.join(
            part_ds, "inner",
            num_partitions=relops.choose_num_partitions(
                relops.table_path(sf_dir, "lineitem"),
                relops.table_path(sf_dir, "part"),
            ),
            on=("l_partkey",), right_on=("p_partkey",),
        )

    def partial(batch: pa.Table) -> pa.Table:
        qty = pc.cast(batch.column("l_quantity"), pa.float64())
        size = batch.column("p_size")
        brand = batch.column("p_brand")
        keep = pa.array(np.zeros(batch.num_rows, dtype=bool))
        for b, size_hi, qlo, qhi in clauses:
            keep = pc.or_(
                keep,
                pc.and_(
                    pc.and_(pc.equal(brand, b), pc.less_equal(size, size_hi)),
                    pc.and_(pc.greater_equal(qty, float(qlo)),
                            pc.less_equal(qty, float(qhi))),
                ),
            )
        batch = batch.filter(keep)
        rev = pc.multiply(
            pc.cast(batch.column("l_extendedprice"), pa.float64()),
            pc.subtract(1.0, pc.cast(batch.column("l_discount"), pa.float64())),
        )
        total = pc.sum(_cents(rev, 10_000)).as_py() or 0
        return pa.table({"rev_c": pa.array([total], pa.int64())})

    total_c = joined.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).sum("rev_c")
    return pa.table(
        {
            "revenue": round_away_arrow(
                pa.array([float(total_c) / 10_000.0], pa.float64())
            )
        }
    )


Q19_SQL = """
SELECT round(CAST(sum(CAST(round(l.l_extendedprice*(1-l.l_discount)*10000) AS BIGINT)) AS DOUBLE)/10000.0, 4) AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5  AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10 AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 20 AND 30)
"""


def q20_potential_promotion(sf_dir: str):
    """TPC-H Q20 shape: suppliers whose shipped quantity of some 'red'
    part exceeds a computed aggregate threshold (testdata has no partsupp
    / ps_availqty, so the reference point is 2.5x the global mean
    pair-sum — still a nested-aggregate semi-join: inner groupby, scalar
    subquery, HAVING, distinct, outer join). The red-part key set
    attaches size-gated; pair sums flow through the bucketed groupby;
    the threshold is an exact int-sum / int-count double, bit-equal on
    both sides."""
    part_small, part_ds = relops.small_side(sf_dir, "part", ["p_partkey", "p_name"])
    li = scan(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey", "l_quantity"])
    if part_small is not None:
        red = part_small.filter(
            pc.starts_with(part_small.column("p_name"), "red")
        ).select(["p_partkey"])
        keys_ref = ray.put(red.column("p_partkey").combine_chunks())

        def semi(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.is_in(batch.column("l_partkey"), value_set=ray.get(keys_ref))
            )

        red_li = li.map_batches(semi, batch_format="pyarrow", zero_copy_batch=True)
    else:
        red_parts = part_ds.map_batches(
            lambda t: t.filter(pc.starts_with(t.column("p_name"), "red")).select(
                ["p_partkey"]
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        red_li = li.join(
            red_parts, "inner",
            num_partitions=relops.choose_num_partitions(
                relops.table_path(sf_dir, "lineitem"),
                relops.table_path(sf_dir, "part"),
            ),
            on=("l_partkey",), right_on=("p_partkey",),
        )

    def qty_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_suppkey": batch.column("l_suppkey"),
                "l_partkey": batch.column("l_partkey"),
                "q": pc.cast(pc.round(batch.column("l_quantity")), pa.int64()),
            }
        )
        return t.group_by(["l_suppkey", "l_partkey"]).aggregate([("q", "sum")])

    def bucket_sum(group: pa.Table) -> pa.Table:
        g = group.group_by(["l_suppkey", "l_partkey"]).aggregate([("q_sum", "sum")])
        return pa.table(
            {
                "l_suppkey": g.column("l_suppkey"),
                "l_partkey": g.column("l_partkey"),
                "s": pc.cast(g.column("q_sum_sum"), pa.int64()),
            }
        )

    pairs = relops.bucketed_groupby(
        red_li.map_batches(qty_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["l_suppkey", "l_partkey"], bucket_sum,
        empty=pa.table(
            {
                "l_suppkey": pa.array([], pa.int64()),
                "l_partkey": pa.array([], pa.int64()),
                "s": pa.array([], pa.int64()),
            }
        ),
    )
    # scalar subquery: exact int sum / int count -> one double, identical
    # on the SQL side (pairs is already ref-materialized by
    # drop_empty_blocks inside bucketed_groupby, so the three consumers
    # below don't recompute the shuffle)
    total_s = pairs.sum("s")
    n_pairs = pairs.count()
    thr = 2.5 * (float(total_s) / float(n_pairs)) if n_pairs else float("inf")

    def over(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.greater(pc.cast(batch.column("s"), pa.float64()), thr))
        return pa.table({"s_suppkey": pc.unique(b.column("l_suppkey"))})

    def bucket_distinct(group: pa.Table) -> pa.Table:
        return pa.table({"s_suppkey": pc.unique(group.column("s_suppkey"))})

    supps = relops.bucketed_groupby(
        pairs.map_batches(over, batch_format="pyarrow", zero_copy_batch=True),
        ["s_suppkey"], bucket_distinct,
        empty=pa.table({"s_suppkey": pa.array([], pa.int64())}),
    )
    supp_small, supp_ds = relops.small_side(sf_dir, "supplier", ["s_suppkey", "s_name"])
    if supp_small is not None:
        named = relops.broadcast_join(supps, supp_small, on="s_suppkey")
    else:
        named = supps.join(
            supp_ds, "inner",
            num_partitions=relops.choose_num_partitions_for(supps),
            on=("s_suppkey",), right_on=("s_suppkey",),
        )
    df = named.sort("s_suppkey").to_pandas()
    if df.empty:
        # no supplier over threshold: Ray loses the schema on an empty
        # dataset, so rebuild the typed empty result explicitly
        return pa.table(
            {"s_suppkey": pa.array([], pa.int64()), "s_name": pa.array([], pa.string())}
        )
    out = pa.Table.from_pandas(df, preserve_index=False)
    return pa.table(
        {
            "s_suppkey": pc.cast(out.column("s_suppkey"), pa.int64()),
            "s_name": out.column("s_name"),
        }
    )


Q20_SQL = """
WITH pairs AS (
  SELECT l_suppkey, sum(CAST(round(l_quantity) AS BIGINT)) AS s
  FROM lineitem l
  WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
  GROUP BY l_suppkey, l_partkey
),
thr AS (SELECT 2.5 * CAST(sum(s) AS DOUBLE)/count(*) AS t FROM pairs)
SELECT s.s_suppkey, s.s_name
FROM supplier s
WHERE s.s_suppkey IN (SELECT l_suppkey FROM pairs, thr WHERE pairs.s > thr.t)
ORDER BY s.s_suppkey
"""


def q21_waiting_suppliers(sf_dir: str):
    """TPC-H Q21 shape: the double-correlated EXISTS + NOT-EXISTS on the
    same fact — suppliers who were the SOLE returner on a multi-supplier
    finished order. (Testdata lineitem has no commit/receipt dates; the
    'kept waiting' predicate maps onto l_returnflag='R', preserving the
    exists-another-supplier / not-exists-another-failing-supplier
    structure.) One bucketed groupby computes per-order distinct-supplier
    and distinct-returning-supplier counts plus the unique culprit —
    lineitem is never joined back to itself; only qualifying (orderkey,
    culprit) rows join the status-filtered orders."""
    li = scan(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_returnflag"])

    def pair_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_orderkey": batch.column("l_orderkey"),
                "l_suppkey": batch.column("l_suppkey"),
                "is_r": pc.cast(
                    pc.equal(batch.column("l_returnflag"), "R"), pa.int64()
                ),
            }
        )
        return t.group_by(["l_orderkey", "l_suppkey"]).aggregate([("is_r", "max")])

    def bucket_orders(group: pa.Table) -> pa.Table:
        pairs = group.group_by(["l_orderkey", "l_suppkey"]).aggregate(
            [("is_r_max", "max")]
        )
        per = pairs.group_by(["l_orderkey"]).aggregate(
            [("l_suppkey", "count"), ("is_r_max_max", "sum")]
        )
        r_rows = pairs.filter(pc.equal(pairs.column("is_r_max_max"), 1))
        culprit = r_rows.group_by(["l_orderkey"]).aggregate([("l_suppkey", "min")])
        per = per.join(culprit, keys=["l_orderkey"], join_type="inner")
        per = per.filter(
            pc.and_(
                pc.greater(per.column("l_suppkey_count"), 1),
                pc.equal(per.column("is_r_max_max_sum"), 1),
            )
        )
        return pa.table(
            {
                "l_orderkey": per.column("l_orderkey"),
                "culprit": pc.cast(per.column("l_suppkey_min"), pa.int64()),
            }
        )

    qualifying = relops.bucketed_groupby(
        li.map_batches(pair_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["l_orderkey"], bucket_orders,
        empty=pa.table(
            {"l_orderkey": pa.array([], pa.int64()), "culprit": pa.array([], pa.int64())}
        ),
    )
    f_orders = scan(
        sf_dir, "orders", columns=["o_orderkey"],
        filter=(pc.field("o_orderstatus") == "F"),
    )
    joined = qualifying.join(
        f_orders, "inner",
        num_partitions=relops.choose_num_partitions(
            relops.table_path(sf_dir, "lineitem"),
            relops.table_path(sf_dir, "orders"),
        ),
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def count_partial(batch: pa.Table) -> pa.Table:
        return (
            batch.select(["culprit"])
            .group_by(["culprit"])
            .aggregate([("culprit", "count")])
        )

    agg = (
        joined.map_batches(count_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("culprit")
        .aggregate(Sum("culprit_count", alias_name="numwait"))
    )
    per_supp = agg.map_batches(
        lambda t: pa.table(
            {
                "s_suppkey": pc.cast(t.column("culprit"), pa.int64()),
                "numwait": pc.cast(t.column("numwait"), pa.int64()),
            }
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    top = relops.topk(
        per_supp, [("numwait", "descending"), ("s_suppkey", "ascending")], 20
    )
    top_df = top.to_pandas()
    if top_df.empty:
        return pa.table(
            {
                "s_suppkey": pa.array([], pa.int64()),
                "s_name": pa.array([], pa.string()),
                "numwait": pa.array([], pa.int64()),
            }
        )
    top_tbl = pa.Table.from_pandas(top_df, preserve_index=False)
    # attribute fetch for exactly the <=20 winners
    names = pq.read_table(
        relops.table_path(sf_dir, "supplier"), columns=["s_suppkey", "s_name"],
        filters=[("s_suppkey", "in", top_tbl.column("s_suppkey").to_pylist())],
    )
    out = (
        top_tbl.join(names, keys=["s_suppkey"], join_type="inner")
        .to_pandas()
        .sort_values(["numwait", "s_suppkey"], ascending=[False, True])
    )
    return pa.table(
        {
            "s_suppkey": pa.array(out["s_suppkey"].to_numpy(np.int64), pa.int64()),
            "s_name": pa.array(out["s_name"], pa.string()),
            "numwait": pa.array(out["numwait"].to_numpy(np.int64), pa.int64()),
        }
    )


Q21_SQL = """
WITH per AS (
  SELECT l.l_orderkey,
         count(DISTINCT l.l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN l.l_returnflag='R' THEN l.l_suppkey END) AS n_r,
         min(CASE WHEN l.l_returnflag='R' THEN l.l_suppkey END) AS culprit
  FROM lineitem l GROUP BY l.l_orderkey
)
SELECT s.s_suppkey, s.s_name, count(*) AS numwait
FROM per p
JOIN orders o ON o.o_orderkey = p.l_orderkey AND o.o_orderstatus = 'F'
JOIN supplier s ON s.s_suppkey = p.culprit
WHERE p.n_supp > 1 AND p.n_r = 1
GROUP BY s.s_suppkey, s.s_name
ORDER BY numwait DESC, s.s_suppkey
LIMIT 20
"""


def dup_shingle_frac_documents(sf_dir: str):
    """Cross-document duplicated-shingle fraction (the RefinedWeb /
    Dolma 'duplicate n-gram' curation signal): for every document, the
    fraction of its DISTINCT word-3-gram shingles that also occur in at
    least one other document. Shingles travel as 64-bit hashes (never
    text) through two bucketed groupbys: the first co-locates each
    shingle's (doc, shingle) pairs to count containing docs AND fold the
    dup flag back per-doc in the same pass (no Dataset.join); the second
    sums the per-bucket doc partials. 64-bit hashes make a cross-doc
    false positive ~n²/2⁶⁴ — negligible at test scale; the scale path
    widens to a second independent hash column."""
    from .functions.hashing import _shingle_hashes_batch, _WordHashCache

    ds = scan(sf_dir, "documents", columns=["doc_id", "text"])
    cache = _WordHashCache()

    def pairs_fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        flat, offs = _shingle_hashes_batch(texts, 3, cache)
        per_doc = [np.unique(flat[offs[i]: offs[i + 1]]) for i in range(len(texts))]
        doc_rep = np.repeat(ids, [len(u) for u in per_doc])
        sh = np.concatenate(per_doc) if per_doc else np.empty(0, np.uint64)
        return pa.table(
            {
                "doc_id": pa.array(doc_rep, pa.int64()),
                "sh": pa.array(sh.astype(np.int64), pa.int64()),
            }
        )

    pairs = ds.map_batches(pairs_fn, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_count_and_fold(group: pa.Table) -> pa.Table:
        # every row of a shingle is in this bucket: count containing docs,
        # then fold the >1 flag back onto each (doc, shingle) pair and
        # emit per-doc partials
        nd = group.group_by(["sh"]).aggregate([("doc_id", "count")])
        j = group.join(nd, keys=["sh"], join_type="inner")
        t = pa.table(
            {
                "doc_id": j.column("doc_id"),
                "one": pa.array(np.ones(j.num_rows, np.int64)),
                "dup": pc.cast(pc.greater(j.column("doc_id_count"), 1), pa.int64()),
            }
        )
        d = t.group_by(["doc_id"]).aggregate([("one", "sum"), ("dup", "sum")])
        return pa.table(
            {
                "doc_id": d.column("doc_id"),
                "n_sh": pc.cast(d.column("one_sum"), pa.int64()),
                "n_dup": pc.cast(d.column("dup_sum"), pa.int64()),
            }
        )

    partials = relops.bucketed_groupby(
        pairs, ["sh"], bucket_count_and_fold,
        empty=pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_sh": pa.array([], pa.int64()),
                "n_dup": pa.array([], pa.int64()),
            }
        ),
    )

    def bucket_doc_sum(group: pa.Table) -> pa.Table:
        g = group.group_by(["doc_id"]).aggregate([("n_sh", "sum"), ("n_dup", "sum")])
        n = pc.cast(g.column("n_sh_sum"), pa.float64())
        dup = pc.cast(g.column("n_dup_sum"), pa.float64())
        return pa.table(
            {
                "doc_id": g.column("doc_id"),
                "n_shingles": pc.cast(g.column("n_sh_sum"), pa.int64()),
                "n_dup": pc.cast(g.column("n_dup_sum"), pa.int64()),
                "dup_frac": round_away_arrow(pc.divide(dup, n)),
            }
        )

    return relops.bucketed_groupby(
        partials, ["doc_id"], bucket_doc_sum,
        empty=pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_shingles": pa.array([], pa.int64()),
                "n_dup": pa.array([], pa.int64()),
                "dup_frac": pa.array([], pa.float64()),
            }
        ),
    )


DUP_SHINGLE_SQL = """
WITH ws AS (
  SELECT doc_id, unnest(string_split(text,' ')) AS word,
         generate_subscripts(string_split(text,' '),1) AS idx
  FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
    word || ' ' || lead(word,1) OVER w || ' ' || lead(word,2) OVER w AS shingle
  FROM ws WINDOW w AS (PARTITION BY doc_id ORDER BY idx)),
sh2 AS (SELECT doc_id, shingle FROM sh WHERE shingle IS NOT NULL),
cnt AS (SELECT shingle, count(*) AS nd FROM sh2 GROUP BY shingle)
SELECT s.doc_id, count(*) AS n_shingles,
       sum(CASE WHEN c.nd > 1 THEN 1 ELSE 0 END) AS n_dup,
       round(CAST(sum(CASE WHEN c.nd > 1 THEN 1 ELSE 0 END) AS DOUBLE)/count(*), 4) AS dup_frac
FROM sh2 s JOIN cnt c USING (shingle)
GROUP BY s.doc_id
"""


#: target language mixture for mixture_sample_documents (training-data
#: mixing: en-heavy with equal tails). Bounded cardinality by design.
_MIX_WEIGHTS = {"en": 0.4, "de": 0.15, "fr": 0.15, "es": 0.15, "zh": 0.15}


def mixture_sample_documents(sf_dir: str):
    """Capped stratified downsampling to a TARGET LANGUAGE MIXTURE (the
    training-data mixing step): given weights w_l, the largest feasible
    corpus is cap = min_l(n_l / w_l); keep the floor(w_l * cap) docs per
    language with the smallest md5(doc_id) — deterministic on any engine
    and layout, unlike seeded RNG sampling. One tiny counting pass fixes
    the per-language quotas; the selection pass prunes each batch to its
    local quota-head so the per-language exact selection (a bounded-
    cardinality groupby: #languages groups) sees at most k_l rows per
    language per batch.

    Scale note: exact rank-based quotas make the final per-language
    selection a top-k_l where k_l is the OUTPUT size — the per-language
    reduce task must hold its kept sample (fine whenever the sample is
    meant to be consumed; the per-batch prune bounds the reduce input to
    k_l x #batches). For quotas near the corpus size, switch to
    hash-THRESHOLD sampling (keep h < t_l with t_l a sampled quantile,
    trim the boundary band exactly) — the stratified_sample_orders shape."""
    from .stages.convdedup import _md5_prefix_i64

    counts_ds = (
        scan(sf_dir, "documents", columns=["lang"])
        .map_batches(
            lambda t: t.group_by(["lang"]).aggregate([("lang", "count")]),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        .groupby("lang")
        .aggregate(Sum("lang_count", alias_name="n"))
    )
    counts = {r["lang"]: int(r["n"]) for r in counts_ds.take_all()}
    # cap over PRESENT languages only (the SQL twin's counts CTE sees no
    # absent-language rows); unknown langs get the default tail weight
    weights = {
        lang: _MIX_WEIGHTS.get(lang, 0.15) for lang in counts
    }
    cap = min(float(counts[lang]) / w for lang, w in weights.items())
    quotas = {lang: int(np.floor(w * cap)) for lang, w in weights.items()}

    ds = scan(sf_dir, "documents", columns=["doc_id", "lang"])

    def rank_and_prune(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        # int64 md5 prefix via the shared batch helper — ranks sort as
        # 8-byte ints, not 32-char hex strings (the twin orders by the
        # same 12-hex-char prefix, so parity is exact by construction)
        h = _md5_prefix_i64([str(int(i)) for i in ids])
        df = pd.DataFrame(
            {"doc_id": ids, "lang": batch.column("lang").to_pylist(), "h": h}
        ).sort_values(["lang", "h", "doc_id"])
        kept = [
            g.head(quotas.get(lang, 0)) for lang, g in df.groupby("lang", sort=False)
        ]
        out = pd.concat(kept) if kept else df.iloc[:0]
        return pa.Table.from_pandas(out, preserve_index=False)

    pruned = ds.map_batches(rank_and_prune, batch_format="pyarrow", zero_copy_batch=True)

    def pick(group: pd.DataFrame) -> pd.DataFrame:
        k = quotas.get(group["lang"].iloc[0], 0) if len(group) else 0
        return group.sort_values(["h", "doc_id"]).head(k)[["doc_id", "lang"]]

    out = pruned.groupby("lang").map_groups(pick, batch_format="pandas")
    tbl = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return pa.table(
        {
            "doc_id": pc.cast(tbl.column("doc_id"), pa.int64()),
            "lang": pc.cast(tbl.column("lang"), pa.string()),
        }
    )


MIXTURE_SAMPLE_SQL = """
WITH counts AS (
  SELECT lang, count(*) AS n,
         CASE WHEN lang='en' THEN 0.4 ELSE 0.15 END AS w
  FROM documents GROUP BY lang),
t AS (SELECT min(CAST(n AS DOUBLE)/w) AS cap FROM counts),
ks AS (SELECT lang, CAST(floor(w * t.cap) AS BIGINT) AS k FROM counts, t),
ranked AS (
  SELECT doc_id, lang,
    row_number() OVER (PARTITION BY lang
                       ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 12),
                                doc_id) AS rn
  FROM documents)
SELECT r.doc_id, r.lang FROM ranked r JOIN ks USING (lang) WHERE r.rn <= ks.k
"""


def gopher_rules_documents(sf_dir: str):
    """Gopher-style repetition/diversity quality rules per document:
    word count, mean word length, distinct-required-stopword count and
    the most-common-bigram coverage fraction, plus the combined keep
    flag (n_words >= 40 AND >= 2 distinct stopwords AND top-bigram
    coverage <= 10%). One vectorized explode pass per batch — no
    shuffle, no cross-doc state; keep is decided on unrounded doubles
    (identical arithmetic to the SQL twin)."""
    ds = scan(sf_dir, "documents", columns=["doc_id", "text"])
    stop_set = pa.array(["the", "a", "row", "value"])

    def stats(batch: pa.Table) -> pa.Table:
        parent, flat, lengths = _exploded_words(batch)
        doc_ids = pa.array(parent, pa.int64())
        # per-doc word count + mean word length + distinct stopwords
        base = pa.table(
            {
                "doc_id": doc_ids,
                "wlen": pc.cast(pc.utf8_length(flat), pa.int64()),
            }
        ).group_by(["doc_id"]).aggregate([("wlen", "count"), ("wlen", "sum")])
        stop_mask = pc.is_in(flat, value_set=stop_set)
        st = pa.table(
            {"doc_id": doc_ids, "word": flat}
        ).filter(stop_mask).group_by(["doc_id", "word"]).aggregate([("word", "count")])
        nstop = st.group_by(["doc_id"]).aggregate([("word_count", "count")])
        # per-doc top-bigram coverage: bigram = word[i] + ' ' + word[i+1]
        # within one doc (mask out cross-doc seams), vectorized
        w = flat.to_numpy(zero_copy_only=False)
        if len(w) > 1:
            seam_ok = parent[:-1] == parent[1:]
            bg_doc = parent[:-1][seam_ok]
            bg = np.char.add(
                np.char.add(w[:-1][seam_ok].astype(str), " "),
                w[1:][seam_ok].astype(str),
            )
        else:
            bg_doc = np.empty(0, np.int64)
            bg = np.empty(0, str)
        bgt = pa.table(
            {"doc_id": pa.array(bg_doc, pa.int64()), "bigram": pa.array(bg, pa.string())}
        ).group_by(["doc_id", "bigram"]).aggregate([("bigram", "count")])
        per_bg = bgt.group_by(["doc_id"]).aggregate(
            [("bigram_count", "max"), ("bigram_count", "sum")]
        )
        out = base.join(nstop, keys=["doc_id"], join_type="left outer").join(
            per_bg, keys=["doc_id"], join_type="left outer"
        )
        n_words = pc.cast(out.column("wlen_count"), pa.float64())
        mean_wlen = pc.divide(pc.cast(out.column("wlen_sum"), pa.float64()), n_words)
        n_stop = pc.fill_null(
            pc.cast(out.column("word_count_count"), pa.int64()), 0
        )
        top_frac = pc.divide(
            pc.cast(pc.fill_null(out.column("bigram_count_max"), 0), pa.float64()),
            pc.cast(pc.fill_null(out.column("bigram_count_sum"), 1), pa.float64()),
        )
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(out.column("wlen_count"), 40),
                pc.greater_equal(n_stop, 2),
            ),
            pc.less_equal(top_frac, 0.1),
        )
        return pa.table(
            {
                "doc_id": out.column("doc_id"),
                "n_words": pc.cast(out.column("wlen_count"), pa.int64()),
                "mean_wlen": round_away_arrow(mean_wlen),
                "n_distinct_stop": n_stop,
                "top_bigram_frac": round_away_arrow(top_frac),
                "keep": keep,
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)


GOPHER_RULES_SQL = """
WITH ws AS (
  SELECT doc_id, unnest(string_split(text,' ')) AS word,
         generate_subscripts(string_split(text,' '),1) AS idx
  FROM documents),
base AS (SELECT doc_id, count(*) AS n_words, sum(length(word)) AS n_chars FROM ws GROUP BY doc_id),
stops AS (SELECT doc_id, count(DISTINCT word) AS n_stop FROM ws
          WHERE word IN ('the','a','row','value') GROUP BY doc_id),
bg AS (SELECT doc_id, word || ' ' || lead(word,1) OVER (PARTITION BY doc_id ORDER BY idx) AS bigram FROM ws),
bgc AS (SELECT doc_id, bigram, count(*) AS c FROM bg WHERE bigram IS NOT NULL GROUP BY doc_id, bigram),
per_bg AS (SELECT doc_id, max(c) AS maxc, sum(c) AS nbg FROM bgc GROUP BY doc_id)
SELECT b.doc_id,
  CAST(b.n_words AS BIGINT) AS n_words,
  round(CAST(b.n_chars AS DOUBLE)/b.n_words, 4) AS mean_wlen,
  CAST(coalesce(s.n_stop, 0) AS BIGINT) AS n_distinct_stop,
  round(CAST(coalesce(p.maxc, 0) AS DOUBLE)/coalesce(p.nbg, 1), 4) AS top_bigram_frac,
  (b.n_words >= 40 AND coalesce(s.n_stop, 0) >= 2
   AND CAST(coalesce(p.maxc, 0) AS DOUBLE)/coalesce(p.nbg, 1) <= 0.1) AS keep
FROM base b
LEFT JOIN stops s USING (doc_id)
LEFT JOIN per_bg p USING (doc_id)
"""


def full_outer_user_day(sf_dir: str):
    """FULL OUTER join: per (user, day), error count vs purchase count —
    on the fixture ~40% of rows exist on one side only, so every outer
    branch is exercised. Each side pre-aggregates (one row per (user,
    day) per block) through the bucketed groupby before the distributed
    full_outer Dataset.join; the finisher coalesces keys and null-fills
    counts vectorized."""

    def side(ev: str, out: str, key_u: str, key_d: str):
        ds = scan(
            sf_dir, "events", columns=["ts", "user_id"],
            filter=(pc.field("event_type") == ev),
        )

        def partial(batch: pa.Table) -> pa.Table:
            t = pa.table(
                {
                    "u": batch.column("user_id"),
                    "d": pc.strftime(batch.column("ts"), format="%Y-%m-%d"),
                }
            )
            return t.group_by(["u", "d"]).aggregate([("d", "count")])

        def bucket(group: pa.Table) -> pa.Table:
            g = group.group_by(["u", "d"]).aggregate([("d_count", "sum")])
            return pa.table(
                {
                    key_u: g.column("u"),
                    key_d: g.column("d"),
                    out: pc.cast(g.column("d_count_sum"), pa.int64()),
                }
            )

        return relops.bucketed_groupby(
            ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
            ["u", "d"], bucket,
            empty=pa.table(
                {
                    key_u: pa.array([], pa.int64()),
                    key_d: pa.array([], pa.string()),
                    out: pa.array([], pa.int64()),
                }
            ),
        )

    errs = side("error", "n_err", "user_id", "d")
    buys = side("purchase", "n_buy", "bu_user", "bu_d")
    joined = errs.join(
        buys, "full_outer",
        num_partitions=relops.choose_num_partitions(relops.table_path(sf_dir, "events")),
        on=("user_id", "d"), right_on=("bu_user", "bu_d"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        cols = batch.column_names
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "day": pa.array([], pa.string()),
                "n_err": pa.array([], pa.int64()),
                "n_buy": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0 or "user_id" not in cols:
            return empty
        # Ray's hash join may either keep the right_on key columns
        # (bu_user/bu_d, null on left-only rows) or coalesce them into the
        # left key names and drop them — handle both block schemas.
        u = batch.column("user_id")
        if "bu_user" in cols:
            u = pc.coalesce(u, batch.column("bu_user"))
        d = batch.column("d")
        if "bu_d" in cols:
            d = pc.coalesce(d, batch.column("bu_d"))
        return pa.table(
            {
                "user_id": u,
                "day": d,
                "n_err": pc.fill_null(pc.cast(batch.column("n_err"), pa.int64()), 0),
                "n_buy": pc.fill_null(pc.cast(batch.column("n_buy"), pa.int64()), 0),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


FULL_OUTER_SQL = """
WITH a AS (SELECT user_id, strftime(ts, '%Y-%m-%d') AS d, count(*) AS n_err
           FROM events WHERE event_type = 'error' GROUP BY 1, 2),
     b AS (SELECT user_id, strftime(ts, '%Y-%m-%d') AS d, count(*) AS n_buy
           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
SELECT coalesce(a.user_id, b.user_id) AS user_id,
       coalesce(a.d, b.d) AS day,
       CAST(coalesce(a.n_err, 0) AS BIGINT) AS n_err,
       CAST(coalesce(b.n_buy, 0) AS BIGINT) AS n_buy
FROM a FULL OUTER JOIN b ON a.user_id = b.user_id AND a.d = b.d
"""


def unpivot_events_daily(sf_dir: str):
    """Melt (UNPIVOT): the day x type pivot back to long (day, type, n)
    rows INCLUDING the zero cells the wide form materializes — the
    reshaping inverse of pivot_events_daily. The melt itself runs on the
    post-aggregation wide table (days x types — small by construction);
    the Arrow column-to-rows expansion is one take/concat, no Python
    row loop."""
    wide = pivot_events_daily(sf_dir)
    days = wide.column("d")
    n_days = wide.num_rows
    parts = []
    for t in _EVENT_TYPES:
        parts.append(
            pa.table(
                {
                    "d": days,
                    "event_type": pa.array([t] * n_days, pa.string()),
                    "n": pc.cast(wide.column(f"n_{t}"), pa.int64()),
                }
            )
        )
    return pa.concat_tables(parts)


UNPIVOT_SQL = """
WITH days AS (SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS d FROM events),
     types AS (SELECT unnest(['click','error','purchase','signup','view']) AS event_type),
     c AS (SELECT strftime(ts, '%Y-%m-%d') AS d, event_type, count(*) AS n
           FROM events GROUP BY 1, 2)
SELECT days.d, types.event_type, CAST(coalesce(c.n, 0) AS BIGINT) AS n
FROM days CROSS JOIN types
LEFT JOIN c ON c.d = days.d AND c.event_type = types.event_type
"""


def vocab_entropy_by_lang(sf_dir: str):
    """Shannon entropy of the word distribution per language (a corpus
    diversity diagnostic): H = ln(n) - sum(c·ln c)/n over per-(lang,
    word) counts. The explode emits (lang, word) count partials per
    batch; the bucketed groupby makes the integer counts exact; only the
    per-word c·ln(c) terms are floats, summed once per language (drift
    ~1e-13 relative ≪ the 4-decimal grid — the corr_qty_price argument)."""
    ds = scan(sf_dir, "documents", columns=["lang", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        words = pc.split_pattern(batch.column("text"), pattern=" ")
        words = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
        lengths = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        langs = batch.column("lang").to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "lang": pa.array(np.repeat(langs, lengths), pa.string()),
                "word": pc.list_flatten(words),
            }
        )
        return t.group_by(["lang", "word"]).aggregate([("word", "count")])

    def bucket_sum(group: pa.Table) -> pa.Table:
        g = group.group_by(["lang", "word"]).aggregate([("word_count", "sum")])
        return pa.table(
            {
                "lang": g.column("lang"),
                "word": g.column("word"),
                "c": pc.cast(g.column("word_count_sum"), pa.int64()),
            }
        )

    counts = relops.bucketed_groupby(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["lang", "word"], bucket_sum,
        empty=pa.table(
            {
                "lang": pa.array([], pa.string()),
                "word": pa.array([], pa.string()),
                "c": pa.array([], pa.int64()),
            }
        ),
    )

    def ent_partial(batch: pa.Table) -> pa.Table:
        c = pc.cast(batch.column("c"), pa.float64())
        t = pa.table(
            {
                "lang": batch.column("lang"),
                "n": batch.column("c"),
                "v": pa.array(np.ones(batch.num_rows, np.int64)),
                "s": pc.multiply(c, pc.ln(c)),
            }
        )
        return t.group_by(["lang"]).aggregate(
            [("n", "sum"), ("v", "sum"), ("s", "sum")]
        )

    agg = (
        counts.map_batches(ent_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang")
        .aggregate(
            Sum("n_sum", alias_name="n_words"),
            Sum("v_sum", alias_name="n_vocab"),
            Sum("s_sum", alias_name="s"),
        )
    )
    tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    n = pc.cast(tbl.column("n_words"), pa.float64())
    ent = pc.subtract(pc.ln(n), pc.divide(tbl.column("s"), n))
    return pa.table(
        {
            "lang": tbl.column("lang"),
            "n_words": pc.cast(tbl.column("n_words"), pa.int64()),
            "n_vocab": pc.cast(tbl.column("n_vocab"), pa.int64()),
            "entropy": round_away_arrow(ent),
        }
    )


VOCAB_ENTROPY_SQL = """
WITH wc AS (
  SELECT lang, word, count(*) AS c FROM (
    SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents)
  GROUP BY 1, 2),
per AS (SELECT lang, sum(c) AS n, count(*) AS v, sum(c * ln(c)) AS s FROM wc GROUP BY lang)
SELECT lang, CAST(n AS BIGINT) AS n_words, CAST(v AS BIGINT) AS n_vocab,
       round(ln(n) - s/n, 4) AS entropy
FROM per
"""


def dup_span_removal_documents(sf_dir: str, n: int = 5):
    """Cross-document duplicated-SPAN removal (word-level ExactSubstr of
    Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better"): every token covered by a word-5-gram occurring in >= 2
    DISTINCT documents is dropped; the op returns the rewritten text plus
    kept/removed counts per doc. Scale shape: spans travel as 64-bit
    hashes with (doc_id, pos) — never text; detection AND the occurrence
    filter fold into ONE shingle-bucketed shuffle (all rows of a shingle
    share a bucket), position expansion + the per-doc removal list are
    local to a doc-bucketed second pass whose output is one row per
    AFFECTED doc (≪ corpus), and the corpus text joins back once via a
    distributed left_outer join. Reference analog: the toolkit's
    cross-page cleanup ops (pipeline.py render/cleanup stages) as a
    corpus-level curation transform."""
    from .functions.hashing import _WordHashCache, shingle_hashes_pos

    ds = scan(sf_dir, "documents", columns=["doc_id", "text"])
    cache = _WordHashCache()

    def pos_pairs(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        hs: list[np.ndarray] = []
        for t in texts:
            # split(' ') (not .split()) so token positions match the SQL
            # twin's string_split(text, ' ') indexing exactly
            hs.append(shingle_hashes_pos((t or "").split(" "), n, cache))
        lens = [len(h) for h in hs]
        flat = np.concatenate(hs) if hs else np.empty(0, np.uint64)
        pos = np.concatenate([np.arange(k, dtype=np.int64) for k in lens]) if hs else np.empty(0, np.int64)
        return pa.table(
            {
                "sh": pa.array(flat.astype(np.int64), pa.int64()),
                "doc_id": pa.array(np.repeat(ids, lens), pa.int64()),
                "pos": pa.array(pos, pa.int64()),
            }
        )

    pairs = ds.map_batches(pos_pairs, batch_format="pyarrow", zero_copy_batch=True)

    empty_dp = pa.table(
        {"doc_id": pa.array([], pa.int64()), "pos": pa.array([], pa.int64())}
    )

    def bucket_dup_occurrences(group: pa.Table) -> pa.Table:
        # distinct docs per shingle, then keep every occurrence row of the
        # shingles seen in >= 2 docs — detection + filter in one pass
        dd = group.group_by(["sh", "doc_id"]).aggregate([])
        nd = dd.group_by(["sh"]).aggregate([("doc_id", "count")])
        dup = nd.filter(pc.greater_equal(nd.column("doc_id_count"), 2)).select(["sh"])
        j = group.join(dup, keys=["sh"], join_type="inner")
        return j.select(["doc_id", "pos"])

    dup_occ = relops.bucketed_groupby(
        pairs, ["sh"], bucket_dup_occurrences, empty=empty_dp
    )

    empty_rm = pa.table(
        {"rm_doc": pa.array([], pa.int64()), "rm": pa.array([], pa.binary())}
    )

    def bucket_removal_lists(group: pa.Table) -> pa.Table:
        doc = group.column("doc_id").to_numpy(zero_copy_only=False)
        pos = group.column("pos").to_numpy(zero_copy_only=False)
        # expand each span start to its n covered positions, distinct per doc
        j = np.repeat(pos, n) + np.tile(np.arange(n, dtype=np.int64), len(pos))
        d = np.repeat(doc, n)
        order = np.lexsort((j, d))
        d, j = d[order], j[order]
        keep = np.ones(len(d), bool)
        keep[1:] = (d[1:] != d[:-1]) | (j[1:] != j[:-1])
        d, j = d[keep], j[keep]
        starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        bounds = np.r_[starts, len(d)]
        # positions ship as an int64-LE blob: Ray's hash join rejects
        # list-typed payload columns, a binary one passes through
        blobs = [j[a:b].tobytes() for a, b in zip(bounds[:-1], bounds[1:])]
        return pa.table(
            {
                "rm_doc": pa.array(d[starts], pa.int64()),
                "rm": pa.array(blobs, pa.binary()),
            }
        )

    rm_lists = relops.bucketed_groupby(
        dup_occ, ["doc_id"], bucket_removal_lists, empty=empty_rm
    )

    # rm_lists is one row per AFFECTED doc but each row carries a position
    # blob, so the gate is on BYTES (measured: the distributed left_outer
    # join was ~2 s of fixed hash-shuffle overhead at sf0.1 for a 4 KB
    # small side; under the gate the corpus scan attaches removal lists
    # per batch with zero shuffle)
    joined = relops.size_gated_join(
        ds, rm_lists, on="doc_id", right_on="rm_doc", how="left",
        num_partitions=relops.choose_num_partitions(
            relops.table_path(sf_dir, "documents")
        ),
    )

    empty_out = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "n_removed": pa.array([], pa.int64()),
            "kept_frac": pa.array([], pa.float64()),
            "clean_text": pa.array([], pa.string()),
        }
    )

    def rebuild(batch: pa.Table) -> pa.Table:
        from .functions.rounding import round_away

        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return empty_out
        texts = batch.column("text").to_pylist()
        rms = (
            batch.column("rm").to_pylist()
            if "rm" in batch.column_names
            else [None] * batch.num_rows
        )
        n_tok = np.empty(len(texts), np.int64)
        n_rm = np.zeros(len(texts), np.int64)
        clean: list[str] = []
        for i, (t, rm) in enumerate(zip(texts, rms)):
            words = (t or "").split(" ")
            n_tok[i] = len(words)
            if not rm:
                clean.append(t or "")
            else:
                rs = set(np.frombuffer(rm, np.int64))
                n_rm[i] = len(rs)
                clean.append(" ".join(w for k, w in enumerate(words) if k not in rs))
        kept = (n_tok - n_rm).astype(np.float64) / n_tok
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_removed": pa.array(n_rm, pa.int64()),
                "kept_frac": pa.array(round_away(kept, 4), pa.float64()),
                "clean_text": pa.array(clean, pa.string()),
            }
        )

    return joined.map_batches(rebuild, batch_format="pyarrow", zero_copy_batch=True)


DUP_SPAN_REMOVAL_SQL = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
pos AS (
  SELECT doc_id, i, w[i] AS tok,
         CASE WHEN i + 4 <= len(w)
              THEN w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4] END AS g
  FROM toks, UNNEST(range(1, len(w) + 1)) AS t(i)
),
dup AS (SELECT g FROM pos WHERE g IS NOT NULL GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
cover AS (
  SELECT DISTINCT p.doc_id, p.i + u.k AS j
  FROM pos p JOIN dup USING (g), UNNEST(range(0, 5)) AS u(k)
),
flags AS (
  SELECT p.doc_id, p.i, p.tok, (c.j IS NOT NULL) AS removed
  FROM pos p LEFT JOIN cover c ON c.doc_id = p.doc_id AND c.j = p.i
)
SELECT doc_id,
       count(*) AS n_tokens,
       CAST(coalesce(sum(CASE WHEN removed THEN 1 END), 0) AS BIGINT) AS n_removed,
       round(CAST(count(*) - coalesce(sum(CASE WHEN removed THEN 1 END), 0) AS DOUBLE)
             / count(*), 4) AS kept_frac,
       coalesce(string_agg(tok, ' ' ORDER BY i) FILTER (WHERE NOT removed), '') AS clean_text
FROM flags GROUP BY doc_id
"""


def source_overlap_documents(sf_dir: str):
    """Pairwise distinct-3-gram Jaccard overlap between document SOURCES
    (the cross-corpus contamination matrix: which training sources share
    content). Scale shape: shingles travel as 64-bit hashes with their
    source tag, per-batch locally deduped; ONE shingle-bucketed shuffle
    computes in-bucket distinct (shingle, source) then folds BOTH the
    per-source totals and the per-pair co-occurrence counts (an in-bucket
    Arrow self-join, <= S^2 rows per bucket for S sources); the final
    fold over <= buckets x S^2 partial rows is driver-side because the
    result is S^2-sized by construction."""
    from .functions.hashing import _WordHashCache, shingle_hashes_pos
    from .functions.rounding import round_away

    ds = scan(sf_dir, "documents", columns=["source", "text"])
    cache = _WordHashCache()

    def src_shingles(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        srcs = batch.column("source").to_pylist()
        codes, uniq = pd.factorize(np.asarray(srcs, dtype=object))
        hs = [shingle_hashes_pos((t or "").split(" "), 3, cache) for t in texts]
        lens = [len(h) for h in hs]
        flat = np.concatenate(hs) if hs else np.empty(0, np.uint64)
        crep = np.repeat(codes.astype(np.int64), lens)
        # local distinct (source, shingle) before the shuffle
        order = np.lexsort((flat, crep))
        c, f = crep[order], flat[order]
        keep = np.ones(len(c), bool)
        keep[1:] = (c[1:] != c[:-1]) | (f[1:] != f[:-1])
        c, f = c[keep], f[keep]
        return pa.table(
            {
                "sh": pa.array(f.astype(np.int64), pa.int64()),
                "source": pa.array(uniq.take(c), pa.string()),
            }
        )

    pairs = ds.map_batches(src_shingles, batch_format="pyarrow", zero_copy_batch=True)

    empty_partial = pa.table(
        {
            "source_a": pa.array([], pa.string()),
            "source_b": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }
    )

    def bucket_overlap(group: pa.Table) -> pa.Table:
        t = group.group_by(["sh", "source"]).aggregate([])
        tot = t.group_by(["source"]).aggregate([("sh", "count")])
        ones = pa.nulls(tot.num_rows, pa.string())
        totals = pa.table(
            {
                "source_a": tot.column("source"),
                "source_b": ones,
                "n": pc.cast(tot.column("sh_count"), pa.int64()),
            }
        )
        j = t.join(t, keys=["sh"], join_type="inner", right_suffix="_r")
        j = j.filter(pc.less(j.column("source"), j.column("source_r")))
        pr = j.group_by(["source", "source_r"]).aggregate([("sh", "count")])
        pair_rows = pa.table(
            {
                "source_a": pr.column("source"),
                "source_b": pr.column("source_r"),
                "n": pc.cast(pr.column("sh_count"), pa.int64()),
            }
        )
        return pa.concat_tables([totals, pair_rows])

    partials = relops.bucketed_groupby(
        pairs, ["sh"], bucket_overlap, empty=empty_partial
    ).to_pandas()

    tot = (
        partials[partials.source_b.isna()]
        .groupby("source_a", as_index=False)["n"].sum()
        .set_index("source_a")["n"]
    )
    pr = (
        partials[partials.source_b.notna()]
        .groupby(["source_a", "source_b"], as_index=False)["n"].sum()
        .sort_values(["source_a", "source_b"])
        .reset_index(drop=True)
    )
    na = tot.reindex(pr.source_a).to_numpy(np.int64)
    nb = tot.reindex(pr.source_b).to_numpy(np.int64)
    inter = pr.n.to_numpy(np.int64)
    jac = round_away(inter.astype(np.float64) / (na + nb - inter), 4)
    return pa.table(
        {
            "source_a": pa.array(pr.source_a, pa.string()),
            "source_b": pa.array(pr.source_b, pa.string()),
            "n_a": pa.array(na, pa.int64()),
            "n_b": pa.array(nb, pa.int64()),
            "n_common": pa.array(inter, pa.int64()),
            "jaccard": pa.array(jac, pa.float64()),
        }
    )


SOURCE_OVERLAP_SQL = """
WITH ws AS (SELECT doc_id, source, string_split(text,' ') AS w FROM documents),
sh AS (SELECT DISTINCT source, w[i]||' '||w[i+1]||' '||w[i+2] AS g
       FROM ws, UNNEST(range(1, len(w) - 1)) AS t(i)),
tot AS (SELECT source, count(*) AS n FROM sh GROUP BY source),
pairs AS (SELECT a.source AS sa, b.source AS sb, count(*) AS inter
          FROM sh a JOIN sh b ON a.g = b.g AND a.source < b.source GROUP BY 1, 2)
SELECT sa AS source_a, sb AS source_b, ta.n AS n_a, tb.n AS n_b,
       CAST(inter AS BIGINT) AS n_common,
       round(CAST(inter AS DOUBLE) / (ta.n + tb.n - inter), 4) AS jaccard
FROM pairs JOIN tot ta ON ta.source = sa JOIN tot tb ON tb.source = sb
"""


def dsir_weights_documents(sf_dir: str, target_source: str = "src0"):
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every document
    by its log-likelihood ratio under a TARGET-domain unigram LM (docs of
    one source) vs the RAW-corpus LM, add-one smoothing over the shared
    corpus vocabulary. Selection for a target mix is then just a
    filter/top-quota over the weight column (see
    ``mixture_sample_documents`` for the quota machinery). Scale shape:
    both LMs are vocabulary-sized (word, count) tables from per-batch
    combiner partials; the target LM reuses the same pass with a
    predicate-pushed source filter; both broadcast once via ``ray.put``
    and the scoring pass is doc-local — NO corpus shuffle."""
    ds = scan(sf_dir, "documents", columns=["doc_id", "text"])

    def count_partial(batch: pa.Table) -> pa.Table:
        _, flat, _ = _exploded_words(batch)
        t = pa.table({"word": flat})
        return t.group_by(["word"]).aggregate([("word", "count")])

    raw = (
        relops.coalesce_partials(
            ds.map_batches(count_partial, batch_format="pyarrow", zero_copy_batch=True)
        )
        .groupby("word")
        .aggregate(Sum("word_count", alias_name="n"))
        .to_pandas()  # vocabulary-sized
    )
    tgt_ds = scan(
        sf_dir, "documents", columns=["doc_id", "text"],
        filter=(pc.field("source") == target_source),
    )
    tgt = (
        relops.coalesce_partials(
            tgt_ds.map_batches(count_partial, batch_format="pyarrow", zero_copy_batch=True)
        )
        .groupby("word")
        .aggregate(Sum("word_count", alias_name="n"))
        .to_pandas()
    )
    vocab = len(raw)  # shared vocabulary: every corpus word
    total_raw = int(raw["n"].sum())
    total_tgt = int(tgt["n"].sum())
    raw_ref = ray.put(dict(zip(raw["word"].tolist(), raw["n"].astype(np.int64).tolist())))
    tgt_ref = ray.put(dict(zip(tgt["word"].tolist(), tgt["n"].astype(np.int64).tolist())))

    def score(batch: pa.Table) -> pa.Table:
        raw_lm, tgt_lm = ray.get(raw_ref), ray.get(tgt_ref)
        parent, flat, _ = _exploded_words(batch)
        w = pd.Series(flat.to_pandas())
        nr = w.map(raw_lm).to_numpy(np.float64)  # every corpus word is in raw
        nt = w.map(tgt_lm).fillna(0.0).to_numpy(np.float64)
        lr = np.log((nt + 1.0) / float(total_tgt + vocab)) - np.log(
            (nr + 1.0) / float(total_raw + vocab)
        )
        g = pd.DataFrame({"doc_id": parent, "lr": lr}).groupby("doc_id")["lr"]
        out = g.sum()
        cnt = g.count()
        return pa.table(
            {
                "doc_id": pa.array(out.index.to_numpy(), pa.int64()),
                "n_words": pa.array(cnt.to_numpy(np.int64), pa.int64()),
                "logratio": round_away_arrow(pa.array(out.to_numpy(), pa.float64())),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def nb_lang_classifier_documents(sf_dir: str):
    """Distributed Naive-Bayes classifier train→apply (the CCNet /
    GPT-3-style quality/domain-classifier filtering shape): train a
    unigram NB lang model on the even-doc_id half of the corpus, score
    the held-out odd half, emit (doc_id, true_lang, pred_lang, correct).

    Determinism: every log-probability is quantized to an int64 grid
    (round(ln(p)·1e6)) BEFORE summation, so the per-doc score is an exact
    integer sum — independent of summation order on both the Ray side
    and the DuckDB twin (same trick as pagerank's quantized
    contributions). Ties break to the lexicographically smallest lang.

    Scale shape: training is ONE (lang, word)-bucketed count groupby —
    vocabulary-sized output, corpus touched once; per-lang totals fall
    out of the same table; the model broadcasts once via ``ray.put``
    (vocab × langs, the same bounded-broadcast argument as the DSIR
    LMs) and scoring is doc-local with NO corpus shuffle."""
    import math

    train = scan(
        sf_dir, "documents", columns=["doc_id", "lang", "text"],
        filter=(pc.bit_wise_and(pc.field("doc_id"), 1) == 0),
    )
    test = scan(
        sf_dir, "documents", columns=["doc_id", "lang", "text"],
        filter=(pc.bit_wise_and(pc.field("doc_id"), 1) == 1),
    )

    def count_partial(batch: pa.Table) -> pa.Table:
        _, flat, lens = _exploded_words(batch)  # lens: words per doc, reused
        lang = pa.array(
            np.repeat(batch.column("lang").to_numpy(zero_copy_only=False), lens)
        )
        t = pa.table({"lang": lang, "word": flat})
        return t.group_by(["lang", "word"]).aggregate([("word", "count")])

    counts = (
        relops.coalesce_partials(
            train.map_batches(count_partial, batch_format="pyarrow", zero_copy_batch=True)
        )
        .groupby(["lang", "word"])
        .aggregate(Sum("word_count", alias_name="c"))
        .to_pandas()  # vocabulary x langs — the broadcast model
    )

    def doc_partial(batch: pa.Table) -> pa.Table:
        return (
            pa.table({"lang": batch.column("lang")})
            .group_by(["lang"]).aggregate([("lang", "count")])
        )

    docs_per_lang = (
        relops.coalesce_partials(
            train.map_batches(doc_partial, batch_format="pyarrow", zero_copy_batch=True)
        )
        .groupby("lang")
        .aggregate(Sum("lang_count", alias_name="d"))
        .to_pandas()
    )

    langs = sorted(docs_per_lang["lang"].tolist())
    lidx = {l: i for i, l in enumerate(langs)}
    d_l = np.zeros(len(langs), np.int64)
    for l, d in zip(docs_per_lang["lang"], docs_per_lang["d"]):
        d_l[lidx[l]] = d
    big_d = int(d_l.sum())
    n_l = np.zeros(len(langs), np.int64)
    for l, c in zip(counts["lang"], counts["c"]):
        n_l[lidx[l]] += int(c)
    vocab_words = sorted(set(counts["word"].tolist()))
    widx = {w: i for i, w in enumerate(vocab_words)}
    v = len(vocab_words)

    # quantized log model: rows = vocab + 1 (last row = OOV, c=0), cols = langs
    like_q = np.empty((v + 1, len(langs)), np.int64)
    for j in range(len(langs)):
        like_q[:, j] = int(round(math.log(1.0 / (n_l[j] + v)) * 1e6))
    for l, w, c in zip(counts["lang"], counts["word"], counts["c"]):
        like_q[widx[w], lidx[l]] = int(
            round(math.log((int(c) + 1.0) / (n_l[lidx[l]] + v)) * 1e6)
        )
    prior_q = np.array(
        [int(round(math.log(d / big_d) * 1e6)) for d in d_l], np.int64
    )
    model_ref = ray.put((widx, like_q, prior_q, langs))

    def score(batch: pa.Table) -> pa.Table:
        widx_, like, prior, langs_ = ray.get(model_ref)
        _, flat, lens = _exploded_words(batch)
        oov = len(widx_)
        rows = (
            pd.Series(flat.to_pandas()).map(widx_).fillna(oov).to_numpy(np.int64)
        )  # vectorized word→model-row lookup (OOV → the c=0 row)
        starts = np.r_[0, np.cumsum(lens)]
        # per-doc integer score vectors in ONE segmented sum over the batch
        # (every doc has >= 1 token — ''.split(' ') is [''] — so no empty
        # reduceat segments)
        q = prior[None, :] + np.add.reduceat(like[rows], starts[:-1], axis=0)
        best = np.argmax(q, axis=1)  # ties -> lowest index = smallest lang
        preds = np.asarray(langs_, dtype=object)[best]
        true_lang = batch.column("lang").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "true_lang": batch.column("lang"),
                "pred_lang": pa.array(preds, pa.string()),
                "correct": pa.array(preds == true_lang),
            }
        )

    return test.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


NB_LANG_SQL = """
WITH train AS (SELECT doc_id, lang, text FROM documents WHERE doc_id % 2 = 0),
test AS (SELECT doc_id, lang, text FROM documents WHERE doc_id % 2 = 1),
ttok AS (SELECT lang, unnest(string_split(text, ' ')) AS w FROM train),
c AS (SELECT lang, w, count(*) AS c FROM ttok GROUP BY lang, w),
nl AS (SELECT lang, count(*) AS n FROM ttok GROUP BY lang),
dl AS (SELECT lang, count(*) AS d FROM train GROUP BY lang),
v AS (SELECT count(DISTINCT w) AS v FROM ttok),
bigd AS (SELECT sum(d) AS bd FROM dl),
stok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM test),
scores AS (
  SELECT s.doc_id, l.lang,
         CAST(round(ln(l.d * 1.0 / (SELECT bd FROM bigd)) * 1e6) AS BIGINT)
         + sum(CAST(round(ln((coalesce(c.c, 0) + 1.0) / (l.n + (SELECT v FROM v))) * 1e6) AS BIGINT)) AS q
  FROM stok s
  CROSS JOIN (SELECT nl.lang, nl.n, dl.d FROM nl JOIN dl USING (lang)) l
  LEFT JOIN c ON c.lang = l.lang AND c.w = s.w
  GROUP BY s.doc_id, l.lang, l.d, l.n
),
pred AS (
  SELECT doc_id, lang AS pred_lang,
         row_number() OVER (PARTITION BY doc_id ORDER BY q DESC, lang ASC) AS rn
  FROM scores
)
SELECT t.doc_id, t.lang AS true_lang, p.pred_lang,
       (t.lang = p.pred_lang) AS correct
FROM test t JOIN pred p ON p.doc_id = t.doc_id AND p.rn = 1
"""


DSIR_WEIGHTS_SQL = """
WITH ws AS (SELECT doc_id, source, unnest(string_split(text, ' ')) AS word FROM documents),
v AS (SELECT count(DISTINCT word) AS v FROM ws),
tgt AS (SELECT word, count(*) AS n FROM ws WHERE source = 'src0' GROUP BY word),
tott AS (SELECT coalesce(sum(n), 0) AS t FROM tgt),
raw AS (SELECT word, count(*) AS n FROM ws GROUP BY word),
totr AS (SELECT sum(n) AS t FROM raw)
SELECT ws.doc_id, count(*) AS n_words,
       round(sum(ln((coalesce(tgt.n, 0) + 1.0) / (tott.t + v.v))
                 - ln((raw.n + 1.0) / (totr.t + v.v))), 4) AS logratio
FROM ws LEFT JOIN tgt USING (word) JOIN raw USING (word), tott, totr, v
GROUP BY ws.doc_id
"""


#: sequence-packing window (tokens) — the training-batch assembly shape
PACK_CAP = 256


def pack_sequences_documents(sf_dir: str, cap: int = PACK_CAP, shard_docs: int = 1000):
    """Greedy sequence PACKING (training-batch assembly: concatenate docs
    into fixed-token windows, the fill-or-open-new-pack rule of T5 /
    GPT-style pretraining loaders). Deterministic and distributed: docs
    pack per (lang, shard) stream — shard = doc_id // shard_docs — in
    doc_id order; a doc longer than the cap gets a pack alone. One
    groupby((lang, shard)) shuffle of (doc_id, lang, n_tokens) triples
    (never text); each stream's greedy scan is a tiny numpy loop. Output:
    the pack assignment (pack_id unique per stream, pos_in_pack, running
    fill). Full-value-checked against a single-process python oracle
    (PYTHON_ORACLES); the same pipeline is driver-pinned over a
    deterministic corpus by ``pack_digest_smoke``."""
    return _pack_sequences_over(
        scan(sf_dir, "documents", columns=["doc_id", "lang", "text"]),
        cap,
        shard_docs,
    )


def _pack_sequences_over(ds, cap: int, shard_docs: int):
    def tok_counts(batch: pa.Table) -> pa.Table:
        toks = pc.list_value_length(pc.split_pattern(batch.column("text"), pattern=" "))
        doc = batch.column("doc_id")
        return pa.table(
            {
                "doc_id": doc,
                "lang": batch.column("lang"),
                "n_tokens": pc.cast(toks, pa.int64()),
                "shard": pc.cast(
                    pc.divide(doc, pa.scalar(shard_docs, pa.int64())), pa.int64()
                ),
            }
        )

    triples = ds.map_batches(tok_counts, batch_format="pyarrow", zero_copy_batch=True)

    def pack_stream(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        n = group.column("n_tokens").to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids, n = ids[order], n[order]
        pack = np.empty(len(ids), np.int64)
        pos = np.empty(len(ids), np.int64)
        fill = np.empty(len(ids), np.int64)
        p, cur, k = 0, 0, 0
        for i in range(len(ids)):
            if k > 0 and cur + n[i] > cap:
                p += 1
                cur, k = 0, 0
            cur += n[i]
            pack[i], pos[i], fill[i] = p, k, cur
            k += 1
        lang = group.column("lang").take(pa.array(order))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "lang": lang,
                "n_tokens": pa.array(n, pa.int64()),
                "shard": group.column("shard").take(pa.array(order)),
                "pack_id": pa.array(pack, pa.int64()),
                "pos_in_pack": pa.array(pos, pa.int64()),
                "pack_fill": pa.array(fill, pa.int64()),
            }
        )

    return triples.groupby(["lang", "shard"]).map_groups(
        pack_stream, batch_format="pyarrow"
    )


def _pack_smoke_corpus() -> pa.Table:
    """Deterministic multi-lang corpus for the driver-pinned packing run:
    word counts spread across the cap so packs genuinely open/close."""
    rng = np.random.RandomState(211)
    langs = ["en", "de", "fr"]
    texts, lang_col = [], []
    for i in range(180):
        lang_col.append(langs[i % 3])
        texts.append(" ".join(f"w{j}" for j in range(int(rng.randint(20, 400)))))
    return pa.table(
        {
            "doc_id": pa.array(np.arange(180, dtype=np.int64)),
            "lang": pa.array(lang_col, pa.string()),
            "text": pa.array(texts, pa.string()),
        }
    )


def pack_digest_smoke(sf_dir: str):
    """Driver-hashable pin of greedy sequence packing: the full
    distributed run (per-(lang, shard) streams, doc_id-ordered greedy
    fill) over a deterministic corpus, digested order-free — every
    (doc_id, lang, shard, pack_id, pos, fill) row enters a blake2b sum,
    plus direct integer sums. sf-independent like the other smoke pins."""
    import hashlib

    import ray.data

    ds = _pack_sequences_over(
        ray.data.from_arrow(_pack_smoke_corpus()), cap=512, shard_docs=50
    )

    def row_hash_sum(b: pa.Table) -> int:
        tot = 0
        for did, lang, sh, pk, pos, fill in zip(
            b.column("doc_id").to_pylist(),
            b.column("lang").to_pylist(),
            b.column("shard").to_pylist(),
            b.column("pack_id").to_pylist(),
            b.column("pos_in_pack").to_pylist(),
            b.column("pack_fill").to_pylist(),
        ):
            key = f"{did}\x1f{lang}\x1f{sh}\x1f{pk}\x1f{pos}\x1f{fill}"
            tot += int(hashlib.blake2b(key.encode()).hexdigest()[:13], 16)
        return tot

    return _feature_digest(
        ds,
        {
            "n_docs": lambda b: b.num_rows,
            "row_hash_sum": row_hash_sum,
            "sum_pack_id": lambda b: int(pc.sum(b.column("pack_id")).as_py() or 0),
            "sum_pos": lambda b: int(pc.sum(b.column("pos_in_pack")).as_py() or 0),
            "sum_fill": lambda b: int(pc.sum(b.column("pack_fill")).as_py() or 0),
        },
    )


PACK_DIGEST_SMOKE_SQL = """
SELECT CAST(t.a AS BIGINT) AS n_docs, CAST(t.b AS BIGINT) AS row_hash_sum,
       CAST(t.c AS BIGINT) AS sum_pack_id, CAST(t.d AS BIGINT) AS sum_pos,
       CAST(t.e AS BIGINT) AS sum_fill
FROM (VALUES (180, 394176363944896921, 757, 91, 57839)) t(a, b, c, d, e)
"""


def _oracle_pack_sequences(
    sf_dir: str, cap: int = PACK_CAP, shard_docs: int = 1000
) -> pa.Table:
    """Single-process reference: same greedy rule over pandas groups."""
    tbl = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang", "text"]
    ).to_pandas()
    tbl["n_tokens"] = tbl["text"].map(lambda t: len((t or "").split(" ")))
    tbl["shard"] = tbl["doc_id"] // shard_docs
    rows = []
    for (lang, shard), g in tbl.groupby(["lang", "shard"]):
        g = g.sort_values("doc_id")
        p, cur, k = 0, 0, 0
        for _, r in g.iterrows():
            if k > 0 and cur + r.n_tokens > cap:
                p += 1
                cur, k = 0, 0
            cur += r.n_tokens
            rows.append((r.doc_id, lang, r.n_tokens, shard, p, k, cur))
            k += 1
    out = pd.DataFrame(
        rows,
        columns=["doc_id", "lang", "n_tokens", "shard", "pack_id", "pos_in_pack", "pack_fill"],
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def _roundtrip_checksum(back) -> pa.Table:
    """Per-lang doc count / code-point total / doc_id checksum over a
    read-back dataset — the shared fidelity aggregate for the source/sink
    roundtrip queries (any row loss, text corruption or dtype drift in
    the roundtrip flips the hash against the parquet oracle)."""

    def partial(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if text.null_count:  # e.g. empty strings round-trip as CSV nulls
            text = pc.fill_null(text, "")
        t = pa.table(
            {
                "lang": batch.column("lang"),
                "chars": pc.cast(pc.utf8_length(text), pa.int64()),
                "doc_id": batch.column("doc_id"),
            }
        )
        g = t.group_by(["lang"]).aggregate(
            [("chars", "sum"), ("doc_id", "count"), ("doc_id", "sum")]
        )
        return g.rename_columns(["lang", "chars", "n", "idsum"])

    agg = (
        back.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang")
        .aggregate(
            Sum("chars", alias_name="total_chars"),
            Sum("n", alias_name="n_docs"),
            Sum("idsum", alias_name="sum_doc_id"),
        )
        .to_pandas()  # lang-count-sized
    )
    agg = agg.sort_values("lang").reset_index(drop=True)
    return pa.table(
        {
            "lang": pa.array(agg.lang, pa.string()),
            "n_docs": pa.array(agg.n_docs.to_numpy(np.int64), pa.int64()),
            "total_chars": pa.array(agg.total_chars.to_numpy(np.int64), pa.int64()),
            "sum_doc_id": pa.array(agg.sum_doc_id.to_numpy(np.int64), pa.int64()),
        }
    )


def jsonl_roundtrip_documents(sf_dir: str):
    """JSONL sink + source fidelity (sources/jsonl.py): stream documents
    to sharded JSON-lines (one part per block, distributed write), read
    them back through the schema-pinned JSONL source, and aggregate
    per-lang counts / code-point totals / id checksums — any row loss,
    text corruption or dtype drift in the roundtrip flips the hash
    against the ORIGINAL parquet oracle. The scratch directory holds the
    corpus once (same footprint class as any sink test); rows never pass
    through the driver in either direction."""
    import shutil
    import tempfile

    from .sources.jsonl import read_jsonl, write_jsonl

    ds = scan(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    out_dir = tempfile.mkdtemp(prefix="graft_jsonl_", dir="/tmp")
    try:
        write_jsonl(ds, out_dir)
        back = read_jsonl(
            out_dir,
            pa.schema(
                [("doc_id", pa.int64()), ("text", pa.string()), ("lang", pa.string())]
            ),
        )
        return _roundtrip_checksum(back)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


JSONL_ROUNDTRIP_SQL = """
SELECT lang, count(*) AS n_docs, sum(length(text)) AS total_chars,
       sum(doc_id) AS sum_doc_id
FROM documents GROUP BY lang
"""


def csv_roundtrip_documents(sf_dir: str):
    """CSV sink + source fidelity through Ray's native distributed CSV
    I/O (``write_csv`` → sharded parts, ``read_csv`` with pinned Arrow
    column types): the same per-lang count / code-point / id-checksum
    aggregate as the JSONL roundtrip, hashed against the ORIGINAL
    parquet oracle — quoting, escaping or dtype drift in either
    direction flips the hash. Rows never pass through the driver."""
    import shutil
    import tempfile

    from pyarrow import csv as pacsv

    ds = scan(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    out_dir = tempfile.mkdtemp(prefix="graft_csv_", dir="/tmp")
    try:
        ds.write_csv(out_dir)
        back = ray.data.read_csv(
            out_dir,
            convert_options=pacsv.ConvertOptions(
                column_types={
                    "doc_id": pa.int64(), "text": pa.string(), "lang": pa.string()
                },
                strings_can_be_null=False,
            ),
        )

        return _roundtrip_checksum(back)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def hopping_window_events(sf_dir: str, size_s: int = 3600, hop_s: int = 1800):
    """Hopping (overlapping) event-time windows — the streaming window
    shape sessions/sliding-avg don't cover: window length ``size_s``,
    hop ``hop_s`` (size = k·hop, so every event lands in exactly k
    windows). Per-batch: vectorized k-way window-start explode + local
    (window, type) partials; ONE small global groupby over
    windows × types. Window starts are epoch seconds (BIGINT) so both
    engines agree without timezone semantics."""
    ds = scan(sf_dir, "events", columns=["ts", "event_type", "value"])
    if size_s % hop_s:
        raise ValueError("size_s must be a multiple of hop_s")
    k = size_s // hop_s

    def partial(batch: pa.Table) -> pa.Table:
        ts_us = pc.cast(batch.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        slot = (ts_us // 1_000_000) // hop_s * hop_s
        starts = np.concatenate([slot - i * hop_s for i in range(k)])
        et = batch.column("event_type")
        cents = _cents(batch.column("value"), 10_000).to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "window_start_s": pa.array(starts, pa.int64()),
                "event_type": pa.concat_arrays([et.combine_chunks()] * k),
                "v_c": pa.array(np.tile(cents, k), pa.int64()),
            }
        )
        g = t.group_by(["window_start_s", "event_type"]).aggregate(
            [("v_c", "sum"), ("v_c", "count")]
        )
        return g.rename_columns(["window_start_s", "event_type", "v_c", "n"])

    agg = relops.coalesce_partials(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    ).groupby(["window_start_s", "event_type"]).aggregate(
        Sum("v_c", alias_name="v_c"), Sum("n", alias_name="n_events")
    )
    tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    return pa.table(
        {
            "window_start_s": tbl.column("window_start_s"),
            "event_type": tbl.column("event_type"),
            "n_events": pc.cast(tbl.column("n_events"), pa.int64()),
            "total_value": pc.divide(pc.cast(tbl.column("v_c"), pa.float64()), 10_000.0),
        }
    )


HOPPING_WINDOW_SQL = """
WITH e AS (
  SELECT event_type,
         CAST(round(value * 10000) AS BIGINT) AS v_c,
         CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800 AS slot
  FROM events),
x AS (SELECT event_type, v_c, unnest([slot, slot - 1800]) AS window_start_s FROM e)
SELECT window_start_s, event_type, count(*) AS n_events,
       CAST(sum(v_c) AS DOUBLE) / 10000.0 AS total_value
FROM x GROUP BY window_start_s, event_type
"""


def _apply_merges(symbols: list[str], merges: list[tuple[str, str]]) -> list[str]:
    """Apply learned BPE merges in rank order (Sennrich et al. 2016
    apply rule: each merge greedily collapses every adjacent occurrence
    left-to-right before the next rank)."""
    for left, right in merges:
        if len(symbols) < 2:
            break
        out = []
        i = 0
        while i < len(symbols):
            if i + 1 < len(symbols) and symbols[i] == left and symbols[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(symbols[i])
                i += 1
        symbols = out
    return symbols


def _bpe_pair_counts(words: list[str], counts: np.ndarray, merges) -> dict:
    acc: dict[tuple[str, str], int] = {}
    for w, c in zip(words, counts):
        syms = _apply_merges(list(w) + ["</w>"], merges)
        for a, b in zip(syms, syms[1:]):
            acc[(a, b)] = acc.get((a, b), 0) + int(c)
    return acc


def bpe_merges_documents(sf_dir: str, k: int = 8):
    """Distributed BPE tokenizer training (Sennrich et al. 2016), the
    first ``k`` merges: word frequencies come from ONE corpus groupby
    (per-batch combiner partials — the corpus text is touched exactly
    once); each merge iteration then runs over the VOCAB table only
    (map_batches pair-count partials with the merges-so-far applied, a
    symbol-pair-sized groupby, deterministic argmax: max count then
    lexicographically smallest pair). The corpus is never re-shuffled —
    iteration cost scales with vocabulary, not tokens, which is what
    makes BPE trainable at 100 TB. Full-value-checked against a
    single-process python oracle (PYTHON_ORACLES); the same pipeline is
    driver-pinned over a deterministic corpus by ``bpe_merges_smoke``."""
    return _bpe_merges_over(scan(sf_dir, "documents", columns=["doc_id", "text"]), k)


def _bpe_merges_over(ds, k: int) -> pa.Table:
    def count_partial(batch: pa.Table) -> pa.Table:
        _, flat, _ = _exploded_words(batch)
        t = pa.table({"word": flat})
        return t.group_by(["word"]).aggregate([("word", "count")])

    vocab = relops.coalesce_partials(
        ds.map_batches(count_partial, batch_format="pyarrow", zero_copy_batch=True)
    ).groupby("word").aggregate(Sum("word_count", alias_name="n")).materialize()

    merges: list[tuple[str, str]] = []
    rows = []
    for rank in range(k):
        cur = tuple(merges)

        def pair_partial(batch: pa.Table, _m=cur) -> pa.Table:
            acc = _bpe_pair_counts(
                batch.column("word").to_pylist(),
                batch.column("n").to_numpy(zero_copy_only=False),
                _m,
            )
            if not acc:
                return pa.table(
                    {
                        "left": pa.array([], pa.string()),
                        "right": pa.array([], pa.string()),
                        "c": pa.array([], pa.int64()),
                    }
                )
            ks = list(acc)
            return pa.table(
                {
                    "left": pa.array([a for a, _ in ks], pa.string()),
                    "right": pa.array([b for _, b in ks], pa.string()),
                    "c": pa.array([acc[p] for p in ks], pa.int64()),
                }
            )

        pairs = (
            vocab.map_batches(pair_partial, batch_format="pyarrow", zero_copy_batch=True)
            .groupby(["left", "right"])
            .aggregate(Sum("c", alias_name="n"))
            .to_pandas()  # symbol-pair-sized
        )
        if pairs.empty:
            break
        best = pairs.sort_values(
            ["n", "left", "right"], ascending=[False, True, True]
        ).iloc[0]
        merges.append((best.left, best.right))
        rows.append((rank, best.left, best.right, int(best.n)))

    return pa.table(
        {
            "rank": pa.array([r[0] for r in rows], pa.int64()),
            "left": pa.array([r[1] for r in rows], pa.string()),
            "right": pa.array([r[2] for r in rows], pa.string()),
            "pair_count": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


def _bpe_smoke_corpus() -> pa.Table:
    """Deterministic Zipf-ish corpus for the driver-pinned BPE run:
    repeated words with shared prefixes/suffixes so the first merges are
    linguistically meaningful (and stable by the integer-count argmax)."""
    rng = np.random.RandomState(101)
    lexicon = [
        "lower", "lowest", "newer", "newest", "wider", "widest",
        "low", "new", "wide", "running", "runner", "run",
        "extract", "extraction", "extracted", "pipeline", "pipelines",
    ]
    probs = np.array([1.0 / (i + 1) for i in range(len(lexicon))])
    probs /= probs.sum()
    texts = [
        " ".join(rng.choice(lexicon, size=int(rng.randint(6, 18)), p=probs))
        for _ in range(160)
    ]
    return pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        }
    )


def bpe_merges_smoke(sf_dir: str):
    """Driver-hashable pin of distributed BPE training: the SAME pipeline
    as bpe_merges_documents (one corpus groupby, vocab-sized merge
    iterations, deterministic integer-count argmax) over a deterministic
    in-repo corpus — every merge row (rank, pair, count) pinned by the
    VALUES twin. sf-independent like the multimodal fixtures."""
    import ray.data

    return _bpe_merges_over(ray.data.from_arrow(_bpe_smoke_corpus()), 8)


BPE_MERGES_SMOKE_SQL = """
SELECT CAST(t.r AS BIGINT) AS "rank", t.l AS "left", t.rr AS "right",
       CAST(t.c AS BIGINT) AS pair_count
FROM (VALUES
  (0, 'w', 'e', 1096),
  (1, 'l', 'o', 867),
  (2, 'r', '</w>', 829),
  (3, 'lo', 'we', 802),
  (4, 't', '</w>', 535),
  (5, 'lowe', 'r</w>', 523),
  (6, 's', 't</w>', 503),
  (7, 'n', 'e', 475)
) t(r, l, rr, c)
"""


def _oracle_bpe(sf_dir: str, k: int = 8) -> pa.Table:
    """Single-process reference: same counts, same tie-break."""
    tbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["text"])
    wc: dict[str, int] = {}
    for t in tbl.column("text").to_pylist():
        for w in (t or "").split(" "):
            wc[w] = wc.get(w, 0) + 1
    words = list(wc)
    counts = np.array([wc[w] for w in words], np.int64)
    merges: list[tuple[str, str]] = []
    rows = []
    for rank in range(k):
        acc = _bpe_pair_counts(words, counts, merges)
        if not acc:
            break
        best = min(acc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append(best[0])
        rows.append((rank, best[0][0], best[0][1], best[1]))
    return pa.table(
        {
            "rank": pa.array([r[0] for r in rows], pa.int64()),
            "left": pa.array([r[1] for r in rows], pa.string()),
            "right": pa.array([r[2] for r in rows], pa.string()),
            "pair_count": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


def bpe_encode_documents(sf_dir: str, k: int = 8):
    """Tokenizer APPLY: encode every document with the k learned BPE
    merges (completing the train→encode story of
    ``bpe_merges_documents``). Output per doc: the BPE token count and an
    md5 digest of the full token sequence — the digest pins the entire
    encoding, so the full-value python-oracle check fails on any
    divergence in merge order, word splitting or end-of-word handling.
    Scale shape: training iterates over the vocab table only (see
    bpe_merges_documents); the k-merge list is broadcast once via
    ray.put and the corpus is encoded in ONE map_batches pass with a
    per-batch word→tokens memo (words repeat heavily, so the apply cost
    is ~vocab-sized per batch, not token-sized)."""
    import hashlib

    merges_tbl = bpe_merges_documents(sf_dir, k)
    merges = list(
        zip(merges_tbl.column("left").to_pylist(), merges_tbl.column("right").to_pylist())
    )
    merges_ref = ray.put(merges)
    ds = scan(sf_dir, "documents", columns=["doc_id", "text"])

    def encode(batch: pa.Table) -> pa.Table:
        m = ray.get(merges_ref)  # zero-copy plasma, µs once worker-local
        memo: dict[str, list[str]] = {}
        n_out = np.empty(batch.num_rows, np.int64)
        digests = []
        for i, t in enumerate(batch.column("text").to_pylist()):
            toks: list[str] = []
            for w in (t or "").split(" "):
                got = memo.get(w)
                if got is None:
                    got = memo[w] = _apply_merges(list(w) + ["</w>"], m)
                toks.extend(got)
            n_out[i] = len(toks)
            digests.append(hashlib.md5(" ".join(toks).encode()).hexdigest()[:16])
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_bpe_tokens": pa.array(n_out, pa.int64()),
                "token_digest": pa.array(digests, pa.string()),
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow", zero_copy_batch=True)


def bpe_encode_smoke(sf_dir: str):
    """Driver-hashable pin of the BPE train→encode story end-to-end: the
    distributed merge training AND the broadcast-merges encode pass both
    run over the deterministic corpus; the digest sums every per-doc
    token count and the md5 of every full token sequence. Any divergence
    in merge order, word splitting, end-of-word handling or the memoized
    apply flips a column."""
    import ray.data

    corpus = _bpe_smoke_corpus()
    merges_tbl = _bpe_merges_over(ray.data.from_arrow(corpus), 8)
    merges = list(
        zip(merges_tbl.column("left").to_pylist(), merges_tbl.column("right").to_pylist())
    )
    merges_ref = ray.put(merges)
    ds = ray.data.from_arrow(corpus)

    def encode(batch: pa.Table) -> pa.Table:
        import hashlib

        m = ray.get(merges_ref)
        memo: dict[str, list[str]] = {}
        n_out = np.empty(batch.num_rows, np.int64)
        digests = []
        for i, t in enumerate(batch.column("text").to_pylist()):
            toks: list[str] = []
            for w in (t or "").split(" "):
                got = memo.get(w)
                if got is None:
                    got = memo[w] = _apply_merges(list(w) + ["</w>"], m)
                toks.extend(got)
            n_out[i] = len(toks)
            digests.append(hashlib.md5(" ".join(toks).encode()).hexdigest()[:16])
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_bpe_tokens": pa.array(n_out, pa.int64()),
                "token_digest": pa.array(digests, pa.string()),
            }
        )

    out = ds.map_batches(encode, batch_format="pyarrow", zero_copy_batch=True)
    return _feature_digest(
        out,
        {
            "n_docs": lambda b: b.num_rows,
            "sum_bpe_tokens": lambda b: int(
                pc.sum(b.column("n_bpe_tokens")).as_py() or 0
            ),
            "digest_sum": lambda b: sum(
                int(h[:13], 16) for h in b.column("token_digest").to_pylist()
            ),
        },
    )


BPE_ENCODE_SMOKE_SQL = """
SELECT CAST(t.a AS BIGINT) AS n_docs, CAST(t.b AS BIGINT) AS sum_bpe_tokens,
       CAST(t.c AS BIGINT) AS digest_sum
FROM (VALUES (160, 6118, 363953529841996750)) t(a, b, c)
"""


def _oracle_bpe_encode(sf_dir: str, k: int = 8) -> pa.Table:
    """Single-process reference: oracle-trained merges + the same
    per-word greedy apply and digesting."""
    import hashlib

    mt = _oracle_bpe(sf_dir, k)
    merges = list(zip(mt.column("left").to_pylist(), mt.column("right").to_pylist()))
    tbl = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    memo: dict[str, list[str]] = {}
    n_out, digests = [], []
    for t in tbl.column("text").to_pylist():
        toks: list[str] = []
        for w in (t or "").split(" "):
            got = memo.get(w)
            if got is None:
                got = memo[w] = _apply_merges(list(w) + ["</w>"], merges)
            toks.extend(got)
        n_out.append(len(toks))
        digests.append(hashlib.md5(" ".join(toks).encode()).hexdigest()[:16])
    return pa.table(
        {
            "doc_id": tbl.column("doc_id"),
            "n_bpe_tokens": pa.array(n_out, pa.int64()),
            "token_digest": pa.array(digests, pa.string()),
        }
    )


def chunk_documents(sf_dir: str, size: int = 200, step: int = 150):
    """Overlapping-window document CHUNKING (RAG / context-window prep:
    fixed-size character windows, 50-char overlap, offsets preserved so
    chunks map back to source spans). The 1→many explode runs inside
    map_batches (rows out ≈ chars/step × rows in — Ray's streaming
    executor re-blocks the amplified output, nothing accumulates on the
    driver); empty docs still yield one empty chunk so every doc_id
    survives the transform."""
    ds = scan(sf_dir, "documents", columns=["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        n_chunks = np.array(
            [max(1, -(-len(t or "") // step) if (t or "") else 1) for t in texts],
            np.int64,
        )
        # starts 0, step, 2·step, … while start < len (one chunk when empty)
        doc_rep = np.repeat(ids, n_chunks)
        idx = np.concatenate([np.arange(k, dtype=np.int64) for k in n_chunks])
        starts = idx * step
        chunks: list[str] = []
        ends = np.empty(len(starts), np.int64)
        p = 0
        for t, k in zip(texts, n_chunks):
            t = t or ""
            for i in range(k):
                s = i * step
                chunks.append(t[s : s + size])
                ends[p] = min(s + size, len(t))
                p += 1
        return pa.table(
            {
                "doc_id": pa.array(doc_rep, pa.int64()),
                "chunk_idx": pa.array(idx, pa.int64()),
                "start": pa.array(starts, pa.int64()),
                "chunk_end": pa.array(ends, pa.int64()),
                "chunk_text": pa.array(chunks, pa.string()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


CHUNK_DOCUMENTS_SQL = """
WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
c AS (SELECT doc_id, text, n, unnest(range(0, greatest(n, 1), 150)) AS start FROM d)
SELECT doc_id, CAST(start / 150 AS BIGINT) AS chunk_idx, start,
       least(start + 200, n) AS chunk_end,
       substr(text, CAST(start + 1 AS BIGINT), 200) AS chunk_text
FROM c
"""


def role_bigram_transcripts(sf_dir: str):
    """Turn-taking structure of the flagship transcripts table: corpus
    counts of role→role transitions between consecutive turns of each
    conversation (the conversation-shape signal agent-trace curation
    filters on). One conv-bucketed shuffle of (conv_id, turn_idx, role)
    triples; each bucket dedups exact turn repeats (the raw feed carries
    them — role is functionally turn-dependent), lexsorts its convs once
    and counts transitions vectorized; the final groupby is
    roles²-sized."""
    ds = relops.scan_path(
        _transcripts_path(sf_dir), columns=["conv_id", "turn_idx", "role"]
    )

    empty = pa.table(
        {
            "prev_role": pa.array([], pa.string()),
            "role": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }
    )

    def bucket_fn(group: pa.Table) -> pa.Table:
        t = group.group_by(["conv_id", "turn_idx", "role"]).aggregate([])
        conv = pd.factorize(t.column("conv_id").to_pandas())[0]
        turn = t.column("turn_idx").to_numpy(zero_copy_only=False)
        order = np.lexsort((turn, conv))
        conv = conv[order]
        roles = t.column("role").to_pandas().to_numpy()[order]
        same = conv[1:] == conv[:-1]
        if not same.any():
            return empty
        df = pd.DataFrame({"prev_role": roles[:-1][same], "role": roles[1:][same]})
        g = df.groupby(["prev_role", "role"], as_index=False).size()
        return pa.table(
            {
                "prev_role": pa.array(g.prev_role, pa.string()),
                "role": pa.array(g.role, pa.string()),
                "n": pa.array(g["size"].to_numpy(np.int64), pa.int64()),
            }
        )

    partials = relops.bucketed_groupby(ds, ["conv_id"], bucket_fn, empty=empty)
    agg = partials.groupby(["prev_role", "role"]).aggregate(Sum("n", alias_name="n"))
    tbl = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    idx = tbl.schema.get_field_index("n")
    return tbl.set_column(idx, "n", pc.cast(tbl.column("n"), pa.int64()))


def _transcripts_sql_source(sf_dir: str | None) -> str:
    """read_parquet-able path for the fixture at this sf: the bench-size
    fixture is a DIRECTORY of shards (smoke/correctness are single
    files), and DuckDB needs the glob spelled out."""
    from .sources.fixtures import transcripts_path_for

    size = _sf_to_fixture_size(sf_dir) if sf_dir else "correctness"
    path = transcripts_path_for(size)
    return f"{path}/*.parquet" if os.path.isdir(path) else path


def tool_usage_transcripts(sf_dir: str):
    """Tool-call profile of the agent traces: per (role, tool) distinct-
    turn counts plus each tool's share of its role's tool calls (which
    tools dominate which roles — the trace-curation signal for filtering
    degenerate tool loops). Per-batch distinct partials, one
    roles×tools-sized groupby, share computed exactly from int64 counts."""
    ds = relops.scan_path(
        _transcripts_path(sf_dir), columns=["conv_id", "turn_idx", "role", "tool"]
    )

    # distinct turns need co-location per (conv, turn) — the raw feed can
    # repeat a turn across blocks — so: per-batch local distinct, one
    # bucketed groupby on (conv_id, turn_idx) for the exact global
    # distinct, roles×tools partials folded in the same bucket pass
    pairs = ds.map_batches(
        lambda b: b.filter(
            pc.and_(pc.is_valid(b.column("tool")), pc.not_equal(b.column("tool"), ""))
        ).group_by(["conv_id", "turn_idx", "role", "tool"]).aggregate([]),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def bucket_fn(group: pa.Table) -> pa.Table:
        d = group.group_by(["conv_id", "turn_idx", "role", "tool"]).aggregate([])
        g = d.group_by(["role", "tool"]).aggregate([("conv_id", "count")])
        return g.rename_columns(["role", "tool", "n"])

    empty = pa.table(
        {
            "role": pa.array([], pa.string()),
            "tool": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }
    )
    partials = relops.bucketed_groupby(pairs, ["conv_id", "turn_idx"], bucket_fn, empty=empty)
    agg = partials.groupby(["role", "tool"]).aggregate(Sum("n", alias_name="n")).to_pandas()
    agg = agg.sort_values(["role", "tool"]).reset_index(drop=True)
    tot = agg.groupby("role")["n"].transform("sum").to_numpy(np.float64)
    from .functions.rounding import round_away

    return pa.table(
        {
            "role": pa.array(agg.role, pa.string()),
            "tool": pa.array(agg.tool, pa.string()),
            "n": pa.array(agg.n.to_numpy(np.int64), pa.int64()),
            "role_share": pa.array(
                round_away(agg.n.to_numpy(np.float64) / tot, 4), pa.float64()
            ),
        }
    )


def tool_usage_transcripts_sql(sf_dir: str | None = None) -> str:
    path = _transcripts_sql_source(sf_dir)
    return f"""
WITH t AS (SELECT DISTINCT conv_id, turn_idx, role, tool
           FROM read_parquet('{path}')
           WHERE tool IS NOT NULL AND tool <> ''),
g AS (SELECT role, tool, count(*) AS n FROM t GROUP BY role, tool)
SELECT role, tool, n,
       round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY role), 4) AS role_share
FROM g
"""


def conv_signals_transcripts(sf_dir: str):
    """Per-conversation trace-shape signals (turn counts per role,
    tool-call turns, first/last role) — the conversation-level curation
    features for filtering degenerate agent traces (e.g. tool loops,
    assistant-only fragments). Per-batch local distinct on the turn key
    collapses the feed's exact-duplicate rows, then ONE conv-bucketed
    groupby computes every signal vectorized per bucket; output is one
    row per conversation."""
    ds = relops.scan_path(
        _transcripts_path(sf_dir), columns=["conv_id", "turn_idx", "role", "tool"]
    )

    pairs = ds.map_batches(
        lambda b: b.group_by(["conv_id", "turn_idx", "role", "tool"]).aggregate([]),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    empty = pa.table(
        {
            "conv_id": pa.array([], pa.string()),
            "n_turns": pa.array([], pa.int64()),
            "n_user": pa.array([], pa.int64()),
            "n_assistant": pa.array([], pa.int64()),
            "n_tool": pa.array([], pa.int64()),
            "first_role": pa.array([], pa.string()),
            "last_role": pa.array([], pa.string()),
        }
    )

    def bucket_fn(group: pa.Table) -> pa.Table:
        d = group.group_by(["conv_id", "turn_idx", "role", "tool"]).aggregate([])
        conv = np.asarray(d.column("conv_id").to_numpy(zero_copy_only=False))
        turn = d.column("turn_idx").to_numpy(zero_copy_only=False)
        role = np.asarray(d.column("role").to_numpy(zero_copy_only=False))
        tool = d.column("tool").to_pylist()
        order = np.lexsort((turn, conv))
        conv, turn, role = conv[order], turn[order], role[order]
        tool_flag = np.asarray(
            [1 if (t is not None and t != "") else 0 for t in tool], np.int64
        )[order]
        starts = np.flatnonzero(np.r_[True, conv[1:] != conv[:-1]])
        bounds = np.r_[starts, len(conv)]
        is_user = (role == "user").astype(np.int64)
        is_asst = (role == "assistant").astype(np.int64)
        cs_u = np.r_[0, np.cumsum(is_user)]
        cs_a = np.r_[0, np.cumsum(is_asst)]
        cs_t = np.r_[0, np.cumsum(tool_flag)]
        return pa.table(
            {
                "conv_id": pa.array(conv[starts]),
                "n_turns": pa.array(bounds[1:] - bounds[:-1], pa.int64()),
                "n_user": pa.array(cs_u[bounds[1:]] - cs_u[bounds[:-1]], pa.int64()),
                "n_assistant": pa.array(cs_a[bounds[1:]] - cs_a[bounds[:-1]], pa.int64()),
                "n_tool": pa.array(cs_t[bounds[1:]] - cs_t[bounds[:-1]], pa.int64()),
                "first_role": pa.array(role[bounds[:-1]]),
                "last_role": pa.array(role[bounds[1:] - 1]),
            }
        )

    out = relops.bucketed_groupby(pairs, ["conv_id"], bucket_fn, empty=empty)
    df = out.to_pandas().sort_values("conv_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def conv_signals_transcripts_sql(sf_dir: str | None = None) -> str:
    path = _transcripts_sql_source(sf_dir)
    return f"""
WITH t AS (SELECT DISTINCT conv_id, turn_idx, role, tool FROM read_parquet('{path}'))
SELECT conv_id,
       count(*) AS n_turns,
       sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS n_user,
       sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) AS n_assistant,
       sum(CASE WHEN tool IS NOT NULL AND tool <> '' THEN 1 ELSE 0 END) AS n_tool,
       arg_min(role, turn_idx) AS first_role,
       arg_max(role, turn_idx) AS last_role
FROM t GROUP BY conv_id
"""


def _response_latency_ds(sf_dir: str):
    """Per-assistant-turn RESPONSE LATENCY over agent traces: for every
    assistant turn, microseconds since the most recent PRIOR user
    activity in the same conversation (running max of user ``ts`` —
    shift-robust even if a trace's timestamps are not strictly monotone
    in ``turn_idx``). The latency telemetry an agent-quality pipeline
    slices by model/tool mix. Shape: per-batch local distinct collapses
    the feed's exact-duplicate rows, ONE conv-bucketed shuffle
    co-locates each conversation, and the running max is a vectorized
    ``np.maximum.accumulate`` per conversation slice. Output: one row
    per assistant turn that has a prior user turn."""
    ds = relops.scan_path(
        _transcripts_path(sf_dir), columns=["conv_id", "turn_idx", "role", "ts"]
    )

    pairs = ds.map_batches(
        lambda b: b.group_by(["conv_id", "turn_idx", "role", "ts"]).aggregate([]),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    empty = pa.table(
        {
            "conv_id": pa.array([], pa.string()),
            "turn_idx": pa.array([], pa.int32()),
            "latency_us": pa.array([], pa.int64()),
        }
    )

    def bucket_fn(group: pa.Table) -> pa.Table:
        d = group.group_by(["conv_id", "turn_idx", "role", "ts"]).aggregate([])
        conv = np.asarray(d.column("conv_id").to_numpy(zero_copy_only=False))
        turn = d.column("turn_idx").to_numpy(zero_copy_only=False)
        role = np.asarray(d.column("role").to_numpy(zero_copy_only=False))
        ts_us = d.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        # ts+role tie-breakers: the fixture has unique (conv, turn) but a
        # feed with duplicate turn_idx must still order deterministically
        # (and identically to the twin's window ORDER BY)
        order = np.lexsort((role, ts_us, turn, conv))
        conv, turn, role, ts_us = conv[order], turn[order], role[order], ts_us[order]
        lo = np.iinfo(np.int64).min
        user_ts = np.where(role == "user", ts_us, lo)
        starts = np.flatnonzero(np.r_[True, conv[1:] != conv[:-1]])
        bounds = np.r_[starts, len(conv)]
        prev_user = np.empty(len(conv), np.int64)
        for s, e in zip(bounds[:-1], bounds[1:]):
            run = np.maximum.accumulate(user_ts[s:e])
            prev_user[s] = lo
            prev_user[s + 1 : e] = run[:-1]
        keep = (role == "assistant") & (prev_user != lo)
        return pa.table(
            {
                "conv_id": pa.array(conv[keep]),
                "turn_idx": pa.array(turn[keep], pa.int32()),
                "latency_us": pa.array(ts_us[keep] - prev_user[keep], pa.int64()),
            }
        )

    return relops.bucketed_groupby(pairs, ["conv_id"], bucket_fn, empty=empty)


def response_latency_transcripts(sf_dir: str):
    """Row-scale result of :func:`_response_latency_ds` (see there for
    the distributed shape), sorted for the stable driver compare."""
    out = _response_latency_ds(sf_dir)
    df = out.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def latency_percentiles_transcripts(sf_dir: str):
    """SLO percentiles of assistant response latency: EXACT p50/p90/p99
    by distributed rank selection over the row-scale latency stream —
    the conv-bucketed running-max latency kernel
    (:func:`_response_latency_ds`) composed with
    ``relops.select_quantiles`` (sampled range buckets; only the three
    rank-owning buckets ever sort). The dashboard number every agent
    deployment watches, end to end without a global sort."""
    out = _response_latency_ds(sf_dir)
    fracs = [(1, 2, "p50"), (9, 10, "p90"), (99, 100, "p99")]
    values, ranks, total = relops.select_quantiles(
        out, "latency_us", [(n, d) for n, d, _ in fracs]
    )
    return pa.table(
        {
            "pct": pa.array([lbl for _, _, lbl in fracs], pa.string()),
            "rank": pa.array(ranks, pa.int64()),
            "n": pa.array([total] * len(fracs), pa.int64()),
            "latency_us": pa.array([int(v) for v in values], pa.int64()),
        }
    )


def latency_percentiles_transcripts_sql(sf_dir: str | None = None) -> str:
    path = _transcripts_sql_source(sf_dir)
    return f"""
WITH t AS (SELECT DISTINCT conv_id, turn_idx, role, ts FROM read_parquet('{path}')),
w AS (SELECT conv_id, turn_idx, role, ts,
             max(CASE WHEN role = 'user' THEN ts END) OVER (
               PARTITION BY conv_id ORDER BY turn_idx, ts, role
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_user_ts
      FROM t),
l AS (SELECT CAST(date_diff('microsecond', prev_user_ts, ts) AS BIGINT)
        AS latency_us
      FROM w WHERE role = 'assistant' AND prev_user_ts IS NOT NULL),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM l),
f AS (SELECT * FROM (VALUES ('p50', 1, 2), ('p90', 9, 10),
                            ('p99', 99, 100)) AS f(pct, qn, qd)),
k AS (SELECT pct, CAST((qn * n.n + qd - 1) // qd AS BIGINT) AS rank, n.n
      FROM f, n),
s AS (SELECT latency_us, row_number() OVER (ORDER BY latency_us) AS rn FROM l)
SELECT k.pct, k.rank, k.n, s.latency_us
FROM k JOIN s ON s.rn = k.rank
"""


def response_latency_transcripts_sql(sf_dir: str | None = None) -> str:
    path = _transcripts_sql_source(sf_dir)
    return f"""
WITH t AS (SELECT DISTINCT conv_id, turn_idx, role, ts FROM read_parquet('{path}')),
w AS (SELECT conv_id, turn_idx, role, ts,
             max(CASE WHEN role = 'user' THEN ts END) OVER (
               PARTITION BY conv_id ORDER BY turn_idx, ts, role
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_user_ts
      FROM t)
SELECT conv_id, turn_idx,
       CAST(date_diff('microsecond', prev_user_ts, ts) AS BIGINT) AS latency_us
FROM w WHERE role = 'assistant' AND prev_user_ts IS NOT NULL
"""


def turn_enrich_skew_join_transcripts(sf_dir: str):
    """Enrich every turn with its conversation's turn count through
    ``relops.skew_join`` — the skew-hardened join exercised end to end
    on the naturally skewed key of agent traces (conversation length):
    turns of conversations longer than the hot threshold join MAP-SIDE
    against a broadcast of their counts (no shuffle partition ever owns
    a mega-conversation), short conversations go through the normal
    partitioned hash join, and the union is the result. Deterministic —
    the hot set is a pure function of the data — so the twin is
    full-value SQL."""
    ds = relops.scan_path(
        _transcripts_path(sf_dir), columns=["conv_id", "turn_idx", "role"]
    )

    pairs = ds.map_batches(
        lambda b: b.group_by(["conv_id", "turn_idx", "role"]).aggregate([]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    empty = pa.table(
        {
            "conv_id": pa.array([], pa.string()),
            "turn_idx": pa.array([], pa.int32()),
            "role": pa.array([], pa.string()),
        }
    )
    turns = relops.bucketed_groupby(
        pairs,
        ["conv_id"],
        lambda g: g.group_by(["conv_id", "turn_idx", "role"]).aggregate([]),
        empty=empty,
    )

    def _cnt_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["conv_id"]).aggregate([("turn_idx", "count")])
        return pa.table(
            {"conv_id": g.column("conv_id"), "cnt": g.column("turn_idx_count")}
        )

    counts = relops.pre_agg_groupby(
        turns.select_columns(["conv_id", "turn_idx"]),
        ["conv_id"],
        _cnt_partial,
        [Sum("cnt", alias_name="n_turns")],
    )

    # threshold 16: the fixture's long conversations take the broadcast
    # branch, the short ones the partitioned branch — both code paths in
    # one driver-hashed answer. The counts we just aggregated ARE the
    # per-key histogram, so skew_join skips its own count pre-pass.
    kc = counts.map_batches(
        lambda b: pa.table(
            {
                "conv_id": b.column("conv_id"),
                "__skew_cnt": pc.cast(b.column("n_turns"), pa.int64()),
            }
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    out = relops.skew_join(
        turns, counts, on="conv_id", hot_key_threshold=16, num_partitions=8,
        key_counts=kc,
    )

    def _finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": batch.column("conv_id"),
                "turn_idx": batch.column("turn_idx"),
                "role": batch.column("role"),
                "n_turns": pc.cast(batch.column("n_turns"), pa.int64()),
            }
        )

    df = (
        out.map_batches(_finish, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(df, preserve_index=False)


def turn_enrich_skew_join_transcripts_sql(sf_dir: str | None = None) -> str:
    path = _transcripts_sql_source(sf_dir)
    return f"""
WITH t AS (SELECT DISTINCT conv_id, turn_idx, role FROM read_parquet('{path}')),
c AS (SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns FROM t GROUP BY conv_id)
SELECT t.conv_id, t.turn_idx, t.role, c.n_turns
FROM t JOIN c USING (conv_id)
"""


def _convdup_path(sf_dir: str) -> str:
    from .sources.fixtures import convdup_path_for

    return convdup_path_for(_sf_to_fixture_size(sf_dir))


def _convdup_sql_source(sf_dir: str | None) -> str:
    from .sources.fixtures import convdup_path_for

    return convdup_path_for(_sf_to_fixture_size(sf_dir) if sf_dir else "correctness")


# DuckDB twin of convdedup._md5_prefix_i64
_V48 = "CAST(('0x' || substr(md5({expr}), 1, 12)) AS BIGINT)"
_IDENT_EXPR = (
    "turn_idx || '|' || role || '|' || coalesce(text, '') || '|' || "
    "coalesce(tool, '')"
)


def dedup_conv_exact_transcripts(sf_dir: str):
    """Exact WHOLE-CONVERSATION dedup over the duplication fixture
    (re-logged sessions): one row per conversation with its duplicate
    group's canonical id (min conv_id) and group size. Texts are hashed
    map-side into position-baked 48-bit ints and digested by an
    order-free per-conversation sum — no text bytes and no sorted
    groupby in the shuffle (stages/convdedup.py)."""
    from .stages.convdedup import conv_dedup_exact

    ds = relops.scan_path(
        _convdup_path(sf_dir),
        columns=["conv_id", "turn_idx", "role", "text", "tool"],
    )
    df = (
        conv_dedup_exact(ds)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(df, preserve_index=False)


def dedup_conv_exact_transcripts_sql(sf_dir: str | None = None) -> str:
    path = _convdup_sql_source(sf_dir)
    v = _V48.format(expr=_IDENT_EXPR)
    return f"""
WITH t AS (SELECT DISTINCT conv_id, {v} AS v FROM read_parquet('{path}')),
d AS (SELECT conv_id, sum(v) AS dg, count(*) AS n FROM t GROUP BY conv_id),
g AS (SELECT dg, n, min(conv_id) AS canonical_conv_id,
             CAST(count(*) AS BIGINT) AS group_convs
      FROM d GROUP BY dg, n)
SELECT d.conv_id, g.canonical_conv_id, g.group_convs
FROM d JOIN g USING (dg, n)
"""


def dedup_conv_keep_rows_transcripts(sf_dir: str):
    """Apply the whole-conversation dedup: the surviving distinct turn
    rows (conv_id, turn_idx, role) — only canonical conversations
    remain. The kept-id set is conversation-count-sized and attaches
    through the size-gated join (broadcast here, distributed at
    scale)."""
    from .stages.convdedup import conv_dedup_exact

    ds = relops.scan_path(
        _convdup_path(sf_dir),
        columns=["conv_id", "turn_idx", "role", "text", "tool"],
    )
    mapping = conv_dedup_exact(ds).materialize()
    kept = mapping.map_batches(
        lambda b: b.filter(
            pc.equal(b.column("conv_id"), b.column("canonical_conv_id"))
        ).select(["conv_id"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    kept = relops.drop_empty_blocks(
        kept.materialize(),
        pa.table({"conv_id": pa.array([], pa.string())}),
    )
    rows = relops.scan_path(
        _convdup_path(sf_dir), columns=["conv_id", "turn_idx", "role"]
    ).map_batches(
        lambda b: b.group_by(["conv_id", "turn_idx", "role"]).aggregate([]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    joined = relops.size_gated_join(rows, kept, on="conv_id")
    empty = pa.table(
        {
            "conv_id": pa.array([], pa.string()),
            "turn_idx": pa.array([], pa.int32()),
            "role": pa.array([], pa.string()),
        }
    )
    out = relops.bucketed_groupby(
        joined,
        ["conv_id"],
        lambda g: g.group_by(["conv_id", "turn_idx", "role"]).aggregate([]),
        empty=empty,
    )
    df = (
        out.to_pandas()
        .sort_values(["conv_id", "turn_idx", "role"])
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(df, preserve_index=False)


def dedup_conv_keep_rows_transcripts_sql(sf_dir: str | None = None) -> str:
    path = _convdup_sql_source(sf_dir)
    v = _V48.format(expr=_IDENT_EXPR)
    return f"""
WITH t AS (SELECT DISTINCT conv_id, {v} AS v FROM read_parquet('{path}')),
d AS (SELECT conv_id, sum(v) AS dg, count(*) AS n FROM t GROUP BY conv_id),
g AS (SELECT dg, n, min(conv_id) AS canon FROM d GROUP BY dg, n)
SELECT DISTINCT r.conv_id, r.turn_idx, r.role
FROM read_parquet('{path}') r JOIN g ON r.conv_id = g.canon
"""


def conv_overlap_pairs_transcripts(sf_dir: str):
    """Near-duplicate conversation PAIRS (branched/forked sessions) by
    exact Jaccard over turn-content hash sets, threshold 0.5. Candidates
    from a frequency-capped inverted index on the turn hash (cap 8 —
    boilerplate system turns generate no pairs); the verify attaches
    full hash sets through the same size-gated pair-attach path the
    document Jaccard/Levenshtein families use. Deterministic, so the
    twin re-derives candidates, cap, and the one double division
    exactly."""
    from .stages.convdedup import conv_overlap_pairs

    ds = relops.scan_path(
        _convdup_path(sf_dir), columns=["conv_id", "role", "text"]
    )
    df = (
        conv_overlap_pairs(ds, cap=8, threshold=0.5)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(df, preserve_index=False)


def conv_overlap_pairs_transcripts_sql(sf_dir: str | None = None) -> str:
    path = _convdup_sql_source(sf_dir)
    v = _V48.format(expr="role || chr(31) || coalesce(text, '')")
    return f"""
WITH t AS (SELECT DISTINCT conv_id, {v} AS v FROM read_parquet('{path}')),
hc AS (SELECT v, count(*) AS nc FROM t GROUP BY v),
cand AS (SELECT DISTINCT ta.conv_id AS a, tb.conv_id AS b
         FROM t ta JOIN t tb USING (v) JOIN hc USING (v)
         WHERE hc.nc BETWEEN 2 AND 8 AND ta.conv_id < tb.conv_id),
sz AS (SELECT conv_id, count(*) AS n FROM t GROUP BY conv_id),
sh AS (SELECT c.a, c.b, count(*) AS s
       FROM cand c
       JOIN t ta ON ta.conv_id = c.a
       JOIN t tb ON tb.conv_id = c.b AND tb.v = ta.v
       GROUP BY c.a, c.b)
SELECT sh.a, sh.b, CAST(sh.s AS BIGINT) AS shared,
       CAST(sh.s AS DOUBLE) / (za.n + zb.n - sh.s) AS jaccard
FROM sh
JOIN sz za ON za.conv_id = sh.a
JOIN sz zb ON zb.conv_id = sh.b
WHERE CAST(sh.s AS DOUBLE) / (za.n + zb.n - sh.s) >= 0.5
"""


def context_repeat_transcripts(sf_dir: str):
    """Within-conversation REPETITION analytics: for every turn with >= 3
    words, the fraction of its word-3-gram occurrences that already
    appeared in an earlier turn of the same conversation — flags agents
    re-quoting their context (the convdup fixture plants quoting turns
    in ~25% of assistant slots). Gram explosion and first-occurrence
    attribution run inside one conv-bucketed shuffle; the twin
    re-derives it with a window min over the same grams."""
    from .stages.convdedup import context_repeat

    ds = relops.scan_path(
        _convdup_path(sf_dir), columns=["conv_id", "turn_idx", "text"]
    )
    df = (
        context_repeat(ds, n=3)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(df, preserve_index=False)


def context_repeat_transcripts_sql(sf_dir: str | None = None) -> str:
    path = _convdup_sql_source(sf_dir)
    return f"""
WITH t AS (SELECT DISTINCT conv_id, turn_idx, text FROM read_parquet('{path}')),
w AS (SELECT conv_id, turn_idx,
             list_filter(regexp_split_to_array(coalesce(text, ''), '\\s+'),
                         x -> x <> '') AS words
      FROM t),
g AS (SELECT conv_id, turn_idx,
             words[i] || ' ' || words[i + 1] || ' ' || words[i + 2] AS gram
      FROM w, LATERAL (
        SELECT unnest(generate_series(1, greatest(len(words) - 2, 0))) AS i) s),
m AS (SELECT conv_id, turn_idx, gram,
             min(turn_idx) OVER (PARTITION BY conv_id, gram) AS first_turn
      FROM g)
SELECT conv_id, turn_idx,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN first_turn < turn_idx THEN 1 ELSE 0 END) AS BIGINT)
         AS n_repeat,
       CAST(sum(CASE WHEN first_turn < turn_idx THEN 1 ELSE 0 END) AS DOUBLE)
         / count(*) AS repeat_frac
FROM m GROUP BY conv_id, turn_idx
"""


def sft_spans_transcripts(sf_dir: str):
    """Training-example assembly: render each conversation as the
    standard SFT string (one ``role: text`` line per turn, in turn
    order) and emit the LOSS-MASK SPAN of every assistant turn — the
    [start, end) character offsets of that turn's text inside the
    rendered conversation, plus the rendered length. The offsets fall
    out of cumulative per-turn length sums, so the op never
    materializes a rendered string: only integer lengths shuffle. One
    conv-bucketed exchange; everything inside a bucket is vectorized
    column math (``pc.utf8_length`` matches the twin's ``length()``
    character semantics)."""
    ds = relops.scan_path(
        _transcripts_path(sf_dir), columns=["conv_id", "turn_idx", "role", "text"]
    )

    def local_lengths(b: pa.Table) -> pa.Table:
        # distinct on the FULL text, then drop it: the shuffle moves the
        # text's length and a 48-bit key, never the text itself
        b = b.set_column(
            b.column_names.index("text"), "text", pc.fill_null(b.column("text"), "")
        )
        d = b.group_by(["conv_id", "turn_idx", "role", "text"]).aggregate([])
        return pa.table(
            {
                "conv_id": d.column("conv_id"),
                "turn_idx": d.column("turn_idx"),
                "role": d.column("role"),
                "tl": pc.cast(pc.utf8_length(d.column("text")), pa.int64()),
                # tkey is INTERNAL (dropped before output): it only stands
                # in for text identity in the bucket distinct, so the
                # vectorized C siphash replaces the old per-row md5 loop
                "tkey": pa.array(
                    pd.util.hash_pandas_object(
                        d.column("text").to_pandas(), index=False
                    ).to_numpy(dtype=np.uint64).view(np.int64),
                    pa.int64(),
                ),
            }
        )

    pairs = ds.map_batches(
        local_lengths, batch_format="pyarrow", zero_copy_batch=True
    )
    empty = pa.table(
        {
            "conv_id": pa.array([], pa.string()),
            "turn_idx": pa.array([], pa.int32()),
            "start_off": pa.array([], pa.int64()),
            "end_off": pa.array([], pa.int64()),
            "conv_chars": pa.array([], pa.int64()),
        }
    )

    def bucket_fn(group: pa.Table) -> pa.Table:
        d = group.group_by(
            ["conv_id", "turn_idx", "role", "tl", "tkey"]
        ).aggregate([])
        conv = np.asarray(d.column("conv_id").to_numpy(zero_copy_only=False))
        turn = d.column("turn_idx").to_numpy(zero_copy_only=False)
        role = np.asarray(d.column("role").to_numpy(zero_copy_only=False))
        tkey = d.column("tkey").to_numpy(zero_copy_only=False)
        rl = pc.utf8_length(d.column("role")).to_numpy(zero_copy_only=False).astype(np.int64)
        tl = d.column("tl").to_numpy(zero_copy_only=False)
        # duplicate turn_idx in a dirty feed must order deterministically
        # (and identically to the twin's window ORDER BY; offsets are
        # invariant under equal-length ties, so length+key is a total
        # enough order)
        order = np.lexsort((tkey, tl, role, turn, conv))
        conv, turn, role = conv[order], turn[order], role[order]
        rl, tl = rl[order], tl[order]
        from .functions.assembly import sft_offsets

        starts = np.flatnonzero(np.r_[True, conv[1:] != conv[:-1]])
        bounds = np.r_[starts, len(conv)]
        start_off = np.empty(len(conv), np.int64)
        conv_chars = np.empty(len(conv), np.int64)
        for s, e in zip(bounds[:-1], bounds[1:]):
            start_off[s:e], conv_chars[s:e] = sft_offsets(rl[s:e], tl[s:e])
        keep = role == "assistant"
        return pa.table(
            {
                "conv_id": pa.array(conv[keep]),
                "turn_idx": pa.array(turn[keep], pa.int32()),
                "start_off": pa.array(start_off[keep], pa.int64()),
                "end_off": pa.array((start_off + tl)[keep], pa.int64()),
                "conv_chars": pa.array(conv_chars[keep], pa.int64()),
            }
        )

    out = relops.bucketed_groupby(pairs, ["conv_id"], bucket_fn, empty=empty)
    df = out.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def sft_spans_transcripts_sql(sf_dir: str | None = None) -> str:
    path = _transcripts_sql_source(sf_dir)
    return f"""
WITH t AS (SELECT DISTINCT conv_id, turn_idx, role, coalesce(text, '') AS text
           FROM read_parquet('{path}')),
w AS (SELECT conv_id, turn_idx, role, length(role) AS rl, length(text) AS tl,
             coalesce(sum(length(role) + length(text) + 3) OVER (
               PARTITION BY conv_id
               ORDER BY turn_idx, role, length(text),
                        {_V48.format(expr="text")}
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before,
             sum(length(role) + length(text) + 3) OVER (
               PARTITION BY conv_id) AS conv_chars
      FROM t)
SELECT conv_id, turn_idx,
       CAST(before + rl + 2 AS BIGINT) AS start_off,
       CAST(before + rl + 2 + tl AS BIGINT) AS end_off,
       CAST(conv_chars AS BIGINT) AS conv_chars
FROM w WHERE role = 'assistant'
"""


def context_window_transcripts(sf_dir: str, budget: int = 512):
    """Context-window assembly: keep the longest SUFFIX of each
    conversation whose total whitespace-token count fits the budget —
    the 'build the model's context from the most recent turns' op. The
    newest turn always survives, even alone over budget. Reverse
    cumulative sums per conversation bucket; only integer token counts
    shuffle, never text."""
    ds = relops.scan_path(
        _transcripts_path(sf_dir), columns=["conv_id", "turn_idx", "text"]
    )

    def local_tokens(b: pa.Table) -> pa.Table:
        txt = pc.fill_null(b.column("text"), "")
        tk = pc.add(pc.count_substring(txt, " "), 1)
        t = pa.table(
            {
                "conv_id": b.column("conv_id"),
                "turn_idx": b.column("turn_idx"),
                "tk": pc.cast(tk, pa.int64()),
            }
        )
        # exact-duplicate feed rows collapse before the shuffle
        return t.group_by(["conv_id", "turn_idx", "tk"]).aggregate([])

    pairs = ds.map_batches(local_tokens, batch_format="pyarrow", zero_copy_batch=True)
    empty = pa.table(
        {
            "conv_id": pa.array([], pa.string()),
            "turn_idx": pa.array([], pa.int32()),
            "turn_tokens": pa.array([], pa.int64()),
            "suffix_tokens": pa.array([], pa.int64()),
        }
    )
    b_budget = budget

    def bucket_fn(group: pa.Table) -> pa.Table:
        d = group.group_by(["conv_id", "turn_idx", "tk"]).aggregate([])
        conv = np.asarray(d.column("conv_id").to_numpy(zero_copy_only=False))
        turn = d.column("turn_idx").to_numpy(zero_copy_only=False)
        tk = d.column("tk").to_numpy(zero_copy_only=False)
        # newest-first within each conversation (matches ORDER BY turn_idx
        # DESC, tk in the twin; tk tie-break for dirty duplicate turn_idx)
        order = np.lexsort((tk, -turn.astype(np.int64), conv))
        conv, turn, tk = conv[order], turn[order], tk[order]
        from .functions.assembly import suffix_keep

        starts = np.flatnonzero(np.r_[True, conv[1:] != conv[:-1]])
        bounds = np.r_[starts, len(conv)]
        suffix = np.empty(len(conv), np.int64)
        keep = np.empty(len(conv), bool)
        for s, e in zip(bounds[:-1], bounds[1:]):
            keep[s:e], suffix[s:e] = suffix_keep(tk[s:e], b_budget)
        return pa.table(
            {
                "conv_id": pa.array(conv[keep]),
                "turn_idx": pa.array(turn[keep], pa.int32()),
                "turn_tokens": pa.array(tk[keep], pa.int64()),
                "suffix_tokens": pa.array(suffix[keep], pa.int64()),
            }
        )

    out = relops.bucketed_groupby(pairs, ["conv_id"], bucket_fn, empty=empty)
    df = out.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def context_window_transcripts_sql(sf_dir: str | None = None) -> str:
    path = _transcripts_sql_source(sf_dir)
    return f"""
WITH t AS (SELECT DISTINCT conv_id, turn_idx,
                  CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT) AS tk
           FROM read_parquet('{path}')),
r AS (SELECT conv_id, turn_idx, tk,
             sum(tk) OVER (PARTITION BY conv_id ORDER BY turn_idx DESC, tk
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS suffix_tokens,
             row_number() OVER (PARTITION BY conv_id
                                ORDER BY turn_idx DESC, tk) AS rn
      FROM t)
SELECT conv_id, turn_idx, tk AS turn_tokens,
       CAST(suffix_tokens AS BIGINT) AS suffix_tokens
FROM r WHERE suffix_tokens <= 512 OR rn = 1
"""


def conv_chunk_budget_transcripts(sf_dir: str, budget: int = 256):
    """Greedy conversation chunking under a token budget: walk each
    conversation's turns in order, open a new chunk whenever adding the
    next turn would push the running whitespace-token count over the
    budget (an oversize single turn gets a chunk of its own) — the
    conversation-boundary-respecting cousin of ``pack_sequences``. The
    per-bucket kernel loops once per CHUNK (searchsorted over the
    cumulative sums), never per turn; the twin re-derives the same
    greedy recurrence as a recursive CTE stepping ``row_number``."""
    ds = relops.scan_path(
        _transcripts_path(sf_dir), columns=["conv_id", "turn_idx", "text"]
    )

    def local_tokens(b: pa.Table) -> pa.Table:
        txt = pc.fill_null(b.column("text"), "")
        tk = pc.add(pc.count_substring(txt, " "), 1)
        t = pa.table(
            {
                "conv_id": b.column("conv_id"),
                "turn_idx": b.column("turn_idx"),
                "tk": pc.cast(tk, pa.int64()),
            }
        )
        return t.group_by(["conv_id", "turn_idx", "tk"]).aggregate([])

    pairs = ds.map_batches(local_tokens, batch_format="pyarrow", zero_copy_batch=True)
    empty = pa.table(
        {
            "conv_id": pa.array([], pa.string()),
            "turn_idx": pa.array([], pa.int32()),
            "chunk_id": pa.array([], pa.int64()),
            "turn_tokens": pa.array([], pa.int64()),
        }
    )
    b_budget = budget

    def bucket_fn(group: pa.Table) -> pa.Table:
        d = group.group_by(["conv_id", "turn_idx", "tk"]).aggregate([])
        conv = np.asarray(d.column("conv_id").to_numpy(zero_copy_only=False))
        turn = d.column("turn_idx").to_numpy(zero_copy_only=False)
        tk = d.column("tk").to_numpy(zero_copy_only=False)
        order = np.lexsort((tk, turn, conv))
        conv, turn, tk = conv[order], turn[order], tk[order]
        from .functions.assembly import greedy_chunk_ids

        starts = np.flatnonzero(np.r_[True, conv[1:] != conv[:-1]])
        bounds = np.r_[starts, len(conv)]
        chunk = np.empty(len(conv), np.int64)
        for s, e in zip(bounds[:-1], bounds[1:]):
            chunk[s:e] = greedy_chunk_ids(tk[s:e], b_budget)
        return pa.table(
            {
                "conv_id": pa.array(conv),
                "turn_idx": pa.array(turn, pa.int32()),
                "chunk_id": pa.array(chunk, pa.int64()),
                "turn_tokens": pa.array(tk, pa.int64()),
            }
        )

    out = relops.bucketed_groupby(pairs, ["conv_id"], bucket_fn, empty=empty)
    df = out.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def conv_chunk_budget_transcripts_sql(sf_dir: str | None = None) -> str:
    # the greedy recurrence as a per-conversation LEFT FOLD: state is a
    # plain BIGINT list [run, cid_1..cid_n] (DuckDB 1.0's list_reduce
    # mangles lists nested in struct state; a flat list folds correctly —
    # and the fold is linear per conversation, unlike a per-turn recursive
    # CTE, which re-joins the whole turn table once per iteration)
    path = _transcripts_sql_source(sf_dir)
    return f"""
WITH t AS (SELECT DISTINCT conv_id, turn_idx,
                  CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT) AS tk
           FROM read_parquet('{path}')),
lst AS (SELECT conv_id,
               list(turn_idx ORDER BY turn_idx, tk) AS turns,
               list(tk ORDER BY turn_idx, tk) AS tks
        FROM t GROUP BY conv_id),
folded AS (SELECT conv_id, turns, tks,
                  list_reduce(
                    list_transform(tks, x -> [x, CAST(0 AS BIGINT)]),
                    (acc, x) -> CASE WHEN acc[1] + x[1] > 256
                      THEN list_concat([x[1]],
                                       list_append(acc[2:], acc[len(acc)] + 1))
                      ELSE list_concat([acc[1] + x[1]],
                                       list_append(acc[2:], acc[len(acc)])) END
                  )[2:] AS cids
           FROM lst)
SELECT conv_id, turns[i] AS turn_idx, cids[i] AS chunk_id, tks[i] AS turn_tokens
FROM folded, LATERAL (SELECT unnest(generate_series(1, len(turns))) AS i) s
"""


def tool_trigrams_transcripts(sf_dir: str):
    """Tool-call SEQUENCE mining over agent traces: corpus-wide counts of
    consecutive tool-call trigrams (the tool-use patterns an agent-
    behavior analysis slices — search→browser→python etc.). Non-tool
    turns drop map-side; each conversation's tool subsequence trigrams
    pre-aggregate per bucket, so the final groupby moves (t1,t2,t3,n)
    partials — cardinality ≤ |tools|³, never turn-scale."""
    ds = relops.scan_path(
        _transcripts_path(sf_dir), columns=["conv_id", "turn_idx", "tool"]
    )

    def local_tools(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b.column("tool")),
                    pc.not_equal(b.column("tool"), ""))
        return b.filter(m).group_by(["conv_id", "turn_idx", "tool"]).aggregate([])

    pairs = ds.map_batches(local_tools, batch_format="pyarrow", zero_copy_batch=True)
    empty = pa.table(
        {
            "t1": pa.array([], pa.string()),
            "t2": pa.array([], pa.string()),
            "t3": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }
    )

    def bucket_fn(group: pa.Table) -> pa.Table:
        d = group.group_by(["conv_id", "turn_idx", "tool"]).aggregate([])
        conv = np.asarray(d.column("conv_id").to_numpy(zero_copy_only=False))
        turn = d.column("turn_idx").to_numpy(zero_copy_only=False)
        tool = np.asarray(d.column("tool").to_numpy(zero_copy_only=False))
        order = np.lexsort((tool, turn, conv))
        conv, tool = conv[order], tool[order]
        if len(conv) < 3:
            return empty
        # trigram rows: positions i, i+1, i+2 within one conversation
        same = (conv[:-2] == conv[1:-1]) & (conv[1:-1] == conv[2:])
        t1, t2, t3 = tool[:-2][same], tool[1:-1][same], tool[2:][same]
        g = pa.table(
            {"t1": pa.array(t1), "t2": pa.array(t2), "t3": pa.array(t3)}
        ).group_by(["t1", "t2", "t3"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "t1": g.column("t1"), "t2": g.column("t2"), "t3": g.column("t3"),
                "n": pc.cast(g.column("count_all"), pa.int64()),
            }
        )

    partials = relops.bucketed_groupby(pairs, ["conv_id"], bucket_fn, empty=empty)
    agg = partials.groupby(["t1", "t2", "t3"]).aggregate(Sum("n", alias_name="n"))
    df = agg.to_pandas()
    if "t1" not in df.columns:
        return empty
    df["n"] = df["n"].astype("int64")
    df = df.sort_values(["t1", "t2", "t3"]).reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def tool_trigrams_transcripts_sql(sf_dir: str | None = None) -> str:
    path = _transcripts_sql_source(sf_dir)
    return f"""
WITH t AS (SELECT DISTINCT conv_id, turn_idx, tool FROM read_parquet('{path}')
           WHERE tool IS NOT NULL AND tool <> ''),
w AS (SELECT conv_id, tool AS t1,
             lead(tool, 1) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS t2,
             lead(tool, 2) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS t3
      FROM t)
SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n
FROM w WHERE t2 IS NOT NULL AND t3 IS NOT NULL
GROUP BY t1, t2, t3
"""


def shared_boilerplate_transcripts(sf_dir: str):
    """Templated-turn detection over the duplication fixture: turn texts
    opening >= 5 distinct conversations (the shared system prompts),
    with conversation and raw-row counts. Hash-only shuffle; the flagged
    set is broadcast back over a second scan to recover the texts."""
    from .stages.convdedup import shared_turn_texts

    ds = relops.scan_path(
        _convdup_path(sf_dir), columns=["conv_id", "text"]
    )
    return shared_turn_texts(ds, min_convs=5)


def shared_boilerplate_transcripts_sql(sf_dir: str | None = None) -> str:
    path = _convdup_sql_source(sf_dir)
    v = _V48.format(expr="coalesce(text, '')")
    return f"""
WITH h AS (SELECT conv_id, text, {v} AS v FROM read_parquet('{path}')),
f AS (SELECT v, CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs,
             CAST(count(*) AS BIGINT) AS n_rows
      FROM h GROUP BY v HAVING count(DISTINCT conv_id) >= 5)
SELECT DISTINCT h.text, f.n_convs, f.n_rows
FROM h JOIN f USING (v)
"""


def role_bigram_transcripts_sql(sf_dir: str | None = None) -> str:
    path = _transcripts_sql_source(sf_dir)
    return f"""
WITH t AS (SELECT DISTINCT conv_id, turn_idx, role FROM read_parquet('{path}')),
w AS (SELECT conv_id, role,
             lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_role
      FROM t)
SELECT prev_role, role, count(*) AS n
FROM w WHERE prev_role IS NOT NULL
GROUP BY prev_role, role
"""


def split_assign_documents(sf_dir: str):
    """Deterministic train/val/test assignment by content-independent
    identity hash (the leakage-safe dataset-split step): md5 of the
    doc_id string, first-byte thresholds 'e6'/'f3' ≈ 89.8 / 4.9 / 5.3 %.
    Pure per-row map — layout-independent, reproducible on any cluster,
    NO shuffle; downstream selection is a pushed-down filter on the
    split column."""
    ds = scan(sf_dir, "documents", columns=["doc_id"])

    def assign(batch: pa.Table) -> pa.Table:
        import hashlib

        ids = batch.column("doc_id").to_pylist()
        hs = [hashlib.md5(str(i).encode()).hexdigest()[:2] for i in ids]
        split = ["train" if h < "e6" else ("val" if h < "f3" else "test") for h in hs]
        return pa.table(
            {"doc_id": batch.column("doc_id"), "split": pa.array(split, pa.string())}
        )

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


SPLIT_ASSIGN_SQL = """
SELECT doc_id,
  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'train'
       WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'f3' THEN 'val'
       ELSE 'test' END AS split
FROM documents
"""


def dedup_near_keep_best(sf_dir: str):
    """End-to-end near-dup CANONICALIZATION (the step after clustering
    that real curation pipelines ship): MinHash-LSH candidates → exact
    trigram-Jaccard ≥ 0.8 verify → connected components → keep ONE doc
    per cluster, the longest (max n_chars, tie → min doc_id), with the
    cluster size kept for audit. Cluster ids are high-cardinality, so
    the per-cluster argmax runs as one bucketed groupby (vectorized
    in-bucket sort + first-per-cluster), not per-group dispatch."""
    ds = scan(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = dedup_mod.ngram_jaccard_pairs(ds, "doc_id", "text", threshold=0.8)
    labels = dedup_mod.connected_components(pairs)
    meta = scan(sf_dir, "documents", columns=["doc_id", "n_chars"])
    with_cluster = dedup_mod.attach_cluster_ids(
        meta, labels, "doc_id", keep_columns=["n_chars"]
    )

    empty = pa.table(
        {
            "cluster_id": pa.array([], pa.int64()),
            "kept_doc_id": pa.array([], pa.int64()),
            "n_chars": pa.array([], pa.int64()),
            "cluster_size": pa.array([], pa.int64()),
        }
    )

    def bucket_best(group: pa.Table) -> pa.Table:
        cl = group.column("cluster_id").to_numpy(zero_copy_only=False)
        nc = group.column("n_chars").to_numpy(zero_copy_only=False)
        did = group.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((did, -nc, cl))
        cl, nc, did = cl[order], nc[order], did[order]
        first = np.r_[True, cl[1:] != cl[:-1]]
        sizes = np.diff(np.r_[np.flatnonzero(first), len(cl)])
        return pa.table(
            {
                "cluster_id": pa.array(cl[first], pa.int64()),
                "kept_doc_id": pa.array(did[first], pa.int64()),
                "n_chars": pa.array(nc[first], pa.int64()),
                "cluster_size": pa.array(sizes, pa.int64()),
            }
        )

    return relops.bucketed_groupby(with_cluster, ["cluster_id"], bucket_best, empty=empty)


# same cluster CTEs as MINHASH_CLUSTERS_SQL, finished with the argmax
DEDUP_KEEP_BEST_SQL = """
WITH RECURSIVE w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
),
g AS (
  SELECT doc_id,
    CASE WHEN len(words) >= 3 THEN
      list_distinct(list_transform(
        range(1, len(words) - 1),
        i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))
    ELSE [array_to_string(words, ' ')]
    END AS grams
  FROM w
),
p AS (
  SELECT a, b FROM (
    SELECT x.doc_id AS a, y.doc_id AS b,
      CAST(len(list_intersect(x.grams, y.grams)) AS DOUBLE) /
        (len(x.grams) + len(y.grams) - len(list_intersect(x.grams, y.grams))) AS j
    FROM g x JOIN g y ON x.doc_id < y.doc_id
  ) WHERE j >= 0.8
),
e AS (
  SELECT a AS src, b AS dst FROM p UNION ALL SELECT b AS src, a AS dst FROM p
),
reach AS (
  SELECT src AS node, src AS lbl FROM e
  UNION
  SELECT e.dst AS node, r.lbl AS lbl FROM reach r JOIN e ON e.src = r.node
),
c AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node),
cl AS (
  SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id, d.n_chars
  FROM documents d LEFT JOIN c ON d.doc_id = c.node
)
SELECT cluster_id, doc_id AS kept_doc_id, n_chars, cluster_size FROM (
  SELECT cluster_id, doc_id, n_chars,
         row_number() OVER (PARTITION BY cluster_id
                            ORDER BY n_chars DESC, doc_id ASC) AS rn,
         count(*) OVER (PARTITION BY cluster_id) AS cluster_size
  FROM cl
) WHERE rn = 1
"""


def curate_documents(sf_dir: str):
    """The composed end-to-end CURATION decision — the pipeline a corpus
    actually ships through, as one auditable per-doc verdict: quality
    gate (>=10 words, mean word length in [2,12]) → exact dedup (md5
    digest groups keep min doc_id) → near-dup canonicalization (verified
    trigram-Jaccard clusters keep the longest doc). Output: (doc_id,
    keep, reason) with reason = the FIRST failing stage in pipeline
    order. Scale shape: quality is per-row; exact flags come from one
    digest-bucketed groupby emitting a flag for EVERY row (no kept-set
    broadcast — the kept set is corpus-sized); near flags likewise from
    one cluster-bucketed argmax pass; the three corpus-sized flag
    columns combine through distributed joins on doc_id."""
    from .functions.hashing import md5_hex

    ds = scan(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])

    # --- stage flags -----------------------------------------------------
    def quality_and_digest(batch: pa.Table) -> pa.Table:
        n_words = pc.list_value_length(
            pc.split_pattern(batch.column("text"), pattern=" ")
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        chars = pc.utf8_length(batch.column("text")).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        mwl = (chars - (n_words - 1)) / n_words  # single-space corpus
        q = (n_words >= 10) & (mwl >= 2) & (mwl <= 12)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "digest": pa.array(md5_hex(batch.column("text").to_pylist())),
                "quality_keep": pa.array(q),
            }
        )

    qd = ds.map_batches(quality_and_digest, batch_format="pyarrow", zero_copy_batch=True)

    empty_ex = pa.table(
        {"doc_id": pa.array([], pa.int64()), "exact_keep": pa.array([], pa.bool_()),
         "quality_keep": pa.array([], pa.bool_())}
    )

    def bucket_exact(group: pa.Table) -> pa.Table:
        mins = group.group_by(["digest"]).aggregate([("doc_id", "min")])
        j = group.join(mins, keys=["digest"], join_type="inner")
        return pa.table(
            {
                "doc_id": j.column("doc_id"),
                "exact_keep": pc.equal(j.column("doc_id"), j.column("doc_id_min")),
                "quality_keep": j.column("quality_keep"),
            }
        )

    exact_flags = relops.bucketed_groupby(qd, ["digest"], bucket_exact, empty=empty_ex)

    pairs = dedup_mod.ngram_jaccard_pairs(ds, "doc_id", "text", threshold=0.8)
    labels = dedup_mod.connected_components(pairs)
    with_cluster = dedup_mod.attach_cluster_ids(
        ds.select_columns(["doc_id", "n_chars"]), labels, "doc_id",
        keep_columns=["n_chars"],
    )

    empty_nr = pa.table(
        {"nr_doc": pa.array([], pa.int64()), "near_keep": pa.array([], pa.bool_())}
    )

    def bucket_near(group: pa.Table) -> pa.Table:
        cl = group.column("cluster_id").to_numpy(zero_copy_only=False)
        nc = group.column("n_chars").to_numpy(zero_copy_only=False)
        did = group.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((did, -nc, cl))
        first = np.empty(len(cl), bool)
        first[order] = np.r_[True, cl[order][1:] != cl[order][:-1]]
        return pa.table(
            {"nr_doc": pa.array(did, pa.int64()), "near_keep": pa.array(first)}
        )

    near_flags = relops.bucketed_groupby(
        with_cluster, ["cluster_id"], bucket_near, empty=empty_nr
    )

    # --- combine ----------------------------------------------------------
    # both flag tables are corpus-sized but NARROW (~17 B/row); under the
    # byte gate the near flags broadcast and attach per batch with zero
    # shuffle (removes ~2 s of fixed hash-join cost at bench scale), above
    # it the distributed join remains the scale path
    joined = relops.size_gated_join(
        exact_flags, near_flags, on="doc_id", right_on="nr_doc", how="inner",
        num_partitions=relops.choose_num_partitions(
            relops.table_path(sf_dir, "documents")
        ),
    )

    def verdict(batch: pa.Table) -> pa.Table:
        q = batch.column("quality_keep").to_numpy(zero_copy_only=False)
        ex = batch.column("exact_keep").to_numpy(zero_copy_only=False)
        nr = batch.column("near_keep").to_numpy(zero_copy_only=False)
        reason = np.where(~q, "quality", np.where(~ex, "exact_dup", np.where(~nr, "near_dup", "")))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "keep": pa.array(q & ex & nr),
                "reason": pa.array(reason.astype(object), pa.string()),
            }
        )

    return joined.map_batches(verdict, batch_format="pyarrow", zero_copy_batch=True)


CURATE_SQL = """
WITH RECURSIVE w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
),
g AS (
  SELECT doc_id,
    CASE WHEN len(words) >= 3 THEN
      list_distinct(list_transform(
        range(1, len(words) - 1),
        i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))
    ELSE [array_to_string(words, ' ')]
    END AS grams
  FROM w
),
p AS (
  SELECT a, b FROM (
    SELECT x.doc_id AS a, y.doc_id AS b,
      CAST(len(list_intersect(x.grams, y.grams)) AS DOUBLE) /
        (len(x.grams) + len(y.grams) - len(list_intersect(x.grams, y.grams))) AS j
    FROM g x JOIN g y ON x.doc_id < y.doc_id
  ) WHERE j >= 0.8
),
e AS (SELECT a AS src, b AS dst FROM p UNION ALL SELECT b AS src, a AS dst FROM p),
reach AS (
  SELECT src AS node, src AS lbl FROM e
  UNION
  SELECT e.dst AS node, r.lbl AS lbl FROM reach r JOIN e ON e.src = r.node
),
c AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node),
cl AS (
  SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id, d.n_chars
  FROM documents d LEFT JOIN c ON d.doc_id = c.node
),
nr AS (
  SELECT doc_id,
         row_number() OVER (PARTITION BY cluster_id
                            ORDER BY n_chars DESC, doc_id ASC) = 1 AS near_keep
  FROM cl
),
ex AS (
  SELECT doc_id,
         doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS exact_keep
  FROM documents
),
q AS (
  SELECT doc_id,
         (n_words >= 10 AND mwl >= 2 AND mwl <= 12) AS quality_keep
  FROM (
    SELECT doc_id, len(string_split(text, ' ')) AS n_words,
           CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
             / len(string_split(text, ' ')) AS mwl
    FROM documents)
)
SELECT d.doc_id,
       (q.quality_keep AND ex.exact_keep AND nr.near_keep) AS keep,
       CASE WHEN NOT q.quality_keep THEN 'quality'
            WHEN NOT ex.exact_keep THEN 'exact_dup'
            WHEN NOT nr.near_keep THEN 'near_dup'
            ELSE '' END AS reason
FROM documents d
JOIN q USING (doc_id) JOIN ex USING (doc_id) JOIN nr USING (doc_id)
"""


def curation_report_documents(sf_dir: str):
    """The one-call corpus health report: the composed curation verdicts
    joined back to language and rolled up into a lang × decision matrix
    (counts + exact within-lang shares in basis points — integer, so no
    float-rounding hash risk). The per-doc verdicts come from
    :func:`curate_documents` unchanged; the lang attach is a size-gated
    join (documents' (doc_id, lang) is narrow), and the final groupby is
    langs × reasons — report-sized."""
    verdicts = curate_documents(sf_dir)
    lang_side = scan(sf_dir, "documents", columns=["doc_id", "lang"])
    # verdicts is the big streaming side; lang is narrow — broadcast it
    # under the gate (on-disk size bounds it) rather than probing blocks
    if (
        os.path.getsize(relops.table_path(sf_dir, "documents"))
        <= relops.BROADCAST_GATE_BYTES
    ):
        small = pq.read_table(
            relops.table_path(sf_dir, "documents"), columns=["doc_id", "lang"]
        )
        joined = relops.broadcast_join(verdicts, small, on="doc_id")
    else:
        joined = verdicts.join(
            lang_side, "inner",
            num_partitions=relops.choose_num_partitions(
                relops.table_path(sf_dir, "documents")
            ),
            on=("doc_id",),
        )

    def partial(batch: pa.Table) -> pa.Table:
        decision = pc.if_else(
            batch.column("keep"), pa.scalar("keep"), batch.column("reason")
        )
        t = pa.table({"lang": batch.column("lang"), "decision": decision})
        g = t.group_by(["lang", "decision"]).aggregate([("decision", "count")])
        return g.rename_columns(["lang", "decision", "n"])

    agg = (
        joined.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["lang", "decision"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # langs x decisions — report-sized
    )
    agg = agg.sort_values(["lang", "decision"]).reset_index(drop=True)
    tot = agg.groupby("lang")["n"].transform("sum").to_numpy(np.int64)
    n = agg["n"].to_numpy(np.int64)
    return pa.table(
        {
            "lang": pa.array(agg.lang, pa.string()),
            "decision": pa.array(agg.decision, pa.string()),
            "n": pa.array(n, pa.int64()),
            "share_bp": pa.array(n * 10000 // tot, pa.int64()),  # exact integer bp
        }
    )


CURATION_REPORT_SQL = (
    CURATE_SQL.rstrip()
    .replace(
        """SELECT d.doc_id,
       (q.quality_keep AND ex.exact_keep AND nr.near_keep) AS keep,
       CASE WHEN NOT q.quality_keep THEN 'quality'
            WHEN NOT ex.exact_keep THEN 'exact_dup'
            WHEN NOT nr.near_keep THEN 'near_dup'
            ELSE '' END AS reason
FROM documents d
JOIN q USING (doc_id) JOIN ex USING (doc_id) JOIN nr USING (doc_id)""",
        """, verdicts AS (
  SELECT d.doc_id, d.lang,
         CASE WHEN NOT q.quality_keep THEN 'quality'
              WHEN NOT ex.exact_keep THEN 'exact_dup'
              WHEN NOT nr.near_keep THEN 'near_dup'
              ELSE 'keep' END AS decision
  FROM documents d
  JOIN q USING (doc_id) JOIN ex USING (doc_id) JOIN nr USING (doc_id)
)
SELECT lang, decision, count(*) AS n,
       count(*) * 10000 // sum(count(*)) OVER (PARTITION BY lang) AS share_bp
FROM verdicts GROUP BY lang, decision""",
    )
)


# --------------------------------------------------------------------------
# rich-text transcript analytics: PII redaction, fenced-code-block and
# URL mining over the planted rich fixture (sources/fixtures.py). The
# redaction kernels are pyarrow RE2 — the same regex engine as DuckDB's
# regexp_* — so the twins agree by construction (functions/richtext.py).


def _rich_path(sf_dir: str) -> str:
    from .sources.fixtures import rich_path_for

    return rich_path_for(_sf_to_fixture_size(sf_dir))


def _rich_sql_source(sf_dir: str | None) -> str:
    from .sources.fixtures import rich_path_for

    return rich_path_for(_sf_to_fixture_size(sf_dir) if sf_dir else "correctness")


def _pii_chain_ctes(path: str) -> str:
    """Chained count-then-replace CTEs mirroring richtext.redact_pii:
    each pattern's count is measured against the PREVIOUS pattern's
    replacement output, exactly like the sequential Arrow kernels."""
    from .functions.richtext import PII_PATTERNS

    ctes = [
        "s0 AS (SELECT conv_id, turn_idx, text AS t FROM read_parquet('"
        + path
        + "'))"
    ]
    for i, (kind, pat, repl) in enumerate(PII_PATTERNS):
        p = pat.replace("'", "''")
        carried = "".join(f", n_{k}" for k, _, _ in PII_PATTERNS[:i])
        ctes.append(
            f"s{i + 1} AS (SELECT conv_id, turn_idx{carried}, "
            f"CAST(length(regexp_extract_all(t, '{p}')) AS BIGINT) AS n_{kind}, "
            f"regexp_replace(t, '{p}', '{repl}', 'g') AS t "
            f"FROM s{i})"
        )
    return "WITH " + ",\n".join(ctes)


def redact_pii_transcripts(sf_dir: str):
    """PII scrub over transcript turns: sequential RE2 count-then-replace
    for email / credit-card / SSN-style id / phone / IPv4 (ordered so no
    pattern half-eats another's token), returning the redacted text and
    per-kind counts for every turn that had at least one hit. Pure
    per-row vectorized map — no shuffle; at 10^12 turns this is the
    cheapest stage shape there is. Generalizes the reference's per-page
    pixel-cleanup pass (page_images.py) to text sanitization."""
    from .functions.richtext import PII_KINDS, redact_pii

    ds = relops.scan_path(
        _rich_path(sf_dir), columns=["conv_id", "turn_idx", "text"]
    )

    def scrub(batch: pa.Table) -> pa.Table:
        red, counts = redact_pii(batch.column("text"))
        total = counts[PII_KINDS[0]]
        for k in PII_KINDS[1:]:
            total = pc.add(total, counts[k])
        out = pa.table(
            {
                "conv_id": batch.column("conv_id"),
                "turn_idx": batch.column("turn_idx"),
                "text_redacted": red,
                **{f"n_{k}": counts[k] for k in PII_KINDS},
            }
        )
        return out.filter(pc.greater(total, 0))

    df = (
        ds.map_batches(scrub, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(df, preserve_index=False)


def redact_pii_transcripts_sql(sf_dir: str | None = None) -> str:
    from .functions.richtext import PII_KINDS

    n_cols = ", ".join(f"n_{k}" for k in PII_KINDS)
    total = " + ".join(f"n_{k}" for k in PII_KINDS)
    return f"""
{_pii_chain_ctes(_rich_sql_source(sf_dir))}
SELECT conv_id, turn_idx, t AS text_redacted, {n_cols}
FROM s{len(PII_KINDS)} WHERE {total} > 0
"""


def pii_stats_transcripts(sf_dir: str):
    """Corpus-level PII incidence: per kind, total matches, turns hit and
    distinct conversations hit. Per-batch partials pre-aggregate to
    (conv_id, per-kind sums) so the shuffle moves one row per
    conversation per block, never per turn."""
    from .functions.richtext import PII_KINDS, redact_pii

    ds = relops.scan_path(
        _rich_path(sf_dir), columns=["conv_id", "turn_idx", "text"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        _, counts = redact_pii(batch.column("text"))
        t = pa.table(
            {
                "conv_id": batch.column("conv_id"),
                **{f"n_{k}": counts[k] for k in PII_KINDS},
                **{
                    f"t_{k}": pc.cast(
                        pc.greater(counts[k], 0), pa.int64()
                    )
                    for k in PII_KINDS
                },
            }
        )
        aggs = [(f"n_{k}", "sum") for k in PII_KINDS] + [
            (f"t_{k}", "sum") for k in PII_KINDS
        ]
        g = t.group_by(["conv_id"]).aggregate(aggs)
        return g.rename_columns(
            ["conv_id"]
            + [f"n_{k}" for k in PII_KINDS]
            + [f"t_{k}" for k in PII_KINDS]
        )

    aggs = [Sum(f"n_{k}", alias_name=f"n_{k}") for k in PII_KINDS] + [
        Sum(f"t_{k}", alias_name=f"t_{k}") for k in PII_KINDS
    ]
    conv = (
        relops.coalesce_partials(
            ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        )
        .groupby(["conv_id"])
        .aggregate(*aggs)
        .to_pandas()
    )
    rows = []
    for k in PII_KINDS:
        rows.append(
            {
                "kind": k,
                "n_matches": int(conv[f"n_{k}"].sum()),
                "n_turns": int(conv[f"t_{k}"].sum()),
                "n_convs": int((conv[f"n_{k}"] > 0).sum()),
            }
        )
    df = pd.DataFrame(rows).sort_values("kind").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def pii_stats_transcripts_sql(sf_dir: str | None = None) -> str:
    from .functions.richtext import PII_KINDS

    n = len(PII_KINDS)
    arms = "\nUNION ALL\n".join(
        f"SELECT '{k}' AS kind, CAST(sum(n_{k}) AS BIGINT) AS n_matches, "
        f"CAST(sum(CASE WHEN n_{k} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_turns, "
        f"CAST(count(DISTINCT CASE WHEN n_{k} > 0 THEN conv_id END) AS BIGINT) "
        f"AS n_convs FROM s{n}"
        for k in PII_KINDS
    )
    return f"{_pii_chain_ctes(_rich_sql_source(sf_dir))}\n{arms}"


def code_blocks_transcripts(sf_dir: str):
    """Fenced-code-block mining over assistant turns: split each text on
    ``` (one vectorized Arrow kernel; odd segments are inside fences —
    an unclosed opening fence runs to EOF, the CommonMark rule) and
    account lang /
    line count / char count per block. The corpus-wide prefilter is a
    vectorized substring match, so fence-free turns never leave the
    scan."""
    from .functions.richtext import fenced_blocks

    ds = relops.scan_path(
        _rich_path(sf_dir), columns=["conv_id", "turn_idx", "text"]
    )

    def blocks(batch: pa.Table) -> pa.Table:
        keep = pc.match_substring(batch.column("text"), "```")
        return fenced_blocks(batch.filter(keep))

    df = (
        ds.map_batches(blocks, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx", "block_idx"])
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(df, preserve_index=False)


def code_blocks_transcripts_sql(sf_dir: str | None = None) -> str:
    path = _rich_sql_source(sf_dir)
    return f"""
WITH t AS (SELECT conv_id, turn_idx, text FROM read_parquet('{path}')
           WHERE contains(text, '```')),
p AS (SELECT conv_id, turn_idx,
             unnest(string_split(text, '```')) AS part,
             generate_subscripts(string_split(text, '```'), 1) AS ord
      FROM t),
b AS (SELECT conv_id, turn_idx, CAST((ord // 2) - 1 AS BIGINT) AS block_idx,
             part FROM p WHERE ord % 2 = 0),
c AS (SELECT conv_id, turn_idx, block_idx,
             trim(regexp_extract(part, '^([^\n]*)', 1),
                  ' ' || chr(9) || chr(13)) AS lang,
             CASE WHEN strpos(part, chr(10)) = 0 THEN ''
                  ELSE substr(part, strpos(part, chr(10)) + 1) END AS body
      FROM b)
SELECT conv_id, turn_idx, block_idx, lang,
       CASE WHEN body = '' THEN CAST(0 AS BIGINT)
            ELSE CAST(length(body) - length(replace(body, chr(10), '')) + 1
                      AS BIGINT) END AS n_lines,
       CAST(length(body) AS BIGINT) AS n_chars
FROM c
"""


def url_domains_transcripts(sf_dir: str):
    """Link mining: per domain, total URL mentions, turns containing the
    domain and distinct conversations. Texts are prefiltered with a
    vectorized substring match and reduced map-side to (domain, conv_id)
    partials — only domain-cardinality rows enter the shuffle."""
    from .functions.richtext import url_partials

    ds = relops.scan_path(
        _rich_path(sf_dir), columns=["conv_id", "turn_idx", "text"]
    )
    partials = ds.map_batches(
        url_partials, batch_format="pyarrow", zero_copy_batch=True
    )
    conv = (
        relops.coalesce_partials(partials)
        .groupby(["domain", "conv_id"])
        .aggregate(
            Sum("n_urls", alias_name="n_urls"),
            Sum("n_turns", alias_name="n_turns"),
        )
        .to_pandas()
    )
    if conv.empty:
        return pa.table(
            {
                "domain": pa.array([], pa.string()),
                "n_urls": pa.array([], pa.int64()),
                "n_turns": pa.array([], pa.int64()),
                "n_convs": pa.array([], pa.int64()),
            }
        )
    g = (
        conv.groupby("domain", as_index=False)
        .agg(n_urls=("n_urls", "sum"), n_turns=("n_turns", "sum"),
             n_convs=("conv_id", "count"))
        .sort_values("domain")
        .reset_index(drop=True)
    )
    for c in ("n_urls", "n_turns", "n_convs"):
        g[c] = g[c].astype("int64")
    return pa.Table.from_pandas(g, preserve_index=False)


def url_domains_transcripts_sql(sf_dir: str | None = None) -> str:
    from .functions.richtext import DOMAIN_PATTERN, URL_PATTERN

    path = _rich_sql_source(sf_dir)
    url_p = URL_PATTERN.replace("'", "''")
    dom_p = DOMAIN_PATTERN.replace("'", "''")
    return f"""
WITH t AS (SELECT conv_id, turn_idx,
                  unnest(regexp_extract_all(text, '{url_p}')) AS url
           FROM read_parquet('{path}')),
d AS (SELECT conv_id, turn_idx, regexp_extract(url, '{dom_p}', 1) AS domain
      FROM t),
f AS (SELECT * FROM d WHERE domain <> ''),
g AS (SELECT domain, conv_id, CAST(count(*) AS BIGINT) AS n_urls,
             CAST(count(DISTINCT turn_idx) AS BIGINT) AS n_turns
      FROM f GROUP BY domain, conv_id)
SELECT domain, CAST(sum(n_urls) AS BIGINT) AS n_urls,
       CAST(sum(n_turns) AS BIGINT) AS n_turns,
       CAST(count(*) AS BIGINT) AS n_convs
FROM g GROUP BY domain
"""


def repetition_runs_documents(sf_dir: str):
    """Degenerate-generation detector: per document, the longest run of
    CONSECUTIVE identical word tokens and the number of runs of length
    >= 2 — the classic looped-output quality signal a training-data
    filter thresholds on. Tokenization is one vectorized RE2 split
    (identical to the twin's string_split_regex); run accounting is pure
    numpy over the flattened token buffer. Per-row map, NO shuffle — the
    cheapest possible stage shape at 10^12 rows."""
    ds = scan(sf_dir, "documents", columns=["doc_id", "text"])

    def runs(batch: pa.Table) -> pa.Table:
        words = pc.split_pattern_regex(
            pc.utf8_lower(batch.column("text")), "[^a-z0-9]+"
        ).combine_chunks()
        n = batch.num_rows
        offsets = np.asarray(words.offsets)
        flat = np.asarray(words.flatten().to_numpy(zero_copy_only=False))
        parent = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
        keep = flat != ""
        w_k, parent_k = flat[keep], parent[keep]
        n_words = np.bincount(parent_k, minlength=n).astype(np.int64)
        max_run = np.zeros(n, dtype=np.int64)
        n_run2 = np.zeros(n, dtype=np.int64)
        if len(w_k):
            same = np.concatenate(
                [[False], (w_k[1:] == w_k[:-1]) & (parent_k[1:] == parent_k[:-1])]
            )
            starts = np.flatnonzero(~same)
            lengths = np.diff(np.append(starts, len(w_k))).astype(np.int64)
            run_parent = parent_k[starts]
            np.maximum.at(max_run, run_parent, lengths)
            long = lengths >= 2
            np.add.at(n_run2, run_parent[long], 1)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_words": pa.array(n_words),
                "max_run": pa.array(max_run),
                "n_run2plus": pa.array(n_run2),
            }
        )

    df = (
        ds.map_batches(runs, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(df, preserve_index=False)


REPETITION_RUNS_SQL = """
WITH s AS (SELECT doc_id, string_split_regex(lower(text), '[^a-z0-9]+') AS ws
           FROM documents),
w AS (SELECT doc_id, unnest(ws) AS word, generate_subscripts(ws, 1) AS pos
      FROM s),
f AS (SELECT * FROM w WHERE word <> ''),
g AS (SELECT doc_id, word, pos,
             pos - row_number() OVER (PARTITION BY doc_id, word ORDER BY pos)
               AS grp
      FROM f),
r AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS run
      FROM g GROUP BY doc_id, word, grp),
agg AS (SELECT doc_id, CAST(sum(run) AS BIGINT) AS n_words,
               CAST(max(run) AS BIGINT) AS max_run,
               CAST(sum(CASE WHEN run >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_run2plus
        FROM r GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(agg.n_words, 0) AS n_words,
       coalesce(agg.max_run, 0) AS max_run,
       coalesce(agg.n_run2plus, 0) AS n_run2plus
FROM documents d LEFT JOIN agg USING (doc_id)
"""


# --------------------------------------------------------------------------
# registry

def role_protocol_transcripts(sf_dir: str):
    """Agent-protocol conformance audit over transcripts: per
    conversation, how often the turn sequence breaks the expected
    shape — adjacent same-role turns, tool turns not preceded by an
    assistant turn (an orphan tool result), and a non-user opening
    turn. The data-quality gate a trace-ingest pipeline applies before
    training on agent logs. Shape: per-batch local distinct collapses
    re-logged duplicate rows, ONE conv-bucketed shuffle co-locates each
    conversation, and the transition checks are vectorized adjacent
    comparisons + ``np.add.reduceat`` over conversation slices."""
    ds = relops.scan_path(
        _transcripts_path(sf_dir), columns=["conv_id", "turn_idx", "role", "ts"]
    )

    pairs = ds.map_batches(
        lambda b: b.group_by(["conv_id", "turn_idx", "role", "ts"]).aggregate([]),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    empty = pa.table(
        {
            "conv_id": pa.array([], pa.string()),
            "n_turns": pa.array([], pa.int64()),
            "n_same_role_adjacent": pa.array([], pa.int64()),
            "n_orphan_tool": pa.array([], pa.int64()),
            "bad_start": pa.array([], pa.int64()),
        }
    )

    def bucket_fn(group: pa.Table) -> pa.Table:
        d = group.group_by(["conv_id", "turn_idx", "role", "ts"]).aggregate([])
        conv = np.asarray(d.column("conv_id").to_numpy(zero_copy_only=False))
        turn = d.column("turn_idx").to_numpy(zero_copy_only=False)
        role = np.asarray(d.column("role").to_numpy(zero_copy_only=False))
        ts_us = d.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((role, ts_us, turn, conv))
        conv, role = conv[order], role[order]
        n = len(conv)
        first = np.r_[True, conv[1:] != conv[:-1]]
        same = np.r_[False, (conv[1:] == conv[:-1]) & (role[1:] == role[:-1])]
        prev_assistant = np.r_[False, role[:-1] == "assistant"] & ~first
        orphan = (role == "tool") & ~prev_assistant
        starts = np.flatnonzero(first)
        bounds = np.r_[starts, n]
        return pa.table(
            {
                "conv_id": pa.array(conv[starts]),
                "n_turns": pa.array(bounds[1:] - bounds[:-1], pa.int64()),
                "n_same_role_adjacent": pa.array(
                    np.add.reduceat(same.astype(np.int64), starts), pa.int64()
                ),
                "n_orphan_tool": pa.array(
                    np.add.reduceat(orphan.astype(np.int64), starts), pa.int64()
                ),
                "bad_start": pa.array(
                    (role[starts] != "user").astype(np.int64), pa.int64()
                ),
            }
        )

    out = relops.exchange_groupby(pairs, ["conv_id"], bucket_fn, empty=empty)
    df = out.to_pandas().sort_values("conv_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def role_protocol_transcripts_sql(sf_dir: str | None = None) -> str:
    path = _transcripts_sql_source(sf_dir)
    return f"""
WITH t AS (SELECT DISTINCT conv_id, turn_idx, role, ts FROM read_parquet('{path}')),
w AS (SELECT conv_id, role,
        lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx, ts, role) AS prev_role
      FROM t)
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(sum(CASE WHEN prev_role = role THEN 1 ELSE 0 END) AS BIGINT)
         AS n_same_role_adjacent,
       CAST(sum(CASE WHEN role = 'tool'
                      AND (prev_role IS NULL OR prev_role <> 'assistant')
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan_tool,
       CAST(max(CASE WHEN prev_role IS NULL AND role <> 'user' THEN 1 ELSE 0 END)
            AS BIGINT) AS bad_start
FROM w GROUP BY conv_id
"""


def tool_latency_transcripts(sf_dir: str):
    """Per-TOOL latency attribution over agent traces: for every tool
    turn directly preceded (in turn order) by an assistant turn, the
    microseconds between the assistant's ts and the tool result's ts —
    grouped by tool into invocation count, total and mean latency. The
    per-tool telemetry an agent-ops dashboard ranks slow tools with.
    Shape: batch-local distinct, ONE conv-bucketed shuffle, vectorized
    adjacent comparison, then a per-bucket (tool, n, sum) partial — the
    final fold is tool-cardinality rows on the driver. Mean is one
    double division of exact integer sums, so it hashes stably."""
    ds = relops.scan_path(
        _transcripts_path(sf_dir), columns=["conv_id", "turn_idx", "role", "tool", "ts"]
    )

    pairs = ds.map_batches(
        lambda b: b.group_by(["conv_id", "turn_idx", "role", "tool", "ts"]).aggregate([]),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    empty = pa.table(
        {
            "tool": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            "sum_us": pa.array([], pa.int64()),
        }
    )

    def bucket_fn(group: pa.Table) -> pa.Table:
        d = group.group_by(["conv_id", "turn_idx", "role", "tool", "ts"]).aggregate([])
        conv = np.asarray(d.column("conv_id").to_numpy(zero_copy_only=False))
        turn = d.column("turn_idx").to_numpy(zero_copy_only=False)
        role = np.asarray(d.column("role").to_numpy(zero_copy_only=False))
        tool = np.asarray(d.column("tool").to_numpy(zero_copy_only=False), dtype=object)
        ts_us = d.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((role, ts_us, turn, conv))
        conv, role, tool, ts_us = conv[order], role[order], tool[order], ts_us[order]
        first = np.r_[True, conv[1:] != conv[:-1]]
        prev_assistant = np.r_[False, role[:-1] == "assistant"] & ~first
        hit = (role == "tool") & prev_assistant
        lat = np.zeros(len(conv), np.int64)
        lat[1:] = ts_us[1:] - ts_us[:-1]
        t = pa.table(
            {
                "tool": pa.array(tool[hit].tolist(), pa.string()),
                "lat": pa.array(lat[hit], pa.int64()),
            }
        )
        g = t.group_by(["tool"]).aggregate([("lat", "count"), ("lat", "sum")])
        return pa.table(
            {
                "tool": g.column("tool"),
                "n": pc.cast(g.column("lat_count"), pa.int64()),
                "sum_us": pc.cast(g.column("lat_sum"), pa.int64()),
            }
        )

    partials = relops.exchange_groupby(pairs, ["conv_id"], bucket_fn, empty=empty)
    df = partials.to_pandas().groupby("tool", as_index=False).sum()  # tool-cardinality
    from .functions.rounding import round_away

    df = df.sort_values("tool").reset_index(drop=True)
    n = df["n"].to_numpy(np.int64)
    s = df["sum_us"].to_numpy(np.int64)
    return pa.table(
        {
            "tool": pa.array(df["tool"].tolist(), pa.string()),
            "n": pa.array(n, pa.int64()),
            "sum_us": pa.array(s, pa.int64()),
            "mean_us": pa.array(
                round_away(s.astype(np.float64) / n.astype(np.float64), 4), pa.float64()
            ),
        }
    )


def tool_latency_transcripts_sql(sf_dir: str | None = None) -> str:
    path = _transcripts_sql_source(sf_dir)
    return f"""
WITH t AS (SELECT DISTINCT conv_id, turn_idx, role, tool, ts FROM read_parquet('{path}')),
w AS (SELECT conv_id, role, tool, ts,
        lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx, ts, role) AS prev_role,
        lag(ts)   OVER (PARTITION BY conv_id ORDER BY turn_idx, ts, role) AS prev_ts
      FROM t)
SELECT tool, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(date_diff('microsecond', prev_ts, ts)) AS BIGINT) AS sum_us,
       round(CAST(sum(date_diff('microsecond', prev_ts, ts)) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 4) AS mean_us
FROM w WHERE role = 'tool' AND prev_role = 'assistant'
GROUP BY tool
"""


def curate_conversations_transcripts(sf_dir: str):
    """Conversation-level CURATION composition over agent traces — the
    transcripts analog of ``curate_documents``: re-logged rows collapse,
    then conversation gates fire in one pass (well-formed opening, no
    orphan tool results, at least one assistant turn, 2..500 turns), and
    the survivors come back with their stats. ONE conv-bucketed shuffle
    computes every gate signal vectorized (the role_protocol adjacency
    pass extended with role counts); the filter is a pure predicate on
    the per-conv row, so the twin composes the same gates in SQL."""
    ds = relops.scan_path(
        _transcripts_path(sf_dir), columns=["conv_id", "turn_idx", "role", "ts"]
    )

    pairs = ds.map_batches(
        lambda b: b.group_by(["conv_id", "turn_idx", "role", "ts"]).aggregate([]),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    empty = pa.table(
        {
            "conv_id": pa.array([], pa.string()),
            "n_turns": pa.array([], pa.int64()),
            "n_user": pa.array([], pa.int64()),
            "n_assistant": pa.array([], pa.int64()),
        }
    )

    def bucket_fn(group: pa.Table) -> pa.Table:
        d = group.group_by(["conv_id", "turn_idx", "role", "ts"]).aggregate([])
        conv = np.asarray(d.column("conv_id").to_numpy(zero_copy_only=False))
        turn = d.column("turn_idx").to_numpy(zero_copy_only=False)
        role = np.asarray(d.column("role").to_numpy(zero_copy_only=False))
        ts_us = d.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((role, ts_us, turn, conv))
        conv, role = conv[order], role[order]
        n = len(conv)
        first = np.r_[True, conv[1:] != conv[:-1]]
        prev_assistant = np.r_[False, role[:-1] == "assistant"] & ~first
        orphan = (role == "tool") & ~prev_assistant
        starts = np.flatnonzero(first)
        bounds = np.r_[starts, n]
        n_turns = bounds[1:] - bounds[:-1]
        n_user = np.add.reduceat((role == "user").astype(np.int64), starts)
        n_assistant = np.add.reduceat((role == "assistant").astype(np.int64), starts)
        n_orphan = np.add.reduceat(orphan.astype(np.int64), starts)
        good_start = role[starts] == "user"
        keep = (
            good_start
            & (n_orphan == 0)
            & (n_assistant >= 1)
            & (n_turns >= 2)
            & (n_turns <= 500)
        )
        return pa.table(
            {
                "conv_id": pa.array(conv[starts][keep]),
                "n_turns": pa.array(n_turns[keep], pa.int64()),
                "n_user": pa.array(n_user[keep], pa.int64()),
                "n_assistant": pa.array(n_assistant[keep], pa.int64()),
            }
        )

    out = relops.exchange_groupby(pairs, ["conv_id"], bucket_fn, empty=empty)
    df = out.to_pandas().sort_values("conv_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def curate_conversations_transcripts_sql(sf_dir: str | None = None) -> str:
    path = _transcripts_sql_source(sf_dir)
    return f"""
WITH t AS (SELECT DISTINCT conv_id, turn_idx, role, ts FROM read_parquet('{path}')),
w AS (SELECT conv_id, role,
        lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx, ts, role) AS prev_role
      FROM t),
s AS (SELECT conv_id,
        count(*) AS n_turns,
        sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS n_user,
        sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) AS n_assistant,
        sum(CASE WHEN role = 'tool'
                  AND (prev_role IS NULL OR prev_role <> 'assistant')
                 THEN 1 ELSE 0 END) AS n_orphan,
        max(CASE WHEN prev_role IS NULL AND role <> 'user' THEN 1 ELSE 0 END)
          AS bad_start
      FROM w GROUP BY conv_id)
SELECT conv_id, CAST(n_turns AS BIGINT) AS n_turns,
       CAST(n_user AS BIGINT) AS n_user,
       CAST(n_assistant AS BIGINT) AS n_assistant
FROM s
WHERE bad_start = 0 AND n_orphan = 0 AND n_assistant >= 1
  AND n_turns BETWEEN 2 AND 500
"""


def role_vocab_divergence_transcripts(sf_dir: str):
    """Distinctive-vocabulary signal over transcripts: per word, its
    count in user turns vs assistant turns plus the add-one-smoothed
    log-likelihood ratio ln(p_user(w)/p_assistant(w)) — the classic
    'which words characterize each side of the dialogue' statistic a
    corpus audit slices on. Shape: batch-local distinct collapses
    re-logged rows, one conv-bucketed shuffle guarantees global
    distinctness, per-bucket word×role partial counts (the second
    shuffle carries at most vocab×buckets tiny rows), and the final
    vocabulary-sized table computes the smoothed LLR driver-side in one
    vectorized expression mirroring the twin's ln()."""
    ds = relops.scan_path(
        _transcripts_path(sf_dir), columns=["conv_id", "turn_idx", "role", "text"]
    )

    def local_distinct(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_in(b.column("role"), value_set=pa.array(["user", "assistant"])))
        return b.group_by(["conv_id", "turn_idx", "role", "text"]).aggregate([])

    pairs = ds.map_batches(local_distinct, batch_format="pyarrow", zero_copy_batch=True)

    empty = pa.table(
        {
            "word": pa.array([], pa.string()),
            "cu": pa.array([], pa.int64()),
            "ca": pa.array([], pa.int64()),
        }
    )

    def bucket_fn(group: pa.Table) -> pa.Table:
        d = group.group_by(["conv_id", "turn_idx", "role", "text"]).aggregate([])
        words = pc.split_pattern(d.column("text"), pattern=" ")
        words = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
        lengths = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        role = np.asarray(d.column("role").to_numpy(zero_copy_only=False))
        t = pa.table(
            {
                "word": pc.list_flatten(words),
                "is_user": pa.array(np.repeat(role == "user", lengths)),
            }
        )
        c = t.group_by(["word", "is_user"]).aggregate([("word", "count")])
        isu = c.column("is_user").to_numpy(zero_copy_only=False)
        cnt = c.column("word_count").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "word": c.column("word"),
                "cu": pa.array(np.where(isu, cnt, 0), pa.int64()),
                "ca": pa.array(np.where(isu, 0, cnt), pa.int64()),
            }
        )

    partials = relops.exchange_groupby(pairs, ["conv_id"], bucket_fn, empty=empty)

    def word_sum(group: pa.Table) -> pa.Table:
        g = group.group_by(["word"]).aggregate([("cu", "sum"), ("ca", "sum")])
        return pa.table(
            {
                "word": g.column("word"),
                "n_user": pc.cast(g.column("cu_sum"), pa.int64()),
                "n_assistant": pc.cast(g.column("ca_sum"), pa.int64()),
            }
        )

    c = relops.exchange_groupby(
        partials, ["word"], word_sum, empty=empty.rename_columns(
            ["word", "n_user", "n_assistant"]
        )
    ).to_pandas()  # vocabulary-sized
    from .functions.rounding import round_away

    tu = int(c["n_user"].sum())
    ta = int(c["n_assistant"].sum())
    v = len(c)
    c = c.sort_values("word").reset_index(drop=True)
    cu = c["n_user"].to_numpy(np.int64)
    ca = c["n_assistant"].to_numpy(np.int64)
    llr = np.log(
        ((cu + 1).astype(np.float64) / float(tu + v))
        / ((ca + 1).astype(np.float64) / float(ta + v))
    )
    return pa.table(
        {
            "word": pa.array(c["word"].tolist(), pa.string()),
            "n_user": pa.array(cu, pa.int64()),
            "n_assistant": pa.array(ca, pa.int64()),
            "llr": pa.array(round_away(llr, 4), pa.float64()),
        }
    )


def role_vocab_divergence_transcripts_sql(sf_dir: str | None = None) -> str:
    path = _transcripts_sql_source(sf_dir)
    return f"""
WITH t AS (SELECT DISTINCT conv_id, turn_idx, role, text FROM read_parquet('{path}')
           WHERE role IN ('user', 'assistant')),
ws AS (SELECT role, unnest(string_split(text, ' ')) AS word FROM t),
c AS (SELECT word,
        count(*) FILTER (WHERE role = 'user') AS n_user,
        count(*) FILTER (WHERE role = 'assistant') AS n_assistant
      FROM ws GROUP BY word),
tot AS (SELECT sum(n_user) AS tu, sum(n_assistant) AS ta, count(*) AS v FROM c)
SELECT word, CAST(n_user AS BIGINT) AS n_user,
       CAST(n_assistant AS BIGINT) AS n_assistant,
       round(ln(((n_user + 1) / CAST(tot.tu + tot.v AS DOUBLE))
              / ((n_assistant + 1) / CAST(tot.ta + tot.v AS DOUBLE))), 4) AS llr
FROM c, tot
"""


def markdown_outline_transcripts(sf_dir: str):
    """Markdown structure mining over assistant-authored rich text:
    per-turn counts of H1 / deeper headings, bullet items, numbered
    items and blockquote lines (CommonMark 'marker + space' rule, so
    '#hash' / '-dash' near-misses don't count). One vectorized
    multiline-RE2 pass per pattern (`(?m)` anchors at line starts), no
    shuffle; DuckDB's regexp engine is the same RE2, so the twin agrees
    by construction. The outline a doc-structure-aware chunker or a
    formatting-quality filter keys on."""
    pats = {
        "n_h1": r"(?m)^# ",
        "n_h2plus": r"(?m)^#{2,6} ",
        "n_bullets": r"(?m)^[-*] ",
        "n_numbered": r"(?m)^\d+\. ",
        "n_quotes": r"(?m)^> ",
    }
    ds = relops.scan_path(_rich_path(sf_dir), columns=["conv_id", "turn_idx", "text"])

    def outline(batch: pa.Table) -> pa.Table:
        txt = batch.column("text")
        counts = {
            name: pc.cast(pc.count_substring_regex(txt, pat), pa.int64())
            for name, pat in pats.items()
        }
        # '^# ' also matches nothing deeper, but '^#{2,6} ' would count a
        # '### ' line once; h1 vs deeper are disjoint by construction
        total = counts["n_h1"]
        for k in list(pats)[1:]:
            total = pc.add(total, counts[k])
        out = pa.table(
            {
                "conv_id": batch.column("conv_id"),
                "turn_idx": batch.column("turn_idx"),
                **counts,
            }
        )
        return out.filter(pc.greater(total, 0))

    df = (
        ds.map_batches(outline, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(df, preserve_index=False)


def markdown_outline_transcripts_sql(sf_dir: str | None = None) -> str:
    path = _rich_sql_source(sf_dir)
    return rf"""
WITH c AS (
  SELECT conv_id, turn_idx,
         CAST(len(regexp_extract_all(text, '(?m)^# ')) AS BIGINT) AS n_h1,
         CAST(len(regexp_extract_all(text, '(?m)^#{{2,6}} ')) AS BIGINT) AS n_h2plus,
         CAST(len(regexp_extract_all(text, '(?m)^[-*] ')) AS BIGINT) AS n_bullets,
         CAST(len(regexp_extract_all(text, '(?m)^\d+\. ')) AS BIGINT) AS n_numbered,
         CAST(len(regexp_extract_all(text, '(?m)^> ')) AS BIGINT) AS n_quotes
  FROM read_parquet('{path}'))
SELECT * FROM c
WHERE n_h1 + n_h2plus + n_bullets + n_numbered + n_quotes > 0
"""


def chunk_sliding_documents(sf_dir: str, window: int = 64, stride: int = 48):
    """Sliding-window chunker with overlap — the other standard RAG /
    pretraining chunking shape next to the greedy budget packer
    (``chunk_documents``): fixed ``window``-token chunks every
    ``stride`` tokens, so consecutive chunks share ``window - stride``
    tokens and no token is dropped. Embarrassingly parallel: chunk
    boundaries are pure integer arithmetic per doc (vectorized), the
    chunk texts are slice-joins of the already-split token array. Row
    fan-out is n/stride per doc — bounded, no shuffle."""
    ds = scan(sf_dir, "documents", columns=["doc_id", "text"])

    def chunks(batch: pa.Table) -> pa.Table:
        words = pc.split_pattern(batch.column("text"), pattern=" ")
        words = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
        n = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        flat = np.asarray(pc.list_flatten(words).to_numpy(zero_copy_only=False),
                          dtype=object)
        offs = np.r_[0, np.cumsum(n)]
        k_counts = np.where(n <= window, 1, (n - window + stride - 1) // stride + 1)
        parent = np.repeat(np.arange(len(n)), k_counts)
        # chunk ordinal within each doc: global arange minus each doc's base
        base = np.r_[0, np.cumsum(k_counts)][:-1]
        k = np.arange(k_counts.sum(), dtype=np.int64) - np.repeat(base, k_counts)
        starts = k * stride
        ends = np.minimum(starts + window, n[parent])
        texts = [
            " ".join(flat[offs[p] + s : offs[p] + e])
            for p, s, e in zip(parent, starts, ends)
        ]
        return pa.table(
            {
                "doc_id": pa.array(ids[parent], pa.int64()),
                "chunk_idx": pa.array(k, pa.int64()),
                "tok_start": pa.array(starts, pa.int64()),
                "tok_len": pa.array(ends - starts, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )

    return ds.map_batches(chunks, batch_format="pyarrow", zero_copy_batch=True)


CHUNK_SLIDING_SQL = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
                  len(string_split(text, ' ')) AS n
           FROM documents),
k AS (SELECT doc_id, toks, n,
        unnest(range(CASE WHEN n <= 64 THEN 1
                          ELSE (n - 64 + 47) // 48 + 1 END)) AS k
      FROM t)
SELECT doc_id, CAST(k AS BIGINT) AS chunk_idx,
       CAST(k*48 AS BIGINT) AS tok_start,
       CAST(least(k*48 + 64, n) - k*48 AS BIGINT) AS tok_len,
       array_to_string(toks[k*48 + 1 : least(k*48 + 64, n)], ' ') AS text
FROM k
"""


def rrf_hybrid_topk_documents(sf_dir: str, k: int = 10, n_list: int = 50, c: int = 60):
    """Hybrid retrieval via reciprocal-rank fusion: fuse the BM25 lexical
    ranking with the embedding-cosine ranking (vec_id ≡ doc_id in the
    fixture corpus) as RRF(d) = 1/(c+rank_bm25) + 1/(c+rank_cos), each
    list truncated at ``n_list`` — the standard two-tower retrieval
    combiner. Both input rankings are the already-distributed operators
    (per-batch-prune BM25 topk; broadcast-query brute-force cosine);
    the fusion itself touches only 2×n_list rows on the driver. Ranks
    use the same rounded-score + id tiebreak rule as each ranking's own
    twin, so the fused ordering is bit-deterministic."""
    from .functions.rounding import round_away

    bm = bm25_topk_documents(sf_dir, k=n_list).to_pandas()
    bm = bm.sort_values(["score", "doc_id"], ascending=[False, True]).reset_index(drop=True)
    bm_rank = {int(d): i + 1 for i, d in enumerate(bm["doc_id"])}

    qids, qm = _query_embeddings(sf_dir)
    cos = ann_mod.brute_force_topk(
        scan(sf_dir, "embeddings", columns=["vec_id", "embedding"]), qids, qm, k=n_list
    ).to_pandas()
    cos = cos[cos["query_id"] == qids[0]]
    cos = cos.sort_values(["sim", "vec_id"], ascending=[False, True]).reset_index(drop=True)
    cos_rank = {int(d): i + 1 for i, d in enumerate(cos["vec_id"])}

    docs = sorted(set(bm_rank) | set(cos_rank))
    rows = []
    for d in docs:
        rb = bm_rank.get(d, 0)
        rc = cos_rank.get(d, 0)
        # fixed-order sum, bm25 term first — mirrors the twin expression
        s = (1.0 / (c + rb) if rb else 0.0) + (1.0 / (c + rc) if rc else 0.0)
        rows.append((d, rb if rb else -1, rc if rc else -1, s))
    rows.sort(key=lambda r: (-float(round_away(np.float64(r[3]), 6)), r[0]))
    rows = rows[:k]
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "rank_bm25": pa.array([r[1] for r in rows], pa.int64()),
            "rank_cos": pa.array([r[2] for r in rows], pa.int64()),
            "rrf": pa.array(round_away(np.array([r[3] for r in rows]), 6), pa.float64()),
        }
    )


RRF_HYBRID_SQL = """
WITH ws AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
dl AS (SELECT doc_id, count(*) AS dl FROM ws GROUP BY doc_id),
n AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
             (SELECT count(*) FROM ws) AS n_tokens),
df AS (SELECT
        (SELECT count(DISTINCT doc_id) FROM ws WHERE word = 'join')   AS df0,
        (SELECT count(DISTINCT doc_id) FROM ws WHERE word = 'spark')  AS df1,
        (SELECT count(DISTINCT doc_id) FROM ws WHERE word = 'window') AS df2),
tf AS (SELECT doc_id,
        count(*) FILTER (WHERE word = 'join')   AS tf0,
        count(*) FILTER (WHERE word = 'spark')  AS tf1,
        count(*) FILTER (WHERE word = 'window') AS tf2
       FROM ws GROUP BY doc_id),
s AS (SELECT tf.doc_id,
        round(
          ln((n.n_docs - df.df0 + 0.5) / (df.df0 + 0.5) + 1.0)
            * (tf.tf0 * 2.2)
            / (tf.tf0 + 1.2 * (0.25 + 0.75 * (dl.dl / (n.n_tokens / CAST(n.n_docs AS DOUBLE)))))
        + ln((n.n_docs - df.df1 + 0.5) / (df.df1 + 0.5) + 1.0)
            * (tf.tf1 * 2.2)
            / (tf.tf1 + 1.2 * (0.25 + 0.75 * (dl.dl / (n.n_tokens / CAST(n.n_docs AS DOUBLE)))))
        + ln((n.n_docs - df.df2 + 0.5) / (df.df2 + 0.5) + 1.0)
            * (tf.tf2 * 2.2)
            / (tf.tf2 + 1.2 * (0.25 + 0.75 * (dl.dl / (n.n_tokens / CAST(n.n_docs AS DOUBLE)))))
        , 4) AS score
      FROM tf JOIN dl USING (doc_id), n, df),
bm AS (SELECT doc_id,
         row_number() OVER (ORDER BY score DESC, doc_id) AS rb
       FROM s WHERE score > 0.0
       ORDER BY score DESC, doc_id LIMIT 50),
q AS (SELECT embedding AS qe FROM embeddings ORDER BY vec_id ASC LIMIT 1),
cs AS (SELECT e.vec_id AS doc_id,
         round(CAST(list_cosine_similarity(q.qe, e.embedding) AS DOUBLE), 3) AS sim
       FROM q CROSS JOIN embeddings e),
co AS (SELECT doc_id,
         row_number() OVER (ORDER BY sim DESC, doc_id) AS rc
       FROM cs ORDER BY sim DESC, doc_id LIMIT 50),
f AS (SELECT COALESCE(bm.doc_id, co.doc_id) AS doc_id,
        COALESCE(bm.rb, -1) AS rank_bm25,
        COALESCE(co.rc, -1) AS rank_cos,
        round(CASE WHEN bm.rb IS NULL THEN 0.0 ELSE 1.0/(60 + bm.rb) END
            + CASE WHEN co.rc IS NULL THEN 0.0 ELSE 1.0/(60 + co.rc) END, 6) AS rrf
      FROM bm FULL OUTER JOIN co ON bm.doc_id = co.doc_id)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(rank_bm25 AS BIGINT) AS rank_bm25,
       CAST(rank_cos AS BIGINT) AS rank_cos, rrf
FROM f ORDER BY rrf DESC, doc_id LIMIT 10
"""


def copurchase_pairs_lineitem(sf_dir: str, k: int = 20):
    """Market-basket co-occurrence mining: the top-k part pairs most
    often ordered together (each order = one basket, each pair counted
    once per basket). Shape: batch-local distinct (order, part) pairs,
    per-order pair fan-out inside an order-bucketed groupby (bounded by
    parts-per-order²), per-batch pre-agg counts, one (u,v)-bucketed sum,
    then the per-batch-prune global topk — raw baskets never shuffle
    twice and pair rows pre-aggregate before the final exchange."""
    ds = scan(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    pairs = ds.map_batches(
        lambda b: b.group_by(["l_orderkey", "l_partkey"]).aggregate([]),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    edge_empty = pa.table(
        {"part_a": pa.array([], pa.int64()), "part_b": pa.array([], pa.int64())}
    )

    def order_pairs(group: pa.Table) -> pa.Table:
        d = group.group_by(["l_orderkey", "l_partkey"]).aggregate([])
        idx = pc.sort_indices(
            d, sort_keys=[("l_orderkey", "ascending"), ("l_partkey", "ascending")]
        )
        d = d.take(idx)
        o = d.column("l_orderkey").to_numpy(zero_copy_only=False)
        p = d.column("l_partkey").to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, o[1:] != o[:-1]])
        bounds = np.r_[starts, len(o)]
        us, vs = [], []
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            grp = p[lo:hi]
            if len(grp) > 1:
                iu, iv = np.triu_indices(len(grp), k=1)
                us.append(grp[iu])
                vs.append(grp[iv])
        if not us:
            return edge_empty
        return pa.table(
            {
                "part_a": pa.array(np.concatenate(us), pa.int64()),
                "part_b": pa.array(np.concatenate(vs), pa.int64()),
            }
        )

    raw = relops.bucketed_groupby(pairs, ["l_orderkey"], order_pairs, empty=edge_empty)

    cnt_empty = pa.table(
        {
            "part_a": pa.array([], pa.int64()),
            "part_b": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
        }
    )

    def local_count(b: pa.Table) -> pa.Table:
        g = b.group_by(["part_a", "part_b"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "part_a": g.column("part_a"),
                "part_b": g.column("part_b"),
                "n": pc.cast(g.column("count_all"), pa.int64()),
            }
        )

    def pair_sum(group: pa.Table) -> pa.Table:
        g = group.group_by(["part_a", "part_b"]).aggregate([("n", "sum")])
        return pa.table(
            {
                "part_a": g.column("part_a"),
                "part_b": g.column("part_b"),
                "n": pc.cast(g.column("n_sum"), pa.int64()),
            }
        )

    counts = relops.bucketed_groupby(
        raw.map_batches(local_count, batch_format="pyarrow", zero_copy_batch=True),
        ["part_a", "part_b"], pair_sum, empty=cnt_empty,
    )
    return relops.topk(
        counts,
        [("n", "descending"), ("part_a", "ascending"), ("part_b", "ascending")],
        k,
    )


COPURCHASE_SQL = """
WITH p AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS s FROM lineitem),
e AS (SELECT a.s AS part_a, b.s AS part_b
      FROM p a JOIN p b ON a.o = b.o AND a.s < b.s),
c AS (SELECT part_a, part_b, count(*) AS n FROM e GROUP BY part_a, part_b)
SELECT CAST(part_a AS BIGINT) AS part_a, CAST(part_b AS BIGINT) AS part_b,
       CAST(n AS BIGINT) AS n
FROM c ORDER BY n DESC, part_a, part_b LIMIT 20
"""


def schema_drift_union_transcripts(sf_dir: str):
    """Schema-evolution ingestion (UNION BY NAME): one logical feed
    written by three producer generations — gen0 (conv_id, turn_idx,
    text), gen1 (+tool), gen2 (+ts, columns reordered) — read into ONE
    dataset with missing columns as typed nulls, the long-lived-corpus
    reality at 100 TB. Per-file align is a zero-copy column shuffle +
    typed-null fill inside map_batches (no row work); the audit output
    is per-generation row and null counts. Twin: DuckDB's own
    ``read_parquet(..., union_by_name=true)``."""
    from .sources.fixtures import schema_drift_paths_for

    paths = schema_drift_paths_for(_sf_to_fixture_size(sf_dir))
    target = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("text", pa.string()),
            ("tool", pa.string()),
            ("ts", pa.timestamp("us")),
            ("gen", pa.int64()),
        ]
    )

    parts = []
    for g, p in enumerate(paths):
        def align(batch: pa.Table, g: int = g) -> pa.Table:
            cols = {}
            for f in target:
                if f.name == "gen":
                    cols["gen"] = pa.array(
                        np.full(batch.num_rows, g, np.int64), pa.int64()
                    )
                elif f.name in batch.column_names:
                    cols[f.name] = batch.column(f.name).cast(f.type)
                else:
                    cols[f.name] = pa.nulls(batch.num_rows, f.type)
            return pa.table(cols)

        parts.append(
            relops.scan_path(p).map_batches(
                align, batch_format="pyarrow", zero_copy_batch=True
            )
        )
    unioned = parts[0].union(*parts[1:])

    def partial(batch: pa.Table) -> pa.Table:
        gen = batch.column("gen").to_numpy(zero_copy_only=False)
        null_tool = pc.is_null(batch.column("tool")).to_numpy(zero_copy_only=False)
        null_ts = pc.is_null(batch.column("ts")).to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "gen": pa.array(gen, pa.int64()),
                "one": pa.array(np.ones(batch.num_rows, np.int64)),
                "nt": pa.array(null_tool.astype(np.int64), pa.int64()),
                "nts": pa.array(null_ts.astype(np.int64), pa.int64()),
            }
        )
        return t.group_by(["gen"]).aggregate(
            [("one", "sum"), ("nt", "sum"), ("nts", "sum")]
        )

    agg = (
        unioned.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("gen")
        .aggregate(
            Sum("one_sum", alias_name="n_rows"),
            Sum("nt_sum", alias_name="n_null_tool"),
            Sum("nts_sum", alias_name="n_null_ts"),
        )
        .to_pandas()
        .sort_values("gen")
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "gen": pa.array(agg["gen"].to_numpy(np.int64), pa.int64()),
            "n_rows": pa.array(agg["n_rows"].to_numpy(np.int64), pa.int64()),
            "n_null_tool": pa.array(agg["n_null_tool"].to_numpy(np.int64), pa.int64()),
            "n_null_ts": pa.array(agg["n_null_ts"].to_numpy(np.int64), pa.int64()),
        }
    )


def schema_drift_union_transcripts_sql(sf_dir: str | None = None) -> str:
    from .sources.fixtures import schema_drift_paths_for

    paths = schema_drift_paths_for(
        _sf_to_fixture_size(sf_dir) if sf_dir else "correctness"
    )
    plist = ", ".join(f"'{p}'" for p in paths)
    return rf"""
SELECT CAST(regexp_extract(filename, 'gen(\d)', 1) AS BIGINT) AS gen,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN tool IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_tool,
       CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_ts
FROM read_parquet([{plist}], union_by_name=true, filename=true)
GROUP BY 1
"""


def charset_audit_transcripts(sf_dir: str):
    """Ingestion charset audit: per turn, counts of carriage returns,
    tabs, other C0 control characters and non-ASCII bytes' codepoints —
    the mojibake / line-ending-normalization signal an ingest pipeline
    checks before text cleanup (the fixture's payload grammar plants
    \\r\\n and tabs deliberately). One vectorized RE2 count per class,
    no shuffle; DuckDB shares the RE2 engine so the twin agrees by
    construction. Rows with all-zero counts are dropped (the common
    case at scale)."""
    pats = {
        "n_cr": r"\r",
        "n_tab": r"\t",
        "n_ctrl_other": r"[\x00-\x08\x0b\x0c\x0e-\x1f]",
        "n_nonascii": r"[^\x00-\x7f]",
    }
    ds = relops.scan_path(
        _transcripts_path(sf_dir), columns=["conv_id", "turn_idx", "text"]
    )

    def audit(batch: pa.Table) -> pa.Table:
        txt = batch.column("text")
        counts = {
            name: pc.cast(pc.count_substring_regex(txt, pat), pa.int64())
            for name, pat in pats.items()
        }
        total = counts["n_cr"]
        for k in list(pats)[1:]:
            total = pc.add(total, counts[k])
        out = pa.table(
            {
                "conv_id": batch.column("conv_id"),
                "turn_idx": batch.column("turn_idx"),
                **counts,
            }
        )
        return out.filter(pc.greater(total, 0))

    df = (
        ds.map_batches(audit, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .drop_duplicates()  # re-logged duplicate rows audit identically
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(df, preserve_index=False)


def charset_audit_transcripts_sql(sf_dir: str | None = None) -> str:
    path = _transcripts_sql_source(sf_dir)
    return rf"""
WITH t AS (SELECT DISTINCT conv_id, turn_idx, text FROM read_parquet('{path}')),
c AS (
  SELECT conv_id, turn_idx,
         CAST(len(regexp_extract_all(text, '\r')) AS BIGINT) AS n_cr,
         CAST(len(regexp_extract_all(text, '\t')) AS BIGINT) AS n_tab,
         CAST(len(regexp_extract_all(text, '[\x00-\x08\x0b\x0c\x0e-\x1f]')) AS BIGINT)
           AS n_ctrl_other,
         CAST(len(regexp_extract_all(text, '[^\x00-\x7f]')) AS BIGINT) AS n_nonascii
  FROM t)
SELECT * FROM c WHERE n_cr + n_tab + n_ctrl_other + n_nonascii > 0
"""


def gini_conv_lengths_transcripts(sf_dir: str):
    """Skew PROFILER over agent traces: the Gini coefficient of
    conversation lengths — the one-number answer to 'how skewed is this
    corpus toward mega-conversations', i.e. whether the salted-split /
    skew-join valves are needed. Uses the range-partitioned global
    row_number (no node materializes the order): conv lengths from one
    conv-bucketed count, ranks from ``relops.global_row_number``, then
    order-free integer sums (n, Σx, Σ rank·x) and one mirrored float
    formula. int64 bound: Σ rank·x ≈ n²·x̄ — safe to ~10⁸ convs per
    partial; the driver fold is arbitrary-precision."""
    ds = relops.scan_path(_transcripts_path(sf_dir), columns=["conv_id", "turn_idx"])

    pairs = ds.map_batches(
        lambda b: b.group_by(["conv_id", "turn_idx"]).aggregate([]),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    len_empty = pa.table(
        {"conv_id": pa.array([], pa.string()), "x": pa.array([], pa.int64())}
    )

    def conv_len(group: pa.Table) -> pa.Table:
        d = group.group_by(["conv_id", "turn_idx"]).aggregate([])
        g = d.group_by(["conv_id"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "conv_id": g.column("conv_id"),
                "x": pc.cast(g.column("count_all"), pa.int64()),
            }
        )

    lengths = relops.exchange_groupby(pairs, ["conv_id"], conv_len, empty=len_empty)
    ranked, total = relops.global_row_number(lengths, "x", ["conv_id"], rank_col="i")

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column("x").to_numpy(zero_copy_only=False).astype(np.int64)
        i = batch.column("i").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "n": pa.array([len(x)], pa.int64()),
                "tx": pa.array([int(x.sum())], pa.int64()),
                "sx": pa.array([int((i * x).sum())], pa.int64()),
            }
        )

    folded = (
        ranked.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    n = int(folded["n"].sum())
    tx = int(folded["tx"].sum())
    sx = int(folded["sx"].sum())
    from .functions.rounding import round_away_scalar

    gini = (2.0 * float(sx)) / (float(n) * float(tx)) - (float(n) + 1.0) / float(n)
    return pa.table(
        {
            "n_convs": pa.array([n], pa.int64()),
            "total_turns": pa.array([tx], pa.int64()),
            "gini": pa.array([round_away_scalar(gini, 6)], pa.float64()),
        }
    )


def gini_conv_lengths_transcripts_sql(sf_dir: str | None = None) -> str:
    path = _transcripts_sql_source(sf_dir)
    return f"""
WITH t AS (SELECT DISTINCT conv_id, turn_idx FROM read_parquet('{path}')),
l AS (SELECT conv_id, count(*) AS x FROM t GROUP BY conv_id),
r AS (SELECT x, row_number() OVER (ORDER BY x, conv_id) AS i FROM l),
s AS (SELECT count(*) AS n, sum(CAST(x AS HUGEINT)) AS tx,
             sum(CAST(i AS HUGEINT) * CAST(x AS HUGEINT)) AS sx
      FROM r)
SELECT CAST(n AS BIGINT) AS n_convs, CAST(tx AS BIGINT) AS total_turns,
       round((2.0 * CAST(sx AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(tx AS DOUBLE))
             - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE), 6) AS gini
FROM s
"""


def ndcg_embedding_topk(sf_dir: str, k: int = 10):
    """Retrieval EVALUATION metrics — nDCG@10 and MRR per query for the
    exact cosine top-k, with the fixture's ``label`` column as the
    relevance oracle (relevant = same label as the query, query itself
    excluded). The eval harness a retrieval pipeline reports: DCG
    contributions 1/log2(1+rank) are quantized to a 1e-6 integer grid
    BEFORE summation (order-free, the pagerank/DSIR trick), IDCG uses
    min(k, n_relevant) ideal positions, and each metric ends in one
    double division. Distributed shape: brute-force top-(k+1) (self
    dropped — still covers the top-k of corpus-minus-self), a bounded
    label-count aggregate, and ≤(k×queries) label lookups via a pushed
    is_in filter; the metric math touches only those rows."""
    import math

    qids, qm = _query_embeddings(sf_dir)
    top = ann_mod.brute_force_topk(
        scan(sf_dir, "embeddings", columns=["vec_id", "embedding"]), qids, qm, k=k + 1
    ).to_pandas()

    # bounded label-count aggregate (labels ≪ corpus)
    lbl_counts = (
        scan(sf_dir, "embeddings", columns=["vec_id", "label"])
        .map_batches(
            lambda b: b.group_by(["label"]).aggregate([("vec_id", "count")]),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        .groupby("label")
        .aggregate(Sum("vec_id_count", alias_name="n"))
        .to_pandas()
    )
    n_per_label = dict(zip(lbl_counts["label"].astype(int), lbl_counts["n"].astype(int)))

    # labels for just the queries + result rows (pushed semi-join)
    need = sorted(set(qids) | set(top["vec_id"].astype(int)))
    need_arr = pa.array(need, pa.int64())
    lbl = (
        scan(sf_dir, "embeddings", columns=["vec_id", "label"])
        .map_batches(
            lambda b: b.filter(pc.is_in(b.column("vec_id"), value_set=need_arr)),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        .to_pandas()
    )
    label_of = dict(zip(lbl["vec_id"].astype(int), lbl["label"].astype(int)))

    def micro(r: int) -> int:
        y = (1.0 / math.log2(1.0 + r)) * 1000000.0
        return int(math.floor(y + 0.5))

    from .functions.rounding import round_away_scalar

    out = []
    for q in qids:
        ql = label_of[int(q)]
        rows = top[top["query_id"] == q]
        rows = rows[rows["vec_id"] != q]
        rows = rows.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        dcg = 0
        first_rel = None
        for rank, vec in enumerate(rows["vec_id"].astype(int), start=1):
            if label_of[vec] == ql:
                dcg += micro(rank)
                if first_rel is None:
                    first_rel = rank
        n_rel = n_per_label[ql] - 1  # exclude the query itself
        idcg = sum(micro(i) for i in range(1, min(k, n_rel) + 1))
        out.append(
            (
                int(q),
                int(n_rel),
                round_away_scalar(float(dcg) / float(idcg), 4) if idcg else 0.0,
                round_away_scalar(1.0 / first_rel, 4) if first_rel else 0.0,
            )
        )
    out.sort()
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in out], pa.int64()),
            "n_rel": pa.array([r[1] for r in out], pa.int64()),
            "ndcg10": pa.array([r[2] for r in out], pa.float64()),
            "mrr": pa.array([r[3] for r in out], pa.float64()),
        }
    )


NDCG_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qe, label AS ql
           FROM embeddings ORDER BY vec_id ASC LIMIT 5),
r AS (SELECT q.query_id, q.ql, e.vec_id, e.label,
        round(CAST(list_cosine_similarity(q.qe, e.embedding) AS DOUBLE), 3) AS sim
      FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.query_id),
rk AS (SELECT query_id, ql, vec_id, label,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rnk
       FROM r),
top AS (SELECT * FROM rk WHERE rnk <= 10),
d AS (SELECT query_id,
        sum(CASE WHEN label = ql
                 THEN CAST(round((1.0/log2(1.0 + rnk)) * 1000000.0) AS BIGINT)
                 ELSE 0 END) AS dcg_micro,
        min(CASE WHEN label = ql THEN rnk END) AS first_rel
      FROM top GROUP BY query_id),
cnt AS (SELECT q.query_id, count(*) AS n_rel
        FROM q JOIN embeddings e ON e.label = q.ql AND e.vec_id <> q.query_id
        GROUP BY q.query_id),
ideal AS (SELECT cnt.query_id,
            sum(CAST(round((1.0/log2(1.0 + i)) * 1000000.0) AS BIGINT)) AS idcg_micro
          FROM cnt, unnest(range(1, least(10, cnt.n_rel) + 1)) AS t(i)
          GROUP BY cnt.query_id)
SELECT d.query_id, CAST(cnt.n_rel AS BIGINT) AS n_rel,
       round(CAST(d.dcg_micro AS DOUBLE) / CAST(ideal.idcg_micro AS DOUBLE), 4) AS ndcg10,
       CASE WHEN d.first_rel IS NULL THEN 0.0
            ELSE round(1.0 / d.first_rel, 4) END AS mrr
FROM d JOIN cnt USING (query_id) JOIN ideal USING (query_id)
"""


def compress_ratio_documents(sf_dir: str):
    """Compression-ratio quality signal (CCNet/Gopher-family heuristic):
    zlib-level-6 deflate ratio per document — highly repetitive or
    degenerate text compresses far below natural prose, making the
    ratio a cheap redundancy filter. Embarrassingly parallel map; the
    per-row C calls are the hot loop (zlib releases the GIL), no
    shuffle. Non-SQL-expressible: the full-value oracle is the
    single-process python twin in PYTHON_ORACLES."""
    ds = scan(sf_dir, "documents", columns=["doc_id", "text"])

    def ratio(batch: pa.Table) -> pa.Table:
        import zlib

        from .functions.rounding import round_away

        texts = batch.column("text").to_pylist()
        raw = np.array([len(t.encode("utf-8")) for t in texts], np.int64)
        comp = np.array(
            [len(zlib.compress(t.encode("utf-8"), 6)) for t in texts], np.int64
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "raw_len": pa.array(raw, pa.int64()),
                "comp_len": pa.array(comp, pa.int64()),
                "ratio": pa.array(
                    round_away(
                        comp.astype(np.float64) / np.maximum(raw, 1).astype(np.float64),
                        4,
                    ),
                    pa.float64(),
                ),
            }
        )

    return ds.map_batches(ratio, batch_format="pyarrow", zero_copy_batch=True)


def _oracle_compress_ratio(sf_dir: str) -> pa.Table:
    """Single-process python twin for compress_ratio_documents."""
    import zlib

    from .functions.rounding import round_away

    tbl = pq.read_table(
        relops.table_path(sf_dir, "documents"), columns=["doc_id", "text"]
    )
    texts = tbl.column("text").to_pylist()
    raw = np.array([len(t.encode("utf-8")) for t in texts], np.int64)
    comp = np.array([len(zlib.compress(t.encode("utf-8"), 6)) for t in texts], np.int64)
    return pa.table(
        {
            "doc_id": tbl.column("doc_id"),
            "raw_len": pa.array(raw, pa.int64()),
            "comp_len": pa.array(comp, pa.int64()),
            "ratio": pa.array(
                round_away(
                    comp.astype(np.float64) / np.maximum(raw, 1).astype(np.float64), 4
                ),
                pa.float64(),
            ),
        }
    )


def bm25_topk_documents(sf_dir: str, k: int = 10):
    """BM25 retrieval (Robertson idf, k1=1.2, b=0.75): top-k documents
    for a fixed 3-term query — the ranking primitive a retrieval /
    RAG-curation pipeline runs over the corpus. Two passes, both
    streaming: (1) corpus statistics (N, total tokens, per-term document
    frequency) as ONE tiny combiner row per batch — documents never
    leave their batch, partials fold driver-side; (2) a doc-local
    vectorized scoring pass (per-term tf via positional bincount, the
    3 contributions added in fixed term order so the float result is
    bit-deterministic) feeding the per-batch-prune ``relops.topk`` —
    at 10^12 docs the only cross-node traffic is one stats row per batch
    plus ≤k survivor rows per batch. Scores are 4dp-rounded BEFORE the
    rank so ordering matches the twin's ``round`` exactly."""
    TERMS = ("join", "spark", "window")
    ds = scan(sf_dir, "documents", columns=["doc_id", "text"])

    def stats_partial(batch: pa.Table) -> pa.Table:
        parent, flat, lengths = _exploded_words(batch)
        t = pa.table({"doc_id": pa.array(parent, pa.int64()), "word": flat})
        t = t.filter(pc.is_in(t.column("word"), value_set=pa.array(list(TERMS))))
        u = t.group_by(["word", "doc_id"]).aggregate([])
        w = np.asarray(u.column("word").to_numpy(zero_copy_only=False))
        row: dict = {"n_tokens": [int(lengths.sum())]}
        for i, term in enumerate(TERMS):
            row[f"df{i}"] = [int((w == term).sum())]
        return pa.table(row)

    stats = (
        ds.map_batches(stats_partial, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()  # one row per batch
        .sum()
    )
    n_docs = int(ds.count())
    avgdl = float(stats["n_tokens"]) / float(n_docs)
    # scalar idf per term, same expression order as the twin's ln(...)
    idf = [
        float(np.log((n_docs - float(stats[f"df{i}"]) + 0.5)
                     / (float(stats[f"df{i}"]) + 0.5) + 1.0))
        for i in range(len(TERMS))
    ]

    def score(batch: pa.Table) -> pa.Table:
        from .functions.rounding import round_away

        words = pc.split_pattern(batch.column("text"), pattern=" ")
        words = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
        lengths = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(words)
        n = batch.num_rows
        pos = np.repeat(np.arange(n, dtype=np.int64), lengths)
        dl = lengths.astype(np.float64)
        # denominator tail is term-independent; MUST mirror the twin:
        # tf + 1.2 * (0.25 + 0.75 * (dl / avgdl))
        tail = 1.2 * (0.25 + 0.75 * (dl / avgdl))
        total = np.zeros(n, np.float64)
        for i, term in enumerate(TERMS):
            m = pc.equal(flat, term).to_numpy(zero_copy_only=False)
            tf = np.bincount(pos[m], minlength=n).astype(np.float64)
            total = total + (idf[i] * (tf * 2.2)) / (tf + tail)
        rs = round_away(total, 4)
        out = pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "score": pa.array(rs, pa.float64()),
            }
        )
        return out.filter(pc.greater(out.column("score"), 0.0))

    scored = ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    return relops.topk(scored, [("score", "descending"), ("doc_id", "ascending")], k)


BM25_SQL = """
WITH ws AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
dl AS (SELECT doc_id, count(*) AS dl FROM ws GROUP BY doc_id),
n AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
             (SELECT count(*) FROM ws) AS n_tokens),
df AS (SELECT
        (SELECT count(DISTINCT doc_id) FROM ws WHERE word = 'join')   AS df0,
        (SELECT count(DISTINCT doc_id) FROM ws WHERE word = 'spark')  AS df1,
        (SELECT count(DISTINCT doc_id) FROM ws WHERE word = 'window') AS df2),
tf AS (SELECT doc_id,
        count(*) FILTER (WHERE word = 'join')   AS tf0,
        count(*) FILTER (WHERE word = 'spark')  AS tf1,
        count(*) FILTER (WHERE word = 'window') AS tf2
       FROM ws GROUP BY doc_id),
s AS (SELECT tf.doc_id,
        round(
          ln((n.n_docs - df.df0 + 0.5) / (df.df0 + 0.5) + 1.0)
            * (tf.tf0 * 2.2)
            / (tf.tf0 + 1.2 * (0.25 + 0.75 * (dl.dl / (n.n_tokens / CAST(n.n_docs AS DOUBLE)))))
        + ln((n.n_docs - df.df1 + 0.5) / (df.df1 + 0.5) + 1.0)
            * (tf.tf1 * 2.2)
            / (tf.tf1 + 1.2 * (0.25 + 0.75 * (dl.dl / (n.n_tokens / CAST(n.n_docs AS DOUBLE)))))
        + ln((n.n_docs - df.df2 + 0.5) / (df.df2 + 0.5) + 1.0)
            * (tf.tf2 * 2.2)
            / (tf.tf2 + 1.2 * (0.25 + 0.75 * (dl.dl / (n.n_tokens / CAST(n.n_docs AS DOUBLE)))))
        , 4) AS score
      FROM tf JOIN dl USING (doc_id), n, df)
SELECT doc_id, score FROM s WHERE score > 0.0
ORDER BY score DESC, doc_id LIMIT 10
"""


def cohort_retention_events(sf_dir: str):
    """Cohort-retention matrix over the event stream: users are
    cohorted by their first active day, and each cell counts how many
    of a cohort's users were active again ``offset_days`` later — the
    classic product-analytics retention triangle. Shape: a map-side
    distinct collapses each batch to (user, day) pairs, ONE
    user-bucketed shuffle co-locates each user's history (first-day =
    head of the sorted run, no per-user groupby dispatch), and only
    (cohort_day, offset) partial counts — at most days² rows per
    bucket — reach the final tiny groupby. Day arithmetic is exact
    integer microseconds, so the twin matches bit-for-bit."""
    ds = scan(sf_dir, "events", columns=["user_id", "ts"])

    def pre(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "user_id": batch.column("user_id"),
                "day": pc.floor_temporal(batch.column("ts"), unit="day"),
            }
        )
        return t.group_by(["user_id", "day"]).aggregate([])

    pairs = ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)

    empty = pa.table(
        {
            "cohort_day": pa.array([], pa.timestamp("us")),
            "offset_days": pa.array([], pa.int64()),
            "n_users": pa.array([], pa.int64()),
        }
    )

    def bucket_fn(group: pa.Table) -> pa.Table:
        d = group.group_by(["user_id", "day"]).aggregate([])
        idx = pc.sort_indices(
            d, sort_keys=[("user_id", "ascending"), ("day", "ascending")]
        )
        d = d.take(idx)
        u = np.asarray(d.column("user_id").to_numpy(zero_copy_only=False))
        day_us = d.column("day").cast(pa.int64()).to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        runs = np.diff(np.r_[starts, len(u)])
        cohort_us = np.repeat(day_us[starts], runs)
        off = (day_us - cohort_us) // 86_400_000_000
        t = pa.table(
            {
                "cohort_us": pa.array(cohort_us, pa.int64()),
                "offset_days": pa.array(off, pa.int64()),
            }
        )
        c = t.group_by(["cohort_us", "offset_days"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "cohort_day": pc.cast(c.column("cohort_us"), pa.timestamp("us")),
                "offset_days": c.column("offset_days"),
                "n_users": pc.cast(c.column("count_all"), pa.int64()),
            }
        )

    part = relops.bucketed_groupby(pairs, ["user_id"], bucket_fn, empty=empty)
    agg = (
        part.groupby(["cohort_day", "offset_days"])
        .aggregate(Sum("n_users", alias_name="n_users"))
        .to_pandas()  # ≤ days² rows
        .sort_values(["cohort_day", "offset_days"])
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "cohort_day": pa.array(agg["cohort_day"], pa.timestamp("us")),
            "offset_days": pa.array(agg["offset_days"].to_numpy(np.int64)),
            "n_users": pa.array(agg["n_users"].to_numpy(np.int64)),
        }
    )


COHORT_RETENTION_SQL = """
WITH d AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
f AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY user_id)
SELECT f.cohort_day,
       CAST(date_diff('day', f.cohort_day, d.day) AS BIGINT) AS offset_days,
       CAST(count(*) AS BIGINT) AS n_users
FROM d JOIN f USING (user_id)
GROUP BY 1, 2
"""


def merge_upsert_orders(sf_dir: str):
    """CDC / SCD-style last-writer-wins upsert: a deterministic change
    stream (updates to every 7th order, inserts keyed ``-k-1`` off
    every 13th — strictly negative, so an insert key can never collide
    with a base key, including k=0) is merged into the base table so
    the newest version of each key survives. Shape: changes are synthesized map-side from
    the same scan (no second input pass), base rows tag ver=0 and
    changes ver=1, and ONE key-bucketed exchange resolves each key by
    a vectorized sorted-run tail — no per-key groupby dispatch, no
    broadcast of the (large) change stream. The returned slice
    (keys ≡ 0 mod 97) keeps the driver compare small while the merge
    itself runs over the full table. Money stays in exact int cents."""
    ds = scan(
        sf_dir,
        "orders",
        columns=["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"],
    )

    def expand(batch: pa.Table) -> pa.Table:
        k = batch.column("o_orderkey")
        price_c = _cents(batch.column("o_totalprice"), 100)
        base = pa.table(
            {
                "k": k,
                "o_custkey": batch.column("o_custkey"),
                "status": batch.column("o_orderstatus"),
                "price_c": price_c,
                "ver": pa.array(np.zeros(batch.num_rows, dtype=np.int64)),
            }
        )
        k_np = k.to_numpy()
        upd = np.flatnonzero(k_np % 7 == 0)
        ins = np.flatnonzero(k_np % 13 == 0)
        updates = pa.table(
            {
                "k": k.take(upd),
                "o_custkey": batch.column("o_custkey").take(upd),
                "status": pa.array(np.full(len(upd), "U"), pa.string()),
                "price_c": pc.add(price_c.take(upd), pa.scalar(100055, pa.int64())),
                "ver": pa.array(np.ones(len(upd), dtype=np.int64)),
            }
        )
        inserts = pa.table(
            {
                "k": pa.array(-k_np[ins] - 1, pa.int64()),
                "o_custkey": batch.column("o_custkey").take(ins),
                "status": pa.array(np.full(len(ins), "N"), pa.string()),
                "price_c": price_c.take(ins),
                "ver": pa.array(np.ones(len(ins), dtype=np.int64)),
            }
        )
        return pa.concat_tables([base, updates, inserts])

    tagged = ds.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)

    empty = pa.table(
        {
            "o_orderkey": pa.array([], pa.int64()),
            "o_custkey": pa.array([], pa.int64()),
            "status": pa.array([], pa.string()),
            "price_c": pa.array([], pa.int64()),
            "src_ver": pa.array([], pa.int64()),
        }
    )

    def bucket_fn(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group, sort_keys=[("k", "ascending"), ("ver", "ascending")]
        )
        t = group.take(idx)
        k = t.column("k").to_numpy()
        last = np.r_[k[1:] != k[:-1], True]
        t = t.take(np.flatnonzero(last & (k % 97 == 0)))
        return pa.table(
            {
                "o_orderkey": t.column("k"),
                "o_custkey": t.column("o_custkey"),
                "status": t.column("status"),
                "price_c": t.column("price_c"),
                "src_ver": t.column("ver"),
            }
        )

    out = relops.bucketed_groupby(tagged, ["k"], bucket_fn, empty=empty)
    df = out.to_pandas().sort_values("o_orderkey").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


MERGE_UPSERT_SQL = """
WITH base AS (
  SELECT o_orderkey AS k, o_custkey, o_orderstatus AS status,
         CAST(round(o_totalprice*100) AS BIGINT) AS price_c, 0 AS ver
  FROM orders),
chg AS (
  SELECT o_orderkey AS k, o_custkey, 'U' AS status,
         CAST(round(o_totalprice*100) AS BIGINT) + 100055 AS price_c, 1 AS ver
  FROM orders WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT -o_orderkey - 1, o_custkey, 'N',
         CAST(round(o_totalprice*100) AS BIGINT), 1
  FROM orders WHERE o_orderkey % 13 = 0),
all_rows AS (SELECT * FROM base UNION ALL SELECT * FROM chg),
m AS (SELECT *, row_number() OVER (PARTITION BY k ORDER BY ver DESC) AS rn
      FROM all_rows)
SELECT k AS o_orderkey, o_custkey, status, price_c, CAST(ver AS BIGINT) AS src_ver
FROM m WHERE rn = 1 AND k % 97 = 0
"""


def bigram_xent_documents(sf_dir: str):
    """Bigram-LM cross-entropy per document (the order-2 KenLM quality
    signal beside ``unigram_xent``): train add-one-smoothed bigram
    probabilities p(w2|w1) = (c(w1,w2)+1)/(c(w1·)+V) on the corpus, then
    score every doc by mean -ln p over its bigram stream. Unlike the
    unigram op, the LM here is NOT broadcast — a bigram table scales
    with corpus size, so scoring is a distributed JOIN: (1) one bigram-
    bucketed exchange builds c(w1,w2); context counts c(w1·) fold out of
    that same table; (2) the scored-bigram table (key → quantized log
    term) attaches to c(w1·) and then to the bigram instance stream via
    ``size_gated_join`` (broadcast under the byte gate, hash join
    above); (3) one doc-bucketed exchange sums EXACT int64 1e-6-grid
    log terms, so distributed summation order cannot flip the twin
    hash. Docs with <2 tokens have no bigrams and drop out, mirroring
    the twin's join semantics."""
    ds = scan(sf_dir, "documents", columns=["doc_id", "text"])
    SEP = "\x1f"

    def _bigram_arrays(batch: pa.Table):
        parent, flat, lens = _exploded_words(batch)
        n = len(flat)
        if n < 2:
            return None
        same = np.ones(n - 1, dtype=bool)
        ends = np.cumsum(lens) - 1
        same[ends[ends < n - 1]] = False
        i = np.flatnonzero(same)
        w1 = flat.take(pa.array(i))
        w2 = flat.take(pa.array(i + 1))
        key = pc.binary_join_element_wise(w1, w2, SEP)
        return parent[i], w1, key

    def bigram_partial(batch: pa.Table) -> pa.Table:
        tri = _bigram_arrays(batch)
        if tri is None:
            return pa.table(
                {
                    "key": pa.array([], pa.string()),
                    "w1": pa.array([], pa.string()),
                    "c": pa.array([], pa.int64()),
                }
            )
        _, w1, key = tri
        c = pa.table({"key": key, "w1": w1}).group_by(["key", "w1"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {
                "key": c.column("key"),
                "w1": c.column("w1"),
                "c": pc.cast(c.column("count_all"), pa.int64()),
            }
        )

    partials = ds.map_batches(
        bigram_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    bi_empty = pa.table(
        {
            "key": pa.array([], pa.string()),
            "w1": pa.array([], pa.string()),
            "c": pa.array([], pa.int64()),
        }
    )

    def bucket_sum(group: pa.Table) -> pa.Table:
        c = group.group_by(["key", "w1"]).aggregate([("c", "sum")])
        return pa.table(
            {
                "key": c.column("key"),
                "w1": c.column("w1"),
                "c": pc.cast(c.column("c_sum"), pa.int64()),
            }
        )

    bigrams = relops.bucketed_groupby(partials, ["key"], bucket_sum, empty=bi_empty)

    # context counts c(w1·) fold out of the bigram table — keyset-scale
    ctx_empty = pa.table(
        {"w1": pa.array([], pa.string()), "cu": pa.array([], pa.int64())}
    )

    def ctx_sum(group: pa.Table) -> pa.Table:
        c = group.group_by(["w1"]).aggregate([("c", "sum")])
        return pa.table(
            {"w1": c.column("w1"), "cu": pc.cast(c.column("c_sum"), pa.int64())}
        )

    contexts = relops.bucketed_groupby(
        bigrams.map_batches(
            lambda b: b.select(["w1", "c"]), batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        ["w1"], ctx_sum, empty=ctx_empty,
    )

    # V: distinct corpus words — per-batch unique, per-bucket count, sum
    def word_unique(batch: pa.Table) -> pa.Table:
        _, flat, _ = _exploded_words(batch)
        return pa.table({"word": pc.unique(flat)})

    def bucket_vocab(group: pa.Table) -> pa.Table:
        return pa.table(
            {"nv": pa.array([len(pc.unique(group.column("word")))], pa.int64())}
        )

    V = int(
        relops.bucketed_groupby(
            ds.map_batches(word_unique, batch_format="pyarrow", zero_copy_batch=True),
            ["word"], bucket_vocab,
            empty=pa.table({"nv": pa.array([], pa.int64())}),
        )
        .to_pandas()["nv"].sum()
    )

    scored_src = relops.size_gated_join(bigrams, contexts, on="w1")

    def to_terms(batch: pa.Table) -> pa.Table:
        num = (batch.column("c").to_numpy(zero_copy_only=False) + 1).astype(
            np.float64
        )
        den = (batch.column("cu").to_numpy(zero_copy_only=False) + V).astype(
            np.float64
        )
        q = np.round(np.log(num / den) * 1e6).astype(np.int64)
        return pa.table({"key": batch.column("key"), "q": pa.array(q, pa.int64())})

    scored = scored_src.map_batches(
        to_terms, batch_format="pyarrow", zero_copy_batch=True
    )

    # instance stream: (doc_id, key) per bigram occurrence
    def instances_fn(batch: pa.Table) -> pa.Table:
        tri = _bigram_arrays(batch)
        if tri is None:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "key": pa.array([], pa.string())}
            )
        docs, _, key = tri
        return pa.table({"doc_id": pa.array(docs, pa.int64()), "key": key})

    inst = ds.map_batches(instances_fn, batch_format="pyarrow", zero_copy_batch=True)
    joined = relops.size_gated_join(inst, scored, on="key")

    def doc_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"doc_id": batch.column("doc_id"), "q": batch.column("q")})
        c = t.group_by(["doc_id"]).aggregate([("q", "sum"), ([], "count_all")])
        return pa.table(
            {
                "doc_id": c.column("doc_id"),
                "sq": pc.cast(c.column("q_sum"), pa.int64()),
                "n": pc.cast(c.column("count_all"), pa.int64()),
            }
        )

    doc_empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "n_bigrams": pa.array([], pa.int64()),
            "xent": pa.array([], pa.float64()),
        }
    )

    def doc_final(group: pa.Table) -> pa.Table:
        c = group.group_by(["doc_id"]).aggregate([("sq", "sum"), ("n", "sum")])
        sq = c.column("sq_sum").to_numpy(zero_copy_only=False).astype(np.float64)
        nn = c.column("n_sum").to_numpy(zero_copy_only=False)
        xent = np.negative((sq / 1e6) / nn)
        return pa.table(
            {
                "doc_id": c.column("doc_id"),
                "n_bigrams": pc.cast(c.column("n_sum"), pa.int64()),
                "xent": pa.array(xent, pa.float64()),
            }
        )

    return relops.bucketed_groupby(
        joined.map_batches(doc_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["doc_id"], doc_final, empty=doc_empty,
    )


BIGRAM_XENT_SQL = """
WITH toks AS MATERIALIZED (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
bi AS MATERIALIZED (
  SELECT doc_id, w[CAST(t.i AS INTEGER)] AS w1,
         w[CAST(t.i + 1 AS INTEGER)] AS w2
  FROM toks, unnest(range(1, len(w))) t(i)),
cb AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c FROM bi GROUP BY w1, w2),
cu AS (SELECT w1, CAST(count(*) AS BIGINT) AS cu FROM bi GROUP BY w1),
v AS (SELECT count(DISTINCT word) AS v FROM
       (SELECT unnest(string_split(text, ' ')) AS word FROM documents)),
q AS (SELECT cb.w1, cb.w2,
        CAST(round(ln((cb.c + 1) / CAST(cu.cu + v.v AS DOUBLE)) * 1000000)
             AS BIGINT) AS q
      FROM cb JOIN cu USING (w1), v),
s AS (SELECT bi.doc_id, CAST(sum(q.q) AS BIGINT) AS sq,
             CAST(count(*) AS BIGINT) AS n
      FROM bi JOIN q ON bi.w1 = q.w1 AND bi.w2 = q.w2
      GROUP BY bi.doc_id)
SELECT doc_id, n AS n_bigrams,
       -((CAST(sq AS DOUBLE) / 1000000.0) / n) AS xent
FROM s
"""


def analyze_stats_lineitem(sf_dir: str):
    """ANALYZE-style statistics catalog over a table — the planner-stats
    collection pass every warehouse runs (row count, null count, exact
    NDV, min/max per column). Shapes: n/null/min/max come from ONE
    combiner scan (a 10-row partial per batch, merged on the driver);
    exact NDV for ALL columns shares ONE bucketed exchange — each value
    is encoded injectively as ``col:bytes`` (float64 bit pattern, int64
    bytes, raw strings), bucketed by the encoded pair, counted distinct
    per bucket, summed per column. Timestamps surface as epoch-µs; both
    engines make the SAME int→double IEEE rounding for min/max, so the
    twin is bit-exact. String columns report the -1 sentinel (typed
    NULL reprs differ between engines)."""
    num_cols = [
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax",
    ]
    str_cols = ["l_returnflag", "l_linestatus"]
    all_cols = num_cols + str_cols + ["l_shipdate"]
    ds = scan(sf_dir, "lineitem", columns=all_cols)

    def stat_partial(batch: pa.Table) -> pa.Table:
        cols, ns, nulls, mins, maxs = [], [], [], [], []
        for c in all_cols:
            col = batch.column(c)
            cols.append(c)
            ns.append(batch.num_rows)
            nulls.append(col.null_count)
            if c in str_cols:
                mins.append(-1.0)
                maxs.append(-1.0)
            else:
                v = col.cast(pa.int64()) if c == "l_shipdate" else col
                lo, hi = pc.min(v).as_py(), pc.max(v).as_py()
                # an all-null block slice has no min/max; ±inf partials
                # are identity under the driver's min/max merge
                mins.append(float(lo) if lo is not None else float("inf"))
                maxs.append(float(hi) if hi is not None else float("-inf"))
        return pa.table(
            {
                "col": pa.array(cols, pa.string()),
                "n": pa.array(ns, pa.int64()),
                "n_null": pa.array(nulls, pa.int64()),
                "min_val": pa.array(mins, pa.float64()),
                "max_val": pa.array(maxs, pa.float64()),
            }
        )

    base = (
        ds.map_batches(stat_partial, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .groupby("col")
        .agg(
            n=("n", "sum"), n_null=("n_null", "sum"),
            min_val=("min_val", "min"), max_val=("max_val", "max"),
        )
    )

    def enc_partial(batch: pa.Table) -> pa.Table:
        parts = []
        for c in all_cols:
            # SQL count(DISTINCT col) excludes NULLs — drop before encoding
            col = batch.column(c).drop_null()
            if c in str_cols:
                u = pc.unique(col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)
                enc = pc.binary_join_element_wise(
                    pa.array([c] * len(u), pa.string()), u.cast(pa.string()), ":"
                )
            else:
                v = col.cast(pa.int64()) if c == "l_shipdate" else col
                a = v.to_numpy(zero_copy_only=False)
                u = np.unique(a)
                # injective bytes: int64/float64 bit patterns, hex-encoded
                hexs = [u.tobytes()[i * 8 : i * 8 + 8].hex() for i in range(len(u))]
                enc = pa.array([f"{c}:{h}" for h in hexs], pa.string())
            parts.append(pa.table({"pair": enc}))
        return pa.concat_tables(parts)

    def bucket_ndv(group: pa.Table) -> pa.Table:
        u = pc.unique(group.column("pair"))
        col = pc.replace_substring_regex(u, ":.*$", "")
        t = pa.table({"col": col}).group_by(["col"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "col": t.column("col"),
                "nd": pc.cast(t.column("count_all"), pa.int64()),
            }
        )

    ndv = (
        relops.bucketed_groupby(
            ds.map_batches(enc_partial, batch_format="pyarrow", zero_copy_batch=True),
            ["pair"], bucket_ndv,
            empty=pa.table(
                {"col": pa.array([], pa.string()), "nd": pa.array([], pa.int64())}
            ),
        )
        .to_pandas()
        .groupby("col")["nd"].sum()
    )

    base["ndv"] = ndv
    base = base.sort_index().reset_index()
    return pa.table(
        {
            "col": pa.array(base["col"], pa.string()),
            "n": pa.array(base["n"].to_numpy(np.int64)),
            "n_null": pa.array(base["n_null"].to_numpy(np.int64)),
            "ndv": pa.array(base["ndv"].to_numpy(np.int64)),
            "min_val": pa.array(base["min_val"].to_numpy(np.float64)),
            "max_val": pa.array(base["max_val"].to_numpy(np.float64)),
        }
    )


def _analyze_col_sql(col: str, kind: str) -> str:
    if kind == "str":
        mn = mx = "CAST(-1.0 AS DOUBLE)"
    elif kind == "ts":
        mn = f"CAST(epoch_us(min({col})) AS DOUBLE)"
        mx = f"CAST(epoch_us(max({col})) AS DOUBLE)"
    else:
        mn = f"CAST(min({col}) AS DOUBLE)"
        mx = f"CAST(max({col}) AS DOUBLE)"
    return (
        f"SELECT '{col}' AS col, CAST(count(*) AS BIGINT) AS n, "
        f"CAST(count(*) - count({col}) AS BIGINT) AS n_null, "
        f"CAST(count(DISTINCT {col}) AS BIGINT) AS ndv, "
        f"{mn} AS min_val, {mx} AS max_val FROM lineitem"
    )


ANALYZE_STATS_SQL = (
    "SELECT * FROM (\n"
    + "\nUNION ALL\n".join(
        [_analyze_col_sql(c, "num") for c in (
            "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax")]
        + [_analyze_col_sql(c, "str") for c in ("l_returnflag", "l_linestatus")]
        + [_analyze_col_sql("l_shipdate", "ts")]
    )
    + "\n) ORDER BY col"
)


def zorder_layout_lineitem(sf_dir: str):
    """Z-order (Morton-curve) data-layout optimization — the
    Delta/Iceberg ``OPTIMIZE ZORDER BY`` shape: interleave the low 16
    bits of (l_partkey, l_suppkey) into a space-filling-curve key and
    assign every row its GLOBAL clustered position, so rows close in
    BOTH dimensions land in the same output file and two-column range
    predicates prune. The rank is ``relops.global_row_number`` — a
    range-partitioned total order, no node ever holds the table. The
    driver-hashed result is the every-499th-rank slice (the full layout
    is row-scale); a writer would feed the ranked stream straight to
    partitioned parquet."""
    ds = scan(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"],
    )

    def add_z(batch: pa.Table) -> pa.Table:
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        sk = batch.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        z = np.zeros(len(pk), np.int64)
        for i in range(16):
            z |= ((pk >> i) & 1) << (2 * i + 1)
            z |= ((sk >> i) & 1) << (2 * i)
        return batch.append_column("zval", pa.array(z, pa.int64()))

    dz = ds.map_batches(add_z, batch_format="pyarrow", zero_copy_batch=True)
    ranked, _total = relops.global_row_number(
        dz, "zval",
        ["l_partkey", "l_suppkey", "l_orderkey", "l_linenumber"],
        rank_col="rnk",
    )

    def slice_fn(batch: pa.Table) -> pa.Table:
        r = batch.column("rnk").to_numpy(zero_copy_only=False)
        t = batch.take(np.flatnonzero(r % 499 == 0))
        return pa.table(
            {
                "rnk": pc.cast(t.column("rnk"), pa.int64()),
                "zval": t.column("zval"),
                "l_partkey": t.column("l_partkey"),
                "l_suppkey": t.column("l_suppkey"),
            }
        )

    df = (
        ranked.map_batches(slice_fn, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .sort_values("rnk")
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(df, preserve_index=False)


_ZEXPR = " + ".join(
    f"(((l_partkey >> {i}) & 1) << {2 * i + 1}) + "
    f"(((l_suppkey >> {i}) & 1) << {2 * i})"
    for i in range(16)
)

ZORDER_SQL = f"""
WITH z AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
                  CAST({_ZEXPR} AS BIGINT) AS zval
           FROM lineitem),
r AS (SELECT *, row_number() OVER (
        ORDER BY zval, l_partkey, l_suppkey, l_orderkey, l_linenumber) AS rnk
      FROM z)
SELECT CAST(rnk AS BIGINT) AS rnk, zval, l_partkey, l_suppkey
FROM r WHERE rnk % 499 = 0
"""


def bfs_hops_parts(sf_dir: str):
    """Multi-source-free BFS over the co-purchase part graph (parts are
    adjacent iff they appear in the same order): min-hop distance from
    the smallest part key, capped at 4 hops — the iterative frontier-
    expansion kernel beside PageRank/components/triangles. Stages:
    (1) distinct (order, part) pairs map-side; (2) per-order pair
    fan-out inside an order-bucketed exchange (bounded by
    parts-per-order²); (3) edge-bucketed distinct → a ref-backed edge
    dataset reused across rounds; (4) each BFS round is ONE distributed
    ``is_in`` filter pass over the edges with the (node-bounded)
    frontier broadcast — only node-scale sets ever reach the driver.
    Past the node-broadcast gate, keep visited/frontier as datasets and
    swap the collect for a distributed anti-join (the dedup keep-rows
    shape); the edge-side work is already distributed."""
    ds = scan(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    pairs = ds.map_batches(
        lambda b: b.group_by(["l_orderkey", "l_partkey"]).aggregate([]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    edge_empty = pa.table(
        {"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())}
    )

    def order_pairs(group: pa.Table) -> pa.Table:
        d = group.group_by(["l_orderkey", "l_partkey"]).aggregate([])
        idx = pc.sort_indices(
            d, sort_keys=[("l_orderkey", "ascending"), ("l_partkey", "ascending")]
        )
        d = d.take(idx)
        o = d.column("l_orderkey").to_numpy(zero_copy_only=False)
        p = d.column("l_partkey").to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, o[1:] != o[:-1]])
        bounds = np.r_[starts, len(o)]
        us, vs = [], []
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            grp = p[lo:hi]
            if len(grp) > 1:
                iu, iv = np.triu_indices(len(grp), k=1)
                us.append(grp[iu]); vs.append(grp[iv])
        if not us:
            return edge_empty
        u = np.concatenate(us); v = np.concatenate(vs)
        return pa.table(  # both directions
            {
                "u": pa.array(np.concatenate([u, v]), pa.int64()),
                "v": pa.array(np.concatenate([v, u]), pa.int64()),
            }
        )

    raw = relops.bucketed_groupby(pairs, ["l_orderkey"], order_pairs, empty=edge_empty)
    edges = relops.bucketed_groupby(
        raw.map_batches(
            lambda b: b.group_by(["u", "v"]).aggregate([]),
            batch_format="pyarrow", zero_copy_batch=True,
        ),
        ["u", "v"],
        lambda g: g.group_by(["u", "v"]).aggregate([]),
        empty=edge_empty,
    )

    src_df = edges.map_batches(
        lambda b: pa.table({"m": pa.array([pc.min(b.column("u")).as_py()], pa.int64())}),
        batch_format="pyarrow",
    ).to_pandas()
    if src_df.empty or src_df["m"].isna().all():
        return pa.table(
            {"partkey": pa.array([], pa.int64()), "hop": pa.array([], pa.int64())}
        )
    src = int(src_df["m"].min())

    visited: dict[int, int] = {src: 0}
    frontier = {src}
    for hop in range(1, 5):
        fr = pa.array(sorted(frontier), pa.int64())

        def neighbors(batch: pa.Table, fr=fr) -> pa.Table:
            m = pc.is_in(batch.column("u"), value_set=fr)
            return pa.table({"v": pc.unique(batch.filter(m).column("v"))})

        neigh = set(
            edges.map_batches(neighbors, batch_format="pyarrow")
            .to_pandas()["v"].astype(np.int64)
        )
        frontier = neigh - visited.keys()
        if not frontier:
            break
        for n in frontier:
            visited[n] = hop

    out = sorted(visited.items())
    return pa.table(
        {
            "partkey": pa.array([k for k, _ in out], pa.int64()),
            "hop": pa.array([h for _, h in out], pa.int64()),
        }
    )


BFS_HOPS_SQL = """
WITH RECURSIVE lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lp a JOIN lp b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
src AS (SELECT min(u) AS s FROM e),
bfs(n, hop) AS (
  SELECT s, 0 FROM src
  UNION
  SELECT e.v, bfs.hop + 1 FROM bfs JOIN e ON e.u = bfs.n WHERE bfs.hop < 4
)
SELECT n AS partkey, CAST(min(hop) AS BIGINT) AS hop FROM bfs GROUP BY n
"""


def cusum_changepoint_events(sf_dir: str):
    """CUSUM change-point detection over daily event volumes: for each
    event_type, the day where the cumulative deviation from the type's
    mean daily count peaks — the classic level-shift detector for
    telemetry streams. The deviation is kept EXACT by scaling: with D
    observed days and total T, cusum_k = Σ_{i≤k} (D·c_i − T) is pure
    int64, so no float ever enters and the twin matches bit-for-bit.
    Shape: ONE distributed pre-agg collapses the stream to (type, day)
    counts — the only row-scale pass — and the D-length trajectory per
    type is driver-side numpy (days × types rows, microscopic).
    Ties on |cusum| break to the earliest day, mirroring the twin's
    ORDER BY."""
    ds = scan(sf_dir, "events", columns=["ts", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "day": pc.floor_temporal(batch.column("ts"), unit="day"),
            }
        )
        c = t.group_by(["event_type", "day"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "event_type": c.column("event_type"),
                "day": c.column("day"),
                "c": pc.cast(c.column("count_all"), pa.int64()),
            }
        )

    daily = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "day"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()  # days × types rows
        .sort_values(["event_type", "day"])
        .reset_index(drop=True)
    )
    out = []
    for et, g in daily.groupby("event_type", sort=True):
        c = g["c"].to_numpy(np.int64)
        days = g["day"].to_numpy("datetime64[us]")
        D, T = np.int64(len(c)), np.int64(c.sum())
        cusum = np.cumsum(D * c - T)
        k = int(np.argmax(np.abs(cusum)))  # first max = earliest day
        out.append((et, days[k], int(cusum[k]), int(D)))
    return pa.table(
        {
            "event_type": pa.array([r[0] for r in out], pa.string()),
            "cp_day": pa.array([r[1] for r in out], pa.timestamp("us")),
            "cusum_scaled": pa.array([r[2] for r in out], pa.int64()),
            "n_days": pa.array([r[3] for r in out], pa.int64()),
        }
    )


CUSUM_SQL = """
WITH d AS (SELECT event_type, date_trunc('day', ts) AS day,
                  CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS nd,
             CAST(sum(c) AS BIGINT) AS tot
      FROM d GROUP BY 1),
s AS (SELECT d.event_type, d.day, t.nd,
             CAST(sum(t.nd * d.c - t.tot) OVER (
               PARTITION BY d.event_type ORDER BY d.day) AS BIGINT) AS cusum
      FROM d JOIN t USING (event_type)),
m AS (SELECT event_type, day, cusum, nd,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY abs(cusum) DESC, day) AS rn
      FROM s)
SELECT event_type, day AS cp_day, cusum AS cusum_scaled, nd AS n_days
FROM m WHERE rn = 1
"""


def _orphan_counts(child_ds, child_key: str, parent_ds, parent_key: str):
    """(n_orphan_rows, n_rows) of child rows whose key has no parent.

    Scale shape: the child collapses to (key, row_count) partials
    map-side, the parent to a distinct key set — both via ONE bucketed
    exchange each — and a keyset-sized distributed join marks matches.
    Nothing row-scale crosses the wire after the first combiner, and
    neither side is ever broadcast (a 100-TB child may have billions of
    distinct keys)."""

    def local_cnt(batch: pa.Table) -> pa.Table:
        c = pa.table({"k": batch.column(child_key)}).group_by(["k"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {"k": c.column("k"), "cnt": pc.cast(c.column("count_all"), pa.int64())}
        )

    key_empty = pa.table(
        {"k": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
    )

    def bucket_cnt(group: pa.Table) -> pa.Table:
        c = group.group_by(["k"]).aggregate([("cnt", "sum")])
        return pa.table(
            {"k": c.column("k"), "cnt": pc.cast(c.column("cnt_sum"), pa.int64())}
        )

    child_keys = relops.bucketed_groupby(
        child_ds.map_batches(local_cnt, batch_format="pyarrow", zero_copy_batch=True),
        ["k"], bucket_cnt, empty=key_empty,
    )

    def local_distinct(batch: pa.Table) -> pa.Table:
        return pa.table({"pk": pc.unique(batch.column(parent_key))})

    def bucket_distinct(group: pa.Table) -> pa.Table:
        u = pc.unique(group.column("pk"))
        return pa.table(
            {"pk": u, "_has": pa.array(np.ones(len(u), dtype=np.int64))}
        )

    parent_keys = relops.bucketed_groupby(
        parent_ds.map_batches(
            local_distinct, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["pk"], bucket_distinct,
        empty=pa.table(
            {"pk": pa.array([], pa.int64()), "_has": pa.array([], pa.int64())}
        ),
    )

    joined = child_keys.join(
        parent_keys, "left_outer", num_partitions=8, on=("k",), right_on=("pk",)
    )

    def tally(batch: pa.Table) -> pa.Table:
        cnt = batch.column("cnt").to_numpy(zero_copy_only=False)
        if "_has" in batch.column_names:
            has = batch.column("_has").to_numpy(zero_copy_only=False)
            orphan = int(cnt[np.asarray(pd.isna(has))].sum())
        else:
            orphan = int(cnt.sum())
        return pa.table(
            {
                "n_bad": pa.array([orphan], pa.int64()),
                "n": pa.array([int(cnt.sum())], pa.int64()),
            }
        )

    parts = joined.map_batches(tally, batch_format="pyarrow").to_pandas()
    return int(parts["n_bad"].sum()), int(parts["n"].sum())


def dq_audit_tpch(sf_dir: str):
    """Relational data-quality audit — the ingestion gate a warehouse
    runs before accepting a batch: referential-integrity orphans
    (lineitem→orders, orders→customer, customer→nation), duplicate-key
    violations, and domain checks (non-positive quantity/price). One
    row per check with violation and checked counts. Shapes: orphan
    checks via keyset-sized bucketed exchanges + a distributed marker
    join (`_orphan_counts`); dup checks count surplus rows per key
    inside one bucketed exchange; domain checks are single-pass
    combiner scans. The tiny nation key set is the only broadcast."""
    rows: list[tuple[str, int, int]] = []

    # --- domain checks: one combiner pass over lineitem ---------------
    li = scan(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"],
    )

    def li_partial(batch: pa.Table) -> pa.Table:
        q = batch.column("l_quantity")
        p = batch.column("l_extendedprice")
        t = pa.table({"k": batch.column("l_orderkey"), "ln": batch.column("l_linenumber")})
        d = t.group_by(["k", "ln"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "n": pa.array([batch.num_rows], pa.int64()),
                "bad_qty": pa.array(
                    [pc.sum(pc.cast(pc.less_equal(q, 0.0), pa.int64())).as_py() or 0],
                    pa.int64(),
                ),
                "bad_price": pa.array(
                    [pc.sum(pc.cast(pc.less_equal(p, 0.0), pa.int64())).as_py() or 0],
                    pa.int64(),
                ),
                "_pairs": pa.array([d.num_rows], pa.int64()),
            }
        )

    li_stats = li.map_batches(
        li_partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    n_li = int(li_stats["n"].sum())
    rows.append(("lineitem_nonpos_qty", int(li_stats["bad_qty"].sum()), n_li))
    rows.append(("lineitem_nonpos_price", int(li_stats["bad_price"].sum()), n_li))

    # --- duplicate (l_orderkey, l_linenumber): surplus rows per pair --
    def pair_cnt(batch: pa.Table) -> pa.Table:
        c = pa.table(
            {"k": batch.column("l_orderkey"), "ln": batch.column("l_linenumber")}
        ).group_by(["k", "ln"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "k": c.column("k"),
                "ln": c.column("ln"),
                "cnt": pc.cast(c.column("count_all"), pa.int64()),
            }
        )

    def bucket_surplus(group: pa.Table) -> pa.Table:
        c = group.group_by(["k", "ln"]).aggregate([("cnt", "sum")])
        cnt = c.column("cnt_sum").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "surplus": pa.array([int((cnt - 1).sum())], pa.int64()),
            }
        )

    sur = relops.bucketed_groupby(
        li.map_batches(pair_cnt, batch_format="pyarrow", zero_copy_batch=True),
        ["k"], bucket_surplus,
        empty=pa.table({"surplus": pa.array([], pa.int64())}),
    ).to_pandas()
    rows.append(("lineitem_dup_line", int(sur["surplus"].sum()), n_li))

    # --- orphan checks -------------------------------------------------
    orders_keys = scan(sf_dir, "orders", columns=["o_orderkey"])
    n_bad, n = _orphan_counts(
        scan(sf_dir, "lineitem", columns=["l_orderkey"]), "l_orderkey",
        orders_keys, "o_orderkey",
    )
    rows.append(("lineitem_orphan_orderkey", n_bad, n))

    n_bad, n = _orphan_counts(
        scan(sf_dir, "orders", columns=["o_custkey"]), "o_custkey",
        scan(sf_dir, "customer", columns=["c_custkey"]), "c_custkey",
    )
    rows.append(("orders_orphan_custkey", n_bad, n))

    # --- customer→nation: the one genuinely tiny side, broadcast ------
    nation_keys = set(
        pq.read_table(
            os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey"]
        ).column("n_nationkey").to_pylist()
    )
    cust = scan(sf_dir, "customer", columns=["c_nationkey"])
    nk = pa.array(sorted(nation_keys), pa.int64())

    def cust_partial(batch: pa.Table) -> pa.Table:
        ok = pc.is_in(batch.column("c_nationkey"), value_set=nk)
        return pa.table(
            {
                "n": pa.array([batch.num_rows], pa.int64()),
                "bad": pa.array(
                    [batch.num_rows - (pc.sum(pc.cast(ok, pa.int64())).as_py() or 0)],
                    pa.int64(),
                ),
            }
        )

    cs = cust.map_batches(
        cust_partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    rows.append(("customer_bad_nationkey", int(cs["bad"].sum()), int(cs["n"].sum())))

    rows.sort()
    return pa.table(
        {
            "check_name": pa.array([r[0] for r in rows], pa.string()),
            "n_bad": pa.array([r[1] for r in rows], pa.int64()),
            "n_checked": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


DQ_AUDIT_SQL = """
SELECT * FROM (
  SELECT 'customer_bad_nationkey' AS check_name,
         CAST(count(*) FILTER (WHERE n.n_nationkey IS NULL) AS BIGINT) AS n_bad,
         CAST(count(*) AS BIGINT) AS n_checked
  FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
  UNION ALL
  SELECT 'lineitem_dup_line',
         CAST(count(*) - (SELECT count(*) FROM
              (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem)) AS BIGINT),
         CAST(count(*) AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 'lineitem_nonpos_price',
         CAST(count(*) FILTER (WHERE l_extendedprice <= 0) AS BIGINT),
         CAST(count(*) AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 'lineitem_nonpos_qty',
         CAST(count(*) FILTER (WHERE l_quantity <= 0) AS BIGINT),
         CAST(count(*) AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 'lineitem_orphan_orderkey',
         CAST(count(*) FILTER (WHERE o.o_orderkey IS NULL) AS BIGINT),
         CAST(count(*) AS BIGINT)
  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
  UNION ALL
  SELECT 'orders_orphan_custkey',
         CAST(count(*) FILTER (WHERE c.c_custkey IS NULL) AS BIGINT),
         CAST(count(*) AS BIGINT)
  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
) ORDER BY check_name
"""


def tool_assoc_rules_transcripts(sf_dir: str):
    """Market-basket association rules over agent tool usage: for every
    ordered pair of tools used in the same conversation, support,
    confidence and lift (the which-tools-co-occur signal behind tool
    routing and curriculum design). Shape: map-side distinct
    (conv, tool) pairs, ONE conv-bucketed shuffle, per-bucket pair
    fan-out over each conversation's (small) distinct tool set into
    (a, b, n) partials — singles ride the same schema as (a, '') and
    the conv denominator as ('', '') — then a tiny final groupby and
    driver-side rule math: one IEEE division per metric of exact int
    counts, mirrored op-for-op by the twin."""
    ds = relops.scan_path(_transcripts_path(sf_dir), columns=["conv_id", "tool"])

    def pre(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.not_equal(batch.column("tool"), ""))
        return t.group_by(["conv_id", "tool"]).aggregate([])

    pairs = ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)

    empty = pa.table(
        {
            "a": pa.array([], pa.string()),
            "b": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }
    )

    def bucket_fn(group: pa.Table) -> pa.Table:
        d = group.group_by(["conv_id", "tool"]).aggregate([])
        idx = pc.sort_indices(
            d, sort_keys=[("conv_id", "ascending"), ("tool", "ascending")]
        )
        d = d.take(idx)
        conv = np.asarray(d.column("conv_id").to_numpy(zero_copy_only=False))
        tool = np.asarray(d.column("tool").to_numpy(zero_copy_only=False))
        starts = np.flatnonzero(np.r_[True, conv[1:] != conv[:-1]])
        bounds = np.r_[starts, len(conv)]
        a_parts: list[str] = []
        b_parts: list[str] = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            ts_ = tool[s:e]
            m = len(ts_)
            if m > 1:
                ii, jj = np.triu_indices(m, k=1)
                a_parts.extend(ts_[ii])
                b_parts.extend(ts_[jj])
                a_parts.extend(ts_[jj])
                b_parts.extend(ts_[ii])
        # pairs, then singles as (a, ''), then one ('', '') row per conv
        t = pa.table(
            {
                "a": pa.array(
                    list(a_parts) + list(tool) + [""] * len(starts), pa.string()
                ),
                "b": pa.array(
                    list(b_parts) + [""] * len(tool) + [""] * len(starts),
                    pa.string(),
                ),
            }
        )
        c = t.group_by(["a", "b"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "a": c.column("a"),
                "b": c.column("b"),
                "n": pc.cast(c.column("count_all"), pa.int64()),
            }
        )

    part = relops.bucketed_groupby(pairs, ["conv_id"], bucket_fn, empty=empty)
    agg = (
        part.groupby(["a", "b"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # ≤ tools² + tools + 1 rows
    )
    counts = {(r["a"], r["b"]): int(r["n"]) for _, r in agg.iterrows()}
    n_convs = counts.pop(("", ""), 0)
    singles = {a: n for (a, b), n in counts.items() if b == ""}
    rows = sorted((a, b, n) for (a, b), n in counts.items() if b != "")
    tool_a = [r[0] for r in rows]
    tool_b = [r[1] for r in rows]
    n_ab = [r[2] for r in rows]
    n_a = [singles[a] for a in tool_a]
    n_b = [singles[b] for b in tool_b]
    support = [float(x) / float(n_convs) for x in n_ab]
    confidence = [float(x) / float(y) for x, y in zip(n_ab, n_a)]
    lift = [
        (float(x) * float(n_convs)) / (float(y) * float(z))
        for x, y, z in zip(n_ab, n_a, n_b)
    ]
    return pa.table(
        {
            "tool_a": pa.array(tool_a, pa.string()),
            "tool_b": pa.array(tool_b, pa.string()),
            "n_ab": pa.array(n_ab, pa.int64()),
            "n_a": pa.array(n_a, pa.int64()),
            "n_b": pa.array(n_b, pa.int64()),
            "support": pa.array(support, pa.float64()),
            "confidence": pa.array(confidence, pa.float64()),
            "lift": pa.array(lift, pa.float64()),
        }
    )


def tool_assoc_rules_transcripts_sql(sf_dir: str | None = None) -> str:
    path = _transcripts_sql_source(sf_dir)
    return f"""
WITH ct AS (SELECT DISTINCT conv_id, tool FROM read_parquet('{path}')
            WHERE tool <> ''),
n AS (SELECT CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs FROM ct),
s AS (SELECT tool, CAST(count(*) AS BIGINT) AS n_tool FROM ct GROUP BY tool),
p AS (SELECT x.tool AS tool_a, y.tool AS tool_b, CAST(count(*) AS BIGINT) AS n_ab
      FROM ct x JOIN ct y ON x.conv_id = y.conv_id AND x.tool <> y.tool
      GROUP BY x.tool, y.tool)
SELECT p.tool_a, p.tool_b, p.n_ab, sa.n_tool AS n_a, sb.n_tool AS n_b,
       CAST(p.n_ab AS DOUBLE) / n.n_convs AS support,
       CAST(p.n_ab AS DOUBLE) / sa.n_tool AS confidence,
       (CAST(p.n_ab AS DOUBLE) * n.n_convs)
         / (CAST(sa.n_tool AS DOUBLE) * sb.n_tool) AS lift
FROM p JOIN s sa ON sa.tool = p.tool_a JOIN s sb ON sb.tool = p.tool_b, n
"""


#: rational quantiles for the exact-selection op: (numerator, denominator, label)
_QUANT_FRACS = [(1, 4, "p25"), (1, 2, "p50"), (3, 4, "p75"),
                (9, 10, "p90"), (99, 100, "p99")]


def exact_quantiles_lineitem(sf_dir: str):
    """EXACT global quantiles of ``l_extendedprice`` by distributed rank
    selection (``relops.select_quantiles``) — the Munro-Paterson shape:
    sampled range buckets → one column-pruned histogram pass → only the
    ≤5 rank-owning buckets (each ~n/num_buckets rows) are shuffled and
    locally sorted. NO global sort, and the driver never sees more than
    the histogram + 5 values. Ranks are pure integer math
    ``ceil(q·n) = (qn·n + qd - 1) // qd``, so the twin's ``//`` agrees
    bit-for-bit; the value at a global rank is well-defined under
    duplicates regardless of tie order. Contrast with
    ``price_quantiles_approx`` (sketch): this is the exact companion."""
    ds = scan(sf_dir, "lineitem", columns=["l_extendedprice"])
    values, ranks, _total = relops.select_quantiles(
        ds, "l_extendedprice", [(n, d) for n, d, _ in _QUANT_FRACS]
    )
    return pa.table(
        {
            "pct": pa.array([lbl for _, _, lbl in _QUANT_FRACS], pa.string()),
            "rank": pa.array(ranks, pa.int64()),
            "value": pa.array([float(v) for v in values], pa.float64()),
        }
    )


EXACT_QUANTILES_SQL = """
WITH t AS (SELECT l_extendedprice AS v FROM lineitem),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM t),
f AS (SELECT * FROM (VALUES ('p25', 1, 4), ('p50', 1, 2), ('p75', 3, 4),
                            ('p90', 9, 10), ('p99', 99, 100)) AS f(pct, qn, qd)),
k AS (SELECT pct, CAST((qn * n.n + qd - 1) // qd AS BIGINT) AS rank FROM f, n),
s AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM t)
SELECT k.pct, k.rank, s.v AS value
FROM k JOIN s ON s.rn = k.rank
"""


def funnel_events(sf_dir: str):
    """Ordered conversion funnel view → click → purchase per user: t1 =
    first view, t2 = first click strictly after t1, t3 = first purchase
    strictly after t2 — the product-analytics kernel (Amplitude/GA
    shape). ONE user-bucketed exchange is the only shuffle: every user's
    rows land in one bucket, where the chained firsts are three
    vectorized groupby-min passes (no per-user dispatch); each bucket
    emits a single 5-int partial row and the driver sums ~num_buckets
    rows. Time-to-convert is the EXACT int64 µs sum over converting
    users, so the twin's date_diff sum matches bit-for-bit."""
    ds = scan(sf_dir, "events", columns=["user_id", "event_type", "ts"])
    steps = pa.array(["view", "click", "purchase"], pa.string())

    pre = ds.map_batches(
        lambda t: t.filter(pc.is_in(t.column("event_type"), value_set=steps)),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    cols = ["n_step1", "n_step2", "n_step3", "sum_us_12", "sum_us_13"]
    empty = pa.table({c: pa.array([], pa.int64()) for c in cols})

    def per_bucket(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        t = df["ts"].to_numpy("datetime64[us]").view("int64")
        df = pd.DataFrame({"u": df["user_id"], "e": df["event_type"], "t": t})
        t1 = df[df["e"] == "view"].groupby("u")["t"].min()

        def first_after(etype: str, prev: pd.Series) -> pd.Series:
            s = df[df["e"] == etype]
            p = prev.reindex(s["u"]).to_numpy()
            s = s[(~np.isnan(p)) & (s["t"].to_numpy() > p)]
            return s.groupby("u")["t"].min()

        t2 = first_after("click", t1)
        t3 = first_after("purchase", t2)
        vals = [
            len(t1), len(t2), len(t3),
            int((t2 - t1.reindex(t2.index)).sum()),
            int((t3 - t1.reindex(t3.index)).sum()),
        ]
        return pa.table({c: pa.array([v], pa.int64()) for c, v in zip(cols, vals)})

    partials = relops.bucketed_groupby(pre, ["user_id"], per_bucket, empty=empty)
    tot = partials.to_pandas().sum()  # ~num_buckets rows
    return pa.table({c: pa.array([int(tot[c])], pa.int64()) for c in cols})


FUNNEL_SQL = """
WITH t1 AS (SELECT user_id, min(ts) AS t1 FROM events
            WHERE event_type = 'view' GROUP BY 1),
t2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN t1 USING (user_id)
       WHERE e.event_type = 'click' AND e.ts > t1.t1 GROUP BY 1),
t3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN t2 USING (user_id)
       WHERE e.event_type = 'purchase' AND e.ts > t2.t2 GROUP BY 1)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM t1) AS n_step1,
       (SELECT CAST(count(*) AS BIGINT) FROM t2) AS n_step2,
       (SELECT CAST(count(*) AS BIGINT) FROM t3) AS n_step3,
       (SELECT COALESCE(CAST(sum(date_diff('microsecond', t1.t1, t2.t2))
                             AS BIGINT), 0)
        FROM t2 JOIN t1 USING (user_id)) AS sum_us_12,
       (SELECT COALESCE(CAST(sum(date_diff('microsecond', t1.t1, t3.t3))
                             AS BIGINT), 0)
        FROM t3 JOIN t1 USING (user_id)) AS sum_us_13
"""


def corpus_divergence_documents(sf_dir: str):
    """Vocabulary-drift detector between two corpus slices (here: doc_id
    parity — stand-in for crawl snapshots / domains / time windows):
    add-one-smoothed unigram KL(A‖B) and KL(B‖A) over the union vocab.
    Decomposition keeps distributed sums EXACT: KL(A‖B) =
    (1/(Ta+V))·Σ_w (ca+1)·ln[((ca+1)(Tb+V))/((cb+1)(Ta+V))], so the
    per-word term is quantized to an int64 1e-6 grid and summation order
    cannot flip the hash; the final scale-out is ONE IEEE division.
    Shape: per-batch (word, ca, cb) combiner partials → ONE word-bucketed
    exchange → a vocabulary-scale table (materialized: keyset-sized, not
    corpus-sized) reused for totals and terms. No broadcast, no second
    corpus pass."""
    ds = scan(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        parent, flat, _ = _exploded_words(batch)
        half = (np.asarray(parent, dtype=np.int64) % 2)
        t = pa.table(
            {
                "word": flat,
                "a": pa.array(1 - half, type=pa.int64()),
                "b": pa.array(half, type=pa.int64()),
            }
        )
        g = t.group_by(["word"]).aggregate([("a", "sum"), ("b", "sum")])
        return pa.table(
            {
                "word": g.column("word"),
                "ca": pc.cast(g.column("a_sum"), pa.int64()),
                "cb": pc.cast(g.column("b_sum"), pa.int64()),
            }
        )

    empty = pa.table(
        {
            "word": pa.array([], pa.string()),
            "ca": pa.array([], pa.int64()),
            "cb": pa.array([], pa.int64()),
        }
    )

    def bucket(group: pa.Table) -> pa.Table:
        g = group.group_by(["word"]).aggregate([("ca", "sum"), ("cb", "sum")])
        return pa.table(
            {
                "word": g.column("word"),
                "ca": pc.cast(g.column("ca_sum"), pa.int64()),
                "cb": pc.cast(g.column("cb_sum"), pa.int64()),
            }
        )

    wc = relops.bucketed_groupby(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["word"], bucket, empty=empty,
    ).materialize()  # vocabulary-scale

    tot = wc.aggregate(Sum("ca", alias_name="ta"), Sum("cb", alias_name="tb"))
    ta, tb = int(tot["ta"]), int(tot["tb"])
    v = wc.count()

    def terms(batch: pa.Table) -> pa.Table:
        ca = batch.column("ca").to_numpy(zero_copy_only=False)
        cb = batch.column("cb").to_numpy(zero_copy_only=False)
        num_ab = ((ca + 1) * (tb + v)).astype(np.float64)
        den_ab = ((cb + 1) * (ta + v)).astype(np.float64)
        qab = np.round(
            (ca + 1).astype(np.float64) * np.log(num_ab / den_ab) * 1e6
        ).astype(np.int64)
        qba = np.round(
            (cb + 1).astype(np.float64) * np.log(den_ab / num_ab) * 1e6
        ).astype(np.int64)
        return pa.table({"qab": pa.array(qab), "qba": pa.array(qba)})

    s = wc.map_batches(terms, batch_format="pyarrow", zero_copy_batch=True).aggregate(
        Sum("qab", alias_name="sab"), Sum("qba", alias_name="sba")
    )
    sab, sba = int(s["sab"]), int(s["sba"])
    return pa.table(
        {
            "vocab": pa.array([v], pa.int64()),
            "total_a": pa.array([ta], pa.int64()),
            "total_b": pa.array([tb], pa.int64()),
            "sum_q_ab": pa.array([sab], pa.int64()),
            "sum_q_ba": pa.array([sba], pa.int64()),
            "kl_ab": pa.array([(float(sab) / 1e6) / float(ta + v)], pa.float64()),
            "kl_ba": pa.array([(float(sba) / 1e6) / float(tb + v)], pa.float64()),
        }
    )


CORPUS_DIVERGENCE_SQL = """
WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
c AS (SELECT word,
        CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
      FROM w GROUP BY word),
t AS (SELECT CAST(sum(ca) AS BIGINT) AS ta, CAST(sum(cb) AS BIGINT) AS tb,
             CAST(count(*) AS BIGINT) AS v FROM c),
q AS (SELECT
        CAST(round((c.ca + 1) * ln(CAST((c.ca + 1) * (t.tb + t.v) AS DOUBLE)
                                   / CAST((c.cb + 1) * (t.ta + t.v) AS DOUBLE))
                   * 1000000) AS BIGINT) AS qab,
        CAST(round((c.cb + 1) * ln(CAST((c.cb + 1) * (t.ta + t.v) AS DOUBLE)
                                   / CAST((c.ca + 1) * (t.tb + t.v) AS DOUBLE))
                   * 1000000) AS BIGINT) AS qba
      FROM c, t)
SELECT t.v AS vocab, t.ta AS total_a, t.tb AS total_b,
       CAST(sum(q.qab) AS BIGINT) AS sum_q_ab,
       CAST(sum(q.qba) AS BIGINT) AS sum_q_ba,
       (CAST(sum(q.qab) AS DOUBLE) / 1000000.0) / (t.ta + t.v) AS kl_ab,
       (CAST(sum(q.qba) AS DOUBLE) / 1000000.0) / (t.tb + t.v) AS kl_ba
FROM q, t GROUP BY t.v, t.ta, t.tb
"""


def selfrep_adjacent_transcripts(sf_dir: str):
    """Degenerate-loop detector for agent traces: word-3-gram-set Jaccard
    between CONSECUTIVE assistant turns of a conversation (an agent
    stuck in a retry loop emits near-identical successive responses —
    the complement of ``context_repeat``'s quote-of-earlier-context
    signal). Emits one row per adjacent assistant-turn pair with a
    non-empty gram union: (conv_id, turn_a, turn_b, n_inter, n_union,
    jac) where jac is ONE IEEE division of exact ints.

    Shape: role filter + (conv, turn, text) distinct map-side, then ONE
    conv-bucketed exchange; inside a bucket the adjacent-pair walk runs
    over rows sorted by (conv, turn) with per-turn gram sets built once
    and reused for both neighbors — no join, no gram shuffle (gram text
    never leaves the bucket)."""
    ds = relops.scan_path(
        _transcripts_path(sf_dir), columns=["conv_id", "turn_idx", "role", "text"]
    )

    def pre(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.equal(batch.column("role"), "assistant"))
        return b.group_by(["conv_id", "turn_idx", "text"]).aggregate([])

    rows = ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)

    empty = pa.table(
        {
            "conv_id": pa.array([], pa.string()),
            "turn_a": pa.array([], pa.int32()),
            "turn_b": pa.array([], pa.int32()),
            "n_inter": pa.array([], pa.int64()),
            "n_union": pa.array([], pa.int64()),
            "jac": pa.array([], pa.float64()),
        }
    )

    def per_bucket(group: pa.Table) -> pa.Table:
        d = group.group_by(["conv_id", "turn_idx", "text"]).aggregate([])
        df = d.to_pandas().sort_values(["conv_id", "turn_idx"])
        out: list[tuple] = []
        prev_conv, prev_turn, prev_set = None, None, set()
        for c, t, x in zip(df["conv_id"], df["turn_idx"], df["text"]):
            # single-space split (NOT .split()): transcript text carries
            # \n/\t/double spaces and the twin's string_split(text, ' ')
            # keeps them inside tokens — both sides must agree exactly
            toks = (x or "").split(" ")
            s = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
            if c == prev_conv:
                inter = len(s & prev_set)
                union = len(s) + len(prev_set) - inter
                if union > 0:
                    out.append((c, prev_turn, t, inter, union, inter / union))
            prev_conv, prev_turn, prev_set = c, t, s
        if not out:
            return empty
        return pa.table(
            {
                "conv_id": pa.array([r[0] for r in out], pa.string()),
                "turn_a": pa.array([int(r[1]) for r in out], pa.int32()),
                "turn_b": pa.array([int(r[2]) for r in out], pa.int32()),
                "n_inter": pa.array([r[3] for r in out], pa.int64()),
                "n_union": pa.array([r[4] for r in out], pa.int64()),
                "jac": pa.array([r[5] for r in out], pa.float64()),
            }
        )

    return relops.bucketed_groupby(rows, ["conv_id"], per_bucket, empty=empty)


def selfrep_adjacent_transcripts_sql(sf_dir: str | None = None) -> str:
    path = _transcripts_sql_source(sf_dir)
    return f"""
WITH d AS (SELECT DISTINCT conv_id, turn_idx, text
           FROM read_parquet('{path}') WHERE role = 'assistant'),
p AS (SELECT conv_id, turn_idx AS turn_a, text AS xa,
             lead(turn_idx) OVER w AS turn_b, lead(text) OVER w AS xb
      FROM d WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)),
pr AS MATERIALIZED (SELECT * FROM p WHERE turn_b IS NOT NULL),
ga AS (SELECT DISTINCT conv_id, turn_a, turn_b,
              w[CAST(i AS INTEGER)] || ' ' || w[CAST(i + 1 AS INTEGER)] || ' '
                || w[CAST(i + 2 AS INTEGER)] AS gram
       FROM (SELECT conv_id, turn_a, turn_b, string_split(xa, ' ') AS w FROM pr),
            unnest(range(1, len(w) - 1)) t(i)),
gb AS (SELECT DISTINCT conv_id, turn_a, turn_b,
              w[CAST(i AS INTEGER)] || ' ' || w[CAST(i + 1 AS INTEGER)] || ' '
                || w[CAST(i + 2 AS INTEGER)] AS gram
       FROM (SELECT conv_id, turn_a, turn_b, string_split(xb, ' ') AS w FROM pr),
            unnest(range(1, len(w) - 1)) t(i)),
na AS (SELECT conv_id, turn_a, turn_b, CAST(count(*) AS BIGINT) AS na
       FROM ga GROUP BY 1, 2, 3),
nb AS (SELECT conv_id, turn_a, turn_b, CAST(count(*) AS BIGINT) AS nb
       FROM gb GROUP BY 1, 2, 3),
ii AS (SELECT ga.conv_id, ga.turn_a, ga.turn_b, CAST(count(*) AS BIGINT) AS ni
       FROM ga JOIN gb USING (conv_id, turn_a, turn_b, gram) GROUP BY 1, 2, 3),
j AS (SELECT pr.conv_id, pr.turn_a, pr.turn_b,
             COALESCE(ii.ni, 0) AS n_inter,
             COALESCE(na.na, 0) + COALESCE(nb.nb, 0) - COALESCE(ii.ni, 0)
               AS n_union
      FROM pr LEFT JOIN na USING (conv_id, turn_a, turn_b)
              LEFT JOIN nb USING (conv_id, turn_a, turn_b)
              LEFT JOIN ii USING (conv_id, turn_a, turn_b))
SELECT conv_id, turn_a, turn_b, n_inter, n_union,
       CAST(n_inter AS DOUBLE) / n_union AS jac
FROM j WHERE n_union > 0
"""


def running_balance_events(sf_dir: str):
    """Per-user running balance: cumulative value over each user's event
    stream in (ts, event_id) order — the ROWS UNBOUNDED PRECEDING window
    every ledger/metering pipeline needs, output at ROW scale (one row
    per event). Shape: ONE user-bucketed exchange; inside a bucket the
    cumsum is a single vectorized pass over rows sorted by (user, ts,
    event_id) — a global np.cumsum with per-user segment offsets
    subtracted (np.repeat of the boundary prefix), NO per-user dispatch.
    Values ride the exact 1e-2 cents grid (int64), so distributed order
    cannot flip the hash; the double `running` is one int→double
    division mirrored by the twin."""
    ds = scan(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    empty = pa.table(
        {
            "event_id": pa.array([], pa.int64()),
            "user_id": pa.array([], pa.int64()),
            "running_cents": pa.array([], pa.int64()),
            "running": pa.array([], pa.float64()),
        }
    )

    def per_bucket(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[("user_id", "ascending"), ("ts", "ascending"),
                          ("event_id", "ascending")]
        )
        g = g.take(idx)
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        c = _cents(g.column("value"), 100).to_numpy(zero_copy_only=False)
        cs = np.cumsum(c)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        offsets = np.empty(len(starts), dtype=np.int64)
        offsets[0] = 0
        offsets[1:] = cs[starts[1:] - 1]
        reps = np.diff(np.r_[starts, len(u)])
        run = cs - np.repeat(offsets, reps)
        return pa.table(
            {
                "event_id": g.column("event_id"),
                "user_id": g.column("user_id"),
                "running_cents": pa.array(run, pa.int64()),
                "running": pa.array(run.astype(np.float64) / 100.0, pa.float64()),
            }
        )

    return relops.bucketed_groupby(ds, ["user_id"], per_bucket, empty=empty)


RUNNING_BALANCE_SQL = """
WITH r AS (SELECT event_id, user_id,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents
           FROM events)
SELECT event_id, user_id, running_cents,
       CAST(running_cents AS DOUBLE) / 100.0 AS running
FROM r
"""


def incremental_mv_orders(sf_dir: str):
    """Incremental materialized-view maintenance: a daily
    (n_orders, sum_cents) revenue MV is REFRESHED from a CDC change
    stream by delta algebra instead of recomputation — updates
    (every 7th key: price replaced by the absolute 100000 + k % 9973)
    contribute (day, 0, new−old), inserts (every 13th key, keyed −k−1)
    contribute (day, +1, +price); the refreshed MV must equal the full
    recompute over the upserted table, which is exactly what the twin
    does. Shape: the base MV is one combiner pass (the artifact a real
    deployment already has on disk); the refresh itself touches ONLY the
    affected base rows (here a predicate-pushdown filtered pass; a
    keyed CDC feed would fetch them with the keyset-scale
    ``size_gated_join``) and ships day-keyed int partials — never the
    table. Money stays in exact int cents; the one double division is
    mirrored by the twin."""
    ds = scan(sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_totalprice"])

    def base_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "d": pc.floor_temporal(batch.column("o_orderdate"), unit="day"),
                "n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
                "s": _cents(batch.column("o_totalprice"), 100),
            }
        )
        g = t.group_by(["d"]).aggregate([("n", "sum"), ("s", "sum")])
        return g.rename_columns(["d", "n", "s"])

    base_mv = (
        ds.map_batches(base_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("d")
        .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"))
        .to_pandas()  # days-scale
    )

    def delta_partial(batch: pa.Table) -> pa.Table:
        k = batch.column("o_orderkey").to_numpy(zero_copy_only=False)
        d = pc.floor_temporal(batch.column("o_orderdate"), unit="day")
        p = _cents(batch.column("o_totalprice"), 100).to_numpy(zero_copy_only=False)
        upd = np.flatnonzero(k % 7 == 0)
        ins = np.flatnonzero(k % 13 == 0)
        new_p = 100000 + (k[upd] % 9973)
        t = pa.table(
            {
                "d": pa.concat_arrays([d.take(pa.array(upd)).combine_chunks(),
                                       d.take(pa.array(ins)).combine_chunks()]),
                "dn": pa.array(
                    np.r_[np.zeros(len(upd), dtype=np.int64),
                          np.ones(len(ins), dtype=np.int64)]
                ),
                "dsum": pa.array(np.r_[new_p - p[upd], p[ins]], type=pa.int64()),
            }
        )
        g = t.group_by(["d"]).aggregate([("dn", "sum"), ("dsum", "sum")])
        return g.rename_columns(["d", "dn", "dsum"])

    delta = (
        ds.map_batches(delta_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("d")
        .aggregate(Sum("dn", alias_name="dn"), Sum("dsum", alias_name="dsum"))
        .to_pandas()
    )

    mv = base_mv.merge(delta, on="d", how="outer").fillna(0)
    n = (mv["n"].to_numpy(np.int64) + mv["dn"].to_numpy(np.int64))
    s = (mv["s"].to_numpy(np.int64) + mv["dsum"].to_numpy(np.int64))
    order = np.argsort(mv["d"].to_numpy("datetime64[us]"))
    return pa.table(
        {
            "order_day": pa.array(mv["d"].to_numpy("datetime64[us]")[order],
                                  pa.timestamp("us")),
            "n_orders": pa.array(n[order], pa.int64()),
            "sum_cents": pa.array(s[order], pa.int64()),
            "revenue": pa.array(s[order].astype(np.float64) / 100.0, pa.float64()),
        }
    )


INCREMENTAL_MV_SQL = """
WITH base AS (SELECT o_orderkey AS k, date_trunc('day', o_orderdate) AS d,
                     CAST(round(o_totalprice * 100) AS BIGINT) AS p, 0 AS ver
              FROM orders),
chg AS (SELECT k, d, CAST(100000 + (k % 9973) AS BIGINT) AS p, 1 AS ver
        FROM base WHERE k % 7 = 0
        UNION ALL
        SELECT -k - 1, d, p, 1 FROM base WHERE k % 13 = 0),
all_rows AS (SELECT * FROM base UNION ALL SELECT * FROM chg),
m AS (SELECT *, row_number() OVER (PARTITION BY k ORDER BY ver DESC) AS rn
      FROM all_rows)
SELECT d AS order_day, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(p) AS BIGINT) AS sum_cents,
       CAST(sum(p) AS DOUBLE) / 100.0 AS revenue
FROM m WHERE rn = 1 GROUP BY d
"""


def pivot_users_events(sf_dir: str):
    """PIVOT / crosstab: one row per user with per-event-type counts as
    COLUMNS (long→wide, the warehouse `PIVOT ... FOR type IN (...)`).
    Shape: (user, type) count partials collapse map-side, ONE
    user-bucketed exchange, and the widening is a vectorized pandas
    unstack per bucket — output rows scale with users, never events.
    Unknown event types are ignored (the fixed IN-list, as in SQL);
    absent combinations fill 0."""
    ds = scan(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["user_id", "event_type"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "user_id": g.column("user_id"),
                "event_type": g.column("event_type"),
                "n": pc.cast(g.column("count_all"), pa.int64()),
            }
        )

    cols = [f"n_{t}" for t in _EVENT_TYPES]
    empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            **{c: pa.array([], pa.int64()) for c in cols},
            "n_total": pa.array([], pa.int64()),
        }
    )

    def per_bucket(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        df = df[df["event_type"].isin(_EVENT_TYPES)]
        if df.empty:
            return empty
        wide = (
            df.groupby(["user_id", "event_type"])["n"].sum().unstack(fill_value=0)
            .reindex(columns=_EVENT_TYPES, fill_value=0)
        )
        return pa.table(
            {
                "user_id": pa.array(wide.index.to_numpy(np.int64), pa.int64()),
                **{
                    f"n_{t}": pa.array(wide[t].to_numpy(np.int64), pa.int64())
                    for t in _EVENT_TYPES
                },
                "n_total": pa.array(
                    wide.to_numpy().sum(axis=1).astype(np.int64), pa.int64()
                ),
            }
        )

    return relops.bucketed_groupby(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"], per_bucket, empty=empty,
    )


PIVOT_USERS_SQL = """
SELECT user_id,
  CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS n_click,
  CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS n_error,
  CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS n_purchase,
  CAST(count(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS n_signup,
  CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS n_view,
  CAST(count(CASE WHEN event_type IN ('click','error','purchase','signup','view')
             THEN 1 END) AS BIGINT) AS n_total
FROM events GROUP BY user_id
"""


def grouped_median_lineitem(sf_dir: str):
    """Exact GROUPED quantiles (median + p90 of l_quantity per
    returnflag) through the low-cardinality-domain path: the global
    ``select_quantiles`` range-partitions a continuous domain, but an
    integer-like domain (quantities 1..50) collapses to a (group, value)
    COUNTING HISTOGRAM — one combiner pass, a groups×values-sized
    groupby, and the rank walk ``k = ceil(q·n)`` happens driver-side on
    the tiny histogram. No row ever shuffles. Rank math is the same
    pure-integer ``(qn·n + qd − 1) // qd`` the twin uses."""
    ds = scan(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["l_returnflag", "l_quantity"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {
                "flag": g.column("l_returnflag"),
                "v": g.column("l_quantity"),
                "n": pc.cast(g.column("count_all"), pa.int64()),
            }
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["flag", "v"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # groups × distinct values
        .sort_values(["flag", "v"])
    )
    out = []
    for flag, g in hist.groupby("flag", sort=True):
        v = g["v"].to_numpy(np.float64)
        c = g["n"].to_numpy(np.int64)
        cum = np.cumsum(c)
        n = int(cum[-1])
        med = v[np.searchsorted(cum, (n + 1) // 2)]
        p90 = v[np.searchsorted(cum, (9 * n + 9) // 10)]
        out.append((flag, n, float(med), float(p90)))
    return pa.table(
        {
            "l_returnflag": pa.array([r[0] for r in out], pa.string()),
            "n": pa.array([r[1] for r in out], pa.int64()),
            "median_qty": pa.array([r[2] for r in out], pa.float64()),
            "p90_qty": pa.array([r[3] for r in out], pa.float64()),
        }
    )


GROUPED_MEDIAN_SQL = """
WITH s AS (SELECT l_returnflag, l_quantity AS v,
                  row_number() OVER (PARTITION BY l_returnflag
                                     ORDER BY l_quantity) AS rn,
                  count(*) OVER (PARTITION BY l_returnflag) AS n
           FROM lineitem)
SELECT l_returnflag, CAST(max(n) AS BIGINT) AS n,
       max(CASE WHEN rn = (n + 1) // 2 THEN v END) AS median_qty,
       max(CASE WHEN rn = (9 * n + 9) // 10 THEN v END) AS p90_qty
FROM s GROUP BY l_returnflag
"""


def concat_orders_customer(sf_dir: str):
    """Ordered list aggregation (collect_list / string_agg): per
    customer, the comma-joined ascending o_orderkey list — the
    feature-store "events as one string per entity" shape. ONE
    cust-bucketed exchange; inside a bucket rows sort once by
    (cust, key) and the join is a per-group reduction over the
    already-sorted run. Output rows scale with customers, never
    orders; ORDER BY inside the aggregate makes the result
    deterministic, matching the twin's ``string_agg(... ORDER BY)``."""
    ds = scan(sf_dir, "orders", columns=["o_custkey", "o_orderkey"])

    empty = pa.table(
        {
            "o_custkey": pa.array([], pa.int64()),
            "n_orders": pa.array([], pa.int64()),
            "order_keys": pa.array([], pa.string()),
        }
    )

    def per_bucket(group: pa.Table) -> pa.Table:
        df = group.to_pandas().sort_values(["o_custkey", "o_orderkey"])
        keys = df["o_orderkey"].astype(str)
        agg = (
            pd.DataFrame({"c": df["o_custkey"], "k": keys})
            .groupby("c")["k"]
            .agg(n_orders="size", order_keys=",".join)
            .reset_index()
        )
        return pa.table(
            {
                "o_custkey": pa.array(agg["c"].to_numpy(np.int64), pa.int64()),
                "n_orders": pa.array(agg["n_orders"].to_numpy(np.int64), pa.int64()),
                "order_keys": pa.array(agg["order_keys"], pa.string()),
            }
        )

    return relops.bucketed_groupby(ds, ["o_custkey"], per_bucket, empty=empty)


CONCAT_ORDERS_SQL = """
SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
       string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey)
         AS order_keys
FROM orders GROUP BY o_custkey
"""


def tool_retry_loops_transcripts(sf_dir: str):
    """Structural retry-loop detector for agent traces: maximal runs of
    ≥2 CONSECUTIVE identical tool calls within a conversation (the agent
    hammering the same tool — the companion to ``selfrep_adjacent``'s
    text-level signal). "Consecutive" is defined on the subsequence of
    tool turns ordered by turn_idx, so interleaved user/assistant turns
    don't break a run. Emits (conv_id, tool, run_len, start_turn,
    end_turn) per island. Shape: role filter + (conv, turn, tool)
    distinct map-side (re-logged feed rows collapse), ONE conv-bucketed
    exchange, vectorized run-length over the bucket-sorted rows — the
    gaps-and-islands kernel with no window shuffle."""
    ds = relops.scan_path(
        _transcripts_path(sf_dir), columns=["conv_id", "turn_idx", "role", "tool"]
    )

    def pre(batch: pa.Table) -> pa.Table:
        b = batch.filter(
            pc.and_(
                pc.equal(batch.column("role"), "tool"),
                pc.not_equal(batch.column("tool"), ""),
            )
        )
        return b.group_by(["conv_id", "turn_idx", "tool"]).aggregate([])

    rows = ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)

    empty = pa.table(
        {
            "conv_id": pa.array([], pa.string()),
            "tool": pa.array([], pa.string()),
            "run_len": pa.array([], pa.int64()),
            "start_turn": pa.array([], pa.int32()),
            "end_turn": pa.array([], pa.int32()),
        }
    )

    def per_bucket(group: pa.Table) -> pa.Table:
        d = group.group_by(["conv_id", "turn_idx", "tool"]).aggregate([])
        d = d.take(pc.sort_indices(
            d, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
        ))
        conv = d.column("conv_id").to_numpy(zero_copy_only=False)
        tool = d.column("tool").to_numpy(zero_copy_only=False)
        turn = d.column("turn_idx").to_numpy(zero_copy_only=False)
        n = len(conv)
        if n == 0:
            return empty
        brk = np.r_[True, (conv[1:] != conv[:-1]) | (tool[1:] != tool[:-1])]
        starts = np.flatnonzero(brk)
        lens = np.diff(np.r_[starts, n])
        keep = lens >= 2
        s, ln = starts[keep], lens[keep]
        return pa.table(
            {
                "conv_id": pa.array(conv[s], pa.string()),
                "tool": pa.array(tool[s], pa.string()),
                "run_len": pa.array(ln.astype(np.int64), pa.int64()),
                "start_turn": pa.array(turn[s].astype(np.int32), pa.int32()),
                "end_turn": pa.array(turn[s + ln - 1].astype(np.int32), pa.int32()),
            }
        )

    return relops.bucketed_groupby(rows, ["conv_id"], per_bucket, empty=empty)


def tool_retry_loops_transcripts_sql(sf_dir: str | None = None) -> str:
    path = _transcripts_sql_source(sf_dir)
    return f"""
WITH d AS (SELECT DISTINCT conv_id, turn_idx, tool
           FROM read_parquet('{path}')
           WHERE role = 'tool' AND tool <> ''),
s AS (SELECT conv_id, turn_idx, tool,
             row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx)
             - row_number() OVER (PARTITION BY conv_id, tool ORDER BY turn_idx)
               AS grp
      FROM d)
SELECT conv_id, tool, CAST(count(*) AS BIGINT) AS run_len,
       min(turn_idx) AS start_turn, max(turn_idx) AS end_turn
FROM s GROUP BY conv_id, tool, grp HAVING count(*) >= 2
"""


def histogram_value_events(sf_dir: str):
    """Equi-width numeric histogram of the event value (16 bins between
    the exact min and max) — the column-profiling pass behind every
    planner/quality dashboard. All boundary math is PURE INTEGER on the
    1e-2 cents grid: bin = (v−min)·16 // (max−min+1), bounds via the
    matching ceil-division identities, so the twin's ``//`` agrees
    bit-for-bit with no float anywhere. Two streaming passes: an exact
    min/max aggregate, then per-batch bincount partials; only 16-row
    partials shuffle. Empty bins are omitted (GROUP BY semantics)."""
    NB = 16
    ds = scan(sf_dir, "events", columns=["value"])

    def cents(batch: pa.Table) -> pa.Table:
        return pa.table({"vc": _cents(batch.column("value"), 100)})

    cds = ds.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
    mm = cds.aggregate(Min("vc", alias_name="mn"), Max("vc", alias_name="mx"))
    mn, mx = int(mm["mn"]), int(mm["mx"])
    r = mx - mn + 1

    def partial(batch: pa.Table) -> pa.Table:
        vc = batch.column("vc").to_numpy(zero_copy_only=False)
        b = (vc - mn) * NB // r
        cnt = np.bincount(b, minlength=NB)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "bin": pa.array(nz.astype(np.int64), pa.int64()),
                "n": pa.array(cnt[nz].astype(np.int64), pa.int64()),
            }
        )

    agg = (
        cds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("bin")
    )
    b = agg["bin"].to_numpy(np.int64)
    return pa.table(
        {
            "bin": pa.array(b, pa.int64()),
            "n_events": pa.array(agg["n"].to_numpy(np.int64), pa.int64()),
            "lo_cents": pa.array(mn + (b * r + NB - 1) // NB, pa.int64()),
            "hi_cents": pa.array(mn + ((b + 1) * r + NB - 1) // NB - 1, pa.int64()),
        }
    )


HISTOGRAM_VALUE_SQL = """
WITH c AS (SELECT CAST(round(value * 100) AS BIGINT) AS vc FROM events),
mm AS (SELECT min(vc) AS mn, max(vc) AS mx, max(vc) - min(vc) + 1 AS r FROM c),
b AS (SELECT (vc - mn) * 16 // r AS bin FROM c, mm)
SELECT bin, CAST(count(*) AS BIGINT) AS n_events,
       CAST(mn + (bin * r + 15) // 16 AS BIGINT) AS lo_cents,
       CAST(mn + ((bin + 1) * r + 15) // 16 - 1 AS BIGINT) AS hi_cents
FROM b, mm GROUP BY bin, mn, r
"""


def jsonl_source_events(sf_dir: str):
    """Multi-format SOURCE parity: the same aggregate computed from an
    NDJSON rendering of the events table via ``ray.data.read_json``
    (pyarrow's streaming JSON reader under the hood, one block per file
    chunk) must hash-match DuckDB's ``read_json_auto`` over the SAME
    file — pinning JSON int64 (epoch-µs timestamps) and double
    (repr-round-trip) fidelity through a second source format beside
    parquet (S1 family: parquet, drifted parquet, now NDJSON). The
    aggregate itself is the standard combiner → tiny groupby, money on
    the exact cents grid."""
    from .sources.fixtures import events_jsonl_path_for

    path = events_jsonl_path_for(sf_dir)
    ds = ray.data.read_json(path)

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "one": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
                "vc": _cents(batch.column("value"), 100),
                "ts_us": batch.column("ts_us"),
            }
        )
        g = t.group_by(["event_type"]).aggregate(
            [("one", "sum"), ("vc", "sum"), ("ts_us", "min"), ("ts_us", "max")]
        )
        return g.rename_columns(["event_type", "n", "sc", "tmin", "tmax"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"), Sum("sc", alias_name="sc"),
            Min("tmin", alias_name="tmin"), Max("tmax", alias_name="tmax"),
        )
        .to_pandas()
        .sort_values("event_type")
    )
    return pa.table(
        {
            "event_type": pa.array(agg["event_type"], pa.string()),
            "n": pa.array(agg["n"].to_numpy(np.int64), pa.int64()),
            "sum_cents": pa.array(agg["sc"].to_numpy(np.int64), pa.int64()),
            "min_ts_us": pa.array(agg["tmin"].to_numpy(np.int64), pa.int64()),
            "max_ts_us": pa.array(agg["tmax"].to_numpy(np.int64), pa.int64()),
        }
    )


def jsonl_source_events_sql(sf_dir: str | None = None) -> str:
    from .sources.fixtures import events_jsonl_path_for

    path = events_jsonl_path_for(sf_dir or "/root/testdata/sf0.01")
    return f"""
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       CAST(min(ts_us) AS BIGINT) AS min_ts_us,
       CAST(max(ts_us) AS BIGINT) AS max_ts_us
FROM read_json_auto('{path}') GROUP BY event_type
"""


def conv_split_assign_transcripts(sf_dir: str):
    """Leakage-safe train/val/test split at CONVERSATION granularity —
    the transcripts analog of ``split_assign_documents``: hashing the
    GROUP key (not the row) guarantees every turn of a conversation
    lands in one split, so context from a held-out conversation can
    never leak into training. md5('cv' || conv_id) first-byte
    thresholds 'e6'/'f3' (~89.8/4.9/5.3%). Shape: per-batch distinct
    (conv, turn) partials → one conv-bucketed exchange where the
    distinct-turn count and the split label are vectorized per bucket —
    rows out = conversations, not turns."""
    ds = relops.scan_path(_transcripts_path(sf_dir), columns=["conv_id", "turn_idx"])

    pairs = ds.map_batches(
        lambda b: b.group_by(["conv_id", "turn_idx"]).aggregate([]),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    empty = pa.table(
        {
            "conv_id": pa.array([], pa.string()),
            "n_turns": pa.array([], pa.int64()),
            "split": pa.array([], pa.string()),
        }
    )

    def per_bucket(g: pa.Table) -> pa.Table:
        import hashlib

        d = g.group_by(["conv_id", "turn_idx"]).aggregate([])
        c = d.group_by(["conv_id"]).aggregate([([], "count_all")])
        convs = c.column("conv_id").to_pylist()
        hs = [hashlib.md5(f"cv{x}".encode()).hexdigest()[:2] for x in convs]
        split = ["train" if h < "e6" else ("val" if h < "f3" else "test") for h in hs]
        return pa.table(
            {
                "conv_id": c.column("conv_id"),
                "n_turns": pc.cast(c.column("count_all"), pa.int64()),
                "split": pa.array(split, pa.string()),
            }
        )

    return relops.bucketed_groupby(pairs, ["conv_id"], per_bucket, empty=empty)


def conv_split_assign_transcripts_sql(sf_dir: str | None = None) -> str:
    path = _transcripts_sql_source(sf_dir)
    return f"""
WITH t AS (SELECT DISTINCT conv_id, turn_idx FROM read_parquet('{path}'))
SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
  CASE WHEN substr(md5('cv' || conv_id), 1, 2) < 'e6' THEN 'train'
       WHEN substr(md5('cv' || conv_id), 1, 2) < 'f3' THEN 'val'
       ELSE 'test' END AS split
FROM t GROUP BY conv_id
"""


def text_source_documents(sf_dir: str):
    """THIRD source format pinned end-to-end: ``ray.data.read_text``
    over a plain ``doc_id<TAB>text`` file must return byte-identical
    lines to DuckDB's CSV line reader over the SAME file — the op
    re-parses each line with one vectorized split-at-first-tab and
    returns the FULL text column, so the hash compare pins the whole
    byte stream (encoding, line splitting, field parsing), not a
    summary. Parse is pyarrow kernels only (split_pattern + cast)."""
    from .sources.fixtures import documents_tsv_path_for

    path = documents_tsv_path_for(sf_dir)
    ds = ray.data.read_text(path)

    def parse(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(batch.column("text"), pattern="\t", max_splits=1)
        return pa.table(
            {
                "doc_id": pc.cast(pc.list_element(parts, 0), pa.int64()),
                "text": pc.list_element(parts, 1),
                "n_chars": pc.cast(
                    pc.utf8_length(pc.list_element(parts, 1)), pa.int64()
                ),
            }
        )

    return ds.map_batches(parse, batch_format="pyarrow", zero_copy_batch=True)


def text_source_documents_sql(sf_dir: str | None = None) -> str:
    from .sources.fixtures import documents_tsv_path_for

    path = documents_tsv_path_for(sf_dir or "/root/testdata/sf0.01")
    return f"""
SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n_chars
FROM read_csv('{path}', delim='\\t', quote='', escape='', header=false,
              force_not_null=['text'],
              columns={{'doc_id': 'BIGINT', 'text': 'VARCHAR'}})
"""


def rolling_7d_user_events(sf_dir: str):
    """Time-RANGE window frame at row scale: for every event, the sum
    and count of the SAME USER's values over the trailing 7 days
    (``RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW`` —
    boundary inclusive, equal-ts peers included, exactly SQL's RANGE
    peer semantics). Shape: ONE user-bucketed exchange; per bucket the
    frame is two vectorized searchsorted probes into the per-user
    cumsum (lo = left(ts−7d), hi = right(ts)) — O(n log n) per bucket,
    no per-row rescan, no per-user dispatch. Money on the exact cents
    grid so summation order can't flip the hash."""
    W = 7 * 24 * 3600 * 1_000_000  # µs
    ds = scan(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    empty = pa.table(
        {
            "event_id": pa.array([], pa.int64()),
            "user_id": pa.array([], pa.int64()),
            "n7": pa.array([], pa.int64()),
            "sum7_cents": pa.array([], pa.int64()),
        }
    )

    def per_bucket(g: pa.Table) -> pa.Table:
        g = g.take(pc.sort_indices(
            g, sort_keys=[("user_id", "ascending"), ("ts", "ascending"),
                          ("event_id", "ascending")]
        ))
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        t = g.column("ts").to_numpy(zero_copy_only=False).view("int64")
        c = _cents(g.column("value"), 100).to_numpy(zero_copy_only=False)
        n = len(u)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        ends = np.r_[starts[1:], n]
        cum = np.r_[0, np.cumsum(c)]
        n7 = np.empty(n, dtype=np.int64)
        s7 = np.empty(n, dtype=np.int64)
        for a, b in zip(starts, ends):  # loop over USERS in the bucket,
            tt = t[a:b]                 # all probes vectorized inside
            lo = a + np.searchsorted(tt, tt - W, side="left")
            hi = a + np.searchsorted(tt, tt, side="right")
            n7[a:b] = hi - lo
            s7[a:b] = cum[hi] - cum[lo]
        return pa.table(
            {
                "event_id": g.column("event_id"),
                "user_id": g.column("user_id"),
                "n7": pa.array(n7, pa.int64()),
                "sum7_cents": pa.array(s7, pa.int64()),
            }
        )

    return relops.bucketed_groupby(ds, ["user_id"], per_bucket, empty=empty)


ROLLING_7D_SQL = """
SELECT event_id, user_id,
  CAST(count(*) OVER w AS BIGINT) AS n7,
  CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT) AS sum7_cents
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
"""


def range_join_events(sf_dir: str):
    """Interval/range join with OVERLAPPING intervals — the campaign-
    attribution shape a hash join cannot express (one event can land in
    several intervals). Seven deterministic intervals are derived from
    the exact global [min,max] µs span (lo_i = mn + i·R//8,
    hi_i = mn + (i+2)·R//8, half-open, each overlapping its neighbor);
    being dimension-sized they BROADCAST into one combiner pass — per
    batch a vectorized mask per interval, only 7-row partials shuffle.
    The all-integer boundary math makes the twin's ``//`` agree
    bit-for-bit. Zero-match intervals survive with n=0 (LEFT JOIN
    semantics). At scale the interval side stays small by construction;
    a large interval side would bucket by coarse time grain instead."""
    K, D = 7, 8
    ds = scan(sf_dir, "events", columns=["ts", "value"])
    mm = ds.map_batches(
        lambda b: pa.table({"t": pc.cast(b.column("ts"), pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True,
    ).aggregate(Min("t", alias_name="mn"), Max("t", alias_name="mx"))
    mn, mx = int(mm["mn"]), int(mm["mx"])
    r = mx - mn + 1
    lo = np.array([mn + i * r // D for i in range(K)], dtype=np.int64)
    hi = np.array([mn + (i + 2) * r // D for i in range(K)], dtype=np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.column("ts").to_numpy(zero_copy_only=False).view("int64")
        c = _cents(batch.column("value"), 100).to_numpy(zero_copy_only=False)
        ids, ns, ss = [], [], []
        for i in range(K):  # 7 intervals, vectorized mask per interval
            m = (t >= lo[i]) & (t < hi[i])
            ids.append(i)
            ns.append(int(m.sum()))
            ss.append(int(c[m].sum()))
        return pa.table(
            {
                "interval_id": pa.array(ids, pa.int64()),
                "n": pa.array(ns, pa.int64()),
                "s": pa.array(ss, pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("interval_id")
        .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"))
        .to_pandas()
        .set_index("interval_id")
        .reindex(range(K), fill_value=0)
    )
    return pa.table(
        {
            "interval_id": pa.array(range(K), pa.int64()),
            "lo_us": pa.array(lo, pa.int64()),
            "hi_us": pa.array(hi, pa.int64()),
            "n_events": pa.array(agg["n"].to_numpy(np.int64), pa.int64()),
            "sum_cents": pa.array(agg["s"].to_numpy(np.int64), pa.int64()),
        }
    )


RANGE_JOIN_SQL = """
WITH mm AS (SELECT CAST(min(epoch_us(ts)) AS BIGINT) AS mn,
                   CAST(max(epoch_us(ts)) - min(epoch_us(ts)) + 1 AS BIGINT) AS r
            FROM events),
iv AS (SELECT CAST(i AS BIGINT) AS interval_id,
              CAST(mn + i * r // 8 AS BIGINT) AS lo_us,
              CAST(mn + (i + 2) * r // 8 AS BIGINT) AS hi_us
       FROM range(7) t(i), mm)
SELECT iv.interval_id, iv.lo_us, iv.hi_us,
       CAST(count(e.ts) AS BIGINT) AS n_events,
       COALESCE(CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT), 0)
         AS sum_cents
FROM iv LEFT JOIN events e
  ON epoch_us(e.ts) >= iv.lo_us AND epoch_us(e.ts) < iv.hi_us
GROUP BY 1, 2, 3
"""


def winsorized_stats_lineitem(sf_dir: str):
    """Robust statistics by winsorization: clip ``l_extendedprice`` at
    the EXACT p01/p99 (rank selection via ``relops.select_quantiles`` —
    no global sort) and report the clipped sum/mean, the
    outlier-hardened aggregate every metrics pipeline wants. After the
    two-rank selection, ONE combiner pass clips on the exact cents grid
    (pc.min/max element-wise), so the winsorized sum is an order-free
    int64 and the mean is one IEEE division mirrored by the twin."""
    ds = scan(sf_dir, "lineitem", columns=["l_extendedprice"])
    (v01, v99), _ranks, total = relops.select_quantiles(
        ds, "l_extendedprice", [(1, 100), (99, 100)]
    )
    lo_c = int(round(float(v01) * 100))
    hi_c = int(round(float(v99) * 100))

    def partial(batch: pa.Table) -> pa.Table:
        c = _cents(batch.column("l_extendedprice"), 100)
        w = pc.min_element_wise(
            pc.max_element_wise(c, pa.scalar(lo_c, pa.int64())),
            pa.scalar(hi_c, pa.int64()),
        )
        return pa.table(
            {
                "s": pa.array([pc.sum(w).as_py() or 0], pa.int64()),
                "n_lo": pa.array(
                    [pc.sum(pc.cast(pc.less(c, pa.scalar(lo_c, pa.int64())),
                                    pa.int64())).as_py() or 0], pa.int64()),
                "n_hi": pa.array(
                    [pc.sum(pc.cast(pc.greater(c, pa.scalar(hi_c, pa.int64())),
                                    pa.int64())).as_py() or 0], pa.int64()),
            }
        )

    agg = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).aggregate(
        Sum("s", alias_name="s"), Sum("n_lo", alias_name="n_lo"),
        Sum("n_hi", alias_name="n_hi"),
    )
    s, n_lo, n_hi = int(agg["s"]), int(agg["n_lo"]), int(agg["n_hi"])
    return pa.table(
        {
            "n": pa.array([total], pa.int64()),
            "p01_cents": pa.array([lo_c], pa.int64()),
            "p99_cents": pa.array([hi_c], pa.int64()),
            "n_clipped_lo": pa.array([n_lo], pa.int64()),
            "n_clipped_hi": pa.array([n_hi], pa.int64()),
            "winsorized_sum_cents": pa.array([s], pa.int64()),
            "winsorized_mean": pa.array(
                [(float(s) / 100.0) / float(total)], pa.float64()),
        }
    )


WINSORIZED_SQL = """
WITH t AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c
           FROM lineitem),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM t),
s AS (SELECT c, row_number() OVER (ORDER BY c) AS rn FROM t),
b AS (SELECT
        max(CASE WHEN rn = (n.n + 99) // 100 THEN c END) AS lo,
        max(CASE WHEN rn = (99 * n.n + 99) // 100 THEN c END) AS hi
      FROM s, n GROUP BY n.n)
SELECT n.n,
       b.lo AS p01_cents, b.hi AS p99_cents,
       CAST(count(CASE WHEN t.c < b.lo THEN 1 END) AS BIGINT) AS n_clipped_lo,
       CAST(count(CASE WHEN t.c > b.hi THEN 1 END) AS BIGINT) AS n_clipped_hi,
       CAST(sum(least(greatest(t.c, b.lo), b.hi)) AS BIGINT)
         AS winsorized_sum_cents,
       (CAST(sum(least(greatest(t.c, b.lo), b.hi)) AS DOUBLE) / 100.0) / n.n
         AS winsorized_mean
FROM t, b, n GROUP BY n.n, b.lo, b.hi
"""


def knn_loo_accuracy_embeddings(sf_dir: str):
    """Leave-one-out 1-NN label accuracy over the labeled embedding
    table — the standard intrinsic embedding-quality eval. EXACT and
    layout-independent: vectors quantize once to the 1e-6 grid
    (half-even, the engine-wide convention), squared L2 distances are
    pure int64 (64 dims × ~1e12/term ≈ 6e13, far under 2^53 so the
    twin's integer-valued-double ``list_dot_product`` agrees), the
    neighbor ties to the SMALLEST vec_id, and per-label accuracy is one
    IEEE division of exact counts. Shape: the quantized corpus
    broadcasts ONCE via ray.put (MB-scale here; the billion-vector
    variant pre-filters through the IVF/PQ candidate machinery in
    stages/ann.py); each batch computes one int-matmul block × corpus
    and ships per-label partial counts only."""
    from .stages.ann import _matrix

    ds = scan(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])
    corpus = pq.read_table(
        relops.table_path(sf_dir, "embeddings"),
        columns=["vec_id", "embedding", "label"],
    )
    corpus = corpus.take(pc.sort_indices(corpus, sort_keys=[("vec_id", "ascending")]))
    ids = corpus.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    labels = corpus.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
    Q = np.round(_matrix(corpus.column("embedding")) / 1e-6).astype(np.int64)
    qq = (Q * Q).sum(axis=1)
    ref = ray.put((ids, labels, Q, qq))

    def partial(batch: pa.Table) -> pa.Table:
        cids, clabels, cq, cqq = ray.get(ref)
        bids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        bl = batch.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        bq = np.round(_matrix(batch.column("embedding")) / 1e-6).astype(np.int64)
        d2 = (bq * bq).sum(axis=1)[:, None] + cqq[None, :] - 2 * (bq @ cq.T)
        self_pos = np.searchsorted(cids, bids)
        d2[np.arange(len(bids)), self_pos] = np.iinfo(np.int64).max
        pred = clabels[np.argmin(d2, axis=1)]  # first min = smallest vec_id
        t = pa.table(
            {
                "label": pa.array(bl, pa.int64()),
                "one": pa.array(np.ones(len(bl), dtype=np.int64)),
                "ok": pa.array((pred == bl).astype(np.int64)),
            }
        )
        g = t.group_by(["label"]).aggregate([("one", "sum"), ("ok", "sum")])
        return g.rename_columns(["label", "n", "ok"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("label")
        .aggregate(Sum("n", alias_name="n"), Sum("ok", alias_name="ok"))
        .to_pandas()
        .sort_values("label")
    )
    n = agg["n"].to_numpy(np.int64)
    ok = agg["ok"].to_numpy(np.int64)
    return pa.table(
        {
            "label": pa.array(agg["label"].to_numpy(np.int64), pa.int64()),
            "n": pa.array(n, pa.int64()),
            "n_correct": pa.array(ok, pa.int64()),
            "accuracy": pa.array(ok.astype(np.float64) / n.astype(np.float64),
                                 pa.float64()),
        }
    )


def _build_knn_loo_sql() -> str:
    fe = _sql_round_even
    return _materialize_ctes(f"""
WITH qv AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         list_transform(embedding,
           e -> CAST({fe('CAST(e AS DOUBLE) / 1e-6')} AS DOUBLE)) AS q
  FROM embeddings),
sq AS (SELECT vec_id, label, q, list_dot_product(q, q) AS qq FROM qv),
d AS (SELECT a.vec_id, a.label AS la, b.label AS lb, b.vec_id AS nb_id,
             a.qq + b.qq - 2 * list_dot_product(a.q, b.q) AS d2
      FROM sq a JOIN sq b ON a.vec_id <> b.vec_id),
nn AS (SELECT vec_id, la, lb,
              row_number() OVER (PARTITION BY vec_id ORDER BY d2, nb_id) AS rn
       FROM d)
SELECT la AS label, CAST(count(*) AS BIGINT) AS n,
       CAST(count(CASE WHEN lb = la THEN 1 END) AS BIGINT) AS n_correct,
       CAST(count(CASE WHEN lb = la THEN 1 END) AS DOUBLE) / count(*)
         AS accuracy
FROM nn WHERE rn = 1 GROUP BY la
""")


def kmeans_purity_embeddings(sf_dir: str):
    """Clustering-quality eval: per-cluster LABEL PURITY of the
    integer-exact distributed k-means — the metric that closes the loop
    between the clustering family (``embedding_kmeans_exact``) and the
    labeled table. Shape: assignments stream out of
    ``kmeans_exact_assign`` (bit-reproducible by construction), labels
    ride a second column-pruned scan, ``size_gated_join`` attaches them,
    and only (cluster,label) count partials shuffle (≤ k×|labels| rows).
    Majority ties resolve to the smallest label; purity is one IEEE
    division of exact counts, both mirrored by the twin (which extends
    the same Lloyd CTE unroll — no pinned constants)."""
    from .stages.ann import kmeans_exact_assign

    ds = scan(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    asg = kmeans_exact_assign(ds, k=8, iters=5).map_batches(
        lambda t: t.select(["vec_id", "cluster"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    labels = scan(sf_dir, "embeddings", columns=["vec_id", "label"])
    joined = relops.size_gated_join(asg, labels, on="vec_id")

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "cluster": pc.cast(batch.column("cluster"), pa.int64()),
                "label": pc.cast(batch.column("label"), pa.int64()),
            }
        )
        g = t.group_by(["cluster", "label"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "cluster": g.column("cluster"),
                "label": g.column("label"),
                "n": pc.cast(g.column("count_all"), pa.int64()),
            }
        )

    cl = (
        joined.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["cluster", "label"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # ≤ k × |labels| rows
    )
    out = []
    for c, g in cl.groupby("cluster", sort=True):
        g = g.sort_values(["n", "label"], ascending=[False, True])
        tot = int(g["n"].sum())
        maj_label, maj_n = int(g.iloc[0]["label"]), int(g.iloc[0]["n"])
        out.append((int(c), tot, maj_label, maj_n, float(maj_n) / float(tot)))
    return pa.table(
        {
            "cluster": pa.array([r[0] for r in out], pa.int64()),
            "n": pa.array([r[1] for r in out], pa.int64()),
            "majority_label": pa.array([r[2] for r in out], pa.int64()),
            "n_majority": pa.array([r[3] for r in out], pa.int64()),
            "purity": pa.array([r[4] for r in out], pa.float64()),
        }
    )


def _build_kmeans_purity_sql(k: int = 8, iters: int = 5) -> str:
    parts = _kmeans_exact_cte_prefix(k, iters)
    parts[-1] = "), j AS ("  # splice after asg, as in the semdedup twin
    parts += [
        "  SELECT a.cluster, CAST(e.label AS BIGINT) AS label,",
        "         CAST(count(*) AS BIGINT) AS n",
        "  FROM asg a JOIN embeddings e USING (vec_id) GROUP BY 1, 2",
        "), r AS (",
        "  SELECT cluster, label, n,",
        "         row_number() OVER (PARTITION BY cluster",
        "                            ORDER BY n DESC, label) AS rn,",
        "         CAST(sum(n) OVER (PARTITION BY cluster) AS BIGINT) AS tot",
        "  FROM j",
        ")",
        "SELECT cluster, tot AS n, label AS majority_label, n AS n_majority,",
        "       CAST(n AS DOUBLE) / tot AS purity",
        "FROM r WHERE rn = 1",
    ]
    return _materialize_ctes("\n".join(parts))


def first_touch_attribution_events(sf_dir: str):
    """Marketing attribution kernel: every purchase is attributed to the
    user's EARLIEST view/click in the trailing 3 days (first-touch;
    boundary-inclusive start, strict end), '(none)' when the window is
    empty. Shape: ONE user-bucketed exchange; per bucket both streams
    sort once and each purchase resolves with two searchsorted probes
    into the candidate run (secondary event_id sort makes ts-ties
    deterministic) — no per-purchase rescan, no row-scale join. Only
    per-type count partials shuffle."""
    W = 3 * 24 * 3600 * 1_000_000  # µs
    ds = scan(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])
    kinds = pa.array(["purchase", "view", "click"], pa.string())
    pre = ds.map_batches(
        lambda t: t.filter(pc.is_in(t.column("event_type"), value_set=kinds)),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    empty = pa.table(
        {
            "attributed_type": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }
    )

    def per_bucket(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        df["t"] = df["ts"].to_numpy("datetime64[us]").view("int64")
        out: dict[str, int] = {}
        for _, ug in df.groupby("user_id", sort=False):
            cand = ug[ug["event_type"] != "purchase"].sort_values(["t", "event_id"])
            ct = cand["t"].to_numpy()
            ctype = cand["event_type"].to_numpy()
            for t in ug.loc[ug["event_type"] == "purchase", "t"].to_numpy():
                lo = np.searchsorted(ct, t - W, side="left")
                hi = np.searchsorted(ct, t, side="left")
                key = str(ctype[lo]) if lo < hi else "(none)"
                out[key] = out.get(key, 0) + 1
        if not out:
            return empty
        return pa.table(
            {
                "attributed_type": pa.array(list(out), pa.string()),
                "n": pa.array(list(out.values()), pa.int64()),
            }
        )

    partials = relops.bucketed_groupby(pre, ["user_id"], per_bucket, empty=empty)
    agg = (
        partials.groupby("attributed_type")
        .aggregate(Sum("n", alias_name="n_purchases"))
        .to_pandas()
        .sort_values("attributed_type")
    )
    return pa.table(
        {
            "attributed_type": pa.array(agg["attributed_type"], pa.string()),
            "n_purchases": pa.array(agg["n_purchases"].to_numpy(np.int64), pa.int64()),
        }
    )


FIRST_TOUCH_SQL = """
WITH p AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'purchase'),
c AS (SELECT user_id, ts, event_id, event_type FROM events
      WHERE event_type IN ('view', 'click')),
j AS (SELECT p.event_id, c.event_type,
             row_number() OVER (PARTITION BY p.event_id
                                ORDER BY c.ts, c.event_id) AS rn
      FROM p JOIN c ON c.user_id = p.user_id
        AND c.ts >= p.ts - INTERVAL 3 DAYS AND c.ts < p.ts),
a AS (SELECT p.event_id, coalesce(j.event_type, '(none)') AS attributed_type
      FROM p LEFT JOIN (SELECT event_id, event_type FROM j WHERE rn = 1) j
        USING (event_id))
SELECT attributed_type, CAST(count(*) AS BIGINT) AS n_purchases
FROM a GROUP BY attributed_type
"""


def tool_latency_percentiles_transcripts(sf_dir: str):
    """Per-TOOL latency percentiles (exact p50/p95) — the tail-latency
    companion to ``tool_latency_transcripts``' means. Two exchanges:
    (1) the conv-bucketed adjacency pass emits raw (tool, latency) pairs
    (same assistant→tool definition as the mean op), (2) a tool-bucketed
    pass sorts each tool's latencies once and picks the integer ceil
    ranks. Tool cardinality is tiny so a bucket holds one tool's full
    stream — at 10^12 turns route each tool through
    ``relops.select_quantiles`` instead (same ranks, log_B(n) passes);
    here the direct sort keeps the op one-pass."""
    ds = relops.scan_path(
        _transcripts_path(sf_dir), columns=["conv_id", "turn_idx", "role", "tool", "ts"]
    )

    pairs = ds.map_batches(
        lambda b: b.group_by(["conv_id", "turn_idx", "role", "tool", "ts"]).aggregate([]),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    raw_empty = pa.table(
        {"tool": pa.array([], pa.string()), "lat": pa.array([], pa.int64())}
    )

    def conv_bucket(group: pa.Table) -> pa.Table:
        d = group.group_by(["conv_id", "turn_idx", "role", "tool", "ts"]).aggregate([])
        conv = np.asarray(d.column("conv_id").to_numpy(zero_copy_only=False))
        turn = d.column("turn_idx").to_numpy(zero_copy_only=False)
        role = np.asarray(d.column("role").to_numpy(zero_copy_only=False))
        tool = np.asarray(d.column("tool").to_numpy(zero_copy_only=False), dtype=object)
        ts_us = d.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((role, ts_us, turn, conv))
        conv, role, tool, ts_us = conv[order], role[order], tool[order], ts_us[order]
        first = np.r_[True, conv[1:] != conv[:-1]]
        prev_assistant = np.r_[False, role[:-1] == "assistant"] & ~first
        hit = (role == "tool") & prev_assistant
        lat = np.zeros(len(conv), np.int64)
        lat[1:] = ts_us[1:] - ts_us[:-1]
        return pa.table(
            {
                "tool": pa.array(tool[hit].tolist(), pa.string()),
                "lat": pa.array(lat[hit], pa.int64()),
            }
        )

    raw = relops.bucketed_groupby(pairs, ["conv_id"], conv_bucket, empty=raw_empty)

    out_empty = pa.table(
        {
            "tool": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            "p50_us": pa.array([], pa.int64()),
            "p95_us": pa.array([], pa.int64()),
        }
    )

    def tool_bucket(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        tools, ns, p50s, p95s = [], [], [], []
        for tname, g in df.groupby("tool", sort=True):
            v = np.sort(g["lat"].to_numpy(np.int64))
            n = len(v)
            tools.append(tname)
            ns.append(n)
            p50s.append(int(v[(n + 1) // 2 - 1]))
            p95s.append(int(v[(19 * n + 19) // 20 - 1]))
        return pa.table(
            {
                "tool": pa.array(tools, pa.string()),
                "n": pa.array(ns, pa.int64()),
                "p50_us": pa.array(p50s, pa.int64()),
                "p95_us": pa.array(p95s, pa.int64()),
            }
        )

    return relops.bucketed_groupby(raw, ["tool"], tool_bucket, empty=out_empty)


def tool_latency_percentiles_transcripts_sql(sf_dir: str | None = None) -> str:
    path = _transcripts_sql_source(sf_dir)
    return f"""
WITH t AS (SELECT DISTINCT conv_id, turn_idx, role, tool, ts
           FROM read_parquet('{path}')),
w AS (SELECT conv_id, role, tool, ts,
        lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx, ts, role) AS prev_role,
        lag(ts)   OVER (PARTITION BY conv_id ORDER BY turn_idx, ts, role) AS prev_ts
      FROM t),
l AS (SELECT tool,
             CAST(date_diff('microsecond', prev_ts, ts) AS BIGINT) AS lat
      FROM w WHERE role = 'tool' AND prev_role = 'assistant'),
s AS (SELECT tool, lat,
             row_number() OVER (PARTITION BY tool ORDER BY lat) AS rn,
             count(*) OVER (PARTITION BY tool) AS n
      FROM l)
SELECT tool, CAST(max(n) AS BIGINT) AS n,
       CAST(max(CASE WHEN rn = (n + 1) // 2 THEN lat END) AS BIGINT) AS p50_us,
       CAST(max(CASE WHEN rn = (19 * n + 19) // 20 THEN lat END) AS BIGINT)
         AS p95_us
FROM s GROUP BY tool
"""


def train_shard_assign_documents(sf_dir: str, n_shards: int = 16):
    """Deterministic GLOBAL training-data shuffle — the step that turns a
    curated corpus into training shards: every doc gets a (shard, pos)
    that is a pure function of the corpus content, independent of
    cluster size, block layout, or scan order. Order key = 48-bit md5
    prefix of ``'shuf' || doc_id`` (salt distinct from the train/val
    split hash so the two assignments are independent), made TOTAL by
    the doc_id tiebreak; the global 1-based rank comes from
    ``relops.global_row_number`` (range-partitioned rank: histogram
    pass + ONE bucket-keyed shuffle, no global sort, no driver
    materialization). shard = (rn-1) % n_shards — round-robin off the
    hash order, so shard sizes differ by ≤1 AND each shard is itself a
    uniform sample; pos = (rn-1) // n_shards is the write position
    within the shard file."""
    from .stages.convdedup import _md5_prefix_i64

    ds = scan(sf_dir, "documents", columns=["doc_id"])

    def key(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        h = _md5_prefix_i64([f"shuf{i}" for i in ids])
        return batch.append_column("h48", pa.array(h, pa.int64()))

    ranked, _total = relops.global_row_number(
        ds.map_batches(key, batch_format="pyarrow", zero_copy_batch=True),
        "h48",
        ["doc_id"],
        rank_col="rn",
    )

    def assign(batch: pa.Table) -> pa.Table:
        rn = batch.column("rn").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "shard": pa.array((rn - 1) % n_shards, pa.int64()),
                "pos": pa.array((rn - 1) // n_shards, pa.int64()),
            }
        )

    return ranked.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def hard_negatives_embeddings(sf_dir: str, k: int = 5):
    """Contrastive-training data prep: for every embedding, the top-k
    most cosine-similar vectors with a DIFFERENT label (plus the rank
    and the bit-deterministic cosine). Goes through the size-gated
    ``stages.ann.hard_negatives_topk``: exact broadcast scoring at
    driver scale (what the twin pins), the IVF-co-partitioned
    no-broadcast path above the gate.

    GATE ASSUMPTION (oracle-parity contract): the registered SQL twin
    is the EXACT all-pairs ranking, so this entry forces the exact path
    regardless of fixture size — above the gate the engine would switch
    to approximate IVF recall (n_probe < n_cells) and a larger fixture
    would otherwise produce a confusing parity failure that is really
    just the gate tripping. The IVF path's own parity is pinned by
    ``test_hard_negatives_forced_gate_parity`` (n_probe == n_cells)."""
    from .stages.ann import hard_negatives_topk

    ds = scan(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])
    return hard_negatives_topk(ds, k=k, gate_bytes=1 << 62)


def _build_hard_negatives_sql(k: int = 5) -> str:
    fe = _sql_round_even
    q = fe("CAST(e AS DOUBLE) / 1e-6")
    return f"""
WITH qv AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         list_transform(embedding, e -> CAST({q} AS DOUBLE)) AS qe
  FROM embeddings),
nv AS (SELECT vec_id, sqrt(list_dot_product(qe, qe)) AS nrm FROM qv),
p AS (
  SELECT a.vec_id, b.vec_id AS neg_id,
         list_dot_product(a.qe, b.qe) / (na.nrm * nb.nrm) AS cos
  FROM qv a JOIN qv b ON b.vec_id <> a.vec_id AND b.label <> a.label
  JOIN nv na ON na.vec_id = a.vec_id
  JOIN nv nb ON nb.vec_id = b.vec_id
  WHERE na.nrm > 0 AND nb.nrm > 0),
r AS (
  SELECT vec_id, neg_id, cos,
         CAST(row_number() OVER (PARTITION BY vec_id
                                 ORDER BY cos DESC, neg_id) AS BIGINT) AS rank
  FROM p)
SELECT vec_id, neg_id, cos, rank FROM r WHERE rank <= {k}
"""


def ks_doclen_documents(sf_dir: str, lang_a: str = "en", lang_b: str = "de"):
    """Two-sample Kolmogorov-Smirnov distance between the doc-length
    distributions of two corpus slices (here: languages) — the
    distribution-drift test a data pipeline runs when a new crawl
    snapshot lands. EXACT: the per-value divergence is the integer
    ``|cum_a*nb - cum_b*na|`` (cross-multiplied ECDFs, no float until
    the very end), D is ONE IEEE division of the max; ``at_x`` reports
    the smallest length achieving it. Shape: per-batch (n_chars, a, b)
    count partials → one value-domain-sized groupby (doc lengths are a
    bounded integer domain) → driver cumulative walk over ≤ |domain|
    rows. At extreme corpus sizes the int64 cross-products need the
    driver walk to run in Python bigints (it already materializes only
    the domain-sized histogram)."""
    ds = scan(sf_dir, "documents", columns=["lang", "n_chars"])
    pair = pa.array([lang_a, lang_b], pa.string())

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_in(batch.column("lang"), value_set=pair))
        a = pc.cast(pc.equal(t.column("lang"), lang_a), pa.int64())
        b = pc.cast(pc.equal(t.column("lang"), lang_b), pa.int64())
        g = (
            pa.table({"x": t.column("n_chars"), "a": a, "b": b})
            .group_by(["x"])
            .aggregate([("a", "sum"), ("b", "sum")])
        )
        return pa.table(
            {"x": g.column("x"), "a": g.column("a_sum"), "b": g.column("b_sum")}
        )

    hist = (
        relops.coalesce_partials(
            ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        )
        .groupby("x")
        .aggregate(Sum("a", alias_name="a"), Sum("b", alias_name="b"))
        .to_pandas()  # value-domain-sized
        .sort_values("x")
    )
    na, nb = int(hist["a"].sum()), int(hist["b"].sum())
    ca = hist["a"].cumsum().to_numpy(np.int64)
    cb = hist["b"].cumsum().to_numpy(np.int64)
    if len(ca) and max(int(ca[-1]) * nb, int(cb[-1]) * na) >= 2**62:
        # int64 cross-products would wrap SILENTLY; the walk is already
        # domain-sized, so exact Python bigints cost nothing extra
        nums = [abs(int(x) * nb - int(y) * na) for x, y in zip(ca, cb)]
        best = max(nums)
        at_x = int(hist["x"].to_numpy()[nums.index(best)])
        if best >= 2**63:
            raise OverflowError(
                f"KS numerator {best} exceeds the int64 output column; "
                "corpus slice sizes are beyond this op's d_num schema"
            )
    else:
        num = np.abs(ca * nb - cb * na)
        best = int(num.max()) if len(num) else 0
        at_x = int(hist["x"].to_numpy()[num.argmax()]) if len(num) else 0
    return pa.table(
        {
            "na": pa.array([na], pa.int64()),
            "nb": pa.array([nb], pa.int64()),
            "d_num": pa.array([best], pa.int64()),
            "at_x": pa.array([at_x], pa.int64()),
            "ks_d": pa.array(
                [float(best) / float(na * nb) if na and nb else 0.0], pa.float64()
            ),
        }
    )


KS_DOCLEN_SQL = """
WITH v AS (
  SELECT n_chars AS x,
         CAST(count(*) FILTER (lang = 'en') AS BIGINT) AS a,
         CAST(count(*) FILTER (lang = 'de') AS BIGINT) AS b
  FROM documents WHERE lang IN ('en', 'de') GROUP BY 1),
t AS (SELECT CAST(sum(a) AS BIGINT) AS na, CAST(sum(b) AS BIGINT) AS nb FROM v),
c AS (SELECT x,
             CAST(sum(a) OVER (ORDER BY x) AS BIGINT) AS ca,
             CAST(sum(b) OVER (ORDER BY x) AS BIGINT) AS cb
      FROM v),
d AS (SELECT x, abs(ca * t.nb - cb * t.na) AS num FROM c, t)
SELECT t.na, t.nb,
       CAST((SELECT max(num) FROM d) AS BIGINT) AS d_num,
       CAST((SELECT min(x) FROM d
             WHERE num = (SELECT max(num) FROM d)) AS BIGINT) AS at_x,
       CAST((SELECT max(num) FROM d) AS DOUBLE) / (t.na * t.nb) AS ks_d
FROM t
"""


def watermark_late_events(sf_dir: str, tolerance_us: int = 60_000_000):
    """Event-time vs arrival-order audit — the streaming-ingestion
    watermark question asked of a batch table: treating event_id as the
    arrival order, how far behind the high-watermark (max event time
    seen so far) does each event arrive, and which are LATE (more than
    the tolerance behind)? The watermark is a GLOBAL ordered prefix
    scan, computed by ``relops.global_running_max`` (range-partitioned
    two-pass scan: per-bucket max up-sweep → driver prefix over
    num_buckets scalars → one bucket-keyed shuffle with a local
    ``np.maximum.accumulate`` down-sweep) — no global sort, nothing
    driver-side at row scale. Exact integer µs everywhere."""
    ds = scan(sf_dir, "events", columns=["event_id", "ts"])
    scanned = relops.global_running_max(
        ds, "event_id", "ts", out_col="wm_us", exclusive=True
    )

    def flag(batch: pa.Table) -> pa.Table:
        t = pc.cast(batch.column("ts"), pa.int64())
        wm = batch.column("wm_us")
        late = pc.and_kleene(
            pc.is_valid(wm),
            pc.less(pc.add(t, pa.scalar(tolerance_us, pa.int64())), wm),
        )
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "wm_us": wm,
                "is_late": pc.fill_null(late, False),
            }
        )

    return scanned.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)


WATERMARK_LATE_SQL = """
WITH w AS (
  SELECT event_id, epoch_us(ts) AS t,
         max(epoch_us(ts)) OVER (
           ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
  FROM events)
SELECT event_id, CAST(wm AS BIGINT) AS wm_us,
       COALESCE(t + 60000000 < wm, FALSE) AS is_late
FROM w
"""


def record_highs_events(sf_dir: str):
    """Running-record detector: per event (arrival order = event_id),
    the running max of all PRIOR event values and whether this event
    sets a new record — the second consumer of the global prefix-scan
    kernel, and one whose flag actually varies on real data (unlike the
    watermark's late flag on a time-ordered feed). Values ride the
    exact cents grid so the scan is pure int64."""
    ds = scan(sf_dir, "events", columns=["event_id", "value"])

    def to_cents(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "cents": _cents(batch.column("value"), 100),
            }
        )

    pre = ds.map_batches(to_cents, batch_format="pyarrow", zero_copy_batch=True)
    scanned = relops.global_running_max(
        pre, "event_id", "cents", out_col="wm_cents", exclusive=True
    )

    def flag(batch: pa.Table) -> pa.Table:
        wm = batch.column("wm_cents")
        rec = pc.or_kleene(
            pc.is_null(wm), pc.greater(batch.column("cents"), wm)
        )
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "wm_cents": wm,
                "is_record": pc.fill_null(rec, True),
            }
        )

    return scanned.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)


RECORD_HIGHS_SQL = """
WITH w AS (
  SELECT event_id, CAST(round(value * 100) AS BIGINT) AS cents,
         max(CAST(round(value * 100) AS BIGINT)) OVER (
           ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
  FROM events)
SELECT event_id, wm AS wm_cents,
       COALESCE(cents > wm, TRUE) AS is_record
FROM w
"""


def silhouette_embeddings(sf_dir: str, k: int = 8, iters: int = 5):
    """Simplified (centroid-based) silhouette for the integer-exact
    k-means — the third clustering eval beside purity and 1-NN accuracy:
    per vector, a = distance to its OWN final centroid, b = min distance
    to any OTHER centroid, sil = (b-a)/max(a,b) (0 when both are 0).
    Distances are sqrt of the exact int64 squared distances, so every
    double here is one correctly-rounded IEEE op on identical integer
    inputs — bit-reproducible by any engine, no rounding gate, no pinned
    constants (the twin extends the same Lloyd CTE unroll). Shape: the
    centroid matrix is model-sized driver state broadcast once; the
    scoring pass is one batch-local matmul-free distance computation —
    no shuffle at all."""
    from .stages.ann import _cached_ref, _matrix, kmeans_exact_centroids

    ds = scan(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    cents = kmeans_exact_centroids(ds, k=k, iters=iters)
    ref = ray.put(cents)

    def score(batch: pa.Table) -> pa.Table:
        c = _cached_ref(ref)  # int64 [k, d]
        m = np.round(_matrix(batch.column("embedding")).astype(np.float64) / 1e-6)
        m = m.astype(np.int64)
        d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)  # exact int64
        own = np.argmin(d2, axis=1)
        rows = np.arange(len(own))
        a = np.sqrt(d2[rows, own].astype(np.float64))
        masked = d2.astype(np.float64)
        masked[rows, own] = np.inf
        b = np.sqrt(masked.min(axis=1))
        denom = np.maximum(a, b)
        sil = np.where(denom == 0, 0.0, (b - a) / np.where(denom == 0, 1.0, denom))
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "cluster": pa.array(own.astype(np.int64)),
                "sil": pa.array(sil, pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def _build_silhouette_sql(k: int = 8, iters: int = 5) -> str:
    """Silhouette twin: dF (all vec × cluster exact squared distances to
    the FINAL centroids) already exists in the Lloyd unroll; b² is its
    min over clusters ≠ own."""
    parts = _kmeans_exact_cte_prefix(k, iters)
    parts[-1] = "), b2 AS ("  # splice after asg
    parts += [
        "  SELECT d.vec_id, CAST(min(d.d2) AS BIGINT) AS b2",
        "  FROM dF d JOIN asg a USING (vec_id) WHERE d.cluster <> a.cluster",
        "  GROUP BY d.vec_id",
        ")",
        "SELECT a.vec_id, a.cluster,",
        "       CASE WHEN greatest(sqrt(a.dist2q), sqrt(b.b2)) = 0 THEN 0.0",
        "            ELSE (sqrt(b.b2) - sqrt(a.dist2q))",
        "                 / greatest(sqrt(a.dist2q), sqrt(b.b2)) END AS sil",
        "FROM asg a JOIN b2 b USING (vec_id)",
    ]
    return _materialize_ctes("\n".join(parts))


def source_cap_documents(sf_dir: str, cap: int = 10):
    """Per-source (domain) cap — the web-corpus curation step that stops
    one domain from dominating the training mix: keep at most ``cap``
    docs per source, preferring the longest (n_chars desc, doc_id
    tiebreak), with the per-source rank kept for audit. Runs on the
    pruned (doc_id, source, n_chars) projection — the text column never
    leaves storage — through ``relops.window_topk_per_key``: the
    per-batch Arrow combiner keeps ≤ cap rows per source BEFORE the
    shuffle, so the exchange moves ≤ cap·sources·blocks rows regardless
    of corpus size."""
    ds = scan(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])
    return relops.window_topk_per_key(
        ds,
        "source",
        [("n_chars", "descending"), ("doc_id", "ascending")],
        k=cap,
        rank_col="rn",
    )


SOURCE_CAP_SQL = """
SELECT doc_id, source, n_chars,
       CAST(row_number() OVER (PARTITION BY source
                               ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rn
FROM documents
QUALIFY rn <= 10
"""


def perplexity_buckets_documents(sf_dir: str):
    """CCNet-style perplexity bucketing: score every doc with the
    corpus unigram LM (mean token cross-entropy, the exact
    ``unigram_xent_documents`` contract at 4dp), find the EXACT tercile
    thresholds by distributed rank selection (``relops.select_quantiles``
    — ceil-rank ``k = (num*n+den-1)//den``, no global sort), and label
    docs head / middle / tail (lower xent = more fluent = head; docs
    equal to a threshold take the lower bucket, so ties are
    deterministic). The scored table is materialized ONCE (2 columns,
    object-store-resident and spillable) because the quantile selection
    needs a histogram pass and a fetch pass over it; the final label
    pass is a pure per-batch comparison against two broadcast
    doubles."""
    scored = unigram_xent_documents(sf_dir).materialize()
    (t1, t2), _ranks, _n = relops.select_quantiles(
        scored, "xent", [(1, 3), (2, 3)]
    )

    def label(batch: pa.Table) -> pa.Table:
        x = batch.column("xent").to_numpy(zero_copy_only=False)
        b = np.where(x <= t1, "head", np.where(x <= t2, "middle", "tail"))
        return batch.append_column("bucket", pa.array(b, pa.string()))

    return scored.map_batches(label, batch_format="pyarrow", zero_copy_batch=True)


PERPLEXITY_BUCKETS_SQL = """
WITH ws AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
cnt AS (SELECT word, count(*) AS n FROM ws GROUP BY word),
tot AS (SELECT sum(n) AS t, count(*) AS v FROM cnt),
x AS (SELECT doc_id, round(avg(-ln((cnt.n + 1) / (tot.t + tot.v))), 4) AS xent
      FROM ws JOIN cnt USING (word), tot GROUP BY doc_id),
nn AS (SELECT count(*) AS n FROM x),
r AS (SELECT xent, row_number() OVER (ORDER BY xent) AS rn FROM x),
th AS (SELECT
         max(CASE WHEN rn = (SELECT (n + 2) // 3 FROM nn) THEN xent END) AS t1,
         max(CASE WHEN rn = (SELECT (2 * n + 2) // 3 FROM nn) THEN xent END) AS t2
       FROM r)
SELECT doc_id, xent,
       CASE WHEN xent <= th.t1 THEN 'head'
            WHEN xent <= th.t2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM x, th
"""


TRAIN_SHARD_SQL = """
WITH r AS (
  SELECT doc_id,
         row_number() OVER (
           ORDER BY CAST(('0x' || substr(md5('shuf' || CAST(doc_id AS VARCHAR)), 1, 12))
                         AS BIGINT),
                    doc_id) AS rn
  FROM documents)
SELECT doc_id,
       CAST((rn - 1) % 16 AS BIGINT) AS shard,
       CAST((rn - 1) // 16 AS BIGINT) AS pos
FROM r
"""


REGISTRY: dict[str, tuple] = {
    # (callable, oracle_sql | None)
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "q6_revenue": (q6_revenue, Q6_SQL),
    "filter_project_revenue": (filter_project_revenue, FILTER_PROJECT_SQL),
    "sort_topk_orders": (sort_topk_orders, SORT_TOPK_SQL),
    "groupby_events": (groupby_events, GROUPBY_EVENTS_SQL),
    "events_daily": (events_daily, EVENTS_DAILY_SQL),
    "join_customer_nation_region": (join_customer_nation_region, JOIN_CNR_SQL),
    "join_orders_customer_top": (join_orders_customer_top, JOIN_TOP_CUSTOMERS_SQL),
    "count_distinct_parts": (count_distinct_parts, COUNT_DISTINCT_SQL),
    "approx_distinct_parts": (approx_distinct_parts, None),
    "approx_distinct_parts_error": (approx_distinct_parts_error, APPROX_DISTINCT_ERROR_SQL),
    "string_fns_part": (string_fns_part, STRING_FNS_SQL),
    "sessionize_events": (sessionize_events, SESSIONIZE_SQL),
    "asof_clicks_before_errors": (asof_clicks_before_errors, ASOF_SQL),
    "range_join_event_bands": (range_join_event_bands, RANGE_JOIN_BANDS_SQL),
    "sliding_avg_events": (sliding_avg_events, SLIDING_AVG_SQL),
    "join_big_revenue_by_priority": (join_big_revenue_by_priority, JOIN_BIG_SQL),
    "union_quantity_extremes": (union_quantity_extremes, UNION_SQL),
    "running_spend_per_customer": (running_spend_per_customer, RUNNING_SPEND_SQL),
    "sample_lineitem": (sample_lineitem, SAMPLE_SQL),
    "q3_shipping_priority": (q3_shipping_priority, Q3_SQL),
    "q5_local_supplier_volume": (q5_local_supplier_volume, Q5_SQL),
    "json_props_events": (json_props_events, JSON_PROPS_SQL),
    "dedup_exact_documents": (dedup_exact_documents, DEDUP_EXACT_SQL),
    "dedup_exact_keep_rows": (dedup_exact_keep_rows, DEDUP_KEEP_SQL),
    "dedup_exact_online": (dedup_exact_online_documents, DEDUP_KEEP_SQL),
    "token_count_documents": (token_count_documents, TOKEN_COUNT_SQL),
    "token_quantiles_documents": (token_quantiles_documents, TOKEN_QUANTILES_SQL),
    "top_words_documents": (top_words_documents, TOP_WORDS_SQL),
    "heavy_hitters_documents": (heavy_hitters_documents, HEAVY_HITTERS_SQL),
    "weighted_sample_documents": (weighted_sample_documents, WEIGHTED_SAMPLE_SQL),
    "rank_orders_per_customer": (rank_orders_per_customer, RANK_ORDERS_SQL),
    "stratified_sample_orders": (stratified_sample_orders, STRATIFIED_SAMPLE_SQL),
    "pivot_events_daily": (pivot_events_daily, PIVOT_EVENTS_SQL),
    "doc_len_quantiles_by_lang": (doc_len_quantiles_by_lang, DOC_LEN_QUANTILES_SQL),
    "anti_join_customers_no_orders": (anti_join_customers_no_orders, ANTI_JOIN_SQL),
    "q14_promo_revenue": (q14_promo_revenue, Q14_SQL),
    "q17_small_quantity_revenue": (q17_small_quantity_revenue, Q17_SQL),
    "q18_large_volume_orders": (q18_large_volume_orders, Q18_SQL),
    "q4_priority_with_returns": (q4_priority_with_returns, Q4_SQL),
    "cheapest_supplier_per_part": (cheapest_supplier_per_part, CHEAPEST_SUPPLIER_SQL),
    "order_gap_days_per_customer": (order_gap_days_per_customer, ORDER_GAP_SQL),
    "q13_customer_distribution": (q13_customer_distribution, Q13_SQL),
    "q7_volume_shipping": (q7_volume_shipping, Q7_SQL),
    "q8_market_share": (q8_market_share, Q8_SQL),
    "q15_top_supplier": (q15_top_supplier, Q15_SQL),
    "q12_late_shipments": (q12_late_shipments, Q12_SQL),
    "q9_profit_by_nation_year": (q9_profit_by_nation_year, Q9_SQL),
    "q11_important_parts": (q11_important_parts, Q11_SQL),
    "dominant_supplier_per_part": (dominant_supplier_per_part, DOMINANT_SUPPLIER_SQL),
    "embedding_pca_top_component": (embedding_pca_top_component, None),
    "price_quantiles_approx": (price_quantiles_approx, None),
    "price_quantiles_rank_check": (
        price_quantiles_rank_check,
        PRICE_QUANTILES_RANK_CHECK_SQL,
    ),
    "pagerank_part_supplier": (pagerank_part_supplier, None),
    "triangle_count_suppliers": (triangle_count_suppliers, TRIANGLE_COUNT_SQL),
    "pagerank_part_supplier_nano": (pagerank_part_supplier_nano, PAGERANK_NANO_SQL),
    "embedding_kmeans_exact": (embedding_kmeans_exact, KMEANS_EXACT_SQL),
    "semdedup_exact_embeddings": (semdedup_exact_embeddings, SEMDEDUP_EXACT_SQL),
    "embedding_pca_exact": (embedding_pca_exact, PCA_EXACT_SQL),
    "inverted_index_documents": (inverted_index_documents, INVERTED_INDEX_SQL),
    "tfidf_top_terms_documents": (tfidf_top_terms_documents, TFIDF_SQL),
    "bm25_topk_documents": (bm25_topk_documents, BM25_SQL),
    "compress_ratio_documents": (compress_ratio_documents, None),
    "chunk_sliding_documents": (chunk_sliding_documents, CHUNK_SLIDING_SQL),
    "rrf_hybrid_topk_documents": (rrf_hybrid_topk_documents, RRF_HYBRID_SQL),
    "ndcg_embedding_topk": (ndcg_embedding_topk, NDCG_SQL),
    "copurchase_pairs_lineitem": (copurchase_pairs_lineitem, COPURCHASE_SQL),
    "gini_conv_lengths_transcripts": (gini_conv_lengths_transcripts, None),
    "charset_audit_transcripts": (charset_audit_transcripts, None),
    "schema_drift_union_transcripts": (schema_drift_union_transcripts, None),
    "curate_conversations_transcripts": (curate_conversations_transcripts, None),
    "markdown_outline_transcripts": (markdown_outline_transcripts, None),
    "redact_documents": (redact_documents, REDACT_SQL),
    "unigram_xent_documents": (unigram_xent_documents, UNIGRAM_XENT_SQL),
    "funnel_stages_events": (funnel_stages_events, FUNNEL_STAGES_SQL),
    "time_profile_events": (time_profile_events, TIME_PROFILE_SQL),
    "zscore_outliers_events": (zscore_outliers_events, ZSCORE_OUTLIERS_SQL),
    "event_transitions_events": (event_transitions_events, EVENT_TRANSITIONS_SQL),
    "throttle_events": (throttle_events, THROTTLE_SQL),
    "price_histogram_lineitem": (price_histogram_lineitem, PRICE_HIST_SQL),
    "q22_sales_opportunity": (q22_sales_opportunity, Q22_SQL),
    "q19_disjunctive_revenue": (q19_disjunctive_revenue, Q19_SQL),
    "q20_potential_promotion": (q20_potential_promotion, Q20_SQL),
    "q21_waiting_suppliers": (q21_waiting_suppliers, Q21_SQL),
    "dup_shingle_frac_documents": (dup_shingle_frac_documents, DUP_SHINGLE_SQL),
    "dup_span_removal_documents": (dup_span_removal_documents, DUP_SPAN_REMOVAL_SQL),
    "source_overlap_documents": (source_overlap_documents, SOURCE_OVERLAP_SQL),
    "dsir_weights_documents": (dsir_weights_documents, DSIR_WEIGHTS_SQL),
    "nb_lang_classifier_documents": (nb_lang_classifier_documents, NB_LANG_SQL),
    "pack_sequences_documents": (pack_sequences_documents, None),
    "jsonl_roundtrip_documents": (jsonl_roundtrip_documents, JSONL_ROUNDTRIP_SQL),
    "csv_roundtrip_documents": (csv_roundtrip_documents, JSONL_ROUNDTRIP_SQL),
    "hopping_window_events": (hopping_window_events, HOPPING_WINDOW_SQL),
    "bpe_merges_documents": (bpe_merges_documents, None),
    "bpe_encode_documents": (bpe_encode_documents, None),
    "chunk_documents": (chunk_documents, CHUNK_DOCUMENTS_SQL),
    "split_assign_documents": (split_assign_documents, SPLIT_ASSIGN_SQL),
    "dedup_near_keep_best": (dedup_near_keep_best, DEDUP_KEEP_BEST_SQL),
    "curate_documents": (curate_documents, CURATE_SQL),
    "curation_report_documents": (curation_report_documents, CURATION_REPORT_SQL),
    "mixture_sample_documents": (mixture_sample_documents, MIXTURE_SAMPLE_SQL),
    "gopher_rules_documents": (gopher_rules_documents, GOPHER_RULES_SQL),
    "full_outer_user_day": (full_outer_user_day, FULL_OUTER_SQL),
    "unpivot_events_daily": (unpivot_events_daily, UNPIVOT_SQL),
    "vocab_entropy_by_lang": (vocab_entropy_by_lang, VOCAB_ENTROPY_SQL),
    "q10_returned_items": (q10_returned_items, Q10_SQL),
    "q2_min_cost_supplier": (q2_min_cost_supplier, Q2_SQL),
    "ntile_orders_per_customer": (ntile_orders_per_customer, NTILE_ORDERS_SQL),
    "global_rank_orders": (global_rank_orders, GLOBAL_RANK_ORDERS_SQL),
    "q16_parts_supplier_counts": (q16_parts_supplier_counts, Q16_SQL),
    "rollup_events_daily": (rollup_events_daily, ROLLUP_EVENTS_SQL),
    "grouping_sets_events": (grouping_sets_events, GROUPING_SETS_SQL),
    "cube_events_daily": (cube_events_daily, CUBE_EVENTS_SQL),
    "token_quantiles_cont_documents": (token_quantiles_cont_documents, TOKEN_QUANTILES_CONT_SQL),
    "percent_rank_orders": (percent_rank_orders, PERCENT_RANK_SQL),
    "set_ops_customers": (set_ops_customers, SET_OPS_SQL),
    "corr_qty_price_by_flag": (corr_qty_price_by_flag, CORR_SQL),
    "mode_brand_per_type": (mode_brand_per_type, MODE_BRAND_SQL),
    "ttr_documents": (ttr_documents, TTR_SQL),
    "bigram_repetition_documents": (bigram_repetition_documents, BIGRAM_REP_SQL),
    "c4_filter_documents": (c4_filter_documents, C4_FILTER_SQL),
    "decontaminate_documents": (decontaminate_documents, DECONTAMINATE_SQL),
    "embedding_kmeans": (embedding_kmeans, None),
    "semdedup_embeddings": (semdedup_embeddings, None),
    "bpe_token_count_documents": (bpe_token_count_documents, BPE_TOKEN_COUNT_SQL),
    "textnorm_documents": (textnorm_documents, TEXTNORM_SQL),
    "quality_documents": (quality_documents, QUALITY_SQL),
    "lang_id_documents": (lang_id_documents, LANG_ID_SQL),
    "fingerprint_documents": (fingerprint_documents, FINGERPRINT_SQL),
    "minhash_clusters_documents": (minhash_clusters_documents, MINHASH_CLUSTERS_SQL),
    "dedup_minhash_online_documents": (
        dedup_minhash_online_documents,
        MINHASH_CLUSTERS_SQL,
    ),
    "simhash_documents": (simhash_documents, SIMHASH_SQL),
    "ngram_dup_pairs_documents": (ngram_dup_pairs_documents, NGRAM_PAIRS_SQL),
    "fuzzy_lev_pairs_documents": (fuzzy_lev_pairs_documents, FUZZY_LEV_SQL),
    "fuzzy_lev_keep_best_documents": (
        fuzzy_lev_keep_best_documents,
        FUZZY_LEV_KEEP_BEST_SQL,
    ),
    "embedding_topk": (embedding_topk, EMBEDDING_TOPK_SQL),
    "embedding_topk_lsh": (embedding_topk_lsh, None),
    "embedding_topk_lsh_recall": (embedding_topk_lsh_recall, EMBEDDING_TOPK_LSH_RECALL_SQL),
    "embedding_topk_pq": (embedding_topk_pq, None),
    "embedding_topk_pq_recall": (embedding_topk_pq_recall, EMBEDDING_TOPK_PQ_RECALL_SQL),
    "embedding_pq_digest": (embedding_pq_digest, EMBEDDING_PQ_DIGEST_SQL),
    "embedding_topk_ivf": (embedding_topk_ivf, EMBEDDING_TOPK_SQL),
    "embedding_near_dups": (embedding_near_dups, EMBEDDING_NEAR_DUP_SQL),
    "embedding_near_dups_loose": (embedding_near_dups_loose, EMBEDDING_NEAR_DUP_LOOSE_SQL),
    "embedding_near_dups_lsh": (embedding_near_dups_lsh, None),
    "embedding_near_dups_lsh_recall": (
        embedding_near_dups_lsh_recall,
        EMBEDDING_NEAR_DUPS_LSH_RECALL_SQL,
    ),
    "multimodal_image_features": (multimodal_image_features,
                                  MULTIMODAL_IMAGE_FEATURES_SQL),
    "multimodal_image_digest": (multimodal_image_digest, MULTIMODAL_IMAGE_DIGEST_SQL),
    "multimodal_png_conformance_digest": (
        multimodal_png_conformance_digest,
        MULTIMODAL_PNG_CONFORMANCE_SQL,
    ),
    "multimodal_audio_digest": (multimodal_audio_digest, MULTIMODAL_AUDIO_DIGEST_SQL),
    "multimodal_video_digest": (multimodal_video_digest, MULTIMODAL_VIDEO_DIGEST_SQL),
    "multimodal_audio_features": (multimodal_audio_features,
                                  MULTIMODAL_AUDIO_FEATURES_SQL),
    "multimodal_video_features": (multimodal_video_features,
                                  MULTIMODAL_VIDEO_FEATURES_SQL),
    "multimodal_mp4_frames": (multimodal_mp4_frames,
                              MULTIMODAL_MP4_FRAMES_SQL),
    "multimodal_mp4_digest": (multimodal_mp4_digest, MULTIMODAL_MP4_DIGEST_SQL),
    "multimodal_mp3_probe": (multimodal_mp3_probe, MULTIMODAL_MP3_PROBE_SQL),
    "multimodal_flac_probe": (multimodal_flac_probe, MULTIMODAL_FLAC_PROBE_SQL),
    "multimodal_flac_digest": (multimodal_flac_digest, MULTIMODAL_FLAC_DIGEST_SQL),
    "multimodal_audio_spectral": (
        multimodal_audio_spectral,
        MULTIMODAL_AUDIO_SPECTRAL_SQL,
    ),
    "multimodal_tiff_bmp_digest": (
        multimodal_tiff_bmp_digest,
        MULTIMODAL_TIFF_BMP_DIGEST_SQL,
    ),
    "extract_transcripts": (extract_transcripts, None),
    "extract_kind_stats": (extract_kind_stats, None),
    "extract_digest_smoke": (extract_digest_smoke, EXTRACT_DIGEST_SMOKE_SQL),
    "extract_digest_justext": (extract_digest_justext, EXTRACT_DIGEST_JUSTEXT_SQL),
    "describe_lineitem": (describe_lineitem, DESCRIBE_LINEITEM_SQL),
    "describe_documents": (describe_documents, DESCRIBE_DOCUMENTS_SQL),
    "describe_events": (describe_events, DESCRIBE_EVENTS_SQL),
    "bpe_merges_smoke": (bpe_merges_smoke, BPE_MERGES_SMOKE_SQL),
    "bpe_encode_smoke": (bpe_encode_smoke, BPE_ENCODE_SMOKE_SQL),
    "pack_digest_smoke": (pack_digest_smoke, PACK_DIGEST_SMOKE_SQL),
    "transcripts_conv_stats": (transcripts_conv_stats, None),
    "role_bigram_transcripts": (role_bigram_transcripts, None),
    "tool_usage_transcripts": (tool_usage_transcripts, None),
    "conv_signals_transcripts": (conv_signals_transcripts, None),
    "response_latency_transcripts": (response_latency_transcripts, None),
    "turn_enrich_skew_join_transcripts": (turn_enrich_skew_join_transcripts, None),
    "dedup_conv_exact_transcripts": (dedup_conv_exact_transcripts, None),
    "dedup_conv_keep_rows_transcripts": (dedup_conv_keep_rows_transcripts, None),
    "conv_overlap_pairs_transcripts": (conv_overlap_pairs_transcripts, None),
    "shared_boilerplate_transcripts": (shared_boilerplate_transcripts, None),
    "context_repeat_transcripts": (context_repeat_transcripts, None),
    "sft_spans_transcripts": (sft_spans_transcripts, None),
    "context_window_transcripts": (context_window_transcripts, None),
    "conv_chunk_budget_transcripts": (conv_chunk_budget_transcripts, None),
    "tool_trigrams_transcripts": (tool_trigrams_transcripts, None),
    "redact_pii_transcripts": (redact_pii_transcripts, None),
    "role_protocol_transcripts": (role_protocol_transcripts, None),
    "tool_latency_transcripts": (tool_latency_transcripts, None),
    "role_vocab_divergence_transcripts": (role_vocab_divergence_transcripts, None),
    "pii_stats_transcripts": (pii_stats_transcripts, None),
    "code_blocks_transcripts": (code_blocks_transcripts, None),
    "url_domains_transcripts": (url_domains_transcripts, None),
    "repetition_runs_documents": (repetition_runs_documents, REPETITION_RUNS_SQL),
    "cohort_retention_events": (cohort_retention_events, COHORT_RETENTION_SQL),
    "merge_upsert_orders": (merge_upsert_orders, MERGE_UPSERT_SQL),
    "tool_assoc_rules_transcripts": (tool_assoc_rules_transcripts, None),
    "dq_audit_tpch": (dq_audit_tpch, DQ_AUDIT_SQL),
    "bigram_xent_documents": (bigram_xent_documents, BIGRAM_XENT_SQL),
    "analyze_stats_lineitem": (analyze_stats_lineitem, ANALYZE_STATS_SQL),
    "zorder_layout_lineitem": (zorder_layout_lineitem, ZORDER_SQL),
    "cusum_changepoint_events": (cusum_changepoint_events, CUSUM_SQL),
    "bfs_hops_parts": (bfs_hops_parts, BFS_HOPS_SQL),
    "exact_quantiles_lineitem": (exact_quantiles_lineitem, EXACT_QUANTILES_SQL),
    "funnel_events": (funnel_events, FUNNEL_SQL),
    "corpus_divergence_documents": (corpus_divergence_documents,
                                    CORPUS_DIVERGENCE_SQL),
    "selfrep_adjacent_transcripts": (selfrep_adjacent_transcripts, None),
    "running_balance_events": (running_balance_events, RUNNING_BALANCE_SQL),
    "incremental_mv_orders": (incremental_mv_orders, INCREMENTAL_MV_SQL),
    "pivot_users_events": (pivot_users_events, PIVOT_USERS_SQL),
    "grouped_median_lineitem": (grouped_median_lineitem, GROUPED_MEDIAN_SQL),
    "concat_orders_customer": (concat_orders_customer, CONCAT_ORDERS_SQL),
    "tool_retry_loops_transcripts": (tool_retry_loops_transcripts, None),
    "histogram_value_events": (histogram_value_events, HISTOGRAM_VALUE_SQL),
    "jsonl_source_events": (jsonl_source_events, None),
    "text_source_documents": (text_source_documents, None),
    "conv_split_assign_transcripts": (conv_split_assign_transcripts, None),
    "rolling_7d_user_events": (rolling_7d_user_events, ROLLING_7D_SQL),
    "range_join_events": (range_join_events, RANGE_JOIN_SQL),
    "winsorized_stats_lineitem": (winsorized_stats_lineitem, WINSORIZED_SQL),
    "knn_loo_accuracy_embeddings": (knn_loo_accuracy_embeddings,
                                    _build_knn_loo_sql()),
    "kmeans_purity_embeddings": (kmeans_purity_embeddings,
                                 _build_kmeans_purity_sql()),
    "first_touch_attribution_events": (first_touch_attribution_events,
                                       FIRST_TOUCH_SQL),
    "latency_percentiles_transcripts": (latency_percentiles_transcripts, None),
    "tool_latency_percentiles_transcripts": (
        tool_latency_percentiles_transcripts, None),
    "train_shard_assign_documents": (train_shard_assign_documents, TRAIN_SHARD_SQL),
    "perplexity_buckets_documents": (perplexity_buckets_documents,
                                     PERPLEXITY_BUCKETS_SQL),
    "source_cap_documents": (source_cap_documents, SOURCE_CAP_SQL),
    "silhouette_embeddings": (silhouette_embeddings, _build_silhouette_sql()),
    "watermark_late_events": (watermark_late_events, WATERMARK_LATE_SQL),
    "record_highs_events": (record_highs_events, RECORD_HIGHS_SQL),
    "ks_doclen_documents": (ks_doclen_documents, KS_DOCLEN_SQL),
    "hard_negatives_embeddings": (hard_negatives_embeddings,
                                  _build_hard_negatives_sql()),
}

#: oracle SQL that must be built lazily (embeds a generated-on-demand
#: fixture path); merged into the static REGISTRY by __ray_entry__.oracle_sql
LAZY_SQL: dict[str, Any] = {
    "transcripts_conv_stats": transcripts_conv_stats_sql,
    "role_bigram_transcripts": role_bigram_transcripts_sql,
    "tool_usage_transcripts": tool_usage_transcripts_sql,
    "conv_signals_transcripts": conv_signals_transcripts_sql,
    "response_latency_transcripts": response_latency_transcripts_sql,
    "turn_enrich_skew_join_transcripts": turn_enrich_skew_join_transcripts_sql,
    "dedup_conv_exact_transcripts": dedup_conv_exact_transcripts_sql,
    "dedup_conv_keep_rows_transcripts": dedup_conv_keep_rows_transcripts_sql,
    "conv_overlap_pairs_transcripts": conv_overlap_pairs_transcripts_sql,
    "shared_boilerplate_transcripts": shared_boilerplate_transcripts_sql,
    "context_repeat_transcripts": context_repeat_transcripts_sql,
    "sft_spans_transcripts": sft_spans_transcripts_sql,
    "context_window_transcripts": context_window_transcripts_sql,
    "conv_chunk_budget_transcripts": conv_chunk_budget_transcripts_sql,
    "tool_trigrams_transcripts": tool_trigrams_transcripts_sql,
    "redact_pii_transcripts": redact_pii_transcripts_sql,
    "role_protocol_transcripts": role_protocol_transcripts_sql,
    "tool_latency_transcripts": tool_latency_transcripts_sql,
    "markdown_outline_transcripts": markdown_outline_transcripts_sql,
    "gini_conv_lengths_transcripts": gini_conv_lengths_transcripts_sql,
    "charset_audit_transcripts": charset_audit_transcripts_sql,
    "schema_drift_union_transcripts": schema_drift_union_transcripts_sql,
    "curate_conversations_transcripts": curate_conversations_transcripts_sql,
    "role_vocab_divergence_transcripts": role_vocab_divergence_transcripts_sql,
    "pii_stats_transcripts": pii_stats_transcripts_sql,
    "code_blocks_transcripts": code_blocks_transcripts_sql,
    "url_domains_transcripts": url_domains_transcripts_sql,
    "tool_assoc_rules_transcripts": tool_assoc_rules_transcripts_sql,
    "selfrep_adjacent_transcripts": selfrep_adjacent_transcripts_sql,
    "tool_retry_loops_transcripts": tool_retry_loops_transcripts_sql,
    "jsonl_source_events": jsonl_source_events_sql,
    "text_source_documents": text_source_documents_sql,
    "conv_split_assign_transcripts": conv_split_assign_transcripts_sql,
    "latency_percentiles_transcripts": latency_percentiles_transcripts_sql,
    "tool_latency_percentiles_transcripts":
        tool_latency_percentiles_transcripts_sql,
}


def _oracle_extract_df(sf_dir: str) -> pa.Table:
    """Single-process reference extraction (oracle.py) over the same
    fixture — the deterministic python oracle for the extraction family."""
    from .oracle import extract_table

    return extract_table(pq.read_table(_transcripts_path(sf_dir)), ExtractConfig())


def _oracle_kind_stats(sf_dir: str) -> pa.Table:
    tbl = _oracle_extract_df(sf_dir)
    agg = (
        tbl.select(["kind", "used_fallback"])
        .group_by(["kind", "used_fallback"])
        .aggregate([("kind", "count")])
    )
    return pa.table(
        {
            "kind": agg.column("kind"),
            "used_fallback": agg.column("used_fallback"),
            "n": pc.cast(agg.column("kind_count"), pa.int64()),
        }
    )


#: deterministic python oracles for non-SQL-expressible ops, used by
#: tools/check_queries.py for full-value equality (driver sees rows-only)
PYTHON_ORACLES: dict[str, Any] = {
    "extract_transcripts": _oracle_extract_df,
    "pack_sequences_documents": _oracle_pack_sequences,
    "bpe_merges_documents": _oracle_bpe,
    "bpe_encode_documents": _oracle_bpe_encode,
    "extract_kind_stats": _oracle_kind_stats,
    "embedding_kmeans": _oracle_kmeans,
    "semdedup_embeddings": _oracle_semdedup,
    "embedding_pca_top_component": _oracle_pca,
    "pagerank_part_supplier": _oracle_pagerank,
    "compress_ratio_documents": _oracle_compress_ratio,
}
