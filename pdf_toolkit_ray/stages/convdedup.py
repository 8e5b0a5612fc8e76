"""Conversation-level deduplication over transcript tables.

Real agent-transcript corpora repeat WHOLE conversations (retried or
re-logged sessions), share long prefixes (branched conversations), and
open with templated system turns — so dedup must run at conversation
granularity, not row granularity. These stages generalize the
row/document dedup family (``stages/dedup.py``) to the grouped-sequence
case the reference's per-page pipeline never needed (reference analog:
content-identity of rendered pages, pdf-toolkit ``src/pdf-toolkit``
render/split stages — here the "identity" is the whole ordered turn
sequence).

Scale shape, shared by every stage here: turn TEXTS are hashed map-side
into 48-bit ints (md5 prefix — DuckDB-reproducible, so the driver twins
re-derive them exactly) and ONLY ``(conv_id, int)`` pairs ever enter a
shuffle; conversation digests are order-free sums of per-turn hashes
with the turn index baked into the hash, so no stage needs a sorted
groupby. Candidate generation for near-duplicate conversations is
frequency-capped exactly like the document MinHash/5-gram families:
turn hashes shared by more than ``cap`` conversations (the boilerplate)
never generate pairs, and the exact set-Jaccard verify step re-includes
them, so capping costs recall of nothing it shouldn't.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..relops import bucketed_groupby, drop_empty_blocks, size_gated_join

#: turn hashes shared by more than this many conversations are treated as
#: boilerplate and generate no candidate pairs (the exact verify still
#: counts them, so flagged pairs' Jaccard values are true set Jaccards)
DEFAULT_HASH_CAP = 8


def _md5_prefix_i64(parts: list[str]) -> np.ndarray:
    """int64 of the first 12 hex chars of md5 — matches DuckDB
    ``CAST(('0x' || substr(md5(s), 1, 12)) AS BIGINT)`` exactly."""
    return np.fromiter(
        (
            int(hashlib.md5(s.encode("utf-8")).hexdigest()[:12], 16)
            for s in parts
        ),
        dtype=np.int64,
        count=len(parts),
    )


def _turn_identity_hash(batch: pa.Table) -> pa.Table:
    """(conv_id, v) where v hashes the FULL turn identity incl. position:
    ``turn_idx|role|text|tool`` — the exact-dedup digest unit."""
    turn = batch.column("turn_idx").to_pylist()
    role = batch.column("role").to_pylist()
    text = batch.column("text").to_pylist()
    tool = batch.column("tool").to_pylist()
    keys = [
        f"{turn[i]}|{role[i]}|{text[i] or ''}|{tool[i] or ''}"
        for i in range(len(turn))
    ]
    t = pa.table(
        {
            "conv_id": batch.column("conv_id"),
            "v": pa.array(_md5_prefix_i64(keys), pa.int64()),
        }
    )
    # local distinct: collapses re-logged duplicate rows before the shuffle
    return t.group_by(["conv_id", "v"]).aggregate([])


def _turn_content_hash(batch: pa.Table) -> pa.Table:
    """(conv_id, v) where v hashes turn CONTENT only (``role|text``) —
    the overlap/near-dup unit (position-free, tool-free)."""
    role = batch.column("role").to_pylist()
    text = batch.column("text").to_pylist()
    keys = [f"{role[i]}\x1f{text[i] or ''}" for i in range(len(role))]
    t = pa.table(
        {
            "conv_id": batch.column("conv_id"),
            "v": pa.array(_md5_prefix_i64(keys), pa.int64()),
        }
    )
    return t.group_by(["conv_id", "v"]).aggregate([])


_DIGEST_EMPTY = pa.table(
    {
        "conv_id": pa.array([], pa.string()),
        "dg": pa.array([], pa.int64()),
        "n": pa.array([], pa.int64()),
    }
)


def conv_digests(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Per-conversation content digest: (conv_id, dg, n) where dg is the
    sum of distinct per-turn identity hashes (48-bit, so int64 sums are
    exact to ~32k-turn conversations) and n the distinct turn count.
    Order-free sum + position-baked hash = order-sensitive digest with
    no per-conversation sort. One conv-bucketed shuffle of int pairs."""
    pairs = ds.map_batches(
        _turn_identity_hash, batch_format="pyarrow", zero_copy_batch=True
    )

    def per_conv(group: pa.Table) -> pa.Table:
        d = group.group_by(["conv_id", "v"]).aggregate([])
        g = d.group_by(["conv_id"]).aggregate([("v", "sum"), ([], "count_all")])
        return pa.table(
            {
                "conv_id": g.column("conv_id"),
                "dg": pc.cast(g.column("v_sum"), pa.int64()),
                "n": pc.cast(g.column("count_all"), pa.int64()),
            }
        )

    return bucketed_groupby(pairs, ["conv_id"], per_conv, empty=_DIGEST_EMPTY)


def conv_dedup_exact(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Exact whole-conversation dedup: one row per conversation with its
    duplicate-group canonical (min conv_id) and group size. Digest table
    is conversation-count-sized; the group attach is size-gated (joins
    by the string key ``dg:n`` so collision behavior is identical to the
    SQL twin's GROUP BY dg, n)."""
    digests = conv_digests(ds).materialize()

    def _with_key(batch: pa.Table) -> pa.Table:
        dg = batch.column("dg").to_pylist()
        n = batch.column("n").to_pylist()
        key = pa.array([f"{a}:{b}" for a, b in zip(dg, n)], pa.string())
        return pa.table({"conv_id": batch.column("conv_id"), "gk": key})

    keyed = digests.map_batches(
        _with_key, batch_format="pyarrow", zero_copy_batch=True
    )

    def per_group(group: pa.Table) -> pa.Table:
        g = group.group_by(["gk"]).aggregate(
            [("conv_id", "min"), ([], "count_all")]
        )
        return pa.table(
            {
                "gk": g.column("gk"),
                "canonical_conv_id": g.column("conv_id_min"),
                "group_convs": pc.cast(g.column("count_all"), pa.int64()),
            }
        )

    groups = bucketed_groupby(
        keyed,
        ["gk"],
        per_group,
        empty=pa.table(
            {
                "gk": pa.array([], pa.string()),
                "canonical_conv_id": pa.array([], pa.string()),
                "group_convs": pa.array([], pa.int64()),
            }
        ),
    ).materialize()
    return size_gated_join(keyed, groups, on="gk").map_batches(
        lambda b: b.drop_columns(["gk"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


_PAIRS_EMPTY = pa.table(
    {"a": pa.array([], pa.string()), "b": pa.array([], pa.string())}
)


def _capped_pairs(cap: int):
    """Per-bucket candidate generation: for every turn hash shared by
    2..cap conversations, all (a<b) conversation pairs."""

    def per_group(group: pa.Table) -> pa.Table:
        d = (
            group.group_by(["v", "conv_id"])
            .aggregate([])
            .sort_by([("v", "ascending"), ("conv_id", "ascending")])
        )
        v = d.column("v").to_numpy(zero_copy_only=False)
        conv = np.asarray(d.column("conv_id").to_pylist(), dtype=object)
        if len(v) == 0:
            return _PAIRS_EMPTY
        starts = np.flatnonzero(np.r_[True, v[1:] != v[:-1]])
        bounds = np.r_[starts, len(v)]
        a_out: list[str] = []
        b_out: list[str] = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            m = e - s
            if m < 2 or m > cap:
                continue
            ids = conv[s:e]
            for i in range(m - 1):
                for j in range(i + 1, m):
                    a_out.append(ids[i])
                    b_out.append(ids[j])
        return pa.table(
            {
                "a": pa.array(a_out, pa.string()),
                "b": pa.array(b_out, pa.string()),
            }
        )

    return per_group


def conv_overlap_pairs(
    ds: ray.data.Dataset,
    *,
    cap: int = DEFAULT_HASH_CAP,
    threshold: float = 0.5,
    broadcast_pair_limit: int = 100_000,
) -> ray.data.Dataset:
    """Near-duplicate CONVERSATION pairs by exact Jaccard over each
    conversation's set of turn-content hashes: (a, b, shared, jaccard)
    for a < b with jaccard >= threshold.

    Candidates come from a frequency-capped inverted index on the turn
    hash (boilerplate turns index nothing); the verify step attaches
    each candidate conversation's FULL hash set (ints only, size-gated
    broadcast vs distributed join via the shared pair-attach path) and
    computes the true set Jaccard, so capping affects candidate recall
    of boilerplate-only pairs — which are below any useful threshold by
    construction — and nothing else."""
    from .dedup import _attach_verify_pairs

    pairs0 = ds.map_batches(
        _turn_content_hash, batch_format="pyarrow", zero_copy_batch=True
    )
    # one v-bucketed shuffle gives the globally-distinct (conv, v) pairs
    # with each hash wholly in one bucket — reused for candidate gen
    chd = bucketed_groupby(
        pairs0,
        ["v"],
        lambda g: g.group_by(["conv_id", "v"]).aggregate([]),
        empty=pa.table(
            {"conv_id": pa.array([], pa.string()), "v": pa.array([], pa.int64())}
        ),
    ).materialize()

    cand = bucketed_groupby(
        chd, ["v"], _capped_pairs(cap), empty=_PAIRS_EMPTY
    ).materialize()

    # per-conversation hash-set payload: ints joined into one string so
    # the generic pair-attach machinery can ship it as a single column
    def per_conv_set(group: pa.Table) -> pa.Table:
        d = group.group_by(["conv_id", "v"]).aggregate([])
        conv = np.asarray(d.column("conv_id").to_pylist(), dtype=object)
        v = d.column("v").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, conv))
        conv, v = conv[order], v[order]
        starts = np.flatnonzero(np.r_[True, conv[1:] != conv[:-1]])
        bounds = np.r_[starts, len(conv)]
        ids = [conv[s] for s in starts]
        sets = [
            ",".join(str(x) for x in v[s:e])
            for s, e in zip(bounds[:-1], bounds[1:])
        ]
        return pa.table(
            {
                "conv_id": pa.array(ids, pa.string()),
                "hset": pa.array(sets, pa.string()),
            }
        )

    conv_sets = bucketed_groupby(
        chd,
        ["conv_id"],
        per_conv_set,
        empty=pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "hset": pa.array([], pa.string()),
            }
        ),
    ).materialize()

    out_empty = pa.table(
        {
            "a": pa.array([], pa.string()),
            "b": pa.array([], pa.string()),
            "shared": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64()),
        }
    )

    def _verify(joined: pa.Table) -> pa.Table:
        a = joined.column("a").to_pylist()
        b = joined.column("b").to_pylist()
        pa_sets = joined.column("payload_a").to_pylist()
        pb_sets = joined.column("payload_b").to_pylist()
        a_out, b_out, sh_out, j_out = [], [], [], []
        for i in range(len(a)):
            sa = set((pa_sets[i] or "").split(","))
            sb = set((pb_sets[i] or "").split(","))
            sa.discard("")
            sb.discard("")
            shared = len(sa & sb)
            denom = len(sa) + len(sb) - shared
            if denom == 0:
                continue
            # one double division of exact ints — bit-identical to the
            # twin's CAST(s AS DOUBLE) / (na + nb - s)
            j = shared / denom
            if j >= threshold:
                a_out.append(a[i])
                b_out.append(b[i])
                sh_out.append(shared)
                j_out.append(j)
        return pa.table(
            {
                "a": pa.array(a_out, pa.string()),
                "b": pa.array(b_out, pa.string()),
                "shared": pa.array(sh_out, pa.int64()),
                "jaccard": pa.array(j_out, pa.float64()),
            }
        )

    return _attach_verify_pairs(
        conv_sets,
        drop_empty_blocks(cand, _PAIRS_EMPTY),
        "conv_id",
        pa.string(),
        payload_of=lambda b: b.column("hset"),
        verify_fn=_verify,
        out_empty=out_empty,
        broadcast_pair_limit=broadcast_pair_limit,
        num_partitions=8,
    )


def shared_turn_texts(
    ds: ray.data.Dataset, *, min_convs: int = 5, max_texts: int = 10_000
) -> pa.Table:
    """Boilerplate detection: turn texts appearing in >= min_convs
    distinct conversations, with conversation and row counts. Texts are
    hashed map-side; the flagged-hash set is broadcast back over a
    second scan to recover the actual texts — corpus text bytes never
    enter a shuffle. Returns a driver-sized Arrow table.

    ``max_texts`` is the driver-memory valve (same pattern as
    ``relops.skew_join.max_hot_keys``): the flagged-hash aggregation
    stays fully distributed, and when more than ``max_texts`` distinct
    texts clear the threshold — a low ``min_convs`` over a heavily
    templated 100-TB corpus — only the top-``max_texts`` by
    (n_convs, n_rows, hash) reach the driver, selected with the
    per-batch-pruned ``relops.topk`` (no global sort of the flag set).
    Under the cap the result is byte-identical to the uncapped one."""

    def _content_hash(batch: pa.Table) -> pa.Table:
        text = batch.column("text").to_pylist()
        keys = [t or "" for t in text]
        return pa.table(
            {
                "conv_id": batch.column("conv_id"),
                "v": pa.array(_md5_prefix_i64(keys), pa.int64()),
            }
        )

    hashed = ds.map_batches(
        _content_hash, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def per_hash(group: pa.Table) -> pa.Table:
        nr = group.group_by(["v"]).aggregate([([], "count_all")])
        d = group.group_by(["v", "conv_id"]).aggregate([])
        nc = d.group_by(["v"]).aggregate([([], "count_all")])
        # rebuild by NAME — pyarrow appends key columns after aggregates
        nr_t = pa.table(
            {"v": nr.column("v"), "n_rows": pc.cast(nr.column("count_all"), pa.int64())}
        )
        nc_t = pa.table(
            {"v": nc.column("v"), "n_convs": pc.cast(nc.column("count_all"), pa.int64())}
        )
        joined = nc_t.join(nr_t, keys=["v"])
        return joined.filter(pc.greater_equal(joined.column("n_convs"), min_convs))

    flagged_ds = bucketed_groupby(
        hashed.select_columns(["conv_id", "v"]),
        ["v"],
        per_hash,
        empty=pa.table(
            {
                "v": pa.array([], pa.int64()),
                "n_convs": pa.array([], pa.int64()),
                "n_rows": pa.array([], pa.int64()),
            }
        ),
    ).materialize()
    if flagged_ds.count() > max_texts:
        # deterministic top-N: most prevalent first, hash as tiebreak
        from ..relops import topk

        flagged_ds = topk(
            flagged_ds,
            [("n_convs", "descending"), ("n_rows", "descending"), ("v", "ascending")],
            max_texts,
        )
    flagged = flagged_ds.to_pandas()
    if len(flagged) == 0:
        return pa.table(
            {
                "text": pa.array([], pa.string()),
                "n_convs": pa.array([], pa.int64()),
                "n_rows": pa.array([], pa.int64()),
            }
        )

    vset = pa.array(sorted(int(x) for x in flagged["v"]), pa.int64())
    vref = ray.put(vset)

    def _recover(batch: pa.Table) -> pa.Table:
        text = batch.column("text").to_pylist()
        keys = [t or "" for t in text]
        v = pa.array(_md5_prefix_i64(keys), pa.int64())
        t = pa.table({"v": v, "text": batch.column("text")})
        kept = t.filter(pc.is_in(t.column("v"), value_set=ray.get(vref)))
        return kept.group_by(["v", "text"]).aggregate([])

    texts = (
        ds.map_batches(_recover, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .drop_duplicates()
    )
    merged = texts.merge(flagged, on="v").sort_values("text")
    return pa.table(
        {
            "text": pa.array(merged["text"], pa.string()),
            "n_convs": pa.array(
                merged["n_convs"].astype("int64"), pa.int64()
            ),
            "n_rows": pa.array(merged["n_rows"].astype("int64"), pa.int64()),
        }
    )


def context_repeat(ds: ray.data.Dataset, n: int = 3) -> ray.data.Dataset:
    """Within-conversation repetition: for every turn with >= n words,
    how many of its word n-gram OCCURRENCES already appeared in an
    earlier turn (smaller turn_idx) of the same conversation — the
    "agent re-quoting its context" signal. Returns (conv_id, turn_idx,
    n_grams, n_repeat, repeat_frac).

    Shape: one conv-bucketed shuffle of the (distinct) turn rows; gram
    explosion happens inside the bucket, and first-occurrence turns are
    computed with one vectorized pandas groupby-transform over the whole
    bucket — no per-conversation loop."""
    import pandas as pd

    def _distinct(batch: pa.Table) -> pa.Table:
        return batch.group_by(["conv_id", "turn_idx", "text"]).aggregate([])

    rows = ds.map_batches(_distinct, batch_format="pyarrow", zero_copy_batch=True)

    empty = pa.table(
        {
            "conv_id": pa.array([], pa.string()),
            "turn_idx": pa.array([], pa.int32()),
            "n_grams": pa.array([], pa.int64()),
            "n_repeat": pa.array([], pa.int64()),
            "repeat_frac": pa.array([], pa.float64()),
        }
    )

    def per_bucket(group: pa.Table) -> pa.Table:
        d = group.group_by(["conv_id", "turn_idx", "text"]).aggregate([])
        conv = d.column("conv_id").to_pylist()
        turn = d.column("turn_idx").to_pylist()
        text = d.column("text").to_pylist()
        g_conv: list[str] = []
        g_turn: list[int] = []
        g_gram: list[str] = []
        for c, t, x in zip(conv, turn, text):
            toks = (x or "").split()
            for i in range(len(toks) - n + 1):
                g_conv.append(c)
                g_turn.append(t)
                g_gram.append(" ".join(toks[i : i + n]))
        if not g_conv:
            return empty
        df = pd.DataFrame(
            {"conv_id": g_conv, "turn_idx": g_turn, "gram": g_gram}
        )
        first = df.groupby(["conv_id", "gram"])["turn_idx"].transform("min")
        df["rep"] = (first < df["turn_idx"]).astype("int64")
        agg = (
            df.groupby(["conv_id", "turn_idx"], as_index=False)
            .agg(n_grams=("gram", "size"), n_repeat=("rep", "sum"))
        )
        return pa.table(
            {
                "conv_id": pa.array(agg["conv_id"], pa.string()),
                "turn_idx": pa.array(agg["turn_idx"], pa.int32()),
                "n_grams": pa.array(agg["n_grams"].astype("int64"), pa.int64()),
                "n_repeat": pa.array(agg["n_repeat"].astype("int64"), pa.int64()),
                "repeat_frac": pa.array(
                    # one double division of exact ints, as in the twin
                    (agg["n_repeat"] / agg["n_grams"]).astype("float64"),
                    pa.float64(),
                ),
            }
        )

    return bucketed_groupby(rows, ["conv_id"], per_bucket, empty=empty)
