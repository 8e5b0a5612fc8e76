"""Distributed PageRank over an edge-list Dataset.

Scale design: the edge list is the only corpus-sized object and it is
never gathered — each iteration is one ``Dataset.join`` (edges × ranks
on src), a per-batch combiner emitting INTEGER-quantized contribution
partials, a bucketed groupby summing per dst, and a node-sized
left-join back onto the static node table. Driver state is O(1).

Reproducibility (same policy as ``ann.kmeans_assign``'s quantized
centroid recurrence): contributions are quantized to an integer grid
BEFORE the distributed sum, so summation order cannot perturb the
trajectory by even one ulp — int64 addition is associative. The rank
update then re-quantizes onto the same grid. A single-process numpy
oracle computing the identical recurrence matches bit-for-bit
(``queries._oracle_pagerank``), which is what lets an iterative
float algorithm pass a full-value equality check.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Sum

from .. import relops


def pagerank(
    edges: ray.data.Dataset,
    *,
    iters: int = 5,
    damping: float = 0.85,
    quant: float = 1e-9,
    node_gate: int = 5_000_000,
) -> ray.data.Dataset:
    """``edges`` must have int64 columns (src, dst), already deduplicated;
    every node must appear as a src at least once (true for symmetric
    graphs). Returns a Dataset (node, rank) on the quant grid.

    Size-gated like the dimension joins: when the node count is under
    ``node_gate`` the rank vector is DRIVER state (model-sized, the
    k-means pattern — ~40 MB at the gate) broadcast per iteration, and
    each iteration is one edge pass + one bucketed sum; above the gate
    ranks stay a distributed Dataset and each iteration joins edges ×
    ranks. Both paths run the identical integer-quantized recurrence, so
    they agree bit-for-bit (pytest-pinned)."""

    def deg_partial(batch: pa.Table) -> pa.Table:
        return batch.select(["src"]).group_by(["src"]).aggregate([("src", "count")])

    def deg_bucket(group: pa.Table) -> pa.Table:
        g = group.group_by(["src"]).aggregate([("src_count", "sum")])
        return pa.table(
            {
                "node": g.column("src"),
                "deg": pc.cast(g.column("src_count_sum"), pa.int64()),
            }
        )

    nodes = relops.bucketed_groupby(
        edges.map_batches(deg_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["src"], deg_bucket,
        empty=pa.table(
            {"node": pa.array([], pa.int64()), "deg": pa.array([], pa.int64())}
        ),
    ).materialize()
    n_nodes = nodes.count()
    base = (1.0 - damping) / n_nodes
    r0 = np.round((1.0 / n_nodes) / quant) * quant

    if n_nodes <= node_gate:
        return _pagerank_broadcast(
            edges, nodes, n_nodes, iters=iters, damping=damping, quant=quant
        )

    def init_ranks(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch.column("node"),
                "deg": batch.column("deg"),
                "r": pa.array(np.full(batch.num_rows, r0), pa.float64()),
            }
        )

    ranks = nodes.map_batches(init_ranks, batch_format="pyarrow", zero_copy_batch=True)
    n_parts = relops.choose_num_partitions_for(edges)

    for _ in range(iters):
        joined = edges.join(
            ranks, "inner", num_partitions=n_parts, on=("src",), right_on=("node",)
        )

        def contrib_partial(batch: pa.Table) -> pa.Table:
            if "dst" not in batch.column_names:
                return pa.table(
                    {"dst": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
                )
            r = batch.column("r").to_numpy(zero_copy_only=False)
            deg = batch.column("deg").to_numpy(zero_copy_only=False)
            c = np.round((r / deg) / quant).astype(np.int64)
            t = pa.table({"dst": batch.column("dst"), "c": pa.array(c, pa.int64())})
            return t.group_by(["dst"]).aggregate([("c", "sum")])

        def sum_bucket(group: pa.Table) -> pa.Table:
            g = group.group_by(["dst"]).aggregate([("c_sum", "sum")])
            return pa.table({"dst": g.column("dst"), "c": g.column("c_sum_sum")})

        sums = relops.bucketed_groupby(
            joined.map_batches(
                contrib_partial, batch_format="pyarrow", zero_copy_batch=True
            ),
            ["dst"], sum_bucket,
            empty=pa.table(
                {"dst": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
            ),
        )
        merged = nodes.join(
            sums, "left_outer",
            num_partitions=max(8, n_parts // 4),
            on=("node",), right_on=("dst",),
        )

        def update(batch: pa.Table) -> pa.Table:
            if "node" not in batch.column_names:
                return pa.table(
                    {
                        "node": pa.array([], pa.int64()),
                        "deg": pa.array([], pa.int64()),
                        "r": pa.array([], pa.float64()),
                    }
                )
            c = batch.column("c") if "c" in batch.column_names else pa.nulls(
                batch.num_rows, pa.int64()
            )
            csum = pc.fill_null(c, 0).to_numpy(zero_copy_only=False).astype(np.float64)
            newr = np.round((base + damping * csum * quant) / quant) * quant
            return pa.table(
                {
                    "node": batch.column("node"),
                    "deg": batch.column("deg"),
                    "r": pa.array(newr, pa.float64()),
                }
            )

        ranks = relops.drop_empty_blocks(
            merged.map_batches(update, batch_format="pyarrow", zero_copy_batch=True),
            pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "deg": pa.array([], pa.int64()),
                    "r": pa.array([], pa.float64()),
                }
            ),
        )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("node"), "rank": batch.column("r")})

    return ranks.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def _pagerank_broadcast(
    edges: ray.data.Dataset,
    nodes: ray.data.Dataset,
    n_nodes: int,
    *,
    iters: int,
    damping: float,
    quant: float,
) -> ray.data.Dataset:
    """Under-gate path: ranks are a driver numpy vector indexed by the
    sorted node array (broadcast once per iteration via ray.put); each
    iteration is ONE streaming edge pass emitting per-batch (dst, c_int)
    partials + one bucketed sum gathered node-sized."""
    nd = nodes.to_pandas().sort_values("node")
    node_arr = nd["node"].to_numpy(np.int64)
    deg_arr = nd["deg"].to_numpy(np.int64)
    base = (1.0 - damping) / n_nodes
    r = np.full(n_nodes, np.round((1.0 / n_nodes) / quant) * quant)
    edges = edges.materialize()  # iterated `iters` times; freeze the refs

    for _ in range(iters):
        state_ref = ray.put((node_arr, deg_arr, r))

        def contrib_partial(batch: pa.Table) -> pa.Table:
            na, da, rv = ray.get(state_ref)
            src = batch.column("src").to_numpy(zero_copy_only=False)
            idx = np.searchsorted(na, src)
            c = np.round((rv[idx] / da[idx]) / quant).astype(np.int64)
            t = pa.table({"dst": batch.column("dst"), "c": pa.array(c, pa.int64())})
            return t.group_by(["dst"]).aggregate([("c", "sum")])

        def sum_bucket(group: pa.Table) -> pa.Table:
            g = group.group_by(["dst"]).aggregate([("c_sum", "sum")])
            return pa.table({"dst": g.column("dst"), "c": g.column("c_sum_sum")})

        sums = relops.bucketed_groupby(
            edges.map_batches(
                contrib_partial, batch_format="pyarrow", zero_copy_batch=True
            ),
            ["dst"], sum_bucket,
            empty=pa.table(
                {"dst": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
            ),
        ).to_pandas()  # node-sized by the gate
        csum = np.zeros(n_nodes, dtype=np.int64)
        pos = np.searchsorted(node_arr, sums["dst"].to_numpy(np.int64))
        csum[pos] = sums["c"].to_numpy(np.int64)
        r = np.round((base + damping * csum.astype(np.float64) * quant) / quant) * quant

    return ray.data.from_arrow(
        pa.table(
            {"node": pa.array(node_arr, pa.int64()), "rank": pa.array(r, pa.float64())}
        )
    )


def pagerank_numpy(
    src: np.ndarray,
    dst: np.ndarray,
    *,
    iters: int = 5,
    damping: float = 0.85,
    quant: float = 1e-9,
) -> tuple[np.ndarray, np.ndarray]:
    """Single-process reference: the SAME integer-quantized recurrence
    (per-edge contributions quantized before the sum), one numpy pass per
    iteration. Returns (nodes_sorted, ranks)."""
    nodes, inv_src = np.unique(src, return_inverse=True)
    deg = np.bincount(inv_src, minlength=len(nodes))
    dst_idx = np.searchsorted(nodes, dst)
    n = len(nodes)
    base = (1.0 - damping) / n
    r = np.full(n, np.round((1.0 / n) / quant) * quant)
    for _ in range(iters):
        c = np.round((r[inv_src] / deg[inv_src]) / quant).astype(np.int64)
        sums = np.zeros(n, dtype=np.int64)
        np.add.at(sums, dst_idx, c)
        r = np.round((base + damping * sums.astype(np.float64) * quant) / quant) * quant
    return nodes, r
