"""Distributed connected components over an int64 edge list.

The shared grouping primitive behind MinHash-LSH near-dup clustering
(``text/ops.py``) and the cross-tile vectorize stitch
(``stages/vectorize.py``): given an edge list ``(a, b)`` of int64 node ids,
compute, for every node incident to at least one edge, the minimum node id
of its connected component.

Algorithm: iterated **min-label propagation with pointer jumping** — the
standard shared-nothing formulation (Hash-to-Min family). Each round is a
fixed set of Ray Data hash joins/groupbys (all-to-all on the *edge* table,
never on payload data):

1. propagate: every edge sends ``min(label_a, label_b)`` to both endpoints;
   labels reduce by ``groupby(node).min``.
2. jump: ``label ← label(label)`` via a self-join (labels always hold node
   ids, so the join is total), halving chain depth — O(log diameter)
   rounds overall.
3. converge: stop when ``sum(label)`` is unchanged (labels are monotone
   non-increasing, so the sum is a complete convergence witness).

The edge list is materialized once up front: iteration would otherwise
re-execute the (possibly expensive) upstream candidate-generation plan every
round. Edges are metadata (O(candidates), never O(corpus payload)) — the
same boundedness argument as the reference's shapefile side tables.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Min

__all__ = ["connected_components", "auto_join_partitions"]


def rename_cols(ds: "ray.data.Dataset", mapping: dict) -> "ray.data.Dataset":
    """Rename via a real map_batches projection. ``Dataset.rename_columns``
    is applied lazily/fused in this Ray version and demonstrably does NOT
    take effect between chained joins (a materialized rename showed the old
    name, then both renames appeared one operator later) — self-joins then
    die with 'No match or multiple matches for key field'. A map_batches
    rename produces physically renamed blocks."""

    def rn(t: pa.Table) -> pa.Table:
        return t.rename_columns([mapping.get(c, c) for c in t.column_names])

    return ds.map_batches(rn, batch_format="pyarrow")


def auto_join_partitions(cap: int = 16) -> int:
    """Hash-join parallelism sized to the cluster: Ray's join runs one
    aggregator actor per partition, so ``num_partitions`` above the CPU
    count DEADLOCKS on small clusters (seen at num_cpus=4, partitions=8).
    Half the CPUs keeps map tasks schedulable alongside the aggregators."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(2, min(cap, cpus // 2))


def connected_components(
    edges: "ray.data.Dataset",
    num_partitions: int | None = None,
    max_iters: int = 64,
) -> "ray.data.Dataset":
    """Labels of the connected components of an undirected int64 edge list.

    Args:
        edges: Dataset with int64 columns ``a`` and ``b`` (one row per edge;
            duplicates and self-loops are harmless).
        num_partitions: hash-join parallelism for the label joins.
        max_iters: safety bound; with pointer jumping, real convergence is
            O(log diameter) (a 10^6-node path converges in ~20 rounds).

    Returns:
        Dataset ``(node int64, label int64)`` — ``label`` is the minimum
        node id in the node's component. Only nodes that appear in ``edges``
        are present.
    """
    if num_partitions is None:
        num_partitions = auto_join_partitions()
    edges = edges.select_columns(["a", "b"]).materialize()

    def verts(t: pa.Table) -> pa.Table:
        u = pc.unique(
            pa.concat_arrays(
                [t["a"].combine_chunks().cast(pa.int64()),
                 t["b"].combine_chunks().cast(pa.int64())]
            )
        )
        return pa.table({"node": u, "label": u})

    labels = (
        edges.map_batches(verts, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("label", alias_name="label"))
        .materialize()
    )
    prev_sum = labels.sum("label")

    def msgs(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy()
        b = t["b"].to_numpy()
        m = np.minimum(t["la"].to_numpy(), t["lb"].to_numpy())
        return pa.table(
            {
                "node": pa.array(np.concatenate([a, b]), pa.int64()),
                "label": pa.array(np.concatenate([m, m]), pa.int64()),
            }
        )

    for _ in range(max_iters):
        # 1. propagate min(label_a, label_b) along every edge
        la = rename_cols(
            edges.join(labels, "inner", num_partitions, on=("a",), right_on=("node",)),
            {"label": "la"},
        )
        lb = rename_cols(
            la.join(labels, "inner", num_partitions, on=("b",), right_on=("node",)),
            {"label": "lb"},
        )
        propagated = (
            lb.map_batches(msgs, batch_format="pyarrow")
            .union(labels)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            # materialize: the jump below consumes `propagated` on BOTH join
            # sides; feeding an unmaterialized diamond through the join makes
            # the right side's rename leak into the left (observed: 'No match
            # ... FieldRef.Name(label) on left side'). The label table is
            # O(nodes-in-edges) — bounded metadata.
            .materialize()
        )
        # 2. pointer jump: label ← label(label). Labels only ever hold node
        # ids (init = node, reduce = min over node-id labels) so the inner
        # self-join is total.
        jumped = (
            rename_cols(
                propagated.join(
                    rename_cols(propagated, {"node": "jn", "label": "jl"}),
                    "inner",
                    num_partitions,
                    on=("label",),
                    right_on=("jn",),
                ).select_columns(["node", "jl"]),
                {"jl": "label"},
            )
            .materialize()
        )
        cur_sum = jumped.sum("label")
        labels = jumped
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels
