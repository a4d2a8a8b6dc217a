"""Stage 4a: canonicalization — connected components over the alias
graph (SURVEY §2.6 G3), as iterated min-label propagation on Ray Data.

Algorithm (hash-to-min): every node starts labeled with itself; each
round, every node takes the min label over itself and its neighbors;
fixpoint <= diameter rounds (we iterate until a round changes nothing,
bounded by ``max_iters``).  Each round is:

    edges (u,v) + reversed -> join labels on the neighbor side
    -> groupby(node).aggregate(Min(label))

Both the join and the groupby are hash-partitioned by node, so a hot
node (the skew knob's E000000) concentrates *edges*, not groups; the
pre-aggregation inside ``min_label_round`` (a per-batch partial min)
keeps the shuffle payload at one row per (node, partial-min) per block
— the salted two-level aggregation pattern.

``connected_components_driver`` is the small-graph fast path
(union-find over a materialized edge list): correct whenever the edge
list is post-aggregation small (the flagship's alias graph is
vocabulary-bounded).  The distributed version exists for graphs that
are not.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Min


def _partial_min(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: one row per node with the local min label —
    shrinks the shuffle before the global groupby (salt-free two-level
    aggregation; correct because min is associative/commutative)."""
    g = batch.group_by("node").aggregate([("label", "min")])
    return pa.table({"node": g["node"], "label": g["label_min"]})


def build_neighbor_stream(edges: rd.Dataset, num_partitions: int) -> rd.Dataset:
    """edges -> symmetric (node, nbr) stream, repartitioned (merges the
    zero-column empty blocks upstream shuffles emit for empty hash
    partitions — Arrow's join rejects them — and balances the join
    input).  Built ONCE per components run: it only depends on the edge
    set, so rebuilding it every propagation round (round 1's layout)
    paid two maps + a union + a shuffle per round for nothing."""
    fwd = edges.map_batches(
        lambda t: pa.table({"node": t["src"], "nbr": t["dst"]}),
        batch_format="pyarrow",
    )
    rev = edges.map_batches(
        lambda t: pa.table({"node": t["dst"], "nbr": t["src"]}),
        batch_format="pyarrow",
    )
    return fwd.union(rev).repartition(num_partitions)


def min_label_round(labels: rd.Dataset, nbrs: rd.Dataset, num_partitions: int) -> rd.Dataset:
    """One propagation round. labels: (node, label); nbrs: (node, nbr)
    from ``build_neighbor_stream`` (materialized by the caller)."""
    # neighbor label: join on the neighbor's node id
    nbr_labels = nbrs.join(
        labels,
        join_type="inner",
        num_partitions=num_partitions,
        on=("nbr",),
        right_on=("node",),
        right_suffix="_r",
    ).map_batches(
        lambda t: pa.table({"node": t["node"], "label": t["label"]}),
        batch_format="pyarrow",
    )
    allrows = labels.union(nbr_labels).map_batches(
        _partial_min, batch_format="pyarrow"
    )
    # sorted path, NOT groupby().aggregate: label-map groups are one
    # per NODE — corpus-scaled for a large dup graph, the cardinality
    # where the Aggregate finalizer's per-group Python call dominates
    # (ops/agg.py rationale)
    from .agg import sorted_grouped_sum

    return sorted_grouped_sum(allrows, ["node"], "label", "label", op="min")


def connected_components(
    edges: rd.Dataset,
    num_partitions: int = 16,
    max_iters: int = 16,
) -> rd.Dataset:
    """edges (src, dst) -> (node, label) component map.

    Iterates to fixpoint (checked via a tiny count aggregate per round:
    rows whose label changed).  Each round materializes the label map —
    it is one row per node, far smaller than the corpus.  The neighbor
    stream is built and pinned once; ``num_partitions`` should track
    the label-map size (a few per node at cluster scale — at bench
    scale callers pass a small value to cut per-round actor latency).
    """
    from .agg import sorted_distinct

    nbrs = build_neighbor_stream(edges, num_partitions).materialize()
    # per-batch distinct combiner + sorted_distinct: node cardinality
    # is corpus-scaled, the per-group-Python Aggregate shape to avoid
    nodes = sorted_distinct(
        nbrs.map_batches(
            lambda t: pa.table({"node": t["node"]})
            .group_by(["node"])
            .aggregate([]),
            batch_format="pyarrow",
        ),
        ["node"],
    )
    labels = (
        nodes.map_batches(
            lambda t: pa.table({"node": t["node"], "label": t["node"]}),
            batch_format="pyarrow",
        )
        .repartition(num_partitions)  # merge empty groupby blocks pre-join
        .materialize()
    )
    for _ in range(max_iters):
        new_labels = (
            min_label_round(labels, nbrs, num_partitions)
            .repartition(num_partitions)
            .materialize()
        )
        # convergence: did any label change?  join old/new and compare
        changed = (
            new_labels.join(
                labels,
                join_type="inner",
                num_partitions=num_partitions,
                on=("node",),
                right_suffix="_old",
            )
            .map_batches(
                lambda t: pa.table(
                    {"c": pc.cast(pc.not_equal(t["label"], t["label_old"]), pa.int64())}
                ),
                batch_format="pyarrow",
            )
            .sum("c")
        )
        old = labels
        labels = new_labels
        if not changed:
            break
    return labels


def connected_components_driver(edge_list) -> dict:
    """Union-find fast path for post-aggregation-small graphs.  Ids may
    be any hashable ordered type (strings, int64 doc ids, ...);
    canonical label = the native min of the component — the same
    fixpoint as min-label propagation over the same ids."""
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {n: find(n) for n in list(parent)}
