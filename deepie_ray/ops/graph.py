"""Graph construction + iterative graph analytics on Ray Data.

The KG side of this engine (ops/canon.py connected components,
pipeline node/edge dedup) covers entity graphs; this module adds the
generic large-graph operators a data-pipeline user needs:

* ``copurchase_edges`` — build a co-occurrence graph from a relational
  fact table (parts sharing an order), the standard "construct the
  graph AT SCALE" step: per-key groups are bounded (an order holds at
  most 7 lineitems), the pair explode happens inside the group, and
  the edge-count aggregation is combiner-first so only narrow
  (a, b, partial_count) rows shuffle.
* ``pagerank`` — damped PageRank by iterated JOIN + grouped SUM: the
  textbook bulk-synchronous formulation, expressed purely with
  Dataset joins/groupbys so every iteration is an ordinary
  hash-partitioned exchange (no driver-side adjacency).  Per-iteration
  driver traffic is one scalar (dangling mass).

Scale notes: ranks/edges stay distributed end to end; the edge list is
pre-joined with out-degrees ONCE (weights materialized) so each
iteration only re-shuffles the rank vector, not the adjacency.  Each
iteration costs exactly ONE Dataset.join (contributions) plus ONE
grouped sum (contrib merge — node completion rides the same groupby
via a zero-contribution base dataset unioned in, instead of a second
join) plus ONE streaming aggregate (dangling mass from a flag column)
— join-aggregator setup, not data volume, dominates at bench scale, so
the join count per iteration is the constant that matters.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Max, Min, Sum

from .joins import hash_join


def distinct_order_parts(lineitem: rd.Dataset) -> rd.Dataset:
    """Globally-distinct (l_orderkey, l_partkey) pairs: per-batch
    combiner distinct then ONE grouped pass — per-batch distinct alone
    would double-count a pair whose rows straddle a block split.
    Pinned (materialized): every caller feeds it to multiple
    consumers."""

    from .agg import sorted_distinct

    def distinct_partial(t: pa.Table) -> pa.Table:
        return t.group_by(["l_orderkey", "l_partkey"]).aggregate([])

    # sorted_distinct, NOT groupby().aggregate: 600k one-row groups
    # cost the Aggregate finalizer one Python call each (7.4s at
    # sf0.1/32cpu); the sort-shuffle + reduceat path is 1.8s for the
    # identical exchange volume (ops/agg.py rationale)
    partials = lineitem.map_batches(distinct_partial, batch_format="pyarrow")
    return (
        sorted_distinct(partials, ["l_orderkey", "l_partkey"])
        .repartition(8)
        .materialize()
    )


def copurchase_edges(
    lineitem: rd.Dataset,
    min_count: int = 1,
    pairs: rd.Dataset | None = None,
) -> rd.Dataset:
    """(part_a, part_b, co_count): undirected co-purchase edges —
    distinct part pairs within each order, counted across orders,
    ``part_a < part_b`` canonical orientation.

    The pair explode is a hash-partitioned SELF-JOIN on the order key
    (per-key multiplicity is bounded by order width, so the join fans
    out at most width^2 per order — never corpus-quadratic), after a
    distinct pass; NOT per-order ``map_groups``, whose one-Python-call-
    per-group overhead cost 17s where this shape costs 5s at sf0.01.
    The cross-order count is combiner-first: per-batch partial counts,
    then one grouped sum of narrow integer rows."""

    # both join sides read p; distinct_order_parts materializes it so
    # the distinct shuffle runs once (lazy-DAG duplication otherwise).
    # Callers that also need the pair set (e.g. association support
    # counts) pass it in so the distinct pass isn't rebuilt.
    p = pairs if pairs is not None else distinct_order_parts(lineitem)
    # p is repartitioned above, so both join inputs are clean; the
    # join OUTPUT still needs its empty zero-column blocks merged away
    # before partial_count accesses columns
    right = p.map_batches(
        lambda t: pa.table(
            {"l_orderkey": t["l_orderkey"], "part_b": t["l_partkey"]}
        ),
        batch_format="pyarrow",
    )
    left = p.map_batches(
        lambda t: pa.table(
            {"l_orderkey": t["l_orderkey"], "part_a": t["l_partkey"]}
        ),
        batch_format="pyarrow",
    )
    joined = hash_join(left, right, on="l_orderkey").repartition(8)

    def partial_count(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["part_a"], t["part_b"]))
        g = t.group_by(["part_a", "part_b"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "part_a": g["part_a"],
                "part_b": g["part_b"],
                "n_partial": g["count_all"],
            }
        )

    from .agg import sorted_grouped_sum

    # sorted_grouped_sum, NOT groupby().aggregate: the pair count has
    # ~1.2M one-row groups at sf0.1 — 16.8s via Aggregate's per-group
    # finalizer, 0.25s via sort + reduceat (ops/agg.py rationale)
    edges = sorted_grouped_sum(
        joined.map_batches(partial_count, batch_format="pyarrow"),
        ["part_a", "part_b"],
        "n_partial",
        "co_count",
    )
    if min_count > 1:
        edges = edges.filter(expr=f"co_count >= {min_count}")
    return edges


def _pagerank_dense(
    e: rd.Dataset,
    nodes: rd.Dataset,
    n_nodes: int,
    iters: int,
    damping: float,
) -> rd.Dataset:
    """Dense-vector PageRank for graphs whose NODE set fits the driver
    (edges still stream distributed — they are indexed once and never
    leave their blocks).  Per iteration: broadcast the (rank/outdeg)
    vector, one streaming pass emitting per-block dense contribution
    vectors, driver-side streaming fold.  Driver bandwidth per
    iteration = n_blocks x n_nodes x 8B, which is why the caller gates
    this path on ``dense_node_cap`` — above it, the join path keeps
    everything distributed."""
    import ray

    node_arr = np.sort(nodes.to_pandas()["node"].to_numpy())
    nref = ray.put(node_arr)

    def index_edges(t: pa.Table) -> pa.Table:
        na = ray.get(nref)
        return pa.table(
            {
                "si": pa.array(
                    np.searchsorted(na, t["src"].to_numpy(zero_copy_only=False)),
                    pa.int64(),
                ),
                "di": pa.array(
                    np.searchsorted(na, t["dst"].to_numpy(zero_copy_only=False)),
                    pa.int64(),
                ),
            }
        )

    # few fat blocks: the driver fold reads one dense vector per block
    n_blocks = 32
    idx = (
        e.map_batches(index_edges, batch_format="pyarrow")
        .repartition(n_blocks)
        .materialize()
    )

    def fold(ds: rd.Dataset, n: int) -> np.ndarray:
        acc = np.zeros(n)
        for b in ds.iter_batches(batch_format="pyarrow", batch_size=None):
            for v in b["vec"].to_pylist():
                acc += np.asarray(v)
        return acc

    outdeg = fold(
        idx.map_batches(
            lambda t: pa.table(
                {
                    "vec": pa.array(
                        [
                            np.bincount(
                                t["si"].to_numpy(zero_copy_only=False),
                                minlength=n_nodes,
                            ).astype(np.float64)
                        ],
                        pa.list_(pa.float64()),
                    )
                }
            ),
            batch_format="pyarrow",
        ),
        n_nodes,
    )
    r = np.full(n_nodes, 1.0 / n_nodes)
    safe_out = np.maximum(outdeg, 1.0)
    dang = outdeg == 0
    for _ in range(iters):
        d_mass = r[dang].sum()
        wref = ray.put(r / safe_out)

        def contrib_block(t: pa.Table) -> pa.Table:
            w = ray.get(wref)
            si = t["si"].to_numpy(zero_copy_only=False)
            di = t["di"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "vec": pa.array(
                        [np.bincount(di, weights=w[si], minlength=n_nodes)],
                        pa.list_(pa.float64()),
                    )
                }
            )

        contrib = fold(
            idx.map_batches(contrib_block, batch_format="pyarrow"), n_nodes
        )
        r = (1.0 - damping) / n_nodes + damping * (contrib + d_mass / n_nodes)
    return rd.from_arrow(
        pa.table(
            {
                "node": pa.array(node_arr, pa.int64()),
                "rank": pa.array(r, pa.float64()),
            }
        )
    )


def pagerank(
    edges: rd.Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 5,
    damping: float = 0.85,
    num_partitions: int = 8,
    dense_node_cap: int = 500_000,
    force_join: bool = False,
    force_dense: bool = False,
) -> rd.Dataset:
    """Damped PageRank over a directed edge list -> (node, rank).
    Node ids must be integers (cast to int64 internally; the dense
    path additionally relies on numeric ``searchsorted``) — hash or
    dictionary-encode string ids upstream (ops/dicts.py) first.

    Bulk-synchronous iterations:
      contrib(v) = sum over u->v of rank(u) / outdeg(u)
      rank'(v)   = (1-d)/N + d * (contrib(v) + dangling_mass / N)
    Dangling mass (rank held by nodes with no out-edges) is
    redistributed uniformly — the standard formulation, the one a
    numpy power-iteration oracle reproduces.

    SIZE-GATED three ways (all pinned by the numpy parity test):
    edge lists at or under ``DRIVER_GRAPH_MAX_EDGES`` run the whole
    power iteration on the driver (one edge pull, zero per-iteration
    Ray rounds — per-iteration task-launch fixed costs dwarf tiny
    graphs; same gate as ``pagerank_int``/``bellman_ford_int``).
    Above that, node counts at most ``dense_node_cap`` take the
    dense-vector path (edges indexed once, never re-shuffled;
    per-iteration cost is ONE streaming pass + a driver fold of
    per-block vectors).  Above the cap — or with ``force_join=True``
    — the all-distributed join path below runs.  ``force_dense``
    pins the middle path for tests.

    Join path: the rank vector carries a precomputed ``dang`` 0/1 flag so the
    dangling mass is a plain streaming sum of ``rank * dang`` — no
    per-iteration join for it.  Node completion (nodes with no
    in-links must still receive the base rank) unions a static
    zero-contribution base dataset into the contribution groupby
    instead of left-joining, so each iteration is one join + one
    grouped sum.  Each iteration materializes; PageRank is inherently
    synchronous, so the barrier is semantic, not accidental."""

    def rename(t: pa.Table, mapping: dict) -> pa.Table:
        return t.rename_columns([mapping.get(c, c) for c in t.column_names])

    e = edges.map_batches(
        lambda t: rename(t, {src_col: "src", dst_col: "dst"}).select(
            ["src", "dst"]
        ),
        batch_format="pyarrow",
        # node-set, out-degree and adjacency-weighting all read e: without
        # this the caller's (possibly expensive) edge pipeline re-executes
        # once per consumer — lazy-DAG duplication, same hazard as
        # copurchase_edges' p
    ).materialize()
    from .agg import sorted_distinct

    if e.count() == 0:
        # sorted_distinct requires non-empty input; the typed empty
        # result short-circuits here
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.float64()),
                }
            )
        )

    if (
        not force_join
        and not force_dense
        and e.count() <= DRIVER_GRAPH_MAX_EDGES
    ):
        # driver path runs BEFORE the distributed node-set pipeline —
        # it derives the node array from the pulled edges itself, so
        # paying a sort exchange for `nodes` first would throw away
        # exactly the per-round fixed costs this path exists to avoid
        # (review finding); shared pull/remap helpers per convention
        cols = _edges_local(e, ("src", "dst"))
        node_arr, (si, di) = _compact_ids(cols["src"], cols["dst"])
        n_nodes = len(node_arr)
        outdeg = np.bincount(si, minlength=n_nodes).astype(np.float64)
        safe_out = np.maximum(outdeg, 1.0)
        dang = outdeg == 0
        r = np.full(n_nodes, 1.0 / n_nodes)
        for _ in range(iters):
            contrib = np.bincount(
                di, weights=r[si] / safe_out[si], minlength=n_nodes
            )
            r = (1.0 - damping) / n_nodes + damping * (
                contrib + r[dang].sum() / n_nodes
            )
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array(node_arr, pa.int64()),
                    "rank": pa.array(r, pa.float64()),
                }
            )
        )

    def node_partial(t: pa.Table) -> pa.Table:
        # per-batch distinct combiner: the exchange moves
        # O(distinct-per-block) ids, not every endpoint row (the raw
        # groupby shape cost ~5s over 4.8M endpoints at sf0.1)
        return (
            pa.table(
                {
                    "node": pa.chunked_array(
                        t["src"].cast(pa.int64()).chunks
                        + t["dst"].cast(pa.int64()).chunks
                    ).combine_chunks()
                }
            )
            .group_by("node")
            .aggregate([])
        )

    nodes = (
        sorted_distinct(
            e.map_batches(node_partial, batch_format="pyarrow"), ["node"]
        )
        # joined below (flagged): repartition clears the grouped
        # zero-column empty-partition blocks (tuning.py join rule)
        .repartition(num_partitions)
        .materialize()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.map_batches(
            lambda t: pa.table(
                {"node": pa.array([], pa.int64()), "rank": pa.array([], pa.float64())}
            ),
            batch_format="pyarrow",
        )
    if not force_join and n_nodes <= dense_node_cap:
        return _pagerank_dense(e, nodes, n_nodes, iters, damping)

    outdeg = (
        e.map_batches(
            lambda t: (
                lambda g: pa.table(
                    {"src": g["src"], "n_partial": g["count_all"]}
                )
            )(
                pa.table({"src": t["src"]})
                .group_by("src")
                .aggregate([([], "count_all")])
            ),
            batch_format="pyarrow",
        )
        .groupby("src")
        .aggregate(Sum("n_partial", alias_name="outdeg"))
        # repartition before EVERY join input that comes out of a
        # groupby/join: empty hash partitions carry zero-COLUMN blocks
        # that crash the Arrow join (tuning.py rule; reproduced here
        # with num_partitions=8 on a 3-node graph)
        .repartition(num_partitions)
        .materialize()
    )
    # adjacency weighted once: edge weight = 1/outdeg(src)
    ew = (
        hash_join(e, outdeg, on="src", num_partitions=num_partitions)
        # repartition directly after the join: empty hash partitions
        # emit zero-COLUMN blocks that break column access downstream
        .repartition(num_partitions)
        .map_batches(
            lambda t: pa.table(
                {
                    "src": t["src"],
                    "dst": t["dst"],
                    "w": pc.divide(
                        pa.scalar(1.0), t["outdeg"].cast(pa.float64())
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        # joined against ranks every iteration: clear empty join blocks
        .repartition(num_partitions)
        .materialize()
    )
    # per-node dangling flag (no out-edges), attached once via ONE
    # left-outer join; rides inside the rank vector thereafter
    flagged = (
        hash_join(
            nodes,
            outdeg,
            on="node",
            right_on="src",
            how="left_outer",
            num_partitions=num_partitions,
        )
        # merge the join's empty zero-column output blocks away before
        # any column access (derivatives feed joins/groupbys too)
        .repartition(num_partitions)
        .map_batches(
            lambda t: pa.table(
                {
                    "node": t["node"],
                    "dang": pc.cast(pc.is_null(t["outdeg"]), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    # static base rows: every node with zero contribution — unioned
    # into each iteration's groupby so no node drops out (replaces a
    # per-iteration left-outer join)
    base_rows = flagged.map_batches(
        lambda t: pa.table(
            {
                "node": t["node"],
                "c_partial": pa.array(np.zeros(len(t)), pa.float64()),
                "dang": t["dang"],
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    ranks = flagged.map_batches(
        lambda t: pa.table(
            {
                "node": t["node"],
                "rank": pa.array(np.full(len(t), 1.0 / n_nodes), pa.float64()),
                "dang": t["dang"],
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(iters):
        d_mass = (
            ranks.map_batches(
                lambda t: pa.table(
                    {
                        "dmass": pc.multiply(
                            t["rank"], pc.cast(t["dang"], pa.float64())
                        )
                    }
                ),
                batch_format="pyarrow",
            ).sum("dmass")
            or 0.0
        )
        contrib_partials = hash_join(
            ew, ranks, on="src", right_on="node", num_partitions=num_partitions
        ).repartition(num_partitions).map_batches(
            lambda t: pa.table(
                {
                    "node": t["dst"],
                    "c_partial": pc.multiply(t["w"], t["rank"]),
                    "dang": pa.array(
                        np.zeros(len(t), np.int64)
                    ),  # Max() with base_rows restores the true flag
                }
            ),
            batch_format="pyarrow",
        )
        merged = (
            contrib_partials.union(base_rows)
            .groupby("node")
            .aggregate(
                Sum("c_partial", alias_name="contrib"),
                Max("dang", alias_name="dang"),
            )
        )
        base = (1.0 - damping) / n_nodes + damping * d_mass / n_nodes

        def apply_rank(t: pa.Table, base=base) -> pa.Table:
            c = t["contrib"].combine_chunks().to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "node": t["node"],
                    "rank": pa.array(base + damping * c, pa.float64()),
                    "dang": t["dang"],
                }
            )

        # repartition between the groupby and apply_rank (zero-column
        # empty partitions would break column access) — and the result
        # is next iteration's join input, which needs it anyway
        ranks = (
            merged.repartition(num_partitions)
            .map_batches(apply_rank, batch_format="pyarrow")
            .materialize()
        )
    return ranks.select_columns(["node", "rank"])


def _triangle_counts_broadcast(
    e: rd.Dataset,
    src: str,
    dst: str,
    per_vertex: bool,
) -> rd.Dataset:
    """Broadcast-adjacency triangle counting for edge sets under the
    caller's ``broadcast_gate`` (same size-gated dense/distributed split
    as ``pagerank``): the (narrow, 2-int) edge list is pulled to the
    driver ONCE, remapped to dense indices, and shipped to every task
    as a CSR higher-neighbor table plus a sorted packed-(a,b) edge
    array via ``ray.put``.  Edges then stream through ``map_batches``:
    each edge (a,b) expands to candidates w in N_hi(a) with w > b (all
    numpy — repeat/arange gather), and the wedge closes iff packed
    (b,w) binary-searches into the edge array.  Candidate volume is
    the same sum-of-d_hi^2 wedge count as the join path, but wedges
    are generated AND filtered inside the task — nothing but per-batch
    (node, partial-count) rows ever leaves, vs the join path's full
    wedge exchange (72M rows at sf0.1, 20s of join time -> ~2s).

    Each triangle {a<b<w} is found exactly once: at its lowest edge
    (a,b), with w constrained to w > b."""
    import ray

    from .agg import sorted_grouped_sum

    cols = _edges_local(e, (src, dst))
    nodes, (ai, bi) = _compact_ids(cols[src], cols[dst])
    # _compact_ids is sorted-unique, so dense indices preserve the
    # original id order and the src<dst canonical orientation carries
    order = np.lexsort((bi, ai))
    ai_s, bi_s = ai[order], bi[order]
    indptr = np.zeros(len(nodes) + 1, np.int64)
    np.cumsum(np.bincount(ai_s, minlength=len(nodes)), out=indptr[1:])
    # packed (ai<<32)|bi is ascending by construction (lexsort order);
    # dense indices < 2^31 because the caller gates edge count
    packed = (ai_s << np.int64(32)) | bi_s
    ref = ray.put((nodes, indptr, bi_s, packed))

    empty = pa.table(
        {
            "node": pa.array([], pa.int64()),
            "n_partial": pa.array([], pa.int64()),
        }
    )

    # per-expansion candidate budget: a low-id hub edge can carry
    # d_hi(hub) candidates EACH, so expanding a whole batch at once is
    # unbounded (review finding: a K(1,1M) star with a low-id center
    # would allocate batch x 1M rows).  Chunk edges so every expansion
    # allocates at most ~budget rows regardless of degree skew.
    _CAND_BUDGET = 4_000_000

    def tri_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        nd, iptr, nbr, pk = ray.get(ref)
        a = np.searchsorted(nd, t[src].to_numpy(zero_copy_only=False))
        b = np.searchsorted(nd, t[dst].to_numpy(zero_copy_only=False))
        cnt = iptr[a + 1] - iptr[a]
        if int(cnt.sum()) == 0:
            return empty
        csum = np.cumsum(cnt)
        found_parts: list[np.ndarray] = []
        start = 0
        while start < len(a):
            base = int(csum[start - 1]) if start else 0
            stop = int(
                np.searchsorted(csum, base + _CAND_BUDGET, side="left")
            ) + 1
            stop = min(max(stop, start + 1), len(a))
            a_s, b_s, cnt_s = a[start:stop], b[start:stop], cnt[start:stop]
            total = int(cnt_s.sum())
            start = stop
            if total == 0:
                continue
            eidx = np.repeat(np.arange(len(a_s)), cnt_s)
            # concatenated-slice gather: position within each edge's
            # run plus that edge's CSR start
            pos = (
                np.arange(total)
                - np.repeat(np.cumsum(cnt_s) - cnt_s, cnt_s)
                + np.repeat(iptr[a_s], cnt_s)
            )
            w = nbr[pos]
            bb = b_s[eidx]
            m = w > bb
            if not m.any():
                continue
            w, bb, aa = w[m], bb[m], a_s[eidx][m]
            q = (bb << np.int64(32)) | w
            idx = np.searchsorted(pk, q)
            ok = idx < len(pk)
            ok[ok] = pk[idx[ok]] == q[ok]
            if not ok.any():
                continue
            if per_vertex:
                found_parts.append(np.concatenate([aa[ok], bb[ok], w[ok]]))
            else:
                found_parts.append(aa[ok])
        if not found_parts:
            return empty
        u, c = np.unique(np.concatenate(found_parts), return_counts=True)
        return pa.table(
            {
                "node": pa.array(nd[u], pa.int64()),
                "n_partial": pa.array(c, pa.int64()),
            }
        )

    # materialized ONCE: the empty probe below would otherwise run the
    # whole wedge pass, then sorted_grouped_sum's sort would run it
    # AGAIN from scratch (review finding)
    partials = e.map_batches(
        tri_partial, batch_format="pyarrow", batch_size=8192
    ).materialize()
    if partials.limit(1).count() == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "n_triangles": pa.array([], pa.int64()),
                }
            )
        )
    return sorted_grouped_sum(partials, ["node"], "n_partial", "n_triangles")


def triangle_counts(
    edges: rd.Dataset,
    src: str = "part_a",
    dst: str = "part_b",
    num_partitions: int = 8,
    per_vertex: bool = False,
    broadcast_gate: int = 20_000_000,
) -> rd.Dataset:
    """Per-node triangle counts -> (node, n_triangles), where ``node``
    is each triangle's SMALLEST vertex (so every triangle is counted
    exactly once and the output doubles as a distribution, not just a
    scalar).  With ``per_vertex=True`` every triangle instead credits
    ALL THREE of its vertices — the numerator of the local clustering
    coefficient.  Input edges must be distinct and canonically oriented
    ``src < dst`` (copurchase_edges' contract).

    Two hash-partitioned joins — the standard distributed triangle
    enumeration: (1) wedges (a,b),(b,c) joined on the midpoint b give
    ordered paths a<b<c; (2) the wedge closes iff (a,c) is an edge — a
    composite-key join against the edge set itself.  Per-node counting
    is combiner-first (ops/agg.grouped_count).  Scale shape: wedge
    volume is sum_b deg(b)^2 — hub vertices fan out across hash
    partitions rather than gathering per node; no driver-side state,
    nothing materializes beyond the (narrow, 2-int) edge list that
    feeds three join sides.

    Edge sets at or under ``broadcast_gate`` take the broadcast-CSR
    fast path instead (``_triangle_counts_broadcast``): wedges are
    generated and closed inside each task against a broadcast packed
    edge array, so no wedge row is ever exchanged.  Above the gate
    (driver/object-store memory = ~32B x edges) the join path keeps
    everything distributed."""
    from .agg import grouped_count

    e = (
        edges.select_columns([src, dst])
        .repartition(num_partitions)
        .materialize()  # three consumers below; don't recompute the input
    )
    n_edges = e.count()
    if n_edges == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "n_triangles": pa.array([], pa.int64()),
                }
            )
        )
    if n_edges <= broadcast_gate:
        return _triangle_counts_broadcast(e, src, dst, per_vertex)
    e1 = e.map_batches(
        lambda t: pa.table({"a": t[src], "b": t[dst]}), batch_format="pyarrow"
    )
    e2 = e.map_batches(
        lambda t: pa.table({"b2": t[src], "c": t[dst]}), batch_format="pyarrow"
    )
    wedges = (
        hash_join(e1, e2, on="b", right_on="b2", num_partitions=num_partitions)
        .repartition(num_partitions)
        # pinned: the empty guard's count() and the closing join both
        # consume the wedge set
        .materialize()
    )
    if wedges.count() == 0:
        # a triangle-free edge set (e.g. a perfect matching) produces
        # zero wedges; the closing join cannot finalize a zero-row side
        # (tuning.py), so exit with the typed empty result here
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "n_triangles": pa.array([], pa.int64()),
                }
            )
        )
    closing = e.map_batches(
        lambda t: pa.table({"a2": t[src], "c2": t[dst]}), batch_format="pyarrow"
    )
    tri = hash_join(
        wedges,
        closing,
        on=("a", "c"),
        right_on=("a2", "c2"),
        num_partitions=num_partitions,
    ).repartition(num_partitions)

    if per_vertex:
        def credit_all(t: pa.Table) -> pa.Table:
            col = pa.chunked_array(
                t["a"].chunks + t["b"].chunks + t["c"].chunks
            ).combine_chunks()
            return pa.table({"node": col})

        emit = tri.map_batches(credit_all, batch_format="pyarrow")
    else:
        emit = tri.map_batches(
            lambda t: pa.table({"node": t["a"]}), batch_format="pyarrow"
        )
    out = grouped_count(emit, ["node"], "n_triangles")
    return out



def clustering_coefficients(
    edges: rd.Dataset,
    src: str = "part_a",
    dst: str = "part_b",
    num_partitions: int = 8,
) -> rd.Dataset:
    """Local clustering coefficient per node -> (node, degree,
    n_triangles, coeff_ppm): how close each node's neighborhood is to
    a clique, coeff = 2*tri / (deg*(deg-1)).  Emitted as EXACT integer
    parts-per-million (floor division) so the result is value-hash
    comparable against the SQL twin — no float in the output.

    Scale shape: per-vertex triangle credits come from the distributed
    wedge+closing joins (triangle_counts(per_vertex=True)); degrees are
    a combiner-first grouped count over the two endpoint projections;
    one LEFT OUTER hash join attaches the (sparse) triangle counts to
    the (dense) degree table, null -> 0 for triangle-free nodes."""
    from .agg import grouped_count

    e = edges.select_columns([src, dst]).materialize()  # two consumers
    deg = grouped_count(
        e.map_batches(
            lambda t: pa.table(
                {
                    "node": pa.chunked_array(
                        t[src].chunks + t[dst].chunks
                    ).combine_chunks()
                }
            ),
            batch_format="pyarrow",
        ),
        ["node"],
        "degree",
    )
    # repartition merges the grouped count's zero-column empty-partition
    # blocks away (hash_join contract); materialize pins it for the
    # empty-guard count() + the join
    tri = (
        triangle_counts(
            e, src=src, dst=dst, num_partitions=num_partitions, per_vertex=True
        )
        .repartition(num_partitions)
        .materialize()
    )
    empty = rd.from_arrow(
        pa.table(
            {
                "node": pa.array([], pa.int64()),
                "degree": pa.array([], pa.int64()),
                "n_triangles": pa.array([], pa.int64()),
                "coeff_ppm": pa.array([], pa.int64()),
            }
        )
    )
    if deg.limit(1).count() == 0:
        return empty

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "node" not in t.column_names:
            return pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "degree": pa.array([], pa.int64()),
                    "n_triangles": pa.array([], pa.int64()),
                    "coeff_ppm": pa.array([], pa.int64()),
                }
            )
        d = t["degree"].to_numpy(zero_copy_only=False).astype(np.int64)
        # null n_triangles (left-outer misses) -> 0; a triangle-free
        # graph skips the join entirely and has no column at all
        if "n_triangles" in t.column_names:
            tr = (
                pc.fill_null(pc.cast(t["n_triangles"], pa.int64()), 0)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
        else:
            tr = np.zeros(t.num_rows, np.int64)
        denom = d * (d - 1)
        coeff = np.where(denom > 0, (2_000_000 * tr) // np.maximum(denom, 1), 0)
        return pa.table(
            {
                "node": pc.cast(t["node"], pa.int64()),
                "degree": pa.array(d, pa.int64()),
                "n_triangles": pa.array(tr, pa.int64()),
                "coeff_ppm": pa.array(coeff, pa.int64()),
            }
        )

    if tri.count() == 0:
        # triangle-free graph: no join needed (and the join could not
        # finalize a zero-row side anyway — tuning.py)
        return deg.map_batches(finalize, batch_format="pyarrow")
    joined = hash_join(
        deg, tri, on="node", how="left_outer", num_partitions=num_partitions
    ).repartition(num_partitions)
    return joined.map_batches(finalize, batch_format="pyarrow")



def label_propagation(
    edges: rd.Dataset,
    rounds: int = 3,
    src: str = "part_a",
    dst: str = "part_b",
    num_partitions: int = 8,
    force_distributed: bool = False,
) -> rd.Dataset:
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007) -> (node, community) after a FIXED number of rounds.
    Every node starts labeled with its own id; each round every node
    adopts the most frequent label among its neighbors, ties broken to
    the SMALLEST label — fully deterministic (the async variant's
    random visit order is replaced by bulk-synchronous rounds), so the
    result is pinned by an unrolled SQL twin.

    Scale shape per round: one hash-partitioned join (adjacency x
    current labels — the label table is narrow (node, lab)), one
    combiner-first grouped count of (node, label) pairs, then the
    per-node argmax as a single grouped MAX over a packed
    ``n * M + (M-1-lab)`` int64 key (no per-group Python) — decoding
    gives (max count, min label).  The adjacency is materialized once;
    rounds re-shuffle only the label vector.  Packing bound: n <= max
    degree and M = max node id + 1 must satisfy n*M < 2^63 — holds for
    billion-node graphs with million-degree hubs; beyond that split the
    argmax into (count, lab) lexicographic via two grouped passes.

    SIZE-GATED like ``pagerank``/``bfs_hops``: edge lists at or under
    ``DRIVER_GRAPH_MAX_EDGES`` run every round on the driver with the
    identical packed-argmax rule in numpy (one edge pull, zero
    per-round exchanges — per-round join fixed costs dwarf small
    graphs); the rule is deterministic, so both paths emit IDENTICAL
    labels (pinned by the forced-distributed parity test).
    ``force_distributed`` pins the distributed loop for tests and is
    the path a 100-TB graph takes."""
    from .agg import grouped_count, grouped_count_sorted

    e = edges.select_columns([src, dst]).materialize()
    empty = rd.from_arrow(
        pa.table(
            {
                "node": pa.array([], pa.int64()),
                "community": pa.array([], pa.int64()),
            }
        )
    )
    if e.count() == 0:
        return empty

    if not force_distributed and e.count() <= DRIVER_GRAPH_MAX_EDGES:
        cols = _edges_local(e, (src, dst))
        nodes_arr, (ai, bi_dir) = _compact_ids(cols[src], cols[dst])
        # bidirected endpoint indices: node ni's neighbor labels
        ni = np.concatenate([ai, bi_dir])
        bi = np.concatenate([bi_dir, ai])
        n = len(nodes_arr)
        # rounds run ENTIRELY in dense index space: labels are dense
        # node indices (dense order == id order, so min-index tie-break
        # == the distributed rule's min-label), and the argmax packs
        # with n — bound n^2 < 2^63, guaranteed under the gate.
        # Packing with RAW ids (max id + 1) overflows int64 for large
        # sparse id spaces (e.g. ids ~2^45), silently corrupting
        # labels via negative np.maximum.at indices — caught by review,
        # pinned by test_label_propagation_huge_sparse_node_ids.
        lab = np.arange(n, dtype=np.int64)
        for _ in range(rounds):
            packed = ni * n + lab[bi]
            u, c = np.unique(packed, return_counts=True)
            un = u // n
            ul = u % n
            # same packed argmax rule as the distributed rounds:
            # max count, then min label
            key2 = c * n + (n - 1 - ul)
            best = np.full(n, -1, np.int64)
            np.maximum.at(best, un, key2)
            lab = np.where(best >= 0, (n - 1) - (best % n), lab)
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array(nodes_arr, pa.int64()),
                    "community": pa.array(nodes_arr[lab], pa.int64()),
                }
            )
        )

    adj = e.map_batches(
        lambda t: pa.table(
            {
                "node": pa.chunked_array(
                    t[src].chunks + t[dst].chunks
                ).combine_chunks(),
                "nbr": pa.chunked_array(
                    t[dst].chunks + t[src].chunks
                ).combine_chunks(),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    # M sizes the argmax packing; one scalar to the driver
    lab_max = int(adj.max("node"))
    M = lab_max + 1

    def init_labels(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lnode": pc.cast(t["node"], pa.int64()),
                "lab": pc.cast(t["node"], pa.int64()),
            }
        )

    # distinct node set (combiner-first), each its own label
    labels = (
        grouped_count(
            adj.map_batches(
                lambda t: t.select(["node"]), batch_format="pyarrow"
            ),
            ["node"],
            "_n",
        )
        .map_batches(init_labels, batch_format="pyarrow")
        .repartition(num_partitions)
        .materialize()
    )

    for _ in range(rounds):
        joined = hash_join(
            adj, labels, on="nbr", right_on="lnode",
            num_partitions=num_partitions,
        ).repartition(num_partitions)
        # sorted path: (node, label) cardinality approaches the edge
        # count — the per-group-Python Aggregate cost 94s for the
        # 3-round sf0.1 run where this shape runs in a few seconds
        counts = grouped_count_sorted(
            joined.map_batches(
                lambda t: t.select(["node", "lab"]), batch_format="pyarrow"
            ),
            ["node", "lab"],
            "n",
        )

        def pack(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "node" not in t.column_names:
                return pa.table(
                    {
                        "node": pa.array([], pa.int64()),
                        "pk": pa.array([], pa.int64()),
                    }
                )
            n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
            lab = t["lab"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "node": t["node"],
                    "pk": pa.array(n * M + (lab_max - lab), pa.int64()),
                }
            )

        def unpack(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "node" not in t.column_names:
                return pa.table(
                    {
                        "lnode": pa.array([], pa.int64()),
                        "lab": pa.array([], pa.int64()),
                    }
                )
            pk = t["pk"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "lnode": pc.cast(t["node"], pa.int64()),
                    "lab": pa.array(lab_max - (pk % M), pa.int64()),
                }
            )

        from .agg import sorted_grouped_sum as _sorted_reduce

        labels = (
            _sorted_reduce(
                counts.map_batches(pack, batch_format="pyarrow"),
                ["node"],
                "pk",
                "pk",
                op="max",
            )
            .repartition(num_partitions)
            .map_batches(unpack, batch_format="pyarrow")
            .materialize()
        )

    return labels.map_batches(
        lambda t: pa.table(
            {
                "node": t["lnode"],
                "community": t["lab"],
            }
        )
        if t.num_rows
        else pa.table(
            {
                "node": pa.array([], pa.int64()),
                "community": pa.array([], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


# symmetrized edge lists at or below this size BFS on the driver.
# The gate is counted on the DOUBLED (symmetrized) table, so it equals
# 2M raw edges = 2 int64 cols x 4M rows = 64 MB pulled — the same raw-
# edge bound as DRIVER_GRAPH_MAX_EDGES / dedup.DRIVER_CC_MAX_EDGES
# (the old 2M-symmetrized value pushed a 1.2M-edge graph onto the
# per-level join loop, whose fixed costs dwarf graphs this size)
DRIVER_BFS_MAX_EDGES = 4_000_000


def bfs_hops(
    edges: rd.Dataset,
    source: int,
    max_depth: int = 3,
    a_col: str = "part_a",
    b_col: str = "part_b",
    num_partitions: int = 8,
    force_distributed: bool = False,
) -> rd.Dataset:
    """Bounded-depth BFS (k-hop neighborhood) from ``source`` over an
    undirected (a, b) edge list -> (node, dist) with dist = shortest
    hop count <= max_depth.  Each level is one hash join of the
    CURRENT FRONTIER (narrow id rows) against the symmetrized edge
    table plus an anti join against the visited set — the standard
    frontier-expansion BFS whose per-level shuffle moves only frontier
    x degree rows, never the graph's payload.  max_depth bounds the
    iteration count (driver loop of ``max_depth`` rounds; each round's
    datasets are materialized narrow id tables).

    Size-gated like ``canon.connected_components``: edge sets at or
    below ``DRIVER_BFS_MAX_EDGES`` run a numpy adjacency BFS on the
    driver (per-level join fixed costs would dwarf tiny graphs); the
    distributed loop is the path a 100-TB co-occurrence graph takes
    (``force_distributed`` pins it for tests)."""
    from .joins import anti_join, hash_join

    sym = edges.map_batches(
        lambda t: pa.table(
            {
                "s": pa.concat_arrays(
                    [
                        pc.cast(t[a_col], pa.int64()).combine_chunks(),
                        pc.cast(t[b_col], pa.int64()).combine_chunks(),
                    ]
                ),
                "t": pa.concat_arrays(
                    [
                        pc.cast(t[b_col], pa.int64()).combine_chunks(),
                        pc.cast(t[a_col], pa.int64()).combine_chunks(),
                    ]
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()  # consumed once per level (or folded by the gate)

    n_edges = sym.count()
    if n_edges <= DRIVER_BFS_MAX_EDGES and not force_distributed:
        df = sym.to_pandas()
        s = df["s"].to_numpy()
        t_arr = df["t"].to_numpy()
        order = np.argsort(s, kind="mergesort")
        s_sorted, t_sorted = s[order], t_arr[order]
        dist = {source: 0}
        frontier_np = np.array([source], dtype=np.int64)
        for d in range(1, max_depth + 1):
            lo = np.searchsorted(s_sorted, frontier_np, side="left")
            hi = np.searchsorted(s_sorted, frontier_np, side="right")
            if not len(lo):
                break
            neigh = np.concatenate(
                [t_sorted[a:b] for a, b in zip(lo, hi)]
            ) if len(lo) else np.empty(0, np.int64)
            fresh = np.unique(neigh)
            fresh = np.array(
                [v for v in fresh if v not in dist], dtype=np.int64
            )
            if not len(fresh):
                break
            for v in fresh:
                dist[int(v)] = d
            frontier_np = fresh
        nodes = np.fromiter(dist.keys(), np.int64, len(dist))
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array(nodes, pa.int64()),
                    "dist": pa.array(
                        [dist[int(v)] for v in nodes], pa.int64()
                    ),
                }
            )
        )

    def ids_table(vals: list[int], dist: int) -> pa.Table:
        return pa.table(
            {
                "node": pa.array(vals, pa.int64()),
                "dist": pa.array([dist] * len(vals), pa.int64()),
            }
        )

    frontier = rd.from_arrow(ids_table([source], 0)).materialize()
    visited = frontier
    for d in range(1, max_depth + 1):
        hop = hash_join(
            sym,
            frontier.map_batches(
                lambda t: pa.table({"s": t["node"]}), batch_format="pyarrow"
            ),
            on="s",
            num_partitions=num_partitions,
        ).map_batches(
            lambda t: pa.table({"node": t["t"]})
            .group_by("node")
            .aggregate([]),
            batch_format="pyarrow",
        )
        fresh = anti_join(
            hop, visited, on="node", num_partitions=num_partitions
        )
        # global distinct (block-local done above), pin for reuse
        fresh = (
            fresh.groupby("node")
            .count()
            .drop_columns(["count()"])
            .repartition(num_partitions)
            .materialize()
        )
        if fresh.count() == 0:
            break
        frontier = fresh.map_batches(
            lambda t, dd=d: t.append_column(
                "dist", pa.array([dd] * t.num_rows, pa.int64())
            ),
            batch_format="pyarrow",
        ).materialize()
        visited = visited.union(frontier).materialize()
    # visited carries (node, dist) for every discovered level; levels
    # are disjoint by the anti join, so dist IS the shortest distance
    return visited


def edge_neighbor_overlap(
    edges: rd.Dataset,
    src: str = "part_a",
    dst: str = "part_b",
    num_partitions: int = 8,
) -> rd.Dataset:
    """Per-edge neighborhood overlap -> (a, b, n_common, n_union) —
    the common-neighbors / Jaccard feature classical link prediction
    scores edges with (Liben-Nowell & Kleinberg 2003).  For the edge
    (a, b): n_common = |N(a) ∩ N(b)| (= triangles through the edge)
    and n_union = |N(a) ∪ N(b) \\ {a, b}| = deg(a) + deg(b) - 2 -
    n_common, so the Jaccard score is n_common / n_union downstream
    (kept as exact integers here).  Input contract: distinct edges,
    canonical ``src < dst`` (copurchase_edges).

    Same scale shape as triangle_counts: the bidirected adjacency
    feeds (1) a wedge join on the edge's a-endpoint and (2) a
    composite-key closing join on (b, w) — hub fan-out spreads across
    hash partitions; per-edge counting is combiner-first.  Every
    possibly-empty join side is guarded (Ray join aggregators cannot
    finalize zero-row partitions)."""
    from .agg import grouped_count
    from .joins import hash_join

    empty = rd.from_arrow(
        pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "n_common": pa.array([], pa.int64()),
                "n_union": pa.array([], pa.int64()),
            }
        )
    )
    e = (
        edges.select_columns([src, dst])
        .map_batches(
            lambda t: pa.table({"a": t[src], "b": t[dst]}),
            batch_format="pyarrow",
        )
        .repartition(num_partitions)
        .materialize()  # feeds four consumers below
    )
    if e.count() == 0:
        return empty

    bi = e.map_batches(
        lambda t: pa.table(
            {
                "u": pa.concat_arrays(
                    [
                        t["a"].combine_chunks()
                        if isinstance(t["a"], pa.ChunkedArray)
                        else t["a"],
                        t["b"].combine_chunks()
                        if isinstance(t["b"], pa.ChunkedArray)
                        else t["b"],
                    ]
                ),
                "v": pa.concat_arrays(
                    [
                        t["b"].combine_chunks()
                        if isinstance(t["b"], pa.ChunkedArray)
                        else t["b"],
                        t["a"].combine_chunks()
                        if isinstance(t["a"], pa.ChunkedArray)
                        else t["a"],
                    ]
                ),
            }
        ),
        batch_format="pyarrow",
    ).repartition(num_partitions).materialize()  # wedge + closing + degree sides

    # repartition: grouped_count's aggregate emits ZERO-COLUMN blocks
    # for empty partitions (first observed at sf0.1 — sf0.01 fills
    # every partition) and deg feeds two joins below, whose Arrow
    # finalize rejects blocks missing the key column
    deg = grouped_count(
        bi.map_batches(
            lambda t: t.select(["u"]), batch_format="pyarrow"
        ),
        ["u"],
        count_col="d",
    ).repartition(num_partitions)

    # wedges through a: (a, b) x (a=u, w=v) -> (a, b, v=w)
    # repartition: a join output feeding another join (triangle_counts
    # convention — merges away zero-column empty-partition blocks)
    wedges = hash_join(
        e, bi, on="a", right_on="u", num_partitions=num_partitions
    ).repartition(num_partitions)
    # close on the other endpoint: (b, w) must be adjacent (inner join
    # against the key-only adjacency keeps exactly the closed wedges)
    closing = bi.map_batches(
        lambda t: pa.table({"b": t["u"], "v": t["v"]}),
        batch_format="pyarrow",
    )
    closed = hash_join(
        wedges,
        closing,
        on=("b", "v"),
        num_partitions=num_partitions,
    )
    com = grouped_count(
        closed.map_batches(
            lambda t: t.select(["a", "b"]), batch_format="pyarrow"
        ),
        ["a", "b"],
        count_col="n_common",
    ).repartition(num_partitions)  # same zero-column-block guard: com
    # is the right side of the left_outer join below

    # assemble: e x deg(a) x deg(b), left-join common (may be empty)
    da = deg.map_batches(
        lambda t: pa.table({"a": t["u"], "da": pc.cast(t["d"], pa.int64())}),
        batch_format="pyarrow",
    )
    db = deg.map_batches(
        lambda t: pa.table({"b": t["u"], "db": pc.cast(t["d"], pa.int64())}),
        batch_format="pyarrow",
    )
    withdeg = hash_join(
        hash_join(e, da, on="a", num_partitions=num_partitions),
        db,
        on="b",
        num_partitions=num_partitions,
    )

    if com.count() == 0:
        return withdeg.map_batches(
            lambda t: pa.table(
                {
                    "a": t["a"],
                    "b": t["b"],
                    "n_common": pa.array(np.zeros(len(t), np.int64)),
                    "n_union": pc.cast(
                        pc.subtract(pc.add(t["da"], t["db"]), 2), pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
        )

    j = hash_join(
        withdeg,
        com,
        on=("a", "b"),
        how="left_outer",
        num_partitions=num_partitions,
    )

    def finish(t: pa.Table) -> pa.Table:
        c = pc.fill_null(pc.cast(t["n_common"], pa.int64()), 0)
        union = pc.subtract(
            pc.subtract(pc.add(t["da"], t["db"]), 2), c
        )
        return pa.table(
            {
                "a": t["a"],
                "b": t["b"],
                "n_common": c,
                "n_union": pc.cast(union, pa.int64()),
            }
        )

    return j.map_batches(finish, batch_format="pyarrow")


# ----------------------------------------------------- integer iterative ops
#
# The three operators below share a design rule: every per-node value
# is an INT64 in fixed micro-units and every update is integer
# arithmetic (floor division, min, sum), so the result is bit-exact
# regardless of partitioning / merge order AND a DuckDB SQL twin can
# reproduce it verbatim (floats would hash-mismatch on summation
# order).  Engine-brief parity note: the reference has no graph
# analytics at all; these are engine additions (SURVEY §2.7b).
#
# All three are SIZE-GATED like components_from_pairs / the float
# pagerank: below DRIVER_GRAPH_MAX_EDGES the EDGE LIST (never a
# corpus) is pulled to the driver and iterated in numpy — integer
# kernels, so both paths produce IDENTICAL bits (pinned by pytest
# with force_distributed).  Above the gate every round is ordinary
# hash-partitioned joins/groupbys.

# 8M edges = 2 int64 cols x 8M rows = 128 MB pulled once — the same
# order as the triangle broadcast gate; callers that pass BIDIRECTED
# lists (graph_pagerank) stay under it for graphs up to 4M raw edges
DRIVER_GRAPH_MAX_EDGES = 8_000_000


def _edges_local(ed: rd.Dataset, cols: tuple[str, ...]) -> dict[str, np.ndarray]:
    """Pull a bounded edge dataset to the driver as int64 numpy
    columns (gate-checked by the caller)."""
    import ray

    parts = [t for t in ray.get(ed.to_arrow_refs()) if t.num_columns]
    if not parts:
        return {c: np.array([], np.int64) for c in cols}
    t = pa.concat_tables(parts)
    return {
        c: t[c].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        for c in cols
    }


def _compact_ids(*arrs: np.ndarray) -> tuple[np.ndarray, list[np.ndarray]]:
    """Map arbitrary int64 ids to dense 0..n-1 indices; returns
    (sorted unique ids, [index arrays])."""
    uniq = np.unique(np.concatenate(arrs)) if arrs[0].size else np.array([], np.int64)
    return uniq, [np.searchsorted(uniq, a) for a in arrs]


def symmetrize_edges(
    edges: rd.Dataset,
    a_col: str = "part_a",
    b_col: str = "part_b",
    weight_col: str | None = None,
) -> rd.Dataset:
    """Undirected (a, b[, w]) -> directed (src, dst[, w]) with both
    orientations — one streaming map, no shuffle."""

    def both(t: pa.Table) -> pa.Table:
        a = pc.cast(t[a_col], pa.int64()).combine_chunks()
        b = pc.cast(t[b_col], pa.int64()).combine_chunks()
        cols = {
            "src": pa.concat_arrays([a, b]),
            "dst": pa.concat_arrays([b, a]),
        }
        if weight_col is not None:
            w = pc.cast(t[weight_col], pa.int64()).combine_chunks()
            cols["w"] = pa.concat_arrays([w, w])
        return pa.table(cols)

    return edges.map_batches(both, batch_format="pyarrow")


def pagerank_int(
    edges_sym: rd.Dataset,
    iters: int = 4,
    unit: int = 10**9,
    damping_num: int = 85,
    damping_den: int = 100,
    num_partitions: int = 8,
    force_distributed: bool = False,
) -> rd.Dataset:
    """EXACT-INTEGER PageRank over a symmetrized edge list ->
    (node, rank_units): ranks live in int64 micro-units (``unit`` per
    node initially) and the update is

        rank'(v) = (15 * unit) // 100
                 + (85 * sum_{u->v} rank(u) // deg(u)) // 100

    — floor division throughout, so the fixpoint trajectory is
    bit-exact under ANY partitioning / merge order and a DuckDB twin
    (unrolled CTE per iteration) reproduces it verbatim.  The float
    ``pagerank`` above is the numerics-faithful variant; this one is
    the ORACLE-CHECKABLE variant (error vs float PR is O(deg/unit) per
    step — ~1e-9 relative at the default unit).

    Requires every node to have deg >= 1 (true by construction for a
    symmetrized edge list: nodes ARE edge endpoints), which makes node
    completion free — every node receives at least one contribution,
    so each iteration is exactly ONE hash join (rank vector x weighted
    adjacency) + ONE combiner-first grouped sum.  The adjacency with
    attached degrees is materialized ONCE; iterations only re-shuffle
    the narrow (node, pr) vector.

    int64 headroom: sum of all contributions <= N * unit; with the
    default unit=1e9 the 85x-scaled fold overflows only past ~1e8
    nodes — past that, lower ``unit``.
    """
    ed = edges_sym.map_batches(
        lambda t: pa.table(
            {
                "src": pc.cast(t["src"], pa.int64()),
                "dst": pc.cast(t["dst"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    if not force_distributed and ed.count() <= DRIVER_GRAPH_MAX_EDGES:
        cols = _edges_local(ed, ("src", "dst"))
        nodes, (si, di) = _compact_ids(cols["src"], cols["dst"])
        n = len(nodes)
        if n == 0:
            return rd.from_arrow(
                pa.table(
                    {
                        "node": pa.array([], pa.int64()),
                        "rank_units": pa.array([], pa.int64()),
                    }
                )
            )
        deg_v = np.bincount(si, minlength=n).astype(np.int64)
        base = (15 * unit) // 100
        pr = np.full(n, unit, np.int64)
        for _ in range(iters):
            contrib = pr[si] // deg_v[si]
            acc = np.zeros(n, np.int64)
            np.add.at(acc, di, contrib)
            pr = base + (damping_num * acc) // damping_den
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array(nodes, pa.int64()),
                    "rank_units": pa.array(pr, pa.int64()),
                }
            )
        )

    def deg_partial(t: pa.Table) -> pa.Table:
        g = pa.table({"src": t["src"]}).group_by("src").aggregate([([], "count_all")])
        return pa.table(
            {"src": g["src"], "d_partial": pc.cast(g["count_all"], pa.int64())}
        )

    deg = (
        ed.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("src")
        .aggregate(Sum("d_partial", alias_name="deg"))
        .repartition(num_partitions)
        .materialize()
    )
    # adjacency weighted once: (src, dst, deg(src)); iterations never
    # re-join the degree table
    ew = (
        hash_join(ed, deg, on="src", num_partitions=num_partitions)
        .repartition(num_partitions)
        .materialize()
    )
    base = (15 * unit) // 100
    ranks = deg.map_batches(
        lambda t: pa.table(
            {
                "node": t["src"],
                "pr": pa.array(np.full(len(t), unit, np.int64), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    def contrib_partial(t: pa.Table) -> pa.Table:
        # int64 // int64: pyarrow divide truncates; all values positive
        # so truncation == floor == the SQL twin's `//`
        c = pc.divide(t["pr"], t["deg"])
        g = (
            pa.table({"dst": t["dst"], "c": c})
            .group_by("dst")
            .aggregate([("c", "sum")])
        )
        return pa.table(
            {"dst": g["dst"], "c_partial": pc.cast(g["c_sum"], pa.int64())}
        )

    for _ in range(iters):
        ranks = (
            hash_join(
                ranks, ew, on="node", right_on="src", num_partitions=num_partitions
            )
            .repartition(num_partitions)
            .map_batches(contrib_partial, batch_format="pyarrow")
            .groupby("dst")
            .aggregate(Sum("c_partial", alias_name="c_total"))
            .map_batches(
                lambda t: pa.table(
                    {
                        "node": t["dst"],
                        "pr": pc.add(
                            pa.scalar(base, pa.int64()),
                            pc.divide(
                                pc.multiply(
                                    pc.cast(t["c_total"], pa.int64()),
                                    pa.scalar(damping_num, pa.int64()),
                                ),
                                pa.scalar(damping_den, pa.int64()),
                            ),
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
            .repartition(num_partitions)
            .materialize()
        )
    return ranks.map_batches(
        lambda t: pa.table({"node": t["node"], "rank_units": t["pr"]}),
        batch_format="pyarrow",
    )


def bellman_ford_int(
    edges_sym_weighted: rd.Dataset,
    source: int,
    iters: int = 6,
    num_partitions: int = 8,
    force_distributed: bool = False,
) -> rd.Dataset:
    """Bounded-depth single-source shortest paths (Bellman-Ford
    relaxation, integer weights) -> (node, dist) for every node
    reachable from ``source`` within ``iters`` relaxation rounds.

    dist_0 = {source: 0}; each round
        dist'(v) = min(dist(v), min_{u->v} dist(u) + w(u, v))
    expressed as ONE hash join (frontier x adjacency) + a union with
    the carried dist rows + ONE combiner-first grouped MIN — all
    integer, so bit-exact under any partitioning and SQL-unrollable.
    The dist vector is the only thing re-shuffled per round; the
    adjacency is materialized once.  Bounded depth is the documented
    contract (the SQL twin unrolls the same ``iters``); full
    convergence needs iters >= graph diameter.
    """
    ew = edges_sym_weighted.map_batches(
        lambda t: pa.table(
            {
                "src": pc.cast(t["src"], pa.int64()),
                "dst": pc.cast(t["dst"], pa.int64()),
                "w": pc.cast(t["w"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    if not force_distributed and ew.count() <= DRIVER_GRAPH_MAX_EDGES:
        cols = _edges_local(ew, ("src", "dst", "w"))
        nodes, (si, di) = _compact_ids(cols["src"], cols["dst"])
        n = len(nodes)
        INF = np.iinfo(np.int64).max // 4
        dist_v = np.full(max(n, 1), INF, np.int64)
        s_idx = np.searchsorted(nodes, source) if n else 0
        if n == 0 or s_idx >= n or nodes[s_idx] != source:
            return rd.from_arrow(
                pa.table(
                    {
                        "node": pa.array([source], pa.int64()),
                        "dist": pa.array([0], pa.int64()),
                    }
                )
            )
        dist_v[s_idx] = 0
        w = cols["w"]
        for _ in range(iters):
            # BSP round: relax from the PREVIOUS round's vector only
            # (matches the distributed union+grouped-min and the SQL
            # twin's per-iteration CTE)
            reach = dist_v[si] < INF
            nd = dist_v.copy()
            np.minimum.at(nd, di[reach], dist_v[si[reach]] + w[reach])
            dist_v = nd
        got = dist_v < INF
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array(nodes[got], pa.int64()),
                    "dist": pa.array(dist_v[got], pa.int64()),
                }
            )
        )
    dist = rd.from_arrow(
        pa.table(
            {
                "node": pa.array([source], pa.int64()),
                "dist": pa.array([0], pa.int64()),
            }
        )
    )

    def min_partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table({"node": t["node"], "dist": t["dist"]})
            .group_by("node")
            .aggregate([("dist", "min")])
        )
        return pa.table(
            {"node": g["node"], "d_partial": pc.cast(g["dist_min"], pa.int64())}
        )

    for _ in range(iters):
        relaxed = (
            hash_join(
                dist, ew, on="node", right_on="src", num_partitions=num_partitions
            )
            .repartition(num_partitions)
            .map_batches(
                lambda t: pa.table(
                    {
                        "node": t["dst"],
                        "dist": pc.add(t["dist"], t["w"]),
                    }
                ),
                batch_format="pyarrow",
            )
        )
        dist = (
            dist.union(relaxed)
            .map_batches(min_partial, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Min("d_partial", alias_name="dist"))
            .repartition(num_partitions)
            .materialize()
        )
    return dist


def kcore(
    edges_sym: rd.Dataset,
    k: int = 2,
    max_rounds: int = 64,
    num_partitions: int = 8,
    force_distributed: bool = False,
) -> rd.Dataset:
    """k-core decomposition (iterative peeling to fixpoint) ->
    (node, deg) of the maximal subgraph where every node has degree
    >= k.  Each peel round: grouped degree count (combiner-first) ->
    filter survivors -> TWO semi joins restrict the edge list to
    edges whose BOTH endpoints survive.  Loops until the node count
    is stable (driver traffic per round = one scalar); the SQL twin
    unrolls a fixed round count, which matches because peeling is
    idempotent once converged.  Edges shrink monotonically so later
    rounds get cheaper; the classic distributed formulation
    (Montresor et al. 2013 is the message-passing refinement)."""
    ed = edges_sym.map_batches(
        lambda t: pa.table(
            {
                "src": pc.cast(t["src"], pa.int64()),
                "dst": pc.cast(t["dst"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    if not force_distributed and ed.count() <= DRIVER_GRAPH_MAX_EDGES:
        cols = _edges_local(ed, ("src", "dst"))
        nodes, (si, di) = _compact_ids(cols["src"], cols["dst"])
        n = len(nodes)
        alive_edge = np.ones(len(si), bool)
        deg_v = np.bincount(si, minlength=n).astype(np.int64) if n else np.array([], np.int64)
        while True:
            keep = deg_v >= k
            dead = alive_edge & ~(keep[si] & keep[di])
            if not dead.any():
                break
            alive_edge &= ~dead
            deg_v = np.bincount(si[alive_edge], minlength=n).astype(np.int64)
        got = (deg_v >= k) if n else np.array([], bool)
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array(nodes[got], pa.int64()),
                    "deg": pa.array(deg_v[got], pa.int64()),
                }
            )
        )

    def deg_partial(t: pa.Table) -> pa.Table:
        g = pa.table({"src": t["src"]}).group_by("src").aggregate([([], "count_all")])
        return pa.table(
            {"src": g["src"], "d_partial": pc.cast(g["count_all"], pa.int64())}
        )

    prev_nodes = -1
    deg = None
    converged = False
    for _ in range(max_rounds):
        deg = (
            ed.map_batches(deg_partial, batch_format="pyarrow")
            .groupby("src")
            .aggregate(Sum("d_partial", alias_name="deg"))
            .repartition(num_partitions)
            .map_batches(
                lambda t: pa.table({"node": t["src"], "deg": t["deg"]}),
                batch_format="pyarrow",
            )
            .filter(expr=f"deg >= {int(k)}")
            .repartition(num_partitions)
            .materialize()
        )
        n = deg.count()
        if n == prev_nodes:
            converged = True
            break
        prev_nodes = n
        if n == 0:
            return deg
        keep = deg.select_columns(["node"])
        ed = (
            hash_join(ed, keep, on="src", right_on="node", num_partitions=num_partitions)
            .repartition(num_partitions)
            .map_batches(
                lambda t: pa.table({"src": t["src"], "dst": t["dst"]}),
                batch_format="pyarrow",
            )
            .materialize()
        )
        ed = (
            hash_join(ed, keep, on="dst", right_on="node", num_partitions=num_partitions)
            .repartition(num_partitions)
            .map_batches(
                lambda t: pa.table({"src": t["src"], "dst": t["dst"]}),
                batch_format="pyarrow",
            )
            .materialize()
        )
    if not converged:
        # a path graph peels only ~k nodes per round: silently returning
        # a non-fixpoint would be WRONG (the local path loops to the
        # true fixpoint) — fail loudly so the caller raises max_rounds
        raise RuntimeError(
            f"kcore: no fixpoint within max_rounds={max_rounds}; raise "
            "max_rounds (peeling needs up to O(n/k) rounds on path-like "
            "graphs)"
        )
    return deg


def random_walks(
    edges: rd.Dataset,
    k_steps: int = 3,
    src_col: str = "part_a",
    dst_col: str = "part_b",
    num_partitions: int = 8,
    hash_mode: str = "md5",
) -> rd.Dataset:
    """Deterministic 'random' walks for graph-embedding corpus
    generation (the DeepWalk/node2vec data-prep step): one walk per
    node, ``k_steps`` steps -> (walk_id, pos, node) with pos 0..k.
    The step rule is content-addressed, not RNG: from node u, walk w
    at step s moves to the neighbor v minimizing
    ``md5(f"{w}:{s}:{v}")[:8] as int`` (tie-break v asc) — the repo's
    md5 convention (hashing.md5_hex == DuckDB ``md5``), so an unrolled
    SQL twin reproduces every step exactly, and retries/partitioning
    cannot change a walk.  Hash depends on (walk, step), so walks that
    collide on a node still diverge — the corpus-diversity property
    node2vec's RNG provides, without the RNG.

    Scale shape: one hash-partitioned join (frontier x adjacency) per
    step; the argmin is combiner-first — (hash, nbr) packs into ONE
    int64 (hash is 32 bits, node ids < 2^31), per-batch ``minimum.at``
    partials, then a grouped Min of narrow (walk_id, packed) rows.
    Frontier rows are O(nodes) per step; nothing walk-related ever
    sits on the driver.  The md5 loop is per (frontier x degree) row
    — C-speed digests under a Python loop, the price of SQL parity
    (cf. train/val/test split's identical convention).
    ``hash_mode="fast"`` swaps the digests for the fully vectorized
    splitmix64 fold (zero per-row Python — the 100 TB path): same
    determinism and partitioning-independence guarantees, different
    (non-SQL-reproducible) step choices, so it is pytest-invariant-
    checked rather than oracle-checked."""
    from ..hashing import md5_hex

    if hash_mode not in ("md5", "fast"):
        raise ValueError(f"unknown hash_mode: {hash_mode!r}")

    _G = np.uint64(0x9E3779B97F4A7C15)
    _M1 = np.uint64(0xBF58476D1CE4E5B9)
    _M2 = np.uint64(0x94D049BB133111EB)

    def _hash_rows(w: np.ndarray, s: int, nb: np.ndarray) -> np.ndarray:
        if hash_mode == "md5":
            return np.fromiter(
                (
                    int(md5_hex(f"{wi}:{s}:{ni}")[:8], 16)
                    for wi, ni in zip(w.tolist(), nb.tolist())
                ),
                dtype=np.int64,
                count=len(w),
            )
        with np.errstate(over="ignore"):
            z = (
                w.astype(np.uint64)
                + np.uint64(s) * _G
                + nb.astype(np.uint64) * _M2
            )
            z ^= z >> np.uint64(30)
            z *= _M1
            z ^= z >> np.uint64(27)
            z *= _M2
            z ^= z >> np.uint64(31)
        return (z >> np.uint64(33)).astype(np.int64)  # 31 bits, fits PACK

    PACK = 1 << 31
    out_schema = pa.table(
        {
            "walk_id": pa.array([], pa.int64()),
            "pos": pa.array([], pa.int64()),
            "node": pa.array([], pa.int64()),
        }
    )

    def sym(t: pa.Table) -> pa.Table:
        a = pc.cast(t[src_col], pa.int64())
        b = pc.cast(t[dst_col], pa.int64())
        return pa.table(
            {
                "node": pa.chunked_array(a.chunks + b.chunks).combine_chunks()
                if isinstance(a, pa.ChunkedArray)
                else pa.concat_arrays([a, b]),
                "nbr": pa.chunked_array(b.chunks + a.chunks).combine_chunks()
                if isinstance(b, pa.ChunkedArray)
                else pa.concat_arrays([b, a]),
            }
        )

    adj = edges.map_batches(sym, batch_format="pyarrow").materialize()
    if adj.limit(1).count() == 0:
        return rd.from_arrow(out_schema)

    def local_distinct(t: pa.Table) -> pa.Table:
        return t.select(["node"]).group_by("node").aggregate([])

    front = (
        adj.map_batches(local_distinct, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("node", alias_name="_m"))  # Arrow distinct, no
        .repartition(num_partitions)              # per-group Python call
        .map_batches(
            lambda t: pa.table(
                {"walk_id": t["node"], "node": t["node"]}
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    def emit(ds: rd.Dataset, pos: int) -> rd.Dataset:
        return ds.map_batches(
            lambda t, _p=pos: pa.table(
                {
                    "walk_id": t["walk_id"],
                    "pos": pa.array([_p] * t.num_rows, pa.int64()),
                    "node": t["node"],
                }
            )
            if t.num_rows
            else out_schema,
            batch_format="pyarrow",
        )

    outs = [emit(front, 0)]
    for s in range(1, k_steps + 1):

        def local_min(t: pa.Table, _s=s) -> pa.Table:
            if t.num_rows == 0 or "walk_id" not in t.column_names:
                return pa.table(
                    {
                        "walk_id": pa.array([], pa.int64()),
                        "packed": pa.array([], pa.int64()),
                    }
                )
            w = t["walk_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            nb = t["nbr"].to_numpy(zero_copy_only=False).astype(np.int64)
            packed = _hash_rows(w, _s, nb) * PACK + nb
            u, inv = np.unique(w, return_inverse=True)
            best = np.full(len(u), np.iinfo(np.int64).max, dtype=np.int64)
            np.minimum.at(best, inv, packed)
            return pa.table(
                {
                    "walk_id": pa.array(u, pa.int64()),
                    "packed": pa.array(best, pa.int64()),
                }
            )

        front = (
            hash_join(front, adj, on="node", num_partitions=num_partitions)
            .repartition(num_partitions)
            .map_batches(local_min, batch_format="pyarrow")
            .groupby("walk_id")
            .aggregate(Min("packed", alias_name="packed"))
            .repartition(num_partitions)
            .map_batches(
                lambda t: pa.table(
                    {
                        "walk_id": pc.cast(t["walk_id"], pa.int64()),
                        "node": pc.cast(
                            pc.bit_wise_and(t["packed"], PACK - 1), pa.int64()
                        ),
                    }
                )
                if t.num_rows and "walk_id" in t.column_names
                else pa.table(
                    {
                        "walk_id": pa.array([], pa.int64()),
                        "node": pa.array([], pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )
        outs.append(emit(front, s))

    result = outs[0]
    for o in outs[1:]:
        result = result.union(o)
    return result
