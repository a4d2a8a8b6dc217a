"""Distributed k-means (Lloyd's) over an embedding column.

The broadcast-reduce formulation: centroids (k x dim — metadata-sized)
are broadcast with ``ray.put`` each iteration; the corpus streams
through ``map_batches`` which emits per-batch PARTIAL per-cluster sums
(k rows x dim floats per batch, independent of batch row count); the
driver folds the partials into new centroids.  The big side never
shuffles — the only data crossing the wire per iteration is
k x n_blocks partial rows.  This is the same bounded-driver-reduce
contract as the IVF trainer (ops/ann.py), done for the full corpus
instead of a sample.

Initialization is content-addressed (the k rows with the SMALLEST ids,
found by per-batch partial top-k then a driver merge of k x n_blocks
candidate rows) so the result is independent of partitioning and run
order — no RNG state anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ..tuning import POOL_REMOTE_ARGS


def _batch_matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    col = batch[vec_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False)
    n = len(col)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def _assign(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    # argmin over squared distance; ||x||^2 constant per row -> drop it
    d = -2.0 * (X @ C.T) + (C * C).sum(axis=1)[None, :]
    return d.argmin(axis=1)


def kmeans_fit(
    ds: rd.Dataset,
    k: int = 8,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Returns the (k, dim) centroid matrix after ``iters`` Lloyd
    iterations.  Deterministic: min-id initialization + fixed iteration
    count; empty clusters keep their previous centroid."""

    def seed_candidates(t: pa.Table) -> pa.Table:
        idx = np.argsort(t[id_col].to_numpy(zero_copy_only=False))[:k]
        return t.select([id_col, vec_col]).take(pa.array(idx, pa.int64()))

    cand = ds.map_batches(seed_candidates, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(id_col).head(k)
    C = np.stack(cand[vec_col].to_numpy()).astype(np.float64)

    for _ in range(iters):
        ref = ray.put(C)

        # STATELESS tasks, not an actor pool: a fresh pool per Lloyd
        # iteration costs ~1-2s of spawn+ramp each (the minhash bands
        # lesson); the only "state" is the centroid broadcast, and
        # ray.get of a plasma-local object inside the task is free
        def partial(t: pa.Table, _ref=ref) -> pa.Table:
            C_it = ray.get(_ref)
            X = _batch_matrix(t, vec_col).astype(np.float64)
            if X.shape[0] == 0:
                return pa.table(
                    {
                        "cluster": pa.array([], pa.int64()),
                        "n": pa.array([], pa.int64()),
                        "vsum": pa.array([], pa.list_(pa.float64())),
                    }
                )
            a = _assign(X, C_it)
            kk = C_it.shape[0]
            sums = np.zeros_like(C_it)
            np.add.at(sums, a, X)
            counts = np.bincount(a, minlength=kk).astype(np.int64)
            live = counts > 0
            return pa.table(
                {
                    "cluster": pa.array(np.arange(kk)[live], pa.int64()),
                    "n": pa.array(counts[live], pa.int64()),
                    "vsum": pa.array(list(sums[live]), pa.list_(pa.float64())),
                }
            )

        partials = ds.map_batches(
            partial, batch_format="pyarrow"
        ).to_pandas()  # k x n_blocks rows — bounded, independent of corpus rows
        newC = C.copy()
        if len(partials):
            g = partials.groupby("cluster")
            for c, grp in g:
                tot = int(grp["n"].sum())
                if tot > 0:
                    newC[int(c)] = np.stack(grp["vsum"].to_numpy()).sum(axis=0) / tot
        C = newC
    return C


def kmeans_assign(
    ds: rd.Dataset,
    C: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> rd.Dataset:
    """-> (id, cluster) final assignments under centroids ``C``
    (broadcast once; pure streaming map)."""
    ref = ray.put(C)

    # stateless tasks for the same reason as the fit loop: one pass,
    # centroids plasma-local per task
    def assign(t: pa.Table) -> pa.Table:
        C_b = ray.get(ref)
        X = _batch_matrix(t, vec_col).astype(np.float64)
        if X.shape[0] == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "cluster": pa.array([], pa.int64()),
                }
            )
        a = _assign(X, C_b)
        return pa.table(
            {
                id_col: t[id_col],
                "cluster": pa.array(a.astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def _l2_rows(X: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(X, axis=1)
    norms[norms == 0.0] = 1.0
    return X / norms[:, None]


_SMX_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SMX_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SMX_M2 = np.uint64(0x94D049BB133111EB)


def _mix_ids(ids: np.ndarray) -> np.ndarray:
    """splitmix64 of the id column — a stable, partitioning-independent
    chunk router (plain ``id % n`` would put planted dup pairs with
    correlated ids in correlated chunks)."""
    x = ids.astype(np.uint64)
    with np.errstate(over="ignore"):
        x = (x + _SMX_GAMMA) * _SMX_M1
        x ^= x >> np.uint64(27)
        x *= _SMX_M2
        x ^= x >> np.uint64(31)
    return x


def semantic_dedup(
    ds: rd.Dataset,
    k: int = 8,
    threshold: float = 0.35,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    chunk_rows: int = 2048,
) -> rd.Dataset:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space with k-means, then
    prune near-duplicates WITHIN each cluster by pairwise cosine.

    Keep rule (deterministic, partitioning-independent): a member is
    DROPPED iff some smaller-id member of the same cluster has cosine
    >= ``threshold`` with it — i.e. against ALL smaller-id members, not
    only surviving ones, so the within-cluster scan is embarrassingly
    parallel over chunk pairs (no keep-mask propagation).  The numpy
    oracle in tests reproduces it exactly.

    Scale shape (round-3 verdict #1 — per-task memory bounded by
    ``chunk_rows``, NOT by cluster size): clusters whose size fits
    ``chunk_rows`` prune in one ``map_groups`` task (one bounded
    matmul); clusters LARGER than the cap go through a chunk-pair scan
    — members route to ~size/chunk_rows hash chunks, each chunk
    consolidates into one packed row (ids + L2-normalized matrix
    bytes), chunk pairs are enumerated distributed and hash-joined to
    the chunk table on both sides, and every pair task does one
    chunk x chunk matmul emitting per-member dup flags that a final
    max-aggregate folds.  Same contract as
    ``embedding_neardup_blockjoin`` (ops/dedup.py) — the engine no
    longer relies on the caller picking ``k`` large enough.

    Output: (id, cluster, keep) for every input row; filter keep=true
    for the surviving corpus."""
    from ray.data.aggregate import Count, Max, Min

    C = kmeans_fit(ds, k=k, iters=iters, vec_col=vec_col, id_col=id_col)
    ref = ray.put(C)

    class AssignKeep:
        def __init__(self):
            self.C = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            X = _batch_matrix(t, vec_col).astype(np.float64)
            if X.shape[0] == 0:
                return pa.table(
                    {
                        id_col: pa.array([], pa.int64()),
                        "cluster": pa.array([], pa.int64()),
                        vec_col: pa.array([], pa.list_(pa.float32())),
                    }
                )
            a = _assign(X, self.C)
            return pa.table(
                {
                    id_col: t[id_col],
                    "cluster": pa.array(a.astype(np.int64), pa.int64()),
                    vec_col: t[vec_col],
                }
            )

    # two consumers below (small-cluster groupby + big-cluster chunk
    # scan) — pin so assignment doesn't re-execute per branch
    assigned = ds.map_batches(
        AssignKeep, batch_format="pyarrow", concurrency=(1, 8), **POOL_REMOTE_ARGS
    ).materialize()

    # cluster sizes: a k-row aggregate (bounded by k, never corpus-sized)
    sizes = (
        assigned.groupby("cluster").aggregate(Count(alias_name="n")).to_pandas()
    )
    big = {
        int(c): int(n)
        for c, n in zip(sizes["cluster"], sizes["n"])
        if int(n) > chunk_rows
    }

    def prune(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        t = t.take(pa.array(order, pa.int64()))
        ids = ids[order]
        U = _l2_rows(_batch_matrix(t, vec_col).astype(np.float64))
        S = U @ U.T
        # strictly-lower-triangular mask by INDEX comparison (i < j), not
        # np.tril zeroing — zeroed entries would count as matches for any
        # threshold <= 0
        idx = np.arange(len(ids))
        lower = idx[None, :] < idx[:, None]
        dup = ((S >= threshold) & lower).any(axis=1)
        cl = t["cluster"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "cluster": pa.array(cl, pa.int64()),
                "keep": pa.array(~dup),
            }
        )

    big_set = frozenset(big)

    def only_small(t: pa.Table) -> pa.Table:
        cl = t["cluster"].to_numpy(zero_copy_only=False)
        m = ~np.isin(cl, np.fromiter(big_set, np.int64, len(big_set)))
        return t.filter(pa.array(m))

    small_out = None
    if len(big) < len(sizes):
        src = assigned.map_batches(only_small, batch_format="pyarrow") if big else assigned
        small_out = src.groupby("cluster").map_groups(prune, batch_format="pyarrow")
    if not big:
        return small_out

    # ---- chunk-pair scan for clusters above the cap ----
    # dense per-cluster (base, n_chunks) arrays: cluster ids are
    # 0..k-1 by construction (argmin over centroids)
    kk = C.shape[0]
    base_arr = np.zeros(kk, dtype=np.int64)
    nch_arr = np.zeros(kk, dtype=np.int64)
    off = 0
    for c in sorted(big):
        n_chunks = -(-big[c] // chunk_rows)
        base_arr[c] = off
        nch_arr[c] = n_chunks
        off += n_chunks
    layout_ref = ray.put((base_arr, nch_arr))

    def to_chunk_rows(t: pa.Table) -> pa.Table:
        base, nch = ray.get(layout_ref)
        cl = t["cluster"].to_numpy(zero_copy_only=False)
        m = nch[cl] > 0
        t = t.filter(pa.array(m))
        cl = cl[m]
        empty = {
            "gchunk": pa.array([], pa.int64()),
            "cluster": pa.array([], pa.int64()),
            "ids": pa.array([], pa.binary()),
            "mat": pa.array([], pa.binary()),
        }
        if len(t) == 0:
            return pa.table(empty)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        U = _l2_rows(_batch_matrix(t, vec_col).astype(np.float64))
        g = base[cl] + (_mix_ids(ids) % nch[cl].astype(np.uint64)).astype(np.int64)
        out_g, out_c, out_ids, out_mat = [], [], [], []
        for gc in np.unique(g):
            sel = g == gc
            out_g.append(int(gc))
            out_c.append(int(cl[sel][0]))
            out_ids.append(ids[sel].tobytes())
            out_mat.append(np.ascontiguousarray(U[sel]).tobytes())
        return pa.table(
            {
                "gchunk": pa.array(out_g, pa.int64()),
                "cluster": pa.array(out_c, pa.int64()),
                "ids": pa.array(out_ids, pa.binary()),
                "mat": pa.array(out_mat, pa.binary()),
            }
        )

    def merge_chunk(df: pd.DataFrame) -> pd.DataFrame:
        ids = np.concatenate([np.frombuffer(b, dtype=np.int64) for b in df["ids"]])
        mats = []
        for b, i in zip(df["mat"], df["ids"]):
            n = len(np.frombuffer(i, dtype=np.int64))
            mats.append(np.frombuffer(b, dtype=np.float64).reshape(n, -1))
        M = np.vstack(mats)
        return pd.DataFrame(
            {
                "gchunk": [int(df["gchunk"].iloc[0])],
                "cluster": [int(df["cluster"].iloc[0])],
                "ids": [ids.tobytes()],
                "mat": [np.ascontiguousarray(M).tobytes()],
            }
        )

    chunks_ds = (
        assigned.map_batches(to_chunk_rows, batch_format="pyarrow")
        .groupby("gchunk")
        .map_groups(merge_chunk, batch_format="pandas")
        .repartition(8)
        .materialize()  # pair expansion + two join sides below
    )

    def expand_pairs(t: pa.Table) -> pa.Table:
        base, nch = ray.get(layout_ref)
        ci_out, cj_out = [], []
        for g, c in zip(t["gchunk"].to_pylist(), t["cluster"].to_pylist()):
            partners = np.arange(g, base[c] + nch[c], dtype=np.int64)
            ci_out.append(np.full(len(partners), g, dtype=np.int64))
            cj_out.append(partners)
        ci = np.concatenate(ci_out) if ci_out else np.array([], dtype=np.int64)
        cj = np.concatenate(cj_out) if cj_out else np.array([], dtype=np.int64)
        return pa.table({"ci": pa.array(ci, pa.int64()), "cj": pa.array(cj, pa.int64())})

    pairs_idx = (
        chunks_ds.select_columns(["gchunk", "cluster"])
        .map_batches(expand_pairs, batch_format="pyarrow")
        .repartition(8)
    )

    def side(name: str):
        return chunks_ds.map_batches(
            lambda t, n=name: pa.table(
                {n: t["gchunk"], f"ids_{n}": t["ids"], f"mat_{n}": t["mat"],
                 **({"cluster": t["cluster"]} if n == "ci" else {})}
            ),
            batch_format="pyarrow",
        )

    j = (
        pairs_idx.join(side("ci"), join_type="inner", num_partitions=8, on=("ci",))
        .repartition(8)  # join emits empty-partition blocks
        .join(side("cj"), join_type="inner", num_partitions=8, on=("cj",))
    )

    def score_flags(batch: pa.Table) -> pa.Table:
        out_id, out_cl, out_dup = [], [], []
        for r in range(len(batch)):
            ia = np.frombuffer(batch["ids_ci"][r].as_py(), dtype=np.int64)
            ib = np.frombuffer(batch["ids_cj"][r].as_py(), dtype=np.int64)
            A = np.frombuffer(batch["mat_ci"][r].as_py(), dtype=np.float64).reshape(
                len(ia), -1
            )
            B = np.frombuffer(batch["mat_cj"][r].as_py(), dtype=np.float64).reshape(
                len(ib), -1
            )
            cl = int(batch["cluster"][r].as_py())
            hit = (A @ B.T) >= threshold
            a_lt_b = ia[:, None] < ib[None, :]
            dup_b = (hit & a_lt_b).any(axis=0)
            same = int(batch["ci"][r].as_py()) == int(batch["cj"][r].as_py())
            # self pair: emit every member once (dup flags from i<j);
            # cross pair: emit flags for BOTH directions (id order is
            # not aligned with chunk order under hash routing)
            out_id.append(ib)
            out_cl.append(np.full(len(ib), cl, dtype=np.int64))
            out_dup.append(dup_b.astype(np.int8))
            if not same:
                dup_a = (hit & ~a_lt_b).any(axis=1)
                out_id.append(ia)
                out_cl.append(np.full(len(ia), cl, dtype=np.int64))
                out_dup.append(dup_a.astype(np.int8))
        ids = np.concatenate(out_id) if out_id else np.array([], dtype=np.int64)
        cls = np.concatenate(out_cl) if out_cl else np.array([], dtype=np.int64)
        dups = np.concatenate(out_dup) if out_dup else np.array([], dtype=np.int8)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "cluster": pa.array(cls, pa.int64()),
                "dup": pa.array(dups, pa.int8()),
            }
        )

    flags = j.map_batches(score_flags, batch_format="pyarrow")
    big_out = (
        flags.groupby(id_col)
        .aggregate(Min("cluster", alias_name="cluster"), Max("dup", alias_name="dup"))
        .map_batches(
            lambda t: pa.table(
                {
                    id_col: t[id_col],
                    "cluster": t["cluster"],
                    "keep": pc.equal(t["dup"], 0),
                }
            ),
            batch_format="pyarrow",
        )
    )
    return small_out.union(big_out) if small_out is not None else big_out


def embedding_dbscan(
    emb: rd.Dataset,
    eps_cos: float = 0.35,
    min_pts: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_partitions: int = 8,
) -> rd.Dataset:
    """DBSCAN (Ester et al. 1996) over an embedding table with cosine
    >= ``eps_cos`` as the neighborhood relation -> (vec_id, cluster,
    is_core) for EVERY input vector: core points (>= ``min_pts``
    neighbors, self excluded) cluster by core-core connectivity
    (cluster id = min reachable core id; an isolated core is its own
    singleton cluster), border points adopt the MINIMUM cluster among
    their core neighbors (the deterministic version of the paper's
    first-seen rule), noise gets cluster -1.  ``is_core`` is int64 0/1.

    Scale composition — every stage is an existing verified primitive:
    the eps-graph is ops/dedup.embedding_neardup_blockjoin (chunk-pair
    cross join, bounded per-task memory), degrees and filters are
    combiner-first counts and narrow-key semi/anti joins, connectivity
    is ops/dedup.components_from_pairs (size-gated union-find /
    distributed min-label).  Nothing corpus-sized lands on the driver."""
    from ray.data.aggregate import Min

    from .dedup import components_from_pairs
    from ..ops import joins
    from .agg import grouped_count

    ids_ds = emb.map_batches(
        lambda t: pa.table({"vid": pc.cast(t[id_col], pa.int64())}),
        batch_format="pyarrow",
    ).materialize()
    empty = pa.table(
        {
            "vec_id": pa.array([], pa.int64()),
            "cluster": pa.array([], pa.int64()),
            "is_core": pa.array([], pa.int64()),
        }
    )
    if ids_ds.count() == 0:
        return rd.from_arrow(empty)

    from .dedup import embedding_neardup_blockjoin

    pairs = embedding_neardup_blockjoin(
        emb, threshold=eps_cos, id_col=id_col, emb_col=vec_col,
        num_partitions=num_partitions,
    ).materialize()  # degree count + core filter + border assign

    def noise_all(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # incl. zero-column blocks from anti_join
            return empty
        return pa.table(
            {
                "vec_id": t["vid"],
                "cluster": pa.array([-1] * t.num_rows, pa.int64()),
                "is_core": pa.array([0] * t.num_rows, pa.int64()),
            }
        )

    if pairs.count() == 0:  # no neighborhood relation at all: all noise
        return ids_ds.map_batches(noise_all, batch_format="pyarrow")

    adj = pairs.map_batches(
        lambda t: pa.table(
            {
                "node": pa.chunked_array(
                    t["vec_a"].chunks + t["vec_b"].chunks
                ).combine_chunks(),
                "nbr": pa.chunked_array(
                    t["vec_b"].chunks + t["vec_a"].chunks
                ).combine_chunks(),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    deg = grouped_count(
        adj.map_batches(lambda t: t.select(["node"]), batch_format="pyarrow"),
        ["node"],
        "n_nbrs",
    )
    core = (
        deg.filter(expr=f"n_nbrs >= {min_pts}")
        .repartition(num_partitions)
        .map_batches(
            lambda t: t.select(["node"]) if t.num_rows else
            pa.table({"node": pa.array([], pa.int64())}),
            batch_format="pyarrow",
        )
        .materialize()
    )

    # --- core clusters: components over core-core edges + singletons
    cc_edges = joins.semi_join(
        joins.semi_join(pairs, core, on="vec_a", right_on="node",
                        num_partitions=num_partitions),
        core, on="vec_b", right_on="node", num_partitions=num_partitions,
    ).map_batches(
        lambda t: pa.table({"id_a": t["vec_a"], "id_b": t["vec_b"]})
        if t.num_rows else
        pa.table({"id_a": pa.array([], pa.int64()),
                  "id_b": pa.array([], pa.int64())}),
        batch_format="pyarrow",
    )
    comp = components_from_pairs(
        cc_edges, pa.int64(), num_partitions=num_partitions
    ).materialize()  # (doc_id, cluster_id) for cores with core neighbors

    lonely_core = joins.anti_join(
        core, comp, on="node", right_on="doc_id",
        num_partitions=num_partitions,
    ).map_batches(
        lambda t: pa.table(
            {"doc_id": t["node"], "cluster_id": t["node"]}
        )
        if t.num_rows else
        pa.table({"doc_id": pa.array([], pa.int64()),
                  "cluster_id": pa.array([], pa.int64())}),
        batch_format="pyarrow",
    )
    core_clusters = comp.union(lonely_core).materialize()

    core_out = core_clusters.map_batches(
        lambda t: pa.table(
            {
                "vec_id": pc.cast(t["doc_id"], pa.int64()),
                "cluster": pc.cast(t["cluster_id"], pa.int64()),
                "is_core": pa.array([1] * t.num_rows, pa.int64()),
            }
        )
        if t.num_rows else empty,
        batch_format="pyarrow",
    )

    # --- border points: non-core adjacent to a core -> min core cluster
    # empty guard before the join: an ALL-empty dataset carries only
    # zero-column blocks (Ray discards empty UDF outputs, so map_batches
    # cannot re-type them) and Ray's JoinOperator cannot resolve the key
    # field on a zero-column left partition; no border-adjacency rows
    # means no border points, full stop
    border_adj = joins.anti_join(
        joins.semi_join(adj, core, on="nbr", right_on="node",
                        num_partitions=num_partitions),
        core, on="node", num_partitions=num_partitions,
    ).materialize()
    if border_adj.limit(1).count() == 0:
        border = rd.from_arrow(empty)
    else:
        border = (
            joins.hash_join(
                border_adj, core_clusters, on="nbr", right_on="doc_id",
                num_partitions=num_partitions,
            )
            .repartition(num_partitions)
            .map_batches(
                lambda t: pa.table(
                    {"node": t["node"], "cluster_id": t["cluster_id"]}
                )
                if t.num_rows and "node" in t.column_names else
                pa.table({"node": pa.array([], pa.int64()),
                          "cluster_id": pa.array([], pa.int64())}),
                batch_format="pyarrow",
            )
            .groupby("node")
            .aggregate(Min("cluster_id", alias_name="cluster"))
            .repartition(num_partitions)
            .map_batches(
                lambda t: pa.table(
                    {
                        "vec_id": pc.cast(t["node"], pa.int64()),
                        "cluster": pc.cast(t["cluster"], pa.int64()),
                        "is_core": pa.array([0] * t.num_rows, pa.int64()),
                    }
                )
                if t.num_rows and "node" in t.column_names else empty,
                batch_format="pyarrow",
            )
            .materialize()
        )

    # --- noise: everything not core and not border
    assigned = core_out.union(border).materialize()
    noise = joins.anti_join(
        ids_ds, assigned, on="vid", right_on="vec_id",
        num_partitions=num_partitions,
    ).map_batches(noise_all, batch_format="pyarrow")
    return assigned.union(noise)
