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

import ray
import ray.data as rd


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

        class Partial:
            def __init__(self):
                self.C = ray.get(ref)

            def __call__(self, t: pa.Table) -> pa.Table:
                X = _batch_matrix(t, vec_col).astype(np.float64)
                if X.shape[0] == 0:
                    return pa.table(
                        {
                            "cluster": pa.array([], pa.int64()),
                            "n": pa.array([], pa.int64()),
                            "vsum": pa.array([], pa.list_(pa.float64())),
                        }
                    )
                a = _assign(X, self.C)
                kk = self.C.shape[0]
                sums = np.zeros_like(self.C)
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
            Partial, batch_format="pyarrow", concurrency=(1, 8)
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

    class Assign:
        def __init__(self):
            self.C = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            X = _batch_matrix(t, vec_col).astype(np.float64)
            if X.shape[0] == 0:
                return pa.table(
                    {
                        id_col: pa.array([], pa.int64()),
                        "cluster": pa.array([], pa.int64()),
                    }
                )
            a = _assign(X, self.C)
            return pa.table(
                {
                    id_col: t[id_col],
                    "cluster": pa.array(a.astype(np.int64), pa.int64()),
                }
            )

    return ds.map_batches(Assign, batch_format="pyarrow", concurrency=(1, 8))


def semantic_dedup(
    ds: rd.Dataset,
    k: int = 8,
    threshold: float = 0.35,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> rd.Dataset:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space with k-means, then
    prune near-duplicates WITHIN each cluster by pairwise cosine —
    the cluster step turns the intractable corpus-wide O(N^2) into
    k * O((N/k)^2), and at 100 TB ``k`` scales with the corpus so the
    per-cluster pair block stays bounded (the paper uses 50k clusters
    for LAION-scale; the knob is ``k``, not the algorithm).

    Keep rule (deterministic, partitioning-independent): within a
    cluster, visit members in ascending id order; a member is DROPPED
    iff some smaller-id member of the same cluster has cosine >=
    ``threshold`` with it.  No RNG, no arrival-order dependence — the
    numpy oracle in tests reproduces it exactly.

    Output: (id, cluster, keep) for every input row; filter keep=true
    for the surviving corpus.  Scale shape: centroids broadcast
    (kmeans_fit's bounded driver reduce), assignment is a streaming
    map, and the only shuffle groups (id, cluster, vector) rows by
    cluster — each map_groups task holds one cluster's vectors."""
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

    assigned = ds.map_batches(AssignKeep, batch_format="pyarrow", concurrency=(1, 8))

    def prune(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        t = t.take(pa.array(order, pa.int64()))
        ids = ids[order]
        X = _batch_matrix(t, vec_col).astype(np.float64)
        norms = np.linalg.norm(X, axis=1)
        norms[norms == 0.0] = 1.0
        U = X / norms[:, None]
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

    return assigned.groupby("cluster").map_groups(prune, batch_format="pyarrow")
