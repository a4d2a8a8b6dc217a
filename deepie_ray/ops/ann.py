"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — the query matrix (small side) is
broadcast via ``ray.put`` once; every batch does one numpy matmul
against it and emits its local top-k per query; a final groupby-merge
keeps the global top-k.  The corpus side streams — nothing is ever
materialized.

Scale path: LSH hyperplane bucketing (``HyperplaneLSH``): corpus and
queries are both bucketed by sign-pattern; only same-bucket (and
optionally neighboring-bucket) candidates are scored.  Trades recall
for a ~2^bits fan-in reduction; the bucketing is a deterministic
function of the vector, so it shards and resumes cleanly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ..tuning import POOL_REMOTE_ARGS


_EMPTY_TOPK = pa.table(
    {
        "query_id": pa.array([], pa.int64()),
        "neighbor_id": pa.array([], pa.int64()),
        "cosine": pa.array([], pa.float64()),
    }
)

# typed empty MERGED result (merge_topk over zero groups drops schema,
# so the empty-corpus guards hand this to the driver directly)
_EMPTY_TOPK_RANKED = pa.table(
    {
        "query_id": pa.array([], pa.int64()),
        "neighbor_id": pa.array([], pa.int64()),
        "rank": pa.array([], pa.int64()),
    }
)


def _to_matrix(col) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.zeros((0, 0), dtype=np.float64)
    # offset-safe: a sliced list array's .values spans the UNsliced
    # child; strip via offsets before reshaping (latent today — map
    # batches arrive whole — but free to make correct)
    offs = arr.offsets.to_numpy(zero_copy_only=False)
    flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
    return flat[offs[0] : offs[-1]].reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class BruteForceTopK:
    """Batch stage: emit per-batch local top-k (query_id, neighbor_id,
    cosine) rows; merge with ``merge_topk`` downstream."""

    def __init__(self, queries_ref, k: int, exclude_self: bool = True):
        import ray

        qids, qmat = ray.get(queries_ref)
        self.qids = np.asarray(qids)
        self.Q = _normalize(np.asarray(qmat, dtype=np.float64))
        self.k = k
        self.exclude_self = exclude_self

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return _EMPTY_TOPK
        M = _normalize(_to_matrix(batch["embedding"]))
        ids = batch["vec_id"].to_numpy()
        sims = self.Q @ M.T  # (nq, nb)
        if self.exclude_self:
            mask = self.qids[:, None] == ids[None, :]
            sims = np.where(mask, -2.0, sims)
        k = min(self.k, sims.shape[1])
        idx = np.argpartition(-sims, kth=k - 1, axis=1)[:, :k]
        rows_q = np.repeat(self.qids, k)
        rows_n = ids[idx.ravel()]
        rows_s = np.take_along_axis(sims, idx, axis=1).ravel()
        keep = rows_s > -2.0
        return pa.table(
            {
                "query_id": pa.array(rows_q[keep], pa.int64()),
                "neighbor_id": pa.array(rows_n[keep], pa.int64()),
                "cosine": pa.array(rows_s[keep], pa.float64()),
            }
        )


def merge_topk(partials: rd.Dataset, k: int) -> rd.Dataset:
    """(query_id, neighbor_id, cosine) partials -> global top-k per
    query with rank (1-based; ties broken by neighbor_id asc)."""

    def top(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["cosine", "neighbor_id"], ascending=[False, True]
        ).head(k)
        df = df.reset_index(drop=True)
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df[["query_id", "neighbor_id", "rank"]]

    return partials.groupby("query_id").map_groups(top, batch_format="pandas")


def brute_force_topk(
    corpus: rd.Dataset,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    k: int = 10,
) -> rd.Dataset:
    import ray

    qref = ray.put((query_ids, query_matrix))
    partials = corpus.map_batches(
        BruteForceTopK,
        fn_constructor_kwargs={"queries_ref": qref, "k": k},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 8),
        **POOL_REMOTE_ARGS,
    )
    return merge_topk(partials, k)


def kmeans_centroids(
    sample: np.ndarray, k: int, iters: int = 10, seed: int = 7
) -> np.ndarray:
    """Seeded mini k-means for the IVF coarse quantizer (numpy-only,
    deterministic: fixed init from the seeded permutation, fixed
    iteration count).  Sample is expected L2-normalized."""
    rng = np.random.default_rng(seed)
    k = min(k, len(sample))
    C = sample[rng.permutation(len(sample))[:k]].copy()
    for _ in range(iters):
        sims = sample @ C.T
        assign = sims.argmax(axis=1)
        for j in range(k):
            members = sample[assign == j]
            if len(members):
                c = members.sum(axis=0)
                n = np.linalg.norm(c)
                if n > 0:
                    C[j] = c / n
    return C


class IVFTopK:
    """IVF-style ANN batch stage: corpus vectors are assigned to their
    nearest coarse centroid; only vectors whose centroid is among a
    query's ``nprobe`` closest centroids are scored against that query.
    The centroid table is the broadcast small side; assignment is a
    per-batch matmul, so the stage shards/resumes like any map."""

    def __init__(self, queries_ref, centroids_ref, k: int, nprobe: int):
        import ray

        qids, qmat = ray.get(queries_ref)
        self.qids = np.asarray(qids)
        self.Q = _normalize(np.asarray(qmat, dtype=np.float64))
        self.C = ray.get(centroids_ref)
        self.k = k
        # per-query probe set: nprobe closest centroids
        qsims = self.Q @ self.C.T
        order = np.argsort(-qsims, axis=1)[:, :nprobe]
        self.probe = [set(row) for row in order]

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return _EMPTY_TOPK
        M = _normalize(_to_matrix(batch["embedding"]))
        ids = batch["vec_id"].to_numpy()
        assign = (M @ self.C.T).argmax(axis=1)
        out_q, out_n, out_s = [], [], []
        sims = self.Q @ M.T  # (nq, nb) — cheap at batch granularity
        for qi in range(len(self.qids)):
            mask = np.fromiter(
                (a in self.probe[qi] for a in assign), bool, len(assign)
            )
            mask &= ids != self.qids[qi]
            if not mask.any():
                continue
            cand = np.nonzero(mask)[0]
            s = sims[qi, cand]
            k = min(self.k, len(cand))
            top = cand[np.argpartition(-s, k - 1)[:k]]
            out_q.extend([self.qids[qi]] * len(top))
            out_n.extend(ids[top])
            out_s.extend(sims[qi, top])
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )


def ivf_topk(
    corpus: rd.Dataset,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    sample_limit: int = 4096,
    seed: int = 7,
) -> rd.Dataset:
    """IVF ANN: train the coarse quantizer on a corpus sample
    (driver-side, deterministic), broadcast centroids, probe-filtered
    scoring per batch, global top-k merge.  Approximate; recall grows
    with ``nprobe``/``n_centroids`` ratio."""
    import ray

    sample_tbl = corpus.limit(sample_limit).to_pandas()
    if len(sample_tbl) == 0:  # empty corpus: nothing to quantize or score
        return rd.from_arrow(_EMPTY_TOPK_RANKED)
    S = _normalize(np.asarray(list(sample_tbl["embedding"]), dtype=np.float64))
    C = kmeans_centroids(S, n_centroids, seed=seed)
    qref = ray.put((query_ids, query_matrix))
    cref = ray.put(C)
    partials = corpus.map_batches(
        IVFTopK,
        fn_constructor_kwargs={
            "queries_ref": qref,
            "centroids_ref": cref,
            "k": k,
            "nprobe": nprobe,
        },
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 8),
        **POOL_REMOTE_ARGS,
    )
    return merge_topk(partials, k)


class HyperplaneLSH:
    """Sign-pattern bucketing: bucket = bits of sign(R @ v)."""

    def __init__(self, dim: int, n_bits: int = 8, seed: int = 1234):
        rng = np.random.default_rng(seed)
        self.R = rng.standard_normal((n_bits, dim))

    def bucket(self, M: np.ndarray) -> np.ndarray:
        signs = (self.R @ M.T) > 0  # (bits, n)
        return (signs.T @ (1 << np.arange(self.R.shape[0]))).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        M = _normalize(_to_matrix(batch["embedding"]))
        return batch.append_column("bucket", pa.array(self.bucket(M), pa.int64()))


def lsh_topk(
    corpus: rd.Dataset,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    k: int = 10,
    n_bits: int = 6,
    seed: int = 1234,
) -> rd.Dataset:
    """Bucketed ANN: score only corpus vectors whose bucket matches some
    query's bucket.  Approximate (recall < 1); deterministic."""
    import ray

    dim = query_matrix.shape[1]
    lsh = HyperplaneLSH(dim, n_bits, seed)
    q_buckets = set(lsh.bucket(_normalize(np.asarray(query_matrix, np.float64))))
    bref = ray.put(q_buckets)
    qref = ray.put((query_ids, query_matrix))

    class BucketFilterTopK(BruteForceTopK):
        def __init__(self):
            super().__init__(qref, k)
            self.lsh = HyperplaneLSH(dim, n_bits, seed)
            self.q_buckets = ray.get(bref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            M = _normalize(_to_matrix(batch["embedding"]))
            buckets = self.lsh.bucket(M)
            keep = np.fromiter(
                (b in self.q_buckets for b in buckets), bool, len(buckets)
            )
            if not keep.any():
                return pa.table(
                    {
                        "query_id": pa.array([], pa.int64()),
                        "neighbor_id": pa.array([], pa.int64()),
                        "cosine": pa.array([], pa.float64()),
                    }
                )
            return super().__call__(batch.filter(pa.array(keep)))

    partials = corpus.map_batches(
        BucketFilterTopK, batch_format="pyarrow", batch_size=4096,
        concurrency=(1, 8), **POOL_REMOTE_ARGS,
    )
    return merge_topk(partials, k)


# -------------------------------------------------------------------- PQ


def pq_train(
    sample: np.ndarray, n_subspaces: int = 8, n_codes: int = 16, iters: int = 8
) -> np.ndarray:
    """Product-quantization codebooks (n_subspaces, n_codes, d_sub)
    trained on an L2-normalized corpus sample (driver-side, bounded —
    the same documented contract as the IVF coarse quantizer above).
    Deterministic: per-subspace Lloyd with min-index init and a fixed
    iteration count."""
    n, d = sample.shape
    assert d % n_subspaces == 0, "dim must divide into subspaces"
    dsub = d // n_subspaces
    books = np.zeros((n_subspaces, n_codes, dsub))
    for s in range(n_subspaces):
        X = sample[:, s * dsub : (s + 1) * dsub]
        kk = min(n_codes, len(X))
        C = X[:kk].copy()
        for _ in range(iters):
            d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            for c in range(kk):
                m = X[a == c]
                if len(m):
                    C[c] = m.mean(axis=0)
        books[s, :kk] = C
        if kk < n_codes:
            books[s, kk:] = C[0]  # degenerate fill for tiny samples
    return books


def _pq_encode(M: np.ndarray, books: np.ndarray) -> np.ndarray:
    """PQ-encode rows of M (one argmin per subspace) -> (n, S) codes.
    Shared by both ADC paths (raw PQTopK and residual IVFPQTopK) so
    the encode cannot drift between them."""
    S, K, dsub = books.shape
    codes = np.zeros((len(M), S), dtype=np.int64)
    for s in range(S):
        xs = M[:, s * dsub : (s + 1) * dsub]
        d2 = ((xs[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
        codes[:, s] = d2.argmin(axis=1)
    return codes


class PQTopK:
    """ADC (asymmetric distance computation) batch stage: corpus
    vectors are PQ-encoded on the fly (one argmin per subspace — the
    encode IS the compression; at scale you would persist the codes),
    each query carries a (n_subspaces x n_codes) lookup table of
    partial squared distances, and the approximate distance is a pure
    table-gather sum.  For L2-normalized vectors cos ~ 1 - d2/2, so
    the emitted score is directly comparable with the exact operator."""

    def __init__(self, queries_ref, books_ref, k: int, exclude_self: bool):
        import ray

        qids, qmat = ray.get(queries_ref)
        self.qids = np.asarray(qids)
        Q = _normalize(np.asarray(qmat, dtype=np.float64))
        self.books = ray.get(books_ref)  # (S, K, dsub)
        S, K, dsub = self.books.shape
        # per-query LUT: ||q_s - c_{s,k}||^2
        self.lut = np.zeros((len(Q), S, K))
        for s in range(S):
            qs = Q[:, s * dsub : (s + 1) * dsub]
            diff = qs[:, None, :] - self.books[s][None, :, :]
            self.lut[:, s, :] = (diff * diff).sum(axis=2)
        self.k = k
        self.exclude_self = exclude_self

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return _EMPTY_TOPK
        M = _normalize(_to_matrix(batch["embedding"]))
        ids = batch["vec_id"].to_numpy()
        S, K, dsub = self.books.shape
        codes = _pq_encode(M, self.books)
        # approx squared distance per (query, vec): gather + sum over s
        d2 = np.zeros((self.lut.shape[0], len(M)))
        for s in range(S):
            d2 += self.lut[:, s, :][:, codes[:, s]]
        sims = 1.0 - d2 / 2.0  # cosine surrogate for normalized vectors
        if self.exclude_self:
            mask = self.qids[:, None] == ids[None, :]
            sims = np.where(mask, -2.0, sims)
        k = min(self.k, sims.shape[1])
        idx = np.argpartition(-sims, kth=k - 1, axis=1)[:, :k]
        rows_q = np.repeat(self.qids, k)
        rows_n = ids[idx.ravel()]
        rows_s = np.take_along_axis(sims, idx, axis=1).ravel()
        keep = rows_s > -2.0
        return pa.table(
            {
                "query_id": pa.array(rows_q[keep], pa.int64()),
                "neighbor_id": pa.array(rows_n[keep], pa.int64()),
                "cosine": pa.array(rows_s[keep], pa.float64()),
            }
        )


def pq_topk(
    corpus: rd.Dataset,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    k: int = 10,
    n_subspaces: int = 8,
    n_codes: int = 16,
    sample_limit: int = 4096,
    exclude_self: bool = True,
) -> rd.Dataset:
    """PQ-compressed ANN: train codebooks on a bounded driver sample,
    broadcast them, ADC-score per batch, global top-k merge.  The
    memory story is the point: a PQ-encoded corpus is n_subspaces
    BYTES per vector (vs 8*d), which is what makes billion-vector
    search fit a cluster's RAM."""
    import ray

    sample_tbl = corpus.limit(sample_limit).to_pandas()
    S = _normalize(np.asarray(list(sample_tbl["embedding"]), dtype=np.float64))
    books = pq_train(S, n_subspaces=n_subspaces, n_codes=n_codes)
    qref = ray.put((query_ids, query_matrix))
    bref = ray.put(books)
    partials = corpus.map_batches(
        PQTopK,
        fn_constructor_kwargs={
            "queries_ref": qref,
            "books_ref": bref,
            "k": k,
            "exclude_self": exclude_self,
        },
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 8),
        **POOL_REMOTE_ARGS,
    )
    return merge_topk(partials, k)


class IVFPQTopK:
    """IVF-ADC batch stage (the FAISS IVFPQ composition): the coarse
    quantizer routes each query to its ``nprobe`` nearest cells; each
    batch assigns its vectors to cells (one matmul), PQ-encodes the
    RESIDUAL (x - centroid) on the fly, and ADC-scores a vector only
    against the queries probing its cell, through a per-(query, cell)
    lookup table of ||(q - c)_s - book_{s,k}||^2 partials built once
    in ``__init__``.  For L2-normalized vectors cos ~ 1 - d2/2, so
    scores are comparable with the exact operator.  Per-batch work is
    one assignment matmul + one residual encode + LUT gathers over
    probed members only — never queries x batch."""

    def __init__(self, queries_ref, centroids_ref, books_ref, k: int, nprobe: int):
        import ray

        qids, qmat = ray.get(queries_ref)
        self.qids = np.asarray(qids)
        Q = _normalize(np.asarray(qmat, dtype=np.float64))
        self.C = ray.get(centroids_ref)
        self.books = ray.get(books_ref)  # residual codebooks (S, K, dsub)
        S, K, dsub = self.books.shape
        order = np.argsort(-(Q @ self.C.T), axis=1)[:, :nprobe]
        self.cell_queries: dict[int, list[int]] = {}
        self.lut: dict[tuple[int, int], np.ndarray] = {}
        for qi, row in enumerate(order):
            for cell in row:
                cell = int(cell)
                self.cell_queries.setdefault(cell, []).append(qi)
                t = Q[qi] - self.C[cell]
                lut = np.zeros((S, K))
                for s in range(S):
                    ts = t[s * dsub : (s + 1) * dsub]
                    diff = ts[None, :] - self.books[s]
                    lut[s] = (diff * diff).sum(axis=1)
                self.lut[(qi, cell)] = lut
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return _EMPTY_TOPK
        M = _normalize(_to_matrix(batch["embedding"]))
        ids = batch["vec_id"].to_numpy()
        S, K, dsub = self.books.shape
        assign = (M @ self.C.T).argmax(axis=1)
        codes = _pq_encode(M - self.C[assign], self.books)
        out_q, out_n, out_s = [], [], []
        for cell in np.unique(assign):
            q_list = self.cell_queries.get(int(cell))
            if not q_list:
                continue
            members = np.flatnonzero(assign == cell)
            mcodes = codes[members]
            for qi in q_list:
                lut = self.lut[(qi, int(cell))]
                d2 = np.zeros(len(members))
                for s in range(S):
                    d2 += lut[s, mcodes[:, s]]
                sims = 1.0 - d2 / 2.0
                # residual-ADC d2 can exceed 6 for an outermost probed
                # cell, so legitimate scores reach below -2.0 — the
                # self-exclusion sentinel must be -inf, not -2.0
                sims = np.where(
                    ids[members] == self.qids[qi], -np.inf, sims
                )
                kk = min(self.k, len(members))
                top = np.argpartition(-sims, kk - 1)[:kk]
                keep = np.isfinite(sims[top])
                out_q.extend([self.qids[qi]] * int(keep.sum()))
                out_n.extend(ids[members][top][keep])
                out_s.extend(sims[top][keep])
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )


def ivf_pq_topk(
    corpus: rd.Dataset,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    n_subspaces: int = 8,
    n_codes: int = 16,
    sample_limit: int = 4096,
    seed: int = 7,
) -> rd.Dataset:
    """IVF-PQ ANN (the canonical billion-scale composition — FAISS
    IVFADC): coarse quantizer trained on a bounded driver sample
    routes queries to ``nprobe`` cells; PQ codebooks trained on the
    sample's RESIDUALS compress each vector to ``n_subspaces`` bytes;
    probe-filtered ADC scoring per batch; global top-k merge.  The
    memory story compounds: cell routing prunes the scan AND the
    scanned vectors are codes, not floats.  Approximate; recall ~
    IVF(nprobe) x PQ(codebook) and is the pinned contract."""
    import ray

    sample_tbl = corpus.limit(sample_limit).to_pandas()
    if len(sample_tbl) == 0:  # empty corpus: degrade like the other families
        return rd.from_arrow(_EMPTY_TOPK_RANKED)
    S = _normalize(np.asarray(list(sample_tbl["embedding"]), dtype=np.float64))
    C = kmeans_centroids(S, n_cells, seed=seed)
    resid = S - C[(S @ C.T).argmax(axis=1)]
    books = pq_train(resid, n_subspaces=n_subspaces, n_codes=n_codes)
    qref = ray.put((query_ids, query_matrix))
    cref = ray.put(C)
    bref = ray.put(books)
    partials = corpus.map_batches(
        IVFPQTopK,
        fn_constructor_kwargs={
            "queries_ref": qref,
            "centroids_ref": cref,
            "books_ref": bref,
            "k": k,
            "nprobe": nprobe,
        },
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 8),
        **POOL_REMOTE_ARGS,
    )
    return merge_topk(partials, k)


def random_projection(
    ds: rd.Dataset,
    out_dim: int = 8,
    seed: int = 211,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> rd.Dataset:
    """Johnson-Lindenstrauss random projection: embeddings -> ``out_dim``
    dims via a seeded Gaussian matrix R/sqrt(out_dim) -> (id,
    proj:list<double>).  The projection preserves pairwise L2 distances
    within (1±eps) w.h.p. — the standard pre-step before clustering /
    dedup on very high-dim embeddings (cuts both compute and shuffle
    bytes by in_dim/out_dim).

    Deterministic and embarrassingly parallel: R is a pure function of
    (seed, in_dim, out_dim) regenerated per actor (d*k doubles — cheaper
    to rebuild than to ship for any realistic size), each row maps
    independently, so output is BIT-identical under any partitioning.
    The projection deliberately uses ``np.einsum(..., optimize=False)``
    rather than BLAS ``M @ R``: BLAS picks its k-accumulation blocking
    from the BATCH row count, so the same row in a 15-row and a 60-row
    batch can differ in the last float bit — einsum's fixed C loop
    order depends only on (d, k), making bit-stability real rather
    than scheduling luck (measured on this box: ``M @ R`` differs
    across batch shapes; einsum does not)."""

    class Project:
        def __init__(self):
            self.R = None  # built lazily: in_dim comes from the data

        def __call__(self, batch: pa.Table) -> pa.Table:
            M = _to_matrix(batch[vec_col])
            if len(M) == 0:
                return pa.table(
                    {
                        id_col: batch[id_col],
                        "proj": pa.array([], pa.list_(pa.float64())),
                    }
                )
            if self.R is None or self.R.shape[0] != M.shape[1]:
                rng = np.random.default_rng(seed)
                self.R = rng.standard_normal(
                    (M.shape[1], out_dim)
                ) / np.sqrt(out_dim)
            # fixed-order kernel: bit-identical for any batch row count
            P = np.einsum("md,dk->mk", M, self.R, optimize=False)
            return pa.table(
                {
                    id_col: batch[id_col],
                    "proj": pa.array(P.tolist(), pa.list_(pa.float64())),
                }
            )

    return ds.map_batches(
        Project, batch_format="pyarrow", concurrency=(1, 8), **POOL_REMOTE_ARGS
    )


def all_pairs_knn(
    emb: rd.Dataset,
    k: int = 3,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    chunk_rows: int = 1024,
    num_partitions: int = 8,
) -> rd.Dataset:
    """Exact all-pairs cosine k-nearest-neighbors -> (query_id,
    neighbor_id, rank) for EVERY vector (self excluded; ties broken by
    neighbor id asc) — the shared engine under the mutual-kNN graph
    and the kNN label-evaluation queries.

    Scale design — the all-queries twin of the chunk-pair cross join in
    ops/dedup.embedding_neardup_blockjoin: vectors consolidate into
    fixed chunks (``id // chunk_rows``, one packed row each); the
    C(C+1)/2 chunk-pair index is generated distributed; each pair task
    does one bounded matmul and emits LOCAL top-k rows for the queries
    of BOTH chunks; a groupby(query) merge keeps the global top-k.
    Per-task memory is two chunk matrices; nothing corpus-sized lands
    anywhere.
    """
    def to_chunk_rows(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy().astype(np.int64)
        M = _normalize(_to_matrix(batch[emb_col]))
        chunks = ids // chunk_rows
        out_c, out_ids, out_mat = [], [], []
        for c in np.unique(chunks):
            m = chunks == c
            out_c.append(int(c))
            out_ids.append(ids[m].tobytes())
            out_mat.append(np.ascontiguousarray(M[m]).tobytes())
        return pa.table(
            {
                "chunk": pa.array(out_c, pa.int64()),
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
        order = np.argsort(ids)
        return pd.DataFrame(
            {
                "chunk": [int(df["chunk"].iloc[0])],
                "ids": [ids[order].tobytes()],
                "mat": [np.ascontiguousarray(M[order]).tobytes()],
            }
        )

    chunks_ds = (
        emb.map_batches(to_chunk_rows, batch_format="pyarrow")
        .groupby("chunk")
        .map_groups(merge_chunk, batch_format="pandas")
        .repartition(num_partitions)
        .materialize()  # pair-index + two join sides consume it
    )
    import ray

    chunk_ids = sorted(
        r["chunk"] for r in chunks_ds.select_columns(["chunk"]).take_all()
    )
    empty = pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "neighbor_id": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
        }
    )
    if not chunk_ids:
        return rd.from_arrow(empty)
    ids_ref = ray.put(np.asarray(chunk_ids, dtype=np.int64))

    def expand_pairs(batch: pa.Table) -> pa.Table:
        all_ids = ray.get(ids_ref)
        ci_out, cj_out = [], []
        for c in batch["chunk"].to_pylist():
            partners = all_ids[all_ids >= c]
            ci_out.append(np.full(len(partners), c, dtype=np.int64))
            cj_out.append(partners)
        ci_a = np.concatenate(ci_out) if ci_out else np.array([], dtype=np.int64)
        cj_a = np.concatenate(cj_out) if cj_out else np.array([], dtype=np.int64)
        return pa.table(
            {"ci": pa.array(ci_a, pa.int64()), "cj": pa.array(cj_a, pa.int64())}
        )

    pairs_idx = (
        chunks_ds.select_columns(["chunk"])
        .map_batches(expand_pairs, batch_format="pyarrow")
        .repartition(num_partitions)
    )

    def side(name: str):
        return chunks_ds.map_batches(
            lambda t, n=name: pa.table(
                {n: t["chunk"], f"ids_{n}": t["ids"], f"mat_{n}": t["mat"]}
            ),
            batch_format="pyarrow",
        )

    j = (
        pairs_idx.join(
            side("ci"), join_type="inner", num_partitions=num_partitions, on=("ci",)
        )
        .repartition(num_partitions)
        .join(
            side("cj"), join_type="inner", num_partitions=num_partitions, on=("cj",)
        )
    )

    def local_topk(batch: pa.Table) -> pa.Table:
        out_q, out_n, out_s = [], [], []

        def emit(qids: np.ndarray, nids: np.ndarray, S: np.ndarray, diag: bool):
            # S: (nq, nn) sims; exclude self when the pair is the
            # diagonal chunk (qids is nids there)
            if diag:
                S = S.copy()
                np.fill_diagonal(S, -2.0)
            kk = min(k, S.shape[1])
            if kk == 0:
                return
            # composite (cosine desc, neighbor id asc) order — a plain
            # argpartition on sim alone can drop a TIED lower-id
            # neighbor at the local boundary, which the global merge
            # (which only orders survivors) can never recover; exact
            # ties are realistic (duplicate embeddings)
            order = np.lexsort(
                (np.broadcast_to(nids, S.shape), -S), axis=-1
            )[:, :kk]
            idx = order
            sims = np.take_along_axis(S, idx, axis=1)
            keep = sims > -2.0
            out_q.append(np.repeat(qids, kk)[keep.ravel()])
            out_n.append(nids[idx.ravel()][keep.ravel()])
            out_s.append(sims.ravel()[keep.ravel()])

        for r in range(len(batch)):
            same = batch["ci"][r].as_py() == batch["cj"][r].as_py()
            ia = np.frombuffer(batch["ids_ci"][r].as_py(), dtype=np.int64)
            ib = np.frombuffer(batch["ids_cj"][r].as_py(), dtype=np.int64)
            A = np.frombuffer(batch["mat_ci"][r].as_py(), dtype=np.float64).reshape(
                len(ia), -1
            )
            B = np.frombuffer(batch["mat_cj"][r].as_py(), dtype=np.float64).reshape(
                len(ib), -1
            )
            S = A @ B.T
            emit(ia, ib, S, same)
            if not same:
                emit(ib, ia, np.ascontiguousarray(S.T), False)
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
                "cosine": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    return merge_topk(j.map_batches(local_topk, batch_format="pyarrow"), k)


def knn_graph_mutual(
    emb: rd.Dataset,
    k: int = 3,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    chunk_rows: int = 1024,
    num_partitions: int = 8,
) -> rd.Dataset:
    """Mutual k-nearest-neighbor graph -> (vec_a, vec_b) with
    vec_a < vec_b: the undirected edges where EACH endpoint is in the
    other's cosine top-k (ties broken by neighbor id asc, self
    excluded).  The mutual-kNN graph is the standard sparsifier for
    graph-based dedup/clustering over embeddings (only reciprocated
    edges survive, which kills hub vertices).  Built on
    ``all_pairs_knn``; the mutual filter is a combiner-first count over
    canonical (lo, hi) pairs (an edge appears exactly twice iff
    reciprocated)."""
    topk = all_pairs_knn(
        emb,
        k=k,
        id_col=id_col,
        emb_col=emb_col,
        chunk_rows=chunk_rows,
        num_partitions=num_partitions,
    )

    # mutual filter: canonical (lo, hi) count == 2 <=> reciprocated
    def canon_pairs(t: pa.Table) -> pa.Table:
        q = t["query_id"].to_numpy(zero_copy_only=False)
        n = t["neighbor_id"].to_numpy(zero_copy_only=False)
        g = (
            pa.table(
                {
                    "vec_a": pa.array(np.minimum(q, n), pa.int64()),
                    "vec_b": pa.array(np.maximum(q, n), pa.int64()),
                }
            )
            .group_by(["vec_a", "vec_b"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["vec_a", "vec_b", "n"])

    from ray.data.aggregate import Sum as _Sum

    counted = (
        topk.map_batches(canon_pairs, batch_format="pyarrow")
        .groupby(["vec_a", "vec_b"])
        .aggregate(_Sum("n", alias_name="n"))
    )

    def mutual_only(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.equal(t["n"], 2))
        return t.select(["vec_a", "vec_b"])

    return counted.map_batches(mutual_only, batch_format="pyarrow")


# ------------------------------------------- scalar-quantized (SQ8) search


def sq8_train_bounds(
    corpus: rd.Dataset, emb_col: str = "embedding"
) -> tuple[np.ndarray, np.ndarray]:
    """Per-dimension [min, max] of the L2-NORMALIZED corpus via one
    streaming scan of (d,)-sized partials — the SQ8 codebook.  Driver
    fold is d x n_blocks floats (metadata-sized)."""

    def mm_partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {"lo": pa.array([], pa.binary()), "hi": pa.array([], pa.binary())}
            )
        M = _normalize(_to_matrix(t[emb_col]))
        return pa.table(
            {
                "lo": pa.array([M.min(axis=0).tobytes()], pa.binary()),
                "hi": pa.array([M.max(axis=0).tobytes()], pa.binary()),
            }
        )

    parts = corpus.map_batches(mm_partial, batch_format="pyarrow").to_pandas()
    if not len(parts):
        raise ValueError("sq8_train_bounds: empty corpus")
    los = np.stack([np.frombuffer(b, np.float64) for b in parts["lo"]])
    his = np.stack([np.frombuffer(b, np.float64) for b in parts["hi"]])
    return los.min(axis=0), his.max(axis=0)


class SQ8TopK:
    """Approximate scoring over SCALAR-QUANTIZED (uint8) vectors: each
    normalized corpus vector is encoded as d bytes against broadcast
    per-dim [lo, hi] bounds (4x less object-store / shuffle traffic
    than float32, 8x less than float64 — the production memory story),
    scored approximately via one dequantized matmul, local
    top-(k x rescore_factor) candidates emitted."""

    def __init__(self, queries_ref, bounds_ref, k: int, rescore_factor: int):
        import ray

        qids, qmat = ray.get(queries_ref)
        self.qids = np.asarray(qids)
        self.Q = _normalize(np.asarray(qmat, dtype=np.float64))
        lo, hi = ray.get(bounds_ref)
        self.lo = lo
        self.scale = np.where(hi > lo, (hi - lo) / 255.0, 1.0)
        self.kk = k * rescore_factor

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return _EMPTY_TOPK
        M = _normalize(_to_matrix(batch["embedding"]))
        codes = np.clip(
            np.round((M - self.lo) / self.scale), 0, 255
        ).astype(np.uint8)
        # in production the codes column IS the stored table; here the
        # encode happens in-stage so the approx path sees exactly what
        # a code-only store would see
        deq = self.lo + codes.astype(np.float64) * self.scale
        ids = batch["vec_id"].to_numpy()
        sims = self.Q @ deq.T
        mask = self.qids[:, None] == ids[None, :]
        sims = np.where(mask, -2.0, sims)
        k = min(self.kk, sims.shape[1])
        idx = np.argpartition(-sims, kth=k - 1, axis=1)[:, :k]
        rows_q = np.repeat(self.qids, k)
        rows_n = ids[idx.ravel()]
        rows_s = np.take_along_axis(sims, idx, axis=1).ravel()
        keep = rows_s > -2.0
        return pa.table(
            {
                "query_id": pa.array(rows_q[keep], pa.int64()),
                "neighbor_id": pa.array(rows_n[keep], pa.int64()),
                "cosine": pa.array(rows_s[keep], pa.float64()),
            }
        )


def sq8_topk(
    corpus: rd.Dataset,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    k: int = 10,
    rescore_factor: int = 4,
) -> rd.Dataset:
    """Two-phase quantized vector search (the production pattern at
    memory-bound scale): (1) approximate top-(k x rescore_factor)
    candidate generation over uint8 scalar-quantized codes, (2) EXACT
    float rescoring of only the candidate rows (a broadcast candidate-
    id filter — bounded at nq x k x rescore_factor ids — never a
    corpus shuffle), final exact top-k.  Candidate recall is what the
    quantizer costs; the returned scores are exact by construction."""
    import ray

    lo, hi = sq8_train_bounds(corpus)
    qref = ray.put((query_ids, query_matrix))
    bref = ray.put((lo, hi))
    approx = corpus.map_batches(
        SQ8TopK,
        fn_constructor_kwargs={
            "queries_ref": qref,
            "bounds_ref": bref,
            "k": k,
            "rescore_factor": rescore_factor,
        },
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 8),
        **POOL_REMOTE_ARGS,
    )
    cand = merge_topk(approx, k * rescore_factor).to_pandas()
    cand_map: dict[int, np.ndarray] = {
        int(q): g["neighbor_id"].to_numpy()
        for q, g in cand.groupby("query_id")
    }
    wanted_all = (
        np.unique(np.concatenate(list(cand_map.values())))
        if cand_map
        else np.array([], dtype=np.int64)
    )
    cref = ray.put((cand_map, wanted_all))  # computed ONCE, broadcast
    Qn = _normalize(np.asarray(query_matrix, dtype=np.float64))
    qarr = np.asarray(query_ids)

    def rescore(t: pa.Table, _cref=cref) -> pa.Table:
        cm, wanted = ray.get(_cref)
        if len(t) == 0:
            return _EMPTY_TOPK
        ids = t["vec_id"].to_numpy()
        m = np.isin(ids, wanted)
        if not m.any():
            return _EMPTY_TOPK
        # mask BEFORE normalizing: only candidate rows pay the math
        M = _normalize(_to_matrix(t["embedding"])[m])
        ids = ids[m]
        sims = Qn @ M.T  # exact float cosine, candidates only
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(qarr):
            cset = cm.get(int(qid))
            if cset is None:
                continue
            mm = np.isin(ids, cset)
            if not mm.any():
                continue
            out_q.append(np.full(mm.sum(), qid, dtype=np.int64))
            out_n.append(ids[mm])
            out_s.append(sims[qi][mm])
        if not out_q:
            return _EMPTY_TOPK
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
                "cosine": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    return merge_topk(
        corpus.map_batches(rescore, batch_format="pyarrow", batch_size=4096), k
    )


def mmr_rerank(
    corpus: rd.Dataset,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    k: int = 10,
    shortlist: int = 50,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Maximal Marginal Relevance (Carbonell & Goldstein 1998)
    DIVERSIFIED top-k -> (query_id, rank, neighbor_id, mmr_score):
    greedily pick argmax ``lam * cos(q, d) - (1-lam) * max cos(d, s)``
    over already-selected s — the rerank every retrieval stack runs to
    stop near-duplicate hits crowding a result page.

    Scale shape (the production two-stage form): stage 1 is the
    streamed brute-force shortlist (queries broadcast, corpus streams,
    per-block top-``shortlist`` partials, grouped merge); stage 2
    fetches ONLY the shortlisted vectors (one streamed filter against
    the broadcast candidate-id set — n_queries x shortlist ids, never
    corpus-bounded) and runs the O(k * shortlist) greedy per query on
    the driver.  Deterministic: score ties break to the smaller id."""
    import ray

    qref = ray.put((query_ids, query_matrix))
    partials = corpus.map_batches(
        BruteForceTopK,
        fn_constructor_kwargs={"queries_ref": qref, "k": shortlist},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 8),
        **POOL_REMOTE_ARGS,
    )

    def top(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["cosine", "neighbor_id"], ascending=[False, True]
        ).head(shortlist)
        return df[["query_id", "neighbor_id", "cosine"]]

    short = (
        partials.groupby("query_id")
        .map_groups(top, batch_format="pandas")
        .to_pandas()
    )  # n_queries x shortlist rows — query-bounded

    cand_ids = np.unique(short["neighbor_id"].to_numpy())
    cref = ray.put(pa.array(cand_ids, pa.int64()))

    def fetch(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.is_valid(
            pc.index_in(pc.cast(t[id_col], pa.int64()), value_set=ray.get(cref))
        )
        t = t.filter(keep)
        return pa.table({id_col: pc.cast(t[id_col], pa.int64()),
                         vec_col: t[vec_col]})

    cand = corpus.map_batches(fetch, batch_format="pyarrow").to_pandas()
    V = _normalize(
        np.stack([np.asarray(v, np.float64) for v in cand[vec_col]])
    )
    vid = cand[id_col].to_numpy()
    pos = {int(i): p for p, i in enumerate(vid)}

    out_q, out_rank, out_id, out_score = [], [], [], []
    for qi, qid in enumerate(query_ids):
        sub = short[short["query_id"] == qid]
        ids = sub["neighbor_id"].to_numpy()
        rel = sub["cosine"].to_numpy().astype(np.float64)
        idx = np.array([pos[int(i)] for i in ids])
        M = V[idx]  # shortlist vectors, L2-normalized
        selected: list[int] = []
        max_sim = np.full(len(ids), -np.inf)
        taken = np.zeros(len(ids), bool)
        for rank in range(1, min(k, len(ids)) + 1):
            pen = np.where(np.isfinite(max_sim), max_sim, 0.0)
            score = lam * rel - (1.0 - lam) * (
                pen if selected else np.zeros(len(ids))
            )
            score = np.where(taken, -np.inf, score)
            # ties: larger score, then smaller neighbor id
            j = int(np.lexsort((ids, -score))[0])
            taken[j] = True
            selected.append(j)
            sims = M @ M[j]
            max_sim = np.maximum(max_sim, sims)
            out_q.append(int(qid))
            out_rank.append(rank)
            out_id.append(int(ids[j]))
            out_score.append(round(float(score[j]), 6))
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "rank": pa.array(out_rank, pa.int64()),
            "neighbor_id": pa.array(out_id, pa.int64()),
            "mmr_score": pa.array(out_score, pa.float64()),
        }
    )


# ------------------------------------------------------------------ HNSW


class HNSWIndex:
    """Pure-numpy/heapq HNSW graph (Malkov & Yashunin 2016) over ONE
    vector shard, cosine similarity (vectors must be L2-normalized).
    Deterministic: node levels come from a seeded RNG over insertion
    order, and insertion order is the caller's row order.

    This is the in-task index for ``hnsw_topk`` — small enough to build
    per shard (O(n log n) inserts, each a bounded ef-search whose
    candidate scoring is a numpy gather-matmul), never shared or
    mutated across tasks."""

    def __init__(self, M: int = 8, ef_construction: int = 64, seed: int = 7):
        self.M = M
        self.efc = ef_construction
        self.mL = 1.0 / np.log(M)
        self.seed = seed

    def build(self, X: np.ndarray, ids: np.ndarray) -> "HNSWIndex":
        import heapq  # noqa: F401  (used by _search_layer)

        self.X = X
        self.ids = ids
        n = len(X)
        rng = np.random.default_rng(self.seed)
        # geometric level draw, capped so adjacency list count is sane
        self.levels = np.minimum(
            (-np.log(1.0 - rng.random(n)) * self.mL).astype(np.int64), 24
        )
        max_level = int(self.levels.max()) if n else 0
        self.adj: list[dict[int, list[int]]] = [
            {} for _ in range(max_level + 1)
        ]
        self.entry = 0
        self.entry_level = int(self.levels[0]) if n else 0
        for lev in range(self.entry_level + 1):
            self.adj[lev][0] = []
        for i in range(1, n):
            self._insert(i)
        return self

    def _search_layer(
        self, q: np.ndarray, eps: list[int], ef: int, level: int
    ) -> list[tuple[float, int]]:
        import heapq

        adj = self.adj[level]
        visited = set(eps)
        s0 = self.X[eps] @ q
        cand = [(-s, v) for s, v in zip(s0, eps)]
        heapq.heapify(cand)
        res = list(zip(s0, eps))
        heapq.heapify(res)
        while len(res) > ef:
            heapq.heappop(res)
        while cand:
            negs, c = heapq.heappop(cand)
            if len(res) >= ef and -negs < res[0][0]:
                break
            nbrs = [u for u in adj.get(c, ()) if u not in visited]
            if not nbrs:
                continue
            visited.update(nbrs)
            s = self.X[nbrs] @ q
            for sv, u in zip(s, nbrs):
                if len(res) < ef or sv > res[0][0]:
                    heapq.heappush(cand, (-sv, u))
                    heapq.heappush(res, (sv, u))
                    if len(res) > ef:
                        heapq.heappop(res)
        return res

    def _insert(self, i: int) -> None:
        q = self.X[i]
        l_i = int(self.levels[i])
        eps = [self.entry]
        for lev in range(self.entry_level, l_i, -1):
            best = max(self._search_layer(q, eps, 1, lev))
            eps = [best[1]]
        for lev in range(min(l_i, self.entry_level), -1, -1):
            found = self._search_layer(q, eps, self.efc, lev)
            best = sorted(found, reverse=True)
            nbrs = [v for _, v in best[: self.M]]
            self.adj[lev][i] = list(nbrs)
            max_m = self.M if lev > 0 else 2 * self.M
            for v in nbrs:
                lst = self.adj[lev].setdefault(v, [])
                lst.append(i)
                if len(lst) > max_m:
                    # keep v's max_m most-similar neighbors
                    s = self.X[lst] @ self.X[v]
                    keep = np.argsort(-s)[:max_m]
                    self.adj[lev][v] = [lst[j] for j in keep]
            eps = [v for _, v in best]
        for lev in range(self.entry_level + 1, l_i + 1):
            self.adj[lev][i] = []
        if l_i > self.entry_level:
            self.entry = i
            self.entry_level = l_i

    def search(
        self, q: np.ndarray, k: int, ef: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """-> (ids, sims) of the approximate top-k, best first."""
        eps = [self.entry]
        for lev in range(self.entry_level, 0, -1):
            best = max(self._search_layer(q, eps, 1, lev))
            eps = [best[1]]
        found = self._search_layer(q, eps, max(ef, k), 0)
        best = sorted(found, reverse=True)[:k]
        idx = np.array([v for _, v in best], dtype=np.int64)
        sims = np.array([s for s, _ in best], dtype=np.float64)
        return self.ids[idx], sims


class HNSWShardTopK:
    """Per-SHARD HNSW ANN stage: each ``__call__`` receives one whole
    shard (``batch_size=None`` after a fixed ``repartition``), builds an
    HNSW index over it, runs every query through it, and emits local
    top-k (query_id, neighbor_id, cosine) rows for ``merge_topk``.

    Scale shape: the index is task-local state — no shared mutable
    graph, so the stage shards, retries and resumes like any map stage;
    shard count bounds per-task memory (graph = O(shard x M) ints).
    Beyond one node's worth of shards, route queries to shards with the
    IVF coarse quantizer (ops/ann.ivf_topk) and keep per-shard HNSW as
    the in-shard index.  Results are deterministic for a fixed input
    layout + shard count (insertion order = row order); recall-vs-exact
    is the pinned contract (tests/test_ann_hnsw.py)."""

    def __init__(
        self,
        queries_ref,
        k: int,
        M: int = 8,
        ef_construction: int = 64,
        ef_search: int = 48,
        exclude_self: bool = True,
        index_dir: str | None = None,
    ):
        import ray

        qids, qmat = ray.get(queries_ref)
        self.qids = np.asarray(qids)
        self.Q = _normalize(np.asarray(qmat, dtype=np.float64))
        self.k = k
        self.M = M
        self.efc = ef_construction
        self.efs = ef_search
        self.exclude_self = exclude_self
        self.index_dir = index_dir

    def _shard_index(self, X: np.ndarray, ids: np.ndarray) -> "HNSWIndex":
        """Build the shard's index — or reload its checkpoint when
        ``index_dir`` is set.  The checkpoint key is a content
        fingerprint of the shard's ids AND its vector bytes (plus
        M/efc), so a re-run over the same shard plan reloads instead
        of rebuilding, a changed shard gets a fresh build, and a
        re-embedded corpus with unchanged ids also gets a fresh build
        (stale-vector reload hazard, round-4 ADVICE); writes are
        atomic-rename (the checkpoint.py convention)."""
        if self.index_dir is None:
            return HNSWIndex(self.M, self.efc).build(X, ids)
        import hashlib
        import os

        key = hashlib.md5(
            np.ascontiguousarray(np.asarray(ids, np.int64)).tobytes()
            + np.ascontiguousarray(X).tobytes()
            + f":{self.M}:{self.efc}".encode()
        ).hexdigest()[:16]
        path = os.path.join(self.index_dir, f"hnsw_{key}.npz")
        if os.path.exists(path):
            return hnsw_from_npz(path)
        index = HNSWIndex(self.M, self.efc).build(X, ids)
        os.makedirs(self.index_dir, exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}.npz"
        hnsw_to_npz(index, tmp)
        os.replace(tmp, path)
        return index

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return _EMPTY_TOPK
        X = _normalize(_to_matrix(batch["embedding"]))
        ids = batch["vec_id"].to_numpy()
        index = self._shard_index(X, ids)
        out_q, out_n, out_s = [], [], []
        for qi, qv in zip(self.qids, self.Q):
            # over-fetch one so self-exclusion still yields k
            nids, sims = index.search(qv, self.k + 1, self.efs)
            if self.exclude_self:
                keep = nids != qi
                nids, sims = nids[keep], sims[keep]
            nids, sims = nids[: self.k], sims[: self.k]
            out_q.extend([qi] * len(nids))
            out_n.extend(nids)
            out_s.extend(sims)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )


def hnsw_topk(
    corpus: rd.Dataset,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    k: int = 10,
    M: int = 8,
    ef_construction: int = 64,
    ef_search: int = 48,
    num_shards: int = 8,
    index_dir: str | None = None,
) -> rd.Dataset:
    """Graph-index ANN: per-shard HNSW build + search, global top-k
    merge.  Approximate; recall grows with ``ef_search`` /
    ``ef_construction``.  The query matrix is the broadcast small side
    (``ray.put`` once, read per actor); the corpus streams through a
    fixed shard plan.  Pass ``index_dir`` to checkpoint each shard's
    built index (content-keyed npz) — a re-run over the same shard
    plan reloads instead of rebuilding."""
    import ray

    qref = ray.put((query_ids, query_matrix))
    partials = corpus.repartition(num_shards).map_batches(
        HNSWShardTopK,
        fn_constructor_kwargs={
            "queries_ref": qref,
            "k": k,
            "M": M,
            "ef_construction": ef_construction,
            "ef_search": ef_search,
            "index_dir": index_dir,
        },
        batch_format="pyarrow",
        batch_size=None,
        concurrency=(1, 8),
        **POOL_REMOTE_ARGS,
    )
    return merge_topk(partials, k)


def hnsw_to_npz(index: HNSWIndex, path: str) -> None:
    """Persist a BUILT HNSW index as one compressed npz (the repo's
    model-weight convention — model.py save_weights): vectors, ids,
    levels, entry state, and per-level CSR-flattened adjacency.  A
    reloaded index answers searches identically (test-pinned), so a
    shard's index can be built once, checkpointed next to its shard,
    and reused across serving runs instead of rebuilt."""
    arrs: dict[str, np.ndarray] = {
        "X": index.X,
        "ids": np.asarray(index.ids, dtype=np.int64),
        "levels": index.levels,
        "meta": np.array(
            [
                index.M,
                index.efc,
                index.entry,
                index.entry_level,
                len(index.adj),
                index.seed,
            ],
            np.int64,
        ),
    }
    for lev, adj in enumerate(index.adj):
        keys = np.array(sorted(adj), np.int64)
        cnt = np.array([len(adj[int(k)]) for k in keys], np.int64)
        flat = (
            np.concatenate([np.asarray(adj[int(k)], np.int64) for k in keys])
            if len(keys)
            else np.array([], np.int64)
        )
        arrs[f"l{lev}_keys"] = keys
        arrs[f"l{lev}_cnt"] = cnt
        arrs[f"l{lev}_nbr"] = flat
    np.savez_compressed(path if path.endswith(".npz") else path + ".npz", **arrs)


def hnsw_from_npz(path: str) -> HNSWIndex:
    """Reload an ``hnsw_to_npz`` index; inverse of the flattening."""
    with np.load(path if path.endswith(".npz") else path + ".npz") as z:
        meta = z["meta"]
        # meta[5] (seed) restores the full determinism contract for a
        # reloaded-then-rebuilt index; absent in v1 files -> default
        seed = int(meta[5]) if len(meta) > 5 else 7
        idx = HNSWIndex(M=int(meta[0]), ef_construction=int(meta[1]), seed=seed)
        idx.X = z["X"]
        idx.ids = z["ids"]
        idx.levels = z["levels"]
        idx.entry = int(meta[2])
        idx.entry_level = int(meta[3])
        n_levels = int(meta[4])
        idx.adj = []
        for lev in range(n_levels):
            keys = z[f"l{lev}_keys"]
            cnt = z[f"l{lev}_cnt"]
            flat = z[f"l{lev}_nbr"]
            off = np.concatenate([[0], np.cumsum(cnt)])
            idx.adj.append(
                {
                    int(k): flat[off[i] : off[i + 1]].tolist()
                    for i, k in enumerate(keys)
                }
            )
    return idx


class CellHNSWTopK:
    """Batch stage for ``hnsw_ivf_topk``: input is SORTED by ``cell``
    (one co-location exchange), so each batch holds contiguous cell
    runs.  Per run: build an HNSW over the run's vectors and search
    ONLY the queries whose probe set contains that cell.  A cell
    straddling two sorted blocks yields two indexes — every vector
    still lives in exactly one index and both are searched by the
    cell's queries, so straddling costs a second small build, never
    recall."""

    def __init__(
        self,
        queries_ref,
        k: int,
        M: int = 8,
        ef_construction: int = 64,
        ef_search: int = 48,
    ):
        import ray

        qids, qmat, probe = ray.get(queries_ref)
        self.qids = np.asarray(qids)
        self.Q = np.asarray(qmat, dtype=np.float64)  # pre-normalized
        self.cell_to_q: dict[int, np.ndarray] = probe
        self.k = k
        self.M = M
        self.efc = ef_construction
        self.efs = ef_search

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return _EMPTY_TOPK
        cells = batch["cell"].to_numpy()
        X = _normalize(_to_matrix(batch["embedding"]))
        ids = batch["vec_id"].to_numpy()
        out_q, out_n, out_s = [], [], []
        starts = np.flatnonzero(np.diff(cells, prepend=cells[0] - 1))
        bounds = np.append(starts, len(cells))
        for s, e in zip(bounds[:-1], bounds[1:]):
            cell = int(cells[s])
            q_idx = self.cell_to_q.get(cell)
            if q_idx is None or len(q_idx) == 0:
                continue
            index = HNSWIndex(self.M, self.efc).build(X[s:e], ids[s:e])
            for qi in q_idx:
                nids, sims = index.search(
                    self.Q[qi], self.k + 1, self.efs
                )
                keep = nids != self.qids[qi]
                nids, sims = nids[keep][: self.k], sims[keep][: self.k]
                out_q.extend([self.qids[qi]] * len(nids))
                out_n.extend(nids)
                out_s.extend(sims)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )


def hnsw_ivf_topk(
    corpus: rd.Dataset,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    M: int = 8,
    ef_construction: int = 64,
    ef_search: int = 48,
    sample_limit: int = 4096,
    seed: int = 7,
) -> rd.Dataset:
    """IVF-routed per-cell HNSW — the documented scale composition for
    the HNSW family (HNSWShardTopK's docstring): the coarse quantizer
    (seeded driver-sample k-means, the IVF trainer) routes each query
    to its ``nprobe`` nearest cells; corpus vectors co-locate by cell
    through ONE sort exchange; each co-located cell run builds its own
    in-task HNSW and serves only that cell's queries.  Per-task work
    scales with cell size x probing queries, never corpus x queries;
    recall ~ IVF(nprobe) x HNSW(ef) and is the pinned contract."""
    import ray

    sample_tbl = corpus.limit(sample_limit).to_pandas()
    if len(sample_tbl) == 0:  # empty corpus: degrade like hnsw_topk does
        return rd.from_arrow(_EMPTY_TOPK_RANKED)
    S = _normalize(np.asarray(list(sample_tbl["embedding"]), dtype=np.float64))
    C = kmeans_centroids(S, n_cells, seed=seed)
    qn = _normalize(np.asarray(query_matrix, dtype=np.float64))
    order = np.argsort(-(qn @ C.T), axis=1)[:, :nprobe]
    cell_to_q: dict[int, np.ndarray] = {}
    for qi, row in enumerate(order):
        for cell in row:
            cell_to_q.setdefault(int(cell), []).append(qi)
    cell_to_q = {c: np.asarray(v, np.int64) for c, v in cell_to_q.items()}
    cref = ray.put(C)
    qref = ray.put((query_ids, qn, cell_to_q))

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("cell", pa.array([], pa.int64()))
        Cb = ray.get(cref)
        Mx = _normalize(_to_matrix(t["embedding"]))
        return t.append_column(
            "cell", pa.array((Mx @ Cb.T).argmax(axis=1).astype(np.int64))
        )

    srt = corpus.map_batches(assign, batch_format="pyarrow").sort("cell")
    partials = srt.map_batches(
        CellHNSWTopK,
        fn_constructor_kwargs={
            "queries_ref": qref,
            "k": k,
            "M": M,
            "ef_construction": ef_construction,
            "ef_search": ef_search,
        },
        batch_format="pyarrow",
        batch_size=None,
        concurrency=(1, 8),
        **POOL_REMOTE_ARGS,
    )
    return merge_topk(partials, k)
