"""HNSW ANN: recall-vs-exact contract, determinism, graph invariants.

The HNSW family is approximate by design, so its pinned contract is
recall against the brute-force ground truth (the same pattern as the
LSH / IVF / PQ recall pins), not value equality.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from deepie_ray.ops import ann
from deepie_ray.ops.ann import HNSWIndex, _normalize


def _clustered(n: int, d: int = 32, n_clusters: int = 10, seed: int = 3):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, d)) * 3.0
    X = centers[rng.integers(0, n_clusters, n)] + rng.standard_normal((n, d))
    return _normalize(X)


def test_hnsw_index_recall_single_shard():
    X = _clustered(1500)
    ids = np.arange(1500, dtype=np.int64)
    idx = HNSWIndex(M=8, ef_construction=64).build(X, ids)
    hits = total = 0
    for q in range(25):
        true = set(np.argsort(-(X @ X[q]))[:10])
        got, _ = idx.search(X[q], 10, 48)
        hits += len(true & set(got))
        total += 10
    assert hits / total >= 0.9


def test_hnsw_index_exhaustive_ef_is_exact():
    # ef >= n degenerates to exhaustive scan of the reachable graph —
    # on a tiny connected set the result must be the exact top-k
    X = _clustered(120, seed=9)
    ids = np.arange(120, dtype=np.int64)
    idx = HNSWIndex(M=8, ef_construction=120).build(X, ids)
    for q in (0, 17, 63):
        true = list(np.argsort(-(X @ X[q]))[:5])
        got, sims = idx.search(X[q], 5, 200)
        assert list(got) == true
        assert np.all(np.diff(sims) <= 1e-12)  # best-first


def test_hnsw_degree_bounds_and_determinism():
    X = _clustered(800, seed=5)
    ids = np.arange(800, dtype=np.int64)
    a = HNSWIndex(M=6, ef_construction=40).build(X, ids)
    b = HNSWIndex(M=6, ef_construction=40).build(X, ids)
    for lev, adj in enumerate(a.adj):
        cap = 2 * a.M if lev == 0 else a.M
        assert all(len(v) <= cap for v in adj.values())
    assert [a.adj[0][i] for i in range(800)] == [
        b.adj[0][i] for i in range(800)
    ]


def test_hnsw_topk_dataset_recall_multi_shard(ray_session):
    n = 2000
    X = _clustered(n, seed=11)
    ids = np.arange(n, dtype=np.int64)
    corpus = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(
                    [row.tolist() for row in X], pa.list_(pa.float64())
                ),
            }
        )
    ).repartition(6)
    qids = ids[:8]
    got = (
        ann.hnsw_topk(corpus, qids, X[:8], k=10, num_shards=4)
        .to_pandas()
        .groupby("query_id")["neighbor_id"]
        .apply(set)
    )
    hits = total = 0
    for q in qids:
        sims = X @ X[q]
        sims[q] = -2.0  # exclude self, as the stage does
        true = set(np.argsort(-sims)[:10])
        hits += len(true & got.get(q, set()))
        total += 10
    assert hits / total >= 0.9
    # schema contract shared by the whole ANN family
    assert all(len(v) == 10 for v in got.values)


def test_hnsw_query_registry_entry(ray_session, sf_dir):
    import __ray_entry__ as e

    out = e.queries()["ann_topk_hnsw"](sf_dir).to_pandas()
    assert set(out.columns) == {"query_id", "neighbor_id", "rank"}
    assert out.groupby("query_id")["rank"].max().max() <= 10
    assert len(out) > 0


def test_hnsw_npz_roundtrip_search_identical(tmp_path):
    X = _clustered(600, seed=21)
    ids = np.arange(600, dtype=np.int64) * 7 + 3
    idx = ann.HNSWIndex(M=8, ef_construction=48).build(X, ids)
    p = str(tmp_path / "shard0.hnsw.npz")
    ann.hnsw_to_npz(idx, p)
    idx2 = ann.hnsw_from_npz(p)
    for q in (0, 99, 311):
        got1 = idx.search(X[q], 10, 48)
        got2 = idx2.search(X[q], 10, 48)
        assert list(got1[0]) == list(got2[0])
        assert np.allclose(got1[1], got2[1])


def test_hnsw_topk_index_dir_checkpoint_reuse(ray_session, tmp_path):
    """With index_dir set, the first run writes one content-keyed npz
    per shard and a re-run over the same shard plan reloads them,
    producing identical results."""
    import os

    n = 800
    X = _clustered(n, seed=41)
    ids = np.arange(n, dtype=np.int64)
    corpus = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(
                    [row.tolist() for row in X], pa.list_(pa.float64())
                ),
            }
        )
    ).repartition(4)
    d = str(tmp_path / "hnsw_idx")
    r1 = (
        ann.hnsw_topk(corpus, ids[:4], X[:4], k=5, num_shards=3, index_dir=d)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    files = sorted(os.listdir(d))
    assert len(files) == 3 and all(f.endswith(".npz") for f in files)
    r2 = (
        ann.hnsw_topk(corpus, ids[:4], X[:4], k=5, num_shards=3, index_dir=d)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert sorted(os.listdir(d)) == files  # reloaded, not rewritten
    assert r1.equals(r2)


def test_hnsw_ivf_topk_recall_on_clustered(ray_session):
    """IVF-routed per-cell HNSW: with nprobe covering the true cell,
    recall@10 on clustered vectors must stay high (cell routing
    prunes corpus scans, HNSW serves within cells)."""
    n = 2000
    X = _clustered(n, seed=17)
    ids = np.arange(n, dtype=np.int64)
    corpus = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(
                    [row.tolist() for row in X], pa.list_(pa.float64())
                ),
            }
        )
    ).repartition(5)
    qids = ids[:8]
    got = (
        ann.hnsw_ivf_topk(
            corpus, qids, X[:8], k=10, n_cells=8, nprobe=4
        )
        .to_pandas()
        .groupby("query_id")["neighbor_id"]
        .apply(set)
    )
    hits = total = 0
    for q in qids:
        sims = X @ X[q]
        sims[q] = -2.0
        true = set(np.argsort(-sims)[:10])
        hits += len(true & got.get(q, set()))
        total += 10
    assert hits / total >= 0.85


def test_hnsw_ivf_query_registry_entry(ray_session, sf_dir):
    import __ray_entry__ as e

    out = e.queries()["ann_topk_hnsw_ivf"](sf_dir).to_pandas()
    assert set(out.columns) == {"query_id", "neighbor_id", "rank"}
    assert len(out) > 0


def _empty_corpus() -> rd.Dataset:
    return rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "embedding": pa.array([], pa.list_(pa.float64())),
            }
        )
    )


def test_ivf_families_empty_corpus_graceful(ray_session):
    """ivf_topk / hnsw_ivf_topk on a 0-row corpus degrade to an empty
    top-k result (like hnsw_topk) instead of crashing in the
    quantizer's driver sample (round-4 ADVICE)."""
    q = _normalize(np.ones((2, 8)))
    qids = np.array([1, 2], dtype=np.int64)
    for fn in (ann.ivf_topk, ann.hnsw_ivf_topk):
        ds = fn(_empty_corpus(), qids, q, k=5)
        # schema asserted at the Dataset layer (to_pandas drops the
        # schema of any 0-row dataset — the copurchase_kcore caveat)
        assert set(ds.schema().names) == {"query_id", "neighbor_id", "rank"}
        assert ds.count() == 0


def test_hnsw_checkpoint_key_tracks_vector_content(ray_session, tmp_path):
    """Re-embedding the corpus under the SAME vec_ids and index_dir
    must trigger a fresh index build (new npz files), not a stale
    reload — the checkpoint key hashes vector bytes, not just ids
    (round-4 ADVICE)."""
    import os

    n = 400
    ids = np.arange(n, dtype=np.int64)
    d = str(tmp_path / "idx")

    def corpus(seed):
        X = _clustered(n, seed=seed)
        return (
            rd.from_arrow(
                pa.table(
                    {
                        "vec_id": pa.array(ids, pa.int64()),
                        "embedding": pa.array(
                            [row.tolist() for row in X], pa.list_(pa.float64())
                        ),
                    }
                )
            ).repartition(2),
            X,
        )

    c1, X1 = corpus(seed=5)
    ann.hnsw_topk(c1, ids[:2], X1[:2], k=5, num_shards=2, index_dir=d).to_pandas()
    files1 = sorted(os.listdir(d))
    c2, X2 = corpus(seed=6)  # same ids, new vectors
    r2 = (
        ann.hnsw_topk(c2, ids[:2], X2[:2], k=5, num_shards=2, index_dir=d)
        .to_pandas()
        .groupby("query_id")["neighbor_id"]
        .apply(set)
    )
    files2 = sorted(os.listdir(d))
    assert len(files2) == 4 and set(files1) < set(files2)  # fresh builds added
    # and the answers come from the NEW vectors: self top-1 of X2
    for q in ids[:2]:
        sims = X2 @ X2[q]
        sims[q] = -2.0
        true = set(np.argsort(-sims)[:5])
        assert len(true & r2[q]) >= 3
