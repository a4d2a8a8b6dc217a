"""Retrieval-stack ops: global ranking, BM25, RRF fusion, and the
point-in-time SCD2 join.  Value-level correctness against DuckDB is
covered by the oracle harness (scripts/check_correctness.py); these
tests pin the distributed mechanics — rank exactness under ties and
partitioning, fusion determinism, and PIT edge semantics."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

import deepie_ray.queries as Q
from deepie_ray.ops import analytic


def test_global_rank_matches_numpy_with_ties():
    rng = np.random.default_rng(7)
    n = 4000
    score = rng.integers(0, 200, n)  # heavy ties
    ids = rng.permutation(n).astype(np.int64)
    t = pa.table(
        {"id": pa.array(ids, pa.int64()), "s": pa.array(score, pa.int64())}
    )
    want = (
        pd.DataFrame({"id": ids, "s": score})
        .sort_values(["s", "id"], ascending=[False, True], kind="mergesort")
        .assign(rank=np.arange(1, n + 1, dtype=np.int64))
        .sort_values("id")
    )
    for parts in (1, 3, 9):
        got = (
            analytic.global_rank(
                rd.from_arrow(t).repartition(parts), "s", "id", out_col="rank"
            )
            .to_pandas()
            .sort_values("id")
        )
        assert (got["rank"].to_numpy() == want["rank"].to_numpy()).all()
        assert len(got) == n


def test_global_rank_empty():
    t = pa.table(
        {"id": pa.array([], pa.int64()), "s": pa.array([], pa.int64())}
    )
    out = analytic.global_rank(rd.from_arrow(t), "s", "id").to_pandas()
    assert len(out) == 0


def test_bm25_scores_rank_term_density(sf_dir):
    out = Q.bm25_search(sf_dir).to_pandas()
    assert len(out) == 20
    # descending by (bm25, doc_id) with the deterministic tie-break
    key = list(zip(-out["bm25"], out["doc_id"]))
    assert key == sorted(key)
    assert (out["bm25"] > 0).all()
    assert out["doc_id"].is_unique


def test_hybrid_rrf_fuses_both_rankings(sf_dir):
    out = Q.hybrid_search_rrf(sf_dir).to_pandas()
    assert len(out) == 10
    # rrf recomputable from the emitted integer ranks — bit parity
    want = 1.0 / (60.0 + out["rank_cos"].to_numpy().astype(np.float64)) + (
        1.0 / (60.0 + out["rank_kw"].to_numpy().astype(np.float64))
    )
    assert (out["rrf"].to_numpy() == want).all()
    # ranks are valid positions
    assert (out["rank_cos"] >= 1).all() and (out["rank_kw"] >= 1).all()


def test_purchase_state_pit_edges(sf_dir):
    out = Q.purchase_state_pit(sf_dir).to_pandas()
    # the dimension excludes purchases, so no purchase can match one
    assert (out["state"] != "purchase").all()
    assert out["event_id"].is_unique
    # inner PIT semantics: purchases before the user's first island drop
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev = ev.dropna(subset=["ts"])
    pur = ev[ev["event_type"] == "purchase"]
    first_np = (
        ev[ev["event_type"] != "purchase"].groupby("user_id")["ts"].min()
    )
    has_prior = pur["ts"] >= pur["user_id"].map(first_np)
    assert len(out) == int(has_prior.fillna(False).sum())


@pytest.mark.parametrize("parts", [1, 5])
def test_events_value_trend_partition_invariant(sf_dir, parts):
    # integer moment sums -> identical floats under any block layout
    import pyarrow.parquet as pq
    import tempfile, os

    t = pq.read_table(f"{sf_dir}/events.parquet")
    if parts > 1:
        t = t.take(list(reversed(range(t.num_rows))))
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "events.parquet"))
        out = (
            Q.events_value_trend(d)
            .to_pandas()
            .sort_values("event_type")
            .reset_index(drop=True)
        )
    base = (
        Q.events_value_trend(sf_dir)
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    assert (out["n"] == base["n"]).all()
    assert (
        out["slope_cents_per_hour"].to_numpy()
        == base["slope_cents_per_hour"].to_numpy()
    ).all()


# ----------------------------------------------------------------- MMR


def _mmr_numpy(Q, ids, V, k, shortlist, lam):
    """Reference greedy MMR over a single query: exact rule re-derived
    independently (relevance = cosine to the query; penalty = max
    cosine to already-selected; ties to smaller id)."""
    rel = V @ Q
    order = np.lexsort((ids, -rel))[:shortlist]
    ids, V, rel = ids[order], V[order], rel[order]
    taken = np.zeros(len(ids), bool)
    max_sim = np.zeros(len(ids))
    have = False
    out = []
    for _ in range(min(k, len(ids))):
        score = lam * rel - (1 - lam) * (max_sim if have else 0.0)
        score = np.where(taken, -np.inf, score)
        j = int(np.lexsort((ids, -score))[0])
        taken[j] = True
        have = True
        max_sim = np.maximum(max_sim, V @ V[j])
        out.append((int(ids[j]), float(score[j])))
    return out


def test_mmr_matches_numpy_greedy(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from deepie_ray.ops import ann

    rng = np.random.default_rng(11)
    n, d = 200, 16
    V = rng.normal(size=(n, d))
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    ids = np.arange(n, dtype=np.int64)
    corpus = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(
                    [list(map(float, r)) for r in V],
                    pa.list_(pa.float32()),
                ),
            }
        )
    ).repartition(4)
    q_ids = np.array([1000], np.int64)
    qv = rng.normal(size=(1, d))
    got = ann.mmr_rerank(
        corpus, q_ids, qv, k=8, shortlist=40, lam=0.7
    ).to_pandas()
    qn = qv[0] / np.linalg.norm(qv[0])
    # float32 list storage quantizes the vectors: reference uses the
    # same quantized values
    V32 = np.array([np.asarray(r, np.float32) for r in V]).astype(np.float64)
    V32n = V32 / np.linalg.norm(V32, axis=1, keepdims=True)
    want = _mmr_numpy(qn, ids, V32n, k=8, shortlist=40, lam=0.7)
    assert got["neighbor_id"].tolist() == [w[0] for w in want]
    assert np.allclose(got["mmr_score"], [round(w[1], 6) for w in want], atol=1e-6)


def test_mmr_demotes_planted_duplicates(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from deepie_ray.ops import ann

    rng = np.random.default_rng(5)
    d = 8
    base = rng.normal(size=d)
    rows = [base + rng.normal(scale=0.01, size=d) for _ in range(5)]  # clones
    rows += [rng.normal(size=d) for _ in range(20)]
    V = np.stack(rows)
    corpus = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(len(V)), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, r)) for r in V], pa.list_(pa.float32())
                ),
            }
        )
    )
    q = base[None, :]
    plain = ann.brute_force_topk(
        corpus, np.array([99], np.int64), q, k=5
    ).to_pandas()
    mmr = ann.mmr_rerank(
        corpus, np.array([99], np.int64), q, k=5, shortlist=25, lam=0.5
    ).to_pandas()
    # relevance-only top-5 is all clones; MMR keeps one clone and
    # diversifies the rest
    n_clones_plain = (plain["neighbor_id"] < 5).sum()
    n_clones_mmr = (mmr["neighbor_id"] < 5).sum()
    assert n_clones_plain == 5
    assert n_clones_mmr <= 2


def test_ivf_pq_topk_recall_on_clustered(ray_session):
    """IVF-PQ (residual-ADC within probed cells): with nprobe covering
    the true cell and clustered vectors, recall@10 vs brute force
    stays usable — the doubly-approximate composition's pinned
    contract."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from deepie_ray.ops import ann

    rng = np.random.default_rng(23)
    centers = rng.standard_normal((8, 32)) * 3.0
    n = 1600
    X = centers[rng.integers(0, 8, n)] + 0.15 * rng.standard_normal((n, 32))
    X = ann._normalize(X)
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
    qids = ids[:8]

    def recall(ds):
        got = ds.to_pandas().groupby("query_id")["neighbor_id"].apply(set)
        hits = total = 0
        for q in qids:
            sims = X @ X[q]
            sims[q] = -2.0
            true = set(np.argsort(-sims)[:10])
            hits += len(true & got.get(q, set()))
            total += 10
        return hits / total

    r_ivfpq = recall(
        ann.ivf_pq_topk(
            corpus, qids, X[:8], k=10, n_cells=8, nprobe=4,
            n_subspaces=16, n_codes=32,
        )
    )
    assert r_ivfpq >= 0.5, r_ivfpq
    # the composition's claim: residual encoding beats raw PQ at the
    # same codebook budget on clustered data (seeded, deterministic —
    # measured 0.61 vs 0.44)
    r_pq = recall(
        ann.pq_topk(corpus, qids, X[:8], k=10, n_subspaces=16, n_codes=32)
    )
    assert r_ivfpq >= r_pq, (r_ivfpq, r_pq)


def test_ivf_pq_empty_corpus_graceful(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from deepie_ray.ops import ann

    corpus = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "embedding": pa.array([], pa.list_(pa.float64())),
            }
        )
    )
    q = ann._normalize(np.ones((2, 8)))
    ds = ann.ivf_pq_topk(corpus, np.array([1, 2], dtype=np.int64), q, k=5)
    assert set(ds.schema().names) == {"query_id", "neighbor_id", "rank"}
    assert ds.count() == 0


def test_ann_topk_ivf_pq_query_entry(ray_session, sf_dir):
    import __ray_entry__ as e

    out = e.queries()["ann_topk_ivf_pq"](sf_dir).to_pandas()
    assert set(out.columns) == {"query_id", "neighbor_id", "rank"}
    assert len(out) > 0
    assert out.groupby("query_id")["rank"].max().max() <= 10
