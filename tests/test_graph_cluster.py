"""Graph analytics (co-purchase construction, PageRank) and k-means
clustering — numpy/DuckDB parity on small in-memory datasets, plus the
partitioning-independence properties of the sampling operators."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from deepie_ray.ops import cluster, graph, sample


# ------------------------------------------------------------- copurchase


def test_copurchase_edges_matches_duckdb():
    t = pa.table(
        {
            "l_orderkey": [1, 1, 1, 2, 2, 3, 3, 3, 4],
            # order 3 holds a repeated part: pairs must be DISTINCT
            "l_partkey": [10, 20, 30, 10, 20, 20, 20, 30, 40],
        }
    )
    out = (
        graph.copurchase_edges(rd.from_arrow(t))
        .to_pandas()
        .sort_values(["part_a", "part_b"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("lineitem", t)
    odf = (
        con.execute(
            """
            WITH p AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
            SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                   count(*)::BIGINT AS co_count
            FROM p a JOIN p b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2 ORDER BY 1, 2
            """
        )
        .df()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, odf, check_dtype=False)
    # (10,20) co-occurs in orders 1 and 2; single-part order 4 emits none
    assert out.set_index(["part_a", "part_b"]).loc[(10, 20), "co_count"] == 2
    assert 40 not in set(out["part_a"]) | set(out["part_b"])


# ---------------------------------------------------- sorted aggregates


def test_sorted_grouped_sum_matches_pandas_across_blocks():
    """Keys deliberately repeat across many input blocks so several
    land on sorted-block boundaries — the driver edge fold must merge
    them exactly (the boundary-exactness contract in ops/agg.py)."""
    from deepie_ray.ops.agg import sorted_grouped_sum

    rng = np.random.default_rng(7)
    n = 20_000
    df = pd.DataFrame(
        {
            "a": rng.integers(0, 900, n),
            "b": rng.integers(0, 7, n),
            "v": rng.integers(1, 100, n).astype("int64"),
        }
    )
    ds = rd.from_pandas(df).repartition(13)  # force many blocks
    got = (
        sorted_grouped_sum(ds, ["a", "b"], "v", "total")
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    want = (
        df.groupby(["a", "b"], as_index=False)["v"]
        .sum()
        .rename(columns={"v": "total"})
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_sorted_grouped_sum_single_group():
    from deepie_ray.ops.agg import sorted_grouped_sum

    ds = rd.from_pandas(
        pd.DataFrame({"k": [5] * 100, "v": np.arange(100, dtype="int64")})
    ).repartition(6)
    got = sorted_grouped_sum(ds, ["k"], "v", "s").to_pandas()
    assert len(got) == 1
    assert int(got["s"].iloc[0]) == int(np.arange(100).sum())


def test_sorted_distinct_matches_pandas_across_blocks():
    from deepie_ray.ops.agg import sorted_distinct

    rng = np.random.default_rng(11)
    n = 15_000
    df = pd.DataFrame(
        {"x": rng.integers(0, 400, n), "y": rng.integers(0, 5, n)}
    )
    ds = rd.from_pandas(df).repartition(11)
    got = (
        sorted_distinct(ds, ["x", "y"])
        .to_pandas()
        .sort_values(["x", "y"])
        .reset_index(drop=True)
    )
    want = (
        df.drop_duplicates()
        .sort_values(["x", "y"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_sorted_grouped_sum_string_keys():
    """String key columns ride the same path (object-array compares in
    _group_starts, Arrow type inference on the take)."""
    from deepie_ray.ops.agg import sorted_grouped_sum

    rng = np.random.default_rng(5)
    n = 8_000
    df = pd.DataFrame(
        {
            "w": [f"tok{int(i):03d}" for i in rng.integers(0, 250, n)],
            "v": rng.integers(1, 9, n).astype("int64"),
        }
    )
    ds = rd.from_pandas(df).repartition(7)
    got = (
        sorted_grouped_sum(ds, ["w"], "v", "n")
        .to_pandas()
        .sort_values("w")
        .reset_index(drop=True)
    )
    want = (
        df.groupby("w", as_index=False)["v"]
        .sum()
        .rename(columns={"v": "n"})
        .sort_values("w")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_sorted_grouped_sum_single_hot_key_across_blocks():
    """Pathological skew: ONE key holds most rows, spread over every
    input block.  After the sort it occupies several consecutive
    blocks; every one of its per-block partials must be routed through
    the edge fold and merged exactly."""
    from deepie_ray.ops.agg import sorted_grouped_sum

    rng = np.random.default_rng(13)
    n = 30_000
    keys = np.where(rng.random(n) < 0.9, 42, rng.integers(0, 50, n))
    df = pd.DataFrame({"k": keys, "v": np.ones(n, dtype="int64")})
    ds = rd.from_pandas(df).repartition(10)
    got = (
        sorted_grouped_sum(ds, ["k"], "v", "n")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        df.groupby("k", as_index=False)["v"]
        .sum()
        .rename(columns={"v": "n"})
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_sorted_grouped_head_matches_pandas_window():
    """Per-key top-k parity vs the pandas window, with keys spread
    across many blocks so boundary keys exercise the driver re-rank."""
    from deepie_ray.ops.agg import sorted_grouped_head

    rng = np.random.default_rng(3)
    n = 12_000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 700, n),
            "id": np.arange(n, dtype="int64"),
            "v": rng.integers(0, 10_000, n).astype("int64"),
        }
    )
    ds = rd.from_pandas(df).repartition(9)
    got = (
        sorted_grouped_head(ds, ["k"], ["v", "id"], [True, False], 3, "rank")
        .to_pandas()
        .sort_values(["k", "rank"])
        .reset_index(drop=True)
    )
    w = df.sort_values(["k", "v", "id"], ascending=[True, False, True])
    w = w.groupby("k", sort=False).head(3).copy()
    w["rank"] = w.groupby("k", sort=False).cumcount() + 1
    w = w.sort_values(["k", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["k", "id", "v", "rank"]], w[["k", "id", "v", "rank"]],
        check_dtype=False,
    )


def test_distributed_cc_string_ids_sorted_min_path():
    """Forced-distributed connected components over STRING ids: the
    per-round min-label now rides sorted_grouped_sum(op=min), whose
    string branch (object-array ufunc fallback, no int64 cast) this
    pins end to end."""
    from deepie_ray.ops.dedup import components_from_pairs

    pairs = pa.table(
        {
            "id_a": ["d1", "d2", "d7", "d9"],
            "id_b": ["d2", "d3", "d8", "d1"],
        }
    )
    out = (
        components_from_pairs(
            rd.from_arrow(pairs), pa.string(), force_distributed_cc=True
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = {
        "d1": "d1", "d2": "d1", "d3": "d1", "d9": "d1",
        "d7": "d7", "d8": "d7",
    }
    assert dict(zip(out["doc_id"], out["cluster_id"])) == want


# --------------------------------------------------------------- pagerank


def _pagerank_numpy(edges, iters, damping=0.85):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for u, _ in edges:
        out[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        d_mass = r[out == 0].sum()
        contrib = np.zeros(n)
        for u, v in edges:
            contrib[idx[v]] += r[idx[u]] / out[idx[u]]
        r = (1 - damping) / n + damping * (contrib + 0.0) + damping * d_mass / n
    return dict(zip(nodes, r))


def test_pagerank_matches_numpy_power_iteration():
    # includes a dangling node (4) and an in-link-free node (1)
    edges = [(1, 2), (1, 3), (2, 3), (3, 4), (2, 4), (5, 3), (3, 5)]
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([u for u, _ in edges], pa.int64()),
                "dst": pa.array([v for _, v in edges], pa.int64()),
            }
        )
    )
    want = _pagerank_numpy(edges, iters=4)
    # both size-gate paths must match the same oracle
    for force_join in (False, True):
        got = (
            graph.pagerank(ds, iters=4, num_partitions=2, force_join=force_join)
            .to_pandas()
            .set_index("node")["rank"]
            .to_dict()
        )
        assert set(got) == set(want)
        for n in want:
            assert got[n] == pytest.approx(want[n], abs=1e-12), (force_join, n)
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_empty_edges():
    ds = rd.from_arrow(
        pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
    )
    assert graph.pagerank(ds, iters=2).count() == 0


# ----------------------------------------------------------------- kmeans


def _kmeans_numpy(X, ids, k, iters):
    order = np.argsort(ids)
    C = X[order[:k]].astype(np.float64).copy()
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        for c in range(k):
            if (a == c).any():
                C[c] = X[a == c].mean(axis=0)
    d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    return C, d.argmin(axis=1)


def test_kmeans_matches_numpy_lloyd():
    rng = np.random.default_rng(7)
    # three well-separated blobs so assignments are unambiguous
    X = np.concatenate(
        [rng.normal(c, 0.05, size=(40, 8)) for c in (0.0, 5.0, -5.0)]
    )
    ids = np.arange(len(X))
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(list(X), pa.list_(pa.float64())),
            }
        )
    ).repartition(4)
    C = cluster.kmeans_fit(ds, k=3, iters=4)
    got = (
        cluster.kmeans_assign(ds, C)
        .to_pandas()
        .sort_values("vec_id")["cluster"]
        .to_numpy()
    )
    Cw, want = _kmeans_numpy(X, ids, k=3, iters=4)
    assert np.allclose(np.sort(Cw, axis=0), np.sort(C, axis=0), atol=1e-9)
    assert (got == want).all()


def test_kmeans_partitioning_independent():
    rng = np.random.default_rng(11)
    X = rng.normal(size=(60, 6))
    ids = np.arange(60)
    t = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(list(X), pa.list_(pa.float64())),
        }
    )
    a1 = (
        cluster.kmeans_assign(
            rd.from_arrow(t).repartition(1),
            cluster.kmeans_fit(rd.from_arrow(t).repartition(1), k=4, iters=3),
        )
        .to_pandas()
        .sort_values("vec_id")["cluster"]
        .to_numpy()
    )
    a8 = (
        cluster.kmeans_assign(
            rd.from_arrow(t).repartition(8),
            cluster.kmeans_fit(rd.from_arrow(t).repartition(8), k=4, iters=3),
        )
        .to_pandas()
        .sort_values("vec_id")["cluster"]
        .to_numpy()
    )
    # centroid folding order differs across partitionings; assignments
    # (the discrete output) must not
    assert (a1 == a8).all()


def _emb_table(X: np.ndarray) -> pa.Table:
    return pa.table(
        {
            "vec_id": pa.array(np.arange(len(X)), pa.int64()),
            "embedding": pa.array(list(X.astype(np.float64)), pa.list_(pa.float64())),
        }
    )


def test_semantic_dedup_keep_rule_matches_numpy():
    """The within-cluster prune must reproduce the deterministic
    ascending-id greedy rule exactly: given the op's own cluster
    assignment, a numpy re-derivation of keep/drop agrees per row."""
    rng = np.random.default_rng(7)
    X = rng.normal(size=(80, 8))
    # plant near-duplicate pairs (id, id+40): tiny perturbation
    X[40:60] = X[0:20] + rng.normal(scale=1e-3, size=(20, 8))
    out = (
        cluster.semantic_dedup(
            rd.from_arrow(_emb_table(X)).repartition(4),
            k=4,
            threshold=0.9,
            iters=3,
        )
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert len(out) == 80
    U = X / np.linalg.norm(X, axis=1, keepdims=True)
    for cl, grp in out.groupby("cluster"):
        ids = grp["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        keep = grp["keep"].to_numpy()[order]
        S = U[ids] @ U[ids].T
        expect = ~(np.tril(S, k=-1) >= 0.9).any(axis=1)
        assert (keep == expect).all(), f"cluster {cl}"


def test_semantic_dedup_prunes_planted_dupes_keeps_min_id():
    rng = np.random.default_rng(3)
    X = rng.normal(size=(30, 8))
    X[20:30] = X[0:10] + rng.normal(scale=1e-4, size=(10, 8))
    out = (
        cluster.semantic_dedup(
            rd.from_arrow(_emb_table(X)).repartition(3),
            k=3,
            threshold=0.95,
            iters=4,
        )
        .to_pandas()
        .set_index("vec_id")
    )
    for lo, hi in zip(range(0, 10), range(20, 30)):
        # same cluster (near-identical vectors) -> exactly the smaller
        # id survives; different clusters (quantizer split) -> both do
        if out.loc[lo, "cluster"] == out.loc[hi, "cluster"]:
            assert bool(out.loc[lo, "keep"]) and not bool(out.loc[hi, "keep"])
        else:
            assert bool(out.loc[lo, "keep"]) and bool(out.loc[hi, "keep"])


def test_semantic_dedup_skewed_cluster_above_cap_chunked():
    """Round-3 verdict #1: a cluster LARGER than ``chunk_rows`` must go
    through the chunk-pair scan (per-task memory bounded by the cap,
    not cluster size) and still reproduce the numpy keep rule exactly.
    k=1 forces every row into one cluster of 300 rows with cap 64 ->
    ~5 hash chunks, 15 chunk pairs."""
    rng = np.random.default_rng(23)
    X = rng.normal(size=(300, 8))
    # plant dup pairs spread across the id range (and therefore across
    # hash chunks): (i, i+150) for i in 0..50
    X[150:200] = X[0:50] + rng.normal(scale=1e-3, size=(50, 8))
    out = (
        cluster.semantic_dedup(
            rd.from_arrow(_emb_table(X)).repartition(4),
            k=1,
            threshold=0.9,
            iters=2,
            chunk_rows=64,
        )
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert len(out) == 300
    assert out["vec_id"].tolist() == list(range(300))
    U = X / np.linalg.norm(X, axis=1, keepdims=True)
    S = U @ U.T
    expect = ~(np.tril(S, k=-1) >= 0.9).any(axis=1)
    assert (out["keep"].to_numpy() == expect).all()
    # the planted dups must actually be dropped (the test has teeth)
    assert not expect[150:200].any()


def test_semantic_dedup_mixed_small_and_big_clusters():
    """One cluster above the cap and others below it: the size-gated
    union of the map_groups path and the chunk-pair path must cover
    every row exactly once and agree with the numpy rule per cluster."""
    rng = np.random.default_rng(31)
    # a tight blob of 150 near-identical rows (one hot cluster) plus 60
    # well-spread rows
    blob = rng.normal(size=(1, 6)) + rng.normal(scale=1e-3, size=(150, 6))
    rest = rng.normal(size=(60, 6)) * 5.0
    X = np.vstack([blob, rest])
    out = (
        cluster.semantic_dedup(
            rd.from_arrow(_emb_table(X)).repartition(3),
            k=4,
            threshold=0.9,
            iters=3,
            chunk_rows=48,
        )
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert len(out) == 210
    assert out["vec_id"].tolist() == list(range(210))
    U = X / np.linalg.norm(X, axis=1, keepdims=True)
    for cl, grp in out.groupby("cluster"):
        ids = grp["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        keep = grp["keep"].to_numpy()[order]
        S = U[ids] @ U[ids].T
        expect = ~(np.tril(S, k=-1) >= 0.9).any(axis=1)
        assert (keep == expect).all(), f"cluster {cl}"


def test_semantic_dedup_partitioning_independent():
    rng = np.random.default_rng(19)
    X = rng.normal(size=(50, 6))
    X[25:35] = X[0:10] + rng.normal(scale=1e-3, size=(10, 6))
    outs = []
    for parts in (1, 8):
        outs.append(
            cluster.semantic_dedup(
                rd.from_arrow(_emb_table(X)).repartition(parts),
                k=4,
                threshold=0.9,
                iters=3,
            )
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])


# ------------------------------------------------------- sampling / shards


def test_mix_sources_partitioning_independent_and_bounded():
    t = pa.table(
        {
            "doc_id": pa.array(range(400), pa.int64()),
            "source": pa.array(
                [f"src{i % 4}" for i in range(400)], pa.string()
            ),
        }
    )
    out1 = (
        rd.from_arrow(t)
        .repartition(1)
        .map_batches(sample.mix_sources_batch, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    out8 = (
        rd.from_arrow(t)
        .repartition(8)
        .map_batches(sample.mix_sources_batch, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out1, out8)
    # every kept row satisfies the keep rule; rates in [100, 999]
    assert (out1["bucket"] < out1["rate_permille"]).all()
    assert out1["rate_permille"].between(100, 999).all()
    # each source keeps roughly its rate (binomial, generous bounds)
    for src, grp in out1.groupby("source"):
        rate = sample.source_rate_permille(src) / 1000
        assert abs(len(grp) / 100 - rate) < 0.2, src


def test_shuffle_shards_is_permutation():
    t = pa.table({"doc_id": pa.array(range(300), pa.int64())})
    out = sample.shuffle_shards(rd.from_arrow(t), n_shards=8).to_pandas()
    assert len(out) == 300
    assert out["shard"].between(0, 7).all()
    for _, grp in out.groupby("shard"):
        assert sorted(grp["pos"]) == list(range(len(grp)))
    # deterministic across runs/partitionings
    out2 = sample.shuffle_shards(
        rd.from_arrow(t).repartition(5), n_shards=8
    ).to_pandas()
    m1 = out.sort_values("doc_id").reset_index(drop=True)
    m2 = out2.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(m1, m2)


# ----------------------------------------------------------- inverted index


def test_inverted_index_cap_and_merge():
    from deepie_ray.ops import text

    docs = pa.table(
        {
            "doc_id": pa.array(range(10), pa.int64()),
            "text": pa.array(
                ["common special" if i < 3 else "common" for i in range(10)],
                pa.string(),
            ),
        }
    )
    parts = rd.from_arrow(docs).repartition(4).map_batches(
        lambda t: text.inverted_index_partials(t, postings_cap=2),
        batch_format="pyarrow",
    )
    out = (
        parts.groupby("term")
        .map_groups(
            lambda df: text.merge_inverted_index(df, postings_cap=2),
            batch_format="pandas",
        )
        .to_pandas()
        .set_index("term")
    )
    # df is exact even beyond the postings cap; postings = lowest-2 ids
    assert out.loc["common", "df"] == 10
    assert out.loc["common", "postings"] == "0,1"
    assert out.loc["special", "df"] == 3
    assert out.loc["special", "postings"] == "0,1"


# ------------------------------------------------------- heavy hitters (MG)


def test_misra_gries_exact_below_cap_and_bounded_beyond():
    from deepie_ray.ops import sketch

    # exact-degenerate: distinct <= cap -> exact counts back
    it, ct = sketch.mg_merge(
        [
            (np.array(["a", "b"], object), np.array([5, 3])),
            (np.array(["b", "c"], object), np.array([4, 1])),
        ],
        cap=10,
    )
    assert dict(zip(it, ct)) == {"a": 5, "b": 7, "c": 1}
    # beyond cap: heavy item survives, count underestimates by <= N/cap
    rng = np.random.default_rng(3)
    items = np.array([f"t{i}" for i in rng.integers(0, 500, 5000)], object)
    items = np.concatenate([items, np.array(["HH"] * 800, object)])
    u, c = np.unique(items, return_counts=True)
    it, ct = sketch.mg_partial(u, c, cap=50)
    got = dict(zip(it, ct))
    n = len(items)
    assert "HH" in got
    assert 800 - n / 50 <= got["HH"] <= 800


def test_global_topk_heavy_hitters_beyond_cap_keeps_heavy_item():
    from deepie_ray.ops import sketch

    rng = np.random.default_rng(5)
    words = [f"w{i}" for i in rng.integers(0, 300, 4000)] + ["HEAVY"] * 500
    t = pa.table({"word": pa.array(words, pa.string())})
    counts = rd.from_arrow(t).repartition(6).map_batches(
        lambda b: (
            lambda g: pa.table({"word": g["word"], "n": g["count_all"]})
        )(b.group_by("word").aggregate([([], "count_all")])),
        batch_format="pyarrow",
    )
    out = sketch.global_topk_heavy_hitters(
        counts, "word", "n", k=5, cap=64
    ).to_pandas()
    assert out.iloc[0]["word"] == "HEAVY"
    assert out.iloc[0]["rank"] == 1
    assert len(out) == 5


# --------------------------------------------------- review regressions


def test_pagerank_join_path_with_empty_hash_partitions():
    """3 nodes, 8 join partitions: most hash partitions are empty, the
    exact configuration whose zero-column blocks crashed Dataset.join
    before the repartition guards (reproduced pre-fix)."""
    edges = [(1, 2), (2, 3), (3, 1)]
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([u for u, _ in edges], pa.int64()),
                "dst": pa.array([v for _, v in edges], pa.int64()),
            }
        )
    )
    want = _pagerank_numpy(edges, iters=3)
    got = (
        graph.pagerank(ds, iters=3, num_partitions=8, force_join=True)
        .to_pandas()
        .set_index("node")["rank"]
        .to_dict()
    )
    for n in want:
        assert got[n] == pytest.approx(want[n], abs=1e-12), n


def test_latest_event_per_user_excludes_null_ts(tmp_path):
    import duckdb
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "ts": pa.array(
                [
                    pd.Timestamp("2024-01-01 10:00:00"),
                    None,  # NaT must NOT be crowned the latest
                    pd.Timestamp("2024-01-02 09:00:00"),
                    None,
                ],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([7, 7, 8, 9], pa.int64()),
            "event_type": pa.array(["a", "b", "c", "d"], pa.string()),
            "value": pa.array([1.0, 2.0, 3.0, 4.0]),
            "props": pa.array(["{}"] * 4, pa.string()),
        }
    )
    pq.write_table(t, f"{tmp_path}/events.parquet")
    from deepie_ray import queries as Q

    eng = (
        Q.latest_event_per_user(str(tmp_path))
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", t)
    sql = __import__("__ray_entry__").oracle_sql()["latest_event_per_user"]
    odf = con.execute(sql).df().sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        eng[sorted(eng.columns)], odf[sorted(odf.columns)], check_dtype=False
    )
    # user 7's latest is the non-null event 1; all-null user 9 is absent
    assert eng.set_index("user_id").loc[7, "last_event_id"] == 1
    assert 9 not in set(eng["user_id"])


def test_heavy_hitter_salt_spreads_across_blocks():
    """Blocks sharing the same lexicographic-minimum token must not all
    collapse into one level-1 reducer (pre-fix: salt = hash(item[0]),
    identical for every block whose smallest token is e.g. 'a')."""
    from deepie_ray.ops import sketch

    rng = np.random.default_rng(13)
    salts = set()
    for i in range(12):
        # every synthetic block summary starts with the same min item
        words = ["a"] + [f"w{v}" for v in rng.integers(0, 50, 200 + 7 * i)]
        u, inv = np.unique(np.asarray(words, dtype=object), return_inverse=True)
        summed = np.zeros(len(u), dtype=np.int64)
        np.add.at(summed, inv, 1)
        it, ct = sketch.mg_partial(u, summed, 64)
        assert it[0] == "a"
        salts.add(sketch.summary_salt(it, ct, 32))
    assert len(salts) >= 4
    # deterministic (retry-safe): same summary -> same salt
    assert sketch.summary_salt(it, ct, 32) == sketch.summary_salt(it, ct, 32)


# -------------------------------------------------------- bloom decontam


def test_bloom_contamination_no_false_negatives(tmp_path):
    """Every exact-overlap shingle must pass the Bloom filter: the
    approximate count dominates the exact count per doc; at 4M bits /
    tiny benchmark, the false-positive rate is ~0 so the counts are
    equal on this fixture."""
    import pyarrow.parquet as pq

    from deepie_ray.ops import dedup as dd

    docs = pa.table(
        {
            "doc_id": pa.array(range(30), pa.int64()),
            "text": pa.array(
                [
                    # benchmark docs (id < 10) with distinctive 3-grams
                    *[f"alpha beta gamma delta{i} epsilon zeta" for i in range(10)],
                    # contaminated corpus docs quoting the benchmark
                    *[f"noise{i} alpha beta gamma delta{i % 10} tail" for i in range(10)],
                    # clean corpus docs
                    *[f"clean{i} words only here {i}" for i in range(10)],
                ],
                pa.string(),
            ),
            "lang": pa.array(["en"] * 30),
            "source": pa.array(["s"] * 30),
            "n_chars": pa.array([1] * 30, pa.int64()),
        }
    )
    pq.write_table(docs, f"{tmp_path}/documents.parquet")
    from deepie_ray import queries as Q

    approx = (
        Q.contamination_bloom(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    exact = (
        Q.contamination_ngram(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert (approx["n_shingles"] == exact["n_shingles"]).all()
    assert (approx["n_overlap_approx"] >= exact["n_overlap"]).all()
    # contaminated docs flagged, clean docs not (fp ~0 at this m/n)
    assert (approx.loc[10:19, "n_overlap_approx"] > 0).all()
    assert (approx.loc[20:29, "n_overlap_approx"] == 0).all()


# ------------------------------------------------------------------- PQ


def test_pq_topk_recall_vs_exact():
    from deepie_ray.ops import ann

    rng = np.random.default_rng(17)
    X = rng.normal(size=(400, 32))
    ids = np.arange(400)
    t = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(list(X), pa.list_(pa.float64())),
        }
    )
    corpus = rd.from_arrow(t).repartition(4)
    qids = ids[:5]
    qmat = X[:5]
    exact = (
        ann.brute_force_topk(corpus, qids, qmat, k=10)
        .to_pandas()
        .groupby("query_id")["neighbor_id"]
        .apply(set)
    )
    approx = (
        ann.pq_topk(corpus, qids, qmat, k=10, n_subspaces=8, n_codes=32)
        .to_pandas()
        .groupby("query_id")["neighbor_id"]
        .apply(set)
    )
    recalls = [
        len(exact[q] & approx[q]) / len(exact[q]) for q in exact.index
    ]
    assert np.mean(recalls) >= 0.5, recalls
    # deterministic across runs
    again = (
        ann.pq_topk(corpus, qids, qmat, k=10, n_subspaces=8, n_codes=32)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    first = (
        ann.pq_topk(corpus, qids, qmat, k=10, n_subspaces=8, n_codes=32)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(first, again)


# ------------------------------------------------------------- triangles


@pytest.mark.parametrize("gate", [20_000_000, 0])
def test_triangle_counts_vs_bruteforce(gate):
    from deepie_ray.ops import graph

    rng = np.random.default_rng(23)
    n = 40
    # random undirected graph, canonical a<b orientation, distinct
    pairs = set()
    for _ in range(200):
        a, b = rng.integers(0, n, 2)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    ed = sorted(pairs)
    t = pa.table(
        {
            "part_a": pa.array([a for a, _ in ed], pa.int64()),
            "part_b": pa.array([b for _, b in ed], pa.int64()),
        }
    )
    # gate=0 forces the distributed join path; the default gate takes
    # the broadcast-CSR path — both must match brute force exactly
    out = (
        graph.triangle_counts(
            rd.from_arrow(t).repartition(4),
            num_partitions=4,
            broadcast_gate=gate,
        )
        .to_pandas()
        .set_index("node")["n_triangles"]
    )
    # brute force: adjacency matrix walk
    A = np.zeros((n, n), dtype=bool)
    for a, b in ed:
        A[a, b] = A[b, a] = True
    expect = {}
    for a in range(n):
        for b in range(a + 1, n):
            if not A[a, b]:
                continue
            for c in range(b + 1, n):
                if A[b, c] and A[a, c]:
                    expect[a] = expect.get(a, 0) + 1
    assert out.to_dict() == expect
    assert int(out.sum()) == np.trace(
        np.linalg.matrix_power(A.astype(np.int64), 3)
    ) // 6


def test_triangle_counts_empty_edges():
    from deepie_ray.ops import graph

    t = pa.table(
        {
            "part_a": pa.array([], pa.int64()),
            "part_b": pa.array([], pa.int64()),
        }
    )
    assert graph.triangle_counts(rd.from_arrow(t)).count() == 0


def test_triangle_counts_wedge_free_and_open_wedge():
    from deepie_ray.ops import graph

    # perfect matching: edges but zero wedges (review finding: the
    # closing join must not see a zero-row side)
    t = pa.table(
        {
            "part_a": pa.array([1, 3], pa.int64()),
            "part_b": pa.array([2, 4], pa.int64()),
        }
    )
    assert graph.triangle_counts(rd.from_arrow(t)).count() == 0

    # open wedge (path 1-2-3, no closing edge): wedges exist, zero
    # triangles — the count stage must handle the empty join output
    t2 = pa.table(
        {
            "part_a": pa.array([1, 2], pa.int64()),
            "part_b": pa.array([2, 3], pa.int64()),
        }
    )
    assert graph.triangle_counts(rd.from_arrow(t2)).count() == 0


def test_triangle_counts_broadcast_huge_int64_ids():
    """The broadcast path packs DENSE indices, not raw ids — node ids
    far above 2^32 must still count exactly (remap via np.unique)."""
    from deepie_ray.ops import graph

    base = np.int64(1) << np.int64(41)
    # triangle on {base, base+7, base+9} plus a pendant edge
    t = pa.table(
        {
            "part_a": pa.array(
                [base, base, base + 7, base + 9], pa.int64()
            ),
            "part_b": pa.array(
                [base + 7, base + 9, base + 9, base + 100], pa.int64()
            ),
        }
    )
    out = (
        graph.triangle_counts(rd.from_arrow(t).repartition(2))
        .to_pandas()
        .set_index("node")["n_triangles"]
        .to_dict()
    )
    assert out == {int(base): 1}


def test_triangle_counts_per_vertex_paths_agree():
    """per_vertex credit (clustering-coefficient numerator) must be
    identical through the broadcast and join paths."""
    from deepie_ray.ops import graph

    rng = np.random.default_rng(31)
    pairs = set()
    for _ in range(150):
        a, b = rng.integers(0, 25, 2)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    ed = sorted(pairs)
    t = pa.table(
        {
            "part_a": pa.array([a for a, _ in ed], pa.int64()),
            "part_b": pa.array([b for _, b in ed], pa.int64()),
        }
    )
    fast = (
        graph.triangle_counts(
            rd.from_arrow(t).repartition(3), per_vertex=True
        )
        .to_pandas()
        .set_index("node")["n_triangles"]
        .to_dict()
    )
    slow = (
        graph.triangle_counts(
            rd.from_arrow(t).repartition(3),
            per_vertex=True,
            broadcast_gate=0,
        )
        .to_pandas()
        .set_index("node")["n_triangles"]
        .to_dict()
    )
    assert fast == slow and len(fast) > 0


def test_semantic_dedup_threshold_zero_mask():
    """threshold=0.0 must drop j only when some i<j has cos >= 0 —
    NOT unconditionally (the old tril-zeroing bug counted masked-out
    entries as matches for any threshold <= 0)."""
    # two orthogonal-ish clusters of mutually NEGATIVE similarity inside
    X = np.array(
        [
            [1.0, 0.0],
            [-1.0, 0.1],   # cos vs id0 < 0 -> must survive at thr=0
            [0.9, 0.1],    # cos vs id0 > 0 -> dropped if same cluster
        ]
    )
    out = (
        cluster.semantic_dedup(
            rd.from_arrow(_emb_table(X)), k=1, threshold=0.0, iters=2
        )
        .to_pandas()
        .set_index("vec_id")
    )
    assert bool(out.loc[0, "keep"])
    assert bool(out.loc[1, "keep"])  # negative similarity to everything before it
    assert not bool(out.loc[2, "keep"])


# ------------------------------------------------------------------ BFS


def _bfs_edges():
    import ray.data as rd

    # path 0-1-2-3-4 plus a branch 1-10; node 99 disconnected via 98
    pairs = [(0, 1), (1, 2), (2, 3), (3, 4), (1, 10), (98, 99)]
    return rd.from_arrow(
        pa.table(
            {
                "part_a": pa.array([p[0] for p in pairs], pa.int64()),
                "part_b": pa.array([p[1] for p in pairs], pa.int64()),
            }
        )
    )


def test_bfs_hops_driver_and_distributed_agree():
    from deepie_ray.ops import graph

    want = {0: 0, 1: 1, 2: 2, 10: 2, 3: 3}  # depth 3 from node 0
    for force in (False, True):
        out = (
            graph.bfs_hops(_bfs_edges(), source=0, max_depth=3,
                           force_distributed=force)
            .to_pandas()
            .set_index("node")["dist"]
            .to_dict()
        )
        assert out == want, f"force_distributed={force}: {out}"


def test_bfs_hops_depth_bound_and_unreachable():
    from deepie_ray.ops import graph

    out = (
        graph.bfs_hops(_bfs_edges(), source=0, max_depth=1)
        .to_pandas()
        .set_index("node")["dist"]
        .to_dict()
    )
    assert out == {0: 0, 1: 1}
    # 99 is never reachable from 0 at any depth here
    deep = graph.bfs_hops(_bfs_edges(), source=0, max_depth=10).to_pandas()
    assert 99 not in set(deep["node"])


def test_doc_topic_clusters_deterministic(tmp_path):
    import pyarrow.parquet as pq

    from deepie_ray import queries as Q

    # tiny two-topic corpus: token overlap inside a topic, none across
    rows = []
    for i in range(12):
        rows.append((i, "alpha beta gamma alpha beta " + f"x{i}"))
    for i in range(12, 24):
        rows.append((i, "delta epsilon zeta delta epsilon " + f"y{i}"))
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    a = (
        Q.doc_topic_clusters(str(tmp_path))
        .to_pandas()
        .sort_values("cluster")
        .reset_index(drop=True)
    )
    b = (
        Q.doc_topic_clusters(str(tmp_path))
        .to_pandas()
        .sort_values("cluster")
        .reset_index(drop=True)
    )
    # deterministic end-to-end (content-addressed init, fixed iters)
    assert a.equals(b)
    assert int(a["n_docs"].sum()) == 24
    # the two planted topics never share a cluster: the largest two
    # clusters together hold all docs only if each topic is pure
    assert a["n_docs"].max() <= 12


# ----------------------------------------------- integer iterative ops


def _toy_sym_edges(weighted: bool = False) -> rd.Dataset:
    # two triangles bridged by one edge + a pendant: k=2 peels the
    # pendant, distances differ per branch
    a = [1, 1, 2, 4, 4, 5, 3, 6]
    b = [2, 3, 3, 5, 6, 6, 4, 7]
    t = {"part_a": a, "part_b": b}
    if weighted:
        t["w"] = [2, 7, 3, 1, 9, 4, 5, 11]
    return graph.symmetrize_edges(
        rd.from_arrow(pa.table(t)), weight_col="w" if weighted else None
    )


def test_pagerank_int_local_and_distributed_paths_identical():
    local = (
        graph.pagerank_int(_toy_sym_edges(), iters=3)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    dist = (
        graph.pagerank_int(_toy_sym_edges(), iters=3, force_distributed=True)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(local, dist)
    # exact-integer twin of the SQL oracle on the same toy graph
    assert local["rank_units"].dtype == np.int64
    unit, base = 10**9, (15 * 10**9) // 100
    src = np.array([1, 1, 2, 4, 4, 5, 3, 6] + [2, 3, 3, 5, 6, 6, 4, 7])
    dst = np.array([2, 3, 3, 5, 6, 6, 4, 7] + [1, 1, 2, 4, 4, 5, 3, 6])
    nodes = np.unique(np.concatenate([src, dst]))
    si, di = np.searchsorted(nodes, src), np.searchsorted(nodes, dst)
    deg = np.bincount(si)
    pr = np.full(len(nodes), unit, np.int64)
    for _ in range(3):
        acc = np.zeros(len(nodes), np.int64)
        np.add.at(acc, di, pr[si] // deg[si])
        pr = base + (85 * acc) // 100
    assert local["rank_units"].to_numpy().tolist() == pr.tolist()


def test_bellman_ford_int_paths_identical_and_bsp_depth():
    local = (
        graph.bellman_ford_int(_toy_sym_edges(weighted=True), source=1, iters=2)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    dist = (
        graph.bellman_ford_int(
            _toy_sym_edges(weighted=True), source=1, iters=2, force_distributed=True
        )
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(local, dist)
    # depth bound: node 7 is 4 hops out, absent at iters=2
    assert 7 not in set(local["node"])
    # hand-checked 2-round relaxation from node 1
    got = dict(zip(local["node"], local["dist"]))
    assert got[1] == 0 and got[2] == 2 and got[3] == 5
    # BSP: round 2 relaxes 4 from round 1's dist[3]=7 (direct 1->3),
    # giving 7+5=12; the tighter 5+5=10 via the round-2 dist[3]=5
    # needs a third round — the depth-bounded contract, pinned here
    assert got[4] == 12


def test_kcore_paths_identical_and_peels_pendant():
    local = (
        graph.kcore(_toy_sym_edges(), k=2)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    dist = (
        graph.kcore(_toy_sym_edges(), k=2, force_distributed=True)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(local, dist)
    # pendant 7 peels; the peel CASCADES: 6 loses the 6-7 edge but
    # keeps degree 2 via the triangle, so the two triangles + bridge
    # survive as the 2-core
    assert set(local["node"]) == {1, 2, 3, 4, 5, 6}
    assert local["deg"].min() >= 2


def test_kcore_empty_core():
    # a path graph has no 2-core: everything peels, both paths agree
    ed = graph.symmetrize_edges(
        rd.from_arrow(pa.table({"part_a": [1, 2, 3], "part_b": [2, 3, 4]}))
    )
    out = graph.kcore(ed, k=2).to_pandas()
    assert len(out) == 0
    ed2 = graph.symmetrize_edges(
        rd.from_arrow(pa.table({"part_a": [1, 2, 3], "part_b": [2, 3, 4]}))
    )
    out2 = graph.kcore(ed2, k=2, force_distributed=True).to_pandas()
    assert len(out2) == 0


def test_clustering_coefficients_vs_bruteforce():
    from deepie_ray.ops import graph

    rng = np.random.default_rng(23)
    n = 40
    pairs = set()
    for _ in range(200):
        a, b = rng.integers(0, n, 2)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    ed = sorted(pairs)
    t = pa.table(
        {
            "part_a": pa.array([a for a, _ in ed], pa.int64()),
            "part_b": pa.array([b for _, b in ed], pa.int64()),
        }
    )
    out = (
        graph.clustering_coefficients(
            rd.from_arrow(t).repartition(4), num_partitions=4
        )
        .to_pandas()
        .set_index("node")
    )
    A = np.zeros((n, n), dtype=bool)
    for a, b in ed:
        A[a, b] = A[b, a] = True
    tri = {}
    for a in range(n):
        for b in range(a + 1, n):
            if not A[a, b]:
                continue
            for c in range(b + 1, n):
                if A[b, c] and A[a, c]:
                    for v in (a, b, c):
                        tri[v] = tri.get(v, 0) + 1
    deg = A.sum(1)
    for v in range(n):
        if deg[v] == 0:
            assert v not in out.index
            continue
        row = out.loc[v]
        exp_tri = tri.get(v, 0)
        exp_coeff = (
            (2_000_000 * exp_tri) // (deg[v] * (deg[v] - 1))
            if deg[v] >= 2
            else 0
        )
        assert row["degree"] == deg[v]
        assert row["n_triangles"] == exp_tri
        assert row["coeff_ppm"] == exp_coeff


def test_clustering_coefficients_triangle_free():
    from deepie_ray.ops import graph

    # path graph 1-2-3: every node present, all zero triangles
    t = pa.table(
        {
            "part_a": pa.array([1, 2], pa.int64()),
            "part_b": pa.array([2, 3], pa.int64()),
        }
    )
    out = (
        graph.clustering_coefficients(rd.from_arrow(t))
        .to_pandas()
        .set_index("node")
        .sort_index()
    )
    assert list(out.index) == [1, 2, 3]
    assert out["n_triangles"].tolist() == [0, 0, 0]
    assert out["coeff_ppm"].tolist() == [0, 0, 0]
    assert out["degree"].tolist() == [1, 2, 1]


def test_clustering_coefficients_empty():
    from deepie_ray.ops import graph

    t = pa.table(
        {
            "part_a": pa.array([], pa.int64()),
            "part_b": pa.array([], pa.int64()),
        }
    )
    assert graph.clustering_coefficients(rd.from_arrow(t)).count() == 0


# ------------------------------------------------- declarative TPC-H KG


def test_tpch_kg_edges_duckdb_parity(sf_dir):
    import duckdb

    from deepie_ray import queries as Q

    got = (
        Q.tpch_kg_edges(sf_dir)
        .to_pandas()
        .sort_values(["subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    for t in ("customer", "supplier", "nation", "orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    want = (
        con.execute(
            """
            SELECT 'customer:' || c_custkey AS subj, 'located_in' AS pred,
                   'nation:' || c_nationkey AS obj FROM customer
            UNION ALL
            SELECT 'supplier:' || s_suppkey, 'located_in',
                   'nation:' || s_nationkey FROM supplier
            UNION ALL
            SELECT 'nation:' || n_nationkey, 'part_of',
                   'region:' || n_regionkey FROM nation
            UNION ALL
            SELECT 'order:' || o_orderkey, 'placed_by',
                   'customer:' || o_custkey FROM orders
            UNION ALL
            SELECT DISTINCT 'order:' || l_orderkey, 'contains',
                   'part:' || l_partkey FROM lineitem
            UNION ALL
            SELECT DISTINCT 'part:' || l_partkey, 'supplied_by',
                   'supplier:' || l_suppkey FROM lineitem
            ORDER BY 1, 2, 3
            """
        )
        .df()
        .reset_index(drop=True)
    )
    want.columns = ["subj", "pred", "obj"]
    pd.testing.assert_frame_equal(got, want)


def test_kg_metapath_pairs_schema_correct(sf_dir):
    # the TPC-H schema admits exactly these 4 composable relation
    # pairs; counts are oracle-checked by the harness, the PAIR SET is
    # the structural invariant pinned here
    from deepie_ray import queries as Q

    df = Q.kg_metapath_counts(sf_dir).to_pandas()
    got = set(zip(df["pred_1"], df["pred_2"]))
    assert got == {
        ("located_in", "part_of"),
        ("placed_by", "located_in"),
        ("contains", "supplied_by"),
        ("supplied_by", "located_in"),
    }
    assert (df["n_paths"] > 0).all()


# --------------------------------------------------- label propagation


def _lpa_numpy(ed, rounds):
    nodes = sorted({a for a, _ in ed} | {b for _, b in ed})
    nbrs = {v: [] for v in nodes}
    for a, b in ed:
        nbrs[a].append(b)
        nbrs[b].append(a)
    lab = {v: v for v in nodes}
    for _ in range(rounds):
        new = {}
        for v in nodes:
            cnt = {}
            for u in nbrs[v]:
                cnt[lab[u]] = cnt.get(lab[u], 0) + 1
            new[v] = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        lab = new
    return lab


def test_label_propagation_vs_bruteforce():
    from deepie_ray.ops import graph

    rng = np.random.default_rng(7)
    ed = set()
    for lo in (0, 20):  # two dense clusters
        for _ in range(60):
            a, b = rng.integers(lo, lo + 20, 2)
            if a != b:
                ed.add((min(a, b), max(a, b)))
    ed.add((5, 25))  # one bridge
    ed = sorted(ed)
    t = pa.table(
        {
            "part_a": pa.array([a for a, _ in ed], pa.int64()),
            "part_b": pa.array([b for _, b in ed], pa.int64()),
        }
    )
    out = graph.label_propagation(
        rd.from_arrow(t).repartition(4), rounds=3
    ).to_pandas()
    got = dict(zip(out["node"], out["community"]))
    assert got == _lpa_numpy(ed, 3)
    # the two planted clusters end up in distinct communities
    assert len(set(got.values())) >= 2


def test_label_propagation_partitioning_independent():
    from deepie_ray.ops import graph

    ed = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    t = pa.table(
        {
            "part_a": pa.array([a for a, _ in ed], pa.int64()),
            "part_b": pa.array([b for _, b in ed], pa.int64()),
        }
    )
    outs = []
    for parts in (1, 4):
        out = graph.label_propagation(
            rd.from_arrow(t).repartition(parts), rounds=3
        ).to_pandas()
        outs.append(dict(zip(out["node"], out["community"])))
    assert outs[0] == outs[1] == _lpa_numpy(ed, 3)


def test_label_propagation_empty():
    from deepie_ray.ops import graph

    t = pa.table(
        {
            "part_a": pa.array([], pa.int64()),
            "part_b": pa.array([], pa.int64()),
        }
    )
    assert graph.label_propagation(rd.from_arrow(t)).count() == 0


# ------------------------------------------------------------------ DBSCAN


def _dbscan_numpy(V, eps_cos, min_pts):
    """Reference DBSCAN with the repo's deterministic rules: cluster =
    min reachable core id, border -> min core-neighbor cluster,
    noise = -1."""
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = Vn @ Vn.T
    n = len(V)
    nbrs = [
        {j for j in range(n) if j != i and S[i, j] >= eps_cos}
        for i in range(n)
    ]
    core = {i for i in range(n) if len(nbrs[i]) >= min_pts}
    # components over core-core edges (+ singleton cores)
    cluster = {}
    for c in sorted(core):
        if c in cluster:
            continue
        stack, comp = [c], set()
        while stack:
            u = stack.pop()
            if u in comp:
                continue
            comp.add(u)
            stack.extend(v for v in nbrs[u] if v in core and v not in comp)
        lab = min(comp)
        for u in comp:
            cluster[u] = lab
    out = {}
    for i in range(n):
        if i in core:
            out[i] = (cluster[i], 1)
        else:
            cn = [cluster[j] for j in nbrs[i] if j in core]
            out[i] = (min(cn) if cn else -1, 0)
    return out


def test_embedding_dbscan_vs_numpy():
    from deepie_ray.ops import cluster

    rng = np.random.default_rng(9)
    # two tight blobs + scattered noise
    blob1 = rng.normal([5, 0, 0, 0], 0.1, size=(6, 4))
    blob2 = rng.normal([0, 5, 0, 0], 0.1, size=(5, 4))
    noise = rng.normal(0, 1, size=(6, 4))
    V = np.vstack([blob1, blob2, noise])
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(len(V)), pa.int64()),
            "embedding": pa.array(
                [list(map(float, r)) for r in V], pa.list_(pa.float32())
            ),
        }
    )
    got = (
        cluster.embedding_dbscan(
            rd.from_arrow(t).repartition(3), eps_cos=0.9, min_pts=2
        )
        .to_pandas()
        .set_index("vec_id")
        .sort_index()
    )
    V32 = np.array([np.asarray(r, np.float32) for r in V]).astype(np.float64)
    want = _dbscan_numpy(V32, 0.9, 2)
    assert len(got) == len(V)
    for i in range(len(V)):
        assert got.loc[i, "cluster"] == want[i][0], (i, dict(got.loc[i]), want[i])
        assert got.loc[i, "is_core"] == want[i][1], i
    # both blobs formed clusters
    assert got.loc[0, "cluster"] == 0 and got.loc[6, "cluster"] == 6


def test_embedding_dbscan_all_noise_and_empty():
    from deepie_ray.ops import cluster

    rng = np.random.default_rng(2)
    V = np.eye(4) * 10  # mutually orthogonal: no neighbors at cos 0.9
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(4), pa.int64()),
            "embedding": pa.array(
                [list(map(float, r)) for r in V], pa.list_(pa.float32())
            ),
        }
    )
    out = (
        cluster.embedding_dbscan(rd.from_arrow(t), eps_cos=0.9, min_pts=2)
        .to_pandas()
    )
    assert (out["cluster"] == -1).all() and (out["is_core"] == 0).all()
    te = pa.table(
        {
            "vec_id": pa.array([], pa.int64()),
            "embedding": pa.array([], pa.list_(pa.float32())),
        }
    )
    assert cluster.embedding_dbscan(rd.from_arrow(te)).count() == 0


def test_copurchase_edge_churn_duckdb_parity(sf_dir):
    import duckdb

    from deepie_ray import queries as Q

    got = (
        Q.copurchase_edge_churn(sf_dir)
        .to_pandas()
        .sort_values("year_a")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'"
    )
    want = (
        con.execute(
            """
            WITH tri AS (
              SELECT DISTINCT year(l_shipdate)::BIGINT AS y,
                     l_orderkey AS o, l_partkey AS p FROM lineitem
            ),
            e AS (
              SELECT DISTINCT a.y, a.p AS pa, b.p AS pb
              FROM tri a JOIN tri b ON a.y = b.y AND a.o = b.o AND a.p < b.p
            ),
            n AS (SELECT y, count(*)::BIGINT AS n FROM e GROUP BY y),
            c AS (SELECT e1.y AS ya, count(*)::BIGINT AS n_common
                  FROM e e1 JOIN e e2
                    ON e2.y = e1.y + 1 AND e2.pa = e1.pa AND e2.pb = e1.pb
                  GROUP BY e1.y)
            SELECT na.y AS year_a, nb.y AS year_b, na.n AS n_a, nb.n AS n_b,
                   coalesce(c.n_common, 0)::BIGINT AS n_common,
                   ((1000000 * coalesce(c.n_common, 0))
                    // (na.n + nb.n - coalesce(c.n_common, 0)))::BIGINT
                     AS jaccard_ppm
            FROM n na JOIN n nb ON nb.y = na.y + 1
            LEFT JOIN c ON c.ya = na.y
            ORDER BY year_a
            """
        )
        .df()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) >= 1


# ------------------------------------------------------------ random walks


def test_random_walks_vs_python_simulation():
    from deepie_ray.hashing import md5_hex
    from deepie_ray.ops import graph

    # small undirected graph: triangle 1-2-3 plus pendant 4-1
    ed = pa.table(
        {
            "part_a": pa.array([1, 1, 2, 1], pa.int64()),
            "part_b": pa.array([2, 3, 3, 4], pa.int64()),
        }
    )
    K = 3
    got = (
        graph.random_walks(rd.from_arrow(ed).repartition(2), k_steps=K)
        .to_pandas()
        .sort_values(["walk_id", "pos"])
        .reset_index(drop=True)
    )
    nbrs = {1: [2, 3, 4], 2: [1, 3], 3: [1, 2], 4: [1]}

    def step(w, s, u):
        return min(
            nbrs[u], key=lambda v: (int(md5_hex(f"{w}:{s}:{v}")[:8], 16), v)
        )

    want = []
    for w in sorted(nbrs):
        u = w
        want.append((w, 0, u))
        for s in range(1, K + 1):
            u = step(w, s, u)
            want.append((w, s, u))
    want_df = pd.DataFrame(want, columns=["walk_id", "pos", "node"])
    pd.testing.assert_frame_equal(got, want_df, check_dtype=False)
    # walks never leave the node set and every step is a real edge
    assert set(got["node"]).issubset(set(nbrs))


def test_random_walks_partitioning_independent_and_empty():
    from deepie_ray.ops import graph

    ed = pa.table(
        {
            "part_a": pa.array([10, 20, 10], pa.int64()),
            "part_b": pa.array([20, 30, 30], pa.int64()),
        }
    )
    a = (
        graph.random_walks(rd.from_arrow(ed), k_steps=2)
        .to_pandas().sort_values(["walk_id", "pos"]).reset_index(drop=True)
    )
    b = (
        graph.random_walks(rd.from_arrow(ed).repartition(3), k_steps=2)
        .to_pandas().sort_values(["walk_id", "pos"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    empty = pa.table(
        {"part_a": pa.array([], pa.int64()), "part_b": pa.array([], pa.int64())}
    )
    assert graph.random_walks(rd.from_arrow(empty)).count() == 0


def test_random_walks_fast_mode_valid_and_partition_independent():
    from deepie_ray.ops import graph

    ed = pa.table(
        {
            "part_a": pa.array([1, 1, 2, 1, 4], pa.int64()),
            "part_b": pa.array([2, 3, 3, 4, 5], pa.int64()),
        }
    )
    nbrs = {1: {2, 3, 4}, 2: {1, 3}, 3: {1, 2}, 4: {1, 5}, 5: {4}}
    a = (
        graph.random_walks(rd.from_arrow(ed), k_steps=3, hash_mode="fast")
        .to_pandas().sort_values(["walk_id", "pos"]).reset_index(drop=True)
    )
    b = (
        graph.random_walks(
            rd.from_arrow(ed).repartition(4), k_steps=3, hash_mode="fast"
        )
        .to_pandas().sort_values(["walk_id", "pos"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    # every step is a real edge, one walk per node, full length
    assert len(a) == len(nbrs) * 4
    for w, grp in a.groupby("walk_id"):
        path = grp.sort_values("pos")["node"].tolist()
        assert path[0] == w
        for u, v in zip(path, path[1:]):
            assert v in nbrs[u], (w, path)


def test_label_propagation_driver_and_distributed_identical():
    """The driver-gated LPA rounds must emit IDENTICAL labels to the
    distributed join rounds (same deterministic packed-argmax rule)."""
    rng = np.random.default_rng(77)
    pairs = set()
    for _ in range(300):
        a, b = rng.integers(0, 60, 2)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    ed = sorted(pairs)
    t = pa.table(
        {
            "part_a": pa.array([a for a, _ in ed], pa.int64()),
            "part_b": pa.array([b for _, b in ed], pa.int64()),
        }
    )
    fast = (
        graph.label_propagation(rd.from_arrow(t).repartition(3), rounds=3)
        .to_pandas()
        .set_index("node")["community"]
        .to_dict()
    )
    slow = (
        graph.label_propagation(
            rd.from_arrow(t).repartition(3), rounds=3, force_distributed=True
        )
        .to_pandas()
        .set_index("node")["community"]
        .to_dict()
    )
    assert fast == slow and len(fast) == 60


def test_pagerank_three_paths_match_numpy():
    """driver / dense / join paths all reproduce the numpy power
    iteration (the driver path is new: whole loop on one edge pull)."""
    rng = np.random.default_rng(13)
    edges = [
        (int(a), int(b))
        for a, b in rng.integers(0, 30, (120, 2))
        if a != b
    ]
    t = pa.table(
        {
            "src": pa.array([a for a, _ in edges], pa.int64()),
            "dst": pa.array([b for _, b in edges], pa.int64()),
        }
    )
    want = _pagerank_numpy(edges, iters=4)
    for kwargs in (
        {},
        {"force_dense": True},
        {"force_join": True},
    ):
        got = (
            graph.pagerank(
                rd.from_arrow(t).repartition(3),
                iters=4,
                num_partitions=2,
                **kwargs,
            )
            .to_pandas()
            .set_index("node")["rank"]
            .to_dict()
        )
        assert set(got) == set(want), kwargs
        for n in want:
            assert got[n] == pytest.approx(want[n], abs=1e-12), (kwargs, n)


def test_label_propagation_huge_sparse_node_ids():
    """Driver-gated LPA must not overflow the argmax packing when node
    ids are large and sparse (ids ~2^45 overflowed the old raw-id
    packing, silently corrupting labels via negative np.maximum.at
    indices).  Packing now uses dense indices, so results must equal
    the distributed path's exactly."""
    base = np.int64(1) << np.int64(45)
    rng = np.random.default_rng(99)
    pairs = set()
    for _ in range(200):
        a, b = rng.integers(0, 50, 2)
        if a != b:
            lo, hi = min(a, b), max(a, b)
            pairs.add((int(base + lo * 977), int(base + hi * 977)))
    ed = sorted(pairs)
    t = pa.table(
        {
            "part_a": pa.array([a for a, _ in ed], pa.int64()),
            "part_b": pa.array([b for _, b in ed], pa.int64()),
        }
    )
    fast = (
        graph.label_propagation(rd.from_arrow(t).repartition(3), rounds=2)
        .to_pandas()
        .set_index("node")["community"]
        .to_dict()
    )
    slow = (
        graph.label_propagation(
            rd.from_arrow(t).repartition(3), rounds=2, force_distributed=True
        )
        .to_pandas()
        .set_index("node")["community"]
        .to_dict()
    )
    assert fast == slow


def test_triangle_counts_low_id_hub_budget_chunking():
    """A star whose center has the LOWEST id gives every (center, leaf)
    edge d_hi(center) wedge candidates — the per-expansion budget must
    chunk this instead of allocating edges x degree at once, and the
    count must still be exact (star + one closing rim edge = 1
    triangle at the center)."""
    k = 3000
    center = np.int64(0)
    leaves = np.arange(1, k + 1, dtype=np.int64)
    t = pa.table(
        {
            "part_a": pa.array(
                np.concatenate([np.full(k, center), np.array([1])]),
                pa.int64(),
            ),
            "part_b": pa.array(
                np.concatenate([leaves, np.array([2])]), pa.int64()
            ),
        }
    )
    out = (
        graph.triangle_counts(rd.from_arrow(t).repartition(2))
        .to_pandas()
        .set_index("node")["n_triangles"]
        .to_dict()
    )
    assert out == {0: 1}

