"""Final-session ordered-analytic + mutual-kNN ops: numpy/scalar parity,
bit-exactness, and partitioning independence."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from deepie_ray.ops import analytic, ann


def _events_frame() -> pd.DataFrame:
    rng = np.random.default_rng(11)
    n = 400
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(
                rng.integers(1_600_000_000, 1_600_500_000, n), unit="s"
            ),
            "user_id": rng.integers(0, 12, n).astype(np.int64),
            "event_type": rng.choice(["view", "cart", "purchase", "refund"], n),
            "value": np.round(rng.uniform(0, 500, n), 2),
        }
    )


def test_running_distinct_matches_pandas_reference():
    df = _events_frame()
    got = (
        analytic.running_distinct(
            rd.from_pandas(df).repartition(7),
            "user_id",
            "ts",
            "event_id",
            "event_type",
        )
        .to_pandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )

    ref_rows = []
    for uid, g in df.sort_values(["ts", "event_id"]).groupby("user_id"):
        seen: set = set()
        for _, r in g.iterrows():
            seen.add(r["event_type"])
            ref_rows.append((uid, r["event_id"], len(seen)))
    ref = (
        pd.DataFrame(ref_rows, columns=["user_id", "event_id", "n_seen"])
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    assert got["n_seen"].tolist() == ref["n_seen"].tolist()
    assert got["event_id"].tolist() == ref["event_id"].tolist()


def test_ewma_pow2_bit_equals_scalar_loop():
    df = _events_frame()
    got = (
        analytic.ewma_pow2(
            rd.from_pandas(df).repartition(5),
            "user_id",
            "ts",
            "event_id",
            "value",
            n_terms=8,
        )
        .to_pandas()
        .set_index("event_id")["ewma"]
    )
    for uid, g in df.sort_values(["ts", "event_id"]).groupby("user_id"):
        cents = np.floor(g["value"].to_numpy() * 100.0).astype(np.int64)
        for t in range(len(g)):
            want = 0.0
            for k in range(8):
                if t - k < 0:
                    break
                want += float(cents[t - k]) * (2.0 ** -(k + 1))
            eid = g["event_id"].iloc[t]
            assert got.loc[eid] == want  # bit-exact, not approx


def test_gap_stats_single_and_multi_row_keys():
    df = pd.DataFrame(
        {
            "event_id": np.arange(4, dtype=np.int64),
            "ts": pd.to_datetime([10, 25, 100, 7], unit="s"),
            "user_id": np.array([1, 1, 1, 2], dtype=np.int64),
        }
    )
    got = (
        analytic.gap_stats(rd.from_pandas(df), "user_id", "ts", "event_id")
        .to_pandas()
        .set_index("user_id")
    )
    assert got.loc[1, "n_gaps"] == 2
    assert got.loc[1, "min_gap_us"] == 15_000_000
    assert got.loc[1, "max_gap_us"] == 75_000_000
    assert got.loc[1, "sum_gap_us"] == 90_000_000
    assert got.loc[2, "n_gaps"] == 0
    assert got.loc[2, "min_gap_us"] == -1
    assert got.loc[2, "max_gap_us"] == -1
    assert got.loc[2, "sum_gap_us"] == 0


def _planted_embeddings() -> pa.Table:
    rng = np.random.default_rng(3)
    base = rng.normal(size=(40, 8))
    # plant two tight clusters: ids (0,1) and (2,3) near-identical
    base[1] = base[0] + 1e-4
    base[3] = base[2] + 1e-4
    return pa.table(
        {
            "vec_id": pa.array(np.arange(40, dtype=np.int64)),
            "embedding": pa.array(
                [list(map(float, r)) for r in base],
                pa.list_(pa.float32()),
            ),
        }
    )


def test_knn_mutual_planted_pairs_and_chunk_independence():
    tbl = _planted_embeddings()
    emb = rd.from_arrow(tbl).repartition(6)
    got = {
        (int(a), int(b))
        for a, b in ann.knn_graph_mutual(emb, k=3, chunk_rows=7)
        .to_pandas()[["vec_a", "vec_b"]]
        .itertuples(index=False)
    }
    # planted near-duplicates are each other's top-1 -> mutual edges
    assert (0, 1) in got
    assert (2, 3) in got
    # every edge is reciprocated by construction: verify against a
    # numpy brute-force mutual-kNN reference
    M = np.array([list(r) for r in tbl["embedding"].to_pylist()], dtype=np.float64)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    S = M @ M.T
    np.fill_diagonal(S, -2.0)
    order = np.lexsort((np.arange(S.shape[1])[None, :].repeat(40, 0), -S))
    topk = {(i, int(j)) for i in range(40) for j in order[i, :3]}
    want = {
        (min(a, b), max(a, b))
        for (a, b) in topk
        if (b, a) in topk and a < b
    }
    assert got == want
    # chunk-size independence: a different chunking yields the same graph
    got_big = {
        (int(a), int(b))
        for a, b in ann.knn_graph_mutual(emb, k=3, chunk_rows=1024)
        .to_pandas()[["vec_a", "vec_b"]]
        .itertuples(index=False)
    }
    assert got_big == got


def test_batch3_and_final_ops_empty_tables_no_crash(tmp_path):
    """Empty inputs: every final-session operator returns 0 rows, no
    crash (empty pushdown reads produce schema-less blocks; the
    queries guard with limit(1) probes or typed empties)."""
    import pyarrow.parquet as pq

    from deepie_ray import queries as Q

    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        schema = pq.read_schema(f"/root/testdata/sf0.001/{t}.parquet")
        schema = schema.remove_metadata()
        pq.write_table(schema.empty_table(), str(tmp_path / f"{t}.parquet"))
    d = str(tmp_path)
    for name in (
        "q4_order_priority",
        "q8_market_share",
        "q11_important_brands",
        "q12_late_shipment_priority",
        "q13_customer_distribution",
        "q15_top_supplier",
        "q16_supplier_breadth",
        "q20_part_promotion",
        "q21_waiting_supplier",
        "user_running_distinct_types",
        "events_value_ewma",
        "user_gap_profile",
        "knn_graph_mutual",
        "q2_min_cost_supplier",
        "events_value_quartile_bins",
        "documents_global_ordinals",
        "kg_entity_neighborhood",
    ):
        r = getattr(Q, name)(d)
        n = (
            r.num_rows
            if isinstance(r, pa.Table)
            else (len(r) if isinstance(r, pd.DataFrame) else r.count())
        )
        assert n == 0, name
    # percentiles over an empty table mirror the SQL twin: 4 rows,
    # all-NULL value_cents (quantile_disc of the empty set)
    p = Q.events_value_percentiles_exact(d)
    assert p.num_rows == 4 and p["value_cents"].null_count == 4
    # sweep-line twin is scalar subqueries: always ONE row, NULLs empty
    pk = Q.peak_concurrent_sessions(d)
    assert pk.num_rows == 1 and pk["peak_concurrency"].null_count == 1


def test_global_exclusive_prefix_max_matches_pandas_window():
    rng = np.random.default_rng(23)
    n = 500
    df = pd.DataFrame(
        {
            "ord": rng.permutation(np.arange(n)).astype(np.int64),
            "val": rng.integers(-(10**9), 10**9, n).astype(np.int64),
            "tag": np.arange(n, dtype=np.int64),
        }
    )
    out = (
        analytic.global_exclusive_prefix_max(
            rd.from_pandas(df).repartition(7),
            order_col="ord",
            val_col="val",
            keep_cols=["tag"],
        )
        .to_pandas()
        .sort_values("ord")
        .reset_index(drop=True)
    )
    ref = df.sort_values("ord").reset_index(drop=True)
    exp = ref["val"].cummax().shift(1)
    sent = np.iinfo(np.int64).min
    exp_i = exp.fillna(sent).astype(np.int64)
    assert out["prev_max"].tolist() == exp_i.tolist()
    # keep columns ride through untouched
    assert out["tag"].tolist() == ref["tag"].tolist()


def test_global_exclusive_prefix_max_empty():
    df = pd.DataFrame(
        {
            "ord": pd.Series([], dtype=np.int64),
            "val": pd.Series([], dtype=np.int64),
        }
    )
    out = analytic.global_exclusive_prefix_max(
        rd.from_pandas(df), order_col="ord", val_col="val"
    )
    # Ray's to_pandas() drops the column index of an all-empty dataset,
    # so pin the contract on schema() + count()
    assert out.count() == 0 and "prev_max" in out.schema().names
