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
