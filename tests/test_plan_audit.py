"""Shuffle-budget invariants: each audited pipeline's all-to-all
exchange count is pinned BEFORE execution (ops/plan_audit.py) — a
regression that adds an exchange fails here, not in a 100-TB run."""

import pytest

import ray.data as rd

from deepie_ray import queries as Q
from deepie_ray.ops.plan_audit import assert_shuffle_budget, audit


def test_audit_counts_known_plan_shapes(sf_dir):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "value"])
    a = audit(ds)
    assert a["shuffles"] == 0 and a["reads"] == 1

    from ray.data.aggregate import Sum

    agg = ds.groupby("user_id").aggregate(Sum("value", alias_name="v"))
    assert audit(agg)["shuffles"] == 1

    assert audit(agg.sort("v"))["shuffles"] == 2

    # block-merge repartition is NOT an exchange; shuffle=True is
    assert audit(ds.repartition(4))["shuffles"] == 0
    assert audit(ds.repartition(4))["repartitions_noshuffle"] == 1
    assert audit(ds.repartition(4, shuffle=True))["shuffles"] == 1


def test_q1_single_shuffle_budget(sf_dir):
    # TPC-H Q1: combiner-first partials -> exactly ONE grouped exchange
    assert_shuffle_budget(Q.q1_pricing_summary(sf_dir), max_shuffles=1)


def test_word_count_single_shuffle_budget(sf_dir):
    assert_shuffle_budget(Q.word_count_global(sf_dir), max_shuffles=1)


def test_phrase_search_zero_shuffle_budget(sf_dir):
    # embarrassingly parallel: tokenize + count per batch, no exchange
    assert_shuffle_budget(Q.phrase_search(sf_dir), max_shuffles=0, max_joins=0)


def test_running_max_single_shuffle_budget(sf_dir):
    # one shuffle on user_id (ordered_apply's groupby), nothing else
    assert_shuffle_budget(Q.events_running_max(sf_dir), max_shuffles=1)


def test_q6_zero_shuffle_budget(sf_dir):
    # pure pushdown-read + partial sums: the plan the docstring claims
    import pandas as pd

    # q6 returns a folded DataFrame; audit its streaming portion by
    # rebuilding the read+partial stage the query uses
    from datetime import datetime

    import pyarrow.compute as pc

    lo, hi = datetime(1996, 1, 1), datetime(1997, 1, 1)
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_discount"],
        filter=(pc.field("l_shipdate") >= lo) & (pc.field("l_shipdate") < hi),
    )
    assert_shuffle_budget(li, max_shuffles=0, max_joins=0)
    assert isinstance(Q.q6_forecast_revenue(sf_dir), pd.DataFrame)


def test_media_meta_scan_single_shuffle_budget(sf_dir):
    # header-sniff partials -> exactly one grouped exchange
    assert_shuffle_budget(Q.media_meta_scan(sf_dir), max_shuffles=1, max_joins=0)


def test_image_phash_neardup_shuffle_budget(sf_dir):
    # banded Hamming join: bucket-colocate groupby + pair-dedup groupby
    assert_shuffle_budget(
        Q.image_phash_neardup(sf_dir), max_shuffles=2, max_joins=0
    )


def test_video_phash_neardup_shuffle_budget(sf_dir):
    # frame-level Hamming join (2) + per-video-pair count groupby (1)
    assert_shuffle_budget(
        Q.video_phash_neardup(sf_dir), max_shuffles=3, max_joins=0
    )


def test_quartile_bins_single_shuffle_budget(sf_dir):
    # refine edges run as separate scans BEFORE the returned plan; the
    # binning plan itself is one grouped exchange
    assert_shuffle_budget(
        Q.events_value_quartile_bins(sf_dir), max_shuffles=1, max_joins=0
    )


def test_sq8_single_shuffle_budget(sf_dir):
    # candidate phase pre-merged; the returned exact-rescore plan has
    # one top-k groupby
    assert_shuffle_budget(Q.ann_topk_sq8(sf_dir), max_shuffles=1, max_joins=0)


def test_longest_streak_single_shuffle_budget(sf_dir):
    # gaps-and-islands: one sort on (user, day); islands are numpy
    assert_shuffle_budget(Q.user_longest_streak(sf_dir), max_shuffles=1, max_joins=0)


def test_global_ordinals_zero_exchange_budget(sf_dir):
    # quartile bounds + shard offsets are folded BEFORE the returned
    # plan; the plan itself assigns shard-local ranks map-side only
    assert_shuffle_budget(
        Q.documents_global_ordinals(sf_dir), max_shuffles=0, max_joins=0
    )


def test_rolling_wau_two_exchange_budget(sf_dir):
    # distinct user-day exchange + per-day fold; 7-day expand map-side
    assert_shuffle_budget(Q.events_rolling_wau(sf_dir), max_shuffles=2, max_joins=0)


def test_ewma_single_shuffle_budget(sf_dir):
    assert_shuffle_budget(Q.events_value_ewma(sf_dir), max_shuffles=1, max_joins=0)


def test_knn_mutual_exchange_budget(sf_dir):
    # chunk-pair top-k merge (groupby+sort) + reciprocity via 2 joins
    assert_shuffle_budget(Q.knn_graph_mutual(sf_dir), max_shuffles=2, max_joins=2)


def test_active_coverage_single_shuffle_budget(sf_dir):
    assert_shuffle_budget(Q.user_active_coverage(sf_dir), max_shuffles=1, max_joins=0)


def test_bloom_prefilter_join_exchange_budget(sf_dir):
    # the whole point of the operator: ONE join over the pruned probe,
    # zero other exchanges (the Bloom build folds driver-side partials)
    import pyarrow.compute as pc
    import ray.data as rd

    from deepie_ray.ops.joins import bloom_prefilter_join

    build = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderstatus"],
        filter=(pc.field("o_totalprice") > 400000.0),
    )
    probe = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice"],
    )
    joined = bloom_prefilter_join(
        probe, build, on="l_orderkey", right_on="o_orderkey"
    )
    assert_shuffle_budget(joined, max_shuffles=0, max_joins=1)


def test_tpch_kg_edges_shuffle_budget(sf_dir):
    # FK families are pure projections; only the two lineitem dedups
    # exchange — and never a join
    assert_shuffle_budget(Q.tpch_kg_edges(sf_dir), max_shuffles=2, max_joins=0)


def test_kg_metapath_counts_shuffle_budget(sf_dir):
    # one midpoint self-join + one combiner-first relation-pair count
    assert_shuffle_budget(
        Q.kg_metapath_counts(sf_dir), max_shuffles=1, max_joins=1
    )


def test_communities_returned_plan_folded(sf_dir):
    # every LPA round folds behind its label materialize: the returned
    # plan must stay exchange-free (a regression that leaks an extra
    # live shuffle into the tail fails here)
    assert_shuffle_budget(
        Q.copurchase_communities(sf_dir), max_shuffles=0, max_joins=0
    )


def test_ivm_refresh_shuffle_budget(sf_dir):
    # touched-keys semi-join + one grouped fold of view+deltas; base is
    # never re-aggregated
    assert_shuffle_budget(
        Q.orders_ivm_status_counts(sf_dir), max_shuffles=2, max_joins=1
    )


def test_pattern_counts_single_shuffle_budget(sf_dir):
    assert_shuffle_budget(
        Q.user_event_pattern_counts(sf_dir), max_shuffles=1, max_joins=0
    )


def test_time_travel_reads_zero_shuffle(sf_dir):
    assert_shuffle_budget(
        Q.documents_time_travel(sf_dir), max_shuffles=0, max_joins=0
    )


def test_hot_parts_cms_shuffle_budget(sf_dir):
    # pass-1 sketch fold happens before return; the returned plan is
    # one grouped exact-count exchange over the CMS-pruned survivors
    assert_shuffle_budget(Q.hot_parts_cms(sf_dir), max_shuffles=1, max_joins=0)


def test_doc_packing_global_shuffle_budget(sf_dir):
    # quantile bounds + shard carry-ins fold before return: the
    # returned plan is exactly the one groupby(shard) exchange
    assert_shuffle_budget(
        Q.doc_packing_global(sf_dir), max_shuffles=1, max_joins=0
    )


def test_interval_overlap_shuffle_budget(sf_dir):
    # one (key, cell) hash join + one combiner-first count; the
    # ownership-cell rule must NOT add a pair-dedup exchange
    assert_shuffle_budget(
        Q.supplier_shipment_overlaps(sf_dir), max_shuffles=1, max_joins=1
    )


def test_random_walks_returned_plan_folded(sf_dir):
    # each step folds behind its frontier materialize; the returned
    # union of per-step emissions must stay exchange-free
    assert_shuffle_budget(
        Q.copurchase_random_walks(sf_dir), max_shuffles=0, max_joins=0
    )
