"""Generate PLAN_AUDIT.md: the shuffle/join census of representative
pipelines, computed from their LAZY logical plans (ops/plan_audit.py)
without executing them.  This is the scale-review checklist as an
artifact: every all-to-all exchange a pipeline performs is visible in
one table, and the pytest budgets (tests/test_plan_audit.py) keep the
numbers from regressing.

Usage: PYTHONPATH=/root/repo python scripts/audit_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

# Lazy plans only — tiny sf dir keeps any driver-side folds cheap.
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

# name -> note on why the count is what it is
PIPELINES = {
    "q1_pricing_summary": "combiner-first partials -> ONE grouped exchange",
    "q3_top_revenue_orders": "2 hash joins + grouped agg + top-k sort of the small agg",
    "q5_region_revenue": "3 hash joins (customer/orders/supplier), nation broadcast",
    "q6_forecast_revenue": "pushdown read + scalar fold: ZERO exchanges",
    "q7_volume_shipping": "2 nation-filtered joins + orders join + grouped agg",
    "q18_large_volume_customers": "grouped agg + HAVING, then 2 joins of the survivor set",
    "word_count_global": "one grouped exchange over per-batch count partials",
    "phrase_search": "embarrassingly parallel: zero exchanges",
    "events_running_max": "one shuffle on user_id (ordered window)",
    "events_tumbling_1h": "window explode + one grouped exchange",
    "doc_ngram_novelty": "Min-ownership: one grouped Min + one hash join back",
    "chunk_dedup_reassembly": "ownership Min + join + per-doc regroup",
    "asof_events_orders": "packed-argmax as-of: one co-partitioning exchange each side",
    "media_meta_scan": "header-only sniff partials -> ONE grouped exchange",
    "image_phash_neardup": "banded Hamming join: bucket groupby + pair-dedup groupby",
    "video_phash_neardup": "frame-level Hamming join (2) + per-video-pair count (1)",
    "events_value_quartile_bins": "edges pre-computed by refine scans; ONE bin-count exchange",
    "ann_topk_sq8": "candidates pre-merged; exact rescore -> ONE top-k groupby",
    "user_longest_streak": "gaps-and-islands: ONE sort on (user, day), numpy within group",
    "documents_global_ordinals": "range shards + offset fold: ZERO exchanges in the returned plan (quartile bounds + shard offsets folded before return; ranks are shard-local)",
    "events_rolling_wau": "distinct user-day exchange + per-day fold exchange (window expand is map-side)",
    "events_value_ewma": "ONE ordered per-user scan (dyadic EWMA is numpy within group)",
    "knn_graph_mutual": "chunk-pair all-pairs top-k: grouped merge + sort + 2 joins (reciprocity)",
    "user_active_coverage": "interval union: ONE sort on user, sweep within group",
    "bloom_join_urgent_lineitems": (
        "Bloom build is a driver OR-fold of per-block bit arrays; probe "
        "pruned map-side BEFORE the single hash join (max_shuffles=0 / "
        "max_joins=1 pinned in test_plan_audit)"
    ),
    "kg_relation_schema": (
        "type map broadcast (vocab-bounded); per-batch signature "
        "pre-aggregation -> driver fold of distinct signatures"
    ),
    "tpch_kg_edges": (
        "FK families are pure projections (zero exchange); the two "
        "lineitem-derived families each dedup combiner-first -> 2 "
        "grouped exchanges total, 0 joins"
    ),
    "kg_metapath_counts": (
        "ONE midpoint self-join + ONE combiner-first (pred_1, pred_2) "
        "count (edge build folded behind its materialize)"
    ),
    "kg_type_constraints": "per-batch signature split + ONE grouped count over the 2-exchange edge build",
    "copurchase_clustering": (
        "returned plan: ONE left-outer join (degrees x per-vertex "
        "triangles) + ONE grouped degree count; under the broadcast "
        "gate the triangle materialize exchanges only per-batch node "
        "partials (no wedge row leaves its task)"
    ),
    "copurchase_communities": (
        "ZERO exchanges in the returned plan — under the driver gate "
        "every LPA round is numpy off one edge pull; above the gate "
        "each round is 1 join + 2 grouped exchanges on the narrow "
        "label table, folded behind its per-round materialize"
    ),
    "orders_ivm_status_counts": (
        "semi-join of exactly the touched keys (1 join + distinct-"
        "build exchange) + ONE grouped fold of view+deltas — base is "
        "never re-aggregated"
    ),
    "user_event_pattern_counts": "ONE part-colocate shuffle; pattern scan vectorized within parts",
    "documents_time_travel": "AS OF reads stream from snapshot parquet: zero exchanges (merge folded at commit time)",
    "hot_parts_cms": (
        "two-pass CMS: pass-1 sketch fold is one salted groupby of "
        "fixed-size rows; returned plan = ONE grouped exact-count "
        "exchange over the sketch-pruned survivors"
    ),
    "doc_packing_global": (
        "distributed prefix sum: quantile bounds + shard totals folded "
        "before return; returned plan = ONE groupby(shard) exchange"
    ),
    "supplier_shipment_overlaps": (
        "grid interval join: ONE (key, cell) hash join over the "
        "exploded cells + ONE combiner-first count; ownership-cell "
        "rule needs no pair-dedup exchange"
    ),
    "embedding_dbscan_clusters": (
        "eps graph / degrees / core filter / CC / border assign are "
        "narrow-key joins and grouped counts behind materialize "
        "boundaries; nothing corpus-sized on the driver"
    ),
    "copurchase_random_walks": (
        "one frontier hash join + ONE grouped Min per step (packed "
        "(hash, nbr) argmin; combiner-first per-batch minima)"
    ),
    "copurchase_edge_churn": (
        "distinct passes are Arrow aggregate(Min), pair explode is "
        "one (year, order) self-join, churn is one composite-key "
        "join; per-year folds are years-bounded"
    ),
}


def main() -> None:
    ray.init(
        address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR"
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd

    from deepie_ray import queries as Q
    from deepie_ray.ops.plan_audit import audit

    lines = [
        "# Plan audit — exchange census of representative pipelines",
        "",
        "Auto-generated by `scripts/audit_plans.py` from the LAZY logical",
        "plans (no execution).  `shuffles` counts all-to-all exchanges",
        "(groupby / sort / shuffle-repartition); `joins` counts hash joins",
        "(each exchanges both sides); block-merge repartitions are free and",
        "not counted.  Pipelines that return a driver-folded DataFrame",
        "show as `(driver fold)`; their exchange structure is stated in",
        "the note.  A `reads` of 0 means the audited plan starts at a",
        "`materialize()` boundary (the auditor's documented blind spot).",
        "Several budgets are pinned as pytest invariants in",
        "`tests/test_plan_audit.py`.",
        "",
        "| pipeline | shuffles | joins | reads | maps | note |",
        "|---|---|---|---|---|---|",
    ]
    for name, note in PIPELINES.items():
        r = getattr(Q, name)(SF)
        if not isinstance(r, rd.Dataset):
            lines.append(
                f"| `{name}` | (driver fold) | — | — | — | {note} |"
            )
            continue
        a = audit(r)
        lines.append(
            f"| `{name}` | {a['shuffles']} | {a['joins']} | {a['reads']} "
            f"| {a['maps']} | {note} |"
        )
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLAN_AUDIT.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(PIPELINES)} pipelines")
    ray.shutdown()


if __name__ == "__main__":
    main()
