"""Driver contract for the Ray-Data-native KG engine (deepie_ray).

The driver initialises Ray BEFORE importing this module; nothing here
(or in deepie_ray) calls ray.init/ray.shutdown.

``queries()`` covers the operator inventory of SURVEY.md §2 plus the
training-data-pipeline operators (dedup family, ANN, text analysis,
windows, as-of join); ``oracle_sql()`` provides DuckDB twins for every
SQL-expressible query.  Non-SQL-expressible ops (the seeded neural KG
pipeline, LSH/SimHash clustering, language-ID heuristic) are
rows-only-checked here and exactly oracle-checked in tests/ against the
in-repo single-threaded oracle (deepie_ray/oracle/kg.py).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from deepie_ray import queries as Q
from deepie_ray.tuning import apply_recommended_context

apply_recommended_context()

_STOP_LIST_SQL = "('the','a','an','of','to','and','in','is','it','for')"


def entry() -> Any:
    """Flagship KG pipeline on sf0.001: emitted triples dataset."""
    from deepie_ray import pipeline

    docs = pipeline.read_documents("/root/testdata/sf0.001")
    return pipeline.emitted_triples(docs)


def queries() -> dict[str, Callable[[str], Any]]:
    # ORDER CONTRACT (round-3 verdict #2): the driver's correctness
    # window covers the FIRST 50 entries of this dict — every entry in
    # that window must have an ``oracle_sql()`` twin.  All SQL-oracle-
    # backed queries are therefore listed FIRST (the window plus the
    # overflow that scripts/check_correctness.py covers), and the
    # rows-only / pytest-oracled pipelines (neural KG, LSH clustering,
    # media, heuristics) come after.  Adding a new query: oracle-backed
    # -> first block; rows-only -> second block.
    return {
        # --- SQL-oracle-backed block (driver window + harness overflow) ---
        # relational (SURVEY §2.4-2.7)
        "q1_pricing_summary": Q.q1_pricing_summary,
        "q3_top_revenue_orders": Q.q3_top_revenue_orders,
        "q5_region_revenue": Q.q5_region_revenue,
        "agg_orders_by_status": Q.agg_orders_by_status,
        "top10_customers_by_spend": Q.top10_customers_by_spend,
        "filter_highvalue_orders": Q.filter_highvalue_orders,
        "part_brand_stats": Q.part_brand_stats,
        "distinct_mktsegments": Q.distinct_mktsegments,
        "supplier_nation_balance": Q.supplier_nation_balance,
        "customers_with_big_orders": Q.customers_with_big_orders,
        "customers_without_big_orders": Q.customers_without_big_orders,
        "orders_rollup": Q.orders_rollup,
        "orders_price_ranked": Q.orders_price_ranked,
        "customer_big_order_coverage": Q.customer_big_order_coverage,
        "events_customer_enriched": Q.events_customer_enriched,
        # events / windows / as-of
        "events_tumbling_1h": Q.events_tumbling_1h,
        "events_sliding_1h_30m": Q.events_sliding_1h_30m,
        "events_sessions": Q.events_sessions,
        "events_topk_users": Q.events_topk_users,
        "events_distinct_users": Q.events_distinct_users,
        "events_approx_distinct_users": Q.events_approx_distinct_users,
        "events_median_value": Q.events_median_value,
        "events_p95_value": Q.events_p95_value,
        "events_running_user_totals": Q.events_running_user_totals,
        "events_moving_sum": Q.events_moving_sum,
        "events_value_histogram": Q.events_value_histogram,
        "events_value_quartiles": Q.events_value_quartiles,
        "user_event_type_pivot": Q.user_event_type_pivot,
        "asof_events_orders": Q.asof_events_orders,
        "range_events_burst": Q.range_events_burst,
        "top3_orders_per_customer": Q.top3_orders_per_customer,
        "event_type_transitions": Q.event_type_transitions,
        "user_funnel": Q.user_funnel,
        "latest_event_per_user": Q.latest_event_per_user,
        "export_events_partitioned": Q.export_events_partitioned,
        # text analysis
        "text_token_counts": Q.text_token_counts,
        "text_quality": Q.text_quality,
        "text_normalized": Q.text_normalized,
        "doc_fingerprints": Q.doc_fingerprints,
        "doc_chunks": Q.doc_chunks,
        "tfidf_top_terms": Q.tfidf_top_terms,
        "pii_scan": Q.pii_scan,
        "length_filter_quantile": Q.length_filter_quantile,
        "word_count_global": Q.word_count_global,
        "word_topk_approx": Q.word_topk_approx,
        "top_terms_per_lang": Q.top_terms_per_lang,
        "unigram_rarity_scores": Q.unigram_rarity_scores,
        "inverted_index": Q.inverted_index,
        "docs_by_lang": Q.docs_by_lang,
        "dedup_exact_documents": Q.dedup_exact_documents,
        # --- end of the 50-entry driver window; oracle-backed overflow ---
        "train_val_test_split": Q.train_val_test_split,
        "llm_corpus_prep": Q.llm_corpus_prep,
        "mix_sources": Q.mix_sources,
        "shuffle_shards_docs": Q.shuffle_shards_docs,
        "export_jsonl_roundtrip": Q.export_jsonl_roundtrip,
        "sample_per_source": Q.sample_per_source,
        "ngram_jaccard_exact": Q.ngram_jaccard_exact,
        "ngram_jaccard_prefix": Q.ngram_jaccard_prefix,
        "contamination_ngram": Q.contamination_ngram,
        "repeated_ngrams": Q.repeated_ngrams,
        "duplicate_spans": Q.duplicate_spans,
        "embedding_neardup": Q.embedding_neardup,
        "ann_topk": Q.ann_topk,
        "copurchase_edges": Q.copurchase_edges,
        "copurchase_triangles": Q.copurchase_triangles,
        "copurchase_degree_distribution": Q.copurchase_degree_distribution,
        "copurchase_assoc": Q.copurchase_assoc,
        "embedding_centroids": Q.embedding_centroids,
        # round-4 coverage extensions (all oracle-backed)
        "orders_cube": Q.orders_cube,
        "orders_grouping_sets": Q.orders_grouping_sets,
        "events_value_stats": Q.events_value_stats,
        "revenue_by_nation_year": Q.revenue_by_nation_year,
        "users_view_and_purchase": Q.users_view_and_purchase,
        "orders_date_dense_rank": Q.orders_date_dense_rank,
        "orders_above_customer_avg": Q.orders_above_customer_avg,
        "part_name_first_word_stats": Q.part_name_first_word_stats,
        "events_first_last_value": Q.events_first_last_value,
        "events_p50_disc": Q.events_p50_disc,
        "text_bpe_token_counts": Q.text_bpe_token_counts,
        "term_cooccurrence": Q.term_cooccurrence,
        "jaccard_dup_components": Q.jaccard_dup_components,
        "supplier_name_neardup": Q.supplier_name_neardup,
        "events_value_corr": Q.events_value_corr,
        "customer_priority_mode": Q.customer_priority_mode,
        "nation_top_suppliers": Q.nation_top_suppliers,
        "user_days_view_not_purchase": Q.user_days_view_not_purchase,
        "events_p50_cont": Q.events_p50_cont,
        "events_value_percentiles_exact": Q.events_value_percentiles_exact,
        "events_value_quartile_bins": Q.events_value_quartile_bins,
        "documents_global_ordinals": Q.documents_global_ordinals,
        "user_longest_streak": Q.user_longest_streak,
        "peak_concurrent_sessions": Q.peak_concurrent_sessions,
        "event_props_k_stats": Q.event_props_k_stats,
        "window_top_event_types": Q.window_top_event_types,
        "window_distinct_users": Q.window_distinct_users,
        "user_top_event": Q.user_top_event,
        "doc_feature_hashing": Q.doc_feature_hashing,
        "incremental_ingest_documents": Q.incremental_ingest_documents,
        "doc_unigram_nll": Q.doc_unigram_nll,
        "doc_line_repetition": Q.doc_line_repetition,
        "doc_top_bigram": Q.doc_top_bigram,
        "neardup_keep_best": Q.neardup_keep_best,
        "containment_pairs": Q.containment_pairs,
        "doc_bigram_nll": Q.doc_bigram_nll,
        "ann_topk_filtered": Q.ann_topk_filtered,
        "doc_oov_rate": Q.doc_oov_rate,
        "dsir_importance_weights": Q.dsir_importance_weights,
        "boilerplate_ngram_removal": Q.boilerplate_ngram_removal,
        "term_pmi": Q.term_pmi,
        "supplier_entity_resolution": Q.supplier_entity_resolution,
        "events_time_range_sum": Q.events_time_range_sum,
        "user_state_islands": Q.user_state_islands,
        "events_value_mad": Q.events_value_mad,
        "orders_zorder_layout": Q.orders_zorder_layout,
        "user_retention_cohorts": Q.user_retention_cohorts,
        "doc_intra_repetition": Q.doc_intra_repetition,
        "compact_events_export": Q.compact_events_export,
        "events_pruned_scan": Q.events_pruned_scan,
        "export_csv_roundtrip": Q.export_csv_roundtrip,
        "vocab_zipf_head": Q.vocab_zipf_head,
        "events_rolling_wau": Q.events_rolling_wau,
        "event_type_audience_overlap": Q.event_type_audience_overlap,
        "orders_merge_changelog": Q.orders_merge_changelog,
        "validate_orders": Q.validate_orders,
        "events_robust_outliers": Q.events_robust_outliers,
        "bucketed_join_orders_customer": Q.bucketed_join_orders_customer,
        "bloom_join_urgent_lineitems": Q.bloom_join_urgent_lineitems,
        "user_event_type_unpivot": Q.user_event_type_unpivot,
        "embedding_covariance": Q.embedding_covariance,
        "copurchase_link_scores": Q.copurchase_link_scores,
        "documents_version_diff": Q.documents_version_diff,
        "export_jsonl_gz_roundtrip": Q.export_jsonl_gz_roundtrip,
        "quality_gate_composite": Q.quality_gate_composite,
        "weighted_sample_docs": Q.weighted_sample_docs,
        "orders_equidepth_histogram": Q.orders_equidepth_histogram,
        "doc_search_and": Q.doc_search_and,
        "cross_source_dup_matrix": Q.cross_source_dup_matrix,
        "copurchase_bfs_hops": Q.copurchase_bfs_hops,
        "customer_supplier_linkage": Q.customer_supplier_linkage,
        "source_mixture_stats": Q.source_mixture_stats,
        "events_quantile_bands": Q.events_quantile_bands,
        "asof_events_next_order": Q.asof_events_next_order,
        "q10_returned_items": Q.q10_returned_items,
        "user_event_sequences": Q.user_event_sequences,
        "part_skyline": Q.part_skyline,
        "copurchase_components": Q.copurchase_components,
        "user_event_mode": Q.user_event_mode,
        "events_daily_gap_fill": Q.events_daily_gap_fill,
        "orders_profile": Q.orders_profile,
        "documents_checksum": Q.documents_checksum,
        "monthly_revenue_growth": Q.monthly_revenue_growth,
        "lineitem_order_share": Q.lineitem_order_share,
        "user_event_type_sets": Q.user_event_type_sets,
        "session_day_overlap": Q.session_day_overlap,
        "fk_orphan_scan": Q.fk_orphan_scan,
        "join_cardinality_estimate": Q.join_cardinality_estimate,
        "events_debounce": Q.events_debounce,
        "export_vacuum_orphans": Q.export_vacuum_orphans,
        "orderkey_gaps": Q.orderkey_gaps,
        "doc_token_positions": Q.doc_token_positions,
        "events_value_trend": Q.events_value_trend,
        "bm25_search": Q.bm25_search,
        "hybrid_search_rrf": Q.hybrid_search_rrf,
        "purchase_state_pit": Q.purchase_state_pit,
        "retrieval_metrics_cosine": Q.retrieval_metrics_cosine,
        "q6_forecast_revenue": Q.q6_forecast_revenue,
        "q7_volume_shipping": Q.q7_volume_shipping,
        "q9_product_type_profit": Q.q9_product_type_profit,
        "q14_promo_revenue": Q.q14_promo_revenue,
        "q17_small_quantity_revenue": Q.q17_small_quantity_revenue,
        "q18_large_volume_customers": Q.q18_large_volume_customers,
        "q19_disjunctive_revenue": Q.q19_disjunctive_revenue,
        "q22_sales_opportunity": Q.q22_sales_opportunity,
        "events_running_max": Q.events_running_max,
        "user_event_entropy": Q.user_event_entropy,
        "source_unigram_kl": Q.source_unigram_kl,
        "phrase_search": Q.phrase_search,
        "events_value_winsorized": Q.events_value_winsorized,
        "export_arrow_ipc_roundtrip": Q.export_arrow_ipc_roundtrip,
        "vocab_coverage_curve": Q.vocab_coverage_curve,
        "events_type_day_chi2": Q.events_type_day_chi2,
        "copurchase_degree_assortativity": Q.copurchase_degree_assortativity,
        "customer_balance_gini": Q.customer_balance_gini,
        "orders_top_prices_with_ties": Q.orders_top_prices_with_ties,
        "chunk_dedup_reassembly": Q.chunk_dedup_reassembly,
        "user_value_twap": Q.user_value_twap,
        "events_hourly_profile": Q.events_hourly_profile,
        "doc_ngram_novelty": Q.doc_ngram_novelty,
        "q4_order_priority": Q.q4_order_priority,
        "q8_market_share": Q.q8_market_share,
        "q11_important_brands": Q.q11_important_brands,
        "q12_late_shipment_priority": Q.q12_late_shipment_priority,
        "q13_customer_distribution": Q.q13_customer_distribution,
        "q15_top_supplier": Q.q15_top_supplier,
        "q16_supplier_breadth": Q.q16_supplier_breadth,
        "q20_part_promotion": Q.q20_part_promotion,
        "q21_waiting_supplier": Q.q21_waiting_supplier,
        "user_running_distinct_types": Q.user_running_distinct_types,
        "events_value_ewma": Q.events_value_ewma,
        "user_gap_profile": Q.user_gap_profile,
        "knn_graph_mutual": Q.knn_graph_mutual,
        "copurchase_pagerank": Q.copurchase_pagerank,
        "copurchase_shortest_paths": Q.copurchase_shortest_paths,
        "copurchase_kcore": Q.copurchase_kcore,
        "event_value_bootstrap": Q.event_value_bootstrap,
        "user_active_coverage": Q.user_active_coverage,
        "embedding_vq_counts": Q.embedding_vq_counts,
        "resolution_pairwise_eval": Q.resolution_pairwise_eval,
        "q2_min_cost_supplier": Q.q2_min_cost_supplier,
        "events_late_arrivals": Q.events_late_arrivals,
        "tpch_kg_edges": Q.tpch_kg_edges,
        "kg_metapath_counts": Q.kg_metapath_counts,
        "kg_type_constraints": Q.kg_type_constraints,
        "copurchase_clustering": Q.copurchase_clustering,
        "copurchase_communities": Q.copurchase_communities,
        "documents_time_travel": Q.documents_time_travel,
        "user_event_pattern_counts": Q.user_event_pattern_counts,
        "orders_ivm_status_counts": Q.orders_ivm_status_counts,
        "coverage_pick_docs": Q.coverage_pick_docs,
        "knn_label_eval": Q.knn_label_eval,
        "embedding_dbscan_clusters": Q.embedding_dbscan_clusters,
        "copurchase_edge_churn": Q.copurchase_edge_churn,
        "hot_parts_cms": Q.hot_parts_cms,
        "copurchase_random_walks": Q.copurchase_random_walks,
        "doc_packing_global": Q.doc_packing_global,
        "supplier_shipment_overlaps": Q.supplier_shipment_overlaps,
        "export_orc_roundtrip": Q.export_orc_roundtrip,
        "corpus_health_report": Q.corpus_health_report,
        # --- rows-only / pytest-oracled block (no SQL twin by nature) ---
        "interleaved_pack": Q.interleaved_pack,
        "doc_compression_ratio": Q.doc_compression_ratio,
        "export_tar_shards_roundtrip": Q.export_tar_shards_roundtrip,
        "doc_packing": Q.doc_packing,
        "doc_topic_clusters": Q.doc_topic_clusters,
        "events_distinct_users_hll": Q.events_distinct_users_hll,
        "ann_recall_report": Q.ann_recall_report,
        "minhash_recall_report": Q.minhash_recall_report,
        "incremental_neardup_ingest": Q.incremental_neardup_ingest,
        "kg_incremental": Q.kg_incremental,
        "bpe_train_merges": Q.bpe_train_merges,
        "doc_bpe_lengths": Q.doc_bpe_lengths,
        "quality_classifier_scores": Q.quality_classifier_scores,
        "embedding_random_projection": Q.embedding_random_projection,
        "embedding_pca_projection": Q.embedding_pca_projection,
        "lang_id": Q.lang_id,
        "minhash_dedup_documents": Q.minhash_dedup_documents,
        "simhash_signatures": Q.simhash_signatures,
        "simhash_neardup": Q.simhash_neardup,
        "ann_topk_lsh": Q.ann_topk_lsh,
        "ann_topk_ivf": Q.ann_topk_ivf,
        "ann_topk_pq": Q.ann_topk_pq,
        "ann_topk_hnsw": Q.ann_topk_hnsw,
        "ann_topk_hnsw_ivf": Q.ann_topk_hnsw_ivf,
        "ann_topk_ivf_pq": Q.ann_topk_ivf_pq,
        "ngram_jaccard_pairs": Q.ngram_jaccard_pairs,
        "contamination_bloom": Q.contamination_bloom,
        "duplicate_spans_winnowed": Q.duplicate_spans_winnowed,
        # reference-shaped ACE workflow (S1+A5+M12+T3+A6)
        "ace_relation_extraction": Q.ace_relation_extraction,
        # reference train loop (T16 adadelta + A7 best-epoch), data-parallel
        "ace_train_multinn": Q.ace_train_multinn,
        "ace_train_eval": Q.ace_train_eval,
        # flagship KG pipeline
        "kg_triples": Q.kg_triples,
        "kg_triples_gru": Q.kg_triples_gru,
        "kg_triples_hybrid": Q.kg_triples_hybrid,
        "kg_triples_hybrid_kernel": Q.kg_triples_hybrid_kernel,
        "kg_triples_dep": Q.kg_triples_dep,
        "kg_triples_ensemble": Q.kg_triples_ensemble,
        "kg_triples_att": Q.kg_triples_att,
        "kg_triples_ffrnn": Q.kg_triples_ffrnn,
        "kg_triples_altconv": Q.kg_triples_altconv,
        "kg_triples_dep_cnn": Q.kg_triples_dep_cnn,
        "kg_linked": Q.kg_linked,
        "kg_nodes": Q.kg_nodes,
        "kg_edges": Q.kg_edges,
        "media_span_stats": Q.media_span_stats,
        "media_features": Q.media_features,
        "media_decode_features": Q.media_decode_features,
        "audio_spectral_features": Q.audio_spectral_features,
        "ann_topk_mmr": Q.ann_topk_mmr,
        "media_meta_scan": Q.media_meta_scan,
        "image_phash_neardup": Q.image_phash_neardup,
        "audio_fp_neardup": Q.audio_fp_neardup,
        "video_phash_neardup": Q.video_phash_neardup,
        "ann_topk_sq8": Q.ann_topk_sq8,
        "kg_entity_neighborhood": Q.kg_entity_neighborhood,
        "kg_transe_link_prediction": Q.kg_transe_link_prediction,
        "kg_distmult_link_prediction": Q.kg_distmult_link_prediction,
        "kg_complex_link_prediction": Q.kg_complex_link_prediction,
        "kg_rotate_link_prediction": Q.kg_rotate_link_prediction,
        "kg_relation_schema": Q.kg_relation_schema,
        "kg_link_prediction_eval": Q.kg_link_prediction_eval,
        "graph_pagerank": Q.graph_pagerank,
        "embedding_kmeans": Q.embedding_kmeans,
        "semantic_dedup_embeddings": Q.semantic_dedup_embeddings,
    }


# Shared CTE prelude for the co-purchase-graph oracles: the support>=2
# undirected edge list, symmetrized (both orientations).
# MATERIALIZED: DuckDB inlines plain CTEs per reference, so the unrolled
# iteration chains below would re-expand their predecessors multiplicatively
# (3^rounds for the k-core peel) without it.
_COPURCHASE_ED = """
    p AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS MATERIALIZED (
          SELECT a.l_partkey AS a, b.l_partkey AS b, count(*)::BIGINT AS c
          FROM p a JOIN p b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2 HAVING count(*) >= 2),
    ed AS MATERIALIZED (
          SELECT a AS src, b AS dst FROM e UNION ALL SELECT b, a FROM e)
"""


def _pagerank_int_sql(iters: int = 4, unit: int = 10**9) -> str:
    """Unrolled exact-integer PageRank twin (one CTE per iteration):
    all floor-division BIGINT arithmetic, so it matches the engine's
    ops/graph.pagerank_int bit-for-bit."""
    base = (15 * unit) // 100
    sql = (
        "WITH "
        + _COPURCHASE_ED
        + """,
        deg AS MATERIALIZED (SELECT src, count(*)::BIGINT AS d FROM ed GROUP BY src),
        pr0 AS MATERIALIZED (SELECT src AS node, """
        + f"{unit}::BIGINT AS pr FROM deg)"
    )
    for i in range(1, iters + 1):
        sql += f""",
        pr{i} AS MATERIALIZED (
          SELECT ed.dst AS node,
                 {base} + (85 * sum(pr{i - 1}.pr // deg.d)) // 100 AS pr
          FROM ed
          JOIN pr{i - 1} ON pr{i - 1}.node = ed.src
          JOIN deg ON deg.src = ed.src
          GROUP BY ed.dst)"""
    return sql + (
        f" SELECT node::BIGINT AS node, pr::BIGINT AS rank_units FROM pr{iters}"
    )


def _bellman_ford_sql(iters: int = 6) -> str:
    """Unrolled integer Bellman-Ford twin: min-plus relaxation from the
    smallest node id, edge weight 1000 // co_count + 1."""
    sql = (
        "WITH "
        + _COPURCHASE_ED
        + """,
        ew AS MATERIALIZED (SELECT a AS src, b AS dst, 1000 // c + 1 AS w FROM e
               UNION ALL
               SELECT b, a, 1000 // c + 1 FROM e),
        d0 AS MATERIALIZED (SELECT (SELECT min(src) FROM ew) AS node, 0::BIGINT AS dist)"""
    )
    for i in range(1, iters + 1):
        sql += f""",
        d{i} AS MATERIALIZED (
          SELECT node, min(dist)::BIGINT AS dist FROM (
            SELECT node, dist FROM d{i - 1}
            UNION ALL
            SELECT ew.dst AS node, d{i - 1}.dist + ew.w AS dist
            FROM d{i - 1} JOIN ew ON ew.src = d{i - 1}.node
          ) u GROUP BY node)"""
    return sql + f" SELECT node::BIGINT AS node, dist::BIGINT AS dist FROM d{iters}"


def _kcore_sql(k: int = 3, rounds: int = 14) -> str:
    """Unrolled k-core peeling twin: each round keeps nodes with
    surviving degree >= k and restricts the edge list to kept-kept
    edges.  ``rounds`` exceeds the measured fixpoint depth at every
    test sf (10 at sf0.01); extra rounds are no-ops because peeling is
    idempotent once converged."""
    sql = "WITH " + _COPURCHASE_ED + ",\n    ed0 AS MATERIALIZED (SELECT src, dst FROM ed)"
    for i in range(1, rounds + 1):
        sql += f""",
        n{i} AS MATERIALIZED (SELECT src FROM ed{i - 1} GROUP BY src HAVING count(*) >= {k}),
        ed{i} AS MATERIALIZED (SELECT ed{i - 1}.src, ed{i - 1}.dst
                  FROM ed{i - 1}
                  JOIN n{i} ka ON ka.src = ed{i - 1}.src
                  JOIN n{i} kb ON kb.src = ed{i - 1}.dst)"""
    return sql + (
        f" SELECT src::BIGINT AS node, count(*)::BIGINT AS deg"
        f" FROM ed{rounds} GROUP BY src"
    )


def oracle_sql() -> dict[str, str]:
    return {
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2)                          AS sum_qty,
                   round(sum(l_extendedprice), 2)                     AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)  AS sum_disc_price,
                   count(*)::BIGINT                                   AS count_order
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
        """,
        "q3_top_revenue_orders": """
            SELECT o.o_orderkey,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
            FROM customer c
            JOIN orders o   ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            WHERE c.c_mktsegment = 'BUILDING'
            GROUP BY o.o_orderkey
            ORDER BY sum(l.l_extendedprice * (1 - l.l_discount)) DESC, o.o_orderkey
            LIMIT 10
        """,
        "q5_region_revenue": """
            SELECT n.n_name,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
            FROM customer c
            JOIN orders o   ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n   ON c.c_nationkey = n.n_nationkey
            JOIN region r   ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name = 'AMERICA' AND s.s_nationkey = c.c_nationkey
            GROUP BY n.n_name
        """,
        "agg_orders_by_status": """
            SELECT o_orderstatus,
                   round(sum(o_totalprice), 2) AS total_price,
                   count(*)::BIGINT            AS n_orders
            FROM orders GROUP BY o_orderstatus
        """,
        "ngram_jaccard_exact": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 x -> x <> '') AS t
              FROM documents
            ),
            sh AS (
              SELECT doc_id,
                     CASE
                       WHEN len(t) = 0 THEN []::VARCHAR[]
                       WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                       ELSE list_distinct(list_transform(range(1, len(t) - 1),
                                          i -> array_to_string(t[i:i+2], ' ')))
                     END AS s
              FROM toks
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   len(list_intersect(a.s, b.s))::BIGINT AS n_inter,
                   (len(a.s) + len(b.s)
                    - len(list_intersect(a.s, b.s)))::BIGINT AS n_union
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE len(a.s) > 0 AND len(b.s) > 0
              AND len(list_intersect(a.s, b.s)) * 10
                  >= 3 * (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
        """,
        "ngram_jaccard_prefix": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 x -> x <> '') AS t
              FROM documents
            ),
            sh AS (
              SELECT doc_id,
                     CASE
                       WHEN len(t) = 0 THEN []::VARCHAR[]
                       WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                       ELSE list_distinct(list_transform(range(1, len(t) - 1),
                                          i -> array_to_string(t[i:i+2], ' ')))
                     END AS s
              FROM toks
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   len(list_intersect(a.s, b.s))::BIGINT AS n_inter,
                   (len(a.s) + len(b.s)
                    - len(list_intersect(a.s, b.s)))::BIGINT AS n_union
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE len(a.s) > 0 AND len(b.s) > 0
              AND len(list_intersect(a.s, b.s)) * 10
                  >= 7 * (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
        """,
        "repeated_ngrams": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 x -> x <> '') AS t
              FROM documents
            ),
            sh AS (
              SELECT doc_id,
                     CASE
                       WHEN len(t) = 0 THEN []::VARCHAR[]
                       WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                       ELSE list_distinct(list_transform(range(1, len(t) - 1),
                                          i -> array_to_string(t[i:i+2], ' ')))
                     END AS s
              FROM toks
            )
            SELECT u.gram, count(*)::BIGINT AS n_docs
            FROM sh, unnest(sh.s) AS u(gram)
            GROUP BY u.gram
            HAVING count(*) >= 5
        """,
        "duplicate_spans": """
            WITH g AS (
              SELECT doc_id, substr(text, CAST(i*20+1 AS BIGINT), 40) AS gram
              -- 4096 bounds grams/doc at 80k chars, far above any sf's
              -- max doc length (553 at sf0.01); WHERE drops the rest
              FROM documents, range(0, 4096) r(i)
              WHERE i*20 + 40 <= length(text)
            ),
            d AS (
              SELECT gram FROM g GROUP BY gram
              HAVING count(DISTINCT doc_id) >= 2
            )
            SELECT g.doc_id,
                   count(*)::BIGINT AS n_spans,
                   sum(CASE WHEN g.gram IN (SELECT gram FROM d)
                            THEN 1 ELSE 0 END)::BIGINT AS n_dup_spans
            FROM g GROUP BY g.doc_id
        """,
        "docs_by_lang": """
            SELECT lang,
                   sum(n_chars)::BIGINT AS total_chars,
                   count(*)::BIGINT     AS n_docs
            FROM documents GROUP BY lang
        """,
        "contamination_ngram": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 x -> x <> '') AS t
              FROM documents
            ),
            sh AS (
              SELECT doc_id,
                     CASE
                       WHEN len(t) = 0 THEN []::VARCHAR[]
                       WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                       ELSE list_distinct(list_transform(range(1, len(t) - 1),
                                          i -> array_to_string(t[i:i+2], ' ')))
                     END AS s
              FROM toks
            ),
            bench AS (
              SELECT list_distinct(flatten(list(s))) AS bs FROM sh WHERE doc_id < 10
            )
            SELECT doc_id,
                   len(s)::BIGINT AS n_shingles,
                   len(list_intersect(s, bs))::BIGINT AS n_overlap
            FROM sh CROSS JOIN bench WHERE doc_id >= 10
        """,
        "top10_customers_by_spend": """
            SELECT c.c_custkey, c.c_name, round(sum(o.o_totalprice), 2) AS spend
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_custkey, c.c_name
            ORDER BY sum(o.o_totalprice) DESC, c.c_custkey LIMIT 10
        """,
        "filter_highvalue_orders": """
            SELECT o_orderkey, o_custkey, o_totalprice
            FROM orders WHERE o_totalprice > 450000.0
        """,
        "part_brand_stats": """
            SELECT p_brand,
                   round(sum(p_retailprice), 2) AS sum_price,
                   max(p_size)                  AS max_size,
                   count(*)::BIGINT             AS n_parts
            FROM part GROUP BY p_brand
        """,
        "distinct_mktsegments": """
            SELECT DISTINCT c_mktsegment FROM customer
        """,
        "supplier_nation_balance": """
            SELECT n.n_name, round(sum(s.s_acctbal), 2) AS total_balance,
                   count(*)::BIGINT AS n_suppliers
            FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
            GROUP BY n.n_name
        """,
        "orders_price_ranked": """
            WITH b AS (
              SELECT quantile_cont(o_totalprice, 0.25) AS q1,
                     quantile_cont(o_totalprice, 0.50) AS q2,
                     quantile_cont(o_totalprice, 0.75) AS q3
              FROM orders
            ),
            s AS (
              SELECT o_orderkey, o_totalprice,
                     (CASE WHEN o_totalprice < q1 THEN 0
                           WHEN o_totalprice < q2 THEN 1
                           WHEN o_totalprice < q3 THEN 2
                           ELSE 3 END)::BIGINT AS shard
              FROM orders, b
            )
            SELECT o_orderkey, shard,
                   (row_number() OVER (
                      PARTITION BY shard
                      ORDER BY o_totalprice, o_orderkey) - 1)::BIGINT AS pos
            FROM s
        """,
        "orders_rollup": """
            SELECT o_orderstatus, o_orderpriority,
                   round(sum(o_totalprice), 2) AS total_price,
                   count(*)::BIGINT AS n_orders
            FROM orders
            GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        """,
        "events_customer_enriched": """
            SELECT e.event_id, e.user_id, c.c_name
            FROM events e JOIN customer c ON e.user_id = c.c_custkey
        """,
        "customer_big_order_coverage": """
            SELECT coalesce(a.o_custkey, b.c_custkey) AS c_custkey,
                   a.n_big, b.c_name
            FROM (SELECT o_custkey, count(*)::BIGINT AS n_big
                  FROM orders WHERE o_totalprice > 400000.0
                  GROUP BY o_custkey) a
            FULL OUTER JOIN
                 (SELECT c_custkey, c_name FROM customer
                  WHERE c_mktsegment = 'BUILDING') b
              ON a.o_custkey = b.c_custkey
        """,
        "customers_with_big_orders": """
            SELECT c_custkey, c_name FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > 400000.0)
        """,
        "customers_without_big_orders": """
            SELECT c_custkey, c_name FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_totalprice > 400000.0)
        """,
        "events_tumbling_1h": """
            SELECT event_type,
                   -- floor division (DuckDB's // truncates toward zero,
                   -- which would mis-bucket pre-1970 timestamps); the
                   -- double quotient is exact for any epoch below 2^53 us
                   CAST(floor(epoch_us(ts) / 3600000000.0) AS BIGINT) * 3600 AS window_start,
                   count(*)::BIGINT                        AS n_events,
                   round(sum(value), 2)                    AS sum_value
            FROM events GROUP BY event_type, window_start
        """,
        "events_sliding_1h_30m": """
            SELECT event_type, window_start, count(*)::BIGINT AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM (
              SELECT event_type, value,
                     unnest([CAST(floor(epoch_us(ts) / 1800000000.0) AS BIGINT) * 1800,
                             CAST(floor(epoch_us(ts) / 1800000000.0) AS BIGINT) * 1800 - 1800]) AS window_start
              FROM events
            ) GROUP BY event_type, window_start
        """,
        "events_sessions": """
            SELECT user_id,
                   sum(CASE WHEN new_s THEN 1 ELSE 0 END)::BIGINT AS n_sessions,
                   count(*)::BIGINT                               AS n_events
            FROM (
              SELECT user_id,
                     (lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                      OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         > INTERVAL '30 minutes') AS new_s
              FROM events
            ) GROUP BY user_id
        """,
        "events_topk_users": """
            SELECT user_id, count(*)::BIGINT AS n_events
            FROM events GROUP BY user_id
            ORDER BY count(*) DESC, user_id LIMIT 10
        """,
        "events_distinct_users": """
            SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_users
            FROM events GROUP BY event_type
        """,
        "events_approx_distinct_users": """
            SELECT event_type,
                   count(DISTINCT user_id)::BIGINT AS approx_distinct
            FROM events GROUP BY event_type
        """,
        "events_median_value": """
            SELECT event_type,
                   round(quantile_cont(value, 0.5), 4) AS median_value
            FROM events GROUP BY event_type
        """,
        "events_p95_value": """
            SELECT event_type,
                   round(quantile_cont(value, 0.95), 4) AS p95_value
            FROM events GROUP BY event_type
        """,
        "events_running_user_totals": """
            SELECT user_id, event_id,
                   row_number() OVER w ::BIGINT AS seq,
                   (sum(CAST(floor(value * 100) AS BIGINT)) OVER w)::BIGINT
                     AS cum_cents,
                   coalesce(date_diff('microsecond',
                                      lag(ts) OVER w, ts), -1)::BIGINT AS gap_us
            FROM events WHERE ts IS NOT NULL
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "events_moving_sum": """
            SELECT user_id, event_id,
                   (sum(CAST(floor(value * 100) AS BIGINT)) OVER w)::BIGINT
                     AS win_cents,
                   (count(*) OVER w)::BIGINT AS win_n
            FROM events WHERE ts IS NOT NULL
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        """,
        "events_value_histogram": """
            SELECT event_type,
                   CAST(floor(value / 50.0) AS BIGINT) AS bin,
                   count(*)::BIGINT AS n_events
            FROM events WHERE value IS NOT NULL
            GROUP BY event_type, bin
        """,
        "events_value_quartiles": """
            SELECT user_id, event_id,
                   ntile(4) OVER w ::BIGINT AS ntile4,
                   percent_rank() OVER w AS pct_rank
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
        """,
        "user_event_type_pivot": """
            SELECT user_id,
                   sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END)::BIGINT AS click,
                   sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END)::BIGINT AS error,
                   sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS purchase,
                   sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END)::BIGINT AS signup,
                   sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END)::BIGINT AS view,
                   count(*)::BIGINT AS total
            FROM events GROUP BY user_id
        """,
        "top3_orders_per_customer": """
            SELECT o_custkey, o_orderkey, o_totalprice, rank FROM (
              SELECT o_custkey, o_orderkey, o_totalprice,
                     row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
              FROM orders
            ) WHERE rank <= 3
        """,
        "range_events_burst": """
            SELECT a.event_id,
                   count(b.ts)::BIGINT AS n_matches
            FROM events a
            LEFT JOIN events b
              ON b.user_id = a.user_id
             AND b.ts >= a.ts - INTERVAL '1 hour'
             AND b.ts < a.ts
            GROUP BY a.event_id
        """,
        "asof_events_orders": """
            SELECT event_id, o_orderkey FROM (
              SELECT e.event_id, o.o_orderkey,
                     row_number() OVER (
                       PARTITION BY e.event_id
                       ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
              FROM events e
              JOIN orders o ON e.user_id = o.o_custkey
                            AND o.o_orderdate <= e.ts
            ) WHERE rn = 1
        """,
        "asof_events_next_order": """
            SELECT event_id, purchase_event_id FROM (
              SELECT v.event_id, p.event_id AS purchase_event_id,
                     row_number() OVER (
                       PARTITION BY v.event_id
                       ORDER BY p.ts ASC, p.event_id DESC) AS rn
              FROM events v
              JOIN events p ON v.user_id = p.user_id AND p.ts >= v.ts
              WHERE v.event_type = 'view' AND p.event_type = 'purchase'
            ) WHERE rn = 1
        """,
        "q10_returned_items": """
            SELECT c.c_custkey, c.c_name, n.n_name,
                   round(sum(floor(l.l_extendedprice * (1 - l.l_discount)
                                   * 100)::BIGINT) / 100.0, 2) AS revenue
            FROM customer c, orders o, lineitem l, nation n
            WHERE c.c_custkey = o.o_custkey
              AND l.l_orderkey = o.o_orderkey
              AND o.o_orderdate >= TIMESTAMP '1996-01-01'
              AND o.o_orderdate <  TIMESTAMP '1996-07-01'
              AND l.l_returnflag = 'R'
              AND c.c_nationkey = n.n_nationkey
            GROUP BY c.c_custkey, c.c_name, n.n_name
            ORDER BY sum(floor(l.l_extendedprice * (1 - l.l_discount)
                               * 100)::BIGINT) DESC, c.c_custkey
            LIMIT 20
        """,
        "user_event_sequences": """
            SELECT user_id,
                   string_agg(event_type, ',' ORDER BY ts, event_id) AS seq,
                   count(*)::BIGINT AS n_events
            FROM events GROUP BY user_id
        """,
        "part_skyline": """
            SELECT p.p_partkey, p.p_retailprice, p.p_size
            FROM part p
            WHERE NOT EXISTS (
              SELECT 1 FROM part q
              WHERE q.p_retailprice <= p.p_retailprice
                AND q.p_size <= p.p_size
                AND (q.p_retailprice < p.p_retailprice OR q.p_size < p.p_size)
            )
        """,
        "copurchase_components": """
            WITH RECURSIVE
            p AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            e AS (SELECT a.l_partkey AS a, b.l_partkey AS b
                  FROM p a JOIN p b
                    ON a.l_orderkey = b.l_orderkey
                   AND a.l_partkey < b.l_partkey
                  GROUP BY 1, 2 HAVING count(*) >= 2),
            ed AS (SELECT a AS src, b AS dst FROM e
                   UNION ALL SELECT b, a FROM e),
            walk(node, label) AS (
              SELECT src, src FROM ed
              UNION
              SELECT ed.dst, w.label FROM walk w JOIN ed ON ed.src = w.node
            )
            SELECT node::BIGINT AS node, min(label)::BIGINT AS component
            FROM walk GROUP BY node
        """,
        "user_event_mode": """
            SELECT user_id, event_type AS mode_event_type, n FROM (
              SELECT user_id, event_type, count(*)::BIGINT AS n,
                     row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY count(*) DESC, event_type) AS rn
              FROM events GROUP BY user_id, event_type
            ) WHERE rn = 1
        """,
        "events_daily_gap_fill": """
            WITH b AS (
              -- epoch_us + integer floor-div, NOT epoch(ts)::BIGINT:
              -- the BIGINT cast ROUNDS the fractional second, so a
              -- 23:59:59.5 event would land on the NEXT day vs the
              -- engine's floor (verified in DuckDB)
              SELECT (epoch_us(min(ts)) // 86400000000) * 86400 AS lo,
                     (epoch_us(max(ts)) // 86400000000) * 86400 AS hi
              FROM events
            ),
            days AS (
              SELECT unnest(range(lo, hi + 86400, 86400)) AS day_start FROM b
            ),
            c AS (
              SELECT (epoch_us(ts) // 86400000000) * 86400 AS day_start,
                     count(*)::BIGINT AS n
              FROM events GROUP BY 1
            )
            SELECT days.day_start, coalesce(c.n, 0)::BIGINT AS n_events
            FROM days LEFT JOIN c USING (day_start)
        """,
        "orders_profile": """
            SELECT 'o_orderkey' AS col, count(*)::BIGINT AS n_rows,
                   (count(*) - count(o_orderkey))::BIGINT AS n_null,
                   count(DISTINCT o_orderkey)::BIGINT AS n_distinct FROM orders
            UNION ALL
            SELECT 'o_custkey', count(*)::BIGINT,
                   (count(*) - count(o_custkey))::BIGINT,
                   count(DISTINCT o_custkey)::BIGINT FROM orders
            UNION ALL
            SELECT 'o_orderstatus', count(*)::BIGINT,
                   (count(*) - count(o_orderstatus))::BIGINT,
                   count(DISTINCT o_orderstatus)::BIGINT FROM orders
            UNION ALL
            SELECT 'o_totalprice', count(*)::BIGINT,
                   (count(*) - count(o_totalprice))::BIGINT,
                   count(DISTINCT o_totalprice)::BIGINT FROM orders
        """,
        "documents_checksum": """
            SELECT (sum(('0x' || substr(
                       md5(doc_id::VARCHAR || '|' || coalesce(text, '')),
                       1, 8))::BIGINT)
                    % 2305843009213693951)::BIGINT AS checksum,
                   count(*)::BIGINT AS n_rows
            FROM documents
        """,
        "monthly_revenue_growth": """
            WITH m AS (
              SELECT epoch(date_trunc('month', o_orderdate))::BIGINT AS month_start,
                     sum(floor(o_totalprice * 100)::BIGINT) AS cents
              FROM orders GROUP BY 1
            )
            SELECT month_start,
                   round(cents / 100.0, 2) AS revenue,
                   round(lag(cents) OVER (ORDER BY month_start) / 100.0, 2)
                     AS prev_revenue,
                   round((cents - lag(cents) OVER (ORDER BY month_start)) * 100.0
                         / lag(cents) OVER (ORDER BY month_start), 4) AS growth_pct
            FROM m
        """,
        "lineitem_order_share": """
            WITH c AS (
              SELECT l_orderkey, l_linenumber,
                     floor(l_extendedprice * (1 - l_discount) * 100)::BIGINT
                       AS line_cents
              FROM lineitem
            )
            SELECT l_orderkey, l_linenumber, line_cents,
                   sum(line_cents) OVER (PARTITION BY l_orderkey)::BIGINT
                     AS order_cents,
                   CASE WHEN sum(line_cents) OVER (PARTITION BY l_orderkey) <> 0
                        THEN ((line_cents * 1000000)
                              // sum(line_cents) OVER (PARTITION BY l_orderkey))::BIGINT
                        ELSE -1 END AS share_ppm
            FROM c
        """,
        "user_event_type_sets": """
            SELECT user_id,
                   array_to_string(list_sort(list(DISTINCT event_type)), ',')
                     AS types_csv,
                   count(DISTINCT event_type)::BIGINT AS n_types
            FROM events GROUP BY user_id
        """,
        "session_day_overlap": """
            WITH e AS (
              SELECT user_id, event_id, epoch_us(ts) AS us
              FROM events WHERE ts IS NOT NULL
            ),
            f AS (
              SELECT user_id, us, event_id,
                     CASE WHEN lag(us) OVER w IS NULL
                            OR us - lag(us) OVER w > 1800000000
                          THEN 1 ELSE 0 END AS new_s
              FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
            ),
            g AS (
              SELECT user_id, us,
                     sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                                      ROWS UNBOUNDED PRECEDING) AS sess_no
              FROM f
            ),
            s AS (
              SELECT user_id, sess_no::BIGINT AS session_no,
                     min(us) AS start_us, max(us) AS end_us
              FROM g GROUP BY user_id, sess_no
            )
            SELECT user_id, session_no,
                   (d.day * 86400)::BIGINT AS day_start,
                   (least(end_us, (d.day + 1) * 86400000000)
                    - greatest(start_us, d.day * 86400000000))::BIGINT
                     AS overlap_us
            FROM s, unnest(range(start_us // 86400000000,
                                 end_us // 86400000000 + 1)) AS d(day)
        """,
        "fk_orphan_scan": """
            SELECT 'orders.o_custkey->customer' AS relation,
                   count(*)::BIGINT AS n_orphans
            FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey)
            UNION ALL
            SELECT 'lineitem.l_orderkey->orders', count(*)::BIGINT
            FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey)
            UNION ALL
            SELECT 'customer.c_nationkey->nation', count(*)::BIGINT
            FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM nation n
                              WHERE n.n_nationkey = c.c_nationkey)
        """,
        "join_cardinality_estimate": """
            SELECT count(*)::BIGINT AS join_rows,
                   count(DISTINCT e.user_id)::BIGINT AS n_keys
            FROM events e JOIN orders o ON e.user_id = o.o_custkey
        """,
        "events_debounce": """
            SELECT event_id, user_id, event_type, us AS ts_us FROM (
              SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
                     lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS prev_us
              FROM events WHERE ts IS NOT NULL
            ) WHERE prev_us IS NULL OR us - prev_us > 300000000
        """,
        "export_vacuum_orphans": """
            SELECT event_type,
                   CASE WHEN row_number() OVER (ORDER BY event_type) <= 2
                        THEN 1 ELSE 0 END::BIGINT AS n_orphans_removed,
                   count(*)::BIGINT AS n_rows
            FROM events GROUP BY event_type
        """,
        "orderkey_gaps": """
            WITH k AS (SELECT DISTINCT o_orderkey AS id FROM orders
                       WHERE o_totalprice > 450000),
            s AS (SELECT id, lead(id) OVER (ORDER BY id) AS nxt FROM k)
            SELECT (id + 1)::BIGINT AS gap_start, (nxt - 1)::BIGINT AS gap_end
            FROM s WHERE nxt > id + 1
        """,
        "doc_token_positions": r"""
            WITH t AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(text, '\s+'),
                                 x -> x <> '') AS toks
              FROM documents
            )
            SELECT doc_id, r.i::BIGINT AS pos, toks[r.i] AS token
            FROM t, unnest(range(1, least(len(toks), 10) + 1)) AS r(i)
        """,
        "events_value_trend": r"""
            SELECT event_type, n,
                   CASE WHEN (n::DOUBLE * sxx - sx::DOUBLE * sx) = 0.0
                        THEN NULL
                        ELSE (n::DOUBLE * sxy - sx::DOUBLE * sy)
                             / (n::DOUBLE * sxx - sx::DOUBLE * sx)
                   END AS slope_cents_per_hour
            FROM (
              SELECT event_type, count(*)::BIGINT AS n,
                     sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
                     sum(x * y)::BIGINT AS sxy, sum(x * x)::BIGINT AS sxx
              FROM (
                SELECT event_type,
                       (epoch_us(ts) // 3600000000)::BIGINT AS x,
                       floor(value * 100)::BIGINT AS y
                FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
              ) GROUP BY event_type
            )
        """,
        "bm25_search": r"""
            WITH t AS (
              SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'),
                                         x -> x <> '') AS toks
              FROM documents
            ),
            f AS (
              SELECT doc_id,
                     len(toks)::BIGINT AS dl,
                     len(list_filter(toks, x -> x = 'vector'))::BIGINT AS tf1,
                     len(list_filter(toks, x -> x = 'stream'))::BIGINT AS tf2,
                     len(list_filter(toks, x -> x = 'merge'))::BIGINT AS tf3
              FROM t
            ),
            g AS (
              SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS sum_dl,
                     sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END)::BIGINT AS df1,
                     sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END)::BIGINT AS df2,
                     sum(CASE WHEN tf3 > 0 THEN 1 ELSE 0 END)::BIGINT AS df3
              FROM f
            )
            SELECT doc_id, dl AS n_tokens,
                   ln(1.0 + (n_docs - df1 + 0.5) / (df1 + 0.5))
                     * (tf1 * 2.2)
                     / (tf1 + 1.2 * (0.25 + 0.75 * dl / (sum_dl::DOUBLE / n_docs)))
                 + ln(1.0 + (n_docs - df2 + 0.5) / (df2 + 0.5))
                     * (tf2 * 2.2)
                     / (tf2 + 1.2 * (0.25 + 0.75 * dl / (sum_dl::DOUBLE / n_docs)))
                 + ln(1.0 + (n_docs - df3 + 0.5) / (df3 + 0.5))
                     * (tf3 * 2.2)
                     / (tf3 + 1.2 * (0.25 + 0.75 * dl / (sum_dl::DOUBLE / n_docs)))
                   AS bm25
            FROM f CROSS JOIN g
            ORDER BY bm25 DESC, doc_id LIMIT 20
        """,
        "hybrid_search_rrf": r"""
            WITH qv AS (
              SELECT r.i AS i,
                     CAST(floor(embedding[r.i] * 10000.0) AS BIGINT) AS q
              FROM embeddings, unnest(range(1, len(embedding) + 1)) AS r(i)
              WHERE vec_id = 0
            ),
            sim AS (
              SELECT e.vec_id AS id,
                     sum(CAST(floor(e.embedding[r.i] * 10000.0) AS BIGINT)
                         * qv.q)::BIGINT AS sim
              FROM embeddings e, unnest(range(1, len(e.embedding) + 1)) AS r(i)
              JOIN qv ON qv.i = r.i
              GROUP BY e.vec_id
            ),
            ra AS (
              SELECT id,
                     row_number() OVER (ORDER BY sim DESC, id)::BIGINT AS rank_cos
              FROM sim
            ),
            kw AS (
              SELECT doc_id AS id,
                     (len(list_filter(toks, x -> x = 'vector'))
                    + len(list_filter(toks, x -> x = 'stream'))
                    + len(list_filter(toks, x -> x = 'merge')))::BIGINT AS kscore
              FROM (SELECT doc_id,
                           list_filter(regexp_split_to_array(text, '\s+'),
                                       x -> x <> '') AS toks
                    FROM documents)
            ),
            rb AS (
              SELECT id,
                     row_number() OVER (ORDER BY kscore DESC, id)::BIGINT AS rank_kw
              FROM kw
            )
            SELECT ra.id AS doc_id, ra.rank_cos, rb.rank_kw,
                   1.0 / (60 + ra.rank_cos) + 1.0 / (60 + rb.rank_kw) AS rrf
            FROM ra JOIN rb ON ra.id = rb.id
            ORDER BY rrf DESC, doc_id LIMIT 10
        """,
        "retrieval_metrics_cosine": r"""
            WITH qe AS (
              SELECT vec_id AS qid, embedding AS qemb, label AS qlabel
              FROM embeddings WHERE vec_id < 10
            ),
            sim AS (
              SELECT q.qid, e.vec_id AS id, e.label,
                     sum(CAST(floor(e.embedding[r.i] * 10000.0) AS BIGINT)
                       * CAST(floor(q.qemb[r.i] * 10000.0) AS BIGINT))::BIGINT AS sim
              FROM embeddings e
              CROSS JOIN qe q, unnest(range(1, len(e.embedding) + 1)) AS r(i)
              WHERE e.vec_id <> q.qid
              GROUP BY q.qid, e.vec_id, e.label
            ),
            ranked AS (
              SELECT qid, id, sim, label,
                     row_number() OVER (
                       PARTITION BY qid ORDER BY sim DESC, id
                     )::BIGINT AS rnk
              FROM sim
            ),
            rel AS (
              SELECT r.qid, r.id, r.rnk, (r.label = q.qlabel) AS is_rel
              FROM ranked r JOIN qe q ON q.qid = r.qid
            ),
            m AS (
              SELECT qid,
                     min(CASE WHEN is_rel THEN rnk END)::BIGINT AS first_rel_rank,
                     sum(CASE WHEN is_rel THEN 1 ELSE 0 END)::BIGINT AS n_rel,
                     sum(CASE WHEN is_rel AND rnk <= 10
                              THEN 1 ELSE 0 END)::BIGINT AS rel_in_top10,
                     sum(CASE WHEN is_rel AND rnk <= 10
                              THEN 1.0 / log2(1.0 + rnk) ELSE 0.0 END) AS dcg10
              FROM rel GROUP BY qid
            ),
            ideal AS (
              SELECT m.qid, sum(1.0 / log2(1.0 + r.i)) AS idcg10
              FROM m, unnest(range(1, least(m.n_rel, 10) + 1)) AS r(i)
              GROUP BY m.qid
            )
            SELECT m.qid AS query_id, m.first_rel_rank, m.n_rel,
                   m.rel_in_top10,
                   1.0 / m.first_rel_rank AS mrr,
                   m.rel_in_top10::DOUBLE / m.n_rel AS recall_at_10,
                   m.dcg10 / i.idcg10 AS ndcg_at_10
            FROM m JOIN ideal i ON i.qid = m.qid
            ORDER BY query_id
        """,
        "q6_forecast_revenue": """
            SELECT round(coalesce(sum(CAST(floor(
                     l_extendedprice * l_discount * 100.0) AS BIGINT)), 0)
                   / 100.0, 2) AS revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
              AND l_discount >= 0.04 AND l_discount <= 0.06
              AND l_quantity < 24.0
        """,
        "q7_volume_shipping": """
            WITH nk AS (
              SELECT n_nationkey, n_name FROM nation
              WHERE n_name IN ('NATION_1', 'NATION_2')
            )
            SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
                   CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
                   round(sum(CAST(floor(l.l_extendedprice
                     * (1 - l.l_discount) * 100.0) AS BIGINT)) / 100.0, 2)
                     AS revenue
            FROM lineitem l
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nk sn ON sn.n_nationkey = s.s_nationkey
            JOIN nk cn ON cn.n_nationkey = c.c_nationkey
            WHERE s.s_nationkey <> c.c_nationkey
            GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
        """,
        "q9_product_type_profit": """
            SELECT n.n_name AS n_name,
                   CAST(year(l.l_shipdate) AS BIGINT) AS o_year,
                   round(sum(CAST(floor(l.l_extendedprice
                     * (1 - l.l_discount) * 100.0) AS BIGINT)) / 100.0, 2)
                     AS profit
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            WHERE p.p_name LIKE '%gear%'
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "q14_promo_revenue": """
            SELECT round(coalesce(sum(CASE WHEN p.p_type = 'PROMO'
                     THEN CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                       * 100.0) AS BIGINT) ELSE 0 END), 0) / 100.0, 2)
                     AS promo_revenue,
                   round(coalesce(sum(CAST(floor(l.l_extendedprice
                     * (1 - l.l_discount) * 100.0) AS BIGINT)), 0) / 100.0, 2)
                     AS total_revenue
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
            WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
              AND l.l_shipdate <  TIMESTAMP '1997-10-01'
        """,
        "q17_small_quantity_revenue": """
            WITH lib AS (
              SELECT l.l_partkey,
                     CAST(floor(l.l_quantity * 100.0) AS BIGINT) AS qty_cents,
                     CAST(floor(l.l_extendedprice * 100.0) AS BIGINT)
                       AS price_cents
              FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
              WHERE p.p_brand = 'Brand#11'
            ),
            stats AS (
              SELECT l_partkey, sum(qty_cents) AS qtysum_cents,
                     count(*) AS cnt
              FROM lib GROUP BY 1
            )
            SELECT round(coalesce(sum(lib.price_cents), 0) / 100.0, 2)
                     AS revenue
            FROM lib JOIN stats USING (l_partkey)
            WHERE 100 * lib.qty_cents * stats.cnt < 20 * stats.qtysum_cents
        """,
        "q18_large_volume_customers": """
            WITH big AS (
              SELECT l_orderkey AS o_orderkey,
                     sum(CAST(floor(l_quantity * 100.0) AS BIGINT)) AS qty_cents
              FROM lineitem GROUP BY 1
              HAVING sum(CAST(floor(l_quantity * 100.0) AS BIGINT)) > 30000
            )
            SELECT c.c_custkey, c.c_name, o.o_orderkey,
                   CAST(epoch(o.o_orderdate) AS BIGINT) AS o_orderdate_s,
                   o.o_totalprice,
                   round(big.qty_cents / 100.0, 2) AS sum_qty
            FROM big
            JOIN orders o ON o.o_orderkey = big.o_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            ORDER BY o.o_totalprice DESC, o.o_orderkey
            LIMIT 100
        """,
        "q19_disjunctive_revenue": """
            SELECT round(coalesce(sum(CAST(floor(l.l_extendedprice
                     * (1 - l.l_discount) * 100.0) AS BIGINT)), 0) / 100.0, 2)
                     AS revenue
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
            WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
                   AND l.l_quantity BETWEEN 1 AND 11)
               OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
                   AND l.l_quantity BETWEEN 10 AND 20)
               OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
                   AND l.l_quantity BETWEEN 20 AND 30)
        """,
        "q22_sales_opportunity": """
            WITH avgp AS (
              SELECT sum(CASE WHEN c_acctbal > 0.0
                       THEN CAST(floor(c_acctbal * 100.0) AS BIGINT)
                       ELSE 0 END) AS s,
                     sum(CASE WHEN c_acctbal > 0.0 THEN 1 ELSE 0 END) AS n
              FROM customer
            ),
            cand AS (
              SELECT c_custkey, c_nationkey,
                     CAST(floor(c_acctbal * 100.0) AS BIGINT) AS bal_cents
              FROM customer, avgp
              WHERE CAST(floor(c_acctbal * 100.0) AS BIGINT) * avgp.n > avgp.s
            ),
            noord AS (
              SELECT cand.* FROM cand
              WHERE NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_custkey = cand.c_custkey
                                  AND o.o_orderdate >= TIMESTAMP '1999-01-01')
            )
            SELECT n.n_name AS n_name, count(*)::BIGINT AS numcust,
                   round(sum(bal_cents) / 100.0, 2) AS totacctbal
            FROM noord JOIN nation n ON n.n_nationkey = noord.c_nationkey
            GROUP BY 1 ORDER BY 1
        """,
        "events_running_max": """
            SELECT user_id, event_id,
                   (max(CAST(floor(value * 100) AS BIGINT)) OVER (
                      PARTITION BY user_id ORDER BY ts, event_id
                   ))::BIGINT AS run_max_cents
            FROM events
            WHERE ts IS NOT NULL AND value IS NOT NULL
        """,
        "user_event_entropy": """
            WITH c AS (
              SELECT user_id, event_type, count(*)::BIGINT AS n
              FROM events GROUP BY 1, 2
            )
            SELECT user_id, sum(n)::BIGINT AS n_events,
                   ln(sum(n)) - sum(n * ln(n)) / sum(n) AS entropy
            FROM c GROUP BY user_id
        """,
        "source_unigram_kl": r"""
            WITH tok AS (
              SELECT source,
                     unnest(regexp_split_to_array(text, '\s+')) AS token
              FROM documents
            ),
            c AS (
              SELECT source, token, count(*)::BIGINT AS n
              FROM tok WHERE token <> '' GROUP BY 1, 2
            ),
            s AS (SELECT source, sum(n) AS ns FROM c GROUP BY 1),
            t AS (SELECT token, sum(n) AS nt FROM c GROUP BY 1),
            tot AS (SELECT sum(n) AS nn FROM c)
            SELECT c.source AS source, s.ns::BIGINT AS n_tokens,
                   sum((c.n / s.ns) * ln((c.n / s.ns) / (t.nt / tot.nn)))
                     AS kl
            FROM c
            JOIN s USING (source) JOIN t USING (token) CROSS JOIN tot
            GROUP BY 1, 2 ORDER BY 1
        """,
        "phrase_search": r"""
            WITH d AS (
              SELECT doc_id, regexp_split_to_array(text, '\s+') AS a
              FROM documents
            ),
            hit AS (
              SELECT d.doc_id
              FROM d, unnest(range(1, len(a))) AS r(i)
              WHERE a[r.i] = 'hash' AND a[r.i + 1] = 'join'
            )
            SELECT doc_id, count(*)::BIGINT AS n_hits
            FROM hit GROUP BY doc_id
        """,
        "events_value_winsorized": """
            WITH v AS (
              SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents
              FROM events WHERE value IS NOT NULL
            ),
            q AS (
              SELECT event_type,
                     quantile_disc(cents, 0.05) AS lo,
                     quantile_disc(cents, 0.95) AS hi
              FROM v GROUP BY 1
            )
            SELECT v.event_type, count(*)::BIGINT AS n,
                   sum(least(greatest(v.cents, q.lo), q.hi))::BIGINT
                     AS win_cents
            FROM v JOIN q USING (event_type)
            GROUP BY 1 ORDER BY 1
        """,
        "export_arrow_ipc_roundtrip": """
            SELECT doc_id, md5(text) AS fingerprint FROM documents
        """,
        "vocab_coverage_curve": r"""
            WITH tok AS (
              SELECT unnest(regexp_split_to_array(text, '\s+')) AS token
              FROM documents
            ),
            c AS (
              SELECT token, count(*)::BIGINT AS n
              FROM tok WHERE token <> '' GROUP BY 1
            )
            SELECT row_number() OVER (ORDER BY n DESC, token)::BIGINT AS rank,
                   token, n,
                   (sum(n) OVER (ORDER BY n DESC, token
                                 ROWS UNBOUNDED PRECEDING))::BIGINT AS cum_n
            FROM c
        """,
        "events_type_day_chi2": """
            WITH c AS (
              SELECT event_type, CAST(dayofweek(ts) AS BIGINT) AS dow,
                     count(*)::BIGINT AS n
              FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
            ),
            r AS (SELECT event_type, sum(n) AS nr FROM c GROUP BY 1),
            k AS (SELECT dow, sum(n) AS nk FROM c GROUP BY 1),
            tot AS (SELECT sum(n) AS nn FROM c),
            grid AS (
              SELECT coalesce(c.n, 0) AS o,
                     r.nr * k.nk / tot.nn AS e
              FROM r CROSS JOIN k CROSS JOIN tot
              LEFT JOIN c
                ON c.event_type = r.event_type AND c.dow = k.dow
            )
            SELECT (SELECT nn FROM tot)::BIGINT AS n,
                   (((SELECT count(*) FROM r) - 1)
                    * ((SELECT count(*) FROM k) - 1))::BIGINT AS dof,
                   round(sum((o - e) * (o - e) / e), 6) AS chi2
            FROM grid
        """,
        "copurchase_degree_assortativity": """
            WITH p AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            e AS (
              SELECT a.l_partkey AS pa, b.l_partkey AS pb
              FROM p a JOIN p b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
              GROUP BY 1, 2
            ),
            d AS (
              SELECT node, count(*)::BIGINT AS deg FROM (
                SELECT pa AS node FROM e
                UNION ALL SELECT pb AS node FROM e
              ) GROUP BY 1
            ),
            j AS (
              SELECT da.deg AS x, db.deg AS y
              FROM e JOIN d da ON da.node = e.pa JOIN d db ON db.node = e.pb
            ),
            s AS (
              SELECT count(*) * 2 AS m, sum(x + y) AS sx,
                     sum(x * x + y * y) AS sxx, sum(2 * x * y) AS sxy
              FROM j
            )
            SELECT (m / 2)::BIGINT AS n_edges,
                   CASE WHEN m * sxx - sx * sx = 0 THEN NULL
                        ELSE CAST(m * sxy - sx * sx AS DOUBLE)
                             / CAST(m * sxx - sx * sx AS DOUBLE) END
                     AS assortativity
            FROM s
        """,
        "customer_balance_gini": """
            WITH v AS (
              SELECT c_nationkey,
                     CAST(floor(c_acctbal * 100) AS BIGINT) AS cents
              FROM customer WHERE c_acctbal > 0.0
            ),
            r AS (
              SELECT c_nationkey, cents,
                     row_number() OVER (
                       PARTITION BY c_nationkey ORDER BY cents
                     )::BIGINT AS i
              FROM v
            ),
            s AS (
              SELECT c_nationkey, count(*)::BIGINT AS n,
                     sum(cents) AS sx, sum(i * cents) AS six
              FROM r GROUP BY 1
            )
            SELECT nn.n_name AS n_name, s.n AS n_custs,
                   CAST(2 * s.six - (s.n + 1) * s.sx AS DOUBLE)
                   / CAST(s.n * s.sx AS DOUBLE) AS gini
            FROM s JOIN nation nn ON nn.n_nationkey = s.c_nationkey
            ORDER BY 1
        """,
        "orders_top_prices_with_ties": """
            SELECT o_orderkey, o_totalprice,
                   rank() OVER (ORDER BY o_totalprice DESC)::BIGINT AS rnk
            FROM orders
            QUALIFY rnk <= 10
            ORDER BY o_totalprice DESC, o_orderkey
        """,
        "chunk_dedup_reassembly": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 x -> x <> '') AS t
              FROM documents
            ),
            nc AS (
              SELECT doc_id, t, len(t) AS n,
                     CASE WHEN len(t) = 0 THEN 0
                          ELSE 1 + (greatest(0, len(t) - 32) + 31) // 32
                     END AS n_chunks
              FROM toks
            ),
            ch AS (
              SELECT doc_id, (r.i - 1)::BIGINT AS chunk_id,
                     array_to_string(
                       t[(r.i - 1) * 32 + 1 : least((r.i - 1) * 32 + 32, n)],
                       ' ') AS chunk_text
              FROM nc, unnest(range(1, n_chunks + 1)) AS r(i)
            ),
            f AS (
              SELECT doc_id, chunk_id, chunk_text, md5(chunk_text) AS fp,
                     doc_id * 100000 + chunk_id AS pack
              FROM ch
            ),
            own AS (SELECT fp, min(pack) AS mp FROM f GROUP BY 1)
            SELECT f.doc_id, count(*)::BIGINT AS n_chunks,
                   sum(CASE WHEN f.pack = o.mp THEN 1 ELSE 0 END)::BIGINT
                     AS n_kept,
                   coalesce(string_agg(
                     CASE WHEN f.pack = o.mp THEN f.chunk_text END,
                     ' ' ORDER BY f.chunk_id), '') AS text_dedup
            FROM f JOIN own o USING (fp)
            GROUP BY f.doc_id
        """,
        "user_value_twap": """
            WITH e AS (
              SELECT user_id, ts, event_id,
                     CAST(floor(value * 100) AS BIGINT) AS cents,
                     lead(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                     ) AS nxt
              FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
            )
            SELECT user_id, (count(*) + 1)::BIGINT AS n_events,
                   sum(cents * date_diff('microsecond', ts, nxt))::BIGINT
                     AS num_cents_us,
                   sum(date_diff('microsecond', ts, nxt))::BIGINT AS den_us
            FROM e WHERE nxt IS NOT NULL
            GROUP BY user_id
        """,
        "events_hourly_profile": """
            SELECT event_type, CAST(hour(ts) AS BIGINT) AS hour,
                   count(*)::BIGINT AS n
            FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
        """,
        "doc_ngram_novelty": r"""
            WITH sh AS (
              SELECT DISTINCT doc_id,
                     array_to_string(t[r.i : r.i + 2], ' ') AS g
              FROM (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(text, '\s+'),
                                   x -> x <> '') AS t
                FROM documents
              ) d, unnest(range(1, len(t) - 1)) AS r(i)
            ),
            own AS (SELECT g, min(doc_id) AS owner FROM sh GROUP BY 1)
            SELECT sh.doc_id, count(*)::BIGINT AS n_shingles,
                   sum(CASE WHEN own.owner = sh.doc_id
                            THEN 1 ELSE 0 END)::BIGINT AS n_novel
            FROM sh JOIN own USING (g) GROUP BY 1
        """,
        "purchase_state_pit": r"""
            WITH ordered AS (
              SELECT user_id, ts, event_id, event_type,
                     CASE WHEN event_type IS DISTINCT FROM
                               lag(event_type) OVER w
                          THEN 1 ELSE 0 END AS chg
              FROM events WHERE ts IS NOT NULL AND event_type <> 'purchase'
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), seg AS (
              SELECT user_id, ts, event_type,
                     sum(chg) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING
                     )::BIGINT AS seg_no
              FROM ordered
            ), isl AS (
              SELECT user_id, seg_no, event_type, min(ts) AS ts_start
              FROM seg GROUP BY user_id, seg_no, event_type
            ), pick AS (
              SELECT p.event_id, p.user_id, i.seg_no,
                     i.event_type AS state,
                     row_number() OVER (
                       PARTITION BY p.event_id
                       ORDER BY i.ts_start DESC, i.seg_no DESC
                     ) AS rn
              FROM (SELECT event_id, user_id, ts FROM events
                    WHERE ts IS NOT NULL AND event_type = 'purchase') p
              JOIN isl i
                ON i.user_id = p.user_id AND i.ts_start <= p.ts
            )
            SELECT event_id, user_id, seg_no, state FROM pick WHERE rn = 1
        """,
        "text_token_counts": r"""
            SELECT doc_id,
                   len(regexp_split_to_array(text, '\s+'))::BIGINT AS n_tokens
            FROM documents
        """,
        "text_quality": r"""
            SELECT doc_id,
                   length(text)::BIGINT AS n_chars_m,
                   len(regexp_extract_all(text, '[^\p{L}\p{N}_\s]'))::BIGINT AS n_punct,
                   len(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x <> ''))::BIGINT AS n_words,
                   len(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x IN """ + _STOP_LIST_SQL + r"""))::BIGINT AS n_stopwords
            FROM documents
        """,
        "text_normalized": r"""
            WITH n AS (
              SELECT doc_id,
                     nfc_normalize(regexp_replace(
                       regexp_replace(lower(text), '\s+', ' ', 'g'),
                       '^\s+|\s+$', '', 'g')) AS norm_text
              FROM documents
            )
            SELECT n.doc_id, n.norm_text, (n.norm_text <> d.text) AS changed
            FROM n JOIN documents d ON n.doc_id = d.doc_id
        """,
        "doc_fingerprints": """
            SELECT doc_id, md5(lower(text)) AS fingerprint FROM documents
        """,
        "sample_per_source": """
            SELECT source, doc_id, rank FROM (
              SELECT source, doc_id,
                     row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5(doc_id || ':sample-v1'), doc_id
                     )::BIGINT AS rank
              FROM documents
            ) WHERE rank <= 5
        """,
        "latest_event_per_user": """
            SELECT user_id, event_id AS last_event_id,
                   epoch_us(ts)::BIGINT AS last_ts_us,
                   event_type AS last_event_type
            FROM (
              SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
              FROM events WHERE ts IS NOT NULL
            ) WHERE rn = 1
        """,
        "mix_sources": """
            SELECT doc_id, source, bucket, rate_permille FROM (
              SELECT doc_id, source,
                     ('0x' || substr(md5(doc_id || ':mix-v1'), 1, 8))::BIGINT
                       % 1000 AS bucket,
                     100 + ('0x' || substr(md5(source || ':rate-v1'), 1, 4))::BIGINT
                       % 900 AS rate_permille
              FROM documents
            ) WHERE bucket < rate_permille
        """,
        "export_events_partitioned": """
            SELECT event_type, count(*)::BIGINT AS n_rows
            FROM events GROUP BY event_type
        """,
        "compact_events_export": """
            SELECT event_type, count(*)::BIGINT AS n_rows
            FROM events GROUP BY event_type
        """,
        "events_pruned_scan": """
            WITH b AS (
              SELECT epoch_us(min(ts)) AS lo, epoch_us(max(ts)) AS hi
              FROM events WHERE ts IS NOT NULL
            )
            SELECT event_type, count(*)::BIGINT AS n_rows
            FROM events, b
            WHERE ts IS NOT NULL
              AND epoch_us(ts) >= b.lo + (b.hi - b.lo) * 4 // 10
              AND epoch_us(ts) <  b.lo + (b.hi - b.lo) * 5 // 10
            GROUP BY event_type
        """,
        "export_jsonl_roundtrip": """
            SELECT doc_id, md5(text) AS fingerprint FROM documents
        """,
        "export_csv_roundtrip": """
            SELECT doc_id, md5(text) AS fingerprint FROM documents
        """,
        "vocab_zipf_head": r"""
            WITH c AS (
              SELECT word, count(*)::BIGINT AS n FROM (
                SELECT unnest(regexp_split_to_array(text, '\s+')) AS word
                FROM documents
              ) GROUP BY word
            ), t AS (
              SELECT word, n,
                     row_number() OVER (ORDER BY n DESC, word) AS rank
              FROM c
            )
            SELECT word, n, rank::BIGINT AS rank,
                   sum(n) OVER (ORDER BY rank
                                ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_n
            FROM t WHERE rank <= 100
        """,
        "user_event_type_unpivot": r"""
            SELECT user_id, event_type, count(*)::BIGINT AS n
            FROM events GROUP BY user_id, event_type
        """,
        "copurchase_link_scores": r"""
            WITH p AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
                 e AS (SELECT a.l_partkey AS a, b.l_partkey AS b
                       FROM p a JOIN p b
                         ON a.l_orderkey = b.l_orderkey
                        AND a.l_partkey < b.l_partkey
                       GROUP BY 1, 2 HAVING count(*) >= 2),
                 bi AS (SELECT a AS u, b AS v FROM e
                        UNION ALL SELECT b, a FROM e),
                 deg AS (SELECT u, count(*)::BIGINT AS d FROM bi GROUP BY u),
                 com AS (
                   SELECT e.a, e.b, count(*)::BIGINT AS c
                   FROM e JOIN bi x ON x.u = e.a
                          JOIN bi y ON y.u = e.b AND y.v = x.v
                   GROUP BY e.a, e.b
                 )
            SELECT e.a, e.b,
                   coalesce(com.c, 0)::BIGINT AS n_common,
                   (da.d + db.d - 2 - coalesce(com.c, 0))::BIGINT AS n_union
            FROM e
            JOIN deg da ON da.u = e.a
            JOIN deg db ON db.u = e.b
            LEFT JOIN com ON com.a = e.a AND com.b = e.b
        """,
        "embedding_covariance": r"""
            WITH u AS (
              SELECT vec_id, i,
                     floor(e[i]::DOUBLE * 10000)::BIGINT AS q
              FROM (SELECT vec_id, embedding AS e FROM embeddings),
                   unnest(range(1, len(e) + 1)) AS r(i)
            ), s AS (
              SELECT i, sum(q) AS sq, count(*) AS n FROM u GROUP BY i
            ), p AS (
              SELECT a.i AS i, b.i AS j, sum(a.q * b.q) AS spq
              FROM u a JOIN u b ON a.vec_id = b.vec_id AND a.i <= b.i
              GROUP BY a.i, b.i
            )
            SELECT p.i::BIGINT AS i, p.j::BIGINT AS j,
                   (sa.n * p.spq - sa.sq * sb.sq)::BIGINT AS cov_num,
                   sa.n::BIGINT AS n
            FROM p JOIN s sa ON sa.i = p.i JOIN s sb ON sb.i = p.j
        """,
        "bloom_join_urgent_lineitems": r"""
            SELECT o.o_orderstatus,
                   count(*)::BIGINT AS n_items,
                   round(sum(CAST(floor(
                     l.l_extendedprice * (1.0 - l.l_discount) * 100.0)
                     AS BIGINT)) / 100.0, 2) AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderpriority = '1-URGENT'
              AND o.o_totalprice > 400000.0
            GROUP BY o.o_orderstatus
            ORDER BY o.o_orderstatus
        """,
        "bucketed_join_orders_customer": r"""
            WITH ob AS (
              SELECT ('0x' || substr(md5(o_custkey::VARCHAR), 1, 8))::BIGINT % 8
                       AS bucket, o_custkey
              FROM orders
            ), cb AS (
              SELECT ('0x' || substr(md5(c_custkey::VARCHAR), 1, 8))::BIGINT % 8
                       AS bucket, c_custkey
              FROM customer
            ), j AS (
              SELECT ob.bucket, count(*)::BIGINT AS n_joined
              FROM ob JOIN cb ON ob.o_custkey = cb.c_custkey
              GROUP BY ob.bucket
            )
            SELECT b.bucket,
                   coalesce(o.n, 0)::BIGINT AS n_orders,
                   coalesce(c.n, 0)::BIGINT AS n_customers,
                   coalesce(j.n_joined, 0)::BIGINT AS n_joined
            FROM (SELECT unnest(range(0, 8)) AS bucket) b
            LEFT JOIN (SELECT bucket, count(*) AS n FROM ob GROUP BY bucket) o
              USING (bucket)
            LEFT JOIN (SELECT bucket, count(*) AS n FROM cb GROUP BY bucket) c
              USING (bucket)
            LEFT JOIN j USING (bucket)
        """,
        "events_robust_outliers": r"""
            WITH v AS (
              SELECT event_id, event_type,
                     floor(value * 100)::BIGINT AS cents
              FROM events WHERE value IS NOT NULL
            ), m AS (
              SELECT event_type, quantile_disc(cents, 0.5) AS med
              FROM v GROUP BY event_type
            ), s AS (
              SELECT v.event_type,
                     quantile_disc(abs(v.cents - m.med), 0.5) AS mad,
                     min(m.med) AS med
              FROM v JOIN m USING (event_type)
              GROUP BY v.event_type
            )
            SELECT v.event_id, v.event_type, v.cents
            FROM v JOIN s USING (event_type)
            WHERE abs(v.cents - s.med) > 5 * s.mad
        """,
        "validate_orders": r"""
            SELECT 'custkey_fk_customer' AS check,
                   (SELECT count(*) FROM orders o
                    WHERE NOT EXISTS (SELECT 1 FROM customer c
                                      WHERE c.c_custkey = o.o_custkey)
                   )::BIGINT AS n_violations
            UNION ALL
            SELECT 'custkey_not_null',
                   (SELECT count(*) FROM orders WHERE o_custkey IS NULL)::BIGINT
            UNION ALL
            SELECT 'orderkey_unique',
                   (SELECT coalesce(sum(n - 1), 0) FROM (
                      SELECT count(*) AS n FROM orders GROUP BY o_orderkey
                   ))::BIGINT
            UNION ALL
            SELECT 'totalprice_positive',
                   (SELECT count(*) FROM orders WHERE o_totalprice <= 0)::BIGINT
            UNION ALL
            SELECT 'totalprice_suspicious_high',
                   (SELECT count(*) FROM orders
                    WHERE o_totalprice > 450000)::BIGINT
        """,
        "orders_merge_changelog": r"""
            WITH base AS (
              SELECT o_orderkey, floor(o_totalprice * 100)::BIGINT AS cents
              FROM orders
            )
            SELECT o_orderkey, cents FROM (
              SELECT o_orderkey, cents FROM base
              WHERE o_orderkey % 10 NOT IN (0, 1)
              UNION ALL
              SELECT o_orderkey, cents + 100 FROM base WHERE o_orderkey % 10 = 0
              UNION ALL
              SELECT o_orderkey + 1000000000, cents FROM base
              WHERE o_orderkey % 10 = 2
            )
        """,
        "event_type_audience_overlap": r"""
            WITH du AS (
              SELECT DISTINCT event_type, user_id FROM events
            )
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   count(DISTINCT a.user_id)::BIGINT AS n_common
            FROM du a JOIN du b USING (user_id)
            WHERE a.event_type < b.event_type
            GROUP BY a.event_type, b.event_type
        """,
        "events_rolling_wau": r"""
            WITH du AS (
              SELECT DISTINCT date_trunc('day', ts) AS day, user_id
              FROM events WHERE ts IS NOT NULL
            ), days AS (SELECT DISTINCT day FROM du)
            SELECT d.day, count(DISTINCT du.user_id)::BIGINT AS wau
            FROM days d JOIN du
              ON du.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
            GROUP BY d.day
        """,
        "export_jsonl_gz_roundtrip": """
            SELECT doc_id, md5(text) AS fingerprint FROM documents
        """,
        "shuffle_shards_docs": """
            WITH h AS (
              SELECT doc_id,
                     ('0x' || substr(md5(doc_id || ':shuffle-v1'), 1, 12))::BIGINT
                       AS key
              FROM documents
            )
            SELECT doc_id, key % 16 AS shard,
                   (row_number() OVER (
                      PARTITION BY key % 16 ORDER BY key, doc_id) - 1)::BIGINT
                     AS pos
            FROM h
        """,
        "unigram_rarity_scores": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 x -> x <> '') AS t
              FROM documents
            ),
            tf AS (
              SELECT doc_id, u.term AS term, count(*)::BIGINT AS tf
              FROM toks, unnest(t) AS u(term)
              GROUP BY doc_id, u.term
            ),
            g AS (SELECT term, sum(tf)::BIGINT AS n FROM tf GROUP BY term),
            tot AS (SELECT sum(n)::BIGINT AS total FROM g)
            SELECT tf.doc_id,
                   sum(tf.tf)::BIGINT AS n_tokens,
                   sum(tf.tf * ((tot.total * 1000000) // g.n))::BIGINT
                     AS rarity_sum,
                   (sum(tf.tf * ((tot.total * 1000000) // g.n))
                      // sum(tf.tf))::BIGINT AS avg_rarity
            FROM tf JOIN g USING (term) CROSS JOIN tot
            GROUP BY tf.doc_id
        """,
        "inverted_index": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 x -> x <> '') AS t
              FROM documents
            ),
            pairs AS (
              SELECT DISTINCT doc_id, u.term AS term
              FROM toks, unnest(t) AS u(term)
            ),
            ranked AS (
              SELECT term, doc_id,
                     row_number() OVER (
                       PARTITION BY term ORDER BY doc_id) AS rn
              FROM pairs
            )
            SELECT term, count(*)::BIGINT AS df,
                   string_agg(CASE WHEN rn <= 100 THEN doc_id::VARCHAR END,
                              ',' ORDER BY doc_id) AS postings
            FROM ranked GROUP BY term
        """,
        "copurchase_edges": """
            WITH p AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
            SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                   count(*)::BIGINT AS co_count
            FROM p a JOIN p b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
        """,
        "user_funnel": """
            WITH f AS (
              SELECT user_id,
                     min(CASE WHEN event_type = 'view'     THEN ts END) AS v,
                     min(CASE WHEN event_type = 'click'    THEN ts END) AS c,
                     min(CASE WHEN event_type = 'purchase' THEN ts END) AS p
              FROM events GROUP BY user_id
            )
            SELECT user_id,
                   (CASE WHEN v IS NULL THEN 0
                         WHEN c IS NULL OR c <= v THEN 1
                         WHEN p IS NULL OR p <= c THEN 2
                         ELSE 3 END)::BIGINT AS funnel_stage
            FROM f
        """,
        "event_type_transitions": """
            SELECT from_type, to_type, count(*)::BIGINT AS n FROM (
              SELECT event_type AS from_type,
                     lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS to_type
              FROM events WHERE ts IS NOT NULL
            ) WHERE to_type IS NOT NULL
            GROUP BY from_type, to_type
        """,
        "copurchase_assoc": """
            WITH p AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
                 c AS (SELECT l_partkey, count(*)::BIGINT AS n
                       FROM p GROUP BY l_partkey),
                 e AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                              count(*)::BIGINT AS co_count
                       FROM p a JOIN p b
                         ON a.l_orderkey = b.l_orderkey
                        AND a.l_partkey < b.l_partkey
                       GROUP BY 1, 2)
            SELECT e.part_a, e.part_b, e.co_count,
                   ca.n AS n_a, cb.n AS n_b
            FROM e JOIN c ca ON ca.l_partkey = e.part_a
                   JOIN c cb ON cb.l_partkey = e.part_b
        """,
        "copurchase_degree_distribution": """
            WITH p AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
                 e AS (SELECT a.l_partkey AS a, b.l_partkey AS b
                       FROM p a JOIN p b
                         ON a.l_orderkey = b.l_orderkey
                        AND a.l_partkey < b.l_partkey
                       GROUP BY 1, 2),
                 d AS (SELECT node, count(*)::BIGINT AS degree FROM (
                         SELECT a AS node FROM e
                         UNION ALL SELECT b AS node FROM e
                       ) GROUP BY node)
            SELECT degree, count(*)::BIGINT AS n_nodes
            FROM d GROUP BY degree
        """,
        "copurchase_triangles": """
            WITH p AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
                 e AS (SELECT a.l_partkey AS a, b.l_partkey AS b
                       FROM p a JOIN p b
                         ON a.l_orderkey = b.l_orderkey
                        AND a.l_partkey < b.l_partkey
                       GROUP BY 1, 2)
            SELECT e1.a AS node, count(*)::BIGINT AS n_triangles
            FROM e e1
            JOIN e e2 ON e2.a = e1.b
            JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
            GROUP BY e1.a
        """,
        "length_filter_quantile": r"""
            WITH c AS (
              SELECT doc_id,
                     len(regexp_split_to_array(text, '\s+'))::BIGINT AS n_tokens
              FROM documents
            ),
            b AS (
              SELECT quantile_cont(n_tokens, 0.05) AS lo,
                     quantile_cont(n_tokens, 0.95) AS hi
              FROM c
            )
            SELECT doc_id, n_tokens
            FROM c, b WHERE n_tokens >= lo AND n_tokens <= hi
        """,
        "pii_scan": r"""
            SELECT doc_id,
                   len(regexp_extract_all(text, '[\w.+-]+@[\w-]+\.[\w.-]+'))::BIGINT AS n_email,
                   len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))::BIGINT AS n_ipv4,
                   len(regexp_extract_all(text, '\+?\d[\d()\s-]{7,}\d'))::BIGINT AS n_phone,
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(text,
                         '[\w.+-]+@[\w-]+\.[\w.-]+', '<EMAIL>', 'g'),
                       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
                     '\+?\d[\d()\s-]{7,}\d', '<PHONE>', 'g') AS redacted
            FROM documents
        """,
        "tfidf_top_terms": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 x -> x <> '') AS t
              FROM documents
            ),
            tf AS (
              SELECT doc_id, u.term AS term, count(*)::BIGINT AS tf
              FROM toks, unnest(t) AS u(term)
              GROUP BY doc_id, u.term
            ),
            dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
            n AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
            scored AS (
              SELECT tf.doc_id, tf.term, tf.tf,
                     -- integer idf: // is safe here (operands positive)
                     (tf.tf * ((n.n_docs * 1000000) // dfreq.df))::BIGINT AS score
              FROM tf JOIN dfreq USING (term) CROSS JOIN n
            )
            SELECT doc_id, rank::BIGINT AS rank, term, tf, score FROM (
              SELECT *, row_number() OVER (
                PARTITION BY doc_id ORDER BY score DESC, term) AS rank
              FROM scored
            ) WHERE rank <= 3
        """,
        "doc_chunks": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 x -> x <> '') AS t
              FROM documents
            ),
            nc AS (
              SELECT doc_id, t, len(t) AS n,
                     -- add-then-floor ceil: DuckDB // truncates toward
                     -- zero, so only non-negative operands are safe
                     CASE WHEN len(t) = 0 THEN 0
                          ELSE 1 + (greatest(0, len(t) - 32) + 23) // 24
                     END AS n_chunks
              FROM toks
            )
            SELECT doc_id, i AS chunk_id,
                   least(n - i*24, 32)::BIGINT AS n_tokens,
                   array_to_string(t[i*24 + 1 : i*24 + least(n - i*24, 32)],
                                   ' ') AS chunk_text
            FROM nc, unnest(range(0, CAST(n_chunks AS BIGINT))) AS u(i)
        """,
        "word_topk_approx": r"""
            SELECT rank, word, n FROM (
              SELECT word, n,
                     row_number() OVER (ORDER BY n DESC, word)::BIGINT AS rank
              FROM (
                SELECT word, count(*)::BIGINT AS n FROM (
                  SELECT unnest(regexp_split_to_array(text, '\s+')) AS word
                  FROM documents
                ) GROUP BY word
              )
            ) WHERE rank <= 20
        """,
        "top_terms_per_lang": r"""
            WITH wc AS (
              SELECT lang, word, count(*)::BIGINT AS n FROM (
                SELECT lang, unnest(regexp_split_to_array(text, '\s+')) AS word
                FROM documents
              ) GROUP BY lang, word
            )
            SELECT lang, word, n, rank FROM (
              SELECT lang, word, n,
                     row_number() OVER (
                       PARTITION BY lang ORDER BY n DESC, word)::BIGINT AS rank
              FROM wc
            ) WHERE rank <= 5
        """,
        "word_count_global": r"""
            SELECT word, count(*)::BIGINT AS n FROM (
              SELECT unnest(regexp_split_to_array(text, '\s+')) AS word
              FROM documents
            ) GROUP BY word
        """,
        "train_val_test_split": """
            SELECT doc_id, bucket,
                   CASE WHEN bucket < 5 THEN 'test'
                        WHEN bucket < 10 THEN 'val'
                        ELSE 'train' END AS split
            FROM (
              SELECT doc_id,
                     ('0x' || substr(md5(doc_id || ':split-v1'), 1, 8))::BIGINT
                       % 100 AS bucket
              FROM documents
            )
        """,
        "llm_corpus_prep": r"""
            WITH c AS (
              SELECT doc_id,
                     len(regexp_split_to_array(text, '\s+'))::BIGINT AS n_tokens
              FROM documents
            ),
            b AS (
              SELECT quantile_cont(n_tokens, 0.05) AS lo,
                     quantile_cont(n_tokens, 0.95) AS hi
              FROM c
            ),
            k AS (
              SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
            ),
            toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 x -> x <> '') AS t
              FROM documents
            ),
            sh AS (
              SELECT doc_id,
                     CASE
                       WHEN len(t) = 0 THEN []::VARCHAR[]
                       WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                       ELSE list_distinct(list_transform(range(1, len(t) - 1),
                                          i -> array_to_string(t[i:i+2], ' ')))
                     END AS s
              FROM toks
            ),
            bench AS (
              SELECT list_distinct(flatten(list(s))) AS bs FROM sh WHERE doc_id < 10
            ),
            cont AS (
              SELECT doc_id FROM sh CROSS JOIN bench
              WHERE doc_id >= 10 AND len(s) > 0
                AND len(list_intersect(s, bs)) * 5 >= len(s)
            )
            SELECT c.doc_id, c.n_tokens,
                   CASE WHEN ('0x' || substr(md5(c.doc_id || ':split-v1'), 1, 8))::BIGINT
                             % 100 < 5 THEN 'test'
                        WHEN ('0x' || substr(md5(c.doc_id || ':split-v1'), 1, 8))::BIGINT
                             % 100 < 10 THEN 'val'
                        ELSE 'train' END AS split
            FROM c, b
            WHERE c.doc_id >= 10
              AND c.n_tokens >= b.lo AND c.n_tokens <= b.hi
              AND c.doc_id IN (SELECT doc_id FROM k)
              AND c.doc_id NOT IN (SELECT doc_id FROM cont)
        """,
        "dedup_exact_documents": """
            SELECT md5(text) AS fingerprint,
                   min(doc_id)::BIGINT AS doc_id,
                   count(*)::BIGINT    AS n_dupes
            FROM documents GROUP BY md5(text)
        """,
        "embedding_centroids": """
            SELECT vec_id % 8 AS grp, i AS dim,
                   round(avg(embedding[i+1]::DOUBLE), 6) AS centroid
            FROM embeddings, range(0, 64) r(i)
            GROUP BY grp, i
        """,
        "embedding_neardup": """
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
            FROM (SELECT vec_id, embedding::DOUBLE[] e FROM embeddings) a,
                 (SELECT vec_id, embedding::DOUBLE[] e FROM embeddings) b
            WHERE a.vec_id < b.vec_id
              AND list_cosine_similarity(a.e, b.e) >= 0.35
        """,
        "ann_topk": """
            SELECT query_id, neighbor_id, rank FROM (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                     row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(q.e, c.e) DESC,
                                c.vec_id ASC) AS rank
              FROM (SELECT vec_id, embedding::DOUBLE[] e FROM embeddings
                    WHERE vec_id < 5) q,
                   (SELECT vec_id, embedding::DOUBLE[] e FROM embeddings) c
              WHERE q.vec_id <> c.vec_id
            ) WHERE rank <= 10
        """,
        "ann_topk_filtered": """
            SELECT query_id, neighbor_id, rank FROM (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                     row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(q.e, c.e) DESC,
                                c.vec_id ASC) AS rank
              FROM (SELECT vec_id, embedding::DOUBLE[] e FROM embeddings
                    WHERE vec_id < 5) q,
                   (SELECT vec_id, embedding::DOUBLE[] e FROM embeddings
                    WHERE label = 1) c
              WHERE q.vec_id <> c.vec_id
            ) WHERE rank <= 10
        """,
        "orders_cube": """
            SELECT o_orderstatus, o_orderpriority,
                   round(sum(o_totalprice), 2) AS total_price,
                   count(*)::BIGINT AS n_orders
            FROM orders
            GROUP BY CUBE(o_orderstatus, o_orderpriority)
        """,
        "orders_grouping_sets": """
            SELECT o_orderstatus, o_orderpriority,
                   CASE WHEN GROUPING(date_part('year', o_orderdate)) = 0
                        THEN date_part('year', o_orderdate)::BIGINT
                        ELSE NULL END AS o_year,
                   round(sum(o_totalprice), 2) AS total_price,
                   count(*)::BIGINT AS n_orders
            FROM orders
            GROUP BY GROUPING SETS (
                (o_orderstatus, date_part('year', o_orderdate)),
                (o_orderpriority),
                ()
            )
        """,
        "events_value_stats": """
            SELECT event_type,
                   count(*)::BIGINT AS n_events,
                   sum(CAST(floor(value * 100) AS BIGINT))::BIGINT AS sum_cents,
                   round(stddev_samp(CAST(floor(value * 100) AS BIGINT)), 4)
                     AS stddev_cents
            FROM events WHERE value IS NOT NULL
            GROUP BY event_type
        """,
        "revenue_by_nation_year": """
            SELECT n.n_name,
                   date_part('year', o.o_orderdate)::BIGINT AS o_year,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
            FROM lineitem l
            JOIN orders o   ON l.l_orderkey = o.o_orderkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n   ON s.s_nationkey = n.n_nationkey
            GROUP BY n.n_name, o_year
        """,
        "users_view_and_purchase": """
            SELECT user_id FROM events WHERE event_type = 'view'
            INTERSECT
            SELECT user_id FROM events WHERE event_type = 'purchase'
        """,
        "orders_date_dense_rank": """
            SELECT o_custkey, o_orderkey,
                   dense_rank() OVER (
                     PARTITION BY o_custkey ORDER BY o_orderdate)::BIGINT AS rank
            FROM orders
        """,
        "orders_above_customer_avg": """
            WITH a AS (
              SELECT o_custkey,
                     sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS s,
                     count(*)::BIGINT AS n
              FROM orders GROUP BY o_custkey
            )
            SELECT o.o_orderkey, o.o_custkey
            FROM orders o JOIN a USING (o_custkey)
            WHERE CAST(floor(o.o_totalprice * 100) AS BIGINT) * a.n > a.s
        """,
        "part_name_first_word_stats": """
            SELECT split_part(p_name, ' ', 1) AS word,
                   count(*)::BIGINT AS n_parts,
                   round(sum(p_retailprice), 2) AS sum_price
            FROM part GROUP BY word
        """,
        "events_first_last_value": """
            SELECT user_id,
                   CAST(floor(first(value ORDER BY ts, event_id) * 100) AS BIGINT)
                     AS first_cents,
                   CAST(floor(last(value ORDER BY ts, event_id) * 100) AS BIGINT)
                     AS last_cents,
                   count(*)::BIGINT AS n_events
            FROM events WHERE ts IS NOT NULL
            GROUP BY user_id
        """,
        "events_p50_disc": """
            SELECT event_type,
                   CAST(floor(quantile_disc(value, 0.5) * 100) AS BIGINT)
                     AS p50_cents
            FROM events WHERE value IS NOT NULL
            GROUP BY event_type
        """,
        "text_bpe_token_counts": r"""
            SELECT doc_id,
                   len(regexp_extract_all(
                     text, ' ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+'
                   ))::BIGINT AS n_bpe_tokens
            FROM documents
        """,
        "jaccard_dup_components": r"""
            WITH RECURSIVE toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 x -> x <> '') AS t
              FROM documents
            ),
            sh AS (
              SELECT doc_id,
                     CASE
                       WHEN len(t) = 0 THEN []::VARCHAR[]
                       WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                       ELSE list_distinct(list_transform(range(1, len(t) - 1),
                                          i -> array_to_string(t[i:i+2], ' ')))
                     END AS s
              FROM toks
            ),
            e AS (
              SELECT a.doc_id AS s, b.doc_id AS t
              FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              WHERE len(a.s) > 0 AND len(b.s) > 0
                AND len(list_intersect(a.s, b.s)) * 10
                    >= 3 * (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
            ),
            sym AS (
              SELECT s, t FROM e UNION SELECT t, s FROM e
              UNION SELECT s, s FROM e UNION SELECT t, t FROM e
            ),
            reach(n, m) AS (
              SELECT s, t FROM sym
              UNION
              SELECT r.n, s2.t FROM reach r JOIN sym s2 ON r.m = s2.s
            )
            SELECT n AS doc_id, min(m)::BIGINT AS cluster_id
            FROM reach GROUP BY n
        """,
        "term_cooccurrence": r"""
            WITH toks AS (
              SELECT DISTINCT doc_id, u.term AS term
              FROM (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x <> '') AS t
                FROM documents
              ), unnest(t) AS u(term)
            )
            SELECT a.term AS term_a, b.term AS term_b,
                   count(*)::BIGINT AS n_docs
            FROM toks a JOIN toks b
              ON a.doc_id = b.doc_id AND a.term < b.term
            GROUP BY a.term, b.term
        """,
        "term_pmi": r"""
            WITH toks AS (
              SELECT DISTINCT doc_id, u.term AS term
              FROM (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x <> '') AS t
                FROM documents
              ), unnest(t) AS u(term)
            ),
            df AS (
              SELECT term, count(*)::DOUBLE AS df FROM toks GROUP BY term
            ),
            n AS (SELECT count(DISTINCT doc_id)::DOUBLE AS n FROM toks),
            pairs AS (
              SELECT a.term AS term_a, b.term AS term_b,
                     count(*)::BIGINT AS n_docs
              FROM toks a JOIN toks b
                ON a.doc_id = b.doc_id AND a.term < b.term
              GROUP BY a.term, b.term
              HAVING count(*) >= 5
            )
            SELECT p.term_a, p.term_b, p.n_docs,
                   ln(p.n_docs * n.n / (da.df * db.df)) AS pmi
            FROM pairs p
            JOIN df da ON da.term = p.term_a
            JOIN df db ON db.term = p.term_b
            CROSS JOIN n
        """,
        "supplier_name_neardup": r"""
            SELECT i AS s1, j AS s2, d AS dist FROM (
              SELECT a.s_suppkey AS i, b.s_suppkey AS j,
                     levenshtein(a.s_name, b.s_name)::BIGINT AS d
              FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
              WHERE abs(length(a.s_name) - length(b.s_name)) <= 1
            ) WHERE d <= 1
        """,
        "events_time_range_sum": r"""
            SELECT user_id, event_id,
                   sum(cents) OVER w AS range_cents,
                   count(*) OVER w AS range_n
            FROM (
              SELECT user_id, event_id, ts,
                     floor(value * 100)::BIGINT AS cents
              FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
            )
            WINDOW w AS (
              PARTITION BY user_id ORDER BY ts
              RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
            )
        """,
        "doc_intra_repetition": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 x -> x <> '') AS t
              FROM documents
            ), g AS (
              SELECT doc_id, u.gram
              FROM (
                SELECT doc_id,
                       CASE WHEN len(t) < 3 THEN []::VARCHAR[]
                            ELSE list_transform(range(1, len(t) - 1),
                                   i -> array_to_string(t[i:i+2], ' '))
                       END AS gs
                FROM toks
              ), unnest(gs) AS u(gram)
            ), c AS (
              SELECT doc_id, gram, count(*)::BIGINT AS n
              FROM g GROUP BY doc_id, gram
            )
            SELECT doc_id, sum(n)::BIGINT AS n_grams,
                   sum(CASE WHEN n >= 2 THEN n ELSE 0 END)::BIGINT
                     AS n_dup_grams
            FROM c GROUP BY doc_id
        """,
        "user_retention_cohorts": r"""
            WITH e AS (
              SELECT user_id, date_trunc('week', ts) AS wk
              FROM events WHERE ts IS NOT NULL
            ), f AS (
              SELECT user_id, min(wk) AS cohort_week FROM e GROUP BY user_id
            ), a AS (
              SELECT DISTINCT e.user_id, f.cohort_week,
                     (date_diff('day', f.cohort_week, e.wk) // 7)::BIGINT
                       AS week_offset
              FROM e JOIN f USING (user_id)
            )
            SELECT cohort_week, week_offset, count(*)::BIGINT AS n_active
            FROM a GROUP BY cohort_week, week_offset
        """,
        "orders_zorder_layout": r"""
            WITH b AS (
              SELECT o_orderkey,
                     least(greatest(floor(o_totalprice / 2500)::BIGINT, 0), 255) AS p,
                     least(greatest(
                       date_diff('day', TIMESTAMP '1992-01-01', o_orderdate) // 10,
                       0), 255) AS d
              FROM orders
            ), z AS (
              SELECT o_orderkey,
                     ((((p >> 0) & 1) << 0)
                 | (((d >> 0) & 1) << 1)
                 | (((p >> 1) & 1) << 2)
                 | (((d >> 1) & 1) << 3)
                 | (((p >> 2) & 1) << 4)
                 | (((d >> 2) & 1) << 5)
                 | (((p >> 3) & 1) << 6)
                 | (((d >> 3) & 1) << 7)
                 | (((p >> 4) & 1) << 8)
                 | (((d >> 4) & 1) << 9)
                 | (((p >> 5) & 1) << 10)
                 | (((d >> 5) & 1) << 11)
                 | (((p >> 6) & 1) << 12)
                 | (((d >> 6) & 1) << 13)
                 | (((p >> 7) & 1) << 14)
                 | (((d >> 7) & 1) << 15))::BIGINT AS zcell
              FROM b
            )
            SELECT o_orderkey, zcell, (zcell >> 10)::BIGINT AS shard FROM z
        """,
        "events_value_mad": r"""
            WITH v AS (
              SELECT event_type, floor(value * 100)::BIGINT AS cents
              FROM events WHERE value IS NOT NULL
            ), m AS (
              SELECT event_type, quantile_disc(cents, 0.5) AS med
              FROM v GROUP BY event_type
            )
            SELECT v.event_type,
                   min(m.med)::BIGINT AS med_cents,
                   quantile_disc(abs(v.cents - m.med), 0.5)::BIGINT AS mad_cents
            FROM v JOIN m USING (event_type)
            GROUP BY v.event_type
        """,
        "user_state_islands": r"""
            WITH ordered AS (
              SELECT user_id, ts, event_id, event_type,
                     CASE WHEN event_type IS DISTINCT FROM
                               lag(event_type) OVER w
                          THEN 1 ELSE 0 END AS chg
              FROM events WHERE ts IS NOT NULL
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), seg AS (
              SELECT user_id, ts, event_type,
                     sum(chg) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING
                     )::BIGINT AS seg_no
              FROM ordered
            )
            SELECT user_id, seg_no, event_type,
                   min(ts) AS ts_start, max(ts) AS ts_end,
                   count(*)::BIGINT AS n_rows
            FROM seg GROUP BY user_id, seg_no, event_type
        """,
        "supplier_entity_resolution": r"""
            WITH RECURSIVE p AS (
              SELECT i AS s, j AS t FROM (
                SELECT a.s_suppkey AS i, b.s_suppkey AS j,
                       levenshtein(a.s_name, b.s_name)::BIGINT AS d
                FROM supplier a JOIN supplier b
                  ON a.s_suppkey < b.s_suppkey
                WHERE abs(length(a.s_name) - length(b.s_name)) <= 1
              ) WHERE d <= 1
            ),
            sym AS (
              SELECT s, t FROM p UNION SELECT t, s FROM p
              UNION SELECT s, s FROM p UNION SELECT t, t FROM p
            ),
            reach(n, m) AS (
              SELECT s, t FROM sym
              UNION
              SELECT r.n, s2.t FROM reach r JOIN sym s2 ON r.m = s2.s
            ),
            cmap AS (SELECT n, min(m) AS c FROM reach GROUP BY n)
            SELECT s.s_suppkey,
                   coalesce(cmap.c, s.s_suppkey)::BIGINT AS canon_id
            FROM supplier s LEFT JOIN cmap ON cmap.n = s.s_suppkey
        """,
        "events_value_corr": r"""
            SELECT event_type, n,
                   CASE WHEN sqrt((n::DOUBLE * sxx - sx::DOUBLE * sx)
                               * (n::DOUBLE * syy - sy::DOUBLE * sy)) = 0.0
                        THEN NULL
                        ELSE (n::DOUBLE * sxy - sx::DOUBLE * sy)
                             / sqrt((n::DOUBLE * sxx - sx::DOUBLE * sx)
                                  * (n::DOUBLE * syy - sy::DOUBLE * sy))
                   END AS corr_value_hour
            FROM (
              SELECT event_type, count(*)::BIGINT AS n,
                     sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
                     sum(x*y)::BIGINT AS sxy, sum(x*x)::BIGINT AS sxx,
                     sum(y*y)::BIGINT AS syy
              FROM (
                SELECT event_type,
                       floor(value * 100)::BIGINT AS x,
                       extract(hour FROM ts)::BIGINT AS y
                FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
              ) GROUP BY event_type
            )
        """,
        "customer_priority_mode": r"""
            SELECT o_custkey, o_orderpriority AS top_priority,
                   n AS n_orders
            FROM (
              SELECT o_custkey, o_orderpriority, n,
                     row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY n DESC, o_orderpriority
                     ) AS rn
              FROM (
                SELECT o_custkey, o_orderpriority, count(*)::BIGINT AS n
                FROM orders GROUP BY 1, 2
              )
            ) WHERE rn = 1
        """,
        "nation_top_suppliers": r"""
            SELECT s_nationkey,
                   string_agg(s_name, ','
                              ORDER BY s_acctbal DESC, s_name)
                     AS top_suppliers
            FROM (
              SELECT s_nationkey, s_name, s_acctbal,
                     row_number() OVER (
                       PARTITION BY s_nationkey
                       ORDER BY s_acctbal DESC, s_name
                     ) AS rn
              FROM supplier
            ) WHERE rn <= 3 GROUP BY s_nationkey
        """,
        "user_days_view_not_purchase": r"""
            SELECT user_id, epoch_us(ts) // 86400000000 AS day
            FROM events WHERE event_type = 'view' AND ts IS NOT NULL
            EXCEPT
            SELECT user_id, epoch_us(ts) // 86400000000 AS day
            FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
        """,
        "events_p50_cont": r"""
            SELECT event_type,
                   quantile_cont(value::DOUBLE, 0.5) AS p50_value
            FROM events WHERE value IS NOT NULL
            GROUP BY event_type
        """,
        "events_value_percentiles_exact": r"""
            WITH c AS (
              SELECT CAST(floor(value * 100) AS BIGINT) AS cents
              FROM events WHERE value IS NOT NULL
            )
            SELECT 25::BIGINT AS q_pct,
                   quantile_disc(cents, 0.25)::BIGINT AS value_cents FROM c
            UNION ALL SELECT 50, quantile_disc(cents, 0.50)::BIGINT FROM c
            UNION ALL SELECT 90, quantile_disc(cents, 0.90)::BIGINT FROM c
            UNION ALL SELECT 99, quantile_disc(cents, 0.99)::BIGINT FROM c
        """,
        "events_value_quartile_bins": r"""
            WITH c AS (
              SELECT CAST(floor(value * 100) AS BIGINT) AS cents
              FROM events WHERE value IS NOT NULL
            ), e AS (
              SELECT quantile_disc(cents, 0.25) AS q1,
                     quantile_disc(cents, 0.50) AS q2,
                     quantile_disc(cents, 0.75) AS q3
              FROM c
            )
            SELECT CASE WHEN cents <= q1 THEN 0
                        WHEN cents <= q2 THEN 1
                        WHEN cents <= q3 THEN 2
                        ELSE 3 END::BIGINT AS bin,
                   count(*)::BIGINT AS n
            FROM c, e GROUP BY 1
        """,
        "documents_global_ordinals": r"""
            SELECT doc_id,
                   (ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) - 1)::BIGINT
                     AS ordinal
            FROM documents
        """,
        "user_longest_streak": r"""
            WITH d AS (
              SELECT DISTINCT user_id,
                     epoch_us(ts) // 86400000000 AS day
              FROM events WHERE ts IS NOT NULL
            ), isl AS (
              SELECT user_id, day,
                     day - ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY day) AS grp
              FROM d
            ), runs AS (
              SELECT user_id, count(*)::BIGINT AS run_len
              FROM isl GROUP BY user_id, grp
            )
            SELECT r.user_id,
                   max(r.run_len)::BIGINT AS longest_streak,
                   n.n_active_days
            FROM runs r
            JOIN (SELECT user_id, count(*)::BIGINT AS n_active_days
                  FROM d GROUP BY user_id) n USING (user_id)
            GROUP BY r.user_id, n.n_active_days
        """,
        "peak_concurrent_sessions": """
            WITH e AS (
              SELECT user_id, epoch_us(ts) AS us
              FROM events WHERE ts IS NOT NULL
            ),
            f AS (
              SELECT user_id, us,
                     CASE WHEN lag(us) OVER w IS NULL
                            OR us - lag(us) OVER w > 1800000000
                          THEN 1 ELSE 0 END AS new_s
              FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)
            ),
            g AS (
              SELECT user_id, us,
                     sum(new_s) OVER (PARTITION BY user_id ORDER BY us
                                      ROWS UNBOUNDED PRECEDING) AS sess_no
              FROM f
            ),
            s AS (
              SELECT user_id, sess_no, min(us) AS start_us, max(us) AS end_us
              FROM g GROUP BY user_id, sess_no
            ),
            d AS (
              SELECT start_us AS t, 1 AS delta FROM s
              UNION ALL SELECT end_us AS t, -1 AS delta FROM s
            ),
            r AS (
              SELECT t, sum(delta) OVER (ORDER BY t, delta
                                         ROWS UNBOUNDED PRECEDING) AS conc
              FROM d
            )
            SELECT (SELECT max(conc) FROM r)::BIGINT AS peak_concurrency,
                   (SELECT min(t) FROM r
                    WHERE conc = (SELECT max(conc) FROM r))::BIGINT AS at_us
        """,
        "event_props_k_stats": r"""
            SELECT event_type, count(*)::BIGINT AS n_with_k,
                   sum(k)::BIGINT AS sum_k,
                   min(k)::BIGINT AS min_k, max(k)::BIGINT AS max_k
            FROM (
              SELECT event_type,
                     CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
              FROM events WHERE props IS NOT NULL
                AND regexp_matches(props, '"k":\s*-?\d+')
            ) WHERE k IS NOT NULL GROUP BY event_type
        """,
        "window_top_event_types": r"""
            SELECT window_start, event_type, n AS n_events, rn AS "rank"
            FROM (
              SELECT window_start, event_type, n,
                     row_number() OVER (
                       PARTITION BY window_start
                       ORDER BY n DESC, event_type
                     ) AS rn
              FROM (
                SELECT CAST(floor(epoch_us(ts) / 3600000000.0) AS BIGINT)
                         * 3600 AS window_start,
                       event_type, count(*)::BIGINT AS n
                FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
              )
            ) WHERE rn <= 3
        """,
        "window_distinct_users": r"""
            SELECT CAST(floor(epoch_us(ts) / 3600000000.0) AS BIGINT)
                     * 3600 AS window_start,
                   count(DISTINCT user_id)::BIGINT AS n_users
            FROM events WHERE ts IS NOT NULL GROUP BY 1
        """,
        "user_top_event": r"""
            SELECT user_id, event_type AS top_event_type,
                   cents AS max_cents
            FROM (
              SELECT user_id, event_type, cents,
                     row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY cents DESC, event_id
                     ) AS rn
              FROM (
                SELECT user_id, event_id, event_type,
                       floor(value * 100)::BIGINT AS cents
                FROM events WHERE value IS NOT NULL
              )
            ) WHERE rn = 1
        """,
        "doc_feature_hashing": r"""
            SELECT doc_id, dim, count(*)::BIGINT AS n FROM (
              SELECT doc_id,
                     ('0x' || substr(md5('fh-v1:' || word), 1, 8))::BIGINT
                       % 16 AS dim
              FROM (
                SELECT doc_id,
                       unnest(regexp_split_to_array(text, '\s+')) AS word
                FROM documents
              ) WHERE word <> ''
            ) GROUP BY doc_id, dim
        """,
        "incremental_ingest_documents": r"""
            WITH d AS (
              SELECT doc_id, text,
                     ('0x' || substr(md5(doc_id || ':ingest-v1'), 1, 8))
                       ::BIGINT % 2 AS half
              FROM documents
            ),
            fh AS (SELECT text, min(half) AS first_half FROM d GROUP BY text)
            SELECT min(d.doc_id) AS doc_id
            FROM d JOIN fh ON d.text = fh.text AND d.half = fh.first_half
            GROUP BY d.text
        """,
        "containment_pairs": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 x -> x <> '') AS t
              FROM documents
            ),
            sh AS (
              SELECT doc_id,
                     CASE
                       WHEN len(t) = 0 THEN []::VARCHAR[]
                       WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                       ELSE list_distinct(list_transform(range(1, len(t) - 1),
                                          i -> array_to_string(t[i:i+2], ' ')))
                     END AS s
              FROM toks
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   len(list_intersect(a.s, b.s))::BIGINT AS n_inter,
                   len(a.s)::BIGINT AS n_a, len(b.s)::BIGINT AS n_b
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE len(a.s) > 0 AND len(b.s) > 0
              AND len(list_intersect(a.s, b.s)) * 10
                  >= 8 * least(len(a.s), len(b.s))
        """,
        "neardup_keep_best": r"""
            WITH RECURSIVE toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 x -> x <> '') AS t
              FROM documents
            ),
            sh AS (
              SELECT doc_id,
                     CASE
                       WHEN len(t) = 0 THEN []::VARCHAR[]
                       WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                       ELSE list_distinct(list_transform(range(1, len(t) - 1),
                                          i -> array_to_string(t[i:i+2], ' ')))
                     END AS s
              FROM toks
            ),
            e AS (
              SELECT a.doc_id AS s, b.doc_id AS t
              FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              WHERE len(a.s) > 0 AND len(b.s) > 0
                AND len(list_intersect(a.s, b.s)) * 10
                    >= 3 * (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
            ),
            sym AS (
              SELECT s, t FROM e UNION SELECT t, s FROM e
              UNION SELECT s, s FROM e UNION SELECT t, t FROM e
            ),
            reach(n, m) AS (
              SELECT s, t FROM sym
              UNION
              SELECT r.n, s2.t FROM reach r JOIN sym s2 ON r.m = s2.s
            ),
            cl AS (
              SELECT n AS doc_id, min(m)::BIGINT AS cluster_id
              FROM reach GROUP BY n
            ),
            asg AS (
              SELECT d.doc_id, coalesce(cl.cluster_id, d.doc_id) AS cluster_id,
                     length(d.text)::BIGINT AS n_chars
              FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id
            ),
            r AS (
              SELECT cluster_id, doc_id, n_chars,
                     count(*) OVER (PARTITION BY cluster_id)::BIGINT
                       AS cluster_size,
                     row_number() OVER (
                       PARTITION BY cluster_id
                       ORDER BY n_chars DESC, doc_id) AS rn
              FROM asg
            )
            SELECT cluster_id, doc_id, n_chars, cluster_size
            FROM r WHERE rn = 1
        """,
        "doc_unigram_nll": r"""
            WITH tok AS (
              SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS w
              FROM documents
            ), t AS (SELECT doc_id, w FROM tok WHERE w <> ''),
            c AS (SELECT w, count(*)::DOUBLE AS cnt FROM t GROUP BY w),
            n AS (SELECT count(*)::DOUBLE AS total FROM t)
            SELECT t.doc_id, count(*)::BIGINT AS n_tokens,
                   avg(-ln(c.cnt / n.total)) AS nll
            FROM t JOIN c USING (w) CROSS JOIN n GROUP BY t.doc_id
        """,
        "doc_bigram_nll": r"""
            WITH t AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(text, '\s+'),
                                 x -> x <> '') AS a
              FROM documents
            ),
            bg AS (
              SELECT doc_id,
                     unnest([a[i] || ' ' || a[i+1]
                             for i in generate_series(1, len(a) - 1)]) AS bigram,
                     unnest([a[i]
                             for i in generate_series(1, len(a) - 1)]) AS w1
              FROM t
            ),
            cb AS (SELECT bigram, count(*)::DOUBLE AS cb FROM bg GROUP BY bigram),
            cl AS (SELECT w1, count(*)::DOUBLE AS cl FROM bg GROUP BY w1)
            SELECT bg.doc_id, count(*)::BIGINT AS n_bigrams,
                   avg(-ln(cb.cb / cl.cl)) AS nll2
            FROM bg JOIN cb USING (bigram) JOIN cl USING (w1)
            GROUP BY bg.doc_id
        """,
        "events_quantile_bands": """
            SELECT event_type,
                   quantile_cont(value, 0.25) AS p25,
                   quantile_cont(value, 0.50) AS p50,
                   quantile_cont(value, 0.75) AS p75
            FROM events WHERE value IS NOT NULL
            GROUP BY event_type
        """,
        "source_mixture_stats": r"""
            WITH t AS (
              SELECT source, doc_id,
                     len(list_filter(regexp_split_to_array(text, '\s+'),
                                     x -> x <> ''))::BIGINT AS nt
              FROM documents
            ),
            agg AS (
              SELECT source, count(*)::BIGINT AS n_docs,
                     sum(nt)::BIGINT AS n_tokens
              FROM t GROUP BY source
            ),
            tot AS (SELECT sum(n_tokens)::DOUBLE AS total FROM agg)
            SELECT source, n_docs, n_tokens,
                   n_tokens / tot.total AS token_share
            FROM agg, tot
        """,
        "customer_supplier_linkage": r"""
            SELECT c.c_custkey, s.s_suppkey,
                   levenshtein(c.c_name, s.s_name)::BIGINT AS dist
            FROM customer c JOIN supplier s
              ON CAST(CASE WHEN regexp_replace(c.c_name, '[^0-9]', '', 'g') = ''
                           THEN '-1'
                           ELSE regexp_replace(c.c_name, '[^0-9]', '', 'g')
                      END AS BIGINT)
               = CAST(CASE WHEN regexp_replace(s.s_name, '[^0-9]', '', 'g') = ''
                           THEN '-1'
                           ELSE regexp_replace(s.s_name, '[^0-9]', '', 'g')
                      END AS BIGINT)
            WHERE levenshtein(c.c_name, s.s_name) <= 5
        """,
        "copurchase_bfs_hops": r"""
            WITH RECURSIVE e AS (
              SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
              FROM lineitem a JOIN lineitem b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
            ),
            sym AS (
              SELECT pa AS s, pb AS t FROM e
              UNION ALL SELECT pb, pa FROM e
            ),
            src AS (SELECT min(pa) AS v FROM e),
            walk(node, d) AS (
              SELECT v, 0 FROM src
              UNION
              SELECT sym.t, walk.d + 1
              FROM walk JOIN sym ON walk.node = sym.s
              WHERE walk.d < 3
            )
            SELECT node::BIGINT AS node, min(d)::BIGINT AS dist
            FROM walk GROUP BY node
        """,
        "cross_source_dup_matrix": r"""
            WITH d AS (
              SELECT DISTINCT md5(text) AS fp, source FROM documents
            )
            SELECT a.source AS source_a, b.source AS source_b,
                   count(*)::BIGINT AS n_shared
            FROM d a JOIN d b ON a.fp = b.fp AND a.source < b.source
            GROUP BY a.source, b.source
        """,
        "doc_search_and": r"""
            SELECT doc_id FROM (
              SELECT doc_id, count(DISTINCT w) AS n FROM (
                SELECT doc_id,
                       unnest(regexp_split_to_array(lower(text), '\s+')) AS w
                FROM documents
              ) WHERE w IN ('hash', 'join', 'window')
              GROUP BY doc_id
            ) WHERE n = 3
        """,
        "orders_equidepth_histogram": r"""
            WITH q AS (
              SELECT quantile_cont(o_totalprice, 0.25) AS q1,
                     quantile_cont(o_totalprice, 0.50) AS q2,
                     quantile_cont(o_totalprice, 0.75) AS q3
              FROM orders
            )
            SELECT CASE WHEN o_totalprice <= q1 THEN 0
                        WHEN o_totalprice <= q2 THEN 1
                        WHEN o_totalprice <= q3 THEN 2
                        ELSE 3 END::BIGINT AS bucket,
                   count(*)::BIGINT AS n_orders
            FROM orders, q
            GROUP BY 1
        """,
        "weighted_sample_docs": r"""
            SELECT doc_id FROM (
              SELECT doc_id,
                     pow(('0x' || substr(md5(doc_id || ':wsample-v1'), 1, 12))
                           ::BIGINT / 281474976710656.0,
                         1.0 / n_chars) AS k
              FROM documents WHERE n_chars > 0
              ORDER BY k DESC, doc_id LIMIT 100
            )
        """,
        "quality_gate_composite": r"""
            WITH tok AS (
              SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS w
              FROM documents
            ), t AS (SELECT doc_id, w FROM tok WHERE w <> ''),
            c AS (SELECT w, count(*)::BIGINT AS n FROM t GROUP BY w),
            tot AS (SELECT count(*)::DOUBLE AS total FROM t),
            nll AS (
              SELECT t.doc_id,
                     round(avg(-ln(c.n::DOUBLE / tot.total)), 9) AS nll9
              FROM t JOIN c USING (w) CROSS JOIN tot GROUP BY t.doc_id
            ),
            oov AS (
              SELECT t.doc_id,
                     round(sum(CASE WHEN c.n < 3 THEN 1 ELSE 0 END)::DOUBLE
                           / count(*), 9) AS oov9
              FROM t JOIN c USING (w) GROUP BY t.doc_id
            ),
            l AS (
              SELECT doc_id,
                     unnest(string_split(coalesce(text,''), chr(10))) AS line
              FROM documents
            ),
            lg AS (
              SELECT doc_id, line, count(*)::BIGINT AS cnt
              FROM l GROUP BY doc_id, line
            ),
            rep AS (
              SELECT doc_id,
                     (sum(cnt) - count(*))::DOUBLE / sum(cnt) AS dup_line_frac
              FROM lg GROUP BY doc_id
            ),
            th AS (SELECT quantile_cont(nll9, 0.9) AS t_nll FROM nll),
            th2 AS (SELECT quantile_cont(oov9, 0.9) AS t_oov FROM oov)
            SELECT nll.doc_id
            FROM nll JOIN oov USING (doc_id) JOIN rep USING (doc_id), th, th2
            WHERE nll9 <= t_nll AND oov9 <= t_oov AND dup_line_frac <= 0.3
        """,
        "documents_version_diff": r"""
            WITH oldv AS (SELECT doc_id, text FROM documents),
            newv AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 89 = 0 THEN text || ' [edited]'
                          ELSE text END AS text
              FROM documents WHERE doc_id % 97 <> 0
              UNION ALL
              SELECT doc_id + 1000000 AS doc_id,
                     'new doc ' || doc_id AS text
              FROM documents WHERE doc_id % 101 = 0
            )
            SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
                   CASE WHEN o.doc_id IS NULL THEN 'added'
                        WHEN n.doc_id IS NULL THEN 'removed'
                        ELSE 'changed' END AS status
            FROM oldv o FULL OUTER JOIN newv n ON o.doc_id = n.doc_id
            WHERE o.doc_id IS NULL OR n.doc_id IS NULL OR o.text <> n.text
        """,
        "doc_oov_rate": r"""
            WITH tok AS (
              SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS w
              FROM documents
            ), t AS (SELECT doc_id, w FROM tok WHERE w <> ''),
            c AS (SELECT w, count(*)::BIGINT AS n FROM t GROUP BY w)
            SELECT t.doc_id, count(*)::BIGINT AS n_tokens,
                   sum(CASE WHEN c.n < 3 THEN 1 ELSE 0 END)::BIGINT AS n_oov,
                   sum(CASE WHEN c.n < 3 THEN 1 ELSE 0 END)::DOUBLE
                     / count(*) AS oov_rate
            FROM t JOIN c USING (w) GROUP BY t.doc_id
        """,
        "dsir_importance_weights": r"""
            WITH tok AS (
              SELECT doc_id, source,
                     unnest(regexp_split_to_array(text, '\s+')) AS w
              FROM documents
            ),
            t AS (
              SELECT doc_id, source,
                     ('0x' || substr(md5('dsir-v1:' || w), 1, 8))::BIGINT
                       % 256 AS b
              FROM tok WHERE w <> ''
            ),
            tgt AS (
              SELECT b, count(*)::DOUBLE AS ct FROM t
              WHERE source = 'src0' GROUP BY b
            ),
            raw AS (SELECT b, count(*)::DOUBLE AS cr FROM t GROUP BY b),
            nt AS (
              SELECT count(*)::DOUBLE AS n FROM t WHERE source = 'src0'
            ),
            nr AS (SELECT count(*)::DOUBLE AS n FROM t)
            SELECT t.doc_id, count(*)::BIGINT AS n_tokens,
                   sum(ln((coalesce(tgt.ct, 0) + 1) / (nt.n + 256))
                       - ln((raw.cr + 1) / (nr.n + 256))) AS log_w
            FROM t
            LEFT JOIN tgt USING (b)
            JOIN raw USING (b)
            CROSS JOIN nt CROSS JOIN nr
            GROUP BY t.doc_id
        """,
        "boilerplate_ngram_removal": r"""
            WITH t AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(text, '\s+'),
                                 x -> x <> '') AS a
              FROM documents
            ),
            tok AS (
              SELECT doc_id, unnest(a) AS w,
                     unnest([i for i in generate_series(1, len(a))]) AS i
              FROM t
            ),
            g AS (
              SELECT doc_id,
                     unnest([a[i] || ' ' || a[i+1] || ' ' || a[i+2]
                             for i in generate_series(1, len(a) - 2)]) AS gram,
                     unnest([i
                             for i in generate_series(1, len(a) - 2)]) AS i
              FROM t
            ),
            hot AS (
              SELECT gram FROM (
                SELECT gram, count(DISTINCT doc_id) AS df FROM g GROUP BY gram
              ) WHERE df >= 5
            ),
            cov AS (
              SELECT DISTINCT doc_id, pos FROM (
                SELECT g.doc_id, unnest([g.i, g.i + 1, g.i + 2]) AS pos
                FROM g JOIN hot USING (gram)
              )
            )
            SELECT tok.doc_id,
                   sum(CASE WHEN cov.pos IS NULL THEN 1 ELSE 0 END)
                     ::BIGINT AS n_kept,
                   sum(CASE WHEN cov.pos IS NOT NULL THEN 1 ELSE 0 END)
                     ::BIGINT AS n_dropped,
                   string_agg(CASE WHEN cov.pos IS NULL THEN tok.w END,
                              ' ' ORDER BY tok.i) AS text_clean
            FROM tok
            LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.i = cov.pos
            GROUP BY tok.doc_id
        """,
        "doc_line_repetition": r"""
            WITH l AS (
              SELECT doc_id, unnest(string_split(coalesce(text,''), chr(10))) AS line
              FROM documents
            ),
            g AS (
              SELECT doc_id, line, count(*)::BIGINT AS c,
                     length(line)::BIGINT AS len
              FROM l GROUP BY doc_id, line
            )
            SELECT doc_id, sum(c)::BIGINT AS n_lines,
                   (sum(c) - count(*))::DOUBLE / sum(c) AS dup_line_frac,
                   CASE WHEN sum(c*len) = 0 THEN 0.0
                        ELSE sum(CASE WHEN c > 1 THEN c*len ELSE 0 END)::DOUBLE
                             / sum(c*len)
                   END AS dup_line_char_frac
            FROM g GROUP BY doc_id
        """,
        "doc_top_bigram": r"""
            WITH t AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(text, '\s+'),
                                 x -> x <> '') AS a
              FROM documents
            ),
            tok AS (SELECT doc_id, unnest(a) AS w FROM t),
            chars AS (
              SELECT doc_id, sum(length(w))::DOUBLE AS total_chars
              FROM tok GROUP BY doc_id
            ),
            bg AS (
              SELECT doc_id,
                     unnest([a[i] || ' ' || a[i+1]
                             for i in generate_series(1, len(a) - 1)]) AS bigram
              FROM t
            ),
            bc AS (
              SELECT doc_id, bigram, count(*)::BIGINT AS c
              FROM bg GROUP BY doc_id, bigram
            ),
            top AS (
              SELECT doc_id, bigram, c,
                     row_number() OVER (
                       PARTITION BY doc_id ORDER BY c DESC, bigram) AS rn
              FROM bc
            )
            SELECT top.doc_id, bigram AS top_bigram, c AS bg_count,
                   (c * (length(bigram) - 1)) / chars.total_chars
                     AS top_bigram_char_frac
            FROM top JOIN chars USING (doc_id) WHERE rn = 1
        """,
        "q4_order_priority": """
            SELECT o_orderpriority, count(*)::BIGINT AS order_count
            FROM orders o
            WHERE o.o_orderdate >= TIMESTAMP '1997-07-01'
              AND o.o_orderdate <  TIMESTAMP '1997-10-01'
              AND EXISTS (
                SELECT 1 FROM lineitem l
                WHERE l.l_orderkey = o.o_orderkey
                  AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
            GROUP BY 1 ORDER BY 1
        """,
        "q8_market_share": """
            WITH amer AS (
              SELECT n_nationkey FROM nation
              WHERE n_regionkey = (SELECT r_regionkey FROM region
                                   WHERE r_name = 'AMERICA')
            ),
            tgt AS (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_1')
            SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
                   round(sum(CASE WHEN s.s_nationkey =
                                    (SELECT n_nationkey FROM tgt)
                     THEN CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                       * 100.0) AS BIGINT) ELSE 0 END) / 100.0, 2)
                     AS nation_revenue,
                   round(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                     * 100.0) AS BIGINT)) / 100.0, 2) AS total_revenue
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'PROMO'
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
              AND o.o_orderdate <  TIMESTAMP '1998-01-01'
              AND c.c_nationkey IN (SELECT n_nationkey FROM amer)
            GROUP BY 1 ORDER BY 1
        """,
        "q11_important_brands": """
            WITH bv AS (
              SELECT p_brand,
                     sum(CAST(floor(p_retailprice * 100.0) AS BIGINT)
                         * CAST(p_size AS BIGINT)) AS cents
              FROM part GROUP BY 1
            )
            SELECT p_brand, round(cents / 100.0, 2) AS value
            FROM bv
            WHERE 25 * cents > (SELECT sum(cents) FROM bv)
            ORDER BY 1
        """,
        "q12_late_shipment_priority": """
            SELECT l.l_linestatus,
                   sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
                   sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 0 ELSE 1 END)::BIGINT AS low_line_count
            FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
            WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
              AND l.l_shipdate <  TIMESTAMP '1998-01-01'
              AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
            GROUP BY 1 ORDER BY 1
        """,
        "q13_customer_distribution": """
            SELECT c_count, count(*)::BIGINT AS custdist
            FROM (
              SELECT c.c_custkey, count(o.o_orderkey) AS c_count
              FROM customer c
              LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                                AND o.o_orderstatus <> 'F'
              GROUP BY 1
            )
            GROUP BY 1 ORDER BY custdist DESC, c_count DESC
        """,
        "q15_top_supplier": """
            WITH rev AS (
              SELECT l_suppkey,
                     sum(CAST(floor(l_extendedprice * (1 - l_discount)
                       * 100.0) AS BIGINT)) AS cents
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                AND l_shipdate <  TIMESTAMP '1997-04-01'
              GROUP BY 1
            )
            SELECT s.s_suppkey, s.s_name,
                   round(rev.cents / 100.0, 2) AS total_revenue
            FROM rev JOIN supplier s ON s.s_suppkey = rev.l_suppkey
            WHERE rev.cents = (SELECT max(cents) FROM rev)
            ORDER BY 1
        """,
        "q16_supplier_breadth": """
            SELECT p.p_brand,
                   count(DISTINCT l.l_suppkey)::BIGINT AS supplier_cnt
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
            WHERE p.p_brand <> 'Brand#13'
              AND p.p_size IN (9, 14, 19, 23, 36, 45, 49, 3)
            GROUP BY 1 ORDER BY 1
        """,
        "q20_part_promotion": """
            SELECT s.s_suppkey, s.s_name
            FROM supplier s
            WHERE s.s_suppkey IN (
              SELECT l.l_suppkey
              FROM lineitem l
              JOIN part p ON p.p_partkey = l.l_partkey
              WHERE p.p_name LIKE '%gear%'
                AND l.l_shipdate >= TIMESTAMP '1997-01-01'
                AND l.l_shipdate <  TIMESTAMP '1998-01-01'
              GROUP BY 1
              HAVING sum(CAST(floor(l.l_quantity * 100.0) AS BIGINT)) > 30000
            )
            ORDER BY 1
        """,
        "q21_waiting_supplier": """
            WITH fl AS (
              SELECT l.l_orderkey, l.l_suppkey,
                     max(CAST(epoch_us(l.l_shipdate) AS BIGINT)) AS smax
              FROM lineitem l
              JOIN orders o ON o.o_orderkey = l.l_orderkey
                           AND o.o_orderstatus = 'F'
              GROUP BY 1, 2
            ),
            om AS (
              SELECT l_orderkey, max(smax) AS omax, count(*) AS nsupp
              FROM fl GROUP BY 1
            ),
            atmax AS (
              SELECT fl.l_orderkey, fl.l_suppkey
              FROM fl JOIN om USING (l_orderkey)
              WHERE om.nsupp >= 2 AND fl.smax = om.omax
            ),
            waiters AS (
              SELECT l_orderkey, min(l_suppkey) AS l_suppkey
              FROM atmax GROUP BY 1 HAVING count(*) = 1
            )
            SELECT s.s_suppkey, s.s_name, count(*)::BIGINT AS numwait
            FROM waiters w JOIN supplier s ON s.s_suppkey = w.l_suppkey
            GROUP BY 1, 2 ORDER BY numwait DESC, s_suppkey LIMIT 10
        """,
        "user_running_distinct_types": """
            SELECT user_id, event_id, (sum(is_first) OVER w)::BIGINT AS n_seen
            FROM (
              SELECT user_id, event_id, ts,
                     CASE WHEN row_number() OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) = 1 THEN 1 ELSE 0 END AS is_first
              FROM events WHERE ts IS NOT NULL
            )
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "events_value_ewma": """
            SELECT user_id, event_id,
                   (coalesce(lag(vc, 0) OVER w, 0) * pow(2.0, -1)
                  + coalesce(lag(vc, 1) OVER w, 0) * pow(2.0, -2)
                  + coalesce(lag(vc, 2) OVER w, 0) * pow(2.0, -3)
                  + coalesce(lag(vc, 3) OVER w, 0) * pow(2.0, -4)
                  + coalesce(lag(vc, 4) OVER w, 0) * pow(2.0, -5)
                  + coalesce(lag(vc, 5) OVER w, 0) * pow(2.0, -6)
                  + coalesce(lag(vc, 6) OVER w, 0) * pow(2.0, -7)
                  + coalesce(lag(vc, 7) OVER w, 0) * pow(2.0, -8)) AS ewma
            FROM (
              SELECT user_id, event_id, ts,
                     CAST(floor(value * 100) AS BIGINT) AS vc
              FROM events WHERE ts IS NOT NULL
            )
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "user_gap_profile": """
            SELECT user_id,
                   (count(*) - 1)::BIGINT AS n_gaps,
                   coalesce(min(gap), -1)::BIGINT AS min_gap_us,
                   coalesce(max(gap), -1)::BIGINT AS max_gap_us,
                   coalesce(sum(gap), 0)::BIGINT AS sum_gap_us
            FROM (
              SELECT user_id,
                     date_diff('microsecond', lag(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id), ts) AS gap
              FROM events WHERE ts IS NOT NULL
            )
            GROUP BY 1
        """,
        "knn_graph_mutual": """
            WITH knn AS (
              SELECT query_id, neighbor_id FROM (
                SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                       row_number() OVER (
                         PARTITION BY a.vec_id
                         ORDER BY list_cosine_similarity(a.e, b.e) DESC,
                                  b.vec_id ASC) AS rank
                FROM (SELECT vec_id, embedding::DOUBLE[] e FROM embeddings) a,
                     (SELECT vec_id, embedding::DOUBLE[] e FROM embeddings) b
                WHERE a.vec_id <> b.vec_id
              ) WHERE rank <= 3
            )
            SELECT k1.query_id AS vec_a, k1.neighbor_id AS vec_b
            FROM knn k1
            JOIN knn k2 ON k2.query_id = k1.neighbor_id
                       AND k2.neighbor_id = k1.query_id
            WHERE k1.query_id < k1.neighbor_id
        """,
        "copurchase_pagerank": _pagerank_int_sql(iters=4),
        "copurchase_shortest_paths": _bellman_ford_sql(iters=6),
        "copurchase_kcore": _kcore_sql(k=3, rounds=14),
        "event_value_bootstrap": """
            SELECT r AS replicate,
                   sum(mult * cents)::BIGINT AS wsum_cents,
                   sum(mult)::BIGINT AS wn
            FROM (
              SELECT (strpos('0123456789abcdef',
                             substr(md5(CAST(event_id AS VARCHAR)), r, 1))
                      - 1) % 3 AS mult,
                     floor(value * 100)::BIGINT AS cents,
                     r
              FROM events,
                   (SELECT unnest(range(1, 17)) AS r) reps
            ) u
            GROUP BY r
        """,
        "user_active_coverage": """
            WITH iv AS (
              SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 300000000 AS e
              FROM events WHERE ts IS NOT NULL
            ),
            m AS (
              SELECT user_id, s, e,
                     max(e) OVER (PARTITION BY user_id ORDER BY s
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND 1 PRECEDING) AS prev_max
              FROM iv
            ),
            g AS (
              SELECT *, CASE WHEN prev_max IS NULL OR s > prev_max
                             THEN 1 ELSE 0 END AS ni
              FROM m
            ),
            gi AS (
              SELECT *, sum(ni) OVER (PARTITION BY user_id ORDER BY s
                                      ROWS UNBOUNDED PRECEDING) AS grp
              FROM g
            ),
            isl AS (
              SELECT user_id, grp, min(s) AS st, max(e) AS en
              FROM gi GROUP BY 1, 2
            )
            SELECT user_id,
                   count(*)::BIGINT AS n_islands,
                   sum(en - st)::BIGINT AS covered_us
            FROM isl GROUP BY user_id
        """,
        "embedding_vq_counts": """
            WITH q AS (
              SELECT vec_id,
                     list_transform(embedding, x -> floor(x * 1000)::BIGINT) AS qe
              FROM embeddings
            ),
            cent AS (SELECT vec_id AS cid, qe AS ce FROM q ORDER BY vec_id LIMIT 8),
            scored AS (
              -- double dots over integer-valued operands are exact
              -- (<= 2^53), matching the engine's int64 matmul
              SELECT q.vec_id, cent.cid,
                     list_dot_product(q.qe::DOUBLE[], cent.ce::DOUBLE[]) AS sc
              FROM q CROSS JOIN cent
            ),
            best AS (
              SELECT vec_id, cid FROM (
                SELECT vec_id, cid,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY sc DESC, cid) AS rn
                FROM scored
              ) WHERE rn = 1
            )
            SELECT cid::BIGINT AS centroid_id, count(*)::BIGINT AS n
            FROM best GROUP BY cid
        """,
        "resolution_pairwise_eval": r"""
            WITH RECURSIVE p AS (
              SELECT i AS s, j AS t FROM (
                SELECT a.s_suppkey AS i, b.s_suppkey AS j,
                       levenshtein(a.s_name, b.s_name)::BIGINT AS d
                FROM supplier a JOIN supplier b
                  ON a.s_suppkey < b.s_suppkey
                WHERE abs(length(a.s_name) - length(b.s_name)) <= 1
              ) WHERE d <= 1
            ),
            sym AS (
              SELECT s, t FROM p UNION SELECT t, s FROM p
              UNION SELECT s, s FROM p UNION SELECT t, t FROM p
            ),
            reach(n, m) AS (
              SELECT s, t FROM sym
              UNION
              SELECT r.n, s2.t FROM reach r JOIN sym s2 ON r.m = s2.s
            ),
            cmap AS (SELECT n, min(m) AS c FROM reach GROUP BY n),
            lab AS (
              SELECT coalesce(cmap.c, s.s_suppkey) AS pred,
                     lower(regexp_replace(s.s_name, '[^a-zA-Z0-9]', '', 'g'))
                       AS truth
              FROM supplier s LEFT JOIN cmap ON cmap.n = s.s_suppkey
            ),
            cell AS (SELECT pred, truth, count(*)::BIGINT AS m
                     FROM lab GROUP BY 1, 2),
            predsz AS (SELECT pred, sum(m) AS sz FROM cell GROUP BY 1),
            truthsz AS (SELECT truth, sum(m) AS sz FROM cell GROUP BY 1)
            SELECT
              (SELECT coalesce(sum(m * (m - 1) // 2), 0) FROM cell)::BIGINT
                AS tp_pairs,
              (SELECT coalesce(sum(sz * (sz - 1) // 2), 0) FROM predsz)::BIGINT
                AS pred_pairs,
              (SELECT coalesce(sum(sz * (sz - 1) // 2), 0) FROM truthsz)::BIGINT
                AS truth_pairs
        """,
        "q2_min_cost_supplier": """
            WITH ps AS (
              SELECT l_partkey AS p_partkey, l_suppkey AS s_suppkey,
                     min(floor(l_extendedprice * 100)::BIGINT) AS cost
              FROM lineitem GROUP BY 1, 2
            ),
            es AS (
              SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
              FROM supplier s
              JOIN nation n ON n.n_nationkey = s.s_nationkey
              JOIN region r ON r.r_regionkey = n.n_regionkey
              WHERE r.r_name = 'EUROPE'
            ),
            pj AS (SELECT p_partkey, p_brand FROM part WHERE p_size = 15),
            fj AS (
              SELECT ps.p_partkey, pj.p_brand, es.s_name, es.s_acctbal,
                     es.n_name, ps.cost
              FROM ps JOIN es USING (s_suppkey) JOIN pj USING (p_partkey)
            ),
            mn AS (SELECT p_partkey, min(cost) AS mc FROM fj GROUP BY 1)
            SELECT fj.s_acctbal, fj.s_name, fj.n_name, fj.p_partkey,
                   fj.p_brand, fj.cost / 100.0 AS supply_cost
            FROM fj JOIN mn ON mn.p_partkey = fj.p_partkey
                           AND fj.cost = mn.mc
            ORDER BY fj.s_acctbal DESC, fj.n_name, fj.s_name, fj.p_partkey
            LIMIT 25
        """,
        "events_late_arrivals": """
            WITH w AS (
              SELECT event_id, user_id, epoch_us(ts) AS t,
                     max(epoch_us(ts)) OVER (
                       ORDER BY (event_id // 16) * 16 + 15 - (event_id % 16)
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS wm
              FROM events WHERE ts IS NOT NULL
            )
            SELECT event_id, user_id,
                   (wm - 60000000 - t)::BIGINT AS lateness_us
            FROM w
            WHERE wm IS NOT NULL AND t < wm - 60000000
        """,
        "tpch_kg_edges": """
            SELECT 'customer:' || c_custkey AS subj,
                   'located_in' AS pred,
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
        """,
        "kg_metapath_counts": """
            WITH e AS (
              SELECT 'customer:' || c_custkey AS subj,
                     'located_in' AS pred,
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
            )
            SELECT a.pred AS pred_1, b.pred AS pred_2,
                   count(*)::BIGINT AS n_paths
            FROM e a JOIN e b ON a.obj = b.subj
            GROUP BY a.pred, b.pred
        """,
        "kg_type_constraints": """
            WITH e AS (
              SELECT 'customer:' || c_custkey AS subj,
                     'located_in' AS pred,
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
            )
            SELECT pred, split_part(subj, ':', 1) AS subj_type,
                   split_part(obj, ':', 1) AS obj_type,
                   count(*)::BIGINT AS n_edges
            FROM e GROUP BY 1, 2, 3
        """,
        "copurchase_clustering": """
            WITH p AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
                 e AS (SELECT a.l_partkey AS a, b.l_partkey AS b
                       FROM p a JOIN p b
                         ON a.l_orderkey = b.l_orderkey
                        AND a.l_partkey < b.l_partkey
                       GROUP BY 1, 2),
                 tri AS (SELECT e1.a AS a, e1.b AS b, e2.b AS c
                         FROM e e1
                         JOIN e e2 ON e2.a = e1.b
                         JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
                 tv AS (SELECT node, count(*)::BIGINT AS n_triangles FROM (
                          SELECT a AS node FROM tri
                          UNION ALL SELECT b FROM tri
                          UNION ALL SELECT c FROM tri
                        ) GROUP BY node),
                 d AS (SELECT node, count(*)::BIGINT AS degree FROM (
                          SELECT a AS node FROM e
                          UNION ALL SELECT b AS node FROM e
                        ) GROUP BY node)
            SELECT d.node, d.degree,
                   coalesce(tv.n_triangles, 0)::BIGINT AS n_triangles,
                   (CASE WHEN d.degree >= 2
                         THEN (2000000 * coalesce(tv.n_triangles, 0))
                              // (d.degree * (d.degree - 1))
                         ELSE 0 END)::BIGINT AS coeff_ppm
            FROM d LEFT JOIN tv USING (node)
        """,
        "copurchase_communities": """
            WITH p AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
                 e AS (SELECT a.l_partkey AS a, b.l_partkey AS b
                       FROM p a JOIN p b
                         ON a.l_orderkey = b.l_orderkey
                        AND a.l_partkey < b.l_partkey
                       GROUP BY 1, 2),
                 adj AS (SELECT a AS node, b AS nbr FROM e
                         UNION ALL SELECT b, a FROM e),
                 lab0 AS (SELECT DISTINCT node, node AS lab FROM adj),
                 c1 AS (SELECT adj.node, l.lab, count(*)::BIGINT AS n
                        FROM adj JOIN lab0 l ON l.node = adj.nbr
                        GROUP BY 1, 2),
                 lab1 AS (SELECT node, lab FROM (
                            SELECT node, lab, row_number() OVER (
                              PARTITION BY node ORDER BY n DESC, lab ASC
                            ) AS rn FROM c1) WHERE rn = 1),
                 c2 AS (SELECT adj.node, l.lab, count(*)::BIGINT AS n
                        FROM adj JOIN lab1 l ON l.node = adj.nbr
                        GROUP BY 1, 2),
                 lab2 AS (SELECT node, lab FROM (
                            SELECT node, lab, row_number() OVER (
                              PARTITION BY node ORDER BY n DESC, lab ASC
                            ) AS rn FROM c2) WHERE rn = 1),
                 c3 AS (SELECT adj.node, l.lab, count(*)::BIGINT AS n
                        FROM adj JOIN lab2 l ON l.node = adj.nbr
                        GROUP BY 1, 2),
                 lab3 AS (SELECT node, lab FROM (
                            SELECT node, lab, row_number() OVER (
                              PARTITION BY node ORDER BY n DESC, lab ASC
                            ) AS rn FROM c3) WHERE rn = 1)
            SELECT node, lab AS community FROM lab3
        """,
        "documents_time_travel": """
            WITH v1 AS (
              SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0
            ),
            v2 AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 11 = 0 THEN text || ' [v2]'
                          ELSE text END AS text
              FROM v1 WHERE doc_id % 7 <> 0
              UNION ALL
              SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
            )
            SELECT 1::BIGINT AS version, doc_id, md5(text) AS fingerprint
            FROM v1
            UNION ALL
            SELECT 2::BIGINT, doc_id, md5(text) FROM v2
        """,
        "user_event_pattern_counts": """
            WITH s AS (
              SELECT user_id, count(*)::BIGINT AS n_events,
                     string_agg(event_type, ',' ORDER BY ts, event_id) AS seq
              FROM events GROUP BY user_id
            )
            SELECT user_id, n_events,
                   ((len(seq) - len(replace(seq, 'view,click,purchase', '')))
                    // len('view,click,purchase'))::BIGINT AS n_vcp
            FROM s
        """,
        "orders_ivm_status_counts": """
            WITH base AS (SELECT o_orderkey, o_orderstatus FROM orders),
            merged AS (
              SELECT o_orderkey, o_orderstatus FROM base
              WHERE o_orderkey % 10 NOT IN (0, 1)
              UNION ALL
              SELECT o_orderkey, 'P' FROM base WHERE o_orderkey % 10 = 0
              UNION ALL
              SELECT o_orderkey + 1000000000, 'O' FROM base
              WHERE o_orderkey % 10 = 2
            )
            SELECT o_orderstatus, count(*)::BIGINT AS n_orders
            FROM merged GROUP BY o_orderstatus
        """,
        "coverage_pick_docs": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 x -> x <> '') AS t
              FROM documents
            ),
            sh AS (
              SELECT doc_id,
                     CASE
                       WHEN len(t) = 0 THEN []::VARCHAR[]
                       WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                       ELSE list_distinct(list_transform(range(1, len(t) - 1),
                                          i -> array_to_string(t[i:i+2], ' ')))
                     END AS s
              FROM toks
            ),
            w AS (
              SELECT doc_id, u.gram AS word FROM sh, unnest(sh.s) AS u(gram)
            ),
            g1 AS (SELECT doc_id, count(*)::BIGINT AS gain
                   FROM w GROUP BY doc_id),
            p1 AS (SELECT doc_id, gain FROM g1
                   ORDER BY gain DESC, doc_id LIMIT 1),
            c1 AS (SELECT DISTINCT word FROM w JOIN p1 USING (doc_id)),
            w2 AS (SELECT w.doc_id, w.word FROM w
                   WHERE w.word NOT IN (SELECT word FROM c1)
                     AND w.doc_id NOT IN (SELECT doc_id FROM p1)),
            g2 AS (SELECT doc_id, count(*)::BIGINT AS gain
                   FROM w2 GROUP BY doc_id),
            p2 AS (SELECT doc_id, gain FROM g2
                   ORDER BY gain DESC, doc_id LIMIT 1),
            c2 AS (SELECT word FROM c1
                   UNION
                   SELECT word FROM w JOIN p2 USING (doc_id)),
            w3 AS (SELECT w.doc_id, w.word FROM w
                   WHERE w.word NOT IN (SELECT word FROM c2)
                     AND w.doc_id NOT IN (SELECT doc_id FROM p1
                                          UNION SELECT doc_id FROM p2)),
            g3 AS (SELECT doc_id, count(*)::BIGINT AS gain
                   FROM w3 GROUP BY doc_id),
            p3 AS (SELECT doc_id, gain FROM g3
                   ORDER BY gain DESC, doc_id LIMIT 1),
            c3 AS (SELECT word FROM c2
                   UNION
                   SELECT word FROM w JOIN p3 USING (doc_id))
            SELECT 1::BIGINT AS round, doc_id, gain,
                   (SELECT count(*) FROM c1)::BIGINT AS covered_total
            FROM p1
            UNION ALL
            SELECT 2::BIGINT, doc_id, gain, (SELECT count(*) FROM c2)
            FROM p2
            UNION ALL
            SELECT 3::BIGINT, doc_id, gain, (SELECT count(*) FROM c3)
            FROM p3
        """,
        "knn_label_eval": """
            WITH e AS (
              SELECT vec_id, label::BIGINT AS label,
                     embedding::DOUBLE[] AS emb
              FROM embeddings
            ),
            knn AS (
              SELECT query_id, nlab FROM (
                SELECT a.vec_id AS query_id, b.label AS nlab,
                       row_number() OVER (
                         PARTITION BY a.vec_id
                         ORDER BY list_cosine_similarity(a.emb, b.emb) DESC,
                                  b.vec_id ASC) AS rank
                FROM e a, e b
                WHERE a.vec_id <> b.vec_id
              ) WHERE rank <= 5
            ),
            votes AS (
              SELECT query_id, nlab, count(*)::BIGINT AS n_votes
              FROM knn GROUP BY query_id, nlab
            ),
            pred AS (
              SELECT query_id, nlab AS pred FROM (
                SELECT query_id, nlab,
                       row_number() OVER (
                         PARTITION BY query_id
                         ORDER BY n_votes DESC, nlab ASC) AS rn
                FROM votes
              ) WHERE rn = 1
            )
            SELECT e.label, count(*)::BIGINT AS n,
                   sum(CASE WHEN p.pred = e.label THEN 1 ELSE 0
                       END)::BIGINT AS n_correct
            FROM pred p JOIN e ON e.vec_id = p.query_id
            GROUP BY e.label
        """,
        "embedding_dbscan_clusters": """
            WITH RECURSIVE emb AS (
              SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
            ),
            ed AS (
              SELECT a.vec_id AS va, b.vec_id AS vb
              FROM emb a, emb b
              WHERE a.vec_id < b.vec_id
                AND list_cosine_similarity(a.e, b.e) >= 0.35
            ),
            adj AS (
              SELECT va AS node, vb AS nbr FROM ed
              UNION ALL SELECT vb, va FROM ed
            ),
            deg AS (SELECT node, count(*)::BIGINT AS n
                    FROM adj GROUP BY node),
            core AS (SELECT node FROM deg WHERE n >= 2),
            sym AS (
              SELECT va AS s, vb AS t FROM ed
              WHERE va IN (SELECT node FROM core)
                AND vb IN (SELECT node FROM core)
              UNION
              SELECT vb, va FROM ed
              WHERE va IN (SELECT node FROM core)
                AND vb IN (SELECT node FROM core)
              UNION
              SELECT node, node FROM core
            ),
            reach(n, m) AS (
              SELECT s, t FROM sym
              UNION
              SELECT r.n, s2.t FROM reach r JOIN sym s2 ON r.m = s2.s
            ),
            comp AS (SELECT n AS node, min(m)::BIGINT AS cluster
                     FROM reach GROUP BY n),
            border AS (
              SELECT a.node, min(c.cluster)::BIGINT AS cluster
              FROM adj a
              JOIN core k ON k.node = a.nbr
              JOIN comp c ON c.node = a.nbr
              WHERE a.node NOT IN (SELECT node FROM core)
              GROUP BY a.node
            )
            SELECT emb.vec_id,
                   coalesce(comp.cluster, border.cluster, -1)::BIGINT
                     AS cluster,
                   (CASE WHEN comp.node IS NOT NULL THEN 1
                         ELSE 0 END)::BIGINT AS is_core
            FROM emb
            LEFT JOIN comp ON comp.node = emb.vec_id
            LEFT JOIN border ON border.node = emb.vec_id
        """,
        "copurchase_edge_churn": """
            WITH tri AS (
              SELECT DISTINCT year(l_shipdate)::BIGINT AS y,
                     l_orderkey AS o, l_partkey AS p
              FROM lineitem
            ),
            e AS (
              SELECT DISTINCT a.y, a.p AS pa, b.p AS pb
              FROM tri a JOIN tri b ON a.y = b.y AND a.o = b.o
                                   AND a.p < b.p
            ),
            n AS (SELECT y, count(*)::BIGINT AS n FROM e GROUP BY y),
            c AS (
              SELECT e1.y AS ya, count(*)::BIGINT AS n_common
              FROM e e1 JOIN e e2
                ON e2.y = e1.y + 1 AND e2.pa = e1.pa AND e2.pb = e1.pb
              GROUP BY e1.y
            )
            SELECT na.y AS year_a, nb.y AS year_b,
                   na.n AS n_a, nb.n AS n_b,
                   coalesce(c.n_common, 0)::BIGINT AS n_common,
                   ((1000000 * coalesce(c.n_common, 0))
                    // (na.n + nb.n - coalesce(c.n_common, 0)))::BIGINT
                     AS jaccard_ppm
            FROM n na
            JOIN n nb ON nb.y = na.y + 1
            LEFT JOIN c ON c.ya = na.y
        """,
        "hot_parts_cms": """
            SELECT l_partkey, count(*)::BIGINT AS n
            FROM lineitem GROUP BY l_partkey HAVING count(*) >= 45
        """,
        "export_orc_roundtrip": """
            SELECT doc_id, md5(text) AS fingerprint FROM documents
        """,
        "corpus_health_report": r"""
            WITH tok AS (
              SELECT len(regexp_split_to_array(text, '\s+'))::BIGINT AS n
              FROM documents
            )
            SELECT (SELECT count(*) FROM documents)::BIGINT AS n_docs,
                   (SELECT sum(n) FROM tok)::BIGINT AS n_tokens,
                   (SELECT count(DISTINCT md5(text))
                    FROM documents)::BIGINT AS n_distinct_texts,
                   ((SELECT count(*) FROM documents)
                    - (SELECT count(DISTINCT md5(text))
                       FROM documents))::BIGINT AS n_dup_docs,
                   (SELECT count(DISTINCT lang)
                    FROM documents)::BIGINT AS n_langs,
                   (SELECT count(DISTINCT source)
                    FROM documents)::BIGINT AS n_sources,
                   (SELECT max(n) FROM tok)::BIGINT AS max_doc_tokens,
                   ((SELECT sum(n) FROM tok)
                    // (SELECT count(*) FROM documents))::BIGINT
                     AS avg_doc_tokens
        """,
        "supplier_shipment_overlaps": """
            WITH iv AS (
              SELECT l_suppkey AS k,
                     l_orderkey * 10 + l_linenumber AS i,
                     l_shipdate::DATE AS s,
                     l_shipdate::DATE
                       + to_days(l_quantity::BIGINT::INT) AS e
              FROM lineitem
            )
            SELECT a.k AS l_suppkey, count(*)::BIGINT AS n_overlaps
            FROM iv a JOIN iv b
              ON a.k = b.k AND a.i < b.i AND a.s <= b.e AND b.s <= a.e
            GROUP BY a.k
        """,
        "doc_packing_global": """
            SELECT doc_id, n_tokens,
                   ((SUM(n_tokens) OVER (ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING) - n_tokens)
                    // 4096)::BIGINT AS seq_id
            FROM (
              SELECT doc_id,
                     len(regexp_split_to_array(text, '\\s+'))::BIGINT
                       AS n_tokens
              FROM documents
            )
        """,
        "copurchase_random_walks": """
            WITH p AS (
              SELECT DISTINCT l_orderkey AS o, l_partkey AS pt FROM lineitem
            ),
            e AS (
              SELECT DISTINCT a.pt AS pa, b.pt AS pb
              FROM p a JOIN p b ON a.o = b.o AND a.pt < b.pt
            ),
            adj AS (
              SELECT pa AS node, pb AS nbr FROM e
              UNION ALL SELECT pb, pa FROM e
            ),
            w0 AS (SELECT DISTINCT node AS walk_id, node FROM adj),
            s1 AS (
              SELECT w.walk_id,
                     min(('0x' || substr(md5(w.walk_id::VARCHAR || ':1:'
                            || a.nbr::VARCHAR), 1, 8))::BIGINT
                         * 2147483648 + a.nbr) AS packed
              FROM w0 w JOIN adj a ON a.node = w.node GROUP BY w.walk_id
            ),
            w1 AS (SELECT walk_id, packed % 2147483648 AS node FROM s1),
            s2 AS (
              SELECT w.walk_id,
                     min(('0x' || substr(md5(w.walk_id::VARCHAR || ':2:'
                            || a.nbr::VARCHAR), 1, 8))::BIGINT
                         * 2147483648 + a.nbr) AS packed
              FROM w1 w JOIN adj a ON a.node = w.node GROUP BY w.walk_id
            ),
            w2 AS (SELECT walk_id, packed % 2147483648 AS node FROM s2),
            s3 AS (
              SELECT w.walk_id,
                     min(('0x' || substr(md5(w.walk_id::VARCHAR || ':3:'
                            || a.nbr::VARCHAR), 1, 8))::BIGINT
                         * 2147483648 + a.nbr) AS packed
              FROM w2 w JOIN adj a ON a.node = w.node GROUP BY w.walk_id
            ),
            w3 AS (SELECT walk_id, packed % 2147483648 AS node FROM s3)
            SELECT walk_id, 0::BIGINT AS pos, node::BIGINT AS node FROM w0
            UNION ALL SELECT walk_id, 1, node FROM w1
            UNION ALL SELECT walk_id, 2, node FROM w2
            UNION ALL SELECT walk_id, 3, node FROM w3
        """,
        # rows-only (no SQL twin): lang_id, minhash_dedup_documents,
        # simhash_signatures, simhash_neardup, ann_topk_lsh, kg_triples,
        # kg_nodes, kg_edges, media_span_stats — checked against the
        # in-repo oracle by pytest instead.
    }
