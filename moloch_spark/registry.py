"""Query/oracle registry shared by all query modules.

Every operator exposed to the driver registers here: a (spark, sf_dir)
-> DataFrame callable plus (when SQL-expressible) a DuckDB oracle SQL
string with IDENTICAL column names/types.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def _load_registrants() -> None:
    # import registrants lazily to avoid import cycles
    import moloch_spark.queries  # noqa: F401
    import moloch_spark.queries_api  # noqa: F401
    import moloch_spark.queries_curate  # noqa: F401
    import moloch_spark.queries_enrich  # noqa: F401
    import moloch_spark.queries_llm  # noqa: F401
    import moloch_spark.queries_pcap  # noqa: F401
    import moloch_spark.queries_stream  # noqa: F401
    import moloch_spark.queries_tpch  # noqa: F401


# The driver's correctness harness checks only the FIRST ~50 declared
# queries per round, so ordering decides what gets a CORRECTNESS row.
# ROUND-5 rotation (the r4 verdict's ask #2, executed this time):
#   (a) the 7 gates that have NEVER had a driver row (incl. all three
#       new-in-r4 gates),
#   (b) session_tag_update — its semantics changed in r4, so its r2 row
#       certifies the wrong code,
#   (b') any gates NEW in r5 (driver-row them the round they land),
#   (c) the 42-query block whose only driver row is r1,
#   (d) past the ~50 cap: the 47-query r2 block oldest-signal-first —
#       all green in r2 and pytest-oracle-green locally, so lowest risk.
# ROUND-6 NOTE: next head = any r5 reds, any new r6 gates, then the 6
# r1-block gates the r5 window cut off at position 50
# (tpch_q3_shipping_priority, tpch_q5_local_supplier_volume,
# unique_autocomplete, unique_event_type, unique_pair_user_type,
# wise_feed_enrich), then the r2 block (ann_*, cron_query_tick,
# dns/http/tls/x509/ssh/smtp/smb/misc parsers,
# expr_sessions_store_search, pcap_*, sessionize_*, tpch
# q2/q4/q7/q8/q10-q18, tunnel_decap_roundtrip, ...). After r6 no
# query's latest row should be older than r5.
_CHECK_PRIORITY = (
    # --- (a) never driver-rowed (7) ---
    "ann_pq_adc_topk", "ann_ivf_pq_topk", "cron_forward_exactly_once",
    "semdedup_prune", "chunk_documents_sliding", "cms_ngram_counts",
    "remove_duplicate_spans",
    # --- (b) semantics changed in r4; r2 row is stale ---
    "session_tag_update",
    # --- (b') new in r5 ---
    "hunt_node_fanout",                      # per-node checkpointed fan-out
    "session_tag_update_prebuilt",           # update phase isolated from store build
    "c4_line_filter",                        # C4 line/page cleaning (Raffel et al.)
    "bm25_topk_indexed_search",              # durable term-bucketed BM25 index
    "ann_int8_topk",                         # int8 scalar-quantized ANN scan
    "bm25_index_append_search",              # incremental index maintenance
    # --- (c) latest driver row is r1 (42) ---
    "asof_feed_enrich", "cardinality_fields", "connections_baseline_events",
    "connections_components", "connections_nation_graph",
    "curate_global_shuffle", "curate_pack_sequences", "curate_split_assign",
    "curate_weighted_sample", "dedup_exact", "dedup_lsh_candidates",
    "dedup_minhash_signatures", "dedup_simhash", "doc_fingerprint",
    "drophash_filter", "dstats_derived_rates", "enrich_region_rollup",
    "expr_bool_and_list", "expr_ne_null_semantics", "expr_shortcut_semijoin",
    "expr_textfield_phrase", "expr_wildcard_date_range", "lang_id",
    "multies_scatter_gather", "multiunique_user_event",
    "sessions_page_offset", "sessions_search_events",
    "spigraph_event_type_daily", "spigraph_hierarchy_orders",
    "spigraph_sum_metric_rank", "spiview_events", "text_stats",
    "timeline_events_dense", "timeline_events_hourly", "token_counts",
    "tpch_q1_pricing_summary", "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume", "unique_autocomplete",
    "unique_event_type", "unique_pair_user_type", "wise_feed_enrich",
    # --- (d) past the ~50 cap: r2 block, all green prior rows ---
    "ann_brute_force_topk", "ann_ivf_topk", "ann_lsh_bucketed_topk",
    "corpus_ngram_stats", "cron_query_tick", "decontaminate_ngrams",
    "dedup_semantic_clusters", "dns_parse_fields",
    "expr_sessions_store_search", "frame_decode_roundtrip",
    "http_parse_fields", "hunt_ascii_and_regex", "misc_parse_fields",
    "multimodal_features", "pcap_export_sessions", "pcap_packet_positions",
    "rules_tagging", "session_segments_merge", "session_store_bounded_either",
    "sessionize_chunked_rootid", "sessionize_events_30m",
    "sessionize_per_proto_timeouts", "smb_parse_fields", "smtp_parse_fields",
    "ssh_hassh_fields", "suricata_interval_join", "tls_ja3_fields",
    "tpch_q10_returned_items", "tpch_q11_important_stock",
    "tpch_q12_shipmode_priority", "tpch_q13_order_distribution",
    "tpch_q14_promo_effect", "tpch_q15_top_supplier",
    "tpch_q16_supplier_cnt", "tpch_q17_small_qty_revenue",
    "tpch_q18_large_orders", "tpch_q2_min_cost_supplier",
    "tpch_q4_priority_exists", "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping", "tpch_q8_market_share",
    "tpch_q9_product_profit", "tunnel_decap_roundtrip",
    "unique_multivalue_session_types", "x509_cert_fields",
    "yara_scan_documents",
)


def _prioritized(d: dict) -> dict:
    head = {n: d[n] for n in _CHECK_PRIORITY if n in d}
    return head | {n: v for n, v in d.items() if n not in head}


def all_queries() -> dict[str, QueryFn]:
    _load_registrants()
    return _prioritized(dict(_QUERIES))


def all_oracles() -> dict[str, str]:
    _load_registrants()
    return _prioritized(dict(_ORACLES))
