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
# ROUND-6 rotation (the r5 verdict's ask #1, executed as written —
# there were no r5 reds):
#   (a) gates NEW in r6 (driver-row them the round they land),
#   (b) the 6 gates whose latest row is r1 — cut at position 50 by the
#       r5 window,
#   (c) the 46-query block whose latest row is r2, oldest-signal-first,
#   (d) past the ~50 cap: the 50-query r4 block (next-oldest signal),
#       then the r5-rowed gates in registration order — all hash-green
#       at their latest driver row and pytest-oracle-green locally.
# ROUND-7 NOTE: next head = any r6 reds, any new r7 gates, then
# whatever (c)-tail the r6 window cut at the cap (expected: the last
# ~4 of the r2 block — tunnel_decap_roundtrip,
# unique_multivalue_session_types, x509_cert_fields,
# yara_scan_documents), then the r4 block of (d). After r7 no query's
# latest row should be older than r5.
_CHECK_PRIORITY = (
    # --- (a) new in r6 ---
    "ann_ivf_int8_topk",        # IVF cells + int8 in-cell codes (Faiss IVF,SQ8 shape)
    "hybrid_rrf_indexed",       # hybrid RRF served from the durable BM25 index
    # --- (b) latest driver row is r1 (6) ---
    "tpch_q3_shipping_priority", "tpch_q5_local_supplier_volume",
    "unique_autocomplete", "unique_event_type", "unique_pair_user_type",
    "wise_feed_enrich",
    # --- (c) latest driver row is r2 (46) ---
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
    # --- (d) past the ~50 cap: r4 block, oldest-first ---
    "dhcp_parse_fields", "irc_parse_fields", "socks_parse_fields",
    "radius_parse_fields", "ldap_parse_fields", "krb5_parse_fields",
    "mysql_parse_fields", "postgresql_parse_fields", "tns_parse_fields",
    "bgp_parse_fields", "http2_parse_fields", "quic_parse_fields",
    "pcap_over_ip_reframe", "multimodal_resize", "multimodal_frame_sample",
    "multimodal_audio", "pii_scan", "repetition_signals",
    "gopher_quality_flags", "quality_char_entropy", "curate_mixture_sample",
    "tpch_q19_disjunctive_revenue", "tpch_q20_part_supply_nation",
    "tpch_q21_waiting_supplier", "tpch_q22_global_sales_opportunity",
    "streaming_sessionize_closed", "dedup_ngram_jaccard",
    "embedding_near_dups", "embedding_near_dup_pairs_lsh",
    "duplicate_spans_13gram", "quic_v1_initial_fields", "line_dedup_corpus",
    "dsir_importance_select", "dedup_incremental_lsh",
    "curation_pipeline_e2e", "bpe_token_counts", "quic_capture_to_sni",
    "streaming_dedup_incremental", "ppl_filter_stupid_backoff",
    "bm25_topk_search", "bpe_train_and_apply", "quality_classifier_filter",
    "ppl_lang_buckets", "embedding_pca_whiten", "pq_encode_codes",
    "ccnet_pipeline_e2e", "warc_ingest_roundtrip", "hybrid_rrf_search",
    "hunt_job_control", "streaming_state_cap",
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
