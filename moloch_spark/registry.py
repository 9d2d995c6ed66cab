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
# ROUND-10 rotation (the r9 verdict's ask #1 / the r9 ROUND-10 NOTE,
# executed as written — there were no r9 reds):
#   (a) gates NEW in r10 (driver-row them the round they land): the
#       gzip/MIME, xor-brute and file-carve decode-stage gates, the
#       banded-Hamming brute-force equivalence gate, the BM25 + ANN
#       crash-repair lifecycle gates, the forced-expression/timeLimit
#       row-level-security gate, the ES index-rotation gate, and the
#       streaming packet-dedup gate,
#   (b) the 30-gate block whose latest row is r6 (the pre-declared r10
#       head), in its r6 check order,
#   (c) the 11 oldest r7-rowed gates, in their r7 check order — with
#       (a)+(b) the ~50 cap lands exactly after them,
#   (d) past the cap: the 39 remaining r7-rowed gates (the r11 head),
#       then the r8/r9-rowed gates in registration order — all
#       hash-green at their latest driver row and pytest-oracle-green
#       locally.
# ROUND-11 NOTE: next head = any r10 reds, any new r11 gates, then the
# 39-gate r7 tail of (d) (dhcp_parse_fields, irc_parse_fields,
# socks_parse_fields,
# radius_parse_fields, ldap_parse_fields, krb5_parse_fields,
# mysql_parse_fields,
# postgresql_parse_fields, tns_parse_fields,
# bgp_parse_fields, http2_parse_fields, quic_parse_fields,
# pcap_over_ip_reframe, multimodal_resize, multimodal_frame_sample,
# multimodal_audio, pii_scan, repetition_signals,
# gopher_quality_flags, quality_char_entropy, curate_mixture_sample,
# tpch_q19_disjunctive_revenue, tpch_q20_part_supply_nation,
# tpch_q21_waiting_supplier, tpch_q22_global_sales_opportunity,
# streaming_sessionize_closed, dedup_ngram_jaccard,
# embedding_near_dups, embedding_near_dup_pairs_lsh,
# duplicate_spans_13gram, quic_v1_initial_fields, line_dedup_corpus,
# dsir_importance_select, dedup_incremental_lsh, curation_pipeline_e2e,
# bpe_token_counts, quic_capture_to_sni, streaming_dedup_incremental,
# ppl_filter_stupid_backoff), then the oldest of the r8-rowed block.
# After r11 no query's latest row should be older than r8.
_CHECK_PRIORITY = (
    # --- (a) new in r10 ---
    "decode_pipeline_gzip_mime",    # gzip round-trip + MIME leaf walk
                                    # (r9 ask #4; was pytest-only)
    "banded_hamming_equivalence",   # banded == brute force on random
                                    # md5 signatures (r9 ask #6)
    "decode_pipeline_xor_gzip",     # xor-brute key search + inflate
                                    # (was pytest-only)
    "decode_carve_files",           # signature-scan carve w/ end-marker
                                    # lengths (was pytest-only)
    "bm25_repair_serve",            # crash-replay repair → serve ==
                                    # clean-index oracle (was pytest-only)
    "ann_repair_serve",             # the ANN counterpart (was pytest-only)
    "user_forced_expression_timelimit",  # row-level security: forced
                                         # expr + lookback clamp
                                         # (was pytest-only)
    "es_index_rotation",            # time-rotated index naming ×4
                                    # (was pytest-only)
    "streaming_packet_dedup",       # cross-batch dropDuplicates state
                                    # (was pytest-only)
    # --- (b) the 30-gate r6 tail (the pre-declared r10 head), in its
    #     r6 check order ---
    "misc_parse_fields", "multimodal_features", "pcap_export_sessions",
    "pcap_packet_positions", "rules_tagging",
    "session_segments_merge", "session_store_bounded_either",
    "sessionize_chunked_rootid", "sessionize_events_30m",
    "sessionize_per_proto_timeouts", "smb_parse_fields",
    "smtp_parse_fields",
    "ssh_hassh_fields", "suricata_interval_join", "tls_ja3_fields",
    "tpch_q10_returned_items", "tpch_q11_important_stock",
    "tpch_q12_shipmode_priority", "tpch_q13_order_distribution",
    "tpch_q14_promo_effect", "tpch_q15_top_supplier",
    "tpch_q16_supplier_cnt", "tpch_q17_small_qty_revenue",
    "tpch_q18_large_orders", "tpch_q2_min_cost_supplier",
    "tpch_q4_priority_exists", "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping", "tpch_q8_market_share",
    "tpch_q9_product_profit",
    # --- (c) the 11 oldest r7-rowed gates, in r7 check order; the
    #     ~50 cap lands exactly after them ---
    "zorder_store_search", "ann_indexed_topk", "decontaminate_semantic",
    "bm25_stream_append_serve", "curate_cluster_balanced",
    "ann_stream_append_serve", "knn_label_vote",
    "tunnel_decap_roundtrip", "unique_multivalue_session_types",
    "x509_cert_fields", "yara_scan_documents",
    # --- (d) past the ~50 cap: the 39-gate r7 tail (next head per the
    #     ROUND-11 NOTE); unlisted gates (all r8/r9-rowed) follow in
    #     registration order. ---
    "dhcp_parse_fields",
    "irc_parse_fields", "socks_parse_fields", "radius_parse_fields",
    "ldap_parse_fields", "krb5_parse_fields", "mysql_parse_fields",
    "postgresql_parse_fields", "tns_parse_fields", "bgp_parse_fields",
    "http2_parse_fields", "quic_parse_fields", "pcap_over_ip_reframe",
    "multimodal_resize", "multimodal_frame_sample", "multimodal_audio",
    "pii_scan", "repetition_signals", "gopher_quality_flags",
    "quality_char_entropy", "curate_mixture_sample",
    "tpch_q19_disjunctive_revenue", "tpch_q20_part_supply_nation",
    "tpch_q21_waiting_supplier", "tpch_q22_global_sales_opportunity",
    "streaming_sessionize_closed", "dedup_ngram_jaccard",
    "embedding_near_dups", "embedding_near_dup_pairs_lsh",
    "duplicate_spans_13gram", "quic_v1_initial_fields",
    "line_dedup_corpus", "dsir_importance_select",
    "dedup_incremental_lsh", "curation_pipeline_e2e",
    "bpe_token_counts", "quic_capture_to_sni",
    "streaming_dedup_incremental", "ppl_filter_stupid_backoff",
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
