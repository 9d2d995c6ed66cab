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
# ROUND-9 rotation (the r8 verdict's ask #1 / the r8 ROUND-9 NOTE,
# executed as written — there were no r8 reds):
#   (a) gates NEW in r9 (driver-row them the round they land),
#   (b) the 15-gate r5 tail the r8 window cut at position 50,
#   (c) the 50-query block whose latest row is r6 (next-oldest
#       signal), in its r6 check order — with the fifteen r9 gates in
#       (a) the ~50 cap lands after 20 of them,
#   (d) past the cap: the 30 remaining r6-rowed gates (the r10 head),
#       then the r7/r8-rowed gates in registration order — all
#       hash-green at their latest driver row and pytest-oracle-green
#       locally.
# ROUND-10 NOTE: next head = any r9 reds, any new r10 gates, then the
# 30-gate r6 tail of (d) (misc_parse_fields, multimodal_features,
# pcap_export_sessions,
# pcap_packet_positions, rules_tagging, session_segments_merge,
# session_store_bounded_either, sessionize_chunked_rootid,
# sessionize_events_30m, sessionize_per_proto_timeouts,
# smb_parse_fields, smtp_parse_fields, ssh_hassh_fields,
# suricata_interval_join, tls_ja3_fields, tpch_q10_returned_items,
# tpch_q11_important_stock, tpch_q12_shipmode_priority,
# tpch_q13_order_distribution, tpch_q14_promo_effect,
# tpch_q15_top_supplier, tpch_q16_supplier_cnt,
# tpch_q17_small_qty_revenue, tpch_q18_large_orders,
# tpch_q2_min_cost_supplier, tpch_q4_priority_exists,
# tpch_q6_forecast_revenue, tpch_q7_volume_shipping,
# tpch_q8_market_share, tpch_q9_product_profit), then the oldest of
# the r7-rowed block. After r10 no query's latest row should be older
# than r7.
_CHECK_PRIORITY = (
    # --- (a) new in r9 ---
    "multimodal_near_dup",        # banded-Hamming near-dup matching
                                  # across image/audio/video (r8 ask #2)
    "ann_alias_rebuild_serve",    # ANN alias lifecycle incl. vacuum +
                                  # orphan sweep under the driver
                                  # (r8 asks #3/#8)
    "decontaminate_semantic_lsh",  # the beyond-broadcast decontam
                                   # route, LSH-replay oracle (r8 ask #6)
    "geo_enrich_range_join",      # MaxMind-style lookup via the
                                  # bucketed range join (was pytest-only)
    "oui_enrich_mac_prefix",      # OUI prefix broadcast join
                                  # (was pytest-only)
    "decode_pipeline_http_b64",   # http_body+base64 decode stages
                                  # (was pytest-only)
    "geo6_enrich_range_join",     # v6 hex-range bucketed lookup
                                  # (was pytest-only)
    "reverse_dns_enrich",         # cached PTR-lookup UDF with injected
                                  # resolver (was pytest-only)
    "tcp_reassembly_sessions",    # seq-ordered stitch + gap tag
                                  # (was pytest-only)
    "ip_frag_reassembly",         # offset tiling + MF completeness
                                  # (was pytest-only)
    "classify_first_bytes_sessions",  # magic/port dispatch +
                                      # srcPayload8/dstPayload8
                                      # (was pytest-only)
    "tcp_handshake_rtt_sessions",     # initRTT/ack-delay + half-open
                                      # tags (was pytest-only)
    "expr_cidr_ip_port_fanout",       # ip pseudo-field fanout, CIDR
                                      # shorthand, :port pairing over
                                      # numeric companions (pytest-only)
    "expr_relative_date_snap",        # -4d@d / seconds-kind snapping
                                      # with a pinned clock (pytest-only)
    "expr_views_transforms_fileand",  # saved-view expansion + constant
                                      # transforms + fileand resolution
                                      # (was pytest-only)
    # --- (b) the 15-gate r5 tail the r8 window cut ---
    "dedup_lsh_candidates", "dedup_simhash", "ann_pq_adc_topk",
    "ann_ivf_pq_topk", "cron_forward_exactly_once", "semdedup_prune",
    "chunk_documents_sliding", "cms_ngram_counts",
    "remove_duplicate_spans", "hunt_node_fanout",
    "session_tag_update_prebuilt", "c4_line_filter",
    "bm25_topk_indexed_search", "ann_int8_topk",
    "bm25_index_append_search",
    # --- (c) latest driver row is r6 (20 here, in r6 check order; the
    #     cap lands exactly after them — the 30-gate r6 tail is in (d)
    #     below) ---
    "ann_ivf_int8_topk", "hybrid_rrf_indexed",
    "tpch_q3_shipping_priority", "tpch_q5_local_supplier_volume",
    "unique_autocomplete", "unique_event_type", "unique_pair_user_type",
    "wise_feed_enrich", "ann_brute_force_topk", "ann_ivf_topk",
    "ann_lsh_bucketed_topk", "corpus_ngram_stats", "cron_query_tick",
    "decontaminate_ngrams", "dedup_semantic_clusters",
    "dns_parse_fields", "expr_sessions_store_search",
    "frame_decode_roundtrip", "http_parse_fields",
    "hunt_ascii_and_regex",
    # --- (d) past the ~50 cap: the 30-gate r6 tail (next head per the
    #     ROUND-10 NOTE); unlisted gates (all r7/r8-rowed) follow in
    #     registration order. ---
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
