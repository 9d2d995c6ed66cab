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
# ROUND-11 rotation (the r10 verdict's ask #2 / the r10 ROUND-11 NOTE,
# executed as written — there were no r10 reds):
#   (a) gates NEW or semantics-changed in r11:
#       es_index_rotation (weekly convention fixed to the reference's
#       tm_yday/7 — ADVICE r10 medium — so its r10 row is stale),
#       usable_vector_contract (the NULL/NaN-element-extended
#       usability contract pinned engine-vs-oracle, direct fold vs
#       persisted flag), quality_classifier_filter (moved rows-only ->
#       oracle-backed: the 5 Adagrad iterations are unrolled in SQL),
#       history_audit_log and csv_export_sessions (the last two
#       pytest-only SURVEY 2.3 rows, r10 ask #8),
#   (b) the 39-gate r7 tail, in the pre-declared order,
#   (c) the 6 oldest r8-rowed gates, in their r8 check order — with
#       (a)+(b) the ~50 cap lands exactly after them,
#   (d) past the cap: the 43 remaining r8-rowed gates (the r12 head),
#       then the r9/r10-rowed gates in registration order — all
#       hash-green at their latest driver row and pytest-oracle-green
#       locally.
# ROUND-12 NOTE: next head = any r11 reds, any new r12 gates, then as
# much of the r8-rowed block of (d) as fits (it is 43 gates — the cap
# may land inside it; continue the remainder in r13), then the oldest
# r9-rowed gates. After r12 no gate's latest row should be older than
# r9 (or r8 if the r8 block spills).
_CHECK_PRIORITY = (
    # --- (a) new/changed in r11 ---
    "es_index_rotation",            # weekly now tm_yday//7 (ADVICE r10)
    "usable_vector_contract",       # element-valid + flag==fold parity
    "quality_classifier_filter",    # Adagrad loop unrolled in oracle
    "history_audit_log",            # audit log list (r10 ask #8)
    "csv_export_sessions",          # CSV export round-trip (r10 ask #8)
    # --- (b) the 39-gate r7 tail (the pre-declared r11 head) ---
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
    # --- (c) the 6 oldest r8-rowed gates; the ~50 cap lands after ---
    "knn_label_vote_indexed", "bm25_alias_rebuild_serve", "image_dhash_dedup",
    "audio_fingerprint_dedup", "bm25_topk_search", "bpe_train_and_apply",
    # --- (d) past the cap: the 43 remaining r8-rowed gates in r8
    #     check order (the r12 head); r9/r10 gates follow unlisted in
    #     registration order ---
    "ppl_lang_buckets", "embedding_pca_whiten", "pq_encode_codes",
    "ccnet_pipeline_e2e", "warc_ingest_roundtrip", "hybrid_rrf_search",
    "hunt_job_control", "streaming_state_cap", "tpch_q1_pricing_summary",
    "sessions_search_events", "timeline_events_hourly",
    "timeline_events_dense", "cardinality_fields", "multiunique_user_event",
    "spiview_events", "spigraph_sum_metric_rank", "spigraph_event_type_daily",
    "spigraph_hierarchy_orders", "connections_nation_graph",
    "connections_baseline_events", "expr_bool_and_list",
    "expr_ne_null_semantics", "expr_wildcard_date_range",
    "expr_textfield_phrase", "expr_shortcut_semijoin",
    "connections_components", "session_tag_update", "multies_scatter_gather",
    "dstats_derived_rates", "sessions_page_offset", "curate_split_assign",
    "curate_global_shuffle", "curate_pack_sequences",
    "curate_weighted_sample", "enrich_region_rollup", "drophash_filter",
    "asof_feed_enrich", "text_stats", "lang_id", "token_counts",
    "doc_fingerprint", "dedup_exact", "dedup_minhash_signatures",
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
