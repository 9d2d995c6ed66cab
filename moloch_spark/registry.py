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
# ROUND-7 rotation (the r6 verdict's ask #2 / the r6 ROUND-7 NOTE,
# executed as written — there were no r6 reds):
#   (a) gates NEW in r7 (driver-row them the round they land),
#   (b) the 4-gate r2 tail the r6 window cut at position 50,
#   (c) the 50-query block whose latest row is r4 (the oldest signal),
#       oldest-registered-first — the ~50 cap lands after 39 of them
#       (the four rows it cut lead the r8 tail; two of the four are
#       rows-only, whose driver row carries the least signal, and
#       bm25_topk_search's oracle is re-proven this round through
#       bm25_stream_append_serve),
#   (d) past the cap: the 11-query r4 tail, then the r5-rowed and
#       r6-rowed gates in registration order — all hash-green at their
#       latest driver row and pytest-oracle-green locally.
# ROUND-8 NOTE: next head = any r7 reds, any new r8 gates, then the
# 11-gate r4 tail of (d) (bm25_topk_search, bpe_train_and_apply,
# quality_classifier_filter, ppl_lang_buckets, embedding_pca_whiten,
# pq_encode_codes, ccnet_pipeline_e2e, warc_ingest_roundtrip,
# hybrid_rrf_search, hunt_job_control, streaming_state_cap), then the
# 50-gate r5 block (next-oldest signal). After r8 no query's latest
# row should be older than r6.
_CHECK_PRIORITY = (
    # --- (a) new in r7 ---
    "zorder_store_search",      # optimize_layout z-order rewrite through the store
    "ann_indexed_topk",         # IVF+SQ8 served from the persisted codes table
    "decontaminate_semantic",   # embedding-cosine eval decontamination
    "bm25_stream_append_serve",  # ledgered stream-fold -> indexed serve
    "curate_cluster_balanced",   # embedding-cluster diversity quota
    "ann_stream_append_serve",   # ledgered ANN stream-fold -> indexed serve
    "knn_label_vote",            # weak labeling by neighbor vote
    # --- (b) latest driver row is r2: the tail the r6 window cut (4) ---
    "tunnel_decap_roundtrip", "unique_multivalue_session_types",
    "x509_cert_fields", "yara_scan_documents",
    # --- (c) latest driver row is r4 (39 here; the cap lands exactly
    #     after them — the 11-gate r4 tail is in (d) below) ---
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
    # --- (d) past the ~50 cap: the r4 tail (next head per the
    #     ROUND-8 NOTE); unlisted gates (all r5/r6-rowed) follow in
    #     registration order. bm25_topk_search's oracle is shared
    #     verbatim by bm25_stream_append_serve (in this head), so its
    #     slip to the tail costs no oracle signal this round. ---
    "bm25_topk_search",
    "bpe_train_and_apply", "quality_classifier_filter", "ppl_lang_buckets",
    "embedding_pca_whiten", "pq_encode_codes", "ccnet_pipeline_e2e",
    "warc_ingest_roundtrip", "hybrid_rrf_search", "hunt_job_control",
    "streaming_state_cap",
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
