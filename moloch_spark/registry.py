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
# ROUND-8 rotation (the r7 verdict's ask #1 / the r7 ROUND-8 NOTE,
# executed as written — there were no r7 reds):
#   (a) gates NEW in r8 (driver-row them the round they land),
#   (b) the 11-query r4 tail the r7 window cut at position 50 (incl.
#       the three rows-only iterative-training gates),
#   (c) the 50-query block whose latest row is r5 (next-oldest
#       signal), in its r5 check order — with the four r8 gates in
#       (a) the ~50 cap lands after 35 of them,
#   (d) past the cap: the 15 remaining r5-rowed gates (the r9 head),
#       then the r6/r7-rowed gates in registration order — all
#       hash-green at their latest driver row and pytest-oracle-green
#       locally.
# ROUND-9 NOTE: next head = any r8 reds, any new r9 gates, then the
# 15-gate r5 tail of (d) (dedup_lsh_candidates, dedup_simhash, ann_pq_adc_topk,
# ann_ivf_pq_topk, cron_forward_exactly_once, semdedup_prune,
# chunk_documents_sliding, cms_ngram_counts, remove_duplicate_spans,
# hunt_node_fanout, session_tag_update_prebuilt, c4_line_filter,
# bm25_topk_indexed_search, ann_int8_topk, bm25_index_append_search),
# then the oldest of the r6-rowed block. After r9 no query's latest
# row should be older than r6.
_CHECK_PRIORITY = (
    # --- (a) new in r8 ---
    "knn_label_vote_indexed",   # labeler served from the persisted
                                # labeled-row IVF+SQ8 index (r7 ask #2)
    "bm25_alias_rebuild_serve",  # alias paved-road lifecycle under the
                                 # driver (r7 ask #3)
    "image_dhash_dedup",         # perceptual-hash image dedup over the
                                 # real PNG decode path
    "audio_fingerprint_dedup",   # acoustic-fingerprint dedup over the
                                 # real WAV decode path
    # --- (b) the 11-gate r4 tail the r7 window cut ---
    "bm25_topk_search",
    "bpe_train_and_apply", "quality_classifier_filter", "ppl_lang_buckets",
    "embedding_pca_whiten", "pq_encode_codes", "ccnet_pipeline_e2e",
    "warc_ingest_roundtrip", "hybrid_rrf_search", "hunt_job_control",
    "streaming_state_cap",
    # --- (c) latest driver row is r5 (35 here; the cap lands exactly
    #     after them — the 15-gate r5 tail is in (d) below) ---
    "tpch_q1_pricing_summary", "sessions_search_events",
    "timeline_events_hourly", "timeline_events_dense",
    "cardinality_fields", "multiunique_user_event", "spiview_events",
    "spigraph_sum_metric_rank", "spigraph_event_type_daily",
    "spigraph_hierarchy_orders", "connections_nation_graph",
    "connections_baseline_events", "expr_bool_and_list",
    "expr_ne_null_semantics", "expr_wildcard_date_range",
    "expr_textfield_phrase", "expr_shortcut_semijoin",
    "connections_components", "session_tag_update",
    "multies_scatter_gather", "dstats_derived_rates",
    "sessions_page_offset", "curate_split_assign",
    "curate_global_shuffle", "curate_pack_sequences",
    "curate_weighted_sample", "enrich_region_rollup", "drophash_filter",
    "asof_feed_enrich", "text_stats", "lang_id", "token_counts",
    "doc_fingerprint", "dedup_exact", "dedup_minhash_signatures",
    # --- (d) past the ~50 cap: the 15-gate r5 tail (next head per the
    #     ROUND-9 NOTE); unlisted gates (all r6/r7-rowed) follow in
    #     registration order. ---
    "dedup_lsh_candidates", "dedup_simhash", "ann_pq_adc_topk",
    "ann_ivf_pq_topk", "cron_forward_exactly_once", "semdedup_prune",
    "chunk_documents_sliding", "cms_ngram_counts",
    "remove_duplicate_spans", "hunt_node_fanout",
    "session_tag_update_prebuilt", "c4_line_filter",
    "bm25_topk_indexed_search", "ann_int8_topk",
    "bm25_index_append_search",
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
