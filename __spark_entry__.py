"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship §2.C UTxO-balance pipeline at
sf0.001; ``queries()`` / ``oracle_sql()`` expose every implemented
operator from SURVEY.md §2 with its DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: watched-address lovelace
    balances over the unspent UTxO set (SURVEY §2.C)."""
    from argus_spark.operators.utxo import watched_balances

    return watched_balances(spark, "/root/testdata/sf0.001")


def _modules():
    from argus_spark.operators import relational, skew, temporal, utxo

    mods = []
    try:
        from argus_spark.datapipe import registry as dp_registry

        mods.append(dp_registry)
    except ImportError:
        pass
    mods.extend([relational, skew, temporal, utxo])
    return mods


# The correctness harness checks exactly the first 50 registry entries,
# so registration order is coverage policy (rotated each round so no
# query goes two rounds without a fresh row). Round-6 priority
# (stale-first, per the r5 verdict):
#   1. the 36 queries whose last fresh driver row is round-3 vintage
#      (they fell past r4/r5's 50-cap twice) — the whole dedup family
#      is in here;
#   2. queries changed this round (embedding_quantize_int8 q8_csv fix,
#      de-skewed fluency_unigram, scale-aware-k dedup_semantic,
#      de-vacuated anti_join_not_exists; dedup_ngram_jaccard's
#      integer-rational PPJoin fix rides tier 1) plus the eight NEW
#      round-6 operators (dsir_affinity, embedding_project_rp,
#      user_path_transitions, decontaminate_minhash,
#      heavy_hitter_tokens, winnow_fingerprints,
#      multimodal_payload_dedup, corpus_stats_by_source);
#   3. queries with a fresh green r5 row (these fall past the 50 cap
#      and ride their r5 evidence — one round stale, max).
# Keys absent from this list (future operators) are appended in module
# order before tier 3's tail.
_PRIORITY = [
    # -- tier 1: last fresh driver row is round 3 -------------------------
    "union_dedup_priority", "group_sum_pricing", "slot_arithmetic",
    "topk_newest", "json_extract", "count_by_key", "left_join_fillna",
    "dedup_keep_first", "duplicate_detect", "latest_per_key",
    "topk_serving", "set_intersect", "set_except", "running_sum_frame",
    "rollup_counts", "pivot_status", "hex_canonical", "prefix_display",
    "string_funcs", "stable_hash", "dedup_exact", "dedup_ngram_jaccard",
    "dedup_minhash_lsh", "dedup_simhash", "approx_distinct_users",
    "dedup_embedding_cosine", "dedup_clusters", "chunk_documents",
    "ngram_counts", "text_diversity", "approx_quantiles_value",
    "dedup_exact_substring", "curate_quality_topk", "ann_lsh_multiprobe",
    "dedup_minhash_estimate", "cohort_retention",
    # -- tier 2: changed or new this round --------------------------------
    "embedding_quantize_int8", "fluency_unigram", "dedup_semantic",
    "anti_join_not_exists", "dsir_affinity", "embedding_project_rp",
    "user_path_transitions", "decontaminate_minhash",
    "heavy_hitter_tokens", "winnow_fingerprints",
    "multimodal_payload_dedup", "corpus_stats_by_source",
    # -- tier 3: fresh green row in round 5 (oldest-registered first) -----
    "text_quality", "agg_min_max", "avg_by_key", "min_safe_intersection",
    "skew_salted_group_sum", "skew_salted_join", "asof_join_prior_view",
    "range_join_pairs", "cube_counts", "grouping_sets_value",
    "median_value_by_type", "tumbling_window_agg", "sliding_window_agg",
    "session_window_agg", "token_count", "sample_stratified",
    "pack_sequences", "doc_fingerprint", "lang_id_ngram",
    "dataset_mixture", "tfidf_top_terms", "ann_cosine_topk",
    "ann_lsh_bucketed", "text_normalize", "multimodal_frame_sample",
    "repetition_ratio", "ann_ivf_topk", "decontaminate_ngram_overlap",
    "multimodal_resize", "multimodal_meta", "kmeans_embeddings",
    "pii_redact", "dedup_keep_list", "funnel_conversion",
    "sample_quality_deciles", "watched_balances",
    "balances_after_rollback", "tx_flatten", "utxo_state", "utxo_spent",
    "utxo_unspent", "checkpoint_window", "filter_project",
    "explode_ordinal", "broadcast_lookup", "semi_join_exists",
]


def _ordered(maps: list[dict]) -> dict:
    merged: dict = {}
    for m in maps:
        merged.update(m)
    out = {k: merged[k] for k in _PRIORITY if k in merged}
    out.update({k: v for k, v in merged.items() if k not in out})
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered([m.QUERIES for m in _modules()])


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query key (same column names/aliases
    as the Spark result — the driver's compare is name-keyed)."""
    return _ordered([m.ORACLES for m in _modules()])
