"""Plan-quality gates: lock in the physical-plan properties that make
the operators scale (pushdown, pruning, broadcast, partial agg,
map-only pipelines). A failure here is a 100 TB regression caught at
60 k rows."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from argus_spark.datapipe.dedup import dedup_exact
from argus_spark.datapipe.similarity import ann_cosine_topk
from argus_spark.datapipe.text import text_quality, token_count
from argus_spark.operators.relational import (
    broadcast_lookup,
    filter_project,
    group_sum_pricing,
    semi_join_exists,
)
from argus_spark.operators.utxo import watched_balances
from argus_spark.plans.checks import (
    formatted_plan,
    has_broadcast_hash_join,
    has_partial_aggregation,
    has_sort_merge_join,
    n_shuffle_exchanges,
    pushed_filters,
    scan_columns,
)
from tests.conftest import SF_SMOKE


def test_filter_project_pushes_down_and_prunes(spark):
    plan = formatted_plan(filter_project(spark, SF_SMOKE))
    pushed = pushed_filters(plan)
    assert any("l_quantity" in p for p in pushed), plan
    assert any("l_shipdate" in p for p in pushed), plan
    cols = scan_columns(plan)
    # 7 needed columns, not the full 11-column lineitem schema
    assert "l_comment" not in cols and "l_tax" not in cols, cols
    assert n_shuffle_exchanges(plan) == 0, plan


def test_broadcast_lookup_broadcasts_dims(spark):
    plan = formatted_plan(broadcast_lookup(spark, SF_SMOKE))
    assert has_broadcast_hash_join(plan), plan
    assert not has_sort_merge_join(plan), plan
    assert n_shuffle_exchanges(plan) == 0, plan  # fact side never shuffles


def test_group_sum_pricing_partial_agg_single_shuffle(spark):
    plan = formatted_plan(group_sum_pricing(spark, SF_SMOKE))
    assert has_partial_aggregation(plan), plan
    assert n_shuffle_exchanges(plan) == 1, plan


def test_semi_join_is_hash_join_not_cartesian(spark):
    plan = formatted_plan(semi_join_exists(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan.replace(
        "BroadcastNestedLoop", ""
    ), plan


def test_watched_balances_broadcasts_watched_set(spark):
    plan = formatted_plan(watched_balances(spark, SF_SMOKE))
    assert has_broadcast_hash_join(plan), plan


def test_dedup_exact_is_one_shuffle(spark):
    plan = formatted_plan(dedup_exact(spark, SF_SMOKE))
    assert has_partial_aggregation(plan), plan
    assert n_shuffle_exchanges(plan) == 1, plan


def test_text_ops_are_map_only(spark):
    for q in (text_quality, token_count):
        plan = formatted_plan(q(spark, SF_SMOKE))
        assert n_shuffle_exchanges(plan) == 0, plan


def test_ann_broadcasts_queries_no_corpus_shuffle(spark):
    plan = formatted_plan(ann_cosine_topk(spark, SF_SMOKE))
    # corpus side: scan → cosine → window. The only hash shuffle allowed
    # is the per-query top-k window partitioning.
    assert n_shuffle_exchanges(plan) <= 1, plan


def test_sample_stratified_is_map_only(spark):
    from argus_spark.datapipe.sampling import sample_stratified

    plan = formatted_plan(sample_stratified(spark, SF_SMOKE))
    assert n_shuffle_exchanges(plan) == 0, plan


def test_tfidf_partial_aggregates(spark):
    from argus_spark.datapipe.sampling import tfidf_top_terms

    plan = formatted_plan(tfidf_top_terms(spark, SF_SMOKE))
    assert has_partial_aggregation(plan), plan


def test_ann_ivf_corpus_never_shuffles_for_assignment(spark):
    from argus_spark.datapipe.similarity import ann_ivf_topk

    plan = formatted_plan(ann_ivf_topk(spark, SF_SMOKE))
    # codebook folds to one broadcast row → cell assignment is map-side;
    # probe is a broadcast hash join on cell; the only corpus-derived
    # shuffle is the per-query top-k window over probed candidates.
    assert has_broadcast_hash_join(plan), plan
    assert not has_sort_merge_join(plan), plan
    assert n_shuffle_exchanges(plan) <= 1, plan


def test_ann_ivf_pq_corpus_never_shuffles_for_assignment(spark):
    from argus_spark.datapipe.similarity import ann_ivf_pq_topk

    plan = formatted_plan(ann_ivf_pq_topk(spark, SF_SMOKE))
    # both codebooks fold to one-row broadcasts → cell assignment AND
    # PQ reconstruction are map-side; probe = broadcast hash join on
    # cell; the only corpus-derived shuffle is the final top-k window.
    assert has_broadcast_hash_join(plan), plan
    assert not has_sort_merge_join(plan), plan
    assert n_shuffle_exchanges(plan) <= 1, plan


def test_embedding_cosine_has_no_nested_loop(spark):
    """Round-1 verdict: the all-pairs theta join compiled to a
    BroadcastNestedLoop (O(n²)). The banded-LSH rework must keep every
    join equi-keyed."""
    from argus_spark.datapipe.dedup import dedup_embedding_cosine

    plan = formatted_plan(dedup_embedding_cosine(spark, SF_SMOKE))
    assert "BroadcastNestedLoop" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_ngram_jaccard_prefix_filter_bounds_candidates(spark):
    """The AllPairs prefix filter must (a) keep the join equi-keyed and
    (b) actually cut the inverted index: prefix entries ≤ ~(1-τ)·tokens
    + 1 per doc, far below the full token explode."""
    from pyspark.sql import functions as F

    from argus_spark.datapipe.dedup import JACCARD_TAU, dedup_ngram_jaccard
    from argus_spark.datapipe.hashing import words_col
    from argus_spark.session import load

    plan = formatted_plan(dedup_ngram_jaccard(spark, SF_SMOKE))
    assert "BroadcastNestedLoop" not in plan, plan
    assert "CartesianProduct" not in plan, plan

    d = load(spark, SF_SMOKE, "documents").select(
        F.size(F.array_distinct(words_col())).alias("n")
    )
    tot = d.agg(
        F.sum("n").alias("tokens"),
        F.sum(
            F.col("n") - F.ceil(F.lit(JACCARD_TAU) * F.col("n")) + 1
        ).alias("prefix"),
    ).first()
    # prefix index ≈ (1-τ)+1/n of the full index — at τ=0.9 under 20%
    assert tot["prefix"] < 0.25 * tot["tokens"], tot


def test_textprep_map_only_ops_have_zero_shuffles(spark):
    from argus_spark.datapipe.textprep import (
        chunk_documents,
        dedup_repeated_spans,
        gopher_rules_filter,
        pii_redact,
        text_diversity,
    )

    for q in (
        chunk_documents,
        pii_redact,
        text_diversity,
        dedup_repeated_spans,
        gopher_rules_filter,
    ):
        plan = formatted_plan(q(spark, SF_SMOKE))
        assert n_shuffle_exchanges(plan) == 0, (q.__name__, plan)


def test_ngram_counts_partial_aggs_before_single_exchange(spark):
    from argus_spark.datapipe.textprep import ngram_counts

    plan = formatted_plan(ngram_counts(spark, SF_SMOKE))
    assert has_partial_aggregation(plan), plan
    # one exchange for the count; the global top-100 must be a
    # TakeOrdered over the grouped result, not a full Sort+Exchange
    assert n_shuffle_exchanges(plan) == 1, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_exact_substring_equi_joins_and_partial_aggs(spark):
    from argus_spark.datapipe.dedup import dedup_exact_substring

    plan = formatted_plan(dedup_exact_substring(spark, SF_SMOKE))
    assert "BroadcastNestedLoop" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert has_partial_aggregation(plan), plan


def test_ann_multiprobe_keeps_bucketed_plan_shape(spark):
    from argus_spark.datapipe.similarity import ann_lsh_multiprobe

    plan = formatted_plan(ann_lsh_multiprobe(spark, SF_SMOKE))
    # probe expansion lives on the (tiny) query side; corpus still
    # computes one map-side bucket and meets queries in a broadcast
    # equi-join — only the per-query top-k window may shuffle
    assert has_broadcast_hash_join(plan), plan
    assert not has_sort_merge_join(plan), plan
    assert n_shuffle_exchanges(plan) <= 1, plan


def test_curate_single_ranking_shuffle(spark):
    from argus_spark.datapipe.textprep import curate_quality_topk

    plan = formatted_plan(curate_quality_topk(spark, SF_SMOKE))
    # quality features are map-side; the only exchange is the
    # per-source ranking window
    assert n_shuffle_exchanges(plan) == 1, plan


def test_minhash_estimate_all_joins_equi(spark):
    from argus_spark.datapipe.dedup import dedup_minhash_estimate

    plan = formatted_plan(dedup_minhash_estimate(spark, SF_SMOKE))
    assert "BroadcastNestedLoop" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_assign_fixed_codebook_queries_are_map_only(spark):
    """The two fixed-codebook assignment queries (r13 verdict #4) are
    pure map work — row-per-vector output, codebook driver-side — so
    their plans must carry NO Exchange at all; the broadcast variant
    must additionally show the Arrow kernel (MapInPandas), the staged
    variant must NOT fall back to it (literal scan stays JVM-side)."""
    from argus_spark.datapipe.clustering import (
        assign_broadcast_codebook,
        assign_staged_clustered,
    )

    staged = formatted_plan(assign_staged_clustered(spark, SF_SMOKE))
    assert "Exchange" not in staged, staged
    assert "MapInPandas" not in staged, staged
    bkast = formatted_plan(assign_broadcast_codebook(spark, SF_SMOKE))
    assert "Exchange" not in bkast, bkast
    assert "MapInPandas" in bkast, bkast


def test_dedup_semantic_one_corpus_shuffle_no_nested_loop(spark):
    """SemDeDup contract: cell assignment is map-side (codebook enters
    as a driver literal), so the only corpus shuffles are the in-cell
    equi pair join + the keep anti-join — never a cartesian."""
    from argus_spark.datapipe.clustering import dedup_semantic

    plan = formatted_plan(dedup_semantic(spark, SF_SMOKE))
    assert "BroadcastNestedLoop" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_quantize_one_stats_exchange_map_side_codes(spark):
    """int8 quantization: ONE partial-aggregated min/max reduction;
    the codes themselves are map-side behind a one-row broadcast
    (never a corpus shuffle)."""
    from argus_spark.datapipe.quantize import embedding_quantize_int8

    plan = formatted_plan(embedding_quantize_int8(spark, SF_SMOKE))
    assert has_partial_aggregation(plan), plan
    assert n_shuffle_exchanges(plan) <= 1, plan


def test_fluency_vocab_partial_agg_broadcast_no_token_window(spark):
    """fluency_unigram (r5-verdict scale-killer fix): the vocabulary is
    a map-side-PARTIAL groupBy (skew-immune under Zipfian tokens) and
    attaches via BROADCAST join; a ``count OVER (PARTITION BY tok)``
    window — which ships every occurrence of each token to one task —
    must never reappear in this plan."""
    from argus_spark.datapipe.textprep import fluency_unigram

    plan = formatted_plan(fluency_unigram(spark, SF_SMOKE))
    assert has_partial_aggregation(plan), plan
    assert "Window" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_funnel_all_equi_joins_partial_aggs(spark):
    from argus_spark.operators.temporal import funnel_conversion

    plan = formatted_plan(funnel_conversion(spark, SF_SMOKE))
    assert "BroadcastNestedLoop" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert has_partial_aggregation(plan), plan


def test_quality_deciles_single_ranking_shuffle(spark):
    """sample_quality_deciles: features are map-side; the per-source
    ntile window is the ONE exchange; the hash keep-filter adds none."""
    from argus_spark.datapipe.sampling import sample_quality_deciles

    plan = formatted_plan(sample_quality_deciles(spark, SF_SMOKE))
    assert n_shuffle_exchanges(plan) == 1, plan


def test_dsir_model_broadcast_partial_agg_no_token_window(spark):
    """dsir_affinity: both 256-row bucket models build via map-side
    PARTIAL aggregates and attach by BROADCAST; the only corpus-sized
    exchange is the per-doc rollup. No Window over raw token
    occurrences, no cartesian on data paths (the one-row totals frame
    enters via broadcast)."""
    from argus_spark.datapipe.dsir import dsir_affinity

    plan = formatted_plan(dsir_affinity(spark, SF_SMOKE))
    assert has_partial_aggregation(plan), plan
    assert "BroadcastHashJoin" in plan, plan
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_rp_projection_is_map_only(spark):
    """embedding_project_rp: a pure scan→project pass — the planes are
    plan literals, every component an ordered fold; ZERO shuffles."""
    from argus_spark.datapipe.similarity import embedding_project_rp

    plan = formatted_plan(embedding_project_rp(spark, SF_SMOKE))
    assert n_shuffle_exchanges(plan) == 0, plan


def test_path_transitions_user_window_then_partial_agg(spark):
    """user_path_transitions: one user-keyed window exchange (huge key
    cardinality, short sequences — skew-safe) + a partial-aggregated
    (from,to) rollup; never a self-join or cartesian."""
    from argus_spark.operators.temporal import user_path_transitions

    plan = formatted_plan(user_path_transitions(spark, SF_SMOKE))
    assert has_partial_aggregation(plan), plan
    assert n_shuffle_exchanges(plan) <= 2, plan
    assert "CartesianProduct" not in plan, plan


def test_decontaminate_minhash_equi_probe_no_cartesian(spark):
    """decontaminate_minhash: band probe and verify joins are all
    equi-keyed — never a corpus×benchmark nested loop."""
    from argus_spark.datapipe.dedup import decontaminate_minhash

    plan = formatted_plan(decontaminate_minhash(spark, SF_SMOKE))
    assert "BroadcastNestedLoop" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_winnow_fingerprints_map_only(spark):
    """winnow_fingerprints: shingle hash → window minima → distinct →
    explode all inside one projection — zero shuffles at any scale."""
    from argus_spark.datapipe.text import winnow_fingerprints

    plan = formatted_plan(winnow_fingerprints(spark, SF_SMOKE))
    assert n_shuffle_exchanges(plan) == 0, plan


def test_heavy_hitters_exact_side_partial_agg_single_shuffle(spark):
    """heavy_hitter_tokens: the exact side is ONE corpus pass — the
    total token count is folded back over the grouped counts as a
    one-row broadcast, and both branches share the SAME
    hashpartitioning(tok) exchange. Proven via the planner's
    ReuseExchange rule (explain with AQE off — with AQE on the reuse
    happens at runtime stage submission and isn't in the static plan):
    exactly one hash exchange + a ReusedExchange node. The freqItems
    sketch pass is a separate one-shot job (the sketch contract)."""
    from argus_spark.datapipe.text import heavy_hitter_tokens

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = formatted_plan(heavy_hitter_tokens(spark, SF_SMOKE))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert has_partial_aggregation(plan), plan
    assert n_shuffle_exchanges(plan) == 1, plan
    assert "ReusedExchange" in plan, plan


def test_multimodal_payload_dedup_partial_agg_single_shuffle(spark):
    """multimodal_payload_dedup: digest inside the Arrow decode pass,
    then ONE map-side-combinable aggregate on uniform digest keys."""
    from argus_spark.datapipe.multimodal import multimodal_payload_dedup

    plan = formatted_plan(multimodal_payload_dedup(spark, SF_SMOKE))
    assert has_partial_aggregation(plan), plan
    assert n_shuffle_exchanges(plan) == 1, plan


def test_curation_pipeline_no_cartesian_no_nlj(spark):
    """curation_pipeline: the end-to-end composed plan (keep-list →
    decontamination → DSIR quintiles → quality top-k → packing) must
    keep every stage seam an equi/semi/anti hash join — a lost
    broadcast or a join that degrades to a nested loop at a seam is
    invisible to the per-stage gates, which is why the composition
    gets its own. Exactly ONE BroadcastNestedLoopJoin is expected and
    allowed: dsir_affinity's scalar-totals crossJoin, whose build side
    is a one-row aggregate (a broadcast of two counters, not a data
    join); anything beyond it means a seam degraded."""
    from argus_spark.datapipe.curation import curation_packed

    plan = formatted_plan(curation_packed(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan, plan
    # tree line + detail section ⇒ each physical BNLJ prints twice
    n_bnlj = plan.count("BroadcastNestedLoopJoin") // 2
    assert n_bnlj <= 1, plan


def test_tpch_shape_joins_take_ordered_and_pushdown(spark):
    """Q3/Q5/Q10 shapes: top-k must be TakeOrderedAndProject (per-
    partition heap, never a global sort of the agg output), every scan
    keeps its pushed filter, and no join seam degrades to a cartesian
    or nested loop at any SF."""
    from argus_spark.operators.relational import (
        regional_revenue,
        returned_item_losses,
        shipping_priority_topk,
    )

    for fn, topk in (
        (shipping_priority_topk, True),
        (regional_revenue, False),
        (returned_item_losses, True),
    ):
        plan = formatted_plan(fn(spark, SF_SMOKE))
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan
        assert has_partial_aggregation(plan), plan
        assert pushed_filters(plan), plan
        if topk:
            assert "TakeOrderedAndProject" in plan, plan


def test_embedding_standardize_broadcast_stats_no_data_shuffle(spark):
    """embedding_standardize: the 64-key stats aggregate must be
    partial (map-side) and the stats frame must come back as a
    broadcast join — the exploded data stream itself never shuffles."""
    from argus_spark.datapipe.similarity import embedding_standardize

    plan = formatted_plan(embedding_standardize(spark, SF_SMOKE))
    assert has_partial_aggregation(plan), plan
    assert has_broadcast_hash_join(plan), plan
    assert not has_sort_merge_join(plan), plan


def test_source_token_overlap_no_cartesian_bounded_fanout(spark):
    """source_token_overlap: the pair expansion must stay an equi-join
    on tok (per-token fan-out <= |sources|^2), never a cartesian or
    nested loop over sources x sources x rows."""
    from argus_spark.datapipe.text import source_token_overlap

    plan = formatted_plan(source_token_overlap(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert has_partial_aggregation(plan), plan


def test_ann_pq_adc_single_shuffle_no_cartesian(spark):
    """ann_pq_adc_topk: codebook encode + reconstruction must be pure
    map-side behind broadcasts — the ONLY shuffle is the final
    per-query top-k window. The two BroadcastNestedLoopJoins are the
    one-row codebook and the 8-row query set (intended broadcast
    shapes), never a corpus-sized side."""
    from argus_spark.datapipe.similarity import ann_pq_adc_topk

    plan = formatted_plan(ann_pq_adc_topk(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan, plan
    assert n_shuffle_exchanges(plan) == 1, plan
    assert plan.count("BroadcastNestedLoopJoin") // 2 <= 2, plan


def test_sessionize_single_window_exchange(spark):
    """sessionize_events: the lag flag and the running session ordinal
    share one user_id window partitioning — exactly one shuffle."""
    from argus_spark.operators.temporal import sessionize_events

    plan = formatted_plan(sessionize_events(spark, SF_SMOKE))
    assert n_shuffle_exchanges(plan) == 1, plan
    assert has_partial_aggregation(plan), plan


def test_boilerplate_broadcasts_flag_table(spark):
    """boilerplate_chunk_removal: the df >= MINDF flag table must come
    back as a BROADCAST join onto the chunk stream (true boilerplate
    is rare), and the df aggregate must be partial."""
    from argus_spark.datapipe.textprep import boilerplate_chunk_removal

    plan = formatted_plan(boilerplate_chunk_removal(spark, SF_SMOKE))
    assert has_broadcast_hash_join(plan), plan
    assert has_partial_aggregation(plan), plan
    assert "CartesianProduct" not in plan, plan


def test_fluency_bigram_equi_join_probe_no_cartesian(spark):
    """fluency_bigram: the c2 model probe must stay an equi-join on
    (prev, cur) — never a cartesian; the only BroadcastNestedLoopJoin
    allowed is the one-row vocabulary-size frame."""
    from argus_spark.datapipe.lm import fluency_bigram

    plan = formatted_plan(fluency_bigram(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") // 2 <= 1, plan
    assert has_partial_aggregation(plan), plan


def test_weighted_bernoulli_map_side_zero_data_shuffle(spark):
    """weighted_sample_bernoulli: one tiny totals aggregate broadcast
    back, then a pure map-side filter — the document stream itself
    never shuffles."""
    from argus_spark.datapipe.sampling import weighted_sample_bernoulli

    plan = formatted_plan(weighted_sample_bernoulli(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan, plan
    # the only exchanges allowed are the one-row totals aggregate's
    # (partial -> final over a single row), never a doc-keyed shuffle
    assert n_shuffle_exchanges(plan) <= 1, plan


def test_phash_dedup_banded_equi_join_no_cartesian(spark):
    """multimodal_phash_dedup: signatures collapse to distinct groups
    before the pair join, and candidates come from the chunk-band
    equi-join — never a cartesian/nested-loop over documents."""
    from argus_spark.datapipe.multimodal import multimodal_phash_dedup

    plan = formatted_plan(multimodal_phash_dedup(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert has_partial_aggregation(plan), plan  # signature-group collapse


def test_ann_recall_matrix_no_cartesian_beyond_tag_frame(spark):
    """ann_recall_at_k: the only nested-loop join allowed is the 3-row
    variant-tag broadcast; everything else must stay equi/banded —
    never a corpus-side cartesian."""
    from argus_spark.datapipe.similarity import ann_recall_at_k

    plan = formatted_plan(ann_recall_at_k(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan, plan
    assert has_partial_aggregation(plan), plan
    # r15: the truth⋈approx left join is hinted broadcast (both sides
    # are sample-bounded at any corpus scale) — a SortMergeJoin here
    # would mean the hint regressed and the two tiny frames are being
    # shuffled + sorted again.
    assert "SortMergeJoin" not in plan, plan


def test_ann_whitened_recall_no_cartesian_beyond_tag_frame(spark):
    """ann_whitened_recall: same contract as the main recall matrix —
    the only nested loop allowed is the 2-row variant-tag broadcast;
    both LSH sides stay broadcast equi-joins on their bucket columns
    (the whitening matrix rides the plan as literals, map-side)."""
    from argus_spark.datapipe.similarity import ann_whitened_recall

    plan = formatted_plan(ann_whitened_recall(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan, plan
    assert has_partial_aggregation(plan), plan
    assert has_broadcast_hash_join(plan), plan
    # r15: same broadcast-hinted truth⋈approx seam as ann_recall_at_k
    assert "SortMergeJoin" not in plan, plan


def test_dedup_audit_pairs_no_cartesian_no_nlj(spark):
    """dedup_audit_pairs: pure composition — cluster frame × signal
    pair frames on (kept_id, doc_id) equi-joins + two doc_id joins for
    the md5 column. A lost equi-condition degrading any seam to a
    nested loop would be quadratic in pair count at scale."""
    from argus_spark.datapipe.dedup import dedup_audit_pairs

    plan = formatted_plan(dedup_audit_pairs(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoop" not in plan, plan


def test_dedup_incremental_delta_broadcasts_delta_one_shuffle(spark):
    """dedup_incremental_delta: the base index must NEVER shuffle —
    the delta band frame broadcasts onto it (BroadcastHashJoin), and
    the only exchange is the tiny delta×delta self-join. A plan that
    shuffles the base side re-processes the indexed corpus per shard,
    which is exactly what the incremental operator exists to avoid."""
    from argus_spark.datapipe.dedup import dedup_incremental_delta

    plan = formatted_plan(dedup_incremental_delta(spark, SF_SMOKE))
    assert has_broadcast_hash_join(plan), plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoop" not in plan, plan
    assert n_shuffle_exchanges(plan) <= 2, plan


def test_token_budget_mixture_partial_agg_broadcast_rates(spark):
    """token_budget_mixture: per-source token totals are a map-side-
    partial aggregate; the ~|sources|-row rate frame broadcasts back
    onto the pool (BroadcastHashJoin — the corpus never reshuffles for
    the copy-count stamp). The one BroadcastNestedLoopJoin allowed is
    the 1-row token-total crossJoin; a corpus-side cartesian is not."""
    from argus_spark.datapipe.sampling import token_budget_mixture

    plan = formatted_plan(token_budget_mixture(spark, SF_SMOKE))
    assert has_partial_aggregation(plan), plan
    assert has_broadcast_hash_join(plan), plan
    assert "CartesianProduct" not in plan, plan
    assert n_shuffle_exchanges(plan) <= 2, plan


def test_embedding_gram_matrix_single_skinny_shuffle(spark):
    """embedding_gram_matrix: the corpus is consumed in one Arrow pass
    (mapInPandas partials, ≤ 2,080 rows per partition) and the ONLY
    exchange is the partial-agged sum over those skinny rows — the
    treeAggregate shape. A corpus-side shuffle or a per-vector explode
    surviving into the plan would be a d²× row blowup at scale."""
    from argus_spark.datapipe.quantize import embedding_gram_matrix

    plan = formatted_plan(embedding_gram_matrix(spark, SF_SMOKE))
    assert has_partial_aggregation(plan), plan
    assert n_shuffle_exchanges(plan) == 1, plan
    assert "CartesianProduct" not in plan, plan


def test_embedding_audit_pairs_is_composition(spark):
    """embedding_audit_pairs: pure composition of two existing skinny
    verified pair frames — the only NEW work is one full-outer
    equi-join on (vec_a, vec_b). No cartesian, no nested loop anywhere
    in the composed plan: a lost equi-condition on the audit join
    would be quadratic in pair count, and a nested loop inside either
    source would mean the composition broke the sources' own gates."""
    from argus_spark.datapipe.clustering import embedding_audit_pairs

    plan = formatted_plan(embedding_audit_pairs(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoop" not in plan, plan


def test_embedding_whiten_map_only(spark):
    """embedding_whiten: the fitted matrix rides the plan as literals,
    so the projection is a pure scan→project pass — ZERO exchanges; a
    shuffle here would mean the corpus moves for a map-side op."""
    from argus_spark.datapipe.quantize import embedding_whiten

    plan = formatted_plan(embedding_whiten(spark, SF_SMOKE))
    assert n_shuffle_exchanges(plan) == 0, plan
    assert "CartesianProduct" not in plan, plan
    # column pruning: only vec_id + embedding read
    cols = scan_columns(plan)
    assert cols <= {"vec_id", "embedding"}, cols


def test_incremental_delta_bucketed_base_never_shuffles(spark, tmp_path):
    """The stored-index claim, proven with the PRODUCTION functions
    (r11 verdict #3 — no longer an ad-hoc test-local table):
    ``write_base_band_index`` persists the base band index
    bucketed+sorted on (band, bh) via ``operators.bucketed``; the
    stored-probe path must (a) return EXACTLY the recompute path's
    rows, (b) broadcast the delta with zero shuffles on the base probe,
    and (c) in the NON-broadcast regime (delta too big to broadcast)
    shuffle ONLY the delta side — the bucketed base scan feeds the
    sort-merge join without an Exchange. This is the plan a daily
    100 TB drop actually runs: the corpus index is written once,
    bucketed on the join key, and every subsequent shard pays one
    delta-sized shuffle."""
    from pyspark.sql import functions as F

    from argus_spark.datapipe.dedup import (
        dedup_incremental_delta,
        dedup_incremental_delta_stored,
        delta_band_index,
        write_base_band_index,
    )

    tbl = "base_band_idx_t"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    write_base_band_index(
        spark, SF_SMOKE, tbl, n_buckets=8,
        path=str(tmp_path / "base_band_idx"),
    )
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # (a) identical output: stored-then-joined ≡ computed-then-joined
        want = sorted(
            map(tuple, dedup_incremental_delta(spark, SF_SMOKE).collect())
        )
        got = sorted(
            map(
                tuple,
                dedup_incremental_delta_stored(spark, SF_SMOKE, tbl).collect(),
            )
        )
        assert got == want

        # (b) broadcast regime: the base probe has ZERO exchanges
        probe = spark.table(tbl).join(
            F.broadcast(delta_band_index(spark, SF_SMOKE)), ["band", "bh"]
        )
        plan = formatted_plan(probe)
        assert has_broadcast_hash_join(plan), plan
        assert n_shuffle_exchanges(plan) == 0, plan

        # (c) SMJ regime: kill broadcast — only the delta side shuffles
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table(tbl).join(
            delta_band_index(spark, SF_SMOKE), ["band", "bh"]
        )
        plan = formatted_plan(joined)
        assert has_sort_merge_join(plan) or "ShuffledHashJoin" in plan, plan
        # exactly ONE hash exchange — the delta side; a second would
        # mean the bucketed base got reshuffled
        assert n_shuffle_exchanges(plan) == 1, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_embedding_delta_bucketed_base_never_shuffles(spark, tmp_path):
    """The vector-side stored-index claim (r12 verdict #1), proven with
    the production functions: ``write_embedding_band_index`` persists
    the base hyperplane band index bucketed+sorted on (band, bval);
    the stored-probe path must (a) return EXACTLY the recompute path's
    rows, (b) broadcast the delta with zero shuffles on the base probe,
    and (c) in the NON-broadcast regime shuffle ONLY the delta side —
    the bucketed base scan feeds the SMJ without an Exchange. Same
    contract as test_incremental_delta_bucketed_base_never_shuffles,
    for the embedding family."""
    from pyspark.sql import functions as F

    from argus_spark.datapipe.dedup import (
        embedding_delta_band_index,
        embedding_incremental_delta,
        embedding_incremental_delta_stored,
        write_embedding_band_index,
    )

    tbl = "emb_band_idx_t"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    write_embedding_band_index(
        spark, SF_SMOKE, tbl, n_buckets=8,
        path=str(tmp_path / "emb_band_idx"),
    )
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # (a) identical output: stored-then-joined ≡ computed-then-joined
        want = sorted(
            map(tuple, embedding_incremental_delta(spark, SF_SMOKE).collect())
        )
        got = sorted(
            map(
                tuple,
                embedding_incremental_delta_stored(
                    spark, SF_SMOKE, tbl
                ).collect(),
            )
        )
        assert got == want and len(want) > 0

        # (b) broadcast regime: the base probe has ZERO exchanges
        probe = spark.table(tbl).join(
            F.broadcast(embedding_delta_band_index(spark, SF_SMOKE)),
            ["band", "bval"],
        )
        plan = formatted_plan(probe)
        assert has_broadcast_hash_join(plan), plan
        assert n_shuffle_exchanges(plan) == 0, plan

        # (c) SMJ regime: kill broadcast — only the delta side shuffles
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table(tbl).join(
            embedding_delta_band_index(spark, SF_SMOKE), ["band", "bval"]
        )
        plan = formatted_plan(joined)
        assert has_sort_merge_join(plan) or "ShuffledHashJoin" in plan, plan
        assert n_shuffle_exchanges(plan) == 1, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_embedding_incremental_delta_broadcasts_delta(spark):
    """embedding_incremental_delta (recompute form): the delta probe is
    a BroadcastHashJoin (base side never shuffles for candidate
    generation) and nothing in the plan is cartesian/NLJ — the same
    gate family as dedup_incremental_delta, vector edition."""
    from argus_spark.datapipe.dedup import embedding_incremental_delta

    plan = formatted_plan(embedding_incremental_delta(spark, SF_SMOKE))
    assert has_broadcast_hash_join(plan), plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoop" not in plan, plan


def test_dedup_cluster_stats_rides_cluster_frame(spark):
    """dedup_cluster_stats: pure composition over the existing cluster
    side-output — two partial-agged aggregates plus the two one-row
    frames for the singleton arithmetic; no cartesian beyond those
    1-row crosses, no new pair work."""
    from argus_spark.datapipe.dedup import dedup_cluster_stats

    plan = formatted_plan(dedup_cluster_stats(spark, SF_SMOKE))
    assert has_partial_aggregation(plan), plan
    assert "CartesianProduct" not in plan, plan


def test_dedup_lsh_recall_no_new_pair_work(spark):
    """dedup_lsh_recall: a left join of two existing skinny pair
    frames on the composite (doc_a, doc_b) key + a 5-band explode +
    one partial-agged 5-key aggregate. No cartesian, no nested loop —
    a lost equi-condition here would be quadratic in pair count."""
    from argus_spark.datapipe.dedup import dedup_lsh_recall

    plan = formatted_plan(dedup_lsh_recall(spark, SF_SMOKE))
    assert has_partial_aggregation(plan), plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoop" not in plan, plan
