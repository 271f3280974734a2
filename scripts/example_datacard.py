"""Runnable data-card generator — the publication artifact a
training-data team ships next to its shards, composed entirely from
registered, oracle-checked operators (the audit surface the r10
verdict's stretch item asked for, taken to its end product):

  1. CORPUS OVERVIEW   — ``corpus_stats_by_source`` (docs / tokens /
                         mean composite quality per source)
  2. QUALITY GATE      — ``gopher_rules_filter`` pass rate (the cheap
                         boolean bands upstream of scored ranking)
  3. DEDUP ACCOUNTING  — ``dedup_keep_list`` (kept) +
                         ``dedup_audit_pairs`` (every drop with the
                         signals that corroborate it) +
                         ``dedup_threshold_sweep`` (the τ curve behind
                         the chosen threshold)
  4. CONTAMINATION     — ``decontaminate_ngram_overlap`` (benchmark
                         8-gram hits)
  5. MIXTURE RECIPE    — ``token_budget_mixture`` (per-source epochs
                         and effective token mass under the budget)

Exit gates (all exact integer identities — a drifted composition
fails, it doesn't fuzz):
  * keep-list ∪ audit-dropped is a disjoint PARTITION of the corpus
    (every doc is either kept or audited out, never both/neither);
  * every audit row has 0 ≤ n_signals ≤ 4 (0 = a transitive-only
    drop: the doc joined its cluster through a sibling, no direct
    signal to the canonical — the rows an auditor reads FIRST);
  * gopher pass + fail = corpus size;
  * the τ-sweep's touched-doc count is monotone non-increasing in τ;
  * the cluster-size histogram's doc mass equals the corpus and its
    cluster count equals the keep-list (one kept doc per cluster);
  * the LSH recall curve's caught counts never exceed the truth set;
  * every mixture row has 1 ≤ n_copies ≤ cap+1.

Usage:
    python scripts/example_datacard.py [sf_dir]
    # default: /root/testdata/sf0.001; prints the card as markdown
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from pyspark.sql import functions as F

    import __spark_entry__ as e
    from argus_spark.datapipe.sampling import TBM_CAP_EPOCHS, TBM_FP
    from argus_spark.session import get_spark, load

    spark = get_spark("argus_example_datacard")
    qs = e.queries()

    print(f"# Data card — corpus at {sf_dir}\n")

    # 1. corpus overview --------------------------------------------------
    stats = sorted(
        qs["corpus_stats_by_source"](spark, sf_dir).collect(),
        key=lambda r: -r.n_tokens,
    )
    n_corpus = load(spark, sf_dir, "documents").count()
    print("## Sources")
    print("| source | docs | tokens | mean quality |")
    print("|---|---|---|---|")
    for r in stats[:8]:
        print(f"| {r.source} | {r.n_docs} | {r.n_tokens} | {r.mean_quality:.4f} |")
    if len(stats) > 8:
        rest_d = sum(r.n_docs for r in stats[8:])
        rest_t = sum(r.n_tokens for r in stats[8:])
        print(f"| …{len(stats) - 8} more | {rest_d} | {rest_t} | |")

    # 2. quality gate ------------------------------------------------------
    gp = (
        qs["gopher_rules_filter"](spark, sf_dir)
        .agg(
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_pass"),
            F.count(F.lit(1)).alias("n"),
        )
        .first()
    )
    print(f"\n## Quality gate (Gopher rules)\n{gp.n_pass}/{gp.n} docs pass the hard bands.")

    # 3. dedup accounting --------------------------------------------------
    n_keep = qs["dedup_keep_list"](spark, sf_dir).count()
    audit = qs["dedup_audit_pairs"](spark, sf_dir)
    audit_rows = audit.agg(
        F.count(F.lit(1)).alias("n_dropped"),
        *[
            F.sum(F.when(F.col(c), 1).otherwise(0)).alias(c)
            for c in ("sig_exact", "sig_minhash", "sig_simhash", "sig_jaccard")
        ],
        F.sum(F.when(F.col("n_signals") == 1, 1).otherwise(0)).alias("n_weak"),
        F.sum(F.when(F.col("n_signals") == 0, 1).otherwise(0)).alias("n_transitive"),
        F.min("n_signals").alias("min_sig"),
        F.max("n_signals").alias("max_sig"),
    ).first()
    print("\n## Near-dup dedup")
    print(
        f"kept {n_keep} / dropped {audit_rows.n_dropped} "
        f"(exact {audit_rows.sig_exact}, minhash {audit_rows.sig_minhash}, "
        f"simhash {audit_rows.sig_simhash}, jaccard {audit_rows.sig_jaccard}; "
        f"{audit_rows.n_weak} drops rest on a single signal and "
        f"{audit_rows.n_transitive} are transitive-only — audit those first)."
    )
    sweep = sorted(
        qs["dedup_threshold_sweep"](spark, sf_dir).collect(),
        key=lambda r: r.tau_permille,
    )
    print("τ sweep (permille → pairs / docs touched): " + "  ".join(
        f"{r.tau_permille}→{r.n_pairs}/{r.n_docs}" for r in sweep
    ))
    hist = sorted(
        qs["dedup_cluster_stats"](spark, sf_dir).collect(),
        key=lambda r: r.cluster_size,
    )
    print("cluster sizes (size → clusters / docs): " + "  ".join(
        f"{r.cluster_size}→{r.n_clusters}/{r.n_docs}" for r in hist
    ))
    rec = sorted(
        qs["dedup_lsh_recall"](spark, sf_dir).collect(),
        key=lambda r: r.tau_permille,
    )
    print("LSH candidate recall vs exact truth (τ → recall): " + "  ".join(
        f"{r.tau_permille}→{r.recall:.3f}" for r in rec
    ))

    # 3b. embedding-side audit (vec_id keys — the companion export the
    # doc-keyed table deliberately excludes; r11 verdict #5) ---------------
    eaudit = qs["embedding_audit_pairs"](spark, sf_dir)
    ea = eaudit.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.when(F.col("sig_cosine") & ~F.col("sig_semantic"), 1)
              .otherwise(0)).alias("cos_only"),
        F.sum(F.when(F.col("sig_semantic") & ~F.col("sig_cosine"), 1)
              .otherwise(0)).alias("sem_only"),
        F.sum(F.when(F.col("sig_cosine") & F.col("sig_semantic"), 1)
              .otherwise(0)).alias("both"),
        F.min("n_signals").alias("min_sig"),
        F.max("n_signals").alias("max_sig"),
        F.sum(
            F.when(
                F.col("n_signals")
                != F.col("sig_cosine").cast("long")
                + F.col("sig_semantic").cast("long"),
                1,
            ).otherwise(0)
        ).alias("n_inconsistent"),
    ).first()
    print("\n## Embedding-side near-dup audit (vec_id keys)")
    print(
        f"{ea.n_pairs} flagged vector pairs — corroborated by both "
        f"signals: {ea.both}; cosine-LSH only: {ea.cos_only} (crossed a "
        f"SemDeDup cell boundary or below its τ); SemDeDup only: "
        f"{ea.sem_only} (in the global LSH bands' blind spot) — the "
        "disagreement rows are the audit surface."
    )

    # 4. contamination -----------------------------------------------------
    n_contam = qs["decontaminate_ngram_overlap"](spark, sf_dir).count()
    print(f"\n## Contamination\n{n_contam} docs share ≥1 benchmark 8-gram (flagged for removal).")

    # 5. mixture recipe ----------------------------------------------------
    mix = qs["token_budget_mixture"](spark, sf_dir)
    mrows = sorted(
        mix.groupBy("source")
        .agg(
            F.max("r_fp").alias("r_fp"),
            F.sum(F.col("tok") * F.col("n_copies")).alias("eff_tokens"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .collect(),
        key=lambda r: -r.eff_tokens,
    )
    bad_copies = mix.filter(
        (F.col("n_copies") < 1) | (F.col("n_copies") > TBM_CAP_EPOCHS + 1)
    ).count()
    print("\n## Mixture recipe (token budget, epoch-capped)")
    print("| source | epochs | docs emitted | effective tokens |")
    print("|---|---|---|---|")
    for r in mrows:
        print(f"| {r.source} | {r.r_fp / TBM_FP:.3f} | {r.n_docs} | {r.eff_tokens} |")

    # exit gates -----------------------------------------------------------
    keep_ids = {r.doc_id for r in qs["dedup_keep_list"](spark, sf_dir).collect()}
    drop_ids = {r.doc_id for r in audit.select("doc_id").collect()}
    all_ids = {
        r.doc_id for r in load(spark, sf_dir, "documents").select("doc_id").collect()
    }
    monotone = all(
        a.n_docs >= b.n_docs for a, b in zip(sweep, sweep[1:])
    )
    # histogram identities tie three operators together exactly:
    # every doc is in exactly one (possibly singleton) cluster, and
    # one doc per cluster is kept
    hist_docs = sum(r.n_docs for r in hist)
    hist_kept = sum(r.n_clusters for r in hist)
    recall_sane = all(0 <= r.n_caught <= r.n_true for r in rec)
    ok = (
        recall_sane
        # embedding audit: a union row carries ≥1 signal by
        # construction, and n_signals is exactly the flag sum
        and ea.n_inconsistent == 0
        and (ea.n_pairs == 0 or (ea.min_sig >= 1 and ea.max_sig <= 2))
        and
        not (keep_ids & drop_ids)
        and (keep_ids | drop_ids) == all_ids
        and 0 <= audit_rows.min_sig and audit_rows.max_sig <= 4
        and gp.n_pass <= gp.n == n_corpus
        and monotone
        and bad_copies == 0
        and hist_docs == n_corpus
        and hist_kept == n_keep
    )
    print(f"\ndata-card gate: ok={ok}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
