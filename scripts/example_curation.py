"""Runnable end-to-end corpus-curation pipeline — the datapipe twin of
scripts/example_indexer.py: the individual registered operators
composed the way a training-data team actually runs them, with
per-stage provenance accounting and a CI exit gate.

Stages (each one is a registered, oracle-checked operator — this
script only composes their keep-sets):

  1. NEAR-DUP DEDUP      — ``dedup_keep_list`` (MinHash/PPJoin →
                           components → canonicals + singletons)
  2. DECONTAMINATION     — drop the benchmark stand-ins (doc_id % 50
                           == 0, the convention decontaminate_ngram_
                           overlap documents) and every doc sharing an
                           8-gram with them; PLUS the fuzzy layer —
                           ``decontaminate_minhash`` flags near-
                           verbatim (J ≥ 0.8) copies of its benchmark
                           slice that a light rewording would slip
                           past the exact 8-gram check
  3. DOMAIN SELECTION    — ``dsir_affinity`` hashed-n-gram importance
                           scores vs the target domain (en); keep docs
                           leaning toward the target (affinity > 0) —
                           the DSIR selection step
  4. QUALITY CURATION    — top-K per source by the shared composite
                           quality score, ranked WITHIN survivors
  5. PACKING             — ``pack_sequences`` over the surviving
                           frame: (shard, seq_id, offset) layout

Exit gate: survival must be strictly monotone non-increasing, the
final corpus non-empty, and packed token mass must equal the
survivors' token mass exactly (nothing lost or duplicated by layout).

Usage:
    python scripts/example_curation.py [sf_dir] [topk_per_source]
    # defaults: /root/testdata/sf0.001, top-10 per source
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    topk = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from argus_spark.datapipe.dedup import (
        decontaminate_minhash,
        dedup_keep_list,
    )
    from argus_spark.datapipe.dsir import dsir_affinity
    from argus_spark.datapipe.hashing import words_col
    from argus_spark.datapipe.sampling import pack_sequences
    from argus_spark.datapipe.text import (
        decontaminate_ngram_overlap,
        text_quality,
    )
    from argus_spark.session import get_spark, load

    spark = get_spark("argus_example_curation")

    d = load(spark, sf_dir, "documents", widen=True)
    corpus = d.select("doc_id", "source", "text")

    def stage_stats(df, name):
        n = df.count()
        toks = df.select(F.sum(F.size(words_col())).alias("t")).first()["t"]
        print(f"  {name:<22} {n:>6} docs  {toks or 0:>8} tokens")
        return n

    print(f"curation over {sf_dir} (top-{topk}/source):")
    n0 = stage_stats(corpus, "raw corpus")

    # 1. near-dup dedup
    kept = dedup_keep_list(spark, sf_dir).select("doc_id")
    s1 = corpus.join(kept, "doc_id", "left_semi")
    n1 = stage_stats(s1, "after near-dup dedup")

    # 2. decontamination: benchmark stand-ins + 8-gram overlappers +
    #    fuzzy MinHash near-verbatim copies
    contaminated = decontaminate_ngram_overlap(spark, sf_dir).select("doc_id")
    fuzzy = decontaminate_minhash(spark, sf_dir).select("doc_id").distinct()
    s2 = (
        s1.filter(F.col("doc_id") % 50 != 0)
        .join(contaminated, "doc_id", "left_anti")
        .join(fuzzy, "doc_id", "left_anti")
    )
    n2 = stage_stats(s2, "after decontamination")

    # 2b. DSIR domain selection: rank SURVIVORS by target affinity and
    #     keep the top 3 quintiles (60%) — the importance-resampling
    #     keep-rate knob, deterministic via (affinity desc, doc_id).
    #     NB the unpartitioned ntile is a single-task sort — fine for a
    #     demo corpus; at 100 TB swap for an approxQuantile threshold
    #     (one pass, no global sort) and filter affinity >= cutoff.
    affinity = dsir_affinity(spark, sf_dir).select("doc_id", "affinity")
    sel = (
        s2.join(affinity, "doc_id")
        .withColumn(
            "q",
            F.ntile(5).over(
                Window.orderBy(F.desc("affinity"), F.asc("doc_id"))
            ),
        )
        .filter(F.col("q") <= 3)
        .select("doc_id")
    )
    s2b = s2.join(sel, "doc_id", "left_semi")
    n2b = stage_stats(s2b, "after domain selection")
    s2 = s2b

    # 3. quality curation within survivors
    scores = text_quality(spark, sf_dir, keep=("source",)).select(
        "doc_id", "quality_score"
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("quality_score"), F.asc("doc_id")
    )
    s3 = (
        s2.join(scores, "doc_id")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= topk)
        .select("doc_id", "source", "text")
    )
    n3 = stage_stats(s3, "after quality top-k")

    # 4. pack the survivors into training shards
    packed = pack_sequences(spark, sf_dir, docs_df=s3)
    pk = packed.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_tokens").alias("toks"),
        F.countDistinct("shard").alias("shards"),
        (F.max(F.col("seq_id")) + 1).alias("max_seqs"),
    ).first()
    print(
        f"  packed layout          {pk['n']:>6} docs  {pk['toks'] or 0:>8} tokens"
        f"  ({pk['shards']} shards, ≤{pk['max_seqs']} seqs/shard)"
    )

    src_mix = {
        r["source"]: r["n"]
        for r in s3.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    print(f"  final mixture: {dict(sorted(src_mix.items()))}")

    # exit gate
    survivors_toks = s3.select(
        F.sum(F.size(words_col())).alias("t")
    ).first()["t"]
    ok = (
        n0 >= n1 >= n2 >= n2b >= n3 > 0
        and pk["n"] == n3
        and int(pk["toks"] or 0) == int(survivors_toks or 0)
    )
    print(f"\ncuration gate: ok={ok}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
