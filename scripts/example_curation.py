"""Runnable end-to-end corpus-curation pipeline — the datapipe twin of
scripts/example_indexer.py: the individual registered operators
composed the way a training-data team actually runs them, with
per-stage provenance accounting and a CI exit gate. The composition
itself lives in argus_spark/datapipe/curation.py (shared with bench.py,
which times the final packed frame as ``curation_pipeline_wall``).

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

    from pyspark.sql import functions as F

    from argus_spark.datapipe.curation import curation_stages
    from argus_spark.datapipe.hashing import words_col
    from argus_spark.session import get_spark

    spark = get_spark("argus_example_curation")

    stages = curation_stages(spark, sf_dir, topk)

    def stage_stats(df, name):
        n = df.count()
        toks = df.select(F.sum(F.size(words_col())).alias("t")).first()["t"]
        print(f"  {name:<22} {n:>6} docs  {toks or 0:>8} tokens")
        return n

    print(f"curation over {sf_dir} (top-{topk}/source):")
    n0 = stage_stats(stages["raw"], "raw corpus")
    n1 = stage_stats(stages["dedup"], "after near-dup dedup")
    n2 = stage_stats(stages["decontam"], "after decontamination")
    n2b = stage_stats(stages["domain"], "after domain selection")
    s3 = stages["quality"]
    n3 = stage_stats(s3, "after quality top-k")

    packed = stages["packed"]
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
