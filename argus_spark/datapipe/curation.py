"""End-to-end corpus-curation pipeline as ONE composed Spark plan —
the product-level composition of the registered operators (each
individually oracle-checked): near-dup dedup → decontamination →
DSIR domain selection → quality top-k per source → sequence packing.

scripts/example_curation.py drives this with per-stage provenance
accounting and a CI exit gate; bench.py times ``curation_packed`` as
the ``curation_pipeline_wall`` headline metric, so the PRODUCT-level
regression story is tracked per-round, not just per-operator (the
composed plan can regress — e.g. a lost broadcast at a stage seam —
while every stage benches fine in isolation).

Scale shape: every stage is the registered operator's plan (banded
candidate generation, broadcast keep/drop-lists, partial-agged
scores); the seams are left-semi/anti joins on doc_id against frames
that are small by construction (drop-lists ≪ corpus), so at
deployment each seam is a broadcast join. The DSIR quintile cut —
formerly the one single-task stage (an unpartitioned ntile sort) — is
a fully distributed rank cut since r15 (``quintile_cut_ids``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def quintile_cut_ids(aff: DataFrame, keep_quintiles: int = 3) -> DataFrame:
    """doc_ids of the top ``keep_quintiles`` affinity quintiles of a
    (doc_id, affinity) frame — row-identical to
    ``ntile(5) OVER (ORDER BY affinity DESC, doc_id) <= keep_quintiles``
    but with NO single-task global sort (r15, r14 verdict #9,
    guide §2.1).

    Under the strict total order (doc_id unique), ``ntile(5) <= q``
    keeps exactly the rows at global positions 1..k where
    k = q·(n div 5) + min(q, n mod 5) (the first q buckets' sizes), so
    the quintile cut IS a rank cut: range-partition by the total order
    (materialized, so the partition layout is frozen across the two
    passes), collect the P per-partition counts (control plane — P
    rows), and a row's global position is its partition's offset + its
    local row_number. Every stage is distributed (the widest exchange
    carries 16-byte rows); the partition count tracks
    ``defaultParallelism`` — scale-adaptive, not a local constant.
    Equivalence is pinned by a randomized test against the ntile form
    and re-proven every round by the composed curation oracle hash.

    ``localCheckpoint`` rather than ``cache`` freezes the layout
    (which rows land in which partition must not move between the
    counts pass and the filter pass; the kept row SET is order-derived
    either way) while ALSO truncating the composed upstream lineage
    (keep-list → decontaminate → DSIR affinity) out of every
    downstream consumer — guide §3.3: the composed curation plan was
    re-printing/re-planning that executed subtree per consumer. On a
    cluster swap for reliable ``checkpoint(dir)`` (same convention as
    ``connected_components``)."""
    n_rp = max(2, aff.sparkSession.sparkContext.defaultParallelism)
    rp = aff.repartitionByRange(
        n_rp, F.desc("affinity"), F.asc("doc_id")
    ).localCheckpoint()
    cnts = {
        r["__pid"]: r["cnt"]
        for r in rp.groupBy(F.spark_partition_id().alias("__pid"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    n = sum(cnts.values())
    sz, rem = divmod(n, 5)
    k = keep_quintiles * sz + min(keep_quintiles, rem)
    offs, acc = [], 0
    for i in range(n_rp):
        offs.append(acc)
        acc += cnts.get(i, 0)
    off_arr = F.array(*[F.lit(int(o)) for o in offs])
    wloc = Window.partitionBy("__pid").orderBy(
        F.desc("affinity"), F.asc("doc_id")
    )
    return (
        rp.withColumn("__pid", F.spark_partition_id())
        .withColumn("__lrn", F.row_number().over(wloc))
        .filter(
            F.element_at(off_arr, F.col("__pid") + 1) + F.col("__lrn")
            <= F.lit(int(k))
        )
        .select("doc_id")
    )


def curation_stages(
    spark: SparkSession, sf_dir: str, topk: int = 10
) -> dict[str, DataFrame]:
    """Build all pipeline stages lazily and return them by name:
    ``raw`` → ``dedup`` → ``decontam`` → ``domain`` → ``quality`` →
    ``packed``. Nothing executes here — callers pick the frames they
    need (the example script counts every stage; bench runs only
    ``packed``, whose lineage contains all of them)."""
    from argus_spark.datapipe.dedup import (
        decontaminate_minhash,
        dedup_keep_list,
    )
    from argus_spark.datapipe.dsir import dsir_affinity
    from argus_spark.datapipe.sampling import pack_sequences
    from argus_spark.datapipe.text import (
        decontaminate_ngram_overlap,
        text_quality,
    )
    from argus_spark.session import load

    d = load(spark, sf_dir, "documents", widen=True)
    raw = d.select("doc_id", "source", "text")

    # 1. near-dup dedup (MinHash/PPJoin → components → keep-list)
    kept = dedup_keep_list(spark, sf_dir).select("doc_id")
    s1 = raw.join(kept, "doc_id", "left_semi")

    # 2. decontamination: benchmark stand-ins (doc_id % 50 == 0, the
    #    decontaminate_ngram_overlap convention) + exact 8-gram
    #    overlappers + fuzzy MinHash near-verbatim copies
    contaminated = decontaminate_ngram_overlap(spark, sf_dir).select("doc_id")
    fuzzy = decontaminate_minhash(spark, sf_dir).select("doc_id").distinct()
    s2 = (
        s1.filter(F.col("doc_id") % 50 != 0)
        .join(contaminated, "doc_id", "left_anti")
        .join(fuzzy, "doc_id", "left_anti")
    )

    # 3. DSIR domain selection: keep the top 3 affinity quintiles
    #    (60%) among survivors, deterministic via (affinity desc,
    #    doc_id) — as a distributed rank cut, not a single-task ntile
    #    sort (see ``quintile_cut_ids``).
    affinity = dsir_affinity(spark, sf_dir).select("doc_id", "affinity")
    sel = quintile_cut_ids(s2.select("doc_id").join(affinity, "doc_id"))
    s2b = s2.join(sel, "doc_id", "left_semi")

    # 4. quality top-k per source, ranked WITHIN survivors
    scores = text_quality(spark, sf_dir, keep=("source",)).select(
        "doc_id", "quality_score"
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("quality_score"), F.asc("doc_id")
    )
    s3 = (
        s2b.join(scores, "doc_id")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= topk)
        .select("doc_id", "source", "text")
    )

    # 5. pack the survivors into training shards
    packed = pack_sequences(spark, sf_dir, docs_df=s3)

    return {
        "raw": raw,
        "dedup": s1,
        "decontam": s2,
        "domain": s2b,
        "quality": s3,
        "packed": packed,
    }


def curation_packed(
    spark: SparkSession, sf_dir: str, topk: int = 10
) -> DataFrame:
    """The pipeline's final frame — executing it runs every stage."""
    return curation_stages(spark, sf_dir, topk)["packed"]


# --------------------------------------------------------------------------
# Registered query + composed oracle
# --------------------------------------------------------------------------
#
# The whole pipeline is ALSO a registered, oracle-checked query: the
# DuckDB twin composes the stage oracles (each independently green)
# with the same seam semantics — semi/anti joins on doc_id, ntile
# quintile cut, per-source row_number top-k — and re-uses the packing
# oracle's fragments over the survivor set. One hash-match here proves
# every stage AND every seam end-to-end, the strongest single
# correctness signal the driver can record for the datapipe surface.

CURATION_TOPK = 10


def _curation_sql(topk: int = CURATION_TOPK) -> str:
    from argus_spark.datapipe.dedup import (
        DECONTAMINATE_MINHASH_SQL,
        DEDUP_KEEP_LIST_SQL,
    )
    from argus_spark.datapipe.dsir import DSIR_AFFINITY_SQL
    from argus_spark.datapipe.hashing import h64_sql, words_sql
    from argus_spark.datapipe.sampling import N_SHARDS, SEQ_CAPACITY
    from argus_spark.datapipe.text import DECONTAMINATE_SQL, TEXT_QUALITY_SQL

    return f"""
WITH keep AS ({DEDUP_KEEP_LIST_SQL}),
contaminated AS ({DECONTAMINATE_SQL}),
fuzzy AS (SELECT DISTINCT doc_id FROM ({DECONTAMINATE_MINHASH_SQL})),
aff AS ({DSIR_AFFINITY_SQL}),
qual AS ({TEXT_QUALITY_SQL}),
s2 AS (
  SELECT d.doc_id, d.source
  FROM documents d
  JOIN keep USING (doc_id)
  WHERE d.doc_id % 50 <> 0
    AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
    AND d.doc_id NOT IN (SELECT doc_id FROM fuzzy)
),
sel AS (
  SELECT doc_id FROM (
    SELECT s2.doc_id,
           ntile(5) OVER (ORDER BY aff.affinity DESC, s2.doc_id) AS q
    FROM s2 JOIN aff USING (doc_id)
  ) WHERE q <= 3
),
s3 AS (
  SELECT doc_id FROM (
    SELECT s2.doc_id,
           row_number() OVER (PARTITION BY s2.source
                              ORDER BY qual.quality_score DESC,
                                       s2.doc_id) AS rnk
    FROM s2 JOIN sel USING (doc_id) JOIN qual USING (doc_id)
  ) WHERE rnk <= {topk}
),
base AS (
  SELECT doc_id,
         len({words_sql()})::BIGINT AS n_tokens,
         {h64_sql("doc_id::VARCHAR", "pack")} AS h
  FROM documents JOIN s3 USING (doc_id)
),
pospack AS (
  SELECT doc_id, h % {N_SHARDS} AS shard, n_tokens,
         COALESCE(sum(n_tokens) OVER (
           PARTITION BY h % {N_SHARDS}
           ORDER BY h, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0)::BIGINT AS pos
  FROM base
)
SELECT doc_id, shard, n_tokens, pos,
       pos // {SEQ_CAPACITY} AS seq_id,
       pos % {SEQ_CAPACITY} AS offset
FROM pospack
"""


QUERIES = {
    "curation_pipeline": lambda spark, sf_dir: curation_packed(
        spark, sf_dir, topk=CURATION_TOPK
    ),
}

ORACLES = {
    "curation_pipeline": _curation_sql(),
}
