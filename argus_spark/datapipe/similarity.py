"""Similarity search over the ``embeddings`` table (array<float> 64-d).

Two operators:

  * ``ann_cosine_topk``  — brute-force cosine top-k: the exact baseline.
    Plan shape at scale: broadcast the (small) query set, map-side
    cosine over the corpus, then a per-query top-k — shuffle carries
    only n_queries×k rows, the corpus is scanned once with no shuffle.
  * ``ann_lsh_bucketed`` — random-hyperplane LSH: corpus is bucketed by
    the 8-bit sign pattern of 8 fixed hyperplane projections; queries
    probe only their own bucket. This is the 100 TB path: bucket is a
    plain column → the probe is an equi-join (hash-partitionable,
    AQE-skew-splittable), candidates shrink ~2^8×.

Hyperplanes are fixed pseudo-random literals (seeded numpy, rounded to
4 decimals) injected into BOTH the Spark plan and the DuckDB oracle, so
projections agree bit-for-bit. All dot products are ordered left-folds
(see ``dedup._dot``) — identical IEEE doubles in both engines.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from argus_spark.datapipe.dedup import (
    DIM,
    _as_double,
    _dot,
    _dot_sql,
    _embedding_corpus,
    _norm_sql,
    cosine_prenorm,
    norm,
)
from argus_spark.session import load

N_QUERIES = 8      # queries = vec_id < 8
TOP_K = 5
N_PLANES = 8
LSH_TOP_K = 3

_rng = np.random.default_rng(7)
PLANES: list[list[float]] = [
    [round(float(x), 4) for x in row] for row in _rng.standard_normal((N_PLANES, DIM))
]


def _plane_lit(p: list[float]) -> F.Column:
    return F.array(*[F.lit(x) for x in p])


def _plane_sql(p: list[float]) -> str:
    return "[" + ", ".join(repr(x) for x in p) + "]"


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for each query (vec_id < 8).
    Broadcast queries × corpus scan; ties broken by neighbor id so the
    ranking is total."""
    # r14 opt: the shared scoped-cached (vec_id, v, nrm) corpus
    # projection (dedup._embedding_corpus) — identical logical plan in
    # every ANN variant, so one cache entry serves all branches of the
    # composed recall queries instead of each re-paying scan + norm.
    e = _embedding_corpus(spark, sf_dir)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    c = e.select(
        F.col("vec_id").alias("n_id"), F.col("v").alias("nv"), F.col("nrm").alias("nn")
    )
    scored = (
        c.join(F.broadcast(q), F.col("q_id") != F.col("n_id"))
        .withColumn(
            "cos_sim",
            cosine_prenorm(_dot(F.col("qv"), F.col("nv")), F.col("qn"), F.col("nn")),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("n_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("q_id", "n_id", "rnk", "cos_sim")
    )


ANN_COSINE_TOPK_SQL = f"""
WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
 e AS (SELECT vec_id, v, {_norm_sql('v')} AS nrm FROM e0),
 q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM e WHERE vec_id < {N_QUERIES}),
 scored AS (
  SELECT q_id, c.vec_id AS n_id,
         {_dot_sql('qv', 'c.v')} / (qn * c.nrm) AS cos_sim
  FROM q JOIN e c ON q.q_id <> c.vec_id
)
SELECT q_id, n_id, rnk, cos_sim FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id
                               ORDER BY cos_sim DESC, n_id) AS rnk
  FROM scored
) WHERE rnk <= {TOP_K}
"""


def _bucket_col(v: str, planes: list[list[float]] | None = None) -> F.Column:
    """8-bit sign pattern of 8 plane projections over column name ``v``
    (the seeded random hyperplanes by default; pass another matrix —
    e.g. the whitening rows — to reuse the same sign-hash discipline on
    a different basis: one fold/predicate implementation, every
    variant). Built as ONE parsed SQL string instead of
    N_PLANES×DIM ``F.lit()`` Py4J round trips (r14 opt — the
    ``_assign_flat`` lesson: Python-side literal-tree construction
    dominated these queries' bench medians; ``repr`` + the ``D``
    suffix reproduce the identical doubles, same left-fold order)."""
    terms = []
    for p_idx, plane in enumerate(PLANES if planes is None else planes):
        arr = "array(" + ", ".join(f"{float(x)!r}D" for x in plane) + ")"
        dot = (
            f"aggregate(zip_with({v}, {arr}, (x, y) -> x * y), "
            "0.0D, (acc, t) -> acc + t)"
        )
        terms.append(
            f"(CASE WHEN {dot} > 0.0D THEN {1 << p_idx}L ELSE 0L END)"
        )
    return F.expr("(" + " + ".join(terms) + ")")


def _bucket_sql(v: str, planes: list[list[float]] | None = None) -> str:
    terms = []
    for p_idx, plane in enumerate(PLANES if planes is None else planes):
        dot = (
            f"list_reduce(list_prepend(0.0, list_transform(range(1, {DIM + 1}), "
            f"i -> {v}[i] * ({_plane_sql(plane)})[i])), (acc, t) -> acc + t)"
        )
        terms.append(
            f"CASE WHEN {dot} > 0 THEN {1 << p_idx}::BIGINT ELSE 0::BIGINT END"
        )
    return "(" + " + ".join(terms) + ")"


def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN: probe only the query's own sign-pattern bucket,
    exact cosine + top-3 within it. The bucket column is computed
    map-side; the probe is an equi-join on ``bucket`` — this is the
    shape that survives 100 TB (add multi-probe / band repetition for
    recall; single-probe kept here so the oracle is closed-form)."""
    # r14 opt: derive the bucket column from the shared cached normed
    # corpus (column order of the intermediate differs; outputs are
    # name-selected, results identical).
    bucketed = _embedding_corpus(spark, sf_dir).withColumn(
        "bucket", _bucket_col("v")
    )
    q = bucketed.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"),
        F.col("nrm").alias("qn"), "bucket",
    )
    c = bucketed.select(
        F.col("vec_id").alias("n_id"), F.col("v").alias("nv"),
        F.col("nrm").alias("nn"), "bucket",
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn(
            "cos_sim",
            cosine_prenorm(_dot(F.col("qv"), F.col("nv")), F.col("qn"), F.col("nn")),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("n_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= LSH_TOP_K)
        .select("q_id", "n_id", "rnk", "cos_sim")
    )


ANN_LSH_BUCKETED_SQL = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), bucketed AS (
  SELECT vec_id, v, {_bucket_sql('v')} AS bucket, {_norm_sql('v')} AS nrm FROM e
), q AS (
  SELECT vec_id AS q_id, v AS qv, nrm AS qn, bucket
  FROM bucketed WHERE vec_id < {N_QUERIES}
), scored AS (
  SELECT q_id, c.vec_id AS n_id,
         {_dot_sql('qv', 'c.v')} / (qn * c.nrm) AS cos_sim
  FROM q JOIN bucketed c USING (bucket)
  WHERE q.q_id <> c.vec_id
)
SELECT q_id, n_id, rnk, cos_sim FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id
                               ORDER BY cos_sim DESC, n_id) AS rnk
  FROM scored
) WHERE rnk <= {LSH_TOP_K}
"""


def ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH ANN: each query probes its own sign-pattern
    bucket PLUS the ``N_PLANES`` Hamming-1 neighbors (bucket XOR 2^i) —
    the standard recall lever over single-probe LSH (a query near a
    hyperplane recovers neighbors that landed just across it) at ~9x
    the candidate cost instead of the 2^8x of adding band repetitions.
    Plan shape is unchanged from ``ann_lsh_bucketed``: probe buckets
    explode from the (tiny) query side, the corpus keeps ONE map-side
    bucket column, and the probe stays a broadcast equi-join on
    ``bucket`` — corpus never shuffles for candidate generation."""
    # r14 opt: derive the bucket column from the shared cached normed
    # corpus (column order of the intermediate differs; outputs are
    # name-selected, results identical).
    bucketed = _embedding_corpus(spark, sf_dir).withColumn(
        "bucket", _bucket_col("v")
    )
    probes = F.array(
        F.col("bucket"),
        *[
            F.col("bucket").bitwiseXOR(F.lit(1 << i).cast("long"))
            for i in range(N_PLANES)
        ],
    )
    q = (
        bucketed.filter(F.col("vec_id") < N_QUERIES)
        .withColumn("probe", F.explode(probes))
        .select(
            F.col("vec_id").alias("q_id"), F.col("v").alias("qv"),
            F.col("nrm").alias("qn"), F.col("probe").alias("bucket"),
        )
    )
    c = bucketed.select(
        F.col("vec_id").alias("n_id"), F.col("v").alias("nv"),
        F.col("nrm").alias("nn"), "bucket",
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn(
            "cos_sim",
            cosine_prenorm(_dot(F.col("qv"), F.col("nv")), F.col("qn"), F.col("nn")),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("n_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= LSH_TOP_K)
        .select("q_id", "n_id", "rnk", "cos_sim")
    )


ANN_LSH_MULTIPROBE_SQL = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), bucketed AS (
  SELECT vec_id, v, {_bucket_sql('v')} AS bucket, {_norm_sql('v')} AS nrm FROM e
), q AS (
  SELECT vec_id AS q_id, v AS qv, nrm AS qn,
         unnest(list_prepend(bucket,
           list_transform(range(0, {N_PLANES}),
                          i -> xor(bucket, (1::BIGINT << i))))) AS bucket
  FROM bucketed WHERE vec_id < {N_QUERIES}
), scored AS (
  -- the 9 probe masks are distinct and each corpus vector has exactly
  -- one bucket, so a (q, c) pair matches at most one probe — no dedup
  SELECT q_id, c.vec_id AS n_id,
         {_dot_sql('qv', 'c.v')} / (qn * c.nrm) AS cos_sim
  FROM q JOIN bucketed c USING (bucket)
  WHERE q.q_id <> c.vec_id
)
SELECT q_id, n_id, rnk, cos_sim FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id
                               ORDER BY cos_sim DESC, n_id) AS rnk
  FROM scored
) WHERE rnk <= {LSH_TOP_K}
"""


# nlist = n/50 deterministic sample (vec_id % 50 == 0) — ≈ sqrt(n) at
# the bench scales, the standard IVF codebook sizing
CENTROID_STRIDE = 50
NPROBE = 2
IVF_TOP_K = 3


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: the inverted-file scale path (complements the LSH one).

    Centroids are a deterministic corpus sample (``vec_id % 25 == 0`` —
    stands in for a k-means codebook; the cell/probe machinery is
    identical). Every corpus vector is assigned to its nearest centroid
    by cosine; queries probe their ``NPROBE``=2 nearest cells and rank
    exact cosine top-3 among candidates in those cells.

    Plan shape at 100 TB: the codebook folds into ONE broadcast row
    (``array<struct<cid,cv,cn>>``), so cell assignment is a pure
    map-side expression (``array_min`` over per-centroid scores) — the
    corpus is never shuffled to meet its centroids, and the only
    exchange carrying corpus-derived rows is the final per-query top-k
    window over candidates already cut ~nlist/nprobe× by the broadcast
    hash probe on ``cell``. Ties break toward the smaller id in both
    engines.
    """
    # r14 opt: the shared scoped-cached (vec_id, v, nrm) corpus
    # projection (dedup._embedding_corpus) — identical logical plan in
    # every ANN variant, so one cache entry serves all branches of the
    # composed recall queries instead of each re-paying scan + norm.
    e = _embedding_corpus(spark, sf_dir)
    # One-row codebook: nlist centroid structs in a single array value.
    codebook = (
        e.filter(F.col("vec_id") % CENTROID_STRIDE == 0)
        .select(
            F.struct(
                F.col("vec_id").alias("cid"),
                F.col("v").alias("cv"),
                F.col("nrm").alias("cn"),
            ).alias("c")
        )
        .agg(F.collect_list("c").alias("cb"))
    )

    def _scored_cells() -> F.Column:
        # array<struct<ns,cid>>: ns = -cosine, so ascending struct order
        # is (cosine desc, cid asc) — min = nearest cell.
        return F.transform(
            F.col("cb"),
            lambda c: F.struct(
                (-cosine_prenorm(_dot(F.col("v"), c["cv"]), F.col("nrm"),
                                 c["cn"])).alias("ns"),
                c["cid"].alias("cid"),
            ),
        )

    with_cb = e.crossJoin(F.broadcast(codebook))
    assigned = with_cb.withColumn(
        "cell", F.array_min(_scored_cells())["cid"]
    ).select("vec_id", "v", "nrm", "cell")
    qprobe = (
        with_cb.filter(F.col("vec_id") < N_QUERIES)
        .withColumn(
            "cell",
            F.explode(
                F.transform(
                    F.slice(F.array_sort(_scored_cells()), 1, NPROBE),
                    lambda s: s["cid"],
                )
            ),
        )
        .select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv"),
                F.col("nrm").alias("qn"), "cell")
    )
    scored = (
        assigned.join(F.broadcast(qprobe), "cell")
        .filter(F.col("q_id") != F.col("vec_id"))
        .withColumn(
            "cos_sim",
            cosine_prenorm(_dot(F.col("qv"), F.col("v")), F.col("qn"), F.col("nrm")),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= IVF_TOP_K)
        .select("q_id", F.col("vec_id").alias("n_id"), "rnk", "cos_sim")
    )


ANN_IVF_TOPK_SQL = f"""
WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
 e AS (SELECT vec_id, v, {_norm_sql('v')} AS nrm FROM e0),
 cent AS (
  SELECT vec_id AS cid, v AS cv, nrm AS cn FROM e
  WHERE vec_id % {CENTROID_STRIDE} = 0
), assigned AS (
  SELECT vec_id, v, nrm, cid AS cell FROM (
    SELECT e.vec_id, e.v, e.nrm, cent.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_dot_sql('e.v', 'cent.cv')} / (e.nrm * cent.cn) DESC,
                      cent.cid
           ) AS rn
    FROM e CROSS JOIN cent
  ) WHERE rn = 1
), qprobe AS (
  SELECT q_id, qv, qn, cid AS cell FROM (
    SELECT q.vec_id AS q_id, q.v AS qv, q.nrm AS qn, cent.cid,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY {_dot_sql('q.v', 'cent.cv')} / (q.nrm * cent.cn) DESC,
                      cent.cid
           ) AS rn
    FROM e q CROSS JOIN cent WHERE q.vec_id < {N_QUERIES}
  ) WHERE rn <= {NPROBE}
), scored AS (
  SELECT q_id, a.vec_id AS n_id,
         {_dot_sql('qv', 'a.v')} / (qn * a.nrm) AS cos_sim
  FROM qprobe JOIN assigned a USING (cell)
  WHERE q_id <> a.vec_id
)
SELECT q_id, n_id, rnk, cos_sim FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id
                               ORDER BY cos_sim DESC, n_id) AS rnk
  FROM scored
) WHERE rnk <= {IVF_TOP_K}
"""


# --------------------------------------------------------------------------
# Random-projection dimensionality reduction (JL transform)
# --------------------------------------------------------------------------

# 64-d → 16-d Johnson–Lindenstrauss reduction: the standard pre-index
# shrink before building ANN serving structures (4× memory/compute cut
# on every downstream distance). Planes are seeded literals (a second,
# independent family from the LSH PLANES) injected into BOTH engines;
# each output component is one ordered-fold dot product scaled by
# 1/√16 = 0.25 — an exact power-of-two multiply — so every projected
# double is bit-identical cross-engine.
RP_DIM = 16
_rp_rng = np.random.default_rng(11)
RP_PLANES: list[list[float]] = [
    [round(float(x), 4) for x in row]
    for row in _rp_rng.standard_normal((RP_DIM, DIM))
]
RP_SCALE = 0.25  # 1/sqrt(RP_DIM), exact in binary


def embedding_project_rp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-side JL projection of every corpus vector to RP_DIM
    components p0..p15 (flat double columns — the driver's
    canonicalizer takes scalars only). Zero shuffles: at 100 TB this
    is a pure scan→project pass that writes the reduced matrix."""
    e = load(spark, sf_dir, "embeddings", widen=True).select(
        "vec_id", _as_double("embedding").alias("v")
    )
    # One parsed expression per component instead of RP_DIM×DIM
    # F.lit() Py4J round trips (r14 opt; same left-fold dot, repr
    # round-trips the plane doubles exactly, RP_SCALE = 0.25 is exact
    # in binary so the literal multiply is the identical IEEE op).
    def _p(i: int, p: list[float]) -> F.Column:
        arr = "array(" + ", ".join(f"{float(x)!r}D" for x in p) + ")"
        return F.expr(
            f"aggregate(zip_with(v, {arr}, (x, y) -> x * y), "
            f"0.0D, (acc, t) -> acc + t) * {float(RP_SCALE)!r}D"
        ).alias(f"p{i}")

    return e.select(
        "vec_id", *[_p(i, p) for i, p in enumerate(RP_PLANES)]
    )


EMBEDDING_PROJECT_RP_SQL = (
    "SELECT vec_id, "
    + ", ".join(
        f"{_dot_sql('v', _plane_sql(p))} * {RP_SCALE!r} AS p{i}"
        for i, p in enumerate(RP_PLANES)
    )
    + " FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)"
)


# ---- product quantization (PQ-ADC) ----
PQ_M = 4                      # subspaces
PQ_SUB = DIM // PQ_M          # dims per subspace (16)
PQ_K = 8                      # codewords per subspace
PQ_TOP_K = 5


def _l2sq(a: F.Column, b: F.Column) -> F.Column:
    """Ordered left-fold squared L2 distance — same IEEE result as the
    DuckDB mirror (``_l2sq_sql``)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _l2sq_sql(a: str, b: str, off: int, n: int) -> str:
    """Squared L2 over ``n`` dims starting at 1-based offset ``off+1``
    of both arrays, mirrored fold order."""
    return (
        f"list_reduce(list_prepend(0.0, list_transform(range(1, {n + 1}), "
        f"i -> ({a}[{off} + i] - {b}[{off} + i]) * "
        f"({a}[{off} + i] - {b}[{off} + i]))), (acc, v) -> acc + v)"
    )


def ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (the memory-scale path: IVF cuts the
    candidates, PQ cuts the bytes — together they are the standard
    billion-vector serving stack). Codebook: PQ_K=8 codewords per
    subspace, sampled deterministically from the corpus (vec_id in
    [N_QUERIES, N_QUERIES+PQ_K) — the random-codebook PQ baseline; a
    trained codebook drops in as the same one-row broadcast). Encode:
    per subspace m, code = argmin codeword of subspace squared-L2
    (tie → smaller codeword id). ADC scoring is expressed as the exact
    equivalent distance-to-reconstruction ‖q − r(x)‖² where r(x)
    concatenates the chosen codeword subvectors — one fold both
    engines mirror bit-for-bit, instead of M partial sums whose
    addition grouping would drift.

    Plan at 100 TB: the codebook folds into ONE broadcast row, so
    encode AND reconstruction are pure map-side expressions (at
    deployment you store the M small code columns — 4 bytes/vector
    here vs 256 for the raw floats); queries are a broadcast-side
    nested loop over the corpus scan (8 rows), and the only exchange
    carrying corpus rows is the final per-query top-k window. The
    corpus is scanned once and never shuffled."""
    e = load(spark, sf_dir, "embeddings", widen=True).select(
        "vec_id", _as_double("embedding").alias("v")
    )
    codebook = (
        e.filter(
            (F.col("vec_id") >= N_QUERIES)
            & (F.col("vec_id") < N_QUERIES + PQ_K)
        )
        .select(
            F.struct(
                (F.col("vec_id") - F.lit(N_QUERIES)).alias("aid"),
                F.col("v").alias("av"),
            ).alias("a")
        )
        .agg(F.collect_list("a").alias("cb"))
    )
    corpus = (
        e.filter(F.col("vec_id") >= N_QUERIES)
        .crossJoin(F.broadcast(codebook))
    )

    def _chosen(m: int) -> F.Column:
        # min struct = (dist asc, aid asc); av rides along (aid unique
        # ⇒ the array field never participates in the comparison)
        return F.array_min(
            F.transform(
                F.col("cb"),
                lambda a: F.struct(
                    _l2sq(
                        F.slice(F.col("v"), m * PQ_SUB + 1, PQ_SUB),
                        F.slice(a["av"], m * PQ_SUB + 1, PQ_SUB),
                    ).alias("d"),
                    a["aid"].alias("aid"),
                    a["av"].alias("av"),
                ),
            )
        )

    recon = corpus.select(
        "vec_id",
        F.concat(
            *[
                F.slice(_chosen(m)["av"], m * PQ_SUB + 1, PQ_SUB)
                for m in range(PQ_M)
            ]
        ).alias("r"),
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    scored = recon.crossJoin(F.broadcast(q)).select(
        "q_id",
        F.col("vec_id").alias("n_id"),
        _l2sq(F.col("qv"), F.col("r")).alias("adc_dist"),
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("adc_dist"), F.asc("n_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= PQ_TOP_K)
        .select("q_id", "n_id", F.col("rnk").cast("long").alias("rnk"),
                "adc_dist")
    )


def _ann_pq_adc_topk_sql() -> str:
    sub_dists = ", ".join(
        f"{_l2sq_sql('c.v', 'cb.av', m * PQ_SUB, PQ_SUB)} AS d{m}"
        for m in range(PQ_M)
    )
    code_ctes = ",\n".join(
        f"k{m} AS (SELECT vec_id, aid FROM ("
        f"SELECT vec_id, aid, row_number() OVER ("
        f"PARTITION BY vec_id ORDER BY d{m}, aid) AS rn FROM dists"
        f") WHERE rn = 1)"
        for m in range(PQ_M)
    )
    recon_concat = " || ".join(
        f"a{m}.av[{m * PQ_SUB + 1}:{(m + 1) * PQ_SUB}]" for m in range(PQ_M)
    )
    recon_joins = " ".join(
        f"JOIN k{m} ON k{m}.vec_id = c.vec_id "
        f"JOIN cb a{m} ON a{m}.aid = k{m}.aid"
        for m in range(PQ_M)
    )
    return f"""
WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cb AS (SELECT vec_id - {N_QUERIES} AS aid, v AS av FROM e0
       WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES + PQ_K}),
corpus AS (SELECT vec_id, v FROM e0 WHERE vec_id >= {N_QUERIES}),
dists AS (
  SELECT c.vec_id, cb.aid, {sub_dists}
  FROM corpus c CROSS JOIN cb
),
{code_ctes},
recon AS (
  SELECT c.vec_id, {recon_concat} AS r
  FROM corpus c {recon_joins}
),
scored AS (
  SELECT q.vec_id AS q_id, recon.vec_id AS n_id,
         {_l2sq_sql('q.v', 'recon.r', 0, DIM)} AS adc_dist
  FROM recon CROSS JOIN (SELECT vec_id, v FROM e0
                         WHERE vec_id < {N_QUERIES}) q
)
SELECT q_id, n_id, rnk::BIGINT AS rnk, adc_dist FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id
                               ORDER BY adc_dist, n_id) AS rnk
  FROM scored
) WHERE rnk <= {PQ_TOP_K}
"""


def ann_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF × PQ combined — the standard billion-vector SERVING stack in
    one query: IVF cells cut the candidate count (~nlist/nprobe×), PQ
    codes cut the bytes per candidate (4 B vs 256 B here), and the
    ranker scores ADC distance only inside the probed cells. The two
    parent queries (``ann_ivf_topk``, ``ann_pq_adc_topk``) pin each
    mechanism separately; this pins their COMPOSITION — at deployment
    you store exactly (cell, codes) per vector and this is the query
    you actually run.

    Plan shape at 100 TB: BOTH codebooks fold into one-row broadcasts,
    so cell assignment AND code/reconstruction are pure map-side
    expressions over a single corpus scan; queries probe NPROBE cells
    (broadcast, 8×NPROBE rows), and the only exchange carrying
    corpus-derived rows is the final per-query top-k window over the
    cell-cut candidates. The corpus is scanned once and never
    shuffled. Determinism: the exact ``array_min`` tie orders and
    mirrored ADC fold of the parents (ties → smaller id)."""
    # r14 opt: the shared scoped-cached (vec_id, v, nrm) corpus
    # projection (dedup._embedding_corpus) — identical logical plan in
    # every ANN variant, so one cache entry serves all branches of the
    # composed recall queries instead of each re-paying scan + norm.
    e = _embedding_corpus(spark, sf_dir)
    ivf_cb = (
        e.filter(F.col("vec_id") % CENTROID_STRIDE == 0)
        .select(
            F.struct(
                F.col("vec_id").alias("cid"),
                F.col("v").alias("cv"),
                F.col("nrm").alias("cn"),
            ).alias("c")
        )
        .agg(F.collect_list("c").alias("cb"))
    )
    pq_cb = (
        e.filter(
            (F.col("vec_id") >= N_QUERIES)
            & (F.col("vec_id") < N_QUERIES + PQ_K)
        )
        .select(
            F.struct(
                (F.col("vec_id") - F.lit(N_QUERIES)).alias("aid"),
                F.col("v").alias("av"),
            ).alias("a")
        )
        .agg(F.collect_list("a").alias("pq"))
    )

    def _scored_cells() -> F.Column:
        return F.transform(
            F.col("cb"),
            lambda c: F.struct(
                (
                    -cosine_prenorm(
                        _dot(F.col("v"), c["cv"]), F.col("nrm"), c["cn"]
                    )
                ).alias("ns"),
                c["cid"].alias("cid"),
            ),
        )

    def _chosen(m: int) -> F.Column:
        return F.array_min(
            F.transform(
                F.col("pq"),
                lambda a: F.struct(
                    _l2sq(
                        F.slice(F.col("v"), m * PQ_SUB + 1, PQ_SUB),
                        F.slice(a["av"], m * PQ_SUB + 1, PQ_SUB),
                    ).alias("d"),
                    a["aid"].alias("aid"),
                    a["av"].alias("av"),
                ),
            )
        )

    with_cb = e.crossJoin(F.broadcast(ivf_cb))
    # serving table: (vec_id, cell, reconstruction) — one map-side pass
    assigned = (
        with_cb.filter(F.col("vec_id") >= N_QUERIES)
        .crossJoin(F.broadcast(pq_cb))
        .select(
            "vec_id",
            F.array_min(_scored_cells())["cid"].alias("cell"),
            F.concat(
                *[
                    F.slice(_chosen(m)["av"], m * PQ_SUB + 1, PQ_SUB)
                    for m in range(PQ_M)
                ]
            ).alias("r"),
        )
    )
    qprobe = (
        with_cb.filter(F.col("vec_id") < N_QUERIES)
        .withColumn(
            "cell",
            F.explode(
                F.transform(
                    F.slice(F.array_sort(_scored_cells()), 1, NPROBE),
                    lambda s: s["cid"],
                )
            ),
        )
        .select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), "cell")
    )
    scored = assigned.join(F.broadcast(qprobe), "cell").select(
        "q_id",
        F.col("vec_id").alias("n_id"),
        _l2sq(F.col("qv"), F.col("r")).alias("adc_dist"),
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("adc_dist"), F.asc("n_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= PQ_TOP_K)
        .select("q_id", "n_id", F.col("rnk").cast("long").alias("rnk"),
                "adc_dist")
    )


def _ann_ivf_pq_topk_sql() -> str:
    sub_dists = ", ".join(
        f"{_l2sq_sql('c.v', 'cb.av', m * PQ_SUB, PQ_SUB)} AS d{m}"
        for m in range(PQ_M)
    )
    code_ctes = ",\n".join(
        f"k{m} AS (SELECT vec_id, aid FROM ("
        f"SELECT vec_id, aid, row_number() OVER ("
        f"PARTITION BY vec_id ORDER BY d{m}, aid) AS rn FROM dists"
        f") WHERE rn = 1)"
        for m in range(PQ_M)
    )
    recon_concat = " || ".join(
        f"a{m}.av[{m * PQ_SUB + 1}:{(m + 1) * PQ_SUB}]" for m in range(PQ_M)
    )
    recon_joins = " ".join(
        f"JOIN k{m} ON k{m}.vec_id = c.vec_id "
        f"JOIN cb a{m} ON a{m}.aid = k{m}.aid"
        for m in range(PQ_M)
    )
    return f"""
WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
e AS (SELECT vec_id, v, {_norm_sql('v')} AS nrm FROM e0),
cent AS (
  SELECT vec_id AS cid, v AS cv, nrm AS cn FROM e
  WHERE vec_id % {CENTROID_STRIDE} = 0
),
cb AS (SELECT vec_id - {N_QUERIES} AS aid, v AS av FROM e0
       WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES + PQ_K}),
corpus AS (SELECT vec_id, v, nrm FROM e WHERE vec_id >= {N_QUERIES}),
cells AS (
  SELECT vec_id, cid AS cell FROM (
    SELECT c.vec_id, cent.cid,
           row_number() OVER (
             PARTITION BY c.vec_id
             ORDER BY {_dot_sql('c.v', 'cent.cv')} / (c.nrm * cent.cn) DESC,
                      cent.cid
           ) AS rn
    FROM corpus c CROSS JOIN cent
  ) WHERE rn = 1
),
dists AS (
  SELECT c.vec_id, cb.aid, {sub_dists}
  FROM corpus c CROSS JOIN cb
),
{code_ctes},
recon AS (
  SELECT c.vec_id, cells.cell, {recon_concat} AS r
  FROM corpus c JOIN cells USING (vec_id) {recon_joins}
),
qprobe AS (
  SELECT q_id, qv, cid AS cell FROM (
    SELECT q.vec_id AS q_id, q.v AS qv, cent.cid,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY {_dot_sql('q.v', 'cent.cv')} / (q.nrm * cent.cn) DESC,
                      cent.cid
           ) AS rn
    FROM e q CROSS JOIN cent WHERE q.vec_id < {N_QUERIES}
  ) WHERE rn <= {NPROBE}
),
scored AS (
  SELECT q_id, recon.vec_id AS n_id,
         {_l2sq_sql('qprobe.qv', 'recon.r', 0, DIM)} AS adc_dist
  FROM qprobe JOIN recon USING (cell)
)
SELECT q_id, n_id, rnk::BIGINT AS rnk, adc_dist FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id
                               ORDER BY adc_dist, n_id) AS rnk
  FROM scored
) WHERE rnk <= {PQ_TOP_K}
"""


ESTD_FX = float(1 << 24)  # fixed-point quantum for the per-dim moments


def embedding_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension z-score standardization — the normalization pass a
    pipeline runs before kmeans/quantization so no dimension dominates
    the metric.

    Exactness: the two moments are fixed-point BIGINT sums
    (floor(x·2²⁴), floor(x²·2²⁴) — order-free, engine-identical); the
    closing mean/var/std/z chain is a fixed sequence of correctly-
    rounded IEEE double ops on identical operands, so both engines
    produce bit-identical doubles. var is clamped at 0 before sqrt
    (the floor()s can push a truly-constant dimension epsilon-negative).

    Plan at 100 TB: posexplode is map-side; the stats aggregate is
    map-side-PARTIAL onto exactly DIM=64 final keys (each partition
    emits ≤64 partial rows, so the exchange is tiny regardless of
    corpus size); the 64-row stats frame broadcasts back onto the
    exploded stream and z is map-side. One scan, one 64-row exchange,
    zero data shuffles."""
    e = load(spark, sf_dir, "embeddings", widen=True).select(
        "vec_id", _as_double("embedding").alias("v")
    )
    x = e.select("vec_id", F.posexplode("v").alias("dim", "val"))
    stats = (
        x.groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("val") * F.lit(ESTD_FX)).cast("long")).alias("_m"),
            F.sum(
                F.floor(F.col("val") * F.col("val") * F.lit(ESTD_FX)).cast("long")
            ).alias("_s"),
        )
        .select(
            "dim",
            (F.col("_m").cast("double") / F.lit(ESTD_FX) / F.col("n")).alias("mean"),
            F.sqrt(
                F.greatest(
                    F.col("_s").cast("double") / F.lit(ESTD_FX) / F.col("n")
                    - (F.col("_m").cast("double") / F.lit(ESTD_FX) / F.col("n"))
                    * (F.col("_m").cast("double") / F.lit(ESTD_FX) / F.col("n")),
                    F.lit(0.0),
                )
            ).alias("std"),
        )
    )
    # std == 0 (a truly constant dimension, which the floor() clamp can
    # produce) ⇒ z := 0.0, not a NULL/NaN division — mirrored in the SQL
    return (
        x.join(F.broadcast(stats), "dim")
        .select(
            "vec_id",
            "dim",
            "val",
            F.when(F.col("std") == 0.0, F.lit(0.0))
            .otherwise((F.col("val") - F.col("mean")) / F.col("std"))
            .alias("z"),
        )
    )


EMBEDDING_STANDARDIZE_SQL = f"""
WITH x AS (
  SELECT vec_id, u.i - 1 AS dim, v[u.i] AS val
  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings) e,
       unnest(range(1, len(v) + 1)) AS u(i)
), stats AS (
  SELECT dim,
         CAST(sum(CAST(floor(val * {ESTD_FX!r}) AS BIGINT)) AS BIGINT)::DOUBLE
           / {ESTD_FX!r} / count(*) AS mean,
         sqrt(greatest(
           CAST(sum(CAST(floor(val * val * {ESTD_FX!r}) AS BIGINT)) AS BIGINT)::DOUBLE
             / {ESTD_FX!r} / count(*)
           - (CAST(sum(CAST(floor(val * {ESTD_FX!r}) AS BIGINT)) AS BIGINT)::DOUBLE
              / {ESTD_FX!r} / count(*))
           * (CAST(sum(CAST(floor(val * {ESTD_FX!r}) AS BIGINT)) AS BIGINT)::DOUBLE
              / {ESTD_FX!r} / count(*)),
           0.0)) AS std
  FROM x GROUP BY dim
)
SELECT vec_id, x.dim, val,
       CASE WHEN std = 0 THEN 0.0 ELSE (val - mean) / std END AS z
FROM x JOIN stats ON x.dim = stats.dim
"""


def source_centroid_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic source map: per-source mean embedding (the domain
    centroid), then cosine similarity between every source pair — the
    embedding-space complement of ``text.source_token_overlap``
    (lexical). Two sources with near-1 cosine are candidates for
    merged mixture weights; far-apart sources justify separate quotas.

    Determinism: per-(source, dim) means use the fixed-point moment
    discipline (floor(x·2²⁴) BIGINT sums); pair dot products and norms
    are again fixed-point sums over the TINY centroid frame
    (|sources|·DIM rows), so no float accumulation anywhere — the one
    sqrt/division closing chain is correctly-rounded IEEE on identical
    operands.

    Plan at 100 TB: one id equi-join attaches sources to vectors, one
    partial-agged exchange onto |sources|·DIM keys; everything after
    operates on ≤ a-few-thousand-row frames (broadcast joins, free)."""
    from argus_spark.datapipe.scoped_cache import scoped_cache

    e = load(spark, sf_dir, "embeddings", widen=True).select(
        F.col("vec_id").alias("doc_id"), _as_double("embedding").alias("v")
    )
    src = load(spark, sf_dir, "documents").select("doc_id", "source")
    x = e.join(src, "doc_id").select(
        "source", F.posexplode("v").alias("dim", "val")
    )
    # Scoped-cached (r14, guide §5 cache-at-fan-out): the centroid
    # frame feeds BOTH sides of the pair self-join, and without the
    # cache each side re-pays the vector join + posexplode + the
    # |vectors|·DIM-row aggregate (the only expensive exchange here).
    cent = scoped_cache(
        x.groupBy("source", "dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("val") * F.lit(ESTD_FX)).cast("long")).alias("_m"),
        )
        .select(
            "source",
            "dim",
            (F.col("_m").cast("double") / F.lit(ESTD_FX) / F.col("n")).alias("c"),
        )
    )
    a = cent.select(
        F.col("source").alias("source_a"), "dim", F.col("c").alias("ca")
    )
    b = cent.select(
        F.col("source").alias("source_b"), "dim", F.col("c").alias("cb")
    )
    # dots itself fans out three ways (na, nb, the final filter) — a
    # tiny ≤C(|sources|+1,2)-row frame, so the cache costs nothing and
    # saves two re-runs of the pair join + rollup.
    dots = scoped_cache(
        a.join(b, "dim")
        .filter(F.col("source_a") <= F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.sum(
                F.floor(F.col("ca") * F.col("cb") * F.lit(ESTD_FX)).cast("long")
            ).alias("dot_fp")
        )
    )
    norms = dots.filter(F.col("source_a") == F.col("source_b")).select(
        F.col("source_a").alias("s"), F.col("dot_fp").alias("nrm_fp")
    )
    na = norms.select(F.col("s").alias("source_a"), F.col("nrm_fp").alias("na"))
    nb = norms.select(F.col("s").alias("source_b"), F.col("nrm_fp").alias("nb"))
    return (
        dots.filter(F.col("source_a") < F.col("source_b"))
        .join(F.broadcast(na), "source_a")
        .join(F.broadcast(nb), "source_b")
        .select(
            "source_a",
            "source_b",
            (
                F.col("dot_fp").cast("double")
                / F.sqrt(F.col("na").cast("double") * F.col("nb").cast("double"))
            ).alias("cos_sim"),
        )
    )


SOURCE_CENTROID_SIMILARITY_SQL = f"""
WITH e AS (
  SELECT vec_id AS doc_id, embedding::DOUBLE[] AS v FROM embeddings
), x AS (
  SELECT d.source, u.i - 1 AS dim, e.v[u.i] AS val
  FROM e JOIN documents d USING (doc_id),
       unnest(range(1, len(e.v) + 1)) AS u(i)
), cent AS (
  SELECT source, dim,
         CAST(sum(CAST(floor(val * {ESTD_FX!r}) AS BIGINT)) AS BIGINT)::DOUBLE
           / {ESTD_FX!r} / count(*) AS c
  FROM x GROUP BY source, dim
), dots AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(sum(CAST(floor(a.c * b.c * {ESTD_FX!r}) AS BIGINT)) AS BIGINT)
           AS dot_fp
  FROM cent a JOIN cent b ON a.dim = b.dim AND a.source <= b.source
  GROUP BY a.source, b.source
), norms AS (
  SELECT source_a AS s, dot_fp AS nrm_fp FROM dots WHERE source_a = source_b
)
SELECT source_a, source_b,
       dot_fp::DOUBLE / sqrt(na.nrm_fp::DOUBLE * nb.nrm_fp::DOUBLE) AS cos_sim
FROM dots
JOIN norms na ON na.s = source_a
JOIN norms nb ON nb.s = source_b
WHERE source_a < source_b
"""


def _wbucket_col(v: str) -> F.Column:
    """8-bit sign pattern of the first 8 WHITENED components — PCA
    hashing: whitening decorrelates the components and equalizes their
    second moments, so each sign bit is near-balanced and the 2^8
    buckets fill evenly (the reason ``embedding_whiten``'s docstring
    sells 'whiten before cosine bucketing'). Delegates to
    ``_bucket_col`` with the whitening rows as the plane matrix — one
    sign-hash implementation for both variants."""
    from argus_spark.datapipe.whiten_params import WHITEN_W

    return _bucket_col(v, WHITEN_W[:N_PLANES])


def _wbucket_sql(v: str) -> str:
    from argus_spark.datapipe.whiten_params import WHITEN_W

    return _bucket_sql(v, WHITEN_W[:N_PLANES])


def ann_lsh_whitened(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN over the WHITENED space: bucket = sign pattern
    of whitened components w0..w7 (``_wbucket_col``); candidates from
    the query's own bucket; ranking/verify stays RAW cosine so results
    are directly comparable to ``ann_cosine_topk`` ground truth. Same
    plan shape as ``ann_lsh_bucketed`` (map-side bucket column,
    broadcast equi-join probe) — the whitening matrix rides the plan as
    literals, exactly the ``embedding_whiten`` projection reused as a
    hash."""
    bucketed = _embedding_corpus(spark, sf_dir).withColumn(
        "bucket", _wbucket_col("v")
    )
    q = bucketed.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"),
        F.col("nrm").alias("qn"), "bucket",
    )
    c = bucketed.select(
        F.col("vec_id").alias("n_id"), F.col("v").alias("nv"),
        F.col("nrm").alias("nn"), "bucket",
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn(
            "cos_sim",
            cosine_prenorm(_dot(F.col("qv"), F.col("nv")), F.col("qn"), F.col("nn")),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("n_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= LSH_TOP_K)
        .select("q_id", "n_id", "rnk", "cos_sim")
    )


def _ann_lsh_whitened_sql() -> str:
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), bucketed AS (
  SELECT vec_id, v, {_wbucket_sql('v')} AS bucket, {_norm_sql('v')} AS nrm FROM e
), q AS (
  SELECT vec_id AS q_id, v AS qv, nrm AS qn, bucket
  FROM bucketed WHERE vec_id < {N_QUERIES}
), scored AS (
  SELECT q_id, c.vec_id AS n_id,
         {_dot_sql('qv', 'c.v')} / (qn * c.nrm) AS cos_sim
  FROM q JOIN bucketed c USING (bucket)
  WHERE q.q_id <> c.vec_id
)
SELECT q_id, n_id, rnk, cos_sim FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id
                               ORDER BY cos_sim DESC, n_id) AS rnk
  FROM scored
) WHERE rnk <= {LSH_TOP_K}
"""


ANN_LSH_WHITENED_SQL = _ann_lsh_whitened_sql()


def ann_whitened_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitened-vs-raw LSH recall matrix (r12 verdict #3) — the
    integration row that makes ``embedding_whiten`` a CONSUMED pipeline
    step instead of a leaf: per query, recall@{LSH_TOP_K} against exact
    raw-cosine truth for (a) the raw sign-pattern buckets
    (``ann_lsh_bucketed``) and (b) the whitened-component sign buckets
    (``ann_lsh_whitened``). The measurement a pipeline runs before
    deciding whether to whiten ahead of bucketing; same harness shape
    as ``ann_recall_at_k``."""
    exact = (
        ann_cosine_topk(spark, sf_dir)
        .filter(F.col("rnk") <= LSH_TOP_K)
        .select("q_id", "n_id")
    )
    variants = {
        "lsh_raw": ann_lsh_bucketed,
        "lsh_whitened": ann_lsh_whitened,
    }
    approx = None
    for tag, fn in variants.items():
        a = fn(spark, sf_dir).select(
            "q_id", "n_id", F.lit(tag).alias("variant"), F.lit(1).alias("hit")
        )
        approx = a if approx is None else approx.unionByName(a)
    tags = spark.createDataFrame([(t,) for t in variants], "variant string")
    base = exact.crossJoin(F.broadcast(tags))  # 2-row tag frame
    # r15 (guide §3.1): the approx side is sample-bounded at ANY corpus
    # scale (≤ |variants|·N_QUERIES·LSH_TOP_K rows — top-k per sampled
    # query), but the static planner sees only window-output stats and
    # picked a SortMergeJoin, shuffling+sorting BOTH tiny sides (2
    # Exchanges + 2 Sorts in the before-plan). Broadcast it explicitly.
    return (
        base.join(F.broadcast(approx), ["q_id", "n_id", "variant"], "left")
        .groupBy("variant", "q_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_exact"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_hits"),
        )
        .select(
            "variant",
            "q_id",
            "n_exact",
            "n_hits",
            (
                F.col("n_hits").cast("double") / F.col("n_exact").cast("double")
            ).alias("recall"),
        )
    )


def _ann_whitened_recall_sql() -> str:
    return f"""
WITH exact AS (
  SELECT q_id, n_id FROM ({ANN_COSINE_TOPK_SQL}) WHERE rnk <= {LSH_TOP_K}
), approx AS (
  SELECT q_id, n_id, 'lsh_raw' AS variant, 1 AS hit
  FROM ({ANN_LSH_BUCKETED_SQL})
  UNION ALL
  SELECT q_id, n_id, 'lsh_whitened' AS variant, 1 AS hit
  FROM ({ANN_LSH_WHITENED_SQL})
), base AS (
  SELECT e.q_id, e.n_id, t.variant
  FROM exact e CROSS JOIN (
    SELECT * FROM (VALUES ('lsh_raw'), ('lsh_whitened')) AS v(variant)
  ) t
)
SELECT b.variant, b.q_id,
       count(*)::BIGINT AS n_exact,
       CAST(sum(COALESCE(a.hit, 0)) AS BIGINT) AS n_hits,
       CAST(sum(COALESCE(a.hit, 0)) AS BIGINT)::DOUBLE
         / count(*)::BIGINT::DOUBLE AS recall
FROM base b
LEFT JOIN approx a
  ON b.q_id = a.q_id AND b.n_id = a.n_id AND b.variant = a.variant
GROUP BY b.variant, b.q_id
"""


def ann_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k matrix for every approximate ANN variant against exact
    brute-force cosine — the completeness critic for the approximate
    path: per (variant, query), how many of the true top-``LSH_TOP_K``
    neighbors the variant recovered. This is the measurement a
    pipeline runs on a query SAMPLE before trusting an ANN variant at
    corpus scale (single-bucket LSH measures near-zero recall on
    isotropic vectors — exactly the signal that forces the widening
    to multiprobe/IVF); keeping it a registered, oracle-checked query
    pins the measurement harness itself, not just the variants.

    Determinism: every side is an already-deterministic ranked query
    (total tie order by n_id); the recall division is one IEEE divide
    of small ints. Plan: exact side = broadcast-queries × corpus scan
    (the baseline cost, run on N_QUERIES samples only); each variant
    probes its bucket/cells; the join/agg act on ≤ 4·N_QUERIES·k
    rows (the crossJoin is the 4-row variant-tag frame)."""
    exact = (
        ann_cosine_topk(spark, sf_dir)
        .filter(F.col("rnk") <= LSH_TOP_K)
        .select("q_id", "n_id")
    )
    variants = {
        "lsh_bucketed": ann_lsh_bucketed,
        "lsh_multiprobe": ann_lsh_multiprobe,
        "ivf": ann_ivf_topk,
        "ivf_pq": ann_ivf_pq_topk,
    }
    approx = None
    for tag, fn in variants.items():
        a = fn(spark, sf_dir).select(
            "q_id", "n_id", F.lit(tag).alias("variant"), F.lit(1).alias("hit")
        )
        approx = a if approx is None else approx.unionByName(a)
    # The tag frame is built from the STATIC variants dict, not from the
    # approx union's data — a variant returning zero candidate rows must
    # show recall 0 in the matrix (total-recall collapse is exactly the
    # signal this query exists to surface), not silently vanish.
    tags = spark.createDataFrame(
        [(t,) for t in variants], "variant string"
    )
    base = exact.crossJoin(F.broadcast(tags))  # 4-row tag frame
    # same §3.1 hint as ann_whitened_recall: the approx union is
    # sample-bounded (≤ 4·N_QUERIES·k rows) at any corpus scale
    return (
        base.join(F.broadcast(approx), ["q_id", "n_id", "variant"], "left")
        .groupBy("variant", "q_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_exact"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_hits"),
        )
        .select(
            "variant",
            "q_id",
            "n_exact",
            "n_hits",
            (
                F.col("n_hits").cast("double") / F.col("n_exact").cast("double")
            ).alias("recall"),
        )
    )


def _ann_recall_at_k_sql() -> str:
    return f"""
WITH exact AS (
  SELECT q_id, n_id FROM ({ANN_COSINE_TOPK_SQL}) WHERE rnk <= {LSH_TOP_K}
), approx AS (
  SELECT q_id, n_id, 'lsh_bucketed' AS variant, 1 AS hit
  FROM ({ANN_LSH_BUCKETED_SQL})
  UNION ALL
  SELECT q_id, n_id, 'lsh_multiprobe' AS variant, 1 AS hit
  FROM ({ANN_LSH_MULTIPROBE_SQL})
  UNION ALL
  SELECT q_id, n_id, 'ivf' AS variant, 1 AS hit
  FROM ({ANN_IVF_TOPK_SQL})
  UNION ALL
  SELECT q_id, n_id, 'ivf_pq' AS variant, 1 AS hit
  FROM ({_ann_ivf_pq_topk_sql()})
), base AS (
  -- static literal tags (mirrors the Spark side): an empty variant
  -- must appear with recall 0, not vanish from the matrix
  SELECT e.q_id, e.n_id, t.variant
  FROM exact e CROSS JOIN (
    SELECT * FROM (VALUES ('lsh_bucketed'), ('lsh_multiprobe'), ('ivf'),
                          ('ivf_pq'))
      AS v(variant)
  ) t
)
SELECT b.variant, b.q_id,
       count(*)::BIGINT AS n_exact,
       CAST(sum(COALESCE(a.hit, 0)) AS BIGINT) AS n_hits,
       CAST(sum(COALESCE(a.hit, 0)) AS BIGINT)::DOUBLE
         / count(*)::BIGINT::DOUBLE AS recall
FROM base b
LEFT JOIN approx a
  ON b.q_id = a.q_id AND b.n_id = a.n_id AND b.variant = a.variant
GROUP BY b.variant, b.q_id
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "ann_recall_at_k": ann_recall_at_k,
    "ann_cosine_topk": ann_cosine_topk,
    "ann_lsh_bucketed": ann_lsh_bucketed,
    "ann_lsh_multiprobe": ann_lsh_multiprobe,
    "ann_ivf_topk": ann_ivf_topk,
    "embedding_project_rp": embedding_project_rp,
    "embedding_standardize": embedding_standardize,
    "ann_pq_adc_topk": ann_pq_adc_topk,
    "ann_ivf_pq_topk": ann_ivf_pq_topk,
    "source_centroid_similarity": source_centroid_similarity,
    "ann_whitened_recall": ann_whitened_recall,
}

ORACLES: dict[str, str] = {
    "ann_recall_at_k": _ann_recall_at_k_sql(),
    "ann_cosine_topk": ANN_COSINE_TOPK_SQL,
    "ann_lsh_bucketed": ANN_LSH_BUCKETED_SQL,
    "ann_lsh_multiprobe": ANN_LSH_MULTIPROBE_SQL,
    "ann_ivf_topk": ANN_IVF_TOPK_SQL,
    "embedding_project_rp": EMBEDDING_PROJECT_RP_SQL,
    "embedding_standardize": EMBEDDING_STANDARDIZE_SQL,
    "ann_pq_adc_topk": _ann_pq_adc_topk_sql(),
    "ann_ivf_pq_topk": _ann_ivf_pq_topk_sql(),
    "source_centroid_similarity": SOURCE_CENTROID_SIMILARITY_SQL,
    "ann_whitened_recall": _ann_whitened_recall_sql(),
}
