"""Iterative clustering over the ``embeddings`` table — Lloyd's
k-means, the canonical iterative-refinement algorithm the driver's
correctness harness marks oracle-exempt (multi-round convergence is not
one SQL statement; the DuckDB side would need the same driver loop).

Spark shape per iteration (the 100 TB contract):
  * centroids live on the DRIVER as k×DIM literals (control-plane: k=8,
    DIM=64 → 512 doubles) and enter the plan as a broadcast-sized
    literal array of structs — the corpus is NEVER shuffled to meet
    its centroids;
  * assignment is a pure map-side expression (array_min over the
    per-centroid squared distances, exactly the IVF cell-assignment
    shape, similarity.ann_ivf_topk);
  * the centroid update is ONE partial-aggregated groupBy(cluster)
    with DIM avg aggregates + count + inertia — one exchange carrying
    k rows per partition, collected back to the driver (k×DIM values,
    control-plane again).

So a 3-iteration fit is 3 shuffles of k-row partial aggregates and 3
k×DIM collects — nothing data-sized ever moves to the driver
(the `.collect()` is the codebook, not the corpus).

Convergence property (tested): total inertia is monotonically
non-increasing across Lloyd iterations.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from argus_spark.datapipe.dedup import DIM, _as_double
from argus_spark.session import load

K_CLUSTERS = 8
N_ITERS = 3


def _sqdist(v: Column, c: Column) -> Column:
    """Ordered-fold squared distance (same fold discipline as
    dedup._dot)."""
    return F.aggregate(
        F.zip_with(v, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )


def _assign(e: DataFrame, centroids: list[tuple[int, list[float]]]) -> DataFrame:
    """Map-side nearest-centroid assignment: the codebook enters as a
    literal array of structs, argmin via array_min over (dist, cid) —
    ascending struct order breaks distance ties toward the smaller
    cluster id."""
    # ONE parsed SQL literal instead of k×DIM F.lit() calls: each lit
    # is a Py4J round-trip, and 512 of them per iteration measured as
    # the dominant fit cost at bench SFs; a single expr() string parses
    # JVM-side in one hop. repr() round-trips doubles exactly.
    cb = F.expr(
        "array("
        + ", ".join(
            "named_struct('cid', {cid}, 'cv', array({vs}))".format(
                cid=int(cid),
                vs=", ".join(f"{float(x)!r}D" for x in vec),
            )
            for cid, vec in centroids
        )
        + ")"
    )
    scored = F.transform(
        cb,
        lambda c: F.struct(
            _sqdist(F.col("v"), c["cv"]).alias("d"), c["cid"].alias("cid")
        ),
    )
    best = F.array_min(scored)
    return e.select(
        "vec_id", "v", best["cid"].alias("cluster_id"), best["d"].alias("sqdist")
    )


def kmeans_fit(
    spark: SparkSession,
    sf_dir: str,
    k: int = K_CLUSTERS,
    iters: int = N_ITERS,
) -> tuple[DataFrame, list[float]]:
    """Run ``iters`` Lloyd iterations; returns (final per-cluster
    summary DataFrame, per-iteration total inertia). Init is
    deterministic: the k smallest vec_ids seed the codebook."""
    # Cached: every Lloyd iteration (assignment + update) and the final
    # summary re-scan the same corpus projection — at bench SFs the
    # repeated widen+decode dominated wall time, and at cluster scale
    # you'd persist the feature matrix for exactly the same reason.
    # Session-lifetime cache (the returned summary's lineage still
    # references it, so it cannot be unpersisted here).
    e = load(spark, sf_dir, "embeddings", widen=True).select(
        "vec_id", _as_double("embedding").alias("v")
    ).cache()
    seed_rows = (
        e.filter(F.col("vec_id") < k).orderBy("vec_id").collect()
    )  # control-plane: k rows
    centroids = [(i, list(r["v"])) for i, r in enumerate(seed_rows)]
    inertia_path: list[float] = []
    dim_avgs = [F.avg(F.col("v")[i]).alias(f"c{i}") for i in range(DIM)]
    for _ in range(iters):
        assigned = _assign(e, centroids)
        upd = (
            assigned.groupBy("cluster_id")
            .agg(
                F.count(F.lit(1)).alias("n_members"),
                F.sum("sqdist").alias("inertia"),
                *dim_avgs,
            )
            .collect()
        )  # control-plane: k rows of DIM+2 values
        inertia_path.append(sum(r["inertia"] for r in upd))
        centroids = [
            (r["cluster_id"], [r[f"c{i}"] for i in range(DIM)]) for r in upd
        ]
        centroids.sort()
    final = _assign(e, centroids)
    summary = (
        final.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("sqdist").alias("inertia"),
        )
        .orderBy("cluster_id")
    )
    return summary, inertia_path


def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered (rows-only) query: per-cluster membership count and
    inertia after N_ITERS Lloyd iterations. No SQL oracle — iterative
    refinement is the documented oracle-exempt class; the convergence
    property (inertia monotone non-increasing) is pinned by pytest
    instead."""
    summary, _ = kmeans_fit(spark, sf_dir)
    return summary


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "kmeans_embeddings": kmeans_embeddings,
}

ORACLES: dict[str, str] = {}
