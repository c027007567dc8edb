"""Embedding clustering: deterministic integer Lloyd's k-means.

Training-data curation clusters embeddings for diversity sampling, topic
balancing, and stratified dedup. The reference importer has no analytics;
this extends the engine the same way the ANN operators do (SURVEY.md §2.6
training-data additions) and shares their machinery: md5-deterministic
seeding (as ``similarity.ivf_assign``) and a zero-shuffle broadcast argmin
assignment.

Determinism design: textbook Lloyd's iterates float means, but a
distributed ``SUM(double)`` folds in shuffle-arrival order — results drift
across partitionings and engines. Here vectors are quantized once to BIGINT
e4 units (floor(x·1e4 + 0.5)) and every later step is exact integer math:
squared-L2 distances are BIGINT sums, centroid updates are truncating
integer division (Spark ``div`` == DuckDB ``//`` toward zero). Assignments
are byte-identical at any parallelism and replicable in ANSI SQL. e4
quantization moves a centroid coordinate by <1e-4 — far below cluster
separation at any realistic embedding scale.

Scale notes (100 TB): per refinement round the corpus is scanned once for
assignment (broadcast centroid array, single projection, NO shuffle — the
argmin is ``array_min`` over (dist, cid) structs) and shuffled once for the
update (posexplode to (cid, dim) keys — k×dims groups, map-side
combinable). k and dims are small; the corpus never joins itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 1.0 in coordinate e4 units.
COORD_ONE = 10_000


def quantize_e4(vec: Column) -> Column:
    """array<float> → array<long> e4 fixed-point (floor(x·1e4 + 0.5))."""
    return F.transform(
        vec.cast("array<double>"),
        lambda x: F.floor(x * F.lit(float(COORD_ONE)) + F.lit(0.5)).cast("long"),
    )


def _sq_dist(a: Column, b: Column) -> Column:
    """Exact BIGINT squared L2 distance of two integer vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _assign(vecs: DataFrame, cent_arr: DataFrame) -> DataFrame:
    """(vec_id, v, cluster_id): nearest centroid per row, zero shuffle.

    ``cent_arr`` is a single-row array<struct<cid, cv>> — broadcast
    cross-joined, argmin via ``array_min`` over (dist, cid) structs (struct
    ordering = dist asc then cid asc, the deterministic tie-break).
    """
    best = F.array_min(
        F.transform(
            F.col("_cents"),
            lambda c: F.struct(
                _sq_dist(F.col("v"), c.getField("cv")).alias("dist"),
                c.getField("cid").alias("cid"),
            ),
        )
    )
    return (
        vecs.join(F.broadcast(cent_arr))
        .select("vec_id", "v", best.getField("cid").alias("cluster_id"))
    )


def kmeans_assign(
    df: DataFrame,
    k: int = 8,
    refinements: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic integer k-means → (vec_id, cluster_id).

    Seeds are the ``k`` vectors minimizing md5(id) (TakeOrderedAndProject —
    one linear scan, no global sort, exactly the IVF quantizer's seeding);
    each refinement reassigns and recomputes centroids as truncated integer
    means; the returned assignment is against the final centroids.
    ``cluster_id`` is the seed vector's id — stable, orderable, meaningful.

    Empty clusters simply drop out of the update (standard Lloyd's); ties
    in the argmin break toward the smaller cluster_id in both engines.
    """
    vecs = df.select(
        F.col(id_col).alias("vec_id"), quantize_e4(F.col(vec_col)).alias("v")
    )
    cent_arr = (
        vecs.select(
            F.col("vec_id").alias("cid"),
            F.col("v").alias("cv"),
            F.md5(F.col("vec_id").cast("string")).alias("_pick"),
        )
        .orderBy("_pick")
        .limit(k)
        .agg(F.collect_list(F.struct("cid", "cv")).alias("_cents"))
    )
    for _ in range(refinements):
        asg = _assign(vecs, cent_arr)
        # one shuffle on (cid, dim): k×dims groups, partial sums map-side
        cent_arr = (
            asg.select("cluster_id", F.posexplode("v").alias("pos", "val"))
            .groupBy("cluster_id", "pos")
            .agg(F.expr("sum(val) div count(*)").alias("cv1"))
            .groupBy("cluster_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "cv1"))),
                    lambda s: s.getField("cv1"),
                ).alias("cv")
            )
            .select(F.col("cluster_id").alias("cid"), "cv")
            .agg(F.collect_list(F.struct("cid", "cv")).alias("_cents"))
        )
    return _assign(vecs, cent_arr).select("vec_id", "cluster_id")
