"""Bucketed tables: co-located, shuffle-free joins for repeated big joins.

At 100 TB the dominant cost of the KG pipeline's repeated joins (mentions ⋈
canon, triples ⋈ lineage, incremental-batch ⋈ existing-vertices) is the
shuffle. Writing both sides bucketed by the join key pins partitioning into
the table layout: Spark's planner then sort-merge-joins bucket-to-bucket
with NO Exchange on either side (verified in tests by inspecting the plan).

This is the DataFrame-era equivalent of the reference's server-side
co-location assumption (NebulaGraph partitions by VID; the importer never
joins at all) — here the engine joins, so the layout must carry the
partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Save as a bucketed (and bucket-sorted) managed table.

    Sorting within buckets lets the sort-merge join skip its sort step too —
    the join becomes a pure streaming merge per bucket pair.
    """
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket key.

    With matching bucket specs the physical plan contains no Exchange —
    each task reads bucket i of both tables and merges.
    """
    return spark.table(left_table).join(spark.table(right_table), on)


def plan_has_exchange(df: DataFrame) -> bool:
    """True if the physical plan contains a SHUFFLE exchange (test helper).

    BroadcastExchange is not a data shuffle of the big side, so only
    hash/range-partitioning exchanges count.
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" in plan or "Exchange rangepartitioning" in plan
