"""Bucketed co-located joins: no Exchange in the join plan."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from nebula_importer_spark.operators.bucketing import (
    bucketed_join,
    plan_has_exchange,
    write_bucketed,
)


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    left = spark.range(0, 1000).select(
        F.col("id").alias("vid"), (F.col("id") % 7).alias("x")
    )
    right = spark.range(0, 1000).select(
        F.col("id").alias("vid"), (F.col("id") % 5).alias("y")
    )
    write_bucketed(left, "bk_left", "vid", n_buckets=8)
    write_bucketed(right, "bk_right", "vid", n_buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # force the sort-merge path: tiny test tables would otherwise broadcast
    # (at real scale both sides are too big to broadcast — that IS the case
    # bucketing exists for)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "bk_left", "bk_right", "vid")
        assert joined.count() == 1000
        # co-located: bucket-to-bucket sort-merge, no shuffle on either side
        assert not plan_has_exchange(joined)
        # control: the same join on non-bucketed frames DOES shuffle
        plain = left.join(right, "vid")
        assert plan_has_exchange(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bk_left")
        spark.sql("DROP TABLE IF EXISTS bk_right")
