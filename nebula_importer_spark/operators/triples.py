"""Triple emission: rendered vertex/edge values → (subj, pred, obj) rows.

The reference's semantic output is graph mutations; their content is exactly
a set of triples (FIXTURES.md §3):

* tag row    → ``(vid, "tag:<name>", NULL)`` plus one
               ``(vid, "<tag>.<prop>", value)`` per prop;
* edge row   → ``(src, "<edge>", dst)`` (pred carries ``@rank`` when ranked)
               plus ``(src->dst[@rank], "<edge>.<prop>", value)`` per prop.

Subjects/objects/values are the *rendered literals* (quoted strings, typed
wrappers), so string-VID and int-VID spaces stay distinct and P/R comparison
against the reference mapping is exact.

Implemented as one explode over a per-row literal array — a single narrow
projection, no shuffle, fully JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nebula_importer_spark.plans.specs import EdgeSpec, NodeSpec

TRIPLE_COLS = ("subj", "pred", "obj")


def node_triples(values: DataFrame, spec: NodeSpec, keep: tuple = ()) -> DataFrame:
    """(vid, "tag:<name>", NULL) + per-prop triples from ``node_values``."""
    entries = [
        F.struct(
            F.lit(f"tag:{spec.name}").alias("pred"),
            F.lit("NULL").alias("obj"),
        )
    ]
    for p in spec.props:
        entries.append(
            F.struct(
                F.lit(f"{spec.name}.{p.name}").alias("pred"),
                F.col(f"p_{p.name}").alias("obj"),
            )
        )
    exploded = values.select(
        F.col("vid").alias("subj"), F.explode(F.array(*entries)).alias("e"), *keep
    )
    return exploded.select(
        "subj", F.col("e.pred").alias("pred"), F.col("e.obj").alias("obj"), *keep
    )


def edge_triples(values: DataFrame, spec: EdgeSpec, keep: tuple = ()) -> DataFrame:
    """(src, "<edge>[@rank]", dst) + per-prop triples from ``edge_values``."""
    has_rank = spec.rank is not None
    rank_suffix = (
        F.concat(F.lit("@"), F.col("rank")) if has_rank else F.lit("")
    )
    pred = F.concat(F.lit(spec.name), rank_suffix)
    edge_key = F.concat(F.col("src"), F.lit("->"), F.col("dst"), rank_suffix)

    entries = [
        F.struct(
            edge_key.alias("subj"),
            pred.alias("pred"),
            F.col("dst").alias("obj"),
            F.lit(True).alias("is_endpoint"),
        )
    ]
    for p in spec.props:
        entries.append(
            F.struct(
                edge_key.alias("subj"),
                F.lit(f"{spec.name}.{p.name}").alias("pred"),
                F.col(f"p_{p.name}").alias("obj"),
                F.lit(False).alias("is_endpoint"),
            )
        )
    exploded = values.select(
        F.col("src").alias("src_vid"), F.explode(F.array(*entries)).alias("e"), *keep
    )
    return exploded.select(
        F.when(F.col("e.is_endpoint"), F.col("src_vid"))
        .otherwise(F.col("e.subj"))
        .alias("subj"),
        F.col("e.pred").alias("pred"),
        F.col("e.obj").alias("obj"),
        *keep,
    )
