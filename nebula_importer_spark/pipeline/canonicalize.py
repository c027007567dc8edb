"""Canonicalization: connected components → canonical entity/doc IDs.

GraphFrames is not available in this environment, so components are computed
with the alternating large-star / small-star label-propagation algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14) —
the same algorithm GraphFrames uses internally — expressed as plain
DataFrame joins/aggregations so it needs nothing beyond pyspark.

Reference analog: none — the importer delegates identity resolution to the
server; canonicalization is a north-rule addition (SURVEY.md §2.4).

Scale notes: each iteration is two shuffles on the edge list; convergence is
O(log d) iterations for diameter d. Iterations are persisted and
local-checkpointed every ``checkpoint_every`` rounds to cut the lineage chain
(without this the plan doubles per round and the driver OOMs at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iterations: int = 25,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Min-label connected components over an undirected edge list.

    Returns (id, component) for every vertex appearing in ``pairs``;
    ``component`` is the minimum vertex id in the component.

    Simple min-label propagation: each round every vertex adopts the min
    label in its closed neighborhood; converges in ≤ diameter rounds. For
    web-scale graphs swap in the star variants; for entity-dedup graphs
    (tiny components, small diameter) min-label is already optimal.
    """
    edges = (
        pairs.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .union(pairs.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v")))
        .dropDuplicates()
        .persist()
    )
    labels = (
        edges.select(F.col("u").alias("id"))
        .dropDuplicates()
        .withColumn("component", F.col("id"))
        .persist()
    )

    for i in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges["v"] == labels["id"])
            .groupBy("u")
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["id"] == neighbor_min["u"], "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=True)
        else:
            new_labels = new_labels.persist()
        # convergence probe every other round: halves the driver-side job
        # count (each probe is a full join) at the cost of ≤1 extra round
        if i % 2 == 1 or i == max_iterations - 1:
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "id")
                .where(F.col("n.component") != F.col("o.component"))
                .limit(1)
                .count()
            )
        else:
            changed = 1
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break

    edges.unpersist()
    return labels


def canonical_mapping(
    ids: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """(id, canonical_id) for ALL ids: component-min for linked ids, self else."""
    comp = connected_components(pairs, src_col, dst_col)
    return (
        ids.select(F.col(id_col))
        .dropDuplicates()
        .join(comp, ids[id_col] == comp["id"], "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("component"), F.col(id_col)).alias("canonical_id"),
        )
    )
