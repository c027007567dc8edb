"""Materialize stage: deduplicated vertex/edge/triple tables + statements.

The DataFrame analog of the reference's server-side dedup flags
(``IGNORE_EXISTED_INDEX`` / ``IF NOT EXISTS``, ``/root/reference/pkg/spec/v3/
node.go:98-105``): vertices dedup on vid, edges on (src, dst, rank).
Statement text (INSERT VERTEX/EDGE) is rendered only for golden-parity
checks — the engine's real output is the tables.

Skew: rdf:type-like predicates concentrate on few objects; predicate-level
statistics use salted two-phase aggregation (explicit salt column → partial
→ final) so one hot key spreads over many reducers. AQE's skew handling
covers joins; hot-key *aggregation* needs this explicit treatment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TRIPLE_COLS = ("subj", "pred", "obj")


def dedup_vertices(vertices: DataFrame, vid_col: str = "vid") -> DataFrame:
    return vertices.dropDuplicates([vid_col])


def dedup_edges(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    rank_col: str | None = None,
) -> DataFrame:
    keys = [src_col, dst_col] + ([rank_col] if rank_col else [])
    return edges.dropDuplicates(keys)


def dedup_triples(triples: DataFrame) -> DataFrame:
    return triples.dropDuplicates(list(TRIPLE_COLS))


def predicate_stats(
    triples: DataFrame, salt_buckets: int = 16, subj_col: str = "subj"
) -> DataFrame:
    """(pred, n_triples, n_subjects) via salted two-phase aggregation.

    Phase 1: groupBy(pred, salt) — a hot predicate spreads over
    ``salt_buckets`` reducers. Phase 2: merge partials per pred (tiny).
    ``n_subjects`` uses HLL sketches (approx) because exact distinct under a
    salt split would need a second full shuffle of subjects.
    """
    salted = triples.withColumn(
        "salt", F.pmod(F.xxhash64(F.col(subj_col)), F.lit(salt_buckets))
    )
    partial = salted.groupBy("pred", "salt").agg(
        F.count("*").alias("pn"),
        F.approx_count_distinct(subj_col).alias("ps"),
    )
    return partial.groupBy("pred").agg(
        F.sum("pn").alias("n_triples"),
        F.sum("ps").alias("n_subjects_approx"),
    )
