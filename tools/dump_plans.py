"""Generate PLANS.md: formatted physical plans for key queries + commentary.

Usage: python tools/dump_plans.py
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

COMMENTARY = {
    "map_vertex_insert": (
        "Mapping core is a single narrow projection: one `Scan parquet` with "
        "ReadSchema pruned to exactly the 5 consumed columns, one "
        "whole-stage-codegen Project rendering every literal JVM-side, one "
        "Generate (explode) for the per-prop triples. Zero shuffles — at "
        "100 TB this pipelines with the scan at I/O speed."
    ),
    "map_vertex_filter": (
        "The reference's expr-lang filter compiles to a Catalyst boolean "
        "evaluated in the same codegen stage as the scan (the null-coalescing "
        "required by the `[]string` record contract keeps it out of the "
        "parquet PushedFilters, a documented tradeoff — row-group skipping "
        "is lost, the columnar-batch filter remains)."
    ),
    "kg_link_alias": (
        "The alias dictionary joins as `BroadcastHashJoin BuildRight` — the "
        "mention stream (big side) never shuffles for the join. The "
        "aggregations show partial→Exchange→final HashAggregate pairs "
        "(map-side combine)."
    ),
    "kg_skew_twophase": (
        "Hot-predicate counting: phase-1 `HashAggregate` keyed by "
        "(pred, salt) spreads one hot key over 16 reducers before the tiny "
        "phase-2 merge — the explicit skew treatment AQE cannot apply to "
        "aggregations."
    ),
    "dedup_minhash_lsh": (
        "LSH near-dup: one shuffle builds signatures+shingle sets "
        "(12 partial `min` aggregates, map-side combined), the band "
        "self-join is hash-partitioned on the digest (bucket-local), and "
        "exact-Jaccard verification joins shingle sets back to the deduped "
        "candidate pairs only — candidate-proportional, never O(n²)."
    ),
    "ann_cosine_topk": (
        "Brute-force cosine: probes broadcast (`BroadcastNestedLoopJoin`/"
        "`BroadcastHashJoin` depending on the predicate), dot products run "
        "as codegen'd higher-order functions, ranking is one window per "
        "probe partition."
    ),
    "cluster_kmeans": (
        "Integer k-means assignment: the centroid set folds into ONE "
        "single-row array that broadcast-cross-joins onto the corpus "
        "(`BroadcastNestedLoopJoin` with a 1-row build side), and the "
        "argmin is an `array_min` projection — the corpus reaches its "
        "cluster id with NO exchange keyed on the vector id. The one "
        "shuffle per refinement is the (cluster, dim) partial-sum "
        "aggregation: k×dims groups, map-side combined."
    ),
    "text_topk_ngrams": (
        "Corpus top-k n-grams: explode → `HashAggregate` partial/final "
        "pair (a hot n-gram ships one partial row per task), then "
        "`TakeOrderedAndProject` — each partition keeps its local k and "
        "the driver merges k×partitions rows. No global sort anywhere."
    ),
    "map_apply_upsert": (
        "Semantic MERGE (UPSERT): the batch collapses to one row per key "
        "via map-side-combinable `max_by` partials (`HashAggregate` "
        "partial→Exchange→final), then ONE key join against the table. "
        "UPSERT is a full-outer join — not broadcastable by definition in "
        "Spark, so both sides exchange on the key; UPDATE/DELETE applies "
        "broadcast the small batch (AQE, asserted in "
        "tests/test_merge.py::test_apply_join_broadcasts_small_batch). No "
        "windows (a per-key window would sort the table), no driver state."
    ),
    "map_apply_delete": (
        "Semantic DELETE: distinct batch keys anti-join the table "
        "(`LeftAnti`). The batch is the small side — AQE broadcasts it at "
        "runtime size, so the table never shuffles for the delete."
    ),
    "dedup_embedding_lsh": (
        "Multiprobe sign-sketch near-dup, single-exchange form (r5): the "
        "banded keys + their single-bit flips are posexploded BELOW one "
        "`repartition(band, key)` and the relation is materialized, so the "
        "plan shows both self-join sides as `Scan ExistingRDD` over the "
        "SAME computed relation — the (interpreted, dominant-cost) sketch "
        "pass ran once and the candidate stream shuffled once at (bits+1)× "
        "tiny rows, vs the r4 chain of two exchanges. Hyperplane weights "
        "are literal arrays (driver-precomputed md5, bit-identical), and "
        "the verify join reads per-vector norms computed once in the "
        "projection, not per candidate pair."
    ),
    "kg_canonicalize_cc": (
        "Canonicalization via min-label connected components: the final "
        "plan joins doc ids against the materialized component labels "
        "(`Scan ExistingRDD` — each CC round is lineage-cut through "
        "`materialize()`, reliable `checkpoint()` iff a checkpoint dir is "
        "configured, tests/test_checkpointing.py). Per-round shape: one "
        "edge-label join + one `min` aggregation, probe reads the round's "
        "own cached `_chg` flag. `algorithm='auto'` caps min-label at 12 "
        "rounds and falls back to large/small-star (ConvergenceError), so "
        "dedup-shaped graphs get O(diameter) rounds and chain-shaped "
        "graphs get O(log² n)."
    ),
}


def main() -> None:
    from nebula_importer_spark.contract import QUERIES
    from nebula_importer_spark.session import get_spark

    spark = get_spark(app_name="plan-dump", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = "/root/testdata/sf0.01"

    out = [
        "# PLANS — physical plans of key queries (`.explain(\"formatted\")`)\n",
        "Generated by `tools/dump_plans.py` at sf0.01. What to look for per",
        "plan is noted above each; the goal is scan pruning, broadcast where",
        "a side is small, partial aggregation before every exchange, and",
        "whole-stage codegen everywhere in the row path.\n",
    ]
    for name, note in COMMENTARY.items():
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        # keep the operator tree + scan details; drop verbose per-node dumps
        tree, _, details = plan.partition("\n\n")
        keep_details = "\n".join(
            line for line in details.splitlines()
            if line.startswith(("(1)", "Output", "ReadSchema", "PushedFilters", "Location"))
        )
        out.append(f"## {name}\n\n{note}\n\n```\n{tree}\n{keep_details}\n```\n")

    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    spark.stop()
    print("PLANS.md written")


if __name__ == "__main__":
    main()
