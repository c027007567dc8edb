"""Semantic mutation apply (operators/merge.py) — golden vs sequential
statement execution.

The golden model is what the reference's rendered statements would leave in
the store when executed one by one (``pkg/spec/v3/node_test.go:377-384``
UPDATE, ``node_test.go:531-577`` DELETE, ``edge_test.go:857-864,1454`` edge
forms; modes ``pkg/spec/base/mode.go:5-11``): a tiny driver-side interpreter
applies the batch sequentially to a dict-store, and ``apply_mutations`` must
produce the identical table for every mode.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from nebula_importer_spark.operators.merge import apply_mutations

BASE = [
    (1, "alice", 100),
    (2, "bob", 200),
    (3, "carol", 300),
]
# (vid, name, score, seq): NULL prop = "not set by this mutation"
BATCH = [
    (2, None, 250, 10),
    (4, "dave", 400, 30),
    (2, "bobby", None, 20),
    (2, None, 260, 5),
    (5, None, 500, 40),
]


def sequential_apply(base, batch, mode):
    """Reference-semantics interpreter: statements run in seq order."""
    store = {vid: {"name": n, "score": s} for vid, n, s in base}
    for vid, name, score, _ in sorted(batch, key=lambda r: r[3]):
        sets = {k: v for k, v in (("name", name), ("score", score)) if v is not None}
        if mode == "DELETE":
            store.pop(vid, None)
        elif mode == "INSERT":
            # INSERT VERTEX replaces the whole prop list (unset -> NULL)
            store[vid] = {"name": name, "score": score}
        elif mode == "UPDATE":
            if vid in store:
                store[vid].update(sets)
        elif mode == "UPSERT":
            if vid in store:
                store[vid].update(sets)
            else:
                store[vid] = {"name": name, "score": score}
    return sorted(
        (vid, p["name"], p["score"]) for vid, p in store.items()
    )


def _spark_apply(spark, mode):
    table = spark.createDataFrame(BASE, "vid int, name string, score int")
    batch = spark.createDataFrame(
        BATCH, "vid int, name string, score int, seq int"
    )
    out = apply_mutations(table, batch, mode, key_cols=["vid"], seq_col="seq")
    assert out.columns == table.columns
    return sorted(tuple(r) for r in out.collect())


@pytest.mark.parametrize("mode", ["INSERT", "UPDATE", "UPSERT", "DELETE"])
def test_modes_match_sequential_execution(spark, mode):
    assert _spark_apply(spark, mode) == sequential_apply(BASE, BATCH, mode)


def test_default_mode_is_upsert(spark):
    """mode.go:5-11 — the fork's DefaultMode is UPSERT."""
    table = spark.createDataFrame(BASE, "vid int, name string, score int")
    batch = spark.createDataFrame(BATCH, "vid int, name string, score int, seq int")
    got = apply_mutations(table, batch, key_cols=["vid"], seq_col="seq")
    want = apply_mutations(table, batch, "UPSERT", key_cols=["vid"], seq_col="seq")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_edge_key_includes_rank(spark):
    """Edge mutations key on (src, dst, rank) — same rank overwritten,
    different rank is a distinct edge (reference G4/G8 rank semantics)."""
    table = spark.createDataFrame(
        [("a", "b", 0, 10), ("a", "b", 1, 11)], "src string, dst string, rank int, w int"
    )
    batch = spark.createDataFrame(
        [("a", "b", 1, 99, 1), ("a", "c", 0, 7, 2)],
        "src string, dst string, rank int, w int, seq int",
    )
    out = apply_mutations(
        table, batch, "UPSERT", key_cols=["src", "dst", "rank"], seq_col="seq"
    )
    assert sorted(map(tuple, out.collect())) == [
        ("a", "b", 0, 10), ("a", "b", 1, 99), ("a", "c", 0, 7),
    ]


def test_batch_missing_prop_column_treated_unset(spark):
    table = spark.createDataFrame(BASE, "vid int, name string, score int")
    batch = spark.createDataFrame([(2, 999)], "vid int, score int")
    out = apply_mutations(table, batch, "UPSERT", key_cols=["vid"])
    assert sorted(map(tuple, out.collect())) == [
        (1, "alice", 100), (2, "bob", 999), (3, "carol", 300),
    ]


def test_update_drops_unmatched_keys(spark):
    table = spark.createDataFrame(BASE, "vid int, name string, score int")
    batch = spark.createDataFrame([(9, "zed", 1, 1)], "vid int, name string, score int, seq int")
    out = apply_mutations(table, batch, "UPDATE", key_cols=["vid"], seq_col="seq")
    assert out.count() == 3


def test_bad_mode_and_missing_key_raise(spark):
    table = spark.createDataFrame(BASE, "vid int, name string, score int")
    batch = spark.createDataFrame([(1, "x", 1, 1)], "vid int, name string, score int, seq int")
    with pytest.raises(ValueError, match="mode"):
        apply_mutations(table, batch, "REPLACE", key_cols=["vid"])
    with pytest.raises(ValueError, match="key"):
        apply_mutations(table, batch, "UPSERT", key_cols=["nope"])


def test_idempotent_reapply(spark):
    """Applying the same UPSERT batch twice converges (resume semantics —
    the same property the lineage/checkpoint contract relies on)."""
    table = spark.createDataFrame(BASE, "vid int, name string, score int")
    batch = spark.createDataFrame(BATCH, "vid int, name string, score int, seq int")
    once = apply_mutations(table, batch, "UPSERT", key_cols=["vid"], seq_col="seq")
    twice = apply_mutations(once, batch, "UPSERT", key_cols=["vid"], seq_col="seq")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_seq_none_duplicate_keys_raise(spark):
    """seq_col=None requires a key-unique batch: there is no deterministic
    "last" mutation without an order, and duplicate keys would silently
    multiply rows through the join (ADVICE r4)."""
    table = spark.createDataFrame(BASE, "vid int, name string, score int")
    dup = spark.createDataFrame(
        [(2, "x", 1), (2, "y", 2)], "vid int, name string, score int"
    )
    for mode in ("INSERT", "UPDATE", "UPSERT"):
        with pytest.raises(ValueError, match="key-unique"):
            apply_mutations(table, dup, mode, key_cols=["vid"])
    # DELETE is key-idempotent: duplicates are fine
    out = apply_mutations(table, dup, "DELETE", key_cols=["vid"])
    assert sorted(r.vid for r in out.collect()) == [1, 3]


def test_unmatched_update_rows_counts_drops(spark):
    """UPDATE-dropped rows are countable for the failure contract: the
    reference surfaces each missing-key UPDATE as a failed statement
    (pkg/importer/importer.go:110-128)."""
    from nebula_importer_spark.operators.merge import unmatched_update_rows

    table = spark.createDataFrame(BASE, "vid int, name string, score int")
    batch = spark.createDataFrame(
        [(2, "x", 1, 1), (99, "ghost", 0, 2), (99, "ghost2", 0, 3)],
        "vid int, name string, score int, seq int",
    )
    dropped = unmatched_update_rows(table, batch, ["vid"])
    assert dropped.count() == 2  # batch ROWS, not distinct keys
    assert {r.vid for r in dropped.collect()} == {99}


def test_apply_join_broadcasts_small_batch(spark):
    """A small mutation batch against a big table must broadcast: AQE picks
    BroadcastHashJoin from runtime sizes (no forced hint in merge.py — an
    initial-load batch can be table-sized). UPDATE (left join, batch right)
    and DELETE (left_anti) are the broadcastable shapes; UPSERT's full-outer
    join cannot use broadcast-hash in Spark by definition and legitimately
    exchanges both sides."""
    table = spark.range(0, 50_000).selectExpr(
        "cast(id as string) vid", "cast(id % 97 as string) name"
    )
    batch = spark.createDataFrame(
        [(str(i), f"n{i}", i) for i in range(8)], "vid string, name string, seq long"
    )
    for mode in ("UPDATE", "DELETE"):
        out = apply_mutations(table, batch, mode, key_cols=["vid"], seq_col="seq")
        # collect() executes the DataFrame's OWN QueryExecution, so the
        # adaptive final plan is inspectable afterwards (a write spawns a
        # separate execution and leaves this one isFinalPlan=false)
        assert len(out.collect()) == 50_000 - (8 if mode == "DELETE" else 0)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "BroadcastHashJoin" in plan, f"{mode} apply did not broadcast:\n{plan}"
