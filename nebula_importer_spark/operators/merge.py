"""Semantic mutation apply: the post-state of an INSERT/UPDATE/UPSERT/DELETE
batch against a materialized vertex/edge table.

The reference *executes* its rendered statements against a live NebulaGraph
store (``/root/reference/pkg/importer/importer.go:100-143``), so a user's
second (incremental) run mutates what the first run wrote — and the fork's
default mode is UPSERT (``pkg/spec/base/mode.go:5-11``). This engine renders
byte-exact statement text (oracle-verified) and materializes tables; what was
missing (VERDICT r3 "What's missing" #1) is the operator that applies a
mutation batch to an existing table — SURVEY.md §2.3 maps the reference's
G2/G3/G5/G6 mutation statements to exactly this (``MERGE INTO`` on Iceberg).

Statement semantics being replicated (pinned by the reference's own
statement tests — ``pkg/spec/v3/node_test.go:377-384`` UPDATE,
``node_test.go:531-577`` DELETE, ``edge_test.go:857-864,1454`` edge
UPDATE/DELETE — executed sequentially per batch, later statements win):

* INSERT  — Nebula ``INSERT VERTEX/EDGE`` overwrites the whole prop list of
  an existing key and creates missing keys: last full row per key wins.
* UPDATE  — ``UPDATE ... SET p = v`` mutates EXISTING keys only; a batch row
  whose key is absent from the table is dropped (the statement would error
  server-side; a batch apply keeps the table rows it cannot match).
* UPSERT  — ``UPSERT ... SET p = v``: update existing keys, create missing
  ones (unset props of created rows are NULL).
* DELETE  — ``DELETE TAG/EDGE``: remove the key's row.

Prop-level NULL in an UPDATE/UPSERT batch means "not set by this mutation"
(the renderer omits guard-failed props from the SET clause — P9 prop-expr
guards — and the CSV path never renders an explicit SET-to-NULL), so the
existing value is retained per prop; INSERT mode replaces the entire row,
NULLs included.

Ordering: Nebula applies a batch in statement order. A distributed apply
needs that order made explicit — ``seq_col`` names a monotonically
increasing column (record index, source offset, orderkey…); per key the
winning value of each prop is the one set by the HIGHEST seq (per prop,
because two mutations of the same key may set disjoint props). With
``seq_col=None`` the batch must be key-unique — there is no deterministic
"last" without an order.

Scale notes (100 TB): one shuffle each side on the key columns — the
standard MERGE plan. The batch is usually ≪ the table, so AQE picks a
broadcast join at runtime (no forced hint — an initial-load "batch" can be
table-sized). Map-side combinable ``max_by`` partials collapse the batch
before the join. No driver-side state, no windows (a per-key window would
sort the table; the groupBy + join does not).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MODES = ("INSERT", "UPDATE", "UPSERT", "DELETE")


def unmatched_update_rows(
    table: DataFrame, batch: DataFrame, key_cols: Sequence[str]
) -> DataFrame:
    """Batch rows an UPDATE-mode apply drops: keys absent from the table.

    The reference surfaces each such statement as a server-side error and
    counts it failed (``pkg/importer/importer.go:110-128``: a non-succeeded
    execution increments the failed stats); a batch apply keeps the table
    consistent by dropping the row instead, so the DROP COUNT must flow into
    the import's failure accounting (``ImportResult.n_failed``) for the CLI
    exit contract to match. One anti-join on the key columns; counted only
    on the UPDATE path.
    """
    key_cols = list(key_cols)
    return batch.join(table.select(*key_cols), key_cols, "left_anti")


def _normalize_batch(
    batch: DataFrame,
    key_cols: Sequence[str],
    prop_cols: Sequence[str],
    seq_col: Optional[str],
    whole_row: bool,
) -> DataFrame:
    """One row per key: the batch's net effect in statement order.

    ``whole_row=True`` (INSERT) keeps the complete highest-seq row;
    otherwise each prop independently takes its latest NON-NULL value
    (sequential ``SET`` statements touch disjoint prop subsets).
    """
    if seq_col is None:
        return batch.select(*key_cols, *prop_cols)
    if whole_row:
        aggs = [
            F.max_by(F.col(c), F.col(seq_col)).alias(c) for c in prop_cols
        ]
    else:
        aggs = [
            F.max_by(
                F.col(c),
                F.when(F.col(c).isNotNull(), F.col(seq_col)),
            ).alias(c)
            for c in prop_cols
        ]
    return batch.groupBy(*key_cols).agg(*aggs)


def apply_mutations(
    table: DataFrame,
    batch: DataFrame,
    mode: str = "UPSERT",
    key_cols: Sequence[str] = ("vid",),
    seq_col: Optional[str] = None,
) -> DataFrame:
    """Post-state of ``table`` after applying the mutation ``batch``.

    ``table`` is the materialized vertex/edge table (key columns + prop
    columns); ``batch`` carries the same key columns, any subset of the
    prop columns (missing ones are treated as never-set), and optionally
    ``seq_col``. ``mode`` is the reference's per-spec mode
    (``pkg/spec/base/mode.go:5-11``; default UPSERT = the fork's default).
    Returns a DataFrame with exactly ``table``'s columns.

    Vertex tables: ``key_cols=("vid",)``; edge tables:
    ``key_cols=("src", "dst", "rank")`` — rank is part of the edge key
    (SURVEY §1.3 / reference G4).
    """
    mode = (mode or "UPSERT").upper()
    if mode not in MODES:
        raise ValueError(f"mode must be one of {MODES}, got {mode!r}")
    key_cols = list(key_cols)
    missing = [k for k in key_cols if k not in batch.columns]
    if missing:
        raise ValueError(f"batch lacks key columns {missing}")
    prop_cols = [c for c in table.columns if c not in key_cols]

    if seq_col is None and mode != "DELETE":
        # Without an order column there is no deterministic "last" mutation
        # per key: duplicate keys would silently multiply rows through the
        # join (UPDATE/UPSERT) or both land in the INSERT union. Enforce the
        # documented key-unique contract eagerly — one small aggregate job,
        # paid only on this convenience path (the importer always passes
        # seq_col). DELETE is key-idempotent and exempt.
        dup = (
            batch.groupBy(*key_cols)
            .count()
            .where(F.col("count") > 1)
            .limit(1)
            .count()
        )
        if dup:
            raise ValueError(
                "apply_mutations(seq_col=None) requires a key-unique batch: "
                f"duplicate {key_cols} keys found — pass seq_col to define "
                "statement order"
            )

    if mode == "DELETE":
        keys = batch.select(*key_cols).dropDuplicates()
        return table.join(keys, key_cols, "left_anti").select(*table.columns)

    # align the batch to the table's prop schema: props the batch never
    # carries are "not set" (NULL) columns
    batch_props = [c for c in prop_cols if c in batch.columns]
    b = batch.select(
        *key_cols,
        *[F.col(c) for c in batch_props],
        *(() if seq_col is None else (F.col(seq_col),)),
    )
    for c in prop_cols:
        if c not in batch_props:
            b = b.withColumn(c, F.lit(None).cast(dict(table.dtypes)[c]))
    net = _normalize_batch(b, key_cols, prop_cols, seq_col, whole_row=(mode == "INSERT"))

    if mode == "INSERT":
        # whole-row replace + create: table rows not mutated, plus the
        # batch's last full row per key
        untouched = table.join(net.select(*key_cols), key_cols, "left_anti")
        return untouched.unionByName(net).select(*table.columns)

    t = table
    joined = t.join(
        net.select(
            *[F.col(k).alias(f"_b_{k}") for k in key_cols],
            *[F.col(c).alias(f"_b_{c}") for c in prop_cols],
        ),
        [F.col(k) == F.col(f"_b_{k}") for k in key_cols],
        "left" if mode == "UPDATE" else "full_outer",
    )
    out_keys = [
        F.coalesce(F.col(k), F.col(f"_b_{k}")).alias(k) for k in key_cols
    ]
    out_props = [
        F.coalesce(F.col(f"_b_{c}"), F.col(c)).alias(c) for c in prop_cols
    ]
    if mode == "UPDATE":
        # existing keys only: unmatched batch rows never joined (left),
        # matched rows take the batch's per-prop latest non-null
        return joined.select(
            *[F.col(k) for k in key_cols], *out_props
        ).select(*table.columns)
    # UPSERT: full outer — existing rows updated per prop, new keys created
    # with unset props NULL
    return joined.select(*out_keys, *out_props).select(*table.columns)
