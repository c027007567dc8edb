"""Prop-level expr guard on UPDATE/UPSERT (P9, fork-added).

Reference: ``pkg/spec/v3/prop.go:69-75,130-153`` — ``SetValue`` returns the
FULL ``convertedName + " = " + value`` clause and ``SetValueList`` binds the
guard env ``val`` to that whole string (NOT just the rendered value), so
``val != "NULL"`` is always true while ``val != "`p` = NULL"`` is the real
skip-NULL idiom; a false guard drops that SET clause only.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nebula_importer_spark.operators.mapping import node_values
from nebula_importer_spark.operators.statements import assemble_statements
from nebula_importer_spark.plans.specs import NodeIDSpec, NodeSpec, PropSpec
from tests.conftest import records_df


def _spec(expr: str | None) -> NodeSpec:
    return NodeSpec(
        name="name",
        id=NodeIDSpec(type="INT", index=0),
        props=[
            PropSpec("prop1", "STRING", 1),
            PropSpec("prop2", "STRING", 2, nullable=True, expr=expr),
        ],
        mode="UPDATE",
    )


def test_guard_drops_clause_when_false(spark):
    spec = _spec('val != "`prop2` = NULL"')
    df = records_df(spark, [["1", "str1", ""], ["2", "str2", "x"]])
    stmts = assemble_statements(node_values(df, spec), spec, batch=1)
    got = sorted(r.statement for r in stmts.collect())
    # row 1: prop2 null → clause is "`prop2` = NULL" → guard false → dropped
    assert got[0] == 'UPDATE VERTEX ON `name` 1 SET `prop1` = "str1";'
    assert got[1] == 'UPDATE VERTEX ON `name` 2 SET `prop1` = "str2", `prop2` = "x";'


def test_val_binds_to_whole_clause_not_value(spark):
    """Reference parity: env val == the clause string (SetValueList).

    ``val != "NULL"`` compares the CLAUSE to "NULL" — never equal, so the
    guard is always true and the NULL clause is KEPT (the reference behaves
    identically; a value-binding implementation would wrongly drop it).
    """
    spec = _spec('val != "NULL"')
    df = records_df(spark, [["1", "str1", ""]])
    stmts = assemble_statements(node_values(df, spec), spec, batch=1)
    got = [r.statement for r in stmts.collect()]
    assert got == ['UPDATE VERTEX ON `name` 1 SET `prop1` = "str1", `prop2` = NULL;']


def test_no_guard_keeps_null_clause(spark):
    spec = _spec(None)
    df = records_df(spark, [["1", "str1", ""]])
    stmts = assemble_statements(node_values(df, spec), spec, batch=1)
    got = [r.statement for r in stmts.collect()]
    assert got == ['UPDATE VERTEX ON `name` 1 SET `prop1` = "str1", `prop2` = NULL;']


def test_guard_on_clause_content(spark):
    spec = _spec('val in ["`prop2` = \\"keep\\""]')
    df = records_df(spark, [["1", "a", "keep"], ["2", "b", "drop"]])
    stmts = assemble_statements(node_values(df, spec), spec, batch=1)
    got = sorted(r.statement for r in stmts.collect())
    assert '`prop2` = "keep"' in got[0]
    assert "`prop2`" not in got[1]
