"""Statement-text goldens, ported from the reference's unit tests:
/root/reference/pkg/spec/v3/node_test.go and edge_test.go (byte-equal).
"""

from __future__ import annotations

import pytest

from nebula_importer_spark.operators.mapping import edge_values, node_values
from nebula_importer_spark.operators.statements import assemble_statements
from nebula_importer_spark.plans.specs import (
    EdgeSpec,
    NodeIDSpec,
    NodeSpec,
    PropSpec,
    RankSpec,
)

from tests.conftest import records_df


def render(spark, spec, records, batch=128):
    df = records_df(spark, records).coalesce(1)
    values = node_values(df, spec) if isinstance(spec, NodeSpec) else edge_values(df, spec)
    rows = assemble_statements(values, spec, batch=batch).collect()
    return [(r.statement, r.n_records) for r in rows]


def render_one(spark, spec, records, batch=128):
    out = render(spark, spec, records, batch)
    if not out:
        return "", 0
    assert len(out) == 1
    return out[0]


# ---------------------------------------------------------------- nodes

def test_insert_node_no_props(spark):
    spec = NodeSpec("name", id=NodeIDSpec(type="INT", index=0))
    stmt, n = render_one(spark, spec, [["1", "1.1", "str1"]])
    assert (stmt, n) == ("INSERT VERTEX IGNORE_EXISTED_INDEX `name`() VALUES 1:()", 1)
    stmt, n = render_one(spark, spec, [["1", "1.1", "str1"], ["2", "2.2", "str2"]])
    assert (stmt, n) == ("INSERT VERTEX IGNORE_EXISTED_INDEX `name`() VALUES 1:(), 2:()", 2)


def test_insert_node_one_prop(spark):
    spec = NodeSpec(
        "name",
        id=NodeIDSpec(type="INT", index=0),
        props=[PropSpec("prop1", type="STRING", index=2)],
    )
    stmt, n = render_one(spark, spec, [["1", "1.1", "str1"]])
    assert (stmt, n) == (
        'INSERT VERTEX IGNORE_EXISTED_INDEX `name`(`prop1`) VALUES 1:("str1")',
        1,
    )


def test_insert_node_many_props(spark):
    # node_test.go:236-243
    spec = NodeSpec(
        "name",
        id=NodeIDSpec(type="INT", index=0),
        props=[
            PropSpec("prop1", type="STRING", index=2),
            PropSpec("prop2", type="DOUBLE", index=1),
        ],
        mode="INSERT",
    )
    stmt, n = render_one(spark, spec, [["1", "1.1", "str1"], ["2", "2.2", "str2"]])
    assert (stmt, n) == (
        'INSERT VERTEX IGNORE_EXISTED_INDEX `name`(`prop1`, `prop2`) VALUES 1:("str1", 1.1), 2:("str2", 2.2)',
        2,
    )


def test_insert_node_ignore_existed_index_false(spark):
    spec = NodeSpec("name", id=NodeIDSpec(type="INT", index=0), ignore_existed_index=False)
    stmt, n = render_one(spark, spec, [["1"]])
    assert (stmt, n) == ("INSERT VERTEX `name`() VALUES 1:()", 1)


def test_insert_node_if_not_exists(spark):
    spec = NodeSpec(
        "name",
        id=NodeIDSpec(type="INT", index=0),
        ignore_existed_index=False,
        ignore_existed_record=True,
    )
    stmt, _ = render_one(spark, spec, [["1"]])
    assert stmt == "INSERT VERTEX IF NOT EXISTS `name`() VALUES 1:()"


def test_insert_node_filter(spark):
    # node_test.go:313-360
    spec = NodeSpec(
        "name",
        id=NodeIDSpec(type="INT", index=0),
        props=[PropSpec("prop1", type="STRING", index=1)],
        filter='(Record[0] == "1" or Record[0] == "2" or Record[0] == "3") and Record[1] != "A"',
    )
    stmt, n = render_one(spark, spec, [["1", "B"], ["2", "C"], ["3", "D"]])
    assert (stmt, n) == (
        'INSERT VERTEX IGNORE_EXISTED_INDEX `name`(`prop1`) VALUES 1:("B"), 2:("C"), 3:("D")',
        3,
    )
    stmt, n = render_one(spark, spec, [["2", "A"], ["3", "D"], ["4", "E"]])
    assert (stmt, n) == ('INSERT VERTEX IGNORE_EXISTED_INDEX `name`(`prop1`) VALUES 3:("D")', 1)
    out = render(spark, spec, [["1", "A"], ["2", "A"], ["4", "E"]])
    assert out == []


def test_update_node(spark):
    # node_test.go:370-384
    spec = NodeSpec(
        "name",
        id=NodeIDSpec(type="INT", index=0),
        props=[PropSpec("prop1", type="STRING", index=2)],
        mode="UPDATE",
    )
    stmt, n = render_one(spark, spec, [["1", "1.1", "str1"]])
    assert (stmt, n) == ('UPDATE VERTEX ON `name` 1 SET `prop1` = "str1";', 1)
    stmt, n = render_one(spark, spec, [["1", "1.1", "str1"], ["2", "2.2", "str2"]])
    assert (stmt, n) == (
        'UPDATE VERTEX ON `name` 1 SET `prop1` = "str1";UPDATE VERTEX ON `name` 2 SET `prop1` = "str2";',
        2,
    )


def test_upsert_node_many_props(spark):
    spec = NodeSpec(
        "name",
        id=NodeIDSpec(type="INT", index=0),
        props=[
            PropSpec("prop1", type="STRING", index=2),
            PropSpec("prop2", type="DOUBLE", index=1),
        ],
        mode="UPSERT",
    )
    stmt, n = render_one(spark, spec, [["1", "1.1", "str1"]])
    assert (stmt, n) == ('UPSERT VERTEX ON `name` 1 SET `prop1` = "str1", `prop2` = 1.1;', 1)


def test_delete_node(spark):
    # node_test.go:531-577
    spec = NodeSpec("name", id=NodeIDSpec(type="INT", index=0), mode="DELETE")
    stmt, n = render_one(spark, spec, [["1"], ["2"]])
    assert (stmt, n) == ("DELETE TAG `name` FROM 1;DELETE TAG `name` FROM 2;", 2)


def test_node_string_vid(spark):
    spec = NodeSpec("name", id=NodeIDSpec(type="STRING", index=0), mode="DELETE")
    stmt, n = render_one(spark, spec, [["id1"]])
    assert (stmt, n) == ('DELETE TAG `name` FROM "id1";', 1)


# ---------------------------------------------------------------- edges

EDGE_INT_STR = dict(
    src=NodeIDSpec(type="INT", index=0),
    dst=NodeIDSpec(type="STRING", index=1),
)


def make_edge(**kw):
    base = dict(
        src=NodeIDSpec(type="INT", index=0),
        dst=NodeIDSpec(type="STRING", index=1),
    )
    base.update(kw)
    return EdgeSpec("name", **base)


def test_insert_edge_no_props(spark):
    # edge_test.go:360-373
    spec = make_edge()
    stmt, n = render_one(spark, spec, [["1", "id1", "1.1", "str1"]])
    assert (stmt, n) == ('INSERT EDGE IGNORE_EXISTED_INDEX `name`() VALUES 1->"id1":()', 1)
    stmt, n = render_one(
        spark, spec, [["1", "id1", "1.1", "str1"], ["2", "id2", "2.2", "str2"]]
    )
    assert (stmt, n) == (
        'INSERT EDGE IGNORE_EXISTED_INDEX `name`() VALUES 1->"id1":(), 2->"id2":()',
        2,
    )


def test_insert_edge_props(spark):
    # edge_test.go:490-505
    spec = make_edge(
        props=[
            PropSpec("prop1", type="STRING", index=3),
            PropSpec("prop2", type="DOUBLE", index=2),
        ]
    )
    stmt, n = render_one(
        spark, spec, [["1", "id1", "1.1", "str1"], ["2", "id2", "2.2", "str2"]]
    )
    assert (stmt, n) == (
        'INSERT EDGE IGNORE_EXISTED_INDEX `name`(`prop1`, `prop2`) VALUES 1->"id1":("str1", 1.1), 2->"id2":("str2", 2.2)',
        2,
    )


def test_insert_edge_rank(spark):
    # edge_test.go:561-576
    spec = make_edge(
        rank=RankSpec(index=0),
        props=[
            PropSpec("prop1", type="STRING", index=3),
            PropSpec("prop2", type="DOUBLE", index=2),
        ],
    )
    stmt, n = render_one(
        spark, spec, [["1", "id1", "1.1", "str1"], ["2", "id2", "2.2", "str2"]]
    )
    assert (stmt, n) == (
        'INSERT EDGE IGNORE_EXISTED_INDEX `name`(`prop1`, `prop2`) VALUES 1->"id1"@1:("str1", 1.1), 2->"id2"@2:("str2", 2.2)',
        2,
    )


def test_insert_edge_ignore_existed_index_false(spark):
    # edge_test.go:641
    spec = make_edge(ignore_existed_index=False)
    stmt, _ = render_one(spark, spec, [["1", "id1"]])
    assert stmt == 'INSERT EDGE `name`() VALUES 1->"id1":()'


def test_insert_edge_filter_rank(spark):
    # edge_test.go:770-816
    spec = make_edge(
        rank=RankSpec(index=0),
        props=[PropSpec("prop1", type="STRING", index=1)],
        filter='(Record[0] == "1" or Record[0] == "2" or Record[0] == "3") and Record[1] != "A"',
    )
    stmt, n = render_one(spark, spec, [["1", "B"], ["2", "C"], ["3", "D"]])
    assert (stmt, n) == (
        'INSERT EDGE IGNORE_EXISTED_INDEX `name`(`prop1`) VALUES 1->"B"@1:("B"), 2->"C"@2:("C"), 3->"D"@3:("D")',
        3,
    )
    stmt, n = render_one(spark, spec, [["2", "A"], ["3", "D"], ["4", "E"]])
    assert (stmt, n) == (
        'INSERT EDGE IGNORE_EXISTED_INDEX `name`(`prop1`) VALUES 3->"D"@3:("D")',
        1,
    )


def test_update_edge(spark):
    # edge_test.go:849-864, 990-1007
    spec = make_edge(props=[PropSpec("prop1", type="STRING", index=3)])
    spec.mode = "UPDATE"
    stmt, n = render_one(
        spark, spec, [["1", "id1", "1.1", "str1"], ["2", "id2", "2.2", "str2"]]
    )
    assert (stmt, n) == (
        'UPDATE EDGE ON `name` 1->"id1" SET `prop1` = "str1";UPDATE EDGE ON `name` 2->"id2" SET `prop1` = "str2";',
        2,
    )


def test_update_edge_rank_two_props(spark):
    spec = make_edge(
        rank=RankSpec(index=0),
        props=[
            PropSpec("prop1", type="STRING", index=3),
            PropSpec("prop2", type="DOUBLE", index=2),
        ],
    )
    spec.mode = "UPDATE"
    stmt, n = render_one(spark, spec, [["1", "id1", "1.1", "str1"]])
    assert (stmt, n) == (
        'UPDATE EDGE ON `name` 1->"id1"@1 SET `prop1` = "str1", `prop2` = 1.1;',
        1,
    )


def test_delete_edge(spark):
    # edge_test.go:1225-1232, 1351-1358, 1454
    spec = make_edge(mode="DELETE")
    stmt, n = render_one(spark, spec, [["1", "id1"], ["2", "id2"]])
    assert (stmt, n) == ('DELETE EDGE `name` 1->"id1", 2->"id2"', 2)

    spec = make_edge(mode="DELETE", rank=RankSpec(index=0))
    stmt, n = render_one(spark, spec, [["1", "id1"], ["2", "id2"]])
    assert (stmt, n) == ('DELETE EDGE `name` 1->"id1"@1, 2->"id2"@2', 2)


def test_delete_edge_filter(spark):
    # edge_test.go:1427-1472
    spec = make_edge(
        mode="DELETE",
        filter='(Record[0] == "1" or Record[0] == "2" or Record[0] == "3") and Record[1] != "A"',
    )
    stmt, n = render_one(spark, spec, [["1", "B"], ["2", "C"], ["3", "D"]])
    assert (stmt, n) == ('DELETE EDGE `name` 1->"B", 2->"C", 3->"D"', 3)
    stmt, n = render_one(spark, spec, [["2", "A"], ["3", "D"], ["4", "E"]])
    assert (stmt, n) == ('DELETE EDGE `name` 3->"D"', 1)
    assert render(spark, spec, [["1", "A"], ["2", "A"], ["4", "E"]]) == []


# ------------------------------------------------------------- batching

def test_batch_splitting(spark):
    # manager re-chunks into ≤batch sub-slices (manager.go:377-407)
    spec = NodeSpec("name", id=NodeIDSpec(type="INT", index=0))
    records = [[str(i)] for i in range(5)]
    out = render(spark, spec, records, batch=2)
    assert [n for _, n in out] == [2, 2, 1]
    assert out[0][0] == "INSERT VERTEX IGNORE_EXISTED_INDEX `name`() VALUES 0:(), 1:()"
    assert out[2][0] == "INSERT VERTEX IGNORE_EXISTED_INDEX `name`() VALUES 4:()"
