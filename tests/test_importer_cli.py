"""Config-driven one-call import + CLI, replaying the reference CLI's own
e2e fixture (``/root/reference/pkg/cmd/testdata/nebula-importer.v3.yaml`` +
node1/edge1 CSVs — ``pkg/cmd/nebula-importer_test.go:42-67``)."""

from __future__ import annotations

import shutil

import pytest

from nebula_importer_spark.pipeline.importer import import_config

REF_DIR = "/root/reference/pkg/cmd/testdata"


@pytest.fixture()
def fixture_dir(tmp_path):
    """Copy the reference fixture into a writable dir (reference is RO)."""
    for f in ("nebula-importer.v3.yaml", "node1.csv", "edge1.csv"):
        shutil.copy(f"{REF_DIR}/{f}", tmp_path / f)
    return str(tmp_path)


def test_import_config_replays_reference_e2e_fixture(spark, fixture_dir):
    result = import_config(
        spark,
        f"{fixture_dir}/nebula-importer.v3.yaml",
        base_dir=fixture_dir,
    )
    # 3 sources: node1.csv(2 tags), edge1.csv(2 edges), node1.csv(2 tags+2 edges)
    assert [(s.kind, s.name) for s in result.specs] == [
        ("tag", "node1"), ("tag", "node2"),
        ("edge", "edge1"), ("edge", "edge2"),
        ("tag", "node1"), ("tag", "node2"),
        ("edge", "edge1"), ("edge", "edge2"),
    ]
    # every spec maps the single CSV record into one batch statement
    assert all(s.n_records == 1 and s.n_statements == 1 for s in result.specs)

    by_pos = [r.statement for s in result.specs for r in s.statements.collect()]
    # node1.csv: 1,a,2,3.3 (INT vid, STRING/int/Double props — node.go golden)
    assert by_pos[0] == (
        'INSERT VERTEX IGNORE_EXISTED_INDEX `node1`(`prop1`, `prop2`, `prop3`) '
        'VALUES 1:("a", 2, 3.3)'
    )
    assert by_pos[1].startswith("INSERT VERTEX IGNORE_EXISTED_INDEX `node2`")
    # edge1.csv: 1,1,x
    assert by_pos[2] == (
        'INSERT EDGE IGNORE_EXISTED_INDEX `edge1`(`prop1`) VALUES 1->1:("x")'
    )
    # third source: same CSV mapped as prop-less edges too (src=1, dst="a"
    # is not a valid INT — the reference's row error path skips the record)
    assert result.specs[6].n_records in (0, 1)

    # hooks: statement1/statement2 are raw nGQL — recorded + skipped, never fatal
    assert [h.status for h in result.before_hooks] == ["skipped", "skipped"]
    assert result.after_hooks == []
    assert result.n_records >= 6


def test_import_config_writes_output_and_cli(spark, fixture_dir, tmp_path):
    out = str(tmp_path / "out")
    result = import_config(
        spark,
        f"{fixture_dir}/nebula-importer.v3.yaml",
        base_dir=fixture_dir,
        output_path=out,
    )
    first = result.specs[0]
    assert first.output_path == f"{out}/src0_tag_node1"
    got = spark.read.parquet(first.output_path).collect()
    assert got[0].statement.startswith("INSERT VERTEX")


def test_cli_main_json(fixture_dir, capsys):
    """The __main__ entry end-to-end (it owns its own Spark session)."""
    import json

    from nebula_importer_spark.__main__ import main

    rc = main(["-c", f"{fixture_dir}/nebula-importer.v3.yaml", "--json",
               "--master", "local[2]"])
    assert rc == 0
    line = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    payload = json.loads(line)
    assert payload["records"] >= 6
    assert len(payload["specs"]) == 8
    assert payload["before_hooks"] == ["skipped", "skipped"]
    # clean fixture: failure accounting present and zero
    assert payload["failed"] == 0
    assert all(s["failed"] == 0 for s in payload["sources"])


def test_cli_exits_nonzero_on_failed_rows(fixture_dir, capsys):
    """stats.IsFailed contract (pkg/cmd/nebula-importer.go:118-130): rows
    the reader drops must surface in the summary AND flip the exit code —
    the reference returns "failed to import" when any record failed."""
    import json

    from nebula_importer_spark.__main__ import main

    # node1.csv is 4 columns; a 2-field row and an over-long row are
    # malformed for the fixture schema and get dropped by DROPMALFORMED
    with open(f"{fixture_dir}/node1.csv", "a") as f:
        f.write("9,short\n10,a,2,3.3,extra,fields\n")
    rc = main(["-c", f"{fixture_dir}/nebula-importer.v3.yaml", "--json",
               "--master", "local[2]"])
    assert rc == 1
    out = capsys.readouterr()
    line = [l for l in out.out.splitlines() if l.startswith("{")][-1]
    payload = json.loads(line)
    # the fixture reads node1.csv as TWO of its three sources: 2 dropped
    # rows are charged to each read, exactly like the reference's per-source
    # reader stats
    node_sources = [s for s in payload["sources"] if "node1.csv" in s["source"]]
    assert len(node_sources) == 2
    assert all(s["failed"] == 2 for s in node_sources)
    assert payload["failed"] == 4
    assert "failed to import" in out.err
