"""Before/after DDL hooks on the pipeline (O3 analog, manager/hooks.go)."""

from __future__ import annotations

from nebula_importer_spark.pipeline.corpus import synthetic_corpus
from nebula_importer_spark.pipeline.run import run_pipeline


def test_hooks_run_in_order(spark):
    corpus = synthetic_corpus(spark, 10, seed=3, partitions=2)
    run_pipeline(
        spark,
        corpus,
        before_hooks=[
            "CREATE OR REPLACE TEMP VIEW hook_marker AS SELECT 'before' AS phase"
        ],
        after_hooks=[
            "CREATE OR REPLACE TEMP VIEW hook_marker AS SELECT 'after' AS phase"
        ],
    )
    assert spark.table("hook_marker").collect()[0].phase == "after"


def test_ngql_colliding_hooks_skip_not_abort(spark, tmp_path):
    """nGQL heads that also parse as Spark SQL (USE <space>, SHOW HOSTS,
    DESC …) fail ANALYSIS, not parsing; they must be recorded + skipped so a
    migrating user's reference config keeps running (ADVICE r4). Statement
    heads outside the collision set still abort on analysis failure."""
    import pytest

    from nebula_importer_spark.pipeline.importer import import_config

    (tmp_path / "n.csv").write_text("1,a\n")
    cfg = (
        "manager:\n  spaceName: t\n"
        "  hooks:\n    before:\n      - statements:\n"
        "          - USE basketballplayer\n"
        "          - DESC nonexistent_space_object\n"
        "sources:\n"
        "  - path: ./n.csv\n"
        "    tags:\n"
        "      - name: person\n"
        "        id: {type: \"INT\", index: 0}\n"
        "        props:\n"
        "          - {name: \"name\", type: \"STRING\", index: 1}\n"
    )
    (tmp_path / "c.yaml").write_text(cfg)
    result = import_config(spark, str(tmp_path / "c.yaml"), base_dir=str(tmp_path))
    assert [h.status for h in result.before_hooks] == ["skipped", "skipped"]
    assert all(h.error == "AnalysisException" for h in result.before_hooks)
    assert result.specs[0].n_records == 1

    # a genuinely-Spark-SQL hook over a missing table still aborts
    bad = cfg.replace(
        "          - USE basketballplayer\n"
        "          - DESC nonexistent_space_object\n",
        "          - SELECT * FROM definitely_missing_table\n",
    )
    (tmp_path / "bad.yaml").write_text(bad)
    with pytest.raises(Exception) as ei:
        import_config(spark, str(tmp_path / "bad.yaml"), base_dir=str(tmp_path))
    assert "AnalysisException" in type(ei.value).__name__
