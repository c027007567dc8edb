"""spark-submit --py-files end-to-end: the north rule's launch shape.

Zips the package, submits ``tools/submit_pipeline.py`` to a
``local-cluster[2,1,*]`` master (two real Worker+Executor JVMs) with the
package supplied ONLY via ``--py-files`` — the exact cluster submission
shape BASELINE.json names — and checks the emitted triple count matches the
same seeded pipeline run in-process (cross-deployment determinism).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_DOCS = 1000


def _package_zip(dest_dir: str) -> str:
    zpath = os.path.join(dest_dir, "nebula_importer_spark.zip")
    pkg = os.path.join(REPO, "nebula_importer_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def _spark_submit() -> str:
    for cand in (
        os.path.join(os.path.dirname(sys.executable), "spark-submit"),
        shutil.which("spark-submit") or "",
        "/opt/spark/bin/spark-submit",
    ):
        if cand and os.path.exists(cand):
            return cand
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def test_spark_submit_py_files_local_cluster(spark, tmp_path):
    zpath = _package_zip(str(tmp_path))
    script = os.path.join(REPO, "tools", "submit_pipeline.py")

    env = dict(
        os.environ,
        PYSPARK_PYTHON=sys.executable,
        PYSPARK_DRIVER_PYTHON=sys.executable,
    )
    # PYTHONPATH must NOT leak the repo checkout into the submitted driver —
    # the import has to come from the --py-files zip to prove the shape.
    env.pop("PYTHONPATH", None)
    out = subprocess.run(
        [
            _spark_submit(),
            "--master", "local-cluster[2,1,2048]",
            "--conf", "spark.executor.memory=1g",
            "--conf", "spark.driver.memory=2g",
            "--py-files", zpath,
            script,
            "--docs", str(N_DOCS),
            "--partitions", "4",
        ],
        env=env,
        cwd=str(tmp_path),  # cwd has no nebula_importer_spark dir either
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert lines, f"no JSON line in stdout:\n{out.stdout[-2000:]}"
    payload = json.loads(lines[-1])
    assert payload["master"].startswith("local-cluster")
    assert payload["n_docs"] == N_DOCS

    # cross-deployment determinism: same seeded corpus through the same
    # pipeline in THIS process (local[4] session fixture) must emit the
    # same number of triples as the submitted 2-executor run
    from nebula_importer_spark.fixtures import PERSON_CSV_LINES, person_spec
    from nebula_importer_spark.pipeline.corpus import synthetic_corpus
    from nebula_importer_spark.pipeline.run import run_pipeline

    corpus = synthetic_corpus(
        spark, n_docs=N_DOCS, seed=42, fixture_rows=PERSON_CSV_LINES, partitions=4
    )
    local = run_pipeline(spark, corpus, fixture_node_specs=[person_spec()])
    assert payload["n_triples"] == local.triples.count() > 0
