"""nebula_importer_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch re-expression of the query/data-processing capabilities of
lucky-xin/nebula-importer (a Go CSV→NebulaGraph bulk loader) as an idiomatic
PySpark pipeline:

* row→graph mapping (tags/edges, typed value conversion, VID synthesis,
  record filters) compiled to Catalyst Column expressions — see
  :mod:`nebula_importer_spark.functions` and
  :mod:`nebula_importer_spark.plans.specs`;
* byte-exact nGQL statement rendering for golden parity with the reference's
  unit tests — see :mod:`nebula_importer_spark.operators.statements`;
* web-scale KG stages (extract → link → canonicalize → materialize) with
  salted skew handling and per-partition lineage/resume — see
  :mod:`nebula_importer_spark.pipeline`;
* training-data operators (dedup, similarity search, text analysis) — see
  :mod:`nebula_importer_spark.operators`.

Reference semantics are cited per function as ``file:line`` into
``/root/reference`` (the Go reference implementation).
"""

__version__ = "0.1.0"
