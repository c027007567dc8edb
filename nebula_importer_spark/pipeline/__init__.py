"""KG-construction pipeline stages (extract → link → canonicalize → materialize).

The north-rule additions around the reference-faithful mapping core: these
stages process Iceberg/parquet tables of interleaved text+media documents
(``doc_id:string, spans:array<struct<kind,text,media_ref,offset>>``) into
deduplicated vertex/edge/triple tables, with per-partition lineage for
idempotent resume.
"""
