"""Pipeline stage tests: extract, link, canonicalize, lineage/resume,
multimodal plumbing, and the end-to-end run."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from nebula_importer_spark.fixtures import PERSON_CSV_LINES, person_spec
from nebula_importer_spark.pipeline.canonicalize import canonical_mapping, connected_components
from nebula_importer_spark.pipeline.corpus import explode_spans, interleave_documents, synthetic_corpus
from nebula_importer_spark.pipeline.extract import doc_mentions, extract_mentions
from nebula_importer_spark.pipeline.lineage import Checkpoint, with_bucket
from nebula_importer_spark.pipeline.link import link_mentions
from nebula_importer_spark.pipeline.multimodal import decode_media, media_table
from nebula_importer_spark.pipeline.run import run_pipeline


def _corpus(spark):
    flat = spark.createDataFrame(
        [
            ("d1", "spark writes parquet while trino reads iceberg"),
            ("d2", "kafka streams feed spark and flink jobs"),
            ("d3", "nothing relevant here at all today friends"),
        ],
        "doc_id string, text string",
    )
    return interleave_documents(flat, chunk_words=3)


def test_extract_mentions_gazetteer(spark):
    gaz = {"spark", "kafka", "iceberg"}
    spans = explode_spans(_corpus(spark))
    m = doc_mentions(extract_mentions(spans, sorted(gaz)))
    got = {(r.doc_id, r.term): r.n for r in m.collect()}
    # expected: gazetteer hits in text/table_row spans only (media spans'
    # payload text is not prose and is not scanned)
    want: dict[tuple[str, str], int] = {}
    for s in spans.where("kind in ('text', 'table_row')").collect():
        for tok in s.text.split():
            if tok in gaz:
                k = (s.doc_id, tok)
                want[k] = want.get(k, 0) + 1
    assert got == want and len(want) >= 2


def test_extract_mentions_pattern_channel(spark):
    spans = explode_spans(_corpus(spark))
    m = extract_mentions(spans, [], pattern=r"par\w+")
    rows = {(r.doc_id, r.term, r.channel) for r in m.collect()}
    assert ("d1", "parquet", "pattern") in rows


def test_link_mentions_exact_and_fuzzy(spark):
    mentions = spark.createDataFrame(
        [("d1", "spark", 2), ("d1", "sparkk", 1), ("d2", "zzz", 1)],
        "doc_id string, term string, n long",
    )
    aliases = spark.createDataFrame(
        [("spark", "product::spark")], "term string, entity string"
    )
    got = link_mentions(mentions, aliases, threshold=0.3).collect()
    by_term = {r.term: r for r in got}
    assert by_term["spark"].link_channel == "exact"
    assert by_term["spark"].entity == "product::spark"
    assert by_term["sparkk"].link_channel == "fuzzy"  # typo links via LSH
    assert by_term["sparkk"].entity == "product::spark"
    assert "zzz" not in by_term  # precision-first: unmatched dropped


def test_connected_components_chain_and_isolated(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "id_a long, id_b long"
    )
    comp = {r.id: r.component for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}


def test_canonical_mapping_includes_isolated(spark):
    ids = spark.createDataFrame([(i,) for i in range(1, 6)], "doc_id long")
    pairs = spark.createDataFrame([(2, 4)], "id_a long, id_b long")
    got = {r.doc_id: r.canonical_id for r in canonical_mapping(ids, pairs).collect()}
    assert got == {1: 1, 2: 2, 3: 3, 4: 2, 5: 5}


def test_canonical_mapping_auto_picks_algorithm(spark, monkeypatch):
    """"auto" = min-label for low-diameter graphs; star fallback when the
    bounded min-label probe hits its round cap (high-diameter chain)."""
    import nebula_importer_spark.pipeline.canonicalize as cz

    calls: list[str] = []
    orig_ml, orig_star = cz.connected_components, cz.connected_components_star
    monkeypatch.setattr(
        cz, "connected_components",
        lambda *a, **k: (calls.append("min_label"), orig_ml(*a, **k))[1],
    )
    monkeypatch.setattr(
        cz, "connected_components_star",
        lambda *a, **k: (calls.append("star"), orig_star(*a, **k))[1],
    )

    # tiny components: min-label converges well inside the cap, no fallback
    ids = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame([(0, 1), (3, 4)], "id_a long, id_b long")
    got = {
        r.doc_id: r.canonical_id
        for r in cz.canonical_mapping(ids, pairs, algorithm="auto").collect()
    }
    assert got == {0: 0, 1: 0, 2: 2, 3: 3, 4: 3, 5: 5}
    assert calls == ["min_label"]

    # chain with diameter > AUTO_MIN_LABEL_CAP: the probe caps out and the
    # star fallback produces the same (correct) labels
    calls.clear()
    n = cz.AUTO_MIN_LABEL_CAP + 4
    ids = spark.createDataFrame([(i,) for i in range(n + 1)], "doc_id long")
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    got = {
        r.doc_id: r.canonical_id
        for r in cz.canonical_mapping(ids, chain, algorithm="auto").collect()
    }
    assert got == {i: 0 for i in range(n + 1)}
    assert calls == ["min_label", "star"]


def test_multimodal_plumbing(spark):
    spans = explode_spans(_corpus(spark))
    media = media_table(spans)
    rows = media.collect()
    assert rows and all(r.kind in ("image", "audio", "table_row") for r in rows)
    feats = decode_media(media, fake=True).collect()
    assert len(feats) == len(rows)
    assert all(len(r.features) == 16 for r in feats)
    with pytest.raises(Exception, match="NotImplementedError|decode"):
        decode_media(media, fake=False).collect()


def test_lineage_resume_idempotent(spark, tmp_path):
    """Wave-then-kill-then-resume converges to the uninterrupted result."""
    corpus = synthetic_corpus(spark, 60, seed=9, partitions=4)
    ckpt = Checkpoint(str(tmp_path / "ckpt"))
    out = str(tmp_path / "out")
    n_buckets = 8

    # wave 1: full corpus, but only buckets {0,1} materialized + recorded
    run_pipeline(
        spark, corpus, checkpoint=ckpt, output_path=out,
        n_buckets=n_buckets, bucket_filter=[0, 1],
    )
    done = set(ckpt.completed_buckets(spark))
    assert done == {0, 1}

    # resumed run: skips completed buckets, completes the rest
    run_pipeline(spark, corpus, checkpoint=ckpt, output_path=out, n_buckets=n_buckets)
    assert set(ckpt.completed_buckets(spark)) == set(range(n_buckets))

    # compare with an uninterrupted single run
    clean_out = str(tmp_path / "clean")
    run_pipeline(spark, corpus, output_path=clean_out, n_buckets=n_buckets)
    resumed = spark.read.parquet(out).select("subj", "pred", "obj", "bucket")
    clean = spark.read.parquet(clean_out).select("subj", "pred", "obj", "bucket")
    assert resumed.exceptAll(clean).count() == 0
    assert clean.exceptAll(resumed).count() == 0

    # re-running with everything complete is a no-op wave (still idempotent)
    run_pipeline(spark, corpus, checkpoint=ckpt, output_path=out, n_buckets=n_buckets)
    again = spark.read.parquet(out).select("subj", "pred", "obj", "bucket")
    assert again.exceptAll(clean).count() == 0


def test_run_pipeline_end_to_end_with_fixture_replay(spark):
    corpus = synthetic_corpus(
        spark, 40, seed=42, fixture_rows=list(PERSON_CSV_LINES[:3]), partitions=4
    )
    result = run_pipeline(spark, corpus, fixture_node_specs=[person_spec()])
    preds = {r.pred for r in result.triples.select("pred").dropDuplicates().collect()}
    assert "tag:Document" in preds
    assert "mentions" in preds
    assert "tag:Person" in preds            # fixture replay through mapping core
    assert "Person.firstName" in preds
    # golden value check: Mahinda row renders exactly like the reference
    rows = {
        (r.subj, r.pred): r.obj
        for r in result.triples.where(F.col("subj") == '"933"').collect()
    }
    assert rows[('"933"', "Person.firstName")] == '"Mahinda"'
    assert rows[('"933"', "Person.birthday")] == 'DATE("1989-12-03")'
    stats = {r.pred: r.n_triples for r in result.stats.collect()}
    assert stats["tag:Document"] == 40


def test_star_cc_matches_min_label_on_random_graphs(spark):
    """large-star/small-star CC ≡ min-label CC on seeded random graphs."""
    import random

    from nebula_importer_spark.pipeline.canonicalize import connected_components_star

    for seed in (1, 2, 3):
        rnd = random.Random(seed)
        n = 60
        edges = [
            (rnd.randrange(n), rnd.randrange(n)) for _ in range(40)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        simple = {
            r.id: r.component for r in connected_components(pairs).collect()
        }
        star = {
            r.id: r.component for r in connected_components_star(pairs).collect()
        }
        assert star == simple, f"seed={seed}"


def test_star_cc_long_chain(spark):
    """A path graph (worst case for min-label) still resolves to one min."""
    from nebula_importer_spark.pipeline.canonicalize import connected_components_star

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "id_a long, id_b long"
    )
    comp = {r.id: r.component for r in connected_components_star(pairs).collect()}
    assert set(comp.values()) == {0}
    assert len(comp) == 31
