"""Extract stage: span batches → entity mentions (vectorized, Arrow-batched).

Occupies the reference's Convertor-hook slot (the pluggable 1→N record
expansion point, ``/root/reference/pkg/reader/batch.go:21-69``): each text
span expands into zero or more mention records.

Per the input_hint, detection runs in *vectorized* pandas UDFs over Arrow
batches — no per-row Python in the Spark row path; inside the batch, pandas
``str`` ops process whole Series at once. Two detectors:

* gazetteer terms (dictionary hits, the high-precision channel);
* pattern mentions (regex over the span text, e.g. fixture-style typed rows),
  kept separate so linking can weight channels differently.

Scale: mapInPandas pipelines with the scan — no shuffle. Mention rows are
~two orders of magnitude smaller than span text, so the explode happens
*after* detection, not before.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MENTION_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("offset", T.IntegerType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("n", T.IntegerType(), False),
        T.StructField("channel", T.StringType(), False),
    ]
)


def extract_mentions(
    spans: DataFrame,
    gazetteer: Sequence[str],
    pattern: str | None = None,
) -> DataFrame:
    """Detect mentions in text/table_row spans via a vectorized pandas UDF.

    ``spans`` must have (doc_id, kind, text, offset). Returns mention rows
    (doc_id, offset, term, n, channel) — one row per distinct term per span,
    with occurrence count ``n``.
    """
    gaz = sorted(set(gazetteer))
    gaz_set = frozenset(gaz)

    def detect(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_off, out_term, out_n, out_ch = [], [], [], [], []
            texts = pdf["text"].fillna("")
            # gazetteer channel: vectorized tokenization + counting
            token_lists = texts.str.lower().str.split()
            for doc, off, toks in zip(pdf["doc_id"], pdf["offset"], token_lists):
                if not toks:
                    continue
                counts: dict[str, int] = {}
                for t in toks:
                    if t in gaz_set:
                        counts[t] = counts.get(t, 0) + 1
                for term, n in counts.items():
                    out_doc.append(doc)
                    out_off.append(off)
                    out_term.append(term)
                    out_n.append(n)
                    out_ch.append("gazetteer")
            if pattern:
                found = texts.str.findall(pattern)
                for doc, off, hits in zip(pdf["doc_id"], pdf["offset"], found):
                    counts = {}
                    for h in hits:
                        counts[h] = counts.get(h, 0) + 1
                    for term, n in counts.items():
                        out_doc.append(doc)
                        out_off.append(off)
                        out_term.append(term)
                        out_n.append(n)
                        out_ch.append("pattern")
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_doc, dtype="object"),
                    "offset": pd.Series(out_off, dtype="int32"),
                    "term": pd.Series(out_term, dtype="object"),
                    "n": pd.Series(out_n, dtype="int32"),
                    "channel": pd.Series(out_ch, dtype="object"),
                }
            )

    text_spans = spans.where(F.col("kind").isin("text", "table_row")).select(
        "doc_id", "offset", "text"
    )
    return text_spans.mapInPandas(detect, MENTION_SCHEMA)


def doc_mentions(mentions: DataFrame) -> DataFrame:
    """Aggregate span-level mentions to (doc_id, term, n) — one shuffle."""
    return mentions.groupBy("doc_id", "term").agg(F.sum("n").cast("long").alias("n"))
