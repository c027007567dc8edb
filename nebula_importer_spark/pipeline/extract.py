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
    import re as _re

    gaz = sorted(set(gazetteer))
    gaz_res = [(t, _re.compile(rf"\b{_re.escape(t)}\b")) for t in gaz]

    def detect(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames: list[pd.DataFrame] = []
            texts = pdf["text"].fillna("").str.lower()
            # gazetteer channel: one vectorized (C-level) regex count per
            # term over the whole Series — no per-row Python
            for term, rx in gaz_res:
                n = texts.str.count(rx)
                mask = n > 0
                if mask.any():
                    frames.append(
                        pd.DataFrame(
                            {
                                "doc_id": pdf.loc[mask, "doc_id"],
                                "offset": pdf.loc[mask, "offset"].astype("int32"),
                                "term": term,
                                "n": n[mask].astype("int32"),
                                "channel": "gazetteer",
                            }
                        )
                    )
            if pattern:
                found = texts.str.findall(pattern)
                exploded = found.explode().dropna()
                if len(exploded):
                    g = (
                        pd.DataFrame(
                            {
                                "doc_id": pdf.loc[exploded.index, "doc_id"],
                                "offset": pdf.loc[exploded.index, "offset"].astype("int32"),
                                "term": exploded,
                            }
                        )
                        .groupby(["doc_id", "offset", "term"], as_index=False)
                        .size()
                        .rename(columns={"size": "n"})
                    )
                    g["n"] = g["n"].astype("int32")
                    g["channel"] = "pattern"
                    frames.append(g)
            if frames:
                yield pd.concat(frames, ignore_index=True)[
                    ["doc_id", "offset", "term", "n", "channel"]
                ]
            else:
                yield pd.DataFrame(
                    {
                        "doc_id": pd.Series([], dtype="object"),
                        "offset": pd.Series([], dtype="int32"),
                        "term": pd.Series([], dtype="object"),
                        "n": pd.Series([], dtype="int32"),
                        "channel": pd.Series([], dtype="object"),
                    }
                )

    text_spans = spans.where(F.col("kind").isin("text", "table_row")).select(
        "doc_id", "offset", "text"
    )
    return text_spans.mapInPandas(detect, MENTION_SCHEMA)


def doc_mentions(mentions: DataFrame) -> DataFrame:
    """Aggregate span-level mentions to (doc_id, term, n) — one shuffle."""
    return mentions.groupBy("doc_id", "term").agg(F.sum("n").cast("long").alias("n"))
