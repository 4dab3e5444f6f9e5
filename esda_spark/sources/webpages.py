"""Common-Crawl-shaped web-pages input (BASELINE.json input_hint):

    webpages(url string, warc_ts timestamp, html binary, text string,
             lang string)

Synthesized deterministically from the driver's documents table (no
external data): url/warc_ts derive from doc_id, html wraps the text in
a fixed page template.  :func:`extract_text` recovers the text from
the html bytes **byte-identically** (the per-row invariant the north
rule demands) — verified in tests/test_webpages.py.

The extraction is a vectorized pandas UDF (Arrow batches, no per-row
Python at the plan level) so the same operator works on real WARC-like
payloads by swapping the parser.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_PRE = "<html><head><meta charset=\"utf-8\"><title>"
_MID = "</title></head><body><article>"
_POST = "</article></body></html>"


def synth_webpages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet -> (url, warc_ts, html, text, lang)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    url = F.concat(
        F.lit("http://site"),
        (F.col("doc_id") % 97).cast("string"),
        F.lit(".example/p"),
        F.col("doc_id").cast("string"),
    )
    warc_ts = F.timestamp_seconds(F.lit(1_600_000_000) + F.col("doc_id") * 17)
    html = F.encode(
        F.concat(
            F.lit(_PRE), F.col("source"), F.lit(_MID), F.col("text"),
            F.lit(_POST),
        ),
        "utf-8",
    )
    return docs.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        F.col("text"),
        F.col("lang"),
        F.col("doc_id"),
    )


def extract_text(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Decode html bytes -> extracted_text column (byte-identical to the
    original text for the synthetic template)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = []
            for raw in pdf[html_col]:
                s = bytes(raw).decode("utf-8")
                start = s.index(_MID) + len(_MID)
                end = s.rindex(_POST)
                texts.append(s[start:end])
            out = pdf.drop(columns=[html_col])
            out["extracted_text"] = texts
            yield out

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in pages.schema.fields if f.name != html_col
    ) + ", extracted_text string"
    return pages.mapInPandas(extract, schema=schema)
