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


def synthetic_documents(spark: SparkSession, n: int,
                        tokens_per_doc: int = 40,
                        vocab: int = 50_000) -> DataFrame:
    """(doc_id, text): arbitrary-size deterministic corpus from
    ``spark.range`` — pure column expressions, no driver data.

    Every doc is ``tokens_per_doc`` pseudo-words drawn by a linear
    hash over (doc_id, position).  Docs with ``doc_id % 100 == 1`` are
    planted near-duplicates of ``doc_id - 1``: the same token stream
    with ONE position perturbed, so MinHash/LSH recall is measurable
    at any scale (expected Jaccard ~ (t-1)/(t+1))."""
    src = F.when(F.col("id") % 100 == 1, F.col("id") - 1).otherwise(
        F.col("id")
    )
    # xxhash64 mixing: a linear (id*c + j*d) % vocab scheme leaves all
    # docs' vocabularies on one arithmetic progression, which inflates
    # LSH candidate pairs by orders of magnitude — proper mixing keeps
    # unrelated docs' token sets near-disjoint at vocab >> tokens
    words = F.transform(
        F.sequence(F.lit(0), F.lit(tokens_per_doc - 1)),
        lambda j: F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(src, j), F.lit(vocab)).cast("string"),
        ),
    )
    # perturb position 0 for the planted near-dups
    words = F.when(
        F.col("id") % 100 == 1,
        F.concat(
            F.array(F.concat(F.lit("x"), (F.col("id") % vocab)
                             .cast("string"))),
            F.slice(words, 2, tokens_per_doc - 1),
        ),
    ).otherwise(words)
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.array_join(words, " ").alias("text"),
    )
