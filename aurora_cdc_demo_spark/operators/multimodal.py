"""Multimodal column plumbing: treat image/audio/video payloads as
opaque binary columns with typed metadata, processed by Arrow-batched
mapInPandas extractors.

The container has no image/audio codecs, so the decode step is a
clearly-marked deterministic STUB (`_fake_decode`) — but the
Spark-side plumbing is real: binary column construction, Arrow batch
transfer, a mapInPandas UDF with an explicit output schema, and
deterministic per-row metadata that the DuckDB oracle reproduces.

Scale: mapInPandas streams Arrow batches per partition — no
collect, no per-row Python; swap `_fake_decode` for a real
PIL/ffmpeg call and the plan is unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("content_md5", StringType()),
        StructField("fake_width", LongType()),
        StructField("fake_height", LongType()),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """STUB decoder: deterministic stand-in for image decode (no
    codec libs in this environment). Replace with PIL/ffmpeg in a
    real deployment; the Spark plumbing is unchanged."""
    return len(payload) % 640, len(payload) % 480


def _extract_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        payloads = pdf["payload"]
        sizes = payloads.map(len)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": sizes.astype("int64"),
                "content_md5": payloads.map(
                    lambda b: hashlib.md5(bytes(b)).hexdigest()
                ),
                "fake_width": sizes.map(lambda n: n % 640).astype("int64"),
                "fake_height": sizes.map(lambda n: n % 480).astype("int64"),
            }
        )


def binary_meta(docs: DataFrame) -> DataFrame:
    """documents.text → binary payload column → mapInPandas metadata
    extraction (md5, size, stubbed decode dims)."""
    payloads = docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return payloads.mapInPandas(_extract_meta, schema=META_SCHEMA)


MM_BINARY_META_SQL = """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5,
           CAST(octet_length(encode(text)) % 640 AS BIGINT) AS fake_width,
           CAST(octet_length(encode(text)) % 480 AS BIGINT) AS fake_height
    FROM documents
"""
