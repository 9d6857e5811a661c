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


# ---------------------------------------------------------------------------
# Frame sampling: video-style payloads → one row per sampled frame
# ---------------------------------------------------------------------------

N_FRAMES = 4
FRAME_BYTES = 16  # bytes "decoded" per frame (stub feature window)


def frame_sample(docs: DataFrame) -> DataFrame:
    """Sample N_FRAMES evenly-strided byte windows from each binary
    payload ("video" frame sampling): one output row per (doc,
    frame) with the frame's offset, a stub timestamp (25 fps), and
    stub decode features (md5 + window length) over the frame bytes.

    Spark-first shape: frame OFFSET arithmetic and byte slicing are
    pure built-ins (posexplode over a sequence + binary substring +
    md5), so sampling stays entirely inside whole-stage codegen — no
    Python in the loop. Only a REAL codec (ffmpeg frame decode)
    would need mapInPandas, exactly like binary_meta's stub; the row
    shape (doc_id, frame_idx, offset, features...) is what that
    version would emit, so swapping the decode in changes no plan
    upstream or downstream.

    Scale: explode multiplies rows by a constant N_FRAMES (no
    shuffle); everything else is a narrow projection.
    """
    d = docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.octet_length(F.col("text")).cast("long").alias("n"),
    )
    return (
        d.select(
            "doc_id",
            "payload",
            "n",
            F.explode(F.sequence(F.lit(0), F.lit(N_FRAMES - 1))).alias("frame_idx"),
        )
        .withColumn("stride", F.expr(f"n div {N_FRAMES}"))
        .select(
            "doc_id",
            F.col("frame_idx").cast("long").alias("frame_idx"),
            (F.col("frame_idx") * F.col("stride") + 1)
            .cast("long")
            .alias("frame_off"),
            F.least(F.col("stride"), F.lit(FRAME_BYTES))
            .cast("long")
            .alias("frame_len"),
            (F.col("frame_idx") * 40).cast("long").alias("frame_ts_ms"),
            F.md5(
                F.expr(
                    f"substring(payload, frame_idx * (n div {N_FRAMES}) + 1, "
                    f"least(n div {N_FRAMES}, {FRAME_BYTES}))"
                )
            ).alias("frame_md5"),
        )
    )


# text is ASCII in this corpus (octet_length == length for every doc,
# checked), so DuckDB's character substr sees the same bytes Spark's
# binary substring does and the frame md5s agree.
MM_FRAME_SAMPLE_SQL = f"""
    SELECT doc_id,
           CAST(frame_idx AS BIGINT) AS frame_idx,
           CAST(frame_idx * (length(text) // {N_FRAMES}) + 1 AS BIGINT)
               AS frame_off,
           CAST(LEAST(length(text) // {N_FRAMES}, {FRAME_BYTES}) AS BIGINT)
               AS frame_len,
           CAST(frame_idx * 40 AS BIGINT) AS frame_ts_ms,
           md5(substr(text,
                      CAST(frame_idx * (length(text) // {N_FRAMES}) + 1 AS INTEGER),
                      CAST(LEAST(length(text) // {N_FRAMES}, {FRAME_BYTES}) AS INTEGER)))
               AS frame_md5
    FROM documents, generate_series(0, {N_FRAMES - 1}) AS g(frame_idx)
"""
