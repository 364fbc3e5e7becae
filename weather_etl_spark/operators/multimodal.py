"""Multimodal column operators (SURVEY.md §2 B.9 llm_multimodal +
north-star mandate).

Treats media as opaque ``binary`` payload columns with typed metadata
structs, exactly as a 100 TB training-data pipeline would: the bytes
travel through shuffles/joins untouched; decode / feature-extraction
runs as Arrow-batched Pandas UDFs over ``mapInPandas``.

The container has no image/audio libraries, so the *decoder* is a
clearly-marked stub (`decode_image` raises NotImplementedError; the
pipeline uses a deterministic fake measurer instead) — but the Spark
plumbing is real and tested: binary schema, struct metadata,
mapInPandas batch iteration, and an exact DuckDB oracle over the
derived metadata.

Scale notes (100 TB): payload bytes dominate IO — keep them in their
own column (parquet stores columns independently, so metadata-only
queries never read the bytes), partition by acquisition date, and let
mapInPandas process Arrow record batches (bounded memory via
spark.sql.execution.arrow.maxRecordsPerBatch).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_etl_spark.io import read_table
from weather_etl_spark.registry import register

MEDIA_SCHEMA = (
    "doc_id long, payload binary, "
    "meta struct<fmt: string, lang: string, n_bytes: long>"
)


def decode_image(payload: bytes):  # pragma: no cover - documented stub
    """Real image decode (PIL/libjpeg) — NOT AVAILABLE in this
    environment. The pipeline's decode stage is pluggable; tests and
    declared queries use `_fake_measure` below instead."""
    raise NotImplementedError(
        "image decoding requires an image library not present in this "
        "container; plug a real decoder in here"
    )


def _fake_measure(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for decode: derive (width, height) from
    the payload length — keeps the full pipeline testable offline."""
    n = len(payload)
    return (n % 640, (n * 7) % 480)


def to_media_frame(docs: DataFrame) -> DataFrame:
    """documents -> media frame: utf-8 payload bytes + metadata struct."""
    payload = F.encode("text", "utf-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("fake/raw").alias("fmt"),
            F.col("lang").alias("lang"),
            F.length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def measure_media(media: DataFrame) -> DataFrame:
    """mapInPandas feature-extraction stage: batch-iterates Arrow record
    batches, runs the (stubbed) decoder per payload, emits typed
    features. This is the A4 columnar-assembly shape re-expressed as a
    batch-iterator transform."""

    def measure(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = pdf["payload"].map(_fake_measure)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload_len": pdf["payload"].map(len),
                    "width": dims.map(lambda d: d[0]),
                    "height": dims.map(lambda d: d[1]),
                    "fmt": pdf["meta"].map(lambda m: m["fmt"]),
                }
            )

    return media.mapInPandas(
        measure,
        schema="doc_id long, payload_len long, width long, height long, "
        "fmt string",
    )


@register(
    "llm_multimodal",
    oracle="""
SELECT doc_id,
       octet_length(encode(text)) AS payload_len,
       octet_length(encode(text)) % 640 AS width,
       (octet_length(encode(text)) * 7) % 480 AS height,
       'fake/raw' AS fmt
FROM documents
""",
    doc="Binary payload + metadata struct round-trip through a "
    "mapInPandas decode/measure stage (decode itself stubbed — no "
    "image libs in the container). Oracle recomputes the derived "
    "metadata arithmetically from the text bytes.",
)
def llm_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return measure_media(to_media_frame(docs))


def resize_media(media: DataFrame, max_w: int = 256, max_h: int = 256) -> DataFrame:
    """mapInPandas resize stage (decoder stubbed): recomputes target
    dimensions with aspect-preserving clamp arithmetic; a real
    implementation would also re-encode payload bytes in the same
    batch loop. Plumbing (schema, batch shape) is the real contract."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = pdf["payload"].map(_fake_measure)
            w = dims.map(lambda d: d[0]).astype("int64")
            h = dims.map(lambda d: d[1]).astype("int64")
            # scale = min(max_w/w, max_h/h, 1) in integer-safe form
            out_w, out_h = [], []
            for wi, hi in zip(w, h):
                wi = max(int(wi), 1)
                hi = max(int(hi), 1)
                num = min(max_w * hi, max_h * wi, wi * hi)
                out_w.append(num // hi)
                out_h.append(num // wi)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "out_w": out_w, "out_h": out_h}
            )

    return media.mapInPandas(resize, "doc_id long, out_w long, out_h long")


@register(
    "llm_mm_framesample",
    oracle="""
WITH v AS (
  SELECT doc_id,
         octet_length(encode(text)) // 100 + 1 AS n_frames
  FROM documents WHERE doc_id <= 50
)
SELECT doc_id,
       unnest(range(0, n_frames, 5)) AS frame_idx,
       CAST(unnest(range(0, n_frames, 5)) * 100 AS BIGINT) AS byte_off
FROM v
""",
    doc="Frame sampling for video-like payloads (every 5th frame of a "
    "payload treated as fixed-100-byte frames): mapInPandas expands "
    "each payload to its sampled frame index/offset rows — the real "
    "pipeline would decode those offsets; here the frame math is the "
    "tested contract (decode stubbed, like decode_image).",
    scale_notes="Expansion happens batch-wise on executors; payload "
    "bytes are read once per batch and never shuffled (only the "
    "sampled index rows move). Frame stride and frame size are "
    "options, not constants, in a real deployment.",
)
def llm_mm_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    frame_bytes, stride = 100, 5
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 50)
    media = to_media_frame(docs)

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "byte_off": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = len(payload) // frame_bytes + 1
                for idx in range(0, n_frames, stride):
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(idx)
                    rows["byte_off"].append(idx * frame_bytes)
            yield pd.DataFrame(rows)

    return media.mapInPandas(
        sample, "doc_id long, frame_idx long, byte_off long"
    )
