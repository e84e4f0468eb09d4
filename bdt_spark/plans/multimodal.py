"""Multimodal-column query specs: binary payload + mapInPandas decode.

The fake-decode path is deterministic and content-derived, so the whole
distributed pipeline (binary cast -> Arrow batches -> pandas decode ->
result schema) is oracled in plain SQL. The fixture `documents.text` stands
in for media bytes (ASCII, so byte offsets == char offsets in the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bdt_spark.functions.multimodal import (
    decode_features,
    sample_frames,
    with_binary_payload,
)
from bdt_spark.plans.registry import query
from bdt_spark.sources.io import load_fixture_tables

FRAME_BYTES = 100


@query(
    "multimodal_decode_features",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_bytes,
           md5(substr(text, 1, 16)) AS head_md5,
           CAST(length(text) % 64 + 1 AS INT) AS fake_width,
           CAST(length(text) % 48 + 1 AS INT) AS fake_height
    FROM documents
    ORDER BY doc_id
    """,
    tags=("multimodal", "mapInPandas"),
    doc="Opaque-binary decode via Arrow-batched mapInPandas (stubbed codec, "
    "deterministic fake features). Executor-side only; no driver collect.",
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_fixture_tables(spark, sf_dir)
    binary = with_binary_payload(t["documents"])
    return decode_features(binary, fake=True).orderBy("doc_id")


@query(
    "multimodal_frame_sample",
    oracle=f"""
    WITH frames AS (
      SELECT doc_id,
             CAST(unnest(range(0, greatest(length(text) // {FRAME_BYTES}, 1)))
                  AS INT) AS frame_idx,
             text
      FROM documents
    )
    SELECT doc_id, frame_idx,
           md5(substr(text, frame_idx * {FRAME_BYTES} + 1, {FRAME_BYTES}))
             AS frame_md5
    FROM frames
    ORDER BY doc_id, frame_idx
    """,
    tags=("multimodal", "mapInPandas", "frames"),
    doc="Video-frame-sampling shape: 1->N mapInPandas emitting one row per "
    f"{FRAME_BYTES}-byte chunk with a per-frame content hash.",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_fixture_tables(spark, sf_dir)
    binary = with_binary_payload(t["documents"])
    return sample_frames(binary, every_bytes=FRAME_BYTES).orderBy(
        "doc_id", "frame_idx"
    )
