"""Multimodal-column operators (north star: image/audio/video as opaque
binary columns with typed metadata).

The Spark-side plumbing is real and tested: BinaryType payload columns,
typed metadata structs, Arrow-batched ``mapInPandas`` with an explicit
output schema, and partition-count preservation. The actual media codecs
are NOT in this container, so the decode kernel is a deterministic fake
behind the same signature (`decode_image_batch`), with the real-codec
entry point stubbed as NotImplementedError — swapping in PIL/ffmpeg
changes only the kernel body, not the Spark plan.

At 100 TB: payloads stay in executor-local Arrow batches end-to-end
(never driver-side); metadata extraction is a mapInPandas pass with
columnar batch shape (spark.sql.execution.arrow.maxRecordsPerBatch
bounds memory per batch regardless of payload size).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudtrail_streamer_spark.catalog import table
from cloudtrail_streamer_spark.registry import query

IMAGE_META_SCHEMA = (
    "doc_id long, n_bytes long, format string, width long, height long, "
    "n_frames long, checksum string"
)


def decode_image_real(payload: bytes) -> dict:
    """Real-codec decode — requires PIL/ffmpeg, not present in this
    environment. Kept as the production entry point."""
    raise NotImplementedError(
        "media codecs unavailable in this container; use decode_image_batch's "
        "deterministic fake (same schema) for plumbing tests"
    )


def decode_image_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: binary payload → typed image metadata.

    Deterministic fake decode: dimensions derived from the payload's
    sha256 prefix (stable across runs/engines); real decode would call
    decode_image_real per payload with identical batch shape.
    """
    import hashlib

    for pdf in batches:
        metas = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            raw = bytes(payload)
            digest = hashlib.sha256(raw).digest()
            metas.append(
                {
                    "doc_id": int(doc_id),
                    "n_bytes": len(raw),
                    "format": ("png", "jpeg", "webp")[digest[0] % 3],
                    "width": 64 + digest[1] % 192,
                    "height": 64 + digest[2] % 192,
                    "n_frames": 1 + digest[3] % 4,
                    "checksum": digest.hex()[:16],
                }
            )
        yield pd.DataFrame(metas)


@query("multimodal_image_meta", survey_id="north-star")  # Tier R (fake decode)
def multimodal_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary decode pipeline: documents → synthetic payload bytes
    → mapInPandas metadata extraction → per-format aggregate."""
    d = table(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    meta = payloads.mapInPandas(decode_image_batch, schema=IMAGE_META_SCHEMA)
    return meta.groupBy("format").agg(
        F.count(F.lit(1)).alias("n_images"),
        F.sum("n_bytes").alias("total_bytes"),
        F.max("width").alias("max_width"),
        F.max("height").alias("max_height"),
    )


def sample_frames(meta_df: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame-sampling plan for video payloads: posexplode the frame index
    space and keep every Nth — pure relational, no decode needed until
    the sampled frames are fetched."""
    return (
        meta_df.select(
            "doc_id",
            F.posexplode(F.expr("sequence(0, int(n_frames) - 1)")).alias(
                "frame_pos", "frame_idx"
            ),
        )
        .where(F.col("frame_idx") % every_n == 0)
        .select("doc_id", "frame_idx")
    )
