"""Multimodal column plumbing — north-star extension.

Treats image/audio/video payloads as opaque ``binary`` columns with a
typed metadata struct, and implements the Spark-side machinery a real
pipeline needs: schema, Arrow-batched feature extraction over
``mapInPandas``, and partition-friendly layout.

The container has no image/audio codecs, so the *decode* step is
stubbed exactly as the build brief directs: ``decode_real`` raises
NotImplementedError; ``fake_decode_features`` produces deterministic
features from the raw bytes so the whole pipeline (schema, batching,
UDF signature, aggregation) is real and tested end-to-end.

The synthetic payloads are derived from ``documents.text`` (UTF-8
bytes standing in for a JPEG/PCM blob) — identical bytes in Spark and
DuckDB, so the metadata query is fully oracle-checked.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from http_datafusion_spark.plans.registry import query
from http_datafusion_spark.plans.tables import load_tables

FEATURE_DIM = 8

MEDIA_SCHEMA = (
    "doc_id bigint, media_type string, payload binary, "
    "meta struct<n_bytes: bigint, declared_kind: string, source: string>"
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the multimodal table: binary payload + typed metadata.

    At 100 TB the payload column dominates storage: keep it out of every
    query that doesn't decode (column pruning makes the metadata-only
    scans cheap), and partition by media_type/source so decode jobs
    prune to the modality they need.
    """
    d = load_tables(spark, sf_dir, "documents")["documents"]
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    payload = F.encode(F.col("text"), "UTF-8")
    return d.select(
        "doc_id",
        kind.alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).cast("bigint").alias("n_bytes"),
            kind.alias("declared_kind"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def decode_real(payload: bytes, media_type: str) -> object:
    """Real decode (PIL/librosa/ffmpeg) — unavailable in this container."""
    raise NotImplementedError(
        "media codecs are not installed in this environment; "
        "use fake_decode_features for the deterministic test path"
    )


def fake_decode_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a decoder+featurizer: FEATURE_DIM
    byte-bucket means over the payload. Pure arithmetic on bytes — the
    same batch shape a real image embedding would have."""
    n = len(payload)
    if n == 0:
        return [0.0] * FEATURE_DIM
    step = max(n // FEATURE_DIM, 1)
    out = []
    for i in range(FEATURE_DIM):
        chunk = payload[i * step : (i + 1) * step] or payload[-step:]
        out.append(round(sum(chunk) / len(chunk), 4))
    return out


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over mapInPandas.

    The UDF sees pandas batches (not rows); a real decoder would slot
    into ``fake_decode_features`` unchanged. Output drops the payload
    so downstream stages shuffle only doc_id + small vectors.
    """
    out_schema = f"doc_id bigint, media_type string, n_bytes bigint, features array<double>"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len),
                    "features": pdf["payload"].map(fake_decode_features),
                }
            )

    return media.mapInPandas(batches, schema=out_schema)


def sample_frames(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """Frame sampling for the 'video' modality — one output row per
    sampled frame (doc_id, frame_idx, frame_bytes).

    A real implementation would seek keyframes via a codec; the
    deterministic stand-in slices the payload every ``every_n_bytes``.
    The Spark-side shape is the real thing: explode-style fan-out in
    Arrow batches, payload chunks stay off the driver, downstream
    stages see (id, idx, bytes) exactly as a decoder would emit.
    """
    out_schema = "doc_id bigint, frame_idx bigint, frame_bytes binary, frame_len bigint"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames, lens = [], [], [], []
            for doc_id, media_type, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                if media_type != "video":
                    continue
                for j in range(min(max_frames, max(len(payload) // every_n_bytes, 1))):
                    chunk = bytes(payload[j * every_n_bytes : (j + 1) * every_n_bytes])
                    ids.append(doc_id)
                    idxs.append(j)
                    frames.append(chunk)
                    lens.append(len(chunk))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_bytes": frames, "frame_len": lens}
            )

    return media.mapInPandas(batches, schema=out_schema)


def resize_stub(payload: bytes, width: int, height: int) -> bytes:
    """Image resize — requires a codec; stubbed per the build brief."""
    raise NotImplementedError("image codecs unavailable; resize is plumbing-only here")


@query(
    "multimodal_frame_sample",
    oracle="""
    WITH m AS (
      SELECT doc_id, octet_length(encode(text)) AS nb,
             least(8, greatest(octet_length(encode(text)) // 64, 1)) AS nf
      FROM documents
      WHERE doc_id % 3 = 2
    )
    SELECT doc_id,
           CAST(nf AS BIGINT)            AS n_frames,
           CAST(least(nb, nf * 64) AS BIGINT) AS n_bytes
    FROM m
    """,
    doc="video frame sampling: mapInPandas fan-out, frame counts oracle-checked (north-star multimodal)",
    tags=("multimodal",),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = sample_frames(media_table(spark, sf_dir))
    return frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum("frame_len").cast("bigint").alias("n_bytes"),
    )


@query(
    "multimodal_metadata",
    oracle="""
    SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
           source,
           CAST(count(*) AS BIGINT)                       AS n_items,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           CAST(max(octet_length(encode(text))) AS BIGINT) AS max_bytes
    FROM documents
    GROUP BY 1, 2
    """,
    doc="multimodal metadata scan: binary payload sizes by modality/source, payload column pruned (north-star multimodal)",
    tags=("multimodal",),
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = media_table(spark, sf_dir)
    return m.groupBy("media_type", F.col("meta.source").alias("source")).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("meta.n_bytes").alias("total_bytes"),
        F.max("meta.n_bytes").alias("max_bytes"),
    )


@query(
    "multimodal_features",
    oracle=None,  # mapInPandas featurizer: not SQL-expressible; rows-only check
    doc="multimodal feature extraction: Arrow-batched mapInPandas over binary payloads, deterministic fake decoder (north-star multimodal)",
    tags=("multimodal",),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = extract_features(media_table(spark, sf_dir))
    return feats.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.avg(F.element_at("features", 1)), 4).alias("avg_f0"),
        F.round(F.avg("n_bytes"), 4).alias("avg_bytes"),
    )
