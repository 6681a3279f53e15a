"""Golden queries: multimodal column plumbing (binary payloads + typed
metadata + Arrow-batched feature extraction).

The feature values are a deterministic fake (codecs aren't in this
container — see functions.multimodal), but the *plumbing* under test is
real: binary columns in parquet plans, mapInPandas batch iteration with
a declared output schema, metadata-driven frame-sampling explodes. The
oracle recomputes the fake features in SQL, so the whole Arrow path is
value-checked end to end.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.multimodal import documents_as_media, extract_features, frame_sample_plan
from . import golden
from ._util import big, t


@golden(
    "multimodal_features",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           CAST(length(text) AS BIGINT) AS n_bytes,
           CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS first_byte,
           CAST(list_sum(list_transform(string_split(text, ''), x -> ascii(x))) % 997 AS BIGINT) AS checksum
    FROM documents
    """,
)
def multimodal_features(spark, sf_dir):
    """Binary payload -> mapInPandas feature extraction (batch iterator,
    Arrow transfer, declared schema). ASCII corpus => byte-level features
    are SQL-recomputable, proving the pandas path end to end."""
    from ._util import parallelize_small

    media = documents_as_media(parallelize_small(t(spark, sf_dir, "documents"), cap=8))
    out = extract_features(media, fake=True)
    return out.select(
        big("media_id").alias("media_id"),
        big("n_bytes").alias("n_bytes"),
        big("first_byte").alias("first_byte"),
        big("checksum").alias("checksum"),
    )


@golden(
    "multimodal_frame_plan",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           CAST(f AS BIGINT) AS frame_no,
           CAST(f * 1000 AS BIGINT) AS frame_ms
    FROM (
      SELECT doc_id, unnest(range(0, (n_chars * 10 // 1000) + 1)) AS f
      FROM documents
    )
    """,
)
def multimodal_frame_plan(spark, sf_dir):
    """Metadata-driven frame sampling: one row per sampled frame index
    from duration_ms — the explode shape of video pipelines, payloads
    untouched (decode stays in the stubbed decode stage)."""
    media = documents_as_media(t(spark, sf_dir, "documents")).withColumn(
        "kind", F.lit("video")
    )
    out = frame_sample_plan(media, every_ms=1000)
    return out.select(
        big("media_id").alias("media_id"),
        big("frame_no").alias("frame_no"),
        big("frame_ms").alias("frame_ms"),
    )
