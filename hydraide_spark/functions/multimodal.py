"""Multimodal columns: image/audio/video as opaque BINARY payloads with
typed metadata, processed through Arrow-batched ``mapInPandas``
pipelines (decode / feature-extract / resize / frame-sample).

The Spark-side plumbing — schema, partition-preserving batch iterator,
deterministic output schema — is real and tested. The actual codec work
is stubbed: the media libraries (PIL/torchaudio/av) are not in this
container, so ``decode`` raises ``NotImplementedError`` unless a
deterministic fake is requested. Swapping the fake for a real decoder
changes ONE function body and nothing in the plan.

At 100 TB: payloads stay columnar in parquet (binary column, never
exploded through the driver); mapInPandas processes Arrow record
batches per partition, so decode parallelism == partition count and the
batch size is governed by spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META, True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, first_byte long, checksum long"
)


def real_decode(payload: bytes, kind: str):  # pragma: no cover - container has no codecs
    """The real decode hook. STUB: media codecs are not available in
    this environment; a deployment plugs PIL/av/soundfile in here."""
    raise NotImplementedError(
        "media decoding requires codec libraries not present in this build; "
        "use extract_features(..., fake=True) for the deterministic test path"
    )


def _fake_features(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for decode+featurize: byte length, first
    byte, additive checksum mod 997. Engine-independent, so oracle-
    checkable end to end through the mapInPandas plumbing."""
    n = len(payload)
    first = payload[0] if n else -1
    checksum = sum(payload) % 997
    return n, first, checksum


def extract_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode + feature-extract over Arrow batches. The iterator shape
    (Iterator[pd.DataFrame] -> Iterator[pd.DataFrame]) preserves
    partitioning and streams batches — no per-row Python overhead."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                raw = bytes(payload) if payload is not None else b""
                if fake:
                    feats.append(_fake_features(raw))
                else:
                    real_decode(raw, "?")  # raises: clearly-marked stub
            n, first, checksum = zip(*feats) if feats else ((), (), ())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": list(n),
                    "first_byte": list(first),
                    "checksum": list(checksum),
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per sampled frame index,
    derived from duration metadata — pure column ops (the decode of each
    frame is the stubbed step). Demonstrates the explode shape without
    touching payloads."""
    n_frames = F.greatest(
        (F.col("meta.duration_ms") / F.lit(every_ms)).cast("long"), F.lit(0)
    )
    return (
        media.filter(F.col("kind") == "video")
        .withColumn("frame_no", F.explode(F.sequence(F.lit(0), n_frames)))
        .select("media_id", "frame_no", (F.col("frame_no") * every_ms).alias("frame_ms"))
    )


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter for the test corpus: utf-8 text bytes as the opaque
    payload (ASCII corpus => n_bytes == n_chars), metadata synthesized
    from doc fields. Lets the multimodal plumbing run against the
    driver's tables with an exact SQL oracle."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit("txt").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )
