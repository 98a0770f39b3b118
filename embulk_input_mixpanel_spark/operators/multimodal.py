"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns next to typed metadata
(mime, width/height, sample rate...). The Spark-side plumbing — schema,
partition sizing, Arrow batch shape, ``mapInPandas`` signatures — is real
and tested; the actual codec work is STUBBED (this container ships no
image/audio libraries): ``decode_stub`` produces deterministic fake
features so the distributed pipeline is exercised end-to-end, and
``decode_real`` raises ``NotImplementedError`` with the import-gated shape
a production build would fill in.

Scale notes: binary payloads make rows fat — the helpers below keep
batches bounded by bytes (``target_batch_bytes``), not row count, and the
feature extraction is ``mapInPandas`` (one Python call per Arrow batch,
streaming iterator — never a full-partition materialization).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "synth_media",
    "extract_features_stub",
    "decode_real",
]

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def synth_media(spark, n: int, payload_bytes: int = 4096, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payload derived JVM-side)."""
    reps = payload_bytes // 16
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.when(F.col("id") % 3 == 0, F.lit("image/png"))
        .when(F.col("id") % 3 == 1, F.lit("audio/wav"))
        .otherwise(F.lit("video/mp4"))
        .alias("mime"),
        (F.pmod(F.xxhash64(F.lit(seed), F.col("id"), F.lit("w")), F.lit(1920)) + 16)
        .cast("int")
        .alias("width"),
        (F.pmod(F.xxhash64(F.lit(seed), F.col("id"), F.lit("h")), F.lit(1080)) + 16)
        .cast("int")
        .alias("height"),
        F.repeat(
            F.lpad(F.conv(F.abs(F.xxhash64(F.lit(seed), F.col("id"))).cast("string"), 10, 16), 16, "0"),
            reps,
        )
        .cast("binary")
        .alias("payload"),
    )


def extract_features_stub(
    media: DataFrame, feature_dim: int = 8, target_batch_bytes: int = 64 << 20
) -> DataFrame:
    """Deterministic fake decode/feature-extract via ``mapInPandas``.

    Replaces the stubbed step 1:1: same schema, same Arrow batch shape as
    a real decoder. Partitions are first rebalanced so a partition holds
    roughly ``target_batch_bytes`` of payload (fat-row safety).
    """
    avg_row = media.select(F.avg(F.length("payload"))).first()[0] or 4096
    rows_per_part = max(int(target_batch_bytes / avg_row), 64)
    n_parts = max(int((media.count() + rows_per_part - 1) / rows_per_part), 1)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf["payload"]
            n_bytes = payload.map(len)
            checksum = payload.map(lambda b: sum(b[:64]) if b is not None else 0)
            feats = [
                [float((c + j) % 251) / 251.0 for j in range(feature_dim)]
                for c in checksum
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": n_bytes.astype("int64"),
                    "checksum": checksum.astype("int64"),
                    "feature": feats,
                }
            )

    return media.repartition(n_parts).mapInPandas(gen, FEATURE_SCHEMA)


def decode_real(media: DataFrame) -> DataFrame:  # pragma: no cover - stub
    """Production decode path — requires PIL/librosa/av, not in this image.

    Kept import-gated so the engine degrades loudly, not silently.
    """
    try:
        import PIL  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "real media decoding needs image/audio libraries absent from "
            "this environment; use extract_features_stub for plumbing tests"
        ) from exc
    raise NotImplementedError("wire PIL/librosa decoders here")
