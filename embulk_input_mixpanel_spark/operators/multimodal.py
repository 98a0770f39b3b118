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
    "resize_stub",
    "frame_sample_stub",
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


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_stub(
    media: DataFrame,
    max_edge: int = 256,
    target_batch_bytes: int = 64 << 20,
) -> DataFrame:
    """Aspect-preserving resize, codec STUBBED: real output dims (the
    actual resize arithmetic a production decoder would use) + a
    deterministic fake payload whose size scales with the output area, so
    downstream byte-budget logic is exercised honestly. mapInPandas,
    byte-bounded batches — identical plumbing to a real PIL/libav resize.
    """
    avg_row = media.select(F.avg(F.length("payload"))).first()[0] or 4096
    n_parts = max(int((media.count() * avg_row) // target_batch_bytes) + 1, 1)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            scale = (max_edge / pdf[["width", "height"]].max(axis=1)).clip(upper=1.0)
            ow = (pdf["width"] * scale).astype("int32").clip(lower=1)
            oh = (pdf["height"] * scale).astype("int32").clip(lower=1)
            # fake payload ∝ output area (a real resize re-encodes; the
            # byte-budget shape is what downstream stages depend on)
            payload = [
                (p[: max(int(len(p) * (w * h) / max(pw * ph, 1)), 16)] if p else b"")
                for p, w, h, pw, ph in zip(
                    pdf["payload"], ow, oh, pdf["width"], pdf["height"]
                )
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "out_width": ow,
                    "out_height": oh,
                    "payload": payload,
                }
            )

    return media.repartition(n_parts).mapInPandas(gen, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def frame_sample_stub(
    media: DataFrame,
    n_frames: int = 4,
    fps_ms: int = 40,
    target_batch_bytes: int = 64 << 20,
) -> DataFrame:
    """Uniform frame sampling from video payloads, codec STUBBED: emits
    ``n_frames`` rows per video (1 -> N mapInPandas expansion — the shape
    a real demuxer produces) with deterministic fake frame bytes sliced
    from the payload and real sample timestamps. Non-video mimes pass
    through with zero rows (a decoder would skip them the same way)."""
    avg_row = media.select(F.avg(F.length("payload"))).first()[0] or 4096
    n_parts = max(int((media.count() * avg_row) // target_batch_bytes) + 1, 1)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "ts_ms": [], "frame": []}
            for mid, mime, p in zip(pdf["media_id"], pdf["mime"], pdf["payload"]):
                if not (mime or "").startswith("video/") or not p:
                    continue
                step = max(len(p) // n_frames, 1)
                for i in range(n_frames):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(i * fps_ms)
                    out["frame"].append(bytes(p[i * step : i * step + step]))
            yield pd.DataFrame(out).astype(
                {"media_id": "int64", "frame_idx": "int32", "ts_ms": "int64"}
            ) if out["media_id"] else pd.DataFrame(
                {"media_id": pd.Series(dtype="int64"),
                 "frame_idx": pd.Series(dtype="int32"),
                 "ts_ms": pd.Series(dtype="int64"),
                 "frame": pd.Series(dtype=object)}
            )

    return media.repartition(n_parts).mapInPandas(gen, FRAME_SCHEMA)


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
