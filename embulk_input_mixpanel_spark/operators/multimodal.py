"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns next to typed metadata
(mime, width/height, sample rate...). The Spark-side plumbing — schema,
partition sizing, Arrow batch shape, ``mapInPandas`` signatures — is real
and tested. Two decode tiers:

- ``extract_features_stub`` / ``resize_stub`` / ``frame_sample_stub``:
  deterministic fake codec work over synthetic payloads, exercising the
  distributed pipeline shape end-to-end at any size.
- ``decode_real`` / ``frame_sample_real``: REAL decoding via the
  dependency-free codecs in functions/codecs.py — full PNG decode
  (signature, IHDR + CRC, IDAT inflate + unfilter, mean pixel), WAV PCM
  decode (RIFF chunk walk, rate/bits/samples, mean amplitude), and MP4
  container demux (moov/trak/stbl box walk: stsz/stco/stsc/stts
  cross-referenced into per-sample byte ranges + timestamps), so frame
  sampling extracts each video's REAL access-unit bytes at REAL
  presentation times. Only pixel-level decode of those access units
  still needs a codec library — that boundary is loud (documented per
  call site; corrupt payloads come back decoded=false with the error
  string, never silently wrong).

Scale notes: binary payloads make rows fat — the helpers below keep
batches bounded by bytes (``target_batch_bytes``), not row count; the
partition sizing samples row width from a bounded ``limit()`` probe (the
payload column is NEVER fully scanned before the real pass); and all
codec work is ``mapInPandas`` (one Python call per Arrow batch, streaming
iterator — never a full-partition materialization).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "DECODED_SCHEMA",
    "synth_media",
    "synth_media_real",
    "extract_features_stub",
    "resize_stub",
    "frame_sample_stub",
    "frame_sample_real",
    "frame_decode_real",
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


_SIZE_SAMPLE_ROWS = 10_000


def _byte_bounded_parts(media: DataFrame, target_batch_bytes: int) -> int:
    """Partition count so each partition carries ~target_batch_bytes of
    payload. Row width comes from a ``limit(10k)`` SAMPLE — the limit is
    pushed into the scan, so the binary column is read for at most 10k
    rows, never end-to-end before the real pass. The row count is a
    column-less aggregate (parquet footer metadata — the payload bytes are
    not touched), so the only pre-pass I/O is the bounded sample.
    """
    avg_row = (
        media.select(F.length("payload").alias("_l"))
        .limit(_SIZE_SAMPLE_ROWS)
        .agg(F.avg("_l"))
        .first()[0]
        or 4096
    )
    rows_per_part = max(int(target_batch_bytes / avg_row), 64)
    return max(int((media.count() + rows_per_part - 1) / rows_per_part), 1)


def extract_features_stub(
    media: DataFrame, feature_dim: int = 8, target_batch_bytes: int = 64 << 20
) -> DataFrame:
    """Deterministic fake decode/feature-extract via ``mapInPandas``.

    Replaces the stubbed step 1:1: same schema, same Arrow batch shape as
    a real decoder. Partitions are first rebalanced so a partition holds
    roughly ``target_batch_bytes`` of payload (fat-row safety).
    """
    n_parts = _byte_bounded_parts(media, target_batch_bytes)

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
    n_parts = _byte_bounded_parts(media, target_batch_bytes)

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
    n_parts = _byte_bounded_parts(media, target_batch_bytes)

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


def frame_sample_real(
    media: DataFrame,
    n_frames: int = 4,
    target_batch_bytes: int = 64 << 20,
) -> DataFrame:
    """Uniform frame sampling from REAL MP4 payloads: the container demux
    (functions/codecs.py::demux_mp4 — stsz/stco/stsc/stts cross-reference)
    recovers every sample's exact byte range and presentation timestamp;
    ``n_frames`` samples are picked uniformly across the track and each
    output row carries the REAL access-unit bytes and REAL timestamp
    (media timescale converted to ms). This is what a production demuxer
    emits for a downstream frame decoder — pixel decode of the extracted
    units is the only step still needing a codec library.

    Non-video mimes contribute zero rows (same skip a real demuxer does);
    corrupt containers also contribute zero rows here — ``decode_real`` is
    the quarantine surface that reports the parse error per media_id.
    """
    from ..functions.codecs import demux_mp4

    n_parts = _byte_bounded_parts(media, target_batch_bytes)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "ts_ms": [], "frame": []}
            for mid, mime, p in zip(pdf["media_id"], pdf["mime"], pdf["payload"]):
                if not (mime or "").startswith("video/") or not p:
                    continue
                try:
                    b = bytes(p)
                    d = demux_mp4(b)
                except (ValueError, IndexError):
                    continue  # decode_real reports the error for this id
                n = d["n_samples"]
                if n == 0:
                    continue
                take = min(n_frames, n)
                # uniform positions across the track, always including 0
                picks = sorted({(i * n) // take for i in range(take)})
                ts_scale = 1000.0 / max(d["timescale"], 1)
                for si in picks:
                    off, size, ts_units = d["samples"][si]
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(si)
                    out["ts_ms"].append(int(ts_units * ts_scale))
                    out["frame"].append(b[off : off + size])
            yield pd.DataFrame(out).astype(
                {"media_id": "int64", "frame_idx": "int32", "ts_ms": "int64"}
            ) if out["media_id"] else pd.DataFrame(
                {"media_id": pd.Series(dtype="int64"),
                 "frame_idx": pd.Series(dtype="int32"),
                 "ts_ms": pd.Series(dtype="int64"),
                 "frame": pd.Series(dtype=object)}
            )

    return media.repartition(n_parts).mapInPandas(gen, FRAME_SCHEMA)


FRAME_PIXELS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
        T.StructField("decoded", T.BooleanType()),
        T.StructField("error", T.StringType()),
    ]
)


def frame_decode_real(frames: DataFrame, target_batch_bytes: int = 64 << 20) -> DataFrame:
    """Pixel-decode sampled video frames (:func:`frame_sample_real`
    output): each ``frame`` access unit that is a PNG (what a ``'png '``
    video track carries — the codec this repo decodes with zero external
    libraries) yields real dims + mean luma; any other codec's unit
    quarantines with the parse error, per-frame, without failing the job.

    With frame_sample_real this completes a real demux -> sample ->
    pixel-decode video pipeline: container walk, uniform frame picks,
    then per-frame pixel statistics — all distributed via byte-bounded
    ``mapInPandas`` batches.
    """
    from ..functions.codecs import decode_png

    n_parts = _byte_bounded_parts(
        frames.withColumnRenamed("frame", "payload"), target_batch_bytes
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, fi, ts, fr in zip(
                pdf["media_id"], pdf["frame_idx"], pdf["ts_ms"], pdf["frame"]
            ):
                rec = {
                    "media_id": int(mid), "frame_idx": int(fi),
                    "ts_ms": int(ts), "width": None, "height": None,
                    "mean_luma": None, "decoded": False, "error": None,
                }
                try:
                    p = decode_png(bytes(fr) if fr is not None else b"")
                    rec.update(
                        decoded=True, width=p["width"], height=p["height"],
                        mean_luma=p["mean_value"],
                    )
                except Exception as exc:  # non-PNG codec: quarantine the frame
                    rec.update(error=str(exc))
                rows.append(rec)
            yield pd.DataFrame(rows).astype(
                {
                    "media_id": "int64", "frame_idx": "int32", "ts_ms": "int64",
                    "width": "Int32", "height": "Int32",
                    "mean_luma": "float64", "decoded": "bool",
                }
            )

    return frames.repartition(n_parts).mapInPandas(gen, FRAME_PIXELS_SCHEMA)


def synth_media_real(
    spark, n: int, seed: int = 42, target_batch_bytes: int = 64 << 20
) -> DataFrame:
    """Media table with REAL payload bytes: valid PNGs (8-bit grayscale,
    deterministic pixels), valid PCM WAVs, and valid MP4 PNG-video files
    (real moov/stbl sample tables whose access units are real PNG frames
    — fully pixel-decodable by this repo's own codecs) — mime cycles by
    media_id like :func:`synth_media`. Generation is ``mapInPandas`` over
    a range frame (distributed, deterministic from (seed, media_id); no
    driver-side byte building).
    """
    from ..functions.codecs import encode_mp4, encode_png, encode_wav

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "mime": [], "width": [], "height": [], "payload": []}
            for mid in pdf["id"]:
                mid = int(mid)
                rnd = (seed * 1_000_003 + mid) & 0x7FFFFFFF
                w = 4 + (rnd % 13)
                h = 4 + ((rnd >> 8) % 13)
                kind = mid % 3
                if kind == 0:
                    px = bytes(
                        ((rnd >> 4) + 31 * i) % 256 for i in range(w * h)
                    )
                    out["mime"].append("image/png")
                    out["payload"].append(encode_png(w, h, px))
                elif kind == 1:
                    samples = [
                        (((rnd >> 3) + 97 * i) % 2048) - 1024 for i in range(256)
                    ]
                    out["mime"].append("audio/wav")
                    out["payload"].append(encode_wav(samples, sample_rate=16_000))
                    w = h = 0
                else:
                    # PNG video track ('png ' is a registered ISO/QuickTime
                    # sample-entry fourcc): every access unit is a real PNG
                    # of the track's dims, so the file is pixel-decodable
                    # end-to-end with this repo's own codecs
                    n_fr = 3 + (rnd % 6)
                    frames = [
                        encode_png(
                            w, h,
                            bytes(
                                ((rnd >> 2) + 13 * f + i) % 256
                                for i in range(w * h)
                            ),
                        )
                        for f in range(n_fr)
                    ]
                    out["mime"].append("video/mp4")
                    out["payload"].append(
                        encode_mp4(frames, width=w, height=h, codec="png ")
                    )
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
            yield pd.DataFrame(out).astype(
                {"media_id": "int64", "width": "int32", "height": "int32"}
            )

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("decoded", T.BooleanType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("mean_value", T.DoubleType()),
        T.StructField("brand", T.StringType()),
        T.StructField("error", T.StringType()),
    ]
)


def decode_real(media: DataFrame, target_batch_bytes: int = 64 << 20) -> DataFrame:
    """REAL decode over binary payloads — no image/audio libraries needed:

    - ``image/png``: full decode via functions/codecs.py::decode_png
      (signature, IHDR + CRC verify, IDAT inflate, filter-0 unfilter) ->
      width/height/n_samples/mean pixel value.
    - ``audio/wav``: RIFF chunk walk -> sample_rate/n_samples/mean |amp|.
    - ``video/mp4``: REAL container demux (moov/trak/stbl box walk;
      stsz/stco/stsc/stts cross-referenced) -> track width/height, sample
      count, brand. For ``'png '`` video tracks (registered ISO/QuickTime
      sample entry; what :func:`synth_media_real` emits) every access
      unit is pixel-decoded in-repo -> frame dims + mean pixel value over
      ALL frames, no external library. Other fourccs (mp4v/avc1/...)
      report mean access-unit size and record the codec-library boundary
      in the error column — declared, never faked.

    Corrupt payloads come back decoded=false with the parse error string —
    a 100 TB ingest must quarantine bad bytes, not die on them. Batches are
    byte-bounded like every other fat-row pass here.
    """
    from ..functions.codecs import decode_png, decode_wav, demux_mp4

    n_parts = _byte_bounded_parts(media, target_batch_bytes)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mime, payload in zip(pdf["media_id"], pdf["mime"], pdf["payload"]):
                rec = {
                    "media_id": int(mid), "mime": mime, "decoded": False,
                    "width": None, "height": None, "sample_rate": None,
                    "n_samples": None, "mean_value": None, "brand": None,
                    "error": None,
                }
                try:
                    b = bytes(payload) if payload is not None else b""
                    if mime == "image/png":
                        d = decode_png(b)
                        rec.update(
                            decoded=True, width=d["width"], height=d["height"],
                            n_samples=d["n_samples"], mean_value=d["mean_value"],
                        )
                    elif mime == "audio/wav":
                        d = decode_wav(b)
                        rec.update(
                            decoded=True, sample_rate=d["sample_rate"],
                            n_samples=d["n_samples"], mean_value=d["mean_value"],
                        )
                    elif mime == "video/mp4":
                        d = demux_mp4(b)
                        if d["codec"] == "png ":
                            # PNG video track: every access unit is a PNG
                            # this repo decodes itself — full pixel decode,
                            # no external library, no declared boundary
                            tot = cnt = 0
                            fw = fh = None
                            for off, size, _ts in d["samples"]:
                                p = decode_png(b[off : off + size])
                                fw, fh = p["width"], p["height"]
                                tot += p["mean_value"] * p["n_samples"]
                                cnt += p["n_samples"]
                            rec.update(
                                decoded=True,
                                brand=d["brand"],
                                width=fw if fw else (d["width"] or None),
                                height=fh if fh else (d["height"] or None),
                                n_samples=d["n_samples"],
                                mean_value=(tot / cnt) if cnt else 0.0,
                            )
                        else:
                            sizes = [s for _o, s, _t in d["samples"]]
                            rec.update(
                                decoded=True,
                                brand=d["brand"],
                                width=d["width"] or None,
                                height=d["height"] or None,
                                n_samples=d["n_samples"],
                                mean_value=(sum(sizes) / len(sizes)) if sizes else 0.0,
                                error="container demux real; pixel decode of "
                                f"{d['codec']!r} access units needs a video "
                                "library (av)",
                            )
                    else:
                        rec.update(error=f"no decoder for mime {mime!r}")
                except Exception as exc:  # quarantine, don't crash the job
                    rec.update(decoded=False, error=str(exc))
                rows.append(rec)
            yield pd.DataFrame(rows).astype(
                {
                    "media_id": "int64", "decoded": "bool",
                    "width": "Int32", "height": "Int32",
                    "sample_rate": "Int32", "n_samples": "Int64",
                    "mean_value": "float64",
                }
            )

    return media.repartition(n_parts).mapInPandas(gen, DECODED_SCHEMA)
