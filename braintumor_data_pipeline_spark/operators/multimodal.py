"""Multimodal columns (north star, SURVEY N*): image/audio/video as
opaque ``binary`` columns with typed metadata, processed by Arrow-batched
pandas UDFs.

The pattern at 100 TB: blobs ride in parquet binary columns (or
references to object storage), metadata columns drive partition pruning,
and each modality's decode/feature stage is a ``mapInPandas`` over the
binary column — the blob never leaves the executor, only features come
back.

- **Images** are REAL end-to-end here: grid images → PNG-encode into a
  binary column (+ metadata) → a second Arrow stage decodes and extracts
  features. Two stages on purpose: stage 1 materializes the multimodal
  table shape, stage 2 is the consumer any downstream pipeline would run.
- **Audio/Video** decoders need codec libraries this container lacks:
  the Spark plumbing (schema, batching, UDF signature) is real and
  tested; the codec call is stubbed — ``decode_audio``/
  ``decode_video_frames`` raise NotImplementedError unless handed the
  deterministic fake codec used by the tests (clearly marked STUB).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from ..functions.imaging import sobel_magnitude, to_grayscale
from ..sources.image_io import decode_image
from ..sources.png import encode_png
from .segmentation import grid_images_df, GRID

IMAGE_TABLE_SCHEMA = (
    "image_id int, format string, width int, height int, n_bytes long,"
    " payload binary"
)


def images_as_binary_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage 1: the multimodal image table — (metadata…, payload binary)."""

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        img = np.zeros((GRID, GRID), dtype=np.uint8)
        img[pdf["y"].to_numpy(), pdf["x"].to_numpy()] = pdf["v"].to_numpy()
        png = encode_png(img)
        return pd.DataFrame(
            [
                {
                    "image_id": int(pdf["image_id"].iloc[0]),
                    "format": "png",
                    "width": GRID,
                    "height": GRID,
                    "n_bytes": len(png),
                    "payload": png,
                }
            ]
        )

    return (
        grid_images_df(spark, sf_dir)
        .groupBy("image_id")
        .applyInPandas(encode, schema=IMAGE_TABLE_SCHEMA)
    )


def image_features_df(df: DataFrame) -> DataFrame:
    """Feature stage over any (image_id, payload binary) table: decode
    (magic-byte dispatch — PNG/BMP/JPEG/TIFF all work), grayscale if
    needed, then mean/std/edge-energy/thumbnail features. One fused
    Arrow stage per batch of blobs, mirroring the ETL DoFn fusion."""

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                # magic-byte dispatch: PNG/BMP/JPEG/TIFF payloads all work
                img = decode_image(bytes(r["payload"]))
                if img.ndim == 3:
                    img = to_grayscale(img)
                g = img.shape[0]
                th = img.reshape(2, g // 2, 2, g // 2).mean(axis=(1, 3))
                rows.append(
                    {
                        "image_id": int(r["image_id"]),
                        "mean_v": round(float(img.mean()), 6),
                        "std_v": round(float(img.std()), 6),
                        "edge_energy": round(
                            float(sobel_magnitude(img).mean()), 6
                        ),
                        "thumb_tl": round(float(th[0, 0]), 6),
                        "thumb_br": round(float(th[1, 1]), 6),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "mean_v", "std_v", "edge_energy",
                    "thumb_tl", "thumb_br",
                ],
            )

    return df.mapInPandas(
        features,
        schema="image_id int, mean_v double, std_v double, edge_energy double,"
        " thumb_tl double, thumb_br double",
    )


@register("multimodal_image_features", oracle=None, tags=("multimodal", "udf"))
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage 2: decode the binary column and extract features — the
    registered composition of the two stages."""
    return image_features_df(images_as_binary_table(spark, sf_dir))


# ---------------------------------------------------------------------------
# Audio / video: real plumbing, STUBBED codecs
# ---------------------------------------------------------------------------


def fake_audio_codec(payload: bytes) -> np.ndarray:
    """Deterministic FAKE decoder for tests: bytes → int16 'samples'
    (byte b → b·257 − 32768, the exact uint8→int16 range expansion)."""
    wide = np.frombuffer(payload, dtype=np.uint8).astype(np.int32) * 257 - 32768
    return wide.astype(np.int16)


def decode_audio(payload: bytes, codec=None) -> np.ndarray:
    """STUB (SURVEY multimodal contract): audio decoding requires codec
    libraries not present in this container. The Spark-side plumbing
    (binary column in, feature columns out via ``audio_features``) is
    real; pass ``codec=fake_audio_codec`` in tests."""
    if codec is None:
        raise NotImplementedError(
            "audio codec libraries unavailable in this environment; "
            "inject a codec callable (see fake_audio_codec)"
        )
    return codec(payload)


def decode_video_frames(payload: bytes, every_nth: int = 10, codec=None):
    """STUB: frame sampling for video blobs; same contract as audio."""
    if codec is None:
        raise NotImplementedError(
            "video codec libraries unavailable in this environment; "
            "inject a codec callable"
        )
    frames = codec(payload)
    return frames[::every_nth]


def audio_features_df(df: DataFrame, codec=fake_audio_codec) -> DataFrame:
    """(key, payload binary) → per-blob audio features via mapInPandas —
    the multimodal consumer stage with the codec injected."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                samples = decode_audio(bytes(r["payload"]), codec=codec).astype(
                    np.int64
                )  # widen before abs: |int16 -32768| overflows int16
                rms = float(np.sqrt(np.mean(samples.astype(np.float64) ** 2)))
                rows.append(
                    {
                        "key": int(r["key"]),
                        "n_samples": int(len(samples)),
                        "rms": round(rms, 6),
                        "peak": int(np.abs(samples).max()) if len(samples) else 0,
                    }
                )
            yield pd.DataFrame(
                rows, columns=["key", "n_samples", "rms", "peak"]
            )

    return df.mapInPandas(
        feats, schema="key int, n_samples long, rms double, peak int"
    )


def fake_video_codec(payload: bytes, frame: int = 4) -> np.ndarray:
    """Deterministic FAKE video decoder for tests: bytes → (n, f, f)
    uint8 'frames' (truncating to whole frames)."""
    buf = np.frombuffer(payload, dtype=np.uint8)
    n = len(buf) // (frame * frame)
    return buf[: n * frame * frame].reshape(n, frame, frame)


def video_frame_features_df(
    df: DataFrame, codec=fake_video_codec, every_nth: int = 10
) -> DataFrame:
    """(key, payload binary) → one row per SAMPLED frame (every_nth),
    with per-frame mean/std — the video consumer stage: frame sampling
    happens inside the executor (the blob never moves), and the fan-out
    to frames is a mapInPandas yielding multiple rows per blob."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                frames = decode_video_frames(
                    bytes(r["payload"]), every_nth=every_nth, codec=codec
                )
                for i, fr in enumerate(frames):
                    rows.append(
                        {
                            "key": int(r["key"]),
                            "frame_idx": i * every_nth,
                            "mean_v": round(float(fr.mean()), 6),
                            "std_v": round(float(fr.std()), 6),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["key", "frame_idx", "mean_v", "std_v"]
            )

    return df.mapInPandas(
        feats, schema="key int, frame_idx int, mean_v double, std_v double"
    )


def image_resize_df(
    spark: SparkSession, sf_dir: str, out_size: int = 8
) -> DataFrame:
    """Resize stage for the multimodal image table: decode → nearest-
    neighbor resize to (out_size, out_size) → re-encode. Same
    blob-stays-on-executor contract; the resized payload is the
    downstream-training-ready artifact."""
    from ..functions.imaging import _resize_nearest

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                img = decode_image(bytes(r["payload"]))
                if img.ndim == 3:
                    img = to_grayscale(img)
                small = _resize_nearest(img, (out_size, out_size))
                png = encode_png(small.astype(np.uint8))
                rows.append(
                    {
                        "image_id": int(r["image_id"]),
                        "format": "png",
                        "width": out_size,
                        "height": out_size,
                        "n_bytes": len(png),
                        "payload": png,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "format", "width", "height",
                    "n_bytes", "payload",
                ],
            )

    return images_as_binary_table(spark, sf_dir).mapInPandas(
        resize, schema=IMAGE_TABLE_SCHEMA
    )


@register(
    "multimodal_audio_features",
    oracle=None,  # binary UDF stage; value-pinned by pytest instead
    tags=("multimodal", "audio", "udf"),
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio consumer stage on the driver surface: documents' utf-8
    bytes stand in as deterministic 'audio' payloads (the codec is the
    clearly-marked fake — real codecs aren't in this container; the
    Spark plumbing is the product). Per blob: sample count, RMS, peak.
    Limited to 100 blobs: the point is the stage shape, not volume."""
    from ..sources.fixtures import load_table as _t

    d = _t(spark, sf_dir, "documents").filter("doc_id < 100")
    payloads = d.selectExpr(
        "CAST(doc_id AS INT) AS key", "CAST(text AS BINARY) AS payload"
    )
    return audio_features_df(payloads, codec=fake_audio_codec)


@register(
    "multimodal_video_frame_sample",
    oracle=None,  # binary UDF stage; value-pinned by pytest instead
    tags=("multimodal", "video", "udf"),
)
def multimodal_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video consumer stage on the driver surface: every-10th-frame
    sampling inside the executor (blob never moves), one output row per
    sampled frame with per-frame stats. Fake 16-byte 4×4 'frames' from
    document bytes; the fan-out shape (1 blob → n frame rows) is what a
    real decoder produces."""
    from ..sources.fixtures import load_table as _t

    d = _t(spark, sf_dir, "documents").filter("doc_id < 100")
    payloads = d.selectExpr(
        "CAST(doc_id AS INT) AS key", "CAST(text AS BINARY) AS payload"
    )
    return video_frame_features_df(payloads, codec=fake_video_codec, every_nth=10)
