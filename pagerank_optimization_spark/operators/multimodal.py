"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
pipelines.

The container has no image/audio libraries, so the actual codec step is a
STUB behind an import-try (``decode_with_real_codec`` raises
NotImplementedError unless PIL is importable); everything around it — the
media schema, deterministic synthesis, batch iteration shape, vectorized
numpy feature extraction, frame sampling, partition behavior — is real and
tested. On a cluster with codecs installed, only ``_decode_payload``
changes.

Design rules for 100 TB media tables:
- payloads stay binary end-to-end (never hex/base64 strings — 2-4× bloat);
- metadata (kind, width/height, sample_rate, duration) lives in plain
  columns so predicate pushdown prunes without touching payload bytes;
- feature extraction is ``mapInPandas`` over Arrow batches — per-batch
  numpy over a contiguous byte buffer, no per-row Python objects beyond the
  unavoidable bytes cells;
- decode fan-out (video → frames) uses the iterator contract to emit
  multiple rows per input row without materializing whole partitions.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta", T.StructType(
            [
                T.StructField("width", T.IntegerType(), True),
                T.StructField("height", T.IntegerType(), True),
                T.StructField("sample_rate", T.IntegerType(), True),
                T.StructField("n_frames", T.IntegerType(), True),
            ]
        ), False),
    ]
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes int, byte_mean double, byte_std double, histogram array<int>"
FRAME_SCHEMA = "media_id long, frame_idx int, frame_bytes binary"


def synthesize_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload bytes are a seeded hash
    stream (stands in for encoded pixels/samples); metadata consistent with
    the payload length. Generated distributed via spark.range."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.col("id") % 3 + 1).cast("int")).alias("kind"),
    )
    # payload: concat of 32 hash-derived 8-byte words → 256 bytes each,
    # deterministic per (media_id, seed)
    words = F.concat(
        *[F.unhex(F.lpad(F.hex(F.xxhash64(F.col("media_id"), F.lit(seed + i))), 16, "0")) for i in range(32)]
    )
    w = (F.xxhash64("media_id", F.lit(seed)) % 32 + 32).cast("int")
    return df.select(
        "media_id",
        "kind",
        words.alias("payload"),
        F.struct(
            F.when(F.col("kind") == "image", F.abs(w)).alias("width"),
            F.when(F.col("kind") == "image", F.abs(w)).alias("height"),
            F.when(F.col("kind") == "audio", F.lit(16000)).alias("sample_rate"),
            F.when(F.col("kind") == "video", F.lit(8)).alias("n_frames"),
        ).alias("meta"),
    )


def decode_with_real_codec(payload: bytes, kind: str):
    """The real-codec hook. STUB: the sandbox has no PIL/ffmpeg — on a real
    cluster, swap in the actual decoder here (this is the ONLY line of the
    pipeline that changes)."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "media codecs not available in this environment; install "
            "pillow/av and implement decode_with_real_codec"
        ) from e
    raise NotImplementedError("real codec path not wired in the sandbox")


def _decode_payload(payload: bytes) -> np.ndarray:
    """Deterministic fake decode: payload bytes AS the sample/pixel buffer.
    Keeps the downstream numpy math real while the codec is stubbed."""
    return np.frombuffer(payload, dtype=np.uint8)


def extract_features(media: DataFrame, *, n_bins: int = 16) -> DataFrame:
    """Byte-level feature extraction per media row — the plumbing shape of
    an image/audio featurizer: mapInPandas, per-batch numpy over stacked
    buffers, one output row per input row."""
    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            arrs = [_decode_payload(p) for p in pdf["payload"]]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "kind": pdf["kind"].values,
                    "n_bytes": [len(a) for a in arrs],
                    "byte_mean": [float(a.mean()) for a in arrs],
                    "byte_std": [float(a.std()) for a in arrs],
                    "histogram": [
                        np.histogram(a, bins=n_bins, range=(0, 256))[0].astype("int32").tolist()
                        for a in arrs
                    ],
                }
            )
            yield out

    return media.mapInPandas(featurize, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, *, every: int = 2) -> DataFrame:
    """Video frame sampling: fan each video row out into ceil(n_frames/every)
    frame rows (payload sliced deterministically per frame) — the iterator
    contract emits multiple rows per input without partition blowup."""
    def sampler(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids = pdf[pdf["kind"] == "video"]
            if vids.empty:
                yield pd.DataFrame(
                    {"media_id": pd.Series(dtype="int64"),
                     "frame_idx": pd.Series(dtype="int32"),
                     "frame_bytes": pd.Series(dtype=object)}
                )
                continue
            # vectorized fan-out bookkeeping: per-row frame counts → one
            # np.repeat/np.concatenate pass builds the (row, frame) index;
            # only the final byte-slice touches Python objects (bytes cells
            # are unavoidably objects in pandas)
            n_frames = np.array(
                [int(m["n_frames"] or 0) for m in vids["meta"]], dtype=np.int64
            )
            counts = np.maximum((n_frames + every - 1) // every, 0)
            row_idx = np.repeat(np.arange(len(vids)), counts)
            frame_idx = np.concatenate(
                [np.arange(0, n, every) for n in n_frames]
            ) if counts.sum() else np.empty(0, dtype=np.int64)
            payloads = vids["payload"].to_numpy()
            steps = np.maximum(
                np.array([len(b) for b in payloads]) // np.maximum(n_frames, 1), 1
            )
            blobs = [
                bytes(payloads[r][fi * steps[r] : (fi + 1) * steps[r]])
                for r, fi in zip(row_idx, frame_idx)
            ]
            yield pd.DataFrame(
                {
                    "media_id": vids["media_id"].to_numpy()[row_idx],
                    "frame_idx": frame_idx.astype("int32"),
                    "frame_bytes": blobs,
                }
            )

    return media.mapInPandas(sampler, schema=FRAME_SCHEMA)


def resize_stub(media: DataFrame, *, width: int, height: int) -> DataFrame:
    """Image resize plumbing: the geometry bookkeeping is real (meta is
    rewritten), the pixel resample is the deterministic fake (truncate/pad
    the byte buffer to the target size) until a real codec is installed."""
    target = width * height

    def resizer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mask = pdf["kind"] == "image"
            pdf = pdf[mask].copy()
            pdf["payload"] = [
                bytes(_decode_payload(p)[:target].tobytes().ljust(target, b"\0"))
                for p in pdf["payload"]
            ]
            pdf["meta"] = [
                {"width": width, "height": height, "sample_rate": None, "n_frames": None}
                for _ in range(len(pdf))
            ]
            yield pdf

    return media.mapInPandas(resizer, schema=MEDIA_SCHEMA)
