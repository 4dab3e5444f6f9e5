"""Multimodal (image/audio/video) column plumbing.

Opaque ``binary`` payload columns + typed metadata, processed by
Arrow-batched ``mapInPandas`` kernels.  The decode step is STUBBED
(the image/audio codecs are not in this container): pass
``fake_decode=True`` for a deterministic stand-in that exercises the
real Spark-side plumbing — schema, batching, partitioning, UDF
signature — which is what runs at scale; swapping the stub for a real
decoder (PIL/ffmpeg) changes only the inner function.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_SCHEMA = (
    "doc_id long, width int, height int, channels int, payload binary"
)


def synth_image_table(docs: DataFrame) -> DataFrame:
    """Deterministic fake image rows derived from doc ids (payload =
    seeded bytes; metadata = plausible dims)."""
    return docs.select(
        F.col("doc_id"),
        (F.col("doc_id") % 64 + 32).cast("int").alias("width"),
        (F.col("doc_id") % 48 + 24).cast("int").alias("height"),
        F.lit(3).cast("int").alias("channels"),
        F.encode(F.md5(F.col("doc_id").cast("string")), "utf-8").alias("payload"),
    )


def _fake_decode(payload: bytes, width: int, height: int, channels: int) -> np.ndarray:
    """Deterministic stand-in for an image decoder: tile the payload
    bytes into (h, w, c) uint8.  A real decoder would parse the codec."""
    raw = np.frombuffer(payload, dtype=np.uint8)
    need = width * height * channels
    reps = int(np.ceil(need / len(raw)))
    return np.tile(raw, reps)[:need].reshape(height, width, channels)


def image_features(
    images: DataFrame, fake_decode: bool = True, batch_note: str = "mean-std"
) -> DataFrame:
    """(doc_id, mean, std, n_pixels): decode + per-image features.

    The Arrow batch shape is the scale-relevant part: each partition
    streams batches of (payload, dims), the kernel vectorizes over the
    batch, and output rows align 1:1 with input rows.
    """
    if not fake_decode:
        raise NotImplementedError(
            "real image decoding requires PIL/libjpeg, not present in "
            "this container — use fake_decode=True for the plumbing path"
        )

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            means, stds, npix = [], [], []
            for row in pdf.itertuples(index=False):
                arr = _fake_decode(
                    bytes(row.payload), row.width, row.height, row.channels
                )
                means.append(float(arr.mean()))
                stds.append(float(arr.std()))
                npix.append(int(arr.shape[0] * arr.shape[1]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mean": means,
                    "std": stds,
                    "n_pixels": npix,
                }
            )

    return images.mapInPandas(
        feats, schema="doc_id long, mean double, std double, n_pixels long"
    )


def frame_sample(
    videos: DataFrame, every_n: int = 10, fake_decode: bool = True
) -> DataFrame:
    """(doc_id, frame_idx): frame-sampling plumbing — emits the frame
    indices a real decoder would extract; 1:N row fan-out inside the
    Arrow kernel."""
    if not fake_decode:
        raise NotImplementedError("real video decoding not available here")

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs = [], []
            for row in pdf.itertuples(index=False):
                n_frames = int(row.width) * 2  # deterministic fake length
                for i in range(0, n_frames, every_n):
                    ids.append(row.doc_id)
                    idxs.append(i)
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs})

    return videos.mapInPandas(sample, schema="doc_id long, frame_idx long")
