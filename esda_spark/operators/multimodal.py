"""Multimodal (image/audio/video) columns over opaque ``binary``.

Typed metadata + Arrow-batched ``mapInPandas`` kernels.  Decoding is
REAL for the container-independent formats — BMP (24-bit BI_RGB),
PPM/PGM (binary P6/P5), and WAV (16-bit PCM) are parsed with numpy
alone — so decode / feature-extract / resize / audio analysis run end
to end on genuine bytes.  Compressed codecs (JPEG/PNG/H.264) need
libraries absent from this image: those formats raise
``NotImplementedError`` with the magic bytes they saw, and video frame
*extraction* stays stubbed (only the sampling plumbing is real).

Matching encoders (`encode_bmp`, `encode_ppm`, `encode_wav`) exist so
tests and the synthetic table produce real files, round-tripped
bit-exactly.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_SCHEMA = (
    "doc_id long, width int, height int, channels int, payload binary"
)


# --- codecs (pure numpy) ----------------------------------------------------

def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit uncompressed BMP bytes."""
    h, w, c = arr.shape
    assert c == 3
    row_pad = (-(w * 3)) % 4
    body_size = (w * 3 + row_pad) * h
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + body_size, 0, 0, 14 + 40
    )
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, body_size, 2835, 2835, 0, 0
    )
    bgr = arr[::-1, :, ::-1]  # bottom-up rows, BGR order
    rows = np.zeros((h, w * 3 + row_pad), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    return header + info + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack("<I", payload[10:14])[0]
    (hdr_sz, w, h, _planes, bpp, comp) = struct.unpack(
        "<IiiHHI", payload[14:34]
    )
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"only 24-bit BI_RGB BMP decodable without codec libs "
            f"(got bpp={bpp}, compression={comp})"
        )
    row_pad = (-(w * 3)) % 4
    flip = h > 0
    h = abs(h)
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=(w * 3 + row_pad) * h, offset=offset
    ).reshape(h, w * 3 + row_pad)[:, : w * 3].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]
    return rgb[::-1] if flip else rgb


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary PPM (P6); (h, w) -> PGM (P5)."""
    if arr.ndim == 2:
        h, w = arr.shape
        return b"P5\n%d %d\n255\n" % (w, h) + arr.tobytes()
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError("not a binary PPM/PGM payload")
    # header: magic, whitespace-separated w, h, maxval, single whitespace
    parts: list[int] = []
    i = 2
    while len(parts) < 3:
        while payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment to EOL
            while payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while not payload[j : j + 1].isspace():
            j += 1
        parts.append(int(payload[i:j]))
        i = j
    i += 1  # the single whitespace after maxval
    w, h, _maxval = parts
    c = 3 if magic == b"P6" else 1
    arr = np.frombuffer(payload, dtype=np.uint8, count=w * h * c, offset=i)
    return arr.reshape(h, w, 3) if c == 3 else arr.reshape(h, w)


def decode_image(payload: bytes) -> np.ndarray:
    """Dispatch on magic bytes; JPEG/PNG raise (codec libs absent)."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] in (b"P5", b"P6"):
        img = decode_ppm(payload)
        return img if img.ndim == 3 else img[:, :, None]
    if payload[:3] == b"\xff\xd8\xff":
        raise NotImplementedError("JPEG decode requires libjpeg")
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        raise NotImplementedError("PNG decode requires zlib-based codec")
    raise ValueError(f"unrecognized image magic {payload[:4]!r}")


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """1-D float in [-1, 1] or int16 -> 16-bit PCM mono WAV."""
    if samples.dtype != np.int16:
        samples = np.clip(samples, -1.0, 1.0)
        samples = (samples * 32767.0).astype(np.int16)
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (int16 samples, sample_rate); 16-bit PCM only."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    i = 12
    rate, bits, channels = None, None, None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        sz = struct.unpack("<I", payload[i + 4 : i + 8])[0]
        if cid == b"fmt ":
            audio_fmt, channels, rate, _, _, bits = struct.unpack(
                "<HHIIHH", payload[i + 8 : i + 24]
            )
            if audio_fmt != 1 or bits != 16:
                raise NotImplementedError(
                    "only 16-bit PCM WAV decodable without codec libs"
                )
        elif cid == b"data":
            samples = np.frombuffer(
                payload, dtype="<i2", count=sz // 2, offset=i + 8
            )
            if channels and channels > 1:
                samples = samples.reshape(-1, channels)
            return samples, int(rate)
        i += 8 + sz + (sz % 2)
    raise ValueError("WAV data chunk not found")


# --- synthetic tables (REAL encoded payloads) -------------------------------

def synth_image_table(docs: DataFrame, fmt: str = "bmp") -> DataFrame:
    """Deterministic real-format image rows derived from doc ids: a
    seeded gradient pattern encoded as actual BMP or PPM bytes."""

    @F.pandas_udf(T.BinaryType())
    def make(doc_id: pd.Series, w: pd.Series, h: pd.Series) -> pd.Series:
        out = []
        for d, ww, hh in zip(doc_id, w, h):
            rng = np.random.default_rng(int(d))
            base = rng.integers(0, 255, size=3, dtype=np.int64)
            yy, xx = np.mgrid[0:int(hh), 0:int(ww)]
            arr = (
                (base[None, None, :] + yy[:, :, None] * 3 + xx[:, :, None])
                % 256
            ).astype(np.uint8)
            out.append(encode_bmp(arr) if fmt == "bmp" else encode_ppm(arr))
        return pd.Series(out)

    return docs.select(
        F.col("doc_id"),
        (F.col("doc_id") % 64 + 32).cast("int").alias("width"),
        (F.col("doc_id") % 48 + 24).cast("int").alias("height"),
        F.lit(3).cast("int").alias("channels"),
    ).withColumn(
        "payload", make(F.col("doc_id"), F.col("width"), F.col("height"))
    )


def synth_audio_table(docs: DataFrame, rate: int = 8000,
                      seconds: float = 0.25) -> DataFrame:
    """Deterministic real WAV rows: a doc-seeded sine + noise clip."""

    @F.pandas_udf(T.BinaryType())
    def make(doc_id: pd.Series) -> pd.Series:
        out = []
        n = int(rate * seconds)
        t = np.arange(n) / rate
        for d in doc_id:
            rng = np.random.default_rng(int(d))
            f0 = 100.0 + (int(d) % 20) * 25.0
            sig = 0.5 * np.sin(2 * np.pi * f0 * t) \
                + 0.05 * rng.standard_normal(n)
            out.append(encode_wav(sig, rate))
        return pd.Series(out)

    return docs.select("doc_id").withColumn("payload", make(F.col("doc_id")))


# --- operators --------------------------------------------------------------

def image_features(images: DataFrame) -> DataFrame:
    """(doc_id, width, height, channels, mean, std, n_pixels): real
    decode (BMP/PPM/PGM) + per-image statistics.  The Arrow batch shape
    is the scale-relevant part: each partition streams batches of
    (payload, metadata), the kernel decodes and reduces per row, and
    output rows align 1:1 with input rows."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                arr = decode_image(bytes(row.payload))
                rows.append((
                    int(row.doc_id), int(arr.shape[1]), int(arr.shape[0]),
                    int(arr.shape[2]), float(arr.mean()), float(arr.std()),
                    int(arr.shape[0] * arr.shape[1]),
                ))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "channels",
                               "mean", "std", "n_pixels"],
            )

    return images.select("doc_id", "payload").mapInPandas(
        feats,
        schema="doc_id long, width int, height int, channels int, "
               "mean double, std double, n_pixels long",
    )


def resize_images(images: DataFrame, out_w: int, out_h: int,
                  fmt: str = "ppm") -> DataFrame:
    """(doc_id, width, height, payload): nearest-neighbor resize of
    real decoded pixels, re-encoded (PPM by default — exact bytes,
    cheap to verify)."""

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for row in pdf.itertuples(index=False):
                arr = decode_image(bytes(row.payload))
                h, w = arr.shape[:2]
                yi = (np.arange(out_h) * h // out_h).astype(np.int64)
                xi = (np.arange(out_w) * w // out_w).astype(np.int64)
                small = arr[yi[:, None], xi[None, :]]
                if small.shape[2] == 1:
                    small = np.repeat(small, 3, axis=2)
                payloads.append(
                    encode_bmp(small) if fmt == "bmp" else encode_ppm(small)
                )
                ids.append(int(row.doc_id))
            yield pd.DataFrame({
                "doc_id": ids,
                "width": [out_w] * len(ids),
                "height": [out_h] * len(ids),
                "payload": payloads,
            })

    return images.select("doc_id", "payload").mapInPandas(
        rs, schema="doc_id long, width int, height int, payload binary"
    )


def audio_features(audio: DataFrame) -> DataFrame:
    """(doc_id, sample_rate, n_samples, duration_sec, rms, zcr):
    real WAV decode + standard clip features (root-mean-square level,
    zero-crossing rate)."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                samples, rate = decode_wav(bytes(row.payload))
                x = samples.astype(np.float64) / 32768.0
                if x.ndim > 1:
                    x = x.mean(axis=1)
                n = len(x)
                zc = float(np.mean(np.diff(np.signbit(x)) != 0)) if n > 1 else 0.0
                rows.append((
                    int(row.doc_id), rate, n, n / rate,
                    float(np.sqrt(np.mean(x * x))) if n else 0.0, zc,
                ))
            yield pd.DataFrame(
                rows, columns=["doc_id", "sample_rate", "n_samples",
                               "duration_sec", "rms", "zcr"],
            )

    return audio.select("doc_id", "payload").mapInPandas(
        feats,
        schema="doc_id long, sample_rate int, n_samples long, "
               "duration_sec double, rms double, zcr double",
    )


def frame_sample(
    videos: DataFrame, every_n: int = 10, fake_decode: bool = True
) -> DataFrame:
    """(doc_id, frame_idx): frame-sampling plumbing — emits the frame
    indices a real decoder would extract (1:N fan-out inside the Arrow
    kernel).  Actual frame extraction needs a video codec (absent);
    only the deterministic fake length path exists."""
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
