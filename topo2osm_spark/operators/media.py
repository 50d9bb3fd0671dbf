"""Multimodal column plumbing: opaque binary media + typed metadata.

Images/audio/video travel as opaque `binary` columns with a typed
metadata struct. Decode / feature-extract / resize / frame-sample run
as Arrow-batched UDFs over mapInPandas — batch-granular, partition-
preserving, the binary payload stays columnar (Arrow) end to end.

The decode step is REAL for container-safe codecs implemented in pure
numpy: binary PPM (P6) images and RIFF/WAVE PCM16 audio — parsing,
pixel/sample math, resize and feature extraction all execute on the
actual bytes. Compressed codecs (JPEG/PNG/...) dispatch to Pillow
when available and raise a clear NotImplementedError in this container
(no imaging libs — SURVEY.md §7.3 env facts). Rows with no payload at
all fall back to a deterministic fake derived from media_ref so the
pipeline's ref-only media spans still exercise stable bytes.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_META = T.StructType([
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("codec", T.StringType()),
])

DECODED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("media_ref", T.StringType()),
    T.StructField("meta", MEDIA_META),
    T.StructField("payload", T.BinaryType()),
    T.StructField("features", T.ArrayType(T.FloatType())),
])

N_FEATURES = 16


# ------------------------------------------------------------------
# real codecs (pure numpy — no external libraries)

def encode_ppm(img: np.ndarray) -> bytes:
    """uint8 (h, w, 3) -> binary PPM (P6)."""
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_ppm expects uint8 (h, w, 3)")
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) -> uint8 (h, w, 3). Handles comment lines and
    arbitrary whitespace per the netpbm spec."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while pos < len(payload) and payload[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    n = w * h * 3
    arr = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    return arr.reshape(h, w, 3)


def encode_wav_pcm16(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 mono samples -> RIFF/WAVE PCM16 bytes."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    import struct
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    chunks = (b"WAVE"
              + b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def decode_wav_pcm16(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 -> (int16 samples, sample_rate). Walks the chunk
    list (fmt may be padded / followed by LIST etc. in real files)."""
    import struct
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack("<HHI", body[:8])
            if audio_fmt != 1 or channels != 1:
                raise ValueError("only PCM mono supported")
        elif cid == b"data":
            data = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return data, rate


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize via index sampling (pure numpy)."""
    h, w = img.shape[:2]
    ys = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    xs = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return img[ys][:, xs]


def image_features(img: np.ndarray) -> np.ndarray:
    """16-dim feature vector: per-channel mean+std (6) + 10-bin
    normalized grayscale histogram."""
    f = np.empty(N_FEATURES, dtype=np.float32)
    x = img.astype(np.float32)
    f[0:3] = x.mean(axis=(0, 1)) / 255.0
    f[3:6] = x.std(axis=(0, 1)) / 255.0
    gray = x.mean(axis=2)
    hist, _ = np.histogram(gray, bins=10, range=(0.0, 255.0))
    f[6:16] = hist / max(1, gray.size)
    return f


def audio_features(samples: np.ndarray) -> np.ndarray:
    """16-dim: mean, std, rms, zero-crossing rate + 12 log-magnitude
    FFT band energies (real DSP on the decoded samples)."""
    f = np.zeros(N_FEATURES, dtype=np.float32)
    x = samples.astype(np.float32) / 32768.0
    if x.size == 0:
        return f
    f[0], f[1] = x.mean(), x.std()
    f[2] = float(np.sqrt((x * x).mean()))
    f[3] = float((np.diff(np.signbit(x)) != 0).mean()) if x.size > 1 else 0.0
    spec = np.abs(np.fft.rfft(x))
    bands = np.array_split(spec, 12)
    f[4:16] = [float(np.log1p(b.mean())) if b.size else 0.0 for b in bands]
    return f


def decode_payload(payload: bytes) -> tuple[tuple, np.ndarray]:
    """Sniff + decode one payload. Returns ((w, h, channels, codec),
    features). PPM and WAV decode in pure numpy; compressed codecs
    need Pillow (absent in this container -> NotImplementedError)."""
    if payload[:2] == b"P6":
        img = decode_ppm(payload)
        return ((img.shape[1], img.shape[0], 3, "ppm"),
                image_features(img))
    if payload[:4] == b"RIFF":
        samples, rate = decode_wav_pcm16(payload)
        return ((int(samples.size), 1, 1, f"wav/pcm16@{rate}"),
                audio_features(samples))
    try:
        import io
        import PIL.Image
        img = np.asarray(PIL.Image.open(io.BytesIO(payload)).convert("RGB"))
        return ((img.shape[1], img.shape[0], 3, "pil"),
                image_features(img))
    except ImportError:
        raise NotImplementedError(
            "compressed codecs need an imaging library (none in this "
            "container); PPM/WAV decode natively")


def synth_ppm(media_ref: str, size: int = 24) -> bytes:
    """Deterministic real PPM image derived from media_ref: a gradient
    + hash-seeded noise. Used by fixtures/queries to feed the REAL
    decode path without external data."""
    h8 = hashlib.sha256(media_ref.encode()).digest()
    rng = np.random.default_rng(int.from_bytes(h8[:8], "little"))
    yy, xx = np.mgrid[0:size, 0:size]
    img = np.stack([
        (255 * xx / max(1, size - 1)),
        (255 * yy / max(1, size - 1)),
        rng.integers(0, 256, (size, size)),
    ], axis=2).astype(np.uint8)
    return encode_ppm(img)


def _fake_decode(media_ref: str) -> tuple[tuple, bytes, np.ndarray]:
    """Deterministic fallback for ref-only rows (no payload bytes):
    bytes + features derived from media_ref so every run (and the
    Spark vs oracle comparison) agrees bit-exactly."""
    h = hashlib.sha256(media_ref.encode()).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
    w, hgt = 64 + h[0] % 192, 64 + h[1] % 192
    payload = rng.integers(0, 256, 256, dtype=np.uint8).tobytes()
    feats = rng.standard_normal(N_FEATURES).astype(np.float32)
    return (int(w), int(hgt), 3, "fake/v1"), payload, feats


def decode_media(media: DataFrame) -> DataFrame:
    """(doc_id, media_ref[, payload]) -> decoded rows with metadata,
    payload and a feature vector. With a binary `payload` column the
    REAL decoder runs (PPM/WAV in pure numpy); without one, the
    deterministic ref-derived fake keeps the plumbing exercised.
    mapInPandas: batch-granular, partition-preserving, no shuffle."""
    has_payload = "payload" in media.columns

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas, payloads, feats = [], [], []
            pl = pdf["payload"] if has_payload else [None] * len(pdf)
            for ref, payload in zip(pdf["media_ref"], pl):
                if payload is not None:
                    (w, h, c, codec), fv = decode_payload(bytes(payload))
                    out_payload = bytes(payload)
                else:
                    (w, h, c, codec), out_payload, fv = _fake_decode(ref)
                metas.append({"width": w, "height": h,
                              "channels": c, "codec": codec})
                payloads.append(out_payload)
                feats.append(fv)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"], "media_ref": pdf["media_ref"],
                "meta": metas, "payload": payloads, "features": feats})

    cols = ["doc_id", "media_ref"] + (["payload"] if has_payload else [])
    return media.select(*cols).mapInPandas(gen, DECODED_SCHEMA)


def with_synth_payload(media: DataFrame, size: int = 24) -> DataFrame:
    """Attach a deterministic REAL PPM payload derived from media_ref
    (fixture/bench helper — lets the real decode path run without
    external data)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [synth_ppm(r, size) for r in pdf["media_ref"]]
            yield pdf

    schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ])
    return media.select("doc_id", "media_ref").mapInPandas(gen, schema)


def frame_sample(decoded: DataFrame, every_n: int = 4) -> DataFrame:
    """'Frame sampling' over the payload: keep every n-th byte as a
    frame signature — stands in for video frame extraction; the
    operator shape (per-row array expansion, posexplode) is the real
    thing."""
    return (decoded
            .withColumn("frames", F.expr(
                f"transform(sequence(1, 256, {every_n}), i -> substring(payload, i, 1))"))
            .select("doc_id", "media_ref",
                    F.posexplode("frames").alias("frame_idx", "frame_sig")))
