"""Multimodal column plumbing: opaque binary media + typed metadata.

Images/audio/video travel as opaque `binary` columns with a typed
metadata struct. Decode / feature-extract / resize / frame-sample run
as Arrow-batched UDFs over mapInPandas — the Spark-side shape
(schema, batching, partitioning) is real and tested; the actual codec
step is STUBBED because no image/audio libraries exist in this
container: `decode_real` raises NotImplementedError behind an
import-try, and the default path synthesizes a deterministic fake
payload from the media_ref (so downstream operators exercise real
bytes with stable contents).
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


def _try_real_decoder():
    try:
        import PIL.Image  # noqa: F401  (not present in this container)
        return True
    except ImportError:
        return False


def decode_real(payload: bytes) -> np.ndarray:
    """Real decode path — requires an imaging library. STUB: clearly
    not implemented in this environment (SURVEY.md §7.3 env facts)."""
    raise NotImplementedError(
        "image/audio codecs are not available in this container; "
        "the deterministic fake decoder below exercises the plumbing")


def _fake_decode(media_ref: str) -> tuple[tuple, bytes, np.ndarray]:
    """Deterministic fake: bytes + features derived from media_ref so
    every run (and the Spark vs oracle comparison) agrees bit-exactly."""
    h = hashlib.sha256(media_ref.encode()).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
    w, hgt = 64 + h[0] % 192, 64 + h[1] % 192
    payload = rng.integers(0, 256, 256, dtype=np.uint8).tobytes()
    feats = rng.standard_normal(N_FEATURES).astype(np.float32)
    return (int(w), int(hgt), 3, "fake/v1"), payload, feats


def decode_media(media: DataFrame) -> DataFrame:
    """(doc_id, media_ref) -> decoded rows with metadata, payload and a
    feature vector. mapInPandas: batch-granular, partition-preserving,
    no shuffle; at scale the binary payload column stays columnar
    (Arrow) end to end."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas, payloads, feats = [], [], []
            for ref in pdf["media_ref"]:
                meta, payload, fv = _fake_decode(ref)
                metas.append({"width": meta[0], "height": meta[1],
                              "channels": meta[2], "codec": meta[3]})
                payloads.append(payload)
                feats.append(fv)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"], "media_ref": pdf["media_ref"],
                "meta": metas, "payload": payloads, "features": feats})

    return media.select("doc_id", "media_ref").mapInPandas(gen, DECODED_SCHEMA)


def frame_sample(decoded: DataFrame, every_n: int = 4) -> DataFrame:
    """'Frame sampling' over the fake payload: keep every n-th byte as
    a frame signature — stands in for video frame extraction; the
    operator shape (per-row array expansion, posexplode) is the real
    thing."""
    return (decoded
            .withColumn("frames", F.expr(
                f"transform(sequence(1, 256, {every_n}), i -> substring(payload, i, 1))"))
            .select("doc_id", "media_ref",
                    F.posexplode("frames").alias("frame_idx", "frame_sig")))
