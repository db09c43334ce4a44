"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads travel as ``binary`` columns with typed
metadata alongside; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` (the only sanctioned Python hot path). The decode
libraries (PIL/ffmpeg/etc.) are not in this container, so the decode
step is STUBBED behind ``decode_image`` (NotImplementedError) with a
deterministic fake used in its place — the Spark-side plumbing (schema,
partitioning, UDF signature, Arrow batch shape) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)


def attach_binary(df: DataFrame, text_col: str, out_col: str = "payload") -> DataFrame:
    """Wrap a text column as the opaque binary payload (stand-in for
    real image/audio bytes in this container)."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "utf-8"))


def decode_image(payload: bytes) -> tuple[int, int, str]:
    """Real decoder hook — requires an image library not present here."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv, not available in this environment; "
        "extract_features uses the deterministic fake instead"
    )


def _fake_decode(n_bytes: pd.Series, first: pd.Series) -> pd.DataFrame:
    """Deterministic stand-in: dimensions derived from payload stats —
    exercises the exact batch shape a real decoder would produce."""
    width = (n_bytes % 640 + 16).astype("int32")
    height = ((n_bytes // 7) % 480 + 16).astype("int32")
    fmt = pd.Series(["fake/v1"] * len(n_bytes))
    return pd.DataFrame({"width": width, "height": height, "format": fmt})


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Real resize hook — requires an image library not present here."""
    raise NotImplementedError(
        "image resize requires PIL/opencv, not available in this environment; "
        "resize_images uses the deterministic tile-fake instead"
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
    ]
)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Batch resize plumbing: binary in -> fixed-size binary out.

    Deterministic fake (no PIL in this container): the payload is tiled
    or truncated to exactly ``width*height`` bytes — the real decoder
    drops into :func:`resize_image` with the identical batch shape.
    Rows with empty payloads are dropped (undecodable)."""
    import numpy as np

    target = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keep = pdf[payload_col].str.len().fillna(0) > 0
            pdf = pdf[keep]
            resized = [
                bytes(np.tile(np.frombuffer(p, dtype=np.uint8),
                              (target // len(p)) + 1)[:target])
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": width,
                    "height": height,
                    "resized": resized,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("pts_ms", T.LongType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)

FRAME_BYTES = 256
FRAME_MS = 40  # 25 fps


def sample_frames(
    df: DataFrame,
    every_n: int = 4,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Video frame-sampling plumbing: one input row fans out to one row
    per sampled frame (mapInPandas rows-out > rows-in).

    Deterministic fake codec: the payload is a sequence of complete
    ``FRAME_BYTES``-byte frames at 25 fps; every ``every_n``-th frame is
    emitted with its index, presentation timestamp, and content md5 —
    the per-frame hash stands in for the real per-frame decode work a
    C-library codec would do inside the same Arrow batch loop."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, pts, digests = [], [], [], []
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:
                    continue
                n_frames = len(p) // FRAME_BYTES
                for i in range(0, n_frames, every_n):
                    ids.append(doc_id)
                    idxs.append(i)
                    pts.append(i * FRAME_MS)
                    digests.append(
                        hashlib.md5(p[i * FRAME_BYTES:(i + 1) * FRAME_BYTES]).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "pts_ms": pd.Series(pts, dtype="int64"),
                    "frame_md5": pd.Series(digests, dtype="object"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, FRAME_SCHEMA)


def extract_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` streams column batches; everything inside is
    vectorized pandas/numpy — no per-row Python."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf[payload_col]
            n_bytes = payload.str.len().fillna(0).astype("int64")
            first = payload.str[0].fillna(0).astype("int32")  # vectorized byte access
            fake = _fake_decode(n_bytes, first)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": n_bytes,
                    "first_byte": first,
                    "width": fake["width"],
                    "height": fake["height"],
                    "format": fake["format"],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, FEATURE_SCHEMA)
