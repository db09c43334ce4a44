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
