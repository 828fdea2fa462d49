"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

North-star family (SURVEY.md §2.2). Design for 100 TB of media:

* content is an opaque ``binary`` column (or a reference into object
  storage for large assets) with a typed ``struct`` of metadata
  (modality, format, dims, duration);
* decode / feature-extract / resize / frame-sample run as Arrow-batched
  pandas functions over ``mapInPandas`` — per-partition batches keep
  peak memory to batch-size × asset-size, and partitioning by content
  hash spreads hot assets;
* real codecs (PIL/ffmpeg/soundfile) are NOT in this container, so the
  decode kernels are import-gated: with the library absent they raise
  ``NotImplementedError`` (real plumbing, stubbed codec), while
  :func:`fake_decode_features` provides a deterministic byte-level
  "decode" so schema/batching/partitioning are fully testable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("modality", T.StringType()),  # image|audio|video
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("content_hash", T.StringType()),
    ]
)


def documents_as_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapter: treat document text bytes as fake 'image' payloads so the
    media plumbing has deterministic test data in this container."""
    return docs.select(
        F.col(id_col).alias("asset_id"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.struct(
            F.lit("image").alias("modality"),
            F.lit("fake").alias("format"),
            F.lit(64).cast("int").alias("width"),
            F.lit(64).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def _require(modname: str):
    try:
        return __import__(modname)
    except ImportError as exc:  # pragma: no cover - container has no codecs
        raise NotImplementedError(
            f"real decode needs {modname!r}, which is not installed; "
            "use fake_decode_features for the plumbing path"
        ) from exc


def decode_image(content: bytes):  # pragma: no cover - codec absent here
    """Real image decode (PIL). STUB: raises NotImplementedError without PIL."""
    pil = _require("PIL.Image")
    return pil.Image.open(__import__("io").BytesIO(content))


def resize_image(content: bytes, w: int, h: int):  # pragma: no cover
    img = decode_image(content)
    return img.resize((w, h))


def sample_frames(content: bytes, every_ms: int):  # pragma: no cover
    _require("av")
    raise NotImplementedError("frame sampling needs pyav/ffmpeg")


def fake_decode_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction with a deterministic byte-level
    'decode' (length, mean byte value, first byte, md5) — exercises the
    exact Arrow batch path a real decoder uses."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["meta"].map(
                        lambda m: m["modality"] if m is not None else None
                    ),
                    "n_bytes": content.map(lambda b: len(b) if b is not None else 0).astype(
                        "int64"
                    ),
                    "byte_mean": content.map(
                        lambda b: float(sum(b)) / len(b) if b else 0.0
                    ),
                    "first_byte": content.map(
                        lambda b: int(b[0]) if b else -1
                    ).astype("int32"),
                    "content_hash": content.map(
                        lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                    ),
                }
            )

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)
