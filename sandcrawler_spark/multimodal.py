"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched UDFs.

The reference's analog is its PDF hook (pdfextract.py:264-407 —
poppler render of page 0 to a 180x300 thumbnail + text + dims); here
the same shape is generalized: decode/feature-extract/resize/
frame-sample are mapInPandas stages over `content:binary`.

The actual codec calls are STUBBED (Pillow/ffmpeg are not in this
container): `decode_image_stub` returns deterministic fake features
derived from the bytes (so tests pin the plumbing — schema,
partitioning, batch shape, null handling — end to end), and
`decode_image_real` raises NotImplementedError where the real
library call belongs. Swapping stub->real touches one function.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("sha1hex", T.StringType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("size_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("status", T.StringType()),
    ]
)


def decode_image_real(blob: bytes) -> dict:  # pragma: no cover - stub boundary
    """Real decoder hook. On a production cluster: PIL.Image.open ->
    size/mode/resize/embed. Not available in this sandbox."""
    raise NotImplementedError("image codec not available in this environment")


def decode_image_stub(blob: bytes) -> dict:
    """Deterministic fake decode: dims/features derived from content
    bytes, so the distributed plumbing is fully testable."""
    d = hashlib.sha1(blob).digest()
    return {
        "sha1hex": d.hex(),
        "width": 64 + d[0] % 1024,
        "height": 64 + d[1] % 1024,
        "n_frames": 1,
        "feature": [((b / 255.0) * 2 - 1) for b in d[:8]],
        "status": "success-stub",
    }


def extract_media_meta(
    df: DataFrame, blob_col: str = "content", media_type_col: str | None = None
) -> DataFrame:
    """mapInPandas media feature extraction: Arrow batches in, one
    typed metadata row per input row out. Batch-shape contract: the
    UDF must emit exactly one output row per input row (nulls produce
    status='null-body'), so lineage row counts hold."""

    mt_col = media_type_col

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                blob = pdf[blob_col].iloc[i]
                mt = pdf[mt_col].iloc[i] if mt_col else "image"
                if blob is None or len(blob) == 0:
                    rows.append(
                        {
                            "sha1hex": None,
                            "media_type": mt,
                            "size_bytes": 0,
                            "width": None,
                            "height": None,
                            "n_frames": None,
                            "feature": None,
                            "status": "null-body",
                        }
                    )
                    continue
                blob = bytes(blob)
                meta = decode_image_stub(blob)
                meta["media_type"] = mt
                meta["size_bytes"] = len(blob)
                rows.append(meta)
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_META_SCHEMA.fields])

    return df.select(blob_col, *( [mt_col] if mt_col else [] )).mapInPandas(
        _decode, schema=MEDIA_META_SCHEMA
    )


def frame_sample_plan(df: DataFrame, blob_col: str = "content", every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: emits (sha1hex, frame_idx) rows;
    the decode itself is the same stub boundary."""
    meta = extract_media_meta(df, blob_col)
    return meta.select(
        "sha1hex",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.coalesce(F.col("n_frames"), F.lit(1)) - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )
