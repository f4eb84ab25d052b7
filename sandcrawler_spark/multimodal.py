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


def decode_media_stub(blob: bytes) -> dict:
    """Engine-portable deterministic fake decode (md5-derived so a SQL
    oracle can recompute every field from the same bytes): dims and
    frame count are arithmetic over the ascii codes of md5 hexdigest
    characters — identical in Python, Spark (ascii/substring/md5), and
    DuckDB. The sha1 stub above stays for the 1:1 meta contract."""
    h = hashlib.md5(blob).hexdigest()
    return {
        "md5hex": h,
        "width": 64 + ((ord(h[0]) * 13 + ord(h[1])) % 1024),
        "height": 64 + ((ord(h[2]) * 13 + ord(h[3])) % 1024),
        "n_frames": 8 + ((ord(h[4]) * 7 + ord(h[5])) % 120),
    }


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_sig", T.StringType()),
    ]
)


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    blob_col: str = "content",
    every_n: int = 10,
) -> DataFrame:
    """Video frame sampling as a one-to-many mapInPandas stage: each
    input blob yields ceil(n_frames / every_n) frame rows
    (frame_idx = 0, every_n, 2*every_n, ...), each carrying a
    deterministic per-frame signature (the stand-in for the decoded
    frame's perceptual hash / embedding; reference analog: the page-0
    poppler render in pdfextract.py:264-407 generalized to stride-N
    frame grabs). Null/empty blobs yield zero rows — frame fan-out is
    the one multimodal stage whose batch contract is 1→k, so lineage
    must count frames, not inputs.

    Scale shape: pure map stage — no shuffle, no per-row Python (Arrow
    batches), output partitioning inherits the input's. At 100 TB of
    video the fan-out factor is bounded by every_n, so partition sizes
    grow by a known constant; repartition after if k is large."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sigs = [], [], []
            for i in range(len(pdf)):
                blob = pdf[blob_col].iloc[i]
                if blob is None or len(blob) == 0:
                    continue
                meta = decode_media_stub(bytes(blob))
                h = meta["md5hex"]
                for fi in range(0, meta["n_frames"], every_n):
                    ids.append(pdf[id_col].iloc[i])
                    idxs.append(fi)
                    sigs.append(hashlib.md5(f"{h}:{fi}".encode()).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_sig": pd.Series(sigs, dtype="object"),
                }
            )

    return df.select(id_col, blob_col).mapInPandas(_frames, schema=FRAME_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("resized", T.BooleanType()),
    ]
)


def resize_plan(
    df: DataFrame,
    id_col: str = "doc_id",
    blob_col: str = "content",
    box_w: int = 180,
    box_h: int = 300,
) -> DataFrame:
    """Thumbnail-resize plumbing (reference: pdfextract.py renders page
    0 into a 180x300 box): fit the stub-decoded dims into (box_w,
    box_h) preserving aspect ratio, never upscaling. All-integer math
    (w*box_h vs h*box_w picks the binding side; floor division scales
    the other) so any engine reproduces the exact output dims. 1:1
    batch contract like extract_media_meta; the real PIL resize slots
    in at the same stub boundary."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                blob = pdf[blob_col].iloc[i]
                if blob is None or len(blob) == 0:
                    continue
                m = decode_media_stub(bytes(blob))
                w, h = m["width"], m["height"]
                if w <= box_w and h <= box_h:
                    ow, oh = w, h
                elif w * box_h >= h * box_w:
                    ow, oh = box_w, (h * box_w) // w
                else:
                    ow, oh = (w * box_h) // h, box_h
                rows.append(
                    {
                        "doc_id": pdf[id_col].iloc[i],
                        "width": w,
                        "height": h,
                        "out_w": ow,
                        "out_h": oh,
                        "resized": w > box_w or h > box_h,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZE_SCHEMA.fields])

    return df.select(id_col, blob_col).mapInPandas(_resize, schema=RESIZE_SCHEMA)
