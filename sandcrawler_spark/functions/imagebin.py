"""Binary image-header codec: real byte-level dimension sniffing for
PNG / GIF / baseline-JFIF JPEG over `binary` columns — pure Catalyst.

The multimodal lane (multimodal.py) treats media as opaque binary with
typed metadata and stubs the pixel codecs (Pillow absent in this
environment — documented boundary). Header parsing needs NO pixel
library: the dimensions of the three dominant web image formats live
at fixed (PNG/GIF) or scannable (JPEG SOF0) byte offsets. A 100 TB
crawl wants width/height/format for every image BEFORE deciding what
to decode — tiny tracking pixels, banner-shaped ads, and absurd
aspect ratios are filtered on headers alone, never paying a decode.
The reference's ingest makes the same cheap-sniff-first move with
file magic (python/sandcrawler/misc.py gen_file_metadata's mimetype
sniff) before shipping bytes to heavyweight workers.

Implementation notes (all whole-stage codegen, no Python crossing):
- bytes are read with substring() on the binary column (1-based,
  byte-wise on BinaryType), widened via hex() + conv(hex, 16, 10);
- GIF's little-endian u16 is read by swapping the two hex bytes;
- JPEG has no fixed offset: markers are WALKED by declared segment
  length (a bounded F.aggregate fold over _JPEG_MAX_SEGMENTS steps),
  never pattern-matched in the byte stream — an 'FFC0' byte pair
  inside an APP/EXIF/ICC payload can therefore not be mistaken for
  the frame header. SOF0/SOF1/SOF2 (baseline, extended-sequential,
  progressive) all share the (len, precision, height, width) layout
  and are accepted; the located frame header is sanity-checked
  (precision 8 or 12) before its dims are trusted, NULL otherwise.
  Truly exotic blobs (fill-byte padding, >16 header segments) fall
  to NULL — a production fallback routes those through the
  mapInPandas byte-walk used by sample_frames (multimodal.py).

The encoder exists so the codec is testable end-to-end inside the
engine: encode_image_header() builds byte-exact headers (PNG IHDR,
GIF89a logical screen descriptor, JFIF APP0+SOF0) whose decode must
round-trip. Tests additionally pin the decoder against Python
struct-packed golden bytes so an encode/decode-symmetric bug cannot
hide (tests/test_r4s16_ops.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PNG_MAGIC_HEX = "89504E470D0A1A0A"
GIF89_HEX = "474946383961"  # 'GIF89a'
GIF87_HEX = "474946383761"  # 'GIF87a'
JPEG_SOI_HEX = "FFD8"

# byte sizes of the synthetic headers encode_image_header emits
PNG_HEADER_LEN = 33  # magic8 + len4 + 'IHDR'4 + w4 + h4 + ihdr-tail5 + crc4
GIF_HEADER_LEN = 13  # 'GIF89a'6 + w2 + h2 + gct-flags3
JPEG_HEADER_LEN = 39  # SOI2 + APP0(2+16) + SOF0(2+17)


def _be_hex(value: Column, n_bytes: int) -> Column:
    """Big-endian fixed-width hex transcript of an integer column."""
    return F.lpad(F.hex(value), 2 * n_bytes, "0")


def _le16_hex(value: Column) -> Column:
    """Little-endian u16 hex: the two bytes of the BE form, swapped."""
    be = _be_hex(value, 2)
    return F.concat(F.substring(be, 3, 2), F.substring(be, 1, 2))


def encode_image_header(fmt: Column, width: Column, height: Column) -> Column:
    """Byte-exact synthetic image header for fmt in ('png','gif',
    'jpeg'). PNG: signature + IHDR chunk (8-bit RGBA, fake CRC).
    GIF: GIF89a logical screen descriptor. JPEG: SOI + JFIF APP0 +
    baseline SOF0 carrying (height, width) — note JPEG stores height
    first, the classic trap."""
    png = F.concat(
        F.lit(PNG_MAGIC_HEX), F.lit("0000000D"), F.lit("49484452"),
        _be_hex(width, 4), _be_hex(height, 4),
        F.lit("0806000000"),  # bit depth 8, color type 6 (RGBA)
        F.lit("DEADBEEF"),  # placeholder CRC (not validated here)
    )
    gif = F.concat(
        F.lit(GIF89_HEX), _le16_hex(width), _le16_hex(height),
        F.lit("F70000"),  # GCT flags / bg color / aspect
    )
    jpeg = F.concat(
        F.lit(JPEG_SOI_HEX),
        F.lit("FFE00010"), F.lit("4A46494600"), F.lit("0101"),
        F.lit("00"), F.lit("00480048"), F.lit("0000"),  # APP0/JFIF
        F.lit("FFC00011"), F.lit("08"),
        _be_hex(height, 2), _be_hex(width, 2),
        F.lit("03012200021101031101"),  # 3 components, std subsampling
    )
    hexstr = (
        F.when(fmt == "png", png)
        .when(fmt == "gif", gif)
        .otherwise(jpeg)
    )
    return F.unhex(hexstr)


def _u16be_at(blob: Column, pos: int | Column) -> Column:
    return F.conv(F.hex(F.substring(blob, pos, 2)), 16, 10).cast("int")


def _u32be_at(blob: Column, pos: int) -> Column:
    return F.conv(F.hex(F.substring(blob, pos, 4)), 16, 10).cast("int")


def _u16le_at(blob: Column, pos: int) -> Column:
    h = F.hex(F.substring(blob, pos, 2))
    return F.conv(
        F.concat(F.substring(h, 3, 2), F.substring(h, 1, 2)), 16, 10
    ).cast("int")


def _u8_at(blob: Column, pos: int | Column) -> Column:
    return F.conv(F.hex(F.substring(blob, pos, 1)), 16, 10).cast("int")


_JPEG_MAX_SEGMENTS = 16  # header segments walked before giving up


def _jpeg_sof_pos(blob: Column) -> Column:
    """1-based byte position of the SOF0/SOF1/SOF2 marker, or NULL.

    Walks markers by their DECLARED segment length (marker2 + len2 +
    payload), so an 'FFC0' byte pair inside an APP/EXIF/ICC payload is
    skipped over, never misread as the frame header. The walk is a
    bounded F.aggregate fold (state = struct(pos, sof): sof 0 while
    scanning, >0 = found at that byte, -1 = aborted on a malformed
    marker / SOS / EOI / truncation) — pure codegen, no Python."""

    def _step(st, _i):
        pos, sof = st["pos"], st["sof"]
        b1 = F.hex(F.substring(blob, pos, 1))
        m2 = F.hex(F.substring(blob, pos + 1, 1))
        seglen = _u16be_at(blob, pos + 2)
        nxt = (pos + 2 + seglen).cast("int")
        abort = F.struct(pos.alias("pos"), F.lit(-1).cast("int").alias("sof"))
        return (
            F.when(sof != 0, st)
            .when(pos.isNull() | (b1 != "FF") | seglen.isNull(), abort)
            .when(m2.isin("C0", "C1", "C2"),
                  F.struct(pos.alias("pos"), pos.cast("int").alias("sof")))
            .when(m2.isin("D9", "DA"), abort)  # EOI / SOS: no frame header
            .otherwise(F.struct(nxt.alias("pos"), F.lit(0).cast("int").alias("sof")))
        )

    init = F.struct(
        F.lit(3).cast("int").alias("pos"), F.lit(0).cast("int").alias("sof")
    )
    final = F.aggregate(
        F.sequence(F.lit(1), F.lit(_JPEG_MAX_SEGMENTS)), init, _step
    )
    return F.when(final["sof"] > 0, final["sof"])


def sniff_image_dims(blob: Column) -> list[Column]:
    """(fmt, width, height) read from the raw bytes. fmt is NULL for
    unrecognized blobs, dims are NULL when the format is recognized
    but the needed marker is absent (e.g. truncated JPEG)."""
    head8 = F.hex(F.substring(blob, 1, 8))
    is_png = head8 == PNG_MAGIC_HEX
    head6 = F.hex(F.substring(blob, 1, 6))
    is_gif = head6.isin(GIF89_HEX, GIF87_HEX)
    is_jpeg = F.hex(F.substring(blob, 1, 2)) == JPEG_SOI_HEX

    # JPEG: length-walk the header markers to SOF0/1/2 (decoys inside
    # APP payloads are skipped), then sanity-check the frame header's
    # precision byte before trusting its dims.
    sof_byte = _jpeg_sof_pos(blob)
    # SOFn layout: marker2 len2 precision1 height2 width2
    sof_ok = sof_byte.isNotNull() & _u8_at(blob, sof_byte + 4).isin(8, 12)
    jpeg_h = F.when(sof_ok, _u16be_at(blob, sof_byte + 5))
    jpeg_w = F.when(sof_ok, _u16be_at(blob, sof_byte + 7))

    fmt = (
        F.when(is_png, F.lit("png"))
        .when(is_gif, F.lit("gif"))
        .when(is_jpeg, F.lit("jpeg"))
        .otherwise(F.lit(None).cast("string"))
    )
    width = (
        F.when(is_png, _u32be_at(blob, 17))
        .when(is_gif, _u16le_at(blob, 7))
        .when(is_jpeg, jpeg_w)
    )
    height = (
        F.when(is_png, _u32be_at(blob, 21))
        .when(is_gif, _u16le_at(blob, 9))
        .when(is_jpeg, jpeg_h)
    )
    return [fmt.alias("fmt"), width.alias("width"), height.alias("height")]


def image_header_stats(
    df: DataFrame, blob_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """Per-blob header sniff + the filter columns a corpus pass keys
    on: byte size, aspect ratio class, tracking-pixel flag."""
    blob = F.col(blob_col)
    out = df.select(F.col(id_col).alias("doc_id"), *sniff_image_dims(blob),
                    F.octet_length(blob).cast("int").alias("n_bytes"))
    # floor() before the int cast: Spark's double->int cast truncates
    # while DuckDB's rounds — floor makes both engines agree
    ratio_pct = F.floor(F.col("width") * 100 / F.col("height")).cast("int")
    return out.select(
        "doc_id", "fmt", "width", "height", "n_bytes",
        ratio_pct.alias("aspect_pct"),
        ((F.col("width") <= 2) & (F.col("height") <= 2)).alias("is_pixel"),
    )
