"""Audio silence-split chunking: energy-gated gaps-and-islands, pure
Catalyst.

A training-data pipeline over audio splits long recordings into
speech chunks at silence boundaries (VAD) before transcription or
embedding — the audio analog of the reference's PDF page-0 extraction
boundary (pdfextract.py) generalized the same way frame sampling was
in `multimodal.sample_frames`. The DECODE is stubbed (no ffmpeg in
this sandbox): per-window energy is deterministic md5-hexchar
arithmetic over the blob, engine-portable so a SQL oracle recomputes
every chunk. The windowed-energy column is the swap boundary for a
real decoder (RMS per 1 s frame).

The chunking itself — the real operator — is classic gaps-and-islands
entirely in whole-stage codegen:

    windows = posexplode(sequence(0, n_windows-1))
    voiced  = filter(energy >= threshold)
    island  = w - row_number() over (doc ORDER BY w)
    chunks  = groupBy(doc, island) -> min/max/count

Scale shape: the explode fans out by a bounded factor (seconds of
audio per blob); the only shuffle is the per-(doc, island) aggregate,
keyed by doc — one audio file's windows are a few thousand rows, so
the per-doc window function is safe (unlike per-term postings). At
100 TB of audio, partition by file and the plan is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SILENCE_THRESHOLD = 30


def audio_windows(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "content"
) -> DataFrame:
    """(id, w, energy) per 1 s analysis window of each non-empty blob.
    Stub decode: n_windows in [10, 59], energy in [0, 99], both pure
    md5-hexchar arithmetic (identical in Spark and ANSI SQL)."""
    h = F.md5(F.col(blob_col))
    n_windows = (
        F.lit(10)
        + (F.ascii(F.substring(h, 8, 1)) * 5 + F.ascii(F.substring(h, 9, 1))) % 50
    )
    base = (
        df.filter(F.col(blob_col).isNotNull() & (F.length(F.col(blob_col)) > 0))
        .select(F.col(id_col), h.alias("h"), n_windows.alias("n_windows"))
    )
    w = F.explode(F.sequence(F.lit(0), F.col("n_windows") - 1)).alias("w")
    win = base.select(id_col, "h", w)
    # energy(w) = (ascii(h[1 + (w*11) % 32]) * 7 + w*13) % 100
    pos = F.lit(1) + (F.col("w") * 11) % 32
    energy = (F.ascii(F.col("h").substr(pos, F.lit(1))) * 7 + F.col("w") * 13) % 100
    return win.select(id_col, "w", energy.cast("int").alias("energy"))


def silence_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    blob_col: str = "content",
    threshold: int = SILENCE_THRESHOLD,
) -> DataFrame:
    """Maximal runs of voiced (energy >= threshold) windows per blob:
    (id, chunk_idx, start_w, end_w, n_win, mean_energy_permille).
    1->k contract
    like frame sampling; blobs that are all silence yield zero rows."""
    voiced = audio_windows(df, id_col, blob_col).filter(F.col("energy") >= threshold)
    rn = F.row_number().over(Window.partitionBy(id_col).orderBy("w"))
    isl = voiced.withColumn("island", F.col("w") - rn)
    chunks = isl.groupBy(id_col, "island").agg(
        F.min("w").cast("int").alias("start_w"),
        F.max("w").cast("int").alias("end_w"),
        F.count("*").cast("int").alias("n_win"),
        # integer-exact permille mean: no float rounding boundary
        # between engines (the cumulative_events lesson)
        F.floor((F.sum("energy") * 1000) / F.count("*"))
        .cast("long")
        .alias("mean_energy_permille"),
    )
    idx = F.row_number().over(Window.partitionBy(id_col).orderBy("start_w"))
    return chunks.select(
        id_col,
        (idx - 1).cast("int").alias("chunk_idx"),
        "start_w",
        "end_w",
        "n_win",
        "mean_energy_permille",
    )
