"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Beyond-reference extension (build brief): image/audio/video travel as
``binary`` columns with typed metadata structs. The Spark-side
plumbing — schema, Arrow batch shape, ``mapInPandas`` signature,
partitioning — is real and tested; the actual media decode is stubbed
(no image/audio libs in this container) behind ``decode_stub``.

Design for 100 TB: binary payloads are the wide part of the row, so
metadata extraction runs as ``mapInPandas`` (Arrow batches, columnar
transfer) and downstream analytics select only the narrow metadata
columns — Parquet column pruning never touches the bytes again.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("sha256", T.StringType()),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Test harness for the binary path: treat the utf-8 bytes of a
    text column as an opaque payload column (deterministic fake for
    media bytes)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def extract_binary_meta(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched metadata extraction over binary payloads.

    This is the real plumbing a media pipeline uses: mapInPandas with
    a narrow output schema; per-batch vectorized work in pandas.
    """
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payloads (e.g. NULL source text) surface as typed
            # NULL metadata — len(None)/bytes(None) killed the task
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": pdf["payload"].map(
                        lambda b: None if b is None else len(b)
                    ),
                    "sha256": pdf["payload"].map(
                        lambda b: None
                        if b is None
                        else hashlib.sha256(bytes(b)).hexdigest()
                    ),
                }
            )

    # the output schema adopts the id column's REAL type (the fixed
    # LongType doc_id field broke string-id tables at Arrow conversion)
    schema = T.StructType(
        [T.StructField("doc_id", df.schema[id_col].dataType)]
        + META_SCHEMA.fields[1:]
    )
    return df.select(F.col(id_col).alias("doc_id"), "payload").mapInPandas(
        fn, schema
    )


def decode_stub(df: DataFrame, modality: str = "image") -> DataFrame:
    """Media decode / feature-extract stub.

    The Spark-side contract is real (binary in → fixed-schema features
    out via mapInPandas); the codec itself is not available in this
    environment.
    """
    raise NotImplementedError(
        f"{modality} decoding requires codec libraries not present in this "
        "environment; use extract_binary_meta for the metadata path. The "
        "mapInPandas plumbing shape is identical — swap the hash for the "
        "decoder."
    )


def frame_sample_plan(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan* shape: rows (doc_id, frame_idx)
    fanned out with sequence+explode, ready for a decode UDF. Runs
    without any codec — demonstrates the fan-out stays JVM-side."""
    return df.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.lit(300), F.lit(every_n))
        ).alias("frame_idx"),
    )


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("histogram", T.ArrayType(T.DoubleType())),
        T.StructField("entropy_bits", T.DoubleType()),
    ]
)


def byte_histogram_features(
    df: DataFrame, bins: int = 16, id_col: str = "doc_id"
) -> DataFrame:
    """Codec-free feature extraction over binary payloads: normalized
    byte histogram (256/bins-wide buckets) + Shannon entropy.

    The feature-extract stage of the media pipeline, minus the codec:
    numpy ``frombuffer`` + ``bincount`` per Arrow batch — the exact
    shape (binary in, fixed-width float vector out, vectorized inner
    loop) a real embedding/feature extractor uses, so swapping in a
    decoder changes one function body, not the plan. Entropy flags
    already-compressed/encrypted payloads (≈8 bits/byte) vs text
    (≈4-5) — a cheap triage signal before heavyweight decode at 100 TB.
    """
    import numpy as np

    if bins < 1 or 256 % bins != 0:
        raise ValueError(
            f"bins={bins} must be a divisor of 256 (a non-divisor "
            "reshapes 256 byte counts into bins*width != 256 and the "
            "executor task fails)."
        )
    width = 256 // bins

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hists, ents = [], []
            for b in pdf["payload"]:
                arr = np.frombuffer(
                    b"" if b is None else bytes(b), dtype=np.uint8
                )
                if arr.size == 0:
                    hists.append([0.0] * bins)
                    ents.append(0.0)
                    continue
                counts = np.bincount(arr, minlength=256).astype(np.float64)
                p = counts / arr.size
                nz = p[p > 0]
                ents.append(float(-(nz * np.log2(nz)).sum()))
                binned = counts.reshape(bins, width).sum(axis=1) / arr.size
                hists.append(binned.tolist())
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "histogram": hists,
                 "entropy_bits": ents}
            )

    schema = T.StructType(
        [T.StructField("doc_id", df.schema[id_col].dataType)]
        + FEATURES_SCHEMA.fields[1:]
    )
    return df.select(F.col(id_col).alias("doc_id"), "payload").mapInPandas(
        fn, schema
    )


def parse_png_meta(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Parse PNG container metadata — signature validity, IHDR
    width/height, bit depth, color type — STRAIGHT FROM THE BYTES as
    Catalyst expressions (hex-slice → base-16 conv): the image
    metadata tier of the multimodal family needs no codec library,
    so unlike pixel decode (``decode_stub``) it is fully real here.
    Non-PNG payloads yield is_png=false with NULL fields, never an
    error — a 100 TB mixed-media crawl always contains garbage.

    Layout parsed: 8-byte signature 89 50 4E 47 0D 0A 1A 0A, then the
    IHDR chunk (4-byte length, 'IHDR', big-endian u32 width at bytes
    17-20, height at 21-24, bit depth at 25, color type at 26).
    Returns (id, is_png, width, height, bit_depth, color_type).
    """
    b = F.col(bin_col)
    sig = F.hex(F.substring(b, 1, 8)) == F.lit("89504E470D0A1A0A")
    ihdr = F.substring(b, 13, 4).cast("string") == F.lit("IHDR")
    ok = sig & ihdr & (F.length(b) >= 26)

    def be32(pos: int):
        return F.conv(F.hex(F.substring(b, pos, 4)), 16, 10).cast("int")

    def u8(pos: int):
        return F.conv(F.hex(F.substring(b, pos, 1)), 16, 10).cast("int")

    return df.select(
        F.col(id_col),
        F.coalesce(ok, F.lit(False)).alias("is_png"),
        F.when(ok, be32(17)).alias("width"),
        F.when(ok, be32(21)).alias("height"),
        F.when(ok, u8(25)).alias("bit_depth"),
        F.when(ok, u8(26)).alias("color_type"),
    )


def parse_wav_meta(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Parse WAV/RIFF container metadata — channels, sample rate,
    bits per sample, PCM flag — from the raw bytes, Catalyst-only
    (the audio sibling of ``parse_png_meta``). RIFF integers are
    LITTLE-endian, so multi-byte fields assemble from per-byte hex
    slices in reversed order. Assumes the canonical layout ('RIFF' +
    size + 'WAVE' + 'fmt ' chunk first — what every encoder writes);
    anything else yields is_wav=false with NULL fields.

    Returns (id, is_wav, audio_format, n_channels, sample_rate,
    bits_per_sample).
    """
    b = F.col(bin_col)

    def le(pos: int, nbytes: int):
        return F.conv(
            F.concat(
                *[
                    F.hex(F.substring(b, pos + i, 1))
                    for i in range(nbytes - 1, -1, -1)
                ]
            ),
            16,
            10,
        ).cast("int")

    ok = (
        (F.substring(b, 1, 4).cast("string") == F.lit("RIFF"))
        & (F.substring(b, 9, 4).cast("string") == F.lit("WAVE"))
        & (F.substring(b, 13, 4).cast("string") == F.lit("fmt "))
        & (F.length(b) >= 36)
    )
    return df.select(
        F.col(id_col),
        F.coalesce(ok, F.lit(False)).alias("is_wav"),
        F.when(ok, le(21, 2)).alias("audio_format"),
        F.when(ok, le(23, 2)).alias("n_channels"),
        F.when(ok, le(25, 4)).alias("sample_rate"),
        F.when(ok, le(35, 2)).alias("bits_per_sample"),
    )
