"""Multimodal columns: opaque ``binary`` payloads + typed metadata,
with decode / feature-extract / resize / frame-sample stages.

Design contract (training-data pipeline at 100 TB):

- image/audio/video ride as *opaque binary columns* next to typed
  metadata — never decoded Python objects crossing rows;
- decode and feature extraction run as Arrow-batched ``mapInPandas``
  kernels so the JVM↔Python boundary is crossed once per batch, with
  bytes delivered as zero-copy Arrow buffers;
- the decode *codec* itself is stubbed (image/audio libraries are not
  in this container): ``fake=True`` (default) produces deterministic
  features derived from the raw bytes, ``fake=False`` raises
  ``NotImplementedError`` at the exact seam where PIL/ffmpeg/soundfile
  would plug in. Everything around the stub — schema, partitioning,
  UDF signature, Arrow batch shape — is real and tested.

In-sandbox the asset table is synthesized deterministically from the
``documents`` parquet (payload = utf-8 bytes of the text), so the
DuckDB oracle can re-derive byte-level metadata for the parity gate.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FEAT_DIM = 8
FRAME_BYTES = 64  # bytes per synthetic video "frame"

MODALITIES = ["image", "audio", "video"]


def asset_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → assets ``(asset_id, modality, payload binary,
    n_bytes, codec)``.

    Payload is the utf-8 encoding of the document text — an *opaque*
    stand-in with real binary-column plumbing. Modality and codec are
    deterministic functions of ``doc_id`` so every downstream branch
    (image/audio/video) gets exercised.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    modality = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    codec = (
        F.when(F.col("doc_id") % 3 == 0, "png.fake")
        .when(F.col("doc_id") % 3 == 1, "pcm16.fake")
        .otherwise("h264.fake")
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        modality.alias("modality"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.octet_length(F.encode(F.col("text"), "utf-8")).alias("n_bytes"),
        codec.alias("codec"),
    )


def duck_asset_meta() -> str:
    """Oracle for the metadata projection (binary itself is checked via
    its md5, format-independent)."""
    return """
        SELECT doc_id AS asset_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS modality,
               CAST(octet_length(encode(text)) AS INT) AS n_bytes,
               CASE WHEN doc_id % 3 = 0 THEN 'png.fake'
                    WHEN doc_id % 3 = 1 THEN 'pcm16.fake'
                    ELSE 'h264.fake' END AS codec,
               md5(text) AS payload_md5
        FROM documents
    """


def asset_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable metadata view of the asset table."""
    a = asset_table(spark, sf_dir)
    return a.select(
        "asset_id",
        "modality",
        F.col("n_bytes").cast("int").alias("n_bytes"),
        "codec",
        F.md5("payload").alias("payload_md5"),
    )


# ------------------------------------------------------------ decode kernel

def _fake_decode(payload: bytes, modality: str) -> dict:
    """Deterministic stand-in for the real codec: derives per-modality
    metadata and a FEAT_DIM float feature vector from the raw bytes.
    (Replace body with PIL/soundfile/ffmpeg calls in production —
    signature and batch shape stay identical.)"""
    b = np.frombuffer(payload, dtype=np.uint8)
    n = len(b)
    # bytes → FEAT_DIM means over equal chunks, scaled to [0, 1]
    pad = (-n) % FEAT_DIM
    chunks = np.pad(b, (0, pad), mode="constant").reshape(FEAT_DIM, -1)
    feat = (chunks.mean(axis=1) / 255.0).astype(np.float64)
    if modality == "image":
        width = 16 + int(b[:4].sum()) % 64
        height = 16 + int(b[4:8].sum()) % 64
        meta = (width, height, 3)
    elif modality == "audio":
        meta = (16000, n // 2, 1)  # sample_rate, n_samples, channels
    else:  # video
        meta = (max(n // FRAME_BYTES, 1), FRAME_BYTES, 0)  # n_frames, frame_bytes
    return {"d0": meta[0], "d1": meta[1], "d2": meta[2], "feat": feat.tolist()}


def decode_features(assets: DataFrame, fake: bool = True) -> DataFrame:
    """assets → + ``(d0, d1, d2 int, feat array<double>)`` via one
    Arrow-batched ``mapInPandas`` pass. ``fake=False`` marks where a
    real codec integrates; not available in this container."""
    if not fake:
        raise NotImplementedError(
            "real image/audio/video codecs are not available in this "
            "container; integrate PIL/soundfile/ffmpeg here"
        )
    out_schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in assets.schema.fields)
        + ", d0 int, d1 int, d2 int, feat array<double>"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                _fake_decode(bytes(p), m)
                for p, m in zip(pdf["payload"], pdf["modality"])
            ]
            out = pd.concat(
                [pdf.reset_index(drop=True), pd.DataFrame(decoded)], axis=1
            )
            yield out

    return assets.mapInPandas(run, schema=out_schema)


def resize_features(decoded: DataFrame, new_dim: int) -> DataFrame:
    """Mean-pool feature vectors to ``new_dim`` — vectorized pandas UDF
    over the whole Arrow batch (the 'resize' stage of the pipeline)."""
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("array<double>")
    def pool(feats: pd.Series) -> pd.Series:
        def one(v):
            a = np.asarray(v, dtype=np.float64)
            pad = (-len(a)) % new_dim
            return np.pad(a, (0, pad)).reshape(new_dim, -1).mean(axis=1).tolist()

        return feats.map(one)

    return decoded.withColumn("feat_resized", pool(F.col("feat")))


def frame_sample(assets: DataFrame, every_n: int = 2) -> DataFrame:
    """Video frame sampling — pure Column algebra over the binary
    column: split the payload into FRAME_BYTES slices, keep every
    ``every_n``-th. No Python in the row path; at scale this is a
    narrow, codegen'd explode."""
    n_frames = F.greatest(
        (F.octet_length("payload") / FRAME_BYTES).cast("int"), F.lit(1)
    )
    frames = F.transform(
        F.sequence(F.lit(0), n_frames - 1),
        lambda i: F.struct(
            i.cast("int").alias("frame_idx"),
            F.substring(F.col("payload"), i * FRAME_BYTES + 1, FRAME_BYTES).alias(
                "frame"
            ),
        ),
    )
    sampled = F.filter(frames, lambda fr: fr.frame_idx % every_n == 0)
    return (
        assets.filter(F.col("modality") == "video")
        .select("asset_id", F.explode(sampled).alias("fr"))
        .select(
            "asset_id",
            F.col("fr.frame_idx").alias("frame_idx"),
            F.md5(F.col("fr.frame")).alias("frame_md5"),
            F.octet_length(F.col("fr.frame")).cast("int").alias("frame_bytes"),
        )
    )


def duck_frame_sample(every_n: int = 2) -> str:
    """DuckDB cannot slice BLOBs, so the oracle slices the VARCHAR —
    byte-identical to the Spark binary slice because the synthetic
    corpus is pure ASCII (octet_length == length, asserted in tests)."""
    fb = FRAME_BYTES
    return f"""
        SELECT asset_id, CAST(i AS INT) AS frame_idx,
               md5(substr(text, CAST(i*{fb}+1 AS INT), {fb})) AS frame_md5,
               CAST(length(substr(text, CAST(i*{fb}+1 AS INT), {fb})) AS INT) AS frame_bytes
        FROM (
            SELECT doc_id AS asset_id, text,
                   UNNEST(range(GREATEST(octet_length(encode(text)) // {fb}, 1))) AS i
            FROM documents WHERE doc_id % 3 = 2
        )
        WHERE i % {every_n} = 0
    """
