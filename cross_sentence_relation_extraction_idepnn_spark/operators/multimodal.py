"""Multimodal columns: opaque ``binary`` payloads + typed metadata,
with decode / feature-extract / resize / frame-sample stages.

Design contract (training-data pipeline at 100 TB):

- image/audio/video ride as *opaque binary columns* next to typed
  metadata — never decoded Python objects crossing rows;
- decode and feature extraction run as Arrow-batched ``mapInPandas``
  kernels so the JVM↔Python boundary is crossed once per batch, with
  bytes delivered as zero-copy Arrow buffers;
- ALL THREE modalities have REAL pure-Python decoders: a P6 PPM codec
  (:func:`decode_ppm` — spec-tolerant header scan + raw RGB plane), a
  RIFF/WAVE codec (:func:`decode_wav` — word-aligned chunk walk +
  16-bit PCM samples), and a YUV4MPEG2 codec (:func:`decode_y4m` —
  stream-header tags + FRAME-marker walk + planar C444/C420 frames),
  no media libraries needed. The driver-surface query hash-checks
  header dims and exact channel/sample/plane statistics against
  independent DuckDB byte-level re-derivations. A slice of the video
  rows keeps an ``h264.fake`` payload behind the documented codec
  seam (``fake=False`` raises ``NotImplementedError`` per missing
  codec; ``fake='auto'`` uses real codecs where available and the
  deterministic byte-stat stand-in elsewhere) — the integration point
  for ffmpeg-class decoders stays real and tested.

In-sandbox the asset table is synthesized deterministically from the
``documents`` parquet (image rows: a constructed PPM; audio rows: a
genuine 16-bit PCM WAV whose samples are the text bytes; most video
rows: a genuine y4m stream whose planes are the text bytes; the rest:
utf-8 bytes of the text behind the h264 seam), so the DuckDB oracle
can re-derive byte-level metadata for the parity gate.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from ..session import read_parquet_cached

FEAT_DIM = 8
FRAME_BYTES = 64  # bytes per synthetic video "frame"

MODALITIES = ["image", "audio", "video"]


# image fixture dims: small, deterministic, co-derivable in SQL
_IMG_W = "(4 + CAST(doc_id % 5 AS INT))"
_IMG_H = "(3 + CAST(doc_id % 4 AS INT))"
_IMG_N = f"({_IMG_W} * {_IMG_H} * 3)"
# pixel plane: the doc text cycled (rpad pads with repeats of the pad
# string) and truncated to exactly w*h*3 ASCII bytes
_IMG_PIX = f"substring(rpad(text, {_IMG_N}, text), 1, {_IMG_N})"
_IMG_STR = (
    f"concat('P6\\n', CAST({_IMG_W} AS STRING), ' ', CAST({_IMG_H} AS STRING), "
    f"'\\n255\\n', {_IMG_PIX})"
)

# ---- audio fixture: a GENUINE RIFF/WAVE file (canonical 44-byte header
# + 16-bit mono PCM), byte-reconstructible in both engines. The header
# contains non-ASCII bytes (little-endian u32 sizes), so the fixture is
# assembled as a HEX string and unhex'd to binary — hex() is uppercase
# in both Spark and DuckDB, making every downstream md5/length check
# engine-portable. PCM data = the doc's utf-8 bytes zero-padded to even
# length, i.e. sample k (0-based, LE int16) = b[2k] + 256*b[2k+1].
WAV_SAMPLE_RATE = 16000


def _aud_len(duck: bool) -> str:
    # DuckDB's octet_length is BLOB-only; Spark's takes strings
    return "octet_length(encode(text))" if duck else "octet_length(text)"


def _aud_pad(duck: bool) -> str:
    return f"({_aud_len(duck)} % 2)"


def _aud_data_n(duck: bool) -> str:
    return f"({_aud_len(duck)} + {_aud_pad(duck)})"


def _aud_riff_size(duck: bool) -> str:
    return f"(36 + {_aud_data_n(duck)})"


def _le_hex(expr: str, nbytes: int, duck: bool) -> str:
    """SQL: hex rendering of ``expr`` as an ``nbytes`` little-endian
    unsigned int (engine-specific integer division)."""
    div = "//" if duck else "div"
    to_hex = "to_hex" if duck else "hex"
    parts = [
        f"lpad({to_hex}(CAST({expr} AS BIGINT) {div} {256 ** i} % 256), 2, '0')"
        for i in range(nbytes)
    ]
    return "concat(" + ", ".join(parts) + ")"


def _wav_hex(duck: bool) -> str:
    """Hex string of the full WAV payload (header + PCM data chunk)."""
    text_hex = "hex(encode(text))" if duck else "hex(encode(text, 'utf-8'))"
    # 'RIFF' <riff_size> 'WAVE' 'fmt ' 16 fmt=1 ch=1 rate=16000
    # byte_rate=32000 block_align=2 bits=16 'data' <data_len> <pcm>
    return (
        "concat('52494646', "
        + _le_hex(_aud_riff_size(duck), 4, duck)
        + ", '57415645666D7420', '10000000', '0100', '0100', "
        "'803E0000', '007D0000', '0200', '1000', '64617461', "
        + _le_hex(_aud_data_n(duck), 4, duck)
        + f", {text_hex}, CASE WHEN {_aud_pad(duck)} = 1 THEN '00' ELSE '' END)"
    )


_AUD_BIN = f"unhex({_wav_hex(duck=False)})"

# ---- video fixture: a GENUINE YUV4MPEG2 (y4m) stream — ASCII stream
# header + per-frame 'FRAME\n' markers + raw C444 planes (Y,U,V each
# w·h bytes, planes = the doc text cycled). The whole container is
# ASCII for this corpus, so it is reconstructible as VARCHAR in both
# engines, like the PPM. Only doc_id % 6 == 2 video rows carry it;
# doc_id % 6 == 5 rows keep the opaque stand-in behind the h264 codec
# seam (so the NotImplementedError seam stays real and tested).
_VID_W = "(2 + CAST(doc_id % 3 AS INT))"
_VID_H = "(2 + CAST(doc_id % 2 AS INT))"
_VID_NF = "(1 + CAST(doc_id % 3 AS INT))"
_VID_N = f"({_VID_W} * {_VID_H} * 3)"  # bytes per C444 frame


def _y4m_str(duck: bool) -> str:
    """SQL reconstruction of the exact y4m byte string."""
    total = f"({_VID_NF} * {_VID_N})"
    if duck:
        cyc = f"substr(rpad(text, CAST({total} AS INT), text), 1, CAST({total} AS INT))"
        frames = (
            f"array_to_string(list_transform(range({_VID_NF}), f -> "
            f"'FRAME' || chr(10) || "
            f"substr({cyc}, CAST(f * {_VID_N} + 1 AS INT), CAST({_VID_N} AS INT))), '')"
        )
        return (
            f"'YUV4MPEG2 W' || CAST({_VID_W} AS VARCHAR) || "
            f"' H' || CAST({_VID_H} AS VARCHAR) || "
            f"' F25:1 Ip A1:1 C444' || chr(10) || {frames}"
        )
    cyc = f"substring(rpad(text, {total}, text), 1, {total})"
    frames = (
        f"array_join(transform(sequence(0, {_VID_NF} - 1), f -> "
        f"concat('FRAME\\n', substring({cyc}, f * {_VID_N} + 1, {_VID_N}))), '')"
    )
    return (
        f"concat('YUV4MPEG2 W', CAST({_VID_W} AS STRING), "
        f"' H', CAST({_VID_H} AS STRING), ' F25:1 Ip A1:1 C444\\n', {frames})"
    )


def asset_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → assets ``(asset_id, modality, payload binary,
    n_bytes, codec)``.

    The *image* modality carries a REAL binary P6 PPM (header +
    interleaved RGB plane, pixel bytes = the doc text cycled to
    w·h·3) decoded by :func:`decode_ppm`; the *audio* modality a REAL
    RIFF/WAVE file (canonical header + 16-bit mono PCM whose samples
    are the text bytes) decoded by :func:`decode_wav`. Video payloads
    stay the opaque utf-8 stand-in behind the documented codec seam.
    Modality and codec are deterministic functions of ``doc_id`` so
    every downstream branch gets exercised, and every payload is
    byte-identically reconstructible in SQL for the parity oracle.
    """
    docs = read_parquet_cached(spark, f"{sf_dir}/documents.parquet")
    modality = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    codec = (
        F.when(F.col("doc_id") % 3 == 0, "ppm")  # real codec available
        .when(F.col("doc_id") % 3 == 1, "wav")  # real codec available
        .when(F.col("doc_id") % 6 == 2, "y4m")  # real codec available
        .otherwise("h264.fake")  # the documented NotImplementedError seam
    )
    payload = (
        F.when(F.col("doc_id") % 3 == 0, F.encode(F.expr(_IMG_STR), "utf-8"))
        .when(F.col("doc_id") % 3 == 1, F.expr(_AUD_BIN))
        .when(F.col("doc_id") % 6 == 2, F.encode(F.expr(_y4m_str(duck=False)), "utf-8"))
        .otherwise(F.encode(F.col("text"), "utf-8"))
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        modality.alias("modality"),
        payload.alias("payload"),
        F.octet_length(payload).alias("n_bytes"),
        codec.alias("codec"),
    )


def _duck_img_str() -> str:
    """DuckDB reconstruction of the exact PPM byte string (ASCII-only
    corpus → VARCHAR ops are byte-identical to the Spark binary)."""
    return (
        f"'P6' || chr(10) || CAST({_IMG_W} AS VARCHAR) || ' ' || "
        f"CAST({_IMG_H} AS VARCHAR) || chr(10) || '255' || chr(10) || "
        f"substr(rpad(text, {_IMG_N}, text), 1, {_IMG_N})"
    )


def duck_asset_meta() -> str:
    """Oracle for the metadata projection. The payload is checked via
    md5 over its UPPERCASE HEX rendering (format-independent; hex
    because DuckDB's md5 is VARCHAR-only and the WAV header contains
    non-ASCII bytes). Audio rows independently re-assemble the full
    RIFF/WAVE byte string — if the Spark-side header layout drifted by
    one byte, the md5 goes red."""
    return f"""
        SELECT doc_id AS asset_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS modality,
               CAST(CASE WHEN doc_id % 3 = 0 THEN length({_duck_img_str()})
                    WHEN doc_id % 3 = 1 THEN 44 + {_aud_data_n(duck=True)}
                    WHEN doc_id % 6 = 2 THEN length({_y4m_str(duck=True)})
                    ELSE octet_length(encode(text)) END AS INT) AS n_bytes,
               CASE WHEN doc_id % 3 = 0 THEN 'ppm'
                    WHEN doc_id % 3 = 1 THEN 'wav'
                    WHEN doc_id % 6 = 2 THEN 'y4m'
                    ELSE 'h264.fake' END AS codec,
               CASE WHEN doc_id % 3 = 0 THEN md5(hex(encode({_duck_img_str()})))
                    WHEN doc_id % 3 = 1 THEN md5(hex(unhex({_wav_hex(duck=True)})))
                    WHEN doc_id % 6 = 2 THEN md5(hex(encode({_y4m_str(duck=True)})))
                    ELSE md5(hex(encode(text))) END AS payload_md5
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
        F.md5(F.hex("payload")).alias("payload_md5"),
    )


# ------------------------------------------------------------ decode kernel

def decode_ppm(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """REAL pure-Python P6 (binary PPM) decoder — no image libraries.
    Whitespace- and ``#``-comment-tolerant header scan (the full P6
    spec for 1-byte maxval), then the raw interleaved RGB plane as an
    (h, w, 3) uint8 array. Works on any well-formed P6 file, not just
    the synthetic fixture (tested against hand-built images with
    comments and arbitrary header whitespace)."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    i, n, vals = 2, len(payload), []
    while len(vals) < 3:
        while i < n and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < n and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < n and not payload[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PPM header")
        vals.append(int(payload[i:j]))
        i = j
    i += 1  # exactly one whitespace byte separates maxval from the plane
    w, h, maxval = vals
    if maxval > 255:
        raise ValueError("2-byte-sample PPM not supported")
    if n - i < w * h * 3:
        raise ValueError("truncated PPM pixel plane")
    arr = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i)
    return w, h, maxval, arr.reshape(h, w, 3)


def _decode_image_ppm(payload: bytes) -> dict:
    """Real image decode: parse the PPM, de-interleave channels, emit
    exact-integer channel statistics (sums/counts/min/max stay exact
    in float64, so the DuckDB oracle matches bit-for-bit — the
    round-knife-edge lesson from quality_score)."""
    w, h, _maxval, arr = decode_ppm(payload)
    ch = arr.reshape(-1, 3).astype(np.int64)
    feat = [
        float(ch[:, 0].sum()),
        float(ch[:, 1].sum()),
        float(ch[:, 2].sum()),
        float(ch.shape[0]),
        float(ch[:, 0].min()),
        float(ch[:, 0].max()),
        float(w),
        float(h),
    ]
    return {"d0": w, "d1": h, "d2": 3, "feat": feat}


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """REAL pure-Python RIFF/WAVE decoder — no audio libraries.
    Proper chunk walk (word-aligned, unknown chunks skipped, so files
    with LIST/INFO/cue chunks parse too), PCM format validation, and
    the data chunk as a signed little-endian int16 sample array.
    Returns ``(sample_rate, channels, samples)``. Works on any
    well-formed 16-bit PCM WAV, not just the synthetic fixture (tested
    against hand-built files with extra chunks and odd-length data)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    fmt = data = None
    i, n = 12, len(payload)
    while i + 8 <= n:
        cid = payload[i : i + 4]
        sz = int.from_bytes(payload[i + 4 : i + 8], "little")
        body = payload[i + 8 : i + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        i += 8 + sz + (sz % 2)  # RIFF chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or bits != 16:
        raise ValueError(f"only 16-bit PCM supported (fmt={audio_format}, bits={bits})")
    samples = np.frombuffer(data[: len(data) - len(data) % 2], dtype="<i2")
    return sample_rate, channels, samples


def _decode_audio_wav(payload: bytes) -> dict:
    """Real audio decode: parse the RIFF container, emit exact-integer
    sample statistics (sums/min/max/first/last stay exact in float64,
    same knife-edge discipline as the image channel sums)."""
    sample_rate, channels, samples = decode_wav(payload)
    s = samples.astype(np.int64)
    feat = [
        float(s.sum()),
        float(len(s)),
        float(s.min()) if len(s) else 0.0,
        float(s.max()) if len(s) else 0.0,
        float(s[0]) if len(s) else 0.0,
        float(s[-1]) if len(s) else 0.0,
        float(sample_rate),
        float(channels),
    ]
    return {"d0": sample_rate, "d1": len(s), "d2": channels, "feat": feat}


def decode_y4m(payload: bytes) -> tuple[int, int, str, list[np.ndarray]]:
    """REAL pure-Python YUV4MPEG2 decoder — no video libraries.
    Parses the stream header tags (W/H/C, unknown tags skipped), then
    walks ``FRAME`` markers (per-frame parameters after the marker are
    tolerated per spec) collecting raw planar frames. Supports C444
    (3·w·h bytes/frame) and C420 (w·h + 2·⌈w/2⌉·⌈h/2⌉). Returns
    ``(w, h, colorspace, frames)``."""
    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    cs = "420"
    for tag in payload[9:nl].split(b" "):
        if tag.startswith(b"W"):
            w = int(tag[1:])
        elif tag.startswith(b"H"):
            h = int(tag[1:])
        elif tag.startswith(b"C"):
            cs = tag[1:].decode("ascii")
    if w is None or h is None:
        raise ValueError("missing W/H in y4m header")
    if cs.startswith("444"):
        fsz = 3 * w * h
    elif cs.startswith("420"):
        fsz = w * h + 2 * ((w + 1) // 2) * ((h + 1) // 2)
    else:
        raise ValueError(f"unsupported y4m colorspace C{cs}")
    frames = []
    i, n = nl + 1, len(payload)
    while i < n:
        if payload[i : i + 5] != b"FRAME":
            raise ValueError("missing FRAME marker")
        j = payload.find(b"\n", i)
        if j < 0 or j + 1 + fsz > n:
            raise ValueError("truncated y4m frame")
        frames.append(np.frombuffer(payload, np.uint8, fsz, j + 1))
        i = j + 1 + fsz
    return w, h, cs, frames


def _decode_video_y4m(payload: bytes) -> dict:
    """Real video decode: exact-integer per-plane statistics summed
    across frames (C444: Y/U/V are equal w·h thirds of each frame)."""
    w, h, cs, frames = decode_y4m(payload)
    if not cs.startswith("444"):
        raise ValueError("fixture features assume C444")
    wh = w * h
    stack = np.stack(frames).astype(np.int64) if frames else np.zeros((0, 3 * wh), np.int64)
    y, u, v = stack[:, :wh], stack[:, wh : 2 * wh], stack[:, 2 * wh :]
    feat = [
        float(y.sum()),
        float(u.sum()),
        float(v.sum()),
        float(len(frames) * wh),
        float(len(frames)),
        float(w),
        float(h),
        float(3 * wh),
    ]
    return {"d0": len(frames), "d1": w, "d2": h, "feat": feat}


_REAL_CODECS = {
    "ppm": _decode_image_ppm,
    "wav": _decode_audio_wav,
    "y4m": _decode_video_y4m,
}


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


def decode_features(assets: DataFrame, fake: bool | str = True) -> DataFrame:
    """assets → + ``(d0, d1, d2 int, feat array<double>)`` via one
    Arrow-batched ``mapInPandas`` pass.

    Modes: ``fake=True`` — deterministic byte-stat stand-in for every
    row; ``fake='auto'`` — REAL codec where one exists (``ppm`` →
    :func:`decode_ppm`), byte-stat stand-in elsewhere (the driver
    surface runs this mode, so the real decoder sits in the
    hash-checked path); ``fake=False`` — real codecs only, raising
    ``NotImplementedError`` at the exact seam where PIL/soundfile/
    ffmpeg would plug in for codecs this container lacks."""
    if fake not in (True, False, "auto"):
        raise ValueError(f"fake must be True/False/'auto', got {fake!r}")
    out_schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in assets.schema.fields)
        + ", d0 int, d1 int, d2 int, feat array<double>"
    )

    def one(payload: bytes, modality: str, codec: str) -> dict:
        real = _REAL_CODECS.get(codec)
        if fake is True or (fake == "auto" and real is None):
            return _fake_decode(payload, modality)
        if real is None:
            raise NotImplementedError(
                f"no real codec for {codec!r} in this container; "
                "integrate PIL/soundfile/ffmpeg here"
            )
        return real(payload)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                one(bytes(p), m, c)
                for p, m, c in zip(pdf["payload"], pdf["modality"], pdf["codec"])
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
    byte-identical to the Spark binary slice because every video
    payload (y4m container or utf-8 stand-in) is pure ASCII for this
    corpus (octet_length == length, asserted in tests)."""
    fb = FRAME_BYTES
    return f"""
        SELECT asset_id, CAST(i AS INT) AS frame_idx,
               md5(substr(pay, CAST(i*{fb}+1 AS INT), {fb})) AS frame_md5,
               CAST(length(substr(pay, CAST(i*{fb}+1 AS INT), {fb})) AS INT) AS frame_bytes
        FROM (
            SELECT asset_id, pay,
                   UNNEST(range(GREATEST(octet_length(encode(pay)) // {fb}, 1))) AS i
            FROM (
                SELECT doc_id AS asset_id,
                       CASE WHEN doc_id % 6 = 2 THEN {_y4m_str(duck=True)}
                            ELSE text END AS pay
                FROM documents WHERE doc_id % 3 = 2
            )
        )
        WHERE i % {every_n} = 0
    """


def duck_multimodal_features() -> str:
    """Oracle for the ``multimodal_features`` driver query. Image rows
    re-derive the REAL P6 decoder's outputs independently: header dims
    from the fixture arithmetic and exact channel sums via ``ord``
    over every 3rd pixel byte of the reconstructed RGB plane. Audio
    rows re-derive the REAL WAV decoder's outputs: each little-endian
    int16 sample recomputed from its two text bytes (``b[2k] +
    256*b[2k+1]``, zero pad byte on odd length — ASCII bytes < 0x80 so
    the sign bit never flips and unsigned re-derivation is exact). If
    either codec's header scan or byte layout drifted by one byte,
    these go red. Video rows mirror the byte-stat stand-in's
    metadata."""
    pix = f"substr(rpad(text, {_IMG_N}, text), 1, {_IMG_N})"

    def chsum(off: int) -> str:
        return (
            f"CAST(list_sum(list_transform(range({_IMG_W} * {_IMG_H}), "
            f"k -> ord(substr({pix}, CAST(k * 3 + {off + 1} AS INT), 1)))) AS DOUBLE)"
        )

    n_samp = f"({_aud_data_n(duck=True)} // 2)"
    # per-sample int16 values recomputed from the raw text bytes
    samples = (
        f"list_transform(range({n_samp}), k -> "
        f"ord(substr(text, CAST(2 * k + 1 AS INT), 1)) + 256 * "
        f"CASE WHEN 2 * k + 2 <= {_aud_len(duck=True)} "
        f"THEN ord(substr(text, CAST(2 * k + 2 AS INT), 1)) ELSE 0 END)"
    )

    def aud(agg: str) -> str:
        return f"CASE WHEN doc_id % 3 = 1 THEN CAST({agg}({samples}) AS DOUBLE) END"

    # y4m plane sums: plane p of frame f occupies cyc[f*N + p*wh + k]
    # for k < wh (N = 3*w*h bytes per C444 frame)
    vid_total = f"({_VID_NF} * {_VID_N})"
    vid_cyc = (
        f"substr(rpad(text, CAST({vid_total} AS INT), text), "
        f"1, CAST({vid_total} AS INT))"
    )
    vid_wh = f"({_VID_W} * {_VID_H})"

    def vid_plane_sum(plane: int) -> str:
        return (
            f"CASE WHEN doc_id % 6 = 2 THEN CAST(list_sum(list_transform("
            f"range({_VID_NF} * {vid_wh}), j -> ord(substr({vid_cyc}, "
            f"CAST((j // {vid_wh}) * {_VID_N} + {plane} * {vid_wh} "
            f"+ (j % {vid_wh}) + 1 AS INT), 1)))) AS DOUBLE) END"
        )

    return f"""
        SELECT doc_id AS asset_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS modality,
               CAST(CASE WHEN doc_id % 3 = 0 THEN {_IMG_W}
                    WHEN doc_id % 3 = 1 THEN {WAV_SAMPLE_RATE}
                    WHEN doc_id % 6 = 2 THEN {_VID_NF}
                    ELSE GREATEST(octet_length(encode(text)) // {FRAME_BYTES}, 1)
                    END AS INT) AS d0,
               CAST(CASE WHEN doc_id % 3 = 0 THEN {_IMG_H}
                    WHEN doc_id % 3 = 1 THEN {n_samp}
                    WHEN doc_id % 6 = 2 THEN {_VID_W}
                    ELSE {FRAME_BYTES} END AS INT) AS d1,
               CAST(CASE WHEN doc_id % 3 = 0 THEN 3
                    WHEN doc_id % 3 = 1 THEN 1
                    WHEN doc_id % 6 = 2 THEN {_VID_H}
                    ELSE 0 END AS INT) AS d2,
               CAST({FEAT_DIM} AS INT) AS feat_dim,
               CASE WHEN doc_id % 3 = 0 THEN {chsum(0)} END AS img_sum_r,
               CASE WHEN doc_id % 3 = 0 THEN {chsum(1)} END AS img_sum_g,
               CASE WHEN doc_id % 3 = 0 THEN {chsum(2)} END AS img_sum_b,
               CASE WHEN doc_id % 3 = 0
                    THEN CAST({_IMG_W} * {_IMG_H} AS DOUBLE) END AS img_npix,
               {aud("list_sum")} AS aud_sum,
               {aud("list_min")} AS aud_min,
               {aud("list_max")} AS aud_max,
               CASE WHEN doc_id % 3 = 1
                    THEN CAST(list_extract({samples}, {n_samp}) AS DOUBLE)
                    END AS aud_last,
               {vid_plane_sum(0)} AS vid_sum_y,
               {vid_plane_sum(1)} AS vid_sum_u,
               {vid_plane_sum(2)} AS vid_sum_v,
               CASE WHEN doc_id % 6 = 2
                    THEN CAST({_VID_NF} * {vid_wh} AS DOUBLE) END AS vid_npix
        FROM documents
    """
