"""Multimodal column plumbing: image/audio/video as opaque BINARY columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` UDFs.

The container has no image/audio codecs, so the decode kernels are STUBS
behind an import-try: with real libs present (PIL/librosa/av) they would
decode; here they raise ``NotImplementedError`` unless ``fake=True``, in
which case a deterministic fake decoder (byte-histogram features, hash-based
frame offsets) exercises the full Spark-side pipeline — schema, partitioning,
UDF signature, Arrow batch shape — which IS real and tested.

Scale notes: payloads stay in executor memory one Arrow batch at a time
(``maxRecordsPerBatch`` bounds batch bytes); feature extraction is
embarrassingly parallel with zero shuffle; downstream joins treat the output
as a normal columnar table.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, modality string, payload binary, "
    "meta_width int, meta_height int, meta_duration_ms int, meta_codec string"
)

FEATURE_DIM = 32


def synthetic_media(spark: SparkSession, source_df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic fake media table derived from a text corpus: payload =
    UTF-8 bytes, modality round-robins image/audio/video, metadata derived
    from payload length. Stands in for real blob columns end to end."""
    return source_df.select(
        F.col(id_col).alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("modality"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        (F.length(F.col(text_col)) % 1024).cast("int").alias("meta_width"),
        (F.length(F.col(text_col)) % 768).cast("int").alias("meta_height"),
        (F.length(F.col(text_col)) * 40).cast("int").alias("meta_duration_ms"),
        F.lit("fake/v1").alias("meta_codec"),
    )


def _decode_real(payload: bytes, modality: str) -> np.ndarray:
    """Real decode path — requires codec libraries not present here."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            "media codecs not available in this environment; use fake=True"
        ) from None
    raise NotImplementedError("real decode path not wired in this container")


def _decode_fake(payload: bytes) -> np.ndarray:
    """Deterministic stand-in: 32-bin byte histogram, L1-normalized."""
    if not payload:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=FEATURE_DIM, range=(0, 256))
    total = hist.sum()
    return (hist / total if total else hist).astype(np.float32)


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """media → (media_id, modality, features ARRAY<FLOAT>) via mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decode = _decode_fake if fake else (lambda p: _decode_real(p, "any"))
            feats = [decode(p if p is not None else b"").tolist() for p in pdf["payload"]]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "modality": pdf["modality"], "features": feats}
            )

    return media.mapInPandas(run, schema="media_id bigint, modality string, features array<float>")


def resize_images(media: DataFrame, width: int = 64, height: int = 64, fake: bool = True) -> DataFrame:
    """image → (media_id, out_width, out_height, resized_md5, scale_x, scale_y).

    Real path would decode + PIL-resize + re-encode (stubbed, no codecs in
    this container); the deterministic fake re-fingerprints the payload with
    the target geometry so the full Spark plumbing — filter to modality,
    Arrow batches, per-row kernel, typed output schema — runs for real.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.modality != "image":
                    continue
                if not fake:
                    _decode_real(r.payload, "image")
                payload = r.payload if r.payload is not None else b""
                fp = hashlib.md5(payload + f"{width}x{height}".encode()).hexdigest()
                # No rounding: IEEE double division is bit-identical across
                # engines; Python round() is banker's, SQL round() is not.
                sx = width / r.meta_width if r.meta_width else None
                sy = height / r.meta_height if r.meta_height else None
                rows.append((r.media_id, width, height, fp, sx, sy))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "out_width", "out_height", "resized_md5", "scale_x", "scale_y"],
            )

    return media.mapInPandas(
        run,
        schema=(
            "media_id bigint, out_width int, out_height int, "
            "resized_md5 string, scale_x double, scale_y double"
        ),
    )


def sample_frames(media: DataFrame, num_frames: int = 4, fake: bool = True) -> DataFrame:
    """video → (media_id, frame_idx, frame_offset_ms, frame_fingerprint).

    Deterministic fake frame sampler: evenly spaced offsets within
    meta_duration_ms, fingerprint = md5 of payload slice. The real path
    would seek/decode with PyAV — stubbed (see module docstring).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.modality != "video":
                    continue
                if not fake:
                    _decode_real(r.payload, "video")
                dur = max(int(r.meta_duration_ms or 0), 1)
                payload = r.payload or b""
                for i in range(num_frames):
                    off = (dur * i) // num_frames
                    lo = (len(payload) * i) // num_frames
                    hi = (len(payload) * (i + 1)) // num_frames
                    fp = hashlib.md5(payload[lo:hi]).hexdigest()
                    rows.append((r.media_id, i, off, fp))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_offset_ms", "frame_fingerprint"]
            )

    return media.mapInPandas(
        run,
        schema="media_id bigint, frame_idx int, frame_offset_ms int, frame_fingerprint string",
    )


# ---------------------------------------------------------------------------
# REAL image path: P6 PPM (pure-numpy codec — no external libraries needed)
# ---------------------------------------------------------------------------
#
# The fake=True kernels above stand in for codec-dependent formats
# (JPEG/PNG/AV). PPM needs no codec: the payload IS the pixel buffer with a
# text header, so this path is a genuinely real decode → transform →
# re-encode pipeline, oracle-checked byte-exactly (the oracle reconstructs
# the same pixels in SQL).


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary P6 PPM."""
    h, w, _ = img.shape
    return f"P6\n{w} {h}\n255\n".encode() + img.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary P6 PPM → (h, w, 3) uint8. Raises on any other format — the
    codec-dependent formats remain explicitly unsupported here."""
    if not payload.startswith(b"P6"):
        raise NotImplementedError("only P6 PPM is decodable without codec libraries")
    # header = magic, width, height, maxval as whitespace-separated tokens
    parts = payload.split(b"\n", 3)
    w, h = (int(t) for t in parts[1].split())
    maxval = int(parts[2])
    if maxval != 255:
        raise NotImplementedError("only 8-bit PPM supported")
    pix = np.frombuffer(parts[3], dtype=np.uint8, count=w * h * 3)
    return pix.reshape(h, w, 3)


def synthetic_ppm_images(spark: SparkSession, source_df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Real P6 PPM payloads built from JVM expressions only: pixel bytes are
    the document's (ASCII) text rpad-repeated to exactly w*h*3 chars, so an
    oracle can reconstruct the identical payload with SQL string functions.
    """
    w = (F.lit(8) + F.col(id_col) % 9).cast("int")
    h = (F.lit(8) + F.col(id_col) % 7).cast("int")
    # rpad counts CHARS but the decoder indexes BYTES; map any non-printable
    # /non-ASCII char to 'x' first so 1 char == 1 byte and the SQL oracle's
    # char-indexed reconstruction stays byte-exact on any corpus.
    ascii_text = F.regexp_replace(F.col(text_col), "[^ -~]", "x")
    body = F.coalesce(F.nullif(ascii_text, F.lit("")), F.lit("x"))
    pix = F.rpad(body, (w * h * 3).cast("int"), body)
    payload = F.encode(
        F.concat(F.lit("P6\n"), w.cast("string"), F.lit(" "), h.cast("string"), F.lit("\n255\n"), pix),
        "UTF-8",
    )
    return source_df.select(
        F.col(id_col).alias("media_id"),
        w.alias("meta_width"),
        h.alias("meta_height"),
        payload.alias("payload"),
    )


def ppm_decode_stats(media: DataFrame) -> DataFrame:
    """REAL decode: parse each P6 header + pixel buffer, emit the parsed
    geometry and exact per-channel means — everything derived from the
    decoded array, nothing from metadata columns."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                img = decode_ppm(bytes(r.payload))
                means = img.reshape(-1, 3).mean(axis=0, dtype=np.float64)
                # raw doubles out; rounding happens in Spark's F.round
                # (HALF_UP, matching SQL) — Python round() is banker's and
                # diverges on exact ties like 100.78125.
                rows.append(
                    (r.media_id, img.shape[1], img.shape[0],
                     float(means[0]), float(means[1]), float(means[2]))
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "img_w", "img_h", "mean_r", "mean_g", "mean_b"]
            )

    out = media.select("media_id", "payload").mapInPandas(
        run,
        schema="media_id bigint, img_w int, img_h int, mean_r double, mean_g double, mean_b double",
    )
    return out.select(
        "media_id",
        "img_w",
        "img_h",
        F.round("mean_r", 4).alias("mean_r"),
        F.round("mean_g", 4).alias("mean_g"),
        F.round("mean_b", 4).alias("mean_b"),
    )


def ppm_resize_nn(media: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """REAL resize: decode → nearest-neighbor index map (src = floor(dst *
    src_dim / dst_dim)) → re-encode as P6 → md5 of the new payload. The
    oracle rebuilds the identical resized byte string in SQL, so this
    checks the whole decode/transform/encode path byte-exactly."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                img = decode_ppm(bytes(r.payload))
                h, w, _ = img.shape
                ys = (np.arange(out_h) * h) // out_h
                xs = (np.arange(out_w) * w) // out_w
                resized = img[np.ix_(ys, xs)]
                rows.append((r.media_id, out_w, out_h, hashlib.md5(encode_ppm(resized)).hexdigest()))
            yield pd.DataFrame(rows, columns=["media_id", "out_w", "out_h", "resized_md5"])

    return media.select("media_id", "payload").mapInPandas(
        run, schema="media_id bigint, out_w int, out_h int, resized_md5 string"
    )
