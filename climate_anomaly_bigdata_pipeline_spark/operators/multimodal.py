"""Multimodal column plumbing (SURVEY §2.10): opaque binary payloads +
typed metadata, with Arrow-batched decode/feature-extract operators.

Image/audio/video payloads are carried as ``binary`` columns with a
metadata struct — they flow through joins/aggregations untouched.
Heavy per-item work (decode, resize, frame-sample) runs in
``mapInPandas`` (Arrow batches, no per-row Python overhead).

Decode is REAL for the container-free uncompressed formats and stubbed
only where a compressed codec library would be required:

* :func:`decode_image` / :func:`resize_image` — real numpy decode /
  nearest-neighbor resize for binary PNM images (P5 graymap, P6
  pixmap), for 8-bit grey/RGB PNG (:func:`decode_png_bytes` — stdlib
  zlib, all five scanline filters, no imaging library), AND for
  baseline-sequential AND progressive JPEG — spectral selection and
  successive approximation (``operators/jpegcodec.py`` — Annex-K
  tables, 4:4:4/4:2:0, grey and RGB, multi-scan coefficient
  accumulation + T.81 correction-bit refinement, no libjpeg);
  WebP / lossless JPEG fall through to a clearly-marked PIL stub.
* :func:`decode_audio` — real stdlib-``wave`` decode for PCM WAV and
  real FLAC decode (``operators/flaccodec.py`` — all subframe types
  incl. quantized LPC, CRC+MD5-verified, no library); MP3 falls
  through to a stub.
* :func:`sample_frames` — real every-nth frame sampling over the raw
  concatenated-RGB-frame video format (:func:`encode_raw_video`);
  container formats (MP4 etc.) fall through to a PyAV stub.
* :func:`binary_features` — a *pure-expression* deterministic feature
  set (byte length, md5 digest) used as the oracle-checkable stand-in.
* :func:`extract_features_batched` — the same features computed inside
  ``mapInPandas``: tests assert it matches the expression path
  bit-for-bit.

Scale notes: binary payloads dominate row size — repartition by a
content-derived key before wide shuffles so AQE can split skewed
batches, and always select the metadata struct (not the payload) into
aggregation-only subplans so column pruning drops the bytes at the scan.
Frame sampling multiplies rows: the output carries one frame payload
per row, so downstream stages see bounded row sizes instead of one
giant video blob per task.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of feature extraction — shared by the expression path
#: and the mapInPandas path.
FEATURE_SCHEMA = "doc_id long, content_type string, n_bytes int, digest string"


def attach_binary(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    content_type: str = "application/octet-stream",
) -> DataFrame:
    """Materialize an opaque binary payload column + metadata struct
    (here UTF-8 bytes of a text column stand in for image/audio bytes)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit(content_type).alias("content_type"),
            F.length(payload).alias("n_bytes"),
        ).alias("meta"),
    )


def binary_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Pure-expression feature extraction over the payload: byte count
    and md5 digest — deterministic, engine-portable, no Python."""
    return df.select(
        F.col(id_col),
        F.col("meta.content_type").alias("content_type"),
        F.length("payload").cast("int").alias("n_bytes"),
        F.md5("payload").alias("digest"),
    )


def extract_features_batched(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """The same features via ``mapInPandas`` — the Arrow-batched shape a
    real decoder plugs into (swap the body for PIL/libav calls)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "content_type": [m["content_type"] for m in pdf["meta"]],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "digest": pdf["payload"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)


def _require(module: str, what: str):
    try:
        return __import__(module)
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            f"STUB: {what} requires '{module}', which is not installed in "
            "this container. Uncompressed formats (PNM images, PCM WAV, "
            "raw-RGB video) decode natively — see encode_ppm/encode_wav/"
            "encode_raw_video."
        ) from e


# ---- pure-Python codecs for uncompressed formats ---------------------------
#
# These are REAL decoders (no external libraries): binary PNM for
# images, PCM WAV via the stdlib ``wave`` module for audio, and a
# 12-byte-header concatenated-raw-RGB-frame layout for video. They give
# the mapInPandas operators below an end-to-end executable path in any
# environment; PNG (below), baseline JPEG (operators/jpegcodec.py) and
# FLAC incl. LPC subframes (operators/flaccodec.py) decode natively
# too. Remaining compressed formats (progressive JPEG, MP3, MP4) still
# require PIL/av and raise the clearly-marked stub error.


def encode_ppm(arr: np.ndarray) -> bytes:
    """Encode an image array as binary PNM: (h, w, 3) uint8 → P6 pixmap,
    (h, w) uint8 → P5 graymap."""
    if arr.ndim == 3 and arr.shape[2] == 3:
        magic = b"P6"
    elif arr.ndim == 2:
        magic = b"P5"
    else:
        raise ValueError(f"expected (h,w) or (h,w,3) uint8, got {arr.shape}")
    h, w = arr.shape[:2]
    return magic + f"\n{w} {h}\n255\n".encode() + arr.astype(np.uint8).tobytes()


def decode_pnm_bytes(b: bytes) -> tuple[str, int, int, np.ndarray]:
    """Decode binary PNM bytes → (mode, width, height, pixel array).
    Handles P5 (mode 'L') and P6 (mode 'RGB'), maxval 255, with
    whitespace/comment-tolerant headers."""
    if b[:2] not in (b"P5", b"P6"):
        raise ValueError(f"not a binary PNM payload (magic {b[:2]!r})")
    mode = "L" if b[:2] == b"P5" else "RGB"
    # Header: magic, width, height, maxval — tokens separated by
    # whitespace, '#' comments run to end-of-line.
    tokens: list[int] = []
    pos = 2
    while len(tokens) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if b[pos : pos + 1] == b"#":
            pos = b.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(b[start:pos]))
    pos += 1  # single whitespace after maxval, then raster
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    n = w * h * (3 if mode == "RGB" else 1)
    arr = np.frombuffer(b, dtype=np.uint8, count=n, offset=pos)
    return mode, w, h, arr.reshape((h, w, 3) if mode == "RGB" else (h, w))


# ---- PNG codec (stdlib zlib — no imaging library) ---------------------------
#
# Critical chunks only (IHDR/IDAT/IEND), 8-bit greyscale (color type 0)
# and truecolor RGB (color type 2), no interlace — the subset that
# covers losslessly-compressed training images without PIL. All five
# scanline filters (None/Sub/Up/Average/Paeth, PNG spec §9) are
# implemented in BOTH directions so foreign encoders' output decodes,
# not just our own. Baseline JPEG decodes via operators/jpegcodec.py,
# FLAC (all subframe types incl. LPC) via operators/flaccodec.py;
# progressive JPEG stays behind the honest _require stub.

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _filter_scanline(f: int, cur: bytes, prev: bytes, bpp: int) -> bytes:
    """FILTER (encode) one scanline — fully vectorized: every predictor
    reads RAW bytes of cur/prev (no recurrence on encode), so all five
    filter types are one numpy expression over the scanline."""
    c = np.frombuffer(cur, dtype=np.uint8).astype(np.int16)
    p = np.frombuffer(prev, dtype=np.uint8).astype(np.int16)
    a = np.zeros_like(c)
    a[bpp:] = c[:-bpp]
    cc = np.zeros_like(p)
    cc[bpp:] = p[:-bpp]
    if f == 0:
        pred = np.zeros_like(c)
    elif f == 1:
        pred = a
    elif f == 2:
        pred = p
    elif f == 3:
        pred = (a + p) >> 1
    else:
        q = a + p - cc
        pa, pb, pc = np.abs(q - a), np.abs(q - p), np.abs(q - cc)
        pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, p, cc))
    return ((c - pred) & 0xFF).astype(np.uint8).tobytes()


def _unfilter_scanline(f: int, cur: bytearray, prev: bytes, bpp: int) -> None:
    """UNFILTER (decode) one scanline in place. None/Up are pure
    elementwise ops and Sub is a per-channel running sum (cumsum mod
    256) — all vectorized. Average and Paeth carry a true sequential
    dependency through the just-reconstructed left neighbor, so they
    keep the per-byte loop (the price of those two filter types, not
    of the codec)."""
    n = len(cur)
    if f == 0:
        return
    if f == 2:
        out = (
            np.frombuffer(bytes(cur), dtype=np.uint8).astype(np.int16)
            + np.frombuffer(prev, dtype=np.uint8).astype(np.int16)
        ) & 0xFF
        cur[:] = out.astype(np.uint8).tobytes()
        return
    if f == 1:
        # x[i] = f[i] + x[i-bpp]  ==  per-channel cumsum mod 256.
        arr = np.frombuffer(bytes(cur), dtype=np.uint8)
        pad = (-n) % bpp
        if pad:
            arr = np.concatenate([arr, np.zeros(pad, dtype=np.uint8)])
        ch = arr.reshape(-1, bpp).astype(np.int64)
        out = (np.cumsum(ch, axis=0) & 0xFF).astype(np.uint8).reshape(-1)
        cur[:] = out[:n].tobytes()
        return
    if f not in (3, 4):
        raise ValueError(f"unknown PNG filter type {f}")
    for i in range(n):
        a = cur[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        pred = (a + b) >> 1 if f == 3 else _paeth(a, b, c)
        cur[i] = (cur[i] + pred) & 0xFF


def encode_png(arr: np.ndarray, filters: int | str = 0) -> bytes:
    """Encode (h, w) or (h, w, 3) uint8 as PNG. ``filters``: a fixed
    filter type 0-4 for every scanline, or ``"cycle"`` to rotate
    through all five (exercises every decoder path; the image is
    identical either way — PNG filtering is lossless)."""
    import zlib

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 3 and a.shape[2] == 3:
        color, bpp = 2, 3
    elif a.ndim == 2:
        color, bpp = 0, 1
    else:
        raise ValueError(f"expected (h,w) or (h,w,3) uint8, got {a.shape}")
    h, w = a.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = bytearray()
    prev = bytes(w * bpp)
    for y in range(h):
        cur = a[y].tobytes()
        f = (y % 5) if filters == "cycle" else int(filters)
        raw += bytes([f]) + _filter_scanline(f, cur, prev, bpp)
        prev = cur
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png_bytes(b: bytes) -> tuple[str, int, int, np.ndarray]:
    """Decode PNG bytes → (mode, width, height, array). Supports 8-bit
    greyscale ('L') and RGB, non-interlaced, any scanline filters,
    multiple IDAT chunks; ancillary chunks are skipped."""
    import zlib

    if b[:8] != _PNG_MAGIC:
        raise ValueError(f"not a PNG payload (magic {b[:8]!r})")
    pos, ihdr, idat = 8, None, bytearray()
    while pos < len(b):
        (length,) = struct.unpack(">I", b[pos : pos + 4])
        typ = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in (0, 2) or comp or filt or interlace:
        raise NotImplementedError(
            "STUB: only 8-bit grey/RGB non-interlaced PNG decodes natively "
            f"(got depth={depth} color={color} interlace={interlace})"
        )
    bpp = 3 if color == 2 else 1
    mode = "RGB" if color == 2 else "L"
    raw = zlib.decompress(bytes(idat))
    stride = w * bpp
    out = np.empty((h, stride), dtype=np.uint8)
    prev = bytes(stride)
    for y in range(h):
        f = raw[y * (stride + 1)]
        cur = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        _unfilter_scanline(f, cur, prev, bpp)
        out[y] = np.frombuffer(bytes(cur), dtype=np.uint8)
        prev = bytes(cur)
    return mode, w, h, out.reshape((h, w, 3) if color == 2 else (h, w))


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """Encode int16 PCM samples ((n,) mono or (n, channels)) as WAV."""
    s = np.asarray(samples, dtype="<i2")
    channels = 1 if s.ndim == 1 else s.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(s.tobytes())
    return buf.getvalue()


#: Raw-video layout: magic ``RVID`` + big-endian u16 width, u16 height,
#: u32 frame count, then frame-count raw (h, w, 3) uint8 RGB rasters.
_RVID_MAGIC = b"RVID"


def encode_raw_video(frames: np.ndarray) -> bytes:
    """Encode an (n_frames, h, w, 3) uint8 array as raw-RGB video."""
    f = np.asarray(frames, dtype=np.uint8)
    n, h, w, _ = f.shape
    return _RVID_MAGIC + struct.pack(">HHI", w, h, n) + f.tobytes()


#: Decoded-image feature schema (decode_image output).
IMAGE_SCHEMA = (
    "doc_id long, mode string, width int, height int, mean_luma double"
)

#: Decoded-audio feature schema (decode_audio output).
AUDIO_SCHEMA = (
    "doc_id long, sample_rate int, channels int, n_samples long, "
    "duration_s double, rms double"
)

#: Sampled-frame schema (sample_frames output): one row per kept frame,
#: each re-encoded as a standalone P6 image payload.
FRAME_SCHEMA = "doc_id long, frame_idx int, payload binary"

#: ITU-R BT.601 luma weights — the standard RGB→luma reduction.
_LUMA = np.array([0.299, 0.587, 0.114])


def _decode_any_image(b: bytes) -> tuple[str, int, int, np.ndarray]:
    """Dispatch on magic: PNM (P5/P6), PNG, and JPEG (baseline AND
    progressive spectral-selection) decode natively; anything else
    (WebP, lossless JPEG, ...) needs a codec library → honest PIL
    stub."""
    if b[:2] in (b"P5", b"P6"):
        return decode_pnm_bytes(b)
    if b[:8] == _PNG_MAGIC:
        return decode_png_bytes(b)
    if b[:2] == b"\xff\xd8":
        from climate_anomaly_bigdata_pipeline_spark.operators import jpegcodec

        return jpegcodec.decode_jpeg_baseline(b)
    _require("PIL", f"decoding magic {b[:4]!r}")
    raise AssertionError("unreachable")  # _require always raises here


def decode_image(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Decode image payloads to (mode, width, height, mean_luma).

    REAL for binary PNM (P5/P6) via :func:`decode_pnm_bytes`, for
    8-bit grey/RGB PNG via :func:`decode_png_bytes` (stdlib zlib), and
    for baseline-sequential JPEG via ``operators/jpegcodec.py``; any
    other magic needs a codec library → PIL stub. Arrow-batched
    ``mapInPandas``: one Python invocation per batch, not per row."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "mode": [], "width": [], "height": [],
                   "mean_luma": []}
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                mode, w, h, arr = _decode_any_image(bytes(payload))
                luma = arr @ _LUMA if mode == "RGB" else arr
                out["doc_id"].append(doc_id)
                out["mode"].append(mode)
                out["width"].append(w)
                out["height"].append(h)
                out["mean_luma"].append(round(float(luma.mean()), 4))
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, schema=IMAGE_SCHEMA)


def resize_image(df: DataFrame, width: int, height: int,
                 id_col: str = "doc_id") -> DataFrame:
    """Nearest-neighbor resize of PNM payloads to (width, height),
    returning re-encoded PNM payloads (doc_id, payload, meta). REAL for
    PNM — index-slicing in numpy, no codec; other formats → PIL stub."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                _, w, h, arr = _decode_any_image(bytes(payload))
                ys = (np.arange(height) * h // height)
                xs = (np.arange(width) * w // width)
                ids.append(doc_id)
                payloads.append(encode_ppm(arr[ys][:, xs]))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    out = df.mapInPandas(batches, schema=f"{id_col} long, payload binary")
    return out.select(
        F.col(id_col),
        "payload",
        F.struct(
            F.lit("image/x-portable-anymap").alias("content_type"),
            F.length("payload").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_audio(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Decode audio payloads to (sample_rate, channels, n_samples,
    duration_s, rms). REAL for PCM WAV (stdlib ``wave``) AND for
    FLAC (operators/flaccodec.py — all subframe types incl. LPC,
    CRC+MD5-verified, no external library); other compressed audio
    (MP3) → stub."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "sample_rate": [], "channels": [],
                   "n_samples": [], "duration_s": [], "rms": []}
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                b = bytes(payload)
                if b[:4] == b"fLaC":
                    from climate_anomaly_bigdata_pipeline_spark.operators.flaccodec import (
                        decode_flac_bytes,
                    )

                    rate, ch, _bps, arr = decode_flac_bytes(b)
                    n = arr.shape[0]
                    samples = arr.astype(np.float64).reshape(-1)
                    out["doc_id"].append(doc_id)
                    out["sample_rate"].append(rate)
                    out["channels"].append(ch)
                    out["n_samples"].append(n)
                    out["duration_s"].append(round(n / rate, 6))
                    out["rms"].append(
                        round(float(np.sqrt(np.mean(samples**2))), 4)
                        if n else 0.0
                    )
                    continue
                if b[:4] != b"RIFF":
                    _require("soundfile", f"decoding magic {b[:4]!r}")
                with wave.open(io.BytesIO(b), "rb") as wf:
                    rate, ch = wf.getframerate(), wf.getnchannels()
                    n = wf.getnframes()
                    if wf.getsampwidth() != 2:
                        raise ValueError("only 16-bit PCM WAV supported")
                    samples = np.frombuffer(
                        wf.readframes(n), dtype="<i2"
                    ).astype(np.float64)
                out["doc_id"].append(doc_id)
                out["sample_rate"].append(rate)
                out["channels"].append(ch)
                out["n_samples"].append(n)
                out["duration_s"].append(round(n / rate, 6))
                out["rms"].append(
                    round(float(np.sqrt(np.mean(samples**2))), 4)
                    if n else 0.0
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, schema=AUDIO_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 30,
                  id_col: str = "doc_id") -> DataFrame:
    """Sample every-nth frame of raw-RGB video payloads
    (:func:`encode_raw_video` layout), emitting one row per kept frame
    with the frame re-encoded as a standalone P6 image payload — so
    downstream stages (decode_image, resize_image) compose directly and
    row sizes stay frame-bounded. Container formats (MP4 …) → av stub."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, payloads = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                b = bytes(payload)
                if b[:4] != _RVID_MAGIC:
                    _require("av", f"demuxing magic {b[:4]!r}")
                w, h, n = struct.unpack(">HHI", b[4:12])
                frames = np.frombuffer(
                    b, dtype=np.uint8, count=n * h * w * 3, offset=12
                ).reshape(n, h, w, 3)
                for i in range(0, n, every_n):
                    ids.append(doc_id)
                    idxs.append(i)
                    payloads.append(encode_ppm(frames[i]))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "payload": payloads}
            )

    return df.mapInPandas(batches, schema=FRAME_SCHEMA)


def scene_cuts(df: DataFrame, threshold: float = 20.0,
               id_col: str = "doc_id") -> DataFrame:
    """Scene-cut detection over raw-RGB video payloads
    (:func:`encode_raw_video` layout): one row per detected cut
    ``(id_col, cut_idx, delta)`` where ``delta`` is the mean absolute
    pixel difference between frame ``cut_idx`` and its predecessor and
    a cut fires at ``delta >= threshold`` — the shot-boundary pass a
    video curation pipeline runs before per-shot sampling/captioning.

    The delta is a ratio of exact integers (a sum of uint8 absolute
    differences over pixel count), so the threshold comparison is
    engine-exact and the whole stage sits under a closed-form SQL
    oracle when the clip content is deterministic. Batch shape: frames
    stream pairwise inside the Arrow batch — memory is 2 frames per
    clip, never the whole video. Container formats (MP4 …) → av stub.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, deltas = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                b = bytes(payload)
                if b[:4] != _RVID_MAGIC:
                    _require("av", f"demuxing magic {b[:4]!r}")
                w, h, n = struct.unpack(">HHI", b[4:12])
                npix = h * w * 3
                prev = None
                for i in range(n):
                    frame = np.frombuffer(
                        b, dtype=np.uint8, count=npix, offset=12 + i * npix
                    ).astype(np.int64)
                    if prev is not None:
                        delta = float(np.abs(frame - prev).sum()) / npix
                        if delta >= threshold:
                            ids.append(doc_id)
                            idxs.append(i)
                            deltas.append(delta)
                    prev = frame
            yield pd.DataFrame(
                {"doc_id": ids, "cut_idx": idxs, "delta": deltas}
            )

    return df.mapInPandas(batches, schema="doc_id long, cut_idx int, delta double")


def extract_features_arrow(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """The :func:`extract_features_batched` features via ``mapInArrow``
    — Arrow ``RecordBatch`` in, RecordBatch out, skipping the
    Arrow→pandas materialization entirely. This is the lowest-overhead
    Python exchange Spark offers (PySpark 4 API-surface completeness;
    tests assert bit-parity with both the expression path and the
    pandas path). Prefer this shape when the Python side is
    columnar-friendly; per-row digests still cost a Python loop."""
    import pyarrow as pa

    def batches(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in it:
            ids = rb.column(rb.schema.get_field_index(id_col))
            payloads = rb.column(rb.schema.get_field_index("payload"))
            metas = rb.column(rb.schema.get_field_index("meta"))
            ctypes = metas.field("content_type")
            n_bytes = pa.array(
                [len(p.as_py()) for p in payloads], type=pa.int32()
            )
            digests = pa.array(
                [hashlib.md5(p.as_py()).hexdigest() for p in payloads]
            )
            yield pa.RecordBatch.from_arrays(
                [ids, ctypes, n_bytes, digests],
                ["doc_id", "content_type", "n_bytes", "digest"],
            )

    return df.mapInArrow(batches, schema=FEATURE_SCHEMA)


# ---- perceptual image hashing -------------------------------------------------


def perceptual_hash_images(
    df: DataFrame, id_col: str = "doc_id", kind: str = "ahash"
) -> DataFrame:
    """Perceptual hash per image payload → ``(id_col, phash)`` with the
    hash as a 16-hex-char string (64 bits for aHash, 56 for dHash,
    zero-padded).

    * ``ahash``: decode → exact 8×8 block-mean pool (dims must be
      multiples of 8) → bit per cell, 1 iff cell > global mean. By
      construction invariant to uniform brightness shifts (every cell
      AND the mean shift together), which is what makes it a
      *perceptual* dedup key: byte-distinct payloads hash equal.
    * ``dhash``: same pooling, bit per horizontal neighbor pair,
      1 iff right cell > left cell — invariant to brightness AND
      contrast scaling.

    Arrow-batched ``mapInPandas``; the downstream dedup is a plain
    groupBy on the hash — near-dup image clustering with one linear
    decode pass and one hash-keyed exchange, no pairwise image
    comparison anywhere (the 100 TB shape)."""
    if kind not in ("ahash", "dhash"):
        raise ValueError(f"unknown perceptual hash kind: {kind}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, hashes = [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                mode, w, h, arr = _decode_any_image(bytes(payload))
                luma = (arr @ _LUMA) if mode == "RGB" else arr.astype(np.float64)
                if h % 8 or w % 8:
                    raise ValueError(
                        f"perceptual hash needs dims divisible by 8, got {w}x{h}"
                    )
                cells = luma.reshape(8, h // 8, 8, w // 8).mean(axis=(1, 3))
                if kind == "ahash":
                    bits = (cells > cells.mean()).ravel()
                else:
                    bits = (cells[:, 1:] > cells[:, :-1]).ravel()
                v = 0
                for bit in bits:
                    v = (v << 1) | int(bit)
                ids.append(doc_id)
                hashes.append(format(v, "016x"))
            yield pd.DataFrame({id_col: ids, "phash": hashes})

    return df.mapInPandas(batches, schema=f"{id_col} long, phash string")


def audio_fingerprint(
    df: DataFrame, id_col: str = "doc_id", frame: int = 256
) -> DataFrame:
    """Spectral fingerprint per audio payload → ``(id_col, afp)``: the
    clip is cut into non-overlapping ``frame``-sample windows, each
    window contributes its dominant FFT bin (argmax of the rFFT
    magnitude over bins 1..frame/2 — bin 0 is DC, so the fingerprint is
    loudness- and offset-invariant for a dominant tone), and the
    fingerprint is the dash-joined bin sequence — a miniature
    constellation hash (the Shazam recipe's skeleton: landmark =
    per-window spectral peak).

    REAL decode for 16-bit PCM WAV (stdlib ``wave``) and FLAC (repo
    codec); Arrow-batched ``mapInPandas``; dedup downstream is a plain
    groupBy on the fingerprint string — one linear decode+FFT pass and
    one hash-keyed exchange, never a pairwise waveform comparison."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, fps = [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                b = bytes(payload)
                if b[:4] == b"fLaC":
                    from climate_anomaly_bigdata_pipeline_spark.operators.flaccodec import (
                        decode_flac_bytes,
                    )

                    _rate, _ch, _bps, arr = decode_flac_bytes(b)
                    samples = arr.astype(np.float64).reshape(-1)
                elif b[:4] == b"RIFF":
                    with wave.open(io.BytesIO(b), "rb") as wf:
                        if wf.getsampwidth() != 2:
                            raise ValueError("only 16-bit PCM WAV supported")
                        samples = np.frombuffer(
                            wf.readframes(wf.getnframes()), dtype="<i2"
                        ).astype(np.float64)
                else:
                    _require("soundfile", f"decoding magic {b[:4]!r}")
                    # _require raises when soundfile is absent (this
                    # container); if it IS installed there is still no
                    # decode path here, so fail loudly either way
                    # instead of falling through with `samples` unbound.
                    raise NotImplementedError(
                        f"no decoder wired for audio magic {b[:4]!r}"
                    )
                n_frames = len(samples) // frame
                peaks = []
                for i in range(n_frames):
                    mag = np.abs(
                        np.fft.rfft(samples[i * frame : (i + 1) * frame])
                    )
                    peaks.append(int(np.argmax(mag[1:]) + 1))
                ids.append(doc_id)
                fps.append("-".join(map(str, peaks)))
            yield pd.DataFrame({id_col: ids, "afp": fps})

    return df.mapInPandas(batches, schema=f"{id_col} long, afp string")
