"""Real multimodal decode paths (SURVEY §2.10): the uncompressed
formats (binary PNM images, PCM WAV audio, raw-RGB video) decode
natively inside mapInPandas — no codec libraries required — while
compressed formats keep the clearly-marked stubs (covered in
test_northstar.py)."""

from __future__ import annotations

import numpy as np
import pytest

from climate_anomaly_bigdata_pipeline_spark.operators import multimodal as MM


def _img_df(spark, arrays):
    rows = [(i, MM.encode_ppm(a)) for i, a in enumerate(arrays)]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_ppm_roundtrip():
    rgb = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    mode, w, h, arr = MM.decode_pnm_bytes(MM.encode_ppm(rgb))
    assert (mode, w, h) == ("RGB", 3, 2)
    assert np.array_equal(arr, rgb)
    gray = np.arange(6, dtype=np.uint8).reshape(2, 3)
    mode, w, h, arr = MM.decode_pnm_bytes(MM.encode_ppm(gray))
    assert (mode, w, h) == ("L", 3, 2)
    assert np.array_equal(arr, gray)


def test_pnm_header_comments():
    b = b"P5\n# a comment\n2 2\n255\n" + bytes([0, 50, 100, 200])
    mode, w, h, arr = MM.decode_pnm_bytes(b)
    assert (mode, w, h) == ("L", 2, 2)
    assert arr.tolist() == [[0, 50], [100, 200]]


def test_png_roundtrip_all_filters():
    rng = np.random.RandomState(3)
    rgb = rng.randint(0, 256, (7, 5, 3), dtype=np.uint8)
    gray = rng.randint(0, 256, (6, 9), dtype=np.uint8)
    for img, want_mode in [(rgb, "RGB"), (gray, "L")]:
        for filters in [0, 1, 2, 3, 4, "cycle"]:
            mode, w, h, arr = MM.decode_png_bytes(MM.encode_png(img, filters))
            assert (mode, w, h) == (want_mode, img.shape[1], img.shape[0])
            assert np.array_equal(arr, img), (want_mode, filters)


def test_png_decode_parity_with_ppm_roundtrip(spark):
    """The same pixels through the PNG path (deflate + filters) and the
    PNM path must produce identical decode_image rows."""
    rng = np.random.RandomState(4)
    imgs = [
        rng.randint(0, 256, (5, 8, 3), dtype=np.uint8),
        rng.randint(0, 256, (4, 4), dtype=np.uint8),
    ]
    ppm = spark.createDataFrame(
        [(i, MM.encode_ppm(a)) for i, a in enumerate(imgs)],
        "doc_id long, payload binary",
    )
    png = spark.createDataFrame(
        [(i, MM.encode_png(a, filters="cycle")) for i, a in enumerate(imgs)],
        "doc_id long, payload binary",
    )
    a = sorted(map(tuple, MM.decode_image(ppm).collect()))
    b = sorted(map(tuple, MM.decode_image(png).collect()))
    assert a == b


def test_png_resize_composes(spark):
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    img[2:, 2:] = 30
    df = spark.createDataFrame(
        [(0, MM.encode_png(img))], "doc_id long, payload binary"
    )
    [row] = MM.resize_image(df, width=2, height=2).collect()
    _, w, h, arr = MM.decode_pnm_bytes(bytes(row["payload"]))
    assert (w, h) == (2, 2) and arr[1, 1, 0] == 30


def test_lossy_codecs_still_stub(spark):
    jpeg = spark.createDataFrame(
        [(0, b"\xff\xd8\xff\xe0rest-of-a-jpeg")], "doc_id long, payload binary"
    )
    with pytest.raises(Exception) as ei:
        MM.decode_image(jpeg).collect()
    assert "STUB" in str(ei.value)


def test_png_unsupported_features_raise_stub():
    # 16-bit depth PNG header → NotImplementedError, not silent garbage
    import struct as st
    import zlib

    ihdr = st.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    b = (
        MM._PNG_MAGIC
        + MM._png_chunk(b"IHDR", ihdr)
        + MM._png_chunk(b"IDAT", zlib.compress(b"\x00" * 10))
        + MM._png_chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError):
        MM.decode_png_bytes(b)


def test_decode_image_real(spark):
    solid = np.full((4, 6, 3), 100, dtype=np.uint8)  # luma == 100
    gray = np.full((2, 2), 7, dtype=np.uint8)
    out = {r["doc_id"]: r for r in MM.decode_image(_img_df(spark, [solid, gray])).collect()}
    assert (out[0]["mode"], out[0]["width"], out[0]["height"]) == ("RGB", 6, 4)
    assert out[0]["mean_luma"] == pytest.approx(100.0)
    assert (out[1]["mode"], out[1]["mean_luma"]) == ("L", 7.0)


def test_resize_image_nearest_neighbor(spark):
    # 4x4 checker of 2x2 blocks -> 2x2 nearest keeps one px per block
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    img[:2, 2:] = 10
    img[2:, :2] = 20
    img[2:, 2:] = 30
    [row] = MM.resize_image(_img_df(spark, [img]), width=2, height=2).collect()
    _, w, h, arr = MM.decode_pnm_bytes(bytes(row["payload"]))
    assert (w, h) == (2, 2)
    assert arr[:, :, 0].tolist() == [[0, 10], [20, 30]]
    assert row["meta"]["n_bytes"] == len(bytes(row["payload"]))


def test_decode_audio_real(spark):
    rate = 8000
    # 1-second full-scale square wave: RMS == amplitude exactly
    samples = np.tile(np.array([1000, -1000], dtype=np.int16), rate // 2)
    df = spark.createDataFrame(
        [(1, MM.encode_wav(samples, rate))], "doc_id long, payload binary"
    )
    [row] = MM.decode_audio(df).collect()
    assert row["sample_rate"] == rate and row["channels"] == 1
    assert row["n_samples"] == rate
    assert row["duration_s"] == pytest.approx(1.0)
    assert row["rms"] == pytest.approx(1000.0)


def test_sample_frames_real(spark):
    # 10 frames, frame i solid-color i*10 -> every 3rd: frames 0,3,6,9
    frames = np.stack(
        [np.full((2, 2, 3), i * 10, dtype=np.uint8) for i in range(10)]
    )
    df = spark.createDataFrame(
        [(5, MM.encode_raw_video(frames))], "doc_id long, payload binary"
    )
    rows = sorted(
        MM.sample_frames(df, every_n=3).collect(), key=lambda r: r["frame_idx"]
    )
    assert [r["frame_idx"] for r in rows] == [0, 3, 6, 9]
    for r in rows:
        _, w, h, arr = MM.decode_pnm_bytes(bytes(r["payload"]))
        assert (w, h) == (2, 2)
        assert int(arr[0, 0, 0]) == r["frame_idx"] * 10


def test_sampled_frames_compose_with_decode(spark):
    """sample_frames output payloads are standalone P6 images, so
    decode_image consumes them directly (the composition a pipeline
    would run: demux -> per-frame feature extraction)."""
    frames = np.stack(
        [np.full((3, 3, 3), 60, dtype=np.uint8) for _ in range(4)]
    )
    df = spark.createDataFrame(
        [(1, MM.encode_raw_video(frames))], "doc_id long, payload binary"
    )
    sampled = MM.sample_frames(df, every_n=2)
    decoded = MM.decode_image(sampled).collect()
    assert len(decoded) == 2
    assert all(r["mean_luma"] == pytest.approx(60.0) for r in decoded)
