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
