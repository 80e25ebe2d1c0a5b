"""Audio/video multimodal plumbing: WAV + Y4M codec round-trips, decoder
strictness, and the Spark feature/frame-sample operators (m1/m2 lanes).
The driver-gate parity of m1/m2 against their analytic DuckDB oracles is
the end-to-end check; these pin the codec math directly."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ghcrawler_spark.functions import media as M


# --- WAV ---------------------------------------------------------------------

def test_wav_round_trip():
    rng = np.random.RandomState(7)
    s = rng.randint(-32768, 32767, size=1234).astype(np.int16)
    data = M.wav_encode(s, 16000)
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    rate, out = M.wav_decode(data)
    assert rate == 16000
    assert np.array_equal(out, s)


def test_wav_decode_tolerates_extra_chunks_and_padding():
    s = np.array([1, -2, 3], dtype=np.int16)
    base = M.wav_encode(s, 8000)
    # splice an odd-length LIST chunk (gets a pad byte per RIFF) before fmt
    extra = b"LIST" + (5).to_bytes(4, "little") + b"INFOx" + b"\x00"
    spliced = base[:12] + extra + base[12:]
    rate, out = M.wav_decode(spliced)
    assert rate == 8000 and np.array_equal(out, s)


def test_wav_decode_rejects_non_pcm_and_garbage():
    with pytest.raises(ValueError, match="RIFF"):
        M.wav_decode(b"\x00" * 40)
    data = bytearray(M.wav_encode(np.zeros(4, np.int16), 8000))
    data[20] = 3  # fmt tag -> IEEE float
    with pytest.raises(ValueError, match="PCM16"):
        M.wav_decode(bytes(data))


# --- Y4M ---------------------------------------------------------------------

def test_y4m_round_trip_c420_and_mono():
    rng = np.random.RandomState(11)
    frames = rng.randint(0, 256, size=(5, 16, 24)).astype(np.uint8)
    for cs in ("C420jpeg", "Cmono"):
        data = M.y4m_encode(frames, fps=(30, 1), colorspace=cs)
        w, h, fn, fd, out = M.y4m_decode(data)
        assert (w, h, fn, fd) == (24, 16, 30, 1)
        assert np.array_equal(out, frames)


def test_y4m_decode_rejects_bad_streams():
    with pytest.raises(ValueError, match="YUV4MPEG2"):
        M.y4m_decode(b"MPEG2 W2 H2 F1:1\n")
    frames = np.zeros((1, 4, 4), np.uint8)
    data = M.y4m_encode(frames).replace(b"C420jpeg", b"C444\x20\x20\x20\x20")
    with pytest.raises(ValueError, match="colorspace"):
        M.y4m_decode(data)


# --- seed formulas (the contract the m1/m2 oracles replay) --------------------

def test_square_wave_closed_forms():
    for d in (0, 1, 7, 41, 119, 499):
        hp = 2 + d % 29
        n = 256 + (d * 37) % 1024
        a = 1000 + (d * 131) % 20000
        i = np.arange(n)
        s = np.where((i // hp) % 2 == 0, a, -a).astype(np.int16)
        neg = s < 0
        assert int(np.sum(neg[1:] != neg[:-1])) == (n - 1) // hp
        assert int(np.abs(s).max()) == a
        assert float(np.sqrt(np.mean(s.astype(np.float64) ** 2))) == float(a)


# --- Spark operators -----------------------------------------------------------

def test_audio_features_operator(spark):
    s1 = M.wav_encode(np.array([5, 5, -5, -5, 5], dtype=np.int16), 8000)
    s2 = M.wav_encode(np.zeros(16000, dtype=np.int16), 16000)
    df = spark.createDataFrame(
        [(1, bytearray(s1)), (2, bytearray(s2))], "id long, bytes binary"
    )
    rows = {r["id"]: r for r in M.audio_features(df).collect()}
    assert "bytes" not in rows[1].asDict()
    assert rows[1]["sample_rate"] == 8000
    assert rows[1]["n_samples"] == 5
    assert rows[1]["peak"] == 5
    assert rows[1]["rms"] == 5.0
    assert rows[1]["zero_crossings"] == 2
    assert rows[1]["duration_ms"] == 0
    assert rows[2]["duration_ms"] == 1000
    assert rows[2]["peak"] == 0 and rows[2]["zero_crossings"] == 0


def test_video_frame_sample_operator(spark):
    frames = np.stack(
        [np.full((8, 8), v, np.uint8) for v in (10, 20, 30, 40, 50, 60, 70)]
    )
    blob = M.y4m_encode(frames)
    df = spark.createDataFrame([(9, bytearray(blob))], "vid long, bytes binary")
    out = M.video_frame_sample(df, "vid", "bytes", every=3).orderBy("frame_idx")
    got = [(r["frame_idx"], r["mean_luma"], r["n_frames"]) for r in out.collect()]
    assert got == [(0, 10.0, 7), (3, 40.0, 7), (6, 70.0, 7)]
    assert out.columns == ["vid", "frame_idx", "width", "height", "n_frames", "mean_luma"]
