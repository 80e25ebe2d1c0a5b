"""Audio/video payload plumbing: real RIFF-WAV and YUV4MPEG2 codecs with
Arrow-batched decode / feature-extract / frame-sample operators.

The multimodal counterpart of ``functions/images.py`` for the two other
media classes a training-data pipeline ingests. The container ships no
media libraries, so the formats are ones a few hundred lines of numpy can
parse EXACTLY, per their public specs:

- **WAV (RIFF / PCM16 mono)** — canonical chunk walk (``RIFF``/``WAVE``
  header, ``fmt `` chunk with PCM format tag 1, ``data`` chunk of
  little-endian int16 samples). Non-PCM / multi-channel / non-16-bit
  flavors raise a precise ValueError (documented container limitation,
  same policy as the non-baseline-JPEG guard in images.py).
- **Y4M (YUV4MPEG2)** — plain-text stream header (``YUV4MPEG2 W.. H..
  F..:.. C..``) followed by ``FRAME`` records of raw planar YUV. C420
  flavors and Cmono are supported; anything else raises.

Both decoders read ONLY the byte stream — generation parameters never
reach them — so the m1/m2 driver-gate queries are genuine end-to-end
checks: Spark synthesizes payload bytes, decodes them back, and the
DuckDB oracle recomputes every feature analytically from the seed
formulas. A hash match proves the binary round-trip is exact.

Scale shape: payload binaries stay inside one projection (decode emits
fixed-width feature columns and the binary is pruned immediately); the
frame sampler is a mapInPandas fan-out whose output rows carry no pixel
data. Nothing here ever shuffles a payload byte.

Reference analog: ghcrawler stores fetched payloads as opaque blobs and
derives typed metadata at process time (lib/crawler.js _processDocument;
providers/storage/* persist content+metadata) — here the blob classes are
audio/video rather than JSON, and "process" is decode+featurize.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

# --- WAV (RIFF, PCM16 mono) -------------------------------------------------


def wav_encode(samples: np.ndarray, sample_rate: int) -> bytes:
    """1-D int16 array → canonical 44-byte-header RIFF/WAVE PCM file."""
    samples = np.asarray(samples, dtype="<i2")
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(data: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE bytes → (sample_rate, int16 sample array). Full chunk walk
    (tolerates extra chunks and the odd-length pad byte per the RIFF spec);
    rejects non-PCM, non-mono, non-16-bit flavors."""
    data = bytes(data)
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    rate = None
    samples = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            audio_fmt, channels, rate, _, _, bits = struct.unpack(
                "<HHIIHH", payload[:16]
            )
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError(
                    "unsupported WAV flavor (need PCM16 mono), got "
                    f"fmt={audio_fmt} ch={channels} bits={bits}"
                )
        elif tag == b"data":
            samples = np.frombuffer(payload, dtype="<i2")
        pos += 8 + length + (length & 1)  # RIFF pads odd chunks
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    return int(rate), samples


# --- Y4M (YUV4MPEG2) ---------------------------------------------------------

_Y4M_MAGIC = b"YUV4MPEG2"


def y4m_encode(
    frames: np.ndarray, fps: tuple[int, int] = (25, 1), colorspace: str = "C420jpeg"
) -> bytes:
    """(n_frames, h, w) uint8 luma planes → Y4M stream. C420* flavors write
    constant-128 (neutral) chroma planes at half resolution; Cmono writes
    luma only."""
    frames = np.asarray(frames, dtype=np.uint8)
    n, h, w = frames.shape
    header = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 {colorspace}\n"
    out = [header.encode("ascii")]
    chroma = (
        b""
        if colorspace == "Cmono"
        else bytes([128]) * ((w // 2) * (h // 2)) * 2
    )
    for f in range(n):
        out.append(b"FRAME\n")
        out.append(frames[f].tobytes())
        out.append(chroma)
    return b"".join(out)


def y4m_decode(data: bytes) -> tuple[int, int, int, int, np.ndarray]:
    """Y4M bytes → (width, height, fps_num, fps_den, (n, h, w) uint8 luma).
    Chroma planes are skipped per the declared colorspace."""
    data = bytes(data)
    nl = data.find(b"\n")
    if nl < 0 or not data.startswith(_Y4M_MAGIC + b" "):
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = fn = fd = None
    cs = "C420jpeg"  # spec default when the C tag is absent
    for tok in data[len(_Y4M_MAGIC) + 1 : nl].decode("ascii").split():
        if tok[0] == "W":
            w = int(tok[1:])
        elif tok[0] == "H":
            h = int(tok[1:])
        elif tok[0] == "F":
            fn, fd = (int(x) for x in tok[1:].split(":"))
        elif tok[0] == "C":
            cs = tok
    if w is None or h is None or fn is None:
        raise ValueError("Y4M header missing W/H/F")
    if cs == "Cmono":
        chroma_bytes = 0
    elif cs.startswith("C420"):
        chroma_bytes = (w // 2) * (h // 2) * 2
    else:
        raise ValueError(f"unsupported Y4M colorspace: {cs}")
    frame_bytes = w * h + chroma_bytes
    frames = []
    pos = nl + 1
    while pos < len(data):
        fnl = data.find(b"\n", pos)
        if fnl < 0 or data[pos : pos + 5] != b"FRAME":
            raise ValueError("bad FRAME record")
        pos = fnl + 1
        luma = np.frombuffer(data[pos : pos + w * h], dtype=np.uint8).reshape(h, w)
        frames.append(luma)
        pos += frame_bytes
    return w, h, fn, fd, np.stack(frames) if frames else np.zeros((0, h, w), np.uint8)


# --- Spark operators (Arrow-batched; decoders see only bytes) ----------------

_AUDIO_FEATURES_TYPE = StructType(
    [
        StructField("sample_rate", LongType()),
        StructField("n_samples", LongType()),
        StructField("peak", LongType()),
        StructField("rms", DoubleType()),
        StructField("zero_crossings", LongType()),
    ]
)


@F.pandas_udf(_AUDIO_FEATURES_TYPE)
def audio_features_udf(data: pd.Series) -> pd.DataFrame:
    """WAV bytes → (sample_rate, n_samples, peak, rms, zero_crossings).
    One decode per row inside an Arrow batch; signal math is whole-array
    numpy. Zero crossings count strict sign changes between neighbors."""
    n = len(data)
    rates = np.empty(n, dtype=np.int64)
    counts = np.empty(n, dtype=np.int64)
    peaks = np.empty(n, dtype=np.int64)
    rms = np.empty(n, dtype=np.float64)
    zc = np.empty(n, dtype=np.int64)
    for i, blob in enumerate(data):
        rate, s = wav_decode(blob)
        rates[i] = rate
        counts[i] = len(s)
        sf = s.astype(np.float64)
        peaks[i] = int(np.abs(sf).max()) if len(s) else 0
        rms[i] = round(float(np.sqrt(np.mean(sf * sf))), 4) if len(s) else 0.0
        neg = s < 0
        zc[i] = int(np.sum(neg[1:] != neg[:-1]))
    return pd.DataFrame(
        {
            "sample_rate": rates,
            "n_samples": counts,
            "peak": peaks,
            "rms": rms,
            "zero_crossings": zc,
        }
    )


def audio_features(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Attach decoded audio features and duration_ms, dropping the payload —
    after this projection no binary byte survives into any shuffle."""
    out = df.withColumn("_af", audio_features_udf(F.col(bytes_col))).drop(bytes_col)
    return out.select(
        *[c for c in out.columns if c != "_af"],
        F.col("_af.sample_rate").alias("sample_rate"),
        F.col("_af.n_samples").alias("n_samples"),
        F.floor(
            (F.col("_af.n_samples") * 1000) / F.col("_af.sample_rate")
        ).cast("long").alias("duration_ms"),
        F.col("_af.peak").alias("peak"),
        F.col("_af.rms").alias("rms"),
        F.col("_af.zero_crossings").alias("zero_crossings"),
    )


def video_frame_sample(
    df: DataFrame, id_col: str, bytes_col: str = "bytes", every: int = 3
) -> DataFrame:
    """Y4M payloads → one row per sampled frame (frame 0, every `every`-th):
    (id, frame_idx, width, height, n_frames, mean_luma). A mapInPandas
    fan-out; output rows are fixed-width (pixels never leave the task)."""
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("frame_idx", LongType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("n_frames", LongType()),
            StructField("mean_luma", DoubleType()),
        ]
    )

    def sample(batches):
        for pdf in batches:
            ids, fidx, ws, hs, nfs, lums = [], [], [], [], [], []
            for rid, blob in zip(pdf[id_col], pdf[bytes_col]):
                w, h, _fn, _fd, frames = y4m_decode(blob)
                nf = len(frames)
                for f in range(0, nf, every):
                    ids.append(rid)
                    fidx.append(f)
                    ws.append(w)
                    hs.append(h)
                    nfs.append(nf)
                    lums.append(round(float(frames[f].mean()), 4))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype=np.int64),
                    "frame_idx": pd.Series(fidx, dtype=np.int64),
                    "width": pd.Series(ws, dtype=np.int32),
                    "height": pd.Series(hs, dtype=np.int32),
                    "n_frames": pd.Series(nfs, dtype=np.int64),
                    "mean_luma": pd.Series(lums, dtype=np.float64),
                }
            )

    return df.select(id_col, bytes_col).mapInPandas(sample, schema)


# --- deterministic synthesis (seed formulas mirrored by the SQL oracles) -----


@F.pandas_udf(BinaryType())
def synth_wav_udf(
    doc_id: pd.Series, rate: pd.Series, half_period: pd.Series,
    n_samples: pd.Series, amp: pd.Series,
) -> pd.Series:
    """Square wave: sample[i] = +amp while (i // half_period) is even, else
    -amp — every feature (peak=rms=amp, crossings=(n-1)//hp) is closed-form,
    so the DuckDB oracle can verify the decode analytically."""
    out = []
    for _d, r, hp, n, a in zip(doc_id, rate, half_period, n_samples, amp):
        i = np.arange(int(n), dtype=np.int64)
        s = np.where((i // int(hp)) % 2 == 0, int(a), -int(a)).astype(np.int16)
        out.append(wav_encode(s, int(r)))
    return pd.Series(out)


@F.pandas_udf(BinaryType())
def synth_y4m_udf(
    doc_id: pd.Series, width: pd.Series, height: pd.Series,
    n_frames: pd.Series, y0: pd.Series, step: pd.Series,
) -> pd.Series:
    """Constant-luma frames: frame f is filled with (y0 + f*step) % 256, so
    each sampled frame's mean luma is exactly that value."""
    out = []
    for _d, w, h, nf, y, st in zip(doc_id, width, height, n_frames, y0, step):
        f = np.arange(int(nf), dtype=np.int64)
        vals = ((int(y) + f * int(st)) % 256).astype(np.uint8)
        frames = np.broadcast_to(
            vals[:, None, None], (int(nf), int(h), int(w))
        )
        out.append(y4m_encode(frames))
    return pd.Series(out)
