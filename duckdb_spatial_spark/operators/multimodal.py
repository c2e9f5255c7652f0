"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

Decode is REAL for the codec-free formats (operators/codecs.py): PNG
(stdlib zlib inflate + scanline unfiltering per RFC 2083), uncompressed
BMP, WAV PCM/float, and uncompressed RIFF/AVI video — features, resize,
audio sample extraction, and frame sampling run on actual pixels/samples
for those. JPEG/GIF entropy decoding and compressed video codecs
(MJPG/H.264/...) genuinely need an external codec: those paths fall back
per the operator's ``fallback`` policy (deterministic fake or NULL) and
say so.

Conventions (GeoParquet-style sidecar metadata):

  image  struct<data: binary, width: int, height: int, format: string>
  audio  struct<data: binary, sample_rate: int, n_samples: long, format: string>
  video  binary + struct<duration_s: double, fps: double, format: string>
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)


def _fake_decode(buf: bytes) -> np.ndarray:
    """STUB decode: deterministic pixels derived from the bytes — replace
    with PIL/turbojpeg in production. Keeps shape/dtype contract real."""
    h = w = 16
    seed = np.frombuffer(buf[:8].ljust(8, b"\0"), dtype=np.uint64)[0]
    rng = np.random.RandomState(int(seed % (2**31)))
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def image_metadata(df: DataFrame, bin_col: str = "image") -> DataFrame:
    """Parse width/height/format from image headers.

    Real parsing for PNG/JPEG/GIF magic + dimensions (header-only, no codec
    needed); unknown formats yield NULLs."""

    @F.pandas_udf(IMAGE_META)
    def meta(s: pd.Series) -> pd.DataFrame:
        rows = []
        for b in s:
            if b is None:
                rows.append({"width": None, "height": None, "format": None})
                continue
            b = bytes(b)
            if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
                w = int.from_bytes(b[16:20], "big")
                h = int.from_bytes(b[20:24], "big")
                rows.append({"width": w, "height": h, "format": "png"})
            elif b[:3] == b"\xff\xd8\xff":
                w = h = None
                i = 2
                while i + 9 < len(b):
                    if b[i] != 0xFF:
                        i += 1
                        continue
                    marker = b[i + 1]
                    if marker in (0xC0, 0xC1, 0xC2):
                        h = int.from_bytes(b[i + 5 : i + 7], "big")
                        w = int.from_bytes(b[i + 7 : i + 9], "big")
                        break
                    seglen = int.from_bytes(b[i + 2 : i + 4], "big")
                    i += 2 + seglen
                rows.append({"width": w, "height": h, "format": "jpeg"})
            elif b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
                rows.append(
                    {
                        "width": int.from_bytes(b[6:8], "little"),
                        "height": int.from_bytes(b[8:10], "little"),
                        "format": "gif",
                    }
                )
            elif b[:2] == b"BM" and len(b) >= 26:
                rows.append(
                    {
                        "width": int.from_bytes(b[18:22], "little", signed=True),
                        "height": abs(int.from_bytes(b[22:26], "little", signed=True)),
                        "format": "bmp",
                    }
                )
            else:
                rows.append({"width": None, "height": None, "format": None})
        return pd.DataFrame(rows)

    return df.withColumn("image_meta", meta(F.col(bin_col)))


def image_features(
    df: DataFrame, bin_col: str = "image", out_col: str = "features", dim: int = 64,
    fallback: str = "fake",
) -> DataFrame:
    """Feature extraction: binary -> fixed-dim float vector (channel
    histograms). PNG/BMP decode for real (codecs.py); other formats follow
    ``fallback``: "fake" (deterministic bytes-seeded pixels — keeps the
    contract exercised end-to-end) or "null"."""
    from . import codecs

    fields = [f for f in df.schema.fields]
    out_schema = T.StructType(fields + [T.StructField(out_col, T.ArrayType(T.FloatType()))])
    cols = df.columns
    bidx = cols.index(bin_col)

    def extract(batches):
        for pdf in batches:
            feats = []
            for b in pdf.iloc[:, bidx]:
                if b is None:
                    feats.append(None)
                    continue
                try:
                    px = codecs.decode_image(bytes(b))
                    if px.shape[2] == 1:
                        px = np.repeat(px, 3, axis=2)
                    px = px[:, :, :3]
                except (ValueError, NotImplementedError):
                    if fallback == "null":
                        feats.append(None)
                        continue
                    px = _fake_decode(bytes(b))
                px = px.astype(np.float32)
                hist = np.concatenate(
                    [
                        np.histogram(px[..., c], bins=dim // 4, range=(0, 256))[0]
                        for c in range(3)
                    ]
                ).astype(np.float32)
                vec = np.zeros(dim, dtype=np.float32)
                vec[: len(hist)] = hist / max(hist.sum(), 1.0)
                feats.append(vec.tolist())
            pdf = pdf.copy()
            pdf[out_col] = feats
            yield pdf

    return df.mapInPandas(extract, out_schema)


def image_resize(
    df: DataFrame, bin_col: str = "image", out_col: str = "resized", size=(224, 224)
) -> DataFrame:
    """Real resize for PNG/BMP inputs: decode (codecs.py), nearest-neighbor
    resample, re-encode PNG. Formats needing an external codec (JPEG/GIF)
    yield NULL — mapInPandas binary->binary, one Arrow crossing."""
    from . import codecs

    fields = [f for f in df.schema.fields]
    out_schema = T.StructType(fields + [T.StructField(out_col, T.BinaryType())])
    bidx = df.columns.index(bin_col)

    def conv(batches):
        for pdf in batches:
            out = []
            for b in pdf.iloc[:, bidx]:
                if b is None:
                    out.append(None)
                    continue
                try:
                    px = codecs.decode_image(bytes(b))
                    out.append(codecs.encode_png(codecs.resize_nearest(px, size)))
                except (ValueError, NotImplementedError):
                    out.append(None)
            pdf = pdf.copy()
            pdf[out_col] = out
            yield pdf

    return df.mapInPandas(conv, out_schema)


def audio_samples(
    df: DataFrame, bin_col: str = "audio", out_col: str = "samples", max_samples: int = 480_000
) -> DataFrame:
    """WAV PCM/float decode to mono float samples in [-1, 1] (channel
    mean), truncated at ``max_samples``; non-WAV yields NULL. Real decode,
    no codec dependency (codecs.decode_wav)."""
    from . import codecs

    schema = T.StructType(
        [f for f in df.schema.fields]
        + [
            T.StructField(out_col, T.ArrayType(T.FloatType())),
            T.StructField("sample_rate", T.IntegerType()),
        ]
    )
    bidx = df.columns.index(bin_col)

    def conv(batches):
        for pdf in batches:
            vals, rates = [], []
            for b in pdf.iloc[:, bidx]:
                if b is None:
                    vals.append(None)
                    rates.append(None)
                    continue
                try:
                    x, rate = codecs.decode_wav(bytes(b))
                except (ValueError, NotImplementedError):
                    vals.append(None)
                    rates.append(None)
                    continue
                mono = x.mean(axis=1)[:max_samples].astype(np.float32)
                vals.append(mono.tolist())
                rates.append(int(rate))
            pdf = pdf.copy()
            pdf[out_col] = vals
            pdf["sample_rate"] = rates
            yield pdf

    return df.mapInPandas(conv, schema)


def _mel_filterbank(n_mels: int, n_fft: int, rate: int) -> np.ndarray:
    """Triangular mel filterbank (HTK convention: mel = 2595 log10(1 +
    f/700)), rows normalized to unit peak — (n_mels, n_fft//2 + 1)."""
    fmax = rate / 2.0
    mmax = 2595.0 * np.log10(1.0 + fmax / 700.0)
    mpts = np.linspace(0.0, mmax, n_mels + 2)
    fpts = 700.0 * (10.0 ** (mpts / 2595.0) - 1.0)
    bins = np.floor((n_fft + 1) * fpts / rate).astype(int)
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for m in range(1, n_mels + 1):
        lo, c, hi = bins[m - 1], bins[m], bins[m + 1]
        for k in range(lo, c):
            if c > lo:
                fb[m - 1, k] = (k - lo) / (c - lo)
        for k in range(c, hi):
            if hi > c:
                fb[m - 1, k] = (hi - k) / (hi - c)
    return fb


def audio_features(
    df: DataFrame,
    bin_col: str = "audio",
    out_col: str = "features",
    n_mels: int = 26,
    n_mfcc: int = 13,
    frame_len: int = 400,
    hop: int = 160,
    max_seconds: float = 30.0,
) -> DataFrame:
    """Fixed-length audio feature vector per clip — the audio analog of
    :func:`image_features` for similarity/dedup/quality pipelines.

    Pure-numpy pipeline (no librosa/scipy in this environment; every
    step is the published textbook definition): WAV decode -> mono ->
    framed Hann-windowed rFFT power spectrum -> HTK mel filterbank ->
    log -> DCT-II -> MFCC; the output is mean and std of each MFCC
    coefficient over frames (``2 * n_mfcc`` floats), the standard
    clip-level summarization. Non-WAV / undecodable input yields NULL.

    Scale shape: one Arrow-batched pass, zero shuffle; the FFT work is
    vectorized over ALL frames of a clip at once (np.fft.rfft on a
    (frames, frame_len) matrix)."""
    from . import codecs

    schema = T.StructType(
        [f for f in df.schema.fields]
        + [T.StructField(out_col, T.ArrayType(T.FloatType()))]
    )
    bidx = df.columns.index(bin_col)
    window = np.hanning(frame_len)
    # DCT-II matrix (orthonormal), rows = coefficients
    kk = np.arange(n_mels)
    dct = np.cos(np.pi * np.outer(np.arange(n_mfcc), (2 * kk + 1)) / (2 * n_mels))
    dct *= np.sqrt(2.0 / n_mels)
    dct[0] /= np.sqrt(2.0)

    def conv(batches):
        fbs: dict = {}
        for pdf in batches:
            vals = []
            for b in pdf.iloc[:, bidx]:
                if b is None:
                    vals.append(None)
                    continue
                try:
                    x, rate = codecs.decode_wav(bytes(b))
                except (ValueError, NotImplementedError):
                    vals.append(None)
                    continue
                mono = x.mean(axis=1)[: int(max_seconds * rate)]
                if len(mono) < frame_len:
                    mono = np.pad(mono, (0, frame_len - len(mono)))
                nfr = 1 + (len(mono) - frame_len) // hop
                idx = np.arange(frame_len)[None, :] + hop * np.arange(nfr)[:, None]
                frames = mono[idx] * window[None, :]
                power = np.abs(np.fft.rfft(frames, axis=1)) ** 2
                fb = fbs.get(rate)
                if fb is None:
                    fb = fbs[rate] = _mel_filterbank(n_mels, frame_len, rate)
                mel = np.log(power @ fb.T + 1e-10)
                mfcc = mel @ dct.T  # (frames, n_mfcc)
                feat = np.concatenate([mfcc.mean(axis=0), mfcc.std(axis=0)])
                vals.append(feat.astype(np.float32).tolist())
            pdf = pdf.copy()
            pdf[out_col] = vals
            yield pdf

    return df.mapInPandas(conv, schema)


def video_metadata(df: DataFrame, bin_col: str = "video") -> DataFrame:
    """Parse fps / frame count / duration from video containers. REAL for
    RIFF/AVI (header walk, no frame decode); other containers yield NULLs
    with the detected format magic."""
    schema = T.StructType(
        [
            T.StructField("fps", T.DoubleType()),
            T.StructField("n_frames", T.IntegerType()),
            T.StructField("duration_s", T.DoubleType()),
            T.StructField("format", T.StringType()),
        ]
    )

    @F.pandas_udf(schema)
    def meta(s: pd.Series) -> pd.DataFrame:
        from . import codecs

        rows = []
        for b in s:
            if b is None:
                rows.append({"fps": None, "n_frames": None, "duration_s": None, "format": None})
                continue
            b = bytes(b)
            try:
                fps, n = codecs.avi_header_info(b)
                rows.append(
                    {
                        "fps": fps,
                        "n_frames": int(n),
                        "duration_s": (n / fps) if fps else None,
                        "format": "avi",
                    }
                )
                continue
            except ValueError:
                pass
            fmt = "mp4" if len(b) > 11 and b[4:8] == b"ftyp" else None
            rows.append({"fps": None, "n_frames": None, "duration_s": None, "format": fmt})
        return pd.DataFrame(rows)

    return df.withColumn("video_meta", meta(F.col(bin_col)))


def video_frame_sample(
    df: DataFrame,
    bin_col: str = "video",
    every_s: float = 1.0,
    fallback: str = "null",
) -> DataFrame:
    """Sample frames from video columns: one output row per sampled frame
    (``frame_idx``, ``ts_s``, ``frame`` as PNG bytes, ``width``,
    ``height``), exploded via mapInPandas.

    REAL decode for uncompressed RIFF/AVI (operators/codecs.decode_avi);
    compressed codecs (MJPG/H.264/...) genuinely need an external codec
    and follow ``fallback``: "null" drops the row set for that video,
    "error" raises. Frames re-encode through the real PNG writer, so the
    output column is standard PNG bytes."""
    from . import codecs

    step_of = lambda fps: max(1, int(round(every_s * fps))) if fps else 1  # noqa: E731
    in_fields = list(df.schema.fields)
    out_schema = T.StructType(
        in_fields
        + [
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("ts_s", T.DoubleType()),
            T.StructField("frame", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )
    bidx = df.columns.index(bin_col)

    def sample(batches):
        for pdf in batches:
            out_rows = []
            for _, row in pdf.iterrows():
                b = row.iloc[bidx]
                if b is None:
                    continue
                try:
                    frames, fps = codecs.decode_avi(bytes(b))
                except (ValueError, NotImplementedError):
                    if fallback == "error":
                        raise
                    continue
                step = step_of(fps)
                for i in range(0, len(frames), step):
                    f = frames[i]
                    rec = dict(row)
                    rec.update(
                        frame_idx=i,
                        ts_s=(i / fps) if fps else float(i),
                        frame=codecs.encode_png(f),
                        width=int(f.shape[1]),
                        height=int(f.shape[0]),
                    )
                    out_rows.append(rec)
            yield pd.DataFrame(out_rows, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(sample, out_schema)


def audio_metadata(df: DataFrame, bin_col: str = "audio") -> DataFrame:
    """WAV header parse (RIFF, header-only — real); other codecs NULL."""
    schema = T.StructType(
        [
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_channels", T.IntegerType()),
            T.StructField("format", T.StringType()),
        ]
    )

    @F.pandas_udf(schema)
    def meta(s: pd.Series) -> pd.DataFrame:
        rows = []
        for b in s:
            b = bytes(b) if b is not None else b""
            if b[:4] == b"RIFF" and b[8:12] == b"WAVE" and len(b) >= 28:
                rows.append(
                    {
                        "sample_rate": int.from_bytes(b[24:28], "little"),
                        "n_channels": int.from_bytes(b[22:24], "little"),
                        "format": "wav",
                    }
                )
            else:
                rows.append({"sample_rate": None, "n_channels": None, "format": None})
        return pd.DataFrame(rows)

    return df.withColumn("audio_meta", meta(F.col(bin_col)))
