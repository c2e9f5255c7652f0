"""Pure-Python codecs (operators/codecs.py): PNG all-filter decode, BMP,
WAV — validated against independently-constructed fixtures (PNG scanlines
filtered by hand per RFC 2083; WAV written by the stdlib wave module)."""

import io
import struct
import wave
import zlib

import numpy as np
import pytest

from duckdb_spatial_spark.operators import codecs as C


def _png_from_filtered(width, height, color_type, scanlines, plte=None):
    """Assemble a PNG whose IDAT holds pre-filtered scanline bytes."""
    raw = b"".join(scanlines)

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    out = C._PNG_MAGIC + chunk(b"IHDR", ihdr)
    if plte is not None:
        out += chunk(b"PLTE", plte)
    return out + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")


def test_png_filters_hand_built():
    # 3x3 grayscale, target pixel values:
    img = np.array([[10, 20, 30], [40, 50, 60], [70, 80, 90]], dtype=np.uint8)
    # row 0: filter 1 (Sub):  raw[x] = cur[x] - cur[x-1]
    r0 = bytes([1, 10, 10, 10])
    # row 1: filter 2 (Up):   raw[x] = cur[x] - prev[x]
    r1 = bytes([2, 30, 30, 30])
    # row 2: filter 4 (Paeth): pred of (a=left, b=up, c=up-left)
    # x=0: a=0,b=40,c=0 -> pred 40, raw=30; x=1: a=70,b=50,c=40 -> p=80,
    # closest is a(70)? |80-70|=10,|80-50|=30,|80-40|=40 -> pred 70, raw 10;
    # x=2: a=80,b=60,c=50 -> p=90: |90-80|=10 <= |90-60|,|90-50| -> pred 80, raw 10
    r2 = bytes([4, 30, 10, 10])
    png = _png_from_filtered(3, 3, 0, [r0, r1, r2])
    got = C.decode_png(png)
    assert got.shape == (3, 3, 1)
    assert np.array_equal(got[:, :, 0], img)


def test_png_average_filter_and_rgb():
    # 2x2 RGB with filter 3 (Average): raw = cur - (left + up)//2
    img = np.array(
        [[[100, 110, 120], [130, 140, 150]],
         [[60, 70, 80], [90, 100, 110]]], dtype=np.uint8
    )
    rows = []
    prev = np.zeros(6, dtype=np.int32)
    for y in range(2):
        cur = img[y].reshape(-1).astype(np.int32)
        raw = bytearray([3])
        for x in range(6):
            a = cur[x - 3] if x >= 3 else 0
            raw.append((cur[x] - ((a + prev[x]) >> 1)) & 0xFF)
        rows.append(bytes(raw))
        prev = cur
    png = _png_from_filtered(2, 2, 2, rows)
    assert np.array_equal(C.decode_png(png), img)


def test_png_palette():
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
    rows = [bytes([0, 0, 1]), bytes([0, 2, 0])]
    png = _png_from_filtered(2, 2, 3, rows, plte=plte)
    got = C.decode_png(png)
    assert got.shape == (2, 2, 3)
    assert tuple(got[0, 0]) == (255, 0, 0) and tuple(got[0, 1]) == (0, 255, 0)
    assert tuple(got[1, 0]) == (0, 0, 255) and tuple(got[1, 1]) == (255, 0, 0)


def test_png_encode_decode_roundtrip():
    rng = np.random.RandomState(3)
    for c in (1, 3, 4):
        img = rng.randint(0, 256, size=(11, 7, c), dtype=np.uint8)
        assert np.array_equal(C.decode_png(C.encode_png(img)), img)


def test_bmp_24bit():
    # 2x2 24-bit BMP, bottom-up, BGR, stride padded to 4
    px_rows = [
        bytes([255, 0, 0, 0, 255, 0]) + b"\x00\x00",  # bottom row: blue, green (BGR!)
        bytes([0, 0, 255, 255, 255, 255]) + b"\x00\x00",  # top row: red, white
    ]
    data = b"".join(px_rows)
    hdr = (b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
           + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(data), 0, 0, 0, 0))
    got = C.decode_bmp(hdr + data)
    assert got.shape == (2, 2, 3)
    assert tuple(got[0, 0]) == (255, 0, 0)      # top-left red
    assert tuple(got[0, 1]) == (255, 255, 255)  # top-right white
    assert tuple(got[1, 0]) == (0, 0, 255)      # bottom-left blue
    assert tuple(got[1, 1]) == (0, 255, 0)      # bottom-right green


def test_wav_roundtrip_16bit():
    rate = 8000
    t = np.arange(1600) / rate
    mono = (np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
    bio = io.BytesIO()
    with wave.open(bio, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(mono.tobytes())
    x, got_rate = C.decode_wav(bio.getvalue())
    assert got_rate == rate and x.shape == (1600, 1)
    assert np.allclose(x[:, 0], mono / 32768.0)


def test_jpeg_baseline_decodes_progressive_raises():
    # r12: baseline JPEG decodes for real (operators/jpeg.py); the honest
    # edges moved to progressive/arithmetic modes and garbage streams
    from duckdb_spatial_spark.operators.jpeg import encode_jpeg

    img = np.full((8, 8), 77, dtype=np.uint8)
    out = C.decode_image(encode_jpeg(img, quality=95))
    assert out.shape == (8, 8, 1) and (out == 77).all()
    # progressive SOF2 rejected loudly
    import struct as _st

    prog = (b"\xff\xd8" + _st.pack(">BBH", 0xFF, 0xC2, 11)
            + _st.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    with pytest.raises(NotImplementedError):
        C.decode_image(prog)
    # truncated garbage still fails loudly (no fake pixels)
    with pytest.raises((ValueError, NotImplementedError)):
        C.decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 32)


def test_multimodal_operators_real_decode(spark):
    from duckdb_spatial_spark.operators import multimodal as M

    rng = np.random.RandomState(5)
    imgs = [(i, C.encode_png(rng.randint(0, 256, size=(8, 6, 3), dtype=np.uint8)))
            for i in range(4)]
    df = spark.createDataFrame(imgs, "id long, image binary")
    meta = {r.id: r.image_meta for r in M.image_metadata(df).collect()}
    assert all(m.width == 6 and m.height == 8 and m.format == "png" for m in meta.values())

    rs = M.image_resize(df, size=(4, 4))
    outs = {r.id: r.resized for r in rs.collect()}
    for v in outs.values():
        assert C.decode_png(bytes(v)).shape == (4, 4, 3)

    feats = {r.id: r.features for r in M.image_features(df, fallback="null").collect()}
    assert all(v is not None and len(v) == 64 for v in feats.values())

    # audio
    bio = io.BytesIO()
    with wave.open(bio, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(np.zeros(320, dtype=np.int16).tobytes())
    adf = spark.createDataFrame([(1, bio.getvalue())], "id long, audio binary")
    row = M.audio_samples(adf).collect()[0]
    assert row.sample_rate == 16000 and len(row.samples) == 160


def test_avi_roundtrip_and_compressed_raises():
    import numpy as np
    import pytest as _pytest

    from duckdb_spatial_spark.operators.codecs import decode_avi, encode_avi

    frames = [np.full((6, 9, 3), i * 30, dtype=np.uint8) for i in range(5)]
    frames[1][2, 3] = [10, 200, 40]
    buf = encode_avi(frames, fps=12.5)
    out, fps = decode_avi(buf)
    assert len(out) == 5 and fps == _pytest.approx(12.5, rel=1e-4)
    for a, b in zip(frames, out):
        assert (a == b).all()
    with _pytest.raises(ValueError):
        decode_avi(b"RIFF\x00\x00\x00\x00WAVE")
    # compressed stream: flip biCompression to 'MJPG'
    i = buf.index(b"strf")
    bad = bytearray(buf)
    bad[i + 8 + 16 : i + 8 + 20] = b"MJPG"
    with _pytest.raises(NotImplementedError):
        decode_avi(bytes(bad))


def test_avi_rec_list_frames_decoded():
    """Interleaved AVIs wrap frame chunks in 'rec ' LISTs inside 'movi';
    the walker must recurse into them (ADVICE r6)."""
    import struct

    import numpy as np

    from duckdb_spatial_spark.operators.codecs import decode_avi, encode_avi

    frames = [np.full((4, 5, 3), i * 40, dtype=np.uint8) for i in range(3)]
    buf = encode_avi(frames, fps=10.0)

    # rewrap every 00db chunk inside movi in its own 'rec ' LIST
    def chunk(tag, payload):
        pad = b"\0" if len(payload) % 2 else b""
        return tag + struct.pack("<I", len(payload)) + payload + pad

    i = buf.index(b"movi")
    movi_len = struct.unpack_from("<I", buf, i - 4)[0]
    body = buf[i + 4 : i - 4 + 8 + movi_len]
    out, pos = [], 0
    while pos + 8 <= len(body):
        tag = body[pos : pos + 4]
        ln = struct.unpack_from("<I", body, pos + 4)[0]
        payload = body[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)
        out.append(chunk(b"LIST", b"rec " + chunk(tag, payload)))
    new_movi = chunk(b"LIST", b"movi" + b"".join(out))
    rebuilt = bytearray(buf[: i - 8] + new_movi + buf[i - 4 + 8 + movi_len :])
    struct.pack_into("<I", rebuilt, 4, len(rebuilt) - 8)

    decoded, fps = decode_avi(bytes(rebuilt))
    assert len(decoded) == 3 and abs(fps - 10.0) < 1e-6
    for a, b in zip(frames, decoded):
        assert (a == b).all()


def test_video_frame_sample_spark(spark):
    import numpy as np

    from duckdb_spatial_spark.operators.codecs import decode_png, encode_avi
    from duckdb_spatial_spark.operators.multimodal import (
        video_frame_sample,
        video_metadata,
    )

    frames = [np.full((4, 4, 3), i * 10, dtype=np.uint8) for i in range(10)]
    avi = encode_avi(frames, fps=5.0)  # 2 s of video
    df = spark.createDataFrame([(1, bytearray(avi)), (2, None)], "vid long, video binary")
    meta = video_metadata(df).select("vid", "video_meta.*").collect()
    m = {r["vid"]: r for r in meta}
    assert m[1]["fps"] == 5.0 and m[1]["n_frames"] == 10 and m[1]["format"] == "avi"
    assert m[2]["fps"] is None
    out = video_frame_sample(df, every_s=1.0).select("vid", "frame_idx", "ts_s", "frame").collect()
    # every_s=1.0 at 5 fps -> frames 0 and 5
    assert sorted((r["vid"], r["frame_idx"]) for r in out) == [(1, 0), (1, 5)]
    px = decode_png(bytes(out[0]["frame"]))
    assert px.shape == (4, 4, 3)


def test_audio_features_tone_lands_in_right_mel_band(spark):
    """External truth for the MFCC pipeline: a pure tone's mel-spectrum
    energy must peak at the analytically-computed mel filter for its
    frequency (HTK mel = 2595 log10(1 + f/700)) — checked via the
    filterbank directly — and clip-level MFCC features must be finite,
    fixed-length, and frequency-sensitive (two tones an octave apart
    produce different vectors; identical clips produce identical ones)."""
    import io
    import wave

    from duckdb_spatial_spark.operators.multimodal import (
        _mel_filterbank,
        audio_features,
    )

    rate, frame_len, n_mels = 16000, 400, 26
    fb = _mel_filterbank(n_mels, frame_len, rate)
    # filterbank shape + analytic peak location for 440 Hz
    assert fb.shape == (n_mels, frame_len // 2 + 1)
    k440 = round(440 * frame_len / rate)  # rFFT bin of the tone
    resp = fb[:, k440]
    mmax = 2595.0 * np.log10(1.0 + (rate / 2) / 700.0)
    m440 = 2595.0 * np.log10(1.0 + 440.0 / 700.0)
    expect_band = m440 / mmax * (n_mels + 1)  # fractional filter index
    assert abs(int(np.argmax(resp)) - (expect_band - 1)) <= 1.5

    def tone(freq):
        t = np.arange(rate) / rate  # 1 second
        pcm = (0.5 * np.sin(2 * np.pi * freq * t) * 32767).astype(np.int16)
        bio = io.BytesIO()
        with wave.open(bio, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(pcm.tobytes())
        return bio.getvalue()

    df = spark.createDataFrame(
        [(1, tone(440)), (2, tone(880)), (3, tone(440)), (4, None)],
        "id long, audio binary",
    )
    feats = {r.id: r.features for r in audio_features(df).collect()}
    assert feats[4] is None
    for i in (1, 2, 3):
        assert len(feats[i]) == 26 and all(np.isfinite(feats[i]))
    assert feats[1] == feats[3]  # deterministic
    assert feats[1] != feats[2]  # frequency-sensitive


def _pack_lsb(codes_widths):
    acc = n = 0
    out = bytearray()
    for c, w in codes_widths:
        acc |= c << n
        n += w
        while n >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_wrap(w, h, nbits, pal, lzw, flags=0):
    hdr = b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | (nbits - 1), 0, 0) + pal
    img = struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, flags) + bytes([nbits])
    body = b""
    for k in range(0, len(lzw), 255):
        chunk = lzw[k:k + 255]
        body += bytes([len(chunk)]) + chunk
    return hdr + img + body + b"\x00\x3b"


def test_gif_hand_assembled_lzw():
    """External truth: LZW code streams hand-derived from the GIF spec
    (min code 2 -> clear=4, end=5, width starts at 3, LSB-first bits).
    Covers literal codes, a dictionary back-reference, and the KwKwK
    special case."""
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])  # R G B gray
    # pixels [0,1,0,1] via a DICT entry: clear,0,1,<6=(0,1)>,end
    lzw = _pack_lsb([(4, 3), (0, 3), (1, 3), (6, 3), (5, 3)])
    got = C.decode_gif(_gif_wrap(2, 2, 2, pal, lzw))
    assert got.shape == (2, 2, 3)
    assert tuple(got[0, 0]) == (255, 0, 0) and tuple(got[0, 1]) == (0, 255, 0)
    assert tuple(got[1, 0]) == (255, 0, 0) and tuple(got[1, 1]) == (0, 255, 0)
    # KwKwK: clear,1,<6==len(table)> -> (1,1); pixels [1,1,1] (3x1)
    lzw2 = _pack_lsb([(4, 3), (1, 3), (6, 3), (5, 3)])
    got2 = C.decode_gif(_gif_wrap(3, 1, 2, pal, lzw2))
    assert [tuple(p) for p in got2[0]] == [(0, 255, 0)] * 3


def test_gif_roundtrip_and_dispatch():
    rng = np.random.RandomState(11)
    img = rng.randint(0, 5, size=(13, 9), dtype=np.uint8) * 50
    rgb = np.repeat(img[:, :, None], 3, axis=2)
    out = C.decode_image(C.encode_gif(rgb))
    assert np.array_equal(out, rgb)
    # width-bump path: >6 colors forces 3-bit codes + growth to 4 bits
    img2 = (np.arange(16 * 16).reshape(16, 16) % 7).astype(np.uint8) * 30
    rgb2 = np.repeat(img2[:, :, None], 3, axis=2)
    assert np.array_equal(C.decode_gif(C.encode_gif(rgb2)), rgb2)
    # 256-color stress (8-bit codes)
    img3 = (np.arange(32 * 32).reshape(32, 32) % 256).astype(np.uint8)
    rgb3 = np.dstack([img3, img3 // 2, img3 // 3])
    assert np.array_equal(C.decode_gif(C.encode_gif(rgb3)), rgb3)


def test_gif_transparency_and_interlace():
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])
    # GCE with transparency on index 1; pixels [0,1] -> alpha [255,0]
    gce = bytes([0x21, 0xF9, 4, 0x01, 0, 0, 1, 0])
    lzw = _pack_lsb([(4, 3), (0, 3), (1, 3), (5, 3)])
    hdr = b"GIF89a" + struct.pack("<HHBBB", 2, 1, 0x81, 0, 0) + pal
    img = struct.pack("<BHHHHB", 0x2C, 0, 0, 2, 1, 0) + bytes([2])
    buf = hdr + gce + img + bytes([len(lzw)]) + lzw + b"\x00\x3b"
    got = C.decode_gif(buf)
    assert got.shape == (1, 2, 4)
    assert got[0, 0, 3] == 255 and got[0, 1, 3] == 0
    # interlaced 8x1-column image: rows arrive in pass order 0,4,2,6,1,3,5,7.
    # width schedule per spec: the decoder's table reaches 8 entries after
    # the THIRD pixel code (first code appends nothing), so codes 4+ and
    # the end code read at 4 bits
    rows_in_pass_order = [0, 4, 2, 6, 1, 3, 5, 7]
    pix = [r % 4 for r in rows_in_pass_order]
    seq = [(4, 3)] + [(p, 3) for p in pix[:3]] + [(p, 4) for p in pix[3:]] + [(5, 4)]
    lzw3 = _pack_lsb(seq)
    got3 = C.decode_gif(_gif_wrap(1, 8, 2, pal, lzw3, flags=0x40))
    # after de-interlacing, row r holds palette index r % 4
    expect = [tuple(pal[3 * (r % 4): 3 * (r % 4) + 3]) for r in range(8)]
    assert [tuple(p[0]) for p in got3] == expect
