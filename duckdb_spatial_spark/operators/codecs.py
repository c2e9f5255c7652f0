"""Pure-Python image/audio codecs for the multimodal operators.

No PIL/ffmpeg in this container; every decode path here is implemented
from the public spec, not stubbed: PNG (RFC 2083: IDAT inflate +
per-scanline unfiltering), BMP raw rows, GIF87a/89a LZW (r12, this
file), baseline JPEG (r12, operators/jpeg.py: Annex-C Huffman +
dequant + vectorized IDCT), WAV RIFF chunks, uncompressed AVI. The
remaining honest edges raise loudly: progressive/arithmetic JPEG,
exotic BMP/WAV variants, compressed AVI streams.

All decoders return HxWxC uint8 arrays (C in {1,2,3,4}); the WAV decoder
returns (samples float64 in [-1, 1] shaped (n, channels), sample_rate).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# --------------------------------------------------------------------- PNG
_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type -> samples/pixel


def decode_png(buf: bytes) -> np.ndarray:
    """PNG -> HxWxC uint8. Supports bit depth 8 (all color types incl.
    palette) and 1/2/4-bit grayscale+palette, non-interlaced."""
    if buf[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    i = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    plte = None
    trns = None
    while i + 8 <= len(buf):
        (ln,) = struct.unpack_from(">I", buf, i)
        ctype = buf[i + 4 : i + 8]
        data = buf[i + 8 : i + 8 + ln]
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(data, dtype=np.uint8)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        i += 12 + ln
    if width is None:
        raise ValueError("PNG missing IHDR")
    if interlace:
        raise NotImplementedError("Adam7-interlaced PNG not supported")
    if bit_depth not in (1, 2, 4, 8):
        raise NotImplementedError(f"PNG bit depth {bit_depth} not supported")
    nch = _CHANNELS.get(color_type)
    if nch is None:
        raise ValueError(f"bad PNG color type {color_type}")
    if bit_depth < 8 and color_type not in (0, 3):
        raise ValueError("sub-byte depth only valid for gray/palette")

    raw = zlib.decompress(bytes(idat))
    bits_per_px = bit_depth * nch
    stride = (width * bits_per_px + 7) // 8  # filtered bytes per scanline
    bpp = max(1, bits_per_px // 8)  # filter 'corresponding byte' distance
    if len(raw) < height * (stride + 1):
        raise ValueError("PNG data truncated")

    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).astype(np.int32)
        pos += stride + 1
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        else:
            cur = np.empty(stride, dtype=np.int32)
            # Sub/Average/Paeth need the just-reconstructed left byte ->
            # sequential within the row (rows stay vectorized for 0/2)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = int(prev[x])
                if ftype == 1:  # Sub
                    v = line[x] + a
                elif ftype == 3:  # Average
                    v = line[x] + ((a + b) >> 1)
                elif ftype == 4:  # Paeth
                    c = int(prev[x - bpp]) if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    v = line[x] + pred
                else:
                    raise ValueError(f"bad PNG filter {ftype}")
                cur[x] = v & 0xFF
        out[y] = cur.astype(np.uint8)
        prev = cur

    if bit_depth == 8:
        px = out[:, : width * nch].reshape(height, width, nch)
    else:
        bits = np.unpackbits(out, axis=1)[:, : width * bit_depth]
        vals = bits.reshape(height, width, bit_depth)
        px = np.zeros((height, width, 1), dtype=np.uint8)
        for k in range(bit_depth):
            px[:, :, 0] = (px[:, :, 0] << 1) | vals[:, :, k]
        if color_type == 0:  # scale to full 0-255 range
            px = (px.astype(np.uint16) * (255 // ((1 << bit_depth) - 1))).astype(np.uint8)
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        idxs = px[:, :, 0]
        rgb = plte[idxs]
        if trns is not None:
            alpha = np.full(idxs.shape, 255, dtype=np.uint8)
            lim = min(len(trns), plte.shape[0])
            mask = idxs < lim
            alpha[mask] = trns[idxs[mask]]
            return np.dstack([rgb, alpha])
        return rgb
    return px


def encode_png(arr: np.ndarray) -> bytes:
    """HxWxC (or HxW) uint8 -> PNG bytes (filter 0, one zlib stream)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    ct = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    comp = zlib.compress(raw, 6)

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 0)
    return _PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", comp) + chunk(b"IEND", b"")


# --------------------------------------------------------------------- BMP
def decode_bmp(buf: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BITMAPINFOHEADER BMP -> HxWx3/4 uint8."""
    if buf[:2] != b"BM":
        raise ValueError("not a BMP")
    (data_off,) = struct.unpack_from("<I", buf, 10)
    (hdr_sz,) = struct.unpack_from("<I", buf, 14)
    if hdr_sz < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP not supported")
    w, h = struct.unpack_from("<ii", buf, 18)
    (bpp,) = struct.unpack_from("<H", buf, 28)
    (compression,) = struct.unpack_from("<I", buf, 30)
    if compression not in (0, 3) or bpp not in (24, 32):
        raise NotImplementedError(f"BMP bpp={bpp} compression={compression} not supported")
    flip = h > 0
    h = abs(h)
    nbytes = bpp // 8
    stride = (w * nbytes + 3) & ~3
    px = np.frombuffer(buf, dtype=np.uint8, count=stride * h, offset=data_off)
    px = px.reshape(h, stride)[:, : w * nbytes].reshape(h, w, nbytes)
    if flip:
        px = px[::-1]
    # BGR(A) -> RGB(A)
    if nbytes == 3:
        return px[:, :, ::-1].copy()
    return px[:, :, [2, 1, 0, 3]].copy()


def decode_image(buf: bytes) -> np.ndarray:
    """Sniff + decode PNG/BMP/baseline-JPEG; GIF raises (LZW absent)."""
    b = bytes(buf)
    if b[:8] == _PNG_MAGIC:
        return decode_png(b)
    if b[:2] == b"BM":
        return decode_bmp(b)
    if b[:3] == b"\xff\xd8\xff":
        # ITU T.81 baseline sequential, pure numpy (operators/jpeg.py);
        # progressive/arithmetic still raise NotImplementedError there
        from .jpeg import decode_jpeg

        return decode_jpeg(b)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(b)  # first frame; LZW per the spec (r12)
    raise ValueError("unknown image format")


def resize_nearest(px: np.ndarray, size: tuple) -> np.ndarray:
    """Nearest-neighbor resize (deterministic, codec-free)."""
    th, tw = size
    h, w = px.shape[:2]
    ys = np.minimum((np.arange(th) * h) // th, h - 1)
    xs = np.minimum((np.arange(tw) * w) // tw, w - 1)
    return px[ys][:, xs]


# --------------------------------------------------------------------- GIF
def decode_gif(buf: bytes) -> np.ndarray:
    """GIF87a/89a -> HxWxC uint8 (first frame; C=3, or 4 when the frame's
    Graphic Control Extension declares a transparent index). Pure-stdlib
    LZW per the spec: variable code width from the image's minimum code
    size, LSB-first bit packing, CLEAR resets, 12-bit cap. Interlaced
    frames are de-interlaced (the 4-pass row order)."""
    b = bytes(buf)
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", b, 6)
    i = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(b, dtype=np.uint8, count=3 * n, offset=i).reshape(n, 3)
        i += 3 * n
    transparent = None
    while i < len(b):
        blk = b[i]
        if blk == 0x3B:  # trailer
            break
        if blk == 0x21:  # extension
            label = b[i + 1]
            j = i + 2
            if label == 0xF9 and b[j] >= 4:  # Graphic Control Extension
                gflags = b[j + 1]
                if gflags & 0x01:
                    transparent = b[j + 4]
            while b[j] != 0:  # skip sub-blocks
                j += 1 + b[j]
            i = j + 1
            continue
        if blk != 0x2C:
            raise ValueError(f"gif: unexpected block 0x{blk:02X}")
        left, top, w, h, iflags = struct.unpack_from("<HHHHB", b, i + 1)
        i += 10
        lct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            lct = np.frombuffer(b, dtype=np.uint8, count=3 * n, offset=i).reshape(n, 3)
            i += 3 * n
        if lct is None:
            raise ValueError("gif: no color table")
        min_code = b[i]
        i += 1
        data = bytearray()
        while b[i] != 0:
            ln = b[i]
            data += b[i + 1 : i + 1 + ln]
            i += 1 + ln
        i += 1
        # --- LZW decode (LSB-first bit reader) ---
        clear = 1 << min_code
        end = clear + 1
        width = min_code + 1
        dict_base = [(c,) for c in range(clear)] + [None, None]
        table = list(dict_base)
        out: list = []
        prev = None
        acc = 0
        nbits = 0
        pos = 0
        while True:
            while nbits < width:
                if pos >= len(data):
                    raise ValueError("gif: LZW stream truncated")
                acc |= data[pos] << nbits
                pos += 1
                nbits += 8
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = list(dict_base)
                width = min_code + 1
                prev = None
                continue
            if code == end:
                break
            if prev is None:
                entry = table[code]
                if entry is None:
                    raise ValueError("gif: bad first code")
            elif code < len(table) and table[code] is not None:
                entry = table[code]
                table.append(prev + (entry[0],))
            elif code == len(table):
                entry = prev + (prev[0],)  # the KwKwK case
                table.append(entry)
            else:
                raise ValueError("gif: bad LZW code")
            out.extend(entry)
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
        px = np.asarray(out[: w * h], dtype=np.int64)
        if len(px) < w * h:
            px = np.pad(px, (0, w * h - len(px)))
        idx = px.reshape(h, w)
        if iflags & 0x40:  # de-interlace: passes at rows 0/8,4/8,2/4,1/2
            order = np.concatenate([
                np.arange(0, h, 8), np.arange(4, h, 8),
                np.arange(2, h, 4), np.arange(1, h, 2),
            ])
            deint = np.empty_like(idx)
            deint[order] = idx
            idx = deint
        rgb = lct[np.clip(idx, 0, len(lct) - 1)]
        if transparent is not None:
            alpha = np.where(idx == transparent, 0, 255).astype(np.uint8)
            return np.dstack([rgb, alpha])
        return rgb
    raise ValueError("gif: no image block before trailer")


def encode_gif(px: np.ndarray) -> bytes:
    """Minimal GIF89a encoder for fixtures/roundtrips: palettizes an
    (H,W,3) or (H,W,1)/(H,W) uint8 image (<=256 distinct colors) and
    writes the classic 'uncompressed GIF' LZW stream — literal codes
    with a CLEAR injected before the table could force a width bump."""
    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    if px.shape[2] == 1:
        px = np.repeat(px, 3, axis=2)
    h, w = px.shape[:2]
    flat = px.reshape(-1, 3)
    colors, inv = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("encode_gif: more than 256 distinct colors")
    nbits = max(2, int(np.ceil(np.log2(max(len(colors), 2)))))
    tbl_n = 1 << nbits
    pal = np.zeros((tbl_n, 3), dtype=np.uint8)
    pal[: len(colors)] = colors
    min_code = nbits
    clear = 1 << min_code
    end = clear + 1
    width = min_code + 1
    # literal codes with CLEAR before each width bump would occur
    codes = [clear]
    room = (1 << width) - end - 1  # new-entry slots before width grows
    emitted = 0
    for v in inv:
        if emitted == room:
            codes.append(clear)
            emitted = 0
        codes.append(int(v))
        emitted += 1
    codes.append(end)
    acc = 0
    nacc = 0
    data = bytearray()
    for c in codes:
        acc |= c << nacc
        nacc += width
        while nacc >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8
    if nacc:
        data.append(acc & 0xFF)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (nbits - 1), 0, 0)
    out += pal.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
    out.append(min_code)
    for k in range(0, len(data), 255):
        chunk = data[k : k + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


# --------------------------------------------------------------------- WAV
def decode_wav(buf: bytes):
    """RIFF/WAVE -> (float64 (n, channels) in [-1, 1], sample_rate).
    PCM 8/16/32-bit and IEEE float32/64."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    i = 12
    fmt = None
    data = None
    while i + 8 <= len(buf):
        tag = buf[i : i + 4]
        (ln,) = struct.unpack_from("<I", buf, i + 4)
        body = buf[i + 8 : i + 8 + ln]
        if tag == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif tag == b"data":
            data = body
        i += 8 + ln + (ln & 1)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, n_ch, rate, _, _, bits = fmt
    if audio_fmt == 1:  # integer PCM
        if bits == 8:
            x = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 32:
            x = np.frombuffer(data, dtype="<i4").astype(np.float64) / 2147483648.0
        else:
            raise NotImplementedError(f"PCM bits={bits}")
    elif audio_fmt == 3:  # IEEE float
        x = np.frombuffer(data, dtype="<f4" if bits == 32 else "<f8").astype(np.float64)
    else:
        raise NotImplementedError(f"WAV format code {audio_fmt} (need PCM or float)")
    n = (len(x) // n_ch) * n_ch
    return x[:n].reshape(-1, n_ch), rate


# --------------------------------------------------------------------------
# AVI (RIFF) — uncompressed 24-bit DIB video. Public spec: the Microsoft
# RIFF/AVI container (also OpenDML); frames are BMP-style bottom-up BGR
# rows, 4-byte-aligned, in '00db'/'00dc' chunks under the 'movi' LIST.
# Compressed codecs (MJPG/H264/...) raise honestly — no codec libs here.
# --------------------------------------------------------------------------


def _riff_chunks(buf: bytes, start: int, end: int):
    """Yield (tag, list_type_or_None, body_start, body_len) over a RIFF
    chunk run."""
    i = start
    while i + 8 <= end:
        tag = buf[i : i + 4]
        (ln,) = struct.unpack_from("<I", buf, i + 4)
        if tag in (b"RIFF", b"LIST"):
            yield tag, buf[i + 8 : i + 12], i + 12, ln - 4
        else:
            yield tag, None, i + 8, ln
        i += 8 + ln + (ln & 1)


def avi_header_info(buf: bytes):
    """Header-only AVI metadata via the proper RIFF walk (no frame
    decode): (fps, n_frames). Raises ValueError on a non-AVI buffer."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI container")
    out = {}

    def walk(start, end):
        for tag, ltype, bs, bl in _riff_chunks(buf, start, end):
            if tag in (b"RIFF", b"LIST"):
                if ltype in (b"hdrl", b"AVI "):
                    walk(bs, bs + bl)
            elif tag == b"avih" and bl >= 40:
                us = struct.unpack_from("<I", buf, bs)[0]
                out["fps"] = (1e6 / us) if us else None
                out["n_frames"] = struct.unpack_from("<I", buf, bs + 16)[0]
                return

    walk(12, len(buf))
    if "n_frames" not in out:
        raise ValueError("AVI missing avih header")
    return out["fps"], out["n_frames"]


def decode_avi(buf: bytes):
    """Decode an uncompressed (BI_RGB 24-bit) AVI.

    Returns (frames, fps) where frames is a list of (H, W, 3) uint8 RGB
    arrays. Raises NotImplementedError for compressed streams and
    ValueError for malformed containers."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI container")
    width = height = None
    us_per_frame = None
    compression = None
    bits = None
    cur_stream = [None]  # fccType of the most recent strh
    frames_raw: list[bytes] = []

    def walk(start, end):
        nonlocal width, height, us_per_frame, compression, bits
        for tag, ltype, bs, bl in _riff_chunks(buf, start, end):
            if tag in (b"RIFF", b"LIST"):
                # 'rec ' groups interleave frame chunks inside 'movi'
                if ltype in (b"hdrl", b"strl", b"movi", b"rec ", b"AVI "):
                    walk(bs, bs + bl)
            elif tag == b"avih" and bl >= 40:
                us_per_frame = struct.unpack_from("<I", buf, bs)[0]
                width = struct.unpack_from("<I", buf, bs + 32)[0]
                height = struct.unpack_from("<I", buf, bs + 36)[0]
            elif tag == b"strh" and bl >= 4:
                cur_stream[0] = buf[bs : bs + 4]
            elif tag == b"strf" and bl >= 40 and compression is None and cur_stream[0] == b"vids":
                # bind ONLY the video stream's BITMAPINFOHEADER — an audio
                # strl listed first would otherwise be misread as a codec
                # (biCompression @16, biBitCount @14)
                bits = struct.unpack_from("<H", buf, bs + 14)[0]
                compression = struct.unpack_from("<I", buf, bs + 16)[0]
            elif tag[2:4] in (b"db", b"dc") and tag[:2].isdigit():
                frames_raw.append(buf[bs : bs + bl])

    walk(12, len(buf))
    if width is None or not frames_raw:
        raise ValueError("AVI missing avih header or frames")
    if compression not in (0, None) or (bits not in (24, None)):
        name = struct.pack("<I", compression or 0)
        raise NotImplementedError(
            f"AVI compression {name!r} bits={bits} (only uncompressed BI_RGB 24-bit)"
        )
    stride = (width * 3 + 3) & ~3
    fps = 1e6 / us_per_frame if us_per_frame else 0.0
    frames = []
    for raw in frames_raw:
        if len(raw) < stride * height:
            raise ValueError("AVI frame chunk shorter than stride*height")
        rows = np.frombuffer(raw[: stride * height], dtype=np.uint8).reshape(height, stride)
        bgr = rows[:, : width * 3].reshape(height, width, 3)[::-1]  # bottom-up
        frames.append(bgr[:, :, ::-1].copy())  # BGR -> RGB
    return frames, fps


def encode_avi(frames, fps: float = 10.0) -> bytes:
    """Encode (H, W, 3) uint8 RGB frames as an uncompressed 24-bit AVI
    (the writer counterpart used by tests and COPY-style sinks)."""
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("encode_avi: no frames")
    h, w = frames[0].shape[:2]
    stride = (w * 3 + 3) & ~3
    us_per_frame = int(round(1e6 / fps)) if fps else 0

    def chunk(tag: bytes, body: bytes) -> bytes:
        return tag + struct.pack("<I", len(body)) + body + (b"\0" if len(body) & 1 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    frame_bytes = []
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("encode_avi: all frames must share one size")
        bgr = f[:, :, ::-1][::-1]  # RGB -> BGR, top-down -> bottom-up
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * 3] = bgr.reshape(h, w * 3)
        frame_bytes.append(rows.tobytes())

    avih = struct.pack(
        "<IIIIIIIIII4I",
        us_per_frame, stride * h * int(fps or 1), 0, 0x10, len(frames), 0, 1,
        stride * h, w, h, 0, 0, 0, 0,
    )
    # AVISTREAMHEADER is 56 bytes: fccType/fccHandler + 11 DWORD/WORD
    # fields + an 8-byte rcFrame (4 WORDs)
    strh = (
        b"vids" + b"DIB " + struct.pack("<IHHIIIIIIII4H", 0, 0, 0, 0, 1,
                                        int(round(fps or 1)), 0, len(frames),
                                        stride * h, 0xFFFFFFFF, 0,
                                        0, 0, w, h)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00db", fb) for fb in frame_bytes))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
