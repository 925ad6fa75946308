"""Pure-stdlib media codecs — REAL decode for formats that need no
external library.

The container ships no PIL/opencv/ffmpeg, but several real interchange
formats are fully decodable with the stdlib + numpy:

- PNG (8-bit gray/RGB/RGBA, non-interlaced): zlib inflate + scanline
  unfiltering (all five filter types per the PNG spec §9).
- BMP (24-bit uncompressed BI_RGB).
- PPM (binary P6).
- WAV (8/16-bit PCM via the stdlib ``wave`` module).
- RFV1: a minimal length-prefixed frame container (magic ``RFV1`` +
  frame count + per-frame length-prefixed PNG payloads) so video frame
  sampling has a real, parseable container format.

Matching encoders exist for every decoder so tests can round-trip real
encoded bytes. Formats that genuinely require external codecs (JPEG,
MP4/H.264, MP3, ...) remain explicit NotImplementedError integration
points in operators/multimodal.py.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples per pixel


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """8-bit PNG from (H,W) gray, (H,W,3) RGB or (H,W,4) RGBA uint8."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color_type, ch = 0, 1
        h, w = img.shape
    elif img.ndim == 3 and img.shape[2] in (3, 4):
        ch = img.shape[2]
        color_type = 2 if ch == 3 else 6
        h, w = img.shape[:2]
    else:
        raise ValueError("expected (H,W), (H,W,3) or (H,W,4) uint8")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = np.zeros((h, 1 + w * ch), dtype=np.uint8)  # filter byte 0 per row
    raw[:, 1:] = img.reshape(h, w * ch)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG to (H,W) or (H,W,C) uint8.

    Full scanline unfiltering per the PNG spec: None/Up/Sub are fully
    vectorized (Sub is a per-channel mod-256 cumsum); Average/Paeth carry a
    pixel-to-pixel dependency and run sequentially over pixel columns with
    channel-vectorized steps."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, idat = 8, bytearray()
    w = h = depth = color_type = interlace = None
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8:
        raise NotImplementedError("only 8-bit PNG supported")
    if interlace:
        raise NotImplementedError("interlaced PNG not supported")
    ch = _CHANNELS.get(color_type)
    if ch is None:
        raise NotImplementedError(f"PNG color type {color_type} (palette)")
    stride = w * ch
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    raw = raw.reshape(h, 1 + stride)
    filters = raw[:, 0]
    rows = raw[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        f = int(filters[y])
        row = rows[y]
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if f == 0:  # None
            rec = row & 0xFF
        elif f == 2:  # Up
            rec = (row + prev) & 0xFF
        elif f == 1:  # Sub: per-channel cumulative sum mod 256
            rec = np.cumsum(
                row.astype(np.uint8).reshape(w, ch), axis=0, dtype=np.uint8
            ).reshape(stride)
        elif f in (3, 4):  # Average / Paeth: sequential over pixel COLUMNS
            # (the in-row dependency is pixel-to-pixel), vectorized over
            # channels — w iterations instead of w*ch per-byte steps
            row2 = row.reshape(w, ch)
            prev2 = prev.reshape(w, ch)
            rec2 = np.empty((w, ch), np.int32)
            left = np.zeros(ch, np.int32)
            if f == 3:  # Average
                for x in range(w):
                    left = (row2[x] + ((left + prev2[x]) >> 1)) & 0xFF
                    rec2[x] = left
            else:  # Paeth
                ul = np.zeros(ch, np.int32)
                for x in range(w):
                    b = prev2[x]
                    p = left + b - ul
                    pa = np.abs(p - left)
                    pb = np.abs(p - b)
                    pc = np.abs(p - ul)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, b, ul)
                    )
                    left = (row2[x] + pred) & 0xFF
                    rec2[x] = left
                    ul = b
            rec = rec2.reshape(stride)
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = rec
    img = out.reshape(h, w, ch)
    return img[:, :, 0] if ch == 1 else img


# ---------------------------------------------------------------------------
# BMP (24-bit uncompressed)
# ---------------------------------------------------------------------------

def encode_bmp(img: np.ndarray) -> bytes:
    """24-bit bottom-up BI_RGB BMP from (H,W,3) RGB uint8."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("expected (H,W,3) uint8")
    h, w = img.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    body = np.zeros((h, row_bytes), dtype=np.uint8)
    body[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    data = body.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + dib + data


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP to (H,W,3) RGB uint8."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (off,) = struct.unpack("<I", data[10:14])
    w, h = struct.unpack("<ii", data[18:26])
    bpp, = struct.unpack("<H", data[28:30])
    comp, = struct.unpack("<I", data[30:34])
    if bpp != 24 or comp != 0:
        raise NotImplementedError("only 24-bit uncompressed BMP supported")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    arr = np.frombuffer(data, dtype=np.uint8, count=row_bytes * h, offset=off)
    img = arr.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
    return img[::-1] if bottom_up else img


# ---------------------------------------------------------------------------
# PPM (binary P6)
# ---------------------------------------------------------------------------

def encode_ppm(img: np.ndarray) -> bytes:
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("expected (H,W,3) uint8")
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    if data[:2] != b"P6":
        raise ValueError("not a binary PPM (P6)")
    # header: three whitespace-separated ints, '#' comments allowed
    fields, pos = [], 2
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError("only maxval=255 PPM supported")
    return np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos).reshape(
        h, w, 3
    )


# ---------------------------------------------------------------------------
# WAV (PCM)
# ---------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """16-bit PCM WAV from (n,) or (n, channels) int16."""
    samples = np.asarray(samples, dtype=np.int16)
    ch = 1 if samples.ndim == 1 else samples.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(ch)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(np.ascontiguousarray(samples).tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """((n_frames, channels) int16, sample_rate) from 8/16-bit PCM WAV."""
    with wave.open(io.BytesIO(data)) as wf:
        n, sr, ch, sw = (
            wf.getnframes(),
            wf.getframerate(),
            wf.getnchannels(),
            wf.getsampwidth(),
        )
        raw = wf.readframes(n)
    if sw == 2:
        arr = np.frombuffer(raw, dtype="<i2")
    elif sw == 1:
        arr = (np.frombuffer(raw, dtype=np.uint8).astype(np.int16) - 128) * 256
    else:
        raise NotImplementedError("only 8/16-bit PCM WAV supported")
    return arr.reshape(-1, ch), sr


# ---------------------------------------------------------------------------
# RFV1: length-prefixed frame container (video plumbing)
# ---------------------------------------------------------------------------

RFV1_MAGIC = b"RFV1"


def encode_frames(frames: list[bytes]) -> bytes:
    """Pack encoded frame payloads (e.g. PNGs) into an RFV1 container."""
    out = bytearray(RFV1_MAGIC)
    out += struct.pack("<I", len(frames))
    for f in frames:
        out += struct.pack("<I", len(f))
        out += f
    return bytes(out)


def iter_frames(data: bytes):
    """Yield (frame_idx, frame_bytes) from an RFV1 container."""
    if data[:4] != RFV1_MAGIC:
        raise ValueError("not an RFV1 container")
    (n,) = struct.unpack("<I", data[4:8])
    pos = 8
    for i in range(n):
        (ln,) = struct.unpack("<I", data[pos : pos + 4])
        pos += 4
        yield i, bytes(data[pos : pos + ln])
        pos += ln


def to_gray(img: np.ndarray) -> np.ndarray:
    """(H,W[,C]) uint8 -> (H,W) float32 luminance (mean over channels)."""
    if img.ndim == 2:
        return img.astype(np.float32)
    return img[:, :, :3].astype(np.float32).mean(axis=2)
