"""Real byte-level media codecs in pure numpy — BMP (24-bit) and WAV
(PCM16). No external imaging/audio library required: both formats are
fully specified header + raw-sample layouts, so the container-limited
"stub" excuse stops applying to them. JPEG/PNG/MP4 (entropy-coded
formats that genuinely need codec libraries) remain behind explicit
NotImplementedError in operators/multimodal.py.

These run inside Arrow-batched mapInPandas kernels (operators/
multimodal.py) — one numpy parse per media blob, no Python-per-pixel
work (`np.frombuffer` + stride reshape).

Format notes:
* BMP: BITMAPFILEHEADER (14 B) + BITMAPINFOHEADER (40 B), BI_RGB
  24 bpp, rows bottom-up (positive height) or top-down (negative),
  BGR byte order, each row padded to 4 bytes.
* WAV: RIFF header + 'fmt ' chunk (PCM, format tag 1) + 'data' chunk,
  16-bit little-endian mono/stereo.
"""

from __future__ import annotations

import struct

import numpy as np


# ------------------------------------------------------------------ BMP

def bmp_encode(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → 24-bit BI_RGB BMP bytes (bottom-up)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("bmp_encode expects (H, W, 3) RGB")
    h, w, _ = px.shape
    row_bytes = (w * 3 + 3) & ~3
    img_size = row_bytes * h
    # pixel array: bottom-up rows, BGR order, padded
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + img_size, 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    return header + info + rows.tobytes()


def bmp_decode(buf: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP bytes → (H, W, 3) uint8 RGB. Handles bottom-up
    (positive height) and top-down (negative height) layouts; rejects
    compressed or non-24bpp files loudly."""
    if len(buf) < 54 or buf[:2] != b"BM":
        raise ValueError("not a BMP file")
    off = struct.unpack_from("<I", buf, 10)[0]
    hdr_size, w, h_raw = struct.unpack_from("<Iii", buf, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    planes, bpp, compression = struct.unpack_from("<HHI", buf, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit BI_RGB supported (bpp={bpp}, comp={compression})")
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    row_bytes = (w * 3 + 3) & ~3
    need = off + row_bytes * h
    if len(buf) < need:
        raise ValueError(f"truncated BMP: {len(buf)} < {need}")
    rows = np.frombuffer(buf, dtype=np.uint8, count=row_bytes * h, offset=off)
    rows = rows.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def resize_nearest(pixels: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy index gather."""
    px = np.asarray(pixels)
    h, w = px.shape[:2]
    ri = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    ci = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return px[ri][:, ci]


# ------------------------------------------------------------------ WAV

def wav_encode(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 mono samples → RIFF/WAVE PCM16 bytes."""
    s = np.asarray(samples, dtype="<i2")
    data = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt) + 8 + len(data), b"WAVE")
        + struct.pack("<4sI", b"fmt ", len(fmt)) + fmt
        + struct.pack("<4sI", b"data", len(data)) + data
    )


def wav_decode(buf: bytes) -> "tuple[np.ndarray, int]":
    """RIFF/WAVE PCM16 bytes → (samples int16 (n,) or (n, ch), rate).
    Walks the chunk list (fmt/data can be preceded by LIST etc.)."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a WAV file")
    pos, rate, channels, bits, data = 12, None, None, None, None
    while pos + 8 <= len(buf):
        cid, size = struct.unpack_from("<4sI", buf, pos)
        body = buf[pos + 8 : pos + 8 + size]
        if len(body) != size and cid in (b"fmt ", b"data"):
            # a declared-size slice past EOF silently returns fewer
            # bytes — a corrupt data chunk then yielded a silently
            # short sample array (r5 ADVICE); fail loudly like
            # bmp_decode's truncation check
            raise ValueError(
                f"truncated WAV: {cid.decode(errors='replace').strip()} "
                f"chunk declares {size} bytes, {len(body)} present"
            )
        if cid == b"fmt ":
            tag, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
            if tag != 1:
                raise ValueError(f"only PCM supported (format tag {tag})")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if bits != 16:
        raise ValueError(f"only 16-bit PCM supported (bits={bits})")
    s = np.frombuffer(data, dtype="<i2")
    if channels and channels > 1:
        s = s.reshape(-1, channels)
    return s, int(rate)
