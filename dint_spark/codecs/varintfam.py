"""Byte-aligned varint family — StreamVByte (F9) and VarintGB (F11).

Role parity with the reference's SIMD byte codecs
(/root/reference/include/ds2i/block_codecs.hpp; streamvbyte/varintgb via
the vendored libraries). Formats re-created from the published schemes:

* StreamVByte (Lemire & Kurz, "Stream VByte: faster byte-oriented
  integer compression", 2018): all 2-bit length codes (byte-length−1 per
  value, 4 per control byte) first, then the concatenated value bytes.
  Splitting control from data is what makes the SIMD shuffle-table
  decode possible; here the same split lets numpy decode with one
  boolean-mask scatter — no per-value Python.
* VarintGB (Dean, "Challenges in building large-scale information
  retrieval systems", 2009 — Google group varint): one control byte per
  group of 4 values, IMMEDIATELY followed by that group's value bytes.

MaskedVByte (F10) is intentionally NOT a separate codec: its wire format
IS plain VByte (the mask trick is a SIMD decode path, not a format) —
the registry aliases it to block_vbyte.
"""

from __future__ import annotations

import numpy as np


def _byte_lens(v: np.ndarray) -> np.ndarray:
    return (
        1 + (v > 0xFF).astype(np.int64) + (v > 0xFFFF) + (v > 0xFFFFFF)
    ).astype(np.int64)


def _value_bytes(v: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Concatenated little-endian value bytes (lens[i] per value)."""
    b = np.ascontiguousarray(v.astype("<u4")).view(np.uint8).reshape(-1, 4)
    mask = np.arange(4)[None, :] < lens[:, None]
    return b[mask]


def _scatter_values(data: np.ndarray, lens: np.ndarray) -> np.ndarray:
    out = np.zeros((lens.size, 4), dtype=np.uint8)
    mask = np.arange(4)[None, :] < lens[:, None]
    out[mask] = data
    return out.view("<u4").ravel().astype(np.uint32)


def _pack_control(lens: np.ndarray) -> np.ndarray:
    codes = (lens - 1).astype(np.uint8)
    pad = (-codes.size) % 4
    if pad:
        codes = np.concatenate([codes, np.zeros(pad, dtype=np.uint8)])
    g = codes.reshape(-1, 4)
    return (g[:, 0] | (g[:, 1] << 2) | (g[:, 2] << 4) | (g[:, 3] << 6)).astype(np.uint8)


def _unpack_control(ctrl: np.ndarray, n: int) -> np.ndarray:
    codes = np.empty((ctrl.size, 4), dtype=np.int64)
    codes[:, 0] = ctrl & 3
    codes[:, 1] = (ctrl >> 2) & 3
    codes[:, 2] = (ctrl >> 4) & 3
    codes[:, 3] = (ctrl >> 6) & 3
    return codes.ravel()[:n] + 1


def streamvbyte_encode(vals: np.ndarray) -> bytes:
    v = np.asarray(vals, dtype=np.uint32)
    if v.size == 0:
        return b""
    lens = _byte_lens(v)
    return _pack_control(lens).tobytes() + _value_bytes(v, lens).tobytes()


def streamvbyte_decode(buf: bytes, n: int) -> np.ndarray:
    if n == 0:
        return np.empty(0, dtype=np.uint32)
    nctrl = (n + 3) // 4
    raw = np.frombuffer(buf, dtype=np.uint8)
    lens = _unpack_control(raw[:nctrl], n)
    data = raw[nctrl : nctrl + int(lens.sum())]
    return _scatter_values(data, lens)


def varintgb_encode(vals: np.ndarray) -> bytes:
    v = np.asarray(vals, dtype=np.uint32)
    if v.size == 0:
        return b""
    lens = _byte_lens(v)
    ctrl = _pack_control(lens)
    data = _value_bytes(v, lens)
    # interleave: control byte g, then group g's value bytes
    group_lens = np.zeros(ctrl.size, dtype=np.int64)
    full = (v.size // 4) * 4
    group_lens[: v.size // 4] = lens[:full].reshape(-1, 4).sum(axis=1)
    if v.size % 4:
        group_lens[-1] = lens[full:].sum()
    out = np.empty(ctrl.size + data.size, dtype=np.uint8)
    starts = np.concatenate(([0], np.cumsum(group_lens)[:-1])) + np.arange(ctrl.size)
    out[starts] = ctrl
    mask = np.ones(out.size, dtype=bool)
    mask[starts] = False
    out[mask] = data
    return out.tobytes()


def varintgb_decode(buf: bytes, n: int) -> np.ndarray:
    if n == 0:
        return np.empty(0, dtype=np.uint32)
    raw = np.frombuffer(buf, dtype=np.uint8)
    lens = np.empty(n, dtype=np.int64)
    data_parts = []
    pos = 0
    i = 0
    while i < n:
        ctrl = int(raw[pos])
        pos += 1
        k = min(4, n - i)
        gl = 0
        for j in range(k):
            lens[i + j] = ((ctrl >> (2 * j)) & 3) + 1
            gl += lens[i + j]
        data_parts.append(raw[pos : pos + gl])
        pos += gl
        i += k
    return _scatter_values(np.concatenate(data_parts), lens)
