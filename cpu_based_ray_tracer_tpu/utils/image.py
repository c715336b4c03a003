"""Image IO: PPM (bit-comparable with the reference's offline output) + PNG.

The reference's only machine-comparable artifact is the offline prototype's
P3 PPM on stdout (``offline prototype/.../main.cpp:130-132, 214-220``); we
write the identical header/format so goldens diff cleanly.
"""

from __future__ import annotations

import io
import struct
import zlib

import numpy as np


def write_ppm(path_or_buf, rgb_u8: np.ndarray) -> None:
    """P3 ASCII PPM, one 'r g b' triple per line, max value 255 — the exact
    layout of the reference's writer (header main.cpp:130-132, rows top-down,
    triples via color.h write_color)."""
    arr = np.asarray(rgb_u8)
    assert arr.ndim == 3 and arr.shape[2] == 3 and arr.dtype == np.uint8
    h, w, _ = arr.shape
    out = io.StringIO()
    out.write(f"P3\n{w} {h}\n255\n")
    flat = arr.reshape(-1, 3)
    out.write("\n".join(f"{r} {g} {b}" for r, g, b in flat))
    out.write("\n")
    data = out.getvalue()
    if hasattr(path_or_buf, "write"):
        path_or_buf.write(data)
    else:
        with open(path_or_buf, "w") as f:
            f.write(data)


def read_ppm(path) -> np.ndarray:
    with open(path) as f:
        tokens = f.read().split()
    assert tokens[0] == "P3"
    w, h, maxv = int(tokens[1]), int(tokens[2]), int(tokens[3])
    assert maxv == 255
    vals = np.array(tokens[4:4 + w * h * 3], dtype=np.uint8)
    return vals.reshape(h, w, 3)


def write_png(path, rgb_u8: np.ndarray) -> None:
    """Minimal dependency-free PNG writer (8-bit RGB)."""
    arr = np.ascontiguousarray(np.asarray(rgb_u8), dtype=np.uint8)
    h, w, _ = arr.shape
    raw = b"".join(b"\x00" + arr[i].tobytes() for i in range(h))

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(png)


def read_png(path) -> np.ndarray:
    """Read an 8-bit RGB PNG written by ``write_png`` (filter-0 scanlines,
    single IDAT stream; no interlace)."""
    with open(path, "rb") as f:
        data = f.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
    pos, w = 8, None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(
                ">IIBBBBB", payload)
            assert (depth, ctype, interlace) == (8, 2, 0), \
                "read_png only supports our write_png output (RGB8)"
        elif tag == b"IDAT":
            idat += payload
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = 1 + w * 3
    rows = []
    for i in range(h):
        line = raw[i * stride:(i + 1) * stride]
        assert line[0] == 0, "read_png only supports filter-0 scanlines"
        rows.append(np.frombuffer(line, np.uint8, count=w * 3, offset=1))
    return np.stack(rows).reshape(h, w, 3)
