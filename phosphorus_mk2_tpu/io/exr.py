"""Minimal OpenEXR writer (pure Python, no OpenEXR/OIIO dependency).

Counterpart of the reference's EXR file sink (reference
src/film/file.cpp:27-45, which delegates to OIIO). Writes scanline,
uncompressed, float32 EXR 2.0 files — readable by any EXR consumer.
Supports RGB / RGBA plus extra AOV layers (e.g. normals) as
channel-prefixed layers, mirroring the reference's multi-channel
render_buffer_t (src/buffer.cpp:7-8).
"""
from __future__ import annotations

import struct

import numpy as np

_MAGIC = 20000630
_VERSION = 2

_PIXELTYPE_FLOAT = 2  # 32-bit float


def _attr(name: str, type_name: str, data: bytes) -> bytes:
    return (
        name.encode() + b"\x00" + type_name.encode() + b"\x00"
        + struct.pack("<i", len(data)) + data
    )


def _channel_list(names) -> bytes:
    out = b""
    for n in sorted(names):
        out += n.encode() + b"\x00"
        out += struct.pack("<iiii", _PIXELTYPE_FLOAT, 0, 1, 1)
    return out + b"\x00"


def write_exr(path: str, channels: dict[str, np.ndarray]) -> None:
    """Write named float32 channels (each (H, W)) to an EXR file.

    Channel names follow EXR conventions: "R", "G", "B", "A",
    "normal.X" etc.
    """
    names = sorted(channels.keys())
    h, w = channels[names[0]].shape
    for n in names:
        if channels[n].shape != (h, w):
            raise ValueError(f"channel {n} shape mismatch")

    header = b""
    header += _attr("channels", "chlist", _channel_list(names))
    header += _attr("compression", "compression", struct.pack("<B", 0))
    header += _attr("dataWindow", "box2i", struct.pack("<iiii", 0, 0, w - 1, h - 1))
    header += _attr("displayWindow", "box2i", struct.pack("<iiii", 0, 0, w - 1, h - 1))
    header += _attr("lineOrder", "lineOrder", struct.pack("<B", 0))
    header += _attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    header += _attr("screenWindowCenter", "v2f", struct.pack("<ff", 0.0, 0.0))
    header += _attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    header += b"\x00"  # end of header

    # scanline offset table
    pixel_data_size_per_line = 8 + w * 4 * len(names)
    table_start = 8 + header.__len__()
    data_start = table_start + 8 * h
    offsets = b"".join(
        struct.pack("<Q", data_start + y * pixel_data_size_per_line)
        for y in range(h)
    )

    with open(path, "wb") as f:
        f.write(struct.pack("<ii", _MAGIC, _VERSION))
        f.write(header)
        f.write(offsets)
        for y in range(h):
            f.write(struct.pack("<ii", y, w * 4 * len(names)))
            for n in names:  # channels stored alphabetically per scanline
                f.write(
                    np.ascontiguousarray(channels[n][y], np.float32).tobytes()
                )


def read_exr(path: str) -> dict[str, np.ndarray]:
    """Minimal reader for files written by write_exr (round-trip tests)."""
    with open(path, "rb") as f:
        buf = f.read()
    magic, version = struct.unpack_from("<ii", buf, 0)
    if magic != _MAGIC:
        raise ValueError("not an EXR file")
    pos = 8
    attrs = {}
    while buf[pos] != 0:
        end = buf.index(b"\x00", pos)
        name = buf[pos:end].decode()
        pos = end + 1
        end = buf.index(b"\x00", pos)
        type_name = buf[pos:end].decode()
        pos = end + 1
        (size,) = struct.unpack_from("<i", buf, pos)
        pos += 4
        attrs[name] = (type_name, buf[pos : pos + size])
        pos += size
    pos += 1

    # channels
    ch = attrs["channels"][1]
    names = []
    cpos = 0
    while ch[cpos] != 0:
        e = ch.index(b"\x00", cpos)
        names.append(ch[cpos:e].decode())
        cpos = e + 1 + 16
    x0, y0, x1, y1 = struct.unpack("<iiii", attrs["dataWindow"][1])
    w, h = x1 - x0 + 1, y1 - y0 + 1

    offsets = struct.unpack_from(f"<{h}Q", buf, pos)
    out = {n: np.zeros((h, w), np.float32) for n in names}
    for y, off in enumerate(offsets):
        yy, size = struct.unpack_from("<ii", buf, off)
        dpos = off + 8
        for n in sorted(names):
            out[n][yy] = np.frombuffer(buf, np.float32, w, dpos)
            dpos += w * 4
    return out


def write_film(path: str, film: dict) -> None:
    """Write the integrator's film dict (color/normal/alpha) to EXR."""
    color = np.asarray(film["color"], np.float32)
    channels = {
        "R": color[..., 0],
        "G": color[..., 1],
        "B": color[..., 2],
    }
    if "alpha" in film:
        channels["A"] = np.asarray(film["alpha"], np.float32)
    if "normal" in film:
        nrm = np.asarray(film["normal"], np.float32)
        channels["normal.X"] = nrm[..., 0]
        channels["normal.Y"] = nrm[..., 1]
        channels["normal.Z"] = nrm[..., 2]
    write_exr(path, channels)


def write_png(path: str, color: np.ndarray, gamma: float = 2.2) -> None:
    """Tonemapped 8-bit preview via PIL."""
    from PIL import Image

    srgb = np.clip(np.asarray(color, np.float32), 0.0, 1.0) ** (1.0 / gamma)
    Image.fromarray((srgb * 255).astype(np.uint8)).save(path)
