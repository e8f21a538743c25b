"""Real PNG codec, pure stdlib (zlib + struct): the compressed-format
member of the multimodal codec family (bmp.py = uncompressed raster,
wav.py = PCM audio, BMP-stream = video).  Encode writes a spec-correct
8-bit truecolor PNG — signature, IHDR/IDAT/IEND chunks with CRC32,
zlib-deflated scanlines — deliberately cycling scanline FILTERS
(None/Sub/Up/Paeth) so a decoder cannot fake it: reading the pixels
back requires genuine per-filter reconstruction, not just a header
skip.  Decode implements all five filter reconstructions from the spec
(PNG spec §4.5.4 / RFC 2083 §6), including Average, and verifies chunk
CRCs.

Scale shape is inherited from binary_ops.py: codecs run inside
Arrow-batched ``mapInPandas`` over (doc_id, payload) only — map-only,
column-pruned, shuffle-free.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"
_BPP = 3  # 8-bit truecolor


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


# Filter cycle the encoder applies per row (row 0 has no "up" context,
# so it starts with None); decode must reconstruct each kind.
_FILTER_CYCLE = (0, 1, 2, 4)


def encode_png(width: int, height: int, pixels: bytes) -> bytes:
    """Spec-correct 8-bit RGB PNG of ``pixels`` (len == w*h*3, row-major
    RGB), scanlines filtered per _FILTER_CYCLE."""
    stride = width * _BPP
    if len(pixels) != stride * height:
        raise ValueError(f"need {stride * height} pixel bytes, got {len(pixels)}")
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = pixels[y * stride : (y + 1) * stride]
        ft = _FILTER_CYCLE[y % len(_FILTER_CYCLE)] if y > 0 else 0
        raw.append(ft)
        for x in range(stride):
            left = row[x - _BPP] if x >= _BPP else 0
            up = prev[x]
            ul = prev[x - _BPP] if x >= _BPP else 0
            if ft == 0:
                raw.append(row[x])
            elif ft == 1:
                raw.append((row[x] - left) & 0xFF)
            elif ft == 2:
                raw.append((row[x] - up) & 0xFF)
            elif ft == 3:
                raw.append((row[x] - (left + up) // 2) & 0xFF)
            else:
                raw.append((row[x] - _paeth(left, up, ul)) & 0xFF)
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> tuple[int, int, bytes]:
    """(width, height, rgb_bytes) — full chunk walk with CRC checks,
    zlib inflate, and per-scanline filter reconstruction (all 5 types)."""
    if payload[:8] != _SIG:
        raise ValueError("not a PNG: bad signature")
    pos, width = 8, None
    height = 0
    idat = bytearray()
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {ctype!r} chunk")
        if ctype == b"IHDR":
            width, height, depth, ctype_n, comp, filt, inter = struct.unpack(
                ">IIBBBBB", data
            )
            if (depth, ctype_n, comp, filt, inter) != (8, 2, 0, 0, 0):
                raise ValueError("only 8-bit truecolor, no interlace")
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("no IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * _BPP
    if len(raw) != (stride + 1) * height:
        raise ValueError("IDAT length does not match dimensions")
    out = bytearray()
    prev = bytes(stride)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        rec = bytearray(stride)
        for x in range(stride):
            left = rec[x - _BPP] if x >= _BPP else 0
            up = prev[x]
            ul = prev[x - _BPP] if x >= _BPP else 0
            if ft == 0:
                rec[x] = line[x]
            elif ft == 1:
                rec[x] = (line[x] + left) & 0xFF
            elif ft == 2:
                rec[x] = (line[x] + up) & 0xFF
            elif ft == 3:
                rec[x] = (line[x] + (left + up) // 2) & 0xFF
            elif ft == 4:
                rec[x] = (line[x] + _paeth(left, up, ul)) & 0xFF
            else:
                raise ValueError(f"unknown filter {ft}")
        out += rec
        prev = bytes(rec)
    return width, height, bytes(out)


def png_feature_decoder(payload: bytes) -> list[float]:
    """[width, height, first_byte, byte_total, weighted_total] from a
    REAL decode — same checksum family as bmp_feature_decoder, so the
    oracle can recompute the stats from the pre-encode pixel material
    (decode(encode(x)) == x is exactly what the match proves)."""
    w, h, px = decode_png(payload)
    total = sum(px)
    weighted = sum((i + 1) * b for i, b in enumerate(px))
    return [float(w), float(h), float(px[0]), float(total), float(weighted)]


def resize_png(payload: bytes, out_w: int, out_h: int) -> bytes:
    """Nearest-neighbor PNG resize: genuine decode (inflate + filter
    reconstruction), floor-mapped pixel sampling (output (x, y) reads
    source (x * src_w // out_w, y * src_h // out_h)), then re-encode
    through the same filter-cycling writer.  The bmp.py resize_bmp
    sibling for the compressed container."""
    src_w, src_h, px = decode_png(payload)
    out = bytearray()
    for y in range(out_h):
        sy = y * src_h // out_h
        for x in range(out_w):
            sx = x * src_w // out_w
            base = (sy * src_w + sx) * _BPP
            out += px[base : base + _BPP]
    return encode_png(out_w, out_h, bytes(out))


def png_luma_histogram(payload: bytes, buckets: int = 8) -> list[float]:
    """Integer luma histogram from a REAL decode: per pixel,
    luma = (299*R + 587*G + 114*B) // 1000 (the Rec.601 weights as an
    exact integer expression), bucketed into ``buckets`` equal bins of
    the 0..255 range — the exposure/contrast screening feature image
    curation pipelines gate on.  Counts are small exact integers, so
    they ride the generic float feature array safely."""
    _w, _h, px = decode_png(payload)
    hist = [0] * buckets
    for i in range(0, len(px), _BPP):
        luma = (299 * px[i] + 587 * px[i + 1] + 114 * px[i + 2]) // 1000
        # luma * buckets // 256 maps 0..255 onto 0..buckets-1 for ANY
        # bucket count (ADVICE r9: the old `luma // (256 // buckets)`
        # indexed out of range whenever buckets didn't divide 256).
        hist[luma * buckets // 256] += 1
    return [float(c) for c in hist]


def png_dhash(payload: bytes, grid_w: int = 9, grid_h: int = 8) -> tuple[int, int]:
    """Difference-hash (dHash) from a REAL decode: floor-sample the
    image to a (grid_w x grid_h) luma grid (the resize_png sampling
    rule), then one gradient bit per horizontally adjacent pair —
    the standard 64-bit perceptual fingerprint.  Returned as two
    (grid_h/2 x (grid_w-1))-bit halves (hi = bottom rows, lo = top
    rows) so the values ride LongType columns without sign games.
    All-integer arithmetic: Rec.601 luma via the exact
    (299R + 587G + 114B) // 1000 expression, exact floor sampling —
    bit-identical across engines by construction."""
    src_w, src_h, px = decode_png(payload)
    lum = []
    for y in range(grid_h):
        sy = y * src_h // grid_h
        row = []
        for x in range(grid_w):
            sx = x * src_w // grid_w
            base = (sy * src_w + sx) * _BPP
            row.append(
                (299 * px[base] + 587 * px[base + 1] + 114 * px[base + 2]) // 1000
            )
        lum.append(row)
    lo = hi = 0
    half = grid_h // 2
    bits_per_row = grid_w - 1
    for y in range(grid_h):
        for x in range(bits_per_row):
            bit = 1 if lum[y][x + 1] > lum[y][x] else 0
            if y < half:
                lo |= bit << (y * bits_per_row + x)
            else:
                hi |= bit << ((y - half) * bits_per_row + x)
    return hi, lo
