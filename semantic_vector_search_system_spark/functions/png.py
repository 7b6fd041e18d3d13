"""Pure-stdlib PNG codec for the multimodal decode slot.

The container has no image libraries (PIL/pypng verified absent), but PNG
is zlib + byte-level scanline filters, both stdlib-expressible — so the
engine's injectable media decode kernel (operators/multimodal.py) can run a
REAL codec end-to-end instead of only the deterministic stand-in.  Scope is
the common still-image profile: 8-bit depth, color types 0 (grayscale),
2 (RGB) and 6 (RGBA), non-interlaced, all five scanline filters.

Reference parity: the reference treats media as opaque blobs handed to a
codec library; this module is that library for PNG payloads.  The encoder
exists for tests and datagen (it can emit any filter type per row, so the
decoder's five unfilter paths are all exercised by round-trips).
"""

from __future__ import annotations

import struct
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# channels per pixel by PNG color type (8-bit depth profile)
_CHANNELS = {0: 1, 2: 3, 6: 4}


def is_png(data: bytes) -> bool:
    return isinstance(data, (bytes, bytearray)) and bytes(data[:8]) == _PNG_SIG


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    # a = left, b = up, c = up-left (PNG spec predictor)
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(
    width: int,
    height: int,
    pixels: bytes,
    color_type: int = 2,
    filter_type: int = 0,
) -> bytes:
    """Encode raw 8-bit pixels (row-major, ``width*height*channels`` bytes)
    as a valid PNG.  ``filter_type`` selects the per-row scanline filter
    (0..4) so tests can exercise every decoder unfilter path."""
    ch = _CHANNELS[color_type]
    if len(pixels) != width * height * ch:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, expected {width * height * ch}"
        )
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError(f"filter_type {filter_type} not in 0..4")
    stride = width * ch
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = pixels[y * stride : (y + 1) * stride]
        raw.append(filter_type)
        if filter_type == 0:  # None
            raw += row
        elif filter_type == 1:  # Sub
            raw += bytes(
                (row[i] - (row[i - ch] if i >= ch else 0)) & 0xFF
                for i in range(stride)
            )
        elif filter_type == 2:  # Up
            raw += bytes((row[i] - prev[i]) & 0xFF for i in range(stride))
        elif filter_type == 3:  # Average
            raw += bytes(
                (row[i] - (((row[i - ch] if i >= ch else 0) + prev[i]) >> 1)) & 0xFF
                for i in range(stride)
            )
        else:  # Paeth
            raw += bytes(
                (
                    row[i]
                    - _paeth(
                        row[i - ch] if i >= ch else 0,
                        prev[i],
                        prev[i - ch] if i >= ch else 0,
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG to ``(width, height, channels, pixels)`` — pixels are
    raw 8-bit row-major bytes.  Supports the profile documented in the
    module docstring; anything else raises ``ValueError`` by name."""
    if not is_png(data):
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = None
    color_type = None
    idat = bytearray()
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        # the full chunk (len + tag + body + CRC) must fit — a cut inside
        # the CRC would otherwise surface as struct.error, breaking the
        # ValueError-by-name contract
        if pos + 12 + length > n:
            raise ValueError("truncated PNG chunk")
        body = data[pos + 8 : pos + 8 + length]
        crc_expect = struct.unpack_from(">I", data, pos + 8 + length)[0]
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc_expect:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth} (only 8)")
            if color_type not in _CHANNELS:
                raise ValueError(
                    f"unsupported PNG color type {color_type} (0/2/6 only)"
                )
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
            if comp != 0 or filt != 0:
                raise ValueError("nonstandard PNG compression/filter method")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("PNG missing IHDR")
    ch = _CHANNELS[color_type]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:  # cut/corrupt IDAT stream — keep the contract
        raise ValueError(f"corrupt PNG pixel stream: {e}") from e
    stride = width * ch
    if len(raw) != (stride + 1) * height:
        raise ValueError(
            f"PNG raw stream is {len(raw)} bytes, expected {(stride + 1) * height}"
        )
    out = bytearray(stride * height)
    prev = bytearray(stride)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ft == 0:
            pass
        elif ft == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                ul = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        else:
            raise ValueError(f"bad PNG scanline filter {ft}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return width, height, ch, bytes(out)


def png_features(data: bytes, dim: int = 8) -> list[float]:
    """Feature vector from a decoded PNG, the real-codec twin of the
    deterministic stand-in kernel: ``[w/4096, h/4096, mean_px/255,
    hist_0..hist_{dim-5}, aspect]`` — 3 fixed features, ``dim - 4``
    histogram buckets, aspect last, exactly ``dim`` entries.  Requires
    ``dim >= 5`` so every named feature fits (r5 ADVICE: previously a tiny
    dim silently truncated the aspect feature away).  Histogram buckets are
    over the grayscale-collapsed pixel values, so features are invariant to
    the encoder's filter choice (pure content signal)."""
    if dim < 5:
        raise ValueError(
            f"png_features: dim={dim} < 5 cannot hold the fixed "
            "[w, h, mean, hist..., aspect] layout"
        )
    width, height, ch, px = decode_png(data)
    npx = width * height
    if ch == 1:
        gray = px
    else:
        # integer luma collapse (R+G+B)/3 over the first 3 channels
        gray = bytes(
            (px[i] + px[i + 1] + px[i + 2]) // 3 for i in range(0, len(px), ch)
        )
    mean = sum(gray) / (255.0 * npx) if npx else 0.0
    nbuckets = max(dim - 4, 1)
    hist = [0] * nbuckets
    for v in gray:
        hist[min(v * nbuckets // 256, nbuckets - 1)] += 1
    feats = [width / 4096.0, height / 4096.0, mean]
    feats += [c / npx if npx else 0.0 for c in hist]
    feats.append(width / height if height else 0.0)
    return (feats + [0.0] * dim)[:dim]
