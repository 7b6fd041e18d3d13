"""Pure-stdlib WAV (RIFF/WAVE PCM) encode/decode + audio features.

The audio sibling of ``functions/png.py``: a REAL codec with zero
third-party dependencies for the multimodal decode slot
(``operators/multimodal.py``) — so the "audio decode" stage of the
media pipeline is exercised by actual byte-level parsing, not only the
deterministic stand-in. From-scratch RIFF chunk walk + ``struct``
unpacking (the stdlib ``wave`` module exists but this keeps parity with
png.py's explicit-parser style and full control of malformed-input
errors: every failure is a ``ValueError``, never an attribute surprise).

Supports PCM (format tag 1) mono/multi-channel, 8-bit unsigned and
16/32-bit signed little-endian — the formats produced by essentially
every crawl-encountered uncompressed WAV.
"""

from __future__ import annotations

import struct

_RIFF = b"RIFF"
_WAVE = b"WAVE"


def is_wav(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == _RIFF and data[8:12] == _WAVE


def encode_wav(
    samples: list[int],
    sample_rate: int = 8000,
    bits: int = 16,
    channels: int = 1,
) -> bytes:
    """Encode interleaved integer samples as a PCM WAV blob. ``samples``
    length must be a multiple of ``channels``; values must fit the
    target width (8-bit is unsigned 0..255, 16/32-bit signed)."""
    if bits not in (8, 16, 32):
        raise ValueError(f"unsupported bit depth {bits}")
    if channels < 1:
        raise ValueError("channels must be >= 1")
    if len(samples) % channels:
        raise ValueError("sample count not a multiple of channels")
    if bits == 8:
        lo, hi, fmt = 0, 255, "B"
    elif bits == 16:
        lo, hi, fmt = -(2**15), 2**15 - 1, "h"
    else:
        lo, hi, fmt = -(2**31), 2**31 - 1, "i"
    for s in samples:
        if not (lo <= s <= hi):
            raise ValueError(f"sample {s} out of range for {bits}-bit PCM")
    frames = struct.pack(f"<{len(samples)}{fmt}", *samples)
    block_align = channels * (bits // 8)
    fmt_body = struct.pack(
        "<HHIIHH", 1, channels, sample_rate,
        sample_rate * block_align, block_align, bits,
    )
    body = (
        _WAVE
        + b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
        + b"data" + struct.pack("<I", len(frames)) + frames
    )
    return _RIFF + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, int, int, list[int]]:
    """Parse a PCM WAV blob → ``(sample_rate, channels, bits,
    interleaved samples)``. Raises ``ValueError`` on anything that is
    not a well-formed PCM RIFF/WAVE."""
    if not is_wav(data):
        raise ValueError("not a RIFF/WAVE blob")
    pos, end = 12, len(data)
    fmt_body = frames = None
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body_start = pos + 8
        if body_start + size > end:
            raise ValueError(f"truncated {tag!r} chunk")
        if tag == b"fmt ":
            fmt_body = data[body_start : body_start + size]
        elif tag == b"data":
            frames = data[body_start : body_start + size]
        pos = body_start + size + (size & 1)  # chunks are word-aligned
    if fmt_body is None or frames is None:
        raise ValueError("missing fmt or data chunk")
    if len(fmt_body) < 16:
        raise ValueError("fmt chunk too short")
    tag, channels, rate, _brate, _align, bits = struct.unpack_from(
        "<HHIIHH", fmt_body
    )
    if tag != 1:
        raise ValueError(f"unsupported (non-PCM) format tag {tag}")
    if bits not in (8, 16, 32) or channels < 1:
        raise ValueError(f"unsupported geometry bits={bits} channels={channels}")
    width = bits // 8
    n = len(frames) // width
    if n * width != len(frames):
        raise ValueError("data chunk not a whole number of samples")
    fmt = {8: "B", 16: "h", 32: "i"}[bits]
    samples = list(struct.unpack(f"<{n}{fmt}", frames[: n * width]))
    return rate, channels, bits, samples


def wav_features(data: bytes, dim: int = 8) -> list[float]:
    """Deterministic audio features from a decoded PCM blob:
    ``[duration_s, rms, zero_crossing_rate, peak, mean] + per-bucket
    RMS over ``dim - 5`` equal time buckets`` — the audio analog of
    ``png_features``. Amplitudes normalize to [-1, 1] by bit depth
    (8-bit recenters its unsigned range first). ``dim >= 6`` so at
    least one energy bucket survives."""
    if dim < 6:
        raise ValueError(f"wav_features needs dim >= 6, got {dim}")
    rate, channels, bits, samples = decode_wav(data)
    if not samples:
        return [0.0] * dim
    if bits == 8:
        xs = [(s - 128) / 128.0 for s in samples]
    else:
        full = float(2 ** (bits - 1))
        xs = [s / full for s in samples]
    n = len(xs)
    duration = n / float(channels) / float(rate)
    mean = sum(xs) / n
    rms = (sum(x * x for x in xs) / n) ** 0.5
    peak = max(abs(x) for x in xs)
    zc = sum(
        1 for a, b in zip(xs, xs[1:]) if (a < 0.0) != (b < 0.0)
    ) / max(1, n - 1)
    n_buckets = dim - 5
    out = [duration, rms, zc, peak, mean]
    for b in range(n_buckets):
        lo = b * n // n_buckets
        hi = max(lo + 1, (b + 1) * n // n_buckets)
        seg = xs[lo:hi]
        out.append((sum(x * x for x in seg) / len(seg)) ** 0.5)
    return [float(v) for v in out]
