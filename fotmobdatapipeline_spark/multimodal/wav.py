"""Pure-Python WAV (RIFF/PCM) codec: the AUDIO twin of ``bmp.py``, so
the multimodal tier exercises a second real byte-decode modality
(image AND audio), not just plumbing.

Scope: 16-bit signed little-endian mono PCM in a RIFF/WAVE container —
the canonical uncompressed interchange subset.  Decoding is genuine
work, not a byte copy:

* the RIFF container is CHUNK-STRUCTURED: the reader must walk
  ``fmt ``/``data`` (and skip unknown chunks, odd-length-padded per
  spec) rather than assume fixed offsets;
* samples are SIGNED 16-bit little-endian: each pair of payload bytes
  becomes a value in [-32768, 32767] — a decoder that forgets the sign
  convention or byte order produces different sums.

``struct`` only — runs inside Arrow-batched ``mapInPandas`` stages on
any Python worker.  Reference surface: the multimodal decode tier of
SURVEY.md §2 (the reference pipeline has no media path; this is part
of the mandated LLM-data-pipeline extension).
"""

from __future__ import annotations

import struct


def encode_wav(sample_rate: int, samples: list[int]) -> bytes:
    """Encode signed 16-bit mono ``samples`` as a RIFF/WAVE file with a
    standard PCM ``fmt `` chunk followed by the ``data`` chunk."""
    if sample_rate <= 0:
        raise ValueError("sample_rate must be positive")
    for s in samples:
        if not -32768 <= s <= 32767:
            raise ValueError(f"sample {s} out of int16 range")
    data = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * 2  # mono, 2 bytes/sample
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, byte_rate, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, list[int]]:
    """Decode a RIFF/WAVE payload to ``(sample_rate, samples)`` —
    the inverse of :func:`encode_wav`, and a correct reader for any
    16-bit mono PCM file regardless of chunk order or extra chunks
    (LIST/INFO etc. are skipped with spec-correct odd-length padding).
    Raises ``ValueError`` on a non-RIFF payload, non-PCM encoding,
    unsupported channel count/bit depth, or a truncated data chunk."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    # The RIFF header declares the container extent; honor it like
    # split_bmp_stream honors BMP file sizes — trailing junk and
    # truncation are both errors, not silently-parsed bytes.
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    end = 8 + riff_size
    if end > len(payload):
        raise ValueError("truncated RIFF container")
    if len(payload) > end:
        raise ValueError(f"{len(payload) - end} trailing bytes beyond RIFF size")
    pos = 12
    fmt_info: tuple[int, int, int, int] | None = None
    data: bytes | None = None
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        if pos + 8 + clen > end:
            raise ValueError(f"truncated {cid!r} chunk")
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("fmt chunk too short")
            audio_fmt, channels, rate, _brate, _align, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            fmt_info = (audio_fmt, channels, rate, bits)
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt_info is None or data is None:
        raise ValueError("missing fmt or data chunk")
    audio_fmt, channels, rate, bits = fmt_info
    if audio_fmt != 1:
        raise ValueError(f"unsupported audio format {audio_fmt} (only PCM)")
    if channels != 1 or bits != 16:
        raise ValueError(f"unsupported layout {channels}ch/{bits}bit (mono 16)")
    if len(data) % 2:
        raise ValueError("odd data chunk length for 16-bit samples")
    return rate, list(struct.unpack(f"<{len(data) // 2}h", data))


def wav_feature_decoder(payload: bytes) -> list[float]:
    """REAL decoder for ``extract_features``: parse the WAV, then
    summarize the decoded SIGNED samples with exact integer statistics:
    [sample_rate, n_samples, first sample, sample sum, position-weighted
    sample sum].  The signed sums make the int16 sign/byte-order
    conversion observable, and the weighted sum makes sample ORDER
    observable — the properties the oracle checks value-exactly."""
    rate, samples = decode_wav(payload)
    total = 0
    weighted = 0
    for i, s in enumerate(samples):
        total += s
        weighted += (i + 1) * s
    first = float(samples[0]) if samples else 0.0
    return [float(rate), float(len(samples)), first, float(total), float(weighted)]


def text_samples(text_bytes: bytes, n_samples: int) -> list[int]:
    """Deterministic sample material from a document's UTF-8 bytes:
    consecutive byte PAIRS become little-endian signed int16 samples
    (zero-padded past the end) — so a SQL oracle can recompute the
    expected decode output from the text column alone."""
    need = n_samples * 2
    raw = text_bytes[:need].ljust(need, b"\x00")
    return list(struct.unpack(f"<{n_samples}h", raw))


def wav_signal_features(payload: bytes) -> list[float]:
    """REAL audio features from a decoded WAV: [n_samples, energy
    (sum of squared samples), zero_crossings, peak_abs] — the classic
    signal summary (RMS energy basis, ZCR, peak), all exact integers
    so the oracle can recompute them from the pre-encode sample
    material.  A zero crossing is a sign change between consecutive
    samples (zero counts as non-negative)."""
    _rate, samples = decode_wav(payload)
    energy = 0
    zc = 0
    peak = 0
    prev_neg = None
    for s in samples:
        energy += s * s
        a = -s if s < 0 else s
        if a > peak:
            peak = a
        neg = s < 0
        if prev_neg is not None and neg != prev_neg:
            zc += 1
        prev_neg = neg
    return [float(len(samples)), float(energy), float(zc), float(peak)]


# Goertzel coefficient for DFT bin k=4 of an N=30-sample frame:
# 2*cos(2*pi*4/30), written as the exact double literal both engines
# parse identically (full-precision repr).
GOERTZEL_COEFF = 1.3382612127177165


def wav_goertzel_power(payload: bytes) -> float:
    """Single-bin DFT energy via the Goertzel recurrence
    s_n = x_n + C*s_{n-1} - s_{n-2}; power = s1^2 + s2^2 - C*s1*s2 —
    the classic tone detector (DTMF/pilot-tone checks in audio
    curation).  Pure IEEE double ops in a fixed order, so the DuckDB
    oracle's list_reduce replay is bit-identical."""
    _rate, samples = decode_wav(payload)
    s1 = 0.0  # s_{n-1}
    s2 = 0.0  # s_{n-2}
    for x in samples:
        s0 = float(x) + GOERTZEL_COEFF * s1 - s2
        s2 = s1
        s1 = s0
    return s1 * s1 + s2 * s2 - GOERTZEL_COEFF * s1 * s2
