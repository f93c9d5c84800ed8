"""Dependency-free media codecs: real BMP and WAV decode in pure numpy.

These retire the media-decode stub for the two container formats whose
byte layout is simple enough to parse without external libraries (the
sandbox has no PIL/PyAV — SURVEY.md environment facts). The decoders are
REAL: they honor the published container layouts (BITMAPINFOHEADER
bottom-up rows, BGR channel order, 4-byte row padding; RIFF chunk walk
with word alignment), so a malformed file or an unsupported variant fails
loudly instead of producing wrong pixels/samples.

Everything downstream stays SQL-reproducible: the featurizers emit exact
small-integer statistics (16-bin histograms + a position-weighted checksum
folded mod 2^24 so every value is float32-exact), which the DuckDB gate
oracle recomputes from the same generative pixel/sample formulas — a
decode bug (dropped padding, BGR/RGB swap, row-flip miss) shifts values
or positions and flips the gate.

Scale notes: decode runs inside the Arrow batch of ``extract_features``
(scan stage — payloads never shuffle); per-batch memory is the decoded
frame, bounded by the caller's ``arrow.maxRecordsPerBatch`` setting.
"""

from __future__ import annotations

import struct

import numpy as np

# -- BMP (Windows DIB, 24-bit uncompressed) --------------------------------

_BMP_FILE_HDR = 14
_BMP_INFO_HDR = 40


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB, row-major top-down -> 24-bit BMP bytes
    (BITMAPINFOHEADER, bottom-up rows, BGR, rows padded to 4 bytes)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_bmp expects (H, W, 3) uint8 RGB")
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    data_size = stride * h
    off = _BMP_FILE_HDR + _BMP_INFO_HDR
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    return (struct.pack("<2sIHHI", b"BM", off + data_size, 0, 0, off)
            + struct.pack("<IiiHHIIiiII", _BMP_INFO_HDR, w, h, 1, 24,
                          0, data_size, 2835, 2835, 0, 0)
            + rows.tobytes())


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes -> (H, W, 3) uint8 RGB, row-major
    top-down. Handles bottom-up (positive height, the standard) and
    top-down (negative height) files and any BITMAPINFOHEADER-or-later
    header size; rejects other bit depths / compressions loudly."""
    if len(payload) < _BMP_FILE_HDR + _BMP_INFO_HDR:
        raise ValueError("bmp: truncated header")
    magic, _fsize, _r1, _r2, off = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM":
        raise ValueError("bmp: bad magic (not a BMP file)")
    hdr_size, w, h_signed = struct.unpack_from("<Iii", payload, _BMP_FILE_HDR)
    if hdr_size < _BMP_INFO_HDR:
        raise ValueError(f"bmp: unsupported header size {hdr_size} "
                         "(BITMAPCOREHEADER not supported)")
    planes, bpp = struct.unpack_from("<HH", payload, _BMP_FILE_HDR + 12)
    (compression,) = struct.unpack_from("<I", payload, _BMP_FILE_HDR + 16)
    if planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(f"bmp: only 24-bit uncompressed supported "
                         f"(got bpp={bpp}, compression={compression})")
    top_down = h_signed < 0
    h = -h_signed if top_down else h_signed
    if w <= 0 or h <= 0:
        raise ValueError(f"bmp: bad dimensions {w}x{h_signed}")
    stride = (w * 3 + 3) & ~3
    if len(payload) < off + stride * h:
        raise ValueError("bmp: truncated pixel data")
    rows = np.frombuffer(payload, dtype=np.uint8,
                         count=stride * h, offset=off).reshape(h, stride)
    img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return np.ascontiguousarray(img if top_down else img[::-1])


# -- WAV (RIFF, 16-bit PCM) -------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 mono samples -> RIFF/WAVE bytes (fmt PCM 16-bit + data)."""
    s = np.asarray(samples, dtype="<i2")
    data = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> "tuple[np.ndarray, int]":
    """RIFF/WAVE bytes -> (int16 mono sample array, sample_rate). Walks the
    chunk list (skipping unknown chunks with RIFF word alignment), so files
    with LIST/INFO metadata between fmt and data decode correctly; rejects
    non-PCM / non-16-bit / multi-channel loudly."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("wav: not a RIFF/WAVE file")
    pos, end = 12, min(len(payload), 8 + struct.unpack_from("<I", payload, 4)[0])
    n_channels = bits = sample_rate = None
    data = None
    while pos + 8 <= end:
        cid = payload[pos:pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        if pos + 8 + clen > len(payload):
            # a chunk whose declared length runs past the bytes present is
            # a cut file: slicing would SILENTLY shorten the sample stream
            # (slice clamps), so fail loudly like decode_bmp's stride check
            raise ValueError(
                f"wav: truncated {cid!r} chunk (declares {clen} bytes, "
                f"{len(payload) - pos - 8} present)")
        body = payload[pos + 8: pos + 8 + clen]
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("wav: truncated fmt chunk")
            audio_fmt, n_channels, sample_rate, _, _, bits = \
                struct.unpack_from("<HHIIHH", body, 0)
            if audio_fmt != 1:
                raise ValueError(f"wav: only PCM supported (fmt={audio_fmt})")
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if n_channels is None or data is None:
        raise ValueError("wav: missing fmt or data chunk")
    if n_channels != 1 or bits != 16:
        raise ValueError(f"wav: only 16-bit mono supported "
                         f"(channels={n_channels}, bits={bits})")
    if len(data) % 2:
        raise ValueError("wav: odd data chunk length for 16-bit samples")
    return np.frombuffer(data, dtype="<i2"), int(sample_rate)


# -- featurizers ------------------------------------------------------------

_WS_MOD = 1 << 24  # position-weighted checksums stay float32-exact


def _hist_feature(values: np.ndarray, shift: int) -> np.ndarray:
    """16-bin histogram of ``values >> shift`` + [n, weighted checksum]:
    ws = sum((i % 97 + 1) * v_i) mod 2^24 over the DECODED flat order, so
    any positional decode error (row flip, padding leak, channel swap)
    flips the gate even though the histogram is order-invariant."""
    v = values.astype(np.int64)
    bins = np.bincount(v >> shift, minlength=16).astype(np.float32)
    idx = np.arange(len(v), dtype=np.int64)
    ws = int(((idx % 97 + 1) * v).sum() % _WS_MOD)
    return np.concatenate([bins[:16],
                           np.array([len(v), ws], dtype=np.float32)])


def bmp_feature(payload: bytes) -> np.ndarray:
    """Real BMP decode -> 18-float feature: 16-bin histogram of channel
    bytes (>> 4), channel-byte count, positional checksum over the decoded
    row-major RGB order."""
    return _hist_feature(decode_bmp(payload).reshape(-1), 4)


def wav_feature(payload: bytes) -> np.ndarray:
    """Real WAV decode -> 18-float feature: 16-bin histogram of unsigned
    sample amplitude ((s + 32768) >> 12), sample count, positional
    checksum over (s + 32768)."""
    samples, _ = decode_wav(payload)
    return _hist_feature(samples.astype(np.int64) + 32768, 12)


DECODABLE_TYPES = {"image/bmp": bmp_feature, "audio/wav": wav_feature}


def format_decoder(payload: bytes, media_type: str) -> np.ndarray:
    """Dispatch a REAL format decode by media_type; unsupported container
    types keep the honest loud stub (no media libs in this environment)."""
    fn = DECODABLE_TYPES.get(media_type)
    if fn is None:
        raise NotImplementedError(
            f"no decoder for media_type={media_type!r} in this environment "
            f"(real decoders: {sorted(DECODABLE_TYPES)}); pass decoder= "
            "(e.g. a PIL/torchaudio-backed callable) for other formats")
    return fn(payload)
