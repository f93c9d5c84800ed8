"""Pure-numpy BMP/WAV codecs: round-trips, layout faithfulness (padding,
bottom-up rows, BGR order, chunk walking), loud failures on unsupported
variants, and the featurizer arithmetic the gate oracle recomputes."""

import struct

import numpy as np
import pytest

from grenier_spark.operators.media_codecs import (bmp_feature, decode_bmp,
                                                  decode_wav, encode_bmp,
                                                  encode_wav, format_decoder,
                                                  wav_feature)


def _img(h, w, seed=0):
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("h,w", [(1, 1), (3, 5), (7, 4), (5, 7), (16, 16)])
def test_bmp_roundtrip_all_padding_residues(h, w):
    # w covers every (3*w) % 4 residue, so row padding is really exercised
    px = _img(h, w, seed=h * 100 + w)
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)


def test_bmp_layout_is_real_bottom_up_bgr_padded():
    """The encoder must write the published DIB layout — checked byte-for-
    byte so decode/encode can't agree on a private wrong layout."""
    px = np.zeros((2, 3, 3), dtype=np.uint8)
    px[0, 0] = [255, 0, 0]    # top-left RED
    px[1, 2] = [0, 0, 255]    # bottom-right BLUE
    raw = encode_bmp(px)
    assert raw[:2] == b"BM"
    off = struct.unpack_from("<I", raw, 10)[0]
    assert off == 54
    stride = (3 * 3 + 3) & ~3  # 12: 9 pixel bytes + 3 pad
    # first stored row is the BOTTOM image row; channel order is BGR
    bottom = raw[off: off + stride]
    assert bottom[6:9] == bytes([255, 0, 0])  # blue pixel -> B=255 first
    top = raw[off + stride: off + 2 * stride]
    assert top[0:3] == bytes([0, 0, 255])     # red pixel -> R last
    assert bottom[9:12] == b"\x00\x00\x00"    # padding present


def test_bmp_top_down_negative_height_decodes():
    px = _img(4, 5, seed=7)
    raw = bytearray(encode_bmp(px[::-1]))  # encode flipped...
    struct.pack_into("<i", raw, 22, -4)    # ...then mark top-down
    assert np.array_equal(decode_bmp(bytes(raw)), px[::-1][::-1])


def test_bmp_rejects_bad_inputs():
    px = _img(3, 3)
    raw = encode_bmp(px)
    with pytest.raises(ValueError, match="magic"):
        decode_bmp(b"XX" + raw[2:])
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(raw[:-5])
    bad_bpp = bytearray(raw)
    struct.pack_into("<H", bad_bpp, 28, 8)
    with pytest.raises(ValueError, match="24-bit"):
        decode_bmp(bytes(bad_bpp))
    with pytest.raises(ValueError, match="truncated header"):
        decode_bmp(b"BM")


def test_wav_roundtrip_and_header():
    s = (np.arange(-300, 300, 7)).astype(np.int16)
    raw = encode_wav(s, sample_rate=22050)
    assert raw[:4] == b"RIFF" and raw[8:12] == b"WAVE"
    got, sr = decode_wav(raw)
    assert sr == 22050 and np.array_equal(got, s)


def test_wav_chunk_walk_skips_metadata_with_word_alignment():
    """A LIST chunk with ODD length between fmt and data must be skipped
    with RIFF word alignment — a naive walker desyncs and misses data."""
    s = np.array([1, -2, 3], dtype=np.int16)
    raw = encode_wav(s)
    fmt_end = 12 + 8 + 16
    meta = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # pad byte
    patched = bytearray(raw[:fmt_end] + meta + raw[fmt_end:])
    struct.pack_into("<I", patched, 4, len(patched) - 8)
    got, sr = decode_wav(bytes(patched))
    assert np.array_equal(got, s) and sr == 16000


def test_wav_rejects_bad_inputs():
    s = np.zeros(4, dtype=np.int16)
    raw = encode_wav(s)
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"JUNK" + raw[4:])
    stereo = bytearray(raw)
    struct.pack_into("<H", stereo, 12 + 8 + 2, 2)
    with pytest.raises(ValueError, match="mono"):
        decode_wav(bytes(stereo))
    nonpcm = bytearray(raw)
    struct.pack_into("<H", nonpcm, 12 + 8, 3)
    with pytest.raises(ValueError, match="PCM"):
        decode_wav(bytes(nonpcm))
    # a file cut mid-data must fail LOUDLY, not silently return fewer
    # samples (the chunk still declares its full length)
    with pytest.raises(ValueError, match="truncated b'data'"):
        decode_wav(raw[:-2])
    # a fmt chunk whose declared length runs past the bytes present must
    # raise ValueError too (not struct.error escaping the contract)
    with pytest.raises(ValueError, match="truncated b'fmt '"):
        decode_wav(raw[:12 + 8 + 10])


def test_features_match_hand_arithmetic():
    """The featurizer numbers ARE the gate-oracle formulas: 16 bins, count,
    positional checksum mod 2^24 over decoded order."""
    h, w = 3, 5
    vals = (np.arange(h * w * 3, dtype=np.int64) * 11 + 37) % 256
    px = vals.astype(np.uint8).reshape(h, w, 3)
    f = bmp_feature(encode_bmp(px))
    assert len(f) == 18
    assert np.array_equal(f[:16], np.bincount(vals >> 4, minlength=16))
    assert f[16] == h * w * 3
    idx = np.arange(len(vals))
    assert f[17] == ((idx % 97 + 1) * vals).sum() % (1 << 24)

    s = (((np.arange(96, dtype=np.int64) * 17 + 131) % 65536) - 32768)
    g = wav_feature(encode_wav(s.astype(np.int16)))
    u = s + 32768
    assert np.array_equal(g[:16], np.bincount(u >> 12, minlength=16))
    assert g[16] == 96
    assert g[17] == ((np.arange(96) % 97 + 1) * u).sum() % (1 << 24)


def test_positional_checksum_catches_layout_bugs():
    """A row-flip or channel-swap decode bug preserves the histogram but
    MUST flip the checksum — that's the whole point of the ws term."""
    px = _img(4, 5, seed=3)
    ok = bmp_feature(encode_bmp(px))
    flipped = bmp_feature(encode_bmp(px[::-1]))
    swapped = bmp_feature(encode_bmp(px[:, :, ::-1]))
    assert np.array_equal(ok[:16], flipped[:16])
    assert ok[17] != flipped[17]
    assert ok[17] != swapped[17]


def test_format_decoder_dispatch_and_loud_stub():
    px = _img(2, 2)
    assert np.array_equal(format_decoder(encode_bmp(px), "image/bmp"),
                          bmp_feature(encode_bmp(px)))
    with pytest.raises(NotImplementedError, match="video/mp4"):
        format_decoder(b"\x00", "video/mp4")
