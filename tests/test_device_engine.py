"""Device Rice-decode engine (engine="device"): host tile scan
(ft_tile_scan) + on-chip segment-driven Rice decode fused with restore
(ops/bitunpack.py), cross-checked against the source PCM and the host
engine on every subframe type, width, and layout the format allows.

Reference behavior mirrored: bitreader.c:834 read_rice_signed_block /
deduplication/bitreader_read_rice_signed_block.c (clz unary + k-bit
tail), stream_decoder.c:3050-3352 subframe/residual readers.
"""

import numpy as np
import pytest

from flac_tpu import EncoderConfig
from flac_tpu.decoder import decode_stream_tpu
from flac_tpu.encoder import encode_file_to_flac
from flac_tpu import native

pytestmark = pytest.mark.skipif(not native.AVAILABLE,
                                reason="native runtime unavailable")

_RNG = np.random.default_rng(11)


def _check(pcm, bps, label, preset=8, **cfg_kw):
    cfg = EncoderConfig.from_preset(
        preset, bits_per_sample=bps, channels=pcm.shape[0],
        **cfg_kw).resolve()
    stream = encode_file_to_flac(pcm, cfg)
    dev = decode_stream_tpu(stream, engine="device")
    assert np.array_equal(dev.samples, pcm), f"{label}: device != source"
    assert dev.md5_ok, label
    host = decode_stream_tpu(stream, engine="host")
    assert np.array_equal(host.samples, dev.samples), \
        f"{label}: device != host"


def _tone(n, scale):
    t = np.arange(n) / 44100.0
    return np.sin(2 * np.pi * 440.0 * t) * scale


def test_device_engine_16bit_stereo_partial_tail():
    n = 4096 * 4 + 1234          # partial last frame exercises tile pad
    p = np.round(_tone(n, 12000) + 300 * _RNG.standard_normal(n))
    pcm = np.stack([p, np.roll(p, 5)]).astype(np.int32)
    _check(pcm, 16, "16-bit stereo")


def test_device_engine_wasted_bits():
    n = 4096 * 3
    p = (np.round(_tone(n, 120)) * 256).astype(np.int32)
    _check(np.stack([p, -p]), 16, "wasted bits")


def test_device_engine_24bit():
    n = 4096 * 3 + 100
    p = np.round(_tone(n, 1 << 22) + 1000 * _RNG.standard_normal(n))
    pcm = np.stack([p, np.roll(p, 7)]).astype(np.int32)
    _check(pcm, 24, "24-bit")


def test_device_engine_32bit_wide_side():
    n = 4096 * 2
    p = np.clip(np.round(_tone(n, 1 << 30)
                         + (1 << 20) * _RNG.standard_normal(n)),
                -(1 << 31), (1 << 31) - 1)
    pcm = np.stack([p, np.roll(p, 3)]).astype(np.int32)
    _check(pcm, 32, "32-bit wide", streamable_subset=False)


def test_device_engine_mono_8bit():
    n = 4096 * 2
    pcm = np.round(_tone(n, 100)).astype(np.int32)[None, :]
    _check(pcm, 8, "8-bit mono")


def test_device_engine_noise_escapes():
    # noise drives high Rice parameters / escape partitions, and
    # verbatim-ish subframes at preset 0
    pcm = _RNG.integers(-30000, 30000, (2, 4096 * 2 + 77),
                        np.int64).astype(np.int32)
    _check(pcm, 16, "noise -8")
    _check(pcm, 16, "noise -0", preset=0)


@pytest.mark.smoke
def test_device_engine_small_blocksize():
    n = 700
    p = np.round(_tone(n, 5000)).astype(np.int32)
    _check(np.stack([p, p]), 16, "bs=192", blocksize=192)


def test_device_engine_constant_and_silence():
    pcm = np.zeros((2, 4096 * 2), np.int32)
    pcm[:, 4096:] = 777          # constant subframes both ways
    _check(pcm, 16, "constant")


def test_device_engine_multichannel():
    n = 4096 * 2
    base = _tone(n, 3000)
    pcm = np.stack([np.round(base * s).astype(np.int32)
                    for s in (1, 2, 3, -1, -2, 0.5)])
    _check(pcm, 16, "6-channel")


def test_device_engine_crc_error_detected():
    n = 4096 * 4
    p = np.round(_tone(n, 12000)).astype(np.int32)
    pcm = np.stack([p, p])
    cfg = EncoderConfig.from_preset(5, bits_per_sample=16,
                                    channels=2).resolve()
    stream = bytearray(encode_file_to_flac(pcm, cfg))
    from flac_tpu.ref_decoder import FlacDecodeError, parse_metadata
    from flac_tpu.decoder import scan_frames
    st, pos = parse_metadata(bytes(stream), 4)
    frames = scan_frames(bytes(stream), st, pos)
    mid = frames[2]["offset"] + frames[2]["size"] // 2
    stream[mid] ^= 0x10
    with pytest.raises(FlacDecodeError, match="CRC16|MD5|lost sync"):
        decode_stream_tpu(bytes(stream), engine="device")
