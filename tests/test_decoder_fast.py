"""Fast-decoder tier: native parse + device restore vs the all-device
scan decoder (oracle), host path, wide (32-bit) path, and strict-mode
false-sync repair (stream_decoder.c:2443-2480 analogue)."""

import numpy as np
import pytest

from flac_tpu import EncoderConfig
from flac_tpu import format as fmt
from flac_tpu.decoder import (decode_frame_list, decode_stream_tpu,
                              parse_metadata, scan_frames)
from flac_tpu.encoder import encode_file_to_flac
from flac_tpu.ops.crc import crc8
from flac_tpu.ref_decoder import FlacDecodeError
from flac_tpu.utils.bits import BitWriter

from conftest import make_test_signal

pytestmark = pytest.mark.skipif(
    not __import__("flac_tpu.native", fromlist=["AVAILABLE"]).AVAILABLE,
    reason="native library unavailable")


def _mixed_stream():
    """Stream exercising const + verbatim-ish + fixed + lpc + wasted."""
    pcm = make_test_signal(4096 * 3 + 1000)
    pcm[:, :2048] = -5                      # constant region
    pcm[:, 2048:4096] &= ~np.int32(0xF)     # wasted bits
    return pcm, encode_file_to_flac(pcm, EncoderConfig.from_preset(8),
                                    batch_frames=4)


def test_engines_agree_bitexact():
    pcm, data = _mixed_stream()
    st0, pos = parse_metadata(data, 4)
    frames = scan_frames(data, st0, pos)
    outs = {}
    for engine in ("fast", "host", "scan"):
        res = decode_frame_list(data, st0, frames, engine=engine)
        outs[engine] = np.concatenate(res, axis=1)
    np.testing.assert_array_equal(outs["fast"], outs["scan"])
    np.testing.assert_array_equal(outs["host"], outs["scan"])
    np.testing.assert_array_equal(outs["fast"][:, :pcm.shape[1]], pcm)


def test_fast_decode_preset0_fixed():
    """Preset 0 produces fixed predictors — the taps-normalized path."""
    pcm = make_test_signal(4096 * 2)
    data = encode_file_to_flac(pcm, EncoderConfig.from_preset(0),
                               batch_frames=2)
    st = decode_stream_tpu(data, engine="fast")
    assert np.array_equal(st.samples, pcm)
    st = decode_stream_tpu(data, engine="host")
    assert np.array_equal(st.samples, pcm)


def test_fast_decode_wide_32bit():
    """bps=32 mid/side produces 33-bit side subframes: the int64 wide
    restore path (stream_encoder.c 33-bit side; lpc.c wide restore)."""
    rng = np.random.default_rng(7)
    n = 4096 * 2
    base = (rng.normal(0, 2 ** 27, n)).astype(np.int64)
    left = np.clip(base, -2**31, 2**31 - 1).astype(np.int64)
    right = np.clip(base + rng.normal(0, 2 ** 24, n).astype(np.int64),
                    -2**31, 2**31 - 1)
    pcm = np.stack([left, right]).astype(np.int32)
    cfg = EncoderConfig.from_preset(5, bits_per_sample=32)
    data = encode_file_to_flac(pcm, cfg, batch_frames=2)
    st = decode_stream_tpu(data, engine="fast")
    assert np.array_equal(st.samples, pcm)
    st = decode_stream_tpu(data, engine="host")
    assert np.array_equal(st.samples, pcm)


def _const_frame(bw_number, value, N):
    """One mono 16-bit constant-subframe frame at blocksize N=192."""
    bw = BitWriter()
    bw.write(0b11111111111110, 14)
    bw.write(0, 2)                   # reserved + fixed blocksize
    bw.write(1, 4)                   # blocksize code 1 = 192
    bw.write(9, 4)                   # sample rate code 9 = 44100
    bw.write(0, 4)                   # channels: 1
    bw.write(0b100, 3)               # bps 16
    bw.write(0, 1)
    bw.write(bw_number, 8)           # UTF-8 number (< 128)
    head = bw.getvalue()
    bw.write(crc8(head), 8)
    bw.write(0x00, 8)                # subframe: constant
    bw.write(value & 0xFFFF, 16)
    bw.pad_to_byte()
    from flac_tpu.ops.crc import crc16
    body = bw.getvalue()
    bw.write(crc16(body), 16)
    return bw.getvalue()


def test_false_sync_repair_strict():
    """A verbatim payload that contains a byte pattern scanning as a
    valid next-numbered frame header must still decode in strict mode:
    the repair pass re-finds the true frame extent by decode+CRC16."""
    N = 192
    # fake "frame 1" header bytes to embed: FF F8 <bs|sr> <ch|bps> 01 crc8
    fake = bytes([0xFF, 0xF8, 0x19, 0x08, 0x01])
    fake += bytes([crc8(fake)])
    rng = np.random.default_rng(3)
    samples = rng.integers(-30000, 30000, N).astype(np.int64)
    # plant the fake header at samples 16..18 (byte-aligned in verbatim)
    for j in range(3):
        v = (fake[2 * j] << 8) | fake[2 * j + 1]
        samples[16 + j] = v - 65536 if v >= 32768 else v

    bw = BitWriter()
    bw.write(0b11111111111110, 14)
    bw.write(0, 2)
    bw.write(1, 4)                   # blocksize 192
    bw.write(9, 4)                   # 44100
    bw.write(0, 4)                   # mono
    bw.write(0b100, 3)               # bps 16
    bw.write(0, 1)
    bw.write(0, 8)                   # frame number 0
    head = bw.getvalue()
    bw.write(crc8(head), 8)
    bw.write(0x02, 8)                # verbatim subframe
    for s in samples:
        bw.write(int(s) & 0xFFFF, 16)
    bw.pad_to_byte()
    from flac_tpu.ops.crc import crc16
    body = bw.getvalue()
    bw.write(crc16(body), 16)
    frame0 = bw.getvalue()

    si = BitWriter()
    si.write(N, 16); si.write(N, 16)
    si.write(0, 24); si.write(0, 24)
    si.write(44100, 20); si.write(0, 3); si.write(15, 5)
    si.write(3 * N, 36)
    si.write_bytes(b"\x00" * 16)
    streaminfo = si.getvalue()
    hdr = (1 << 31) | (fmt.METADATA_TYPE_STREAMINFO << 24) | len(streaminfo)
    stream = (fmt.STREAM_SYNC_STRING + hdr.to_bytes(4, "big") + streaminfo
              + frame0 + _const_frame(1, 100, N) + _const_frame(2, -7, N))

    # the scan must actually be fooled (otherwise the test tests nothing)
    st0, pos = parse_metadata(stream, 4)
    scanned = scan_frames(stream, st0, pos)
    fake_abs = stream.index(fake)
    assert any(f["offset"] == fake_abs for f in scanned), \
        "fake header was not scanned as a frame — craft is wrong"

    st = decode_stream_tpu(stream, verify_md5=False)
    assert st.samples.shape == (1, 3 * N)
    np.testing.assert_array_equal(st.samples[0, :N], samples)
    assert np.all(st.samples[0, N:2 * N] == 100)
    assert np.all(st.samples[0, 2 * N:] == -7)


def test_corrupt_stays_corrupt_after_repair():
    """Repair must not accept genuinely corrupt frames."""
    pcm = make_test_signal(4096 * 2)
    data = bytearray(encode_file_to_flac(pcm, EncoderConfig.from_preset(5),
                                         batch_frames=2))
    data[-40] ^= 0x10
    with pytest.raises(FlacDecodeError):
        decode_stream_tpu(bytes(data), engine="fast")
