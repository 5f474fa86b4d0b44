"""Strict-decode conformance: first-frame-number != 0 (trimmed streams)
and the decoded-sample bps-range lost-sync check
(stream_decoder.c:2458-2472)."""

import numpy as np
import pytest

from flac_tpu import EncoderConfig
from flac_tpu import format as fmt
from flac_tpu.decoder import decode_stream_tpu, parse_metadata, scan_frames
from flac_tpu.encoder import encode_file_to_flac
from flac_tpu.ref_decoder import FlacDecodeError as RefError
from flac_tpu.utils.bits import BitWriter
from flac_tpu.ops.crc import crc8, crc16

from conftest import make_test_signal


def test_trimmed_stream_decodes_strict():
    """A stream whose first frame number is 3 (e.g. produced by trimming
    with other tools) must decode in STRICT mode; the reference accepts
    any consistent numbering."""
    pcm = make_test_signal(4096 * 5)
    stream = encode_file_to_flac(pcm, EncoderConfig.from_preset(2),
                                 padding=0)
    st0, pos = parse_metadata(stream, 4)
    frames = scan_frames(stream, st0, pos)
    assert len(frames) == 5 and frames[0]["number"] == 0
    trimmed = stream[:pos] + stream[frames[3]["offset"]:]
    st = decode_stream_tpu(trimmed, verify_md5=False)
    np.testing.assert_array_equal(st.samples, pcm[:, 3 * 4096:])


def _overflow_frame_stream() -> bytes:
    """Hand-built mono 8-bit stream whose FIXED order-1 frame integrates
    +100 per sample from warmup 127 — decoded samples leave the 8-bit
    range while every CRC is valid."""
    N = 16
    si = BitWriter()
    si.write(N, 16)          # min/max blocksize
    si.write(N, 16)
    si.write(0, 24)          # min framesize (unknown)
    si.write(0, 24)
    si.write(8000, 20)       # sample rate
    si.write(0, 3)           # channels - 1
    si.write(7, 5)           # bps - 1
    si.write(N, 36)          # total samples
    si.write_bytes(b"\x00" * 16)
    streaminfo = si.getvalue()
    hdr = (1 << 31) | (fmt.METADATA_TYPE_STREAMINFO << 24) \
        | len(streaminfo)

    bw = BitWriter()
    bw.write(0b11111111111110, 14)   # sync
    bw.write(0, 1)                   # reserved
    bw.write(0, 1)                   # fixed blocksize
    bw.write(6, 4)                   # blocksize: 8-bit from end
    bw.write(0, 4)                   # sample rate: from streaminfo
    bw.write(0, 4)                   # channels: 1 (code 0)
    bw.write(0b001, 3)               # bps 8
    bw.write(0, 1)                   # reserved
    bw.write(0, 8)                   # UTF-8 frame number 0
    bw.write(N - 1, 8)               # blocksize tail
    head = bw.getvalue()
    bw.write(crc8(head), 8)
    # subframe: FIXED order 1, no wasted bits (byte = type6<<1 | wflag)
    bw.write(0x10 | (1 << 1), 8)
    bw.write(127, 8)                 # warmup
    bw.write(0, 2)                   # residual method RICE
    bw.write(0, 4)                   # partition order 0
    bw.write(7, 4)                   # rice parameter 7
    for _ in range(N - 1):
        u = 200                      # zigzag(+100)
        bw.write(1, (u >> 7) + 1)    # q zeros + stop bit
        bw.write(u & 127, 7)
    bw.pad_to_byte()
    body = bw.getvalue()
    bw.write(crc16(body), 16)
    frame = bw.getvalue()
    out = fmt.STREAM_SYNC_STRING + hdr.to_bytes(4, "big") + streaminfo \
        + frame
    return out


def test_out_of_range_sample_is_lost_sync_strict():
    from flac_tpu.decoder import FlacDecodeError
    stream = _overflow_frame_stream()
    with pytest.raises((FlacDecodeError, RefError)) as e:
        decode_stream_tpu(stream, verify_md5=False)
    assert "range" in str(e.value) or "lost" in str(e.value).lower()


def test_out_of_range_sample_concealed_tolerant():
    stream = _overflow_frame_stream()
    st = decode_stream_tpu(stream, verify_md5=False, tolerant=True)
    assert any(err[0] in ("LOST_SYNC", "FRAME_CRC_MISMATCH")
               for err in getattr(st, "errors", []))
    # the bad frame is concealed with silence
    assert st.samples.shape[1] >= 16
    assert np.all(st.samples == 0)
