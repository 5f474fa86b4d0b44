"""Decoder error tolerance (stream_decoder.c resilience semantics /
`flac -F`): ID3v2 skip, mid-stream start, CRC resync + silence
concealment, missing-frame gaps, no-STREAMINFO streams."""

import subprocess

import numpy as np
import pytest

from flac_tpu import EncoderConfig, encode_file_to_flac
from flac_tpu.container import read_wav
from flac_tpu.decoder import (FlacDecodeError, decode_stream_tpu,
                              skip_id3v2)
from tests.conftest import make_test_signal

N = 1024


@pytest.fixture(scope="module")
def stream():
    pcm = make_test_signal(N * 12)
    cfg = EncoderConfig.from_preset(3, blocksize=N)
    return pcm, encode_file_to_flac(pcm, cfg, batch_frames=4)


def _frame_offsets(data):
    st = decode_stream_tpu(data, verify_md5=False)
    return st, [(f["offset"], f["size"]) for f in st.frames]


def test_id3v2_skip(stream):
    pcm, data = stream
    size = 500
    tag = (b"ID3\x04\x00\x00"
           + bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                    (size >> 7) & 0x7F, size & 0x7F])
           + b"\xff" * size)        # junk payload incl. fake sync bytes
    assert skip_id3v2(tag + data) == 10 + size
    st = decode_stream_tpu(tag + data)
    assert np.array_equal(st.samples, pcm)
    st2 = decode_stream_tpu(tag + data, tolerant=True)
    assert np.array_equal(st2.samples, pcm)


def test_crc_error_strict_raises_tolerant_conceals(stream):
    pcm, data = stream
    st, offs = _frame_offsets(data)
    # flip a bit inside the 3rd frame's residual payload
    off, size = offs[2]
    bad = bytearray(data)
    bad[off + size // 2] ^= 0x10
    bad = bytes(bad)
    with pytest.raises(FlacDecodeError, match="CRC16|MD5"):
        decode_stream_tpu(bad)
    st2 = decode_stream_tpu(bad, tolerant=True)
    assert st2.samples.shape == pcm.shape
    assert ("FRAME_CRC_MISMATCH", 2) in st2.errors
    assert not st2.md5_ok
    # the corrupt frame is silence, every other sample is intact
    assert np.all(st2.samples[:, 2 * N:3 * N] == 0)
    mask = np.ones(pcm.shape[1], bool)
    mask[2 * N:3 * N] = False
    assert np.array_equal(st2.samples[:, mask], pcm[:, mask])


def test_missing_frame_silence(stream):
    pcm, data = stream
    st, offs = _frame_offsets(data)
    # splice out frame 4 entirely (simulates a lost packet)
    off, size = offs[4]
    cut = data[:off] + data[off + size:]
    st2 = decode_stream_tpu(cut, tolerant=True)
    assert any(e[0] == "MISSING_FRAME" for e in st2.errors)
    assert st2.samples.shape == pcm.shape
    assert np.all(st2.samples[:, 4 * N:5 * N] == 0)
    mask = np.ones(pcm.shape[1], bool)
    mask[4 * N:5 * N] = False
    assert np.array_equal(st2.samples[:, mask], pcm[:, mask])


def test_midstream_start(stream):
    """A stream whose head (metadata + first frames) is gone must still
    decode from the first intact frame (drops the round-1 expected==0
    rule)."""
    pcm, data = stream
    st, offs = _frame_offsets(data)
    tail = data[offs[3][0]:]          # frames 3.. with no fLaC marker
    st2 = decode_stream_tpu(tail, tolerant=True)
    assert st2.sample_rate == 44100 and st2.bits_per_sample == 16
    assert np.array_equal(st2.samples, pcm[:, 3 * N:])


def test_no_streaminfo(stream):
    """fLaC marker present but metadata stripped entirely -> tolerant
    decode bootstraps parameters from frame headers
    (stream_decoder.c:2712-2718)."""
    pcm, data = stream
    st, offs = _frame_offsets(data)
    frames_only = data[offs[0][0]:]
    st2 = decode_stream_tpu(frames_only, tolerant=True)
    assert np.array_equal(st2.samples, pcm)


def test_oracle_flac_F_agreement(stream, oracle_flac, tmp_path):
    """Our concealment matches `flac -F` sample count and intact regions."""
    pcm, data = stream
    st, offs = _frame_offsets(data)
    off, size = offs[5]
    bad = bytearray(data)
    bad[off + size // 2] ^= 0x40
    p = tmp_path / "bad.flac"
    p.write_bytes(bytes(bad))
    out = tmp_path / "out.wav"
    r = subprocess.run([oracle_flac, "-d", "-F", "-s", "-f",
                        "-o", str(out), str(p)], capture_output=True)
    assert r.returncode == 0
    ref = read_wav(out.read_bytes()).samples
    ours = decode_stream_tpu(bytes(bad), tolerant=True).samples
    assert ours.shape == ref.shape
    # outside the concealed frame both must equal the source exactly
    mask = np.ones(pcm.shape[1], bool)
    mask[5 * N:6 * N] = False
    assert np.array_equal(ref[:, mask], pcm[:, mask])
    assert np.array_equal(ours[:, mask], pcm[:, mask])
    # inside it, ours is silence (the reference may emit silence or the
    # corrupt frame's samples depending on where decode failed)
    assert np.all(ours[:, 5 * N:6 * N] == 0)
