"""Batched device decoder tests: roundtrips against our encoder and
cross-decode of libFLAC-produced streams."""

import subprocess

import numpy as np
import pytest

from flac_tpu import EncoderConfig, encode_file_to_flac
from flac_tpu.container import write_wav
from flac_tpu.decoder import decode_stream_tpu
from flac_tpu.ref_decoder import FlacDecodeError
from tests.conftest import make_test_signal


@pytest.mark.parametrize("preset", [0, 5, 8])
def test_device_decoder_roundtrip(preset):
    pcm = make_test_signal(4096 * 2 + 999)
    data = encode_file_to_flac(pcm, EncoderConfig.from_preset(preset),
                               batch_frames=4)
    st = decode_stream_tpu(data)
    assert np.array_equal(st.samples, pcm)


def test_device_decoder_mono():
    pcm = make_test_signal(8192, channels=1)
    data = encode_file_to_flac(
        pcm, EncoderConfig.from_preset(5, channels=1), batch_frames=2)
    st = decode_stream_tpu(data)
    assert np.array_equal(st.samples, pcm)


def test_device_decoder_wasted_and_const():
    pcm = make_test_signal(12000) & ~np.int32(0x7)
    pcm[:, :4096] = 777  # constant first frame
    data = encode_file_to_flac(pcm, EncoderConfig.from_preset(5),
                               batch_frames=2)
    st = decode_stream_tpu(data)
    assert np.array_equal(st.samples, pcm)


def test_decode_libflac_stream(oracle_flac, tmp_path):
    """Decode a stream produced by the reference encoder (different
    parameter choices than ours)."""
    pcm = make_test_signal(44100)
    wav = tmp_path / "in.wav"
    wav.write_bytes(write_wav(pcm, 44100, 16))
    ref = tmp_path / "ref.flac"
    for preset in ("-3", "-8"):
        r = subprocess.run([oracle_flac, "-f", "-s", preset, "-o", str(ref),
                            str(wav)], capture_output=True)
        assert r.returncode == 0
        st = decode_stream_tpu(ref.read_bytes())
        assert np.array_equal(st.samples, pcm)


def test_decode_corrupt_crc16():
    pcm = make_test_signal(8192)
    data = bytearray(encode_file_to_flac(pcm, EncoderConfig.from_preset(5),
                                         batch_frames=2))
    # flip a bit in the last frame's payload
    data[-40] ^= 0x10
    with pytest.raises(FlacDecodeError):
        decode_stream_tpu(bytes(data))
