"""Encode -> decode roundtrip tests: bit-exactness across signal types and
configurations (the analogue of test/test_streams.sh's generated-signal
matrix in the reference)."""

import io

import numpy as np
import pytest

from flac_tpu import EncoderConfig, encode_file_to_flac
from flac_tpu.ref_decoder import decode_stream
from tests.conftest import make_test_signal


def roundtrip(pcm, cfg, **kw):
    data = encode_file_to_flac(pcm, cfg, **kw)
    st = decode_stream(data)
    assert np.array_equal(st.samples, pcm), "PCM mismatch after roundtrip"
    return data, st


@pytest.mark.parametrize("preset", [0, 2, 5, 8])
def test_presets_roundtrip(preset):
    pcm = make_test_signal(4096 * 2 + 777)
    cfg = EncoderConfig.from_preset(preset)
    data, st = roundtrip(pcm, cfg, batch_frames=4)
    assert len(data) < pcm.nbytes // 2  # compresses at all


@pytest.mark.smoke
def test_silence():
    pcm = np.zeros((2, 10000), np.int32)
    cfg = EncoderConfig.from_preset(5)
    data, st = roundtrip(pcm, cfg, batch_frames=4)
    # constant subframes throughout
    assert all(s["type"] == "CONSTANT"
               for f in st.frames for s in f["subframes"])


def test_dc_offset_constant():
    pcm = np.full((2, 8192), -12345, np.int32)
    roundtrip(pcm, EncoderConfig.from_preset(5), batch_frames=2)


def test_full_scale_noise_verbatim_fallback():
    rng = np.random.default_rng(7)
    pcm = rng.integers(-32768, 32768, (2, 8192)).astype(np.int32)
    data, st = roundtrip(pcm, EncoderConfig.from_preset(5), batch_frames=2)


@pytest.mark.smoke
def test_wasted_bits_signal():
    pcm = make_test_signal(8192) & ~np.int32(0xF)  # 4 wasted bits
    data, st = roundtrip(pcm, EncoderConfig.from_preset(5), batch_frames=2)
    assert any(s["wasted"] >= 4 for f in st.frames for s in f["subframes"])


@pytest.mark.smoke
def test_mono():
    pcm = make_test_signal(8192, channels=1)
    roundtrip(pcm, EncoderConfig.from_preset(5, channels=1), batch_frames=2)


@pytest.mark.parametrize("channels", [3, 6, 8])
def test_multichannel(channels):
    pcm = make_test_signal(4096, channels=channels)
    roundtrip(pcm, EncoderConfig.from_preset(5, channels=channels),
              batch_frames=1)


def test_8bit():
    pcm = (make_test_signal(8192) >> 8).astype(np.int32)
    roundtrip(pcm, EncoderConfig.from_preset(5, bits_per_sample=8),
              batch_frames=2)


def test_hard_pan_left_side():
    """Signal only in the left channel favors left/side coding."""
    pcm = make_test_signal(8192)
    pcm[1] = 0
    data, st = roundtrip(pcm, EncoderConfig.from_preset(5), batch_frames=2)


def test_tiny_blocksize():
    pcm = make_test_signal(1000)
    cfg = EncoderConfig.from_preset(5, blocksize=192)
    roundtrip(pcm, cfg, batch_frames=3)


def test_odd_blocksize():
    """Non-power-of-two blocksize limits partition orders via divisibility."""
    pcm = make_test_signal(3000)
    cfg = EncoderConfig.from_preset(5, blocksize=1152)
    roundtrip(pcm, cfg, batch_frames=2)


def test_exact_multiple_of_blocksize():
    """Stream length an exact multiple of blocksize (overread edge)."""
    pcm = make_test_signal(4096 * 2)
    roundtrip(pcm, EncoderConfig.from_preset(5), batch_frames=2)


def test_single_sample_tail():
    pcm = make_test_signal(4096 + 1)
    roundtrip(pcm, EncoderConfig.from_preset(5), batch_frames=2)


def test_streaminfo_fields():
    pcm = make_test_signal(44100)
    cfg = EncoderConfig.from_preset(5)
    data, st = roundtrip(pcm, cfg, batch_frames=8)
    assert st.sample_rate == 44100
    assert st.channels == 2
    assert st.bits_per_sample == 16
    assert st.total_samples == 44100
    assert st.min_blocksize == st.max_blocksize == 4096
