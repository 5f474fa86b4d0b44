"""Hi-res paths: 24-bit and 32-bit encode/decode incl. the 33-bit side
channel (reference: integer_signal_33bit_side stream_encoder.c:152,
side_subframe stream_decoder.c:3250-3293, wide fixed/lpc variants).

Oracle: streams must pass `flac -t` and decode identically via libFLAC.
"""

import io
import subprocess

import numpy as np
import pytest

from tests.conftest import make_test_signal
from flac_tpu.config import EncoderConfig
from flac_tpu.encoder import StreamEncoder, encode_file_to_flac
from flac_tpu.ref_decoder import decode_stream


def _encode(pcm, bps, preset=5, blocksize=4096, rate=96000):
    cfg = EncoderConfig.from_preset(
        preset, sample_rate=rate, channels=pcm.shape[0],
        bits_per_sample=bps, blocksize=blocksize)
    return encode_file_to_flac(pcm, cfg)


def _oracle_check(data, pcm, oracle_flac, tmp_path):
    f = tmp_path / "t.flac"
    f.write_bytes(data)
    subprocess.run([oracle_flac, "-t", "-s", str(f)], check=True)
    # decode via libFLAC to raw and compare
    raw = tmp_path / "t.raw"
    subprocess.run([oracle_flac, "-d", "-f", "-s", "--force-raw-format",
                    "--endian=little", "--sign=signed",
                    "-o", str(raw), str(f)], check=True)
    nb = (decode_stream(data, verify_md5=False).bits_per_sample + 7) // 8
    got = np.frombuffer(raw.read_bytes(), np.uint8).reshape(-1, pcm.shape[0],
                                                            nb)
    acc = np.zeros(got.shape[:2], np.int64)
    for i in range(nb):
        acc |= got[:, :, i].astype(np.int64) << (8 * i)
    sign = 1 << (8 * nb - 1)
    acc = (acc ^ sign) - sign
    np.testing.assert_array_equal(acc.T, pcm)


@pytest.mark.parametrize("preset", [2, 5])
def test_24bit_roundtrip_oracle(oracle_flac, tmp_path, preset):
    pcm = make_test_signal(30000, bps=24)
    data = _encode(pcm, 24, preset=preset)
    st = decode_stream(data)           # our decoder, MD5 verified
    np.testing.assert_array_equal(st.samples, pcm)
    _oracle_check(data, pcm, oracle_flac, tmp_path)


def test_32bit_roundtrip_oracle(oracle_flac, tmp_path):
    """bps=32: side channel is 33-bit; wide accumulators throughout."""
    rng = np.random.default_rng(9)
    base = make_test_signal(20000, bps=24).astype(np.int64) << 8
    pcm = np.clip(base + rng.integers(-128, 128, base.shape),
                  -(1 << 31), (1 << 31) - 1).astype(np.int32)
    data = _encode(pcm, 32, preset=5)
    st = decode_stream(data)
    np.testing.assert_array_equal(st.samples, pcm)
    _oracle_check(data, pcm, oracle_flac, tmp_path)


def test_32bit_extreme_values(oracle_flac, tmp_path):
    """Full-scale-deflection pattern (test_streams fsd analogue): max
    positive/negative alternation stresses 33-bit side + residual range."""
    n = 16384
    pcm = np.zeros((2, n), np.int32)
    pcm[0, ::2] = (1 << 31) - 1
    pcm[0, 1::2] = -(1 << 31)
    pcm[1, ::4] = (1 << 31) - 1
    pcm[1, 2::4] = -(1 << 31)
    data = _encode(pcm, 32, preset=5)
    st = decode_stream(data)
    np.testing.assert_array_equal(st.samples, pcm)
    _oracle_check(data, pcm, oracle_flac, tmp_path)


def test_24bit_device_decode():
    pcm = make_test_signal(20000, bps=24)
    data = _encode(pcm, 24, preset=5)
    from flac_tpu.decoder import decode_stream_tpu
    st = decode_stream_tpu(data)
    np.testing.assert_array_equal(st.samples, pcm)


def test_size_not_worse_than_libflac_24bit(oracle_flac, tmp_path):
    from flac_tpu import container
    pcm = make_test_signal(60000, bps=24)
    wav = tmp_path / "in.wav"
    wav.write_bytes(container.write_wav(pcm, 96000, 24))
    ref = tmp_path / "ref.flac"
    subprocess.run([oracle_flac, "-5", "-f", "-s", "--no-padding",
                    "--no-seektable", "-o", str(ref), str(wav)], check=True)
    ours = _encode(pcm, 24, preset=5)
    # compare frame payload only (we write 4k padding by default? no —
    # encode_file_to_flac default padding): strip by re-encoding w/o pad
    cfg = EncoderConfig.from_preset(5, sample_rate=96000, channels=2,
                                    bits_per_sample=24)
    buf = io.BytesIO()
    enc = StreamEncoder(buf, cfg, padding=0)
    enc.process(pcm)
    enc.finish()
    ours = buf.getvalue()
    assert len(ours) <= ref.stat().st_size, (
        f"ours {len(ours)} > libFLAC {ref.stat().st_size}")
