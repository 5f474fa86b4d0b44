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


def test_32bit_mid_side_beats_independent(oracle_flac, tmp_path):
    """VERDICT r2 #3: the 33-bit side channel must actually be encoded at
    bps=32 (integer_signal_33bit_side, stream_encoder.c:152,3823-3836) and
    win on correlated stereo."""
    rng = np.random.default_rng(3)
    n = 4096 * 3
    t = np.arange(n) / 96000.0
    base = (np.sin(2 * np.pi * 440 * t) * (1 << 30)).astype(np.int64)
    noise = rng.integers(-(1 << 12), 1 << 12, n)
    L = np.clip(base + noise, -(1 << 31), (1 << 31) - 1).astype(np.int32)
    R = np.clip(base - noise, -(1 << 31), (1 << 31) - 1).astype(np.int32)
    pcm = np.stack([L, R])
    cfg_ms = EncoderConfig.from_preset(
        5, sample_rate=96000, channels=2, bits_per_sample=32)
    cfg_ind = EncoderConfig.from_preset(
        5, sample_rate=96000, channels=2, bits_per_sample=32,
        do_mid_side=False)
    assert cfg_ms.resolve().do_mid_side, "mid-side must stay on at bps=32"
    s_ms = encode_file_to_flac(pcm, cfg_ms, batch_frames=4)
    s_ind = encode_file_to_flac(pcm, cfg_ind, batch_frames=4)
    assert len(s_ms) < len(s_ind)
    st = decode_stream(s_ms)
    np.testing.assert_array_equal(st.samples, pcm)
    _oracle_check(s_ms, pcm, oracle_flac, tmp_path)


def test_32bit_constant_33bit_side(oracle_flac, tmp_path):
    """Constant subframes whose value needs 33 bits (split-field emission
    path for warmup/constant payloads)."""
    n = 4096 * 2
    pcm = np.zeros((2, n), np.int32)
    pcm[0, :] = (1 << 31) - 1
    pcm[1, :] = -(1 << 31)          # side = constant 2^32 - 1 (33-bit)
    data = _encode(pcm, 32, preset=5)
    st = decode_stream(data)
    np.testing.assert_array_equal(st.samples, pcm)
    _oracle_check(data, pcm, oracle_flac, tmp_path)
