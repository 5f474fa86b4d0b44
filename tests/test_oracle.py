"""Cross-validation against the reference flac binary (built out-of-tree by
tools/build_reference.sh): our streams must pass `flac -t` (full decode +
MD5 check) and must not exceed libFLAC's compressed size per preset —
the two acceptance criteria from BASELINE.md."""

import os
import subprocess

import numpy as np
import pytest

from flac_tpu import EncoderConfig, encode_file_to_flac
from flac_tpu.container import write_wav
from tests.conftest import make_test_signal


def run_oracle(oracle_flac, args):
    return subprocess.run([oracle_flac, *args], capture_output=True)


@pytest.mark.parametrize("preset", [0, 3, 5, 8])
def test_oracle_verifies_and_size(oracle_flac, tmp_path, preset):
    pcm = make_test_signal(44100 * 2)
    cfg = EncoderConfig.from_preset(preset)
    ours = encode_file_to_flac(pcm, cfg, batch_frames=8)
    ours_path = tmp_path / "ours.flac"
    ours_path.write_bytes(ours)

    r = run_oracle(oracle_flac, ["-t", "-s", str(ours_path)])
    assert r.returncode == 0, f"oracle rejected our stream: {r.stderr.decode()}"

    wav_path = tmp_path / "in.wav"
    wav_path.write_bytes(write_wav(pcm, 44100, 16))
    ref_path = tmp_path / "ref.flac"
    r = run_oracle(oracle_flac, ["-f", "-s", f"-{preset}", "-o",
                                 str(ref_path), str(wav_path)])
    assert r.returncode == 0
    ref_size = os.path.getsize(ref_path)
    assert len(ours) <= ref_size, \
        f"-{preset}: ours {len(ours)} > libFLAC {ref_size}"


def test_oracle_decode_bit_exact(oracle_flac, tmp_path):
    """Decode our stream with libFLAC and compare raw PCM."""
    pcm = make_test_signal(44100)
    ours = encode_file_to_flac(pcm, EncoderConfig.from_preset(5),
                               batch_frames=8)
    ours_path = tmp_path / "ours.flac"
    ours_path.write_bytes(ours)
    out_wav = tmp_path / "dec.wav"
    r = run_oracle(oracle_flac, ["-d", "-f", "-s", "-o", str(out_wav),
                                 str(ours_path)])
    assert r.returncode == 0, r.stderr.decode()
    from flac_tpu.container import read_wav
    dec = read_wav(out_wav.read_bytes())
    assert np.array_equal(dec.samples, pcm)


def test_encode_oracle_stream_roundtrip(oracle_flac, tmp_path):
    """Decode a libFLAC-encoded stream with our reference decoder."""
    pcm = make_test_signal(44100)
    wav_path = tmp_path / "in.wav"
    wav_path.write_bytes(write_wav(pcm, 44100, 16))
    ref_path = tmp_path / "ref.flac"
    r = run_oracle(oracle_flac, ["-f", "-s", "-5", "-o", str(ref_path),
                                 str(wav_path)])
    assert r.returncode == 0
    from flac_tpu.ref_decoder import decode_stream
    st = decode_stream(ref_path.read_bytes())
    assert np.array_equal(st.samples, pcm)
