"""Seek tests — the analogue of the reference's test_seeking tier
(/root/reference/src/test_seeking/main.c: encode noise, many random
seek_absolute calls, compare landed samples against the raw source;
driven with and without seektables).

The random-probe tests use the host decode path (use_device=False) so
each probe is cheap; the batched device decode itself is covered by one
probe test here plus tests/test_decoder.py.
"""

import io

import numpy as np
import pytest

from flac_tpu import metadata as md
from flac_tpu.config import EncoderConfig
from flac_tpu.encoder import StreamEncoder
from flac_tpu.seek import FlacReader


def _encode(pcm, *, blocksize=1024, seektable=None, preset=5):
    cfg = EncoderConfig.from_preset(
        preset, sample_rate=44100, channels=pcm.shape[0],
        bits_per_sample=16, blocksize=blocksize)
    buf = io.BytesIO()
    enc = StreamEncoder(buf, cfg, seektable=seektable)
    enc.process(pcm)
    enc.finish()
    return buf.getvalue()


@pytest.fixture(scope="module")
def noise():
    rng = np.random.default_rng(7)
    return rng.integers(-20000, 20000, (2, 44100 * 2)).astype(np.int32)


@pytest.fixture(scope="module")
def stream(noise):
    return _encode(noise, blocksize=1024)


@pytest.fixture(scope="module")
def stream_with_table(noise):
    tbl = md.SeekTableBlock.template_spaced(noise.shape[1], 44100, 0.25)
    return _encode(noise, blocksize=1024, seektable=tbl)


def test_random_seeks_device(stream, noise):
    rd = FlacReader(stream)
    assert rd.total_samples == noise.shape[1]
    rng = np.random.default_rng(3)
    for _ in range(4):
        target = int(rng.integers(0, noise.shape[1] - 100))
        got = rd.read_range(target, 100)
        np.testing.assert_array_equal(got, noise[:, target:target + 100])


def test_random_seeks_host(stream, noise):
    rd = FlacReader(stream, use_device=False)
    rng = np.random.default_rng(5)
    for _ in range(30):
        target = int(rng.integers(0, noise.shape[1] - 100))
        got = rd.read_range(target, 100)
        np.testing.assert_array_equal(got, noise[:, target:target + 100])


def test_random_seeks_with_seektable(stream_with_table, noise):
    # the written table must be resolved + legal
    chain = md.Chain.read(stream_with_table)
    st = chain.get(md.SeekTableBlock.TYPE)
    assert st is not None and st.is_legal()
    real = [p for p in st.points if not p.is_placeholder]
    assert len(real) >= 5
    rng = np.random.default_rng(4)
    for _ in range(10):
        target = int(rng.integers(0, noise.shape[1] - 64))
        rd = FlacReader(stream_with_table, use_device=False)
        rd.seek_absolute(target)          # fresh reader: seektable jump
        got = rd.read(64)
        np.testing.assert_array_equal(got, noise[:, target:target + 64])
    # sequential reads after a seek stay consistent
    rd = FlacReader(stream_with_table, use_device=False)
    rd.seek_absolute(12345)
    a = rd.read(64)
    b = rd.read(64)
    np.testing.assert_array_equal(
        np.concatenate([a, b], axis=1), noise[:, 12345:12345 + 128])


def test_seektable_jump_skips_prefix_scan(stream_with_table, noise):
    """Seeding from a seekpoint must not scan the stream prefix."""
    target = noise.shape[1] - 2000
    rd = FlacReader(stream_with_table, use_device=False)
    rd.seek_absolute(target)
    assert rd._frames and rd._frames[0]["first_sample"] > 0
    got = rd.read(128)
    np.testing.assert_array_equal(got, noise[:, target:target + 128])


def test_seek_past_end_raises(stream, noise):
    rd = FlacReader(stream)
    with pytest.raises(Exception):
        rd.seek_absolute(noise.shape[1])


def test_read_range_tail_short(stream, noise):
    rd = FlacReader(stream, use_device=False)
    got = rd.read_range(noise.shape[1] - 50, 1000)
    assert got.shape[1] == 50
    np.testing.assert_array_equal(got, noise[:, -50:])


def test_seektable_points_decode_at_frame_boundaries(noise):
    """Each resolved seekpoint must land on a real frame whose first
    sample matches (format.c seektable legality + resolution)."""
    tbl = md.SeekTableBlock.template_count(10, noise.shape[1])
    data = _encode(noise, blocksize=1024, seektable=tbl)
    chain = md.Chain.read(data)
    st = chain.get(md.SeekTableBlock.TYPE)
    rd = FlacReader(data, use_device=False)
    for p in st.points:
        if p.is_placeholder:
            continue
        assert p.sample_number % 1024 == 0
        got = rd.read_range(p.sample_number, 32)
        np.testing.assert_array_equal(
            got, noise[:, p.sample_number:p.sample_number + 32])


def test_cli_skip_until(tmp_path, noise):
    from flac_tpu import container
    from flac_tpu.cli import main as flac_main
    wav = tmp_path / "in.wav"
    wav.write_bytes(container.write_wav(noise, 44100, 16))
    fl = tmp_path / "in.flac"
    assert flac_main(["-5", "-f", "-b", "1024", "-o", str(fl),
                      str(wav)]) == 0
    out = tmp_path / "cut.wav"
    assert flac_main(["-d", "--skip", "44100", "--until", "+1000",
                      "-o", str(out), str(fl)]) == 0
    got = container.read_wav(out.read_bytes())
    np.testing.assert_array_equal(got.samples,
                                  noise[:, 44100:44100 + 1000])
    # encode-side skip/until: result should be the sliced signal
    fl2 = tmp_path / "cut.flac"
    assert flac_main(["-5", "-f", "-b", "1024", "--skip", "0:00.5",
                      "--until=-0:00.5", "-o", str(fl2), str(wav)]) == 0
    from flac_tpu.ref_decoder import decode_stream
    st2 = decode_stream(fl2.read_bytes())
    np.testing.assert_array_equal(st2.samples, noise[:, 22050:-22050])
