"""Encoder verify loopback (-V): decode-while-encoding catches packer bugs
before any byte is written (stream_encoder.c:1287-1325, 2334-2352)."""

import io

import numpy as np
import pytest

from flac_tpu import EncoderConfig
from flac_tpu import encoder as encoder_mod
from flac_tpu.decoder import decode_stream_tpu
from flac_tpu.encoder import StreamEncoder
from tests.conftest import make_test_signal

N = 1024


def test_verify_clean_encode_passes():
    pcm = make_test_signal(N * 6)
    buf = io.BytesIO()
    enc = StreamEncoder(buf, EncoderConfig.from_preset(3, blocksize=N),
                        batch_frames=4, verify=True)
    enc.process(pcm)
    enc.finish()
    st = decode_stream_tpu(buf.getvalue())
    assert np.array_equal(st.samples, pcm)


def test_verify_catches_injected_packer_bug(monkeypatch):
    """Flip one bit in the packed words after encode_batch: -V must refuse
    to write the stream."""
    pcm = make_test_signal(N * 4)
    real = encoder_mod.encode_batch

    def corrupted(pcm_b, fn, cfg, blocksize):
        packed = real(pcm_b, fn, cfg, blocksize)
        words = np.asarray(packed.words).copy()
        words[0, 8] ^= 1 << 7        # payload bit, past the frame header
        return packed._replace(words=words)

    monkeypatch.setattr(encoder_mod, "encode_batch", corrupted)
    buf = io.BytesIO()
    enc = StreamEncoder(buf, EncoderConfig.from_preset(3, blocksize=N),
                        batch_frames=4, verify=True)
    with pytest.raises(RuntimeError, match="verify"):
        enc.process(pcm)
        enc.finish()


def test_verify_catches_header_corruption(monkeypatch):
    pcm = make_test_signal(N * 4)
    real = encoder_mod.encode_batch

    def corrupted(pcm_b, fn, cfg, blocksize):
        packed = real(pcm_b, fn, cfg, blocksize)
        words = np.asarray(packed.words).copy()
        words[1, 0] ^= 1 << 16       # inside frame 1's header
        return packed._replace(words=words)

    monkeypatch.setattr(encoder_mod, "encode_batch", corrupted)
    buf = io.BytesIO()
    enc = StreamEncoder(buf, EncoderConfig.from_preset(0, blocksize=N),
                        batch_frames=4, verify=True)
    with pytest.raises(RuntimeError, match="verify"):
        enc.process(pcm)
        enc.finish()
