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


def _corrupting(real, row: int, col: int, bit: int):
    """Wrap encode_batch_trimmed, flipping one bit in the fetched word
    buffer (column 0 is the byte-length lane; words start at column 1) —
    injection AFTER the jit boundary, where the product path reads it."""
    def corrupted(pcm_b, fn, cfg, blocksize, fetch_words):
        main, rest = real(pcm_b, fn, cfg, blocksize, fetch_words)
        arr = np.asarray(main).copy()
        arr[min(row, arr.shape[0] - 1), col] ^= np.uint32(1 << bit)
        return arr, rest
    return corrupted


def test_verify_catches_injected_packer_bug(monkeypatch):
    """Flip one bit in the packed words after encoding: -V must refuse
    to write the stream."""
    pcm = make_test_signal(N * 4)
    monkeypatch.setattr(
        encoder_mod, "encode_batch_trimmed",
        _corrupting(encoder_mod.encode_batch_trimmed, 0, 9, 7))
    buf = io.BytesIO()
    enc = StreamEncoder(buf, EncoderConfig.from_preset(3, blocksize=N),
                        batch_frames=4, verify=True)
    with pytest.raises(RuntimeError, match="verify"):
        enc.process(pcm)
        enc.finish()


def test_verify_catches_header_corruption(monkeypatch):
    pcm = make_test_signal(N * 4)
    monkeypatch.setattr(
        encoder_mod, "encode_batch_trimmed",
        _corrupting(encoder_mod.encode_batch_trimmed, 1, 1, 16))
    buf = io.BytesIO()
    enc = StreamEncoder(buf, EncoderConfig.from_preset(0, blocksize=N),
                        batch_frames=4, verify=True)
    with pytest.raises(RuntimeError, match="verify"):
        enc.process(pcm)
        enc.finish()
