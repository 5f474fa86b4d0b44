"""Sharded-encode determinism: the bytes coming off an N-device mesh must
be identical to the 1-device (and host StreamEncoder) bytes — SURVEY §4's
cross-topology byte-identity requirement."""

import io

import jax
import numpy as np
import pytest

from flac_tpu import EncoderConfig
from flac_tpu.encoder import StreamEncoder
from flac_tpu.parallel.shard import data_mesh, encode_blocks_dp
from tests.conftest import make_test_signal

N = 512


def _blocks(nframes):
    pcm = make_test_signal(N * nframes)
    return pcm.reshape(2, nframes, N).transpose(1, 0, 2), pcm


@pytest.mark.parametrize("preset", [0, 5])
def test_byte_identity_1dev_vs_8dev(preset):
    assert len(jax.devices()) >= 8, "conftest provisions 8 virtual devices"
    blocks, _ = _blocks(16)
    cfg = EncoderConfig.from_preset(preset, blocksize=N).resolve()
    w1, l1 = encode_blocks_dp(blocks, 0, cfg,
                              data_mesh(jax.devices()[:1]))
    w8, l8 = encode_blocks_dp(blocks, 0, cfg,
                              data_mesh(jax.devices()[:8]))
    assert np.array_equal(l1, l8)
    for i in range(blocks.shape[0]):
        assert np.array_equal(w1[i, :(l1[i] + 3) // 4],
                              w8[i, :(l8[i] + 3) // 4]), f"frame {i}"


def test_byte_identity_vs_stream_encoder():
    """The sharded frame bytes must equal the frames the host encoder
    writes into a full stream (ordered gather equivalence)."""
    blocks, pcm = _blocks(8)
    cfg = EncoderConfig.from_preset(3, blocksize=N).resolve()
    w, lens = encode_blocks_dp(blocks, 0, cfg, data_mesh(jax.devices()[:8]))
    sharded = b"".join(
        w[i].astype(">u4").tobytes()[:int(lens[i])]
        for i in range(blocks.shape[0]))

    buf = io.BytesIO()
    enc = StreamEncoder(buf, cfg, batch_frames=8, padding=0)
    enc.process(pcm)
    enc.finish()
    stream = buf.getvalue()
    assert sharded in stream


def test_ragged_batch_padding():
    """B not divisible by mesh size: padding must not leak into output."""
    blocks, _ = _blocks(11)
    cfg = EncoderConfig.from_preset(1, blocksize=N).resolve()
    w8, l8 = encode_blocks_dp(blocks, 0, cfg, data_mesh(jax.devices()[:8]))
    w1, l1 = encode_blocks_dp(blocks, 0, cfg, data_mesh(jax.devices()[:1]))
    assert w8.shape[0] == 11
    assert np.array_equal(l1, l8)
    for i in range(11):
        assert np.array_equal(w1[i, :(l1[i] + 3) // 4],
                              w8[i, :(l8[i] + 3) // 4])


def test_decode_dp_topology_identity():
    """Sharded decode (restore over the mesh) is byte-identical across
    1-device and 8-device meshes and to the input PCM."""
    import jax
    import numpy as np

    from flac_tpu import EncoderConfig
    from flac_tpu.decoder import parse_metadata, scan_frames
    from flac_tpu.encoder import encode_file_to_flac
    from flac_tpu.parallel.shard import data_mesh, decode_frames_dp
    from tests.conftest import make_test_signal

    pcm = make_test_signal(4096 * 8)
    data = encode_file_to_flac(pcm, EncoderConfig.from_preset(5),
                               batch_frames=8)
    st, pos = parse_metadata(data, 4)
    frames = scan_frames(data, st, pos)
    out8 = decode_frames_dp(data, st, frames,
                            data_mesh(jax.devices()[:8]))
    out1 = decode_frames_dp(data, st, frames,
                            data_mesh(jax.devices()[:1]))
    np.testing.assert_array_equal(out8, out1)
    np.testing.assert_array_equal(out8, pcm)
