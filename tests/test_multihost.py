"""Multi-host frame-range splice: the 2-host (simulated) splice must be
byte-identical to the single-host stream (SURVEY §2.3 ordered gather;
reference anchor: ordered bitbuffer drain, stream_encoder.c:3614-3626)."""

import numpy as np
import pytest

import jax

from flac_tpu import EncoderConfig
from flac_tpu.parallel.multihost import encode_file_ranges, host_file_shard
from flac_tpu.parallel.shard import data_mesh, encode_blocks_dp

from conftest import make_test_signal


def _blocks(B, N, channels=2):
    pcm = make_test_signal(B * N, channels=channels, seed=3)
    return pcm.reshape(channels, B, N).transpose(1, 0, 2)


def _single_host_bytes(blocks, cfg, mesh):
    words, lens = encode_blocks_dp(blocks, 0, cfg, mesh)
    return b"".join(words[i].astype(">u4").tobytes()[: int(lens[i])]
                    for i in range(blocks.shape[0]))


@pytest.mark.parametrize("num_hosts", [2, 3])
def test_range_splice_matches_single_host(num_hosts):
    N, B = 256, 7   # uneven split: last host gets a short range
    cfg = EncoderConfig.from_preset(5, blocksize=N).resolve()
    blocks = _blocks(B, N)
    mesh = data_mesh(jax.devices()[:2])
    single = _single_host_bytes(blocks, cfg, mesh)

    blobs = []
    for h in range(num_hosts):
        blob, all_lens, off = encode_file_ranges(
            blocks, cfg, host_id=h, num_hosts=num_hosts, mesh=mesh)
        assert all_lens.shape == (num_hosts,)
        assert off == sum(len(b) for b in blobs), (
            f"host {h} offset {off} != spliced prefix")
        assert all_lens[h] == len(blob)
        blobs.append(blob)
    assert b"".join(blobs) == single


def test_range_splice_more_hosts_than_ranges():
    # 5 hosts, 3 frames: hosts past the last range contribute empty blobs
    N, B = 256, 3
    cfg = EncoderConfig.from_preset(2, blocksize=N).resolve()
    blocks = _blocks(B, N)
    mesh = data_mesh(jax.devices()[:1])
    single = _single_host_bytes(blocks, cfg, mesh)
    blobs = []
    for h in range(5):
        blob, _, off = encode_file_ranges(
            blocks, cfg, host_id=h, num_hosts=5, mesh=mesh)
        assert off == sum(len(b) for b in blobs)
        blobs.append(blob)
    assert b"".join(blobs) == single


def test_host_file_shard_partition():
    paths = [f"f{i}.wav" for i in range(10)]
    shards = [host_file_shard(paths, h, 3) for h in range(3)]
    flat = [p for s in shards for p in s]
    assert sorted(flat) == sorted(paths)
    assert all(len(set(s)) == len(s) for s in shards)
