"""MXU pack kernel logic, validated in Pallas interpret mode on CPU
(the real-chip run is tools/verify_mxu_pack.py): the one-hot-matmul
deposit must be bit-identical to the scatter packer across field
regimes, including tile-boundary spills and over-capacity frames."""

import numpy as np
import pytest
import jax.numpy as jnp

from flac_tpu.ops import bitpack


@pytest.fixture(autouse=True)
def _interpret_pallas(monkeypatch):
    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)
    monkeypatch.setattr(pl, "pallas_call", patched)


def _case(rng, B, S, W, max_pb=60):
    pbits = rng.integers(0, max_pb + 1, (B, S))
    pbits[rng.random((B, S)) < 0.08] = 0
    nzeros = rng.integers(0, 4, (B, S))
    pay = rng.integers(0, 1 << 62, (B, S), dtype=np.int64).astype(np.uint64)
    pay &= (np.uint64(1) << pbits.astype(np.uint64)) - np.uint64(1)
    return (jnp.asarray(nzeros.astype(np.int32)), jnp.asarray(pay),
            jnp.asarray(pbits.astype(np.int32)))


@pytest.mark.parametrize("B,S,W", [(8, 640, 2048), (3, 130, 1024),
                                   (16, 352, 4096)])
def test_mxu_pack_matches_scatter(B, S, W):
    from flac_tpu.ops import pack_pallas
    rng = np.random.default_rng(B * 1000 + S)
    nz, p64, pb = _case(rng, B, S, W)
    rw, rt = bitpack.pack_fields64(nz, p64, pb, W)
    gw, gt = pack_pallas.pack_fields64_mxu(nz, p64, pb, W)
    np.testing.assert_array_equal(np.asarray(rt), np.asarray(gt))
    np.testing.assert_array_equal(np.asarray(rw), np.asarray(gw))


def test_mxu_pack_dense_small_fields():
    """Many 1-4 bit fields: dense words, maximal per-word field overlap
    (the carry-freedom property is what keeps byte-plane sums <= 255)."""
    from flac_tpu.ops import pack_pallas
    rng = np.random.default_rng(7)
    B, S, W = 8, 1024, 1024
    pbits = rng.integers(1, 5, (B, S)).astype(np.int32)
    nzeros = np.zeros((B, S), np.int32)
    pay = rng.integers(0, 16, (B, S)).astype(np.uint64)
    pay &= (np.uint64(1) << pbits.astype(np.uint64)) - np.uint64(1)
    nz, p64, pb = (jnp.asarray(nzeros), jnp.asarray(pay),
                   jnp.asarray(pbits))
    rw, _ = bitpack.pack_fields64(nz, p64, pb, W)
    gw, _ = pack_pallas.pack_fields64_mxu(nz, p64, pb, W)
    np.testing.assert_array_equal(np.asarray(rw), np.asarray(gw))
