#!/usr/bin/env python
"""On-TPU validation + timing of the MXU one-hot-matmul pack backend
(ops/pack_pallas.py) against the scatter packer and the full encode.

Run on a TPU host:  FLAC_TPU_PACK=mxu python tools/verify_mxu_pack.py
"""
import os
import sys
import time

os.environ.setdefault("FLAC_TPU_PACK", "mxu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from flac_tpu import EncoderConfig  # noqa: E402
from flac_tpu.encoder import encode_batch  # noqa: E402
from flac_tpu.ops import bitpack, pack_pallas  # noqa: E402


def main():
    print("mxu available:", pack_pallas.available())
    rng = np.random.default_rng(0)
    B, S, W = 128, 2432, 4096
    pbits = rng.integers(4, 61, (B, S))
    pbits[rng.random((B, S)) < 0.05] = 0
    nzeros = rng.integers(0, 3, (B, S))
    pay = rng.integers(0, 1 << 62, (B, S), dtype=np.int64).astype(np.uint64)
    pay &= (np.uint64(1) << pbits.astype(np.uint64)) - np.uint64(1)
    nz = jnp.asarray(nzeros.astype(np.int32))
    pb = jnp.asarray(pbits.astype(np.int32))
    p64 = jnp.asarray(pay)
    rw, rt = bitpack.pack_fields64(nz, p64, pb, W)
    gw, gt = pack_pallas.pack_fields64_mxu(nz, p64, pb, W)
    assert np.array_equal(np.asarray(rw), np.asarray(gw)), "words differ"
    assert np.array_equal(np.asarray(rt), np.asarray(gt)), "lens differ"
    print("pack kernels bit-identical on synthetic fields")

    # full encode byte-identity: mxu quad vs safe layout
    n = 8 * 4096
    t = np.arange(n) / 44100.0
    sig = 0.4 * np.sin(2 * np.pi * 220 * t) \
        + 0.02 * rng.standard_normal(n)
    pcm = np.round(np.stack([sig, 0.8 * sig]) * 20000).astype(np.int32)
    pcm = pcm.reshape(2, 8, 4096).transpose(1, 0, 2)
    cfg = EncoderConfig.from_preset(8).resolve()
    a = encode_batch(jnp.asarray(pcm), np.int64(0), cfg, 4096)
    s = encode_batch(jnp.asarray(pcm), np.int64(0), cfg, 4096,
                     layout="safe")
    la = np.asarray(a.byte_len)
    assert np.asarray(a.ok).all() and np.array_equal(la,
                                                     np.asarray(s.byte_len))
    for i in range(8):
        nb = (int(la[i]) + 3) // 4
        assert np.array_equal(np.asarray(a.words)[i, :nb],
                              np.asarray(s.words)[i, :nb]), f"frame {i}"
    print("full encode byte-identical (mxu quad vs safe layout)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
