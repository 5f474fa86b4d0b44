"""Unit tests for bit-exact primitives: CRC, UTF-8 numbers, zigzag, packing.

Modeled on the reference unit suites (src/test_libFLAC/{crc,bitreader,
bitwriter}.c) with known vectors plus randomized cross-checks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from flac_tpu.ops.crc import crc8, crc16, batched_crc_device
from flac_tpu.ops.bitpack import (crc16_words, crc8_prefix, pack_fields,
                                  words_to_bytes, deposit_byte)
from flac_tpu.ops.rice import zigzag
from flac_tpu.utils.bits import (BitWriter, BitReader, utf8_encode_int,
                                 utf8_decode_int)


def test_crc8_known_vectors():
    # CRC-8/ATM (poly 0x07, init 0): standard check value
    assert crc8(b"123456789") == 0xF4
    assert crc8(b"") == 0
    assert crc8(b"\x00") == 0


def test_crc16_known_vectors():
    # CRC-16/BUYPASS (poly 0x8005, init 0, no reflect): check = 0xFEE8
    assert crc16(b"123456789") == 0xFEE8
    assert crc16(b"") == 0


def test_batched_crc_device_matches_host():
    rng = np.random.default_rng(0)
    buf = rng.integers(0, 256, (8, 64), dtype=np.uint8)
    lens = np.array([0, 1, 5, 17, 63, 64, 32, 2], np.int32)
    for i, L in enumerate(lens):
        buf[i, L:] = 0
    got16 = np.asarray(batched_crc_device(jnp.asarray(buf),
                                          jnp.asarray(lens), width=16))
    got8 = np.asarray(batched_crc_device(jnp.asarray(buf),
                                         jnp.asarray(lens), width=8))
    for i, L in enumerate(lens):
        assert got16[i] == crc16(buf[i, :L].tobytes())
        assert got8[i] == crc8(buf[i, :L].tobytes())


def test_crc16_words_tree_fold():
    rng = np.random.default_rng(1)
    W = 32
    raw = rng.integers(0, 256, (6, 4 * W), dtype=np.uint8)
    lens = np.array([1, 2, 37, 128, 100, 77], np.int32)
    for i, L in enumerate(lens):
        raw[i, L:] = 0
    words = raw.view(">u4").astype(np.uint32)
    got = np.asarray(crc16_words(jnp.asarray(words), jnp.asarray(lens)))
    for i, L in enumerate(lens):
        assert got[i] == crc16(raw[i, :L].tobytes())


def test_utf8_number_roundtrip():
    for v in [0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10000, 0x1FFFFF,
              0x200000, 0x3FFFFFF, 0x4000000, 0x7FFFFFFF, 0x80000000,
              (1 << 36) - 1]:
        enc = utf8_encode_int(v)
        dec, n = utf8_decode_int(enc)
        assert dec == v and n == len(enc)


def test_zigzag_fold():
    r = jnp.asarray(np.array([0, -1, 1, -2, 2, 2**30, -2**31], np.int32))
    u = np.asarray(zigzag(r))
    assert list(u[:5]) == [0, 1, 2, 3, 4]
    assert u[5] == 2**31
    assert u[6] == 2**32 - 1


def test_pack_fields_vs_host_bitwriter():
    rng = np.random.default_rng(2)
    B, S = 4, 200
    pbits = rng.integers(0, 33, (B, S)).astype(np.int32)
    nzeros = rng.integers(0, 9, (B, S)).astype(np.int32)
    nzeros[pbits == 0] = rng.integers(0, 4, (pbits == 0).sum())
    payload = rng.integers(0, 2**32, (B, S), dtype=np.uint64)
    payload = (payload & ((1 << pbits.astype(np.uint64)) - 1)).astype(
        np.uint32)
    # byte-align each row so the host writer can produce bytes
    total = (nzeros + pbits).sum(axis=1)
    pad = (-total) % 8
    nzeros[:, -1] += pad.astype(np.int32)

    words, bits = pack_fields(jnp.asarray(nzeros), jnp.asarray(payload),
                              jnp.asarray(pbits), 512)
    words = np.asarray(words)
    for b in range(B):
        bw = BitWriter()
        for s in range(S):
            if nzeros[b, s]:
                bw.write(0, int(nzeros[b, s]))
            if pbits[b, s]:
                bw.write(int(payload[b, s]), int(pbits[b, s]))
        want = bw.getvalue()
        got = words[b].astype(">u4").tobytes()[:len(want)]
        assert got == want
        assert int(bits[b]) == len(want) * 8


def test_pack_fields_matches_scatter_reference():
    """The scatter packer must bit-match the independent prefix-sum
    formulation, including huge unary runs and buffer-overflow drops."""
    from flac_tpu.ops.bitpack import pack_fields_prefix as pack_fields_scatter
    rng = np.random.default_rng(7)
    B, S, W = 6, 400, 64
    pbits = rng.integers(0, 33, (B, S)).astype(np.int32)
    nzeros = rng.integers(0, 30, (B, S)).astype(np.int32)
    nzeros[0, 10] = 900          # huge unary run
    nzeros[1, -1] = 5000         # rows that overflow the word buffer
    payload = rng.integers(0, 2**32, (B, S), dtype=np.uint64)
    payload = (payload & ((1 << pbits.astype(np.uint64)) - 1)).astype(
        np.uint32)
    a = pack_fields(jnp.asarray(nzeros), jnp.asarray(payload),
                    jnp.asarray(pbits), W)
    b = pack_fields_scatter(jnp.asarray(nzeros), jnp.asarray(payload),
                            jnp.asarray(pbits), W)
    assert np.array_equal(np.asarray(a[0]), np.asarray(b[0]))
    assert np.array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_deposit_byte():
    words = jnp.zeros((2, 4), jnp.uint32)
    out = deposit_byte(words, jnp.asarray([0, 5]), jnp.asarray([0xAB, 0xCD]))
    by = np.asarray(words_to_bytes(out))
    assert by[0, 0] == 0xAB and by[1, 5] == 0xCD


def test_host_bitreader_roundtrip():
    bw = BitWriter()
    vals = [(5, 3), (0, 1), (1023, 10), (1, 1), (0xFFFFFFFF, 32), (7, 7)]
    for v, n in vals:
        bw.write(v, n)
    bw.pad_to_byte()
    br = BitReader(bw.getvalue())
    for v, n in vals:
        assert br.read(n) == v


@pytest.mark.parametrize("kmax,plen", [(14, 4), (30, 5)])
@pytest.mark.parametrize("escape", [False, True])
def test_partition_cost_table_vs_brute_force(kmax, plen, escape):
    """The exact cost table (bit-count recurrence, ops/rice.py) must
    equal a per-partition numpy brute force over every (po, partition,
    k), including RICE2 magnitudes > 2^30 and the raw-bits escape
    (stream_encoder.c:4797-4910 semantics)."""
    import jax.numpy as jnp
    from flac_tpu.ops import rice as rice_ops

    rng = np.random.default_rng(3)
    N, max_po = 512, 3
    BIG = rice_ops.BIG
    mag = rng.choice(
        [3, 200, 5000, 1 << 17, (1 << 31) if kmax == 30 else 1 << 19], N)
    u = (rng.integers(0, 1 << 16, N).astype(np.uint64) * mag
         // (1 << 16)).astype(np.uint32)
    order = 7
    u[:order] = 0
    bits, ks = rice_ops.partition_cost_table(
        jnp.asarray(u[None]), jnp.full((1,), order, jnp.int32), N,
        max_po, kmax=kmax, plen=plen, escape=escape)
    bits, ks = np.asarray(bits)[0], np.asarray(ks)[0]
    for po in range(max_po + 1):
        m = N >> po
        total = 0
        for p in range(1 << po):
            seg = u[p * m:(p + 1) * m].astype(np.int64)
            n_eff = m - (order if p == 0 else 0)
            costs = [n_eff * (k + 1) + int(np.sum(seg >> k)) + plen
                     for k in range(kmax + 1)]
            bk = int(np.argmin(costs))
            best = min(costs[bk], BIG)
            if escape:
                rawb = int(seg.max()).bit_length()
                ec = n_eff * rawb + plen + 5
                if ec < best:
                    best, bk = ec, rice_ops.ESCAPE_K_BASE + rawb
            total += best
            assert int(ks[po, p]) == bk
        assert int(bits[po]) == min(total, BIG)
