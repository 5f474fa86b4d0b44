"""Native C++ runtime (flac_tpu/native) parity vs the Python paths."""

import hashlib

import numpy as np
import pytest

from flac_tpu import native

pytestmark = pytest.mark.skipif(not native.AVAILABLE,
                                reason="native library not built")


def test_crc_parity():
    from flac_tpu.ops.crc import crc8 as pcrc8
    rng = np.random.default_rng(0)
    for n in (0, 1, 7, 255, 4096):
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert native.crc8(data) == pcrc8(data)


def test_md5_streaming():
    rng = np.random.default_rng(1)
    m = native.MD5()
    h = hashlib.md5()
    for n in (0, 1, 63, 64, 65, 1000, 64 * 1024 + 3):
        chunk = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        m.update(chunk)
        h.update(chunk)
    assert m.digest() == h.digest()


@pytest.mark.parametrize("bps,channels", [(8, 1), (16, 2), (24, 2), (32, 6)])
def test_md5_pcm_interleave(bps, channels):
    from flac_tpu.encoder import interleave_for_md5
    rng = np.random.default_rng(bps)
    full = (1 << (bps - 1)) - 1
    pcm = rng.integers(-full - 1, full, (channels, 4097), dtype=np.int32)
    m = native.MD5()
    m.update_pcm(pcm, bps)
    m.update_pcm(pcm[:, :100], bps)  # streaming across calls
    want = hashlib.md5(interleave_for_md5(pcm, bps)
                       + interleave_for_md5(pcm[:, :100], bps)).digest()
    assert m.digest() == want


def test_scan_frames_parity(music):
    """Native scanner finds the same frames as the Python scanner."""
    from flac_tpu import EncoderConfig, encode_file_to_flac
    from flac_tpu import decoder as dec
    from flac_tpu import native as nat

    cfg = EncoderConfig.from_preset(3, blocksize=1024)
    stream = encode_file_to_flac(music[:, :16384], cfg)
    st, pos = dec.parse_metadata(stream, 4)
    got = nat.scan_frames(stream, pos, st.bits_per_sample, st.sample_rate)
    # python path (force the fallback branch)
    import flac_tpu.native as native_mod
    saved = native_mod.AVAILABLE
    native_mod.AVAILABLE = False
    try:
        want = dec.scan_frames(stream, st, pos)
    finally:
        native_mod.AVAILABLE = saved
    assert len(got) == len(want) == 16
    for g, w in zip(got, want):
        for k in ("offset", "number", "blocksize", "sample_rate", "channels",
                  "assignment", "bps", "variable", "header_end_bits"):
            assert g[k] == w[k], k


def test_gather_frames():
    rng = np.random.default_rng(2)
    rows = rng.integers(0, 256, (5, 64), dtype=np.uint8)
    lens = np.array([3, 64, 0, 17, 40])
    got = native.gather_frames(rows, lens)
    want = b"".join(rows[i, :lens[i]].tobytes() for i in range(5))
    assert got == want
