"""Ogg FLAC transport: page structure, packetization, chained streams."""

import io

import numpy as np
import pytest

from flac_tpu import EncoderConfig, encode_file_to_flac, ogg

from conftest import make_test_signal


def _small_stream(seed=0, n=8192, **kw):
    cfg = EncoderConfig.from_preset(3, blocksize=1024)
    pcm = make_test_signal(n, seed=seed)
    return encode_file_to_flac(pcm, cfg, **kw), pcm


def test_ogg_crc_vector():
    # check against a known-good property: crc of page with zeroed crc
    # field must equal the stored value after to_bytes
    page = ogg.OggPage(0x02, 0, 1, 0, [b"hello"])
    raw = page.to_bytes()
    crc = int.from_bytes(raw[22:26], "little")
    assert ogg.crc32_ogg(raw[:22] + b"\0\0\0\0" + raw[26:]) == crc


def test_page_roundtrip_large_packet():
    out = io.BytesIO()
    w = ogg.PageWriter(out, serial=7)
    big = bytes(range(256)) * 300   # 76800 B: spans multiple pages
    w.write_packet(b"first", 0, flush=True)
    w.write_packet(big, 111)
    w.write_packet(b"x" * 255, 222, eos=True)  # exact lacing boundary
    data = out.getvalue()
    pkts = [p for _, p, _ in
            ogg.pages_to_packets(pg for pg, _ in ogg.read_pages(data))]
    assert pkts == [b"first", big, b"x" * 255]


def test_ogg_flac_roundtrip():
    stream, pcm = _small_stream()
    out = io.BytesIO()
    ogg.wrap_flac_stream(stream, out)
    data = out.getvalue()
    assert ogg.is_ogg(data)
    # BOS page: exactly the first header packet, marked BOS
    first = next(ogg.read_pages(data))[0]
    assert first["header_type"] & 0x02
    assert first["segments"][0][:5] == b"\x7fFLAC"
    st = ogg.decode_ogg_flac(data)
    assert np.array_equal(st.samples, pcm)
    # last page carries EOS
    last = list(pg for pg, _ in ogg.read_pages(data))[-1]
    assert last["header_type"] & 0x04
    assert last["granulepos"] == pcm.shape[1]


def test_ogg_reconstruction_is_bit_exact():
    """Unwrap(wrap(x)) == x: the mapping preserves the native stream."""
    stream, _ = _small_stream(seed=3, n=4096)
    out = io.BytesIO()
    ogg.wrap_flac_stream(stream, out)
    links = ogg.unwrap_ogg_flac(out.getvalue())
    assert len(links) == 1
    assert links[0].flac == stream


def test_chained_ogg():
    s1, p1 = _small_stream(seed=1, n=4096)
    s2, p2 = _small_stream(seed=2, n=4096)
    out = io.BytesIO()
    ogg.wrap_flac_stream(s1, out, serial=1)
    ogg.wrap_flac_stream(s2, out, serial=2)
    st = ogg.decode_ogg_flac(out.getvalue())
    assert np.array_equal(st.samples, np.concatenate([p1, p2], axis=1))


def test_ogg_resync_after_garbage():
    stream, pcm = _small_stream(seed=4, n=4096)
    out = io.BytesIO()
    ogg.wrap_flac_stream(stream, out)
    data = out.getvalue()
    # prepend junk: reader must resync on the capture pattern
    st = ogg.decode_ogg_flac(b"JUNK" * 10 + data)
    assert np.array_equal(st.samples, pcm)
