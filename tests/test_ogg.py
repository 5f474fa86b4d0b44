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


def test_granulepos_on_full_pages():
    """A page on which any packet completes must carry the granulepos of
    the last completed packet; -1 is reserved for all-mid-packet pages
    (ogg_encoder_aspect.c:202-228 semantics)."""
    stream, pcm = _small_stream(seed=5, n=65536)
    out = io.BytesIO()
    ogg.wrap_flac_stream(stream, out)
    pages = [p for p, _ in ogg.read_pages(out.getvalue())]
    unk = (1 << 64) - 1
    audio = [p for p in pages if p["sequence"] >= 2]
    assert any(len(p["lacing"]) == 255 for p in audio)  # pages did fill
    for p in audio:
        if any(l < 255 for l in p["lacing"]):
            assert p["granulepos"] != unk
    gs = [p["granulepos"] for p in audio if p["granulepos"] != unk]
    assert gs == sorted(gs) and gs[-1] == pcm.shape[1]


def test_packet_resync_on_continued_page():
    """Dropping the page that starts a packet must not splice the packet's
    tail onto the next packet (ADVICE: continued-page resync)."""
    out = io.BytesIO()
    w = ogg.PageWriter(out, serial=9)
    w.write_packet(b"head", 0, flush=True)
    w.write_packet(b"A" * 70000, 1, flush=True)   # spans >1 page
    w.write_packet(b"tailpkt", 2, eos=True)
    pages = [p for p, _ in ogg.read_pages(out.getvalue())]
    # drop the page where the big packet starts (first continued-less
    # audio page); keep its continuation pages
    start_idx = next(i for i, p in enumerate(pages)
                     if p["sequence"] >= 1 and not p["header_type"] & 0x01
                     and p["segments"][0][:1] == b"A")
    kept = pages[:start_idx] + pages[start_idx + 1:]
    pkts = [pkt for _, pkt, _ in ogg.pages_to_packets(iter(kept))]
    assert b"tailpkt" in pkts
    assert all(not p.startswith(b"A") for p in pkts if p != b"head")


def test_unknown_header_count():
    """header count 0 = 'unknown': trailing metadata packets must still be
    treated as metadata (embedded last-flags drive termination)."""
    stream, pcm = _small_stream(seed=6, n=4096)
    out = io.BytesIO()
    ogg.wrap_flac_stream(stream, out)
    data = bytearray(out.getvalue())
    # patch the 2-byte count inside the first packet to 0 and refresh the
    # page CRC (count lives at offset 7 of packet 0 = page body)
    first, end = next(ogg.read_pages(bytes(data)))
    nseg = data[26]
    body_off = 27 + nseg
    data[body_off + 7:body_off + 9] = b"\x00\x00"
    page = bytes(data[:end])
    crc = ogg.crc32_ogg(page[:22] + b"\0\0\0\0" + page[26:])
    data[22:26] = crc.to_bytes(4, "little")
    st = ogg.decode_ogg_flac(bytes(data))
    assert np.array_equal(st.samples, pcm)


def test_ogg_resync_after_garbage():
    stream, pcm = _small_stream(seed=4, n=4096)
    out = io.BytesIO()
    ogg.wrap_flac_stream(stream, out)
    data = out.getvalue()
    # prepend junk: reader must resync on the capture pattern
    st = ogg.decode_ogg_flac(b"JUNK" * 10 + data)
    assert np.array_equal(st.samples, pcm)


def test_ogg_ranged_decode_seek_path():
    """--skip/--until on Ogg FLAC decodes only covering packets
    (ogg_decoder_aspect.c seek analogue)."""
    import numpy as np
    from flac_tpu import ogg
    from tests.conftest import make_test_signal
    from flac_tpu import EncoderConfig
    from flac_tpu.encoder import encode_file_to_flac
    import io
    pcm = make_test_signal(4096 * 4 + 100)
    flac = encode_file_to_flac(pcm, EncoderConfig.from_preset(3))
    buf = io.BytesIO()
    ogg.wrap_flac_stream(flac, buf)
    data = buf.getvalue()
    start, n = 5000, 6000
    st = ogg.decode_ogg_flac_range(data, start, n)
    assert np.array_equal(st.samples, pcm[:, start:start + n])
    # range past the end clips naturally
    st2 = ogg.decode_ogg_flac_range(data, pcm.shape[1] - 10, 100)
    assert np.array_equal(st2.samples, pcm[:, -10:])


def test_ogg_streaming_sink_incremental():
    """OggFlacSink pages frames out as batches land and rewrites the
    header pages in place at finish (STREAMINFO backpatch): the result
    must round-trip with a valid MD5 and match the one-shot wrapper
    byte-for-byte."""
    import io

    import numpy as np

    from flac_tpu import EncoderConfig, ogg
    from flac_tpu.encoder import StreamEncoder, encode_file_to_flac
    from tests.conftest import make_test_signal

    pcm = make_test_signal(4096 * 3 + 777)
    cfg = EncoderConfig.from_preset(3)

    buf = io.BytesIO()
    sink = ogg.OggFlacSink(buf)
    with StreamEncoder(sink, cfg, batch_frames=2) as enc:
        enc.process(pcm)
        enc.finish()
    sink.finalize()
    data = buf.getvalue()

    st = ogg.decode_ogg_flac(data)
    assert st.md5_ok and np.array_equal(st.samples, pcm)

    flac = encode_file_to_flac(pcm, cfg, batch_frames=2)
    ref = io.BytesIO()
    ogg.wrap_flac_stream(flac, ref)
    assert data == ref.getvalue()

    # non-seekable output: pages still valid, MD5 left unknown (zeros)
    class Pipe(io.BytesIO):
        def seekable(self):
            return False

    p = Pipe()
    sink2 = ogg.OggFlacSink(p)
    with StreamEncoder(sink2, cfg, batch_frames=2) as enc2:
        enc2.process(pcm)
        enc2.finish()
    sink2.finalize()
    st2 = ogg.decode_ogg_flac(p.getvalue(), verify_md5=False)
    assert np.array_equal(st2.samples, pcm)
