"""Hostile/wacky container layouts: the reference's wacky-chunk WAV
generators (src/test_streams/main.c:975-1266 generate_wackywavs /
generate_wackywav64s / cbsize variants) rebuilt as direct tests of
container.py's ingest tolerance, plus the AIFF/W64/RF64 legs of the
test_streams.sh matrix (test/test_streams.sh:51-64) run through a full
encode/decode round-trip.
"""

import struct

import numpy as np
import pytest

from flac_tpu import EncoderConfig, encode_file_to_flac
from flac_tpu.container import (ContainerError, read_aiff, read_w64,
                                read_wav, sniff_and_read, write_aiff,
                                write_rf64, write_w64, write_wav)
from flac_tpu.decoder import decode_stream_tpu

_RNG = np.random.default_rng(5)


def _pcm16(n=1024, channels=2):
    t = np.arange(n) / 44100.0
    p = np.round(9000 * np.sin(2 * np.pi * 440 * t)
                 + 200 * _RNG.standard_normal(n)).astype(np.int32)
    return np.stack([p] * channels) if channels > 1 else p[None, :]


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return cid + struct.pack("<I", len(body)) + body + pad


def _fmt16(channels=2, rate=44100, bps=16) -> bytes:
    ba = channels * ((bps + 7) // 8)
    return struct.pack("<HHIIHH", 1, channels, rate, rate * ba, ba, bps)


def _wav(chunks: list[bytes]) -> bytes:
    payload = b"WAVE" + b"".join(chunks)
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


def _data_bytes(pcm) -> bytes:
    inter = pcm.T.astype("<i2").tobytes()
    return inter


@pytest.mark.smoke
def test_wacky_unknown_chunks_before_and_after_fmt():
    """junk/padding/odd chunks interleaved around fmt/data (the
    generate_wackywavs layout: junk before fmt, between fmt and data,
    after data)."""
    pcm = _pcm16()
    wav = _wav([
        _chunk(b"junk", b"\xa5" * 33),            # odd-size: pad byte
        _chunk(b"LIST", b"INFOIART" + b"\x07\x00\x00\x00nobody\x00"),
        _chunk(b"fmt ", _fmt16()),
        _chunk(b"pad ", b"\x00" * 100),
        _chunk(b"data", _data_bytes(pcm)),
        _chunk(b"tail", b"\x42" * 10),
    ])
    info = read_wav(wav)
    assert info.sample_rate == 44100 and info.bits_per_sample == 16
    assert np.array_equal(info.samples, pcm)


def test_wacky_fmt_cbsize_variants():
    """fmt chunks of size 16 / 18 (cbSize=0) / 40 (EXTENSIBLE) must all
    parse (the cbsize0 generators)."""
    pcm = _pcm16()
    base = _fmt16()
    for extra in (b"", b"\x00\x00",        # cbSize = 0
                  struct.pack("<HHI", 22, 16, 0x3)
                  + b"\x01\x00\x00\x00\x00\x00\x10\x00"
                  + b"\x80\x00\x00\xaa\x00\x38\x9b\x71"):
        body = base + extra
        if extra and len(extra) > 2:
            body = struct.pack("<HHIIHH", 0xFFFE, 2, 44100, 44100 * 4,
                               4, 16) + extra
        wav = _wav([_chunk(b"fmt ", body), _chunk(b"data",
                                                  _data_bytes(pcm))])
        info = read_wav(wav)
        assert np.array_equal(info.samples, pcm), len(extra)


def test_wacky_truncated_junk_rejected_or_tolerated():
    """Truncated chunk headers after data must not crash the reader."""
    pcm = _pcm16(256)
    wav = _wav([_chunk(b"fmt ", _fmt16()),
                _chunk(b"data", _data_bytes(pcm))]) + b"tr"
    info = read_wav(wav)
    assert np.array_equal(info.samples, pcm)


def test_bogus_data_size_ignore_chunk_sizes():
    """data size 0 (pipes) decodes via ignore_chunk_sizes=True
    (encode.c --ignore-chunk-sizes)."""
    pcm = _pcm16(512)
    raw = _data_bytes(pcm)
    wav = _wav([_chunk(b"fmt ", _fmt16()),
                b"data" + struct.pack("<I", 0) + raw])
    info = read_wav(wav, ignore_chunk_sizes=True)
    assert np.array_equal(info.samples, pcm)


def test_missing_fmt_raises():
    with pytest.raises(ContainerError):
        read_wav(_wav([_chunk(b"data", b"\x00" * 64)]))


def test_hostile_not_audio_garbage():
    for blob in (b"", b"RIFF", b"RIFF\xff\xff\xff\xffWAVE",
                 b"RIFF\x10\x00\x00\x00WAVEfmt \xff\xff\xff\xff"):
        with pytest.raises(ContainerError):
            read_wav(blob)


@pytest.mark.parametrize("leg", ["wav", "rf64", "w64", "aiff"])
def test_container_legs_roundtrip(leg):
    """The test_streams.sh container matrix: the same signal through
    each container's write -> sniff/read -> encode -> decode chain."""
    pcm = _pcm16(192 * 4)
    writer = {"wav": write_wav, "rf64": write_rf64, "w64": write_w64,
              "aiff": write_aiff}[leg]
    blob = writer(pcm, 44100, 16)
    info = sniff_and_read(blob)
    assert np.array_equal(info.samples, pcm), leg
    cfg = EncoderConfig.from_preset(1, blocksize=192)
    stream = encode_file_to_flac(info.samples, cfg, batch_frames=8)
    st = decode_stream_tpu(stream, engine="host")
    assert np.array_equal(st.samples, pcm), leg


def test_w64_unknown_guid_chunks():
    """W64 readers must skip unknown GUID chunks (wackywav64s)."""
    pcm = _pcm16(256)
    blob = bytearray(write_w64(pcm, 44100, 16))
    # splice an unknown chunk right after the header (40 bytes)
    unk = bytes(range(16)) + struct.pack("<Q", 24 + 8) + b"\xee" * 8
    blob[40:40] = unk
    # patch the outer RIFF size
    total = len(blob)
    blob[16:24] = struct.pack("<Q", total)
    info = read_w64(bytes(blob))
    assert np.array_equal(info.samples, pcm)


def test_aiff_sowt_and_comm_order():
    """AIFF with COMM after other chunks still parses (chunk-order
    tolerance, encode.c:578+)."""
    pcm = _pcm16(256)
    blob = write_aiff(pcm, 44100, 16)
    # reorder: inject an ANNO chunk before COMM
    assert blob[:4] == b"FORM"
    form_type = blob[8:12]
    chunks = blob[12:]
    anno = b"ANNO" + struct.pack(">I", 4) + b"test"
    newbody = form_type + anno + chunks
    new = b"FORM" + struct.pack(">I", len(newbody)) + newbody
    info = read_aiff(new)
    assert np.array_equal(info.samples, pcm)
