"""--keep-foreign-metadata: non-audio container chunks stored in
APPLICATION blocks and restored byte-identically (foreign_metadata.c,
doc/foreign_metadata_storage.md).  Interop is tested in BOTH directions
against the reference binary."""

import struct
import subprocess

import numpy as np
import pytest

from flac_tpu import cli, container, foreign

from conftest import make_test_signal


def _wav_with_junk(pcm, rate=44100, bps=16) -> bytes:
    """WAV with LIST/INFO before data, an odd-sized junk chunk after."""
    payload = container._pcm_to_bytes(pcm, bps)
    nb = (bps + 7) // 8
    ba = pcm.shape[0] * nb
    fmtc = struct.pack("<HHIIHH", 1, pcm.shape[0], rate, rate * ba, ba,
                       nb * 8)
    info = b"INFOIART" + struct.pack("<I", 8) + b"someone\x00"
    junk = b"odd!" + struct.pack("<I", 5) + b"12345\x00"   # odd size + pad
    chunks = (b"fmt " + struct.pack("<I", len(fmtc)) + fmtc
              + b"LIST" + struct.pack("<I", len(info)) + info
              + b"data" + struct.pack("<I", len(payload)) + payload
              + junk)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


@pytest.fixture
def junk_wav(tmp_path):
    pcm = make_test_signal(20000)
    wav = _wav_with_junk(pcm)
    p = tmp_path / "in.wav"
    p.write_bytes(wav)
    return p, wav, pcm


def test_scan_restore_roundtrip(junk_wav):
    _, wav, pcm = junk_wav
    appid, blocks = foreign.scan_foreign(wav)
    assert appid == foreign.APPID_RIFF
    assert foreign.foreign_kind(appid, blocks) == "wav"
    payload = container._pcm_to_bytes(pcm, 16)
    assert foreign.restore_foreign(appid, blocks, payload) == wav


def test_cli_roundtrip_byte_identical(junk_wav, tmp_path):
    p, wav, pcm = junk_wav
    f = tmp_path / "a.flac"
    assert cli.main(["-5", "-s", "--keep-foreign-metadata",
                     "-o", str(f), str(p)]) == 0
    out = tmp_path / "out.wav"
    assert cli.main(["-d", "-s", "--keep-foreign-metadata",
                     "-o", str(out), str(f)]) == 0
    assert out.read_bytes() == wav


def test_interop_ours_to_reference(junk_wav, tmp_path, oracle_flac):
    """The reference binary restores a WAV from OUR foreign blocks."""
    p, wav, pcm = junk_wav
    f = tmp_path / "a.flac"
    assert cli.main(["-5", "-s", "--keep-foreign-metadata",
                     "-o", str(f), str(p)]) == 0
    out = tmp_path / "ref_out.wav"
    subprocess.run([oracle_flac, "-d", "-f", "-s",
                    "--keep-foreign-metadata", "-o", str(out), str(f)],
                   check=True, capture_output=True)
    assert out.read_bytes() == wav


def test_interop_reference_to_ours(junk_wav, tmp_path, oracle_flac):
    """OUR decoder restores a WAV from the reference's foreign blocks."""
    p, wav, pcm = junk_wav
    f = tmp_path / "ref.flac"
    subprocess.run([oracle_flac, "-5", "-f", "-s",
                    "--keep-foreign-metadata", "-o", str(f), str(p)],
                   check=True, capture_output=True)
    out = tmp_path / "our_out.wav"
    assert cli.main(["-d", "-s", "--keep-foreign-metadata",
                     "-o", str(out), str(f)]) == 0
    assert out.read_bytes() == wav


def test_aiff_foreign_roundtrip(tmp_path):
    pcm = make_test_signal(12000)
    aiff = container.write_aiff(pcm, 44100, 16)
    # inject an ANNO chunk before COMM
    hdr, rest = aiff[:12], aiff[12:]
    anno = b"ANNOnote" + b""
    anno = b"ANNO" + struct.pack(">I", 4) + b"note"
    body = anno + rest
    aiff2 = b"FORM" + struct.pack(">I", 4 + len(body)) + b"AIFF" + body
    p = tmp_path / "in.aiff"
    p.write_bytes(aiff2)
    f = tmp_path / "a.flac"
    assert cli.main(["-5", "-s", "--keep-foreign-metadata",
                     "-o", str(f), str(p)]) == 0
    out = tmp_path / "out.aiff"
    assert cli.main(["-d", "-s", "--keep-foreign-metadata",
                     "-o", str(out), str(f)]) == 0
    assert out.read_bytes() == aiff2


def test_if_present_flag_skips_silently(tmp_path):
    pcm = make_test_signal(8192)
    from flac_tpu import EncoderConfig
    from flac_tpu.encoder import encode_file_to_flac
    stream = encode_file_to_flac(pcm, EncoderConfig.from_preset(3))
    f = tmp_path / "plain.flac"
    f.write_bytes(stream)
    out = tmp_path / "out.wav"
    # decode of a stream with no foreign blocks: -if-present succeeds
    assert cli.main(["-d", "-s", "--keep-foreign-metadata-if-present",
                     "-o", str(out), str(f)]) == 0
    assert out.exists()
    with pytest.raises(SystemExit):
        cli.main(["-d", "-s", "--keep-foreign-metadata",
                  "-o", str(out), str(f)])
