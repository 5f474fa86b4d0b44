"""Cuesheet mini-language tests (vs grabbag/cuesheet.c semantics;
import/export verified byte-identical against reference metaflac)."""

import pytest

from flac_tpu.cuesheet import (CueSheetParseError, emit_cuesheet,
                               parse_cuesheet)
from flac_tpu.metadata import CueSheetBlock

CUE = """\
CATALOG 1234567890123
FILE "dummy.wav" WAVE
  TRACK 01 AUDIO
    ISRC USRC17607839
    INDEX 01 00:00:00
  TRACK 02 AUDIO
    FLAGS PRE
    INDEX 00 00:01:70
    INDEX 01 00:02:00
"""


def test_parse_cdda():
    cs = parse_cuesheet(CUE, 44100, True, 44100 * 4)
    assert cs.is_cd and cs.lead_in == 88200
    assert cs.media_catalog_number.rstrip(b"\x00") == b"1234567890123"
    assert len(cs.tracks) == 3          # 2 + forced lead-out
    t1, t2, lo = cs.tracks
    assert t1.number == 1 and t1.offset == 0
    assert t1.isrc == b"USRC17607839"
    assert [i.number for i in t1.indices] == [1]
    assert t2.number == 2 and t2.pre_emphasis
    # INDEX 00 at 00:01:70 = 44100 + 70*588 samples; track offset = first
    # index, second index stored relative
    assert t2.offset == 44100 + 70 * 588
    assert [(i.number, i.offset) for i in t2.indices] == [
        (0, 0), (1, 2 * 44100 - t2.offset)]
    assert lo.number == 170 and lo.offset == 44100 * 4


def test_binary_roundtrip():
    cs = parse_cuesheet(CUE, 44100, True, 44100 * 4)
    body = cs.to_bytes()
    cs2 = CueSheetBlock.parse(body)
    assert cs2.to_bytes() == body
    assert emit_cuesheet(cs2, '"x.flac" FLAC') == \
        emit_cuesheet(cs, '"x.flac" FLAC')


def test_emit_parse_roundtrip():
    cs = parse_cuesheet(CUE, 44100, True, 44100 * 4)
    text = emit_cuesheet(cs, '"x.flac" FLAC')
    assert "REM FLAC__lead-in 88200" in text
    assert "REM FLAC__lead-out 170 176400" in text
    cs2 = parse_cuesheet(text, 44100, True, 44100 * 4)
    assert cs2.to_bytes() == cs.to_bytes()


def test_non_cdda_extensions():
    cue = """\
TRACK 01 AUDIO
  INDEX 01 0
TRACK 02 AUDIO
  INDEX 01 96000
"""
    cs = parse_cuesheet(cue, 96000, False, 96000 * 3)
    assert not cs.is_cd and cs.lead_in == 0
    assert cs.tracks[1].offset == 96000
    assert cs.tracks[-1].number == 255
    # MM:SS.SS form
    cs2 = parse_cuesheet("TRACK 1 AUDIO\n  INDEX 1 0:01.5\n",
                         96000, False, 96000 * 3)
    assert cs2.tracks[0].offset == 144000


@pytest.mark.parametrize("cue,msg", [
    ("", "at least one TRACK"),
    ("TRACK 01 AUDIO\n", "at least one INDEX"),
    ("INDEX 01 00:00:00\n", "INDEX before any TRACK"),
    ("TRACK 01 AUDIO\n  INDEX 02 00:00:00\n", "must be 0 or 1"),
    ("TRACK 01 AUDIO\n  INDEX 01 00:00:00\n  INDEX 03 00:01:00\n",
     "sequential"),
    ("CATALOG 123\nTRACK 01 AUDIO\n  INDEX 01 00:00:00\n",
     "13 decimal digits"),
    ("TRACK 01 AUDIO\n  INDEX 01 00:00:01\n", "offset of 00:00:00"),
    ("TRACK 00 AUDIO\n", "greater than 0"),
    ("TRACK 01 AUDIO\n  ISRC bogus\n  INDEX 01 00:00:00\n",
     "invalid ISRC"),
    ("CATALOG 1234567890123\nCATALOG 1234567890123\n",
     "multiple CATALOG"),
])
def test_cdda_validation_errors(cue, msg):
    with pytest.raises(CueSheetParseError, match=msg):
        parse_cuesheet(cue, 44100, True, 44100)


def test_msf_requires_divisible_rate():
    with pytest.raises(CueSheetParseError, match="multiple of 75"):
        parse_cuesheet("TRACK 1 AUDIO\n  INDEX 1 00:00:01\n",
                       44101, False, 44101)
