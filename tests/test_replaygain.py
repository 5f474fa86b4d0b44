"""ReplayGain analysis/synthesis tests (vs replaygain_analysis.c semantics
and the reference metaflac oracle when available)."""

import numpy as np
import pytest

from flac_tpu import replaygain as rg


def _tone(n=44100 * 2, seed=7):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 44100
    sig = (8000 * np.sin(2 * np.pi * 440 * t)
           + rng.normal(0, 1200, n)).astype(np.int32)
    return np.stack([sig, (0.7 * sig).astype(np.int32)])


def test_chunked_equals_oneshot():
    pcm = _tone()
    a1 = rg.GainAnalyzer(44100)
    a1.analyze_pcm(pcm, 16)
    a2 = rg.GainAnalyzer(44100)
    pos = 0
    for sz in [1, 7, 999, 44100, 12345, 10 ** 9]:
        a2.analyze_pcm(pcm[:, pos:pos + sz], 16)
        pos += sz
        if pos >= pcm.shape[1]:
            break
    g1, g2 = a1.title_gain(), a2.title_gain()
    assert g1 is not None and abs(g1 - g2) < 1e-9


def test_known_gain_value():
    """Pinned against the reference metaflac --add-replay-gain output for
    this exact signal (verified 2026-08: -1.48 dB / 0.39880371)."""
    pcm = _tone()
    an = rg.GainAnalyzer(44100)
    an.analyze_pcm(pcm, 16)
    assert f"{an.title_gain():+.2f}" == "-1.48"
    assert f"{an.track_peak:.8f}" == "0.39880371"


def test_album_vs_track():
    an = rg.GainAnalyzer(44100)
    an.analyze_pcm(_tone(seed=1), 16)
    g1 = an.title_gain()
    an.next_track()
    an.analyze_pcm(_tone(seed=2) // 4, 16)   # quieter track
    g2 = an.title_gain()
    ga = an.album_gain()
    assert g2 > g1            # quieter -> more positive gain
    assert min(g1, g2) <= ga <= max(g1, g2)


def test_downsampled_rates():
    pcm = _tone()
    for rate in (88200, 96000, 192000):
        an = rg.GainAnalyzer(rate)
        an.analyze_pcm(pcm, 16)
        assert an.title_gain() is not None
    assert not rg.valid_sample_rate(44101)
    with pytest.raises(ValueError):
        rg.GainAnalyzer(44101)


def test_bps_scaling_invariance():
    """The same waveform at 16 and 24 bps must analyze identically
    (grabbag scaling, grabbag/replaygain.c:183-187)."""
    pcm16 = _tone()
    a16 = rg.GainAnalyzer(44100)
    a16.analyze_pcm(pcm16, 16)
    a24 = rg.GainAnalyzer(44100)
    a24.analyze_pcm(pcm16 * 256, 24)
    assert abs(a16.title_gain() - a24.title_gain()) < 1e-9
    assert abs(a16.track_peak - a24.track_peak) < 1e-12


def test_apply_gain_identity_and_limit():
    pcm = _tone()[:, :2000]
    out = rg.apply_gain(pcm, 16, 16, 1.0)
    assert np.array_equal(out, pcm)
    boomed = rg.apply_gain(pcm, 16, 16, 100.0, hard_limit=True)
    assert boomed.max() <= 32767 and boomed.min() >= -32768
    # 16 -> 24 upshift: scale 1 maps sample s to s*256 (within rounding)
    up = rg.apply_gain(pcm, 16, 24, 1.0)
    assert np.abs(up - pcm.astype(np.int64) * 256).max() <= 128


def test_apply_gain_dither_bounded():
    pcm = _tone()[:, :500]
    for shaping in (0, 1, 2, 3):
        d = rg.DitherContext(16, shaping)
        out = rg.apply_gain(pcm, 16, 16, 0.5, dither=d)
        ref = rg.apply_gain(pcm, 16, 16, 0.5)
        # bound scales with the shaping filter's error-feedback gain
        # (sum |taps| ~ 15 for F44_3, and the feedback loop can transiently
        # ring to ~2x that); dither itself is +-0.5 LSB pre-shaping
        assert np.abs(out.astype(np.int64)
                      - ref.astype(np.int64)).max() <= 64, shaping


def test_tag_format():
    tags = dict(rg.format_tags(-1.484, 0.398803711, 2.0, 0.5))
    assert tags["REPLAYGAIN_TRACK_GAIN"] == "-1.48 dB"
    assert tags["REPLAYGAIN_TRACK_PEAK"] == "0.39880371"
    assert tags["REPLAYGAIN_REFERENCE_LOUDNESS"] == "89.0 dB"
    assert tags["REPLAYGAIN_ALBUM_GAIN"] == "+2.00 dB"
    assert rg.parse_gain_tag("-6.54 dB") == -6.54
    assert rg.parse_gain_tag("junk") is None
