"""Pathological-signal corpus: the reference's test_streams tier
(src/test_streams/main.c:224-430,975-1266 generators; test/test_streams.sh
matrix), rebuilt as pytest fixtures.

Every signal round-trips through OUR encoder and is verified two ways:
  1. our fast decoder reproduces the input bit-exactly;
  2. the reference binary accepts the stream (`flac -t` = full decode +
     MD5-vs-STREAMINFO check, decode.c:117).

Signals: full-scale deflection patterns (fsd8/16/24/32), crafted
wasted-bits (wbps16), sines and uniform noise at 8/12/16/20/24/32 bps,
and one/few-sample degenerate streams.  One blocksize everywhere keeps
the compile count bounded.
"""

import subprocess

import numpy as np
import pytest

from flac_tpu import EncoderConfig
from flac_tpu.decoder import decode_stream_tpu
from flac_tpu.encoder import encode_file_to_flac

# the reference's deflection patterns (main.c:1341-1347)
_PATTERNS = {
    "p01": (1, -1),
    "p02": (1, 1, -1),
    "p03": (1, -1, -1),
    "p04": (1, -1, 1, -1),
    "p05": (1, -1, -1, 1),
    "p06": (1, -1, 1, 1, -1),
    "p07": (1, -1, -1, 1, -1),
}


def fsd(bps: int, pattern: tuple, samples: int = 4096) -> np.ndarray:
    """Full-scale deflection: alternating +max/-min (generate_fsd*);
    length padded to a blocksize multiple so no extra partial-block
    programs compile."""
    hi, lo = (1 << (bps - 1)) - 1, -(1 << (bps - 1))
    seq = np.array([hi if p > 0 else lo for p in pattern], np.int64)
    return np.resize(seq, samples)[None, :].astype(np.int32)


def wbps16(samples: int = 8192) -> np.ndarray:
    """Crafted wasted-bits stereo (generate_wbps16, main.c:358-380)."""
    s = np.arange(samples)
    left = ((s % 2000) << 2).astype(np.int16).astype(np.int32)
    right = ((s % 1000) << 3).astype(np.int16).astype(np.int32)
    return np.stack([left, right])


def sine(bps: int, channels: int, samples: int = 8192) -> np.ndarray:
    """Dual-tone full-scale sine at width bps (generate_sine*)."""
    full = (1 << (bps - 1)) - 1
    t = np.arange(samples) / 44100.0
    out = []
    for c in range(channels):
        x = 0.49 * np.sin(2 * np.pi * 441.0 * t + c) \
            + 0.49 * np.sin(2 * np.pi * 1301.0 * t)
        out.append(np.round(x * full))
    return np.asarray(out, np.int64).clip(
        -(1 << (bps - 1)), full).astype(np.int32)


def noise(bps: int, channels: int, samples: int = 8192) -> np.ndarray:
    """Uniform full-range noise at width bps (generate_noise)."""
    rng = np.random.default_rng(bps * 7 + channels)
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    return rng.integers(lo, hi + 1, (channels, samples),
                        dtype=np.int64).astype(np.int32)


def _roundtrip(pcm: np.ndarray, bps: int, preset: int, oracle_flac,
               tmp_path, **cfg_kw):
    # blocksize 1024 everywhere: the corpus stresses SIGNAL pathology,
    # and the smaller graphs compile ~3x faster than 4096 (the whole
    # file is compile-dominated on a cold cache)
    cfg_kw.setdefault("blocksize", 1024)
    cfg = EncoderConfig.from_preset(
        preset, channels=pcm.shape[0], bits_per_sample=bps, **cfg_kw)
    stream = encode_file_to_flac(pcm, cfg, batch_frames=4)
    st = decode_stream_tpu(stream)
    assert np.array_equal(st.samples, pcm), "our decode mismatch"
    f = tmp_path / "s.flac"
    f.write_bytes(stream)
    r = subprocess.run([oracle_flac, "-t", "-s", str(f)],
                       capture_output=True)
    assert r.returncode == 0, f"flac -t rejected stream: {r.stderr!r}"
    return stream


@pytest.mark.parametrize("bps", [8, 16, 24, 32])
@pytest.mark.parametrize("pat", ["p01", "p04", "p07"])
def test_full_scale_deflection(bps, pat, oracle_flac, tmp_path):
    _roundtrip(fsd(bps, _PATTERNS[pat]), bps, 8, oracle_flac, tmp_path)


def test_full_scale_deflection_all_patterns_p5(oracle_flac, tmp_path):
    """Every deflection pattern at 16 bps, preset 5."""
    for pat in _PATTERNS.values():
        _roundtrip(fsd(16, pat), 16, 5, oracle_flac, tmp_path)


def test_wasted_bps(oracle_flac, tmp_path):
    """Crafted wasted-bits signal at -0/-5/-8 (wasted-bits detection +
    subframe header unary coding)."""
    pcm = wbps16()
    for preset in (0, 5, 8):
        _roundtrip(pcm, 16, preset, oracle_flac, tmp_path)


@pytest.mark.parametrize("bps", [8, 12, 16, 20, 24, 32])
def test_sine_widths(bps, oracle_flac, tmp_path):
    _roundtrip(sine(bps, 2), bps, 5, oracle_flac, tmp_path)


@pytest.mark.parametrize("bps", [8, 12, 20, 32])
def test_noise_widths(bps, oracle_flac, tmp_path):
    """Incompressible noise at every width: exercises escape/verbatim
    fallbacks and the exact-cost search's upper bounds."""
    _roundtrip(noise(bps, 2), bps, 5, oracle_flac, tmp_path)


def test_degenerate_tiny_streams(oracle_flac, tmp_path):
    """1-sample mono/stereo and 5-sample streams (generate_01..04)."""
    one_mono = np.array([[-32768]], np.int32)
    one_stereo = np.array([[-32768], [32767]], np.int32)
    five = np.array([[-32768, -16384, 0, 16383, 32767]], np.int32)
    for pcm in (one_mono, one_stereo, five):
        _roundtrip(pcm, 16, 5, oracle_flac, tmp_path)


def test_exhaustive_flags_on_pathological(oracle_flac, tmp_path):
    """-e / -p / -M against deflection + wasted signals (the reference
    matrix crosses these flags with every stream; we cross them with the
    most adversarial ones)."""
    pcm_fsd = fsd(16, _PATTERNS["p04"])
    pcm_w = wbps16(4096)
    _roundtrip(pcm_fsd, 16, 5, oracle_flac, tmp_path,
               do_exhaustive_model_search=True)
    _roundtrip(pcm_w, 16, 5, oracle_flac, tmp_path,
               do_qlp_coeff_prec_search=True)
    _roundtrip(np.concatenate([pcm_fsd, pcm_fsd], axis=0)[:2], 16, 5,
               oracle_flac, tmp_path, loose_mid_side=True,
               do_mid_side=True)


def test_silence_and_dc(oracle_flac, tmp_path):
    """All-zero and constant-DC signals: constant subframes end-to-end."""
    z = np.zeros((2, 8192), np.int32)
    dc = np.full((2, 8192), -1234, np.int32)
    _roundtrip(z, 16, 8, oracle_flac, tmp_path)
    _roundtrip(dc, 16, 0, oracle_flac, tmp_path)
