"""Window-family and -A mini-language tests (vs window.c:50-292 and
FLAC__stream_encoder_set_apodization, stream_encoder.c:1940-2065)."""

import numpy as np
import pytest

from flac_tpu.ops import windows as W


ALL_SIMPLE = ["bartlett", "bartlett_hann", "blackman",
              "blackman_harris_4term_92db", "connes", "flattop", "hamming",
              "hann", "kaiser_bessel", "nuttall", "rectangle", "triangle",
              "welch"]


@pytest.mark.parametrize("name", ALL_SIMPLE)
def test_simple_window_shape(name):
    for L in (256, 4095, 4096):
        w = getattr(W, name)(L)
        assert w.shape == (L,) and w.dtype == np.float32
        # all these windows are symmetric
        assert np.allclose(w, w[::-1], atol=2e-7), name
        assert np.all(np.isfinite(w))


def test_window_endpoint_values():
    # spot values straight from the formulas
    assert W.rectangle(8).tolist() == [1.0] * 8
    h = W.hann(101)
    assert h[0] == 0.0 and abs(h[50] - 1.0) < 1e-7
    assert abs(W.hamming(101)[0] - 0.08) < 1e-6
    b = W.blackman(101)
    assert abs(b[0]) < 1e-7
    g = W.gauss(101, 0.25)
    assert abs(g[50] - 1.0) < 1e-7
    # out-of-range stddev defaults to 0.25 (window.c:124-127)
    assert np.allclose(W.gauss(101, 0.9), W.gauss(101, 0.25))


def test_tukey_family():
    assert np.allclose(W.tukey(512, 0.0), W.rectangle(512))
    assert np.allclose(W.tukey(512, 1.0), W.hann(512))
    t = W.tukey(512, 0.5)
    assert t[256] == 1.0 and t[0] == 0.0
    # partial: zero outside [start, end)
    p = W.partial_tukey(1000, 0.2, 0.25, 0.75)
    assert np.all(p[:250] == 0) and np.all(p[750:] == 0)
    assert p[500] == 1.0
    # punchout: zero INSIDE [start, end), nonzero flat outside
    q = W.punchout_tukey(1000, 0.2, 0.25, 0.75)
    assert np.all(q[250:750] == 0)
    assert q[125] == 1.0 and q[875] == 1.0


def test_parser_full_language():
    # every family parses; junk and out-of-range entries are skipped
    spec = ";".join(ALL_SIMPLE + ["gauss(0.3)", "tukey(0.25)",
                                  "partial_tukey(2)", "punchout_tukey(3)",
                                  "subdivide_tukey(3/0.9)", "nonsense",
                                  "gauss(0.7)", "tukey(1.5)"])
    out = W.parse_specs(spec)
    joined = ";".join(out)
    assert "nonsense" not in joined
    assert "gauss(0.7)" not in joined
    assert "tukey(1.5)" not in joined
    assert sum(s.startswith("partial_tukey_one") for s in out) == 2
    assert sum(s.startswith("punchout_tukey_one") for s in out) == 3
    # subdivide p is stored as p/parts (stream_encoder.c:2045)
    assert any(s.startswith("subdivide_tukey(3/0.3") for s in out)


def test_parser_defaults_and_cap():
    assert W.parse_specs("") == ("tukey(0.5)",)
    assert W.parse_specs("garbage") == ("tukey(0.5)",)
    # partial_tukey(1) degrades to tukey(p) (stream_encoder.c:2003)
    assert W.parse_specs("partial_tukey(1/0.2/0.7)") == ("tukey(0.7)",)
    out = W.parse_specs(";".join(["hann"] * 50))
    assert len(out) == W.MAX_APODIZATIONS


def test_expand_bank_combine_rows():
    wins, comb, names = W.expand_bank(
        4096, W.parse_specs("hann;subdivide_tukey(3)"))
    assert comb.shape[0] == len(names)
    assert comb.shape[1] == wins.shape[0]
    # every plain row selects exactly one window with weight 1
    assert comb[0].sum() == 1.0 and (comb[0] != 0).sum() == 1
    # punchout rows are root - partial
    punch = [i for i, n in enumerate(names) if n.endswith("^c")]
    assert punch and all((comb[i] == 1).sum() == 1
                         and (comb[i] == -1).sum() == 1 for i in punch)


def test_bank_builder_integration():
    from flac_tpu.ops.lpc import build_apodization_bank
    bank = build_apodization_bank(1024, ("tukey(5e-1)", "hann"))
    assert bank.windows.shape == (2, 1024)
    assert bank.combine.shape == (2, 2)
