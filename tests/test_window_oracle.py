"""Window-bank oracle: every apodization family must produce a stream no
larger than the reference's with the same -A spec (window.c:50-292 — the
formulas feed size parity, so each family gets one cross-check)."""

import io
import subprocess

import pytest

from flac_tpu import EncoderConfig, container
from flac_tpu.encoder import StreamEncoder

from conftest import make_test_signal

FAMILIES = [
    "bartlett", "bartlett_hann", "blackman", "blackman_harris_4term_92db",
    "connes", "flattop", "gauss(0.2)", "hamming", "hann", "kaiser_bessel",
    "nuttall", "rectangle", "triangle", "tukey(5e-1)", "welch",
    "partial_tukey(2)", "punchout_tukey(3)", "subdivide_tukey(3)",
]

N = 512


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    pcm = make_test_signal(N * 8, seed=11)
    d = tmp_path_factory.mktemp("winoracle")
    wav = d / "in.wav"
    wav.write_bytes(container.write_wav(pcm, 44100, 16))
    return pcm, wav, d


@pytest.mark.parametrize("family", FAMILIES)
def test_family_size_parity(family, corpus, oracle_flac):
    pcm, wav, d = corpus
    ref = d / "ref.flac"
    subprocess.run(
        [oracle_flac, "-5", "-f", "-s", "-b", str(N), "-A", family,
         "--no-padding", "--no-seektable", "-o", str(ref), str(wav)],
        check=True, capture_output=True)
    cfg = EncoderConfig.from_preset(5, blocksize=N,
                                    apodizations=(family,))
    buf = io.BytesIO()
    enc = StreamEncoder(buf, cfg, padding=0)
    enc.process(pcm)
    enc.finish()
    ours = len(buf.getvalue())
    assert ours <= ref.stat().st_size, (
        f"-A {family}: ours {ours} > libFLAC {ref.stat().st_size}")
