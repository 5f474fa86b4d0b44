"""Golden-file metaflac parity: our `metaflac_cli --list` output must be
byte-identical to the reference metaflac's on the same file — the
reference's test_metaflac.sh + metaflac.flac.ok tier, anchored live
against the built binary instead of a checked-in .ok file (so it also
covers files OUR encoder writes)."""

import os
import subprocess

import numpy as np
import pytest

from flac_tpu import EncoderConfig
from flac_tpu.encoder import encode_file_to_flac

from conftest import make_test_signal

REF_METAFLAC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".ref_build/src/metaflac/metaflac")

pytestmark = pytest.mark.skipif(not os.path.exists(REF_METAFLAC),
                                reason="reference metaflac not built")


def _ours(args):
    import sys
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, "-m", "flac_tpu.metaflac_cli"]
                       + args, capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr
    return r.stdout


def _ref(args):
    r = subprocess.run([REF_METAFLAC] + args, capture_output=True,
                       text=True)
    assert r.returncode == 0, r.stderr
    return r.stdout


@pytest.fixture(scope="module")
def rich_flac(tmp_path_factory):
    d = tmp_path_factory.mktemp("golden")
    pcm = make_test_signal(4096 * 2)
    stream = encode_file_to_flac(pcm, EncoderConfig.from_preset(5),
                                 padding=256)
    f = d / "g.flac"
    f.write_bytes(stream)
    pic = d / "p.jpg"
    pic.write_bytes(b"\xff\xd8\xff\xe0fakejpegpayload\x01\x02\x03")
    from flac_tpu.metaflac_cli import main
    assert main([f"--set-tag=ARTIST=Gölden", "--set-tag=TITLE=A=B",
                 str(f)]) == 0
    assert main([f"--import-picture-from=3|image/jpeg|désc|8x8x24|"
                 f"{pic}", str(f)]) == 0
    return str(f)


def test_list_golden(rich_flac):
    assert _ours(["--list", rich_flac]) == _ref(["--list", rich_flac])


def test_list_block_filters_golden(rich_flac):
    for sel in (["--block-number=0"], ["--block-number=1,2"],
                ["--block-type=VORBIS_COMMENT"],
                ["--block-type=PICTURE"],
                ["--except-block-type=PADDING"]):
        assert _ours(["--list", *sel, rich_flac]) == \
            _ref(["--list", *sel, rich_flac]), f"drift with {sel}"


def test_show_queries_golden(rich_flac):
    for q in ("--show-min-blocksize", "--show-max-blocksize",
              "--show-sample-rate", "--show-channels", "--show-bps",
              "--show-total-samples", "--show-md5sum",
              "--show-vendor-tag"):
        assert _ours([q, rich_flac]) == _ref([q, rich_flac]), \
            f"drift with {q}"


def test_export_tags_golden(rich_flac, tmp_path):
    a, b = tmp_path / "ours.txt", tmp_path / "ref.txt"
    assert _ours([f"--export-tags-to={a}", rich_flac]) is not None
    _ref([f"--export-tags-to={b}", rich_flac])
    assert a.read_bytes() == b.read_bytes()
