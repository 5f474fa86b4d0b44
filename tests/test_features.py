"""Feature flags round 3: -e/-p, escape coding, loose mid-side,
--limit-min-bitrate, FLAC-to-FLAC re-encode, decode output formats,
--apply-replaygain.  Oracle-checked against the reference binary where
one exists (tools/build_reference.sh)."""

import io
import os
import subprocess

import numpy as np
import pytest

from flac_tpu import EncoderConfig
from flac_tpu import container
from flac_tpu.decoder import decode_stream_tpu
from flac_tpu.encoder import encode_file_to_flac

from conftest import make_test_signal


def _oracle_test(oracle, stream: bytes, tmp_path):
    p = tmp_path / "t.flac"
    p.write_bytes(stream)
    subprocess.run([oracle, "-t", "-s", str(p)], check=True,
                   capture_output=True)


def test_limit_min_bitrate(tmp_path, oracle_flac):
    """All-constant frames get a verbatim last subframe
    (stream_encoder.c:3874-3879)."""
    pcm = np.zeros((2, 4096 * 3), np.int32)  # silence = all constant
    base = EncoderConfig.from_preset(5)
    small = encode_file_to_flac(pcm, base)
    cfg = EncoderConfig.from_preset(5, limit_min_bitrate=True)
    big = encode_file_to_flac(pcm, cfg)
    assert len(big) > len(small) + 3 * 4096  # verbatim subframes are real
    st = decode_stream_tpu(big)
    assert np.array_equal(st.samples, pcm)
    _oracle_test(oracle_flac, big, tmp_path)


def test_loose_mid_side(tmp_path, oracle_flac):
    pcm = make_test_signal(44100)
    cfg = EncoderConfig.from_preset(5, loose_mid_side=True)
    stream = encode_file_to_flac(pcm, cfg)
    st = decode_stream_tpu(stream)
    assert np.array_equal(st.samples, pcm)
    _oracle_test(oracle_flac, stream, tmp_path)


def test_escape_coding_cost_table():
    """A uniform-width partition must pick the raw-bits escape."""
    import jax.numpy as jnp
    from flac_tpu.ops import rice as rice_ops
    n = 256
    u = np.full((1, n), 1 << 11, np.uint32)   # every value needs 12 bits
    bits_e, ks_e = rice_ops.partition_cost_table(
        jnp.asarray(u), jnp.zeros((1,), jnp.int32), n, 0, kmax=14,
        plen=4, escape=True)
    bits_p, ks_p = rice_ops.partition_cost_table(
        jnp.asarray(u), jnp.zeros((1,), jnp.int32), n, 0, kmax=14,
        plen=4)
    assert int(ks_e[0, 0, 0]) == rice_ops.ESCAPE_K_BASE + 12
    assert int(bits_e[0, 0]) < int(bits_p[0, 0])
    # escape cost = plen + 5 + n*rawbits (+6 added by caller, not here)
    assert int(bits_e[0, 0]) == 4 + 5 + n * 12


def test_escape_coding_roundtrip(tmp_path, oracle_flac):
    """Escaped partitions decode bit-exactly (ours and the reference)."""
    rng = np.random.default_rng(5)
    # uniform full-width noise: escape beats rice on many partitions
    pcm = rng.integers(-2048, 2048, (2, 4096 * 2), dtype=np.int32)
    cfg = EncoderConfig.from_preset(5, do_escape_coding=True)
    stream = encode_file_to_flac(pcm, cfg)
    plain = encode_file_to_flac(pcm, EncoderConfig.from_preset(5))
    assert len(stream) <= len(plain)
    st = decode_stream_tpu(stream)
    assert np.array_equal(st.samples, pcm)
    _oracle_test(oracle_flac, stream, tmp_path)


def test_qlp_precision_search(tmp_path, oracle_flac):
    """-p explores a precision superset of the default, so with exact
    costs the stream is never larger."""
    pcm = make_test_signal(4096 * 4)
    base = encode_file_to_flac(pcm, EncoderConfig.from_preset(5),
                               batch_frames=8)
    cfg = EncoderConfig.from_preset(5, do_qlp_coeff_prec_search=True)
    searched = encode_file_to_flac(pcm, cfg, batch_frames=8)
    assert len(searched) <= len(base)
    st = decode_stream_tpu(searched)
    assert np.array_equal(st.samples, pcm)
    _oracle_test(oracle_flac, searched, tmp_path)


def test_exhaustive_model_search(tmp_path, oracle_flac):
    pcm = make_test_signal(4096 * 4)
    base = encode_file_to_flac(pcm, EncoderConfig.from_preset(5),
                               batch_frames=8)
    cfg = EncoderConfig.from_preset(5, do_exhaustive_model_search=True)
    searched = encode_file_to_flac(pcm, cfg, batch_frames=8)
    assert len(searched) <= len(base)
    st = decode_stream_tpu(searched)
    assert np.array_equal(st.samples, pcm)
    _oracle_test(oracle_flac, searched, tmp_path)


def test_flac_to_flac_reencode():
    """encode.c:805: .flac input re-encodes, preserving metadata."""
    from flac_tpu import metadata as md
    from flac_tpu import format as fmt
    pcm = make_test_signal(30000)
    vc = md.VorbisCommentBlock()
    vc.comments.append("TITLE=roundtrip")
    first = encode_file_to_flac(pcm, EncoderConfig.from_preset(3),
                                extra_metadata=[(vc.TYPE, vc.to_bytes())])
    info = container.sniff_and_read(first)
    assert info.bits_per_sample == 16 and info.channels == 2
    assert np.array_equal(info.samples, pcm)
    assert any(t == fmt.METADATA_TYPE_VORBIS_COMMENT
               for t, _ in info.metadata)
    second = encode_file_to_flac(
        pcm, EncoderConfig.from_preset(8),
        extra_metadata=list(info.metadata))
    chain = md.Chain.read(second)
    vc2 = chain.get(fmt.METADATA_TYPE_VORBIS_COMMENT)
    assert vc2 is not None and "TITLE=roundtrip" in vc2.comments
    st = decode_stream_tpu(second)
    assert np.array_equal(st.samples, pcm)


@pytest.mark.parametrize("fmt_name", ["wav", "rf64", "w64", "aiff",
                                      "aiff-c-none", "aiff-c-sowt", "raw"])
def test_decode_output_formats(fmt_name):
    """Every decode writer round-trips through its own reader."""
    pcm = make_test_signal(10000, bps=16)
    rate, bps = 44100, 16
    if fmt_name == "wav":
        blob = container.write_wav(pcm, rate, bps)
        back = container.read_wav(blob)
    elif fmt_name == "rf64":
        blob = container.write_rf64(pcm, rate, bps)
        back = container.read_wav(blob)
    elif fmt_name == "w64":
        blob = container.write_w64(pcm, rate, bps)
        back = container.read_w64(blob)
    elif fmt_name == "aiff":
        blob = container.write_aiff(pcm, rate, bps)
        back = container.read_aiff(blob)
    elif fmt_name == "aiff-c-none":
        blob = container.write_aiff(pcm, rate, bps, compression=b"NONE")
        back = container.read_aiff(blob)
    elif fmt_name == "aiff-c-sowt":
        blob = container.write_aiff(pcm, rate, bps, compression=b"sowt")
        back = container.read_aiff(blob)
    else:
        blob = container.write_raw(pcm, bps)
        back = container.read_raw(blob, sample_rate=rate, channels=2,
                                  bits_per_sample=bps)
    assert back.samples.shape == pcm.shape or fmt_name == "raw"
    assert np.array_equal(back.samples[:, :pcm.shape[1]], pcm)
    if fmt_name != "raw":
        assert back.sample_rate == rate and back.bits_per_sample == bps


def test_wav_extensible_24bit_oracle(tmp_path, oracle_flac):
    """24-bit WAV uses WAVEFORMATEXTENSIBLE and the reference accepts
    it (decode.c:121-132 rule)."""
    pcm = make_test_signal(8192, bps=24)
    blob = container.write_wav(pcm, 44100, 24)
    w = tmp_path / "x.wav"
    w.write_bytes(blob)
    out = tmp_path / "x.flac"
    subprocess.run([oracle_flac, "-s", "-5", "-o", str(out), str(w)],
                   check=True, capture_output=True)
    assert out.exists()


def test_apply_replaygain_on_decode():
    """--apply-replaygain wiring: decode applies the stored track gain."""
    from flac_tpu.cli import apply_replaygain_on_decode
    from flac_tpu import metadata as md
    pcm = make_test_signal(30000)
    vc = md.VorbisCommentBlock()
    vc.comments += ["REPLAYGAIN_TRACK_GAIN=-6.00 dB",
                    "REPLAYGAIN_TRACK_PEAK=0.50000000"]
    stream = encode_file_to_flac(pcm, EncoderConfig.from_preset(3),
                                 extra_metadata=[(vc.TYPE, vc.to_bytes())])
    st = decode_stream_tpu(stream)
    out = apply_replaygain_on_decode(stream, st, "0tn0", "x")
    scale = 10.0 ** (-6.0 / 20.0)
    got = out[:, 1000:2000].astype(np.float64)
    want = pcm[:, 1000:2000] * scale
    assert np.abs(got - want).max() <= 1.0   # rounding only
    # album requested but only track tags present -> falls back to track
    out2 = apply_replaygain_on_decode(stream, st, "0an0", "x")
    assert np.array_equal(out, out2)


def _run_cli(argv, stdin: bytes | None = None):
    """Run our CLI in a subprocess (pipes need real stdio)."""
    import subprocess
    import sys
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run(
        [sys.executable, "-m", "flac_tpu.cli", *argv],
        input=stdin, capture_output=True, env=env, timeout=600)


def test_cli_stdin_stdout_pipes(tmp_path):
    """Encode from stdin '-' to stdout '-' and decode back the same way
    (pervasive in the reference's shell tests)."""
    pcm = make_test_signal(192 * 3, channels=2)
    wav = container.write_wav(pcm, 44100, 16)
    r = _run_cli(["-1", "-b", "192", "-s", "-o", "-", "-"], stdin=wav)
    assert r.returncode == 0, r.stderr.decode()
    stream = r.stdout
    assert stream[:4] == b"fLaC"
    r2 = _run_cli(["-d", "-s", "-o", "-", "-"], stdin=stream)
    assert r2.returncode == 0, r2.stderr.decode()
    back = container.read_wav(r2.stdout)
    assert np.array_equal(back.samples, pcm)


def test_cli_input_size_raw_stdin(tmp_path):
    """--input-size truncates raw stdin input (main.c:182)."""
    pcm = make_test_signal(192 * 2, channels=1)
    raw = container.write_raw(pcm, 16)
    keep = 192 * 2  # bytes -> 192 samples mono 16-bit
    r = _run_cli(["-1", "-b", "192", "-s", "--force-raw-format",
                  "--channels", "1", "--bps", "16", "--sample-rate",
                  "44100", "--input-size", str(keep), "-o", "-", "-"],
                 stdin=raw)
    assert r.returncode == 0, r.stderr.decode()
    st = decode_stream_tpu(r.stdout, engine="host")
    assert st.samples.shape == (1, 192)
    assert np.array_equal(st.samples, pcm[:, :192])


def test_cli_tag_from_file_and_no_utf8(tmp_path):
    """--tag-from-file reads the value from a file; --no-utf8-convert is
    accepted (main.c:135,204)."""
    from flac_tpu.metadata import Chain
    pcm = make_test_signal(192 * 2, channels=2)
    wav = tmp_path / "in.wav"
    wav.write_bytes(container.write_wav(pcm, 44100, 16))
    val = tmp_path / "desc.txt"
    val.write_text("hello from a file\n")
    out = tmp_path / "out.flac"
    r = _run_cli(["-1", "-b", "192", "-s", "-f", "--no-utf8-convert",
                  "--tag-from-file", f"DESCRIPTION={val}",
                  "-T", "TITLE=x", "-o", str(out), str(wav)])
    assert r.returncode == 0, r.stderr.decode()
    chain = Chain.read(out.read_bytes())
    vc = next(b for b in chain.blocks
              if type(b).__name__ == "VorbisCommentBlock")
    assert "DESCRIPTION=hello from a file" in vc.comments
    assert "TITLE=x" in vc.comments
