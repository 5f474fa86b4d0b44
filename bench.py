#!/usr/bin/env python
"""Benchmark: FLAC -8 encode + decode throughput on TPU vs single-core
libFLAC, self-anchoring.

stdout: ONE JSON line
  {"metric": "encode_throughput_flac8_1chip", "value": N, "unit": "GB/s",
   "vs_baseline": N}
stderr: a decode-metric JSON line (same schema) + an extras JSON line.

The bench is self-checking:
  - the reference binary is built from /root/reference if missing and the
    bench FAILS if it cannot be built (no fallback constants);
  - the timed super-chunk output itself is decoded and must match the
    input bit-exactly (MD5-verified);
  - our compressed size must be <= libFLAC's at the same preset
    (test_compression.sh:34-46 is the reference's analogous gate).

Measures the REAL product paths: encode = StreamEncoder super-chunk
dispatch, lengths-first exact fetch, MD5 worker, ordered assembly;
decode = native bit-parse + batched device restore (decoder_fast).
One warm-up pass pays the one-time costs a production process pays once
(jit compiles; the tunnel's cold d2h path, reported as cold_start_s).
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)

REFERENCE_FLAC = os.path.join(ROOT, ".ref_build/src/flac/flac")

PRESET = 8
RATE = 44100
B_BATCH = 128
SUPER = 4              # batches per super-chunk
N = 4096
N_BLOCKS = 2560        # ~4 min stereo: 5 super-chunks of 512 frames


def make_corpus(n_blocks: int) -> np.ndarray:
    """Mixed-content corpus: 2/3 multi-tone music stand-in, 1/6 transient
    material (clicks + square bursts), 1/6 near-silence — so the <=-size
    gate is not resting on one smooth synthetic
    (test/test_compression.sh:34-46 is the reference's analogous check)."""
    rng = np.random.default_rng(42)
    n = n_blocks * N
    t = np.arange(n) / RATE
    sig = np.zeros((2, n))
    for c in range(2):
        for f, a in ((220 * (c + 1), 0.35), (440, 0.2), (880, 0.1),
                     (1230.5, 0.08), (3733.1, 0.04)):
            sig[c] += a * np.sin(2 * np.pi * f * t + c)
        sig[c] += 0.03 * rng.standard_normal(n)
    env = 0.15 + 0.85 * (0.5 + 0.5 * np.sin(2 * np.pi * 0.25 * t))
    pcm = np.round(np.clip(sig * env * 0.6, -1, 1) * 32767)

    s1 = n * 2 // 3
    s2 = n * 5 // 6
    # transients: sparse full-scale clicks over decaying square bursts
    tr = np.zeros((2, s2 - s1))
    burst = np.sign(np.sin(2 * np.pi * 311 * t[: s2 - s1]))
    gate = (np.sin(2 * np.pi * 3.0 * t[: s2 - s1]) > 0.7)
    tr += 12000 * burst * gate
    clicks = rng.integers(0, s2 - s1, 400)
    tr[:, clicks] = rng.choice([-30000, 30000], (2, 400))
    pcm[:, s1:s2] = tr
    # near-silence with +/-1 LSB dither
    pcm[:, s2:] = rng.integers(-1, 2, (2, n - s2))
    return pcm.astype(np.int32)


def make_hires_corpus(seconds: float = 20.0) -> np.ndarray:
    """24-bit / 96 kHz stereo corpus (BASELINE.md's hi-res configs row)."""
    rng = np.random.default_rng(7)
    rate = 96000
    n = (int(seconds * rate) // N) * N
    t = np.arange(n) / rate
    sig = np.zeros((2, n))
    for c in range(2):
        for f, a in ((330 * (c + 1), 0.3), (997, 0.15), (7919, 0.05)):
            sig[c] += a * np.sin(2 * np.pi * f * t + 0.3 * c)
        sig[c] += 0.002 * rng.standard_normal(n)
    return np.round(np.clip(sig * 0.7, -1, 1)
                    * ((1 << 23) - 1)).astype(np.int32)


def ensure_reference() -> str:
    """Locate or build the reference flac binary; fail loudly otherwise."""
    if os.path.exists(REFERENCE_FLAC):
        return REFERENCE_FLAC
    script = os.path.join(ROOT, "tools", "build_reference.sh")
    print("building reference binary...", file=sys.stderr)
    r = subprocess.run(["bash", script], capture_output=True, text=True)
    if r.returncode != 0 or not os.path.exists(REFERENCE_FLAC):
        raise RuntimeError(
            f"reference build FAILED (rc={r.returncode}):\n{r.stdout}\n"
            f"{r.stderr}\nbench refuses to run without its anchor")
    return REFERENCE_FLAC


def warm_tunnel() -> float:
    """One-time d2h path spin-up: the first computed-array fetch after
    process start costs 17-76 s regardless of size (measured); every
    fetch after it runs at link speed.  Returns the cold-start seconds."""
    import jax
    t0 = time.perf_counter()
    f = jax.jit(lambda x, s: x + s)
    dv = jax.device_put(np.zeros((4 << 20,), np.uint8))
    for r in range(2):
        np.asarray(f(dv, np.uint8(r)))
    return time.perf_counter() - t0


def bench_ours_encode(pcm: np.ndarray) -> tuple[float, bytes]:
    from flac_tpu import EncoderConfig, encode_file_to_flac

    cfg = EncoderConfig.from_preset(PRESET).resolve()
    kw = dict(batch_frames=B_BATCH, super_batches=SUPER, pipeline_depth=6)
    # pass 1: compiles + warms every shape on the hot path
    out = encode_file_to_flac(pcm, cfg, **kw)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        out = encode_file_to_flac(pcm, cfg, **kw)
        best = min(best, time.perf_counter() - t0)
    return pcm.shape[1] * 2 * 2 / best, out


def bench_ours_decode(stream: bytes, pcm: np.ndarray) -> float:
    """Decode the timed encode's own output (fast engine), MD5-verified;
    asserts bit-exactness against the source PCM."""
    from flac_tpu.decoder import decode_stream_tpu
    st = decode_stream_tpu(stream)          # warm-up + correctness gate
    assert np.array_equal(st.samples, pcm), \
        "BENCH FAILURE: timed super-chunk stream did not round-trip"
    assert st.md5_ok
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        st = decode_stream_tpu(stream)
        best = min(best, time.perf_counter() - t0)
    return pcm.shape[1] * 2 * 2 / best


def bench_reference(pcm: np.ndarray, flac_bin: str,
                    our_stream: bytes) -> tuple[float, float, int]:
    """Single-core flac -8 encode/decode rates (bytes PCM/s) + size."""
    import tempfile
    from flac_tpu.container import write_wav
    with tempfile.TemporaryDirectory() as d:
        wav = os.path.join(d, "in.wav")
        out = os.path.join(d, "out.flac")
        with open(wav, "wb") as f:
            f.write(write_wav(pcm, RATE, 16))
        t0 = time.perf_counter()
        subprocess.run([flac_bin, "-f", "-s", f"-{PRESET}", "-o", out, wav],
                       check=True, capture_output=True)
        dt_enc = time.perf_counter() - t0
        size = os.path.getsize(out)
        back = os.path.join(d, "back.wav")
        t0 = time.perf_counter()
        subprocess.run([flac_bin, "-d", "-f", "-s", "-o", back, out],
                       check=True, capture_output=True)
        dt_dec = time.perf_counter() - t0
        # cross-acceptance: the reference must also accept OUR stream
        ours = os.path.join(d, "ours.flac")
        with open(ours, "wb") as f:
            f.write(our_stream)
        r = subprocess.run([flac_bin, "-t", "-s", ours], capture_output=True)
        assert r.returncode == 0, \
            f"BENCH FAILURE: flac -t rejected our stream: {r.stderr!r}"
    pcm_bytes = pcm.shape[1] * 2 * 2
    return pcm_bytes / dt_enc, pcm_bytes / dt_dec, size


def bench_extra_preset(pcm, preset: int, flac_bin: str, rate: int,
                       bps: int) -> dict:
    """One extra config leg: our encode (1 warm + 1 timed), reference
    size at the same preset, <=-size gate, bit-exact roundtrip via the
    host engine (cheap, no extra device compiles)."""
    import tempfile

    from flac_tpu import EncoderConfig, encode_file_to_flac
    from flac_tpu.container import write_wav
    from flac_tpu.decoder import decode_stream_tpu

    cfg = EncoderConfig.from_preset(
        preset, sample_rate=rate, bits_per_sample=bps,
        channels=pcm.shape[0]).resolve()
    kw = dict(batch_frames=B_BATCH, super_batches=SUPER, pipeline_depth=6)
    out = encode_file_to_flac(pcm, cfg, **kw)
    t0 = time.perf_counter()
    out = encode_file_to_flac(pcm, cfg, **kw)
    dt = time.perf_counter() - t0
    st = decode_stream_tpu(out, engine="host")
    assert np.array_equal(st.samples, pcm) and st.md5_ok, \
        f"BENCH FAILURE: -{preset}/{bps}bit/{rate}Hz did not round-trip"
    with tempfile.TemporaryDirectory() as d:
        wav = os.path.join(d, "in.wav")
        ref = os.path.join(d, "out.flac")
        with open(wav, "wb") as f:
            f.write(write_wav(pcm, rate, bps))
        subprocess.run([flac_bin, "-f", "-s", f"-{preset}", "-o", ref, wav],
                       check=True, capture_output=True)
        ref_size = os.path.getsize(ref)
    assert len(out) <= ref_size, (
        f"BENCH FAILURE: -{preset}/{bps}bit stream LARGER than libFLAC's "
        f"({len(out)} > {ref_size})")
    pcm_bytes = pcm.shape[1] * pcm.shape[0] * ((bps + 7) // 8)
    return {"encode_MBps": round(pcm_bytes / dt / 1e6, 1),
            "size_ours": len(out), "size_ref": ref_size}


def main() -> None:
    flac_bin = ensure_reference()
    pcm = make_corpus(N_BLOCKS)
    cold_s = warm_tunnel()
    enc_bps, stream = bench_ours_encode(pcm)
    dec_bps = bench_ours_decode(stream, pcm)
    ref_enc_bps, ref_dec_bps, ref_size = bench_reference(
        pcm, flac_bin, stream)
    assert len(stream) <= ref_size, (
        f"BENCH FAILURE: our -{PRESET} stream is LARGER than libFLAC's "
        f"({len(stream)} > {ref_size})")
    # engine the auto policy picked for this rig (bandwidth-aware)
    from flac_tpu.decoder import _pick_engine, probe_link_bandwidth
    from flac_tpu.ref_decoder import parse_metadata
    from flac_tpu.decoder import scan_frames
    st0, pos0 = parse_metadata(stream, 4)
    eng = _pick_engine(scan_frames(stream, st0, pos0))
    # extra configs: -5 leg (same corpus) + 24-bit/96kHz hi-res leg
    leg5 = bench_extra_preset(pcm, 5, flac_bin, RATE, 16)
    hires = bench_extra_preset(make_hires_corpus(), 8, flac_bin, 96000, 24)
    extras = {
        "baseline_source": "measured",
        "ref_encode_MBps_1core": round(ref_enc_bps / 1e6, 1),
        "ref_decode_MBps_1core": round(ref_dec_bps / 1e6, 1),
        "ours_encode_MBps": round(enc_bps / 1e6, 1),
        "ours_decode_MBps": round(dec_bps / 1e6, 1),
        "ours_realtime_x": round(enc_bps / (2 * 2 * RATE), 0),
        "compressed_size_ours": len(stream),
        "compressed_size_ref": ref_size,
        "decode_engine_auto": eng,
        "link_bandwidth_MBps": round(probe_link_bandwidth(), 1),
        "preset5": leg5,
        "hires_24bit_96k": hires,
        "cold_start_s": round(cold_s, 1),
    }
    print(json.dumps(extras), file=sys.stderr)
    print(json.dumps({
        "metric": f"decode_throughput_flac{PRESET}_1chip",
        "value": round(dec_bps / 1e9, 4),
        "unit": "GB/s PCM",
        "vs_baseline": round(dec_bps / ref_dec_bps, 2),
    }), file=sys.stderr)
    print(json.dumps({
        "metric": f"encode_throughput_flac{PRESET}_1chip",
        "value": round(enc_bps / 1e9, 4),
        "unit": "GB/s PCM",
        "vs_baseline": round(enc_bps / ref_enc_bps, 2),
    }))


if __name__ == "__main__":
    main()
