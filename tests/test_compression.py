"""Compression monotonicity (test/test_compression.sh:34-46): on a noisy
sine, size(-k) must not exceed size(-(k-1)) by more than 10 bytes for
k = 1..8."""

import io

import numpy as np

from flac_tpu import EncoderConfig
from flac_tpu.encoder import StreamEncoder


def _noisy_sine(n: int) -> np.ndarray:
    rng = np.random.default_rng(4)
    t = np.arange(n) / 44100.0
    sig = (0.6 * np.sin(2 * np.pi * 440 * t)
           + 0.05 * rng.standard_normal(n))
    mono = np.round(np.clip(sig, -1, 1) * 32000).astype(np.int32)
    return np.stack([mono, np.roll(mono, 7)])


def test_preset_sizes_monotonic():
    pcm = _noisy_sine(4096 * 6)
    sizes = []
    for level in range(9):
        cfg = EncoderConfig.from_preset(level)
        buf = io.BytesIO()
        enc = StreamEncoder(buf, cfg, padding=0)
        enc.process(pcm)
        enc.finish()
        sizes.append(len(buf.getvalue()))
    for k in range(1, 9):
        assert sizes[k] <= sizes[k - 1] + 10, (
            f"-{k} ({sizes[k]}) > -{k-1} ({sizes[k-1]}) + 10; all={sizes}")
