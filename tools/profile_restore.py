#!/usr/bin/env python
"""Micro-benchmark of restore_and_undo compute: sweep unroll U and lane
count S (synthetic inputs, scalar dependent fetch so the tunnel's lazy
block_until_ready can't lie)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from flac_tpu.decoder_fast import restore_and_undo  # noqa: E402

N = 4096
rng = np.random.default_rng(0)


def run(S, U, mo=12):
    res = jnp.asarray(rng.integers(-2000, 2000, (S, N), np.int16))
    order = jnp.full((S,), 8, jnp.int32)
    shift = jnp.full((S,), 12, jnp.int32)
    qlp = jnp.asarray(rng.integers(-(1 << 14), 1 << 14, (S, mo), np.int32))
    wasted = jnp.zeros((S,), jnp.int32)
    asg = jnp.zeros((S // 2,), jnp.int32)

    def f():
        out = restore_and_undo(res, order, shift, qlp, wasted, asg,
                               blocksize=N, channels=2, max_order=mo,
                               unroll=U, wide=False, out16=True)[0]
        return np.asarray(jnp.sum(out.astype(jnp.int32)))
    f()
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        f()
        best = min(best, time.perf_counter() - t0)
    mb = S * N * 2 / 1e6
    print(f"S={S:5d} U={U:3d} mo={mo:2d}: {best*1e3:8.1f} ms  "
          f"{mb/best:7.1f} MB/s-PCM")


for S in (512, 1024, 2048):
    for U in (8, 16, 32, 64):
        run(S, U)
run(1024, 32, mo=32)
