#!/usr/bin/env python
"""Lean pack-stage profiler: times assemble_frames and pack_fields at
realistic and reduced field counts (k-rep fori difference method, one jit
per measurement, small graphs)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from flac_tpu.ops import bitpack  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
N = 4096


def timed(name, make_fn, *args, reps=6):
    """fori-difference timing: dispatch loops of k and k+reps iterations;
    the difference removes dispatch+RTT."""
    def looped(k, *a):
        def body(i, acc):
            pert = tuple(
                x + i.astype(x.dtype) if jnp.issubdtype(x.dtype, jnp.integer)
                else x for x in a)
            out = make_fn(*pert)
            leaves = jax.tree_util.tree_leaves(out)
            return acc + sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))
    g = jax.jit(looped, static_argnums=0)
    float(np.asarray(g(1, *args)))
    float(np.asarray(g(1 + reps, *args)))
    t0 = time.perf_counter(); float(np.asarray(g(1, *args)))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(np.asarray(g(1 + reps, *args)))
    tr = time.perf_counter() - t0
    print(f"{name:46s} {(tr - t1)/reps*1e3:9.2f} ms")


rng = np.random.default_rng(0)
for S in (8500, 4300, 2450, 1250):
    nz = jnp.asarray(rng.integers(0, 3, (B, S), np.int32))
    pay = jnp.asarray(rng.integers(0, 1 << 30, (B, S)).astype(np.uint32))
    pb = jnp.asarray(rng.integers(1, 12, (B, S), np.int32))
    W = 4096
    timed(f"pack_fields S={S}", lambda a, b, c: bitpack.pack_fields(
        a, b, jnp.clip(c, 0, 31) % 12 + 1, W), nz, pay, pb)

# 64-bit 3-plane scatter at the fused field count
S = 2450
nz = jnp.asarray(rng.integers(0, 3, (B, S), np.int32))
ph = jnp.asarray(rng.integers(0, 1 << 30, (B, S)).astype(np.uint32))
plo = jnp.asarray(rng.integers(0, 1 << 30, (B, S)).astype(np.uint32))
pb = jnp.asarray(rng.integers(8, 40, (B, S), np.int32))


def pack3(nz_, ph_, plo_, pb_):
    W = 4096
    nbits = nz_ + pb_
    end = jnp.cumsum(nbits, axis=1, dtype=jnp.int32)
    pos = end - pb_
    pay = (ph_.astype(jnp.uint64) << 32) | plo_.astype(jnp.uint64)
    w = (pos >> 5).astype(jnp.int32)
    sh = pos & 31
    t = sh + pb_
    words = jnp.zeros((B, W), jnp.uint32)
    b_idx = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None],
                             (B, S))
    for j in range(3):
        d = 32 * (j + 1) - t
        contrib = jnp.where(
            d >= 0,
            jnp.where(d >= 64, jnp.uint64(0),
                      pay << jnp.clip(d, 0, 63).astype(jnp.uint64)),
            pay >> jnp.clip(-d, 0, 63).astype(jnp.uint64)
        ).astype(jnp.uint32)
        words = words.at[b_idx, w + j].add(contrib, mode="drop")
    return words, end[:, -1]


timed(f"pack3x64 S={S} (fused-4 estimate)", pack3, nz, ph, plo, pb)
