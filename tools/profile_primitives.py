#!/usr/bin/env python
"""Micro-bench of scatter-free pack primitives on the chip (dev tool)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

B, S, W = 128, 16537, 8192

rng = np.random.default_rng(0)
# monotone word indices like a real frame's field->word map
wf = np.sort(rng.integers(0, 2800, (B, S)).astype(np.int32), axis=1)
hi = rng.integers(0, 2**32, (B, S), dtype=np.uint32)
wf_d = jax.device_put(jnp.asarray(wf))
hi_d = jax.device_put(jnp.asarray(hi))


def timeit(name, fn, *args, reps=8):
    g = jax.jit(fn)
    r = g(*args); jax.block_until_ready(r)
    def loop(k, *a):
        def body(i, acc):
            out = fn(*[x + i.astype(x.dtype) if jnp.issubdtype(x.dtype, jnp.integer) else x for x in a])
            leaves = jax.tree_util.tree_leaves(out)
            return acc + sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))
    gl = jax.jit(loop, static_argnums=0)
    float(np.asarray(gl(1, *args)))
    t0 = time.perf_counter(); float(np.asarray(gl(1, *args))); t1 = time.perf_counter()-t0
    float(np.asarray(gl(reps+1, *args)))
    t0 = time.perf_counter(); float(np.asarray(gl(reps+1, *args))); tr = time.perf_counter()-t0
    print(f"{name:44s} {(tr-t1)/reps*1e3:8.2f} ms")


timeit("cumsum u32 [B,S]", lambda h: jnp.cumsum(h, axis=1), hi_d)

def ss_vmap(wfx):
    q = jnp.arange(W, dtype=jnp.int32)
    return jax.vmap(lambda a: jnp.searchsorted(a, q, side="right"))(wfx)
timeit("searchsorted vmap bin [B,W q into S]", ss_vmap, wf_d)

def ss_sort(wfx):
    q = jnp.arange(W, dtype=jnp.int32)
    return jax.vmap(lambda a: jnp.searchsorted(a, q, side="right",
                                               method="sort"))(wfx)
timeit("searchsorted vmap sort", ss_sort, wf_d)

def gather_rows(wfx, hix):
    idx = jnp.clip(wfx[:, :W], 0, S - 1)
    return jnp.take_along_axis(hix, idx, axis=1)
timeit("take_along_axis [B,W] from [B,S]", gather_rows, wf_d, hi_d)

# full scatter-free pack: cumsum + searchsorted + 4 gathers
def pack_free(wfx, hix):
    P = jnp.concatenate([jnp.zeros((B, 1), jnp.uint32),
                         jnp.cumsum(hix, axis=1)], axis=1)
    q = jnp.arange(W, dtype=jnp.int32)
    e = jax.vmap(lambda a: jnp.searchsorted(a, q, side="right"))(wfx)
    e = e.astype(jnp.int32)
    e_prev = jnp.pad(e[:, :-1], ((0, 0), (1, 0)))
    hi_w = jnp.take_along_axis(P, e, axis=1) - \
        jnp.take_along_axis(P, e_prev, axis=1)
    return hi_w
timeit("pack-free hi plane (cumsum+ss+2 gather)", pack_free, wf_d, hi_d)

# big dense byte gather like encode_batch_dense
capB = 2200000
bl = jax.device_put(jnp.asarray(
    rng.integers(0, 256, (B, 11000), dtype=np.uint8)))
lens = jax.device_put(jnp.asarray(
    rng.integers(9000, 11000, (B,), dtype=np.int32)))
def dense_gather(bz, ln):
    offs = jnp.cumsum(ln) - ln
    j = jnp.arange(capB, dtype=jnp.int32)
    fidx = jnp.searchsorted(offs, j, side="right").astype(jnp.int32) - 1
    fidx = jnp.clip(fidx, 0, B - 1)
    src = j - offs[fidx]
    valid = (src >= 0) & (src < ln[fidx])
    return jnp.where(valid, bz[fidx, jnp.clip(src, 0, bz.shape[1]-1)], 0)
timeit("dense byte gather [2.2M] from [B,11000]", dense_gather, bl, lens)
