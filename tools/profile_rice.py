#!/usr/bin/env python
"""Micro-bench: rice finest-level shifted-sum formulations (dev tool)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

B, CH, C, N = 128, 4, 14, 4096
P, m = 64, 64
K = 15   # kmax=14 RICE

rng = np.random.default_rng(0)
u = rng.integers(0, 2**17, (B, CH, C, N), dtype=np.uint32)
u_d = jax.device_put(jnp.asarray(u))


def timeit(name, fn, *args, reps=6):
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
    print(f"{name:46s} {(tr-t1)/reps*1e3:8.2f} ms")


def v_loop(ud):
    u_lo = (ud & jnp.uint32(0xFFFF)).astype(jnp.int32).reshape(B, CH, C, P, m)
    u_hi = (ud >> 16).astype(jnp.int32).reshape(B, CH, C, P, m)
    lo = jnp.stack([jnp.sum(u_lo >> k, axis=-1) for k in range(K)], -1)
    hi = jnp.sum(u_hi, axis=-1)[..., None]
    return lo, hi
timeit("loop 15 sums i32", v_loop, u_d)

def v_fused(ud):
    u_lo = (ud & jnp.uint32(0xFFFF)).astype(jnp.int32).reshape(B, CH, C, P, m)
    u_hi = (ud >> 16).astype(jnp.int32).reshape(B, CH, C, P, m)
    ks = jnp.arange(K, dtype=jnp.int32)
    lo = jnp.sum(u_lo[..., None] >> ks, axis=-2)
    hi = jnp.sum(u_hi, axis=-1)[..., None]
    return lo, hi
timeit("one reduce over [m,K] expand", v_fused, u_d)

def v_i16(ud):
    u_lo = (ud & jnp.uint32(0xFFFF)).astype(jnp.uint16).reshape(B, CH, C, P, m)
    u_hi = (ud >> 16).astype(jnp.uint16).reshape(B, CH, C, P, m)
    lo = jnp.stack([jnp.sum((u_lo >> k).astype(jnp.int32), axis=-1)
                    for k in range(K)], -1)
    hi = jnp.sum(u_hi.astype(jnp.int32), axis=-1)[..., None]
    return lo, hi
timeit("loop 15 sums via u16 planes", v_i16, u_d)

def v_matmul(ud):
    # exact via bf16? NO — use f32 matmul on split nibbles: instead use
    # dot_general i32: sums over m as matmul with ones
    u_lo = (ud & jnp.uint32(0xFFFF)).astype(jnp.float32).reshape(B, CH, C, P, m)
    ks = jnp.arange(K, dtype=jnp.int32)
    # f32 exact for values < 2^24: u_lo < 2^16 ok, shifted exact ints
    planes = jnp.floor(u_lo[..., None] * (0.5 ** ks))
    return jnp.sum(planes, axis=-2)
timeit("f32 scaled floor reduce", v_matmul, u_d)
