#!/usr/bin/env python
"""Stage-internal profiler for models/subframe.search_and_realize — the
largest encode stage after the round-4 pack work.  Times each internal
phase as its own jit at the -8 production shapes (B frames x CH=4
candidate channels x N=4096, subdivide_tukey(3) bank) on whatever
backend is live, using dependent-scalar fetches so the tunnel's
transfer time never pollutes the numbers.

Run:  python tools/profile_search.py [B]
"""

import sys
import time

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import jax                      # noqa: E402
import jax.numpy as jnp         # noqa: E402

from flac_tpu.config import EncoderConfig           # noqa: E402
from flac_tpu.models import subframe as sf          # noqa: E402
from flac_tpu.ops import lpc as lpc_ops             # noqa: E402
from flac_tpu.ops import rice as rice_ops           # noqa: E402
from flac_tpu import format as fmt                  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
N = 4096
CH = 4
cfg = EncoderConfig.from_preset(8).resolve()
O = cfg.max_lpc_order
max_po = fmt.max_rice_partition_order_limited(
    cfg.max_residual_partition_order, N, 0)

rng = np.random.default_rng(0)
t = np.arange(B * N) / 44100.0
sig = 0.4 * np.sin(2 * np.pi * 220 * t) + 0.2 * np.sin(2 * np.pi * 333 * t)
sig += 0.01 * rng.standard_normal(B * N)
x_np = np.round(sig * 20000).astype(np.int32).reshape(B, 1, N)
x_np = np.broadcast_to(x_np, (B, CH, N)).copy()
x = jnp.asarray(x_np)
bps = jnp.full((B, CH), 16, jnp.int32)

bank = lpc_ops.build_apodization_bank(N, tuple(cfg.apodizations))
windows = jnp.asarray(bank.windows)
combine = jnp.asarray(bank.combine)
A = bank.combine.shape[0]
W = bank.windows.shape[0]
print(f"B={B} CH={CH} N={N} O={O} windows={W} apodizations={A} "
      f"max_po={max_po} backend={jax.default_backend()}")


def bench(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(4):
            out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jnp.sum(leaf.astype(jnp.float32)
                           if leaf.dtype != jnp.int32 else leaf))
        best = min(best, (time.perf_counter() - t0) / 4)
    mb = B * N * CH * 2 / 1e6
    print(f"{name:38s}: {best * 1e3:7.2f} ms")
    return best


# 1. windowing + autocorrelation
@jax.jit
def stage_autoc(x):
    xw = x.astype(jnp.float32)[..., None, :] * windows
    autoc_w = lpc_ops.autocorrelation(xw, O)
    return jnp.einsum("aw,...wl->...al", combine.astype(jnp.float64),
                      autoc_w)


autoc = stage_autoc(x)
t_autoc = bench("windowing + autocorrelation", stage_autoc, x)


# 2. Levinson (all orders) + order guess
@jax.jit
def stage_levinson(autoc):
    coeffs, errs, order_ok = lpc_ops.levinson_all_orders(autoc, O)
    guess, est = lpc_ops.estimate_best_order(
        errs, N, jnp.full(errs.shape[:-1], 16 + 15, jnp.int32))
    return coeffs, errs, guess


coeffs, errs, guess = stage_levinson(autoc)
t_lev = bench("Levinson all orders + order guess", stage_levinson, autoc)


# 3. coefficient select + quantization
@jax.jit
def stage_quant(coeffs, guess):
    onehot = (jnp.arange(O)[None, None, None]
              == (guess - 1)[..., None]).astype(jnp.float32)
    cand = jnp.einsum("bcao,bcaoj->bcaj", onehot, coeffs)
    prec = jnp.full((B, CH, A), cfg.qlp_coeff_precision, jnp.int32)
    return lpc_ops.quantize_coefficients(cand, guess, prec)


qc, qshift, q_ok = stage_quant(coeffs, guess)
t_quant = bench("select + quantize coefficients", stage_quant, coeffs,
                guess)


# 4. LPC residual (A candidates)
@jax.jit
def stage_residual(x, qc, qshift, guess):
    return lpc_ops.lpc_residual(x, qc, qshift, guess, bps, "i32")


res, fit_ok = stage_residual(x, qc, qshift, guess)
t_res = bench(f"LPC residual x{A} candidates", stage_residual, x, qc,
              qshift, guess)


# 5. exact Rice cost table over all candidates (5 fixed + A lpc)
from flac_tpu.ops import fixed as fixed_ops      # noqa: E402


@jax.jit
def stage_rice(x, res, guess):
    n_idx = jnp.arange(N, dtype=jnp.int32)
    forder = jnp.arange(5, dtype=jnp.int32)
    fres = jnp.where(n_idx[None, :] >= forder[:, None],
                     fixed_ops.fixed_residuals_all(x), 0)
    res_all = jnp.concatenate([fres, res], axis=2)
    order_all = jnp.concatenate(
        [jnp.broadcast_to(forder, (B, CH, 5)).astype(jnp.int32), guess],
        axis=2)
    u = rice_ops.zigzag(res_all)
    bits, ks = rice_ops.partition_cost_table(
        u, order_all, N, max_po, kmax=14, plen=4,
        escape=cfg.do_escape_coding)
    return jnp.min(bits, axis=-1)


t_rice = bench(f"fixed residuals + rice cost x{5 + A}", stage_rice, x,
               res, guess)


# 6. the whole search_and_realize for reference
@jax.jit
def whole(x, bps):
    return sf.search_and_realize(
        x, bps, jnp.zeros((B, CH), jnp.int32), cfg, bank)


t_all = bench("search_and_realize (whole)", whole, x, bps)

mb = B * N * 2 * 2 / 1e6     # PCM MB per batch (2 ch)
print(f"\nstage sum {1e3 * (t_autoc + t_lev + t_quant + t_res + t_rice):.2f}"
      f" ms vs whole {1e3 * t_all:.2f} ms; "
      f"whole-stage throughput {mb / t_all:.0f} MB/s PCM "
      f"({mb:.1f} MB PCM per batch)")
