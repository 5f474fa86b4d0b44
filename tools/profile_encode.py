#!/usr/bin/env python
"""Stage-level timing of encode_batch on the real chip (dev tool).

The axon tunnel's block_until_ready does NOT wait for server-side
completion; the only reliable sync is fetching a value that depends on the
computation.  Every timing below reduces the stage output to a scalar and
fetches it; per-iteration cost is isolated with the k=1 vs k=R difference
method (subtracting dispatch+fetch latency).
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

from flac_tpu import EncoderConfig
from flac_tpu.encoder import encode_batch, _bank_for
from flac_tpu.models import stereo as stereo_mod
from flac_tpu.models import subframe as subframe_mod
from flac_tpu.models import frame as frame_mod
from flac_tpu.ops import lpc as lpc_ops, rice as rice_ops

PRESET = int(sys.argv[1]) if len(sys.argv) > 1 else 8
B = int(sys.argv[2]) if len(sys.argv) > 2 else 128
N = int(sys.argv[3]) if len(sys.argv) > 3 else 4096
cfg = EncoderConfig.from_preset(PRESET).resolve()
bank = _bank_for(cfg, N)
print("platform:", jax.devices()[0].platform, "A =", bank.combine.shape[0],
      "W =", bank.windows.shape[0], "max_lpc_order =", cfg.max_lpc_order)

rng = np.random.default_rng(0)
t = np.arange(B * N) / 44100
sig = (20000 * np.sin(2 * np.pi * 440 * t) + rng.normal(0, 800, B * N))
pcm = np.stack([sig, 0.8 * sig]).astype(np.int32).reshape(2, B, N).transpose(1, 0, 2)
x = jax.device_put(jnp.asarray(pcm))


def _scalarize(out):
    leaves = jax.tree_util.tree_leaves(out)
    return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)


def timeit(name, fn, *args, reps=5):
    def looped(k, *a):
        first = a[0]
        def body(i, acc):
            pert = jax.tree_util.tree_map(
                lambda l: l + i.astype(l.dtype) if jnp.issubdtype(
                    l.dtype, jnp.integer) else l, first)
            return acc + _scalarize(fn(pert, *a[1:]))
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))
    g = jax.jit(looped, static_argnums=0)
    float(np.asarray(g(1, *args)))                    # compile + warm
    t0 = time.perf_counter(); float(np.asarray(g(1, *args)))
    t1 = time.perf_counter() - t0
    float(np.asarray(g(reps + 1, *args)))
    t0 = time.perf_counter(); float(np.asarray(g(reps + 1, *args)))
    tr = time.perf_counter() - t0
    per = (tr - t1) / reps
    print(f"{name:38s} {per*1e3:9.2f} ms")
    return fn(*args)


full = lambda p: encode_batch(p, jnp.int64(0), cfg, N)
timeit("encode_batch (full)", full, x, reps=2)

f_stereo = lambda p: stereo_mod.build_channel_candidates(p, cfg)
xc, bps_eff, wasted = timeit("stereo candidates + wasted", f_stereo, x)
xc = jax.device_put(xc); bps_eff = jax.device_put(bps_eff); wasted = jax.device_put(wasted)

f_search = lambda a, b, c: subframe_mod.search_and_realize(a, b, c, cfg, bank)
choice = timeit("search_and_realize (all)", f_search, xc, bps_eff, wasted, reps=2)

O = min(cfg.max_lpc_order, N - 1)
if O > 0:
    def f_autoc(xx):
        windows = jnp.asarray(bank.windows)
        combine = jnp.asarray(bank.combine)
        xw = xx.astype(jnp.float32)[..., None, :] * windows
        autoc_w = lpc_ops.autocorrelation(xw, O)
        return jnp.einsum("aw,...wl->...al", combine.astype(jnp.float64), autoc_w)
    autoc = timeit("  autocorrelation+combine", f_autoc, xc)
    autoc = jax.device_put(autoc)

    def f_lev(a):
        coeffs, err, ok = lpc_ops.levinson_all_orders(a, O)
        orders = np.arange(1, O + 1)
        prec = jnp.full(a.shape[:-1] + (O,), cfg.qlp_coeff_precision, jnp.int32)
        return lpc_ops.quantize_coefficients(coeffs, orders, prec)[:2]
    qc, qs = timeit("  levinson+quantize (all apod)", f_lev, autoc)
    qc = jax.device_put(qc); qs = jax.device_put(qs)

    orders = np.arange(1, O + 1)
    lpc_mode = "i32" if cfg.max_subframe_bps <= 17 else "f64"
    bps_arr = jnp.full(xc.shape[:2], cfg.max_subframe_bps, jnp.int32)
    ord_b = jnp.broadcast_to(jnp.asarray(orders, jnp.int32),
                             xc.shape[:2] + (O,))
    f_res = lambda xx, q, s: lpc_ops.lpc_residual(
        xx, q[:, :, 0], s[:, :, 0], ord_b, bps_arr, lpc_mode)
    res, ok = timeit("  lpc_residual all orders (1 apod)", f_res, xc, qc, qs)
    res = jax.device_put(res)

    max_po = 6
    f_rice = lambda r: rice_ops.partition_cost_table(
        rice_ops.zigzag(r), jnp.broadcast_to(jnp.asarray(orders, jnp.int32),
                                             r.shape[:-1]), N, max_po, 14, 4)
    timeit("  rice cost table (1 apod, all O)", f_rice, res)

assignment, ch_index = stereo_mod.select_assignment(choice.bits, cfg)
choice_g = stereo_mod.gather_channels(choice, ch_index)
signal_g = stereo_mod.gather_channels(xc, ch_index)
choice_g = jax.device_put(choice_g); signal_g = jax.device_put(signal_g)
f_frame = lambda ch, sig, asn: frame_mod.assemble_frames(
    ch, sig, asn, jnp.arange(B, dtype=jnp.int64), cfg, N)
timeit("frame assemble+bitpack", f_frame, choice_g, signal_g,
       jax.device_put(assignment))
