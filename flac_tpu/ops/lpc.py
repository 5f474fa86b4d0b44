"""LPC analysis and residual ops, batched over subframes and candidates.

TPU-native counterpart of src/libFLAC/lpc.c and window.c: the window bank is
a precomputed host tensor; autocorrelation is a batched lag-product
reduction; Levinson-Durbin is a 32-step `lax.scan` vectorized over
thousands of subframes; quantization mirrors the reference's
error-feedback rounding (lpc.c:220-314) as a short scan.

The apodization search follows the reference's subdivide_tukey scheme
(stream_encoder.c:4293-4393): autocorrelations are computed per *window*
and punchout candidates are formed by subtracting partial-window
autocorrelations from the root's — expressed here as a single
[num_candidates, num_windows] +1/-1 combination matrix.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..format import (MAX_LPC_ORDER, SUBFRAME_LPC_QLP_SHIFT_LEN)

MAX_SHIFT = (1 << (SUBFRAME_LPC_QLP_SHIFT_LEN - 1)) - 1   # 15
MIN_SHIFT = -MAX_SHIFT - 1                                 # -16


# ---------------------------------------------------------------------------
# Window bank
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ApodizationBank:
    """Precomputed windows plus the autocorrelation combination matrix.

    windows: [W, N] float32 — windows whose autocorrelation is computed
    combine: [A, W] float32 (+1/-1/0) — candidate a's autocorrelation is
             combine[a] @ window_autocorrs (punchouts = root - partial,
             stream_encoder.c:4369-4375)
    names:   candidate labels for analyze mode
    """
    windows: np.ndarray
    combine: np.ndarray
    names: tuple


def build_apodization_bank(blocksize: int, specs: tuple) -> ApodizationBank:
    """specs: tuple of raw `-A` strings like ('tukey(5e-1)',
    'subdivide_tukey(3)') — the full 15-family mini-language of
    FLAC__stream_encoder_set_apodization (stream_encoder.c:1940-2065),
    parsed and expanded by flac_tpu.ops.windows."""
    from . import windows as windows_mod
    canon = windows_mod.parse_specs(";".join(specs))
    wins, combine, names = windows_mod.expand_bank(blocksize, canon)
    return ApodizationBank(windows=wins, combine=combine, names=names)


# ---------------------------------------------------------------------------
# Autocorrelation
# ---------------------------------------------------------------------------

def autocorrelation(windowed, max_lag: int, acc_dtype=jnp.float64,
                    block: int = 128):
    """autoc[..., l] = sum_n d[n] * d[n+l] for l in 0..max_lag.

    windowed: [..., N] float32 (windowed signal)
    Returns [..., max_lag+1] in acc_dtype.

    The reference accumulates float32 products in float64 (lpc.c:110-174).
    Emulated f64 multiplies over the full [..., N] tensor are the single
    most expensive op on TPU, so the hot path routes the lag products
    through the MXU (autocorrelation_mxu below); per-lag elementwise
    passes remain for shapes the framing can't cover.  acc_dtype=float64
    with block=1 reproduces the reference's full-f64 accumulation for
    tests (the MXU path's error is bounded by the same per-~128-sample
    f32 partial argument: relative error ~1e-5, far inside what survives
    coefficient quantization).
    """
    if block == 1:
        d = windowed.astype(acc_dtype)
        outs = []
        for lag in range(max_lag + 1):
            prod = d * d if lag == 0 else d[..., :-lag] * d[..., lag:]
            outs.append(jnp.sum(prod, axis=-1))
        return jnp.stack(outs, axis=-1)
    N = windowed.shape[-1]
    if N % 128 == 0 and N >= 256:
        return autocorrelation_mxu(windowed, max_lag, acc_dtype)
    pad = (-N) % block
    d = windowed
    if pad:
        d = jnp.pad(d, [(0, 0)] * (d.ndim - 1) + [(0, pad)])
    Np = N + pad
    outs = []
    for lag in range(max_lag + 1):
        if lag == 0:
            prod = d * d
        else:
            shifted = jnp.pad(d[..., lag:],
                              [(0, 0)] * (d.ndim - 1) + [(0, lag)])
            prod = d * shifted
        partial = prod.reshape(prod.shape[:-1] + (Np // block, block)).sum(-1)
        outs.append(jnp.sum(partial.astype(acc_dtype), axis=-1))
    return jnp.stack(outs, axis=-1)


def autocorrelation_mxu(windowed, max_lag: int, acc_dtype=jnp.float64):
    """Autocorrelation as a blocked Gram matrix on the MXU.

    Frame the signal into Nb = N/F non-overlapping blocks extended by
    max_lag samples from the next block, then ONE batched matmul
    contracts the block axis:

        P[i, j] = sum_b frames[b, i] * frames[b, j]   (i < F, j < F+L)
        autoc[l] = sum_i P[i, i + l]                  (l-th diagonal)

    This is the SIMD-tier autocorrelation of the reference
    (lpc_intrin_*.c lag-8/12/16 kernels) mapped to the matrix unit: the
    multiply-accumulate work rides the MXU at full tile occupancy and
    only the [F, F+L] Gram tile's diagonals are touched afterwards (in
    f64, preserving the blocked-accumulation error bound of the old
    VPU path).
    """
    N = windowed.shape[-1]
    L = max_lag
    F = 128
    Nb = N // F
    lead = windowed.shape[:-1]
    blocks = windowed.reshape(lead + (Nb, F))
    # tail[b, :L] = blocks[b+1, :L]; zero for the last block
    tail = jnp.concatenate(
        [blocks[..., 1:, :L],
         jnp.zeros(lead + (1, L), windowed.dtype)], axis=-2)
    frames = jnp.concatenate([blocks, tail], axis=-1)   # [..., Nb, F+L]
    P = jnp.einsum("...bi,...bj->...ij", blocks, frames,
                   preferred_element_type=jnp.float32)  # [..., F, F+L]
    outs = [jnp.sum(jnp.diagonal(P, offset=lag, axis1=-2, axis2=-1)
                    .astype(acc_dtype), axis=-1)
            for lag in range(L + 1)]
    return jnp.stack(outs, axis=-1)


# ---------------------------------------------------------------------------
# Levinson-Durbin — all orders at once
# ---------------------------------------------------------------------------

def levinson_all_orders(autoc, max_order: int):
    """Vectorized Levinson-Durbin returning predictor coefficients for every
    order 1..max_order (mirrors FLAC__lpc_compute_lp_coefficients,
    lpc.c:176-218, which also emits all orders in one recursion).

    autoc: [..., max_order+1] float (f64 recommended)
    Returns:
      coeffs [..., max_order, MAX_LPC_ORDER] float32 — predictor (negated
        FIR) coefficients for each order, zero-padded
      pred_err [..., max_order] — modeling error per order
      order_valid [..., max_order] bool — False for orders past an exact fit
        (err==0 truncation, lpc.c:213-216) or when autoc[0]==0
    """
    dtype = autoc.dtype
    O = max_order
    batch = autoc.shape[:-1]
    jidx = jnp.arange(MAX_LPC_ORDER)

    def step(carry, i):
        lpc, err, dead = carry
        # r = -(autoc[i+1] + sum_{j<i} lpc[j] * autoc[i-j]) / err
        a_rev = autoc[..., jnp.clip(i - jidx, 0, O)]  # [..., 32] = autoc[i-j]
        mask = (jidx < i)
        s = jnp.sum(jnp.where(mask, lpc * a_rev, 0), axis=-1)
        safe_err = jnp.where(err == 0, 1, err)
        r = -(autoc[..., i + 1] + s) / safe_err
        # lpc'[j] = lpc[j] + r * lpc[i-1-j] for j < i; lpc'[i] = r
        lpc_rev = lpc[..., jnp.clip(i - 1 - jidx, 0, MAX_LPC_ORDER - 1)]
        lpc_new = jnp.where(mask, lpc + r[..., None] * lpc_rev, lpc)
        lpc_new = jnp.where(jidx == i, r[..., None], lpc_new)
        err_new = err * (1 - r * r)
        dead_next = dead | (err_new == 0)  # orders AFTER an exact fit die
        lpc_out = jnp.where(dead[..., None], 0, lpc_new)
        return ((lpc_new, err_new, dead_next),
                (lpc_out, err_new, dead))

    lpc0 = jnp.zeros(batch + (MAX_LPC_ORDER,), dtype)
    err0 = autoc[..., 0]
    dead0 = err0 == 0
    (_, (lpcs, errs, was_dead)) = jax.lax.scan(
        step, (lpc0, err0, dead0), jnp.arange(O))
    # scan stacks on axis 0; move order axis to just before coeff axis
    lpcs = jnp.moveaxis(lpcs, 0, -2)
    errs = jnp.moveaxis(errs, 0, -1)
    was_dead = jnp.moveaxis(was_dead, 0, -1)
    coeffs = (-lpcs).astype(jnp.float32)   # negate FIR -> predictor coeffs
    return coeffs, errs, ~was_dead


def ilog2(v):
    """floor(log2(v)) for traced integers in 1..32 (bitmath.c:63)."""
    v = v.astype(jnp.int32)
    return ((v > 1).astype(jnp.int32) + (v > 3) + (v > 7) + (v > 15)
            + (v > 31))


def estimate_best_order(errs, N: int, overhead_bits_per_order):
    """Guess the cheapest LPC order from Levinson modeling errors.

    Mirrors FLAC__lpc_compute_best_order (lpc.c:1608-1630): estimated
    bits(o) = max(0, 0.5*log2(0.5/N * err[o])) * (N - o)
              + o * overhead_bits_per_order, argmin over o.

    errs: [..., O] f64 prediction error per order (order o at index o-1);
          err < 0 (float-resolution artifacts) scores 1e32 like the
          reference.
    overhead_bits_per_order: [...] traced (subframe bps + qlp precision).
    Returns (order [...] int32 in 1..O, est_bps_at_guess [...] f64 — the
    "don't even try" signal recomputed at scale 0.5/(N-order) exactly like
    the caller's check at stream_encoder.c:4227-4229).
    """
    O = errs.shape[-1]
    orders = jnp.arange(1, O + 1, dtype=jnp.float64)

    def est_bps(err, scale):
        bps = 0.5 * jnp.log2(jnp.where(err > 0, err * scale, 1.0))
        return jnp.where(err > 0, jnp.maximum(bps, 0.0),
                         jnp.where(err < 0, 1e32, 0.0))

    bits = (est_bps(errs, 0.5 / N) * (N - orders)
            + orders * overhead_bits_per_order[..., None].astype(jnp.float64))
    idx = jnp.argmin(bits, axis=-1)
    guess = (idx + 1).astype(jnp.int32)
    err_at = jnp.take_along_axis(errs, idx[..., None], axis=-1)[..., 0]
    est_at = est_bps(err_at, 0.5 / (N - guess.astype(jnp.float64)))
    return guess, est_at


# ---------------------------------------------------------------------------
# Coefficient quantization (error-feedback rounding)
# ---------------------------------------------------------------------------

# exact 2.0**e values precomputed on host; jnp.exp2 can be an ulp off
# (observed on XLA CPU) and jnp.ldexp lowers through frexp's s64
# bitcast-convert, which the TPU x64 rewrite rejects — a gather from an
# exact constant table avoids both
_POW2_MIN, _POW2_MAX = -1075, 1024
with np.errstate(over="ignore"):   # inf at the top entry is intentional
    _POW2_TABLE = np.ldexp(1.0, np.arange(_POW2_MIN, _POW2_MAX + 1))


def _pow2(e):
    """Exact 2.0**e (f64) for integer e, saturating at the f64 range."""
    idx = jnp.clip(e.astype(jnp.int32) - _POW2_MIN, 0,
                   _POW2_TABLE.shape[0] - 1)
    return jnp.asarray(_POW2_TABLE)[idx]


def quantize_coefficients(coeffs, orders, precision):
    """Quantize float predictor coefficients per lpc.c:220-314.

    coeffs:    [..., MAX_LPC_ORDER] float32 candidate coefficients (zero
               beyond the candidate's order)
    orders:    [...] traced int32 — actual order per candidate (1..32)
    precision: [...] traced int32 — qlp precision per candidate (after the
               evaluate_lpc_ clamp, stream_encoder.c:4591-4595)

    Returns (qcoeffs int32 [..., 32], shift int32 [...], valid bool [...]).
    """
    c = coeffs.astype(jnp.float64)
    orders = jnp.asarray(orders)
    prec = jnp.asarray(precision)
    jidx = jnp.arange(MAX_LPC_ORDER)
    in_order = jidx < orders[..., None]                 # [..., 32]

    cmax = jnp.max(jnp.where(in_order, jnp.abs(c), 0), axis=-1)  # [...]
    valid = cmax > 0

    # log2cmax = floor(log2(cmax)) (equals the reference's frexp exponent-1,
    # lpc.c:252-255).  jnp.frexp fails the TPU x64 rewrite, so compute via
    # log2 and repair the boundary cases exactly with exp2 comparisons.
    safe = jnp.where(valid, cmax, 1.0)
    e0 = jnp.floor(jnp.log2(safe)).astype(jnp.int32)
    e0 = jnp.where(_pow2(e0) > safe, e0 - 1, e0)
    log2cmax = jnp.where(
        _pow2(e0 + 1) <= safe, e0 + 1, e0)
    shift = (prec - 1).astype(jnp.int32) - log2cmax - 1
    shift = jnp.minimum(shift, MAX_SHIFT)
    valid = valid & (shift >= MIN_SHIFT)
    # negative shift: scale coefficients down and emit shift 0
    # (lpc.c:283-311); both branches reduce to multiplying by 2^shift
    scale = _pow2(shift)
    out_shift = jnp.maximum(shift, 0)

    qmax = (1 << (prec - 1)) - 1           # [O]
    qmin = -(qmax + 1)

    def step(error, j):
        coef = c[..., j]
        err = error + coef * scale
        q = jnp.where(in_order[..., j],
                      jnp.sign(err) * jnp.floor(jnp.abs(err) + 0.5), 0.0)
        q = jnp.clip(q, qmin.astype(jnp.float64), qmax.astype(jnp.float64))
        err = jnp.where(in_order[..., j], err - q, error)
        return err, q.astype(jnp.int32)

    err0 = jnp.zeros(c.shape[:-1], jnp.float64)
    _, qs = jax.lax.scan(step, err0, jnp.arange(MAX_LPC_ORDER))
    qcoeffs = jnp.moveaxis(qs, 0, -1)      # [..., O, 32]
    return qcoeffs, out_shift.astype(jnp.int32), valid


# ---------------------------------------------------------------------------
# Residual computation — all orders in one einsum
# ---------------------------------------------------------------------------

def lpc_residual(x, qcoeffs, shift, orders, bps_eff, mode: str):
    """residual[..., a, n] = x[n] - (sum_j q[a,j] * x[n-1-j]) >> shift[a]
    for n >= order[a]; positions n < order are zeroed.

    x:        [..., N] int32 signal (wasted-bits-shifted: |x| < 2^(bps_eff-1))
    qcoeffs:  [..., A, 32] int32 (zero beyond each candidate's order)
    shift:    [..., A] int32
    orders:   [..., A] traced int32
    bps_eff:  [...] traced int32 — effective bps bound of x
    mode:     "i32" — int32 accumulation; candidates whose accumulator or
              residual could exceed int32 are invalidated via the exact
              static range analysis the reference's decoder-width pick uses
              (FLAC__lpc_max_prediction_before_shift_bps /
              max_residual_bps, lpc.c:942-976): |pred| <= sum|q|*2^(bps-1)
              and |res| <= 2^(bps-1) + (|pred| >> shift).  "f64" — exact
              f64 accumulation (products <= 2^47, sums <= 2^52), for
              hi-res.  int64 is avoided entirely: TPU's x64-rewrite pass
              makes s64-heavy graphs ~30x slower to compile and run.

    Returns (residual [..., A, N] int32, valid [..., A] bool).  Invalid
    candidates must be discarded by the caller (mirrors the reference's
    limit_residual rejection, lpc.c:832-940).
    """
    N = x.shape[-1]
    n_idx = jnp.arange(N, dtype=jnp.int32)
    mask = n_idx >= orders[..., None]                   # [..., A, N]
    max_j = min(MAX_LPC_ORDER, max(N - 1, 1), qcoeffs.shape[-1])

    # exact candidate range analysis in f64 (all quantities < 2^50)
    sum_abs_q = jnp.sum(jnp.abs(qcoeffs).astype(jnp.float64), axis=-1)
    amp = _pow2((bps_eff - 1).astype(jnp.int32))[..., None]   # [..., 1]
    pred_bound = sum_abs_q * amp
    res_bound = amp + jnp.floor(pred_bound * _pow2(-shift))
    fits = (pred_bound < jnp.float64(2 ** 31)) & \
        (res_bound < jnp.float64(2 ** 31))

    def accumulate(xa, qa):
        # ONE padded copy of the signal; each tap is a fused slice of it
        # (a per-tap jnp.pad materializes max_j shifted copies — measured
        # ~2x the whole stage's traffic)
        xp = jnp.pad(xa, [(0, 0)] * (x.ndim - 1) + [(max_j, 0)])
        pred = None
        for j in range(max_j):
            lag = xp[..., max_j - 1 - j:max_j - 1 - j + N]
            term = qa[..., :, j][..., None] * lag[..., None, :]
            pred = term if pred is None else pred + term
        return pred

    if mode == "i32":
        pred = accumulate(x, qcoeffs) >> shift[..., None]
        res = x[..., None, :] - pred
        return jnp.where(mask, res, 0), fits
    elif mode == "f64":
        pred = accumulate(x.astype(jnp.float64),
                          qcoeffs.astype(jnp.float64))
        pred = jnp.floor(pred * _pow2(-shift[..., None]))
        res = x.astype(jnp.float64)[..., None, :] - pred
        res = jnp.where(mask, res, 0)
        # f64 is exact here, so gate on the actual residual range (the
        # reference's limit_residual behavior) — tighter than the bound
        valid = jnp.max(jnp.abs(res), axis=-1) < jnp.float64(2 ** 31)
        return res.astype(jnp.int32), valid
    raise ValueError(f"unknown mode {mode}")


def lpc_restore(residual, warmup, qcoeffs, shift, order):
    """Decode-side LPC restore: x[n] = residual[n] + (sum qc[j]*x[n-1-j])>>s.

    Sequential order-p IIR over the block, vectorized across the batch
    (the reference's FLAC__lpc_restore_signal, lpc.c:978-1070).

    residual: [B, N] int  (positions < order ignored)
    warmup:   [B, 32] int
    qcoeffs:  [B, 32] int32,  shift: [B] int32,  order: [B] int32
    Returns [B, N] restored signal (residual dtype).
    """
    N = residual.shape[-1]
    dt = residual.dtype
    qc = qcoeffs.astype(dt)
    sh = shift.astype(dt)

    # state: the last 32 samples, state[..., j] = x[n-1-j]
    def step(state, n):
        pred = jnp.sum(qc * state, axis=-1) >> sh
        xn = residual[..., n] + pred
        wn = warmup[..., jnp.minimum(n, MAX_LPC_ORDER - 1)].astype(dt)
        xn = jnp.where(n < order, wn, xn)
        new_state = jnp.concatenate([xn[..., None], state[..., :-1]], axis=-1)
        return new_state, xn

    state0 = jnp.zeros(residual.shape[:-1] + (MAX_LPC_ORDER,), dt)
    _, xs = jax.lax.scan(step, state0, jnp.arange(N))
    return jnp.moveaxis(xs, 0, -1)
