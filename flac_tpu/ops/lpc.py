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

def _tukey_window(L: int, p: float) -> np.ndarray:
    """FLAC tukey(p) window, float32 semantics (window.c:199-221)."""
    w = np.ones(L, dtype=np.float64)
    if p <= 0.0:
        return w.astype(np.float32)
    if p >= 1.0:
        # hann (window.c:139-146): 0.5 - 0.5 cos(2 pi n / (L-1))
        n = np.arange(L, dtype=np.float64)
        return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / (L - 1))).astype(
            np.float32)
    Np = int(np.float32(p) / 2.0 * L) - 1
    if Np > 0:
        n = np.arange(Np + 1, dtype=np.float64)
        rise = 0.5 - 0.5 * np.cos(np.pi * n / Np)
        fall = 0.5 - 0.5 * np.cos(np.pi * (n + Np) / Np)
        w[:Np + 1] = rise
        w[L - Np - 1:] = fall
    return w.astype(np.float32)


def _partial_window_full_length(root: np.ndarray, part_size: int,
                                shift: int) -> np.ndarray:
    """Zero-padded full-length equivalent of FLAC__lpc_window_data_partial
    (lpc.c:81-93): the segment [shift, shift+2*part_size) is windowed by the
    root window's first and last `part_size` samples; everything else is 0,
    so full-length autocorrelation equals the reference's segment
    autocorrelation."""
    L = len(root)
    w = np.zeros(L, dtype=np.float32)
    if part_size + shift >= L:
        return w
    w[shift:shift + part_size] = root[:part_size]
    n2 = min(part_size, L - part_size - shift)
    w[shift + part_size:shift + part_size + n2] = root[L - part_size:
                                                       L - part_size + n2]
    return w


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
    """specs: tuple of strings like ('tukey(5e-1)', 'subdivide_tukey(3)').

    Only the window families used by the compression presets are built here
    (tukey, partial_tukey via subdivide, punchout via subtraction); the full
    15-family bank lives in flac_tpu.ops.windows.
    """
    windows: list[np.ndarray] = []
    rows: list[np.ndarray] = []
    names: list[str] = []

    def add_window(w) -> int:
        windows.append(w)
        return len(windows) - 1

    for spec in specs:
        spec = spec.strip()
        if spec.startswith("subdivide_tukey"):
            args = spec[len("subdivide_tukey("):-1].split("/")
            parts = int(args[0])
            p = float(args[1]) if len(args) > 1 else 0.5
            root = _tukey_window(blocksize, p)
            root_idx = add_window(root)
            # depth 1: the root itself
            r = np.zeros(512); r[root_idx] = 1.0
            rows.append(r); names.append(f"subdivide_tukey({parts})@root")
            for b in range(2, parts + 1):
                if blocksize // b <= MAX_LPC_ORDER:
                    break  # reference skips tiny parts (stream_encoder.c:4350)
                part_size = blocksize // b // 2
                for c in range(b):
                    shift = (c * blocksize) // b
                    w = _partial_window_full_length(root, part_size, shift)
                    widx = add_window(w)
                    r = np.zeros(512); r[widx] = 1.0
                    rows.append(r)
                    names.append(f"subdivide_tukey({parts})@{b}/{c}")
                    if b > 2:  # punchout = root - partial (depth>2 only)
                        r = np.zeros(512); r[root_idx] = 1.0; r[widx] = -1.0
                        rows.append(r)
                        names.append(f"subdivide_tukey({parts})@{b}/{c}^c")
        elif spec.startswith("tukey"):
            p = float(spec[len("tukey("):-1])
            widx = add_window(_tukey_window(blocksize, p))
            r = np.zeros(512); r[widx] = 1.0
            rows.append(r); names.append(spec)
        else:
            raise ValueError(f"unsupported apodization spec: {spec}")

    W = len(windows)
    combine = np.stack([r[:W] for r in rows]).astype(np.float32)
    return ApodizationBank(windows=np.stack(windows), combine=combine,
                           names=tuple(names))


# ---------------------------------------------------------------------------
# Autocorrelation
# ---------------------------------------------------------------------------

def autocorrelation(windowed, max_lag: int, acc_dtype=jnp.float64):
    """autoc[..., l] = sum_n d[n] * d[n+l] for l in 0..max_lag.

    windowed: [..., N] float32 (windowed signal)
    Returns [..., max_lag+1] in acc_dtype.

    The reference accumulates float32 products in float64 (lpc.c:110-174);
    we cast to the accumulator dtype first so products are exact, matching
    it up to summation order.
    """
    d = windowed.astype(acc_dtype)
    outs = []
    for lag in range(max_lag + 1):
        if lag == 0:
            prod = d * d
        else:
            prod = d[..., :-lag] * d[..., lag:]
        outs.append(jnp.sum(prod, axis=-1))
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


def quantize_coefficients(coeffs, order_index, precision):
    """Quantize float predictor coefficients per lpc.c:220-314.

    coeffs:      [..., O, MAX_LPC_ORDER] float32 (order o at index o-1)
    order_index: static int array [O] of actual orders (1..max)
    precision:   static int array [O] — precision per order (after the
                 evaluate_lpc_ clamp, stream_encoder.c:4591-4595)

    Returns (qcoeffs int32 [..., O, 32], shift int32 [..., O],
             valid bool [..., O]).
    """
    c = coeffs.astype(jnp.float64)
    orders = jnp.asarray(order_index)
    prec = jnp.asarray(precision)          # [O]
    jidx = jnp.arange(MAX_LPC_ORDER)
    in_order = jidx[None, :] < orders[:, None]          # [O, 32]

    cmax = jnp.max(jnp.where(in_order, jnp.abs(c), 0), axis=-1)  # [..., O]
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

def lpc_residual_all_orders(x, qcoeffs, shift, order_index, mode: str):
    """residual[..., o, n] = x[n] - (sum_j q[o,j] * x[n-1-j]) >> shift[o]
    for n >= order; positions n < order are zeroed.

    x:        [..., N] int32 signal
    qcoeffs:  [..., O, 32] int32
    shift:    [..., O] int32
    order_index: static [O] orders
    mode:     "i32" — int32 accumulation with an f32-matmul overflow guard
              (use when stream bps <= 16: the qlp-precision clamp at
              evaluate_lpc_subframe_ keeps the accumulation near 32 bits,
              and the guard invalidates the rare candidate that would
              wrap).  "f64" — exact f64 accumulation (<= 2^52), for hi-res.
              int64 is avoided entirely: TPU's x64-rewrite pass makes
              s64-heavy graphs ~30x slower to compile and run.

    Returns (residual [..., O, N] int32, valid [..., O] bool).  Invalid
    candidates (accumulator or residual would not fit) must be discarded
    by the caller (mirrors the reference's limit_residual rejection,
    lpc.c:832-940).
    """
    N = x.shape[-1]
    orders = jnp.asarray(order_index)
    n_idx = jnp.arange(N, dtype=jnp.int32)
    mask = n_idx[None, :] >= orders[:, None]            # [O, N]
    max_j = min(MAX_LPC_ORDER, max(N - 1, 1), qcoeffs.shape[-1])

    def accumulate(xa, qa):
        pred = None
        for j in range(max_j):
            lag = jnp.pad(xa[..., :N - 1 - j],
                          [(0, 0)] * (x.ndim - 1) + [(j + 1, 0)])
            term = qa[..., :, j][..., None] * lag[..., None, :]
            pred = term if pred is None else pred + term
        return pred

    if mode == "i32":
        pred = accumulate(x, qcoeffs)                   # int32, may wrap
        # overflow guard: approximate the pre-shift accumulator in f32
        # (error << 2^15) and reject candidates approaching +-2^30
        predf = accumulate(x.astype(jnp.float32),
                           qcoeffs.astype(jnp.float32))
        valid = jnp.max(jnp.abs(predf), axis=-1) < jnp.float32(2 ** 30)
        pred = pred >> shift[..., None]
        res = x[..., None, :] - pred
        return jnp.where(mask, res, 0), valid
    elif mode == "f64":
        pred = accumulate(x.astype(jnp.float64),
                          qcoeffs.astype(jnp.float64))
        pred = jnp.floor(pred * _pow2(-shift[..., None]))
        res = x.astype(jnp.float64)[..., None, :] - pred
        valid = jnp.max(jnp.abs(res), axis=-1) < jnp.float64(2 ** 31)
        res = jnp.where(mask, res, 0)
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
