"""Fixed polynomial predictors (orders 0-4), batched over subframes.

TPU-native counterpart of the reference's fixed-predictor kernels
(src/libFLAC/fixed.c:470-566 residuals, :571-665 restore).  Where the
reference processes one subframe at a time with SIMD, here every op is a
pure elementwise/shift computation over a [..., N] tensor batched across
frames × channels × candidates, so the VPU sees full lanes.

The fixed predictor of order o predicts x[n] from the o-th binomial
combination of previous samples; the residual is the o-th finite
difference of the signal:

    e0[n] = x[n]
    e1[n] = x[n] -  x[n-1]
    e2[n] = x[n] - 2x[n-1] +  x[n-2]
    e3[n] = x[n] - 3x[n-1] + 3x[n-2] -  x[n-3]
    e4[n] = x[n] - 4x[n-1] + 6x[n-2] - 4x[n-3] + x[n-4]
"""

from __future__ import annotations

import jax.numpy as jnp

# Binomial predictor taps per order: residual[n] = sum_j COEF[o][j] * x[n-j]
_DIFF_COEFS = (
    (1,),
    (1, -1),
    (1, -2, 1),
    (1, -3, 3, -1),
    (1, -4, 6, -4, 1),
)


def _shift_right(x, j):
    """x delayed by j samples along the last axis (zeros shifted in)."""
    if j == 0:
        return x
    if j >= x.shape[-1]:
        return jnp.zeros_like(x)
    pad = jnp.zeros(x.shape[:-1] + (j,), dtype=x.dtype)
    return jnp.concatenate([pad, x[..., :-j]], axis=-1)


def fixed_residuals_all(x):
    """Residuals for all five fixed orders in one pass.

    x: [..., N] integer signal.
    Returns [..., 5, N] with residual order o at index o; entries at
    positions n < o are the (meaningless) partial differences and must be
    masked by the caller (they are warmup positions, never Rice-coded).

    dtype follows x: use int32 when bps + 4 < 32 (cf. the reference's
    accumulator-width choice at stream_encoder.c:4097-4107), int64 above.
    """
    outs = []
    for coefs in _DIFF_COEFS:
        acc = None
        for j, c in enumerate(coefs):
            term = _shift_right(x, j) * jnp.asarray(c, dtype=x.dtype)
            acc = term if acc is None else acc + term
        outs.append(acc)
    return jnp.stack(outs, axis=-2)


def fixed_restore(residual, warmup, order, out_dtype=None):
    """Sequentially restore a signal from a fixed-order residual.

    residual: [..., N] (positions < order ignored)
    warmup:   [..., 4] first `order` original samples
    order:    scalar or [...] traced order in 0..4
    Returns [..., N] reconstructed signal.

    Decode restore is an order-o IIR (fixed.c:571-665).  Rather than a
    per-sample scan, apply the inverse difference `order` times: each
    inverse step is a cumulative sum, which XLA lowers to a log-depth
    parallel prefix — O(log N) depth instead of O(N).
    """
    x = residual if out_dtype is None else residual.astype(out_dtype)
    n_idx = jnp.arange(x.shape[-1])
    order_b = jnp.asarray(order)[..., None]
    # Place warmup samples at their positions; cumsum-invert `order` times.
    # After k inversions the array holds the (order-k)-th difference. To make
    # cumsum valid we seed position `order-1-k`... Simpler and robust:
    # iteratively integrate with explicit warmup injection per step.
    for k in range(4, 0, -1):
        # For signals with order >= k: integrate the k-th difference into
        # the (k-1)-th.  d_{k-1}[n] = warmup-based init + cumsum(d_k[n])
        do = order_b > (k - 1)  # this integration applies when order >= k
        # the (k-1)-th difference of the first `order` samples is known from
        # warmup; compute it on the fly (cheap: <= 4 samples)
        dk1_warm = warmup.astype(x.dtype)
        for _ in range(k - 1):
            dk1_warm = dk1_warm - jnp.roll(dk1_warm, 1, axis=-1)
        # value of the (k-1)-th difference at position k-1 ... order-1 come
        # from warmup; at positions >= order come from integration
        seed_pos = order_b - 1  # last warmup index
        seed_val = jnp.take_along_axis(
            dk1_warm, jnp.clip(seed_pos, 0, 3), axis=-1)
        started = n_idx >= order_b
        xk = jnp.where(started, x, 0)
        integ = jnp.cumsum(xk, axis=-1) + seed_val
        x = jnp.where(do, jnp.where(started, integ, x), x)
    # positions < order: original warmup samples
    warm_full = jnp.pad(warmup.astype(x.dtype),
                        [(0, 0)] * (warmup.ndim - 1) +
                        [(0, x.shape[-1] - warmup.shape[-1])])
    return jnp.where(n_idx < order_b, warm_full, x)
