"""Subframe model search: the candidate grid replacing the reference's
nested greedy loops.

The reference evaluates one model at a time per subframe with estimated bit
counts (process_subframe_, stream_encoder.c:4045-4290).  Here every
candidate — CONSTANT, VERBATIM, FIXED orders 0-4, and LPC over
{apodization x order} — is scored with *exact* Rice-coded bit counts in one
batched pass over [B, CH, N] tensors, followed by a single argmin.  The
minimum over a candidate superset with exact costs can never exceed the
reference's choice for the same quantized coefficients, which is how the
"<= libFLAC size" target is met structurally rather than by mimicking
control flow.

CH indexes the channel *candidates* (left, right, mid, side for stereo),
not the final stream channels; the stereo assignment picks among them
afterwards (models/stereo.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import format as fmt
from ..config import EncoderConfig
from ..ops import fixed as fixed_ops
from ..ops import lpc as lpc_ops
from ..ops import rice as rice_ops

BIG = rice_ops.BIG


class SubframeChoice(NamedTuple):
    """Realized best subframe per (frame, channel-candidate)."""
    bits: jnp.ndarray        # [B, CH] int32 total subframe bits
    type_: jnp.ndarray       # [B, CH] int32 (fmt.SUBFRAME_TYPE_*)
    order: jnp.ndarray       # [B, CH] int32 predictor order (0 for const/verb)
    wasted: jnp.ndarray      # [B, CH] int32
    bps_eff: jnp.ndarray     # [B, CH] int32 subframe bps after wasted shift
    qcoeffs: jnp.ndarray     # [B, CH, 32] int32 (LPC only)
    shift: jnp.ndarray       # [B, CH] int32 quantization shift
    precision: jnp.ndarray   # [B, CH] int32 qlp precision (LPC only)
    warmup: jnp.ndarray      # [B, CH, 32] int32 post-shift signal head
    residual: jnp.ndarray    # [B, CH, N] int32 (zero at n < order)
    po: jnp.ndarray          # [B, CH] int32 partition order
    params: jnp.ndarray      # [B, CH, P] int32 Rice parameter per partition
    use_rice2: jnp.ndarray   # [B, CH] bool — 5-bit parameter method


def _ilog2_static(n: int) -> int:
    return n.bit_length() - 1


def _max_po_limit(order, N: int, max_po: int):
    """Highest partition order with (N>>po) > order (format.c:541-553)."""
    po = jnp.arange(max_po + 1, dtype=jnp.int32)
    ok = (N >> po)[None, :] > order[..., None]
    return jnp.sum(ok.astype(jnp.int32), axis=-1) - 1


def _rice_cost(u32, order, N: int, max_po: int, cfg: EncoderConfig):
    """Residual-coding cost per partition order, RICE/RICE2 aware.

    Returns (bits [..., L] incl. the 6 method/order field bits,
             params [..., L, P], rice2 [..., L] bool).
    """
    if cfg.rice_param_limit <= 15:
        bits, ks = rice_ops.partition_cost_table(
            u32, order, N, max_po, kmax=14, plen=4)
        L = bits.shape[-1]
        rice2 = jnp.zeros(bits.shape, bool)
    else:
        bits4, ks4 = rice_ops.partition_cost_table(
            u32, order, N, max_po, kmax=14, plen=4)
        bits5, ks5 = rice_ops.partition_cost_table(
            u32, order, N, max_po, kmax=30, plen=5)
        rice2 = bits5 < bits4
        bits = jnp.minimum(bits4, bits5)
        ks = jnp.where(rice2[..., None], ks5, ks4)
    limit = _max_po_limit(order, N, max_po)
    po_idx = jnp.arange(bits.shape[-1])
    ok = (po_idx <= limit[..., None]) & (
        po_idx >= cfg.min_residual_partition_order)
    # min partition order: the reference searches [min_po, max_po]
    # (find_best_partition_order_); po below min is not allowed unless
    # nothing else is valid — po 0 is always legal when min_po is 0.
    bits = jnp.where(ok, bits + 2 + 4, BIG)
    return bits, ks, rice2


def search_and_realize(x, bps_eff, wasted, cfg: EncoderConfig,
                       bank: lpc_ops.ApodizationBank) -> SubframeChoice:
    """Find and realize the cheapest subframe encoding per (frame, channel).

    x:       [B, CH, N] int32 — wasted-bits-shifted candidate signals
    bps_eff: [B, CH] int32 — subframe bps after wasted-bit reduction
    wasted:  [B, CH] int32
    """
    B, CH, N = x.shape
    max_po = fmt.max_rice_partition_order_limited(
        cfg.max_residual_partition_order, N, 0)
    P = 1 << max_po
    # a final short block can be smaller than the configured max order
    O = min(cfg.max_lpc_order, N - 1)
    overhead = 8 + wasted                         # subframe header bits
    bps32 = bps_eff

    # ---- VERBATIM (always valid) ----
    verb_bits = overhead + N * bps32

    # ---- CONSTANT ----
    is_const = jnp.all(x == x[..., :1], axis=-1)
    const_bits = jnp.where(is_const, overhead + bps32, BIG)

    # ---- FIXED orders 0..4 ----
    # int32 when bps < 28 (|res| <= 17 * 2^(bps-1), the reference's
    # accumulator criterion at stream_encoder.c:4097-4107), exact f64 above
    fixed_wide = cfg.max_subframe_bps >= 28
    n_idx = jnp.arange(N, dtype=jnp.int32)
    forder = jnp.arange(5, dtype=jnp.int32)
    fmask = n_idx[None, :] >= forder[:, None]     # [5, N]
    if fixed_wide:
        fres_w = fixed_ops.fixed_residuals_all(x.astype(jnp.float64))
        fres_w = jnp.where(fmask, fres_w, 0)
        f_ok = jnp.max(jnp.abs(fres_w), axis=-1) < jnp.float64(2 ** 31)
        fres = fres_w.astype(jnp.int32)
    else:
        fres = jnp.where(fmask, fixed_ops.fixed_residuals_all(x), 0)
        f_ok = jnp.ones(fres.shape[:-1], bool)
    fu = rice_ops.zigzag(fres)
    forder_b = jnp.broadcast_to(forder, fres.shape[:-1]).astype(jnp.int32)
    f_rice, f_ks, f_rice2 = _rice_cost(fu, forder_b, N, max_po, cfg)
    f_rice_best = jnp.min(f_rice, axis=-1)        # [B, CH, 5]
    fixed_bits = (overhead[..., None] + forder * bps32[..., None]
                  + jnp.minimum(f_rice_best, BIG))
    fixed_bits = jnp.where(f_ok & (forder < N), fixed_bits, BIG)

    # ---- LPC candidates: apodizations x orders ----
    if O > 0:
        A = bank.combine.shape[0]
        windows = jnp.asarray(bank.windows)       # [W, N] f32
        combine = jnp.asarray(bank.combine)       # [A, W]
        xw = x.astype(jnp.float32)[..., None, :] * windows  # [B,CH,W,N]
        autoc_w = lpc_ops.autocorrelation(xw, O)  # [B,CH,W,O+1] f64
        autoc = jnp.einsum("aw,...wl->...al", combine.astype(jnp.float64),
                           autoc_w)               # [B,CH,A,O+1]
        coeffs, _err, order_ok = lpc_ops.levinson_all_orders(autoc, O)
        orders = np.arange(1, O + 1)
        # qlp precision clamp (evaluate_lpc_subframe_, st..c:4591-4595)
        static_prec = cfg.qlp_coeff_precision
        ilog2_o = np.array([_ilog2_static(int(o)) for o in orders])
        prec = jnp.where(
            bps_eff[..., None] <= 17,
            jnp.minimum(static_prec,
                        32 - bps_eff[..., None] - ilog2_o[None, None, :]),
            static_prec).astype(jnp.int32)        # [B, CH, O]
        qc, qshift, q_ok = lpc_ops.quantize_coefficients(
            coeffs, orders, prec[..., None, :])   # [B,CH,A,O,32] etc.

        lpc_mode = "i32" if cfg.max_subframe_bps <= 17 else "f64"
        lpc_bits_list = []
        lpc_po_list = []
        for a in range(A):
            res_a, ok_a = lpc_ops.lpc_residual_all_orders(
                x, qc[:, :, a], qshift[:, :, a], orders, lpc_mode)
            u_a = rice_ops.zigzag(res_a)
            ob = jnp.broadcast_to(
                jnp.asarray(orders, jnp.int32), u_a.shape[:-1])
            r_bits, _ks, _r2 = _rice_cost(u_a, ob, N, max_po, cfg)
            best = jnp.min(r_bits, axis=-1)       # [B, CH, O]
            po_a = jnp.argmin(r_bits, axis=-1).astype(jnp.int32)
            o32 = jnp.asarray(orders, jnp.int32)
            total = (overhead[..., None] + 4 + 5
                     + o32 * (prec + bps32[..., None])
                     + jnp.minimum(best, BIG))
            valid = (ok_a & order_ok[:, :, a] & q_ok[:, :, a]
                     & (best < BIG))
            lpc_bits_list.append(jnp.where(valid, total, BIG))
            lpc_po_list.append(po_a)
        lpc_bits = jnp.stack(lpc_bits_list, axis=2)   # [B, CH, A, O]
    else:
        A = 0
        lpc_bits = jnp.full((B, CH, 0, 0), BIG, jnp.int32)

    # ---- argmin over all candidates ----
    # candidate vector: [verbatim, constant, fixed0..4, lpc(a*O+o-1)...]
    cands = [verb_bits[..., None], const_bits[..., None], fixed_bits]
    if O > 0:
        cands.append(lpc_bits.reshape(B, CH, A * O))
    allbits = jnp.concatenate(cands, axis=-1)
    win = jnp.argmin(allbits, axis=-1).astype(jnp.int32)   # [B, CH]
    best_bits = jnp.min(allbits, axis=-1)

    is_verb = win == 0
    is_constw = win == 1
    is_fixed = (win >= 2) & (win < 7)
    is_lpc = win >= 7
    f_order = jnp.clip(win - 2, 0, 4)
    lpc_flat = jnp.clip(win - 7, 0, max(A * O - 1, 0))
    lpc_a = lpc_flat // max(O, 1)
    lpc_o = lpc_flat % max(O, 1)                  # order-1

    type_ = jnp.where(is_verb, fmt.SUBFRAME_TYPE_VERBATIM,
             jnp.where(is_constw, fmt.SUBFRAME_TYPE_CONSTANT,
              jnp.where(is_fixed, fmt.SUBFRAME_TYPE_FIXED,
                        fmt.SUBFRAME_TYPE_LPC))).astype(jnp.int32)
    order = jnp.where(is_fixed, f_order,
                      jnp.where(is_lpc, lpc_o + 1, 0)).astype(jnp.int32)

    # ---- realize the winner ----
    if O > 0:
        ga = lpc_a[..., None, None, None]
        go = lpc_o[..., None, None, None]
        qc_win = jnp.take_along_axis(
            jnp.take_along_axis(qc, ga, axis=2), go, axis=3)[:, :, 0, 0]
        sh_win = jnp.take_along_axis(
            jnp.take_along_axis(qshift, lpc_a[..., None, None], axis=2),
            lpc_o[..., None, None], axis=3)[:, :, 0, 0]
        prec_win = jnp.take_along_axis(prec, lpc_o[..., None], axis=2)[..., 0]
        # LPC residual for the single winning candidate
        res_lpc, _ = lpc_ops.lpc_residual_all_orders(
            x, qc_win[:, :, None, :], sh_win[:, :, None],
            np.array([1]), lpc_mode)
        res_lpc = res_lpc[:, :, 0, :]
        # mask below actual order
        res_lpc = jnp.where(n_idx >= order[..., None], res_lpc, 0)
    else:
        qc_win = jnp.zeros((B, CH, 32), jnp.int32)
        sh_win = jnp.zeros((B, CH), jnp.int32)
        prec_win = jnp.zeros((B, CH), jnp.int32)
        res_lpc = jnp.zeros((B, CH, N), jnp.int32)

    # masked select instead of take_along_axis (TPU row-gathers serialize)
    res_fixed = fres[:, :, 0, :]
    for o in range(1, 5):
        res_fixed = jnp.where((f_order == o)[..., None], fres[:, :, o, :],
                              res_fixed)
    residual = jnp.where(is_lpc[..., None], res_lpc,
                         jnp.where(is_fixed[..., None], res_fixed, 0))
    residual = residual.astype(jnp.int32)

    # final Rice realization on the winning residual
    u = rice_ops.zigzag(residual)
    r_bits, r_ks, r_rice2 = _rice_cost(u, order, N, max_po, cfg)
    po = jnp.argmin(r_bits, axis=-1).astype(jnp.int32)
    params = jnp.take_along_axis(
        r_ks, po[..., None, None], axis=-2)[..., 0, :]     # [B, CH, P]
    use_rice2 = jnp.take_along_axis(r_rice2, po[..., None], -1)[..., 0]

    warmup = x[..., :fmt.MAX_LPC_ORDER] if N >= fmt.MAX_LPC_ORDER else \
        jnp.pad(x, [(0, 0), (0, 0), (0, fmt.MAX_LPC_ORDER - N)])

    return SubframeChoice(
        bits=best_bits, type_=type_, order=order, wasted=wasted,
        bps_eff=bps_eff, qcoeffs=qc_win, shift=sh_win, precision=prec_win,
        warmup=warmup, residual=residual, po=po, params=params,
        use_rice2=use_rice2)
