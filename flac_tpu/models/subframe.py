"""Subframe model search: order-guessed candidate grid, one stacked pass.

The reference evaluates one model at a time per subframe (process_subframe_,
stream_encoder.c:4045-4290): per apodization it runs Levinson, *guesses* the
best LPC order from the modeling errors (apply_apodization_,
stream_encoder.c:4380-4391 -> lpc.c:1608-1630) and evaluates only that
order (all orders with -e).  Here the same candidate policy is evaluated as
one batched tensor pass: every candidate — CONSTANT, VERBATIM, FIXED orders
0-4, and one guessed (order, coeffs) per apodization — lands on a single
stacked candidate axis, residuals and *exact* partitioned-Rice costs are
computed for all of them at once, and a single argmin picks the winner.
Exact costs over the same candidate set the reference scores with
estimates is how the "<= libFLAC size" target is met structurally.

CH indexes the channel *candidates* (left, right, mid, side for stereo),
not the final stream channels; the stereo assignment picks among them
afterwards (models/stereo.py).
"""

from __future__ import annotations

from typing import NamedTuple

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
    esc = cfg.do_escape_coding
    if cfg.rice_param_limit <= 15:
        bits, ks = rice_ops.partition_cost_table(
            u32, order, N, max_po, kmax=14, plen=4, escape=esc)
        rice2 = jnp.zeros(bits.shape, bool)
    else:
        # RICE2 is chosen iff it is cheaper for the whole subframe (the
        # reference pays 5-bit params whenever any partition needs k>=15,
        # stream_encoder.c:4786-4794; exact min here is never worse)
        bits4, ks4 = rice_ops.partition_cost_table(
            u32, order, N, max_po, kmax=14, plen=4, escape=esc)
        bits5, ks5 = rice_ops.partition_cost_table(
            u32, order, N, max_po, kmax=30, plen=5, escape=esc)
        rice2 = bits5 < bits4
        bits = jnp.minimum(bits4, bits5)
        ks = jnp.where(rice2[..., None], ks5, ks4)
    limit = _max_po_limit(order, N, max_po)
    po_idx = jnp.arange(bits.shape[-1])
    # the reference searches partition orders in [min_po, max_po]
    # (find_best_partition_order_)
    ok = (po_idx <= limit[..., None]) & (
        po_idx >= cfg.min_residual_partition_order)
    bits = jnp.where(ok, bits + 2 + 4, BIG)
    return bits, ks, rice2


def _select_c(stack_arr, win_c, n_cand: int):
    """One-hot select along a small candidate axis (axis 2) with masked
    selects — per-row gathers serialize on TPU, dense selects stay vector.

    stack_arr: [B, CH, C, ...]; win_c: [B, CH] int32 in [0, n_cand).
    Returns [B, CH, ...].
    """
    out = stack_arr[:, :, 0]
    for c in range(1, n_cand):
        m = win_c == c
        while m.ndim < out.ndim:
            m = m[..., None]
        out = jnp.where(m, stack_arr[:, :, c], out)
    return out


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
    forder_b = jnp.broadcast_to(forder, (B, CH, 5)).astype(jnp.int32)

    # ---- LPC candidates: one guessed order per apodization (all orders
    # with -e, mirroring min_lpc_order=1 at stream_encoder.c:4221-4224) ----
    if O > 0:
        A = bank.combine.shape[0]
        windows = jnp.asarray(bank.windows)       # [W, N] f32
        combine = jnp.asarray(bank.combine)       # [A, W]
        xw = x.astype(jnp.float32)[..., None, :] * windows  # [B,CH,W,N]
        autoc_w = lpc_ops.autocorrelation(xw, O)  # [B,CH,W,O+1] f64
        autoc = jnp.einsum("aw,...wl->...al", combine.astype(jnp.float64),
                           autoc_w)               # [B,CH,A,O+1]
        coeffs, errs, order_ok = lpc_ops.levinson_all_orders(autoc, O)
        # coeffs [B,CH,A,O,32] f32, errs [B,CH,A,O] f64

        if cfg.do_exhaustive_model_search:
            # -e: every order of every apodization is a candidate
            AC = A * O
            cand_coeffs = coeffs.reshape(B, CH, AC, 32)
            cand_order = jnp.broadcast_to(
                jnp.arange(1, O + 1, dtype=jnp.int32), (B, CH, A, O)
            ).reshape(B, CH, AC)
            cand_ok = order_ok.reshape(B, CH, AC)
            # "don't even try" signal per candidate (st..c:4227-4229)
            ordf = cand_order.astype(jnp.float64)
            errf = errs.reshape(B, CH, AC)
            scale = 0.5 / (N - ordf)
            est = 0.5 * jnp.log2(jnp.where(errf > 0, errf * scale, 1.0))
            est = jnp.where(errf > 0, jnp.maximum(est, 0.0),
                            jnp.where(errf < 0, 1e32, 0.0))
        else:
            AC = A
            guess, est = lpc_ops.estimate_best_order(
                errs, N, bps32[..., None] + cfg.qlp_coeff_precision)
            # one-hot select the guessed order's coefficients (f32 exact:
            # a single nonzero per sum)
            onehot = (jnp.arange(O)[None, None, None]
                      == (guess - 1)[..., None]).astype(jnp.float32)
            cand_coeffs = jnp.einsum("bcao,bcaoj->bcaj", onehot, coeffs)
            cand_order = guess                    # [B, CH, A]
            cand_ok = jnp.take_along_axis(
                order_ok, (guess - 1)[..., None], axis=-1)[..., 0]
        # skip candidates whose estimated rate already exceeds raw bps
        cand_ok = cand_ok & (est < bps32[..., None].astype(jnp.float64))

        if cfg.do_qlp_coeff_prec_search:
            # -p: every legal precision becomes its own candidate
            # (evaluate_lpc over min..max precision, st..c:4231-4245)
            PR = np.arange(fmt.MIN_QLP_COEFF_PRECISION,
                           fmt.MAX_QLP_COEFF_PRECISION + 1, dtype=np.int32)
            nP = int(PR.shape[0])
            prec_grid = jnp.asarray(PR)
            clamp = jnp.where(
                bps32[..., None] <= 17,
                jnp.maximum(
                    32 - bps32[..., None] - lpc_ops.ilog2(cand_order),
                    fmt.MIN_QLP_COEFF_PRECISION),
                fmt.MAX_QLP_COEFF_PRECISION)                 # [B, CH, AC]
            ok_p = prec_grid <= clamp[..., None]             # [B,CH,AC,nP]
            cand_coeffs = jnp.repeat(cand_coeffs, nP, axis=2)
            cand_order = jnp.repeat(cand_order, nP, axis=2)
            cand_ok = (cand_ok[..., None] & ok_p).reshape(B, CH, AC * nP)
            prec = jnp.broadcast_to(
                prec_grid, (B, CH, AC, nP)).reshape(
                    B, CH, AC * nP).astype(jnp.int32)
            AC *= nP
        else:
            # qlp precision clamp (evaluate_lpc_subframe_, st..c:4591-4595)
            static_prec = cfg.qlp_coeff_precision
            prec = jnp.where(
                bps32[..., None] <= 17,
                jnp.minimum(static_prec,
                            32 - bps32[..., None]
                            - lpc_ops.ilog2(cand_order)),
                static_prec).astype(jnp.int32)    # [B, CH, AC]

        qc, qshift, q_ok = lpc_ops.quantize_coefficients(
            cand_coeffs, cand_order, prec)        # [B,CH,AC,32] ...

        lpc_mode = "i32" if cfg.max_subframe_bps <= 17 else "f64"
        res_lpc, fit_ok = lpc_ops.lpc_residual(
            x, qc, qshift, cand_order, bps32, lpc_mode)   # [B,CH,AC,N]
        lpc_ok = cand_ok & q_ok & fit_ok
    else:
        AC = 0
        res_lpc = jnp.zeros((B, CH, 0, N), jnp.int32)
        cand_order = jnp.zeros((B, CH, 0), jnp.int32)
        qc = jnp.zeros((B, CH, 0, 32), jnp.int32)
        qshift = jnp.zeros((B, CH, 0), jnp.int32)
        prec = jnp.zeros((B, CH, 0), jnp.int32)
        lpc_ok = jnp.zeros((B, CH, 0), bool)

    # ---- one exact Rice pass over ALL rice-coded candidates ----
    C_rice = 5 + AC
    res_all = jnp.concatenate([fres, res_lpc], axis=2)    # [B,CH,C,N]
    order_all = jnp.concatenate([forder_b, cand_order], axis=2)
    u = rice_ops.zigzag(res_all)
    r_bits, r_ks, r_rice2 = _rice_cost(u, order_all, N, max_po, cfg)
    rice_best = jnp.min(r_bits, axis=-1)          # [B, CH, C]
    po_all = jnp.argmin(r_bits, axis=-1).astype(jnp.int32)

    # header bits per candidate
    fixed_hdr = overhead[..., None] + forder * bps32[..., None]
    if AC:
        lpc_hdr = (overhead[..., None] + 4 + 5
                   + cand_order * (prec + bps32[..., None]))
        hdr_all = jnp.concatenate([fixed_hdr, lpc_hdr], axis=2)
        ok_all = jnp.concatenate(
            [f_ok & (forder < N), lpc_ok], axis=2)
    else:
        hdr_all = fixed_hdr
        ok_all = f_ok & (forder < N)
    total_all = jnp.where(ok_all & (rice_best < BIG),
                          hdr_all + jnp.minimum(rice_best, BIG), BIG)

    # ---- argmin over all candidates ----
    # candidate vector: [verbatim, constant, fixed0..4, lpc_0..AC-1]
    allbits = jnp.concatenate(
        [verb_bits[..., None], const_bits[..., None], total_all], axis=-1)
    win = jnp.argmin(allbits, axis=-1).astype(jnp.int32)   # [B, CH]
    best_bits = jnp.min(allbits, axis=-1)

    is_verb = win == 0
    is_constw = win == 1
    is_fixed = (win >= 2) & (win < 7)
    is_lpc = win >= 7
    win_c = jnp.clip(win - 2, 0, C_rice - 1)      # index into the rice stack

    type_ = jnp.where(is_verb, fmt.SUBFRAME_TYPE_VERBATIM,
             jnp.where(is_constw, fmt.SUBFRAME_TYPE_CONSTANT,
              jnp.where(is_fixed, fmt.SUBFRAME_TYPE_FIXED,
                        fmt.SUBFRAME_TYPE_LPC))).astype(jnp.int32)

    # ---- realize the winner from the per-candidate tables ----
    order = jnp.where(is_fixed | is_lpc,
                      _select_c(order_all, win_c, C_rice), 0)
    residual = jnp.where((is_fixed | is_lpc)[..., None],
                         _select_c(res_all, win_c, C_rice), 0)
    po = jnp.where(is_fixed | is_lpc, _select_c(po_all, win_c, C_rice), 0)
    ks_sel = _select_c(r_ks, win_c, C_rice)       # [B, CH, L, P]
    params = jnp.take_along_axis(
        ks_sel, po[..., None, None], axis=-2)[..., 0, :]   # [B, CH, P]
    r2_sel = _select_c(r_rice2, win_c, C_rice)    # [B, CH, L]
    use_rice2 = jnp.take_along_axis(r2_sel, po[..., None], -1)[..., 0]

    if AC:
        lidx = jnp.clip(win - 7, 0, AC - 1)
        qc_win = jnp.where(is_lpc[..., None], _select_c(qc, lidx, AC), 0)
        sh_win = jnp.where(is_lpc, _select_c(qshift, lidx, AC), 0)
        prec_win = jnp.where(is_lpc, _select_c(prec, lidx, AC), 0)
    else:
        qc_win = jnp.zeros((B, CH, 32), jnp.int32)
        sh_win = jnp.zeros((B, CH), jnp.int32)
        prec_win = jnp.zeros((B, CH), jnp.int32)

    warmup = x[..., :fmt.MAX_LPC_ORDER] if N >= fmt.MAX_LPC_ORDER else \
        jnp.pad(x, [(0, 0), (0, 0), (0, fmt.MAX_LPC_ORDER - N)])

    return SubframeChoice(
        bits=best_bits, type_=type_, order=order, wasted=wasted,
        bps_eff=bps_eff, qcoeffs=qc_win, shift=sh_win, precision=prec_win,
        warmup=warmup, residual=residual, po=po, params=params,
        use_rice2=use_rice2)
